package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization over a live event stream — the streaming
  * twin of [[graft.queries.TimeSeries.sessionize]] (`q_sessionize`'s
  * kernel): per key, events closer than `gapSeconds` chain into one
  * session; a finished session emits exactly once, when the watermark
  * proves no in-order event can extend it.
  *
  * This is deliberately Spark's BUILT-IN `session_window` aggregation,
  * not custom `flatMapGroupsWithState` bookkeeping: merging session
  * windows with watermark-driven close is exactly the shape Structured
  * Streaming's session aggregation handles natively (including the
  * hard part — two open sessions merging when a bridging event arrives
  * late but inside the watermark). State per key is the OPEN sessions
  * only, evicted the moment the watermark passes `last + gap`, so
  * memory is bounded by (keys actively emitting within the watermark
  * horizon), independent of stream lifetime.
  *
  * Boundary contract: the batch kernel merges at `delta ≤ gap`
  * (split strictly beyond), while `session_window`'s window end is
  * exclusive (split AT `delta = gap`). The gap is therefore widened by
  * exactly 1 µs — the event-time resolution — making the two
  * formulations merge on identical µs-level deltas; the parity spec
  * pins the exact-gap edge on both sides.
  *
  * Rows later than `watermarkDelay` are dropped by the engine (the
  * documented lateness contract, same as [[ContinuousAggregate]]);
  * in-order data reproduces the batch kernel's sessions exactly — the
  * spec pins both. Works identically on batch inputs (`withWatermark`
  * is a no-op there), which is what the batch-parity spec leans on.
  */
object StreamingSessionize {

  /** One row per closed session: the key, the session window, its
    * event count, and the µs-floor start second (`session_start_s`,
    * same convention as the batch `q_sessionize` output). `ts` may be
    * TIMESTAMP_NTZ (the testdata's parquet shape) — it is routed
    * through a timestamp cast, exact under the pinned-UTC session. */
  def sessions(events: DataFrame, ts: String, key: String,
      gapSeconds: Long, watermarkDelay: String = "10 minutes"): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds=$gapSeconds must be >= 1")
    // gap + 1 µs: batch merges at delta <= gap, session_window's
    // exclusive end splits there — widen by one event-time tick
    val gapUs = gapSeconds * 1000000L + 1L
    events
      .select(col(key), col(ts).cast("timestamp").as("evt_ts"))
      .withWatermark("evt_ts", watermarkDelay)
      .groupBy(col(key),
        session_window(col("evt_ts"), s"$gapUs microseconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        expr("unix_micros(min(evt_ts)) div 1000000").as("session_start_s"))
      .select(col(key), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"),
        col("session_start_s"))
  }
}
