package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-fill with LOCF — the live form of
  * [[graft.queries.TimeSeries.gapfillLocf]]: per-key time buckets
  * (`max` + count) emitted once the WATERMARK passes the bucket's end,
  * with every skipped bucket between two observations emitted as a
  * carried-forward fill (`n = 0`, `filled = true`) — the continuously
  * maintained dashboard spine TimescaleDB's
  * `time_bucket_gapfill … locf` serves from a materialized view.
  *
  * Emission contract (spec-pinned): a bucket row is emitted EXACTLY once,
  * in bucket order per key, only after the watermark guarantees no more
  * observations can join it (late rows inside the delay still merge
  * into their pending bucket); the concatenated output per key equals
  * the batch operator over the same observations, prefix by prefix.
  *
  * Scale shape: state per key is the last finalized bucket's value plus
  * the PENDING buckets still inside the watermark horizon — bounded by
  * `delay / bucketSeconds` entries, independent of row count (rows fold
  * into per-bucket (max, n) on arrival). Gap rows materialize only
  * between finalized observations, so an idle key emits nothing and
  * costs nothing; keys idle past `ttlMs` of event time drop their state
  * entirely (EventTimeTimeout). One groupByKey exchange, like every
  * stateful operator here.
  */
object StreamingGapfill {

  case class Event(key: Long, epochUs: Long, value: Double)

  case class BucketAgg(bucket: Long, vMax: Double, n: Long)

  case class GapState(hasLast: Boolean, lastBucket: Long, lastValue: Double,
      pending: List[BucketAgg], lastSeenUs: Long)

  case class FilledRow(key: Long, bucketS: Long, valueLocf: Double,
      n: Long, filled: Boolean)

  private def finalizeDue(key: Long, st: GapState, bucketSeconds: Long,
      watermarkMs: Long): (GapState, Seq[FilledRow]) = {
    // a bucket [b, b+W) is final once the watermark passed its end
    val (due, still) = st.pending.sortBy(_.bucket)
      .partition(b => (b.bucket + bucketSeconds) * 1000L <= watermarkMs)
    var s = st
    val out = Seq.newBuilder[FilledRow]
    due.foreach { b =>
      if (s.hasLast) {
        var g = s.lastBucket + bucketSeconds
        while (g < b.bucket) {
          out += FilledRow(key, g, s.lastValue, 0L, filled = true)
          g += bucketSeconds
        }
      }
      out += FilledRow(key, b.bucket, b.vMax, b.n, filled = false)
      s = s.copy(hasLast = true, lastBucket = b.bucket, lastValue = b.vMax)
    }
    (s.copy(pending = still), out.result())
  }

  private def fillGroup(key: Long, rows: Iterator[Event],
      state: GroupState[GapState], bucketSeconds: Long, ttlMs: Long)
      : Iterator[FilledRow] = {
    val wm = state.getCurrentWatermarkMs
    if (state.hasTimedOut) {
      val (s2, out) = finalizeDue(key, state.get, bucketSeconds, wm)
      if (s2.pending.isEmpty &&
          s2.lastSeenUs / 1000 + ttlMs <= wm) state.remove()
      else {
        state.update(s2)
        val next =
          if (s2.pending.nonEmpty) wm + 1
          else s2.lastSeenUs / 1000 + ttlMs
        state.setTimeoutTimestamp(math.max(next, wm + 1))
      }
      return out.iterator
    }
    var s = state.getOption
      .getOrElse(GapState(hasLast = false, 0L, 0.0, Nil, Long.MinValue))
    // fold new rows into their pending buckets
    val merged = new scala.collection.mutable.HashMap[Long, BucketAgg]
    s.pending.foreach(b => merged(b.bucket) = b)
    rows.foreach { e =>
      val b = (e.epochUs / 1000000L / bucketSeconds) * bucketSeconds
      val cur = merged.get(b)
      merged(b) = cur match {
        case Some(a) => BucketAgg(b, math.max(a.vMax, e.value), a.n + 1)
        case None => BucketAgg(b, e.value, 1L)
      }
      s = s.copy(lastSeenUs = math.max(s.lastSeenUs, e.epochUs))
    }
    s = s.copy(pending = merged.values.toList)
    val (s2, out) = finalizeDue(key, s, bucketSeconds, wm)
    state.update(s2)
    // re-arm: fire as the watermark moves past pending buckets, or expire
    // the idle key at lastSeen + ttl
    val next =
      if (s2.pending.nonEmpty) wm + 1
      else s2.lastSeenUs / 1000 + ttlMs
    state.setTimeoutTimestamp(math.max(next, wm + 1))
    out.iterator
  }

  /** Fill the stream; requires an event-time watermark (`delay`), which
    * both finalizes buckets and drives state expiry (`ttlMs` of key
    * event-time inactivity; must exceed the delay). */
  def fill(events: Dataset[Event], bucketSeconds: Long, delay: String,
      ttlMs: Long = 24L * 3600 * 1000): Dataset[FilledRow] = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[FilledRow]
    implicit val stEnc = Encoders.kryo[GapState]
    implicit val evEnc = Encoders.product[Event]
    val wm = events
      .withColumn("__ts", timestamp_micros(col("epochUs")))
      .withWatermark("__ts", delay).as[Event]
    wm.groupByKey(_.key)
      .flatMapGroupsWithState[GapState, FilledRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k, rows, st) => fillGroup(k, rows, st, bucketSeconds, ttlMs)
      }
  }
}
