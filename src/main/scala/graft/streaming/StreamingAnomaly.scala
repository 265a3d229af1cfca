package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly scoring — the stream-side of
  * [[graft.queries.TimeSeries.anomalyZScore]]: each event scored against
  * its key's running statistics BEFORE being folded in (so an outlier
  * never dilutes the evidence that flags it), with the same
  * minimum-evidence and variance gates as the batch operator: fewer than
  * `minPrior` priors or a degenerate σ emit NULL z, never a false flag.
  *
  * State per key is three numbers — count, exact micro-quantized sum, and
  * sum of squares — NOT a sample buffer: O(keys) state total, exact and
  * arrival-order-independent within a micro-batch (events are folded in
  * `(epochUs, id)` order, spec-pinned). Sums are kept in BigDecimal over
  * 1e-6-quantized values, so the running moments are EXACT — no float
  * drift however long the stream runs — and expire after `ttlMs` of
  * event-time key inactivity against the watermark, like every stateful
  * operator in this engine (EventTimeTimeout: no busy-work batches on an
  * idle stream).
  *
  * Batch/stream difference (documented, spec-pinned): the batch operator
  * scores against a trailing time WINDOW; the stream scores against the
  * whole retained history of the key (bounded by the TTL). Both are
  * standard shapes — the window needs the past rows, the stream keeps
  * only moments.
  */
object StreamingAnomaly {

  case class Event(key: Long, epochUs: Long, id: Long, value: Double)

  /** Running moments — exact unscaled integers: `sumQ6` is the value sum
    * at scale 6 (a long: 9e12 rows of unit-scale values before overflow),
    * `sumSqQ12` the square sum at scale 12 (BigInt: never overflows). */
  case class Moments(n: Long, sumQ6: Long, sumSqQ12: BigInt,
      lastSeenUs: Long)

  case class Scored(id: Long, key: Long, epochUs: Long, value: Double,
      z: Option[Double], anomaly: Boolean)

  private val Q6 = 1000000L

  /** Quantize to 1e-6 — one deterministic rounding per value, the same
    * grid the batch decimal casts use. */
  private def q6(v: Double): Long = math.rint(v * Q6).toLong

  private def scoreGroup(key: Long, rows: Iterator[Event],
      state: GroupState[Moments], threshold: Double, minPrior: Int,
      ttlMs: Long, eventTimeTtl: Boolean): Iterator[Scored] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var m = state.getOption.getOrElse(Moments(0L, 0L, BigInt(0), Long.MinValue))
    val out = Seq.newBuilder[Scored]
    rows.toSeq.sortBy(e => (e.epochUs, e.id)).foreach { e =>
      val z =
        if (m.n < minPrior) None
        else {
          val n = m.n.toDouble
          // exact decimals → one double rounding each, then fixed-order
          // double combine (the batch operator's shape)
          val mean = BigDecimal(BigInt(m.sumQ6), 6).toDouble / n
          val meanSq = BigDecimal(m.sumSqQ12, 12).toDouble / n
          val variance = meanSq - mean * mean
          if (variance > 0.0) Some((e.value - mean) / math.sqrt(variance))
          else None
        }
      out += Scored(e.id, key, e.epochUs, e.value, z,
        z.exists(v => math.abs(v) >= threshold))
      val vq = q6(e.value)
      m = Moments(m.n + 1, m.sumQ6 + vq,
        m.sumSqQ12 + BigInt(vq) * BigInt(vq),
        math.max(m.lastSeenUs, e.epochUs))
    }
    state.update(m)
    if (eventTimeTtl)
      state.setTimeoutTimestamp(
        math.max(m.lastSeenUs / 1000 + ttlMs, state.getCurrentWatermarkMs + 1))
    out.result().iterator
  }

  /** Score the stream. `watermarkDelay` Some(d): streaming mode with
    * event-time TTL state expiry (`ttlMs` must exceed the delay); None:
    * batch mode, no expiry — the form the batch-parity spec runs. */
  def score(events: Dataset[Event], threshold: Double = 2.0,
      minPrior: Int = 3, ttlMs: Long = 24L * 3600 * 1000,
      watermarkDelay: Option[String] = None): Dataset[Scored] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Scored]
    implicit val stEnc = Encoders.kryo[Moments]
    implicit val evEnc = Encoders.product[Event]
    val (src, timeoutConf) = watermarkDelay match {
      case Some(delay) =>
        val wm = events
          .withColumn("__ts", timestamp_micros(col("epochUs")))
          .withWatermark("__ts", delay).as[Event]
        (wm, GroupStateTimeout.EventTimeTimeout)
      case None => (events, GroupStateTimeout.NoTimeout)
    }
    val eventTimeTtl = watermarkDelay.isDefined
    src.groupByKey(_.key)
      .flatMapGroupsWithState[Moments, Scored](
        OutputMode.Append, timeoutConf) {
        (k, rows, st) =>
          scoreGroup(k, rows, st, threshold, minPrior, ttlMs, eventTimeTtl)
      }
  }
}
