package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming PSI drift monitor — the stream-side of
  * [[graft.queries.Warehouse.distributionDrift]]: each `(group, tumbling
  * window)` accumulates a value histogram in state and, when the
  * watermark closes the window, emits the Population Stability Index of
  * that window's distribution against a FROZEN reference histogram
  * (trained offline, passed in as a plain map — the standard drift-
  * monitoring deployment: reference from the training corpus, live
  * windows scored as they seal).
  *
  * The PSI arithmetic is the batch operator's, verbatim: add-one
  * smoothing over the UNION of observed and reference bins, integer
  * parts-per-10⁹ probabilities by truncating division, signed
  * quarter-bit log ratios ([[graft.functions.FixedLogImpl]]), so the
  * emitted `psiQ` is a BIGINT any engine reproduces, and stream == batch
  * on the same window's rows is a spec identity, not a tolerance.
  *
  * State per live `(group, window)` key is the bin→count map — O(bins),
  * not O(rows) — and is freed the moment the window seals
  * (EventTimeTimeout at window end + allowed lateness; late stragglers
  * past the watermark are dropped by the watermark itself, the same
  * contract as every watermarked aggregate here).
  */
object StreamingDrift {

  case class Event(group: String, epochUs: Long, value: Double)

  case class WinKey(group: String, windowStartS: Long)

  case class Hist(counts: Map[Long, Long])

  case class Drift(group: String, windowStartS: Long, nRows: Long,
      nBins: Long, psiQ: Long, psiBits: Double)

  private val Scale = 1000000000L

  /** The batch formula on two in-memory histograms — exposed so specs
    * (and foreachBatch recalibration jobs) can call the identical
    * arithmetic the state handler emits. */
  def psiQ(obs: Map[Long, Long], ref: Map[Long, Long]): (Long, Long) = {
    val bins = (obs.keySet ++ ref.keySet).toSeq.sorted
    val nb = bins.size.toLong
    val totObs = obs.valuesIterator.sum + nb
    val totRef = ref.valuesIterator.sum + nb
    var acc = 0L
    bins.foreach { b =>
      val p = math.max(1L, (obs.getOrElse(b, 0L) + 1L) * Scale / totObs)
      val q = math.max(1L, (ref.getOrElse(b, 0L) + 1L) * Scale / totRef)
      // p, q >= 1 by the floor, so the kernel never returns null here
      val qlb =
        if (p >= q)
          graft.functions.FixedLogImpl.log2QuarterBits(q, p).longValue()
        else
          -graft.functions.FixedLogImpl.log2QuarterBits(p, q).longValue()
      acc += (p - q) * qlb
    }
    (acc, nb)
  }

  private def handle(key: WinKey, rows: Iterator[Event],
      state: GroupState[Hist], binWidth: Double, windowS: Long,
      latenessMs: Long, ref: Map[Long, Long]): Iterator[Drift] = {
    if (state.hasTimedOut) {
      // window sealed: score the accumulated histogram and release
      val h = state.getOption.map(_.counts).getOrElse(Map.empty)
      state.remove()
      val (q, nb) = psiQ(h, ref)
      return Iterator.single(Drift(key.group, key.windowStartS,
        h.valuesIterator.sum, nb, q, q.toDouble / (4.0 * Scale)))
    }
    var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
    rows.foreach { e =>
      val bin = math.floor(e.value / binWidth).toLong
      counts = counts.updated(bin, counts.getOrElse(bin, 0L) + 1L)
    }
    state.update(Hist(counts))
    // seal when the watermark passes window end + allowed lateness
    state.setTimeoutTimestamp(
      (key.windowStartS + windowS) * 1000L + latenessMs)
    Iterator.empty
  }

  /** Score a typed event stream: tumbling `windowS`-second windows per
    * group, watermarked by `watermarkDelay`, each sealed window emitted
    * once with its PSI against `reference` (bin → count, same
    * `binWidth` grid). */
  def monitor(events: Dataset[Event], reference: Map[Long, Long],
      binWidth: Double, windowS: Long = 3600L,
      watermarkDelay: String = "10 seconds",
      latenessMs: Long = 0L): Dataset[Drift] = {
    implicit val keyEnc = Encoders.product[WinKey]
    implicit val outEnc = Encoders.product[Drift]
    implicit val stEnc = Encoders.kryo[Hist]
    implicit val evEnc = Encoders.product[Event]
    val wm = events
      .withColumn("__ts", timestamp_micros(col("epochUs")))
      .withWatermark("__ts", watermarkDelay).as[Event]
    wm.groupByKey { e =>
      val s = e.epochUs / 1000000L
      WinKey(e.group, s - java.lang.Math.floorMod(s, windowS))
    }.flatMapGroupsWithState[Hist, Drift](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (k, rows, st) =>
        handle(k, rows, st, binWidth, windowS, latenessMs, reference)
    }
  }
}
