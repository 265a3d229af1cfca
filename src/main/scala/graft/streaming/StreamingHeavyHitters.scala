package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the stream-side of
  * [[graft.operators.TextAnalysis.heavyHitters]]: per `(group, tumbling
  * window)`, a Misra–Gries summary folds in state and the surviving
  * candidates are emitted ONCE when the watermark seals the window.
  *
  * The batch operator can afford the exact two-phase recount; a stream
  * cannot re-scan its past, so emissions carry the MG guarantee
  * instead: state is at most `capacity` counters — O(capacity), never
  * O(vocabulary) — `count_min ≤ true ≤ count_max = count_min +
  * decrements`, and EVERY item with true frequency > n_rows/(capacity+1)
  * is guaranteed to survive (a frequency that large cannot be
  * decremented away). Items failing the bound may be absent; the ones
  * emitted are never phantoms (count_min > 0 means the item occurred).
  *
  * Determinism: rows fold in `(epochUs, id)` order (spec-pinned, the
  * [[StreamingAnomaly]] discipline), so the summary is reproducible
  * under any micro-batch arrival order; the decrement step removes
  * exhausted counters in one sweep.
  */
object StreamingHeavyHitters {

  case class Item(group: String, epochUs: Long, id: Long, token: String)

  case class WinKey(group: String, windowStartS: Long)

  case class Mg(counts: Map[String, Long], decrements: Long, nRows: Long)

  case class Hitter(group: String, windowStartS: Long, token: String,
      countMin: Long, countMax: Long, nRows: Long, guaranteed: Boolean)

  /** One Misra–Gries fold — exposed for specs and batch cross-checks. */
  def fold(st: Mg, token: String, capacity: Int): Mg = {
    val c = st.counts
    if (c.contains(token))
      st.copy(counts = c.updated(token, c(token) + 1L), nRows = st.nRows + 1)
    else if (c.size < capacity)
      st.copy(counts = c.updated(token, 1L), nRows = st.nRows + 1)
    else {
      // decrement-all: drop exhausted counters in the same sweep
      val dec = c.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      Mg(dec, st.decrements + 1L, st.nRows + 1)
    }
  }

  private def handle(key: WinKey, rows: Iterator[Item],
      state: GroupState[Mg], capacity: Int, windowS: Long,
      latenessMs: Long): Iterator[Hitter] = {
    if (state.hasTimedOut) {
      val m = state.getOption.getOrElse(Mg(Map.empty, 0L, 0L))
      state.remove()
      val bar = m.nRows / (capacity + 1L)
      return m.counts.toSeq.sortBy { case (t, n) => (-n, t) }.iterator
        .map { case (t, n) =>
          // certification must use the LOWER bound: countMin > bar means
          // the true count provably exceeds the threshold; testing the
          // upper bound would certify almost every survivor (decrements
          // <= bar always), making the flag meaningless
          Hitter(key.group, key.windowStartS, t, n, n + m.decrements,
            m.nRows, n > bar)
        }
    }
    var m = state.getOption.getOrElse(Mg(Map.empty, 0L, 0L))
    rows.toSeq.sortBy(i => (i.epochUs, i.id))
      .foreach(i => m = fold(m, i.token, capacity))
    state.update(m)
    state.setTimeoutTimestamp(
      (key.windowStartS + windowS) * 1000L + latenessMs)
    Iterator.empty
  }

  /** Monitor a token stream: per `(group, windowS tumbling window)`,
    * at most `capacity` counters of state; sealed windows emit their
    * surviving candidates with MG count bounds. */
  def monitor(items: Dataset[Item], capacity: Int = 16,
      windowS: Long = 3600L, watermarkDelay: String = "10 seconds",
      latenessMs: Long = 0L): Dataset[Hitter] = {
    require(capacity >= 1, "capacity must be >= 1")
    implicit val keyEnc = Encoders.product[WinKey]
    implicit val outEnc = Encoders.product[Hitter]
    implicit val stEnc = Encoders.kryo[Mg]
    implicit val evEnc = Encoders.product[Item]
    val wm = items
      .withColumn("__ts", timestamp_micros(col("epochUs")))
      .withWatermark("__ts", watermarkDelay).as[Item]
    wm.groupByKey { i =>
      val s = i.epochUs / 1000000L
      WinKey(i.group, s - java.lang.Math.floorMod(s, windowS))
    }.flatMapGroupsWithState[Mg, Hitter](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (k, rows, st) => handle(k, rows, st, capacity, windowS, latenessMs)
    }
  }
}
