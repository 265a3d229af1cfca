package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC latest-wins apply — the stream-side of
  * [[graft.queries.Warehouse.cdcLatestWins]]: a changelog stream folds
  * into per-key current state, each micro-batch emitting the keys whose
  * state CHANGED (an upsert row, or a tombstone marker when the newest
  * record is a delete — the signal a downstream sink needs to retract).
  *
  * Ordering is the batch operator's exactly: the record with the
  * greatest `(epochUs, rowId)` wins, applied cross-batch — a late-
  * arriving OLDER record in a later micro-batch can never overwrite
  * newer state (the guarantee a naive `foreachBatch` upsert loses the
  * moment batches interleave out of order). State per key is ONE
  * payload — O(keys) total — with optional event-time TTL against the
  * watermark for keys that stop changing.
  *
  * Batch/stream equivalence is spec-pinned: replaying any prefix of the
  * changelog and taking each key's LAST emission yields exactly
  * [[graft.queries.Warehouse.cdcLatestWins]] of that prefix (tombstoned
  * keys appearing as `deleted = true` rows instead of being absent —
  * streams must say "gone", not fall silent).
  */
object StreamingCdc {

  case class Change(key: Long, epochUs: Long, rowId: Long,
      deleted: Boolean, attr: String, value: Double)

  case class Latest(epochUs: Long, rowId: Long, deleted: Boolean,
      attr: String, value: Double)

  case class Snapshot(key: Long, lastTsS: Long, lastRowId: Long,
      deleted: Boolean, attr: String, value: Double)

  private def fold(key: Long, rows: Iterator[Change],
      state: GroupState[Latest], ttlMs: Long,
      eventTimeTtl: Boolean): Iterator[Snapshot] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val prev = state.getOption
    def newer(tsA: Long, idA: Long, tsB: Long, idB: Long): Boolean =
      tsA > tsB || (tsA == tsB && idA > idB)
    // newest record of the batch for this key — same (ts, rowId) order
    // as the batch max_by
    val top = rows.reduceLeft { (a, b) =>
      if (newer(b.epochUs, b.rowId, a.epochUs, a.rowId)) b else a
    }
    val next =
      if (prev.forall(p => newer(top.epochUs, top.rowId, p.epochUs, p.rowId)))
        Latest(top.epochUs, top.rowId, top.deleted, top.attr, top.value)
      else prev.get
    val changed = !prev.contains(next)
    state.update(next)
    if (eventTimeTtl && ttlMs > 0)
      state.setTimeoutTimestamp(next.epochUs / 1000L + ttlMs)
    if (changed)
      Iterator.single(Snapshot(key, next.epochUs / 1000000L, next.rowId,
        next.deleted, next.attr, next.value))
    else Iterator.empty
  }

  /** Fold a changelog stream into per-key state; emits one row per key
    * per micro-batch IF its state changed. `watermarkDelay` enables the
    * event-time TTL (idle keys past `ttlMs` are dropped, like every
    * stateful operator here). */
  def apply(changes: Dataset[Change], ttlMs: Long = 24L * 3600 * 1000,
      watermarkDelay: Option[String] = None): Dataset[Snapshot] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Snapshot]
    implicit val stEnc = Encoders.kryo[Latest]
    implicit val evEnc = Encoders.product[Change]
    val (src, timeoutConf) = watermarkDelay match {
      case Some(delay) =>
        val wm = changes
          .withColumn("__ts", timestamp_micros(col("epochUs")))
          .withWatermark("__ts", delay).as[Change]
        (wm, GroupStateTimeout.EventTimeTimeout)
      case None => (changes, GroupStateTimeout.NoTimeout)
    }
    val eventTimeTtl = watermarkDelay.isDefined
    src.groupByKey(_.key)
      .flatMapGroupsWithState[Latest, Snapshot](
        OutputMode.Append, timeoutConf) {
        (k, rows, st) => fold(k, rows, st, ttlMs, eventTimeTtl)
      }
  }
}
