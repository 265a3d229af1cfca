package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stream-side of
  * [[graft.queries.TimeSeries.asofJoin]]: a probe stream enriched with the
  * most recent at-or-before reference value per key (sensor calibration,
  * price lookup), a join Structured Streaming's native stream-stream joins
  * cannot express (they support interval equality/range predicates, not
  * "greatest timestamp ≤ t").
  *
  * Both sides arrive on ONE unioned stream of [[StreamingAsof.Event]]
  * (`side` 0 = reference, 1 = probe), keyed by `key`. Per key we retain a
  * single piece of state — the latest reference `(epochUs, value)` — and
  * each micro-batch is processed in `(epochUs, side)` order, so references
  * sort before probes at equal timestamps and the match is
  * at-or-before INCLUSIVE, exactly the batch operator's tie rule.
  *
  * Delivery semantics (documented, spec-pinned): enrichment is at-ingest —
  * a probe is answered from the state known when its batch is processed.
  * Under in-order arrival this equals the batch as-of join; a reference
  * arriving LATER than a probe it should have served cannot retroactively
  * rewrite the emitted row (append mode), a reference older than the
  * retained one never regresses state, and a probe older than the
  * retained reference emits NULL rather than guessing (the true answer
  * was already superseded).
  *
  * Scale shape: state is ONE (long, double) per active key — O(keys), not
  * O(rows) — and expires after `ttlMs` of key inactivity measured in
  * EVENT time against the stream's watermark (EventTimeTimeout), so an
  * unbounded key universe (the 100 TB stream) cannot accrete unbounded
  * state; expiry is data-driven and replay-deterministic, and an idle
  * stream schedules no busy-work batches (ProcessingTimeTimeout would).
  * The only shuffle is the `groupByKey` exchange every stateful operator
  * needs.
  */
object StreamingAsof {

  /** One unioned input row; `side` 0 = reference (carries `value`),
    * 1 = probe (carries `probeId`). */
  case class Event(key: Long, epochUs: Long, side: Int, probeId: Long,
      value: Double)

  /** Latest reference per key + its last activity (for event-time TTL). */
  case class RefState(refUs: Long, refValue: Double, lastSeenUs: Long)

  /** One enriched probe; `asofValue` None when no usable reference. */
  case class Enriched(probeId: Long, key: Long, epochUs: Long,
      asofValue: Option[Double])

  /** Union helper: tag a reference stream. */
  def ref(key: Long, epochUs: Long, value: Double): Event =
    Event(key, epochUs, 0, -1L, value)

  /** Union helper: tag a probe stream. */
  def probe(key: Long, epochUs: Long, probeId: Long): Event =
    Event(key, epochUs, 1, probeId, 0.0)

  private def enrichGroup(key: Long, rows: Iterator[Event],
      state: GroupState[RefState], ttlMs: Long,
      eventTimeTtl: Boolean): Iterator[Enriched] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var ref = state.getOption
    var lastSeenUs = ref.map(_.lastSeenUs).getOrElse(Long.MinValue)
    val out = Seq.newBuilder[Enriched]
    // micro-batch order: references before probes at equal timestamps —
    // the batch operator's (epochUs, side) tie rule
    rows.toSeq.sortBy(e => (e.epochUs, e.side)).foreach { e =>
      lastSeenUs = math.max(lastSeenUs, e.epochUs)
      if (e.side == 0) {
        if (ref.forall(_.refUs <= e.epochUs))
          ref = Some(RefState(e.epochUs, e.value, 0L))
      } else {
        val v = ref.filter(_.refUs <= e.epochUs).map(_.refValue)
        out += Enriched(e.probeId, key, e.epochUs, v)
      }
    }
    ref.foreach(r => state.update(r.copy(lastSeenUs = lastSeenUs)))
    if (eventTimeTtl && state.exists)
      // fire once the watermark passes last key activity + ttl; the +1
      // guard keeps the timestamp legal for late (within-delay) activity
      state.setTimeoutTimestamp(
        math.max(lastSeenUs / 1000 + ttlMs, state.getCurrentWatermarkMs + 1))
    out.result().iterator
  }

  /** Enrich the unioned stream.
    *
    * `watermarkDelay` Some(d): streaming mode — a watermark on the event
    * time drives state expiry at `ttlMs` of EVENT-time key inactivity
    * (`ttlMs` must exceed the delay so timeout timestamps stay ahead of
    * the watermark). None: no watermark and no expiry — the batch mode
    * the equivalence spec runs, where `enrich` equals the batch as-of
    * join on in-order data. */
  def enrich(events: Dataset[Event], ttlMs: Long = 24L * 3600 * 1000,
      watermarkDelay: Option[String] = None): Dataset[Enriched] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stEnc = Encoders.product[RefState]
    implicit val evEnc = Encoders.product[Event]
    val (src, timeoutConf) = watermarkDelay match {
      case Some(delay) =>
        // the extra __ts column rides along; the Event encoder binds by
        // name and ignores it
        val wm = events
          .withColumn("__ts", timestamp_micros(col("epochUs")))
          .withWatermark("__ts", delay).as[Event]
        (wm, GroupStateTimeout.EventTimeTimeout)
      case None => (events, GroupStateTimeout.NoTimeout)
    }
    val eventTimeTtl = watermarkDelay.isDefined
    src.groupByKey(_.key)
      .flatMapGroupsWithState[RefState, Enriched](
        OutputMode.Append, timeoutConf) {
        (k, rows, st) => enrichGroup(k, rows, st, ttlMs, eventTimeTtl)
      }
  }
}
