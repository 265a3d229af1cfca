package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{coalesce, col, countDistinct, lit, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the stream-side of
  * [[graft.queries.TimeSeries.funnel]]: per key, step `i` first-completes
  * at the earliest event of `steps(i)` STRICTLY AFTER step `i-1`'s
  * completion; each first completion is emitted exactly once, as it
  * happens, instead of recomputed over the full corpus per query.
  *
  * Equivalence (spec-pinned): for in-order delivery the emitted ladder is
  * exactly the batch operator's `__t_i` values — a fold over events in
  * `(epochUs, id)` order computes `min(ts of step_i > t_{i-1})` directly,
  * because the first qualifying event in time order IS that min. A late
  * event (delivered after a later-timestamped one, across batches) can
  * only MISS a completion the batch form would count — it can never
  * corrupt one already emitted; bound lateness with the watermark like
  * every stateful operator here.
  *
  * State per key is `steps.length` longs + a last-seen stamp — O(keys)
  * total, expiring after `ttlMs` of event-time inactivity against the
  * watermark (EventTimeTimeout: an idle stream does no busy work). */
object StreamingFunnel {

  case class Event(key: Long, epochUs: Long, id: Long, eventType: String)

  /** Per-key ladder: `tUs(i)` = step i's completion time, MinValue if
    * not yet completed. */
  case class Ladder(tUs: Array[Long], lastSeenUs: Long)

  case class StepCompleted(key: Long, step: Int, eventType: String,
      epochUs: Long)

  private def foldGroup(key: Long, rows: Iterator[Event],
      state: GroupState[Ladder], steps: Seq[String], ttlMs: Long,
      eventTimeTtl: Boolean): Iterator[StepCompleted] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st = state.getOption.getOrElse(
      Ladder(Array.fill(steps.length)(Long.MinValue), Long.MinValue))
    val t = st.tUs.clone()
    var lastSeen = st.lastSeenUs
    // ALL ladder positions of an event type, ascending — a funnel may
    // legally repeat a step name (view → click → view), and one event
    // can complete several of its positions (the batch operator's
    // per-level conditions do exactly that); a name→single-index map
    // would strand every earlier duplicate position forever
    val stepsOf: Map[String, Seq[Int]] =
      steps.zipWithIndex.groupBy(_._1).map { case (s, xs) =>
        s -> xs.map(_._2).sorted
      }
    val out = Seq.newBuilder[StepCompleted]
    rows.toSeq.sortBy(e => (e.epochUs, e.id)).foreach { e =>
      lastSeen = math.max(lastSeen, e.epochUs)
      stepsOf.getOrElse(e.eventType, Nil).foreach { i =>
        val prevDone = i == 0 || t(i - 1) != Long.MinValue
        val strictlyAfter = i == 0 || e.epochUs > t(i - 1)
        if (t(i) == Long.MinValue && prevDone && strictlyAfter) {
          t(i) = e.epochUs
          out += StepCompleted(key, i, steps(i), e.epochUs)
        }
      }
    }
    state.update(Ladder(t, lastSeen))
    if (eventTimeTtl)
      state.setTimeoutTimestamp(
        math.max(lastSeen / 1000 + ttlMs, state.getCurrentWatermarkMs + 1))
    out.result().iterator
  }

  /** Track the funnel over an event stream. `watermarkDelay` Some(d):
    * streaming mode with event-time TTL expiry; None: batch mode, the
    * form the batch-parity spec runs. */
  def track(events: Dataset[Event], steps: Seq[String],
      ttlMs: Long = 24L * 3600 * 1000,
      watermarkDelay: Option[String] = None): Dataset[StepCompleted] = {
    require(steps.nonEmpty, "steps must be non-empty")
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[StepCompleted]
    implicit val stEnc = Encoders.kryo[Ladder]
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
      .flatMapGroupsWithState[Ladder, StepCompleted](
        OutputMode.Append, timeoutConf) {
        (k, rows, st) => foldGroup(k, rows, st, steps, ttlMs, eventTimeTtl)
      }
  }

  /** Collapse landed completions to the batch operator's output shape
    * `(step, event_type, n_keys)` — count of DISTINCT keys that reached
    * each step (a TTL-expired key that re-completes after its state
    * reset legitimately lands two completion records; it is still one
    * key), with an explicit `n_keys = 0` row for steps no key reached
    * (the batch operator always emits every step). */
  def counts(completions: DataFrame, steps: Seq[String]): DataFrame = {
    val spark = completions.sparkSession
    import spark.implicits._
    val spine = steps.zipWithIndex
      .map { case (s, i) => (i, s) }.toDF("step", "event_type")
    val got = completions.groupBy(col("step"))
      .agg(countDistinct(col("key")).as("n_got"))
    spine.join(got, Seq("step"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("n_got"), lit(0L)).as("n_keys"))
      .orderBy(col("step"))
  }
}
