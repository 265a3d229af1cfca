package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.TimeSeries
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{Event => FEvent}

/** Streaming funnel: exactly-once step completions, strictly-after
  * ladder semantics across micro-batches, batch-operator parity on
  * in-order data, and event-time TTL expiry. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("signup", "activate", "purchase")

  test("cross-batch ladder: strictly-after, exactly-once, TTL expiry") {
    implicit val sqlCtx = spark.sqlContext
    def s(sec: Long) = sec * 1000000L
    val input = MemoryStream[FEvent]
    val out = StreamingFunnel.track(input.toDS(), steps,
      ttlMs = 3600L * 1000, watermarkDelay = Some("0 seconds"))
    val cp = Files.createTempDirectory("graft_sfun").toString
    val q = out.writeStream.format("memory").queryName("sfun_out")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      // batch 1: activate BEFORE signup (same batch, later ts wins the
      // fold order): signup@10 completes step 0, activate@5 precedes it
      // and must NOT count; activate@20 completes step 1
      input.addData(
        FEvent(1L, s(5), 1L, "activate"),
        FEvent(1L, s(10), 2L, "signup"),
        FEvent(1L, s(20), 3L, "activate"),
        FEvent(1L, s(20), 4L, "activate")) // second qualifying: ignored
      q.processAllAvailable()
      // batch 2 (state carried): purchase completes; a replayed signup
      // must not re-emit step 0
      input.addData(
        FEvent(1L, s(30), 5L, "purchase"),
        FEvent(1L, s(31), 6L, "signup"))
      q.processAllAvailable()
      val got = spark.table("sfun_out").as[StreamingFunnel.StepCompleted]
        .collect().sortBy(_.step)
      assert(got.map(c => (c.step, c.eventType, c.epochUs)).toSeq ==
        Seq((0, "signup", s(10)), (1, "activate", s(20)),
          (2, "purchase", s(30))), got.toSeq)
      // TTL: unrelated-key traffic pushes the watermark past key 1's TTL;
      // afterwards key 1 starts a fresh ladder (step 0 re-emits)
      input.addData(FEvent(99L, s(99000), 7L, "signup"))
      q.processAllAvailable()
      input.addData(FEvent(99L, s(99010), 8L, "signup"))
      q.processAllAvailable()
      input.addData(FEvent(1L, s(99020), 9L, "signup"))
      q.processAllAvailable()
      val again = spark.table("sfun_out").as[StreamingFunnel.StepCompleted]
        .collect().filter(c => c.key == 1L && c.step == 0)
      assert(again.map(_.epochUs).sorted.toSeq == Seq(s(10), s(99020)),
        s"expired key must start a fresh ladder: ${again.toSeq}")
    } finally q.stop()
  }

  test("repeated step names: every ladder position of the type completes") {
    // view → click → view: a legal funnel; one event may complete several
    // of its positions, and position 0 must not be stranded by position 2
    val ladder = Seq("view", "click", "view")
    val evts = Seq(
      FEvent(1L, 1000000L, 1L, "view"),   // completes step 0
      FEvent(1L, 2000000L, 2L, "click"),  // completes step 1
      FEvent(1L, 3000000L, 3L, "view")    // completes step 2
    ).toDS()
    val got = StreamingFunnel.track(evts, ladder)
      .collect().sortBy(_.step).map(c => (c.step, c.epochUs)).toSeq
    assert(got == Seq((0, 1000000L), (1, 2000000L), (2, 3000000L)), got)
    // and parity with the batch operator on the same data
    val batchDf = evts.toDF()
      .select(col("key").as("user_id"),
        timestamp_micros(col("epochUs")).as("ts"),
        col("eventType").as("event_type"))
    val batch = TimeSeries.funnel(batchDf, "ts", "user_id", "event_type",
        ladder)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(batch == Map(0 -> 1L, 1 -> 1L, 2 -> 1L), batch)
  }

  test("counts zero-fills steps no key reached (batch output shape)") {
    val evts = Seq(FEvent(1L, 1000000L, 1L, "signup")).toDS()
    val completions = StreamingFunnel.track(evts, steps).toDF()
    val got = StreamingFunnel.counts(completions, steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((0, "signup", 1L), (1, "activate", 0L),
      (2, "purchase", 0L)), got)
  }

  test("batch parity: streamed completions == TimeSeries.funnel counts") {
    // deterministic pseudo-random event soup over 40 users
    val evts = (0 until 400).map { i =>
      val user = (i * 7919) % 40
      val typ = steps((i * 104729) % 5 match {
        case 0 => 0; case 1 => 1; case 2 => 2; case _ => (i % 3)
      })
      FEvent(user.toLong, (i * 1000L + user) * 1000000L, i.toLong, typ)
    }
    val streamed = StreamingFunnel.track(evts.toDS(), steps)
    val streamCounts = StreamingFunnel.counts(streamed.toDF(), steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val batchDf = evts.toDF()
      .select(col("key").as("user_id"),
        timestamp_micros(col("epochUs")).as("ts"),
        col("eventType").as("event_type"))
    val batch = TimeSeries.funnel(batchDf, "ts", "user_id", "event_type", steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(streamCounts == batch,
      s"stream $streamCounts != batch $batch")
  }
}
