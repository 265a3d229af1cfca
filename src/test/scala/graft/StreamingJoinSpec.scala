package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingJoin

/** Stream-stream interval join: batch parity on in-order data,
  * window-edge semantics, cross-batch matching (impression state must
  * survive until the purchase arrives), and bounded state via the
  * two-sided watermark eviction contract. */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def runStream(imps: Seq[(Long, Long)], buys: Seq[Seq[(Long, Long)]],
      windowS: Long): Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val iIn = MemoryStream[(Long, Timestamp)]
    val pIn = MemoryStream[(Long, Timestamp)]
    val out = StreamingJoin.attributedPurchases(
      iIn.toDF().toDF("user_id", "ts"), pIn.toDF().toDF("user_id", "ts"),
      windowS, watermarkDelay = "0 seconds")
    val cp = Files.createTempDirectory("graft_sjoin").toString
    val name = s"sjoin_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      iIn.addData(imps.map { case (u, s) => (u, ts(s)) })
      q.processAllAvailable()
      buys.foreach { batch =>
        pIn.addData(batch.map { case (u, s) => (u, ts(s)) })
        q.processAllAvailable()
      }
      spark.table(name).collect().map(r =>
        (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("imp_ts").getTime / 1000,
          r.getAs[Timestamp]("buy_ts").getTime / 1000,
          r.getAs[Long]("latency_s"))).toSeq.sorted
    } finally q.stop()
  }

  test("window-edge semantics + batch parity on in-order data") {
    // impressions for user 1 at t=100 and t=200; window 50s:
    //   buy@100 ties the open edge (match), buy@149 in-window,
    //   buy@150 exactly at the far edge (NO match vs imp@100),
    //   buy@240 matches imp@200 only
    val imps = Seq((1L, 100L), (1L, 200L), (2L, 100L))
    val buys = Seq((1L, 100L), (1L, 149L), (1L, 150L), (1L, 240L),
      (3L, 120L))
    val want = Seq(
      (1L, 100L, 100L, 0L), (1L, 100L, 149L, 49L),
      (1L, 200L, 240L, 40L)).sorted

    val got = runStream(imps, Seq(buys), windowS = 50)
    assert(got == want, s"stream: $got")

    // the SAME operator over batch frames must agree row-for-row
    val batch = StreamingJoin.attributedPurchases(
      imps.map { case (u, s) => (u, ts(s)) }.toDF("user_id", "ts"),
      buys.map { case (u, s) => (u, ts(s)) }.toDF("user_id", "ts"),
      windowS = 50)
      .collect().map(r =>
        (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("imp_ts").getTime / 1000,
          r.getAs[Timestamp]("buy_ts").getTime / 1000,
          r.getAs[Long]("latency_s"))).toSeq.sorted
    assert(batch == want, s"batch: $batch")
  }

  test("cross-batch: impression state persists until the purchase lands") {
    // purchase arrives two micro-batches after its impression — the
    // symmetric-hash state must still hold the impression
    val got = runStream(
      imps = Seq((7L, 1000L)),
      buys = Seq(Seq((8L, 1001L)), Seq((9L, 1002L)), Seq((7L, 1020L))),
      windowS = 60)
    assert(got == Seq((7L, 1000L, 1020L, 20L)), got)
  }

  test("left outer: non-converters emitted by watermark eviction, " +
    "not before") {
    implicit val sqlCtx = spark.sqlContext
    val iIn = MemoryStream[(Long, Timestamp)]
    val pIn = MemoryStream[(Long, Timestamp)]
    val out = StreamingJoin.attributionWithTimeout(
      iIn.toDF().toDF("user_id", "ts"), pIn.toDF().toDF("user_id", "ts"),
      windowS = 50, watermarkDelay = "0 seconds")
    val cp = Files.createTempDirectory("graft_sjoin_lo").toString
    val q = out.writeStream.format("memory").queryName("sjoin_lo")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      // user 1 converts; user 2 never does
      iIn.addData((1L, ts(100L)), (2L, ts(100L)))
      pIn.addData((1L, ts(120L)))
      q.processAllAvailable()
      val early = spark.table("sjoin_lo").collect()
      // user 2's NULL row must NOT appear yet — its window (ends 150)
      // is still ahead of the purchase-side watermark (120)
      assert(!early.exists(r => r.getAs[Long]("user_id") == 2L),
        early.toSeq.toString)
      // advance BOTH watermarks past 100+50 (the join's eviction clock
      // is the GLOBAL watermark — the min across inputs): the engine
      // now PROVES no match can arrive and emits the NULL row
      iIn.addData((8L, ts(400L)))
      pIn.addData((9L, ts(400L)))
      q.processAllAvailable()
      iIn.addData((8L, ts(401L))) // next batch so wm 400 takes effect
      pIn.addData((9L, ts(401L)))
      q.processAllAvailable()
      val rows = spark.table("sjoin_lo").collect()
        .map(r => (r.getAs[Long]("user_id"),
          Option(r.getAs[Timestamp]("buy_ts")).map(_.getTime / 1000)))
        .toSeq.sorted
      assert(rows.contains((1L, Some(120L))), rows.toString)
      assert(rows.contains((2L, None)), rows.toString)
    } finally q.stop()
  }

  test("left outer batch parity: unmatched impressions carry NULLs") {
    val got = StreamingJoin.attributionWithTimeout(
      Seq((1L, ts(100L)), (2L, ts(100L))).toDF("user_id", "ts"),
      Seq((1L, ts(120L)), (2L, ts(160L))).toDF("user_id", "ts"),
      windowS = 50)
      .collect().map(r => (r.getAs[Long]("user_id"),
        Option(r.getAs[Timestamp]("buy_ts")).map(_.getTime / 1000)))
      .toSeq.sorted
    // user 2's purchase at 160 misses the [100, 150) window
    assert(got == Seq((1L, Some(120L)), (2L, None)), got.toString)
  }

  test("stateful plan: the join is the built-in symmetric hash, with " +
    "watermark eviction on both sides") {
    implicit val sqlCtx = spark.sqlContext
    val iIn = MemoryStream[(Long, Timestamp)]
    val pIn = MemoryStream[(Long, Timestamp)]
    val out = StreamingJoin.attributedPurchases(
      iIn.toDF().toDF("user_id", "ts"), pIn.toDF().toDF("user_id", "ts"),
      windowS = 50, watermarkDelay = "5 seconds")
    assert(out.isStreaming)
    // both event-time columns carry watermarks → the state-eviction
    // proof Structured Streaming needs for an interval join
    val analyzed = out.queryExecution.analyzed.toString()
    assert(analyzed.contains("EventTimeWatermark"), analyzed.take(500))
  }
}
