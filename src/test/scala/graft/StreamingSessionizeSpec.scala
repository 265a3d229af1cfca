package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.TimeSeries
import graft.streaming.StreamingSessionize

/** Streaming gap sessionization: batch parity with the q_sessionize
  * kernel on real data, the exact-gap boundary both kernels must merge,
  * watermark-driven close timing, and native cross-batch session
  * merging when a bridging event arrives late but inside the
  * watermark. */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def triples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("user_id"), col("session_start_s"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("batch parity with the q_sessionize kernel on sf0.001 events") {
    val ev = spark.read.parquet(sf("events"))
    val batch = TimeSeries.sessionize(ev, "ts", "user_id", "event_id", 1800L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("min(epoch_us) div 1000000").as("session_start_s"))
    val stream = StreamingSessionize.sessions(ev, "ts", "user_id", 1800L)
    val b = triples(batch)
    assert(b.nonEmpty)
    assert(triples(stream) == b)
  }

  test("exact-gap delta merges in BOTH kernels; gap+1 splits in both") {
    val gap = 10L
    def rows(deltaS: Long) = Seq((1L, 100L, 1L), (1L, 100L + deltaS, 2L))
      .map { case (u, s, i) => (u, ts(s), i) }.toDF("user_id", "ts", "event_id")
    def batchSessions(deltaS: Long): Long =
      TimeSeries.sessionize(rows(deltaS), "ts", "user_id", "event_id", gap)
        .agg(max(col("session_id"))).collect()(0).getLong(0)
    def streamSessions(deltaS: Long): Long =
      StreamingSessionize.sessions(rows(deltaS), "ts", "user_id", gap).count()
    assert(batchSessions(gap) == 1L && streamSessions(gap) == 1L,
      "delta == gap must merge (batch kernel is gap-inclusive)")
    assert(batchSessions(gap + 1) == 2L && streamSessions(gap + 1) == 2L,
      "delta == gap+1 must split")
  }

  test("watermark closes sessions exactly once; cross-batch bridge merges") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val out = StreamingSessionize.sessions(
      in.toDF().toDF("user_id", "ts"), "ts", "user_id",
      gapSeconds = 10L, watermarkDelay = "50 seconds")
    val cp = Files.createTempDirectory("graft_ssess").toString
    val name = s"ssess_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      // two separate open sessions: [100] and [115] (gap 10)
      in.addData(Seq((1L, ts(100L)), (1L, ts(115L))))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0L,
        "nothing may close while the watermark trails the session ends")
      // a LATE bridging event (107, above the 50 s watermark) must
      // merge both open sessions into one — the native session-window
      // merge a hand-rolled state fold usually gets wrong
      in.addData(Seq((1L, ts(107L))))
      q.processAllAvailable()
      // advance the watermark far past 115+10: the merged session closes
      in.addData(Seq((1L, ts(300L))))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("user_id"), col("session_start_s"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == Seq((1L, 100L, 3L)), s"got: $rows")
    } finally q.stop()
  }
}
