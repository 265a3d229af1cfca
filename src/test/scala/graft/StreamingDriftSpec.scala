package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDrift
import graft.streaming.StreamingDrift.{Drift, Event}

/** Streaming PSI drift monitor: sealed-window emission, the zero
  * identity for a reference-shaped window, positive drift for a shifted
  * one, and stream == the shared psiQ arithmetic on the same rows. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def us(sec: Long) = sec * 1000000L

  test("windows seal once with exact PSI; shifted window scores positive") {
    implicit val sqlCtx = spark.sqlContext
    // reference histogram: bins 0 and 1, 50/50
    val ref = Map(0L -> 50L, 1L -> 50L)
    val input = MemoryStream[Event]
    val out = StreamingDrift.monitor(input.toDS(), ref, binWidth = 10.0,
      windowS = 60L, watermarkDelay = "0 seconds")
    val cp = Files.createTempDirectory("graft_sdrift").toString
    val q = out.writeStream.format("memory").queryName("sdrift_out")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      // window [0, 60): same 50/50 shape as the reference (10 rows;
      // start at t=1 — a t=0 row ties the INITIAL watermark and is
      // dropped as late before the state handler sees it)
      val w1 = (0 until 5).map(i => Event("k", us(1L + i), 1.0)) ++
        (0 until 5).map(i => Event("k", us(6L + i), 11.0))
      // window [60, 120): all mass in bin 5 — hard shift
      val w2 = (0 until 10).map(i => Event("k", us(60L + i), 55.0))
      input.addData(w1 ++ w2: _*)
      q.processAllAvailable()
      // advance the watermark past both window ends to seal them
      input.addData(Event("k", us(300), 1.0))
      q.processAllAvailable()
      val got = spark.table("sdrift_out").as[Drift].collect()
        .map(d => d.windowStartS -> d).toMap
      assert(got.keySet == Set(0L, 60L), s"sealed windows: ${got.keySet}")
      // window 1: obs {0:5, 1:5} vs ref {0:50, 1:50} — proportions equal
      // after smoothing (6/12 vs 51/102) => PSI exactly 0
      assert(got(0L).psiQ == 0L, got(0L).toString)
      assert(got(0L).nRows == 10L && got(0L).nBins == 2L)
      // window 2: disjoint mass => strongly positive
      assert(got(60L).psiQ > 0L && got(60L).psiBits > 0.5, got(60L).toString)
      // stream == the shared arithmetic on the same rows
      val (expQ, expB) = StreamingDrift.psiQ(Map(5L -> 10L), ref)
      assert(got(60L).psiQ == expQ && got(60L).nBins == expB)
    } finally q.stop()
  }

  test("late rows past the watermark never mutate a sealed window") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Map(0L -> 10L)
    val input = MemoryStream[Event]
    val out = StreamingDrift.monitor(input.toDS(), ref, binWidth = 10.0,
      windowS = 60L, watermarkDelay = "0 seconds")
    val cp = Files.createTempDirectory("graft_sdrift2").toString
    val q = out.writeStream.format("memory").queryName("sdrift_late")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      input.addData(Event("k", us(10), 1.0), Event("k", us(20), 1.0))
      q.processAllAvailable()
      input.addData(Event("k", us(300), 1.0)) // seals [0, 60)
      q.processAllAvailable()
      val sealedN = spark.table("sdrift_late").as[Drift]
        .filter(_.windowStartS == 0L).collect()
      assert(sealedN.length == 1 && sealedN(0).nRows == 2L)
      // a straggler for the sealed window: dropped by the watermark,
      // no second emission, no state resurrection
      input.addData(Event("k", us(30), 1.0))
      q.processAllAvailable()
      input.addData(Event("k", us(400), 1.0))
      q.processAllAvailable()
      val after = spark.table("sdrift_late").as[Drift]
        .filter(_.windowStartS == 0L).collect()
      assert(after.length == 1 && after(0).nRows == 2L,
        s"sealed window mutated: ${after.toSeq}")
    } finally q.stop()
  }
}
