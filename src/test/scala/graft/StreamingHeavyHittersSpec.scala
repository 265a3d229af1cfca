package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.{Hitter, Item, Mg}

/** Streaming Misra–Gries heavy hitters: the frequency guarantee, count
  * bounds containing the truth, bounded state, sealed-once emission. */
class StreamingHeavyHittersSpec extends SparkSpec {

  private def us(s: Long) = s * 1000000L

  test("MG fold: guarantee and bounds hold against exact counts") {
    // capacity 3; stream: a×10, b×6, c×3, then 9 distinct singletons
    val tokens = Seq.fill(10)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(3)("c") ++ (1 to 9).map(i => s"x$i")
    val m = tokens.foldLeft(Mg(Map.empty, 0L, 0L))(
      (st, t) => StreamingHeavyHitters.fold(st, t, capacity = 3))
    assert(m.nRows == 28L)
    assert(m.counts.size <= 3)
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong)
    // every survivor's bounds contain its true count
    m.counts.foreach { case (t, n) =>
      assert(n <= exact(t) && exact(t) <= n + m.decrements,
        s"$t: [$n, ${n + m.decrements}] vs exact ${exact(t)}")
    }
    // the MG guarantee: freq > n/(cap+1) = 7 must survive -> "a" (10)
    assert(m.counts.contains("a"))
  }

  test("guaranteed flag certifies via the LOWER bound only") {
    // churn stream: 12 singletons sweep the table clean, then one z —
    // z survives with countMin 1, but its true count (1) is NOT above
    // bar = 13/4 = 3, so it must NOT be certified
    val churn = (1 to 12).map(i => s"x$i") :+ "z"
    val m = churn.foldLeft(Mg(Map.empty, 0L, 0L))(
      (st, t) => StreamingHeavyHitters.fold(st, t, capacity = 3))
    val bar = m.nRows / 4L
    m.counts.foreach { case (t, n) =>
      val certified = n > bar
      // certified implies the TRUE count exceeds bar (true count = 1
      // for every token here, and bar = 3: nothing may be certified)
      assert(!certified, s"$t certified with countMin $n <= true 1")
    }
  }

  test("windows seal once; hot token guaranteed; state bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Item]
    val out = StreamingHeavyHitters.monitor(input.toDS(), capacity = 3,
      windowS = 60L, watermarkDelay = "0 seconds")
    val cp = Files.createTempDirectory("graft_shh").toString
    val q = out.writeStream.format("memory").queryName("shh_out")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      // window [0,60): "hot"×12 + 10 singleton probes, split over two
      // batches (state must carry)
      var id = 0L
      def items(ts: Long, toks: Seq[String]) = toks.map { t =>
        id += 1; Item("g", us(ts), id, t)
      }
      input.addData(items(5, Seq.fill(6)("hot") ++
        (1 to 5).map(i => s"s$i")): _*)
      q.processAllAvailable()
      input.addData(items(20, Seq.fill(6)("hot") ++
        (6 to 10).map(i => s"s$i")): _*)
      q.processAllAvailable()
      input.addData(Item("g", us(300), 999L, "advance")) // seal [0,60)
      q.processAllAvailable()
      import spark.implicits._
      val sealed0 = spark.table("shh_out").as[Hitter].collect()
        .filter(_.windowStartS == 0L)
      assert(sealed0.nonEmpty && sealed0.length <= 3,
        s"state bound violated: ${sealed0.toSeq}")
      val hot = sealed0.find(_.token == "hot")
      assert(hot.isDefined, s"hot token lost: ${sealed0.toSeq}")
      // bounds contain the true count 12; nRows = 22
      assert(hot.get.countMin <= 12L && 12L <= hot.get.countMax)
      assert(hot.get.nRows == 22L && hot.get.guaranteed)
      // sealed exactly once: re-advancing emits nothing new for [0,60)
      input.addData(Item("g", us(400), 1000L, "advance2"))
      q.processAllAvailable()
      val again = spark.table("shh_out").as[Hitter].collect()
        .filter(_.windowStartS == 0L)
      assert(again.length == sealed0.length)
    } finally q.stop()
  }
}
