package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run one named query from [[SparkEntry.queries]] repeatedly
  * with timing, and optionally dump its formatted plan.
  *
  * `runMain graft.Probe <queryName> [sfDir] [reps] [explain]`
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      // same per-query hygiene as Bench (outside the timed region)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      // Release dead shuffle/broadcast state and let the async cleaner
      // drain BEFORE the next timed rep (see Bench for the rationale).
      System.gc(); Thread.sleep(500)
    }
    spark.stop()
  }
}
