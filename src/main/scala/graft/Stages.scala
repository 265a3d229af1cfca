package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: run one named query from [[SparkEntry.queries]] and
  * print per-stage wall time, task count, and shuffle/input volumes —
  * the stage-level attribution the Spark UI would give, for a headless
  * box. NOT part of the driver contract.
  *
  * `runMain graft.Stages <queryName>[,<queryName2>,…] [sfDir] [reps]`
  *
  * Reps > 1 re-run the query in the same session (rep 1 carries JIT +
  * first-scan warmup); stages are printed per rep so steady-state cost
  * is separable. Several comma-separated queries share one JVM (r14:
  * attribution sweeps over the top-N queries without N session
  * startups).
  */
object Stages {
  def main(args: Array[String]): Unit = {
    val names0 = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-stages")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(job: Int, stage: Int, nameLine: String, ms: Long,
      tasks: Int, inputMB: Double, shReadMB: Double, shWriteMB: Double,
      gcMs: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    val stageToJob = scala.collection.mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        stages += St(stageToJob.getOrElse(si.stageId, -1), si.stageId,
          si.name.takeWhile(_ != '\n').take(70), ms, si.numTasks,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.remoteBytesRead / 1e6 +
            m.shuffleReadMetrics.localBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.jvmGCTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names0.foreach { name =>
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      stages.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      println(f"[stages] $name rep $i: $sec%.3f s ($n rows), " +
        s"${stages.size} stages")
      stages.sortBy(-_.ms).take(25).foreach { s =>
        println(f"  job ${s.job}%3d stage ${s.stage}%4d ${s.ms}%6d ms " +
          f"${s.tasks}%4d tasks in ${s.inputMB}%7.1f MB " +
          f"shR ${s.shReadMB}%7.1f MB shW ${s.shWriteMB}%7.1f MB " +
          f"gc ${s.gcMs}%5d ms  ${s.nameLine}")
      }
      val sum = stages.map(_.ms).sum
      println(f"  [stages] stage-ms total: $sum ms over ${stages.size} " +
        s"stages; wall ${math.round(sec * 1000)} ms")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(500)
    }
    }
    spark.stop()
  }
}
