package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full query inventory on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Session shape mirrors the 1000-executor target in miniature:
  * shuffle partitions = cores (not 200), AQE on (runtime re-plan,
  * skew-join splitting, broadcast demotion), UI off.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Per-query state hygiene: the operators seal results as local
    // checkpoints (and cache internals); whatever survives a query is
    // the CALLER's to free. 66 queries × (warmup + 3 passes) in one JVM
    // would otherwise accumulate checkpoint blocks faster than
    // GC-driven ContextCleaner returns them — the r7 pass-over-pass
    // drift. Swept OUTSIDE the timed region, blocking, so each
    // measurement starts from the same (empty) block-manager state.
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    // Shuffle files and broadcast blocks are only reclaimed when GC
    // finalizes their dependency objects (ContextCleaner); on a 128 GiB
    // heap that can be never within a bench run, so hundreds of executed
    // queries accumulate dead shuffle state — the rising pass-over-pass
    // totals. Long-running clusters solve this with
    // spark.cleaner.periodicGC (default 30 min); a bench pass is
    // minutes, so trigger it at each pass boundary. NOT per query: the
    // cleaner drains asynchronously, and a GC inside every sweep pushes
    // file-deletion work into the next timed region (measured: a flat
    // +25-30% on every query, including shuffle-free sub-200 ms ones).
    // One GC per pass plus a short drain pause keeps the passes flat
    // without taxing the measurements.
    def reclaim(): Unit = { System.gc(); Thread.sleep(2000) }

    // Warm-up: run the full inventory once at the smallest scale factor
    // so JIT compilation, whole-stage codegen, and classloading don't
    // land on the measured pass — the measured numbers are steady-state
    // engine throughput, which is what matters at the 100 TB target
    // (one-time driver-side warmup is amortized to zero there).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // Dev-side subset runs (comma-separated names): the driver never sets
    // this, so its full-inventory protocol is untouched. A subset keeps
    // the bench's JVM context (one session, sweep + pass-boundary GC)
    // while iterating on a few queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, warmDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
      sweep()
    }
    reclaim() // the measured passes start from a fully-reclaimed JVM

    // Measured: MEDIAN of `passes` full interleaved passes per query.
    // A single-shot number is hostage to transient driver-machine load
    // (historically 3-7× on sub-second queries, re-adjudicated by hand
    // every round); the median of three passes spread across the whole
    // run is robust to any one loaded interval, while interleaving (pass
    // over ALL queries, then repeat) keeps a query's reps far apart in
    // time instead of measuring the same load spike thrice.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val names = selected.sortBy(_._1)
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // A failed query must NOT contribute its (near-zero) failure latency
    // as a "result" — r8's 10 broken queries showed up as 0.05-0.10 s
    // entries that flattered the total. Failures are excluded from the
    // per-query map and the total, and reported in a "failed" JSON field.
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    (1 to passes).foreach { p =>
      var passTotal = 0.0 // THIS pass's successes only — a query that
      // fails mid-run must not contribute a stale earlier-pass time
      names.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name pass $p failed: ${e.getMessage}")
            failed(name) = String.valueOf(e.getMessage)
            false
          }
        if (ok) {
          val sec = (System.nanoTime() - t0) / 1e9
          times(name) = sec :: times(name)
          passTotal += sec
          // stderr per-query line (stdout keeps the one-JSON-line
          // contract): lets a human correlate in-context excursions
          // with GC/load telemetry instead of adjudicating blind.
          System.err.println(f"[bench] $name pass $p: $sec%.3f s")
        }
        sweep() // outside the timed region: pass 3 starts like pass 1
      }
      reclaim()
      // Pass totals on stderr: with per-query sweeps in place, pass N
      // must start from the same empty block-manager state as pass 1 —
      // a rising trend here is accumulation, a one-off spike is load.
      System.err.println(f"[bench] pass $p total: $passTotal%.1f s")
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2) // odd pass counts: the true middle element
    }
    val results = names.collect {
      case (name, _) if !failed.contains(name) && times(name).size == passes =>
        name -> median(times(name))
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val fq = failed.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries FAILED (excluded " +
        s"from total): ${failed.keys.mkString(", ")}")
    val fullJson = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fq,"sf":"$sfDir","warmup":"full pass at $warmDir","passes":$passes,"aggregation":"per-query median"}"""
    // The full per-query table is ~6 KB at 261 queries — larger than the
    // driver's stdout tail capture, which truncated BENCH_r11 to the
    // last ~77 queries. So: (1) the COMPLETE JSON goes to a file the
    // driver/judge can read directly, (2) stdout still prints the full
    // line for humans, and (3) the LAST line is a compact summary that
    // fits any tail capture whole (total, counts, slowest five, and the
    // path to the full table).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: $e")
    }
    println(fullJson)
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"slowest":$slowest,"sf":"$sfDir","passes":$passes,"aggregation":"per-query median","detail":"$outPath"}""")
    spark.stop()
  }
}
