package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** HLL sketch lifecycle: merge identity (union of daily == direct), the
  * accuracy bar the lgK=12 config buys, and the overlap algebra. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(dir: String = "/root/testdata/sf0.001") =
    spark.read.parquet(s"$dir/events.parquet")

  test("distinctRollup: union-of-daily == direct weekly sketch (identity)") {
    val weekly = Sketches.distinctRollup(ev(), "ts", "user_id")
      .orderBy("week_s").collect()
    assert(weekly.nonEmpty)
    // register-max is associative: unioning the daily sketches must give
    // EXACTLY the same estimate as sketching each week's raw keys
    val direct = ev()
      .withColumn("s", col("ts").cast("timestamp").cast("long"))
      .withColumn("week_s", col("s") - pmod(col("s"), lit(604800L)))
      .groupBy("week_s")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est_direct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    weekly.foreach { r =>
      assert(r.getAs[Long]("est_users") ==
        direct(r.getAs[Long]("week_s")),
        s"merge identity broken for week ${r.getAs[Long]("week_s")}")
    }
  }

  test("distinctRollup: estimates within 5% of exact; daily sum overcounts") {
    val weekly = Sketches.distinctRollup(ev(), "ts", "user_id")
      .collect().map(r =>
        r.getAs[Long]("week_s") ->
          (r.getAs[Long]("est_users"), r.getAs[Long]("sum_daily_est"))).toMap
    val exact = ev()
      .withColumn("s", col("ts").cast("timestamp").cast("long"))
      .withColumn("week_s", col("s") - pmod(col("s"), lit(604800L)))
      .groupBy("week_s").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, n) =>
      val (est, daySum) = weekly(w)
      assert(math.abs(est - n).toDouble / n < 0.05,
        s"week $w: est $est vs exact $n")
      // repeat visitors across days => naive daily sum must overcount
      assert(daySum >= est, s"week $w: daily sum $daySum < union $est")
    }
  }

  test("distinctRollupAudit: exact columns right, accuracy verdict TRUE") {
    val audit = Sketches.distinctRollupAudit(ev(), "ts", "user_id")
      .collect()
    assert(audit.nonEmpty)
    val exact = ev()
      .withColumn("s", col("ts").cast("timestamp").cast("long"))
      .withColumn("week_s", col("s") - pmod(col("s"), lit(604800L)))
      .groupBy("week_s").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    audit.foreach { r =>
      val w = r.getAs[Long]("week_s")
      assert(r.getAs[Long]("exact_users") == exact(w),
        s"week $w exact_users")
      assert(r.getAs[Long]("sum_daily_exact") >= r.getAs[Long]("exact_users"),
        s"week $w: naive daily sum must not undercount the union")
      assert(r.getAs[Long]("n_days") >= 1)
      // the gate column the oracle pins TRUE — the lgK=12 contract
      assert(r.getAs[Boolean]("est_within_5pct"), s"week $w verdict")
    }
  }

  test("overlapAudit: exact inclusion-exclusion, all verdicts TRUE") {
    val row = Sketches.overlapAudit(ev(), "ts", "user_id").collect()(0)
    val e = ev().withColumn("s", col("ts").cast("timestamp").cast("long"))
    val (lo, hi) = e.agg(min("s"), max("s")).as[(Long, Long)].collect()(0)
    val mid = (lo + hi) / 2
    val a = e.filter(col("s") < mid).select("user_id").distinct()
    val b = e.filter(col("s") >= mid).select("user_id").distinct()
    assert(row.getAs[Long]("exact_first") == a.count())
    assert(row.getAs[Long]("exact_second") == b.count())
    assert(row.getAs[Long]("exact_union") == a.union(b).distinct().count())
    assert(row.getAs[Long]("exact_overlap") == a.intersect(b).count())
    Seq("est_first_ok", "est_second_ok", "est_union_ok",
      "overlap_err_bounded").foreach { c =>
      assert(row.getAs[Boolean](c), s"verdict $c must hold")
    }
  }

  test("overlapEstimate: inclusion-exclusion tracks the exact overlap") {
    val row = Sketches.overlapEstimate(ev(), "ts", "user_id").collect()(0)
    val e = ev().withColumn("s", col("ts").cast("timestamp").cast("long"))
    val (lo, hi) = e.agg(min("s"), max("s")).as[(Long, Long)].collect()(0)
    val mid = (lo + hi) / 2
    val a = e.filter(col("s") < mid).select("user_id").distinct()
    val b = e.filter(col("s") >= mid).select("user_id").distinct()
    val exactOverlap = a.intersect(b).count()
    val est = row.getAs[Long]("est_overlap")
    // inclusion-exclusion compounds three estimates — allow 10% of |keys|
    val nKeys = e.select("user_id").distinct().count()
    assert(math.abs(est - exactOverlap) <= math.max(2L, nKeys / 10),
      s"overlap est $est vs exact $exactOverlap ($nKeys keys)")
    assert(row.getAs[Long]("est_union") >=
      math.max(row.getAs[Long]("est_first"), row.getAs[Long]("est_second")))
  }
}
