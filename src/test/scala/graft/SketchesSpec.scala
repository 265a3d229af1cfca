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

  test("countMinAudit: exact top-k counts, estimates never underestimate") {
    val out = Sketches.countMinAudit(ev(), "user_id").collect()
    assert(out.length == 10)
    val exact = ev().groupBy(col("user_id").cast("string").as("k"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val k = r.getAs[String]("key")
      assert(r.getAs[Long]("exact_n") == exact(k), s"exact count for $k")
      assert(r.getAs[Boolean]("never_underestimates"))
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"))
      assert(r.getAs[Long]("overestimate") ==
        r.getAs[Long]("cms_est") - r.getAs[Long]("exact_n"))
    }
    // the probe set is the exact top-10 by (count desc, key)
    val want = exact.toSeq.sortBy { case (k, n) => (-n, k) }.take(10)
      .map(_._1).toSet
    assert(out.map(_.getAs[String]("key")).toSet == want)
  }

  test("countMinAudit: pigeonhole collisions surface as overestimates") {
    // depth 1 × width 2 over 3 distinct keys: two keys MUST share a
    // bucket, and each sharer's estimate absorbs the other's count
    val df = Seq.tabulate(30)(i => s"k${i % 3}").toDF("id")
    val out = Sketches.countMinAudit(df, "id", topK = 3,
      depth = 1, width = 2).collect()
    assert(out.forall(_.getAs[Boolean]("never_underestimates")))
    assert(out.map(_.getAs[Long]("overestimate")).max > 0,
      "3 keys into 2 buckets must collide")
    assert(out.forall(_.getAs[Long]("exact_n") == 10L))
  }

  test("countMinAudit: partitioning-invariant (deterministic hashes)") {
    val a = Sketches.countMinAudit(ev().repartition(1), "user_id")
      .orderBy("key").collect().toSeq
    val b = Sketches.countMinAudit(ev().repartition(13), "user_id")
      .orderBy("key").collect().toSeq
    assert(a == b)
  }

  test("quantileAudit: hand-checked exact ranks, verdicts TRUE") {
    val df = ((1 to 100).map(v => ("a", v.toDouble)) ++
      Seq(("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 2.0)))
      .toDF("g", "v")
    val out = Sketches.quantileAudit(df, "g", "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val a = out("a")
    // n=100: ranks ceil(q*n) = 50 / 90 / 99
    assert(a.getAs[Long]("n") == 100L)
    assert(a.getAs[Double]("exact_p50") == 50.0)
    assert(a.getAs[Double]("exact_p90") == 90.0)
    assert(a.getAs[Double]("exact_p99") == 99.0)
    val b = out("b")
    // tie-heavy group, n=4: ranks (n+1)//2=2, (9n+9)//10=4, (99n+99)//100=4
    assert(b.getAs[Double]("exact_p50") == 1.0)
    assert(b.getAs[Double]("exact_p90") == 2.0)
    assert(b.getAs[Double]("exact_p99") == 2.0)
    out.values.foreach { r =>
      Seq("p50_ok", "p90_ok", "p99_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"verdict $c for ${r.getAs[String]("g")}"))
    }
  }

  test("quantileAudit: events corpus — verdicts hold, quantiles ordered") {
    val out = Sketches.quantileAudit(ev(), "event_type", "value").collect()
    assert(out.nonEmpty)
    val n = ev().groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n") == n(r.getAs[String]("event_type")))
      assert(r.getAs[Double]("exact_p50") <= r.getAs[Double]("exact_p90"))
      assert(r.getAs[Double]("exact_p90") <= r.getAs[Double]("exact_p99"))
      Seq("p50_ok", "p90_ok", "p99_ok").foreach(c =>
        assert(r.getAs[Boolean](c)))
    }
  }

  test("bloomAudit: members always pass (zero false negatives), " +
    "non-member FPR small at light load") {
    val keys = (0L until 100L).map(Tuple1(_)).toDF("id")
    // probe the MEMBERS themselves: every one must light all 4 bits —
    // the deterministic half of the Bloom contract
    val members = Sketches.bloomAudit(keys, "id", nProbes = 100,
      probeOffset = 0L).collect()(0)
    assert(members.getAs[Long]("n_false_positives") == 100L,
      s"member probes must all pass: $members")
    assert(members.getAs[Long]("n_keys") == 100L)
    assert(members.getAs[Boolean]("not_saturated"))
    // 100 keys × 4 hashes into 4096 bits ≈ 9% load → (0.09)^4 FPR:
    // essentially zero among 1000 non-member probes
    val nonMembers = Sketches.bloomAudit(keys, "id").collect()(0)
    assert(nonMembers.getAs[Long]("n_false_positives") <= 5L,
      s"FPR implausibly high: $nonMembers")
    val bitsSet = nonMembers.getAs[Long]("n_bits_set")
    assert(bitsSet > 300L && bitsSet <= 400L, s"bit load: $bitsSet")
  }

  test("bloomAudit: partitioning-invariant (deterministic bits)") {
    val a = Sketches.bloomAudit(ev().repartition(1), "user_id").collect()
    val b = Sketches.bloomAudit(ev().repartition(9), "user_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("quantileAudit: rank verdict falsifiable — coarse sketch still " +
    "inside its own wider window") {
    // accuracy=10 (eps=0.1): the bound scales with eps, so the verdict
    // must STILL hold — the audit tracks the promised window, not a
    // fixed tolerance
    val out = Sketches.quantileAudit(ev(), "event_type", "value",
      accuracy = 10).collect()
    out.foreach { r =>
      Seq("p50_ok", "p90_ok", "p99_ok").foreach(c =>
        assert(r.getAs[Boolean](c)))
    }
  }

  // A={a,b,c} (t < mid), B={b,c,d}: overlap {b,c}, A\B = {a}
  private def thetaFixture = Seq(
    ("a", 0L), ("b", 1L), ("c", 2L),
    ("b", 5L), ("c", 6L), ("d", 7L), ("d", 9L))
    .toDF("k", "epoch")
    .withColumn("ts", timestamp_seconds(col("epoch")))

  test("thetaAudit: below-k sets collapse to EXACT counts everywhere") {
    val r = Sketches.thetaAudit(thetaFixture, "ts", "k", k = 64)
      .collect()(0)
    assert(r.getAs[Long]("exact_first") == 3L)
    assert(r.getAs[Long]("exact_second") == 3L)
    assert(r.getAs[Long]("exact_union") == 4L)
    assert(r.getAs[Long]("exact_overlap") == 2L)
    val M = 1L << 60
    assert(r.getAs[Long]("theta_first") == M)
    assert(r.getAs[Long]("theta_union") == M)
    assert(r.getAs[Double]("est_first") == 3.0)
    assert(r.getAs[Double]("est_union") == 4.0)
    assert(r.getAs[Double]("est_overlap") == 2.0)
    assert(r.getAs[Double]("est_diff_ab") == 1.0)
  }

  test("thetaAudit: k=2 estimation path — theta is the 2nd-smallest " +
    "hash; estimator formula reproduced") {
    val r = Sketches.thetaAudit(thetaFixture, "ts", "k", k = 2)
      .collect()(0)
    // independent replay of the KMV definition over A = {a, b, c}
    val hs = Seq("a", "b", "c").toDF("k")
      .select(graft.operators.Dedup.md5_60(col("k")).as("h"))
      .collect().map(_.getLong(0)).sorted
    assert(r.getAs[Long]("theta_first") == hs(1))
    val M = (1L << 60).toDouble
    assert(r.getAs[Double]("est_first") ==
      1.0 / (hs(1).toDouble / M))
  }

  test("thetaAudit: partitioning-invariant (deterministic hashes)") {
    val a = Sketches.thetaAudit(thetaFixture.repartition(1), "ts", "k", 2)
      .collect()(0).toSeq
    val b = Sketches.thetaAudit(thetaFixture.repartition(7), "ts", "k", 2)
      .collect()(0).toSeq
    assert(a == b)
  }
}
