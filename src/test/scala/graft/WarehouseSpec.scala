package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.Warehouse
import graft.operators.{Dedup, Similarity}

/** Warehouse lifecycle operators: RFM, SCD2, CDC latest-wins, PSI drift,
  * plus the MaxSim and LSH-eval retrieval additions. Hand-computed
  * fixtures + plan-shape locks (the scale contracts). */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("rfmSegments: hand-computed scores, ties share a score") {
    // 4 customers; as-of anchor = 2024-01-10 (newest order day).
    val orders = Seq(
      (1L, ts("2024-01-10 10:00:00"), 100.0), // recency 0, freq 3, mon 300
      (1L, ts("2024-01-05 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (2L, ts("2024-01-08 10:00:00"), 50.0),  // recency 2, freq 1, mon 50
      (3L, ts("2024-01-04 10:00:00"), 500.0), // recency 6, freq 2, mon 900
      (3L, ts("2024-01-02 10:00:00"), 400.0),
      (4L, ts("2024-01-08 10:00:00"), 50.0)   // recency 2, freq 1, mon 50
    ).toDF("cust", "odate", "price")
    val out = Warehouse.rfmSegments(orders, "cust", "odate", "price",
      tiles = 4, monetaryGrid = 100L).collect()
      .map(r => r.getAs[Long]("custkey") -> r).toMap
    // recency histogram (worst->best): 6(c3,cum1), 2(c2,c4,cum3), 0(c1,cum4)
    // n=4, tiles=4: score = ceil(4*cum/4) = cum -> c3:1, c2/c4:3, c1:4
    assert(out(3L).getAs[Long]("r_score") == 1L)
    assert(out(2L).getAs[Long]("r_score") == 3L)
    assert(out(4L).getAs[Long]("r_score") == 3L)
    assert(out(1L).getAs[Long]("r_score") == 4L)
    // frequency (asc): 1(c2,c4,cum2->2), 2(c3,cum3->3), 3(c1,cum4->4)
    assert(out(2L).getAs[Long]("f_score") == 2L &&
      out(4L).getAs[Long]("f_score") == 2L)
    assert(out(3L).getAs[Long]("f_score") == 3L)
    assert(out(1L).getAs[Long]("f_score") == 4L)
    // monetary grid floor(m/100): 0(c2,c4,cum2->2), 3(c1,cum3->3), 9(c3,->4)
    assert(out(2L).getAs[Long]("m_score") == 2L)
    assert(out(1L).getAs[Long]("m_score") == 3L)
    assert(out(3L).getAs[Long]("m_score") == 4L)
    // ties (c2, c4) share every score and the exact sums survive
    assert(out(2L).getAs[Long]("rfm_cell") == out(4L).getAs[Long]("rfm_cell"))
    assert(out(1L).getAs[Double]("monetary") == 300.0)
    assert(out(1L).getAs[Long]("recency_days") == 0L)
  }

  test("rfmSegments: negative monetary totals snap by FLOOR, not trunc") {
    // grid 1: c1 sums -1.5 and c2 -2.0 — floor puts both in cell -2
    // (one shared m_score); trunc would split them (-1 vs -2). c3 is
    // the positive anchor so the histogram has two distinct values.
    val orders = Seq(
      (1L, ts("2024-01-10 10:00:00"), -0.5),
      (1L, ts("2024-01-09 10:00:00"), -1.0),
      (2L, ts("2024-01-08 10:00:00"), -2.0),
      (3L, ts("2024-01-07 10:00:00"), 5.0),
      (4L, ts("2024-01-06 10:00:00"), 5.0)
    ).toDF("cust", "odate", "price")
    // monetary histogram (tiles=2, n=4): cell -2 ({c1, c2} under floor;
    // trunc would split c1 into cell -1) cum 2 -> ceil(2*2/4) = 1;
    // cell 5 cum 4 -> 2
    val out = Warehouse.rfmSegments(orders, "cust", "odate", "price",
      tiles = 2, monetaryGrid = 1L).collect()
      .map(r => r.getAs[Long]("custkey") -> r.getAs[Long]("m_score")).toMap
    assert(out(1L) == 1L && out(2L) == 1L,
      s"floor must co-bucket -1.5 and -2.0 on a unit grid: $out")
    assert(out(3L) == 2L && out(4L) == 2L,
      s"positive anchors must outscore: $out")
  }

  test("rfmSegments plan: no global window over customers, score maps broadcast") {
    val orders = spark.read.parquet(sf("orders"))
    val plan = Warehouse.rfmSegments(orders, "o_custkey", "o_orderdate",
      "o_totalprice").queryExecution.executedPlan.toString
    // all three value->score maps come back as broadcast hash joins
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"score maps must broadcast:\n$plan")
  }

  test("scd2Dimension: runs collapse, intervals chain, open current") {
    val events = Seq(
      (7L, ts("2024-01-01 00:00:10"), "a", 1L),
      (7L, ts("2024-01-01 00:00:20"), "a", 2L), // same run
      (7L, ts("2024-01-01 00:00:30"), "b", 3L), // change
      (7L, ts("2024-01-01 00:00:40"), "a", 4L), // change back = new run
      (8L, ts("2024-01-01 00:00:15"), "x", 5L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Warehouse.scd2Dimension(events, "ts", "user_id",
      "event_type", "event_id")
      .orderBy("user_id", "version").collect()
    val u7 = out.filter(_.getLong(0) == 7L)
    assert(u7.map(_.getAs[String]("event_type")).toSeq == Seq("a", "b", "a"))
    assert(u7.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L, 1L))
    // interval chaining: each valid_to = next valid_from; last open
    assert(u7(0).getAs[Long]("valid_to_s") == u7(1).getAs[Long]("valid_from_s"))
    assert(u7(1).getAs[Long]("valid_to_s") == u7(2).getAs[Long]("valid_from_s"))
    assert(u7(2).isNullAt(u7(2).fieldIndex("valid_to_s")))
    assert(u7.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, true))
    val u8 = out.filter(_.getLong(0) == 8L)
    assert(u8.length == 1 && u8(0).getAs[Boolean]("is_current"))
  }

  test("cdcLatestWins: newest payload wins, tombstone excludes, no window") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:10"), 10L, "view", 1.0),
      (1L, ts("2024-01-01 00:00:20"), 11L, "click", 2.0),  // winner
      (2L, ts("2024-01-01 00:00:10"), 12L, "view", 3.0),
      (2L, ts("2024-01-01 00:00:30"), 13L, "error", 4.0),  // tombstone
      (3L, ts("2024-01-01 00:00:10"), 14L, "error", 5.0),
      (3L, ts("2024-01-01 00:00:10"), 15L, "view", 6.0)    // same ts: id wins
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val snap = Warehouse.cdcLatestWins(log, "ts", "user_id", "event_id",
      Seq("event_type", "value"), col("event_type") === "error")
    val rows = snap.orderBy("user_id").collect()
    assert(rows.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 3L))
    assert(rows(0).getAs[String]("event_type") == "click" &&
      rows(0).getAs[Long]("last_row_id") == 11L)
    assert(rows(1).getAs[Long]("last_row_id") == 15L) // ties break on rowId
    val plan = snap.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"latest-wins must be a max_by aggregate, not a window:\n$plan")
  }

  test("distributionDrift: identical halves give PSI 0; shift is positive") {
    // two half-ranges with IDENTICAL value distributions -> every cell
    // has a == b -> p == q -> psi_q exactly 0
    val same = (0 until 50).flatMap { i =>
      Seq(("k", ts(f"2024-01-01 00:00:${i % 30}%02d"), (i % 5) * 10.0),
        ("k", ts(f"2024-01-02 00:00:${i % 30}%02d"), (i % 5) * 10.0))
    }.toDF("event_type", "ts", "value")
    val zero = Warehouse.distributionDrift(same, "ts", "event_type",
      "value", binWidth = 10.0).collect()
    assert(zero.length == 1 && zero(0).getAs[Long]("psi_q") == 0L)
    // a hard shift (all mass moves bins) must score positive
    val moved = ((0 until 50).map(i =>
      ("k", ts(f"2024-01-01 00:00:${i % 30}%02d"), 0.0)) ++
      (0 until 50).map(i =>
        ("k", ts(f"2024-01-02 00:00:${i % 30}%02d"), 100.0)))
      .toDF("event_type", "ts", "value")
    val psi = Warehouse.distributionDrift(moved, "ts", "event_type",
      "value", binWidth = 10.0).collect()(0)
    assert(psi.getAs[Long]("psi_q") > 0L)
    assert(psi.getAs[Double]("psi_bits") > 0.5) // a full swap is >> alert bar
  }

  test("maxSimTopK: best-aligned token matches sum; self-match tops") {
    // doc 0 tokens point along axes; doc 1 is a rotation; query = doc 0.
    val corpus = Seq(
      (0L, 0L, Array(1.0f, 0.0f)), (0L, 1L, Array(0.0f, 1.0f)),
      (1L, 0L, Array(0.6f, 0.8f)), (1L, 1L, Array(0.8f, 0.6f)),
      (2L, 0L, Array(-1.0f, 0.0f)), (2L, 1L, Array(0.0f, -1.0f))
    ).toDF("doc", "tok", "vec")
    val out = Similarity.maxSimTopK(
      corpus.filter(col("doc") === 0L), "doc", "tok", "vec",
      corpus, "doc", "vec", k = 3)
      .orderBy("rank").collect()
    // score(q0, d0) = 1 + 1; score(q0, d1) = max(.6,.8) + max(.8,.6) = 1.6;
    // score(q0, d2) = 0 + 0
    assert(out.map(_.getAs[Long]("corpus_id")).toSeq == Seq(0L, 1L, 2L))
    assert(math.abs(out(0).getAs[Double]("score") - 2.0) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("score") - 1.6) < 1e-9)
    assert(math.abs(out(2).getAs[Double]("score") - 0.0) < 1e-9)
  }

  test("pointInTimeJoin: at-or-before inclusive, leakage-free, null before first") {
    val dim = Seq(
      (1L, 100L, "bronze", 1L),
      (1L, 200L, "silver", 2L),
      (1L, 200L, "gold", 3L) // same-second start: version 3 wins
    ).toDF("user_id", "valid_from_s", "state", "version")
    val labels = Seq(
      (1L, ts("1970-01-01 00:00:50"), 10L),  // before first -> null
      (1L, ts("1970-01-01 00:01:40"), 11L),  // == 100s: inclusive match
      (1L, ts("1970-01-01 00:02:30"), 12L),  // 150s -> bronze
      (1L, ts("1970-01-01 00:05:00"), 13L)   // 300s -> gold (tie winner)
    ).toDF("user_id", "ts", "event_id")
    val out = Warehouse.pointInTimeJoin(labels, "event_id", "ts",
      dim, "valid_from_s", Seq("state", "version"), "user_id", "version")
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(out(10L).isNullAt(out(10L).fieldIndex("state")))
    assert(out(11L).getAs[String]("state") == "bronze")
    assert(out(12L).getAs[String]("state") == "bronze")
    assert(out(13L).getAs[String]("state") == "gold" &&
      out(13L).getAs[Long]("version") == 3L)
    // leakage audit on real data: every joined feature started
    // at-or-before its label's second
    val ev = spark.read.parquet(sf("events"))
    val d2 = Warehouse.scd2Dimension(
      ev.filter(col("event_type") =!= "purchase"),
      "ts", "user_id", "event_type", "event_id")
    val pit = Warehouse.pointInTimeJoin(
      ev.filter(col("event_type") === "purchase"), "event_id", "ts",
      d2, "valid_from_s", Seq("event_type", "version"), "user_id", "version")
    val leaks = pit.join(d2.select(col("user_id"), col("version"),
        col("valid_from_s")), Seq("user_id", "version"))
      .filter(col("valid_from_s") > col("label_ts_s")).count()
    assert(leaks == 0L, s"$leaks features from the label's future")
  }

  test("triangleStats: hand graph — one triangle plus a pendant") {
    // K3 {1,2,3} + pendant edge 3-4
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    val row = Dedup.triangleStats(pairs).collect()(0)
    assert(row.getAs[Long]("n_vertices") == 4L)
    assert(row.getAs[Long]("n_edges") == 4L)
    // wedges: deg 2,2,3,1 -> 1 + 1 + 3 + 0 = 5
    assert(row.getAs[Long]("n_wedges") == 5L)
    assert(row.getAs[Long]("n_triangles") == 1L)
    assert(math.abs(row.getAs[Double]("transitivity") - 0.6) < 1e-12)
    // orientation invariance: flipped input pairs are filtered/canonical
    val flipped = Seq((2L, 1L), (3L, 2L), (3L, 1L), (4L, 3L), (1L, 2L))
      .toDF("id_a", "id_b")
    val r2 = Dedup.triangleStats(
      flipped.select(least($"id_a", $"id_b").as("id_a"),
        greatest($"id_a", $"id_b").as("id_b"))).collect()(0)
    assert(r2.getAs[Long]("n_triangles") == 1L &&
      r2.getAs[Long]("n_edges") == 4L)
  }

  test("pqDistortion: zero when every vector seeds the codebook") {
    // corpus of 10 <= numCodes = 16: each vector's sub-slices ARE codes,
    // so the best assignment distance is exactly 0 in every subspace
    val small = spark.read.parquet(sf("embeddings"))
      .filter(col("vec_id") < 10)
    val zero = Similarity.pqDistortion(small, "vec_id", "embedding",
      numSubspaces = 4, numCodes = 16).collect()
    assert(zero.length == 4)
    zero.foreach { r =>
      assert(r.getAs[Double]("sum_d2") == 0.0, r.toString)
      assert(r.getAs[Double]("max_d2") == 0.0, r.toString)
    }
    // full table: a real quantization error, one row per subspace,
    // mean consistent with sum/n
    val full = Similarity.pqDistortion(
      spark.read.parquet(sf("embeddings")), "vec_id", "embedding")
      .collect()
    assert(full.length == 4)
    full.foreach { r =>
      assert(r.getAs[Double]("sum_d2") > 0.0)
      assert(math.abs(r.getAs[Double]("mean_d2") -
        r.getAs[Double]("sum_d2") / r.getAs[Long]("n_vectors")) < 1e-12)
      assert(r.getAs[Double]("max_d2") >= r.getAs[Double]("mean_d2"))
    }
  }

  test("entitySplit: entities never straddle splits; assignment is scan-resident") {
    val ev = spark.read.parquet(sf("events"))
    val split = graft.operators.Sampling.entitySplit(ev, "user_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // structural: one split per entity
    val straddlers = split.groupBy("user_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0L)
    assert(split.select("split").distinct().count() <= 3)
    assert(split.count() == ev.count())
    // the assignment is a pure per-row expression: no exchange at all
    val plan = split.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"split assignment must not shuffle:\n$plan")
  }

  test("abTestConversion: exhaustive arms, reproducible salt, degenerate se gates") {
    val ev = spark.read.parquet(sf("events"))
    val r = Warehouse.abTestConversion(ev, "user_id", "event_type",
      "purchase", salt = "exp1").collect()(0)
    val nUsers = ev.select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nUsers)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    // same salt = identical assignment; the whole row reproduces
    val r2 = Warehouse.abTestConversion(ev, "user_id", "event_type",
      "purchase", salt = "exp1").collect()(0)
    assert(r.toString == r2.toString)
    // degenerate: every entity converts -> p_pool = 1 -> se = 0 -> NULL z
    val allConv = Seq((1L, "purchase"), (2L, "purchase"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    val d = Warehouse.abTestConversion(allConv, "user_id", "event_type",
      "purchase", salt = "s").collect()(0)
    assert(d.isNullAt(d.fieldIndex("z")))
  }

  test("ivfCellBalance: partition accounting and imbalance bounds") {
    val emb = spark.read.parquet(sf("embeddings"))
    val r = Similarity.ivfCellBalance(emb, "vec_id", "embedding",
      numCentroids = 16, refineRounds = 1).collect()(0)
    assert(r.getAs[Long]("n_vectors") == emb.count())
    assert(r.getAs[Long]("n_cells") + r.getAs[Long]("n_empty") == 16L)
    assert(r.getAs[Long]("min_cell") >= 1L)
    assert(r.getAs[Double]("imbalance") >= 1.0)
    assert(r.getAs[Long]("max_cell") >= r.getAs[Long]("min_cell"))
  }

  test("timeWeightedAverage: duration-weighted, last point spans zero") {
    import graft.queries.TimeSeries
    val obs = Seq(
      ("k", ts("1970-01-01 00:00:00"), 1L, 10.0), // holds 10 s
      ("k", ts("1970-01-01 00:00:10"), 2L, 30.0), // holds 30 s
      ("k", ts("1970-01-01 00:00:40"), 3L, 99.0), // last: zero span
      ("solo", ts("1970-01-01 00:00:05"), 4L, 7.0)
    ).toDF("key", "ts", "event_id", "value")
    val out = TimeSeries.timeWeightedAverage(obs, "ts", "key", "value",
      "event_id").collect().map(r => r.getAs[String]("key") -> r).toMap
    // (10*10 + 30*30) / 40 = 25 — a plain mean would say 46.3
    assert(out("k").getAs[Double]("twa") == 25.0)
    assert(out("k").getAs[Long]("duration_s") == 40L)
    // a single observation has no duration: NULL, never a fake number
    assert(out("solo").isNullAt(out("solo").fieldIndex("twa")))
  }

  test("counterAggregate: resets contribute the new reading") {
    import graft.queries.TimeSeries
    val obs = Seq(
      ("c", ts("1970-01-01 00:00:01"), 1L, 5.0),
      ("c", ts("1970-01-01 00:00:02"), 2L, 7.0),   // +2
      ("c", ts("1970-01-01 00:00:03"), 3L, 10.0),  // +3
      ("c", ts("1970-01-01 00:00:04"), 4L, 2.0),   // RESET -> +2
      ("c", ts("1970-01-01 00:00:05"), 5L, 6.0)    // +4
    ).toDF("key", "ts", "event_id", "value")
    val r = TimeSeries.counterAggregate(obs, "ts", "key", "value",
      "event_id").collect()(0)
    assert(r.getAs[Long]("n_obs") == 5L)
    assert(r.getAs[Long]("n_resets") == 1L)
    assert(r.getAs[Double]("total_increase") == 11.0)
    assert(r.getAs[Double]("first_value") == 5.0)
    assert(r.getAs[Double]("last_value") == 6.0)
  }

  test("referentialOrphans and pkViolations: hand-counted audits") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), None)
      .toDF("fk")
    val parent = Seq(Some(1L), Some(2L), None).toDF("pk")
    val o = Warehouse.referentialOrphans(child, "fk", parent, "pk")
      .collect()(0)
    assert(o.getAs[Long]("n_child") == 5L &&
      o.getAs[Long]("n_child_keys") == 3L)
    // SQL FK semantics: the NULL child key violates nothing (reported
    // separately); the NULL parent key never "adopts" anything
    assert(o.getAs[Long]("n_null_fk") == 1L)
    assert(o.getAs[Long]("n_orphan_rows") == 2L &&
      o.getAs[Long]("n_orphan_keys") == 1L)
    assert(o.getAs[Double]("orphan_rate") == 0.4)
    val dup = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L),
      (2L, 1L)).toDF("a", "b")
    val p = Warehouse.pkViolations(dup, Seq("a", "b")).collect()(0)
    assert(p.getAs[Long]("n_rows") == 6L && p.getAs[Long]("n_keys") == 3L)
    assert(p.getAs[Long]("n_dup_keys") == 2L)
    assert(p.getAs[Long]("n_excess_rows") == 3L)
    assert(p.getAs[Long]("max_multiplicity") == 3L)
    assert(p.getAs[Double]("dup_rate") == 0.5)
  }

  test("distributionDriftKs: identical halves 0, disjoint halves 1") {
    val same = (0 until 40).flatMap { i =>
      Seq(("k", ts(f"2024-01-01 00:00:${i % 30}%02d"), (i % 4) * 10.0),
        ("k", ts(f"2024-01-02 00:00:${i % 30}%02d"), (i % 4) * 10.0))
    }.toDF("event_type", "ts", "value")
    val zero = Warehouse.distributionDriftKs(same, "ts", "event_type",
      "value").collect()(0)
    assert(zero.getAs[Long]("d_scaled") == 0L && zero.getAs[Double]("ks") == 0.0)
    // fully disjoint supports: D = 1 exactly
    val moved = ((0 until 40).map(i =>
      ("k", ts(f"2024-01-01 00:00:${i % 30}%02d"), 1.0)) ++
      (0 until 40).map(i =>
        ("k", ts(f"2024-01-02 00:00:${i % 30}%02d"), 100.0)))
      .toDF("event_type", "ts", "value")
    val one = Warehouse.distributionDriftKs(moved, "ts", "event_type",
      "value").collect()(0)
    assert(one.getAs[Double]("ks") == 1.0, one.toString)
    // a subtle mean shift PSI's wide bins can miss still moves KS
    val shifted = ((0 until 40).map(i =>
      ("k", ts(f"2024-01-01 00:00:${i % 30}%02d"), (i % 4) * 10.0)) ++
      (0 until 40).map(i =>
        ("k", ts(f"2024-01-02 00:00:${i % 30}%02d"), (i % 4) * 10.0 + 1.0)))
      .toDF("event_type", "ts", "value")
    val s = Warehouse.distributionDriftKs(shifted, "ts", "event_type",
      "value").collect()(0)
    assert(s.getAs[Double]("ks") > 0.2, s.toString)
  }

  test("weightedPriority: scale-invariant, zero-weight excluded, map-side top-k") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("n_chars"))
    val s1 = Sampling.weightedPriority(docs, "doc_id", "n_chars", k = 20)
    val ids1 = s1.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids1.size == 20)
    // priorities scale uniformly with the weights: the SAMPLE is
    // invariant under weight rescaling (the defining PPS property)
    val scaled = docs.withColumn("n_chars", col("n_chars") * 7)
    val ids2 = Sampling.weightedPriority(scaled, "doc_id", "n_chars",
      k = 20).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids1 == ids2, "sample must be invariant under weight rescaling")
    // zero/negative weights never enter
    val withZero = docs.withColumn("n_chars",
      when(col("doc_id") === 0L, 0L).otherwise(col("n_chars")))
    val ids3 = Sampling.weightedPriority(withZero, "doc_id", "n_chars",
      k = 2000).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!ids3.contains(0L))
    // top-k runs as TakeOrderedAndProject (partition-local prune, no
    // full corpus through one sort task)
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("seriesCorrelation: self +1, anti-phase -1, degenerate NULL") {
    import graft.queries.TimeSeries
    // two hourly series: y = -x (perfect anticorrelation), z constant
    val rows = (0 until 6).flatMap { h =>
      Seq(("x", ts(f"2024-01-01 $h%02d:30:00"), h.toDouble),
        ("y", ts(f"2024-01-01 $h%02d:30:00"), -h.toDouble),
        ("z", ts(f"2024-01-01 $h%02d:30:00"), 5.0))
    }.toDF("series", "ts", "value")
    val out = TimeSeries.seriesCorrelation(rows, "ts", "series", "value")
      .collect()
      .map(r => (r.getAs[String]("series_a"),
        r.getAs[String]("series_b")) -> r).toMap
    // sqrt(dx)*sqrt(dx) reassembles dx only to within an ulp — the
    // values are deterministic but not algebraically clamped to [-1, 1]
    assert(math.abs(out(("x", "x")).getAs[Double]("corr_r") - 1.0) < 1e-12)
    assert(math.abs(out(("x", "y")).getAs[Double]("corr_r") + 1.0) < 1e-12)
    // zero-variance series: NULL, never NaN
    assert(out(("x", "z")).isNullAt(out(("x", "z")).fieldIndex("corr_r")))
    assert(out(("z", "z")).isNullAt(out(("z", "z")).fieldIndex("corr_r")))
    assert(out(("x", "y")).getAs[Long]("n") == 6L)
  }

  test("seasonalityProfile: integer hour/dow cells (1970-01-01 = Thursday)") {
    import graft.queries.TimeSeries
    val rows = Seq(
      ("k", ts("1970-01-01 07:10:00"), 2.0),  // Thursday = 4
      ("k", ts("1970-01-01 07:50:00"), 4.0),
      ("k", ts("1970-01-05 23:00:00"), 9.0)   // Monday = 1
    ).toDF("series", "ts", "value")
    val out = TimeSeries.seasonalityProfile(rows, "ts", "series", "value")
      .collect().map(r => (r.getAs[Long]("hour_of_day"),
        r.getAs[Long]("day_of_week")) -> r).toMap
    assert(out((7L, 4L)).getAs[Long]("n") == 2L)
    assert(out((7L, 4L)).getAs[Double]("avg_value") == 3.0)
    assert(out((23L, 1L)).getAs[Long]("n") == 1L)
    // pre-1970: one second before the epoch is 23:59 Wednesday (3) —
    // floor-division semantics, not trunc-toward-zero
    val old = Seq(("k", ts("1969-12-31 23:59:59"), 1.0))
      .toDF("series", "ts", "value")
    val o = TimeSeries.seasonalityProfile(old, "ts", "series", "value")
      .collect()(0)
    assert(o.getAs[Long]("hour_of_day") == 23L, o.toString)
    assert(o.getAs[Long]("day_of_week") == 3L, o.toString)
  }

  test("snapshotDiff: hand-counted add/remove/change, NULL-safe payloads") {
    val before = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("d"))
    ).toDF("id", "p")
    val after = Seq(
      (1L, Some("a")),   // unchanged
      (2L, Some("B")),   // changed
      (3L, None),        // unchanged (NULL == NULL, null-safely)
      (5L, Some("e"))    // added; 4 removed
    ).toDF("id", "p")
    val r = Warehouse.snapshotDiff(before, after, Seq("id"), Seq("p"))
      .collect()(0)
    assert(r.getAs[Long]("n_added") == 1L)
    assert(r.getAs[Long]("n_removed") == 1L)
    assert(r.getAs[Long]("n_changed") == 1L)
    assert(r.getAs[Long]("n_unchanged") == 2L)
    assert(r.getAs[Long]("n_total") == 5L)
    assert(r.getAs[Double]("drift_rate") == 0.6)
    // identity: diffing a table against itself drifts 0
    val self = Warehouse.snapshotDiff(before, before, Seq("id"), Seq("p"))
      .collect()(0)
    assert(self.getAs[Double]("drift_rate") == 0.0)
  }

  test("kAnonymityAudit: class accounting and the k gate") {
    val export = Seq(
      ("x", 1L), ("x", 1L), ("x", 1L), ("x", 1L), ("x", 1L), // class of 5
      ("y", 1L), ("y", 1L),                                   // class of 2
      ("z", 9L)                                               // singleton
    ).toDF("qa", "qb")
    val r = Warehouse.kAnonymityAudit(export, Seq("qa", "qb"), k = 5)
      .collect()(0)
    assert(r.getAs[Long]("n_classes") == 3L && r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("min_class") == 1L)
    assert(r.getAs[Long]("n_singletons") == 1L)
    assert(r.getAs[Long]("n_rows_below_k") == 3L) // the 2-class + singleton
    assert(r.getAs[Double]("below_k_share") == 0.375)
  }

  test("seriesTrend: exact slope on a synthetic line; degenerate NULL") {
    import graft.queries.TimeSeries
    // y = 10 + 2·t over 4 hourly buckets -> slope 2/hour, intercept 10
    val rows = (0 until 4).map { h =>
      ("k", ts(f"2024-01-01 $h%02d:15:00"), 10.0 + 2.0 * h)
    } :+ (("solo", ts("2024-01-01 00:00:00"), 5.0))
    val out = TimeSeries.seriesTrend(rows.toDF("series", "ts", "value"),
      "ts", "series", "value")
      .collect().map(r => r.getAs[String]("series") -> r).toMap
    assert(math.abs(out("k").getAs[Double]("slope_per_hour") - 2.0) < 1e-12)
    assert(math.abs(out("k").getAs[Double]("intercept") - 10.0) < 1e-12)
    assert(out("solo").isNullAt(out("solo").fieldIndex("slope_per_hour")))
  }

  test("languageIdKappa: perfect router 1.0; majority-vote accuracy beats kappa") {
    import graft.operators.TextAnalysis
    // texts the router classifies perfectly (marker-dense)
    val perfect = Seq(
      (1L, "the and is of to the and", "en"),
      (2L, "der und die das ist der", "de"),
      (3L, "el la los de que el la", "es")
    ).toDF("doc_id", "text", "lang")
    val p = TextAnalysis.languageIdKappa(perfect, "text", "lang")
      .collect()(0)
    assert(p.getAs[Long]("n_agree") == 3L)
    assert(p.getAs[Double]("p_observed") == 1.0)
    assert(p.getAs[Double]("kappa") == 1.0)
    // imbalanced corpus where the truth is all-en: accuracy is high by
    // luck; kappa strips the marginal agreement
    val lucky = Seq(
      (1L, "the and is of to", "en"),
      (2L, "the and is of to", "en"),
      (3L, "der und die das ist", "en") // router says de, truth en
    ).toDF("doc_id", "text", "lang")
    val l = TextAnalysis.languageIdKappa(lucky, "text", "lang")
      .collect()(0)
    assert(l.getAs[Double]("p_observed") > 0.6)
    assert(l.getAs[Double]("kappa") < l.getAs[Double]("p_observed"))
  }

  test("tokenizerFertility: a merge that fuses lowers fertility") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "abab abab", "x"),   // 'ab' merge fuses pairs
      (2L, "cd cd cd", "y")     // untouched by the merges
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.tokenizerFertility(docs, "doc_id", "text",
      "lang", merges = Seq(("a", "b"), ("ab", "ab")))
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    // "abab" -> chars a,b,a,b -> ab,ab -> abab: ONE token per word
    assert(out("x").getAs[Long]("n_tokens") == 2L)
    assert(out("x").getAs[Double]("fertility") == 1.0)
    // "cd" stays c|d: two tokens per word
    assert(out("y").getAs[Long]("n_tokens") == 6L)
    assert(out("y").getAs[Double]("fertility") == 2.0)
    assert(out("x").getAs[Long]("n_words") == 2L)
  }

  test("columnProfile: per-column accounting with NULLs") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("b")),
      (None, Some("a"))
    ).toDF("id", "s")
    val out = Warehouse.columnProfile(df, Seq("id", "s"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(out("id").getAs[Long]("n_rows") == 4L)
    assert(out("id").getAs[Long]("n_nulls") == 1L)
    assert(out("id").getAs[Long]("n_distinct") == 2L)
    assert(out("id").getAs[String]("min_value") == "1" &&
      out("id").getAs[String]("max_value") == "2")
    assert(out("s").getAs[Long]("n_nulls") == 1L)
    assert(out("s").getAs[Double]("null_share") == 0.25)
    // ONE scan for the whole report — a per-column union would read
    // the table N times
    val ev = spark.read.parquet(sf("events"))
    val plan = Warehouse.columnProfile(ev,
      Seq("event_id", "user_id", "event_type", "value"))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"profile must scan once:\n$plan")
  }

  test("topSessionPaths: ordered paths, gap split, truncation marker") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1, session 1: a>b ; session 2 after a 2000s gap: c
      (1L, t(0), 1L, "a"), (1L, t(10), 2L, "b"), (1L, t(3000), 3L, "c"),
      // user 2: same a>b journey
      (2L, t(0), 4L, "a"), (2L, t(5), 5L, "b"),
      // user 3: a 7-step bot session -> truncated path
      (3L, t(0), 6L, "x"), (3L, t(1), 7L, "x"), (3L, t(2), 8L, "x"),
      (3L, t(3), 9L, "x"), (3L, t(4), 10L, "x"), (3L, t(5), 11L, "x"),
      (3L, t(6), 12L, "x")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Warehouse.topSessionPaths(ev, "ts", "user_id", "event_id",
      "event_type", gapSeconds = 1800L, maxSteps = 5, k = 10)
      .collect().map(r => r.getAs[String]("path") ->
        r.getAs[Long]("n_sessions")).toMap
    assert(out("a>b") == 2L)
    assert(out("c") == 1L)
    assert(out("x>x>x>x>x>…") == 1L) // capped + marked, never unbounded
    assert(!out.keys.exists(_.count(_ == '>') > 5))
  }

  test("state dwell and burst: hand-counted compositions") {
    // dwell: user 7 holds 'a' 20s, 'b' 10s, then open 'a'
    val ev = Seq(
      (7L, ts("2024-01-01 00:00:10"), "a", 1L),
      (7L, ts("2024-01-01 00:00:30"), "b", 2L),
      (7L, ts("2024-01-01 00:00:40"), "a", 3L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val dim = Warehouse.scd2Dimension(ev, "ts", "user_id", "event_type",
      "event_id")
    val dwell = dim.groupBy(col("event_type"))
      .agg(sum(when(col("valid_to_s").isNotNull,
        col("valid_to_s") - col("valid_from_s"))).as("dwell_s"),
        sum(when(col("valid_to_s").isNull, 1L).otherwise(0L)).as("n_open"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(dwell("a").getAs[Long]("dwell_s") == 20L)
    assert(dwell("a").getAs[Long]("n_open") == 1L) // the open run excluded
    assert(dwell("b").getAs[Long]("dwell_s") == 10L)
    // burst: 3 events in minute 0, 1 in minute 2 -> peak 3 at minute 0
    val burst = Seq(
      ("x", ts("2024-01-01 00:00:01")), ("x", ts("2024-01-01 00:00:30")),
      ("x", ts("2024-01-01 00:00:59")), ("x", ts("2024-01-01 00:02:05"))
    ).toDF("event_type", "ts")
      .groupBy(col("event_type"),
        (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(60L)))
          .as("minute_s"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("peak"),
        min_by(col("minute_s"), struct((-col("n")).as("neg"),
          col("minute_s"))).as("peak_minute_s"))
      .collect()(0)
    assert(burst.getAs[Long]("peak") == 3L)
    assert(burst.getAs[Long]("peak_minute_s") ==
      ts("2024-01-01 00:00:00").getTime / 1000L)
  }

  test("minhashQualityEval: exact-duplicate corpus scores perfect") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven"),
      (5L, "completely different text goes here now")
    ).toDF("doc_id", "text")
    val row = Dedup.minhashQualityEval(docs, "doc_id", "text",
      shingleWords = 3, bands = 16, rowsPerBand = 4,
      threshold = 0.5).collect()(0)
    // identical docs share every minhash component: both pairs found,
    // nothing spurious at threshold 0.5
    assert(row.getAs[Long]("n_truth") == 2L)
    assert(row.getAs[Long]("n_pred") == 2L)
    assert(row.getAs[Long]("n_hit") == 2L)
    assert(row.getAs[Double]("precision") == 1.0)
    assert(row.getAs[Double]("recall") == 1.0)
  }

  test("giniIndex: equal split 0, one-whale concentration, degenerate " +
    "NULL") {
    val d = Seq(
      ("even", 1L, 5.0), ("even", 2L, 5.0),
      ("even", 3L, 5.0), ("even", 4L, 5.0), // all equal -> 0
      ("whale", 1L, 0.0), ("whale", 2L, 0.0),
      ("whale", 3L, 0.0), ("whale", 4L, 100.0), // -> 3/4
      ("solo", 9L, 7.0) // single key -> NULL
    ).toDF("g", "k", "v")
    val got = graft.queries.Warehouse.giniIndex(d, "g", "k", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_keys"),
          Option(r.get(r.fieldIndex("gini")))))).toMap
    assert(got("even") == ((4L, Some(0.0))), s"got: $got")
    // S = 100, S1 = 4*100 = 400: (800 - 500) / 400 = 0.75
    assert(got("whale") == ((4L, Some(0.75))), s"got: $got")
    assert(got("solo") == ((1L, None)), s"got: $got")
  }

  test("mutualInformation: perfect dependence = 1 bit, nmi 1; " +
    "independence = 0") {
    // X determines Y exactly: two classes, two rows each
    val dep = Seq(("p", 0L), ("p", 0L), ("q", 10L), ("q", 10L))
      .toDF("x", "y")
    val r = graft.queries.Warehouse.mutualInformation(dep, "x", "y")
      .collect()(0)
    // pxy = px = py = 5000; ratio 2 -> 4 quarter-bits x 4 rows = 16
    assert(r.getAs[Long]("mi_q") == 16L)
    assert(r.getAs[Double]("mi_bits") == 1.0)
    assert(r.getAs[Long]("hx_q") == 16L && r.getAs[Long]("hy_q") == 16L)
    assert(r.getAs[Double]("nmi") == 1.0)
    // all four combinations equally likely: knowing X says nothing
    val ind = Seq(("p", 0L), ("p", 10L), ("q", 0L), ("q", 10L))
      .toDF("x", "y")
    val r2 = graft.queries.Warehouse.mutualInformation(ind, "x", "y")
      .collect()(0)
    assert(r2.getAs[Long]("mi_q") == 0L)
    assert(r2.getAs[Double]("nmi") == 0.0)
  }

  test("lDiversityAudit: a big uniform class leaks; a small diverse " +
    "one doesn't") {
    // class q=1: 4 rows, ALL sensitive 'x' -> diversity 1 (the leak
    // k-anonymity at k<=4 would wave through); class q=2: 2 rows,
    // 2 distinct values -> diversity 2
    val d = Seq((1L, "x"), (1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "a"), (2L, "b")).toDF("q", "s")
    val r = graft.queries.Warehouse
      .lDiversityAudit(d, Seq("q"), "s", l = 2).collect()(0)
    assert(r.getAs[Long]("n_classes") == 2L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("min_diversity") == 1L)
    assert(r.getAs[Long]("n_classes_below_l") == 1L)
    assert(r.getAs[Long]("n_rows_below_l") == 4L)
    assert(r.getAs[Double]("below_l_share") == 4.0 / 6.0)
  }

  test("associationRules: support filter, confidence and lift exact") {
    // baskets: {1,2,3}, {1,2}, {1,2,4}, {3,4} -> only (1,2) reaches
    // support 2 (it has 3); items 1 and 2 each appear in 3 of 4 baskets
    val d = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (12L, 4L), (13L, 3L), (13L, 4L))
      .toDF("basket", "item")
    val got = graft.queries.Warehouse
      .associationRules(d, "basket", "item", minCount = 2L, topK = 10)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) == ((1L, 2L)))
    assert(r.getAs[Long]("n_pair") == 3L)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_baskets") == 4L)
    assert(r.getAs[Double]("confidence_ab") == 1.0)
    assert(r.getAs[Double]("lift") == 12.0 / 9.0)
  }

  test("associationRules: duplicate lines collapse; top-k tiebreak " +
    "is (support desc, pair)") {
    // item repeated within a basket must count once (DISTINCT basket,
    // item); at minCount=1 ordering is deterministic
    val d = Seq((10L, 1L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (11L, 3L)).toDF("basket", "item")
    val got = graft.queries.Warehouse
      .associationRules(d, "basket", "item", minCount = 1L, topK = 10)
      .collect().map(r => (r.getAs[Long]("item_a"),
        r.getAs[Long]("item_b"), r.getAs[Long]("n_pair"))).toSeq
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)),
      s"got: $got")
  }

  test("jsonFieldRollup: extraction coverage, malformed and missing " +
    "fields stay NULL") {
    val d = Seq(
      ("a", """{"k": 5}"""), ("a", """{"k": 7}"""),
      ("a", """{"other": 1}"""), // field missing -> NULL
      ("b", """{"k": 5}"""), ("b", "not json"), // malformed -> NULL
      ("b", """{"k": "x"}""") // non-numeric -> try_cast NULL
    ).toDF("g", "props")
    val got = graft.queries.Warehouse.jsonFieldRollup(d, "g", "props")
      .collect().map(r => r.getString(0) -> ((r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_with_field"), r.getAs[Long]("k_min"),
        r.getAs[Long]("k_max"), r.getAs[Long]("k_sum"),
        r.getAs[Long]("k_distinct")))).toMap
    assert(got("a") == ((3L, 2L, 5L, 7L, 12L, 2L)), s"got: $got")
    assert(got("b") == ((3L, 1L, 5L, 5L, 5L, 1L)), s"got: $got")
  }

  test("weightedMedian: token mass pulls the median off the row median") {
    // g1: weights concentrate on the huge doc -> weighted median 100
    // (the unweighted row median would be 20)
    val d = Seq(
      ("g1", 10L, 1L, 1L), ("g1", 20L, 1L, 2L), ("g1", 100L, 8L, 3L),
      // g2: uniform weights reduce to the classic lower median (2)
      ("g2", 1L, 1L, 4L), ("g2", 2L, 1L, 5L),
      ("g2", 3L, 1L, 6L), ("g2", 4L, 1L, 7L),
      // g3: equal values, tie walked by rowId; half reached at v=5
      ("g3", 5L, 1L, 8L), ("g3", 5L, 1L, 9L), ("g3", 7L, 2L, 10L)
    ).toDF("g", "v", "wt", "rid")
    val got = graft.queries.Warehouse
      .weightedMedian(d, "g", "v", "wt", "rid").collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_rows"),
        r.getAs[Long]("total_weight"),
        r.getAs[Long]("weighted_median")))).toMap
    assert(got("g1") == ((3L, 10L, 100L)), s"got: $got")
    assert(got("g2") == ((4L, 4L, 2L)), s"got: $got")
    assert(got("g3") == ((3L, 4L, 5L)), s"got: $got")
  }

  test("weightedMedian: partitioning-invariant") {
    val d = (0 until 50).map(i => ("g" + (i % 3), (i * 7 % 23).toLong,
      (i % 4 + 1).toLong, i.toLong)).toDF("g", "v", "wt", "rid")
    val a = graft.queries.Warehouse
      .weightedMedian(d.repartition(1), "g", "v", "wt", "rid")
      .collect().map(_.toSeq).toSet
    val b = graft.queries.Warehouse
      .weightedMedian(d.repartition(11), "g", "v", "wt", "rid")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("itemSimilarityTopK: cosine hand-check, apriori prune, mirror") {
    // baskets: b1{1,2,3}, b2{1,2}, b3{1,2,4} → only items 1,2 are
    // frequent (n=3 each); pair (1,2) co-occurs 3× → cosine
    // 3/sqrt(3·3) = 1.0, mirrored both directions; 3 and 4 pruned.
    val d = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 4L)).toDF("b", "i")
    val rows = graft.queries.Warehouse.itemSimilarityTopK(d, "b", "i",
      minCount = 2L, topK = 5).collect()
    assert(rows.length == 2)
    val byItem = rows.map(r => r.getAs[Long]("item") ->
      ((r.getAs[Long]("neighbor"), r.getAs[Long]("n_pair"),
        r.getAs[Double]("cosine"), r.getAs[Long]("sim_rank")))).toMap
    assert(byItem(1L) == ((2L, 3L, 1.0, 1L)))
    assert(byItem(2L) == ((1L, 3L, 1.0, 1L)))
  }

  test("basketSizeHistogram: shares and CCDF cumulative") {
    val d = Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L).toDF("b")
    val got = graft.queries.Warehouse.basketSizeHistogram(d, "b")
      .collect().map(r => r.getAs[Long]("n_lines") ->
        ((r.getAs[Long]("n_baskets"),
          r.getAs[Long]("basket_share_ppb"),
          r.getAs[Long]("cum_baskets")))).toMap
    // sizes: {3:1, 2:1, 1:2} over 4 baskets
    assert(got(1L) == ((2L, 500000000L, 2L)), s"$got")
    assert(got(2L) == ((1L, 250000000L, 3L)), s"$got")
    assert(got(3L) == ((1L, 250000000L, 4L)), s"$got")
  }

  test("repeatBands: order-count bands, ppm customer/revenue shares") {
    val d = (Seq(("A", 10.0)) ++ Seq.fill(3)(("B", 10.0)) ++
      Seq.fill(10)(("C", 10.0))).toDF("k", "v")
    val got = graft.queries.Warehouse.repeatBands(d, "k", "v")
      .collect().map(r => r.getAs[String]("band") ->
        ((r.getAs[Long]("n_customers"), r.getAs[Long]("n_orders"),
          r.getAs[Long]("units"),
          r.getAs[Long]("customer_share_ppm"),
          r.getAs[Long]("revenue_share_ppm")))).toMap
    assert(got("one_time") == ((1L, 1L, 10L, 333333L, 71428L)),
      s"$got")
    assert(got("repeat_2_4") == ((1L, 3L, 30L, 333333L, 214285L)),
      s"$got")
    assert(got("power_10_plus") == ((1L, 10L, 100L, 333333L, 714285L)),
      s"$got")
  }

  test("cohortLtv: triangle cells, cumulative, micro-units per " +
    "cohort user") {
    // users A,B both cohort week 0; A returns in week 1
    val wk = 7L * 86400L
    val d = Seq(("A", 0L, 10.0), ("A", wk, 5.0), ("B", 60L, 2.0))
      .toDF("k", "epoch", "v")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = graft.queries.Warehouse.cohortLtv(d, "ts", "k", "v")
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("age_week")) ->
        ((r.getAs[Long]("cohort_users"), r.getAs[Long]("n_active"),
          r.getAs[Long]("units"), r.getAs[Long]("cum_units"),
          r.getAs[Long]("cum_units_per_user_ppm")))).toMap
    assert(got((0L, 0L)) == ((2L, 2L, 12L, 12L, 6000000L)), s"$got")
    assert(got((0L, 1L)) == ((2L, 1L, 5L, 17L, 8500000L)), s"$got")
  }

  test("abcAnalysis: exact 80/15/5 boundaries, crossing key stays in " +
    "its starting class") {
    // values 80/15/5: prev-cumulative tests put them in A/B/C exactly
    val d = Seq((1L, 80.0), (2L, 15.0), (3L, 5.0)).toDF("k", "v")
    val got = graft.queries.Warehouse.abcAnalysis(d, "k", "v")
      .collect().map(r => r.getAs[String]("abc_class") ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("units"),
          r.getAs[Long]("share_ppm")))).toMap
    assert(got("A") == ((1L, 80L, 800000L)), s"$got")
    assert(got("B") == ((1L, 15L, 150000L)), s"$got")
    assert(got("C") == ((1L, 5L, 50000L)), s"$got")
  }

  test("freshnessAudit: lag vs global watermark, last-day window, " +
    "stale verdict") {
    val d = Seq(("a", 100L), ("a", 5000L), ("b", 100000L))
      .toDF("g", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = graft.queries.Warehouse
      .freshnessAudit(d, "g", "ts", 3600L).collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("last_epoch_s"), r.getAs[Long]("lag_s"),
          r.getAs[Long]("n_last_day"),
          r.getAs[Boolean]("is_stale")))).toMap
    assert(got("a") == ((5000L, 95000L, 0L, true)), s"$got")
    assert(got("b") == ((100000L, 0L, 1L, false)), s"$got")
  }

  test("latencyQuantiles: exact rank-selected p50/p90/p99 on a " +
    "1..10-day ladder") {
    val d = (1 to 10).map(i => ("g", 0L, i.toLong * 86400L))
      .toDF("g", "start_epoch", "end_epoch")
      .withColumn("t0", timestamp_seconds(col("start_epoch")))
      .withColumn("t1", timestamp_seconds(col("end_epoch")))
    val r = graft.queries.Warehouse
      .latencyQuantiles(d, "g", "t0", "t1").collect().head
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("min_days") == 1L)
    assert(r.getAs[Long]("max_days") == 10L)
    assert(r.getAs[Double]("mean_days") == 5.5)
    // rank ceil(q*n/100): p50 → rank 5, p90 → rank 9, p99 → rank 10
    assert(r.getAs[Long]("p50_days") == 5L)
    assert(r.getAs[Long]("p90_days") == 9L)
    assert(r.getAs[Long]("p99_days") == 10L)
  }

  test("paretoFrontier: strict dominance, same-x ties, co-optimal " +
    "duplicates counted") {
    val d = Seq((1.0, 5), (1.0, 5), (1.0, 3), (2.0, 7), (2.0, 5),
      (3.0, 6), (3.0, 7)).toDF("price", "size")
    val got = graft.queries.Warehouse
      .paretoFrontier(d, "price", "size").collect()
      .map(r => (r.getAs[Double]("price"), r.getAs[Int]("size"),
        r.getAs[Long]("n_rows"))).sortBy(_._1)
    // (3.0, 7) is dominated by (2.0, 7): cheaper, same size
    assert(got.toSeq == Seq((1.0, 5, 2L), (2.0, 7, 1L)), s"$got")
  }

  test("shareShiftTopK: ppb share deltas, tie-broken top-k order") {
    val d = (Seq.fill(10)(("A", false)) ++ Seq.fill(10)(("B", true)) ++
      Seq.fill(10)(("C", false)) ++ Seq.fill(10)(("C", true)))
      .toDF("k", "late")
    val rows = graft.queries.Warehouse
      .shareShiftTopK(d, "k", "late", topK = 3).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("delta_ppb")))
    assert(rows.toSeq ==
      Seq(("A", 500000000L), ("B", 500000000L), ("C", 0L)), s"$rows")
  }

  test("herfindahlIndex: monopoly 1e9, even split 1/n, effective n") {
    val d = Seq(
      ("mono", 1L, 10.0), ("mono", 2L, 0.0),
      ("even", 1L, 5.0), ("even", 2L, 5.0),
      ("even", 3L, 5.0), ("even", 4L, 5.0)
    ).toDF("g", "k", "v")
    val got = graft.queries.Warehouse.herfindahlIndex(d, "g", "k", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("hhi_ppb"), r.getAs[Long]("top_share_ppb"),
          r.getAs[Double]("effective_n")))).toMap
    assert(got("mono") == ((1000000000L, 1000000000L, 1.0)), s"$got")
    assert(got("even") == ((250000000L, 250000000L, 4.0)), s"$got")
  }

  test("decileShares: 20-key ladder fills known deciles, cum hits 1e9") {
    val d = (1 to 20).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "k", "v")
    val rows = graft.queries.Warehouse.decileShares(d, "g", "k", "v")
      .collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)
    // decile d holds keys (2d-1, 2d): units 4d-1 of 210 total
    rows.foreach { r =>
      val dec = r.getAs[Long]("decile")
      assert(r.getAs[Long]("n_keys") == 2L)
      assert(r.getAs[Long]("units") == 4 * dec - 1)
      assert(r.getAs[Long]("share_ppb") ==
        (4 * dec - 1) * 1000000000L / 210L)
    }
    assert(rows.last.getAs[Long]("cum_share_ppb") == 1000000000L)
  }

  test("quantileAlignment: rank-selected quantiles and signed gaps") {
    import spark.implicits._
    val d = ((1L to 10L).map(("a", _)) ++ (11L to 20L).map(("b", _)))
      .toDF("g", "v")
    val got = Warehouse.quantileAlignment(d, "g", "v",
      pcts = Seq(50, 90)).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("p")) ->
        ((r.getAs[Long]("group_value"), r.getAs[Long]("global_value"),
          r.getAs[Long]("gap")))).toMap
    // group ranks ceil(10*p/100), global ceil(20*p/100)
    assert(got(("a", 50)) == ((5L, 10L, -5L)))
    assert(got(("b", 50)) == ((15L, 10L, 5L)))
    assert(got(("a", 90)) == ((9L, 18L, -9L)))
    assert(got(("b", 90)) == ((19L, 18L, 1L)))
  }

  test("keySkew: hand-checked masses, nulls excluded, top10 covers " +
    "small key sets") {
    import spark.implicits._
    val d = (Seq.fill(5)(Some("a")) ++ Seq.fill(3)(Some("b")) ++
      Seq(Some("c"), None)).toDF("k")
    val r = Warehouse.keySkew(d, "k", "fam").collect().head
    assert(r.getAs[String]("key_family") == "fam")
    assert(r.getAs[Long]("n_rows") == 9L && r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("top1_ppb") == 5L * 1000000000L / 9L)
    assert(r.getAs[Long]("top10_ppb") == 1000000000L)
  }
}
