package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Hypothesis-test operators: hand-checked textbook fixtures (exact
  * closed-form values), tie handling, and partitioning invariance —
  * the determinism claim behind their oracle hash parity. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquareIndependence: 2x2 hand-checked chi2 and Cramer's V") {
    // o = [[10,20],[20,10]]; all margins 30, e = 15 everywhere:
    // chi2 = 4*(5^2/15) = 20/3; V = sqrt(chi2/n) = 1/3 for a 2x2.
    val rows = Seq.fill(10)(("a", 0L)) ++ Seq.fill(20)(("a", 1L)) ++
      Seq.fill(20)(("b", 0L)) ++ Seq.fill(10)(("b", 1L))
    val out = Stats.chiSquareIndependence(rows.toDF("x", "y"), "x", "y")
      .collect().head
    assert(out.getAs[Long]("n_rows") == 60L)
    assert(out.getAs[Long]("n_cells") == 4L)
    assert(out.getAs[Long]("dof") == 1L)
    assert(math.abs(out.getAs[Double]("chi2") - 20.0 / 3) < 1e-5)
    assert(math.abs(out.getAs[Double]("cramers_v") - 1.0 / 3) < 1e-6)
  }

  test("chiSquareIndependence: single-category margin -> null stat") {
    val out = Stats.chiSquareIndependence(
      Seq(("a", 1L), ("a", 2L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(out.getAs[Long]("dof") == 0L)
    assert(out.isNullAt(out.fieldIndex("chi2")))
  }

  test("anovaF: two balanced groups, exact textbook F") {
    // g1 = 1,2,3 (mean 2), g2 = 3,4,5 (mean 4): SSB = 6, SSW = 4,
    // F = (6/1)/(4/4) = 6, eta^2 = 0.6 — exact at scale 4.
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 3.0), ("g2", 4.0), ("g2", 5.0)).toDF("g", "x")
    val out = Stats.anovaF(df, "g", "x").collect().head
    assert(out.getAs[Long]("n_rows") == 6L)
    assert(out.getAs[Long]("k") == 2L)
    assert(out.getAs[Double]("ss_between") == 6.0)
    assert(out.getAs[Double]("ss_within") == 4.0)
    assert(out.getAs[Double]("f_stat") == 6.0)
    assert(out.getAs[Double]("eta_sq") == 0.6)
  }

  test("spearmanCorr: perfect monotone = 1, reversed = -1, ties exact") {
    def rho(xs: Seq[(Long, Long)]): Double =
      Stats.spearmanCorr(xs.toDF("x", "y"), "x", "y")
        .collect().head.getAs[Double]("rho")
    assert(rho(Seq(1L -> 10L, 2L -> 20L, 3L -> 30L)) == 1.0)
    assert(rho(Seq(1L -> 30L, 2L -> 20L, 3L -> 10L)) == -1.0)
    // ties: x=(1,1,2), y=(5,6,7): d2x=(-1,-1,2), d2y=(-2,0,2)
    // rho = 6/sqrt(6*8)
    assert(math.abs(rho(Seq(1L -> 5L, 1L -> 6L, 2L -> 7L)) -
      6.0 / math.sqrt(48.0)) < 1e-12)
  }

  test("mannWhitneyU: separation, ties at half-units, rank-biserial") {
    val sep = Stats.mannWhitneyU(
      Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v"),
      "g", "v", "A", "B").collect().head
    assert(sep.getAs[Long]("u2_a") == 0L) // complete separation
    assert(sep.getAs[Long]("u2_b") == 8L)
    assert(sep.getAs[Double]("rank_biserial") == -1.0)
    assert(math.abs(sep.getAs[Double]("z_stat") -
      -4.0 / (2.0 * math.sqrt(5.0 / 3))) < 1e-12)

    val tie = Stats.mannWhitneyU(
      Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0)).toDF("g", "v"),
      "g", "v", "A", "B").collect().head
    assert(tie.getAs[Long]("u2_a") == 1L) // U_A = 0.5 from the tie
    assert(tie.getAs[Long]("tie_cubes") == 6L)
  }

  test("brownForsythe: spread difference flagged, exact textbook F") {
    // medians 1 and 2 (lower-median convention), |x-med| = {0,2} vs
    // {0,6}: SSB = 4, SSW = 20, F = (4/1)/(20/2) = 0.4
    val d = Seq(("g1", 1.0), ("g1", 3.0), ("g2", 2.0), ("g2", 8.0))
      .toDF("g", "v")
    val r = Stats.brownForsythe(d, "g", "v").collect().head
    assert(r.getAs[Long]("n_rows") == 4L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("ss_between") == 4.0)
    assert(r.getAs[Double]("ss_within") == 20.0)
    assert(r.getAs[Double]("f_stat") == 0.4)
  }

  test("theilSenSlope: outlier-proof median of pairwise slopes") {
    // three clean slope-10 points plus a wild outlier: median 10
    val d = Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 1000L))
      .toDF("x", "y")
    val r = Stats.theilSenSlope(d, "x", "y").collect().head
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("median_slope") == 10.0)
  }

  test("runsTest: lower median, dropped ties, hand-counted runs") {
    // series (by order) 1,4,2,5: lower median 2 (dropped), kept signs
    // 0,1,1 → 2 runs; n_above=2, n_below=1
    val d = Seq((1L, 1L), (2L, 4L), (3L, 2L), (4L, 5L)).toDF("o", "v")
    val r = Stats.runsTest(d, "o", "v").collect().head
    assert(r.getAs[Long]("median_v") == 2L)
    assert(r.getAs[Long]("n_kept") == 3L)
    assert(r.getAs[Long]("n_above") == 2L)
    assert(r.getAs[Long]("n_below") == 1L)
    assert(r.getAs[Long]("n_runs") == 2L)
    val mu = 2.0 * 2.0 * 1.0 / 3.0 + 1.0
    val vr = (2.0 * 2.0 * 1.0 * (2.0 * 2.0 * 1.0 - 3.0)) /
      (3.0 * 3.0 * (3.0 - 1.0))
    assert(r.getAs[Double]("z_stat") == (2.0 - mu) / math.sqrt(vr))
  }

  test("wilsonInterval: closed-form fixture, zero-success floor") {
    val d = (Seq.fill(1)(("g", true)) ++ Seq.fill(3)(("g", false)) ++
      Seq.fill(4)(("z", false))).toDF("grp", "ok")
    val got = Stats.wilsonInterval(d, "grp", "ok").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val g = got("g")
    assert(g.getAs[Long]("n_trials") == 4L)
    assert(g.getAs[Double]("p_hat") == 0.25)
    val z = 1.96; val nd = 4.0; val p = 0.25
    val denom = 1.0 + z * z / nd
    val center = (p + z * z / (2.0 * nd)) / denom
    val half = z * math.sqrt(p * (1.0 - p) / nd +
      z * z / (4.0 * nd * nd)) / denom
    assert(g.getAs[Double]("wilson_low") == center - half)
    assert(g.getAs[Double]("wilson_high") == center + half)
    // p_hat = 0: the Wilson lower bound collapses to ~0, never < 0
    val zr = got("z")
    assert(math.abs(zr.getAs[Double]("wilson_low")) < 1e-15)
    assert(zr.getAs[Double]("wilson_high") > 0.0)
  }

  test("kendallTauB: perfect concordance, reversal, tie correction") {
    def tau(xs: Seq[(Long, Long)]) =
      Stats.kendallTauB(xs.toDF("x", "y"), "x", "y").collect().head
    val up = tau(Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(up.getAs[Long]("c_pairs") == 3L)
    assert(up.getAs[Long]("d_pairs") == 0L)
    assert(up.getAs[Double]("tau_b") == 1.0)
    assert(tau(Seq(1L -> 3L, 2L -> 2L, 3L -> 1L))
      .getAs[Double]("tau_b") == -1.0)
    // x = (1,1,2), y = (1,2,3): one x-tie pair, C = 2, D = 0 →
    // tau_b = 2/sqrt((3-1)*(3-0))
    val tied = tau(Seq(1L -> 1L, 1L -> 2L, 2L -> 3L))
    assert(tied.getAs[Long]("tie_x_pairs") == 1L)
    assert(tied.getAs[Long]("tie_y_pairs") == 0L)
    assert(math.abs(tied.getAs[Double]("tau_b") -
      2.0 / math.sqrt(6.0)) < 1e-12)
  }

  test("welchT: equal-variance fixture recovers the pooled t and df") {
    // A = 1,2,3; B = 5,6,7: means 2/6, vars 1/1, se2 = 2/3,
    // t = -4/sqrt(2/3), Welch df = n1+n2-2 = 4 exactly here.
    val out = Stats.welchT(
      Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
        ("B", 5.0), ("B", 6.0), ("B", 7.0)).toDF("g", "v"),
      "g", "v", "A", "B").collect().head
    assert(out.getAs[Long]("n_a") == 3L && out.getAs[Long]("n_b") == 3L)
    assert(out.getAs[Double]("mean_a") == 2.0)
    assert(out.getAs[Double]("var_b") == 1.0)
    assert(math.abs(out.getAs[Double]("t_stat") -
      -4.0 / math.sqrt(2.0 / 3)) < 1e-12)
    assert(math.abs(out.getAs[Double]("df_welch") - 4.0) < 1e-12)
  }

  test("stats operators are partitioning-invariant") {
    val df = Seq.tabulate(200)(i =>
      (if (i % 3 == 0) "p" else "c", (i % 17).toDouble))
      .toDF("g", "v")
    def all(d: org.apache.spark.sql.DataFrame): Seq[String] = Seq(
      Stats.chiSquareIndependence(d, "g", "v"),
      Stats.anovaF(d, "g", "v"),
      Stats.mannWhitneyU(d, "g", "v", "p", "c"),
      Stats.welchT(d, "g", "v", "p", "c"))
      .map(_.collect().mkString("|"))
    assert(all(df.repartition(1)) == all(df.repartition(13)))
  }

  test("rocAuc: perfect, random, and tied scorers hit exact AUC") {
    // perfect separation: every positive outscores every negative
    val perfect = (Seq.tabulate(5)(i => (10.0 + i, 1)) ++
      Seq.tabulate(5)(i => (i.toDouble, 0))).toDF("s", "y")
    val p = Stats.rocAuc(perfect, "s", "y").collect().head
    assert(p.getAs[Long]("n_pos") == 5L && p.getAs[Long]("n_neg") == 5L)
    assert(p.getAs[Double]("auc") == 1.0 && p.getAs[Double]("gini") == 1.0)
    // all scores tied: every comparison is a half-win -> AUC 1/2
    val tied = (Seq.fill(4)((7.0, 1)) ++ Seq.fill(6)((7.0, 0)))
      .toDF("s", "y")
    val t = Stats.rocAuc(tied, "s", "y").collect().head
    assert(t.getAs[Double]("auc") == 0.5 && t.getAs[Double]("gini") == 0.0)
    // hand-checked mix: pos {3, 1}, neg {2, 0}:
    // pairs (3>2, 3>0, 1>0 win; 1<2 loss) -> AUC = 3/4
    val mix = Seq((3.0, 1), (1.0, 1), (2.0, 0), (0.0, 0)).toDF("s", "y")
    val m = Stats.rocAuc(mix, "s", "y").collect().head
    assert(m.getAs[Long]("auc2_num") == 6L)
    assert(m.getAs[Double]("auc") == 0.75)
  }

  test("rocAuc: degenerate single-class input -> null AUC") {
    val out = Stats.rocAuc(Seq((1.0, 1), (2.0, 1)).toDF("s", "y"),
      "s", "y").collect().head
    assert(out.getAs[Long]("n_neg") == 0L)
    assert(out.isNullAt(out.fieldIndex("auc")))
  }

  test("conformalInterval: hand-checked median, q_hat rank, coverage") {
    // one group; calibration values 1..9 (center = 5, residuals
    // 0,1,1,2,2,3,3,4,4 sorted), alpha=0.1 -> k = ceil(10*0.9) = 9
    // -> q_hat = 4; test values 0..10: |v-5| <= 4 covers 1..9 = 9/11.
    val cal = (1 to 9).map(v => ("g", v.toDouble, true))
    val test = (0 to 10).map(v => ("g", v.toDouble, false))
    val out = Stats.conformalInterval((cal ++ test).toDF("g", "v", "c"),
      "g", "v", "c").collect().head
    assert(out.getAs[Long]("n_cal") == 9L)
    assert(out.getAs[Long]("n_test") == 11L)
    assert(out.getAs[Double]("center") == 5.0)
    assert(out.getAs[Double]("q_hat") == 4.0)
    assert(out.getAs[Long]("n_covered") == 9L)
    assert(math.abs(out.getAs[Double]("coverage") - 9.0 / 11) < 1e-15)
  }

  test("madProfile: hand-checked median/MAD, wild value contained") {
    // clean 1..9: center 5, sorted residuals 0,1,1,2,2,3,3,4,4 ->
    // MAD (rank 5) = 2; nothing beyond 3*MAD = 6
    val clean = (1 to 9).map(v => ("a", v.toDouble))
    val c = Stats.madProfile(clean.toDF("g", "v"), "g", "v")
      .collect().head
    assert(c.getAs[Double]("center") == 5.0 && c.getAs[Double]("mad") == 2.0)
    assert(c.getAs[Long]("n_outliers") == 0L)
    // one wild 100: lower median still 5 (rank 5 of 10), MAD still 2,
    // exactly the wild row flagged — the breakdown-point claim
    val dirty = clean :+ ("a", 100.0)
    val d = Stats.madProfile(dirty.toDF("g", "v"), "g", "v")
      .collect().head
    assert(d.getAs[Double]("center") == 5.0 && d.getAs[Double]("mad") == 2.0)
    assert(d.getAs[Long]("n_outliers") == 1L)
    assert(math.abs(d.getAs[Double]("outlier_share") - 0.1) < 1e-15)
  }

  test("rocAuc/conformalInterval: partitioning-invariant") {
    val df = Seq.tabulate(300)(i =>
      ("g" + (i % 3), (i % 23).toDouble, i % 2 == 0))
      .toDF("g", "v", "c")
      .withColumn("y", (col("v") > 11.0).cast("int"))
    def all(d: org.apache.spark.sql.DataFrame): Seq[String] = Seq(
      Stats.rocAuc(d, "v", "y"),
      Stats.conformalInterval(d, "g", "v", "c")
        .orderBy("g").drop("c"))
      .map(_.collect().mkString("|"))
    assert(all(df.repartition(1)) == all(df.repartition(13)))
  }
}
