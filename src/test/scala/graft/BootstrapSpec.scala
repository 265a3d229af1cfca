package graft

import org.apache.spark.sql.functions._
import graft.operators.Bootstrap

/** Deterministic Poisson bootstrap: draw distribution matches
  * Poisson(1), SQL generation matches the engine expression, the band
  * brackets the mean sanely, and everything is partition-invariant. */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def ev() =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("multiplicity draws are Poisson(1)-shaped: mean ≈ 1, " +
    "P(0) ≈ e^-1, bounded at 8") {
    val draws = spark.range(0, 20000)
      .select(Bootstrap.multiplicity(col("id"), lit(0)).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = draws.values.sum.toDouble
    val mean = draws.map { case (w, c) => w * c }.sum / n
    assert(math.abs(mean - 1.0) < 0.03, s"mean weight $mean")
    val p0 = draws.getOrElse(0L, 0L) / n
    assert(math.abs(p0 - math.exp(-1.0)) < 0.02, s"P(0) = $p0")
    assert(draws.keys.max <= 8L)
    // different replica index ⇒ different (independent-ish) draws
    val w0 = spark.range(0, 100)
      .select(Bootstrap.multiplicity(col("id"), lit(0)).as("w"))
      .as[Long].collect().toSeq
    val w1 = spark.range(0, 100)
      .select(Bootstrap.multiplicity(col("id"), lit(1)).as("w"))
      .as[Long].collect().toSeq
    assert(w0 != w1)
  }

  test("multiplicitySql is generated from the SAME baked thresholds " +
    "as the engine expression") {
    // the cross-engine value check is the oracle hash gate; here we pin
    // that both forms come from one constant table and one hash recipe
    val sql = Bootstrap.multiplicitySql("e.event_id", "br.b")
    val thresholds = "(?<!\\d)\\d{15,19}(?!\\d)".r
      .findAllIn(sql).map(_.toLong).toSeq
    val baked = Bootstrap.Thresholds
    assert(thresholds == baked, s"SQL thresholds $thresholds != $baked")
    assert(baked.size == 8 && baked == baked.sorted && baked.head > 0)
    // F(7)·2^60 covers all but P(X>7) ≈ 1.02e-5 of the mass
    assert(baked.last > (1L << 60) - (1L << 45), baked.last.toString)
    assert(sql.contains("md5(CAST(e.event_id AS VARCHAR) || ':' || " +
      "CAST(br.b AS VARCHAR))"), sql.take(200))
  }

  test("meanCi: band brackets the mean, deterministic, " +
    "partition-invariant") {
    val a = Bootstrap.meanCi(ev(), "event_id", "value").collect()(0)
    assert(a.getAs[Long]("n_replicas") == 32L)
    val (lo, hi, m) = (a.getAs[Double]("ci_lo"), a.getAs[Double]("ci_hi"),
      a.getAs[Double]("mean"))
    assert(lo < hi, s"band [$lo, $hi]")
    assert(lo <= m && m <= hi, s"mean $m outside [$lo, $hi]")
    // band width ~ 2·z·σ/√n — sane, not degenerate, not huge
    assert((hi - lo) / m < 0.5, s"band implausibly wide: [$lo, $hi] vs $m")
    val b = Bootstrap.meanCi(ev().repartition(17), "event_id", "value")
      .collect()(0)
    assert(a == b, s"partitioning changed the bootstrap: $a vs $b")
  }

  test("upliftCi: a planted +5 lift is detected with 0 outside the band") {
    // arm a: values cycle 0..6; arm b: the same cycle shifted +5 —
    // true uplift exactly 5.0
    val df = (0 until 2000).map { i =>
      if (i % 2 == 0) (i.toLong, (i % 7).toDouble, "ctl")
      else (i.toLong, (i % 7).toDouble + 5.0, "trt")
    }.toDF("id", "v", "g")
    val r = Bootstrap.upliftCi(df, "id", "v", "g", "ctl", "trt")
      .collect()(0)
    val (u, lo, hi) = (r.getAs[Double]("uplift"), r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_hi"))
    assert(math.abs(u - 5.0) < 0.2, s"uplift $u")
    assert(lo <= u && u <= hi, s"$u outside [$lo, $hi]")
    assert(lo > 0.0, s"band [$lo, $hi] must exclude 0 for a real lift")
    assert(r.getAs[Long]("n_replicas") == 32L)
    // deterministic under repartitioning
    val r2 = Bootstrap.upliftCi(df.repartition(13), "id", "v", "g",
      "ctl", "trt").collect()(0)
    assert(r == r2)
  }

  test("upliftCi: no lift ⇒ band straddles 0") {
    val df = (0 until 2000).map { i =>
      (i.toLong, (i % 11).toDouble, if (i % 2 == 0) "ctl" else "trt")
    }.toDF("id", "v", "g")
    val r = Bootstrap.upliftCi(df, "id", "v", "g", "ctl", "trt")
      .collect()(0)
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < 0.0 && hi > 0.0, s"null effect must straddle 0: [$lo, $hi]")
  }
}
