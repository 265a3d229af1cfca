package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus composition profiling — the "what is in this dataset" pass a
  * training-data pipeline runs before and after curation: per group
  * (e.g. language × source), document counts, size totals/extremes, the
  * EXACT discrete median size, and each group's share of the corpus.
  *
  * Scale design: everything derives from ONE pre-aggregation to
  * `(group, size) → count` — the map-side combine collapses the corpus
  * to at most |groups|·|distinct sizes| rows, so the heavy shuffle
  * carries compact partials, never documents. The exact median comes
  * from a cumulative-count window over that compact table (the smallest
  * size whose cumulative count reaches ⌈n/2⌉) instead of sorting rows —
  * a skewed group costs a window over its distinct sizes, not its rows.
  * No approximate percentile: the result is engine-reproducible and
  * oracle-gated. Totals/extremes are windows over the SAME partition
  * key as the median's cumulative window, so the whole profile is one
  * scan, one aggregation exchange, and one window exchange — no second
  * branch, no join, no reliance on runtime exchange reuse.
  */
object Profiling {

  /** Per-group profile: `(groupCols…, n_docs, total_size, min_size,
    * max_size, median_size, share)`. `sizeCol` must be integral (the
    * exact-median rank arithmetic is integer). */
  def corpusProfile(
      df: DataFrame, groupCols: Seq[String], sizeCol: String): DataFrame = {
    val g = groupCols.map(col)
    val byVal = df.groupBy(g :+ col(sizeCol): _*)
      .agg(count(lit(1)).as("cnt"))
    val wOrd = Window.partitionBy(g: _*).orderBy(col(sizeCol))
    val wAll = Window.partitionBy(g: _*)
    // lower discrete median: position (n+1) div 2 in size order; the
    // bucket whose cumulative range contains that position holds it —
    // exactly one row per group survives the filter
    val k: Column = expr("(n_docs + 1) div 2")
    byVal
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n_docs", sum(col("cnt")).over(wAll))
      .withColumn("total_size", sum(col(sizeCol) * col("cnt")).over(wAll))
      .withColumn("min_size", min(col(sizeCol)).over(wAll))
      .withColumn("max_size", max(col(sizeCol)).over(wAll))
      .filter(col("cum") >= k && (col("cum") - col("cnt")) < k)
      .withColumn("share", col("n_docs").cast(DoubleType) /
        sum(col("n_docs")).over(Window.partitionBy()))
      .select(g ++ Seq(col("n_docs"), col("total_size"), col("min_size"),
        col("max_size"), col(sizeCol).as("median_size"), col("share")): _*)
  }

  /** Robust per-group outlier scoring — median/MAD instead of mean/σ,
    * the detector that still works when the outliers THEMSELVES corrupt
    * the yardstick (a few 10⁶-token pages shift a mean enough to hide
    * themselves; they cannot move a median). Every row comes back with
    * its group's `med` and `mad`, the `robust_z` score
    * `(x − med) / mad` (NULL when `mad = 0` — a degenerate group has no
    * scale to score against), and `is_outlier = |x − med| > k·mad`
    * (`mad = 0`: any deviation flags, the natural limit). Medians are
    * Spark's exact `percentile`, bit-equal to DuckDB `quantile_cont`
    * (the [[graft.queries.TimeSeries.percentileSummary]] parity), and
    * the score arithmetic is fixed-op-order IEEE — fully oracle-gated.
    *
    * Scale shape: two tiny per-group aggregates (med, then MAD over
    * deviations) broadcast back over per-row math; exact `percentile`
    * gathers each group's values to its reducer, so for extreme group
    * cardinalities swap in `approx_percentile` (the
    * [[graft.queries.TimeSeries.percentileSketch]] bounded-state arm) —
    * the operator shape is identical. */
  def robustOutliers(df: DataFrame, keyCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0 && k.isFinite, s"k must be finite and > 0, got $k")
    val v = col(valueCol).cast(DoubleType)
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.join(broadcast(med), Seq(keyCol))
      .withColumn("dev", abs(v - col("med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq(keyCol))
      .withColumn("robust_z",
        when(col("mad") > 0, (v - col("med")) / col("mad")))
      .withColumn("is_outlier", col("dev") > lit(k) * col("mad"))
      .drop("dev")
  }

  /** Benford expected first-digit mass, FROZEN at parts-per-billion —
    * `round(log10(1 + 1/d)·10⁹)` baked as literals (the registry's
    * frozen-log-table rule: no runtime transcendentals, so engine and
    * oracle cannot drift by a libm ulp). */
  val BenfordPpb: Seq[(Int, Long)] = Seq(
    1 -> 301029996L, 2 -> 176091259L, 3 -> 124938737L,
    4 -> 96910013L, 5 -> 79181246L, 6 -> 66946790L,
    7 -> 57991947L, 8 -> 51152522L, 9 -> 45757491L)

  /** BENFORD FIRST-DIGIT AUDIT — the fraud/synthetic-data smell test:
    * naturally occurring multiplicative quantities (prices, counts,
    * populations) put ~30.1% of first significant digits at 1; flat or
    * fabricated data does not. Reports, per digit 1–9, the observed
    * count, observed and expected shares (floor parts-per-billion),
    * and the signed deviation.
    *
    * Exactness: the first significant digit comes from
    * `floor(value·10⁶)` (one double multiply, identical cross-engine)
    * formatted as a BIGINT string — integer formatting is exact in
    * every engine, unlike float formatting — and never from `log10`.
    * Values below 10⁻⁶ or null drop out (reported via `n_values`).
    * Expected mass is the frozen [[BenfordPpb]] table. All-integer
    * output.
    *
    * Scale shape: one map-combined 9-row groupBy, broadcast-joined to
    * the 9-row spine — scan-bound, zero wide shuffles. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val digits = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0.0)
      .withColumn("m", floor(col(valueCol) * lit(1.0e6)).cast(LongType))
      .filter(col("m") > 0L)
      .withColumn("digit",
        substring(col("m").cast(StringType), 1, 1).cast(IntegerType))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
    val spine = BenfordPpb.toDF("digit", "expected_ppb")
    val tot = digits.agg(sum(col("n_d")).as("n_values"))
    broadcast(spine)
      .join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
      .withColumn("share_ppb",
        when(col("n_values") > 0L,
          expr("(n_d * 1000000000L) div n_values")).otherwise(lit(0L)))
      .select(col("digit").cast(LongType).as("digit"),
        col("n_values"), col("n_d"), col("share_ppb"),
        col("expected_ppb"),
        (col("share_ppb") - col("expected_ppb")).as("delta_ppb"))
      .orderBy(col("digit"))
  }
}
