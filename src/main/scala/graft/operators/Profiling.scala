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
}
