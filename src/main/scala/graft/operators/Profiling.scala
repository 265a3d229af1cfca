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
  * oracle-gated. Both downstream branches (median, totals) reuse the
  * same exchange (identical subplans → ReuseExchange), so the corpus is
  * scanned once.
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
    // bucket whose cumulative range contains that position holds it
    val k: Column = expr("(n_total + 1) div 2")
    val med = byVal
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n_total", sum(col("cnt")).over(wAll))
      .filter(col("cum") >= k && (col("cum") - col("cnt")) < k)
      .select(g :+ col(sizeCol).as("median_size"): _*)
    val agg = byVal.groupBy(g: _*).agg(
      sum(col("cnt")).as("n_docs"),
      sum(col(sizeCol) * col("cnt")).as("total_size"),
      min(col(sizeCol)).as("min_size"),
      max(col(sizeCol)).as("max_size"))
    agg
      .withColumn("share", col("n_docs").cast(DoubleType) /
        sum(col("n_docs")).over(Window.partitionBy()))
      .join(med, groupCols)
  }
}
