package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable-sketch lifecycle — the 100 TB answer to distinct counting.
  *
  * An exact `countDistinct` re-shuffles every raw key for every grain it
  * is asked at; a MERGEABLE sketch is aggregated once at the finest
  * grain and every coarser rollup unions the pre-aggregated sketches —
  * the raw keys never travel again. That algebra (register-wise max for
  * HLL) is associative and commutative, so daily sketches can live next
  * to the daily partition files and ANY later question — weekly uniques,
  * monthly uniques, overlap between two periods — is a union over a few
  * hundred kilobytes instead of a scan over terabytes. Spark's built-in
  * DataSketches HLL functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_union` / `hll_sketch_estimate`) are deterministic: the same key
  * set yields the same registers under any partitioning or order, so
  * estimates are reproducible (though NOT DuckDB-expressible — these
  * queries carry a rows-only gate; the accuracy and merge-identity
  * contracts are spec-locked instead).
  */
object Sketches {

  /** One timestamp-normalization rule for the whole engine — see
    * [[graft.queries.TimeSeries.epochSeconds]] for the NTZ rationale. */
  private def epochS(c: Column): Column =
    graft.queries.TimeSeries.epochSeconds(c)

  /** Daily HLL sketches unioned to a weekly distinct-user rollup.
    * Returns one row per week: the union estimate, the sum of the daily
    * estimates (the double-counting a naive sum commits — the gap IS
    * the cross-day repeat audience), and the day count. The plan
    * aggregates raw keys ONCE (day grain); the weekly union shuffles
    * |days| sketch blobs. `lgK` = 12 (4 KiB registers, ~1.6 % rse). */
  def distinctRollup(df: DataFrame, ts: String, key: String,
      lgK: Int = 12): DataFrame = {
    val day = (epochS(col(ts)) - pmod(epochS(col(ts)), lit(86400L)))
      .as("day_s")
    val daily = df
      .groupBy(day)
      .agg(hll_sketch_agg(col(key), lit(lgK)).as("sk"))
    daily
      .groupBy((col("day_s") - pmod(col("day_s"), lit(604800L)))
        .as("week_s"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
          .as("est_users"),
        sum(hll_sketch_estimate(col("sk"))).as("sum_daily_est"),
        count(lit(1)).as("n_days"))
  }

  /** Audience overlap between the first and second half of the time
    * range via sketch ALGEBRA: |A∩B| ≈ est(A) + est(B) − est(A∪B),
    * with all three sketches built in ONE pass (conditional aggregates
    * — a null key never updates a sketch) and the union a scalar
    * `hll_union` of the two blobs. One row out; the raw keys shuffle
    * once, to a single tiny group. The same shape prices
    * new-vs-returning questions at any scale without a self-join. */
  def overlapEstimate(df: DataFrame, ts: String, key: String,
      lgK: Int = 12): DataFrame = {
    val bounds = df.agg(
      min(epochS(col(ts))).as("lo_s"), max(epochS(col(ts))).as("hi_s"))
    df.crossJoin(broadcast(bounds))
      .withColumn("late",
        epochS(col(ts)) >= expr("(lo_s + hi_s) div 2"))
      .agg(
        hll_sketch_agg(when(!col("late"), col(key)), lit(lgK)).as("sk_a"),
        hll_sketch_agg(when(col("late"), col(key)), lit(lgK)).as("sk_b"))
      .select(
        hll_sketch_estimate(col("sk_a")).as("est_first"),
        hll_sketch_estimate(col("sk_b")).as("est_second"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .as("est_union"))
      .withColumn("est_overlap",
        col("est_first") + col("est_second") - col("est_union"))
      .withColumn("est_new",
        col("est_union") - col("est_first"))
  }
}
