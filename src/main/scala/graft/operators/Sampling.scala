package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling for training-data pipelines: train/eval splits
  * and per-class caps that are reproducible across engines, partitionings,
  * task retries, and reruns — no RNG, no seed state, no
  * `monotonically_increasing_id`. The sampling key is the row's
  * `md5_60(key)` hash treated as a uniform draw in [0, 2^60).
  *
  * At scale both operators are embarrassingly parallel: `uniform` is a
  * pure per-row filter inside the scan; `stratifiedCap` shuffles once on
  * the stratum key (skew-prone strata are capped by construction — the
  * window keeps only `perStratum` rows per key).
  */
object Sampling {

  private def hashKey(keyCol: Column): Column =
    Dedup.md5_60(keyCol.cast(StringType))

  /** Exact threshold for `rate` over the 2^60 hash space. */
  def rateThreshold(rate: Double): Long = (rate * (1L << 60).toDouble).toLong

  /** Keep rows whose hash draw falls below `rate` — a deterministic
    * Bernoulli(rate) sample keyed on `keyCol`. Disjoint splits compose:
    * `[0, r1)` for train and `[r1, r2)` for eval never overlap. */
  def uniform(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashKey(col(keyCol)) < lit(rateThreshold(rate)))

  /** At most `perStratum` rows per stratum, chosen in hash order (ties by
    * the key itself) — a deterministic per-class cap for rebalancing
    * skewed corpora. Adds `sample_rank` (1-based). */
  def stratifiedCap(df: DataFrame, stratumCol: String, keyCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashKey(col(keyCol)), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w).cast(LongType))
      .filter(col("sample_rank") <= perStratum)
  }
}
