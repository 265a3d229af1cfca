package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic Poisson bootstrap — uncertainty quantification for a
  * corpus-level metric without resampling rows: the classic online
  * bootstrap (each row enters replica b with a Poisson(1) multiplicity)
  * driven by the engine's md5_60 hash instead of an RNG, so every
  * replica is a pure function of the data — reproducible across runs,
  * partitionings, engines, and retries, and auditable by an exact
  * oracle.
  *
  * The Poisson(1) draw is an inverse-CDF lookup: the row/replica hash
  * `h = md5_60(id ':' b) ∈ [0, 2⁶⁰)` is compared against PRECOMPUTED
  * integer thresholds `⌊F(k)·2⁶⁰⌋` (cumulative Poisson(1) mass, baked
  * from one Scala constant into both the engine expression and the
  * generated oracle SQL — the same no-drift trick as
  * [[Layout.zValueSql]]). Multiplicity = number of thresholds ≤ h,
  * capped at 8 (the P(X>7) ≈ 1.0e-5 tail mass joins the cap).
  *
  * Scale shape: ONE pass over the data computes all `replicas` sums —
  * the explode multiplies rows by B before the map-side combine
  * collapses each partition to B partial sums, so the shuffle is
  * O(B · partitions), not O(B · N). Weighted sums accumulate in
  * DECIMAL(28,6) (order-independent, exact — the engine's standard
  * double-sum discipline); each replica surfaces ONE final double
  * mean. The confidence band is rank-selected from the B replica means
  * (value selection, no interpolation — bit-exact cross-engine).
  */
object Bootstrap {

  /** Cumulative Poisson(1) thresholds scaled to 2⁶⁰: a row enters a
    * replica k times where k = |{t ∈ thresholds : t ≤ h}|. */
  private[graft] val Thresholds: Seq[Long] = {
    val scale = math.pow(2.0, 60)
    // F(k) = e^{-1} Σ_{j≤k} 1/j!  for k = 0..7
    val masses = (0 to 7).scanLeft(0.0) { case (acc, k) =>
      acc + math.exp(-1.0) / (1 to k).product
    }.tail
    masses.map(f => (f * scale).toLong)
  }

  /** Poisson(1) multiplicity of (id, replica) as a Column — the count
    * of baked thresholds at or below the draw. */
  private[graft] def multiplicity(id: Column, b: Column): Column = {
    val h = Dedup.md5_60(concat(id.cast(StringType), lit(":"),
      b.cast(StringType)))
    Thresholds.map(t => when(h >= lit(t), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** The same multiplicity as DuckDB SQL text, generated from the same
    * threshold constants. `id`/`b` are SQL expressions. */
  private[graft] def multiplicitySql(id: String, b: String): String = {
    val h = s"(('0x' || substring(md5(CAST($id AS VARCHAR) || ':' || " +
      s"CAST($b AS VARCHAR)), 1, 15))::BIGINT)"
    Thresholds.map(t => s"(CASE WHEN $h >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
  }

  /** Bootstrap confidence band for `avg(valueCol)`: one row with the
    * full-sample mean, the rank-selected lower/upper replica means
    * (`loRank`-th and `hiRank`-th smallest of `replicas` means), and
    * the replica count. Defaults give a ~90% percentile interval from
    * 32 replicas. `idCol` must be unique per row (it seeds the draws). */
  def meanCi(df: DataFrame, idCol: String, valueCol: String,
      replicas: Int = 32, loRank: Int = 2, hiRank: Int = 31): DataFrame = {
    require(loRank >= 1 && hiRank <= replicas && loRank < hiRank)
    val base = df.select(col(idCol).as("id"),
      col(valueCol).cast(DoubleType).as("v"))
    val reps = base
      .select(col("id"), col("v"),
        explode(array((0 until replicas).map(lit): _*)).as("b"))
      .withColumn("w", multiplicity(col("id"), col("b")))
      .groupBy(col("b"))
      .agg(
        sum((col("v") * col("w").cast(DoubleType))
          .cast(DecimalType(28, 6))).as("ws"),
        sum(col("w")).as("wn"))
      // empty replicas are impossible in practice (P ≈ e^{-N}), but an
      // exact engine must not divide by zero on adversarial inputs
      .select(col("b"),
        when(col("wn") > 0,
          col("ws").cast(DoubleType) / col("wn").cast(DoubleType))
          .as("m"))
    import org.apache.spark.sql.expressions.Window
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy(col("m"), col("b"))))
    val band = ranked.agg(
      max(when(col("rn") === loRank, col("m"))).as("ci_lo"),
      max(when(col("rn") === hiRank, col("m"))).as("ci_hi"),
      count(lit(1)).as("n_replicas"))
    val full = base.agg(
      (sum(col("v").cast(DecimalType(28, 6))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("mean"))
    full.crossJoin(band)
      .select(col("mean"), col("ci_lo"), col("ci_hi"), col("n_replicas"))
  }
}
