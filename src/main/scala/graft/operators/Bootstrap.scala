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

  /** The uniform draw for (id, replica): md5_60 of "id:b". */
  private[graft] def draw(id: Column, b: Column): Column =
    Dedup.md5_60(concat(id.cast(StringType), lit(":"),
      b.cast(StringType)))

  /** Poisson(1) multiplicity of an already-materialized draw — the
    * count of baked thresholds at or below it. Call sites materialize
    * [[draw]] as its own column first so the md5 runs ONCE per row
    * regardless of how the surrounding stage fuses (the 8 threshold
    * compares would otherwise each carry a copy of the hash tree and
    * be at the mercy of codegen subexpression elimination). */
  private[graft] def multiplicityOf(h: Column): Column =
    Thresholds.map(t => when(h >= lit(t), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Poisson(1) multiplicity of (id, replica) as one Column — the
    * spec-facing composition of [[draw]] and [[multiplicityOf]]. */
  private[graft] def multiplicity(id: Column, b: Column): Column =
    multiplicityOf(draw(id, b))

  /** The same multiplicity as DuckDB SQL text, generated from the same
    * threshold constants. `id`/`b` are SQL expressions. */
  private[graft] def multiplicitySql(id: String, b: String): String = {
    val h = s"(('0x' || substring(md5(CAST($id AS VARCHAR) || ':' || " +
      s"CAST($b AS VARCHAR)), 1, 15))::BIGINT)"
    Thresholds.map(t => s"(CASE WHEN $h >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
  }

  /** Tiny-input parallelism guard: a small table often arrives as ONE
    * scan partition, which would serialize the md5-heavy explode on a
    * single core. Spreading the (pre-explode, so N-row, not B·N-row)
    * base across the cluster costs one round-robin exchange of the
    * small input; on real many-partition inputs this is a no-op. The
    * result is unaffected: the decimal sums are order- and
    * partitioning-independent by construction. */
  private def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
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
    val reps = spread(base)
      .select(col("id"), col("v"),
        explode(array((0 until replicas).map(lit): _*)).as("b"))
      .withColumn("h", draw(col("id"), col("b")))
      .withColumn("w", multiplicityOf(col("h")))
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

  /** Bootstrap band for an A/B UPLIFT — `avg(value | b) − avg(value |
    * a)` with a percentile interval over `replicas` paired resamples:
    * the experiment readout a mean alone can't give ("is the lift
    * real?") priced by the same deterministic machinery as [[meanCi]].
    * Both groups' weighted sums ride ONE grouped pass (conditional
    * aggregates per replica), each replica's uplift is a single double
    * subtraction of two exactly-derived means, and the band is
    * rank-selected. A replica missing either group yields NULL and
    * drops from the ranking (impossible in practice, exact by
    * construction). */
  def upliftCi(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, groupA: String, groupB: String,
      replicas: Int = 32, loRank: Int = 2, hiRank: Int = 31): DataFrame = {
    require(loRank >= 1 && hiRank <= replicas && loRank < hiRank)
    val base = df
      .filter(col(groupCol).isin(groupA, groupB))
      .select(col(idCol).as("id"), col(valueCol).cast(DoubleType).as("v"),
        (col(groupCol) === groupB).as("is_b"))
    // hot path: UNCONDITIONAL sums grouped by (replica, arm), folded
    // to one row per replica by the free 2-rows-per-b aggregate below —
    // the hash-agg hot loop stays CASE-free. Values are identical
    // (sums over disjoint arms), so the conditional-form oracle
    // reproduces them exactly.
    val perArm = spread(base)
      .select(col("id"), col("v"), col("is_b"),
        explode(array((0 until replicas).map(lit): _*)).as("b"))
      .withColumn("h", draw(col("id"), col("b")))
      .withColumn("w", multiplicityOf(col("h")))
      .groupBy(col("b"), col("is_b"))
      .agg(sum((col("v") * col("w").cast(DoubleType))
        .cast(DecimalType(28, 6))).as("ws"),
        sum(col("w")).as("wn"))
    val reps = perArm
      .groupBy(col("b"))
      .agg(
        max(when(!col("is_b"), col("ws"))).as("was"),
        max(when(!col("is_b"), col("wn"))).as("wna"),
        max(when(col("is_b"), col("ws"))).as("wsb"),
        max(when(col("is_b"), col("wn"))).as("wnb"))
      .select(col("b"),
        when(col("wna") > 0 && col("wnb") > 0,
          col("wsb").cast(DoubleType) / col("wnb").cast(DoubleType) -
            col("was").cast(DoubleType) / col("wna").cast(DoubleType))
          .as("d"))
    import org.apache.spark.sql.expressions.Window
    val ranked = reps.filter(col("d").isNotNull).withColumn("rn",
      row_number().over(Window.orderBy(col("d"), col("b"))))
    val band = ranked.agg(
      max(when(col("rn") === loRank, col("d"))).as("ci_lo"),
      max(when(col("rn") === hiRank, col("d"))).as("ci_hi"),
      count(lit(1)).as("n_replicas"))
    val full = base.agg(
      (sum(when(col("is_b"), col("v").cast(DecimalType(28, 6)))
        .otherwise(lit(0).cast(DecimalType(28, 6)))).cast(DoubleType) /
        sum(when(col("is_b"), 1L).otherwise(0L)).cast(DoubleType) -
        sum(when(!col("is_b"), col("v").cast(DecimalType(28, 6)))
          .otherwise(lit(0).cast(DecimalType(28, 6)))).cast(DoubleType) /
        sum(when(!col("is_b"), 1L).otherwise(0L)).cast(DoubleType))
        .as("uplift"))
    full.crossJoin(band)
      .select(col("uplift"), col("ci_lo"), col("ci_hi"), col("n_replicas"))
  }
}
