package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB deployment shape: key-salted joins for
  * pathological skew and bucketed (co-clustered) layouts for shuffle-free
  * recurring joins. These are the knobs SURVEY §7.8 calls for beyond what
  * AQE does automatically.
  */
object Scale {

  /** Inner equi-join with key salting for a skewed probe side.
    *
    * AQE's skew-join split handles sort-merge skew at runtime; salting is
    * the static alternative when one hot key dominates a *broadcast-less*
    * join or a `groupBy`. The large side gets a deterministic salt in
    * `[0, saltFactor)` derived from its whole row (identical rows share a
    * salt — harmless for join correctness); the small side is exploded
    * `saltFactor`× so every (key, salt) bucket finds its match. Result
    * equals the unsalted join, but the hot key's rows spread over
    * `saltFactor` reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val largeSalted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(saltFactor)))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    largeSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted high-cardinality-safe aggregation: two-phase groupBy for a
    * skewed group key — partial agg on (key, salt), final on key. For
    * algebraic aggregates only; here count + sum (decimal-exact). */
  def saltedCountSum(df: DataFrame, key: String, measure: String,
      saltFactor: Int): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(measure).cast(DecimalType(28, 6))).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast(DoubleType).as("sum_value"))
  }

  /** Bloom-screened inner equi-join: build a bloom filter over the small
    * side's join keys and drop large-side rows that cannot match BEFORE
    * the join's exchange — the explicit form of the runtime filter
    * Spark's optimizer injects for plain shuffle joins
    * (`spark.sql.optimizer.runtime.bloomFilter.*`). Reach for this when
    * the large side flows through operators the injected filter cannot
    * cross (unions, windows, custom plans) or when the join itself is
    * not where the cost is (the screen cuts a downstream wide shuffle).
    *
    * Semantics: identical to the plain join — bloom false positives are
    * removed by the exact join; there are NO false negatives. Cost: one
    * aggregation over the small side to build the filter (driver holds
    * `~1.44·n·log2(1/fpp)` BITS — ~1.2 MB per million keys at 1% — same
    * budget as any broadcast), one codegen'd membership test per large
    * row: the screen uses Spark's OWN `BloomFilterAggregate` /
    * `BloomFilterMightContain` runtime-filter expressions (via
    * [[graft.functions.BloomFunctions]]), so the probe inlines into
    * whole-stage codegen instead of boxing through a Scala UDF. Any key
    * type `xxhash64` accepts works. */
  def bloomScreenedJoin(large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = graft.functions.BloomFunctions
      .buildBloom(small, key, expectedItems, fpp)
    val screened = large.filter(graft.functions.BloomFunctions
      .mightContain(large.sparkSession, bloom, col(key)))
    screened.join(small, Seq(key))
  }

  /** Z-order (Morton) clustering for TWO-dimensional file skipping.
    * Single-column clustering (what [[graft.sinks.FanOutSink]] does for
    * `(sensor, time)`) leaves the second dimension spanning its full
    * range in EVERY file, so min/max footer pruning only helps one
    * predicate; interleaving the bits of both dimensions' rank cells
    * gives every file a bounded span in BOTH, and point/box queries
    * prune files on either predicate.
    *
    * Scale shape: cell boundaries come from `approxQuantile` (one
    * sketch pass, driver holds `2^bits − 1` cuts per column — bytes),
    * the cell id is a broadcast-literal comparison ladder, the
    * interleave is integer bit arithmetic — all codegen, no window, no
    * global sort; `repartitionByRange` on the z-value does the one
    * range shuffle any clustered write needs (sampled boundaries), and
    * files are written z-sorted within partitions. */
  def zorderWrite(df: DataFrame, path: String, colX: String, colY: String,
      bits: Int = 4, nFiles: Int = 8): Unit = {
    require(bits >= 1 && bits <= 15, "bits must be in [1, 15]")
    val cells = (1 << bits) - 1
    val probs = (1 to cells).map(_.toDouble / (cells + 1)).toArray
    val Seq(bx, by) = Seq(colX, colY).map(c =>
      df.stat.approxQuantile(c, probs, 0.001))
    def cell(c: Column, bounds: Array[Double]): Column =
      bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(c.cast(org.apache.spark.sql.types.DoubleType) > b, 1)
          .otherwise(0)
      }
    // interleave via the shared Morton kernel (Layout.zValue puts its
    // first argument on even positions; this layout's convention is
    // colX on odd, so the cells swap argument slots)
    def interleave(cx: Column, cy: Column): Column =
      graft.operators.Layout.zValue(
        cy.cast(org.apache.spark.sql.types.LongType),
        cx.cast(org.apache.spark.sql.types.LongType), bits)
    df.withColumn("__z", interleave(cell(col(colX), bx), cell(col(colY), by)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Write a table bucketed+sorted on the join key: two tables written
    * with the same bucketing join without any exchange (the 100 TB
    * recurring-join layout; the managed-table analogue of the reference's
    * `segmentby` clustering). */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int, sortCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(sortCol)
      .format("parquet")
      .saveAsTable(tableName)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the check that a bucketed/co-partitioned join actually avoided the
    * shuffle. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
