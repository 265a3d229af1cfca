package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) layout clustering — the multi-dimensional
  * generalization of the engine's sensor+date sink layout
  * ([[graft.sinks.FanOutSink]]): interleave the bits of two dimension
  * keys so that range predicates on EITHER dimension map to a bounded
  * number of contiguous z-ranges, and a file layout sorted by z-value
  * gives every file a tight bounding box in BOTH dimensions at once.
  * One-dimensional sorting gives perfect min/max pruning on one column
  * and none on the other; z-order splits the difference — the standard
  * lakehouse answer for two-predicate scan pruning at 100 TB, priced
  * here with an auditable locality metric instead of folklore.
  *
  * The z-value is pure non-negative integer bit algebra (`shift`,
  * `and`, `or` composed into one static expression tree — codegen'd,
  * no UDF), so it is bit-identical in any engine: the oracle recomputes
  * the same interleave term-for-term.
  *
  * Division of labor with [[graft.queries.Scale.zorderWrite]]: that
  * entry point handles CONTINUOUS (double) columns by first
  * quantile-binning them into small cells and then delegating to
  * [[zValue]] for the interleave; this object is the exact integer
  * kernel plus the oracle-gated audit surface.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * longs: x occupies even bit positions, y odd. 21 bits per dimension
    * keeps the result under 2⁶³ with room to spare. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The equivalent DuckDB SQL term, generated with the same loop so
    * the oracle can never drift from the engine formula. */
  def zValueSql(x: String, y: String, bits: Int = 21): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Cluster a frame for writing: range-partition by z-value (each
    * output partition owns one contiguous z-range → one tight 2D
    * bounding box per file) and sort rows inside each partition so
    * parquet row-group min/max stats are tight too. `numFiles` prices
    * the file-count/bounding-box-area trade. */
  def zOrderLayout(df: DataFrame, x: String, y: String,
      numFiles: Int, bits: Int = 21): DataFrame = {
    val withZ = df.withColumn("__z",
      zValue(col(x).cast(LongType), col(y).cast(LongType), bits))
    withZ.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** LOCALITY AUDIT of the z-curve over (x, y): bucket rows by the top
    * z-bits (`zShift` low bits dropped → contiguous z-ranges standing
    * in for files) and report each bucket's row count and 2D bounding
    * box. The boxes being tight in BOTH dimensions — versus a 1-D sort,
    * whose buckets span the full range of the other dimension — is the
    * entire value of the layout, and this output makes it measurable
    * (and, being all-integer, exact-oracle-gateable). */
  def zOrderAudit(df: DataFrame, x: Column, y: Column,
      zShift: Int = 34, bits: Int = 21): DataFrame =
    df.select(x.cast(LongType).as("x"), y.cast(LongType).as("y"))
      .withColumn("zb", shiftright(zValue(col("x"), col("y"), bits), zShift))
      .groupBy(col("zb"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
}
