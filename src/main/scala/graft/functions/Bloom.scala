package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, col, lit, xxhash64}

/** Codegen'd bloom screen built from Spark's OWN runtime-filter pieces.
  *
  * `InjectRuntimeFilter` plants `BloomFilterAggregate` (build side) and
  * `BloomFilterMightContain` (probe side, whole-stage-codegen'd) around
  * shuffle joins it can see through. [[graft.queries.Scale
  * .bloomScreenedJoin]] is the EXPLICIT form of that rewrite for plans
  * the optimizer can't cross (unions, windows, custom nodes); this
  * object exposes the same two expressions through the session function
  * registry so the explicit form pays the same codegen'd per-row cost as
  * the injected one — not a Scala-UDF boxing round-trip per row.
  *
  * Contract (same as the optimizer's): the bloom is built over
  * `xxhash64(key)` longs and probed with `xxhash64(key)`, so any type
  * xxhash64 accepts works as a key, and a serialized filter moves to the
  * probe side as one binary literal (same budget as any broadcast). */
object BloomFunctions {
  private val AggName = "graft_bloom_agg"
  private val ProbeName = "graft_bloom_might_contain"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AggName,
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ProbeName,
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }

  /** Serialized bloom over `xxhash64(key)` of `df`, sized for
    * `expectedItems` at `fpp` — one partial+final aggregation, the
    * driver holds only the filter bytes. */
  def buildBloom(df: DataFrame, key: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val spark = df.sparkSession
    register(spark)
    // optimal bits n·ln(1/fpp)/ln(2)², the standard sizing formula
    val numBits = math.max(64L,
      math.ceil(expectedItems * math.log(1.0 / fpp) /
        (math.log(2.0) * math.log(2.0))).toLong)
    // BloomFilterAggregate SILENTLY clamps both arguments to the
    // runtime-filter session caps (maxNumItems 4M / maxNumBits 64M bits
    // by default) — at the very scale this path exists for, a clamped
    // filter's fpp → 1 and the screen degrades to a no-op that still
    // pays bloom probes. Raise the caps to cover the request so the
    // stated fpp contract actually holds.
    Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits)
      .foreach { case (k, needed) =>
        val current = spark.conf.getOption(k).map(_.toLong).getOrElse(0L)
        if (current < needed) spark.conf.set(k, needed.toString)
      }
    df.select(call_function(AggName, xxhash64(col(key)),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership predicate: `might_contain(bloom, xxhash64(c))`.
    * False positives possible (callers re-verify exactly), false
    * negatives never. */
  def mightContain(spark: SparkSession, bloom: Array[Byte],
      c: Column): Column = {
    register(spark)
    call_function(ProbeName, lit(bloom), xxhash64(c))
  }
}
