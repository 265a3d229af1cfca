package graft

import org.apache.spark.sql.SparkSession

/** Engine-wide session defaults shared by every driver-facing main
  * (Bench / Probe / Verify / Stages / rehearsal mains).
  *
  * Round-13 optimization findings (OPTIMIZATION_r13.md, measured on the
  * 57-query alphabetical-prefix subset bench at sf0.1):
  *
  *  - `spark.sql.codegen.cache.maxEntries` (default 100): the registry
  *    holds 261 query shapes × ~10-25 whole-stage-codegen units each, so
  *    the 100-entry JVM-wide cache thrashes — EVERY query re-runs Janino
  *    compilation for its whole plan on EVERY execution, single-threaded
  *    on the driver while all executor threads sit parked (thread dumps:
  *    32/32 executors idle, main inside codegen). Raising the cache to
  *    cover the inventory cut the 57-query pass 132 s → 56 s. This is a
  *    driver-JVM property, not a local[32] artifact: any production
  *    driver serving a query inventory larger than ~100 codegen units
  *    pays the same recompilation tax per query. 8192 entries ≈ the full
  *    261-query inventory with margin; compiled-class footprint is
  *    metaspace-bounded (~tens of KB per unit).
  *
  *  - `spark.sql.adaptive.coalescePartitions.minPartitionSize` (default
  *    1 MB): AQE coalescing is byte-driven, but the engine's pair/bucket
  *    kernels have compute-dense, byte-sparse reduce stages (a 2.7 MB
  *    map output feeding a quadratic in-bucket pair explode) which the
  *    1 MB floor coalesces to 2-3 tasks on 32 cores — a straggler by
  *    construction. A 64 KB floor restores core-count parallelism for
  *    those stages and is inert at production scale, where reduce
  *    partitions sit far above either floor (advisory size governs).
  *    Measured: 57-query pass 56 s → 46 s on top of the codegen fix,
  *    no query slower by more than +0.06 s.
  *
  * Both are env-overridable so the production values can be pinned
  * per deployment without a rebuild.
  */
object EngineDefaults {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.codegen.cache.maxEntries",
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "65536"))
}
