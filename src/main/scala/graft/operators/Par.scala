package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Pinned-width hash partitioning for COMPUTE-DENSE, BYTE-SPARSE stages.
  *
  * AQE's partition coalescing is byte-driven: with
  * `coalescePartitions.parallelismFirst` (default true) the target
  * partition size is `max(totalBytes / defaultParallelism,
  * minPartitionSize)`, so a stage whose map output is a few MB but whose
  * per-row work is quadratic (in-bucket pair explosion, O(n²·d) vector
  * kernels, per-iteration graph joins over a cached edge list) collapses
  * to 2-3 tasks and becomes a straggler by construction (guide §2.5/§2.6).
  *
  * Round 13 fixed this with a GLOBAL 64 KB `minPartitionSize` floor —
  * which widened EVERY byte-sparse exchange engine-wide, including the
  * memory-heavy dedup hash aggregates, and is the prime suspect in the
  * round-13 32-core bench DNF (32 concurrent hash-agg/collect_list tasks
  * under one fixed 8 GB heap). Round 14 removes the global knob and pins
  * the width STRUCTURALLY at exactly the stages where compute density is
  * known — a `repartition(N, key)` (shuffle origin REPARTITION_BY_NUM)
  * is exempt from AQE coalescing, while every other exchange keeps the
  * byte-driven default that bounds concurrent memory.
  *
  * The width is the session's `spark.sql.shuffle.partitions` — the same
  * value the exchange would have started from before coalescing — so it
  * scales with deployment config (the bench sets it to the core count;
  * a production session sets its production value), never a constant
  * tuned for either local mode or the cluster.
  */
object Par {
  def width(df: DataFrame): Int = {
    val s = df.sparkSession
    scala.util.Try(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(s.sparkContext.defaultParallelism)
  }

  /** `df.repartition(width(df), cols…)` — hash partitioning that AQE
    * will not coalesce below the session's configured width. */
  def byKey(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(width(df), cols: _*)
}
