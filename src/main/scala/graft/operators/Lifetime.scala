package graft.operators

import org.apache.spark.sql.DataFrame

/** Storage-lifetime control for eagerly-materialized (`localCheckpoint`)
  * intermediate results.
  *
  * Why this exists: several operators in this library materialize small
  * intermediates eagerly — candidate pair sets, per-round edge sets,
  * quantized side tables — so a cached upstream can be released before
  * returning, or so an iterative plan's lineage stays flat. A local
  * checkpoint's blocks, however, are only reclaimed when the GC finalizes
  * the backing RDD and the async `ContextCleaner` notices; in a
  * long-lived session (the 100 TB target is exactly that: one driver
  * running thousands of queries) superseded checkpoints accumulate in the
  * block manager faster than GC returns them. These helpers release the
  * blocks deterministically the moment an intermediate is provably dead.
  *
  * Ownership contract used across the operators:
  *  - checkpoints that only ever feed OTHER stages inside the same
  *    operator call are freed by that operator (via [[seal]]) once the
  *    final result is materialized;
  *  - a checkpointed RESULT belongs to the caller — release it with
  *    [[free]] when done, or rely on session-level hygiene
  *    (`sparkContext.getPersistentRDDs` sweep, as `graft.Bench` does
  *    between queries).
  */
object Lifetime {

  /** The RDDs physically backing `df` — its plan's `LogicalRDD` leaves.
    * For a `localCheckpoint`ed frame this is exactly the checkpoint's
    * block-backed RDD. */
  private def backingRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Release the checkpoint blocks behind `df`. Safe ONLY once nothing
    * will execute `df`'s plan again: a local checkpoint truncates
    * lineage, so an unpersisted one cannot be recomputed. Non-blocking —
    * the block manager reclaims asynchronously, but the RDD leaves the
    * persistent-RDD registry immediately. */
  def free(dfs: DataFrame*): Unit =
    dfs.foreach(df => backingRdds(df).foreach(_.unpersist(blocking = false)))

  /** Eagerly materialize `result` as its own local checkpoint, then
    * release every checkpoint in `intermediates` — they are dead once the
    * result holds its own blocks. Returns the sealed result (whose
    * checkpoint the CALLER owns, per the contract above). */
  def seal(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    free(intermediates: _*)
    out
  }
}
