package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Continuously-calibrated quality gating: the streaming form of
  * [[graft.operators.Curation.calibrateScores]]. Each micro-batch's
  * scores land in a FIXED equi-width bucket scale (`lo`/`hi`/`buckets`
  * are frozen operator parameters — the frozen-yardstick discipline of
  * the streaming LM gate and the frozen ANN quantizers: batch edges
  * never drift with the data, so replays are deterministic and every
  * batch is judged on the same scale), and a document survives when its
  * bucket's ECDF standing over EVERYTHING SEEN SO FAR clears the
  * keep-top-`keepFraction` percentile — "keep the best 30 % of the
  * stream as of now", the online form of percentile-addressed
  * thresholds.
  *
  * '''State & replay.''' The only cross-batch state is per-batch bucket
  * COUNTS (≤ `buckets` rows each), landed in `dir/counts/batch=<id>`
  * with per-batch Overwrite — idempotent under at-least-once replay.
  * The gate for batch k reads counts of batches `≤ k` ONLY, so a
  * replayed batch recomputes against the exact prefix it originally
  * saw and rewrites `dir/out/batch=<id>` bit-identically; later
  * batches never rewrite earlier decisions (an admitted doc stays
  * admitted — the first-arrival-wins property every streaming gate
  * here shares). Early batches gate against small totals by design:
  * that IS online calibration, and the audit columns (`cum_lt`,
  * `n_total`) record the evidence each decision used.
  *
  * '''Scale shape.''' Per batch: one codegen'd bucket projection, one
  * map-side-combined count per bucket, a ≤ `buckets`-row ECDF window,
  * and a broadcast join back — the batch is scanned once; state is
  * O(buckets · batches) tiny parquet, never document-sized. */
object StreamingCalibration {

  private def bucketCol(score: org.apache.spark.sql.Column, lo: Double,
      hi: Double, buckets: Int): org.apache.spark.sql.Column =
    if (hi == lo) lit(0)
    else least(lit(buckets - 1), greatest(lit(0),
      floor((score - lit(lo)) * lit(buckets.toDouble) / lit(hi - lo))
        .cast(IntegerType)))

  /** One micro-batch of the calibrated gate — exposed so specs and
    * manual repair drive the exact path the stream runs. */
  def calibrateBatch(batch: DataFrame, batchId: Long, dir: String,
      scoreCol: String, lo: Double, hi: Double, buckets: Int,
      keepFraction: Double): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0, 1], got $keepFraction")
    require(hi > lo, s"frozen scale needs hi > lo, got [$lo, $hi]")
    val spark = batch.sparkSession
    val bucketed = batch.withColumn("bucket",
      bucketCol(col(scoreCol).cast("double"), lo, hi, buckets))
    // this batch's bucket counts — Overwrite makes the replay idempotent
    bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/counts/batch=$batchId")
    // ECDF over the PREFIX (batches <= this one): deterministic replay
    val seen = spark.read.option("basePath", s"$dir/counts")
      .parquet(s"$dir/counts")
      .filter(col("batch") <= batchId)
      .groupBy(col("bucket").as("cal_bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("cal_bucket"))
    val ecdf = seen
      .withColumn("cum_lt", coalesce(
        sum(col("cnt")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_total", sum(col("cnt")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(col("cal_bucket"), col("cum_lt").cast(LongType),
        col("n_total").cast(LongType))
    bucketed.join(broadcast(ecdf), col("bucket") === col("cal_bucket"))
      .drop("cal_bucket")
      // keep the top keepFraction: standing >= ceil((1-q) * total),
      // written total - floor(q * total) so the floor is the only
      // rounding and both engines agree bit-for-bit
      .filter(col("cum_lt") >=
        col("n_total") - floor(lit(keepFraction) * col("n_total"))
          .cast(LongType))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/out/batch=$batchId")
  }

  /** The continuous query: `foreachBatch` at the reference's polling
    * cadence, each batch through [[calibrateBatch]]. */
  def stream(df: DataFrame, scoreCol: String, dir: String,
      checkpointDir: String, lo: Double, hi: Double, buckets: Int,
      keepFraction: Double,
      trigger: Trigger = Trigger.ProcessingTime("65 seconds"))
      : StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        calibrateBatch(batch, batchId, dir, scoreCol, lo, hi, buckets,
          keepFraction)
      }
      .start()
}
