package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Stats

/** Streaming conformal-coverage monitor: the streaming twin of
  * [[graft.operators.Stats.conformalInterval]]. The interval table is
  * calibrated ONCE from a batch calibration frame
  * ([[Stats.conformalCalibrate]] — the frozen-yardstick discipline of
  * [[StreamingCalibration]] and the frozen ANN quantizers: the
  * distribution-free guarantee is stated AGAINST a fixed calibration
  * set, so the yardstick must not drift with the stream), and every
  * micro-batch audits its own rows' empirical coverage against it
  * ([[Stats.conformalAudit]]). A batch whose per-group coverage falls
  * materially below `1 − α` is the distribution-shift alarm — the
  * exchangeability assumption broke, recalibrate.
  *
  * '''State & replay.''' There is NO cross-batch state: each batch's
  * audit depends only on the frozen intervals and its own rows, so a
  * replayed batch rewrites `dir/coverage/batch=<id>` bit-identically
  * (per-batch Overwrite, the [[StreamingCalibration]] landing
  * discipline).
  *
  * '''Scale shape.''' Per batch: one broadcast join against the
  * group-cardinality interval table and one map-combined rollup — the
  * batch is scanned once, output is |groups| rows. */
object StreamingConformal {

  /** One micro-batch of the coverage audit — exposed so specs and
    * manual repair drive the exact path the stream runs. */
  def auditBatch(batch: DataFrame, batchId: Long, dir: String,
      groupCol: String, valueCol: String,
      intervals: DataFrame): Unit =
    Stats.conformalAudit(batch, groupCol, valueCol, intervals)
      .withColumnRenamed("g", groupCol)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/coverage/batch=$batchId")

  /** The continuous query: `foreachBatch` at the reference's polling
    * cadence, each batch audited against the FROZEN intervals. */
  def stream(df: DataFrame, groupCol: String, valueCol: String,
      intervals: DataFrame, dir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("65 seconds"))
      : StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        auditBatch(batch, batchId, dir, groupCol, valueCol, intervals)
      }
      .start()
}
