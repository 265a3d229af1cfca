package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's one stateful streaming computation (SURVEY §2.4 A2 +
  * §2.7 T5): the TimescaleDB continuous aggregate
  * `sensor_index_and_name_1hour_aggregate` — an incrementally-maintained
  * hourly rollup with a refresh lag and a retention horizon
  * (`PurpleAirPSQLQueryStatements.py:564-589`) — re-expressed as a
  * Structured Streaming windowed aggregation:
  *
  *  - incremental refresh  → watermarked tumbling-window agg (state is
  *    per (window, keys), bounded by the watermark; late rows inside the
  *    delay still merge, later ones are dropped — the analogue of the
  *    (3h, 1h] refresh window)
  *  - retention (8 h)      → [[retentionTrim]], a maintenance filter the
  *    sink job applies (partition drop at scale)
  *
  * At 100 TB/day the state per key-hour is one row of counters; the only
  * shuffle is the aggregation's own, keyed (window, sensor) — skew-free
  * because the window component rotates every hour.
  */
object ContinuousAggregate {

  /** Hourly streaming rollup. Works on any event-time DataFrame (batch or
    * streaming); on a stream, `outputMode("append")` emits each hour once
    * its watermark passes. */
  def hourly(
      readings: DataFrame, ts: String, keys: Seq[String],
      measure: String, watermarkDelay: String = "2 hours"): DataFrame =
    readings
      .withWatermark(ts, watermarkDelay)
      .groupBy(window(col(ts), "1 hour") +: keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(measure).cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"),
        max(col(measure)).as("max_value"))
      .select(col("window.start").as("bucket_ts") +: keys.map(col) :+
        col("n") :+ col("sum_value") :+ col("max_value"): _*)

  /** T5 retention policy: drop buckets older than `retainHours` relative
    * to `asOf`. On a partitioned sink this is a partition drop, not a scan
    * — see [[retentionDrop]]. */
  def retentionTrim(agg: DataFrame, asOf: java.sql.Timestamp,
      retainHours: Int = 8): DataFrame =
    agg.filter(col("bucket_ts") >=
      lit(new java.sql.Timestamp(asOf.getTime - retainHours * 3600L * 1000L)))

  /** T5 at scale: physically drop `date=` partition directories of a
    * date-partitioned aggregate sink whose ENTIRE day lies past the
    * retention horizon — pure directory deletes, no scan (the reference's
    * `add_retention_policy` is likewise a chunk drop). Conservative: a
    * partition is only dropped when every bucket it can contain is
    * expired, i.e. its date is strictly before the cutoff's date; the
    * cutoff-day remainder stays until the next day boundary (readers
    * apply [[retentionTrim]] for exact semantics). Returns partitions
    * dropped. */
  def retentionDrop(spark: org.apache.spark.sql.SparkSession, aggDir: String,
      asOf: java.sql.Timestamp, retainHours: Int = 8): Int = {
    val dir = new org.apache.hadoop.fs.Path(aggDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return 0
    val cutoffDate = java.time.Instant
      .ofEpochMilli(asOf.getTime - retainHours * 3600L * 1000L)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val dropped = fs.listStatus(dir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .filter { s =>
        val d = java.time.LocalDate.parse(s.getPath.getName.stripPrefix("date="))
        d.isBefore(cutoffDate)
      }
    dropped.foreach(s => fs.delete(s.getPath, true))
    dropped.length
  }

  /** T3 streaming dedup on the composite PK within the watermark horizon —
    * the engine's replacement for "duplicate insert throws". */
  def dedupWithinWatermark(
      readings: DataFrame, ts: String, sensor: String,
      watermarkDelay: String = "2 hours"): DataFrame =
    readings.withWatermark(ts, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq(ts, sensor))

  /** Streaming sessionization: gap-based session windows per key — the
    * streaming analogue of `TimeSeries.sessionize`. Built on Spark's
    * native `session_window` (state merges adjacent windows per key and
    * closes a session once the watermark passes its gap), so no custom
    * `flatMapGroupsWithState` state machine is needed — built-ins first.
    * Emits one row per closed session in append mode. */
  def sessions(
      readings: DataFrame, ts: String, keys: Seq[String], measure: String,
      gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    readings
      .withWatermark(ts, watermarkDelay)
      .groupBy(session_window(col(ts), gap) +: keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(measure).cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .select(col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +:
        keys.map(col) :+ col("n_events") :+ col("sum_value"): _*)
}
