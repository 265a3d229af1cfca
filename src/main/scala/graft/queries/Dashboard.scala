package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.FieldCatalog
import graft.sinks.FanOutSink

/** The reference's read path as a public query library (SURVEY §3.3): the
  * 10 Grafana panels + 2 templating variables, expressed over the engine's
  * 9-table partitioned layout. Each method is a named DataFrame transform —
  * the whole dashboard is `panel(...)` per field group plus the directory
  * variables.
  *
  * Queries compose the engine's layout guarantees: the time-range filter
  * prunes date partitions before the scan, the sensor filter rides the
  * sensor-clustered file layout, and the per-panel aggregation is one
  * partial+final hash agg.
  */
object Dashboard {

  /** Variable 1 — `name_and_sensor_index`: DISTINCT directory with the
    * `CONCAT(name, ', ', sensor_index)` combo, ordered (A3 + X2 + O2). */
  def sensorDirectory(station: DataFrame): DataFrame =
    station.select(col(FieldCatalog.keySensor), col("name"))
      .distinct()
      .withColumn("combo",
        concat(col("name"), lit(", "), col(FieldCatalog.keySensor)))
      .orderBy(col(FieldCatalog.keySensor))

  /** Variable 2 — un-concat: `string_to_array(combo, ', ')[2]` (X3,
    * 1-based in both PostgreSQL and Spark). Bug-compatible with the
    * reference: a sensor *name* containing ", " (e.g. "Kangerlussuaq,
    * Greenland - …") makes element 2 a name fragment, not the index —
    * the dashboard JSON has the same flaw. Prefer joining on
    * `sensor_index` from [[sensorDirectory]] directly in new code. */
  def sensorIndexFromCombo(combo: Column): Column =
    element_at(split(combo, ", "), 2).cast(IntegerType)

  /** Time-range filter. A predicate on `data_time_stamp` alone does NOT
    * prune `date=` partition directories (Spark cannot infer the
    * date-column bound from a timestamp bound), so when the input carries
    * the sink layout's `date` partition column we add the equivalent
    * date-range predicate explicitly — that is what turns a dashboard
    * panel from a full-history scan into a scan of the covered days. */
  private def timeRange(df: DataFrame, startIso: String, endIso: String): DataFrame = {
    val start = lit(startIso).cast(TimestampType)
    val end = lit(endIso).cast(TimestampType)
    val ts = df.filter(col(FieldCatalog.keyTimestamp) >= start &&
                       col(FieldCatalog.keyTimestamp) < end)
    if (df.columns.contains("date"))
      ts.filter(col("date") >= to_date(start) && col("date") <= to_date(end))
    else ts
  }

  /** A dashboard panel (A1 + F7 + F8 + O1): time-bucketed `max()` over
    * every measure column of one field-group table, for one sensor and
    * time range, ordered by bucket. `interval` e.g. "1 hour".
    *
    * Mirrors `SELECT $__timeGroupAlias(data_time_stamp, $__interval),
    * max(col) "col" … WHERE $__timeFilter AND sensor_index = $sensor_index
    * GROUP BY 1 ORDER BY 1` (dashboard JSON :198-3427). */
  def panel(table: DataFrame, group: String, interval: String,
      sensorIndex: Int, startIso: String, endIso: String): DataFrame = {
    val measures = FieldCatalog.groupCols(group)
      .filter(c => FieldCatalog.byColName(c).dataType match {
        case DoubleType | IntegerType | LongType => true
        case _ => false
      })
    val aggs = measures.map(m => max(col(m)).as(m))
    timeRange(table, startIso, endIso)
      .filter(col(FieldCatalog.keySensor) === sensorIndex)
      .groupBy(window(col(FieldCatalog.keyTimestamp), interval)("start").as("time"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("time"))
  }

  /** Raw projection panels (P6): the station text panel and thingspeak
    * panel project columns time-ordered, no aggregation. */
  def rawPanel(table: DataFrame, columns: Seq[String], sensorIndex: Int,
      startIso: String, endIso: String): DataFrame =
    timeRange(table, startIso, endIso)
      .filter(col(FieldCatalog.keySensor) === sensorIndex)
      .select((col(FieldCatalog.keyTimestamp).as("time") +:
        columns.map(col)): _*)
      .orderBy(col("time"))

  /** Whole-dashboard convenience: every aggregating panel for one sensor
    * over one range, keyed by group name, straight off the sink layout. */
  def allPanels(spark: SparkSession, baseDir: String, interval: String,
      sensorIndex: Int, startIso: String, endIso: String): Map[String, DataFrame] =
    FieldCatalog.Groups.all.map { g =>
      g -> panel(FanOutSink.readTable(spark, baseDir, g), g, interval,
        sensorIndex, startIso, endIso)
    }.toMap

  /** SQL surface: register the 9 partition tables as temp views under
    * their reference names, so the reference's users can run their
    * dashboard SQL via `spark.sql` (with `$__timeGroup(ts, i)` →
    * `window(ts, i).start` and `time_bucket` → `date_trunc` as the only
    * dialect changes). GraftExtensions' functions are registered too. */
  def registerViews(spark: SparkSession, baseDir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    FieldCatalog.Groups.all.foreach { g =>
      FanOutSink.readTable(spark, baseDir, g).createOrReplaceTempView(g)
    }
  }
}
