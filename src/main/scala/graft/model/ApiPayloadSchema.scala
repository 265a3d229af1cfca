package graft.model

import org.apache.spark.sql.types._

import graft.schema.FieldCatalog

/** Nested wire schemas for the three API payload shapes (FIXTURES.md §1-2,
  * reference §1.3): the single-sensor envelope with nested `stats` structs,
  * and the columnar multi-sensor envelope. Derived from [[FieldCatalog]] so
  * the wire view and the storage view cannot drift. */
object ApiPayloadSchema {

  /** `stats` / `stats_a` / `stats_b` struct: the pm2.5 pseudo-average
    * family + its own time_stamp. */
  val statsStruct: StructType = StructType(
    StructField("pm2.5", DoubleType) +:
      FieldCatalog.pseudoAverageHorizons.map { case (h, _) =>
        StructField(s"pm2.5_$h", DoubleType)
      } :+ StructField("time_stamp", LongType))

  /** The `sensor` struct: every catalog field under its wire (api) name,
    * with epoch fields as LONG (conversion happens in `conform`), plus the
    * nested stats structs. */
  val sensorStruct: StructType = {
    val plain = FieldCatalog.fields
      // pseudo-averages arrive nested in stats, not as direct fields
      .filter(_.group != FieldCatalog.Groups.Pm2_5Pseudo)
      .map { f =>
        val wireType = f.dataType match {
          case TimestampType => LongType // epoch seconds on the wire
          case dt => dt
        }
        StructField(f.apiName, wireType)
      }
    StructType(
      (StructField("sensor_index", LongType) +: plain) ++
        Seq(StructField("stats", statsStruct),
          StructField("stats_a", statsStruct),
          StructField("stats_b", statsStruct)))
  }

  /** Single-sensor GET /v1/sensors/{index} envelope. */
  val singleSensor: StructType = StructType(Seq(
    StructField("api_version", StringType),
    StructField("time_stamp", LongType),
    StructField("data_time_stamp", LongType),
    StructField("sensor", sensorStruct)))

  /** Columnar multi-sensor GET /v1/sensors envelope: parallel `fields` ×
    * `data` arrays (values stringly — conform re-casts, like the
    * reference's CAST-on-INSERT). */
  val multiSensor: StructType = StructType(Seq(
    StructField("api_version", StringType),
    StructField("time_stamp", LongType),
    StructField("data_time_stamp", LongType),
    StructField("max_age", LongType),
    StructField("firmware_default_version", StringType),
    StructField("fields", ArrayType(StringType)),
    StructField("data", ArrayType(ArrayType(StringType)))))

  /** Columnar historic GET /v1/sensors/{index}/history envelope
    * (`PurpleAirAPI.py:244-305`): same `fields` × `data` shape as the
    * multi-sensor payload, but rows are one SENSOR's readings over time —
    * `time_stamp` is a history FIELD inside `data`, and the sensor id
    * rides the envelope. */
  val historic: StructType = StructType(Seq(
    StructField("api_version", StringType),
    StructField("sensor_index", LongType),
    StructField("start_timestamp", LongType),
    StructField("end_timestamp", LongType),
    StructField("average", LongType),
    StructField("fields", ArrayType(StringType)),
    StructField("data", ArrayType(ArrayType(StringType)))))
}
