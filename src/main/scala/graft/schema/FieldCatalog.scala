package graft.schema

import org.apache.spark.sql.types._

/** One sensor field in the canonical catalog.
  *
  * @param apiName    name as it appears on the wire (PurpleAir API JSON key),
  *                   e.g. `pm2.5`, `0.3_um_count_a`
  * @param colName    normalized storage column name (legal SQL identifier),
  *                   e.g. `pm2_5`, `um_count_a_0_3`
  * @param dataType   Spark logical type
  * @param group      which of the 9 vertical-partition tables owns the field
  * @param default    reference-compat null-default (`0.0` / `0` / `""`);
  *                   see reference `PurpleAirAPIConstants.py:20-51`
  */
final case class SensorField(
    apiName: String,
    colName: String,
    dataType: DataType,
    group: String,
    default: Any
)

/** The single source of truth for the canonical 115-field sensor-reading
  * schema, its normalized column names, typed null-defaults, and the 9-way
  * vertical partitioning.
  *
  * Derived from the reference's behavior:
  *  - field list + defaults: `PurpleAirAPIConstants.py:20-51`
  *  - rename map (`pm2.5`→`pm2_5`, `0.3_um_count`→`um_count_0_3`,
  *    `0.3_um_count_a`→`um_count_a_0_3`): `PurpleAirPSQLQueryStatements.py:72-176`
  *  - group membership (9 tables): `PurpleAirPSQLQueryStatements.py:11-192`
  *  - storage types (INT/FLOAT/TEXT/TIMESTAMPTZ): same DDL
  *
  * Everything else in the engine (projection schemas, CSV headers, conform
  * defaults, recombine keys) derives from this one table.
  */
object FieldCatalog {

  object Groups {
    val Station       = "station_information_and_status_fields"
    val Environmental = "environmental_fields"
    val Miscellaneous = "miscellaneous_fields"
    val Pm1_0         = "pm1_0_fields"
    val Pm2_5         = "pm2_5_fields"
    val Pm2_5Pseudo   = "pm2_5_pseudo_average_fields"
    val Pm10_0        = "pm10_0_fields"
    val ParticleCount = "particle_count_fields"
    val Thingspeak    = "thingspeak_fields"
    val all: Seq[String] = Seq(Station, Environmental, Miscellaneous, Pm1_0,
      Pm2_5, Pm2_5Pseudo, Pm10_0, ParticleCount, Thingspeak)
  }

  /** Composite event key repeated in every vertical partition
    * (reference PK `(data_time_stamp, sensor_index)`,
    * `PurpleAirPSQLQueryStatements.py:42` et al.). */
  val keyTimestamp = "data_time_stamp"
  val keySensor    = "sensor_index"
  val keyCols: Seq[String] = Seq(keyTimestamp, keySensor)

  private def f(api: String, dt: DataType, group: String): SensorField = {
    val default: Any = dt match {
      case DoubleType                  => 0.0d
      case IntegerType | LongType      => 0L
      case StringType                  => ""
      case TimestampType               => 0L // epoch seconds before conversion
      case other => throw new IllegalArgumentException(other.toString)
    }
    SensorField(api, normalize(api), dt, group, default)
  }

  /** `pm2.5_cf_1_a` → `pm2_5_cf_1_a`; `0.3_um_count_a` → `um_count_a_0_3`.
    * Matches the reference's storage identifiers exactly. */
  def normalize(apiName: String): String = {
    val um = "^(\\d+)\\.(\\d+)_um_count(_[ab])?$".r
    apiName match {
      case um(whole, frac, suffix) =>
        val ab = Option(suffix).getOrElse("")
        s"um_count${ab}_${whole}_${frac}"
      case other => other.replace(".", "_")
    }
  }

  import Groups._

  // Station information and status (27)
  private val station: Seq[SensorField] = Seq(
    f("name", StringType, Station), f("icon", IntegerType, Station),
    f("model", StringType, Station), f("hardware", StringType, Station),
    f("location_type", IntegerType, Station), f("private", IntegerType, Station),
    f("latitude", DoubleType, Station), f("longitude", DoubleType, Station),
    f("altitude", DoubleType, Station), f("position_rating", IntegerType, Station),
    f("led_brightness", IntegerType, Station),
    f("firmware_version", StringType, Station),
    f("firmware_upgrade", StringType, Station), f("rssi", IntegerType, Station),
    f("uptime", LongType, Station), f("pa_latency", IntegerType, Station),
    f("memory", LongType, Station),
    // ts-as-data: stored TIMESTAMPTZ in the reference's PSQL sink
    f("last_seen", TimestampType, Station),
    f("last_modified", TimestampType, Station),
    f("date_created", TimestampType, Station),
    f("channel_state", IntegerType, Station),
    f("channel_flags", IntegerType, Station),
    f("channel_flags_manual", IntegerType, Station),
    f("channel_flags_auto", IntegerType, Station),
    f("confidence", IntegerType, Station),
    f("confidence_manual", IntegerType, Station),
    f("confidence_auto", IntegerType, Station)
  )

  // Environmental (9)
  private val environmental: Seq[SensorField] =
    Seq("humidity", "humidity_a", "humidity_b", "temperature", "temperature_a",
      "temperature_b").map(f(_, IntegerType, Environmental)) ++
      Seq("pressure", "pressure_a", "pressure_b")
        .map(f(_, DoubleType, Environmental))

  // Miscellaneous (5)
  private val miscellaneous: Seq[SensorField] =
    Seq("voc", "voc_a", "voc_b", "ozone1", "analog_input")
      .map(f(_, DoubleType, Miscellaneous))

  private def abVariants(bases: Seq[String]): Seq[String] =
    bases.flatMap(b => Seq(b, s"${b}_a", s"${b}_b"))

  // PM1.0 (9)
  private val pm1: Seq[SensorField] =
    abVariants(Seq("pm1.0", "pm1.0_atm", "pm1.0_cf_1")).map(f(_, DoubleType, Pm1_0))

  // PM2.5 (12)
  private val pm25: Seq[SensorField] =
    abVariants(Seq("pm2.5_alt", "pm2.5", "pm2.5_atm", "pm2.5_cf_1"))
      .map(f(_, DoubleType, Pm2_5))

  // PM2.5 pseudo (simple running) averages (18)
  val pseudoAverageHorizons: Seq[(String, Long)] = Seq(
    "10minute" -> 600L, "30minute" -> 1800L, "60minute" -> 3600L,
    "6hour" -> 21600L, "24hour" -> 86400L, "1week" -> 604800L)
  private val pm25Pseudo: Seq[SensorField] =
    abVariants(pseudoAverageHorizons.map { case (h, _) => s"pm2.5_$h" })
      .map(f(_, DoubleType, Pm2_5Pseudo))

  // PM10.0 (9)
  private val pm10: Seq[SensorField] =
    abVariants(Seq("pm10.0", "pm10.0_atm", "pm10.0_cf_1"))
      .map(f(_, DoubleType, Pm10_0))

  // Particle counts (18)
  private val particleCount: Seq[SensorField] =
    Seq("0.3", "0.5", "1.0", "2.5", "5.0", "10.0")
      .flatMap(sz => Seq(s"${sz}_um_count", s"${sz}_um_count_a", s"${sz}_um_count_b"))
      .map(f(_, DoubleType, ParticleCount))

  // ThingSpeak (8)
  private val thingspeak: Seq[SensorField] = Seq(
    f("primary_id_a", IntegerType, Thingspeak),
    f("primary_key_a", StringType, Thingspeak),
    f("secondary_id_a", IntegerType, Thingspeak),
    f("secondary_key_a", StringType, Thingspeak),
    f("primary_id_b", IntegerType, Thingspeak),
    f("primary_key_b", StringType, Thingspeak),
    f("secondary_id_b", IntegerType, Thingspeak),
    f("secondary_key_b", StringType, Thingspeak)
  )

  /** The 115 canonical fields, in reference declaration order. */
  val fields: Seq[SensorField] =
    station ++ environmental ++ miscellaneous ++ pm1 ++ pm25 ++ pm25Pseudo ++
      pm10 ++ particleCount ++ thingspeak

  require(fields.size == 115, s"expected 115 catalog fields, got ${fields.size}")

  val byApiName: Map[String, SensorField] = fields.map(f => f.apiName -> f).toMap
  val byColName: Map[String, SensorField] = fields.map(f => f.colName -> f).toMap

  /** apiName -> normalized colName for every field whose name changes. */
  val renameMap: Map[String, String] =
    fields.filter(f => f.apiName != f.colName).map(f => f.apiName -> f.colName).toMap

  /** Key pair as Spark fields: event-time timestamp + sensor id. */
  val keyStructFields: Seq[StructField] = Seq(
    StructField(keyTimestamp, TimestampType, nullable = false),
    StructField(keySensor, IntegerType, nullable = false))

  /** Full conformed schema: key pair + 115 normalized fields (117 columns). */
  val conformedSchema: StructType =
    StructType(keyStructFields ++ fields.map(fl =>
      StructField(fl.colName, fl.dataType, nullable = true)))

  /** Schema of one vertical partition: key pair + that group's columns in
    * catalog order (matches the reference's DDL column order). */
  def groupSchema(group: String): StructType =
    StructType(keyStructFields ++ fields.filter(_.group == group)
      .map(fl => StructField(fl.colName, fl.dataType, nullable = true)))

  /** Normalized column names of one group, without the key pair. */
  def groupCols(group: String): Seq[String] =
    fields.filter(_.group == group).map(_.colName)

  /** Reference-compat null-defaults keyed by normalized column name.
    * Timestamp-typed fields carry epoch-second defaults (converted during
    * conform), so they are excluded here. */
  val defaultsByCol: Map[String, Any] = fields.collect {
    case fl if fl.dataType != TimestampType => fl.colName -> fl.default
  }.toMap
}
