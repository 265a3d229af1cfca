package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.FieldCatalog
import graft.schema.FieldCatalog.{Groups, keyCols, keySensor, keyTimestamp}

/** Pure `DataFrame => DataFrame` transforms forming the engine's correctness
  * core: flatten the nested API payload, zip the columnar multi-sensor
  * payload, conform to the canonical 117-column schema, split into the 9
  * vertical partitions, and recombine them.
  *
  * Semantics mirror the reference (see Scaladoc per method); execution is
  * pure Catalyst — every step is a projection, so the whole chain stays in
  * one whole-stage-codegen span with no shuffle.
  */
object Transforms {

  private val statsHorizons =
    FieldCatalog.pseudoAverageHorizons.map { case (h, _) => s"pm2.5_$h" }

  /** Flatten a single-sensor API payload one level deep, exactly as the
    * reference does (`PurpleAirDataLogger.py:118-148`):
    *
    *  - `sensor.stats.pm2.5_10minute` → `pm2.5_10minute` (plus the
    *    never-stored extras `stats_pm2.5`, `pm2.5_time_stamp`)
    *  - `sensor.stats_a.X` → `X_a`, `sensor.stats_b.X` → `X_b`
    *    (`stats_a.time_stamp` → `time_stamp_a`)
    *  - every other `sensor.*` field is promoted as-is
    *  - the envelope contributes only `data_time_stamp`
    *
    * Missing structs/fields (single-channel hardware has no `stats_b`) yield
    * nulls, which [[conform]] later fills with the catalog defaults.
    *
    * Input: DataFrame with envelope columns (`api_version`, `time_stamp`,
    * `data_time_stamp`, `sensor` struct) — e.g. `spark.read.json(sample)`.
    */
  def flattenSingle(payload: DataFrame): DataFrame = {
    val sensorType = payload.schema("sensor").dataType.asInstanceOf[StructType]
    val sensorFields = sensorType.fieldNames.toSeq

    def statsCols(statsField: String, suffix: String): Seq[(String, Column)] =
      if (!sensorFields.contains(statsField)) Seq.empty
      else {
        val st = sensorType(statsField).dataType.asInstanceOf[StructType]
        def pick(inner: String, out: String): Seq[(String, Column)] =
          if (st.fieldNames.contains(inner))
            Seq(out -> col(s"sensor.`$statsField`.`$inner`").as(out))
          else Seq.empty
        val horizons = statsHorizons.flatMap(h => pick(h, s"$h$suffix"))
        if (suffix.isEmpty)
          pick("pm2.5", "stats_pm2.5") ++ horizons ++
            pick("time_stamp", "pm2.5_time_stamp")
        else
          pick("pm2.5", s"pm2.5$suffix") ++ horizons ++
            pick("time_stamp", s"time_stamp$suffix")
      }

    val fromStats =
      statsCols("stats", "") ++ statsCols("stats_a", "_a") ++
        statsCols("stats_b", "_b")
    // The reference's dict assignment means stats-derived keys OVERWRITE
    // same-named plain sensor fields (`stats_a.pm2.5` → `pm2.5_a` shadows
    // the direct `pm2.5_a`); mirror that by dropping the plain duplicates.
    val statsNames = fromStats.map(_._1).toSet
    val plainCols = sensorFields
      .filterNot(Set("stats", "stats_a", "stats_b"))
      .filterNot(statsNames)
      .map(n => col(s"sensor.`$n`").as(n))

    payload.select(
      (col("data_time_stamp") +: plainCols) ++ fromStats.map(_._2): _*)
  }

  /** Zip the columnar multi-sensor payload (`fields: [names]` ∥
    * `data: [[values]]`) into one row per sensor, mirroring
    * `PurpleAirDataLogger.py:193-205`.
    *
    * Input: one row per API response with `data_time_stamp LONG`,
    * `fields ARRAY<STRING>`, `data ARRAY<ARRAY<STRING>>` (values arrive
    * stringly-typed; [[conform]] casts — the reference likewise re-CASTs
    * every bound value, `PurpleAirPSQLQueryStatements.py:229-260`).
    *
    * Implementation: explode the row-major `data` array, then positionally
    * zip names↔values into a map and promote the requested fields. Stays
    * fully distributed — one generator + projections, no shuffle.
    */
  def zipMulti(payload: DataFrame, requestedFields: Seq[String]): DataFrame = {
    val exploded = payload.select(
      col("data_time_stamp"),
      col("fields"),
      explode(col("data")).as("row_values"))
    val asMap = exploded.withColumn(
      "kv", map_from_arrays(col("fields"), col("row_values")))
    asMap.select(
      col("data_time_stamp") +:
        requestedFields.map(fn => col("kv").getItem(fn).as(fn)): _*)
  }

  /** Conform a flat (apiName-keyed) DataFrame to the canonical 117-column
    * schema [[FieldCatalog.conformedSchema]]:
    *
    *  1. normalize column names (`pm2.5`→`pm2_5`, `0.3_um_count`→`um_count_0_3`)
    *  2. cast every field to its catalog type (string input tolerated)
    *  3. convert epoch seconds → UTC timestamps for the key and the
    *     ts-as-data fields (`last_seen`, `last_modified`, `date_created`),
    *     None-safe like `PurpleAirPSQLDataLogger.py:138-151`
    *  4. complete missing/null fields:
    *     - `compatNulls = true`: reference-exact typed defaults
    *       (`0.0`/`0`/`""` — `PurpleAirDataLogger.py:81-99`)
    *     - `compatNulls = false` (default): keep real SQL NULLs
    *  5. drop any column not in the catalog (fixed-with-projection schema:
    *     unknown API fields are silently dropped, as the reference's sinks
    *     bind only known columns)
    *
    * Columns entirely absent from the input become null (then defaults in
    * compat mode) — this is what makes the three hardware variants share
    * one schema.
    */
  def conform(flat: DataFrame, compatNulls: Boolean = false): DataFrame = {
    val present = flat.columns.toSet

    def tsFromEpoch(c: Column): Column =
      timestamp_seconds(c.cast(LongType))

    val keyColumns = Seq(
      tsFromEpoch(col(keyTimestamp)).as(keyTimestamp),
      col(keySensor).cast(IntegerType).as(keySensor))

    val fieldColumns = FieldCatalog.fields.map { fl =>
      val base: Column =
        if (present.contains(fl.apiName)) col(s"`${fl.apiName}`")
        else if (present.contains(fl.colName)) col(s"`${fl.colName}`")
        else lit(null)
      val typed: Column = fl.dataType match {
        case TimestampType => tsFromEpoch(base)
        case dt            => base.cast(dt)
      }
      val completed: Column =
        if (!compatNulls) typed
        else fl.dataType match {
          case TimestampType => typed // ts-as-data stays null when absent
          case dt            => coalesce(typed, lit(fl.default).cast(dt))
        }
      completed.as(fl.colName)
    }

    flat.select(keyColumns ++ fieldColumns: _*)
  }

  /** Split one conformed DataFrame into the 9 vertical partitions, key pair
    * repeated in each (reference: 9 INSERTs per reading,
    * `PurpleAirPSQLDataLogger.py:165-344`). Pure projections — callers fan
    * these out inside a single `foreachBatch` so the source is scanned once.
    */
  def verticalSplit(conformed: DataFrame): Map[String, DataFrame] =
    Groups.all.map { g =>
      g -> conformed.select(
        (keyCols ++ FieldCatalog.groupCols(g)).map(col): _*)
    }.toMap

  /** Recombine vertical partitions into the full wide reading: multi-way
    * equi-join on the composite key (SURVEY §2.5 J1).
    *
    * All 9 partitions of one reading share the identical key, so when the
    * inputs come from our own sink layout (co-partitioned by
    * `sensor_index`, sorted by `data_time_stamp`) Catalyst plans sort-merge
    * joins that reuse the one exchange; with AQE enabled small time-slices
    * collapse to broadcast joins at runtime.
    */
  def recombine(parts: Map[String, DataFrame]): DataFrame = {
    require(parts.nonEmpty, "recombine needs at least one partition")
    // Join in canonical group order for a deterministic column layout.
    val ordered = Groups.all.filter(parts.contains).map(parts)
    ordered.reduce((l, r) => l.join(r, keyCols, "inner"))
  }

  /** Dedup on the composite PK, keeping the first row per key in
    * `orderCol` order — the engine's replacement for the reference's
    * "PK violation throws" semantics (SURVEY §2.7 T3). Deterministic,
    * unlike bare `dropDuplicates`.
    */
  def dedupByKey(df: DataFrame, orderCol: String): DataFrame =
    dedupByKey(df, col(orderCol))

  def dedupByKey(df: DataFrame, order: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Stable dedup order for [[dedupByKey]]: the source cursor when the rows
    * carry one (true arrival order), then a hash of the non-key payload as
    * the final tiebreak. Unlike `monotonically_increasing_id()` this does
    * not depend on partition layout or task re-execution, so which
    * duplicate survives is the same on every (re)run. */
  def stableDedupOrder(df: DataFrame): Column = {
    val payloadHash = xxhash64(
      df.columns.filterNot(keyCols.contains).sorted.map(col): _*)
    if (df.columns.contains("poll_cursor"))
      struct(col("poll_cursor"), payloadHash)
    else payloadHash
  }
}
