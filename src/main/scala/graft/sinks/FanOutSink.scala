package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.schema.FieldCatalog
import graft.transform.Transforms

/** The 9-way fan-out sink (SURVEY §2.9 K1-K3 + §2.7 T3/T6/T7): one
  * conformed reading stream → nine vertical-partition tables, written
  * inside a single `foreachBatch` so the source micro-batch is scanned
  * once, deduped once on the composite PK, and fanned out as pure
  * projections.
  *
  * Storage layout = the TimescaleDB policies re-expressed for files:
  *  - hypertable time-partitioning (T7) → `partitionBy(date)` so time-range
  *    queries prune partitions at the scan
  *  - compression segment/order (T6: `segmentby sensor_index, orderby
  *    data_time_stamp`) → `repartition(sensor_index)` +
  *    `sortWithinPartitions(data_time_stamp)` + columnar parquet+zstd —
  *    co-locating a sensor's history gives the same locality the
  *    reference's compressed chunks give
  *  - PK dedup (T3) → deterministic first-write-wins before the fan-out
  *    (ordered by the source cursor / payload hash, not by partition
  *    layout — see [[Transforms.stableDedupOrder]])
  *
  * '''Replay idempotency.''' `foreachBatch` is at-least-once: a crashed
  * micro-batch is re-executed with the SAME `batchId`. The streaming path
  * therefore lands every micro-batch in its own `batch=<id>` directory
  * written with `SaveMode.Overwrite` — a replay rewrites that directory
  * instead of appending a second copy, so the sink converges to
  * exactly-once output without a transactional table format. The batch
  * dirs are ordinary partition directories (readers see a `batch` column,
  * dropped by [[readTable]]); the compaction side of the reference's
  * compression policy (T6) is what folds them together at scale.
  *
  * At scale each micro-batch writes 9× small column groups instead of one
  * wide table — the reference's write amplification — but here the fan-out
  * is projection-only (no extra shuffle beyond the one repartition).
  */
object FanOutSink {

  /** Batch-side fan-out: write all 9 projections of `conformed` under
    * `baseDir/<table>/` with the partitioned+sorted layout. When
    * `batchId` is set the write goes to `<table>/batch=<id>/` with
    * Overwrite semantics (the streaming replay-safe path). */
  def writeBatch(conformed: DataFrame, baseDir: String,
      format: String = "parquet", mode: SaveMode = SaveMode.Append,
      batchId: Option[Long] = None): Unit = {
    val deduped = Transforms
      .dedupByKey(conformed, Transforms.stableDedupOrder(conformed))
      .withColumn("date", to_date(col(FieldCatalog.keyTimestamp)))
      .repartition(col(FieldCatalog.keySensor))
      .sortWithinPartitions(col(FieldCatalog.keyTimestamp))
      .persist()
    val (effMode, suffix) = batchId match {
      case Some(id) => (SaveMode.Overwrite, s"/batch=$id")
      case None     => (mode, "")
    }
    try {
      Transforms.verticalSplit(deduped.drop("date")).foreach { case (table, _) =>
        val cols = (FieldCatalog.keyCols ++ FieldCatalog.groupCols(table))
          .map(col) :+ col("date")
        val w = deduped.select(cols: _*).write
          .mode(effMode).partitionBy("date")
          .option("compression", if (format == "parquet") "zstd" else "none")
        val path = s"$baseDir/$table$suffix"
        format match {
          case "parquet" => w.parquet(path)
          case "csv" => w.option("header", "true").csv(path)
          case other => w.format(other).save(path)
        }
      }
    } finally deduped.unpersist()
  }

  /** Streaming fan-out: `foreachBatch` at the reference's 65 s cadence
    * (T1). File formats take the replay-safe `batch=<id>`/Overwrite path;
    * a `jdbc:` URL routes to [[writeBatchJdbc]] guarded by PER-TABLE
    * committed markers under the checkpoint dir (skip on replay —
    * appends are not rewindable; per-table markers mean a crash mid-loop
    * replays only the tables whose marker is missing, closing the
    * duplicate window to a crash between ONE table's commit and its
    * marker write, not the whole 9-table batch). */
  def stream(conformed: DataFrame, baseDir: String, checkpointDir: String,
      format: String = "parquet",
      trigger: Trigger = Trigger.ProcessingTime("65 seconds"),
      jdbcProperties: java.util.Properties = new java.util.Properties(),
      compactEveryBatches: Int = 0): StreamingQuery =
    conformed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (format.startsWith("jdbc:")) {
          val markerDir = new org.apache.hadoop.fs.Path(
            s"$checkpointDir/_graft_jdbc_committed/$batchId")
          val fs = markerDir.getFileSystem(
            batch.sparkSession.sparkContext.hadoopConfiguration)
          // Legacy layout migration: earlier versions wrote ONE marker
          // FILE per batch at this path. A file here means the whole
          // batch committed — skip it entirely (re-appending would be
          // the exact duplicate window the marker closes, and
          // mkdirs-over-a-file would fail the micro-batch).
          val legacyCommitted =
            fs.exists(markerDir) && fs.getFileStatus(markerDir).isFile
          if (!legacyCommitted)
            writeBatchJdbc(batch, format, jdbcProperties,
              markers = Some((fs, markerDir)))
        } else {
          writeBatch(batch, baseDir, format, batchId = Some(batchId))
          // The compression/compaction policy riding the micro-batch
          // clock (parquet only — csv layouts append per batch already).
          if (compactEveryBatches > 0 && format == "parquet" &&
              batchId > 0 && batchId % compactEveryBatches == 0) {
            val _ = compactAll(batch.sparkSession, baseDir)
          }
        }
      }
      .start()

  /** JDBC fan-out (K1/K2): one append per projection per micro-batch —
    * the reference's 9 INSERTs, batched. Driver jar must be on the
    * classpath (e2e-tested against embedded Derby). With `markers`, each
    * table's append is skipped when its marker file exists and marked
    * committed right after it lands — the streaming replay guard. */
  def writeBatchJdbc(conformed: DataFrame, url: String,
      props: java.util.Properties,
      markers: Option[(org.apache.hadoop.fs.FileSystem,
        org.apache.hadoop.fs.Path)] = None): Unit = {
    val deduped = Transforms
      .dedupByKey(conformed, Transforms.stableDedupOrder(conformed))
      .persist()
    try Transforms.verticalSplit(deduped).foreach { case (table, part) =>
      val marker = markers.map { case (_, dir) =>
        new org.apache.hadoop.fs.Path(dir, table) }
      val committed = markers.exists { case (fs, _) => fs.exists(marker.get) }
      if (!committed) {
        part.write.mode(SaveMode.Append).jdbc(url, table, props)
        markers.foreach { case (fs, dir) =>
          fs.mkdirs(dir)
          fs.create(marker.get, true).close()
        }
      }
    } finally deduped.unpersist()
  }

  /** Read one partition table back with partition pruning intact. Batch
    * and date partition columns discovered from the layout are dropped /
    * kept respectively — `batch` is a physical detail of replay safety,
    * `date` is the hypertable time-partition key. */
  def readTable(spark: org.apache.spark.sql.SparkSession, baseDir: String,
      table: String): DataFrame = {
    val df = spark.read.parquet(s"$baseDir/$table")
    if (df.columns.contains("batch")) df.drop("batch") else df
  }

  /** Maintenance job: fold a table's accumulated `batch=<id>` micro-batch
    * directories (including earlier compacted ones) into one compacted
    * batch with the T6 layout (clustered by sensor, sorted by time,
    * zstd) — the scheduled-compaction half of the reference's compression
    * policy, which is what keeps the 65 s micro-batch cadence from
    * turning into a small-files problem at scale. Returns the number of
    * batch directories folded.
    *
    * Crash safety on plain parquet: the compacted data is written to a
    * hidden staging dir (invisible to readers), renamed into place, and
    * only then are the sources deleted. A crash before the rename leaves
    * an orphan staging dir (cleaned on the next run, nothing lost or
    * duplicated); a crash after it leaves duplicates until the next run
    * folds them again — never data loss. A transactional table format
    * would close the duplicate window; out of scope for plain parquet. */
  def compact(spark: org.apache.spark.sql.SparkSession, baseDir: String,
      table: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(s"$baseDir/$table")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return 0
    val staging = new org.apache.hadoop.fs.Path(dir, ".compacting")
    // Orphan staging ⇒ previous run crashed pre-rename; sources intact.
    if (fs.exists(staging)) fs.delete(staging, true)
    val batches = fs.listStatus(dir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (batches.length < 2) return 0
    // Fresh compacted id: strictly above every id seen so far. Streaming
    // batch ids only grow, and "c<id>" never collides with a numeric id.
    val nextId = batches.map(_.getPath.getName.stripPrefix("batch=")
      .stripPrefix("c").takeWhile(_.isDigit).toLong).max + 1
    spark.read.option("basePath", dir.toString)
      .parquet(batches.map(_.getPath.toString): _*)
      .drop("batch")
      .repartition(col(FieldCatalog.keySensor))
      .sortWithinPartitions(col(FieldCatalog.keyTimestamp))
      .write.mode(SaveMode.Overwrite).partitionBy("date")
      .option("compression", "zstd")
      .parquet(staging.toString)
    fs.rename(staging, new org.apache.hadoop.fs.Path(dir, s"batch=c$nextId"))
    batches.foreach(s => fs.delete(s.getPath, true))
    batches.length
  }

  /** [[compact]] across all 9 partition tables. */
  def compactAll(spark: org.apache.spark.sql.SparkSession,
      baseDir: String): Int =
    FieldCatalog.Groups.all.map(compact(spark, baseDir, _)).sum
}
