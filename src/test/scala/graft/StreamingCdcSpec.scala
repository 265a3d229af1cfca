package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.queries.Warehouse
import graft.streaming.StreamingCdc
import graft.streaming.StreamingCdc.{Change, Snapshot}

/** Streaming CDC latest-wins: cross-batch ordering, change-only
  * emission, tombstone rows, and exact equivalence with the batch
  * operator on the same changelog. */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch latest-wins: stale late records never overwrite") {
    implicit val sqlCtx = spark.sqlContext
    def us(s: Long) = s * 1000000L
    val input = MemoryStream[Change]
    val out = StreamingCdc(input.toDS())
    val cp = Files.createTempDirectory("graft_scdc").toString
    val q = out.writeStream.format("memory").queryName("scdc_out")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      input.addData(Change(1L, us(100), 1L, deleted = false, "view", 1.0))
      q.processAllAvailable()
      // newer record: state advances and re-emits
      input.addData(Change(1L, us(200), 2L, deleted = false, "click", 2.0))
      q.processAllAvailable()
      // STALE record in a later batch: no emission, no overwrite
      input.addData(Change(1L, us(150), 3L, deleted = false, "error", 9.0))
      q.processAllAvailable()
      // tombstone: newest record is a delete -> deleted=true row emitted
      input.addData(Change(1L, us(300), 4L, deleted = true, "gone", 0.0))
      q.processAllAvailable()
      val rows = spark.table("scdc_out").as[Snapshot].collect()
        .sortBy(_.lastRowId)
      assert(rows.map(_.lastRowId).toSeq == Seq(1L, 2L, 4L),
        s"emissions: ${rows.toSeq}") // rowId 3 (stale) never emitted
      assert(rows(1).attr == "click")
      assert(rows(2).deleted, "tombstone must surface as deleted=true")
      // same-batch ordering: the (ts, rowId) max wins within one batch
      input.addData(
        Change(2L, us(500), 10L, deleted = false, "a", 1.0),
        Change(2L, us(500), 11L, deleted = false, "b", 2.0),
        Change(2L, us(400), 12L, deleted = false, "c", 3.0))
      q.processAllAvailable()
      val k2 = spark.table("scdc_out").as[Snapshot]
        .filter(_.key == 2L).collect()
      assert(k2.length == 1 && k2(0).lastRowId == 11L && k2(0).attr == "b")
    } finally q.stop()
  }

  test("stream last-emission == batch cdcLatestWins on the same changelog") {
    def us(s: Long) = s * 1000000L
    val log = Seq(
      Change(1L, us(10), 1L, deleted = false, "view", 1.0),
      Change(1L, us(20), 2L, deleted = false, "click", 2.0),
      Change(2L, us(10), 3L, deleted = false, "view", 3.0),
      Change(2L, us(30), 4L, deleted = true, "err", 4.0),
      Change(3L, us(10), 5L, deleted = true, "err", 5.0),
      Change(3L, us(10), 6L, deleted = false, "view", 6.0))
    // stream pass (batch-mode Dataset run of the same stateful logic)
    val streamed = StreamingCdc(log.toDS()).collect()
      .groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.lastRowId) }
    // batch operator over the equivalent frame
    val batchDf = log.toDF()
      .select(col("key").as("user_id"),
        timestamp_micros(col("epochUs")).as("ts"),
        col("rowId").as("event_id"), col("deleted"),
        col("attr"), col("value"))
    val batch = Warehouse.cdcLatestWins(batchDf, "ts", "user_id",
      "event_id", Seq("attr", "value"), col("deleted") === true)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    // key 1: live in both, same payload
    assert(batch.contains(1L) && !streamed(1L).deleted)
    assert(batch(1L).getAs[String]("attr") == streamed(1L).attr)
    assert(batch(1L).getAs[Long]("last_row_id") == streamed(1L).lastRowId)
    // key 2: tombstoned — absent from batch, deleted-marker in stream
    assert(!batch.contains(2L) && streamed(2L).deleted)
    // key 3: same-ts tie broken by rowId (6 wins) -> live in both
    assert(batch.contains(3L) && !streamed(3L).deleted &&
      streamed(3L).lastRowId == 6L)
  }
}
