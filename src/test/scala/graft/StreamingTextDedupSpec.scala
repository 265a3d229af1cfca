package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingTextDedup

/** Online ingest dedup: in-batch component collapse, cross-batch
  * first-arrival-wins via the persisted LSH index, and replay safety of
  * both the landed output and the index appends. */
class StreamingTextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  // ~near-dups share almost all 5-word shingles; distinct docs share none
  private val baseText = "the quick brown fox jumps over the lazy dog " +
    "while the rain falls softly on the quiet green meadow today"
  private val nearDup = baseText + " indeed"
  private val distinctText = "completely different content about spark " +
    "catalyst optimizer rules and whole stage code generation pipelines"

  test("in-batch collapse, cross-batch drop, first-arrival wins, replay") {
    val indexDir = tmp("td_idx")
    val cpDir = tmp("td_cp")
    val outDir = tmp("td_out")
    def run(batch: org.apache.spark.sql.DataFrame, id: Long): Long =
      StreamingTextDedup.dedupBatch(batch, id, indexDir, cpDir, outDir,
        "doc_id", "text", shingleWords = 5, bands = 16, rowsPerBand = 4,
        threshold = 0.5)

    // batch 0: A and B are near-dups (one component), C distinct
    val b0 = Seq((1L, baseText), (2L, nearDup), (3L, distinctText))
      .toDF("doc_id", "text")
    val kept0 = run(b0, 0L)
    assert(kept0 == 2, "one of the near-dup pair must collapse in-batch")
    val out0 = spark.read.parquet(s"$outDir/batch=0")
      .select("doc_id").as[Long].collect().toSet
    assert(out0.contains(3L), "distinct doc admitted")
    assert((out0 - 3L).size == 1 && (out0 - 3L).subsetOf(Set(1L, 2L)),
      "exactly one of the near-dup pair admitted")

    // batch 1: exact dup of A, near-dup of C, and one genuinely new doc —
    // the dups lose to the EARLIER batch through the index
    val b1 = Seq(
      (10L, baseText),                 // near/exact dup of batch-0 winner
      (11L, distinctText + " extra"),  // near-dup of doc 3
      (12L, "a totally new document about streaming watermarks and " +
        "state stores that matches nothing admitted before at all")
    ).toDF("doc_id", "text")
    val kept1 = run(b1, 1L)
    assert(kept1 == 1, s"only the new doc may pass, kept $kept1")
    val out1 = spark.read.parquet(s"$outDir/batch=1")
      .select("doc_id").as[Long].collect().toSet
    assert(out1 == Set(12L))

    // replay of committed batch 1: output rewritten identically, index
    // NOT double-appended (bucket rows per doc unchanged)
    val bucketsBefore = spark.read.parquet(s"$indexDir/buckets").count()
    val keptReplay = run(b1, 1L)
    assert(keptReplay == 1)
    assert(spark.read.parquet(s"$outDir/batch=1")
      .select("doc_id").as[Long].collect().toSet == Set(12L))
    assert(spark.read.parquet(s"$indexDir/buckets").count() == bucketsBefore,
      "replay must not grow the index")

    // the index holds exactly the admitted docs' signatures
    assert(spark.read.parquet(s"$indexDir/sigs")
      .select("doc_id").as[Long].collect().toSet == out0 ++ out1)

    // crash window: index appended but the marker write was lost — the
    // re-run re-derives the gate against an index that already holds
    // this batch's own postings; self-match exclusion must keep doc 12
    val marker = new org.apache.hadoop.fs.Path(
      s"$cpDir/_graft_textdedup_committed/1")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false))
    val keptCrash = run(b1, 1L)
    assert(keptCrash == 1, "doc must not lose to its own index rows")
    assert(spark.read.parquet(s"$outDir/batch=1")
      .select("doc_id").as[Long].collect().toSet == Set(12L))
  }

  test("non-numeric id columns are refused loudly") {
    // the index stores LONG doc_ids and the self-match exclusion casts —
    // string ids would null out and silently disable cross-batch dedup
    val batch = Seq(("doc-a", baseText)).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      StreamingTextDedup.dedupBatch(batch, 0L, tmp("tdn_idx"),
        tmp("tdn_cp"), tmp("tdn_out"), "doc_id", "text")
    }
    assert(ex.getMessage.contains("numeric id column"), ex.getMessage)
  }

  test("streaming admit(): N micro-batches through the gate end-to-end") {
    val indexDir = tmp("tds_idx")
    val cpDir = tmp("tds_cp")
    val outDir = tmp("tds_out")
    val srcDir = tmp("tds_src")
    // file source: one batch per file drop
    Seq((1L, baseText), (2L, distinctText)).toDF("doc_id", "text")
      .write.parquet(s"$srcDir/p0")
    val schema = spark.read.parquet(s"$srcDir/p0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/p*")
    val q = StreamingTextDedup.admit(stream, "doc_id", "text",
      indexDir, cpDir, outDir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try q.processAllAvailable() finally q.stop()
    val admitted = spark.read.option("basePath", outDir)
      .parquet(s"$outDir/batch=*")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L))
    // second run over a NEW file holding a dup + a new doc
    Seq((5L, baseText), (6L, "fresh unseen writing regarding bloom " +
      "filters inside adaptive query execution frameworks")).toDF("doc_id", "text")
      .write.parquet(s"$srcDir/p1")
    val q2 = StreamingTextDedup.admit(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$srcDir/p*"),
      "doc_id", "text", indexDir, cpDir, outDir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try q2.processAllAvailable() finally q2.stop()
    val all = spark.read.option("basePath", outDir).parquet(s"$outDir/batch=*")
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 6L), s"dup of admitted doc must not pass: $all")
  }
}
