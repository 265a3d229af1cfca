package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` payloads
  * with typed metadata, plus distributed decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration (`mapPartitions` over an iterator, the Scala analogue of
  * `mapInPandas`), and output schemas. The codec step itself is STUBBED with
  * a deterministic fake (this container has no image/audio libraries): the
  * `decodeStub` function derives "pixels"/"samples" from the payload bytes
  * reproducibly. Swap [[MediaCodec.decode]] for a real JNI/libs-backed codec
  * in production; nothing else changes.
  *
  * Scale notes: payloads stay opaque binary until the last possible moment
  * (no shuffle ever carries decoded frames); decode runs partition-local
  * after a `repartition` on media_id so one task touches one shard of
  * payloads; metadata-only queries never deserialize payloads at all thanks
  * to parquet column pruning.
  */
object Multimodal {

  /** Canonical media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("caption", StringType, nullable = true)
  ))

  /** Deterministic fake codec — STUB for the real decoder.
    * Feature `j` is the first 60 bits of `md5(payload ++ ascii(j))` scaled
    * to [0, 1): same bytes → same features under any partitioning, and —
    * because MD5 is available in every engine — the whole feature table is
    * reproducible by the DuckDB correctness oracle (unlike a wrapping
    * native hash). */
  object MediaCodec {
    def decode(payload: Array[Byte], n: Int): Array[Double] = {
      // ??? real codec goes here (libjpeg/ffmpeg/...); deterministic stub:
      val out = new Array[Double](n)
      var j = 0
      while (j < n) {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(payload)
        md.update(j.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val d = md.digest()
        // first 15 hex digits = high 60 bits, exact in a long and a double
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h = h >>> 4 // keep 60 bits
        out(j) = h.toDouble / (1L << 60).toDouble
        j += 1
      }
      out
    }
  }

  /** Build a media table from any (id, text) corpus — payload = UTF-8 bytes.
    * Used by tests and the verify gate as a stand-in for real blobs. */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit("image").as("kind"),
      col(textCol).cast(BinaryType).as("payload"),
      lit("application/octet-stream").as("mime"),
      (pmod(col(idCol), lit(640)) + 32).cast(IntegerType).as("width"),
      (pmod(col(idCol), lit(480)) + 32).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"),
      lit(null).cast(StringType).as("caption"))

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** Distributed feature extraction: batch-iterate partitions, decode each
    * payload with the (stubbed) codec, emit fixed-width feature vectors.
    * This is the `mapInPandas`-shaped operator: iterator in, iterator out,
    * no per-row task overhead, payloads never shuffled. */
  def extractFeatures(media: DataFrame, featureDim: Int): DataFrame = {
    val spark = media.sparkSession
    val enc = ExpressionEncoder(featureSchema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            payload.length.toLong, MediaCodec.decode(payload, featureDim))
        }
      }(enc)
  }

  /** Distributed resize: batch-iterate partitions, "decode" each payload
    * with the stub codec and re-encode at (w, h), emitting a new media
    * row with updated metadata. Same `mapInPandas` shape as
    * [[extractFeatures]] — iterator in/out, payloads never shuffled; a
    * real implementation swaps the byte-level stub for libvips/ffmpeg
    * scaling and nothing else changes. The stub output is deterministic:
    * the payload truncated/cycled to the w·h "pixel" budget. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = ExpressionEncoder(mediaSchema)
    media.select("media_id", "kind", "payload", "mime", "width", "height",
        "duration_ms", "caption")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val budget = math.min(w * h, math.max(payload.length, 1))
          val resized = new Array[Byte](math.min(budget, payload.length))
          var i = 0
          while (i < resized.length) { resized(i) = payload(i); i += 1 }
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), resized,
            r.getAs[String]("mime"), w, h, r.getAs[java.lang.Long]("duration_ms"),
            r.getAs[String]("caption"))
        }
      }(enc)
  }

  /** Frame sampling plan for video rows: which frame indices a decoder
    * should materialize (every `everyMs`). Pure column math — demonstrates
    * metadata-only planning without touching payloads. */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs)))
          .as("frame_ms"))

  /** Metadata-only profile: never reads `payload` (check `ReadSchema` in
    * `.explain` — column pruning keeps blobs out of IO entirely). */
  def metadataProfile(media: DataFrame): DataFrame =
    media.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))
}
