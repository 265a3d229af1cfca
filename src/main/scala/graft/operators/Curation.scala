package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the operators of this library
  * composed into the standard corpus-preparation pipeline —
  *
  *   1. quality gate    ([[TextAnalysis.quality]] score ≥ threshold)
  *   2. exact dedup     ([[Dedup.exact]], canonical min-id survivor)
  *   3. uniform sample  ([[Sampling.uniform]], deterministic hash split)
  *
  * Every stage is deterministic and engine-reproducible, so the WHOLE
  * pipeline has a DuckDB oracle. Shuffle budget: the quality gate is a
  * per-row filter inside the scan; dedup is one digest aggregation plus
  * a broadcast-able join back; the sample is another per-row filter —
  * two narrow passes and one small shuffle end to end, at any corpus
  * size.
  */
object Curation {

  def basicPipeline(
      docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String],
      minQuality: Double = 0.3, sampleRate: Double = 0.5): DataFrame = {
    val gated = TextAnalysis.quality(docs, textCol, stopwords)
      .filter(col("quality_score") >= minQuality)
      .select(col(idCol), col(textCol), col("quality_score"))
    val deduped = Dedup.exact(gated, idCol, textCol)
      .filter(col("keep"))
      .select(col(idCol), col(textCol), col("quality_score"))
    Sampling.uniform(deduped, idCol, sampleRate)
      .select(col(idCol), col("quality_score"))
  }

  /** The STREAMING form of the curation pipeline — continuous corpus
    * ingest: per-row quality gate + deterministic uniform sample (both
    * stateless, they run inside the micro-batch scan), then exact
    * content dedup ACROSS micro-batches via
    * `dropDuplicatesWithinWatermark` keyed on the content digest —
    * state holds one digest per distinct document and expires with the
    * watermark, so a re-crawled page arriving within the horizon is
    * dropped as a duplicate and state cannot grow unboundedly.
    * First-arrival-wins replaces the batch pipeline's min-id survivor
    * (cross-batch arrival order is the only order a stream has).
    *
    * Order matters: dedup runs BEFORE the sample, matching the batch
    * pipeline — sampling first would give each duplicate copy an
    * independent draw, so heavily re-crawled content would survive with
    * probability 1−(1−rate)ⁿ instead of rate, biasing the corpus toward
    * exactly what dedup suppresses. The sample is keyed on the CONTENT
    * digest (not the arrival-dependent surviving id), so each distinct
    * content gets exactly one deterministic draw.
    *
    * `df` must be a streaming DataFrame with an event-time column. */
  def streamingCurate(
      df: DataFrame, idCol: String, textCol: String, tsCol: String,
      stopwords: Seq[String], minQuality: Double = 0.3,
      sampleRate: Double = 1.0,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val gated = TextAnalysis.quality(df, textCol, stopwords)
      .filter(col("quality_score") >= minQuality)
    val deduped = gated
      .withColumn("content_md5",
        md5(col(textCol).cast(org.apache.spark.sql.types.BinaryType)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("content_md5"))
    val sampled =
      if (sampleRate >= 1.0) deduped
      else Sampling.uniform(deduped, "content_md5", sampleRate)
    sampled.select(col(idCol), col(tsCol), col(textCol), col("quality_score"))
  }
}
