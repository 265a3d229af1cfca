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
}
