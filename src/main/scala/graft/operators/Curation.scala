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

  /** Keep the TOP `k` docs per group ranked by a score (desc, ties by
    * id) — the RANKED complement of [[Sampling.stratifiedCap]]'s hash
    * cap: a per-domain/per-language quality budget that keeps the BEST
    * documents rather than a uniform subset. One shuffle on the group
    * key; a skewed group pays one top-k window over its rows. Adds
    * `quality_rank` (1-based). */
  def topQualityPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("quality_rank",
        org.apache.spark.sql.functions.row_number().over(w)
          .cast(org.apache.spark.sql.types.LongType))
      .filter(col("quality_rank") <= k)
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
    * The sample is keyed on the CONTENT digest, which makes it
    * duplicate-invariant: every copy of one content shares a single
    * deterministic draw, so the kept-content distribution matches the
    * batch pipeline's dedup-then-sample regardless of order. The
    * stateless sample therefore runs BEFORE the stateful dedup — same
    * output, but the dedup state store only holds digests for the
    * sampled fraction (1/rate less state and checkpoint I/O than
    * dedup-first). An id-keyed sample here would be wrong: each
    * duplicate would draw independently and re-crawled content would
    * survive with probability 1−(1−rate)ⁿ.
    *
    * `df` must be a streaming DataFrame with an event-time column. */
  def streamingCurate(
      df: DataFrame, idCol: String, textCol: String, tsCol: String,
      stopwords: Seq[String], minQuality: Double = 0.3,
      sampleRate: Double = 1.0,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val gated = TextAnalysis.quality(df, textCol, stopwords)
      .filter(col("quality_score") >= minQuality)
      .withColumn("content_md5",
        md5(col(textCol).cast(org.apache.spark.sql.types.BinaryType)))
    val sampled =
      if (sampleRate >= 1.0) gated
      else Sampling.uniform(gated, "content_md5", sampleRate)
    sampled
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("content_md5"))
      .select(col(idCol), col(tsCol), col(textCol), col("quality_score"))
  }

  /** One micro-batch of streaming decontamination: drop every batch doc
    * that [[Dedup.crossCorpusContamination]] flags against the (static,
    * small) eval corpus, then land the survivors in a replay-safe
    * `batch=<id>` directory — Overwrite per batch, so an at-least-once
    * replay rewrites rather than duplicates (the
    * [[graft.sinks.FanOutSink.writeBatch]] discipline). Exposed so
    * specs and manual repair can drive the exact path the stream runs. */
  def decontaminateBatch(batch: DataFrame, batchId: Long,
      evalCorpus: DataFrame, evalId: String, evalText: String,
      idCol: String, textCol: String, outDir: String,
      shingleWords: Int, minShared: Long): Unit = {
    // The anti-join key is the id CAST to LONG (contamination ids are
    // long): a non-numeric id column would cast to null, never match,
    // and silently disable decontamination — fail loudly instead.
    val idType = batch.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"decontaminateBatch requires a numeric id column (castable to " +
        s"LONG); '$idCol' is ${idType.simpleString}")
    val bad = Dedup.crossCorpusContamination(batch, idCol, textCol,
        evalCorpus, evalId, evalText, shingleWords, minShared)
      .select(col("train_id")).distinct()
    batch.join(bad,
        batch(idCol).cast(org.apache.spark.sql.types.LongType)
          === bad("train_id"), "left_anti")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$outDir/batch=$batchId")
  }

  /** One micro-batch of streaming perplexity gating: score the batch
    * under a FROZEN bigram LM (trained once on a static clean reference
    * — the stream never retrains it, so every batch is judged by the
    * same yardstick and replays are deterministic) and land only
    * documents at or under `maxMilliBits` milli-bits-per-token in a
    * replay-safe `batch=<id>` directory (Overwrite ⇒ at-least-once
    * replay rewrites rather than duplicates). Scoring is stateless
    * given the model: the model tables are broadcast, the batch makes
    * one pass, survivors semi-join back batch-sized. Exposed so specs
    * and manual repair can drive the exact path the stream runs. */
  def lmGateBatch(batch: DataFrame, batchId: Long,
      model: TextAnalysis.LmModel, idCol: String, textCol: String,
      maxMilliBits: Long, outDir: String): Unit = {
    val idType = batch.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"lmGateBatch requires a numeric id column (castable to LONG); " +
        s"'$idCol' is ${idType.simpleString}")
    val keep = model.score(batch, idCol, textCol)
      .filter(col("milli_bits_per_token") <= maxMilliBits)
      .select(col("doc_id"))
    batch.join(keep,
        batch(idCol).cast(org.apache.spark.sql.types.LongType)
          === keep("doc_id"), "left_semi")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$outDir/batch=$batchId")
  }

  /** CCNet head/middle/tail perplexity bucketing: partition a SCORED
    * corpus (the output of [[TextAnalysis.lmPerplexity]] /
    * [[TextAnalysis.LmModel.score]]) into thirds by
    * `milli_bits_per_token` ascending — `head` is the most
    * reference-like third, the slice the published recipe trains on.
    *
    * Cuts are VALUE-TIED, not row-tied: the head threshold is the
    * smallest score whose cumulative count reaches ⌈n/3⌉ (tail
    * analogously at ⌈2n/3⌉), so equally-scored documents always share a
    * bucket — no arbitrary tie split, and the result is deterministic
    * and engine-reproducible.
    *
    * Scale shape: no global sort and no corpus-wide window. The
    * thresholds come from a histogram `groupBy(score)` — the score is
    * integer milli-bits/token, bounded by ~10³·log₂(corpus bigrams)
    * (≲ 60k distinct values at ANY corpus size), so the cumulative
    * window runs over a bounded single partition exactly like the
    * discrete-median in [[Profiling.corpusProfile]]. Assignment is the
    * 1-row threshold broadcast back into the scan: two passes over the
    * scored frame, zero wide shuffles. */
  def perplexityBuckets(scored: DataFrame,
      scoreCol: String = "milli_bits_per_token"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy(col(scoreCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // thresholds: smallest v with cum >= ceil(n/3) / ceil(2n/3)
    val thresholds = cum.crossJoin(
        broadcast(hist.agg(sum(col("cnt")).as("n"))))
      .agg(
        min(when(col("cum") >= expr("(n + 2) div 3"), col("v"))).as("t1"),
        min(when(col("cum") >= expr("(n * 2 + 2) div 3"), col("v"))).as("t2"))
    scored.crossJoin(broadcast(thresholds))
      .withColumn("bucket",
        when(col(scoreCol) <= col("t1"), lit("head"))
          .when(col(scoreCol) <= col("t2"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("t1", "t2")
  }

  /** Streaming CCNet-style quality gating: every micro-batch is scored
    * under the frozen reference LM and only sufficiently-target-like
    * documents land — perplexity filtering AT INGEST, the head/middle
    * cut of the published recipe applied continuously. Train the model
    * once with [[TextAnalysis.trainLm]] before starting the stream. */
  def streamingLmGate(
      stream: DataFrame, idCol: String, textCol: String,
      model: TextAnalysis.LmModel, maxMilliBits: Long,
      outDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("65 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lmGateBatch(batch, batchId, model, idCol, textCol,
          maxMilliBits, outDir)
      }
      .start()

  /** Streaming decontamination: every micro-batch is screened against a
    * static evaluation corpus (the standard any-shared-8-gram rule by
    * default) and survivors land in replay-safe per-batch directories —
    * eval-set hygiene enforced AT INGEST, not as a post-hoc sweep. The
    * eval side is broadcast inside the contamination join, so the
    * per-batch cost is one map-side pass over the batch; pass a
    * pre-cached eval DataFrame when the trigger is much faster than the
    * reference's 65 s cadence. */
  def streamingDecontaminate(
      stream: DataFrame, idCol: String, textCol: String,
      evalCorpus: DataFrame, evalId: String, evalText: String,
      outDir: String, checkpointDir: String,
      shingleWords: Int = 8, minShared: Long = 1L,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("65 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        decontaminateBatch(batch, batchId, evalCorpus, evalId, evalText,
          idCol, textCol, outDir, shingleWords, minShared)
      }
      .start()

  /** Per-group TOKEN budget (the per-domain cap recipe: no single
    * domain may contribute more than `budget` training tokens): scan
    * each group in the deterministic `(md5_60(key), key)` hash order
    * and keep documents while the cumulative token count of the
    * PRECEDING kept documents is still under the budget — greedy
    * admission, so the document that crosses the line is kept (soft
    * budget, overflow < one document — the [[Sampling.packTokenBudget]]
    * contract) and everything after it drops. A doc-count cap
    * ([[Sampling.stratifiedCap]]) lets one domain flood the token
    * distribution with a few huge pages; budgeting the actual tokens
    * is what evens out the mixture.
    *
    * Adds `tokens_before` (exact BIGINT running total of prior
    * admitted-order tokens — the audit column: `tokens_before +
    * n_tokens` is each group's realized spend).
    *
    * Scale shape: ONE shuffle on the group key, then a per-group
    * running sum over `ROWS UNBOUNDED PRECEDING` (Spark evaluates it
    * streaming — no per-frame rescan). Hash order means admission is
    * uniform over the group, not biased by id assignment order. */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(Dedup.md5_60(col(keyCol)
        .cast(org.apache.spark.sql.types.StringType)), col(keyCol))
    df.withColumn("tokens_before", coalesce(
        sum(col(tokensCol).cast(org.apache.spark.sql.types.LongType))
          .over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("tokens_before") < budget)
  }

  /** Histogram-ECDF score calibration — turn raw per-document quality
    * scores into corpus-relative standing so thresholds can be set as
    * PERCENTILES ("keep the top 30 %") instead of absolute score
    * values that drift with every scorer change. Each row gets:
    *
    *   - `bucket`    — its equi-width bin in `[0, buckets)` between
    *                   the corpus min/max score,
    *   - `cum_lt`    — EXACT count of corpus rows in strictly lower
    *                   buckets (the integer ECDF lower bound),
    *   - `n_total`   — corpus size.
    *
    * `cum_lt >= ceil((1-q) * n_total)` keeps the top-q fraction with
    * bucket granularity — an integer-exact decision, no double
    * comparison at the cut. An exact per-row percent_rank would be a
    * single-partition global window (a non-starter at corpus scale);
    * the bucketed ECDF costs two tiny aggregates instead and its
    * granularity is operator-controlled via `buckets`.
    *
    * Scale shape: one 2-value extremes aggregate (broadcast back), one
    * map-side-combined count per bucket (`buckets` rows), a running
    * sum over those `buckets` rows, and a broadcast join back — the
    * corpus itself is scanned once with per-row codegen'd bucket math
    * (fixed op order `(s - lo) * buckets / (hi - lo)`, mirrored by the
    * SQL oracle; degenerate `hi == lo` corpora land in bucket 0). */
  def calibrateScores(df: DataFrame, scoreCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val s = col(scoreCol).cast(DoubleType)
    val ext = df.agg(min(s).as("cal_lo"), max(s).as("cal_hi"))
    val withBucket = df.crossJoin(broadcast(ext))
      .withColumn("bucket",
        when(col("cal_hi") === col("cal_lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((s - col("cal_lo")) * lit(buckets.toDouble) /
              (col("cal_hi") - col("cal_lo"))).cast(IntegerType))))
      .drop("cal_lo", "cal_hi")
    val byBucket = withBucket.groupBy(col("bucket").as("cal_bucket")).count()
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("cal_bucket"))
    val cum = byBucket
      .withColumn("cum_lt", coalesce(
        sum(col("count")).over(wAll.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_total", sum(col("count")).over(
        wAll.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(col("cal_bucket"), col("cum_lt").cast(LongType),
        col("n_total").cast(LongType))
    withBucket.join(broadcast(cum), col("bucket") === col("cal_bucket"))
      .drop("cal_bucket")
  }
}
