package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`): brute-force
  * top-k as the exact baseline, and an LSH-bucketed (random-hyperplane)
  * variant as the scale path. Plus embedding-cosine near-duplicate pairs.
  *
  * Scale design (100 TB):
  *  - The query set is small → it is `broadcast()` and the corpus is
  *    scanned exactly once; per-query top-k is a `row_number` window
  *    partitioned by query id (one shuffle keyed on query id, k rows kept).
  *  - The LSH variant buckets both sides on sign-bit signatures, turning
  *    the cross product into an equi-join on `(bucket)` — candidates only.
  *  - Dot products are computed with `zip_with` + fixed-scale decimal
  *    aggregation: exact and order-independent, so scores (and therefore
  *    top-k membership) are bit-deterministic across engines/partitionings.
  */
object Similarity {

  /** Elementwise product, each term cast to DECIMAL(30,12), summed exactly,
    * surfaced as double. float→double widening is exact, products are
    * deterministic IEEE, and decimal addition is associative — the whole
    * pipeline has one well-defined answer. */
  def dotExact(a: Column, b: Column): Column = {
    val terms = zip_with(a, b,
      (x, y) => (x.cast(DoubleType) * y.cast(DoubleType)).cast(DecimalType(25, 12)))
    aggregate(terms, lit(BigDecimal(0)).cast(DecimalType(30, 12)),
      (acc, v) => (acc + v).cast(DecimalType(30, 12))).cast(DoubleType)
  }

  /** Exact L2 norm via the same decimal path. */
  def normExact(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => (x.cast(DoubleType) * x.cast(DoubleType))
        .cast(DecimalType(25, 12))),
      lit(BigDecimal(0)).cast(DecimalType(30, 12)), (acc, v) => (acc + v).cast(DecimalType(30, 12)))
      .cast(DoubleType))

  def cosineExact(a: Column, b: Column): Column =
    dotExact(a, b) / (normExact(a) * normExact(b))

  /** Brute-force top-k by inner product (or cosine): for each query vector,
    * the k nearest corpus vectors. Queries are broadcast; ties broken by
    * corpus id — fully deterministic.
    *
    * Returns (queryIdCol, corpusIdCol, score, rank).
    */
  def bruteForceTopK(
      queries: DataFrame, queryId: String, queryVec: String,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int, cosine: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(
      col(queryId).as("query_id"), col(queryVec).as("qv")))
    val c = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"))
    val score =
      if (cosine) cosineExact(col("qv"), col("cv"))
      else dotExact(col("qv"), col("cv"))
    val scored = c.crossJoin(q).withColumn("score", score)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "score", "rank")
  }

  /** Random-hyperplane signature: `planes` sign bits packed in a long.
    * Hyperplane p's component for dimension i is a deterministic pseudo-
    * random ±1 derived from xxhash64 — no stored model, reproducible
    * anywhere. sum(±component) uses the decimal path for determinism. */
  def rhpSignature(vec: Column, planes: Int): Column = {
    val dims = size(vec)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val acc = aggregate(
        zip_with(vec, sequence(lit(0), dims - 1), (x, i) =>
          when(xxhash64(concat_ws(":", p, i)).bitwiseAND(1L) === 1L,
            x.cast(DoubleType)).otherwise(-x.cast(DoubleType))
            .cast(DecimalType(25, 12))),
        lit(BigDecimal(0)).cast(DecimalType(30, 12)), (a, v) => (a + v).cast(DecimalType(30, 12)))
      when(acc > 0, lit(1L)).otherwise(lit(0L))
    })
    // pack LSB-first bits: fold MSB-first with acc*2 + bit (no dynamic shifts)
    aggregate(reverse(bits), lit(0L), (acc, b) => acc * 2 + b)
  }

  /** LSH-bucketed ANN: both sides are signed into `planes`-bit buckets;
    * candidates share a bucket in at least one of `tables` independent
    * signatures (classic multi-table RHP-LSH). Exact scoring + top-k only
    * within candidates. Approximate: recall < 1 by design; the exactness
    * knobs are `planes` (smaller = bigger buckets) and `tables` (more =
    * higher recall).
    */
  def lshTopK(
      queries: DataFrame, queryId: String, queryVec: String,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int, planes: Int = 12, tables: Int = 4): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String, side: String) =
      df.select(col(id).as(s"${side}_id"), col(vec).as(s"${side}v"),
        posexplode(transform(sequence(lit(0), lit(tables - 1)), t =>
          // table-specific signature: offset the plane index space per table
          rhpSignatureOffset(col(vec), planes, t))).as(Seq("table", "bucket")))
    val qb = broadcast(withBuckets(queries, queryId, queryVec, "query"))
    val cb = withBuckets(corpus, corpusId, corpusVec, "corpus")
    val cand = cb.join(qb, Seq("table", "bucket"))
      .select(col("query_id"), col("corpus_id"), col("queryv"), col("corpusv"))
      .distinct()
    val scored = cand.withColumn("score", dotExact(col("queryv"), col("corpusv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "score", "rank")
  }

  private def rhpSignatureOffset(vec: Column, planes: Int, table: Column): Column = {
    val dims = size(vec)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val acc = aggregate(
        zip_with(vec, sequence(lit(0), dims - 1), (x, i) =>
          when(xxhash64(concat_ws(":", table, p, i)).bitwiseAND(1L) === 1L,
            x.cast(DoubleType)).otherwise(-x.cast(DoubleType))
            .cast(DecimalType(25, 12))),
        lit(BigDecimal(0)).cast(DecimalType(30, 12)), (a, v) => (a + v).cast(DecimalType(30, 12)))
      when(acc > 0, lit(1L)).otherwise(lit(0L))
    })
    // pack LSB-first bits: fold MSB-first with acc*2 + bit (no dynamic shifts)
    aggregate(reverse(bits), lit(0L), (acc, b) => acc * 2 + b)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, via LSH
    * bucketing on one signature (pairs must collide) then exact cosine.
    * `id_a < id_b`, distinct, deterministic scores. */
  def cosineNearDuplicates(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 8, tables: Int = 4): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(transform(sequence(lit(0), lit(tables - 1)), t =>
        rhpSignatureOffset(col(vecCol), planes, t))).as(Seq("table", "bucket")))
    val l = b.select(col("id").as("id_a"), col("v").as("va"), col("table"), col("bucket"))
    val r = b.select(col("id").as("id_b"), col("v").as("vb"), col("table"), col("bucket"))
    l.join(r, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"))
      .distinct()
      .withColumn("cosine", cosineExact(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
