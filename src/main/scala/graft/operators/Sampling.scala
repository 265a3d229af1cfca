package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling for training-data pipelines: train/eval splits
  * and per-class caps that are reproducible across engines, partitionings,
  * task retries, and reruns — no RNG, no seed state, no
  * `monotonically_increasing_id`. The sampling key is the row's
  * `md5_60(key)` hash treated as a uniform draw in [0, 2^60).
  *
  * At scale both operators are embarrassingly parallel: `uniform` is a
  * pure per-row filter inside the scan; `stratifiedCap` shuffles once on
  * the stratum key (skew-prone strata are capped by construction — the
  * window keeps only `perStratum` rows per key).
  */
object Sampling {

  private def hashKey(keyCol: Column): Column =
    Dedup.md5_60(keyCol.cast(StringType))

  /** Exact threshold for `rate` over the 2^60 hash space. */
  def rateThreshold(rate: Double): Long = (rate * (1L << 60).toDouble).toLong

  /** Keep rows whose hash draw falls below `rate` — a deterministic
    * Bernoulli(rate) sample keyed on `keyCol`. Disjoint splits compose:
    * `[0, r1)` for train and `[r1, r2)` for eval never overlap. */
  def uniform(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashKey(col(keyCol)) < lit(rateThreshold(rate)))

  /** WEIGHTED PRIORITY SAMPLE — k rows drawn with probability
    * proportional to a weight (a quality score, a length, an
    * importance): the Duffield–Lund–Thorup priority-sampling scheme
    * `priority = w / u` with `u = (h+1)/2⁶⁰` from the key's md5_60 —
    * deterministic, reproducible from the key alone, and mergeable
    * (the global top-k of priorities is the sample, so distributed
    * top-k IS the algorithm). This is how a curation pipeline samples
    * "mostly high-quality but not only high-quality" — hard top-k by
    * score keeps one mode; priority sampling keeps the distribution.
    *
    * Determinism: `priority = (w · 2⁶⁰) / (h+1)` — the product
    * multiplies by the exactly-representable double 2⁶⁰, the BIGINT→
    * DOUBLE conversion of `h+1` is correctly rounded, and both ops are
    * IEEE-exact in any engine; ties break on the key. Zero/negative
    * weights never enter the sample.
    *
    * Scale shape: per-row hash + `orderBy(priority).limit(k)`, which
    * Catalyst plans as TakeOrderedAndProject — each partition forwards
    * at most k candidates to one tiny k-row merge; the corpus is NEVER
    * globally sorted. The rank window then runs over the k survivors
    * only. */
  def weightedPriority(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    val pri = (col(weightCol).cast(DoubleType) *
      lit(1.152921504606846976e18)) /
      (hashKey(col(keyCol)) + lit(1L)).cast(DoubleType)
    val top = df.filter(col(weightCol) > 0)
      .withColumn("priority", pri)
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
    top.withColumn("sample_rank", row_number().over(
      Window.orderBy(col("priority").desc, col(keyCol))).cast(LongType))
  }

  /** ENTITY-CONSISTENT SPLIT — train/val/test assignment keyed on the
    * ENTITY's hash, not the row's: every row of a user lands in the
    * same split, so temporally-correlated rows of one entity can never
    * straddle train and eval (the split-leakage failure mode the
    * point-in-time join guards against in time). Fractions partition
    * the 2⁶⁰ hash space by cumulative thresholds; assignment is a pure
    * per-row expression — no shuffle, no state, reproducible forever
    * from the entity id alone (the property that lets a 100 TB corpus
    * re-derive its split on every read instead of storing one).
    * Appends a `split` column. */
  def entitySplit(df: DataFrame, entityCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val h = hashKey(col(entityCol))
    val expr = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1)) { case (((name, _), c), rest) =>
      when(h < lit(rateThreshold(c)), name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** At most `perStratum` rows per stratum, chosen in hash order (ties by
    * the key itself) — a deterministic per-class cap for rebalancing
    * skewed corpora. Adds `sample_rank` (1-based). */
  def stratifiedCap(df: DataFrame, stratumCol: String, keyCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashKey(col(keyCol)), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w).cast(LongType))
      .filter(col("sample_rank") <= perStratum)
  }

  /** EXACTLY `k` rows, deterministically: the k smallest
    * `(md5_60(key), key)` draws — the fixed-size complement of
    * [[uniform]]'s fixed-rate sample ("give me exactly 10k eval
    * examples", where a rate would jitter with corpus size). Monotone:
    * `fixedSize(k₁) ⊂ fixedSize(k₂)` for `k₁ ≤ k₂`, so eval sets only
    * ever grow as the budget does. Adds `sample_rank` (1-based draw
    * order). Plans as `TakeOrderedAndProject` — per-partition top-k and
    * a driver merge of k-row heaps, never a global sort (locked by the
    * ScaleSpec plan audit). */
  def fixedSize(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    df.orderBy(hashKey(col(keyCol)), col(keyCol)).limit(k)
      .withColumn("sample_rank", row_number()
        .over(Window.orderBy(hashKey(col(keyCol)), col(keyCol)))
        .cast(LongType))
  }

  /** Deterministic training-shard export: every row gets a `shard` in
    * `[0, nShards)` (uniform by the hash draw) and a 1-based `position`
    * within its shard, ordered by `(md5_60(key), key)` — a reproducible
    * GLOBAL shuffle order `(shard, position)` for dataloaders, with no
    * global sort anywhere: one hash-partition shuffle on `shard`, then
    * per-shard window sorts that run in parallel. Size `nShards` so a
    * shard fits one task (the per-shard sort is the scale bound — at
    * 100 TB that means 10⁴–10⁶ shards, which is also what a dataloader
    * wants), exactly how every epoch-shuffled dataset layout shards. */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashKey(col(keyCol)), col(keyCol))
    df.withColumn("shard", pmod(hashKey(col(keyCol)), lit(nShards.toLong)))
      .withColumn("position", row_number().over(w).cast(LongType))
  }

  /** Deterministic sequence packing: group documents into token-budget
    * bins (training examples) — each row gets `(shard, bin, bin_pos)`
    * where `bin` advances whenever the running token total within the
    * shard crosses a `budget` multiple. The greedy scan order is the
    * same `(md5_60(key), key)` hash order as [[shardAssign]], so the
    * packing is reproducible across engines, partitionings, and reruns.
    * The budget is a soft bound: a bin may overflow by less than one
    * document (the standard greedy-packing contract; split-on-boundary
    * is the chunker's job, [[TextAnalysis.chunk]]).
    *
    * Scale shape: one shuffle on `shard`, then per-shard running sums
    * (`ROWS UNBOUNDED PRECEDING` — Spark evaluates it streaming, no
    * per-frame rescan) and the bin id is one exact integer division of
    * BIGINT token counts; no global sort, no driver state. */
  def packTokenBudget(df: DataFrame, keyCol: String, tokensCol: String,
      budget: Long, nShards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashKey(col(keyCol)), col(keyCol))
    val wb = Window.partitionBy(col("shard"), col("bin"))
      .orderBy(hashKey(col(keyCol)), col(keyCol))
    df.withColumn("shard", pmod(hashKey(col(keyCol)), lit(nShards.toLong)))
      .withColumn("cum_excl", coalesce(
        sum(col(tokensCol).cast(LongType))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("bin", expr(s"cum_excl div ${budget}L"))
      .withColumn("bin_pos", row_number().over(wb).cast(LongType))
      .drop("cum_excl")
  }

  /** Deterministic training-mixture resampling: each group (domain,
    * source, language) is re-weighted to its target `rate` — the
    * standard mixture step between curation and shard export (weight
    * web/books/code/reference corpora to a recipe, not to their raw
    * sizes). `rate ≤ 1` downsamples (the same Bernoulli-by-hash-draw
    * filter as [[uniform]]); `rate > 1` upsamples: `floor(rate)` full
    * copies plus one more for rows whose draw falls below the
    * fractional remainder — expected multiplicity exactly `rate`,
    * keyed only on `keyCol`, so the SAME rows repeat across reruns,
    * partitionings, and engines. Output adds `epoch` (0-based copy
    * index): downstream shard/pack keys can append it so repeated
    * copies land in different training positions.
    *
    * Groups absent from `rates` are DROPPED — a mixture is an explicit
    * recipe, and silently passing an unlisted source through at 1×
    * would corrupt the weighting.
    *
    * Scale shape: the recipe joins as a broadcast literal (a mixture
    * has tens of entries), the multiplicity decision is a per-row
    * filter inside the scan, and the copy fan-out is a bounded
    * `explode(sequence(...))` — no shuffle anywhere. */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "mixture needs at least one group rate")
    require(rates.values.forall(r => r >= 0 && r.isFinite),
      s"rates must be finite and >= 0: $rates")
    val spark = df.sparkSession
    import spark.implicits._
    val recipe = rates.toSeq
      .map { case (g, r) =>
        (g, math.floor(r).toLong, rateThreshold(r - math.floor(r)))
      }
      .toDF("mix_group", "mix_copies", "mix_frac_threshold")
    df.join(broadcast(recipe), col(groupCol) === col("mix_group"))
      .withColumn("mix_n", col("mix_copies") +
        when(hashKey(col(keyCol)) < col("mix_frac_threshold"), 1L)
          .otherwise(0L))
      .filter(col("mix_n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("mix_n") - 1)))
      .drop("mix_group", "mix_copies", "mix_frac_threshold", "mix_n")
  }

  /** Temperature-balanced mixture (the multilingual-pretraining recipe:
    * sample group g with probability ∝ p_g^α instead of its raw share
    * p_g, flattening the head/tail imbalance) — at the square-root
    * temperature α = 1/2, the one exponent whose `sqrt` is IEEE
    * correctly-rounded on every engine, so the derived rates are
    * bit-deterministic cross-engine with no pow() portability caveat.
    *
    * Rates are anchored to the LARGEST group: it samples at `headRate`
    * and every other group at `headRate · sqrt(n_max / n_g)`, giving
    * expected counts ∝ sqrt(n_g) — exactly the α = 1/2 temperature
    * distribution. Small groups whose rate exceeds 1 UPSAMPLE with the
    * [[mixtureSample]] copies + fractional-draw contract (`epoch` is
    * the 0-based copy index). Unlike [[mixtureSample]] the recipe is
    * COMPUTED from the corpus, not handed in — this is the operator a
    * pipeline runs when the recipe is "balance what we crawled", not
    * "match this spec sheet".
    *
    * Scale shape: one map-side-combined count per group (tens of rows),
    * a 1-row max cross-joined onto it, and the recipe broadcasts back —
    * the corpus pays a per-row filter plus a bounded `explode`, no
    * data-sized shuffle anywhere. Every double step (count→double cast,
    * one divide, one sqrt, one multiply, floor) is correctly rounded,
    * and the SQL oracle mirrors the exact op order. */
  def temperatureSample(df: DataFrame, keyCol: String, groupCol: String,
      headRate: Double): DataFrame = {
    require(headRate > 0 && headRate <= 1.0 && headRate.isFinite,
      s"headRate must be in (0, 1], got $headRate")
    val counts = df.groupBy(col(groupCol).as("mix_group")).count()
    val nMax = counts.agg(max(col("count")).as("n_max"))
    val twoPow60 = lit((1L << 60).toDouble)
    val recipe = counts.crossJoin(broadcast(nMax))
      .withColumn("mix_rate", lit(headRate) *
        sqrt(col("n_max").cast(DoubleType) / col("count").cast(DoubleType)))
      .withColumn("mix_copies", floor(col("mix_rate")).cast(LongType))
      .withColumn("mix_frac_threshold",
        floor((col("mix_rate") - floor(col("mix_rate"))) * twoPow60)
          .cast(LongType))
      .select("mix_group", "mix_copies", "mix_frac_threshold")
    df.join(broadcast(recipe), col(groupCol) === col("mix_group"))
      .withColumn("mix_n", col("mix_copies") +
        when(hashKey(col(keyCol)) < col("mix_frac_threshold"), 1L)
          .otherwise(0L))
      .filter(col("mix_n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("mix_n") - 1)))
      .drop("mix_group", "mix_copies", "mix_frac_threshold", "mix_n")
  }

  /** EXPORT MANIFEST — the reproducibility receipt of a data release:
    * per shard (same `md5_60 mod nShards` assignment as
    * [[shardAssign]]), the row and token counts, the key range, and
    * two ORDER-INDEPENDENT checksums — `bit_xor` of the key hashes
    * (membership: any added/dropped row flips it) and `bit_xor` of the
    * (key, content) hashes (integrity: any edited byte flips it).
    * Re-exporting on a different cluster, partitioning, or engine must
    * reproduce this table bit-for-bit, or the release differs — the
    * check a training run does before trusting a dataset snapshot.
    *
    * XOR is the right fold at scale: commutative/associative (so
    * map-side combinable and mergeable across shards or days like
    * every sketch in the family), no overflow, no ordering contract.
    * Its known blind spot — a row included TWICE cancels out — is
    * inherited deliberately: keys are unique in a release (the PK
    * audit is [[graft.queries.Warehouse.pkViolations]]'s job).
    *
    * Scale shape: one map-combined groupBy on the shard id; the
    * content hash is computed inside the scan; nothing else moves. */
  def exportManifest(df: DataFrame, keyCol: String, textCol: String,
      nShards: Int = 8): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.select(col(keyCol).cast(LongType).as("k"),
        pmod(hashKey(col(keyCol)), lit(nShards.toLong)).as("shard"),
        hashKey(col(keyCol)).as("hk"),
        Dedup.md5_60(concat(col(keyCol).cast(StringType), lit(":"),
          col(textCol))).as("hc"),
        TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("ntok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        min(col("k")).as("key_min"),
        max(col("k")).as("key_max"),
        expr("bit_xor(hk)").as("key_checksum"),
        expr("bit_xor(hc)").as("content_checksum"))
  }
}
