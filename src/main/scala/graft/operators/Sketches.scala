package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable-sketch lifecycle — the 100 TB answer to distinct counting.
  *
  * An exact `countDistinct` re-shuffles every raw key for every grain it
  * is asked at; a MERGEABLE sketch is aggregated once at the finest
  * grain and every coarser rollup unions the pre-aggregated sketches —
  * the raw keys never travel again. That algebra (register-wise max for
  * HLL) is associative and commutative, so daily sketches can live next
  * to the daily partition files and ANY later question — weekly uniques,
  * monthly uniques, overlap between two periods — is a union over a few
  * hundred kilobytes instead of a scan over terabytes. Spark's built-in
  * DataSketches HLL functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_union` / `hll_sketch_estimate`) are deterministic: the same key
  * set yields the same registers under any partitioning or order, so
  * estimates are reproducible (though their VALUES are not
  * DuckDB-expressible — the estimate surface is spec-locked via the
  * accuracy and merge-identity contracts, while the registry gates run
  * the [[distinctRollupAudit]]/[[overlapAudit]] forms, whose exact
  * columns and estimate-accuracy verdicts an exact-count oracle CAN
  * reproduce).
  */
object Sketches {

  /** One timestamp-normalization rule for the whole engine — see
    * [[graft.queries.TimeSeries.epochSeconds]] for the NTZ rationale. */
  private def epochS(c: Column): Column =
    graft.queries.TimeSeries.epochSeconds(c)

  /** Daily HLL sketches unioned to a weekly distinct-user rollup.
    * Returns one row per week: the union estimate, the sum of the daily
    * estimates (the double-counting a naive sum commits — the gap IS
    * the cross-day repeat audience), and the day count. The plan
    * aggregates raw keys ONCE (day grain); the weekly union shuffles
    * |days| sketch blobs. `lgK` = 12 (4 KiB registers, ~1.6 % rse). */
  def distinctRollup(df: DataFrame, ts: String, key: String,
      lgK: Int = 12): DataFrame = {
    val day = (epochS(col(ts)) - pmod(epochS(col(ts)), lit(86400L)))
      .as("day_s")
    val daily = df
      .groupBy(day)
      .agg(hll_sketch_agg(col(key), lit(lgK)).as("sk"))
    daily
      .groupBy((col("day_s") - pmod(col("day_s"), lit(604800L)))
        .as("week_s"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
          .as("est_users"),
        sum(hll_sketch_estimate(col("sk"))).as("sum_daily_est"),
        count(lit(1)).as("n_days"))
  }

  /** Audience overlap between the first and second half of the time
    * range via sketch ALGEBRA: |A∩B| ≈ est(A) + est(B) − est(A∪B),
    * with all three sketches built in ONE pass (conditional aggregates
    * — a null key never updates a sketch) and the union a scalar
    * `hll_union` of the two blobs. One row out; the raw keys shuffle
    * once, to a single tiny group. The same shape prices
    * new-vs-returning questions at any scale without a self-join. */
  def overlapEstimate(df: DataFrame, ts: String, key: String,
      lgK: Int = 12): DataFrame = {
    val bounds = df.agg(
      min(epochS(col(ts))).as("lo_s"), max(epochS(col(ts))).as("hi_s"))
    df.crossJoin(broadcast(bounds))
      .withColumn("late",
        epochS(col(ts)) >= expr("(lo_s + hi_s) div 2"))
      .agg(
        hll_sketch_agg(when(!col("late"), col(key)), lit(lgK)).as("sk_a"),
        hll_sketch_agg(when(col("late"), col(key)), lit(lgK)).as("sk_b"))
      .select(
        hll_sketch_estimate(col("sk_a")).as("est_first"),
        hll_sketch_estimate(col("sk_b")).as("est_second"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .as("est_union"))
      .withColumn("est_overlap",
        col("est_first") + col("est_second") - col("est_union"))
      .withColumn("est_new",
        col("est_union") - col("est_first"))
  }

  /** SKETCH-ACCURACY AUDIT of [[distinctRollup]] — the small-scale dress
    * rehearsal a pipeline runs before trusting HLL estimates at 100 TB:
    * per week, the EXACT distinct-user count, the exact naive daily sum
    * (its gap from `exact_users` is the cross-day repeat audience), the
    * day count, and the verdict `est_within_5pct` — whether the lgK=12
    * union estimate landed within 5 % of truth (integer test
    * `20·|est − exact| ≤ exact`, no double compare). The estimate
    * itself never leaves the sketch domain, so every output column is
    * reproducible by an exact-count engine — which is precisely what
    * lets a DuckDB oracle gate the sketch lifecycle end to end: a
    * broken sketch flips the verdict column.
    *
    * Scale shape: the exact weekly arm is the audit's own cost (raw
    * keys shuffle at week grain — affordable at audit scale, and the
    * reason production rollups use [[distinctRollup]] alone); the
    * sketch arm still aggregates raw keys once at day grain. */
  def distinctRollupAudit(df: DataFrame, ts: String, key: String,
      lgK: Int = 12): DataFrame = {
    val withDay = df.select(
      (epochS(col(ts)) - pmod(epochS(col(ts)), lit(86400L))).as("day_s"),
      col(key).as("k"))
    val daily = withDay.groupBy(col("day_s"))
      .agg(hll_sketch_agg(col("k"), lit(lgK)).as("sk"),
        countDistinct(col("k")).as("exact_daily"))
    val weekOf = (c: Column) => c - pmod(c, lit(604800L))
    val weekly = daily.groupBy(weekOf(col("day_s")).as("week_s"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
          .as("est"),
        sum(col("exact_daily")).as("sum_daily_exact"),
        count(lit(1)).as("n_days"))
    val exact = withDay.groupBy(weekOf(col("day_s")).as("week_s"))
      .agg(countDistinct(col("k")).as("exact_users"))
    weekly.join(exact, Seq("week_s"))
      .select(col("week_s"), col("exact_users"), col("sum_daily_exact"),
        col("n_days"),
        (abs(col("est") - col("exact_users")) * lit(20L) <=
          col("exact_users")).as("est_within_5pct"))
  }

  /** SKETCH-ACCURACY AUDIT of [[overlapEstimate]] — exact first/second
    * half audiences, exact union and inclusion-exclusion overlap, plus
    * the sketch verdicts: each direct estimate within 5 % of its exact
    * counterpart (`20·|est − exact| ≤ exact`) and the compounded
    * overlap estimate within the documented error budget
    * `|est − exact| ≤ max(2, union/10)` (three estimates stack error,
    * so the overlap bound is keyed to the key-space size, not the —
    * possibly tiny — overlap itself; integer form
    * `10·|est − exact| ≤ max(20, union)`). One row; all exact columns
    * reproducible by an exact-count oracle, so the gate fails iff the
    * sketch algebra drifts. */
  def overlapAudit(df: DataFrame, ts: String, key: String,
      lgK: Int = 12): DataFrame = {
    val bounds = df.agg(
      min(epochS(col(ts))).as("lo_s"), max(epochS(col(ts))).as("hi_s"))
    val flagged = df.crossJoin(broadcast(bounds))
      .select(col(key).as("k"),
        (epochS(col(ts)) >= expr("(lo_s + hi_s) div 2")).as("late"))
    val exact = flagged.select(col("late"), col("k")).distinct()
      .agg(
        sum(when(!col("late"), lit(1L)).otherwise(lit(0L)))
          .as("exact_first"),
        sum(when(col("late"), lit(1L)).otherwise(lit(0L)))
          .as("exact_second"),
        countDistinct(col("k")).as("exact_union"))
      .withColumn("exact_overlap",
        col("exact_first") + col("exact_second") - col("exact_union"))
    val est = flagged
      .agg(
        hll_sketch_agg(when(!col("late"), col("k")), lit(lgK)).as("sk_a"),
        hll_sketch_agg(when(col("late"), col("k")), lit(lgK)).as("sk_b"))
      .select(
        hll_sketch_estimate(col("sk_a")).as("est_first"),
        hll_sketch_estimate(col("sk_b")).as("est_second"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .as("est_union"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_first"), col("exact_second"), col("exact_union"),
        col("exact_overlap"),
        (abs(col("est_first") - col("exact_first")) * lit(20L) <=
          col("exact_first")).as("est_first_ok"),
        (abs(col("est_second") - col("exact_second")) * lit(20L) <=
          col("exact_second")).as("est_second_ok"),
        (abs(col("est_union") - col("exact_union")) * lit(20L) <=
          col("exact_union")).as("est_union_ok"),
        (abs(col("est_first") + col("est_second") - col("est_union") -
          col("exact_overlap")) * lit(10L) <=
          greatest(lit(20L), col("exact_union")))
          .as("overlap_err_bounded"))
  }

  /** Count-min sketch with FULLY PORTABLE hashing — unlike HLL (whose
    * register blobs are engine-internal), every number this operator
    * emits is bit-reproducible by any engine that can compute md5:
    * bucket `i` of key `k` is `md5_60(i ':' k) mod width`, the same
    * engine-portable primitive the minhash family uses
    * ([[graft.functions.MinHashImpl.md5_60]]), so the ESTIMATES
    * themselves — not just accuracy verdicts — are exact-oracle-gated.
    *
    * Shape: one `groupBy (row, bucket)` pass over `depth × N` exploded
    * rows builds the sketch — map-side combine collapses each partition
    * to at most `depth·width` partial counters (2 048 longs at the
    * defaults), so the shuffle is O(partitions), not O(N). The probe
    * side takes the exact top-`topK` keys (TakeOrderedAndProject — no
    * global sort) and joins them against the broadcast sketch; the
    * estimate is the classic row-wise MIN of the `depth` counters.
    * `cms_est ≥ exact_n` always (counters only ever overcount) — the
    * deterministic half of the CMS guarantee — and `overestimate` is
    * the realized collision mass, the quantity the probabilistic
    * `ε = e/width` bound caps in expectation.
    *
    * At 100 TB the sketch is the POINT: `depth·width` longs summarize
    * any count column, are mergeable across partitions/days by plain
    * addition (the same algebra [[distinctRollup]] exploits for HLL),
    * and answer point-frequency queries without re-scanning. */
  def countMinAudit(df: DataFrame, key: String, topK: Int = 10,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val rowIds = array((0 until depth).map(lit): _*)
    val bucket = (i: Column, k: Column) => pmod(
      Dedup.md5_60(concat(i.cast(StringType), lit(":"), k)),
      lit(width.toLong))
    val keyed = df.select(col(key).cast(StringType).as("k"))
    val cms = keyed
      .select(col("k"), explode(rowIds).as("i"))
      .groupBy(col("i"), bucket(col("i"), col("k")).as("b"))
      .agg(count(lit(1)).as("c"))
    val top = keyed.groupBy(col("k")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("k")).limit(topK)
    top
      .select(col("k"), col("exact_n"), explode(rowIds).as("i"))
      .withColumn("b", bucket(col("i"), col("k")))
      .join(broadcast(cms), Seq("i", "b"))
      .groupBy(col("k"), col("exact_n"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("k").as("key"), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("overestimate"),
        (col("cms_est") >= col("exact_n")).as("never_underestimates"))
  }

  /** Portable BLOOM FILTER audit — the membership member of the
    * mergeable-sketch family (distinct → HLL, frequency → CMS,
    * quantiles → GK, membership → Bloom), with the same md5-portable
    * bucket recipe as [[countMinAudit]]: bit `i` of key `k` is
    * `md5_60(i ':' k) mod mBits`, so the realized filter — and
    * therefore every membership answer — is bit-reproducible by an
    * exact oracle. (The engine's `q_j4_bloom_screen` uses Spark's
    * native bloom for the JOIN path; this audit form is the
    * cross-engine-checkable twin that prices the configuration.)
    *
    * Build: the set bit positions are `distinct (i, bit)` pairs over
    * `depth × distinct-keys` — map-combined, at most `depth·mBits`
    * rows survive (tiny), broadcast to the probe side. Probes are
    * `nProbes` synthetic NON-members (`key offset + p`); a probe is a
    * false positive iff all `depth` of its bits are set. Output: one
    * row — member recall is exact 1.0 by construction (every true
    * key's bits are set — the deterministic half of the Bloom
    * contract), plus the realized false-positive count/rate among the
    * non-member probes, the quantity the `(1−e^{−dn/m})^d` formula
    * caps in expectation. */
  def bloomAudit(df: DataFrame, key: String, depth: Int = 4,
      mBits: Int = 4096, nProbes: Int = 1000,
      probeOffset: Long = 1000000L): DataFrame = {
    val rowIds = array((0 until depth).map(lit): _*)
    val bit = (i: Column, k: Column) => pmod(
      Dedup.md5_60(concat(i.cast(StringType), lit(":"), k)),
      lit(mBits.toLong))
    val keys = df.select(col(key).cast(LongType).as("k")).distinct()
    val bits = keys
      .select(col("k"), explode(rowIds).as("i"))
      .select(col("i"), bit(col("i"), col("k").cast(StringType)).as("b"))
      .distinct()
    val nKeys = keys.agg(count(lit(1)).as("n_keys"))
    val probes = df.sparkSession.range(0, nProbes)
      .select((col("id") + probeOffset).cast(LongType).as("p"))
    val hits = probes
      .select(col("p"), explode(rowIds).as("i"))
      .withColumn("b", bit(col("i"), col("p").cast(StringType)))
      .join(broadcast(bits), Seq("i", "b"), "left_semi")
      .groupBy(col("p")).agg(count(lit(1)).as("n_set"))
      // coalesce: zero probes matching ANY bit leaves the grouping
      // empty and a bare sum would surface NULL instead of 0
      .agg(coalesce(sum(when(col("n_set") === depth, 1L).otherwise(0L)),
        lit(0L)).as("n_false_positives"))
    val nBitsSet = bits.agg(count(lit(1)).as("n_bits_set"))
    hits.crossJoin(broadcast(nBitsSet)).crossJoin(broadcast(nKeys))
      .select(col("n_keys"), col("n_bits_set"),
        lit(nProbes.toLong).as("n_probes"), col("n_false_positives"),
        // load factor sanity: the filter is neither empty nor saturated
        (col("n_bits_set") > 0 &&
          col("n_bits_set") < lit(mBits.toLong)).as("not_saturated"))
  }

  /** SKETCH-ACCURACY AUDIT of `percentile_approx` (Spark's mergeable
    * Greenwald–Khanna quantile summary) against exact rank-selected
    * quantiles — the quantile twin of [[distinctRollupAudit]]. Per
    * group: `n` and the EXACT p50/p90/p99 (the k-th smallest value at
    * integer rank `⌈q·n⌉`, pure value selection — no interpolation
    * arithmetic, so the doubles are bit-identical across engines), plus
    * one verdict per quantile: does the approximate value's occupied
    * rank interval `(count(v<a), count(v≤a)]` intersect the promised
    * window `q·n ± (ε·n + 1)` with `ε = 1/accuracy`? The checks are
    * all-integer (scaled by `accuracy`), so the verdicts are exact; the
    * approximate VALUES never leave the audit (GK compression is
    * partitioning-dependent, so they are not stable — the verdict is).
    *
    * Shape: the sketch arm is one map-combined `groupBy` (each
    * partition ships an O(accuracy·log n) summary, not rows); the exact
    * arm pays a per-group sort — the audit's own cost, affordable at
    * audit scale and the reason production pipelines run the sketch arm
    * alone; the rank probe joins the tiny per-group approx row back by
    * broadcast and counts in one conditional-aggregate pass. */
  def quantileAudit(df: DataFrame, group: String, valueCol: String,
      accuracy: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(group).as("g"),
      col(valueCol).cast(DoubleType).as("v"))
    val approx = base.groupBy(col("g"))
      .agg(percentile_approx(col("v"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("ap"))
      .select(col("g"), col("ap")(0).as("a50"), col("ap")(1).as("a90"),
        col("ap")(2).as("a99"))
    val ranked = base
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("g"))))
    val exact = ranked.groupBy(col("g"), col("n")).agg(
      max(when(col("rn") === expr("(n + 1) div 2"), col("v")))
        .as("exact_p50"),
      max(when(col("rn") === expr("(9 * n + 9) div 10"), col("v")))
        .as("exact_p90"),
      max(when(col("rn") === expr("(99 * n + 99) div 100"), col("v")))
        .as("exact_p99"))
    val counted = base.join(broadcast(approx), Seq("g")).groupBy(col("g"))
      .agg(
        sum(when(col("v") < col("a50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("v") <= col("a50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("v") < col("a90"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("v") <= col("a90"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("v") < col("a99"), 1L).otherwise(0L)).as("lt99"),
        sum(when(col("v") <= col("a99"), 1L).otherwise(0L)).as("le99"))
    // rank window `q·n ± (ε·n + 1)` multiplied through by 1000·accuracy
    // (q carries per-mille precision, ε = 1/accuracy) — all-integer, so
    // the verdict is exact for ANY accuracy value
    val acc = lit(accuracy.toLong)
    val ok = (lt: Column, le: Column, qPerMille: Long) => {
      val target = acc * lit(qPerMille) * col("n")
      val slack = lit(1000L) * col("n") + lit(1000L) * acc
      (acc * lit(1000L) * lt <= target + slack) &&
        (acc * lit(1000L) * le >= target - slack)
    }
    exact.join(counted, Seq("g"))
      .select(col("g").as(group), col("n"),
        col("exact_p50"), col("exact_p90"), col("exact_p99"),
        ok(col("lt50"), col("le50"), 500L).as("p50_ok"),
        ok(col("lt90"), col("le90"), 900L).as("p90_ok"),
        ok(col("lt99"), col("le99"), 990L).as("p99_ok"))
  }

  /** THETA (KMV) SKETCH set algebra with FULLY PORTABLE hashing — the
    * member of the mergeable-sketch family the others can't replace:
    * HLL unions but cannot INTERSECT or DIFFERENCE; the theta sketch's
    * sample-below-threshold representation supports all three. Each
    * distinct key hashes to a uniform 60-bit value (`md5_60`, the same
    * engine-portable primitive as CMS/Bloom/minhash); a set's sketch is
    * its `k` smallest hashes and `theta` = the k-th smallest (or 2⁶⁰
    * when the set is smaller than k, where every estimate collapses to
    * the exact count). Estimates: `|S| ≈ (k−1)/(theta/2⁶⁰)`; for set
    * ops the two sketches agree on the window `thetaAB = min(theta_a,
    * theta_b)` and `|A∘B| ≈ n_∘ / (thetaAB/2⁶⁰)` where `n_∘` counts
    * sampled hashes below thetaAB in the composed set — the classic
    * theta-sketch estimator. Because every hash is md5-reproducible,
    * the thetas, sample counts AND double estimates are bit-exact in
    * any engine — the estimates themselves are oracle-gated, like CMS
    * and unlike the engine-internal HLL registers.
    *
    * The audit splits the key set into first/second time-range halves
    * (same split as [[overlapAudit]]) and emits exact counts, thetas,
    * and estimates for each side, the union, the intersection, and
    * A∖B.
    *
    * Scale shape: one distinct-key pass (map-combined groupBy) carries
    * both membership flags and the hash; each theta is an
    * `orderBy(h).limit(k)` (TakeOrderedAndProject — k rows cross the
    * wire, no global sort); sample counts are one filtered aggregate
    * against the broadcast 1-row theta frame. At 100 TB the sketch IS
    * the point: k longs per set, mergeable by keep-k-smallest, and the
    * intersection of two corpora is estimated without ever joining
    * them. */
  def thetaAudit(df: DataFrame, ts: String, key: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k=$k")
    val M = 1L << 60
    val bounds = df.agg(
      min(epochS(col(ts))).as("lo_s"), max(epochS(col(ts))).as("hi_s"))
    val flagged = df.crossJoin(broadcast(bounds))
      .select(col(key).cast(StringType).as("k"),
        (epochS(col(ts)) >= expr("(lo_s + hi_s) div 2")).as("late"))
    val keys = flagged.groupBy(col("k")).agg(
        max(when(!col("late"), lit(1L)).otherwise(0L)).as("in_a"),
        max(when(col("late"), lit(1L)).otherwise(0L)).as("in_b"))
      .select(col("in_a"), col("in_b"), Dedup.md5_60(col("k")).as("h"))
      .persist()
    def nTheta(side: DataFrame, n: String, th: String): DataFrame = {
      val cnt = side.agg(count(lit(1)).as(n))
      val kth = side.orderBy(col("h")).limit(k).agg(max(col("h")).as("mx"))
      cnt.crossJoin(broadcast(kth))
        .select(col(n),
          when(col(n) < k, lit(M)).otherwise(col("mx")).as(th))
    }
    val a = nTheta(keys.filter(col("in_a") === 1L), "n_a", "th_a")
    val b = nTheta(keys.filter(col("in_b") === 1L), "n_b", "th_b")
    val u = nTheta(keys, "n_u", "th_u")
    val thetas = a.crossJoin(broadcast(b)).crossJoin(broadcast(u))
      .withColumn("th_ab", least(col("th_a"), col("th_b")))
    val samples = keys.crossJoin(broadcast(thetas))
      .agg(
        sum(when(col("in_a") === 1L && col("in_b") === 1L &&
          col("h") < col("th_ab"), 1L).otherwise(0L)).as("n_common"),
        sum(when(col("in_a") === 1L && col("in_b") === 0L &&
          col("h") < col("th_ab"), 1L).otherwise(0L)).as("n_diff"),
        sum(col("in_a") * col("in_b")).as("exact_overlap"))
    val mD = M.toDouble
    val est = (n: Column, th: Column) =>
      when(n < k, n.cast(DoubleType))
        .otherwise(lit((k - 1).toDouble) / (th.cast(DoubleType) / mD))
    thetas.crossJoin(broadcast(samples)).select(
      col("n_a").as("exact_first"), col("n_b").as("exact_second"),
      col("n_u").as("exact_union"), col("exact_overlap"),
      col("th_a").as("theta_first"), col("th_b").as("theta_second"),
      col("th_u").as("theta_union"),
      est(col("n_a"), col("th_a")).as("est_first"),
      est(col("n_b"), col("th_b")).as("est_second"),
      est(col("n_u"), col("th_u")).as("est_union"),
      (col("n_common").cast(DoubleType) /
        (col("th_ab").cast(DoubleType) / mD)).as("est_overlap"),
      (col("n_diff").cast(DoubleType) /
        (col("th_ab").cast(DoubleType) / mD)).as("est_diff_ab"))
  }
}
