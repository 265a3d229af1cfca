package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classical hypothesis-test statistics as distributed one-pass plans —
  * the battery a data/feature-quality review runs before trusting a
  * column: is a categorical feature independent of the label (chi²)?
  * Do group means differ (ANOVA F, Welch t)? Do two cohorts draw from
  * the same distribution (Mann-Whitney U)? Is a monotone association
  * present (Spearman ρ)? The reference engine exposes raw
  * aggregate/filter surfaces (SURVEY §2 A-family) and leaves inference
  * to the client; at 100 TB the sufficient statistics must reduce
  * distributively, which is exactly how every operator here is built:
  * map-combined integer/decimal sufficient statistics first, ONE final
  * double combination at the output boundary.
  *
  * Numeric determinism (registry conventions): counts and rank sums
  * are BIGINTs; value sums go through fixed-scale decimals
  * (double→decimal casts round HALF_UP identically in Spark and
  * DuckDB); every decimal that later becomes a double is sized so the
  * scaled integer stays under 2⁵³ (exact conversion); the only
  * transcendental is `sqrt`, which IEEE 754 specifies as correctly
  * rounded in both engines. No `ln`/`exp`/`pow` anywhere — those are
  * libm-dependent and NOT cross-engine stable.
  */
object Stats {

  /** CHI-SQUARED INDEPENDENCE TEST between two categorical columns —
    * the contingency-table statistic behind "is this feature
    * independent of that label". Uses the algebraic identity
    * `chi² = N·(S − 1)` with `S = Σ_observed o²/(r·c)`, which needs
    * only the OBSERVED cells (absent cells contribute their expected
    * mass through the `−N` term), so the plan never materializes the
    * full |X|·|Y| grid. Also reports Cramér's V (`sqrt(chi²/(N·min(r−1,
    * c−1)))`), the [0,1] effect size.
    *
    * Exactness: o², r·c are exact BIGINTs (each < 2⁵³ for o, r, c up
    * to ~9·10⁷ rows per margin — rescale/bucket above that); each
    * cell's `o²/(r·c)` is ONE double division quantized via a
    * double→DECIMAL(38,8) cast (rounds identically cross-engine), the
    * decimal SUM is exact, and `S ≤ min(|X|,|Y|)` keeps the final
    * decimal→double conversion inside the 2⁵³ window.
    *
    * Scale shape: three map-combined aggregates over one base pass
    * (cells + two marginals), two joins of the cell frame against the
    * BROADCAST marginal frames, one scalar rollup. Cell cardinality is
    * |X|·|Y| at worst — bucket continuous columns first, as the
    * registry query does. */
  def chiSquareIndependence(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val tot = base.agg(count(lit(1)).as("n"))
    val cx = base.groupBy(col("x")).agg(count(lit(1)).as("n_x"))
    val cy = base.groupBy(col("y")).agg(count(lit(1)).as("n_y"))
    val cxy = base.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_xy"))
    val cells = cxy.join(broadcast(cx), Seq("x"))
      .join(broadcast(cy), Seq("y"))
      .withColumn("term",
        ((col("n_xy") * col("n_xy")).cast(DoubleType) /
          (col("n_x") * col("n_y")).cast(DoubleType))
          .cast(DecimalType(38, 8)))
    val s = cells.agg(count(lit(1)).as("n_cells"),
      sum(col("term")).as("s_q"))
    val rx = cx.agg(count(lit(1)).as("n_x_values"))
    val ry = cy.agg(count(lit(1)).as("n_y_values"))
    tot.crossJoin(broadcast(s)).crossJoin(broadcast(rx))
      .crossJoin(broadcast(ry))
      .withColumn("dof",
        (col("n_x_values") - 1L) * (col("n_y_values") - 1L))
      .withColumn("chi2",
        when(col("dof") > 0L,
          col("n").cast(DoubleType) *
            (col("s_q").cast(DoubleType) - lit(1.0))))
      .withColumn("cramers_v",
        when(col("dof") > 0L,
          sqrt(greatest(col("chi2"), lit(0.0)) /
            (col("n").cast(DoubleType) *
              least(col("n_x_values") - 1L, col("n_y_values") - 1L)
                .cast(DoubleType)))))
      .select(col("n").as("n_rows"), col("n_cells"),
        col("n_x_values"), col("n_y_values"), col("dof"),
        col("chi2"), col("cramers_v"))
  }

  /** ONE-WAY ANOVA — the F statistic for "do the group means of this
    * measure differ", plus the η² effect size (share of variance the
    * grouping explains). Built entirely from per-group sufficient
    * statistics `(n_g, Σx, Σx²)`, so it reduces map-side like any
    * grouped sum.
    *
    * Exactness ladder: `x` is quantized once via a double→DECIMAL(18,4)
    * cast; Σx sums exactly in decimal and converts exactly to double
    * (scaled value < 2⁵³ up to ~9·10¹¹ value-units per group); `x²` is
    * one double multiply of the EXACT decimal→double image, quantized
    * double→DECIMAL(38,4) so the corpus-wide Σx² stays inside the 2⁵³
    * window at scale 4 (the r10 covariance rule); the between-group
    * mass `Σ S_g²/n_g` quantizes each group's single double division
    * at scale 4. Everything after the three exact decimal→double
    * conversions is a fixed-order double expression both engines
    * evaluate identically.
    *
    * Scale shape: one map-combined groupBy (k rows out), one scalar
    * rollup over k rows. No window, no join, no shuffle beyond the
    * grouped aggregate. */
  def anovaF(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        col(valueCol).cast(DecimalType(18, 4)).as("xq"))
      .withColumn("xd", col("xq").cast(DoubleType))
      .withColumn("x2q",
        (col("xd") * col("xd")).cast(DecimalType(38, 4)))
    val per = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("xq")).as("s_g"),
        sum(col("x2q")).as("q_g"))
      .withColumn("term",
        ((col("s_g").cast(DoubleType) * col("s_g").cast(DoubleType)) /
          col("n_g").cast(DoubleType)).cast(DecimalType(38, 4)))
    per.agg(count(lit(1)).as("k"),
        sum(col("n_g")).as("n_rows"),
        sum(col("s_g")).as("t_sum"),
        sum(col("q_g")).as("q_sum"),
        sum(col("term")).as("b_sum"))
      .withColumn("ss_between",
        col("b_sum").cast(DoubleType) -
          (col("t_sum").cast(DoubleType) * col("t_sum").cast(DoubleType)) /
            col("n_rows").cast(DoubleType))
      .withColumn("ss_within",
        col("q_sum").cast(DoubleType) - col("b_sum").cast(DoubleType))
      .withColumn("f_stat",
        when(col("k") > 1L && col("n_rows") > col("k") &&
            col("ss_within") > 0.0,
          (col("ss_between") / (col("k") - 1L).cast(DoubleType)) /
            (col("ss_within") /
              (col("n_rows") - col("k")).cast(DoubleType))))
      .withColumn("eta_sq",
        when(col("ss_between") + col("ss_within") > 0.0,
          col("ss_between") /
            (col("ss_between") + col("ss_within"))))
      .select(col("n_rows"), col("k"), col("ss_between"),
        col("ss_within"), col("f_stat"), col("eta_sq"))
  }

  /** SPEARMAN RANK CORRELATION between two integer-valued columns of a
    * keyed frame — the monotone-association statistic robust to
    * outliers and nonlinearity (Pearson on average ranks, the
    * tie-correct definition). Doubled average ranks keep everything
    * integer: for a value with competition rank r and multiplicity t,
    * `2·avg_rank = 2·r + t − 1`, and since average ranks always sum to
    * n(n+1)/2 the doubled centered rank `d = 2·avg_rank − (n+1)` has
    * exactly zero mean — ρ = Σd_x·d_y / sqrt(Σd_x²·Σd_y²) needs no
    * n-scaling, keeping every sum inside BIGINT up to n ≈ 10⁶ keys
    * (Σd² ≤ n³; shard beyond that).
    *
    * Scale shape: ranks come from the DISTINCT-VALUE frame (groupBy
    * value → multiplicity, one cumulative window over |distinct| rows,
    * broadcast-joined back), never from a global per-row window — the
    * single-partition step is bounded by value cardinality, not row
    * count. Two map-combined aggregates, two broadcast joins, one
    * scalar rollup. */
  def spearmanCorr(df0: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    // pairwise-complete rows only (the sibling tests' convention):
    // a null x or y would inflate n_tot and shift the distinct-value
    // cumulative ranks while being dropped by the rank joins, silently
    // biasing rho — filter once, before counts AND ranks.
    val df = df0.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    def ranks2(c: String): DataFrame = {
      val dv = df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      dv.withColumn("cum_before",
          coalesce(sum(col("cnt")).over(w), lit(0L)))
        .select(col("v"),
          (lit(2L) * col("cum_before") + col("cnt") + 1L).as("r2"))
    }
    val tot = df.agg(count(lit(1)).as("n_tot"))
    val joined = df
      .join(broadcast(ranks2(xCol)).withColumnRenamed("r2", "rx2"),
        df(xCol) === col("v")).drop("v")
      .join(broadcast(ranks2(yCol)).withColumnRenamed("r2", "ry2"),
        df(yCol) === col("v")).drop("v")
      .crossJoin(broadcast(tot))
      .withColumn("dx", col("rx2") - (col("n_tot") + 1L))
      .withColumn("dy", col("ry2") - (col("n_tot") + 1L))
    joined.agg(count(lit(1)).as("n_rows"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .withColumn("rho",
        when(col("sxx") > 0L && col("syy") > 0L,
          col("sxy").cast(DoubleType) /
            sqrt(col("sxx").cast(DoubleType) *
              col("syy").cast(DoubleType))))
      .select(col("n_rows"), col("sxy"), col("sxx"), col("syy"),
        col("rho"))
  }

  /** MANN-WHITNEY U TEST — "do these two cohorts draw their values
    * from the same distribution", the rank test that needs no
    * normality assumption. Doubled tie-average rank sums keep the
    * statistic integer: `2U_A = 2R_A − n_A(n_A+1)` is an exact BIGINT,
    * as is the tie-correction mass `Σ(t³ − t)`. Reports both doubled
    * U's, the tie-corrected normal z (exact-integer inputs, fixed-order
    * double combination, one sqrt), and the rank-biserial effect size
    * `(2U_A − 2U_B)/(2·n_A·n_B)`.
    *
    * Scale shape: the same distinct-value rank trick as
    * [[spearmanCorr]] — per-value counts (map-combined), one
    * cumulative window over the |distinct values| frame, one scalar
    * rollup. Nothing per-row ever enters a window. */
  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val base = df
      .filter(col(valueCol).isNotNull &&
        col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
    val dv = base.groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"),
        count(when(col("g") === groupA, 1)).as("cnt_a"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = dv.withColumn("cum_before",
        coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("r2",
        lit(2L) * col("cum_before") + col("cnt") + 1L)
    val agg = ranked.agg(
      sum(col("cnt_a")).as("n_a"),
      sum(col("cnt") - col("cnt_a")).as("n_b"),
      sum(col("cnt_a") * col("r2")).as("r2_a"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt"))
        .as("tie_cubes"))
    agg
      .withColumn("u2_a",
        col("r2_a") - col("n_a") * (col("n_a") + 1L))
      .withColumn("u2_b",
        lit(2L) * col("n_a") * col("n_b") - col("u2_a"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("var_u",
        when(col("n") > 1L,
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType) /
            lit(12.0)) *
            ((col("n").cast(DoubleType) + lit(1.0)) -
              col("tie_cubes").cast(DoubleType) /
                (col("n").cast(DoubleType) *
                  (col("n").cast(DoubleType) - lit(1.0))))))
      .withColumn("z_stat",
        when(col("var_u") > 0.0,
          (col("u2_a").cast(DoubleType) -
            col("n_a").cast(DoubleType) *
              col("n_b").cast(DoubleType)) /
            (lit(2.0) * sqrt(col("var_u")))))
      .withColumn("rank_biserial",
        when(col("n_a") > 0L && col("n_b") > 0L,
          (col("u2_a") - col("u2_b")).cast(DoubleType) /
            (lit(2.0) * col("n_a").cast(DoubleType) *
              col("n_b").cast(DoubleType))))
      .select(col("n_a"), col("n_b"), col("u2_a"), col("u2_b"),
        col("tie_cubes"), col("z_stat"), col("rank_biserial"))
  }

  /** WALD–WOLFOWITZ RUNS TEST — is a sequence random, or does it
    * trend/oscillate? Signs are above/below the series' lower median
    * (ties at the median drop, the standard treatment); R = number of
    * sign runs; z compares R to its null mean `2·n₁·n₂/n + 1` with
    * the exact null variance. Too few runs → trending/clustered; too
    * many → oscillating. The randomness audit for any ordered series
    * (the registry feeds the daily value sums).
    *
    * Exactness: the median is the exact rank-selected lower median of
    * integer units; run boundaries come from one lag window; all
    * counts are BIGINTs and z is one fixed-order double expression.
    *
    * Scale shape: input is a PRE-AGGREGATED ordered series (days,
    * buckets) — the lag/cumulative windows run single-partition over
    * that bounded frame, same contract as [[kendallTauB]]. */
  def runsTest(df: DataFrame, orderCol: String,
      valueCol: String): DataFrame = {
    val base = df.select(col(orderCol).as("o"),
      col(valueCol).cast(LongType).as("v"))
    val dv = base.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = dv
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("cum") * 2L >= col("n"))
      .agg(min(col("v")).as("median_v"))
    val signed = base.crossJoin(broadcast(med))
      .filter(col("v") =!= col("median_v"))
      .withColumn("s", when(col("v") > col("median_v"), 1L)
        .otherwise(0L))
    val wSeq = Window.orderBy(col("o"))
    val runs = signed
      .withColumn("prev_s", lag(col("s"), 1).over(wSeq))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("s")).as("n_above"),
        (count(lit(1)) - sum(col("s"))).as("n_below"),
        (sum(when(col("prev_s").isNull ||
          col("prev_s") =!= col("s"), 1L).otherwise(0L)))
          .as("n_runs"))
    runs.crossJoin(broadcast(med))
      .withColumn("mu",
        when(col("n_kept") > 0L,
          lit(2.0) * col("n_above").cast(DoubleType) *
            col("n_below").cast(DoubleType) /
            col("n_kept").cast(DoubleType) + lit(1.0)))
      .withColumn("var_r",
        when(col("n_kept") > 1L,
          (lit(2.0) * col("n_above").cast(DoubleType) *
            col("n_below").cast(DoubleType) *
            (lit(2.0) * col("n_above").cast(DoubleType) *
              col("n_below").cast(DoubleType) -
              col("n_kept").cast(DoubleType))) /
            (col("n_kept").cast(DoubleType) *
              col("n_kept").cast(DoubleType) *
              (col("n_kept").cast(DoubleType) - lit(1.0)))))
      .withColumn("z_stat",
        when(col("var_r") > 0.0,
          (col("n_runs").cast(DoubleType) - col("mu")) /
            sqrt(col("var_r"))))
      .select(col("median_v"), col("n_kept"), col("n_above"),
        col("n_below"), col("n_runs"), col("z_stat"))
  }

  /** BROWN–FORSYTHE TEST (median-centered Levene) — do the groups
    * have equal VARIANCE? The robust spread-equality check that must
    * pass before a pooled-variance test is trusted (and a useful
    * heteroscedasticity alarm by itself). Transforms each value to
    * its absolute deviation from the GROUP MEDIAN (the
    * outlier-robust Brown–Forsythe choice), then runs the one-way
    * [[anovaF]] machinery on the deviations.
    *
    * Exactness: group medians are exact rank-selected lower medians
    * over the per-group distinct-value frames; `|x − med|` is one
    * double subtraction both engines evaluate identically, and the
    * rest is the anovaF decimal ladder. */
  def brownForsythe(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
    val dv = base.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val med = dv
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .filter(col("cum") * 2L >= col("n"))
      .groupBy(col("g")).agg(min(col("v")).as("med_g"))
    val z = base.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") - col("med_g")).as("z"))
    anovaF(z, "g", "z")
  }

  /** WILSON SCORE INTERVAL per group — the binomial proportion CI
    * that stays sane at small n and extreme p̂ (unlike the normal
    * approximation): center `(p̂ + z²/2n)/(1 + z²/n)`, half-width
    * `z·sqrt(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n)`, z = 1.96 (95%). The
    * closed-form complement to the Poisson-bootstrap band
    * ([[graft.operators.Bootstrap]]): exact, instant, but
    * binomial-only.
    *
    * Exactness: n and k are BIGINTs from one map-combined rollup; the
    * interval is ONE fixed-order double expression over their exact
    * conversions (z·z computed, never a rounded 3.8416 literal, so
    * both engines run the identical multiply; sqrt is IEEE-exact). */
  def wilsonInterval(df: DataFrame, groupCol: String,
      successCol: String): DataFrame = {
    val z = lit(1.96)
    val per = df.groupBy(col(groupCol).as(groupCol))
      .agg(count(lit(1)).as("n_trials"),
        count(when(col(successCol), 1)).as("n_success"))
      .withColumn("nd", col("n_trials").cast(DoubleType))
      .withColumn("p_hat",
        when(col("n_trials") > 0L,
          col("n_success").cast(DoubleType) / col("nd")))
    per
      .withColumn("denom", lit(1.0) + z * z / col("nd"))
      .withColumn("center",
        when(col("n_trials") > 0L,
          (col("p_hat") + z * z / (lit(2.0) * col("nd"))) /
            col("denom")))
      .withColumn("half",
        when(col("n_trials") > 0L,
          z * sqrt(col("p_hat") * (lit(1.0) - col("p_hat")) /
            col("nd") +
            z * z / (lit(4.0) * col("nd") * col("nd"))) /
            col("denom")))
      .select(col(groupCol), col("n_trials"), col("n_success"),
        col("p_hat"),
        (col("center") - col("half")).as("wilson_low"),
        (col("center") + col("half")).as("wilson_high"))
  }

  /** THEIL–SEN ROBUST SLOPE — the median of all pairwise slopes: the
    * trend estimate a 30%-outlier-contaminated series can't corrupt
    * (OLS breaks at one bad point; [[graft.queries.TimeSeries]]'s
    * linear trend is the OLS twin). Median = exact lower rank pick
    * over the fully tie-broken `(slope, x₁, x₂)` order.
    *
    * Exactness: each slope is ONE double division of exact integers
    * (`(y₂−y₁)/(x₂−x₁)`); double comparisons and the rank pick are
    * engine-identical. Scale contract: O(T²) pairs over a
    * PRE-AGGREGATED bounded series, same as [[kendallTauB]]. */
  def theilSenSlope(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast(LongType).as("x"),
      col(yCol).cast(LongType).as("y"))
    val pairs = base.as("a").crossJoin(base.as("b"))
      .filter(col("a.x") < col("b.x"))
      .select(col("a.x").as("x1"), col("b.x").as("x2"),
        ((col("b.y") - col("a.y")).cast(DoubleType) /
          (col("b.x") - col("a.x")).cast(DoubleType)).as("slope"))
    val w = Window.orderBy(col("slope"), col("x1"), col("x2"))
    val ranked = pairs
      .withColumn("rn", row_number().over(w).cast(LongType))
    val tot = pairs.agg(count(lit(1)).as("n_pairs"))
    ranked.crossJoin(broadcast(tot))
      .filter(col("rn") === expr("(n_pairs + 1L) div 2L"))
      .select(col("n_pairs"), col("slope").as("median_slope"))
  }

  /** KENDALL'S TAU-B — the pairwise-concordance rank correlation, the
    * third monotone-association read beside [[spearmanCorr]] (tau has
    * better small-sample behavior and a direct probabilistic meaning:
    * P(concordant) − P(discordant)). Tie-corrected tau-b:
    * `(C − D) / sqrt((n₀−n₁)(n₀−n₂))` with n₀ = n(n−1)/2 and n₁/n₂
    * the x/y tie-pair masses. All pair counts are exact BIGINTs from
    * ONE self-join; the only doubles are the final products (exact
    * int64→double conversions, IEEE multiply) under the sqrt.
    *
    * Scale shape: the self-join is O(n²) over the INPUT FRAME — this
    * operator is for pre-aggregated bounded series (a daily rollup, a
    * per-cohort summary), not raw rows; the registry query feeds the
    * ~30-row daily series. For unbounded keyed data use
    * [[spearmanCorr]], whose rank trick stays linear. */
  def kendallTauB(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(xCol).as("x"), col(yCol).as("y"))
    val tot = base.agg(count(lit(1)).as("n"))
    // full ordered cross product: every unordered pair appears twice
    // and every row pairs itself once, so each mass halves exactly
    val stats = base.as("a").crossJoin(base.as("b"))
      .agg(count(when(
          (col("a.x") < col("b.x") && col("a.y") < col("b.y")) ||
            (col("a.x") > col("b.x") && col("a.y") > col("b.y")),
          1)).as("conc2"),
        count(when(
          (col("a.x") < col("b.x") && col("a.y") > col("b.y")) ||
            (col("a.x") > col("b.x") && col("a.y") < col("b.y")),
          1)).as("disc2"),
        count(when(col("a.x") === col("b.x"), 1)).as("tx_sq"),
        count(when(col("a.y") === col("b.y"), 1)).as("ty_sq"))
    stats.crossJoin(broadcast(tot))
      .withColumn("n0", expr("n * (n - 1L) div 2L"))
      .withColumn("c_pairs", expr("conc2 div 2L"))
      .withColumn("d_pairs", expr("disc2 div 2L"))
      .withColumn("n1", expr("(tx_sq - n) div 2L"))
      .withColumn("n2", expr("(ty_sq - n) div 2L"))
      .withColumn("tau_b",
        when(col("n0") > col("n1") && col("n0") > col("n2"),
          (col("c_pairs") - col("d_pairs")).cast(DoubleType) /
            sqrt((col("n0") - col("n1")).cast(DoubleType) *
              (col("n0") - col("n2")).cast(DoubleType))))
      .select(col("n").as("n_rows"), col("n0").as("n_pairs"),
        col("c_pairs"), col("d_pairs"), col("n1").as("tie_x_pairs"),
        col("n2").as("tie_y_pairs"), col("tau_b"))
  }

  /** WELCH'S T-TEST — two-sample mean comparison WITHOUT the equal
    * variance assumption (the default any metrics review should use),
    * with the Welch–Satterthwaite degrees of freedom. Same sufficient
    * statistics and decimal ladder as [[anovaF]] (exact decimal Σx at
    * scale 4, quantized-double Σx² at scale 4), then one fixed-order
    * double expression: `t = (m₁−m₂)/sqrt(v₁/n₁ + v₂/n₂)`,
    * `df = se⁴ / (Σ (vᵢ/nᵢ)²/(nᵢ−1))`.
    *
    * Scale shape: one map-combined two-group aggregate, one scalar
    * combine. */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val base = df
      .filter(col(valueCol).isNotNull &&
        col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"),
        col(valueCol).cast(DecimalType(18, 4)).as("xq"))
      .withColumn("xd", col("xq").cast(DoubleType))
      .withColumn("x2q",
        (col("xd") * col("xd")).cast(DecimalType(38, 4)))
    val per = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("xq")).as("s_g"),
        sum(col("x2q")).as("q_g"))
      .withColumn("nd", col("n_g").cast(DoubleType))
      .withColumn("sd", col("s_g").cast(DoubleType))
      .withColumn("qd", col("q_g").cast(DoubleType))
      .withColumn("mean_g", col("sd") / col("nd"))
      .withColumn("var_g",
        when(col("n_g") > 1L,
          (col("qd") - col("sd") * col("sd") / col("nd")) /
            (col("nd") - lit(1.0))))
    val a = per.filter(col("g") === groupA)
      .select(col("n_g").as("n_a"), col("mean_g").as("mean_a"),
        col("var_g").as("var_a"))
    val b = per.filter(col("g") === groupB)
      .select(col("n_g").as("n_b"), col("mean_g").as("mean_b"),
        col("var_g").as("var_b"))
    a.crossJoin(broadcast(b))
      .withColumn("se_a", col("var_a") / col("n_a").cast(DoubleType))
      .withColumn("se_b", col("var_b") / col("n_b").cast(DoubleType))
      .withColumn("se2", col("se_a") + col("se_b"))
      .withColumn("t_stat",
        when(col("se2") > 0.0,
          (col("mean_a") - col("mean_b")) / sqrt(col("se2"))))
      .withColumn("df_welch",
        when(col("n_a") > 1L && col("n_b") > 1L && col("se2") > 0.0,
          (col("se2") * col("se2")) /
            (col("se_a") * col("se_a") /
              (col("n_a").cast(DoubleType) - lit(1.0)) +
              col("se_b") * col("se_b") /
                (col("n_b").cast(DoubleType) - lit(1.0)))))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("var_a"), col("var_b"), col("t_stat"), col("df_welch"))
  }

  /** ROC-AUC of a score against a binary label via the rank-statistic
    * identity `AUC = (R₁ − n₁(n₁+1)/2)/(n₁·n₀)` with R₁ the positive
    * class's midrank sum — the probability a random positive outscores
    * a random negative, ties worth ½. The classifier-eval companion to
    * [[mannWhitneyU]] (AUC is U/(n₁·n₀) with the same tie handling),
    * for grading any model-score column a curation pipeline keeps:
    * quality scores, langid confidence, contamination logits.
    *
    * Exactness: ranks come from the distinct-score rollup (`r2` = twice
    * the midrank, a BIGINT), so `auc2_num = 2·R₁ − n₁(n₁+1)` is an
    * exact BIGINT and AUC/Gini are ONE double division each. Scale
    * shape: one map-combined distinct-score aggregate, one cumulative
    * window over distinct scores (|scores| rows, not |df|), one scalar
    * rollup — the [[mannWhitneyU]] plan. */
  def rocAuc(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).as("v"),
        col(labelCol).cast(LongType).as("y"))
    val dv = base.groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("cnt_pos"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = dv.withColumn("cum_before",
        coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum_before") + col("cnt") + 1L)
    ranked.agg(
        sum(col("cnt_pos")).as("n_pos"),
        sum(col("cnt") - col("cnt_pos")).as("n_neg"),
        sum(col("cnt_pos") * col("r2")).as("r2_pos"))
      .withColumn("auc2_num",
        col("r2_pos") - col("n_pos") * (col("n_pos") + 1L))
      .withColumn("auc",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("auc2_num").cast(DoubleType) /
            (lit(2.0) * col("n_pos").cast(DoubleType) *
              col("n_neg").cast(DoubleType))))
      .withColumn("gini", when(col("auc").isNotNull,
        lit(2.0) * col("auc") - lit(1.0)))
      .select(col("n_pos"), col("n_neg"), col("auc2_num"),
        col("auc"), col("gini"))
  }

  /** ROBUST LOCATION/SPREAD PROFILE per group — exact lower median,
    * MAD (the lower median of absolute deviations), and the share of
    * rows beyond `k`·MAD: the outlier instrument that, unlike the
    * z-score profile, a single wild value cannot corrupt (breakdown
    * point ½ vs 0). MAD = 0 (majority-constant groups) flags every
    * deviating row — the honest degenerate answer, documented rather
    * than patched.
    *
    * Exactness: both medians are rank-SELECTED data values, residuals
    * single IEEE subtractions, the `k`·MAD threshold ONE double
    * multiply — cross-engine identical; counts are BIGINTs and the
    * share one final division. Scale shape: two per-group rank
    * windows (no global sort), the (center, mad) table broadcast back,
    * one map-combined rollup — the [[conformalInterval]] plan. */
  def madProfile(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
    val med = base
      .withColumn("rn", row_number().over(wv).cast(LongType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("g"), col("v").as("center"), col("n"))
    val resid = base.join(broadcast(med), Seq("g"))
      .withColumn("resid", abs(col("v") - col("center")))
    val wr = Window.partitionBy(col("g")).orderBy(col("resid"))
    val mad = resid
      .withColumn("rn", row_number().over(wr).cast(LongType))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("g"), col("center"), col("n"), col("resid").as("mad"))
    resid.select(col("g"), col("resid"))
      .join(broadcast(mad), Seq("g"))
      .groupBy(col("g").as(groupCol))
      .agg(max(col("n")).as("n"),
        max(col("center")).as("center"),
        max(col("mad")).as("mad"),
        sum(when(col("resid") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_share",
        col("n_outliers").cast(DoubleType) / col("n").cast(DoubleType))
  }

  /** SPLIT-CONFORMAL PREDICTION INTERVAL per group: calibration rows
    * (`splitCol` true) center each group at their exact lower median
    * and rank their absolute residuals; `q̂` is the ⌈(n+1)(1−α)⌉-th
    * smallest calibration residual (the finite-sample-valid conformal
    * quantile, clamped to n), and the held-out rows report empirical
    * coverage of `center ± q̂` — the distribution-free guarantee audit
    * run before trusting a filter threshold at scale.
    *
    * Exactness: medians and q̂ are rank-SELECTED values (never
    * interpolated), residuals are single IEEE subtractions (exactly
    * rounded, engine-identical), `k = ⌈(n+1)·(10⁶−αppm)/10⁶⌉` is pure
    * BIGINT arithmetic, and coverage is one final double division.
    * Scale shape: two rank windows partitioned BY GROUP (each group
    * sorts its own calibration rows — no global sort), one broadcast
    * of the per-group (center, q̂) table back onto the held-out side,
    * one map-combined coverage rollup. */
  def conformalInterval(df: DataFrame, groupCol: String,
      valueCol: String, splitCol: String,
      alphaPpm: Long = 100000L): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"),
        col(splitCol).cast(BooleanType).as("is_cal"))
    conformalAudit(
      base.filter(!col("is_cal")), "g", "v",
      conformalCalibrate(base.filter(col("is_cal")), "g", "v",
        alphaPpm))
      .withColumnRenamed("g", groupCol)
  }

  /** The calibration half of [[conformalInterval]]: per-group exact
    * lower median and the ⌈(n+1)(1−α)⌉-th absolute residual from the
    * calibration rows — the frozen `(g, center, n_cal, q_hat)`
    * interval table a held-out audit (batch or streaming) is judged
    * against. */
  def conformalCalibrate(cal0: DataFrame, groupCol: String,
      valueCol: String, alphaPpm: Long = 100000L): DataFrame = {
    val cal = cal0.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
    val med = cal
      .withColumn("rn", row_number().over(wv).cast(LongType))
      .withColumn("n_cal", count(lit(1)).over(
        Window.partitionBy(col("g"))))
      .filter(col("rn") === expr("(n_cal + 1) div 2"))
      .select(col("g"), col("v").as("center"), col("n_cal"))
    val wr = Window.partitionBy(col("g")).orderBy(col("resid"))
    cal.join(broadcast(med), Seq("g"))
      .withColumn("resid", abs(col("v") - col("center")))
      .withColumn("rn", row_number().over(wr).cast(LongType))
      .withColumn("k", least(col("n_cal"),
        expr(s"((n_cal + 1) * ${1000000L - alphaPpm} + 999999) " +
          "div 1000000")))
      .filter(col("rn") === col("k"))
      .select(col("g"), col("center"), col("n_cal"),
        col("resid").as("q_hat"))
  }

  /** The audit half of [[conformalInterval]]: held-out rows judged
    * against an ALREADY-CALIBRATED (frozen) interval table — the
    * index-agnostic shape the streaming twin recomputes per
    * micro-batch. Broadcast join-back, map-combined rollup. */
  def conformalAudit(test: DataFrame, groupCol: String,
      valueCol: String, intervals: DataFrame): DataFrame =
    test.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
      .join(broadcast(intervals
        .select(col("g"), col("center"), col("n_cal"), col("q_hat"))),
        Seq("g"))
      .groupBy(col("g"))
      .agg(
        max(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        max(col("center")).as("center"),
        max(col("q_hat")).as("q_hat"),
        sum(when(abs(col("v") - col("center")) <= col("q_hat"), 1L)
          .otherwise(0L)).as("n_covered"))
      .withColumn("coverage",
        col("n_covered").cast(DoubleType) /
          col("n_test").cast(DoubleType))
}
