package graft

/** DuckDB-equivalent ANSI SQL for every SQL-expressible entry in
  * [[SparkEntry.queries]]. Conventions (mirrored in the Spark plans):
  *
  *  - epoch seconds via `epoch_ns(ts)//1000000000` — exact integer floor,
  *    immune to ns→µs truncation and double rounding.
  *  - double aggregates via `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`
  *    — exact, order-independent, engine-identical.
  *  - `COUNT`/sums surfaced as BIGINT (DuckDB's HUGEINT sums are cast).
  *  - ties broken by unique ids; regexes restricted to the RE2∩Java
  *    common subset (no lookaround, explicit ASCII classes).
  */
object OracleSql {

  private val stopwordList =
    graft.operators.TextAnalysis.defaultMarkers.toSeq.sortBy(_._1)
      .flatMap(_._2).map(w => s"'$w'").mkString(", ")

  /** Word shingle list (distinct) as a DuckDB expression. */
  private def shingleExpr(n: Int): String =
    s"""CASE WHEN len(words) < $n THEN [array_to_string(words, ' ')]
       |     ELSE list_distinct([array_to_string(words[i:i+${n - 1}], ' ')
       |                         for i in range(1, len(words) - ${n - 1} + 1)])
       |END""".stripMargin

  /** Exact one-pass covariance oracle over the d=8 embedding column:
    * per-row products in DOUBLE (one exact-rounded op), sums as
    * DECIMAL(28,8) (order-independent; scale 8 keeps the global sum's
    * DECIMAL→DOUBLE conversion under the 2^53 exactness bound to
    * ~9e7 rows — scale 12 diverged by 1 ulp at sf0.1), final combine
    * in the same fixed double op order as `Embeddings.covariance`. */
  private val embedCovSql: String = {
    val dim = 8
    val pairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    def el(i: Int) = s"CAST(embedding[${i + 1}] AS DOUBLE)"
    val sums =
      (0 until dim).map(i =>
        s"sum(CAST(${el(i)} AS DECIMAL(28,8))) AS s_$i") ++
      pairs.map { case (i, j) =>
        s"sum(CAST(${el(i)} * ${el(j)} AS DECIMAL(28,8))) AS p_${i}_$j" }
    val selects = pairs.map { case (i, j) =>
      s"SELECT $i AS i, $j AS j, CAST(p_${i}_$j AS DOUBLE) / " +
        s"CAST(n AS DOUBLE) - (CAST(s_$i AS DOUBLE) / CAST(n AS DOUBLE)) " +
        s"* (CAST(s_$j AS DOUBLE) / CAST(n AS DOUBLE)) AS cov FROM s"
    }
    s"WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,\n" +
      sums.mkString(",\n") + "\nFROM embeddings)\n" +
      selects.mkString("\nUNION ALL ")
  }

  /** Integer power-iteration PCA oracle: the embedCovSql sufficient
    * statistics (bit-identical doubles, proven by q_embed_covariance),
    * quantized to scale-8 BIGINT units (the proven-safe bound for arbitrary-double casts), then the 8 power steps unrolled
    * as CTEs (the pagerank-oracle pattern) — truncating `//` matches
    * Spark `div`/JVM `/` toward zero, so DuckDB walks the engine's
    * exact integer orbit. */
  private val pcaPowerSql: String = {
    val dim = 8; val iters = 8
    val pairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    def el(i: Int) = s"CAST(embedding[${i + 1}] AS DOUBLE)"
    val sums =
      (0 until dim).map(i =>
        s"sum(CAST(${el(i)} AS DECIMAL(28,8))) AS s_$i") ++
      pairs.map { case (i, j) =>
        s"sum(CAST(${el(i)} * ${el(j)} AS DECIMAL(28,8))) AS p_${i}_$j" }
    val covSel = pairs.map { case (i, j) =>
      s"SELECT $i AS i, $j AS j, CAST(p_${i}_$j AS DOUBLE) / " +
        s"CAST(n AS DOUBLE) - (CAST(s_$i AS DOUBLE) / CAST(n AS DOUBLE)) " +
        s"* (CAST(s_$j AS DOUBLE) / CAST(n AS DOUBLE)) AS cov FROM s"
    }.mkString("\n  UNION ALL ")
    // every step CTE is MATERIALIZED: w_t is referenced twice (m_t and
    // v_t), so default CTE inlining would expand the chain 2^T-fold
    // (and re-open the parquet per expansion — FD exhaustion, probed)
    val steps = (1 to iters).map { t =>
      val pv = s"v${t - 1}"
      s"""w$t AS MATERIALIZED (SELECT cf.i, SUM(cf.c * $pv.v) AS w
         |  FROM cf JOIN $pv ON cf.j = $pv.i GROUP BY 1),
         |m$t AS MATERIALIZED (SELECT GREATEST(MAX(ABS(w)), 1) AS m
         |  FROM w$t),
         |v$t AS MATERIALIZED (SELECT i, CAST(CASE WHEN m >= 1000000000
         |    THEN w // (m // 1000000000)
         |    ELSE (w * 1000000000) // m END AS BIGINT) AS v
         |  FROM w$t, m$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
       |  ${sums.mkString(",\n  ")}
       |FROM embeddings),
       |cu AS MATERIALIZED (${covSel}),
       |cf AS MATERIALIZED (SELECT i, j,
       |    CAST(CAST(cov AS DECIMAL(18,8)) * 100000000 AS BIGINT) AS c
       |  FROM cu
       |  UNION ALL SELECT j, i,
       |    CAST(CAST(cov AS DECIMAL(18,8)) * 100000000 AS BIGINT)
       |  FROM cu WHERE i <> j),
       |v0 AS (SELECT CAST(t.i AS INTEGER) AS i,
       |    CAST(1000000000 AS BIGINT) AS v FROM range($dim) t(i)),
       |$steps,
       |vsc AS MATERIALIZED (SELECT i, v, v // 100000 AS vs
       |  FROM v$iters),
       |nd AS (SELECT SUM(cf.c * a.vs * b.vs) AS num
       |  FROM cf JOIN vsc a ON cf.i = a.i JOIN vsc b ON cf.j = b.i),
       |dd AS (SELECT SUM(vs * vs) AS den FROM vsc),
       |lam AS (SELECT CASE WHEN den > 0 THEN CAST(num // den AS BIGINT)
       |    ELSE 0 END AS lq FROM nd, dd)
       |SELECT CAST(vsc.i AS BIGINT) AS i, CAST(vsc.v AS BIGINT) AS v_ppb,
       |  lq AS lambda_q, CAST(lq AS DOUBLE) / 1.0e8 AS lambda
       |FROM vsc, lam ORDER BY i""".stripMargin
  }

  /** Markov removal-effect attribution oracle: journeys →
    * transition-count matrix in SQL, then (channels+1) bounded-horizon
    * value iterations unrolled as MATERIALIZED CTEs (the pcaPowerSql
    * pattern) — all-BIGINT, truncating `//` = the engine's JVM `/`. */
  private val markovAttribSql: String = {
    val channels = Seq("click", "error", "signup", "view")
    val horizon = 16
    def chain(tag: String, removed: Option[String]): String = {
      val remCase = removed
        .map(c => s"WHEN tc.to_s = '$c' THEN 0 ").getOrElse("")
      val valueCase =
        s"""CASE WHEN tc.to_s = 'conv' THEN 1000000000
           |      WHEN tc.to_s = 'null' THEN 0 $remCase
           |      ELSE COALESCE(pp.p, 0) END""".stripMargin
      val seed = s"""p${tag}0 AS (SELECT DISTINCT from_s AS s,
         |  CAST(0 AS BIGINT) AS p FROM tc WHERE from_s <> 'start')"""
        .stripMargin
      val steps = (1 to horizon).map { t =>
        s"""p$tag$t AS MATERIALIZED (SELECT tc.from_s AS s,
           |    CAST(SUM(tc.cnt * $valueCase) // MAX(tc.outn) AS BIGINT)
           |      AS p
           |  FROM tc LEFT JOIN p$tag${t - 1} pp ON pp.s = tc.to_s
           |  WHERE tc.from_s <> 'start' GROUP BY 1)""".stripMargin
      }
      val fin = s"""ps$tag AS MATERIALIZED (SELECT
         |  CAST(COALESCE(SUM(tc.cnt * $valueCase) // MAX(tc.outn), 0)
         |    AS BIGINT) AS p
         |  FROM tc LEFT JOIN p$tag$horizon pp ON pp.s = tc.to_s
         |  WHERE tc.from_s = 'start')""".stripMargin
      (Seq(seed) ++ steps :+ fin).mkString(",\n")
    }
    val chains = (chain("base", None) +: channels.zipWithIndex.map {
      case (c, i) => chain(s"c$i", Some(c)) }).mkString(",\n")
    val effRows = channels.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS touch_type, (SELECT p FROM psc$i) AS removed"
    }.mkString("\n  UNION ALL ")
    s"""WITH seq AS (SELECT user_id AS k, event_id AS rid,
       |    event_type AS t,
       |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1
       |      ELSE 0 END) OVER (PARTITION BY user_id
       |      ORDER BY epoch_ns(ts) // 1000, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS seg,
       |    epoch_ns(ts) // 1000 AS eu
       |  FROM events WHERE event_type IN
       |    ('purchase', ${channels.map(c => s"'$c'").mkString(", ")})),
       |touches AS (SELECT k, seg, t,
       |    COALESCE(LAG(t) OVER (PARTITION BY k, seg ORDER BY eu, rid),
       |      'start') AS from_s,
       |    row_number() OVER (PARTITION BY k, seg ORDER BY eu, rid)
       |      AS rn,
       |    COUNT(*) OVER (PARTITION BY k, seg) AS n_j
       |  FROM seq WHERE t <> 'purchase'),
       |closed AS (SELECT DISTINCT k, seg FROM seq
       |  WHERE t = 'purchase'),
       |tr AS (SELECT from_s, t AS to_s FROM touches
       |  UNION ALL
       |  SELECT tt.t, CASE WHEN c.k IS NOT NULL THEN 'conv'
       |      ELSE 'null' END
       |    FROM touches tt LEFT JOIN closed c
       |      ON c.k = tt.k AND c.seg = tt.seg
       |    WHERE tt.rn = tt.n_j
       |  UNION ALL
       |  SELECT 'start', 'conv' FROM closed c
       |    WHERE NOT EXISTS (SELECT 1 FROM touches tt
       |      WHERE tt.k = c.k AND tt.seg = c.seg)),
       |cn AS (SELECT from_s, to_s, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM tr GROUP BY 1, 2),
       |tc AS MATERIALIZED (SELECT cn.from_s, cn.to_s, cn.cnt, o.outn
       |  FROM cn JOIN (SELECT from_s, CAST(SUM(cnt) AS BIGINT) AS outn
       |    FROM cn GROUP BY 1) o USING (from_s)),
       |$chains,
       |eff AS ($effRows),
       |tot AS (SELECT SUM((SELECT p FROM psbase) - removed) AS total
       |  FROM eff)
       |SELECT e.touch_type,
       |  (SELECT p FROM psbase) AS p_conv_base_ppb,
       |  e.removed AS p_conv_removed_ppb,
       |  (SELECT p FROM psbase) - e.removed AS removal_effect_ppb,
       |  CAST(CASE WHEN t.total > 0 THEN
       |    (((SELECT p FROM psbase) - e.removed) * 1000000000) // t.total
       |    ELSE 0 END AS BIGINT) AS attribution_ppb,
       |  CAST(CASE WHEN t.total > 0 THEN
       |    (((SELECT p FROM psbase) - e.removed) * 1000000000) // t.total
       |    ELSE 0 END AS DOUBLE) / 1.0e9 AS attribution
       |FROM eff e, tot t ORDER BY 1""".stripMargin
  }

  private val decSum = (x: String, as: String) =>
    s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE) AS $as"
  private val decAvg = (x: String, as: String) =>
    s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)/COUNT($x) AS $as"

  /** The ±1 hyperplane sign lists for `tables`×`planes` LSH tables as a
    * VALUES literal — generated from the same splitmix64 stream the
    * engine's `rhp_signatures` kernel derives them from, so DuckDB
    * reproduces the exact buckets (signatures are integer sums over the
    * scale-6 quantized vectors: order-independent, engine-identical). */
  private def planesValues(tables: Int, planes: Int, dims: Int): String =
    (0 until tables).flatMap(t => (0 until planes).map { p =>
      val signs = (0 until dims)
        .map(d => graft.functions.VectorOpsImpl.planeSignLong(t, p, d))
      s"($t, $p, [${signs.mkString(", ")}])"
    }).mkString(",\n      ")

  /** Declarative all-pairs n-gram Jaccard at `threshold` (3-word
    * shingles) — the oracle for both the postings-join operator and the
    * output-equivalent prefix-filtered one. */
  private def ngramJaccardSql(threshold: Double, width: Int = 3): String =
    s"""WITH w AS (SELECT doc_id,
       |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
       |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(width)}) AS shingle FROM w),
       |sizes AS (SELECT id, COUNT(*) AS set_size FROM sh GROUP BY 1),
       |inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle
       |  WHERE a.id < b.id GROUP BY 1, 2)
       |SELECT id_a, id_b, n_common,
       |  CAST(n_common AS DOUBLE)
       |    / CAST(sa.set_size + sb.set_size - n_common AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.id = id_a
       |JOIN sizes sb ON sb.id = id_b
       |WHERE CAST(n_common AS DOUBLE)
       |    / CAST(sa.set_size + sb.set_size - n_common AS DOUBLE)
       |  >= $threshold""".stripMargin

  /** Banded-minhash near-dup pair SQL (3-word shingles, md5_60
    * double-hash KM family `b1 + i·b2 mod 2⁶⁰` split 54/6, k = 64
    * component mins, 16 bands of 4, md5_60 band hash of the canonical
    * "m0,m1,m2,m3|band" string) — shared by q_dedup_minhash and the
    * recall-eval composition. */
  /** Shared CTE prefix for the minhash family: per-doc 3-word shingles,
    * md5_60 double hashes, and the k = 64 KM-family component mins
    * (`mins(id, i, m)`). */
  private def minhashMinsCtes: String = {
    val km = """(b1 + ((r.i * (b2 & 18014398509481983)) & 1152921504606846975)
               |       + (((r.i * (b2 >> 54)) & 63) << 54)) & 1152921504606846975"""
      .stripMargin
    s"""w AS (SELECT doc_id,
       |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
       |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(3)}) AS s FROM w),
       |hb AS (SELECT id, s,
       |    ('0x' || substring(md5(s), 1, 15))::BIGINT AS b1,
       |    ('0x' || substring(md5(s || '#'), 1, 15))::BIGINT AS b2
       |  FROM sh),
       |mins AS (SELECT id, r.i, MIN($km) AS m
       |  FROM hb, range(0, 64) r(i) GROUP BY 1, 2)""".stripMargin
  }

  private def minhashPairsSql(threshold: Double): String = {
    s"""WITH $minhashMinsCtes,
       |bnd AS (SELECT id, i // 4 AS band,
       |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS key
       |  FROM mins GROUP BY 1, 2),
       |banded AS (SELECT id, band,
       |    ('0x' || substring(md5(key || '|' || CAST(band AS VARCHAR)), 1, 15))::BIGINT
       |      AS band_hash
       |  FROM bnd),
       |bsz AS (SELECT band, band_hash, COUNT(*) AS n FROM banded GROUP BY 1, 2),
       |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM banded a
       |  JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
       |  JOIN bsz ON bsz.band = a.band AND bsz.band_hash = a.band_hash
       |  WHERE a.id < b.id AND bsz.n BETWEEN 2 AND 2000),
       |sim AS (SELECT id_a, id_b,
       |    CAST(SUM(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) AS DOUBLE) / 64.0
       |      AS sig_similarity
       |  FROM pairs
       |  JOIN mins ma ON ma.id = id_a
       |  JOIN mins mb ON mb.id = id_b AND ma.i = mb.i
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, sig_similarity FROM sim
       |WHERE sig_similarity >= $threshold""".stripMargin
  }

  /** Shared CTE prefix: quantized embedding elements + per-(vec, table)
    * packed RHP bucket ids. */
  private def lshSigCtes(tables: Int, planes: Int): String =
    s"""el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
       |  FROM embeddings),
       |qv AS (SELECT vec_id, i, CAST(x * 1000000 AS BIGINT) AS qx FROM el),
       |pl(tbl, plane, s) AS (VALUES
       |      ${planesValues(tables, planes, 64)}),
       |acc AS (SELECT qv.vec_id, pl.tbl, pl.plane,
       |    SUM(qv.qx * pl.s[qv.i]) AS a
       |  FROM qv, pl GROUP BY 1, 2, 3),
       |sig AS (SELECT vec_id, tbl,
       |    CAST(SUM(CASE WHEN a > 0 THEN 1::BIGINT << plane
       |             ELSE 0 END) AS BIGINT) AS bucket
       |  FROM acc GROUP BY 1, 2)""".stripMargin

  /** Shared CTE chain for the Lloyd-refined IVF coarse quantizer: seed
    * centroids (the K smallest md5_60(vec_id), K = GREATEST(16,
    * floor(sqrt(n))) when dynamic — mirroring the engine's
    * resolveCentroids auto-sizing — or the fixed 16 for k-means-as-
    * model queries), exact quantized-L2 seed
    * assignment (`cells0`), one k-means step (per-cell scale-6 integer
    * mean, HALF_UP via truncating integer division; empty cells keep
    * their seed), and the final assignment against the refined centroids
    * (`cells`, with the per-(vector, centroid) distances in `asg`).
    * Used by the refined-IVF probe (q_sim_ivf) and semantic dedup
    * (q_dedup_semantic). */
  /** Shared CTE chain for winnowing (MOSS) near-dup pairs at
    * (k=24, w=8): winnowed fingerprint selection (min of each 8-window
    * over char-24-gram md5_60 hashes, distinct per doc), then a postings
    * self-join on fp. Docs sharing >= 2 fingerprints AND fingerprint-set
    * Jaccard >= 0.5 are pairs; fingerprints in > 10000 docs pruned as in
    * the Spark maxDocFreq cap; set sizes from the UNpruned per-doc sets.
    * Ends with the `wpairs` CTE (id_a, id_b, n_common, jaccard_fp). */
  private val winnowPairCtes: String =
    """g AS (SELECT doc_id,
      |    [('0x' || substring(md5(substr(text, i, 24)), 1, 15))::BIGINT
      |     for i in range(1, GREATEST(length(text) - 23, 1) + 1)] AS hs
      |  FROM documents),
      |fps AS (SELECT doc_id, unnest(list_distinct(
      |    [list_min(hs[j:j+7]) for j in range(1, GREATEST(len(hs) - 7, 1) + 1)]))
      |  AS fp FROM g),
      |sized AS (SELECT doc_id, fp,
      |    COUNT(*) OVER (PARTITION BY doc_id) AS set_size FROM fps),
      |posts AS (SELECT fp FROM fps GROUP BY fp
      |  HAVING COUNT(*) > 1 AND COUNT(*) <= 10000),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    a.set_size AS size_a, b.set_size AS size_b, COUNT(*) AS n_common
      |  FROM sized a JOIN sized b ON a.fp = b.fp
      |  JOIN posts p ON p.fp = a.fp
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4),
      |wpairs AS (SELECT id_a, id_b, n_common, jaccard_fp FROM (
      |    SELECT id_a, id_b, n_common,
      |      CAST(n_common AS DOUBLE) /
      |        CAST(size_a + size_b - n_common AS DOUBLE) AS jaccard_fp
      |    FROM inter WHERE n_common >= 2)
      |  WHERE jaccard_fp >= 0.5)""".stripMargin

  /** The refined-IVF CTE chain over the corpus restricted to the ids in
    * `src` (a table/CTE with a `vec_id` column): seed selection, Lloyd
    * refinement, and the final `cells` assignment all see ONLY that
    * subset — the shape [[q_dedup_semantic_exact]] needs, where exact
    * dedup collapses duplicate classes to representatives before
    * clustering. `src = "embeddings"` degenerates to the whole corpus. */
  private def ivfRefinedCellCtesOver(src: String,
      dynamicK: Boolean = true): String = {
    // the coarse-quantizer size: AUTO (GREATEST(16, floor(sqrt(n))) over
    // the SAME restricted corpus the engine counts) for the ANN index
    // queries, or the caller's fixed K for k-means-as-model queries
    val centSql =
      if (dynamicK)
        s"""nk AS MATERIALIZED (SELECT GREATEST(16, CAST(floor(sqrt(
      |      CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS k FROM $src),
      |cent AS MATERIALIZED (SELECT vec_id FROM (SELECT r.vec_id,
      |    row_number() OVER (ORDER BY
      |      ('0x' || substring(md5(CAST(r.vec_id AS VARCHAR)), 1, 15))
      |        ::BIGINT, r.vec_id) AS crn
      |  FROM $src r) CROSS JOIN nk WHERE crn <= nk.k),"""
      else
        s"""cent AS (SELECT r.vec_id FROM $src r
      |  ORDER BY ('0x' || substring(md5(CAST(r.vec_id AS VARCHAR)), 1, 15))
      |    ::BIGINT, r.vec_id
      |  LIMIT 16),"""
    s"""el AS (SELECT e.vec_id, generate_subscripts(e.embedding, 1) AS i,
      |    CAST(CAST(unnest(e.embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
      |  FROM embeddings e JOIN $src r ON e.vec_id = r.vec_id),
      |$centSql
      |sq AS (SELECT vec_id,
      |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
      |  FROM el GROUP BY 1),
      |vc0 AS (SELECT e.vec_id AS vid, c.vec_id AS cid,
      |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
      |  FROM el e JOIN el c ON e.i = c.i
      |  JOIN cent ON c.vec_id = cent.vec_id GROUP BY 1, 2),
      |asg0 AS (SELECT vid, cid, sv.s2 + sc.s2 - 2.0 * dot AS d2
      |  FROM vc0 JOIN sq sv ON sv.vec_id = vid
      |           JOIN sq sc ON sc.vec_id = cid),
      |cells0 AS (SELECT vid, cid FROM asg0
      |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) = 1),
      |cm AS (SELECT c0.cid, e.i,
      |    SUM(CAST(e.x * 1000000 AS BIGINT)) AS s,
      |    COUNT(*) AS n
      |  FROM cells0 c0 JOIN el e ON e.vec_id = c0.vid GROUP BY 1, 2),
      |ref AS (SELECT se.vec_id AS cid, se.i,
      |    COALESCE(
      |      CAST((2 * cm.s + CASE WHEN cm.s < 0 THEN -cm.n ELSE cm.n
      |            END) // (2 * cm.n) AS DECIMAL(18,0))
      |        * CAST(0.000001 AS DECIMAL(7,6)),
      |      se.x) AS mx
      |  FROM el se JOIN cent ON se.vec_id = cent.vec_id
      |  LEFT JOIN cm ON cm.cid = se.vec_id AND cm.i = se.i),
      |rsq AS (SELECT cid,
      |    CAST(SUM(CAST(mx * mx AS DECIMAL(25,12))) AS DOUBLE) AS s2
      |  FROM ref GROUP BY 1),
      |vc AS (SELECT e.vec_id AS vid, ref.cid,
      |    CAST(SUM(CAST(e.x * ref.mx AS DECIMAL(25,12))) AS DOUBLE) AS dot
      |  FROM el e JOIN ref ON e.i = ref.i GROUP BY 1, 2),
      |asg AS (SELECT vid, vc.cid, sv.s2 + rsq.s2 - 2.0 * dot AS d2
      |  FROM vc JOIN sq sv ON sv.vec_id = vid
      |          JOIN rsq ON rsq.cid = vc.cid),
      |cells AS (SELECT vid, cid FROM asg
      |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) = 1)"""
      .stripMargin
  }

  private val ivfRefinedCellCtes: String = ivfRefinedCellCtesOver("embeddings")

  /** The fixed-K (16) variant — for the k-means-as-MODEL queries
    * (q_embed_kmeans / q_embed_silhouette), where K is the caller's
    * clustering choice, not an index size to scale with n. */
  private val ivfRefinedCellCtesK16: String =
    ivfRefinedCellCtesOver("embeddings", dynamicK = false)

  /** The hierarchical one-split chain + in-leaf cosine verification of
    * q_dedup_semantic_split (maxCell = 120, splitFanout = 4,
    * maxDepth = 1), factored so the exact-composed variant reuses it
    * verbatim over a restricted corpus. Expects `el`/`sq`/`cells` in
    * scope; ends with the final pair SELECT. */
  private val semanticSplitTail: String =
    """csz AS (SELECT cid, COUNT(*) AS n FROM cells GROUP BY 1),
      |keep0 AS (SELECT c.vid, CAST(c.cid AS VARCHAR) AS cell
      |  FROM cells c JOIN csz ON csz.cid = c.cid WHERE csz.n <= 120),
      |ov AS (SELECT c.vid, c.cid FROM cells c
      |  JOIN csz ON csz.cid = c.cid WHERE csz.n > 120),
      |seeds AS (SELECT cid, vid AS sid FROM ov
      |  QUALIFY row_number() OVER (PARTITION BY cid ORDER BY
      |    ('0x' || substring(md5(CAST(vid AS VARCHAR)), 1, 15))::BIGINT,
      |    vid) <= 4),
      |sdot AS (SELECT o.vid, o.cid, s.sid,
      |    CAST(SUM(CAST(ev.x * es.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
      |  FROM ov o JOIN seeds s ON s.cid = o.cid
      |  JOIN el ev ON ev.vec_id = o.vid
      |  JOIN el es ON es.vec_id = s.sid AND es.i = ev.i
      |  GROUP BY 1, 2, 3),
      |child AS (SELECT vid,
      |    CAST(cid AS VARCHAR) || '/' || CAST(sid AS VARCHAR) AS cell
      |  FROM (SELECT sd.vid, sd.cid, sd.sid,
      |      sv.s2 + ss.s2 - 2.0 * sd.dot AS d2
      |    FROM sdot sd JOIN sq sv ON sv.vec_id = sd.vid
      |                 JOIN sq ss ON ss.vec_id = sd.sid)
      |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, sid) = 1),
      |leaves AS (SELECT vid, cell FROM keep0
      |  UNION ALL SELECT vid, cell FROM child),
      |lsz AS (SELECT cell, COUNT(*) AS n FROM leaves GROUP BY 1),
      |cand AS (SELECT a.vid AS id_a, b.vid AS id_b
      |  FROM leaves a JOIN leaves b ON a.cell = b.cell
      |  JOIN lsz ON lsz.cell = a.cell
      |  WHERE a.vid < b.vid AND lsz.n BETWEEN 2 AND 120),
      |norms AS (SELECT vec_id,
      |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
      |  FROM el GROUP BY 1),
      |d AS (SELECT id_a, id_b,
      |    CAST(SUM(CAST(ea.x * eb.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
      |  FROM cand
      |  JOIN el ea ON ea.vec_id = id_a
      |  JOIN el eb ON eb.vec_id = id_b AND ea.i = eb.i
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
      |FROM d
      |JOIN norms na ON na.vec_id = id_a
      |JOIN norms nb ON nb.vec_id = id_b
      |WHERE dot / (na.nrm * nb.nrm) >= 0.25""".stripMargin

  /** Product-quantization ADC chain, from an `el` CTE (vec_id, i, x) in
    * scope to `enc` (corpus codes) and `qtab` (per-query ADC lookup
    * contribs for vec_id < 10): sampled codebook = sub-slices of the 16
    * md5-smallest corpus rows (code id = rank), nearest code per
    * (vector, subspace) by exact quantized L2 with (d2, code) ties. */
  /** PQ assignment prefix (codebook seeding + per-(vector, subspace,
    * code) exact L2 terms) — leaves `elm`, `pcb`, `pcs2`, `pvs2`,
    * `pvdot` in scope; shared by the ADC chain and the distortion
    * audit. */
  private val pqAssignCtes: String =
    """dims AS (SELECT CAST(len(embedding) AS BIGINT) AS d
      |  FROM embeddings LIMIT 1),
      |elm AS (SELECT vec_id, i, x, LEAST((i - 1) // (d // 4), 3) AS m
      |  FROM el CROSS JOIN dims),
      |seeds AS (SELECT vec_id AS psid,
      |    row_number() OVER (ORDER BY
      |      ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
      |      vec_id) AS r
      |  FROM embeddings
      |  ORDER BY ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
      |    ::BIGINT, vec_id
      |  LIMIT 16),
      |pcb AS (SELECT s.r, e.m, e.i, e.x
      |  FROM elm e JOIN seeds s ON e.vec_id = s.psid),
      |pcs2 AS (SELECT r, m,
      |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
      |  FROM pcb GROUP BY 1, 2),
      |pvs2 AS (SELECT vec_id, m,
      |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
      |  FROM elm GROUP BY 1, 2),
      |pvdot AS (SELECT e.vec_id, c.r, e.m,
      |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
      |  FROM elm e JOIN pcb c ON c.i = e.i
      |  GROUP BY 1, 2, 3)""".stripMargin

  private val pqAdcCtes: String =
    s"""$pqAssignCtes,
      |enc AS (SELECT vec_id, m, r FROM (
      |    SELECT v.vec_id, v.m, v.r, pvs2.s2 + pcs2.s2 - 2.0 * v.dot AS d2
      |    FROM pvdot v
      |    JOIN pvs2 ON pvs2.vec_id = v.vec_id AND pvs2.m = v.m
      |    JOIN pcs2 ON pcs2.r = v.r AND pcs2.m = v.m)
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
      |    ORDER BY d2, r) = 1),
      |qtab AS (SELECT e.vec_id AS query_id, c.r, e.m,
      |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DECIMAL(25,12))
      |      AS contrib
      |  FROM elm e JOIN pcb c ON c.i = e.i
      |  WHERE e.vec_id < 10
      |  GROUP BY 1, 2, 3)""".stripMargin

  /** SCD2 gaps-and-islands CTE chain over `events` (optionally
    * filtered): leaves `runs` (user_id, version, event_type,
    * valid_from_s, n_events) in scope — shared by q_scd2 and the
    * point-in-time composition. */
  private def scd2RunsCtes(where: String): String =
    s"""e AS (SELECT user_id, event_type, event_id, ts,
       |    epoch_ns(ts)//1000000000 AS ts_s FROM events$where),
       |f AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
       |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END
       |    AS chg
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |v AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS version
       |  FROM f),
       |runs AS (SELECT user_id, CAST(version AS BIGINT) AS version,
       |    MIN(event_type) AS event_type, MIN(ts_s) AS valid_from_s,
       |    CAST(COUNT(*) AS BIGINT) AS n_events
       |  FROM v GROUP BY 1, 2)""".stripMargin

  /** Per-document BPE token counts under the reference merges — leaves
    * `s` (doc_id, n_bpe_tokens; docs with no words absent) in scope.
    * Shared by q_text_bpe_encode and the fertility report. */
  private val bpePerDocCtes: String = {
    val start = "chr(1) || array_to_string(regexp_extract_all(w, '.'), " +
      "chr(1) || chr(1)) || chr(1)"
    val enc = graft.operators.TextAnalysis.referenceMerges.foldLeft(start) {
      case (acc, (a, b)) =>
        s"replace($acc,\n         |    chr(1) || '$a' || chr(1) || " +
          s"chr(1) || '$b' || chr(1), chr(1) || '$a$b' || chr(1))"
    }
    s"""w AS (SELECT doc_id, unnest(CASE
       |    WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |    ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
       |  FROM documents),
       |e AS (SELECT doc_id,
       |    CAST(len(string_split($enc, chr(1) || chr(1))) AS BIGINT)
       |      AS n_sub
       |  FROM w),
       |s AS (SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens
       |  FROM e GROUP BY 1)""".stripMargin
  }

  /** Hourly per-(series, bucket) exact scale-2 sums over events —
    * ONE definition of the quantization discipline shared by
    * q_series_corr and q_series_trend (mirrors
    * TimeSeries.decimalBuckets). Leaves `b` (series, bucket_s, y). */
  private val hourlyBucketCte: String =
    """b AS (SELECT event_type AS series,
      |    epoch_ns(date_trunc('hour', ts))//1000000000 AS bucket_s,
      |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(38,2)) AS y
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** CCNet bigram-LM scoring CTEs (α = 1/10, reference = the lang='en'
    * slice): leaves `s` (doc_id, n, nll) in scope — shared by
    * q_lm_perplexity and q_lm_buckets. Every probability is the integer
    * rational A/B; per-bigram cost = floor(4·log2(B/A)) =
    * bitlen(⌊B⁴/A⁴⌋)−1, exact in HUGEINT — the same quarter-bit value
    * graft's log2_quarter_bits kernel computes in BigInteger. */
  private val lmScoreCtes: String =
    """doc AS (SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
      |refc AS (SELECT regexp_split_to_array(trim(text), '\s+') AS arr
      |  FROM documents WHERE lang = 'en'),
      |refbg AS (SELECT arr[i] AS w1, arr[i + 1] AS w2
      |  FROM refc, unnest(range(1, len(arr))) AS t(i)
      |  WHERE len(arr) >= 2),
      |pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM refbg GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cctx FROM pc GROUP BY 1),
      |vocab AS (SELECT CAST(COUNT(DISTINCT tok) + 1 AS BIGINT) AS v
      |  FROM (SELECT unnest(arr) AS tok FROM refc) WHERE len(tok) > 0),
      |docbg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
      |  FROM doc, unnest(range(1, len(arr))) AS t(i)
      |  WHERE len(arr) >= 2),
      |ab AS (SELECT d.doc_id,
      |    CASE WHEN pc.c IS NOT NULL THEN pc.c * 10 + 1 ELSE 1 END AS a,
      |    CASE WHEN ctx.cctx IS NOT NULL THEN ctx.cctx * 10 + v
      |         ELSE v END AS b
      |  FROM docbg d
      |  LEFT JOIN pc USING (w1, w2)
      |  LEFT JOIN ctx USING (w1)
      |  CROSS JOIN vocab),
      |qcost AS (SELECT doc_id,
      |    length(bin((CAST(b AS HUGEINT) * b * b * b)
      |      // (CAST(a AS HUGEINT) * a * a * a))) - 1 AS cost FROM ab),
      |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cost) AS BIGINT) AS nll FROM qcost GROUP BY 1)""".stripMargin

  val sql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSum("l_quantity", "sum_qty")},
         |  ${decSum("l_extendedprice", "sum_base_price")},
         |  ${decSum("l_extendedprice*(1.0-l_discount)", "sum_disc_price")},
         |  ${decSum("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)", "sum_charge")},
         |  ${decAvg("l_quantity", "avg_qty")},
         |  ${decAvg("l_discount", "avg_disc")},
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey,
         |  epoch_ns(o_orderdate)//1000000000 AS o_orderdate_s,
         |  o_orderpriority,
         |  ${decSum("l_extendedprice*(1.0-l_discount)", "revenue")}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         |GROUP BY 1, 2, 3""".stripMargin,

    "q5_local_supplier" ->
      s"""SELECT n_name,
         |  ${decSum("l_extendedprice*(1.0-l_discount)", "revenue")}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY 1""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT ${decSum("l_extendedprice*l_discount", "revenue")}
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q_a1_downsample_max" ->
      """SELECT epoch_ns(date_trunc('hour', ts))//1000000000 AS bucket_s,
        |  user_id, MAX(value) AS max_value, COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_a2_hourly_rollup" ->
      s"""SELECT epoch_ns(date_trunc('hour', ts))//1000000000 AS bucket_s,
         |  event_type, COUNT(*) AS n, ${decSum("value", "sum_value")}
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q_a3_directory" ->
      """SELECT DISTINCT user_id, event_type,
        |  CONCAT(event_type, ', ', user_id) AS combo
        |FROM events""".stripMargin,

    "q_a4_sliding_average" ->
      """WITH e AS (SELECT event_id, user_id,
        |    epoch_ns(ts)//1000000000 AS epoch_s, value FROM events)
        |SELECT event_id, user_id, epoch_s,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
        |    / COUNT(value) OVER w AS sliding_avg
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
        |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_a5_historic_average" ->
      s"""SELECT epoch_ns(date_trunc('hour', ts))//1000000000 AS bucket_s,
         |  user_id, ${decAvg("value", "avg_value")}, COUNT(*) AS n
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
         |GROUP BY 1, 2""".stripMargin,

    "q_s3_historic_range" ->
      s"""WITH e AS (SELECT epoch_ns(ts)//1000000000 AS es, value FROM events
         |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
         |    AND ts < TIMESTAMP '2024-01-12 00:00:00')
         |SELECT (es//600)*600 AS bucket_s,
         |  ${decAvg("value", "avg_value")}, COUNT(*) AS n
         |FROM e GROUP BY 1""".stripMargin,

    // S3 raw arm: average=0 → the ranged samples, unbucketed.
    "q_s3_raw" ->
      """SELECT epoch_ns(ts)//1000000000 AS epoch_s, user_id, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-11 00:00:00'""".stripMargin,

    "q_f_pushdown_scan" ->
      s"""SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS epoch_s, value
         |FROM events
         |WHERE event_type = 'click'
         |  AND user_id IN (${(1L to 40L).mkString(", ")})
         |  AND value >= 5.0 AND value < 50.0
         |  AND ts >= TIMESTAMP '2024-01-03 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-25 00:00:00'""".stripMargin,

    "q_j1_recombine" ->
      """SELECT a.event_id, a.user_id, a.event_type, b.value, c.epoch_s
        |FROM (SELECT event_id, user_id, event_type FROM events) a
        |JOIN (SELECT event_id, value FROM events) b ON a.event_id = b.event_id
        |JOIN (SELECT event_id, epoch_ns(ts)//1000000000 AS epoch_s
        |      FROM events) c ON a.event_id = c.event_id""".stripMargin,

    "q_j2_semi_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  ${decSum("o_totalprice", "total")}
         |FROM orders
         |WHERE o_custkey IN
         |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         |GROUP BY 1""".stripMargin,

    "q_j3_dim_probe" ->
      s"""SELECT user_id, event_type, COUNT(*) AS n,
         |  ${decSum("value", "sum_value")}
         |FROM events
         |WHERE user_id IN (SELECT DISTINCT user_id FROM events
         |  WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-08 00:00:00')
         |GROUP BY 1, 2""".stripMargin,

    // bloom-screened variant of the dim probe: the screen only removes
    // rows the exact join would drop anyway — same oracle as the plain join
    "q_j4_bloom_screen" ->
      s"""SELECT user_id, event_type, COUNT(*) AS n,
         |  ${decSum("value", "sum_value")}
         |FROM events
         |WHERE user_id IN (SELECT DISTINCT user_id FROM events
         |  WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-08 00:00:00')
         |GROUP BY 1, 2""".stripMargin,

    "q_o1_time_sort" ->
      """SELECT epoch_ns(date_trunc('day', ts))//1000000000 AS bucket_s,
        |  MAX(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_t3_dedup_pk" ->
      """WITH e AS (SELECT user_id,
        |    epoch_ns(date_trunc('minute', ts))//1000000000 AS bucket_s,
        |    event_id FROM events)
        |SELECT user_id, bucket_s, event_id FROM e
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id, bucket_s ORDER BY event_id) = 1""".stripMargin,

    // TimescaleDB time_bucket_gapfill + locf: hourly buckets per user,
    // complete per-user spine, last-observation-carried-forward max.
    // Spark buckets epoch seconds with integer floor-div; epoch_ns//1e9
    // then //3600*3600 is the same floor for post-epoch data.
    "q_a7_gapfill_locf" ->
      """WITH e AS (SELECT user_id,
        |    ((epoch_ns(ts) // 1000000000) // 3600) * 3600 AS bucket_s,
        |    value FROM events),
        |b AS (SELECT user_id, bucket_s, max(value) AS v_obs,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, min(bucket_s) AS lo, max(bucket_s) AS hi
        |  FROM b GROUP BY 1),
        |sp AS (SELECT user_id, unnest(generate_series(lo, hi, 3600))
        |    AS bucket_s FROM s),
        |j AS (SELECT sp.user_id, sp.bucket_s, b.v_obs, b.n
        |  FROM sp LEFT JOIN b USING (user_id, bucket_s))
        |SELECT user_id, bucket_s,
        |  last_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket_s ROWS UNBOUNDED PRECEDING) AS value_locf,
        |  COALESCE(n, CAST(0 AS BIGINT)) AS n,
        |  n IS NULL AS filled
        |FROM j""".stripMargin,

    // As-of join, native in DuckDB: each click matched to the greatest
    // prior-or-equal purchase µs per user; the reference side is first
    // collapsed to one row per (user, µs) via max(value) so the as-of
    // target is unique — the same deterministic tie-break graft applies.
    "q_asof_join" ->
      """WITH r AS (SELECT user_id, epoch_ns(ts) // 1000 AS epoch_us,
        |    max(value) AS asof_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS epoch_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.epoch_us, r.asof_value
        |FROM p ASOF LEFT JOIN r
        |  ON p.user_id = r.user_id AND p.epoch_us >= r.epoch_us"""
        .stripMargin,

    // Gapfill with linear interpolation: same spine as the locf oracle;
    // the interpolation expression is spelled in EXACTLY the Spark-side
    // operation order (pv + (nv-pv) * (Δb/Δspan), all in DOUBLE) so the
    // two engines are IEEE-754 bit-equal.
    "q_a8_gapfill_interp" ->
      """WITH e AS (SELECT user_id,
        |    ((epoch_ns(ts) // 1000000000) // 3600) * 3600 AS bucket_s,
        |    value FROM events),
        |b AS (SELECT user_id, bucket_s, max(value) AS v_obs,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, min(bucket_s) AS lo, max(bucket_s) AS hi
        |  FROM b GROUP BY 1),
        |sp AS (SELECT user_id, unnest(generate_series(lo, hi, 3600))
        |    AS bucket_s FROM s),
        |j AS (SELECT sp.user_id, sp.bucket_s, b.v_obs, b.n
        |  FROM sp LEFT JOIN b USING (user_id, bucket_s)),
        |f AS (SELECT user_id, bucket_s, v_obs, n,
        |  last_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket_s ROWS UNBOUNDED PRECEDING) AS pv,
        |  last_value(CASE WHEN v_obs IS NOT NULL THEN bucket_s END
        |    IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket_s ROWS UNBOUNDED PRECEDING) AS pb,
        |  first_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket_s ROWS BETWEEN CURRENT ROW AND
        |    UNBOUNDED FOLLOWING) AS nv,
        |  first_value(CASE WHEN v_obs IS NOT NULL THEN bucket_s END
        |    IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket_s ROWS BETWEEN CURRENT ROW AND
        |    UNBOUNDED FOLLOWING) AS nb
        |  FROM j)
        |SELECT user_id, bucket_s,
        |  CASE WHEN v_obs IS NOT NULL THEN v_obs
        |    ELSE pv + (nv - pv) *
        |      (CAST(bucket_s - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
        |  END AS value_interp,
        |  COALESCE(n, CAST(0 AS BIGINT)) AS n,
        |  n IS NULL AS filled
        |FROM f""".stripMargin,

    // Exact percentiles: quantile_cont == Spark's percentile (both
    // interpolate lower + frac*(upper-lower) in double precision,
    // probed bit-equal); quantile_disc == percentile_disc (SQL-standard
    // discrete definition).
    "q_percentiles" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.75) AS p75,
        |  quantile_cont(value, 0.95) AS p95,
        |  quantile_disc(value, 0.5) AS p50_disc
        |FROM events GROUP BY 1""".stripMargin,

    "q_embed_covariance" -> embedCovSql,
    "q_embed_pca" -> pcaPowerSql,

    // K-means summary over the same refined-IVF chain as the semantic
    // dedup family (16 md5 seeds, one Lloyd round): per-cluster size +
    // inertia. Each member's d2 is the asg CTE's assignment double
    // (same op order as the engine's ivfD2); inertia sums them as
    // DECIMAL(28,6) partials (double->decimal rounds HALF_UP in both
    // engines — probed) and surfaces ONE final DOUBLE, exact while the
    // micro-scaled sum stays under 2^53 — a driver-hash-stable output
    // type, unlike the wide decimal it replaced (value-equal but
    // representation-divergent under the gate hash).
    // Per-label centroid cosine matrix: exact scale-6 HALF_UP integer
    // means per (label, dim) — the same (2s±n)//(2n) formula as the
    // Lloyd step — then dot/norms from exact DECIMAL(25,12) sums
    // surfaced as doubles; cosine = dot / (sqrt·sqrt) in the identical
    // op order; zero-norm → NULL.
    "q_embed_label_sim" ->
      """WITH el AS (SELECT label, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS x
        |  FROM embeddings),
        |cm AS (SELECT label, i, SUM(x) AS s, COUNT(*) AS n FROM el
        |  GROUP BY 1, 2),
        |ct AS (SELECT label, i,
        |    CAST((2 * s + CASE WHEN s < 0 THEN -n ELSE n END) // (2 * n)
        |      AS DECIMAL(18,0)) * CAST(0.000001 AS DECIMAL(7,6)) AS m
        |  FROM cm),
        |dots AS (SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(SUM(CAST(a.m * b.m AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM ct a JOIN ct b ON a.i = b.i AND a.label < b.label
        |  GROUP BY 1, 2),
        |norms AS (SELECT label,
        |    sqrt(CAST(SUM(CAST(m * m AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM ct GROUP BY 1)
        |SELECT d.label_a, d.label_b,
        |  CASE WHEN na.nrm * nb.nrm = 0 THEN NULL
        |       ELSE d.dot / (na.nrm * nb.nrm) END AS cosine
        |FROM dots d JOIN norms na ON na.label = d.label_a
        |JOIN norms nb ON nb.label = d.label_b""".stripMargin,

    "q_embed_kmeans" ->
      s"""WITH $ivfRefinedCellCtesK16,
         |mem AS (SELECT c.cid, a.d2 FROM cells c
         |  JOIN asg a ON a.vid = c.vid AND a.cid = c.cid),
         |st AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
         |    CAST(SUM(CAST(d2 AS DECIMAL(28,6))) AS DOUBLE) AS inertia
         |  FROM mem GROUP BY 1)
         |SELECT cent.vec_id AS cent_id,
         |  COALESCE(st.n_members, CAST(0 AS BIGINT)) AS n_members,
         |  COALESCE(st.inertia, CAST(0.0 AS DOUBLE)) AS inertia
         |FROM cent LEFT JOIN st ON st.cid = cent.vec_id""".stripMargin,

    // Simplified silhouette over the same refined-IVF clustering as
    // q_embed_kmeans: per vector a2 = d2 to the nearest centroid,
    // b2 = d2 to the second-nearest (rank 2 under the identical
    // (d2, cid) tie order), s = (b2-a2)/max(a2,b2) with b2=0 -> 0;
    // per-cluster mean via DECIMAL(28,8) partial sums (2^53-exact
    // final conversion to 9e7 members), the exact Spark op order
    // (decimal sum -> double -> / n).
    "q_embed_silhouette" ->
      s"""WITH $ivfRefinedCellCtesK16,
         |two AS (SELECT vid, cid, d2,
         |    row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
         |  FROM asg),
         |ab AS (SELECT f.vid, f.cid, f.d2 AS a2, s.d2 AS b2
         |  FROM two f JOIN two s ON s.vid = f.vid AND s.rn = 2
         |  WHERE f.rn = 1),
         |sil AS (SELECT vid, cid,
         |    CASE WHEN b2 = 0 THEN CAST(0.0 AS DOUBLE)
         |         ELSE (b2 - a2) / GREATEST(a2, b2) END AS sil
         |  FROM ab),
         |st AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
         |    SUM(CAST(sil AS DECIMAL(28,8))) AS ssum
         |  FROM sil GROUP BY 1)
         |SELECT cent.vec_id AS cent_id,
         |  COALESCE(st.n_members, CAST(0 AS BIGINT)) AS n_members,
         |  CAST(st.ssum AS DOUBLE) / CAST(st.n_members AS DOUBLE)
         |    AS silhouette
         |FROM cent LEFT JOIN st ON st.cid = cent.vec_id""".stripMargin,

    // Equi-depth histogram: NTILE shares the SQL-standard definition
    // (first buckets get the remainder) in both engines; total order
    // (value, event_id) makes bucket assignment deterministic.
    "q_histogram_depth" ->
      """SELECT event_type, CAST(b AS INT) AS bucket, min(value) AS lo,
        |  max(value) AS hi, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT event_type, value,
        |    ntile(8) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS b
        |  FROM events)
        |GROUP BY 1, 2""".stripMargin,

    // OLAP rollup: grouping_id bit order is SQL-standard (first column =
    // MSB) in both engines; NULL subtotal keys match.
    "q_rollup" ->
      """WITH e AS (SELECT event_type,
        |    ((epoch_ns(ts) // 1000000000) // 86400) * 86400 AS day_s,
        |    value FROM events)
        |SELECT event_type, day_s,
        |  CAST(GROUPING(event_type, day_s) AS INT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY ROLLUP (event_type, day_s)""".stripMargin,

    // CUBE: all four grouping planes, same exact decimal sum and
    // GROUPING() id as the rollup oracle.
    "q_cube" ->
      """WITH e AS (SELECT event_type,
        |    ((epoch_ns(ts) // 1000000000) // 86400) * 86400 AS day_s,
        |    value FROM events)
        |SELECT event_type, day_s,
        |  CAST(GROUPING(event_type, day_s) AS INT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY CUBE (event_type, day_s)""".stripMargin,

    // First-touch attribution: first event type per user by (ts,
    // event_id), conversion = any purchase; rate = one double division.
    "q_attribution" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS r
        |  FROM events),
        |ft AS (SELECT user_id, event_type AS first_touch
        |  FROM seq WHERE r = 1),
        |conv AS (SELECT user_id,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS converted
        |  FROM events GROUP BY 1)
        |SELECT first_touch, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(converted) AS BIGINT) AS n_converted,
        |  CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conversion_rate
        |FROM ft JOIN conv USING (user_id) GROUP BY 1""".stripMargin,

    // Pivot over the enumerated event types: conditional counts; absent
    // combinations are 0 on both sides.
    "q_pivot_counts" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
        |    AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
        |    AS error,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
        |    AS purchase,
        |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
        |    AS signup,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
        |    AS view
        |FROM events GROUP BY 1""".stripMargin,

    // Trailing-window z-score: mean/variance from exact decimal running
    // sums, combined in the Spark-side double op order; < minPrior
    // evidence or σ = 0 → NULL z, never a flag.
    "q_anomaly_zscore" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |    epoch_ns(ts) // 1000000000 AS es FROM events),
        |w AS (SELECT event_id, user_id, es, value,
        |    count(value) OVER win AS n,
        |    CAST(sum(CAST(value AS DECIMAL(28,6))) OVER win AS DOUBLE)
        |      AS s,
        |    CAST(sum(CAST(value * value AS DECIMAL(28,6))) OVER win
        |      AS DOUBLE) AS ss
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY es
        |    RANGE BETWEEN 21600 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id, user_id, es AS epoch_s,
        |    CASE WHEN n >= 3 AND
        |        ss / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE)) *
        |          (s / CAST(n AS DOUBLE)) > 0
        |      THEN (value - s / CAST(n AS DOUBLE)) /
        |        sqrt(ss / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE)) *
        |          (s / CAST(n AS DOUBLE)))
        |    END AS z
        |  FROM w)
        |SELECT event_id, user_id, epoch_s, z,
        |  COALESCE(abs(z) >= 2.0, false) AS anomaly FROM z""".stripMargin,

    // Equi-width histogram: the bin index and bin edges are evaluated in
    // EXACTLY the Spark-side double operation order, so the engines are
    // IEEE-754 bit-equal; the top edge closes right (v == mx → last bin).
    "q_histogram" ->
      """WITH ext AS (SELECT event_type, min(value) AS mn, max(value) AS mx
        |  FROM events GROUP BY 1),
        |b AS (SELECT e.event_type,
        |    CASE WHEN ext.mx = ext.mn THEN 0
        |      ELSE CAST(least(floor((e.value - ext.mn) * 10 /
        |        (ext.mx - ext.mn)), 9) AS INT) END AS bin,
        |    ext.mn, ext.mx
        |  FROM events e JOIN ext USING (event_type))
        |SELECT event_type, bin,
        |  mn + bin * ((mx - mn) / 10) AS lo,
        |  mn + (bin + 1) * ((mx - mn) / 10) AS hi,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY event_type, bin, mn, mx""".stripMargin,

    // Cohort retention: first-activity week × week offset, distinct
    // users; epoch-week floor-division on both sides.
    // DAU + exact trailing-7-day WAU: distinct (day, user) pairs first,
    // then each pair explodes into the 7 window-END days it serves and
    // distinct-counts per end day; phantom trailing days semi-join away
    // against the real activity-day set.
    "q_wau_sliding" ->
      """WITH pairs AS (SELECT DISTINCT
        |    ((epoch_ns(ts) // 1000000000) // 86400) * 86400 AS day_s,
        |    user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day_s FROM pairs),
        |dau AS (SELECT day_s, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |    AS dau FROM pairs GROUP BY 1),
        |ex AS (SELECT p.user_id, p.day_s + 86400 * o.off AS day_s
        |  FROM pairs p, unnest(range(0, 7)) AS o(off)),
        |wau AS (SELECT e.day_s, CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
        |    AS wau
        |  FROM ex e JOIN days d ON d.day_s = e.day_s GROUP BY 1)
        |SELECT dau.day_s, dau.dau, wau.wau
        |FROM dau JOIN wau USING (day_s)""".stripMargin,

    // Markov transitions: consecutive event-type pairs per user, ordered
    // by (ts, event_id); P(next|prev) = one double division of two exact
    // longs.
    "q_event_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |pairs AS (SELECT prev_type, event_type AS next_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS total
        |  FROM pairs GROUP BY 1)
        |SELECT p.prev_type, p.next_type, p.n, t.total,
        |  CAST(p.n AS DOUBLE) / t.total AS prob
        |FROM pairs p JOIN tot t USING (prev_type)""".stripMargin,

    // CUSUM change point: argmax over t of |n·S_t − t·S_n| on scale-6
    // unscaled values — exact HUGEINT mirror of the engine's
    // DECIMAL(38,0) fold; ties to the earliest (ts, event_id); the
    // exact integer converts to double once, /1e6 back to value units.
    "q_change_point" ->
      """WITH d AS (SELECT event_type AS key, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS HUGEINT) AS v
        |  FROM events),
        |p AS (SELECT key, ts, event_id,
        |    SUM(v) OVER (PARTITION BY key ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS s,
        |    CAST(row_number() OVER (PARTITION BY key
        |      ORDER BY ts, event_id) AS HUGEINT) AS t,
        |    CAST(COUNT(*) OVER (PARTITION BY key) AS HUGEINT) AS n,
        |    SUM(v) OVER (PARTITION BY key) AS tt
        |  FROM d),
        |c AS (SELECT key, ts, event_id, abs(n * s - t * tt) AS a FROM p)
        |SELECT key, ts AS change_ts, CAST(a AS DOUBLE) / 1000000.0 AS score
        |FROM c QUALIFY row_number() OVER (PARTITION BY key
        |  ORDER BY a DESC, ts, event_id) = 1""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS es
        |  FROM events),
        |f AS (SELECT user_id, min(es) AS fs FROM e GROUP BY 1),
        |j AS (SELECT e.user_id,
        |    (f.fs // 604800) * 604800 AS cohort_week_s,
        |    CAST((e.es // 604800) - (f.fs // 604800) AS INT) AS week_offset
        |  FROM e JOIN f USING (user_id))
        |SELECT cohort_week_s, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY 1, 2""".stripMargin,

    // Funnel: the windowed conditional-min ladder — t_i = first step-i
    // µs strictly after t_{i-1}, counted per level.
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |w0 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t0
        |    THEN us END) OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t1
        |    THEN us END) OVER (PARTITION BY user_id) AS t2 FROM w1),
        |k AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
        |  FROM w2 GROUP BY 1),
        |t AS (SELECT CAST(count(t0) AS BIGINT) AS n0,
        |    CAST(count(t1) AS BIGINT) AS n1,
        |    CAST(count(t2) AS BIGINT) AS n2 FROM k)
        |SELECT CAST(0 AS INT) AS step, 'view' AS event_type, n0 AS n_keys
        |  FROM t
        |UNION ALL SELECT CAST(1 AS INT), 'click', n1 FROM t
        |UNION ALL SELECT CAST(2 AS INT), 'purchase', n2 FROM t"""
        .stripMargin,

    // Time-bounded funnel: q_funnel's chain with the conversion
    // deadline t0 + 3600 s conjoined onto every post-first level.
    "q_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |w0 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t0
        |    AND us <= t0 + 3600000000 THEN us END)
        |    OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t1
        |    AND us <= t0 + 3600000000 THEN us END)
        |    OVER (PARTITION BY user_id) AS t2 FROM w1),
        |k AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
        |  FROM w2 GROUP BY 1),
        |t AS (SELECT CAST(count(t0) AS BIGINT) AS n0,
        |    CAST(count(t1) AS BIGINT) AS n1,
        |    CAST(count(t2) AS BIGINT) AS n2 FROM k)
        |SELECT CAST(0 AS INT) AS step, 'view' AS event_type, n0 AS n_keys
        |  FROM t
        |UNION ALL SELECT CAST(1 AS INT), 'click', n1 FROM t
        |UNION ALL SELECT CAST(2 AS INT), 'purchase', n2 FROM t"""
        .stripMargin,

    // New vs returning daily actives: distinct (user, day) pairs, each
    // user's first day, per-day split; share = one double division.
    "q_user_growth" ->
      """WITH pairs AS (SELECT DISTINCT user_id,
        |    ((epoch_ns(ts) // 1000000000) // 86400) * 86400 AS day_s
        |  FROM events),
        |f AS (SELECT user_id, min(day_s) AS first_day
        |  FROM pairs GROUP BY 1)
        |SELECT day_s,
        |  CAST(SUM(CASE WHEN day_s = first_day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN day_s <> first_day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_returning,
        |  CAST(SUM(CASE WHEN day_s = first_day THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS new_share
        |FROM pairs JOIN f USING (user_id) GROUP BY 1""".stripMargin,

    // Funnel latencies: per adjacent step pair, converted keys and the
    // exact mean µs delta (decimal sum / count, combined in double).
    "q_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |w0 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t0
        |    THEN us END) OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t1
        |    THEN us END) OVER (PARTITION BY user_id) AS t2 FROM w1),
        |k AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
        |  FROM w2 GROUP BY 1),
        |t AS (SELECT
        |    CAST(count(CASE WHEN t1 IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n_1,
        |    sum(CAST(t1 - t0 AS DECIMAL(28,0))) AS s_1,
        |    CAST(count(CASE WHEN t2 IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n_2,
        |    sum(CAST(t2 - t1 AS DECIMAL(28,0))) AS s_2 FROM k)
        |SELECT CAST(1 AS INT) AS step, 'view' AS from_type,
        |  'click' AS to_type, n_1 AS n_converted,
        |  CAST(s_1 AS DOUBLE) / CAST(n_1 AS DOUBLE) AS mean_us FROM t
        |UNION ALL SELECT CAST(2 AS INT), 'click', 'purchase', n_2,
        |  CAST(s_2 AS DOUBLE) / CAST(n_2 AS DOUBLE) FROM t""".stripMargin,

    // Grouped top-k: row_number() is INT in Spark, BIGINT in DuckDB —
    // cast; order fully determined by (n DESC, user_id).
    "q_topk_users" ->
      """WITH c AS (SELECT event_type, user_id,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, n,
        |  CAST(row_number() OVER (PARTITION BY event_type
        |    ORDER BY n DESC, user_id) AS INT) AS rank
        |FROM c QUALIFY rank <= 5""".stripMargin,

    // Range join: plain theta join in DuckDB (its optimizer plans the
    // inequality natively); graft's bucketed-cell equi-join must produce
    // the identical pair set.
    "q_range_join" ->
      """WITH p AS (SELECT event_id, user_id,
        |    epoch_ns(ts) // 1000000000 AS epoch_s
        |  FROM events WHERE event_type = 'click'),
        |i AS (SELECT event_id AS interval_id, user_id,
        |    epoch_ns(ts) // 1000000000 AS lo,
        |    epoch_ns(ts) // 1000000000 + 21600 AS hi
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.epoch_s, i.interval_id
        |FROM p JOIN i ON p.user_id = i.user_id
        |  AND p.epoch_s >= i.lo AND p.epoch_s <= i.hi""".stripMargin,

    "q_x_concat_split" ->
      """SELECT c_custkey, CONCAT(c_name, ', ', c_custkey) AS combo,
        |  str_split(CONCAT(c_name, ', ', c_custkey), ', ')[2] AS part2
        |FROM customer""".stripMargin,

    "q_a6_distinct_count" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_w_lag_delta" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS epoch_us,
        |    value FROM events)
        |SELECT event_id, user_id,
        |  value - lag(value) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us, event_id) AS delta
        |FROM e""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS epoch_us
        |    FROM events),
        |  f AS (SELECT user_id, event_id, epoch_us,
        |    CASE WHEN lag(epoch_us) OVER w IS NULL
        |           OR epoch_us - lag(epoch_us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us, event_id)),
        |  g AS (SELECT user_id, event_id, epoch_us,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_id
        |    FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(epoch_us)//1000000 AS session_start_s
        |FROM g GROUP BY 1, 2""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |    AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS BIGINT) AS n_subwords
        |FROM documents""".stripMargin,

    "q_text_quality" ->
      s"""WITH base AS (SELECT doc_id, text, length(text) AS n_chars,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
         |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         |    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
         |    len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      x -> list_contains([$stopwordList], lower(x)))) AS n_stop
         |  FROM documents),
         |r AS (SELECT *,
         |    CAST(GREATEST(n_chars, 1) AS DOUBLE) AS safe_chars,
         |    CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS safe_toks
         |  FROM base),
         |m AS (SELECT doc_id,
         |    CAST(n_chars AS BIGINT) AS n_chars,
         |    CAST(n_tokens AS BIGINT) AS n_tokens,
         |    CAST(n_chars - (n_tokens - 1) AS DOUBLE) / safe_toks AS avg_token_len,
         |    CAST(n_punct AS DOUBLE) / safe_chars AS punct_ratio,
         |    CAST(n_digit AS DOUBLE) / safe_chars AS digit_ratio,
         |    CAST(n_upper AS DOUBLE) / safe_chars AS upper_ratio,
         |    CAST(n_stop AS DOUBLE) / safe_toks AS stopword_ratio
         |  FROM r)
         |SELECT doc_id, n_chars, n_tokens, avg_token_len, punct_ratio,
         |  digit_ratio, upper_ratio, stopword_ratio,
         |  LEAST(1.0, stopword_ratio * 2.0 +
         |    (CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 10.0
         |          THEN 0.5 ELSE 0.0 END)
         |    - punct_ratio - digit_ratio) AS quality_score
         |FROM m""".stripMargin,

    "q_text_langid" -> {
      val markers = graft.operators.TextAnalysis.defaultMarkers
      val langs = markers.keys.toSeq.sorted
      val scoreCols = langs.map { l =>
        val list = markers(l).map(w => s"'$w'").mkString(", ")
        s"""CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
           |      x -> list_contains([$list], x))) AS BIGINT) AS score_$l""".stripMargin
      }.mkString(",\n    ")
      val m = langs.map(l => s"score_$l").mkString(", ")
      val cases = langs.map(l => s"WHEN score_$l = m THEN '$l'").mkString(" ")
      s"""WITH s AS (SELECT doc_id, lang,
         |    $scoreCols
         |  FROM documents),
         |g AS (SELECT *, GREATEST($m) AS m FROM s)
         |SELECT doc_id, lang, score_de, score_en, score_es, score_fr, score_zh,
         |  CASE WHEN m = 0 THEN 'und' $cases END AS predicted_lang
         |FROM g""".stripMargin
    },

    // Winnowing fingerprints: md5_60 of every 8-char gram, min per
    // 4-gram window, distinct per doc.
    "q_text_winnow" ->
      """WITH g AS (SELECT doc_id,
        |    [('0x' || substring(md5(substr(text, i, 8)), 1, 15))::BIGINT
        |     for i in range(1, GREATEST(length(text) - 7, 1) + 1)] AS hs
        |  FROM documents)
        |SELECT doc_id, unnest(list_distinct(
        |    [list_min(hs[j:j+3]) for j in range(1, GREATEST(len(hs) - 3, 1) + 1)]))
        |  AS fp
        |FROM g""".stripMargin,

    "q_text_scrub" -> {
      val chain = graft.operators.TextAnalysis.scrubPatterns
        .foldLeft("text") { case (c, (p, repl)) =>
          s"regexp_replace($c, '$p', '$repl', 'g')"
        }
      val counts = graft.operators.TextAnalysis.scrubPatterns
        .map { case (p, _) => s"len(regexp_extract_all(text, '$p'))" }
        .mkString(" + ")
      s"""SELECT doc_id, $chain AS scrubbed,
         |  CAST($counts AS BIGINT) AS n_redactions
         |FROM documents""".stripMargin
    },

    // HTML→text extraction: the same fixed replace chain as
    // TextAnalysis.stripHtml — script/style/comments, tags, entities
    // (&lt;-family before &amp;), whitespace collapse.
    "q_text_strip_html" ->
      """SELECT doc_id, trim(regexp_replace(
        |  replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(text,
        |              '(?is)<script\b.*?</script\s*>', ' ', 'g'),
        |            '(?is)<style\b.*?</style\s*>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
        |    '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS stripped
        |FROM documents""".stripMargin,

    // Canonical normalization: control chars → space, collapse
    // whitespace, trim, lowercase.
    "q_text_normalize" ->
      """SELECT doc_id,
        |  lower(trim(regexp_replace(
        |    regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
        |    '\s+', ' ', 'g'))) AS normalized
        |FROM documents""".stripMargin,

    // Gopher rule flags: every bound is an integer cross-multiplication
    // (op order mirrors TextAnalysis.gopherRules); line rules count
    // '\n'-anchored occurrences over chr(10)-padded text instead of any
    // multiline regex flag.
    "q_text_gopher" -> {
      val reqCases = graft.operators.TextAnalysis.requiredStopwords
        .map(w => s"(CASE WHEN list_contains(lw, '$w') THEN 1 ELSE 0 END)")
        .mkString(" +\n         |      ")
      s"""WITH b AS (SELECT doc_id,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS n_words,
         |    CAST(length(regexp_replace(trim(text), '\\s+', '', 'g'))
         |      AS BIGINT) AS n_word_chars,
         |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
         |      AS BIGINT) AS n_symbols,
         |    CAST(CASE WHEN length(text) = 0 THEN 0
         |         ELSE 1 + len(regexp_extract_all(text, '\\n')) END
         |      AS BIGINT) AS n_lines,
         |    CAST(len(regexp_extract_all(chr(10) || text,
         |      '\\n[ \\t]*[-*•]')) AS BIGINT) AS n_bullet,
         |    CAST(len(regexp_extract_all(text || chr(10),
         |      '(\\.\\.\\.|…)[ \\t]*\\n')) AS BIGINT) AS n_ell,
         |    CAST(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*'))
         |      AS BIGINT) AS n_alpha,
         |    regexp_split_to_array(trim(lower(text)), '\\s+') AS lw
         |  FROM documents),
         |f AS (SELECT doc_id, n_words,
         |    n_words >= 50 AND n_words <= 100000 AS r_word_count,
         |    3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
         |      AS r_mean_word_len,
         |    10 * n_symbols <= n_words AS r_symbol_ratio,
         |    10 * n_bullet < 9 * n_lines AS r_bullet_lines,
         |    10 * n_ell < 3 * n_lines AS r_ellipsis_lines,
         |    10 * n_alpha >= 8 * n_words AS r_alpha_words,
         |    ($reqCases) >= 2 AS r_stopwords
         |  FROM b)
         |SELECT doc_id, n_words, r_word_count, r_mean_word_len,
         |  r_symbol_ratio, r_bullet_lines, r_ellipsis_lines, r_alpha_words,
         |  r_stopwords,
         |  r_word_count AND r_mean_word_len AND r_symbol_ratio AND
         |  r_bullet_lines AND r_ellipsis_lines AND r_alpha_words AND
         |  r_stopwords AS keep
         |FROM f""".stripMargin
    },

    // BPE round-1 pair statistics: distinct-word frequencies, adjacent
    // char pairs weighted by word count, top-30 by (count desc, pair).
    "q_text_bpe_pairs" ->
      """WITH wc AS (SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wcount
        |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |        FROM documents)
        |  WHERE length(w) > 0 GROUP BY 1),
        |p AS (SELECT substring(word, i, 1) AS l,
        |    substring(word, i + 1, 1) AS r, wcount
        |  FROM (SELECT word, wcount,
        |        unnest(generate_series(1, length(word) - 1)) AS i
        |        FROM wc WHERE length(word) >= 2)),
        |g AS (SELECT l AS "left", r AS "right",
        |    CAST(SUM(wcount) AS BIGINT) AS pair_count
        |  FROM p GROUP BY 1, 2)
        |SELECT "left", "right", pair_count,
        |  CAST(row_number() OVER (ORDER BY pair_count DESC, "left", "right")
        |    AS BIGINT) AS rank
        |FROM g ORDER BY pair_count DESC, "left", "right" LIMIT 30"""
        .stripMargin,

    // BPE encode under TextAnalysis.referenceMerges: the same sentinel
    // replace-chain as the engine — chr(1)-delimited symbols, one
    // non-overlapping replace per rank — then tokens = chr(1)chr(1)
    // splits, summed per doc (empty docs keep a 0 row).
    "q_text_bpe_encode" ->
      s"""WITH $bpePerDocCtes
         |SELECT d.doc_id,
         |  COALESCE(s.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
         |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,

    // Repetition signals: duplicate word/bigram/trigram fractions via the
    // same shingle definition as the dedup family (short docs: 1 shingle,
    // fraction 0).
    "q_text_repetition" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
         |c AS (SELECT doc_id, len(words) AS nt,
         |    CASE WHEN len(words) < 1 THEN 1 ELSE len(words) END AS t1,
         |    CASE WHEN len(words) < 2 THEN 1 ELSE len(words) - 1 END AS t2,
         |    CASE WHEN len(words) < 3 THEN 1 ELSE len(words) - 2 END AS t3,
         |    len(${shingleExpr(1)}) AS d1,
         |    len(${shingleExpr(2)}) AS d2,
         |    len(${shingleExpr(3)}) AS d3
         |  FROM w)
         |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
         |  CAST(t1 - d1 AS DOUBLE) / t1 AS dup_word_fraction,
         |  CAST(t2 - d2 AS DOUBLE) / t2 AS dup_bigram_fraction,
         |  CAST(t3 - d3 AS DOUBLE) / t3 AS dup_trigram_fraction
         |FROM c""".stripMargin,

    // Context-window chunking: 32-token windows, stride 24 (overlap 8),
    // 1-based slices; chunk ids are 0-based window ordinals.
    "q_chunk_windows" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
        |c AS (SELECT doc_id,
        |    [array_to_string(words[s:s+31], ' ')
        |     for s in range(1, GREATEST(len(words), 1) + 1, 24)] AS chunks
        |  FROM w),
        |u AS (SELECT doc_id, generate_subscripts(chunks, 1) - 1 AS chunk_id,
        |    unnest(chunks) AS chunk_text FROM c)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk_text,
        |  CAST(CASE WHEN length(chunk_text) = 0 THEN 0
        |       ELSE len(string_split(chunk_text, ' ')) END AS BIGINT)
        |    AS n_chunk_tokens
        |FROM u""".stripMargin,

    // Vocabulary top-k: global token frequencies, ties broken on the
    // token string (binary UTF-8 order in both engines).
    // Cross-corpus contamination: train split (doc_id % 4 <> 0) probed
    // against the eval split (doc_id % 4 = 0); both shingle sets are
    // distinct, so the postings join counts |A ∩ B| directly;
    // containment = n_common / |eval shingle set|.
    "q_decontaminate" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
         |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(3)}) AS shingle FROM w),
         |pr AS (SELECT id AS probe_id, shingle FROM sh WHERE id % 4 = 0),
         |psz AS (SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS probe_size
         |  FROM pr GROUP BY 1),
         |tr AS (SELECT id AS train_id, shingle FROM sh WHERE id % 4 <> 0),
         |j AS (SELECT train_id, probe_id, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM tr JOIN pr USING (shingle) GROUP BY 1, 2)
         |SELECT train_id, probe_id, n_common,
         |  CAST(n_common AS DOUBLE) / CAST(probe_size AS DOUBLE) AS containment
         |FROM j JOIN psz USING (probe_id)
         |WHERE n_common >= 2""".stripMargin,

    // q_decontaminate with canonical normalization composed upstream:
    // both splits shingle the normalized text (same chain as
    // q_text_normalize), everything else identical.
    "q_decontaminate_norm" ->
      s"""WITH nrm AS (SELECT doc_id,
         |    lower(trim(regexp_replace(
         |      regexp_replace(text, '[\\x00-\\x1f\\x7f]', ' ', 'g'),
         |      '\\s+', ' ', 'g'))) AS text
         |  FROM documents),
         |w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words FROM nrm),
         |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(3)}) AS shingle FROM w),
         |pr AS (SELECT id AS probe_id, shingle FROM sh WHERE id % 4 = 0),
         |psz AS (SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS probe_size
         |  FROM pr GROUP BY 1),
         |tr AS (SELECT id AS train_id, shingle FROM sh WHERE id % 4 <> 0),
         |j AS (SELECT train_id, probe_id, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM tr JOIN pr USING (shingle) GROUP BY 1, 2)
         |SELECT train_id, probe_id, n_common,
         |  CAST(n_common AS DOUBLE) / CAST(probe_size AS DOUBLE) AS containment
         |FROM j JOIN psz USING (probe_id)
         |WHERE n_common >= 2""".stripMargin,

    // Deterministic shard export: shard = md5_60(doc_id) mod 8 (the hash
    // is non-negative by construction, so % == pmod), position = hash
    // order within the shard.
    "q_export_shards" ->
      """WITH h AS (SELECT doc_id, lang,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS hk
        |  FROM documents)
        |SELECT doc_id, lang, hk % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY hk % 8 ORDER BY hk, doc_id)
        |    AS BIGINT) AS position
        |FROM h""".stripMargin,

    // Greedy token-budget packing in shard-local hash order: bin =
    // exclusive running token total // 512 (both engines' integer
    // division truncates identically on the non-negative totals).
    "q_export_pack" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS BIGINT) AS n_tokens,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS hk
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens, hk, hk % 4 AS shard,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY hk % 4
        |      ORDER BY hk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_excl
        |  FROM t)
        |SELECT doc_id, n_tokens, shard, cum_excl // 512 AS bin,
        |  CAST(row_number() OVER (PARTITION BY shard, cum_excl // 512
        |    ORDER BY hk, doc_id) AS BIGINT) AS bin_pos
        |FROM c""".stripMargin,

    "q_vocab_topk" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS token FROM documents),
        |f AS (SELECT token, COUNT(*) AS freq FROM t
        |  WHERE length(token) > 0 GROUP BY 1)
        |SELECT token, CAST(freq AS BIGINT) AS freq,
        |  CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
        |    AS rank
        |FROM f QUALIFY rank <= 100""".stripMargin,

    // PMI collocations: pmi_qb = qb(c_a,N_ug) + qb(c_b,N_ug) −
    // qb(c_ab,N_bg) with qb(a,b) = floor(4·log2(b/a)) stated as
    // bitlen(⌊b⁴/a⁴⌋)−1 in HUGEINT — the same per-term floors Spark's
    // log2_quarter_bits kernel computes; min pair count 5.
    "q_text_collocations" ->
      """WITH doc AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
        |bg AS (SELECT arr[i] AS w1, arr[i + 1] AS w2
        |  FROM doc, unnest(range(1, len(arr))) AS t(i)
        |  WHERE len(arr) >= 2),
        |nbg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bg FROM bg),
        |tok AS (SELECT unnest(arr) AS w FROM doc),
        |tok2 AS (SELECT w FROM tok WHERE length(w) > 0),
        |nug AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ug FROM tok2),
        |ug AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok2
        |  GROUP BY 1),
        |pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |s AS (SELECT w1, w2, c_ab,
        |    (length(bin((CAST(n_ug AS HUGEINT) * n_ug * n_ug * n_ug)
        |       // (CAST(ua.c AS HUGEINT) * ua.c * ua.c * ua.c))) - 1)
        |    + (length(bin((CAST(n_ug AS HUGEINT) * n_ug * n_ug * n_ug)
        |       // (CAST(ub.c AS HUGEINT) * ub.c * ub.c * ub.c))) - 1)
        |    - (length(bin((CAST(n_bg AS HUGEINT) * n_bg * n_bg * n_bg)
        |       // (CAST(c_ab AS HUGEINT) * c_ab * c_ab * c_ab))) - 1)
        |      AS pmi_qb
        |  FROM pc JOIN ug ua ON ua.w = pc.w1 JOIN ug ub ON ub.w = pc.w2
        |  CROSS JOIN nug CROSS JOIN nbg)
        |SELECT w1, w2, c_ab, CAST(pmi_qb AS BIGINT) AS pmi_qb,
        |  CAST(row_number() OVER (ORDER BY pmi_qb DESC, w1, w2) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 20""".stripMargin,

    // Edit-distance-1 fuzzy pairs in the top-200 char-5-gram vocabulary:
    // the oracle deliberately BRUTE-FORCES all pairs with levenshtein —
    // an exact-match against Spark's FastSS deletion-neighborhood
    // blocking independently proves the blocking is lossless.
    "q_vocab_fuzzy" ->
      """WITH t AS (SELECT substr(text, i, 5) AS token
        |  FROM documents,
        |    unnest(range(1, GREATEST(length(text) - 4, 1) + 1)) AS u(i)),
        |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM t
        |  WHERE length(token) > 0 GROUP BY 1),
        |v AS (SELECT token, freq FROM f
        |  ORDER BY freq DESC, token LIMIT 200),
        |p AS (SELECT a.token AS tok_a, b.token AS tok_b,
        |    a.freq AS freq_a, b.freq AS freq_b
        |  FROM v a JOIN v b ON a.token < b.token
        |  WHERE levenshtein(a.token, b.token) = 1)
        |SELECT tok_a, tok_b, freq_a, freq_b,
        |  CASE WHEN freq_a >= freq_b THEN tok_a ELSE tok_b END AS survivor
        |FROM p""".stripMargin,

    // linear-classifier inference: top-100-vocab weight table with
    // md5_60-derived milli-weights, exact integer logit per doc
    "q_text_linear" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |tok AS (SELECT doc_id, token FROM t WHERE length(token) > 0),
        |f AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY 1),
        |v AS (SELECT token,
        |    CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
        |      AS rank FROM f QUALIFY rank <= 100),
        |w AS (SELECT token,
        |    ('0x' || substring(md5(token), 1, 15))::BIGINT % 2001 - 1000
        |      AS w_milli FROM v),
        |s AS (SELECT tok.doc_id, COALESCE(SUM(w.w_milli), 0) AS sw
        |  FROM tok LEFT JOIN w USING (token) GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(s.sw, 0) + 50 AS BIGINT) AS logit_milli,
        |  (COALESCE(s.sw, 0) + 50) > 0 AS keep
        |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,

    // heavy-hitter arm: exact recount of Misra-Gries candidates ==
    // the exact top-k whenever f_k > support*N — same SQL
    "q_vocab_heavy" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS token FROM documents),
        |f AS (SELECT token, COUNT(*) AS freq FROM t
        |  WHERE length(token) > 0 GROUP BY 1)
        |SELECT token, CAST(freq AS BIGINT) AS freq,
        |  CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
        |    AS rank
        |FROM f QUALIFY rank <= 100""".stripMargin,

    // Corpus profile: per (lang, source) — counts, char totals/extremes,
    // EXACT discrete median via cumulative counts over (group, size)
    // buckets, and each group's share of the corpus.
    // Single window pipeline (mirrors the operator's one-branch plan):
    // no join on the group keys, so NULL lang/source groups survive —
    // window PARTITION BY groups NULLs together in both engines.
    "q_profile_corpus" ->
      """WITH byval AS (SELECT lang, source, n_chars, COUNT(*) AS cnt
        |  FROM documents GROUP BY 1, 2, 3),
        |cum AS (SELECT *,
        |    SUM(cnt) OVER (PARTITION BY lang, source ORDER BY n_chars) AS cum,
        |    SUM(cnt) OVER (PARTITION BY lang, source) AS n_docs,
        |    SUM(n_chars * cnt) OVER (PARTITION BY lang, source) AS total_chars,
        |    MIN(n_chars) OVER (PARTITION BY lang, source) AS min_chars,
        |    MAX(n_chars) OVER (PARTITION BY lang, source) AS max_chars
        |  FROM byval),
        |m AS (SELECT * FROM cum
        |  WHERE cum >= (n_docs + 1) // 2 AND cum - cnt < (n_docs + 1) // 2)
        |SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(total_chars AS BIGINT) AS total_chars, min_chars, max_chars,
        |  n_chars AS median_chars,
        |  CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS share
        |FROM m""".stripMargin,

    "q_text_fingerprint" ->
      s"""WITH w AS (SELECT doc_id, md5(text) AS md5_fp,
         |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents)
         |SELECT doc_id, md5_fp,
         |  list_min(list_transform(${shingleExpr(5)}, s -> md5(s))) AS min_shingle_fp
         |FROM w""".stripMargin,

    // Quality gate (score >= 0.3, same formula as q_text_quality) →
    // exact dedup among the gated docs (min-id survivor) → hash sample.
    // Per-language quality budget: quality score (same formula as
    // q_text_quality) → top-25 per lang by (score desc, doc_id).
    "q_curation_topk" ->
      s"""WITH base AS (SELECT doc_id, lang, text, length(text) AS n_chars,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
         |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         |    len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      x -> list_contains([$stopwordList], lower(x)))) AS n_stop
         |  FROM documents),
         |r AS (SELECT *,
         |    CAST(GREATEST(n_chars, 1) AS DOUBLE) AS safe_chars,
         |    CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS safe_toks
         |  FROM base),
         |m AS (SELECT doc_id, lang,
         |    CAST(n_chars - (n_tokens - 1) AS DOUBLE) / safe_toks AS avg_token_len,
         |    CAST(n_punct AS DOUBLE) / safe_chars AS punct_ratio,
         |    CAST(n_digit AS DOUBLE) / safe_chars AS digit_ratio,
         |    CAST(n_stop AS DOUBLE) / safe_toks AS stopword_ratio
         |  FROM r),
         |scored AS (SELECT doc_id, lang,
         |    LEAST(1.0, stopword_ratio * 2.0 +
         |      (CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 10.0
         |            THEN 0.5 ELSE 0.0 END)
         |      - punct_ratio - digit_ratio) AS quality_score
         |  FROM m)
         |SELECT doc_id, lang, quality_score,
         |  CAST(row_number() OVER
         |    (PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS BIGINT)
         |    AS quality_rank
         |FROM scored QUALIFY quality_rank <= 25""".stripMargin,

    "q_curation_pipeline" ->
      s"""WITH base AS (SELECT doc_id, text, length(text) AS n_chars,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
         |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         |    len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      x -> list_contains([$stopwordList], lower(x)))) AS n_stop
         |  FROM documents),
         |r AS (SELECT *,
         |    CAST(GREATEST(n_chars, 1) AS DOUBLE) AS safe_chars,
         |    CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS safe_toks
         |  FROM base),
         |m AS (SELECT doc_id, text,
         |    CAST(n_chars - (n_tokens - 1) AS DOUBLE) / safe_toks AS avg_token_len,
         |    CAST(n_punct AS DOUBLE) / safe_chars AS punct_ratio,
         |    CAST(n_digit AS DOUBLE) / safe_chars AS digit_ratio,
         |    CAST(n_stop AS DOUBLE) / safe_toks AS stopword_ratio
         |  FROM r),
         |scored AS (SELECT doc_id, text,
         |    LEAST(1.0, stopword_ratio * 2.0 +
         |      (CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 10.0
         |            THEN 0.5 ELSE 0.0 END)
         |      - punct_ratio - digit_ratio) AS quality_score
         |  FROM m),
         |gated AS (SELECT * FROM scored WHERE quality_score >= 0.3),
         |k AS (SELECT md5(text) AS cmd5, MIN(doc_id) AS keep_id
         |      FROM gated GROUP BY 1)
         |SELECT doc_id, quality_score
         |FROM gated JOIN k ON md5(gated.text) = k.cmd5
         |  AND gated.doc_id = k.keep_id
         |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |  < ${graft.operators.Sampling.rateThreshold(0.5)}""".stripMargin,

    // Deterministic sampling: hash draw = md5_60 of the key string.
    "q_sample_uniform" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |  < ${graft.operators.Sampling.rateThreshold(0.25)}""".stripMargin,

    "q_sample_stratified" ->
      """WITH h AS (SELECT doc_id, lang,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CAST(row_number() OVER
        |    (PARTITION BY lang ORDER BY hk, doc_id) AS BIGINT) AS sample_rank
        |FROM h QUALIFY sample_rank <= 40""".stripMargin,

    // Exactly-k sample: the 200 smallest (md5_60(id), id) draws.
    "q_sample_fixed" ->
      """WITH h AS (SELECT doc_id, lang,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT)
        |    AS sample_rank
        |FROM h ORDER BY hk, doc_id LIMIT 200""".stripMargin,

    // Median/MAD robust outliers per event type: medians via
    // quantile_cont (bit-equal to Spark's exact percentile), score
    // arithmetic in fixed IEEE op order; mad = 0 → robust_z NULL and
    // any deviation flags.
    "q_profile_outliers" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |d AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |    ABS(e.value - m.med) AS dev
        |  FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value, d.med, md.mad,
        |  CASE WHEN md.mad > 0 THEN (d.value - d.med) / md.mad END
        |    AS robust_z,
        |  ABS(d.value - d.med) > 3.0 * md.mad AS is_outlier
        |FROM d JOIN md USING (event_type)""".stripMargin,

    // C4-style span excision: non-overlapping 8-word blocks, global
    // first occurrence by (doc_id, block_no) keeps, every other copy is
    // cut; surviving blocks re-join in order (single spaces). Docs with
    // every block removed return empty text.
    "q_dedup_span" ->
      """WITH w AS (SELECT doc_id, trim(text) AS t,
        |    regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |w2 AS (SELECT doc_id, ws,
        |    CASE WHEN len(t) = 0 THEN 0 ELSE len(ws) END AS nw FROM w),
        |b AS (SELECT doc_id, ws, nw,
        |    unnest(generate_series(0, (nw + 7) // 8 - 1)) AS block_no
        |  FROM w2 WHERE nw > 0),
        |b2 AS (SELECT doc_id, block_no,
        |    array_to_string(ws[block_no * 8 + 1 : least(block_no * 8 + 8, nw)],
        |      ' ') AS span
        |  FROM b),
        |f AS (SELECT doc_id, block_no, span,
        |    row_number() OVER (PARTITION BY md5(span)
        |      ORDER BY doc_id, block_no) = 1 AS keep
        |  FROM b2),
        |r AS (SELECT doc_id,
        |    string_agg(CASE WHEN keep THEN span END, ' ' ORDER BY block_no)
        |      AS text,
        |    CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_removed
        |  FROM f GROUP BY 1)
        |SELECT d.doc_id, COALESCE(r.text, '') AS text,
        |  COALESCE(r.n_removed, CAST(0 AS BIGINT)) AS n_removed
        |FROM documents d LEFT JOIN r USING (doc_id)""".stripMargin,

    // Paragraph-level dedup: q_dedup_span's digest/first-occurrence/
    // rebuild chain over \n\n-delimited natural blocks instead of fixed
    // 8-word spans; the rebuild joiner is the same two-newline
    // delimiter (chr(10) twice — DuckDB standard strings don't process
    // backslash escapes outside regex arguments).
    "q_dedup_paragraph" ->
      """WITH p AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(text, '\n\n')) AS span,
        |    generate_subscripts(regexp_split_to_array(text, '\n\n'), 1) - 1
        |      AS block_no
        |  FROM documents WHERE length(text) > 0),
        |f AS (SELECT doc_id, block_no, span,
        |    row_number() OVER (PARTITION BY md5(span)
        |      ORDER BY doc_id, block_no) = 1 AS keep
        |  FROM p),
        |r AS (SELECT doc_id,
        |    string_agg(CASE WHEN keep THEN span END, chr(10) || chr(10)
        |      ORDER BY block_no) AS text,
        |    CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_removed
        |  FROM f GROUP BY 1)
        |SELECT d.doc_id, COALESCE(r.text, '') AS text,
        |  COALESCE(r.n_removed, CAST(0 AS BIGINT)) AS n_removed
        |FROM documents d LEFT JOIN r USING (doc_id)""".stripMargin,

    // Corpus duplication telemetry: the q_dedup_span block/keep chain
    // aggregated to one row of totals + fraction.
    "q_dedup_span_profile" ->
      """WITH w AS (SELECT doc_id, trim(text) AS t,
        |    regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |w2 AS (SELECT doc_id, ws,
        |    CASE WHEN len(t) = 0 THEN 0 ELSE len(ws) END AS nw FROM w),
        |b AS (SELECT doc_id, ws, nw,
        |    unnest(generate_series(0, (nw + 7) // 8 - 1)) AS block_no
        |  FROM w2 WHERE nw > 0),
        |b2 AS (SELECT doc_id, block_no,
        |    array_to_string(ws[block_no * 8 + 1 : least(block_no * 8 + 8, nw)],
        |      ' ') AS span
        |  FROM b),
        |f AS (SELECT doc_id, block_no,
        |    row_number() OVER (PARTITION BY md5(span)
        |      ORDER BY doc_id, block_no) = 1 AS keep
        |  FROM b2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dup_blocks,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_with_blocks,
        |  CAST(COUNT(DISTINCT CASE WHEN NOT keep THEN doc_id END)
        |    AS BIGINT) AS n_docs_affected,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS dup_fraction
        |FROM f""".stripMargin,

    // Span-level decontamination: same 8-word block machinery as
    // q_dedup_span, but a train block (doc_id % 4 <> 0) is cut when its
    // text occurs as ANY eval-split block (doc_id % 4 = 0); all train
    // docs come back rewritten.
    "q_decontaminate_span" ->
      """WITH w AS (SELECT doc_id, trim(text) AS t,
        |    regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |w2 AS (SELECT doc_id, ws,
        |    CASE WHEN len(t) = 0 THEN 0 ELSE len(ws) END AS nw FROM w),
        |b AS (SELECT doc_id, ws, nw,
        |    unnest(generate_series(0, (nw + 7) // 8 - 1)) AS block_no
        |  FROM w2 WHERE nw > 0),
        |b2 AS (SELECT doc_id, block_no,
        |    array_to_string(ws[block_no * 8 + 1 : least(block_no * 8 + 8, nw)],
        |      ' ') AS span
        |  FROM b),
        |ev AS (SELECT DISTINCT md5(span) AS h FROM b2 WHERE doc_id % 4 = 0),
        |f AS (SELECT doc_id, block_no, span,
        |    md5(span) NOT IN (SELECT h FROM ev) AS keep
        |  FROM b2 WHERE doc_id % 4 <> 0),
        |r AS (SELECT doc_id,
        |    string_agg(CASE WHEN keep THEN span END, ' ' ORDER BY block_no)
        |      AS text,
        |    CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_removed
        |  FROM f GROUP BY 1)
        |SELECT d.doc_id, COALESCE(r.text, '') AS text,
        |  COALESCE(r.n_removed, CAST(0 AS BIGINT)) AS n_removed
        |FROM documents d LEFT JOIN r USING (doc_id)
        |WHERE d.doc_id % 4 <> 0""".stripMargin,

    // Mixture resampling: per-lang rate r = copies + fraction; a row
    // repeats floor(r) times plus once more when its md5_60 draw falls
    // below fraction * 2^60 (thresholds below are exact: 2^59 = 0.5,
    // 2^58 = 0.25 of the 2^60 hash space). Unlisted langs drop.
    "q_sample_mixture" ->
      """WITH r(g, copies, thr) AS (VALUES
        |  ('en', CAST(1 AS BIGINT), CAST(576460752303423488 AS BIGINT)),
        |  ('fr', CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('de', CAST(0 AS BIGINT), CAST(576460752303423488 AS BIGINT)),
        |  ('es', CAST(0 AS BIGINT), CAST(288230376151711744 AS BIGINT)),
        |  ('zh', CAST(2 AS BIGINT), CAST(0 AS BIGINT))),
        |j AS (SELECT d.doc_id, d.lang, r.copies +
        |    CASE WHEN ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),
        |      1, 15))::BIGINT < r.thr THEN 1 ELSE 0 END AS n
        |  FROM documents d JOIN r ON d.lang = r.g)
        |SELECT doc_id, lang,
        |  CAST(unnest(generate_series(0, n - 1)) AS BIGINT) AS epoch
        |FROM j WHERE n > 0""".stripMargin,

    // Temperature mixture at α = 1/2: rate_g = 0.5 * sqrt(n_max / n_g)
    // (sqrt is IEEE correctly-rounded on both engines; op order mirrors
    // Sampling.temperatureSample exactly), then the same copies +
    // fractional-draw multiplicity as q_sample_mixture.
    "q_sample_temperature" ->
      """WITH c AS (SELECT lang AS g, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |m AS (SELECT MAX(n) AS n_max FROM c),
        |r AS (SELECT g,
        |    0.5 * sqrt(CAST(n_max AS DOUBLE) / CAST(n AS DOUBLE)) AS rate
        |  FROM c CROSS JOIN m),
        |r2 AS (SELECT g, CAST(floor(rate) AS BIGINT) AS copies,
        |    CAST(floor((rate - floor(rate)) * 1152921504606846976.0)
        |      AS BIGINT) AS thr
        |  FROM r),
        |j AS (SELECT d.doc_id, d.lang, r2.copies +
        |    CASE WHEN ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),
        |      1, 15))::BIGINT < r2.thr THEN 1 ELSE 0 END AS n
        |  FROM documents d JOIN r2 ON d.lang = r2.g)
        |SELECT doc_id, lang,
        |  CAST(unnest(generate_series(0, n - 1)) AS BIGINT) AS epoch
        |FROM j WHERE n > 0""".stripMargin,

    // Per-language token budget: greedy admission in (md5_60(id), id)
    // hash order while the PRECEDING cumulative token count is under
    // 2000 — the crossing doc is kept (soft cap).
    "q_curation_token_budget" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS BIGINT) AS n_tokens,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS hk
        |  FROM documents),
        |w AS (SELECT doc_id, lang, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY hk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, lang, n_tokens, tokens_before
        |FROM w WHERE tokens_before < 2000""".stripMargin,

    // Histogram-ECDF calibration of quality_score (same formula as
    // q_text_quality) into 64 equi-width buckets between corpus
    // min/max; cum_lt = exact count in strictly-lower buckets. Bucket
    // op order mirrors Curation.calibrateScores:
    // (s - lo) * 64.0 / (hi - lo), floored, clamped to 63.
    "q_curation_calibrate" ->
      s"""WITH base AS (SELECT doc_id, text, length(text) AS n_chars,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
         |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         |    len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      x -> list_contains([$stopwordList], lower(x)))) AS n_stop
         |  FROM documents),
         |r AS (SELECT *,
         |    CAST(GREATEST(n_chars, 1) AS DOUBLE) AS safe_chars,
         |    CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS safe_toks
         |  FROM base),
         |m AS (SELECT doc_id,
         |    CAST(n_chars - (n_tokens - 1) AS DOUBLE) / safe_toks AS avg_token_len,
         |    CAST(n_punct AS DOUBLE) / safe_chars AS punct_ratio,
         |    CAST(n_digit AS DOUBLE) / safe_chars AS digit_ratio,
         |    CAST(n_stop AS DOUBLE) / safe_toks AS stopword_ratio
         |  FROM r),
         |q AS (SELECT doc_id,
         |    LEAST(1.0, stopword_ratio * 2.0 +
         |      (CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 10.0
         |            THEN 0.5 ELSE 0.0 END)
         |      - punct_ratio - digit_ratio) AS quality_score
         |  FROM m),
         |ext AS (SELECT MIN(quality_score) AS lo, MAX(quality_score) AS hi
         |  FROM q),
         |b AS (SELECT doc_id, quality_score,
         |    CASE WHEN hi = lo THEN 0
         |         ELSE LEAST(63, CAST(floor(
         |           (quality_score - lo) * 64.0 / (hi - lo)) AS INTEGER))
         |    END AS bucket
         |  FROM q CROSS JOIN ext),
         |g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM b GROUP BY 1),
         |c AS (SELECT bucket,
         |    CAST(COALESCE(SUM(cnt) OVER (ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_lt,
         |    CAST(SUM(cnt) OVER () AS BIGINT) AS n_total
         |  FROM g)
         |SELECT b.doc_id, b.quality_score, b.bucket, c.cum_lt, c.n_total
         |FROM b JOIN c USING (bucket)""".stripMargin,

    "q_dedup_exact" ->
      """WITH d AS (SELECT doc_id, md5(text) AS content_md5 FROM documents),
        |g AS (SELECT content_md5, COUNT(*) AS dup_count, MIN(doc_id) AS keep_id
        |      FROM d GROUP BY 1)
        |SELECT doc_id, d.content_md5, dup_count, keep_id,
        |  doc_id = keep_id AS keep
        |FROM d JOIN g USING (content_md5)""".stripMargin,

    // Exact dedup over NORMALIZED text (control-char strip, whitespace
    // collapse, trim, lowercase — same chain as q_text_normalize).
    "q_dedup_normalized" ->
      """WITH n AS (SELECT doc_id,
        |    lower(trim(regexp_replace(
        |      regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
        |      '\s+', ' ', 'g'))) AS text
        |  FROM documents),
        |d AS (SELECT doc_id, md5(text) AS content_md5 FROM n),
        |g AS (SELECT content_md5, COUNT(*) AS dup_count, MIN(doc_id) AS keep_id
        |      FROM d GROUP BY 1)
        |SELECT doc_id, dup_count, keep_id, doc_id = keep_id AS keep
        |FROM d JOIN g USING (content_md5)""".stripMargin,

    "q_dedup_ngram_jaccard" -> ngramJaccardSql(0.10),

    // The prefix-filtered operator is output-equivalent to the full
    // postings join (prefix filtering is lossless — proven by test), so
    // its oracle is the same declarative pair query at its threshold.
    "q_dedup_ngram_prefix" -> ngramJaccardSql(0.5),
    // salted-path variant: maxDocFreq only partitions work, never changes
    // results — the oracle is the SAME exact-Jaccard SQL
    "q_dedup_prefix_salted" -> ngramJaccardSql(0.5),

    // Same lossless prefix-filter operator at 5-word shingles — the
    // width a saturated/tiny-vocab corpus needs so the shingle universe
    // stays sparse relative to the corpus (the sf1 rehearsal pathology;
    // see SCALE.md). Oracle = the brute Jaccard truth, as for all
    // prefix forms (the filter is lossless).
    "q_dedup_prefix_w5" -> ngramJaccardSql(0.5, width = 5),

    // Winnowing near-dup pairs at (k=24, w=8): winnowed fingerprint
    // selection (min of each 8-window over char-24-gram md5_60 hashes,
    // distinct per doc), then a postings self-join on fp. Docs sharing
    // >= 2 fingerprints AND fingerprint-set Jaccard >= 0.5 are pairs;
    // fingerprints in > 10000 docs pruned as in the Spark maxDocFreq
    // cap; set sizes from the UNpruned per-doc sets.
    "q_dedup_winnow_pairs" ->
      s"""WITH $winnowPairCtes
        |SELECT id_a, id_b, n_common, jaccard_fp FROM wpairs""".stripMargin,

    // The winnowing dedup story composed end to end: winnowed
    // fingerprint pairs -> connected components (recursive min-label
    // reachability) -> survivors only, mirroring q_dedup_apply.
    "q_dedup_winnow_apply" ->
      s"""WITH RECURSIVE $winnowPairCtes,
         |edges AS (SELECT id_a AS src, id_b AS dst FROM wpairs
         |  UNION SELECT id_b, id_a FROM wpairs),
         |reach(id, lab) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
         |labels AS (SELECT id, MIN(lab) AS component FROM reach GROUP BY 1)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM labels WHERE component <> id)"""
        .stripMargin,

    // Connected components over the t>=0.10 Jaccard pair graph via
    // recursive min-label reachability.
    "q_dedup_components" ->
      s"""WITH RECURSIVE
         |w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
         |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(3)}) AS shingle FROM w),
         |sizes AS (SELECT id, COUNT(*) AS set_size FROM sh GROUP BY 1),
         |inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |  WHERE a.id < b.id GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.id = id_a
         |  JOIN sizes sb ON sb.id = id_b
         |  WHERE CAST(n_common AS DOUBLE)
         |      / CAST(sa.set_size + sb.set_size - n_common AS DOUBLE) >= 0.10),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, lab) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
         |SELECT id, CAST(MIN(lab) AS BIGINT) AS component
         |FROM reach GROUP BY 1""".stripMargin,

    // The decision applied: corpus minus every doc whose component
    // label is not its own id (same recursive reachability as above).
    "q_dedup_apply" ->
      s"""WITH RECURSIVE
         |w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
         |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(3)}) AS shingle FROM w),
         |sizes AS (SELECT id, COUNT(*) AS set_size FROM sh GROUP BY 1),
         |inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |  WHERE a.id < b.id GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.id = id_a
         |  JOIN sizes sb ON sb.id = id_b
         |  WHERE CAST(n_common AS DOUBLE)
         |      / CAST(sa.set_size + sb.set_size - n_common AS DOUBLE) >= 0.10),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, lab) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
         |labels AS (SELECT id, MIN(lab) AS component FROM reach GROUP BY 1)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM labels WHERE component <> id)""".stripMargin,

    // Provenance variant: survivors annotated with their duplicate
    // cluster size (docs outside every pair are their own cluster of 1)
    "q_dedup_apply_stats" ->
      s"""WITH RECURSIVE
         |w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
         |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(3)}) AS shingle FROM w),
         |sizes AS (SELECT id, COUNT(*) AS set_size FROM sh GROUP BY 1),
         |inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |  WHERE a.id < b.id GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.id = id_a
         |  JOIN sizes sb ON sb.id = id_b
         |  WHERE CAST(n_common AS DOUBLE)
         |      / CAST(sa.set_size + sb.set_size - n_common AS DOUBLE) >= 0.10),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, lab) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
         |labels AS (SELECT id, MIN(lab) AS component FROM reach GROUP BY 1),
         |cs AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM labels GROUP BY 1)
         |SELECT d.doc_id, d.lang,
         |  COALESCE(cs.n, 1) AS cluster_size,
         |  COALESCE(cs.n, 1) - 1 AS n_removed
         |FROM documents d LEFT JOIN cs ON cs.component = d.doc_id
         |WHERE d.doc_id NOT IN
         |  (SELECT id FROM labels WHERE component <> id)""".stripMargin,

    // Scores quantize the INPUT elements to DECIMAL(18,6) (matching the
    // engine's once-per-row quantize6 kernel), multiply exactly at scale
    // 12, and sum exactly — engine-identical by construction.
    "q_sim_topk_dot" ->
      """WITH qe AS (SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings WHERE vec_id < 10),
        |ce AS (SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x FROM embeddings),
        |s AS (SELECT qid AS query_id, cid AS corpus_id,
        |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE) AS score
        |  FROM qe JOIN ce ON qe.i = ce.i GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 5""".stripMargin,

    "q_sim_topk_cosine" ->
      """WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x FROM embeddings),
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM el GROUP BY 1),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el q JOIN el c ON q.i = c.i
        |  WHERE q.vec_id < 10 GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM s JOIN norms nq ON nq.vec_id = query_id
        |         JOIN norms nc ON nc.vec_id = corpus_id)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM sc QUALIFY rank <= 5""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT 'image' AS kind, COUNT(*) AS n,
        |  CAST(MAX(doc_id % 640 + 32) AS INTEGER) AS max_width,
        |  CAST(MAX(doc_id % 480 + 32) AS INTEGER) AS max_height
        |FROM documents""".stripMargin,

    "q_multimodal_frames" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  unnest(generate_series(0, doc_id % 10000, 1000)) AS frame_ms
        |FROM documents""".stripMargin,

    // Stub codec feature 0 = first 60 bits of md5(payload ++ '0') / 2^60;
    // payload is the document's UTF-8 bytes.
    "q_multimodal_features" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(('0x' || substring(md5(text || '0'), 1, 15))::BIGINT AS DOUBLE)
        |    / CAST(1152921504606846976 AS DOUBLE) AS f0
        |FROM documents""".stripMargin,

    // Multimodal features composed into ANN: the stub-codec 8-dim feature
    // vectors (feature j = md5_60(payload ++ ascii(j)) / 2^60, payload =
    // the document's UTF-8 bytes) quantized to scale-6 decimals, then
    // the full IVF-PQ chain with frozen seeds (refineRounds = 0): 16
    // seed centroids (smallest md5_60(id)), exact quantized-L2 cells,
    // nprobe = 2 probes; PQ = 4 subspaces of 2 dims, 16 sampled codes,
    // ADC lookup-sum scores, top-5 per query.
    // Perceptual-hash near-dup on the text-byte gate corpus after the
    // 8×8 thumbnail resize: every payload takes the stub branches —
    // resize truncates to the 64-byte budget, so
    // phash = md5_60(first 64 bytes). substring() is char-based but the
    // corpus is pure ASCII at every SF (verified), so chars == bytes.
    // Banding/bucket-cap/verify mirrors q_dedup_simhash exactly.
    "q_multimodal_phash" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    ('0x' || substring(md5(substring(text, 1, 64)), 1, 15))::BIGINT
        |      AS phash
        |  FROM documents),
        |chunked AS (SELECT media_id, phash, c.c AS chunk,
        |    (phash >> CAST(c.c * 15 AS INTEGER)) & 32767 AS chunk_val
        |  FROM m, range(0, 4) c(c)),
        |bsz AS (SELECT chunk, chunk_val, COUNT(*) AS n
        |  FROM chunked GROUP BY 1, 2),
        |pairs AS (SELECT DISTINCT a.media_id AS id_a, b2.media_id AS id_b,
        |    a.phash AS ph_a, b2.phash AS ph_b
        |  FROM chunked a
        |  JOIN chunked b2 ON a.chunk = b2.chunk
        |                 AND a.chunk_val = b2.chunk_val
        |  JOIN bsz ON bsz.chunk = a.chunk AND bsz.chunk_val = a.chunk_val
        |  WHERE a.media_id < b2.media_id AND bsz.n BETWEEN 2 AND 2000)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
        |FROM pairs WHERE bit_count(xor(ph_a, ph_b)) <= 3""".stripMargin,

    "q_multimodal_neardup" ->
      """WITH f AS (SELECT CAST(doc_id AS BIGINT) AS vec_id, j.j AS jj,
        |    CAST(('0x' || substring(md5(text || CAST(j.j AS VARCHAR)), 1, 15))
        |      ::BIGINT AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE) AS v
        |  FROM documents, range(0, 8) j(j)),
        |el AS (SELECT vec_id, jj + 1 AS i,
        |    CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6)) AS x FROM f),
        |sq AS (SELECT vec_id,
        |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
        |  FROM el GROUP BY 1),
        |cent AS (SELECT doc_id AS vec_id FROM documents
        |  ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |    ::BIGINT, doc_id
        |  LIMIT 16),
        |vc AS (SELECT e.vec_id AS vid, c.vec_id AS cid,
        |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el e JOIN el c ON e.i = c.i
        |  JOIN cent ON c.vec_id = cent.vec_id GROUP BY 1, 2),
        |asg AS (SELECT vid, cid, sv.s2 + sc.s2 - 2.0 * dot AS d2
        |  FROM vc JOIN sq sv ON sv.vec_id = vid
        |          JOIN sq sc ON sc.vec_id = cid),
        |cells AS (SELECT vid, cid FROM asg
        |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) = 1),
        |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 10
        |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) <= 2),
        |cand AS (SELECT DISTINCT probes.query_id, cells.vid AS corpus_id
        |  FROM probes JOIN cells ON cells.cid = probes.cid),
        |elm AS (SELECT vec_id, i, x, LEAST((i - 1) // 2, 3) AS m FROM el),
        |seeds AS (SELECT doc_id AS psid,
        |    row_number() OVER (ORDER BY
        |      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |      doc_id) AS r
        |  FROM documents
        |  ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |    ::BIGINT, doc_id
        |  LIMIT 16),
        |pcb AS (SELECT s.r, e.m, e.i, e.x
        |  FROM elm e JOIN seeds s ON e.vec_id = s.psid),
        |pcs2 AS (SELECT r, m,
        |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
        |  FROM pcb GROUP BY 1, 2),
        |pvs2 AS (SELECT vec_id, m,
        |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
        |  FROM elm GROUP BY 1, 2),
        |pvdot AS (SELECT e.vec_id, c.r, e.m,
        |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM elm e JOIN pcb c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |enc AS (SELECT vec_id, m, r FROM (
        |    SELECT v.vec_id, v.m, v.r, pvs2.s2 + pcs2.s2 - 2.0 * v.dot AS d2
        |    FROM pvdot v
        |    JOIN pvs2 ON pvs2.vec_id = v.vec_id AND pvs2.m = v.m
        |    JOIN pcs2 ON pcs2.r = v.r AND pcs2.m = v.m)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
        |    ORDER BY d2, r) = 1),
        |qtab AS (SELECT e.vec_id AS query_id, c.r, e.m,
        |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DECIMAL(25,12))
        |      AS contrib
        |  FROM elm e JOIN pcb c ON c.i = e.i
        |  WHERE e.vec_id < 10
        |  GROUP BY 1, 2, 3),
        |s AS (SELECT ca.query_id, ca.corpus_id,
        |    CAST(SUM(q.contrib) AS DOUBLE) AS score
        |  FROM cand ca
        |  JOIN enc e ON e.vec_id = ca.corpus_id
        |  JOIN qtab q ON q.query_id = ca.query_id
        |    AND q.m = e.m AND q.r = e.r
        |  GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 5""".stripMargin,

    // Full LSH pipeline reproduced: integer RHP signatures over quantized
    // vectors → candidate sharing ≥1 bucket → exact decimal scores → rank.
    "q_sim_lsh" ->
      s"""WITH ${lshSigCtes(tables = 4, planes = 8)},
         |cand AS (SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS corpus_id
         |  FROM sig qs JOIN sig cs ON qs.tbl = cs.tbl AND qs.bucket = cs.bucket
         |  WHERE qs.vec_id < 10),
         |s AS (SELECT query_id, corpus_id,
         |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE) AS score
         |  FROM cand
         |  JOIN el qe ON qe.vec_id = query_id
         |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
         |  GROUP BY 1, 2)
         |SELECT query_id, corpus_id, score,
         |  CAST(row_number() OVER
         |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
         |    AS rank
         |FROM s QUALIFY rank <= 5""".stripMargin,

    // Multi-probe LSH: each query probes its bucket plus every 1-bit
    // flip per table (fewer tables, same recall class).
    "q_sim_lsh_mp" ->
      s"""WITH ${lshSigCtes(tables = 2, planes = 8)},
         |qp AS (SELECT vec_id AS query_id, tbl,
         |    unnest([bucket] ||
         |           [xor(bucket, 1::BIGINT << p) for p in range(0, 8)])
         |      AS bucket
         |  FROM sig WHERE vec_id < 10),
         |cand AS (SELECT DISTINCT qp.query_id, cs.vec_id AS corpus_id
         |  FROM qp JOIN sig cs ON qp.tbl = cs.tbl AND qp.bucket = cs.bucket),
         |s AS (SELECT query_id, corpus_id,
         |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE) AS score
         |  FROM cand
         |  JOIN el qe ON qe.vec_id = query_id
         |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
         |  GROUP BY 1, 2)
         |SELECT query_id, corpus_id, score,
         |  CAST(row_number() OVER
         |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
         |    AS rank
         |FROM s QUALIFY rank <= 5""".stripMargin,

    // MinHash: md5_60 double-hash KM family (b1 + i*b2 mod 2^60, split
    // 54/6 so nothing overflows), k=64 component mins, 16 bands of 4,
    // md5_60 band hash of the canonical "m0,m1,m2,m3|band" string.
    "q_dedup_minhash" -> minhashPairsSql(0.10),

    // SimHash: 60-bit md5_60 per token, bit votes, 4×15-bit chunk LSH,
    // hamming = bit_count(xor) <= 14.
    "q_dedup_simhash" ->
      """WITH toks AS (SELECT doc_id AS id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |th AS (SELECT id,
        |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        |votes AS (SELECT id, b.b,
        |    SUM(CASE WHEN (h >> CAST(b.b AS INTEGER)) & 1 = 1
        |        THEN 1 ELSE -1 END) AS v
        |  FROM th, range(0, 60) b(b) GROUP BY 1, 2),
        |sh AS (SELECT id,
        |    CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << CAST(b AS INTEGER))
        |             ELSE 0 END) AS BIGINT) AS simhash
        |  FROM votes GROUP BY 1),
        |chunked AS (SELECT id, simhash, c.c AS chunk,
        |    (simhash >> CAST(c.c * 15 AS INTEGER)) & 32767 AS chunk_val
        |  FROM sh, range(0, 4) c(c)),
        |bsz AS (SELECT chunk, chunk_val, COUNT(*) AS n FROM chunked GROUP BY 1, 2),
        |pairs AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b,
        |    a.simhash AS sh_a, b2.simhash AS sh_b
        |  FROM chunked a
        |  JOIN chunked b2 ON a.chunk = b2.chunk AND a.chunk_val = b2.chunk_val
        |  JOIN bsz ON bsz.chunk = a.chunk AND bsz.chunk_val = a.chunk_val
        |  WHERE a.id < b2.id AND bsz.n BETWEEN 2 AND 2000)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
        |FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 14""".stripMargin,

    // IVF with one Lloyd refinement round: auto-K seed centroids (smallest
    // md5_60(vec_id)), exact quantized-L2 seed assignment, then each
    // centroid moves to its cell's per-dimension mean — the sum of
    // scale-6 unscaled values, divided HALF_UP by pure integer
    // arithmetic ((2s + sgn(s)·n) // 2n; DuckDB's // and Spark's div
    // both truncate toward zero) — a seed whose cell emptied keeps its
    // coordinates. Final assignment + nprobe=2 probes + exact scores
    // run against the refined centroids.
    "q_sim_ivf" ->
      s"""WITH $ivfRefinedCellCtes,
        |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 10
        |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) <= 2),
        |cand AS (SELECT DISTINCT probes.query_id, cells.vid AS corpus_id
        |  FROM probes JOIN cells ON cells.cid = probes.cid),
        |s AS (SELECT query_id, corpus_id,
        |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE) AS score
        |  FROM cand
        |  JOIN el qe ON qe.vec_id = query_id
        |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
        |  GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 5""".stripMargin,

    // Mutual top-5 through the IVF index: q_sim_ivf's refined cell
    // chain with a corpus-wide probe set (every vid probes its 2
    // nearest cells, own row excluded), cosine scoring as in
    // q_sim_mutual, then the same reciprocal self-join.
    "q_sim_mutual_ivf" ->
      s"""WITH $ivfRefinedCellCtes,
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE))
        |      AS nrm
        |  FROM el GROUP BY 1),
        |probes AS (SELECT vid AS query_id, cid FROM asg
        |  QUALIFY row_number() OVER (PARTITION BY vid
        |    ORDER BY d2, cid) <= 2),
        |cand AS (SELECT probes.query_id, cells.vid AS corpus_id
        |  FROM probes JOIN cells ON cells.cid = probes.cid
        |  WHERE cells.vid <> probes.query_id),
        |s AS (SELECT query_id, corpus_id,
        |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE)
        |      AS dot
        |  FROM cand
        |  JOIN el qe ON qe.vec_id = query_id
        |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
        |  GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM s JOIN norms nq ON nq.vec_id = query_id
        |         JOIN norms nc ON nc.vec_id = corpus_id),
        |tk AS (SELECT query_id, corpus_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, corpus_id) AS BIGINT) AS rank
        |  FROM sc QUALIFY rank <= 5)
        |SELECT a.query_id AS u, a.corpus_id AS v, a.rank AS rank_uv,
        |  b.rank AS rank_vu, a.score AS score
        |FROM tk a JOIN tk b ON a.query_id = b.corpus_id
        |  AND a.corpus_id = b.query_id
        |WHERE a.query_id < a.corpus_id""".stripMargin,

    // Hubness census through the IVF index: in-degree over the same
    // corpus-wide probed top-5 lists, antihubs kept via the left join,
    // top 20 by (in_degree desc, vid).
    "q_sim_hubness_ivf" ->
      s"""WITH $ivfRefinedCellCtes,
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE))
        |      AS nrm
        |  FROM el GROUP BY 1),
        |probes AS (SELECT vid AS query_id, cid FROM asg
        |  QUALIFY row_number() OVER (PARTITION BY vid
        |    ORDER BY d2, cid) <= 2),
        |cand AS (SELECT probes.query_id, cells.vid AS corpus_id
        |  FROM probes JOIN cells ON cells.cid = probes.cid
        |  WHERE cells.vid <> probes.query_id),
        |s AS (SELECT query_id, corpus_id,
        |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE)
        |      AS dot
        |  FROM cand
        |  JOIN el qe ON qe.vec_id = query_id
        |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
        |  GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM s JOIN norms nq ON nq.vec_id = query_id
        |         JOIN norms nc ON nc.vec_id = corpus_id),
        |tk AS (SELECT query_id, corpus_id FROM sc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, corpus_id) <= 5),
        |indeg AS (SELECT corpus_id AS vid,
        |    CAST(COUNT(*) AS BIGINT) AS in_degree FROM tk GROUP BY 1)
        |SELECT e.vec_id AS vid,
        |  COALESCE(indeg.in_degree, 0) AS in_degree
        |FROM embeddings e LEFT JOIN indeg ON indeg.vid = e.vec_id
        |ORDER BY in_degree DESC, vid LIMIT 20""".stripMargin,

    // TwoNN intrinsic dimension through the IVF index: candidates from
    // each vid's 2 probed cells, then the brute form's exact-BIGINT d2
    // and shifted quarter-bit ratio fold verbatim.
    "q_embed_intrinsic_dim_ann" ->
      s"""WITH $ivfRefinedCellCtes,
        |eli AS (SELECT vec_id AS vid, i,
        |    CAST(x * 1000000 AS BIGINT) AS xi FROM el),
        |n2 AS (SELECT vid, CAST(SUM(xi * xi) AS BIGINT) AS nn
        |  FROM eli GROUP BY 1),
        |probes AS (SELECT vid, cid FROM asg
        |  QUALIFY row_number() OVER (PARTITION BY vid
        |    ORDER BY d2, cid) <= 2),
        |cand AS (SELECT probes.vid, cells.vid AS ovid
        |  FROM probes JOIN cells ON cells.cid = probes.cid
        |  WHERE cells.vid <> probes.vid),
        |dots AS (SELECT cand.vid, cand.ovid,
        |    CAST(SUM(a.xi * b.xi) AS BIGINT) AS dotl
        |  FROM cand JOIN eli a ON a.vid = cand.vid
        |  JOIN eli b ON b.vid = cand.ovid AND b.i = a.i
        |  GROUP BY 1, 2),
        |dd2 AS (SELECT dots.vid, ovid,
        |    CAST(na.nn + nb.nn - 2 * dotl AS BIGINT) AS d2q
        |  FROM dots JOIN n2 na ON na.vid = dots.vid
        |  JOIN n2 nb ON nb.vid = dots.ovid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vid
        |    ORDER BY d2q, ovid) AS rn FROM dd2),
        |nn2 AS (SELECT vid,
        |    CAST(MIN(CASE WHEN rn = 1 THEN d2q END) AS BIGINT) AS d1,
        |    CAST(MIN(CASE WHEN rn = 2 THEN d2q END) AS BIGINT) AS d2
        |  FROM r WHERE rn <= 2 GROUP BY 1),
        |f AS (SELECT vid, d1, d2,
        |    GREATEST(0, length(bin(d2)) - 15) AS s FROM nn2
        |  WHERE d1 > 0 AND d2 IS NOT NULL),
        |g AS (SELECT vid, (d2 >> s) AS bq,
        |    GREATEST(d1 >> s, 1) AS aq FROM f),
        |q AS (SELECT CAST(length(bin(
        |    (CAST(bq AS BIGINT) * bq * bq * bq)
        |    // (CAST(aq AS BIGINT) * aq * aq * aq))) - 1 AS BIGINT)
        |    AS qlb FROM g),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
        |    CAST(SUM(qlb) AS BIGINT) AS sum_qlb FROM q)
        |SELECT n_points, sum_qlb,
        |  CASE WHEN sum_qlb > 0 THEN 8.0e0
        |    * CAST(n_points AS DOUBLE)
        |    / (0.6931471805599453e0 * CAST(sum_qlb AS DOUBLE))
        |  END AS id_estimate
        |FROM a""".stripMargin,

    // IVF nprobe recall/cost sweep: exact dot-product ground truth for
    // the 10 probe queries, then per nprobe ∈ {1,2,4,8} the candidate
    // count and integer-ppm recall@5 — the pinned recall frontier.
    "q_sim_ivf_sweep" ->
      s"""WITH $ivfRefinedCellCtes,
        |exact AS (SELECT query_id, corpus_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |      CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE)
        |        AS score
        |    FROM el q JOIN el c ON q.i = c.i
        |    WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id GROUP BY 1, 2)
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, corpus_id) <= 5),
        |pall AS (SELECT vid AS query_id, cid,
        |    row_number() OVER (PARTITION BY vid ORDER BY d2, cid)
        |      AS prank
        |  FROM asg WHERE vid < 10),
        |np AS (SELECT np FROM (VALUES (1), (2), (4), (8)) t(np)),
        |cand AS (SELECT np.np, p.query_id, cells.vid AS corpus_id
        |  FROM np JOIN pall p ON p.prank <= np.np
        |  JOIN cells ON cells.cid = p.cid
        |  WHERE cells.vid <> p.query_id),
        |cc AS (SELECT np,
        |    CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
        |    CAST(COUNT(*) AS BIGINT) AS n_candidates
        |  FROM cand GROUP BY 1),
        |s AS (SELECT cand.np, cand.query_id, cand.corpus_id,
        |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE)
        |      AS score
        |  FROM cand JOIN el qe ON qe.vec_id = cand.query_id
        |  JOIN el ce ON ce.vec_id = cand.corpus_id AND qe.i = ce.i
        |  GROUP BY 1, 2, 3),
        |tk AS (SELECT np, query_id, corpus_id FROM s
        |  QUALIFY row_number() OVER (PARTITION BY np, query_id
        |    ORDER BY score DESC, corpus_id) <= 5),
        |h AS (SELECT np, CAST(COUNT(*) AS BIGINT) AS n_hits FROM tk
        |  JOIN exact USING (query_id, corpus_id) GROUP BY 1)
        |SELECT CAST(cc.np AS BIGINT) AS nprobe, cc.n_queries,
        |  cc.n_candidates,
        |  COALESCE(h.n_hits, 0) AS n_hits,
        |  (COALESCE(h.n_hits, 0) * 1000000) // (5 * cc.n_queries)
        |    AS recall_ppm
        |FROM cc LEFT JOIN h ON h.np = cc.np ORDER BY 1""".stripMargin,

    // MinHash-LSH band sweep: the shared k=64 signature banded per
    // config {8,16,32}; candidate pairs per config (hot buckets > 2000
    // dropped, the production guard), signature-estimate pairs at the
    // 0.10 threshold, hits vs the exact 3-gram Jaccard truth.
    "q_dedup_lsh_sweep" ->
      s"""WITH $minhashMinsCtes,
        |cfg(bands, rpb) AS (VALUES (8, 8), (16, 4), (32, 2)),
        |bnd AS (SELECT m.id, c.bands, m.i // c.rpb AS band,
        |    string_agg(CAST(m.m AS VARCHAR), ',' ORDER BY m.i) AS key
        |  FROM mins m, cfg c GROUP BY 1, 2, 3),
        |banded AS (SELECT id, bands, band,
        |    ('0x' || substring(md5(key || '|' || CAST(band AS VARCHAR)),
        |      1, 15))::BIGINT AS band_hash
        |  FROM bnd),
        |bsz AS (SELECT bands, band, band_hash, COUNT(*) AS n
        |  FROM banded GROUP BY 1, 2, 3),
        |pairs AS (SELECT DISTINCT a.bands, a.id AS id_a, b.id AS id_b
        |  FROM banded a
        |  JOIN banded b ON a.bands = b.bands AND a.band = b.band
        |    AND a.band_hash = b.band_hash
        |  JOIN bsz ON bsz.bands = a.bands AND bsz.band = a.band
        |    AND bsz.band_hash = a.band_hash
        |  WHERE a.id < b.id AND bsz.n BETWEEN 2 AND 2000),
        |sim AS (SELECT p.bands, p.id_a, p.id_b,
        |    CAST(SUM(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) AS DOUBLE)
        |      / 64.0 AS ss
        |  FROM pairs p
        |  JOIN mins ma ON ma.id = p.id_a
        |  JOIN mins mb ON mb.id = p.id_b AND ma.i = mb.i
        |  GROUP BY 1, 2, 3),
        |truth AS (SELECT id_a, id_b FROM (${ngramJaccardSql(0.10)})),
        |tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
        |cand AS (SELECT bands, CAST(COUNT(*) AS BIGINT) AS n_candidates
        |  FROM pairs GROUP BY 1),
        |pred AS (SELECT bands, id_a, id_b FROM sim WHERE ss >= 0.10),
        |pc AS (SELECT bands, CAST(COUNT(*) AS BIGINT) AS n_pred
        |  FROM pred GROUP BY 1),
        |hc AS (SELECT p.bands, CAST(COUNT(*) AS BIGINT) AS n_hit
        |  FROM pred p JOIN truth t
        |    ON t.id_a = p.id_a AND t.id_b = p.id_b GROUP BY 1)
        |SELECT CAST(c.bands AS BIGINT) AS bands,
        |  CAST(64 // c.bands AS BIGINT) AS rows_per_band,
        |  COALESCE(cand.n_candidates, 0) AS n_candidates, tc.n_truth,
        |  COALESCE(pc.n_pred, 0) AS n_pred,
        |  COALESCE(hc.n_hit, 0) AS n_hit,
        |  CASE WHEN COALESCE(pc.n_pred, 0) > 0 THEN
        |    CAST(COALESCE(hc.n_hit, 0) AS DOUBLE) / pc.n_pred
        |    END AS "precision",
        |  CASE WHEN tc.n_truth > 0 THEN
        |    CAST(COALESCE(hc.n_hit, 0) AS DOUBLE) / tc.n_truth
        |    END AS recall
        |FROM cfg c
        |LEFT JOIN cand ON cand.bands = c.bands
        |LEFT JOIN pc ON pc.bands = c.bands
        |LEFT JOIN hc ON hc.bands = c.bands, tc
        |ORDER BY 1""".stripMargin,

    // Label propagation: 3 unrolled synchronous rounds over the part
    // co-purchase graph (parts sharing >= 2 orders; argmax = count
    // desc, label asc), then the community census top 20 with totals.
    "q_graph_labelprop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS b,
        |    CAST(l_partkey AS BIGINT) AS i FROM lineitem),
        |p AS (SELECT a.i AS src, c.i AS dst
        |  FROM li a JOIN li c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),
        |c1 AS (SELECT e.dst AS node, l.lab, COUNT(*) AS c
        |  FROM e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
        |l1 AS (SELECT node, lab FROM (SELECT node, lab,
        |    row_number() OVER (PARTITION BY node ORDER BY c DESC, lab)
        |      AS rn FROM c1) WHERE rn = 1),
        |c2 AS (SELECT e.dst AS node, l.lab, COUNT(*) AS c
        |  FROM e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
        |l2 AS (SELECT node, lab FROM (SELECT node, lab,
        |    row_number() OVER (PARTITION BY node ORDER BY c DESC, lab)
        |      AS rn FROM c2) WHERE rn = 1),
        |c3 AS (SELECT e.dst AS node, l.lab, COUNT(*) AS c
        |  FROM e JOIN l2 l ON l.node = e.src GROUP BY 1, 2),
        |l3 AS (SELECT node, lab FROM (SELECT node, lab,
        |    row_number() OVER (PARTITION BY node ORDER BY c DESC, lab)
        |      AS rn FROM c3) WHERE rn = 1),
        |cs AS (SELECT CAST(lab AS BIGINT) AS community,
        |    CAST(COUNT(*) AS BIGINT) AS n_nodes FROM l3 GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities FROM cs),
        |top AS (SELECT community, n_nodes FROM cs
        |  ORDER BY n_nodes DESC, community LIMIT 20)
        |SELECT community, n_nodes, t.n_communities
        |FROM top, t""".stripMargin,

    // Sliding-window chunk census (32-token windows, stride 24):
    // chunks(n) = 1 + ceil(max(0, n-32)/24); overlap re-emits 8
    // tokens per extra chunk. All-integer per-row arithmetic.
    "q_text_chunks" ->
      """WITH d AS (SELECT CAST(len(regexp_split_to_array(trim(text),
        |      '\s+')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT n_tokens,
        |    1 + (GREATEST(n_tokens - 32, 0) + 23) // 24 AS n_chunks
        |  FROM d)
        |SELECT CAST(n_chunks AS BIGINT) AS n_chunks,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
        |  CAST(SUM(n_tokens + (n_chunks - 1) * 8) AS BIGINT)
        |    AS emitted_total,
        |  CASE WHEN SUM(n_tokens) > 0 THEN
        |    CAST(SUM(n_tokens + (n_chunks - 1) * 8) AS DOUBLE)
        |      / CAST(SUM(n_tokens) AS DOUBLE) END AS dup_ratio
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // Linear-kernel MMD² drift between even/odd vec_id cohorts: q6
    // element sums per (cohort, dim), integer mean-shift
    // (s_a·n_b − s_b·n_a) // (n_a·n_b), q12 squared sum → ONE final
    // double; top dim by squared shift (ties → smallest dim, 0-based
    // to match posexplode).
    "q_embed_drift" ->
      """WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |qv AS (SELECT vec_id % 2 AS grp, i,
        |    CAST(x * 1000000 AS BIGINT) AS qx FROM el),
        |n AS (SELECT
        |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM embeddings),
        |s AS (SELECT i, SUM(CASE WHEN grp = 0 THEN qx ELSE 0 END) AS s_a,
        |    SUM(CASE WHEN grp = 1 THEN qx ELSE 0 END) AS s_b
        |  FROM qv GROUP BY 1),
        |d AS (SELECT i,
        |    (s.s_a * n.n_b - s.s_b * n.n_a) // (n.n_a * n.n_b) AS shift
        |  FROM s, n),
        |rk AS (SELECT i, shift * shift AS sq,
        |    row_number() OVER (ORDER BY shift * shift DESC, i) AS rn
        |  FROM d),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
        |    CAST(SUM(sq) AS BIGINT) AS m12 FROM rk),
        |top AS (SELECT CAST(i - 1 AS BIGINT) AS top_dim, sq AS top_sq
        |  FROM rk WHERE rn = 1)
        |SELECT n.n_a, n.n_b, agg.n_dims,
        |  CAST(agg.m12 AS DOUBLE) / 1e12 AS mmd2, top.top_dim,
        |  CASE WHEN agg.m12 > 0 THEN
        |    CAST((top.top_sq * 1000000) // agg.m12 AS BIGINT)
        |    END AS top_share_ppm
        |FROM n, agg, top""".stripMargin,

    // Prototype-distance pruning: every vector's exact d2 to its OWN
    // refined centroid (the (vid, cid) row of asg selected by cells),
    // hardest-first rank per cell, 20 kept.
    "q_prune_prototypes" ->
      s"""WITH $ivfRefinedCellCtes,
        |own AS (SELECT c.vid AS corpus_id, c.cid AS cent_id, a.d2
        |  FROM cells c JOIN asg a ON a.vid = c.vid AND a.cid = c.cid)
        |SELECT corpus_id, cent_id, d2,
        |  CAST(row_number() OVER
        |    (PARTITION BY cent_id ORDER BY d2 DESC, corpus_id) AS BIGINT)
        |    AS hard_rank
        |FROM own QUALIFY hard_rank <= 20""".stripMargin,

    // Hard-negative mining: q_sim_ivf's probe construction with the label
    // inequality applied to the CANDIDATES (before ranking), so the top-5
    // are the best different-label vectors in the probed cells.
    "q_sim_hardneg" ->
      s"""WITH $ivfRefinedCellCtes,
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
        |  FROM embeddings),
        |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 10
        |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) <= 2),
        |cand AS (SELECT DISTINCT probes.query_id, cells.vid AS corpus_id,
        |    cl.label AS neg_label
        |  FROM probes JOIN cells ON cells.cid = probes.cid
        |  JOIN lab al ON al.vec_id = probes.query_id
        |  JOIN lab cl ON cl.vec_id = cells.vid
        |  WHERE al.label <> cl.label),
        |s AS (SELECT query_id, corpus_id, neg_label,
        |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE) AS score
        |  FROM cand
        |  JOIN el qe ON qe.vec_id = query_id
        |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
        |  GROUP BY 1, 2, 3)
        |SELECT query_id, corpus_id, neg_label, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 5""".stripMargin,

    // Two-level IVF: fine = 16 smallest md5_60(vec_id), coarse = first 4
    // of the same order (coarse ⊆ fine ⊆ corpus, so ONE corpus×fine
    // distance CTE `d` covers every pair the hierarchy needs). Each stage
    // replicates the engine's two-level decision exactly: fine→nearest
    // coarse, corpus→nearest coarse→nearest fine within it, query→2
    // coarse cells→2 fine cells, exact scores in probed cells.
    "q_sim_ivf2" ->
      """WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |sq AS (SELECT vec_id,
        |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
        |  FROM el GROUP BY 1),
        |ord AS (SELECT vec_id, row_number() OVER (ORDER BY
        |    ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
        |    vec_id) AS rn
        |  FROM embeddings),
        |fine AS (SELECT vec_id FROM ord WHERE rn <= 16),
        |coarse AS (SELECT vec_id FROM ord WHERE rn <= 4),
        |vc AS (SELECT e.vec_id AS vid, c.vec_id AS cid,
        |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el e JOIN el c ON e.i = c.i
        |  JOIN fine ON c.vec_id = fine.vec_id GROUP BY 1, 2),
        |d AS (SELECT vid, cid, sv.s2 + sc.s2 - 2.0 * dot AS d2
        |  FROM vc JOIN sq sv ON sv.vec_id = vid
        |          JOIN sq sc ON sc.vec_id = cid),
        |fc AS (SELECT d.vid AS fine_id, d.cid AS coarse_id FROM d
        |  JOIN fine f ON f.vec_id = d.vid
        |  JOIN coarse co ON co.vec_id = d.cid
        |  QUALIFY row_number() OVER (PARTITION BY d.vid
        |    ORDER BY d.d2, d.cid) = 1),
        |vcoarse AS (SELECT d.vid, d.cid AS coarse_id FROM d
        |  JOIN coarse co ON co.vec_id = d.cid
        |  QUALIFY row_number() OVER (PARTITION BY d.vid
        |    ORDER BY d.d2, d.cid) = 1),
        |vfine AS (SELECT d.vid, d.cid AS fine_id FROM d
        |  JOIN vcoarse v2 ON v2.vid = d.vid
        |  JOIN fc ON fc.fine_id = d.cid AND fc.coarse_id = v2.coarse_id
        |  QUALIFY row_number() OVER (PARTITION BY d.vid
        |    ORDER BY d.d2, d.cid) = 1),
        |qcoarse AS (SELECT d.vid AS query_id, d.cid AS coarse_id FROM d
        |  JOIN coarse co ON co.vec_id = d.cid
        |  WHERE d.vid < 10
        |  QUALIFY row_number() OVER (PARTITION BY d.vid
        |    ORDER BY d.d2, d.cid) <= 2),
        |qfine AS (SELECT q.query_id, d.cid AS fine_id FROM qcoarse q
        |  JOIN fc ON fc.coarse_id = q.coarse_id
        |  JOIN d ON d.vid = q.query_id AND d.cid = fc.fine_id
        |  QUALIFY row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY d.d2, d.cid) <= 2),
        |cand AS (SELECT DISTINCT qfine.query_id, vfine.vid AS corpus_id
        |  FROM qfine JOIN vfine ON vfine.fine_id = qfine.fine_id),
        |s AS (SELECT query_id, corpus_id,
        |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE) AS score
        |  FROM cand
        |  JOIN el qe ON qe.vec_id = query_id
        |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
        |  GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 5""".stripMargin,

    // Product-quantization ADC top-k: sampled codebook = sub-slices of
    // the 16 md5-smallest corpus rows (code id = rank in that order);
    // each vector takes its nearest code per subspace (exact quantized
    // L2, (d2, code) ties); scores are exact DECIMAL(38,12) sums of the
    // per-subspace query·code dots, surfaced as DOUBLE.
    "q_sim_pq" ->
      s"""WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |$pqAdcCtes,
        |s AS (SELECT q.query_id, enc.vec_id AS corpus_id,
        |    CAST(SUM(q.contrib) AS DOUBLE) AS score
        |  FROM enc JOIN qtab q ON q.m = enc.m AND q.r = enc.r
        |  GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 5""".stripMargin,

    // SQ8 scalar quantization: per-dim 256-level affine grid between the
    // corpus per-dim min/max on the scale-6 integers; code = floor
    // division (both engines truncate == floor on non-negatives); score
    // = 255-scaled exact integer reconstruction dot, rescaled through
    // the lossless DECIMAL(20,0)×10^-12 path then one /255.0 — the same
    // doubles Spark's pqRescale produces.
    "q_sim_sq8" ->
      """WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS x
        |  FROM embeddings),
        |dims AS (SELECT i, MIN(x) AS mn, MAX(x) - MIN(x) AS span
        |  FROM el GROUP BY 1),
        |codes AS (SELECT e.vec_id, e.i,
        |    CASE WHEN d.span = 0 THEN 0
        |         ELSE ((e.x - d.mn) * 255) // d.span END AS code
        |  FROM el e JOIN dims d USING (i)),
        |qt AS (SELECT e.vec_id AS query_id, e.i,
        |    e.x * d.span AS w, e.x * d.mn AS qm
        |  FROM el e JOIN dims d USING (i) WHERE e.vec_id < 10),
        |s AS (SELECT q.query_id, c.vec_id AS corpus_id,
        |    255 * SUM(CAST(q.qm AS HUGEINT))
        |      + SUM(CAST(c.code AS HUGEINT) * q.w) AS u255
        |  FROM codes c JOIN qt q ON q.i = c.i
        |  GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    CAST(CAST(u255 AS DECIMAL(20,0))
        |      * CAST(0.000000000001 AS DECIMAL(13,12)) AS DOUBLE) / 255.0
        |      AS score
        |  FROM s)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM sc QUALIFY rank <= 5""".stripMargin,

    // Binary quantization: 1 bit/dim against the per-dim corpus mean
    // (compared exactly as x·n >= Σx — no division), Hamming top-20
    // candidates, exact-cosine rerank to top-5. The bit table stands in
    // for the engine's packed words: popcount(xor) == count of unequal
    // bits.
    "q_sim_binary" ->
      """WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |elu AS (SELECT vec_id, i, CAST(x * 1000000 AS BIGINT) AS u FROM el),
        |dims AS (SELECT i, SUM(CAST(u AS HUGEINT)) AS s, COUNT(*) AS n
        |  FROM elu GROUP BY 1),
        |bits AS (SELECT e.vec_id, e.i,
        |    CASE WHEN CAST(e.u AS HUGEINT) * d.n >= d.s THEN 1 ELSE 0 END AS b
        |  FROM elu e JOIN dims d USING (i)),
        |ham AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    SUM(CASE WHEN q.b <> c.b THEN 1 ELSE 0 END) AS hd
        |  FROM bits q JOIN bits c ON q.i = c.i
        |  WHERE q.vec_id < 10 GROUP BY 1, 2),
        |cand AS (SELECT query_id, corpus_id FROM ham
        |  QUALIFY row_number() OVER
        |    (PARTITION BY query_id ORDER BY hd, corpus_id) <= 20),
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM el GROUP BY 1),
        |s AS (SELECT ca.query_id, ca.corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM cand ca
        |  JOIN el q ON q.vec_id = ca.query_id
        |  JOIN el c ON c.vec_id = ca.corpus_id AND c.i = q.i
        |  GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM s JOIN norms nq ON nq.vec_id = query_id
        |         JOIN norms nc ON nc.vec_id = corpus_id)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM sc QUALIFY rank <= 5""".stripMargin,

    // Leave-one-out 5-NN per-class label accuracy: exact-cosine top-5
    // with the self pair excluded BEFORE ranking, majority vote with
    // ties to the smaller label, rollup per true label.
    "q_embed_knn" ->
      """WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM el GROUP BY 1),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el q JOIN el c ON q.i = c.i AND c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 50 GROUP BY 1, 2),
        |top AS (SELECT s.query_id, s.corpus_id FROM s
        |  JOIN norms nq ON nq.vec_id = s.query_id
        |  JOIN norms nc ON nc.vec_id = s.corpus_id
        |  QUALIFY row_number() OVER (PARTITION BY s.query_id
        |    ORDER BY s.dot / (nq.nrm * nc.nrm) DESC, s.corpus_id) <= 5),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |votes AS (SELECT t.query_id, l.label,
        |    CAST(COUNT(*) AS BIGINT) AS votes
        |  FROM top t JOIN lab l ON l.vec_id = t.corpus_id GROUP BY 1, 2),
        |pred AS (SELECT query_id, label AS predicted FROM votes
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY votes DESC, label) = 1)
        |SELECT lq.label AS true_label, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN p.predicted = lq.label THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  CAST(SUM(CASE WHEN p.predicted = lq.label THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS accuracy
        |FROM pred p JOIN lab lq ON lq.vec_id = p.query_id
        |GROUP BY 1""".stripMargin,

    // Matryoshka: candidates by exact cosine over the FIRST 16 dims
    // (i <= 16 — prefix dot and prefix norms), full-64-dim exact-cosine
    // rerank of the top-20, final top-5 carries true scores.
    "q_sim_matryoshka" ->
      """WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |pnorms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM el WHERE i <= 16 GROUP BY 1),
        |pdot AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el q JOIN el c ON q.i = c.i
        |  WHERE q.vec_id < 10 AND q.i <= 16 GROUP BY 1, 2),
        |cand AS (SELECT pd.query_id, pd.corpus_id FROM pdot pd
        |  JOIN pnorms nq ON nq.vec_id = pd.query_id
        |  JOIN pnorms nc ON nc.vec_id = pd.corpus_id
        |  QUALIFY row_number() OVER (PARTITION BY pd.query_id
        |    ORDER BY pd.dot / (nq.nrm * nc.nrm) DESC, pd.corpus_id) <= 20),
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM el GROUP BY 1),
        |s AS (SELECT ca.query_id, ca.corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM cand ca
        |  JOIN el q ON q.vec_id = ca.query_id
        |  JOIN el c ON c.vec_id = ca.corpus_id AND c.i = q.i
        |  GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM s JOIN norms nq ON nq.vec_id = query_id
        |         JOIN norms nc ON nc.vec_id = corpus_id)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM sc QUALIFY rank <= 5""".stripMargin,

    // Recall@5 of the binary-quantization chain (same CTEs as
    // q_sim_binary) against the exact-cosine top-5 ground truth (same
    // chain as q_sim_topk_cosine): per query, |approx ∩ exact| / 5.
    "q_sim_recall_binary" ->
      """WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |elu AS (SELECT vec_id, i, CAST(x * 1000000 AS BIGINT) AS u FROM el),
        |dims AS (SELECT i, SUM(CAST(u AS HUGEINT)) AS s, COUNT(*) AS n
        |  FROM elu GROUP BY 1),
        |bits AS (SELECT e.vec_id, e.i,
        |    CASE WHEN CAST(e.u AS HUGEINT) * d.n >= d.s THEN 1 ELSE 0 END AS b
        |  FROM elu e JOIN dims d USING (i)),
        |ham AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    SUM(CASE WHEN q.b <> c.b THEN 1 ELSE 0 END) AS hd
        |  FROM bits q JOIN bits c ON q.i = c.i
        |  WHERE q.vec_id < 10 GROUP BY 1, 2),
        |cand AS (SELECT query_id, corpus_id FROM ham
        |  QUALIFY row_number() OVER
        |    (PARTITION BY query_id ORDER BY hd, corpus_id) <= 20),
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM el GROUP BY 1),
        |sall AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el q JOIN el c ON q.i = c.i
        |  WHERE q.vec_id < 10 GROUP BY 1, 2),
        |scall AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM sall JOIN norms nq ON nq.vec_id = query_id
        |            JOIN norms nc ON nc.vec_id = corpus_id),
        |topb AS (SELECT sc.query_id, sc.corpus_id FROM scall sc
        |  JOIN cand ca ON ca.query_id = sc.query_id
        |              AND ca.corpus_id = sc.corpus_id
        |  QUALIFY row_number() OVER (PARTITION BY sc.query_id
        |    ORDER BY sc.score DESC, sc.corpus_id) <= 5),
        |tope AS (SELECT query_id, corpus_id FROM scall
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, corpus_id) <= 5),
        |h AS (SELECT topb.query_id, CAST(COUNT(*) AS BIGINT) AS hits
        |  FROM topb JOIN tope USING (query_id, corpus_id) GROUP BY 1),
        |q AS (SELECT DISTINCT query_id FROM topb)
        |SELECT q.query_id, COALESCE(h.hits, 0) AS hits,
        |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / 5 AS recall
        |FROM q LEFT JOIN h USING (query_id)""".stripMargin,

    // IVF-PQ: the refined-IVF probe bounds candidates (nprobe = 2 cells
    // per query, same chain as q_sim_ivf), the PQ code table prices
    // each candidate (same chain as q_sim_pq); candidates score by ADC
    // lookup sums instead of exact dots.
    "q_sim_ivfpq" ->
      s"""WITH $ivfRefinedCellCtes,
        |$pqAdcCtes,
        |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 10
        |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) <= 2),
        |cand AS (SELECT DISTINCT probes.query_id, cells.vid AS corpus_id
        |  FROM probes JOIN cells ON cells.cid = probes.cid),
        |s AS (SELECT ca.query_id, ca.corpus_id,
        |    CAST(SUM(q.contrib) AS DOUBLE) AS score
        |  FROM cand ca
        |  JOIN enc e ON e.vec_id = ca.corpus_id
        |  JOIN qtab q ON q.query_id = ca.query_id
        |    AND q.m = e.m AND q.r = e.r
        |  GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 5""".stripMargin,

    // Full IVFADC: residual vectors rel = el − own-cell refined centroid
    // (exact scale-6 decimal subtraction); codebook = residuals of the
    // 16 md5-smallest rows; encode nearest residual code per subspace;
    // score = q·centroid (exact per probed cell) + Σ_m q·code lookups.
    "q_sim_ivfpq_res" ->
      s"""WITH $ivfRefinedCellCtes,
        |dims AS (SELECT CAST(len(embedding) AS BIGINT) AS d
        |  FROM embeddings LIMIT 1),
        |rel AS (SELECT e.vec_id, e.i, CAST(e.x - r.mx AS DECIMAL(18,6)) AS x
        |  FROM el e JOIN cells c ON c.vid = e.vec_id
        |  JOIN ref r ON r.cid = c.cid AND r.i = e.i),
        |relm AS (SELECT vec_id, i, x, LEAST((i - 1) // (d // 4), 3) AS m
        |  FROM rel CROSS JOIN dims),
        |rseeds AS (SELECT vec_id AS psid,
        |    row_number() OVER (ORDER BY
        |      ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
        |      vec_id) AS r
        |  FROM embeddings
        |  ORDER BY ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
        |    ::BIGINT, vec_id
        |  LIMIT 16),
        |rcb AS (SELECT s.r, e.m, e.i, e.x
        |  FROM relm e JOIN rseeds s ON e.vec_id = s.psid),
        |rcs2 AS (SELECT r, m,
        |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
        |  FROM rcb GROUP BY 1, 2),
        |rvs2 AS (SELECT vec_id, m,
        |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
        |  FROM relm GROUP BY 1, 2),
        |rvdot AS (SELECT e.vec_id, c.r, e.m,
        |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM relm e JOIN rcb c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |renc AS (SELECT vec_id, m, r FROM (
        |    SELECT v.vec_id, v.m, v.r, rvs2.s2 + rcs2.s2 - 2.0 * v.dot AS d2
        |    FROM rvdot v
        |    JOIN rvs2 ON rvs2.vec_id = v.vec_id AND rvs2.m = v.m
        |    JOIN rcs2 ON rcs2.r = v.r AND rcs2.m = v.m)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
        |    ORDER BY d2, r) = 1),
        |rqtab AS (SELECT e.vec_id AS query_id, c.r, c.m,
        |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DECIMAL(25,12))
        |      AS contrib
        |  FROM (SELECT vec_id, i, x FROM el WHERE vec_id < 10) e
        |  JOIN rcb c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |qcdot AS (SELECT e.vec_id AS query_id, r.cid,
        |    CAST(SUM(CAST(e.x * r.mx AS DECIMAL(25,12))) AS DECIMAL(25,12))
        |      AS base
        |  FROM el e JOIN ref r ON r.i = e.i
        |  WHERE e.vec_id < 10 GROUP BY 1, 2),
        |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 10
        |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) <= 2),
        |cand AS (SELECT probes.query_id, cells.vid AS corpus_id, cells.cid
        |  FROM probes JOIN cells ON cells.cid = probes.cid),
        |s AS (SELECT ca.query_id, ca.corpus_id,
        |    CAST(MAX(qc.base) + SUM(q.contrib) AS DOUBLE) AS score
        |  FROM cand ca
        |  JOIN renc e ON e.vec_id = ca.corpus_id
        |  JOIN rqtab q ON q.query_id = ca.query_id
        |    AND q.m = e.m AND q.r = e.r
        |  JOIN qcdot qc ON qc.query_id = ca.query_id AND qc.cid = ca.cid
        |  GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 5""".stripMargin,

    // IVFADC+R: identical residual-ADC chain, but the top-10 ADC
    // shortlist per query is reranked by the EXACT quantized dot
    // product (the same DECIMAL(25,12) sum as the brute-force oracle)
    // before the final top-5 cut.
    "q_sim_ivfpq_rr" ->
      s"""WITH $ivfRefinedCellCtes,
        |dims AS (SELECT CAST(len(embedding) AS BIGINT) AS d
        |  FROM embeddings LIMIT 1),
        |rel AS (SELECT e.vec_id, e.i, CAST(e.x - r.mx AS DECIMAL(18,6)) AS x
        |  FROM el e JOIN cells c ON c.vid = e.vec_id
        |  JOIN ref r ON r.cid = c.cid AND r.i = e.i),
        |relm AS (SELECT vec_id, i, x, LEAST((i - 1) // (d // 4), 3) AS m
        |  FROM rel CROSS JOIN dims),
        |rseeds AS (SELECT vec_id AS psid,
        |    row_number() OVER (ORDER BY
        |      ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
        |      vec_id) AS r
        |  FROM embeddings
        |  ORDER BY ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
        |    ::BIGINT, vec_id
        |  LIMIT 16),
        |rcb AS (SELECT s.r, e.m, e.i, e.x
        |  FROM relm e JOIN rseeds s ON e.vec_id = s.psid),
        |rcs2 AS (SELECT r, m,
        |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
        |  FROM rcb GROUP BY 1, 2),
        |rvs2 AS (SELECT vec_id, m,
        |    CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS s2
        |  FROM relm GROUP BY 1, 2),
        |rvdot AS (SELECT e.vec_id, c.r, e.m,
        |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM relm e JOIN rcb c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |renc AS (SELECT vec_id, m, r FROM (
        |    SELECT v.vec_id, v.m, v.r, rvs2.s2 + rcs2.s2 - 2.0 * v.dot AS d2
        |    FROM rvdot v
        |    JOIN rvs2 ON rvs2.vec_id = v.vec_id AND rvs2.m = v.m
        |    JOIN rcs2 ON rcs2.r = v.r AND rcs2.m = v.m)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
        |    ORDER BY d2, r) = 1),
        |rqtab AS (SELECT e.vec_id AS query_id, c.r, c.m,
        |    CAST(SUM(CAST(e.x * c.x AS DECIMAL(25,12))) AS DECIMAL(25,12))
        |      AS contrib
        |  FROM (SELECT vec_id, i, x FROM el WHERE vec_id < 10) e
        |  JOIN rcb c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |qcdot AS (SELECT e.vec_id AS query_id, r.cid,
        |    CAST(SUM(CAST(e.x * r.mx AS DECIMAL(25,12))) AS DECIMAL(25,12))
        |      AS base
        |  FROM el e JOIN ref r ON r.i = e.i
        |  WHERE e.vec_id < 10 GROUP BY 1, 2),
        |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 10
        |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2, cid) <= 2),
        |cand AS (SELECT probes.query_id, cells.vid AS corpus_id, cells.cid
        |  FROM probes JOIN cells ON cells.cid = probes.cid),
        |s AS (SELECT ca.query_id, ca.corpus_id,
        |    CAST(MAX(qc.base) + SUM(q.contrib) AS DOUBLE) AS score
        |  FROM cand ca
        |  JOIN renc e ON e.vec_id = ca.corpus_id
        |  JOIN rqtab q ON q.query_id = ca.query_id
        |    AND q.m = e.m AND q.r = e.r
        |  JOIN qcdot qc ON qc.query_id = ca.query_id AND qc.cid = ca.cid
        |  GROUP BY 1, 2),
        |short AS (SELECT query_id, corpus_id FROM s
        |  QUALIFY row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) <= 10),
        |ex AS (SELECT sh.query_id, sh.corpus_id,
        |    CAST(SUM(CAST(eq.x * ec.x AS DECIMAL(25,12))) AS DOUBLE) AS score
        |  FROM short sh
        |  JOIN el eq ON eq.vec_id = sh.query_id
        |  JOIN el ec ON ec.vec_id = sh.corpus_id AND ec.i = eq.i
        |  GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM ex QUALIFY rank <= 5""".stripMargin,

    "q_emb_neardup" ->
      s"""WITH ${lshSigCtes(tables = 4, planes = 6)},
         |bsz AS (SELECT tbl, bucket, COUNT(*) AS n FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM sig a
         |  JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |  JOIN bsz ON bsz.tbl = a.tbl AND bsz.bucket = a.bucket
         |  WHERE a.vec_id < b.vec_id AND bsz.n BETWEEN 2 AND 2000),
         |norms AS (SELECT vec_id,
         |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
         |  FROM el GROUP BY 1),
         |d AS (SELECT id_a, id_b,
         |    CAST(SUM(CAST(ea.x * eb.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
         |  FROM cand
         |  JOIN el ea ON ea.vec_id = id_a
         |  JOIN el eb ON eb.vec_id = id_b AND ea.i = eb.i
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
         |FROM d
         |JOIN norms na ON na.vec_id = id_a
         |JOIN norms nb ON nb.vec_id = id_b
         |WHERE dot / (na.nrm * nb.nrm) >= 0.25""".stripMargin,

    // Semantic (SemDeDup-style) near-dup pairs: candidates are pairs
    // sharing a Lloyd-refined IVF cell (cells of > 2000 members dropped,
    // mirroring the Spark maxCell bucket bound), verified by exact
    // quantized cosine >= 0.25.
    "q_dedup_semantic" ->
      s"""WITH $ivfRefinedCellCtes,
         |csz AS (SELECT cid, COUNT(*) AS n FROM cells GROUP BY 1),
         |cand AS (SELECT a.vid AS id_a, b.vid AS id_b
         |  FROM cells a JOIN cells b ON a.cid = b.cid
         |  JOIN csz ON csz.cid = a.cid
         |  WHERE a.vid < b.vid AND csz.n BETWEEN 2 AND 2000),
         |norms AS (SELECT vec_id,
         |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
         |  FROM el GROUP BY 1),
         |d AS (SELECT id_a, id_b,
         |    CAST(SUM(CAST(ea.x * eb.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
         |  FROM cand
         |  JOIN el ea ON ea.vec_id = id_a
         |  JOIN el eb ON eb.vec_id = id_b AND ea.i = eb.i
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
         |FROM d
         |JOIN norms na ON na.vec_id = id_a
         |JOIN norms nb ON nb.vec_id = id_b
         |WHERE dot / (na.nrm * nb.nrm) >= 0.25""".stripMargin,

    // Semantic near-dup pairs THROUGH the hierarchical split path
    // (maxCell = 120 < mean cell size, splitFanout = 4, maxDepth = 1):
    // level-0 refined cells of <= 120 members pair directly; over-full
    // cells are re-clustered once among their own members — seeds = the
    // 4 members with the smallest (md5_60(id), id), exact quantized-L2
    // assignment with (d2, seed id) tiebreaks, child key "cell/seed" —
    // and still-over-full children drop like hot buckets. Verification
    // is the same exact quantized cosine >= 0.25 within leaf cells of
    // 2..120 members.
    "q_dedup_semantic_split" ->
      s"WITH $ivfRefinedCellCtes,\n$semanticSplitTail",

    // Exact dedup composed upstream of the hierarchical split: classes
    // of identical quantized vectors collapse to their smallest id
    // (each member pairs with the keeper at cosine 1.0), and ONLY the
    // representatives are clustered/split/verified — so duplicate mass
    // beyond maxCell exits via the exact arm instead of bottoming out a
    // degenerate cell. Same split parameters as q_dedup_semantic_split.
    "q_dedup_semantic_exact" ->
      s"""WITH ael AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
         |  FROM embeddings),
         |qv AS (SELECT vec_id, list(x ORDER BY i) AS cq FROM ael GROUP BY 1),
         |cls AS (SELECT cq, MIN(vec_id) AS keep_id FROM qv GROUP BY cq),
         |reps AS (SELECT keep_id AS vec_id FROM cls),
         |exact AS (SELECT c.keep_id AS id_a, q.vec_id AS id_b,
         |    CAST(1.0 AS DOUBLE) AS cosine
         |  FROM qv q JOIN cls c ON q.cq = c.cq WHERE q.vec_id <> c.keep_id),
         |${ivfRefinedCellCtesOver("reps")},
         |$semanticSplitTail
         |UNION ALL SELECT id_a, id_b, cosine FROM exact""".stripMargin,

    // BM25 (rational fixed-point) top-20 for terms (spark, vector,
    // merge): the direct transcription of bm25Rational — saturation
    // fixed-pointed first ((10^6·44·tf·L) // sat_den, bounded in
    // 128-bit), then idf applied as one more truncating division; both
    // engines' integer divisions truncate identically on non-negative
    // operands, so the BIGINT scores hash-match exactly.
    "q_text_bm25" ->
      """WITH base AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
        |bl AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS dl, arr FROM base),
        |consts AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
        |    CAST(SUM(dl) AS BIGINT) AS ll FROM bl),
        |tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, dl, unnest(arr) AS tok FROM bl)
        |  WHERE tok IN ('spark', 'vector', 'merge')
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |s AS (SELECT doc_id,
        |    SUM(
        |      (CAST(2 * (nn - df) + 1 AS HUGEINT)
        |        * ((CAST(1000000 AS HUGEINT) * CAST(44 AS HUGEINT)
        |              * CAST(tf AS HUGEINT) * CAST(ll AS HUGEINT))
        |           // (CAST(20 AS HUGEINT) * CAST(tf AS HUGEINT)
        |                * CAST(ll AS HUGEINT)
        |              + CAST(6 AS HUGEINT) * CAST(ll AS HUGEINT)
        |              + CAST(18 AS HUGEINT) * CAST(dl AS HUGEINT)
        |                * CAST(nn AS HUGEINT))))
        |      // CAST(2 * df + 1 AS HUGEINT)) AS score
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN consts
        |  GROUP BY 1)
        |SELECT doc_id, CAST(score AS BIGINT) AS score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        |    AS rank
        |FROM s QUALIFY rank <= 20""".stripMargin,

    // Hybrid retrieval: BM25 top-50 (same rational fixed-point chain as
    // q_text_bm25) fused with the exact-cosine top-50 of query vector 0
    // (same chain as q_sim_topk_cosine) by integer reciprocal rank,
    // rrf = Σ ⌊10¹²/(60+rank)⌋, missing list ⇒ 0; ties on doc_id.
    "q_text_hybrid_rrf" ->
      """WITH base AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
        |bl AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS dl, arr FROM base),
        |consts AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
        |    CAST(SUM(dl) AS BIGINT) AS ll FROM bl),
        |tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, dl, unnest(arr) AS tok FROM bl)
        |  WHERE tok IN ('spark', 'vector', 'merge')
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |s AS (SELECT doc_id,
        |    SUM(
        |      (CAST(2 * (nn - df) + 1 AS HUGEINT)
        |        * ((CAST(1000000 AS HUGEINT) * CAST(44 AS HUGEINT)
        |              * CAST(tf AS HUGEINT) * CAST(ll AS HUGEINT))
        |           // (CAST(20 AS HUGEINT) * CAST(tf AS HUGEINT)
        |                * CAST(ll AS HUGEINT)
        |              + CAST(6 AS HUGEINT) * CAST(ll AS HUGEINT)
        |              + CAST(18 AS HUGEINT) * CAST(dl AS HUGEINT)
        |                * CAST(nn AS HUGEINT))))
        |      // CAST(2 * df + 1 AS HUGEINT)) AS score
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN consts
        |  GROUP BY 1),
        |lex AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        |      AS lex_rank
        |  FROM s QUALIFY lex_rank <= 50),
        |el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM el GROUP BY 1),
        |sdot AS (SELECT c.vec_id AS doc_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el q JOIN el c ON q.i = c.i
        |  WHERE q.vec_id = 0 GROUP BY 1),
        |sem AS (SELECT sd.doc_id,
        |    CAST(row_number() OVER
        |      (ORDER BY sd.dot / (nq.nrm * nc.nrm) DESC, sd.doc_id)
        |      AS BIGINT) AS sem_rank
        |  FROM sdot sd
        |  JOIN norms nq ON nq.vec_id = 0
        |  JOIN norms nc ON nc.vec_id = sd.doc_id
        |  QUALIFY sem_rank <= 50),
        |f AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
        |    lex_rank, sem_rank,
        |    COALESCE(1000000000000 // (60 + lex_rank), 0)
        |      + COALESCE(1000000000000 // (60 + sem_rank), 0) AS rrf
        |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
        |SELECT doc_id, lex_rank, sem_rank, CAST(rrf AS BIGINT) AS rrf,
        |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
        |    AS rank
        |FROM f QUALIFY rank <= 20""".stripMargin,

    // Feature-hashing doc vectors: bucket = md5_60(token) % 16, exact
    // BIGINT conditional counts per bucket; token-less docs are absent
    // on both sides.
    "q_text_feature_hash" -> {
      val fcols = (0 until 16).map(i =>
        s"  CAST(SUM(CASE WHEN bkt = $i THEN 1 ELSE 0 END) AS BIGINT) AS f$i")
        .mkString(",\n")
      s"""WITH base AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS arr FROM documents),
         |t AS (SELECT doc_id, tok
         |  FROM (SELECT doc_id, unnest(arr) AS tok FROM base)
         |  WHERE len(tok) > 0),
         |b AS (SELECT doc_id,
         |    ('0x' || substring(md5(tok), 1, 15))::BIGINT % 16 AS bkt
         |  FROM t)
         |SELECT doc_id,
         |$fcols
         |FROM b GROUP BY 1""".stripMargin
    },

    // Feature-hash vectors → exact cosine top-5: the same bucket-count
    // chain as q_text_feature_hash feeds the q_sim_topk_cosine scoring
    // shape, with (doc, bucket) count rows standing in for vector
    // elements (absent buckets are zeros — they cancel from dots and
    // norms identically).
    "q_text_hashvec_knn" ->
      """WITH base AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
        |t AS (SELECT doc_id, tok
        |  FROM (SELECT doc_id, unnest(arr) AS tok FROM base)
        |  WHERE len(tok) > 0),
        |el AS (SELECT doc_id,
        |    ('0x' || substring(md5(tok), 1, 15))::BIGINT % 16 AS i,
        |    CAST(CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM t GROUP BY 1, 2),
        |norms AS (SELECT doc_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM el GROUP BY 1),
        |s AS (SELECT q.doc_id AS query_id, c.doc_id AS corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el q JOIN el c ON q.i = c.i
        |  WHERE q.doc_id < 10 GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM s JOIN norms nq ON nq.doc_id = query_id
        |         JOIN norms nc ON nc.doc_id = corpus_id)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS BIGINT)
        |    AS rank
        |FROM sc QUALIFY rank <= 5""".stripMargin,

    // Language-ID confusion: the q_text_langid chain grouped into
    // (true, predicted) cells with the per-true-language row share.
    "q_text_langid_eval" -> {
      val markers = graft.operators.TextAnalysis.defaultMarkers
      val langs = markers.keys.toSeq.sorted
      val scoreCols = langs.map { l =>
        val list = markers(l).map(w => s"'$w'").mkString(", ")
        s"""CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
           |      x -> list_contains([$list], x))) AS BIGINT) AS score_$l""".stripMargin
      }.mkString(",\n    ")
      val m = langs.map(l => s"score_$l").mkString(", ")
      val cases = langs.map(l => s"WHEN score_$l = m THEN '$l'").mkString(" ")
      s"""WITH s AS (SELECT doc_id, lang,
         |    $scoreCols
         |  FROM documents),
         |g AS (SELECT *, GREATEST($m) AS m FROM s),
         |p AS (SELECT lang,
         |    CASE WHEN m = 0 THEN 'und' $cases END AS predicted_lang
         |  FROM g),
         |cells AS (SELECT lang, predicted_lang,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2)
         |SELECT lang, predicted_lang, n,
         |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY lang) AS row_share
         |FROM cells""".stripMargin
    },

    // Per-doc 8-gram novelty: distinct shingles (same expr as the dedup
    // family; short docs = one whole-doc shingle), df across the corpus,
    // novel = df == 1.
    "q_text_novelty" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words
         |  FROM documents),
         |sh AS (SELECT doc_id, unnest(${shingleExpr(8)}) AS shingle FROM w),
         |dfq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
         |  FROM sh GROUP BY 1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS novelty
         |FROM sh JOIN dfq USING (shingle) GROUP BY 1""".stripMargin,

    // TF-IDF top-5 keywords per document: idf quantized to quarter bits
    // by the exact integer identity floor(4·log2(N/df)) =
    // bitlen(⌊N⁴/df⁴⌋)−1 in HUGEINT — the same value graft's
    // log2_quarter_bits kernel computes — so score = tf·idf_qb is an
    // exact BIGINT; ties break on the token string.
    "q_text_tfidf" ->
      """WITH base AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
        |tf AS (SELECT doc_id, tok AS token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(arr) AS tok FROM base)
        |  WHERE len(tok) > 0 GROUP BY 1, 2),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, token, tf,
        |    CAST(length(bin((CAST(n AS HUGEINT) * n * n * n)
        |      // (CAST(df AS HUGEINT) * df * df * df))) - 1 AS BIGINT)
        |      AS idf_qb
        |  FROM tf JOIN dfq USING (token) CROSS JOIN nn)
        |SELECT doc_id, token, tf, idf_qb, tf * idf_qb AS score,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tf * idf_qb DESC, token) AS BIGINT) AS rank
        |FROM sc QUALIFY rank <= 5""".stripMargin,

    // Unicode-script profile: the same block-range character classes as
    // scriptProfile, stated in RE2's \x{…} spelling; counting is the
    // length-diff idiom with the 'g' flag; dominant-script CASE chain is
    // the identical priority-ordered argmax.
    "q_text_scripts" ->
      """WITH c AS (SELECT doc_id, length(text) AS n_chars,
        |  length(text) - length(regexp_replace(text,
        |    '[A-Za-z\x{C0}-\x{D6}\x{D8}-\x{F6}\x{F8}-\x{24F}]', '', 'g'))
        |    AS n_latin,
        |  length(text) - length(regexp_replace(text,
        |    '[\x{400}-\x{52F}]', '', 'g')) AS n_cyrillic,
        |  length(text) - length(regexp_replace(text,
        |    '[\x{370}-\x{3FF}\x{1F00}-\x{1FFF}]', '', 'g')) AS n_greek,
        |  length(text) - length(regexp_replace(text,
        |    '[\x{600}-\x{6FF}\x{750}-\x{77F}]', '', 'g')) AS n_arabic,
        |  length(text) - length(regexp_replace(text,
        |    '[\x{2E80}-\x{9FFF}\x{AC00}-\x{D7AF}\x{F900}-\x{FAFF}]', '',
        |    'g')) AS n_cjk,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |    AS n_digit,
        |  length(text) - length(regexp_replace(text,
        |    '[ \t\n\r\f\x{0B}]', '', 'g')) AS n_space
        |FROM documents)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(n_latin AS BIGINT) AS n_latin,
        |  CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
        |  CAST(n_greek AS BIGINT) AS n_greek,
        |  CAST(n_arabic AS BIGINT) AS n_arabic,
        |  CAST(n_cjk AS BIGINT) AS n_cjk,
        |  CAST(n_digit AS BIGINT) AS n_digit,
        |  CAST(n_space AS BIGINT) AS n_space,
        |  CAST(n_chars - n_latin - n_cyrillic - n_greek - n_arabic - n_cjk
        |    - n_digit - n_space AS BIGINT) AS n_other,
        |  CASE
        |    WHEN n_latin >= n_cyrillic AND n_latin >= n_greek
        |      AND n_latin >= n_arabic AND n_latin >= n_cjk
        |      AND n_latin > 0 THEN 'latin'
        |    WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_arabic
        |      AND n_cyrillic >= n_cjk AND n_cyrillic > 0 THEN 'cyrillic'
        |    WHEN n_greek >= n_arabic AND n_greek >= n_cjk
        |      AND n_greek > 0 THEN 'greek'
        |    WHEN n_arabic >= n_cjk AND n_arabic > 0 THEN 'arabic'
        |    WHEN n_cjk > 0 THEN 'cjk'
        |    ELSE 'none' END AS main_script
        |FROM c""".stripMargin,

    // CCNet-style bigram-LM perplexity, α = 1/10, trained on the lang='en'
    // slice. Every probability is the integer rational A/B and the
    // per-bigram cost is floor(4·log2(B/A)) = bitlen(⌊B⁴/A⁴⌋)−1, exact in
    // HUGEINT — the same quarter-bit value graft's log2_quarter_bits kernel
    // computes in BigInteger.
    "q_lm_perplexity" ->
      s"""WITH $lmScoreCtes
        |SELECT d.doc_id, COALESCE(s.n, 0) AS n_bigrams,
        |  COALESCE(s.nll, 0) AS nll_qbits,
        |  (COALESCE(s.nll, 0) * 1000) // (4 * GREATEST(COALESCE(s.n, 0), 1))
        |    AS milli_bits_per_token
        |FROM (SELECT doc_id FROM documents) d LEFT JOIN s USING (doc_id)"""
        .stripMargin,

    // CCNet head/middle/tail: the q_lm_perplexity scores cut into thirds
    // by milli-bits-per-token ascending with VALUE-TIED thresholds (the
    // smallest score whose cumulative count reaches ceil(n/3) /
    // ceil(2n/3)) — equal scores always share a bucket, so the labels
    // are deterministic without a row-level tiebreak.
    "q_lm_buckets" ->
      s"""WITH $lmScoreCtes,
        |sc AS (SELECT d.doc_id,
        |    (COALESCE(s.nll, 0) * 1000)
        |      // (4 * GREATEST(COALESCE(s.n, 0), 1)) AS milli_bits_per_token
        |  FROM (SELECT doc_id FROM documents) d LEFT JOIN s USING (doc_id)),
        |hist AS (SELECT milli_bits_per_token AS hv,
        |    CAST(COUNT(*) AS BIGINT) AS cnt FROM sc GROUP BY 1),
        |c AS (SELECT hv, SUM(cnt) OVER (ORDER BY hv) AS cum FROM hist),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sc),
        |th AS (SELECT
        |    MIN(CASE WHEN cum >= (n + 2) // 3 THEN hv END) AS t1,
        |    MIN(CASE WHEN cum >= (n * 2 + 2) // 3 THEN hv END) AS t2
        |  FROM c CROSS JOIN tot)
        |SELECT doc_id, milli_bits_per_token,
        |  CASE WHEN milli_bits_per_token <= t1 THEN 'head'
        |       WHEN milli_bits_per_token <= t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sc CROSS JOIN th""".stripMargin,

    // OOV rate against the corpus top-50 vocabulary (freq desc, token
    // asc — the q_vocab_topk ordering): per-doc token count, tokens
    // outside the vocabulary, and the exact integer milli-rate.
    "q_text_oov" ->
      """WITH base AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
        |tk AS (SELECT doc_id, tok FROM
        |    (SELECT doc_id, unnest(arr) AS tok FROM base)
        |  WHERE len(tok) > 0),
        |vc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM tk GROUP BY 1),
        |v AS (SELECT tok FROM vc
        |  QUALIFY row_number() OVER (ORDER BY freq DESC, tok) <= 50),
        |per AS (SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(CASE WHEN v.tok IS NULL THEN 1 END) AS BIGINT)
        |      AS n_oov
        |  FROM tk LEFT JOIN v ON tk.tok = v.tok GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
        |  COALESCE(n_oov, CAST(0 AS BIGINT)) AS n_oov,
        |  (COALESCE(n_oov, 0) * 1000)
        |    // GREATEST(COALESCE(n_tokens, 0), 1) AS oov_milli
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

    // DSIR importance selection: the CCNet bigram-LM construction twice —
    // target model on lang='en', background model on the whole pool —
    // priced over one shared doc-bigram stream; importance is the exact
    // quarter-bit NLL difference and the top 200 (desc, ties by doc_id)
    // are ranked.
    "q_dsir_select" ->
      """WITH doc AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
        |docbg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
        |  FROM doc, unnest(range(1, len(arr))) AS t(i)
        |  WHERE len(arr) >= 2),
        |tref AS (SELECT regexp_split_to_array(trim(text), '\s+') AS arr
        |  FROM documents WHERE lang = 'en'),
        |tpc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS tc
        |  FROM (SELECT arr[i] AS w1, arr[i + 1] AS w2
        |    FROM tref, unnest(range(1, len(arr))) AS t(i)
        |    WHERE len(arr) >= 2) GROUP BY 1, 2),
        |tctx AS (SELECT w1, CAST(SUM(tc) AS BIGINT) AS tcctx
        |  FROM tpc GROUP BY 1),
        |tvoc AS (SELECT CAST(COUNT(DISTINCT tok) + 1 AS BIGINT) AS tv
        |  FROM (SELECT unnest(arr) AS tok FROM tref) WHERE len(tok) > 0),
        |bref AS (SELECT regexp_split_to_array(trim(text), '\s+') AS arr
        |  FROM documents),
        |bpc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS bc
        |  FROM (SELECT arr[i] AS w1, arr[i + 1] AS w2
        |    FROM bref, unnest(range(1, len(arr))) AS t(i)
        |    WHERE len(arr) >= 2) GROUP BY 1, 2),
        |bctx AS (SELECT w1, CAST(SUM(bc) AS BIGINT) AS bcctx
        |  FROM bpc GROUP BY 1),
        |bvoc AS (SELECT CAST(COUNT(DISTINCT tok) + 1 AS BIGINT) AS bv
        |  FROM (SELECT unnest(arr) AS tok FROM bref) WHERE len(tok) > 0),
        |ab AS (SELECT d.doc_id,
        |    CASE WHEN tpc.tc IS NOT NULL THEN tpc.tc * 10 + 1
        |         ELSE 1 END AS ta,
        |    CASE WHEN tctx.tcctx IS NOT NULL THEN tctx.tcctx * 10 + tv
        |         ELSE tv END AS tb,
        |    CASE WHEN bpc.bc IS NOT NULL THEN bpc.bc * 10 + 1
        |         ELSE 1 END AS ba,
        |    CASE WHEN bctx.bcctx IS NOT NULL THEN bctx.bcctx * 10 + bv
        |         ELSE bv END AS bb
        |  FROM docbg d
        |  LEFT JOIN tpc USING (w1, w2)
        |  LEFT JOIN tctx USING (w1)
        |  LEFT JOIN bpc USING (w1, w2)
        |  LEFT JOIN bctx USING (w1)
        |  CROSS JOIN tvoc CROSS JOIN bvoc),
        |qcost AS (SELECT doc_id,
        |    length(bin((CAST(tb AS HUGEINT) * tb * tb * tb)
        |      // (CAST(ta AS HUGEINT) * ta * ta * ta))) - 1 AS tcost,
        |    length(bin((CAST(bb AS HUGEINT) * bb * bb * bb)
        |      // (CAST(ba AS HUGEINT) * ba * ba * ba))) - 1 AS bcost
        |  FROM ab),
        |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(tcost) AS BIGINT) AS nt,
        |    CAST(SUM(bcost) AS BIGINT) AS nb FROM qcost GROUP BY 1),
        |scored AS (SELECT d.doc_id, COALESCE(s.n, 0) AS n_bigrams,
        |    COALESCE(s.nt, 0) AS nll_target_qbits,
        |    COALESCE(s.nb, 0) AS nll_background_qbits,
        |    COALESCE(s.nb, 0) - COALESCE(s.nt, 0) AS importance_qbits
        |  FROM (SELECT doc_id FROM documents) d LEFT JOIN s USING (doc_id))
        |SELECT *, CAST(row_number() OVER (ORDER BY importance_qbits DESC,
        |    doc_id) AS BIGINT) AS rank
        |FROM scored QUALIFY rank <= 200""".stripMargin,

    // RFM: cumulative-histogram quantile scores (ties share a score);
    // money sums as exact decimals, scoring on a 100-unit grid;
    // ceil(t·cum/n) = (t·cum + n − 1) // n, worst-to-best cum order.
    "q_rfm" ->
      """WITH base AS (SELECT o_custkey AS custkey,
        |    MAX(epoch_ns(date_trunc('day', o_orderdate))//1000000000)
        |      AS last_day_s,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS monetary_dec
        |  FROM orders GROUP BY 1),
        |anchor AS (SELECT MAX(last_day_s) AS as_of_s FROM base),
        |b2 AS (SELECT custkey, frequency,
        |    (as_of_s - last_day_s) // 86400 AS recency_days,
        |    CAST(monetary_dec * 1000000 AS BIGINT) // 100000000 AS m_grid,
        |    CAST(monetary_dec AS DOUBLE) AS monetary
        |  FROM base, anchor),
        |rh AS (SELECT recency_days AS v, COUNT(*) AS cnt FROM b2 GROUP BY 1),
        |rs AS (SELECT v AS recency_days, CAST(
        |    (5 * SUM(cnt) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
        |     + SUM(cnt) OVER () - 1) // (SUM(cnt) OVER ()) AS BIGINT)
        |    AS r_score FROM rh),
        |fh AS (SELECT frequency AS v, COUNT(*) AS cnt FROM b2 GROUP BY 1),
        |fs AS (SELECT v AS frequency, CAST(
        |    (5 * SUM(cnt) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING)
        |     + SUM(cnt) OVER () - 1) // (SUM(cnt) OVER ()) AS BIGINT)
        |    AS f_score FROM fh),
        |mh AS (SELECT m_grid AS v, COUNT(*) AS cnt FROM b2 GROUP BY 1),
        |ms AS (SELECT v AS m_grid, CAST(
        |    (5 * SUM(cnt) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING)
        |     + SUM(cnt) OVER () - 1) // (SUM(cnt) OVER ()) AS BIGINT)
        |    AS m_score FROM mh)
        |SELECT custkey, recency_days, frequency, monetary,
        |  r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS rfm_cell,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
        |         THEN 'champion'
        |       WHEN f_score >= 4 THEN 'loyal'
        |       WHEN m_score >= 4 THEN 'big_spender'
        |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
        |       WHEN r_score <= 2 THEN 'dormant'
        |       ELSE 'regular' END AS segment
        |FROM b2 JOIN rs USING (recency_days) JOIN fs USING (frequency)
        |JOIN ms USING (m_grid)""".stripMargin,

    // SCD2: gaps-and-islands — lag change flag, running run number,
    // per-run rollup, lead for the closing edge; order (ts, event_id).
    "q_scd2" ->
      s"""WITH ${scd2RunsCtes("")}
        |SELECT user_id, version, event_type, valid_from_s,
        |  lead(valid_from_s) OVER w2 AS valid_to_s, n_events,
        |  (lead(valid_from_s) OVER w2 IS NULL) AS is_current
        |FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY version)""".stripMargin,

    // CDC latest-wins: newest record per key by (ts, event_id); a
    // latest 'error' record tombstones the key.
    "q_cdc_apply" ->
      """WITH r AS (SELECT user_id, event_type, value, event_id,
        |    epoch_ns(ts)//1000000000 AS ts_s,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts_s AS last_ts_s, event_id AS last_row_id,
        |  event_type, value
        |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    // PSI drift: integer parts-per-1e9 probabilities with add-one
    // smoothing; signed quarter-bit log ratio = ±(bitlen(⌊x⁴/y⁴⌋)−1)
    // in HUGEINT — the same value graft's log2_quarter_bits computes.
    "q_drift_psi" ->
      """WITH bd AS (SELECT MIN(epoch_ns(ts)//1000000000) AS lo_s,
        |    MAX(epoch_ns(ts)//1000000000) AS hi_s FROM events),
        |ev AS (SELECT event_type,
        |    CAST(floor(value / 20.0) AS BIGINT) AS bin,
        |    CASE WHEN epoch_ns(ts)//1000000000 >= (lo_s + hi_s) // 2
        |      THEN 1 ELSE 0 END AS late
        |  FROM events, bd),
        |cells AS (SELECT event_type, bin,
        |    CAST(SUM(1 - late) AS BIGINT) AS ca,
        |    CAST(SUM(late) AS BIGINT) AS cb
        |  FROM ev GROUP BY 1, 2),
        |t AS (SELECT *, CAST(COUNT(*) OVER w AS BIGINT) AS n_bins,
        |    CAST(SUM(ca) OVER w AS BIGINT) AS tot_a,
        |    CAST(SUM(cb) OVER w AS BIGINT) AS tot_b
        |  FROM cells WINDOW w AS (PARTITION BY event_type)),
        |pq AS (SELECT *,
        |    GREATEST(1, ((ca + 1) * 1000000000) // (tot_a + n_bins)) AS p,
        |    GREATEST(1, ((cb + 1) * 1000000000) // (tot_b + n_bins)) AS q
        |  FROM t),
        |terms AS (SELECT event_type, n_bins, tot_a, tot_b, (p - q) *
        |    (CASE WHEN p >= q
        |      THEN length(bin((CAST(p AS HUGEINT) * p * p * p)
        |        // (CAST(q AS HUGEINT) * q * q * q))) - 1
        |      ELSE -(length(bin((CAST(q AS HUGEINT) * q * q * q)
        |        // (CAST(p AS HUGEINT) * p * p * p))) - 1) END) AS term
        |  FROM pq)
        |SELECT event_type, MAX(n_bins) AS n_bins, MAX(tot_a) AS n_before,
        |  MAX(tot_b) AS n_after, CAST(SUM(term) AS BIGINT) AS psi_q,
        |  CAST(SUM(term) AS DOUBLE) / 4000000000.0 AS psi_bits
        |FROM terms GROUP BY 1""".stripMargin,

    // MaxSim late interaction: pseudo-docs of 4 token vectors
    // (doc = vec_id // 4); per query token the best-matching corpus
    // token dot (exact scale-12 decimals), summed per document.
    "q_sim_maxsim" ->
      """WITH el AS (SELECT vec_id, vec_id // 4 AS doc,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |dots AS (SELECT q.doc AS query_id, q.vec_id AS q_vec,
        |    c.doc AS corpus_id, c.vec_id AS c_vec,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
        |  FROM el q JOIN el c ON q.i = c.i
        |  WHERE q.doc < 2 GROUP BY 1, 2, 3, 4),
        |tokmax AS (SELECT query_id, q_vec, corpus_id, MAX(dot) AS tok_max
        |  FROM dots GROUP BY 1, 2, 3),
        |sc AS (SELECT query_id, corpus_id,
        |    CAST(SUM(CAST(tok_max AS DECIMAL(28,12))) AS DOUBLE) AS score
        |  FROM tokmax GROUP BY 1, 2)
        |SELECT query_id, corpus_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, corpus_id) AS BIGINT) AS rank
        |FROM sc QUALIFY rank <= 5""".stripMargin,

    // LSH banding quality: the minhash pair set vs the exact Jaccard
    // ground truth at the same threshold — both reuse the very SQL that
    // oracles the underlying operators.
    "q_dedup_recall_minhash" ->
      s"""WITH truth AS (SELECT id_a, id_b FROM (${ngramJaccardSql(0.10)})),
         |pred AS (SELECT id_a, id_b FROM (${minhashPairsSql(0.10)})),
         |j AS (SELECT t.id_a IS NOT NULL AS in_t, p.id_a IS NOT NULL AS in_p
         |  FROM truth t FULL OUTER JOIN pred p
         |    ON t.id_a = p.id_a AND t.id_b = p.id_b)
         |SELECT
         |  CAST(SUM(CASE WHEN in_t THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
         |  CAST(SUM(CASE WHEN in_p THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
         |  CAST(SUM(CASE WHEN in_t AND in_p THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hit,
         |  CASE WHEN SUM(CASE WHEN in_p THEN 1 ELSE 0 END) > 0 THEN
         |    CAST(SUM(CASE WHEN in_t AND in_p THEN 1 ELSE 0 END) AS DOUBLE)
         |      / SUM(CASE WHEN in_p THEN 1 ELSE 0 END) END AS "precision",
         |  CASE WHEN SUM(CASE WHEN in_t THEN 1 ELSE 0 END) > 0 THEN
         |    CAST(SUM(CASE WHEN in_t AND in_p THEN 1 ELSE 0 END) AS DOUBLE)
         |      / SUM(CASE WHEN in_t THEN 1 ELSE 0 END) END AS recall
         |FROM j""".stripMargin,

    // Point-in-time feature join: SCD2 runs over NON-purchase events
    // (same gaps-and-islands build as q_scd2), then each purchase takes
    // the run with the greatest valid_from_s at-or-before its second
    // (ties on equal starts resolved to the highest version — the
    // engine's max_by collapse).
    "q_feature_pit" ->
      s"""WITH ${scd2RunsCtes(" WHERE event_type <> 'purchase'")},
        |dim AS (SELECT user_id, valid_from_s, event_type, version FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, valid_from_s
        |      ORDER BY version DESC) AS rn FROM runs) WHERE rn = 1),
        |lab AS (SELECT user_id, event_id,
        |    epoch_ns(ts)//1000000000 AS label_ts_s
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT l.event_id, l.user_id, l.label_ts_s,
        |    d.event_type, d.version,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY d.valid_from_s DESC NULLS LAST) AS rn
        |  FROM lab l LEFT JOIN dim d
        |    ON d.user_id = l.user_id AND d.valid_from_s <= l.label_ts_s)
        |SELECT event_id, user_id, label_ts_s, event_type, version
        |FROM j WHERE rn = 1""".stripMargin,

    // PQ distortion audit: the ADC chain's own assignment d2 kept and
    // rolled up per subspace (min over codes with (d2, r) ties shares
    // the d2 either way); sums as exact DECIMAL(28,6) — corpus-sized
    // d2 sums breach the 2^53 final-conversion bound at scale 12.
    "q_sim_pq_distortion" ->
      s"""WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x
        |  FROM embeddings),
        |$pqAssignCtes,
        |best AS (SELECT vec_id, m, d2 FROM (
        |    SELECT v.vec_id, v.m,
        |      pvs2.s2 + pcs2.s2 - 2.0 * v.dot AS d2,
        |      row_number() OVER (PARTITION BY v.vec_id, v.m
        |        ORDER BY pvs2.s2 + pcs2.s2 - 2.0 * v.dot, v.r) AS rn
        |    FROM pvdot v
        |    JOIN pvs2 ON pvs2.vec_id = v.vec_id AND pvs2.m = v.m
        |    JOIN pcs2 ON pcs2.r = v.r AND pcs2.m = v.m)
        |  WHERE rn = 1)
        |SELECT CAST(m AS BIGINT) AS m,
        |  CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(SUM(CAST(d2 AS DECIMAL(28,6))) AS DOUBLE) AS sum_d2,
        |  CAST(SUM(CAST(d2 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
        |    AS mean_d2,
        |  MAX(d2) AS max_d2
        |FROM best GROUP BY 1""".stripMargin,

    // Triangle census of the minhash near-dup graph: naive closed-wedge
    // join over the canonical (a < b) edge set — the degree-oriented
    // engine enumeration counts the same triangles exactly once.
    "q_dedup_triangles" ->
      s"""WITH edges AS (SELECT id_a AS a, id_b AS b
         |  FROM (${minhashPairsSql(0.10)})),
         |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dg FROM (
         |    SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
         |  GROUP BY 1),
         |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
         |  FROM edges e1
         |  JOIN edges e2 ON e2.a = e1.b
         |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
         |vw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
         |    CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges
         |  FROM deg),
         |ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
         |SELECT n_vertices, n_edges, n_wedges, n_triangles,
         |  CASE WHEN n_wedges > 0 THEN
         |    CAST(3 * n_triangles AS DOUBLE) / n_wedges END AS transitivity
         |FROM vw, ec, tri""".stripMargin,

    // Entity-consistent split: cumulative md5_60 thresholds over the
    // 2^60 space (exact longs from Sampling.rateThreshold).
    "q_sample_entity_split" ->
      s"""WITH h AS (SELECT user_id,
         |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
         |      ::BIGINT AS hk
         |  FROM events),
         |s AS (SELECT user_id,
         |    CASE WHEN hk < ${graft.operators.Sampling.rateThreshold(0.8)}
         |      THEN 'train'
         |    WHEN hk < ${graft.operators.Sampling
                .rateThreshold(0.8 + 0.1)} THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM h)
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_entities
         |FROM s GROUP BY 1""".stripMargin,

    // A/B conversion: arm = salted md5_60 below/above half the hash
    // space; pooled two-proportion z in the engine's exact double op
    // order (IEEE ops incl. sqrt are correctly rounded).
    "q_ab_test" ->
      s"""WITH pe AS (SELECT user_id,
         |    CASE WHEN ('0x' || substring(
         |        md5(CAST(user_id AS VARCHAR) || 'exp1'), 1, 15))::BIGINT
         |      < ${1L << 59} THEN 'A' ELSE 'B' END AS arm,
         |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS converted
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT
         |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END)
         |      AS BIGINT) AS conv_a,
         |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    CAST(SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END)
         |      AS BIGINT) AS conv_b
         |  FROM pe),
         |d AS (SELECT *, CAST(conv_a AS DOUBLE) / n_a AS rate_a,
         |    CAST(conv_b AS DOUBLE) / n_b AS rate_b,
         |    CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS p_pool
         |  FROM r),
         |s AS (SELECT *,
         |    sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b)) AS se
         |  FROM d)
         |SELECT n_a, conv_a, rate_a, n_b, conv_b, rate_b,
         |  CASE WHEN se > 0.0 THEN (rate_a - rate_b) / se END AS z
         |FROM s""".stripMargin,

    // IVF cell balance over the refined (auto-K, 1 Lloyd round) cells —
    // the same `cells` CTE as q_sim_ivf; imbalance = max / mean in the
    // engine's division order.
    "q_sim_ivf_balance" ->
      s"""WITH $ivfRefinedCellCtes,
        |sz AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM cells GROUP BY 1),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    CAST(SUM(n) AS BIGINT) AS n_vectors,
        |    MIN(n) AS min_cell, MAX(n) AS max_cell
        |  FROM sz)
        |SELECT n_cells, nk.k - n_cells AS n_empty, n_vectors, min_cell,
        |  max_cell, CAST(n_vectors AS DOUBLE) / n_cells AS mean_cell,
        |  CAST(max_cell AS DOUBLE)
        |    / (CAST(n_vectors AS DOUBLE) / n_cells) AS imbalance
        |FROM agg CROSS JOIN nk""".stripMargin,

    // Time-weighted average (TimescaleDB time_weight LOCF): value·Δµs
    // as exact decimal sums; ONE double division at the end; ties by
    // event_id; single-observation keys (duration 0) -> NULL twa.
    "q_twa" ->
      """WITH e AS (SELECT event_type, event_id, value,
        |    epoch_ns(ts)//1000 AS t_us,
        |    epoch_ns(ts)//1000000000 AS t_s FROM events),
        |l AS (SELECT *, lead(t_s) OVER (PARTITION BY event_type
        |    ORDER BY t_us, event_id) AS next_s FROM e),
        |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(CASE WHEN next_s IS NOT NULL THEN
        |      CAST(value AS DECIMAL(18,6)) * (next_s - t_s) END)
        |      * 1000000 AS BIGINT) AS num_micro,
        |    MAX(t_s) - MIN(t_s) AS duration_s
        |  FROM l GROUP BY 1)
        |SELECT event_type, n_obs, duration_s,
        |  CASE WHEN duration_s > 0 THEN
        |    CAST(num_micro AS DOUBLE)
        |      / CAST(duration_s * 1000000 AS DOUBLE) END AS twa
        |FROM a""".stripMargin,

    // Counter aggregation with resets: non-negative step -> delta, a
    // negative step is a reset and the new reading is the increase;
    // contributions summed as scale-6 decimals.
    "q_counter_agg" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |    epoch_ns(ts)//1000 AS t_us FROM events),
        |l AS (SELECT *, lag(value) OVER (PARTITION BY user_id
        |    ORDER BY t_us, event_id) AS prev FROM e),
        |c AS (SELECT *, CASE WHEN prev IS NULL THEN NULL
        |    WHEN value >= prev THEN value - prev ELSE value END AS contrib
        |  FROM l),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY t_us, event_id) AS rna,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY t_us DESC, event_id DESC) AS rnd
        |  FROM c)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |  CAST(SUM(CASE WHEN prev IS NOT NULL AND value < prev
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
        |  CAST(SUM(CAST(contrib AS DECIMAL(28,6))) AS DOUBLE)
        |    AS total_increase,
        |  MAX(CASE WHEN rna = 1 THEN value END) AS first_value,
        |  MAX(CASE WHEN rnd = 1 THEN value END) AS last_value
        |FROM r GROUP BY 1""".stripMargin,

    // FK orphan audit: lineitem.l_partkey without a part parent.
    // SQL FK semantics: NULL keys violate nothing — excluded from the
    // orphan count (and from the parent key set, where a single NULL
    // would poison NOT IN) and reported separately as n_null_fk.
    "q_dq_orphans" ->
      """WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
        |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_child_keys,
        |    CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_fk
        |  FROM lineitem),
        |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_rows,
        |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_orphan_keys
        |  FROM lineitem
        |  WHERE l_partkey IS NOT NULL AND l_partkey NOT IN
        |    (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL))
        |SELECT n_child, n_child_keys, n_null_fk, n_orphan_rows,
        |  n_orphan_keys,
        |  CAST(n_orphan_rows AS DOUBLE) / n_child AS orphan_rate
        |FROM t, o""".stripMargin,

    // PK uniqueness audit of (l_orderkey, l_linenumber).
    "q_dq_pk_violations" ->
      """WITH g AS (SELECT l_orderkey, l_linenumber,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_keys,
        |  CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
        |    AS n_excess_rows,
        |  MAX(n) AS max_multiplicity,
        |  CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS DOUBLE)
        |    / SUM(n) AS dup_rate
        |FROM g""".stripMargin,

    // Two-sample KS: per distinct value, halves' counts cumulate in
    // value order; D_scaled = max |cumA·nB − cumB·nA| exact BIGINT,
    // one double division at the end.
    "q_drift_ks" ->
      """WITH bd AS (SELECT MIN(epoch_ns(ts)//1000000000) AS lo_s,
        |    MAX(epoch_ns(ts)//1000000000) AS hi_s FROM events),
        |cells AS (SELECT event_type AS grp, value AS v,
        |    CAST(SUM(CASE WHEN epoch_ns(ts)//1000000000
        |      >= (lo_s + hi_s) // 2 THEN 0 ELSE 1 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN epoch_ns(ts)//1000000000
        |      >= (lo_s + hi_s) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events, bd GROUP BY 1, 2),
        |c AS (SELECT *,
        |    CAST(SUM(a) OVER (PARTITION BY grp ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
        |    CAST(SUM(b) OVER (PARTITION BY grp ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b,
        |    CAST(SUM(a) OVER (PARTITION BY grp) AS BIGINT) AS n_a,
        |    CAST(SUM(b) OVER (PARTITION BY grp) AS BIGINT) AS n_b
        |  FROM cells)
        |SELECT grp AS event_type, MAX(n_a) AS n_before,
        |  MAX(n_b) AS n_after,
        |  MAX(abs(cum_a * n_b - cum_b * n_a)) AS d_scaled,
        |  CASE WHEN MAX(n_a) > 0 AND MAX(n_b) > 0 THEN
        |    CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
        |      / CAST(MAX(n_a) * MAX(n_b) AS DOUBLE) END AS ks
        |FROM c GROUP BY 1""".stripMargin,

    // Priority sampling: priority = (w·2^60) / (h+1), both operands
    // exact doubles (2^60 is representable; BIGINT→DOUBLE correctly
    // rounded), ties by doc_id.
    "q_sample_weighted" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      ::BIGINT AS hk
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars,
        |  (CAST(n_chars AS DOUBLE) * 1.152921504606846976e18)
        |    / CAST(hk + 1 AS DOUBLE) AS priority,
        |  CAST(row_number() OVER (ORDER BY
        |    (CAST(n_chars AS DOUBLE) * 1.152921504606846976e18)
        |      / CAST(hk + 1 AS DOUBLE) DESC, doc_id) AS BIGINT)
        |    AS sample_rank
        |FROM h QUALIFY sample_rank <= 100""".stripMargin,

    // Pairwise Pearson over hourly exact-decimal sums; the combine is
    // the engine's fixed double op chain, degenerate pairs NULL.
    "q_series_corr" ->
      s"""WITH $hourlyBucketCte,
        |bv AS (SELECT series, bucket_s, y AS v FROM b),
        |j AS (SELECT a.series AS series_a, c.series AS series_b,
        |    a.v AS va, c.v AS vb
        |  FROM bv a JOIN bv c ON a.bucket_s = c.bucket_s
        |  WHERE a.series <= c.series),
        |m AS (SELECT series_a, series_b,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(va) AS sx, SUM(vb) AS sy,
        |    SUM(CAST(va * vb AS DECIMAL(38,4))) AS sxy,
        |    SUM(CAST(va * va AS DECIMAL(38,4))) AS sxx,
        |    SUM(CAST(vb * vb AS DECIMAL(38,4))) AS syy
        |  FROM j GROUP BY 1, 2),
        |d AS (SELECT *,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy
        |  FROM m)
        |SELECT series_a, series_b, n,
        |  CASE WHEN n >= 2 AND dx > 0.0 AND dy > 0.0 THEN
        |    num / (sqrt(dx) * sqrt(dy)) END AS corr_r
        |FROM d""".stripMargin,

    // Seasonality cells from pure integer arithmetic on the epoch
    // second (1970-01-01 = Thursday; Monday = 1).
    "q_seasonality" ->
      """WITH e AS (SELECT event_type AS series, value,
        |    epoch_ns(ts)//1000000000 AS s FROM events)
        |SELECT series,
        |  (((s // 3600) % 24) + 24) % 24 AS hour_of_day,
        |  ((((s // 86400 + 3) % 7) + 7) % 7) + 1 AS day_of_week,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value)
        |    AS avg_value
        |FROM e GROUP BY 1, 2, 3""".stripMargin,

    // Snapshot diff of the synthetic before/after event versions:
    // presence markers + null-safe fieldwise payload compare (the
    // engine's struct <=>).
    "q_table_diff" ->
      """WITH before AS (SELECT event_id, user_id, event_type, value,
        |    1 AS pb FROM events WHERE event_id % 7 <> 0),
        |after AS (SELECT event_id, user_id AS au, event_type AS at2,
        |    CASE WHEN event_id % 5 = 0 THEN value + 1.0 ELSE value END
        |      AS av, 1 AS pa
        |  FROM events WHERE event_id % 11 <> 0),
        |j AS (SELECT pb, pa,
        |    (user_id IS NOT DISTINCT FROM au
        |     AND event_type IS NOT DISTINCT FROM at2
        |     AND value IS NOT DISTINCT FROM av) AS same
        |  FROM before b FULL OUTER JOIN after a USING (event_id)),
        |r AS (SELECT
        |    CAST(SUM(CASE WHEN pb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_added,
        |    CAST(SUM(CASE WHEN pa IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_removed,
        |    CAST(SUM(CASE WHEN pb = 1 AND pa = 1 AND NOT same
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |    CAST(SUM(CASE WHEN pb = 1 AND pa = 1 AND same
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |  FROM j)
        |SELECT *, n_added + n_removed + n_changed + n_unchanged
        |    AS n_total,
        |  CAST(n_added + n_removed + n_changed AS DOUBLE)
        |    / (n_added + n_removed + n_changed + n_unchanged)
        |    AS drift_rate
        |FROM r""".stripMargin,

    // K-anonymity audit of the generalized export; the pseudonym never
    // joins the quasi tuple.
    "q_anonymize_k" ->
      """WITH ex AS (SELECT
        |    epoch_ns(date_trunc('day', ts))//1000000000 AS day_s,
        |    event_type,
        |    CAST(floor(value / 10.0) AS BIGINT) * 10 AS value_bucket
        |  FROM events),
        |g AS (SELECT day_s, event_type, value_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM ex GROUP BY 1, 2, 3)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(n) AS BIGINT) AS n_rows,
        |  MIN(n) AS min_class,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_rows_below_k,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_singletons,
        |  CAST(5 AS BIGINT) AS k_threshold,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
        |    / SUM(n) AS below_k_share
        |FROM g""".stripMargin,

    // Per-series OLS over hourly sums: hours-since-start re-index +
    // scale-2 sums keep every moment's grains below 2^53.
    "q_series_trend" ->
      s"""WITH $hourlyBucketCte,
        |t AS (SELECT *, MIN(bucket_s) OVER (PARTITION BY series) AS t0
        |  FROM b),
        |u AS (SELECT series, (bucket_s - t0) // 3600 AS t_h, y FROM t),
        |m AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(t_h) AS BIGINT) AS st,
        |    CAST(SUM(t_h * t_h) AS BIGINT) AS stt,
        |    SUM(y) AS sy,
        |    SUM(CAST(t_h * y AS DECIMAL(38,2))) AS sty
        |  FROM u GROUP BY 1),
        |d AS (SELECT *, CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
        |    - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS den FROM m),
        |sl AS (SELECT *, CASE WHEN n >= 2 AND den > 0.0 THEN
        |    (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
        |     - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)) / den END
        |    AS slope_per_hour
        |  FROM d)
        |SELECT series, n, slope_per_hour,
        |  CASE WHEN slope_per_hour IS NOT NULL THEN
        |    (CAST(sy AS DOUBLE) - slope_per_hour * CAST(st AS DOUBLE))
        |      / CAST(n AS DOUBLE) END AS intercept
        |FROM sl""".stripMargin,

    // Cohen's kappa on the language-ID confusion: marginal cross-
    // product exact (HUGEINT), p_o/p_e/kappa in the engine's double
    // op order.
    "q_text_langid_kappa" -> {
      val markers = graft.operators.TextAnalysis.defaultMarkers
      val langs = markers.keys.toSeq.sorted
      val scoreCols = langs.map { l =>
        val list = markers(l).map(w => s"'$w'").mkString(", ")
        s"""CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
           |      x -> list_contains([$list], x))) AS BIGINT) AS score_$l""".stripMargin
      }.mkString(",\n    ")
      val m = langs.map(l => s"score_$l").mkString(", ")
      val cases = langs.map(l => s"WHEN score_$l = m THEN '$l'").mkString(" ")
      s"""WITH sc AS (SELECT doc_id, lang,
         |    $scoreCols
         |  FROM documents),
         |g AS (SELECT *, GREATEST($m) AS m FROM sc),
         |p AS (SELECT lang,
         |    CASE WHEN m = 0 THEN 'und' $cases END AS predicted_lang
         |  FROM g),
         |conf AS (SELECT lang, predicted_lang,
         |    CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
         |rm AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nr
         |  FROM conf GROUP BY 1),
         |cm AS (SELECT predicted_lang, CAST(SUM(n) AS BIGINT) AS nc
         |  FROM conf GROUP BY 1),
         |cr AS (SELECT SUM(CAST(nr AS HUGEINT) * nc) AS cross_h
         |  FROM rm JOIN cm ON rm.lang = cm.predicted_lang),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         |    CAST(SUM(CASE WHEN lang = predicted_lang THEN n ELSE 0 END)
         |      AS BIGINT) AS n_agree
         |  FROM conf),
         |d AS (SELECT n_total, n_agree,
         |    CAST(n_agree AS DOUBLE) / n_total AS p_observed,
         |    CAST(cross_h AS DOUBLE)
         |      / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE))
         |      AS p_expected
         |  FROM tot, cr)
         |SELECT n_total, n_agree, p_observed, p_expected,
         |  CASE WHEN p_expected < 1.0 THEN
         |    (p_observed - p_expected) / (1.0 - p_expected) END AS kappa
         |FROM d""".stripMargin
    },

    // Tokenizer fertility per language: BPE counts from the shared
    // per-doc CTEs; docs with no words count zero tokens/words.
    "q_text_fertility" ->
      s"""WITH $bpePerDocCtes,
         |base AS (SELECT doc_id, lang,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(list_filter(
         |        regexp_split_to_array(trim(text), '\\s+'),
         |        x -> length(x) > 0)) END AS n_words,
         |    CAST(length(text) AS BIGINT) AS n_chars
         |  FROM documents),
         |j AS (SELECT b.lang, b.n_words, b.n_chars,
         |    COALESCE(s.n_bpe_tokens, 0) AS n_bpe
         |  FROM base b LEFT JOIN s USING (doc_id)),
         |a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_words) AS BIGINT) AS n_words,
         |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |    CAST(SUM(n_bpe) AS BIGINT) AS n_tokens
         |  FROM j GROUP BY 1)
         |SELECT lang, n_docs, n_words, n_chars, n_tokens,
         |  CASE WHEN n_words > 0 THEN
         |    CAST(n_tokens AS DOUBLE) / n_words END AS fertility,
         |  CASE WHEN n_tokens > 0 THEN
         |    CAST(n_chars AS DOUBLE) / n_tokens END AS chars_per_token
         |FROM a""".stripMargin,

    // ANALYZE-style profile: one UNION ALL arm per column; min/max
    // stringified (BIGINT/VARCHAR render identically; the value range
    // here keeps double rendering in the plain-decimal regime).
    "q_dq_profile" -> {
      def arm(c: String) =
        s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_value,
           |  CAST(MAX($c) AS VARCHAR) AS max_value
           |FROM events""".stripMargin
      val arms = Seq("event_id", "user_id", "event_type", "value")
        .map(arm).mkString("\nUNION ALL\n")
      s"""WITH p AS ($arms)
         |SELECT *, CAST(n_nulls AS DOUBLE) / n_rows AS null_share
         |FROM p""".stripMargin
    },

    // Top session journeys: the sessionize CTEs + ordered list path
    // with the 5-step cap and the truncation marker.
    "q_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts)//1000 AS us FROM events),
        |l AS (SELECT *, lag(us) OVER w AS prev
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(CASE WHEN prev IS NULL
        |      OR us - prev > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM l),
        |p AS (SELECT user_id, session_id,
        |    array_to_string(list_slice(
        |      list(event_type ORDER BY us, event_id), 1, 5), '>')
        |    || CASE WHEN COUNT(*) > 5 THEN '>…' ELSE '' END AS path
        |  FROM s GROUP BY 1, 2),
        |c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |  FROM p GROUP BY 1)
        |SELECT path, n_sessions,
        |  CAST(row_number() OVER (ORDER BY n_sessions DESC, path)
        |    AS BIGINT) AS rank
        |FROM c QUALIFY rank <= 10""".stripMargin,

    // Dwell per state: the SCD2 runs' closed intervals rolled up.
    "q_state_dwell" ->
      s"""WITH ${scd2RunsCtes("")},
        |iv AS (SELECT user_id, version, event_type, valid_from_s,
        |    lead(valid_from_s) OVER (PARTITION BY user_id
        |      ORDER BY version) AS valid_to_s
        |  FROM runs)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN valid_to_s IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_closed,
        |  CAST(SUM(CASE WHEN valid_to_s IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN valid_to_s IS NOT NULL
        |    THEN valid_to_s - valid_from_s END) AS BIGINT) AS dwell_s,
        |  CASE WHEN SUM(CASE WHEN valid_to_s IS NOT NULL THEN 1
        |      ELSE 0 END) > 0 THEN
        |    CAST(SUM(CASE WHEN valid_to_s IS NOT NULL
        |      THEN valid_to_s - valid_from_s END) AS DOUBLE)
        |      / SUM(CASE WHEN valid_to_s IS NOT NULL THEN 1 ELSE 0 END)
        |    END AS mean_dwell_s
        |FROM iv GROUP BY 1""".stripMargin,

    // Burst detection: minute counts, then the peak (ties earliest).
    "q_burst" ->
      """WITH m AS (SELECT event_type,
        |    epoch_ns(ts)//1000000000
        |      - (epoch_ns(ts)//1000000000) % 60 AS minute_s,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY n DESC, minute_s) AS rn FROM m),
        |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT)
        |    AS n_active_minutes, MAX(n) AS peak_per_minute
        |  FROM m GROUP BY 1)
        |SELECT a.event_type, a.peak_per_minute, p.minute_s
        |    AS peak_minute_s, a.n_active_minutes
        |FROM a JOIN p ON p.event_type = a.event_type AND p.rn = 1""".stripMargin,

    // HLL distinct-rollup AUDIT: every exact column recomputed with
    // exact distinct counts; the estimate-accuracy verdict is pinned
    // TRUE — the spec-locked lgK=12 contract (~1.6 % rse vs the 5 %
    // bar), so a drifting sketch flips the column and fails the hash.
    "q_sketch_distinct" ->
      """WITH e AS (SELECT
        |    ((epoch_ns(ts)//1000000000) // 86400) * 86400 AS day_s,
        |    user_id FROM events),
        |d AS (SELECT day_s,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd
        |  FROM e GROUP BY 1),
        |w AS (SELECT (day_s // 604800) * 604800 AS week_s,
        |    CAST(SUM(nd) AS BIGINT) AS sum_daily_exact,
        |    CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM d GROUP BY 1),
        |x AS (SELECT (day_s // 604800) * 604800 AS week_s,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
        |  FROM e GROUP BY 1)
        |SELECT w.week_s, x.exact_users, w.sum_daily_exact, w.n_days,
        |  TRUE AS est_within_5pct
        |FROM w JOIN x ON x.week_s = w.week_s""".stripMargin,

    // HLL overlap AUDIT: exact half/union/overlap audiences; the four
    // sketch verdicts are pinned TRUE per the spec-locked accuracy
    // contracts (direct estimates within 5 %, compounded overlap
    // within max(2, union/10)).
    "q_sketch_overlap" ->
      """WITH e AS (SELECT user_id,
        |    epoch_ns(ts)//1000000000 AS s FROM events),
        |b AS (SELECT MIN(s) AS lo_s, MAX(s) AS hi_s FROM e),
        |f AS (SELECT DISTINCT e.user_id,
        |    e.s >= (b.lo_s + b.hi_s) // 2 AS late FROM e, b)
        |SELECT
        |  CAST(SUM(CASE WHEN NOT late THEN 1 ELSE 0 END) AS BIGINT)
        |    AS exact_first,
        |  CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
        |    AS exact_second,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_union,
        |  CAST(SUM(CASE WHEN NOT late THEN 1 ELSE 0 END)
        |    + SUM(CASE WHEN late THEN 1 ELSE 0 END)
        |    - COUNT(DISTINCT user_id) AS BIGINT) AS exact_overlap,
        |  TRUE AS est_first_ok, TRUE AS est_second_ok,
        |  TRUE AS est_union_ok, TRUE AS overlap_err_bounded
        |FROM f""".stripMargin,

    // Count-min sketch, md5-portable buckets (depth 4 × width 512):
    // the ESTIMATES are reproduced bit-for-bit — same md5_60 bucket
    // hash, same counter sums, same row-wise MIN — so unlike the HLL
    // audits nothing here is pinned; a drifting sketch changes
    // cms_est/overestimate and fails the hash directly.
    "q_sketch_cms" ->
      """WITH g AS (SELECT UNNEST([0, 1, 2, 3]) AS i),
        |u AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        |cms AS (SELECT g.i,
        |    ('0x' || substring(md5(CAST(g.i AS VARCHAR) || ':' || u.k),
        |      1, 15))::BIGINT % 512 AS b,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM u CROSS JOIN g GROUP BY 1, 2),
        |top AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_n
        |  FROM u GROUP BY 1 ORDER BY exact_n DESC, k LIMIT 10),
        |est AS (SELECT t.k, t.exact_n, MIN(c.c) AS cms_est
        |  FROM top t CROSS JOIN g
        |  JOIN cms c ON c.i = g.i AND c.b =
        |    ('0x' || substring(md5(CAST(g.i AS VARCHAR) || ':' || t.k),
        |      1, 15))::BIGINT % 512
        |  GROUP BY 1, 2)
        |SELECT k AS key, exact_n, cms_est,
        |  cms_est - exact_n AS overestimate,
        |  cms_est >= exact_n AS never_underestimates
        |FROM est""".stripMargin,

    // GK quantile-summary AUDIT: exact rank-selected p50/p90/p99 (the
    // k-th smallest VALUE at rank ceil(q*n) — pure selection, no
    // interpolation, so the doubles are bit-identical) with the three
    // rank-window verdicts pinned TRUE per the accuracy=1000 contract.
    "q_sketch_quantiles" ->
      """WITH r AS (SELECT event_type AS g, value AS v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT g AS event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS exact_p50,
        |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS exact_p90,
        |  MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN v END)
        |    AS exact_p99,
        |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM r GROUP BY 1""".stripMargin,

    // Five damped PageRank steps over the bidirectional cust↔supp
    // graph, unrolled as CTEs — all-integer ppb arithmetic (floor
    // division on non-negative operands agrees between `div` and `//`),
    // so every rank matches the engine bit-for-bit. DuckDB's SUM
    // returns HUGEINT; the arithmetic stays integer-exact and the
    // final CAST restores BIGINT.
    "q_graph_pagerank" ->
      """WITH p AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
        |  FROM e GROUP BY 1),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM nd),
        |r0 AS (SELECT node, 1000000000 // nn AS rank_ppb
        |  FROM nd CROSS JOIN c),
        |r1 AS (SELECT nd.node, (150000000 // c.nn)
        |    + ((85 * COALESCE(s.inc, 0)) // 100) AS rank_ppb
        |  FROM nd CROSS JOIN c
        |  LEFT JOIN (SELECT e.dst AS node,
        |      SUM(r.rank_ppb // d.outdeg) AS inc
        |    FROM e JOIN r0 r ON r.node = e.src
        |    JOIN deg d ON d.node = e.src GROUP BY 1) s
        |    ON s.node = nd.node),
        |r2 AS (SELECT nd.node, (150000000 // c.nn)
        |    + ((85 * COALESCE(s.inc, 0)) // 100) AS rank_ppb
        |  FROM nd CROSS JOIN c
        |  LEFT JOIN (SELECT e.dst AS node,
        |      SUM(r.rank_ppb // d.outdeg) AS inc
        |    FROM e JOIN r1 r ON r.node = e.src
        |    JOIN deg d ON d.node = e.src GROUP BY 1) s
        |    ON s.node = nd.node),
        |r3 AS (SELECT nd.node, (150000000 // c.nn)
        |    + ((85 * COALESCE(s.inc, 0)) // 100) AS rank_ppb
        |  FROM nd CROSS JOIN c
        |  LEFT JOIN (SELECT e.dst AS node,
        |      SUM(r.rank_ppb // d.outdeg) AS inc
        |    FROM e JOIN r2 r ON r.node = e.src
        |    JOIN deg d ON d.node = e.src GROUP BY 1) s
        |    ON s.node = nd.node),
        |r4 AS (SELECT nd.node, (150000000 // c.nn)
        |    + ((85 * COALESCE(s.inc, 0)) // 100) AS rank_ppb
        |  FROM nd CROSS JOIN c
        |  LEFT JOIN (SELECT e.dst AS node,
        |      SUM(r.rank_ppb // d.outdeg) AS inc
        |    FROM e JOIN r3 r ON r.node = e.src
        |    JOIN deg d ON d.node = e.src GROUP BY 1) s
        |    ON s.node = nd.node),
        |r5 AS (SELECT nd.node, (150000000 // c.nn)
        |    + ((85 * COALESCE(s.inc, 0)) // 100) AS rank_ppb
        |  FROM nd CROSS JOIN c
        |  LEFT JOIN (SELECT e.dst AS node,
        |      SUM(r.rank_ppb // d.outdeg) AS inc
        |    FROM e JOIN r4 r ON r.node = e.src
        |    JOIN deg d ON d.node = e.src GROUP BY 1) s
        |    ON s.node = nd.node)
        |SELECT CASE WHEN node % 2 = 0 THEN 'C' ELSE 'S' END AS node_type,
        |  node // 2 AS node_id, CAST(rank_ppb AS BIGINT) AS rank_ppb
        |FROM r5 ORDER BY rank_ppb DESC, node LIMIT 20""".stripMargin,

    // Personalized PageRank seeded at the top-order-count customer:
    // same integer unroll, base mass restarts only at the seed, and
    // (mirroring the engine's sparse frontier) only rank>0 nodes send
    // messages — an exact filter, zero messages carry zero mass.
    "q_graph_ppr" ->
      """WITH p AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
        |  FROM e GROUP BY 1),
        |sb AS (SELECT node, CAST(1000000000 AS BIGINT) AS base FROM
        |  (SELECT o_custkey * 2 AS node, COUNT(*) AS n_orders
        |   FROM orders GROUP BY 1
        |   ORDER BY n_orders DESC, node LIMIT 1)),
        |r0 AS (SELECT nd.node, CAST(COALESCE(sb.base, 0) AS BIGINT)
        |    AS rank_ppb
        |  FROM nd LEFT JOIN sb ON sb.node = nd.node),
        |r1 AS (SELECT a.node, ((15 * COALESCE(sb.base, 0)) // 100)
        |    + ((85 * a.inc) // 100) AS rank_ppb
        |  FROM (SELECT x.dst AS node, SUM(x.m) AS inc FROM (
        |      SELECT e.dst, r.rank_ppb // d.outdeg AS m
        |      FROM e JOIN r0 r ON r.node = e.src AND r.rank_ppb > 0
        |      JOIN deg d ON d.node = e.src
        |      UNION ALL SELECT node AS dst, 0 AS m FROM nd) x
        |    GROUP BY 1) a
        |  LEFT JOIN sb ON sb.node = a.node),
        |r2 AS (SELECT a.node, ((15 * COALESCE(sb.base, 0)) // 100)
        |    + ((85 * a.inc) // 100) AS rank_ppb
        |  FROM (SELECT x.dst AS node, SUM(x.m) AS inc FROM (
        |      SELECT e.dst, r.rank_ppb // d.outdeg AS m
        |      FROM e JOIN r1 r ON r.node = e.src AND r.rank_ppb > 0
        |      JOIN deg d ON d.node = e.src
        |      UNION ALL SELECT node AS dst, 0 AS m FROM nd) x
        |    GROUP BY 1) a
        |  LEFT JOIN sb ON sb.node = a.node),
        |r3 AS (SELECT a.node, ((15 * COALESCE(sb.base, 0)) // 100)
        |    + ((85 * a.inc) // 100) AS rank_ppb
        |  FROM (SELECT x.dst AS node, SUM(x.m) AS inc FROM (
        |      SELECT e.dst, r.rank_ppb // d.outdeg AS m
        |      FROM e JOIN r2 r ON r.node = e.src AND r.rank_ppb > 0
        |      JOIN deg d ON d.node = e.src
        |      UNION ALL SELECT node AS dst, 0 AS m FROM nd) x
        |    GROUP BY 1) a
        |  LEFT JOIN sb ON sb.node = a.node),
        |r4 AS (SELECT a.node, ((15 * COALESCE(sb.base, 0)) // 100)
        |    + ((85 * a.inc) // 100) AS rank_ppb
        |  FROM (SELECT x.dst AS node, SUM(x.m) AS inc FROM (
        |      SELECT e.dst, r.rank_ppb // d.outdeg AS m
        |      FROM e JOIN r3 r ON r.node = e.src AND r.rank_ppb > 0
        |      JOIN deg d ON d.node = e.src
        |      UNION ALL SELECT node AS dst, 0 AS m FROM nd) x
        |    GROUP BY 1) a
        |  LEFT JOIN sb ON sb.node = a.node),
        |r5 AS (SELECT a.node, ((15 * COALESCE(sb.base, 0)) // 100)
        |    + ((85 * a.inc) // 100) AS rank_ppb
        |  FROM (SELECT x.dst AS node, SUM(x.m) AS inc FROM (
        |      SELECT e.dst, r.rank_ppb // d.outdeg AS m
        |      FROM e JOIN r4 r ON r.node = e.src AND r.rank_ppb > 0
        |      JOIN deg d ON d.node = e.src
        |      UNION ALL SELECT node AS dst, 0 AS m FROM nd) x
        |    GROUP BY 1) a
        |  LEFT JOIN sb ON sb.node = a.node)
        |SELECT CASE WHEN node % 2 = 0 THEN 'C' ELSE 'S' END AS node_type,
        |  node // 2 AS node_id, CAST(rank_ppb AS BIGINT) AS rank_ppb
        |FROM r5 ORDER BY rank_ppb DESC, node LIMIT 20""".stripMargin,

    // Z-order locality audit: the 44-term Morton interleave is
    // GENERATED by the same Scala loop the engine expression uses
    // (Layout.zValueSql) — the two formulas cannot drift apart.
    "q_layout_zorder" ->
      s"""WITH b AS (SELECT MIN(epoch_ns(ts)//1000000000) AS lo_s
         |  FROM events),
         |p AS (SELECT user_id AS x,
         |    epoch_ns(ts)//1000000000 - b.lo_s AS y
         |  FROM events, b),
         |z AS (SELECT x, y,
         |    ${graft.operators.Layout.zValueSql("x", "y", 22)} >> 36
         |      AS zb
         |  FROM p)
         |SELECT zb, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  MIN(x) AS x_min, MAX(x) AS x_max,
         |  MIN(y) AS y_min, MAX(y) AS y_max
         |FROM z GROUP BY 1""".stripMargin,

    // Poisson-bootstrap CI: the 8-threshold inverse-CDF multiplicity
    // is GENERATED from the engine's own baked constants
    // (Bootstrap.multiplicitySql) — decimal-exact weighted sums, one
    // final double division per replica, rank-selected band.
    "q_bootstrap_ci" ->
      s"""WITH br AS (SELECT UNNEST([${(0 until 32).mkString(", ")}]) AS b),
         |r AS (SELECT br.b,
         |    ${graft.operators.Bootstrap.multiplicitySql(
               "e.event_id", "br.b")} AS w,
         |    e.value
         |  FROM events e CROSS JOIN br),
         |m AS (SELECT b, CASE WHEN SUM(w) > 0 THEN
         |      CAST(SUM(CAST(value * w AS DECIMAL(28, 6))) AS DOUBLE)
         |        / CAST(SUM(w) AS DOUBLE)
         |    END AS m
         |  FROM r GROUP BY 1),
         |rk AS (SELECT m, b,
         |    row_number() OVER (ORDER BY m, b) AS rn FROM m),
         |band AS (SELECT MAX(CASE WHEN rn = 2 THEN m END) AS ci_lo,
         |    MAX(CASE WHEN rn = 31 THEN m END) AS ci_hi,
         |    CAST(COUNT(*) AS BIGINT) AS n_replicas FROM rk),
         |f AS (SELECT CAST(SUM(CAST(value AS DECIMAL(28, 6))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS mean FROM events)
         |SELECT f.mean, band.ci_lo, band.ci_hi, band.n_replicas
         |FROM f, band""".stripMargin,

    // Bootstrap uplift band (purchase vs view): paired resamples —
    // each replica reweights BOTH arms with the same hash draws, one
    // grouped pass of conditional decimal sums, one double
    // subtraction per replica, rank-selected band.
    "q_bootstrap_uplift" ->
      s"""WITH br AS (SELECT UNNEST([${(0 until 32).mkString(", ")}]) AS b),
         |e2 AS (SELECT event_id, value,
         |    event_type = 'purchase' AS is_b
         |  FROM events WHERE event_type IN ('view', 'purchase')),
         |r AS (SELECT br.b, e2.value, e2.is_b,
         |    ${graft.operators.Bootstrap.multiplicitySql(
               "e2.event_id", "br.b")} AS w
         |  FROM e2 CROSS JOIN br),
         |m AS (SELECT b,
         |    SUM(CASE WHEN NOT is_b THEN CAST(value * w AS DECIMAL(28, 6))
         |      ELSE CAST(0 AS DECIMAL(28, 6)) END) AS was,
         |    SUM(CASE WHEN NOT is_b THEN w ELSE 0 END) AS wna,
         |    SUM(CASE WHEN is_b THEN CAST(value * w AS DECIMAL(28, 6))
         |      ELSE CAST(0 AS DECIMAL(28, 6)) END) AS wsb,
         |    SUM(CASE WHEN is_b THEN w ELSE 0 END) AS wnb
         |  FROM r GROUP BY 1),
         |d AS (SELECT b, CASE WHEN wna > 0 AND wnb > 0 THEN
         |      CAST(wsb AS DOUBLE) / CAST(wnb AS DOUBLE)
         |        - CAST(was AS DOUBLE) / CAST(wna AS DOUBLE)
         |    END AS d FROM m),
         |rk AS (SELECT d, b, row_number() OVER (ORDER BY d, b) AS rn
         |  FROM d WHERE d IS NOT NULL),
         |band AS (SELECT MAX(CASE WHEN rn = 2 THEN d END) AS ci_lo,
         |    MAX(CASE WHEN rn = 31 THEN d END) AS ci_hi,
         |    CAST(COUNT(*) AS BIGINT) AS n_replicas FROM rk),
         |f AS (SELECT
         |    CAST(SUM(CASE WHEN is_b THEN CAST(value AS DECIMAL(28, 6))
         |        ELSE CAST(0 AS DECIMAL(28, 6)) END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS DOUBLE)
         |    - CAST(SUM(CASE WHEN NOT is_b THEN CAST(value AS DECIMAL(28, 6))
         |        ELSE CAST(0 AS DECIMAL(28, 6)) END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS DOUBLE)
         |    AS uplift FROM e2)
         |SELECT f.uplift, band.ci_lo, band.ci_hi, band.n_replicas
         |FROM f, band""".stripMargin,

    // Portable-Bloom membership audit: the realized filter (distinct
    // (hash-row, bit) pairs) and the probe verdicts are bit-for-bit
    // reproducible — same md5_60 bit recipe as the CMS oracle.
    "q_sketch_bloom" ->
      """WITH g AS (SELECT UNNEST([0, 1, 2, 3]) AS i),
        |k AS (SELECT DISTINCT user_id AS k FROM events),
        |bits AS (SELECT DISTINCT g.i,
        |    ('0x' || substring(md5(CAST(g.i AS VARCHAR) || ':'
        |      || CAST(k.k AS VARCHAR)), 1, 15))::BIGINT % 4096 AS b
        |  FROM k CROSS JOIN g),
        |nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys FROM k),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM bits),
        |pr AS (SELECT 1000000 + x AS p
        |  FROM generate_series(0, 999) t(x)),
        |hits AS (SELECT pr.p, CAST(COUNT(*) AS BIGINT) AS n_set
        |  FROM pr CROSS JOIN g
        |  JOIN bits ON bits.i = g.i AND bits.b =
        |    ('0x' || substring(md5(CAST(g.i AS VARCHAR) || ':'
        |      || CAST(pr.p AS VARCHAR)), 1, 15))::BIGINT % 4096
        |  GROUP BY 1),
        |fp AS (SELECT CAST(COALESCE(SUM(
        |      CASE WHEN n_set = 4 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS n_false_positives FROM hits)
        |SELECT nk.n_keys, nb.n_bits_set,
        |  CAST(1000 AS BIGINT) AS n_probes, fp.n_false_positives,
        |  nb.n_bits_set > 0 AND nb.n_bits_set < 4096 AS not_saturated
        |FROM nk, nb, fp""".stripMargin,

    // MRR@10 of the LSH index vs exact-cosine gold: system list is the
    // LSH top-11 (q_sim_lsh's chain) minus the query's own row with
    // ranks closed up; gold is the exact self-excluded top-1; the
    // reciprocal-rank sum folds as exact integers 2520 // r.
    "q_eval_mrr" ->
      s"""WITH ${lshSigCtes(tables = 4, planes = 8)},
         |cand AS (SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS corpus_id
         |  FROM sig qs JOIN sig cs ON qs.tbl = cs.tbl AND qs.bucket = cs.bucket
         |  WHERE qs.vec_id < 10),
         |s AS (SELECT query_id, corpus_id,
         |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE) AS score
         |  FROM cand
         |  JOIN el qe ON qe.vec_id = query_id
         |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
         |  GROUP BY 1, 2),
         |sysr AS (SELECT query_id, corpus_id, score FROM s
         |  QUALIFY row_number() OVER
         |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) <= 11),
         |sys AS (SELECT query_id, corpus_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, corpus_id) AS BIGINT) AS sys_rank
         |  FROM sysr WHERE query_id <> corpus_id
         |  QUALIFY sys_rank <= 10),
         |norms AS (SELECT vec_id,
         |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
         |  FROM el GROUP BY 1),
         |sall AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
         |  FROM el q JOIN el c ON q.i = c.i
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id GROUP BY 1, 2),
         |truth AS (SELECT query_id, corpus_id FROM (
         |    SELECT sa.query_id, sa.corpus_id,
         |      sa.dot / (nq.nrm * nc.nrm) AS score
         |    FROM sall sa JOIN norms nq ON nq.vec_id = sa.query_id
         |                 JOIN norms nc ON nc.vec_id = sa.corpus_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, corpus_id) = 1),
         |j AS (SELECT t.query_id, COALESCE(sys.sys_rank, 0) AS sys_rank
         |  FROM truth t LEFT JOIN sys ON sys.query_id = t.query_id
         |    AND sys.corpus_id = t.corpus_id)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  CAST(COALESCE(SUM(CASE WHEN sys_rank > 0 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_hits,
         |  CAST(COALESCE(SUM(CASE WHEN sys_rank = 1 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_hits_at_1,
         |  CAST(COALESCE(SUM(CASE WHEN sys_rank > 0 THEN 2520 // sys_rank
         |    ELSE 0 END), 0) AS BIGINT) AS rr_scaled_sum,
         |  CAST(COALESCE(SUM(CASE WHEN sys_rank > 0 THEN 2520 // sys_rank
         |    ELSE 0 END), 0) AS DOUBLE)
         |    / CAST(COUNT(*) * 2520 AS DOUBLE) AS mrr
         |FROM j""".stripMargin,

    // Sub-document containment pairs: same brute-force shingle chain
    // as q_dedup_ngram_jaccard, scored |A∩B| / min(|A|,|B|); contained
    // side = strictly smaller set, ties keep the lower id as container.
    "q_dedup_containment" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words
         |  FROM documents),
         |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(3)}) AS shingle
         |  FROM w),
         |sizes AS (SELECT id, COUNT(*) AS set_size FROM sh GROUP BY 1),
         |inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |  WHERE a.id < b.id GROUP BY 1, 2)
         |SELECT CASE WHEN sa.set_size < sb.set_size THEN id_a ELSE id_b END
         |    AS contained_id,
         |  CASE WHEN sa.set_size < sb.set_size THEN id_b ELSE id_a END
         |    AS container_id,
         |  n_common,
         |  CAST(n_common AS DOUBLE)
         |    / CAST(LEAST(sa.set_size, sb.set_size) AS DOUBLE) AS containment
         |FROM inter
         |JOIN sizes sa ON sa.id = id_a
         |JOIN sizes sb ON sb.id = id_b
         |WHERE CAST(n_common AS DOUBLE)
         |    / CAST(LEAST(sa.set_size, sb.set_size) AS DOUBLE) >= 0.5""".stripMargin,

    // HITS on the DIRECTED customer→supplier graph: 3 unrolled rounds
    // (auth from hubs, then hubs from the NEW auths), each L1-normalized
    // by the integer fold x // (sum(x) // 1e9) — bit-exact cross-engine.
    "q_graph_hits" ->
      """WITH p AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |h0 AS (SELECT DISTINCT src AS node,
        |    CAST(1000000000 AS BIGINT) AS s FROM p),
        |a1r AS (SELECT p.dst AS node, SUM(h.s) AS raw
        |  FROM p JOIN h0 h ON h.node = p.src GROUP BY 1),
        |a1n AS (SELECT GREATEST(SUM(raw) // 1000000000, 1) AS nrm FROM a1r),
        |a1 AS (SELECT node, raw // nrm AS s FROM a1r CROSS JOIN a1n),
        |h1r AS (SELECT p.src AS node, SUM(a.s) AS raw
        |  FROM p JOIN a1 a ON a.node = p.dst GROUP BY 1),
        |h1n AS (SELECT GREATEST(SUM(raw) // 1000000000, 1) AS nrm FROM h1r),
        |h1 AS (SELECT node, raw // nrm AS s FROM h1r CROSS JOIN h1n),
        |a2r AS (SELECT p.dst AS node, SUM(h.s) AS raw
        |  FROM p JOIN h1 h ON h.node = p.src GROUP BY 1),
        |a2n AS (SELECT GREATEST(SUM(raw) // 1000000000, 1) AS nrm FROM a2r),
        |a2 AS (SELECT node, raw // nrm AS s FROM a2r CROSS JOIN a2n),
        |h2r AS (SELECT p.src AS node, SUM(a.s) AS raw
        |  FROM p JOIN a2 a ON a.node = p.dst GROUP BY 1),
        |h2n AS (SELECT GREATEST(SUM(raw) // 1000000000, 1) AS nrm FROM h2r),
        |h2 AS (SELECT node, raw // nrm AS s FROM h2r CROSS JOIN h2n),
        |a3r AS (SELECT p.dst AS node, SUM(h.s) AS raw
        |  FROM p JOIN h2 h ON h.node = p.src GROUP BY 1),
        |a3n AS (SELECT GREATEST(SUM(raw) // 1000000000, 1) AS nrm FROM a3r),
        |a3 AS (SELECT node, raw // nrm AS s FROM a3r CROSS JOIN a3n),
        |h3r AS (SELECT p.src AS node, SUM(a.s) AS raw
        |  FROM p JOIN a3 a ON a.node = p.dst GROUP BY 1),
        |h3n AS (SELECT GREATEST(SUM(raw) // 1000000000, 1) AS nrm FROM h3r),
        |h3 AS (SELECT node, raw // nrm AS s FROM h3r CROSS JOIN h3n),
        |ta AS (SELECT 'authority' AS side, node // 2 AS node_id,
        |    CAST(s AS BIGINT) AS score_ppb
        |  FROM a3 ORDER BY s DESC, node LIMIT 20),
        |th AS (SELECT 'hub' AS side, node // 2 AS node_id,
        |    CAST(s AS BIGINT) AS score_ppb
        |  FROM h3 ORDER BY s DESC, node LIMIT 20)
        |SELECT * FROM ta UNION ALL SELECT * FROM th""".stripMargin,

    // nDCG@10: same LSH system list and exact-cosine chain as
    // q_eval_mrr, truth top-10 grades relevance rel = 11 - truth_rank;
    // integer DCG via the frozen 1e9/log2(rank+1) weight table.
    "q_eval_ndcg" ->
      s"""WITH ${lshSigCtes(tables = 4, planes = 8)},
         |cand AS (SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS corpus_id
         |  FROM sig qs JOIN sig cs ON qs.tbl = cs.tbl AND qs.bucket = cs.bucket
         |  WHERE qs.vec_id < 10),
         |s AS (SELECT query_id, corpus_id,
         |    CAST(SUM(CAST(qe.x * ce.x AS DECIMAL(25,12))) AS DOUBLE) AS score
         |  FROM cand
         |  JOIN el qe ON qe.vec_id = query_id
         |  JOIN el ce ON ce.vec_id = corpus_id AND qe.i = ce.i
         |  GROUP BY 1, 2),
         |sysr AS (SELECT query_id, corpus_id, score FROM s
         |  QUALIFY row_number() OVER
         |    (PARTITION BY query_id ORDER BY score DESC, corpus_id) <= 11),
         |sys AS (SELECT query_id, corpus_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, corpus_id) AS BIGINT) AS sys_rank
         |  FROM sysr WHERE query_id <> corpus_id
         |  QUALIFY sys_rank <= 10),
         |norms AS (SELECT vec_id,
         |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
         |  FROM el GROUP BY 1),
         |sall AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE) AS dot
         |  FROM el q JOIN el c ON q.i = c.i
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id GROUP BY 1, 2),
         |truth AS (SELECT query_id, corpus_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, corpus_id) AS BIGINT) AS truth_rank
         |  FROM (SELECT sa.query_id, sa.corpus_id,
         |      sa.dot / (nq.nrm * nc.nrm) AS score
         |    FROM sall sa JOIN norms nq ON nq.vec_id = sa.query_id
         |                 JOIN norms nc ON nc.vec_id = sa.corpus_id)
         |  QUALIFY truth_rank <= 10),
         |wts(i, wt) AS (VALUES (1, 1000000000), (2, 630929754),
         |  (3, 500000000), (4, 430676558), (5, 386852807), (6, 356207187),
         |  (7, 333333333), (8, 315464877), (9, 301029996), (10, 289064826)),
         |idcg AS (SELECT query_id,
         |    SUM((11 - truth_rank) * CAST(wt AS BIGINT)) AS idcg_scaled
         |  FROM truth JOIN wts ON wts.i = truth_rank GROUP BY 1),
         |dcg AS (SELECT sy.query_id,
         |    SUM((11 - t.truth_rank) * CAST(wt AS BIGINT)) AS dcg_scaled
         |  FROM sys sy
         |  JOIN truth t ON t.query_id = sy.query_id
         |    AND t.corpus_id = sy.corpus_id
         |  JOIN wts ON wts.i = sy.sys_rank
         |  GROUP BY 1)
         |SELECT i.query_id,
         |  CAST(COALESCE(d.dcg_scaled, 0) AS BIGINT) AS dcg_scaled,
         |  CAST(i.idcg_scaled AS BIGINT) AS idcg_scaled,
         |  CAST(COALESCE(d.dcg_scaled, 0) AS DOUBLE)
         |    / CAST(i.idcg_scaled AS DOUBLE) AS ndcg
         |FROM idcg i LEFT JOIN dcg d ON d.query_id = i.query_id""".stripMargin,

    // 5-core after 4 synchronous peeling rounds on the bidirected
    // trade graph, plus the final in-subgraph degree pass — pure edge
    // counting, each round a degree filter among the prior survivors.
    "q_graph_kcore" ->
      """WITH p AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |a0 AS (SELECT DISTINCT src AS node FROM e),
        |d1 AS (SELECT e.src AS node, COUNT(*) AS degree FROM e
        |  JOIN a0 x ON x.node = e.dst JOIN a0 y ON y.node = e.src
        |  GROUP BY 1),
        |a1 AS (SELECT node FROM d1 WHERE degree >= 5),
        |d2 AS (SELECT e.src AS node, COUNT(*) AS degree FROM e
        |  JOIN a1 x ON x.node = e.dst JOIN a1 y ON y.node = e.src
        |  GROUP BY 1),
        |a2 AS (SELECT node FROM d2 WHERE degree >= 5),
        |d3 AS (SELECT e.src AS node, COUNT(*) AS degree FROM e
        |  JOIN a2 x ON x.node = e.dst JOIN a2 y ON y.node = e.src
        |  GROUP BY 1),
        |a3 AS (SELECT node FROM d3 WHERE degree >= 5),
        |d4 AS (SELECT e.src AS node, COUNT(*) AS degree FROM e
        |  JOIN a3 x ON x.node = e.dst JOIN a3 y ON y.node = e.src
        |  GROUP BY 1),
        |a4 AS (SELECT node FROM d4 WHERE degree >= 5),
        |df AS (SELECT e.src AS node, COUNT(*) AS degree FROM e
        |  JOIN a4 x ON x.node = e.dst JOIN a4 y ON y.node = e.src
        |  GROUP BY 1)
        |SELECT CASE WHEN node % 2 = 0 THEN 'C' ELSE 'S' END AS node_type,
        |  node // 2 AS node_id, CAST(degree AS BIGINT) AS degree
        |FROM df""".stripMargin,

    // Exact phrase search "table scan": 1-based positional postings,
    // each word re-keyed to its implied phrase start, adjacency join.
    "q_text_phrase" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |t AS (SELECT doc_id, generate_subscripts(words, 1) AS pos,
        |    unnest(words) AS term FROM w),
        |p0 AS (SELECT doc_id, CAST(pos AS BIGINT) AS start_pos
        |  FROM t WHERE term = 'table'),
        |p1 AS (SELECT doc_id, CAST(pos AS BIGINT) - 1 AS start_pos
        |  FROM t WHERE term = 'scan'),
        |m AS (SELECT p0.doc_id, p0.start_pos
        |  FROM p0 JOIN p1 USING (doc_id, start_pos))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |  CAST(MIN(start_pos) AS BIGINT) AS first_pos
        |FROM m GROUP BY 1""".stripMargin,

    // Holt linear trend (alpha = beta = 1/2) over daily micro-sums:
    // init level=y1, trend=y2-y1; updates t=2..n replayed by the
    // recursive CTE. DuckDB `//` TRUNCATES toward zero (probed:
    // -3 // 2 = -1), so FLOOR halving is spelled (x - (x & 1)) // 2
    // (two's-complement parity is non-negative) — matching the
    // engine's (x - pmod(x, 2)) div 2.
    "q_forecast_holt" ->
      """WITH RECURSIVE d0 AS (SELECT
        |    epoch_ns(date_trunc('day', ts))//1000000000 AS day_s,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
        |      AS y
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |d AS (SELECT y,
        |    CAST(row_number() OVER (ORDER BY day_s) AS BIGINT) AS i
        |  FROM d0),
        |nn AS (SELECT COUNT(*) AS n FROM d),
        |ht AS (
        |  SELECT CAST(2 AS BIGINT) AS t,
        |    (SELECT y FROM d WHERE i = 1) AS level,
        |    (SELECT y FROM d WHERE i = 2)
        |      - (SELECT y FROM d WHERE i = 1) AS trend
        |  UNION ALL
        |  SELECT h.t + 1,
        |    ((dd.y + h.level + h.trend)
        |      - ((dd.y + h.level + h.trend) & 1)) // 2,
        |    ((((dd.y + h.level + h.trend)
        |        - ((dd.y + h.level + h.trend) & 1)) // 2
        |      - h.level + h.trend)
        |     - ((((dd.y + h.level + h.trend)
        |        - ((dd.y + h.level + h.trend) & 1)) // 2
        |      - h.level + h.trend) & 1)) // 2
        |  FROM ht h JOIN d dd ON dd.i = h.t
        |  WHERE h.t <= (SELECT n FROM nn)),
        |fin AS (SELECT level, trend FROM ht ORDER BY t DESC LIMIT 1),
        |hor(h) AS (VALUES (1), (2), (3), (4), (5), (6), (7))
        |SELECT CAST(h AS BIGINT) AS horizon_days,
        |  (SELECT n FROM nn) AS n_days,
        |  f.level AS level_micro, f.trend AS trend_micro,
        |  f.level + h * f.trend AS forecast_micro,
        |  CAST(f.level + h * f.trend AS DOUBLE) / 1000000.0 AS forecast
        |FROM hor CROSS JOIN fin f""".stripMargin,

    // Fixed-grid radius join on the first two quantized embedding
    // dims (r = 20000 micro): 3x3 cell replication, lossless
    // equi-join, per-point neighbor counts, top 20 by (count, id).
    // Floor cell assignment via ((x % m) + m) % m (coords negative).
    "q_embed_radius" ->
      """WITH pts AS (SELECT vec_id AS id,
        |    CAST(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS qx,
        |    CAST(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS qy
        |  FROM embeddings),
        |cells AS (SELECT id, qx, qy,
        |    (qx - ((qx % 20000) + 20000) % 20000) // 20000 AS cx,
        |    (qy - ((qy % 20000) + 20000) % 20000) // 20000 AS cy
        |  FROM pts),
        |repl AS (SELECT c.id AS id_a, c.qx AS xa, c.qy AS ya,
        |    c.cx + dd.dx AS cx, c.cy + ee.dy AS cy
        |  FROM cells c
        |  CROSS JOIN (VALUES (-1), (0), (1)) dd(dx)
        |  CROSS JOIN (VALUES (-1), (0), (1)) ee(dy)),
        |cnt AS (SELECT r.id_a AS vec_id, COUNT(*) AS n_neighbors
        |  FROM repl r JOIN cells h ON h.cx = r.cx AND h.cy = r.cy
        |  WHERE h.id <> r.id_a
        |    AND (r.xa - h.qx) * (r.xa - h.qx)
        |      + (r.ya - h.qy) * (r.ya - h.qy) <= 400000000
        |  GROUP BY 1)
        |SELECT vec_id, CAST(n_neighbors AS BIGINT) AS n_neighbors
        |FROM cnt ORDER BY n_neighbors DESC, vec_id LIMIT 20""".stripMargin,

    // Theta/KMV sketch audit (k = 64) over customers split by the
    // order-date midpoint: theta = 64th-smallest md5_60 hash (2^60
    // when the side has < 64 keys), estimates (k-1)/(theta/2^60) and
    // n_sample/(theta_ab/2^60) — every column md5-reproducible.
    "q_sketch_theta" ->
      """WITH e AS (SELECT CAST(o_custkey AS VARCHAR) AS k,
        |    epoch_ns(o_orderdate)//1000000000 AS t_s FROM orders),
        |bb AS (SELECT MIN(t_s) AS lo_s, MAX(t_s) AS hi_s FROM e),
        |f AS (SELECT k, t_s >= (lo_s + hi_s) // 2 AS late
        |  FROM e CROSS JOIN bb),
        |kh AS (SELECT
        |    CAST(MAX(CASE WHEN NOT late THEN 1 ELSE 0 END) AS BIGINT)
        |      AS in_a,
        |    CAST(MAX(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
        |      AS in_b,
        |    ('0x' || substring(md5(k), 1, 15))::BIGINT AS h
        |  FROM f GROUP BY k),
        |na AS (SELECT COUNT(*) AS n FROM kh WHERE in_a = 1),
        |nb AS (SELECT COUNT(*) AS n FROM kh WHERE in_b = 1),
        |nu AS (SELECT COUNT(*) AS n FROM kh),
        |ta AS (SELECT CASE WHEN (SELECT n FROM na) < 64
        |    THEN 1152921504606846976
        |    ELSE (SELECT MAX(h) FROM (SELECT h FROM kh WHERE in_a = 1
        |      ORDER BY h LIMIT 64)) END AS th_a),
        |tb AS (SELECT CASE WHEN (SELECT n FROM nb) < 64
        |    THEN 1152921504606846976
        |    ELSE (SELECT MAX(h) FROM (SELECT h FROM kh WHERE in_b = 1
        |      ORDER BY h LIMIT 64)) END AS th_b),
        |tu AS (SELECT CASE WHEN (SELECT n FROM nu) < 64
        |    THEN 1152921504606846976
        |    ELSE (SELECT MAX(h) FROM (SELECT h FROM kh
        |      ORDER BY h LIMIT 64)) END AS th_u),
        |ths AS (SELECT th_a, th_b, th_u, LEAST(th_a, th_b) AS th_ab
        |  FROM ta CROSS JOIN tb CROSS JOIN tu),
        |s AS (SELECT
        |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 AND h < th_ab
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 AND h < th_ab
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_diff,
        |    CAST(SUM(in_a * in_b) AS BIGINT) AS exact_overlap
        |  FROM kh CROSS JOIN ths)
        |SELECT (SELECT n FROM na) AS exact_first,
        |  (SELECT n FROM nb) AS exact_second,
        |  (SELECT n FROM nu) AS exact_union,
        |  s.exact_overlap,
        |  ths.th_a AS theta_first, ths.th_b AS theta_second,
        |  ths.th_u AS theta_union,
        |  CASE WHEN (SELECT n FROM na) < 64
        |    THEN CAST((SELECT n FROM na) AS DOUBLE)
        |    ELSE 63.0 / (CAST(ths.th_a AS DOUBLE)
        |      / 1152921504606846976.0) END AS est_first,
        |  CASE WHEN (SELECT n FROM nb) < 64
        |    THEN CAST((SELECT n FROM nb) AS DOUBLE)
        |    ELSE 63.0 / (CAST(ths.th_b AS DOUBLE)
        |      / 1152921504606846976.0) END AS est_second,
        |  CASE WHEN (SELECT n FROM nu) < 64
        |    THEN CAST((SELECT n FROM nu) AS DOUBLE)
        |    ELSE 63.0 / (CAST(ths.th_u AS DOUBLE)
        |      / 1152921504606846976.0) END AS est_union,
        |  CAST(s.n_common AS DOUBLE) / (CAST(ths.th_ab AS DOUBLE)
        |    / 1152921504606846976.0) AS est_overlap,
        |  CAST(s.n_diff AS DOUBLE) / (CAST(ths.th_ab AS DOUBLE)
        |    / 1152921504606846976.0) AS est_diff_ab
        |FROM ths CROSS JOIN s""".stripMargin,

    // TextRank keywords: integer PageRank (3 unrolled rounds, d=0.85)
    // over the window-2 token adjacency graph; nodes = md5_60(token),
    // undirected edges canonicalized on hash order.
    "q_text_keywords" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |t AS (SELECT doc_id, generate_subscripts(words, 1) AS pos,
        |    unnest(words) AS term FROM w),
        |adj AS (SELECT
        |    ('0x' || substring(md5(a.term), 1, 15))::BIGINT AS ha,
        |    ('0x' || substring(md5(b.term), 1, 15))::BIGINT AS hb
        |  FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |p AS (SELECT DISTINCT LEAST(ha, hb) AS src,
        |    GREATEST(ha, hb) AS dst
        |  FROM adj WHERE ha <> hb),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
        |  FROM e GROUP BY 1),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM nd),
        |r0 AS (SELECT node, 1000000000 // nn AS rank_ppb
        |  FROM nd CROSS JOIN c),
        |r1 AS (SELECT nd.node, (150000000 // c.nn)
        |    + ((85 * COALESCE(s.inc, 0)) // 100) AS rank_ppb
        |  FROM nd CROSS JOIN c
        |  LEFT JOIN (SELECT e.dst AS node,
        |      SUM(r.rank_ppb // d.outdeg) AS inc
        |    FROM e JOIN r0 r ON r.node = e.src
        |    JOIN deg d ON d.node = e.src GROUP BY 1) s
        |    ON s.node = nd.node),
        |r2 AS (SELECT nd.node, (150000000 // c.nn)
        |    + ((85 * COALESCE(s.inc, 0)) // 100) AS rank_ppb
        |  FROM nd CROSS JOIN c
        |  LEFT JOIN (SELECT e.dst AS node,
        |      SUM(r.rank_ppb // d.outdeg) AS inc
        |    FROM e JOIN r1 r ON r.node = e.src
        |    JOIN deg d ON d.node = e.src GROUP BY 1) s
        |    ON s.node = nd.node),
        |r3 AS (SELECT nd.node, (150000000 // c.nn)
        |    + ((85 * COALESCE(s.inc, 0)) // 100) AS rank_ppb
        |  FROM nd CROSS JOIN c
        |  LEFT JOIN (SELECT e.dst AS node,
        |      SUM(r.rank_ppb // d.outdeg) AS inc
        |    FROM e JOIN r2 r ON r.node = e.src
        |    JOIN deg d ON d.node = e.src GROUP BY 1) s
        |    ON s.node = nd.node),
        |topn AS (SELECT node, rank_ppb FROM r3
        |  ORDER BY rank_ppb DESC, node LIMIT 20),
        |vocab AS (SELECT DISTINCT term AS word,
        |    ('0x' || substring(md5(term), 1, 15))::BIGINT AS node
        |  FROM t)
        |SELECT v.word, CAST(tp.rank_ppb AS BIGINT) AS rank_ppb
        |FROM vocab v JOIN topn tp ON tp.node = v.node""".stripMargin,

    // Token-weighted LOWER median doc length per language: smallest
    // length whose cumulative token weight reaches half the total
    // (multiplied-through half test, ties walked by doc_id).
    "q_weighted_median" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(length(text) AS BIGINT) AS v,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |      END AS BIGINT) AS wt
        |  FROM documents),
        |c AS (SELECT lang, v, wt, doc_id,
        |    SUM(wt) OVER (PARTITION BY lang ORDER BY v, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cumw,
        |    SUM(wt) OVER (PARTITION BY lang) AS totw,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM d)
        |SELECT lang, CAST(MAX(n) AS BIGINT) AS n_rows,
        |  CAST(MAX(totw) AS BIGINT) AS total_weight,
        |  CAST(MIN(v) AS BIGINT) AS weighted_median
        |FROM c WHERE 2 * cumw >= totw GROUP BY 1""".stripMargin,

    // JSON field rollup: $.k extracted per row (TRY_CAST — missing or
    // malformed stays NULL), integer aggregates per event type.
    "q_json_rollup" ->
      """WITH x AS (SELECT event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
        |  FROM events)
        |SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(kv) AS BIGINT) AS n_with_field,
        |  CAST(MIN(kv) AS BIGINT) AS k_min,
        |  CAST(MAX(kv) AS BIGINT) AS k_max,
        |  CAST(SUM(kv) AS BIGINT) AS k_sum,
        |  CAST(COUNT(DISTINCT kv) AS BIGINT) AS k_distinct
        |FROM x GROUP BY 1""".stripMargin,

    // Market-basket pairs (support >= 2 baskets), top 20 by support:
    // confidence = n_pair/n_a, lift = n_pair*N/(n_a*n_b) — each ONE
    // division of exact longs. (The engine's apriori prune only skips
    // work; pairs at support >= 2 are identical with or without it.)
    "q_basket_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem),
        |ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i
        |  FROM li GROUP BY 1),
        |nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_baskets
        |  FROM li),
        |pr AS (SELECT a.i AS item_a, bb.i AS item_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_pair
        |  FROM li a JOIN li bb ON a.b = bb.b AND a.i < bb.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT item_a, item_b, n_pair, ca.n_i AS n_a, cb.n_i AS n_b,
        |  nb.n_baskets,
        |  CAST(n_pair AS DOUBLE) / CAST(ca.n_i AS DOUBLE)
        |    AS confidence_ab,
        |  CAST(n_pair * nb.n_baskets AS DOUBLE)
        |    / CAST(ca.n_i * cb.n_i AS DOUBLE) AS lift
        |FROM pr JOIN ic ca ON ca.i = item_a JOIN ic cb ON cb.i = item_b
        |CROSS JOIN nb
        |ORDER BY n_pair DESC, item_a, item_b LIMIT 20""".stripMargin,

    // Distinct l-diversity (l = 3) over (day, value-bucket) quasi
    // classes, sensitive attribute = event_type — the attribute-
    // disclosure companion to q_anonymize_k's class-size audit.
    "q_anonymize_l" ->
      """WITH ex AS (SELECT
        |    epoch_ns(date_trunc('day', ts))//1000000000 AS day_s,
        |    event_type,
        |    CAST(floor(value / 10.0) AS BIGINT) * 10 AS value_bucket
        |  FROM events),
        |g AS (SELECT day_s, value_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS d
        |  FROM ex GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(n) AS BIGINT) AS n_rows,
        |  MIN(d) AS min_diversity,
        |  CAST(SUM(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_classes_below_l,
        |  CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_rows_below_l,
        |  CAST(3 AS BIGINT) AS l_threshold,
        |  CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS DOUBLE)
        |    / SUM(n) AS below_l_share
        |FROM g""".stripMargin,

    // Export manifest: md5_60(key) % 8 shard assignment, per-shard
    // counts/token totals/key range and two order-independent XOR
    // checksums (key membership; key:content integrity).
    "q_export_manifest" ->
      """WITH b AS (SELECT doc_id,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      ::BIGINT AS hk,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || text), 1, 15))::BIGINT AS hc,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |      END AS BIGINT) AS ntok
        |  FROM documents)
        |SELECT hk % 8 AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |  CAST(MIN(doc_id) AS BIGINT) AS key_min,
        |  CAST(MAX(doc_id) AS BIGINT) AS key_max,
        |  CAST(bit_xor(hk) AS BIGINT) AS key_checksum,
        |  CAST(bit_xor(hc) AS BIGINT) AS content_checksum
        |FROM b GROUP BY 1""".stripMargin,

    // Correlogram: Pearson of the floored daily unit series against
    // its lag-L self (L = 1..7), exact BIGINT moments, one double
    // combine mirrored token for token; degenerate lags NULL.
    "q_series_acf" ->
      """WITH d0 AS (SELECT
        |    epoch_ns(date_trunc('day', ts))//1000000000 AS day_s,
        |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(28,6)))) AS BIGINT)
        |      AS y
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |d AS (SELECT y,
        |    CAST(row_number() OVER (ORDER BY day_s) AS BIGINT) AS i
        |  FROM d0),
        |lg(lag) AS (VALUES (1), (2), (3), (4), (5), (6), (7)),
        |p AS (SELECT CAST(lag AS BIGINT) AS lag, a.y AS x, b.y AS z
        |  FROM lg CROSS JOIN d a JOIN d b ON b.i = a.i + lag),
        |m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(z) AS BIGINT) AS sz,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(z * z) AS BIGINT) AS szz,
        |    CAST(SUM(x * z) AS BIGINT) AS sxz
        |  FROM p GROUP BY 1)
        |SELECT lag, n AS n_pairs,
        |  CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
        |      AND (n * szz - sz * sz) > 0 THEN
        |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
        |  END AS acf
        |FROM m""".stripMargin,

    // Vocabulary coverage curve: token-mass share of the top-K types
    // (K = 10/100/1000), ranked (count desc, term); pure counting.
    "q_text_coverage" ->
      """WITH t AS (SELECT
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM t WHERE length(term) > 0 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS total_types FROM c),
        |top AS (SELECT term, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT)
        |      AS rank
        |  FROM c QUALIFY rank <= 1000),
        |ks(k) AS (VALUES (10), (100), (1000))
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(cnt) AS BIGINT) AS covered_tokens,
        |  tot.total_tokens, tot.total_types,
        |  CAST(SUM(cnt) AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE)
        |    AS coverage
        |FROM ks CROSS JOIN top CROSS JOIN tot WHERE rank <= k
        |GROUP BY 1, tot.total_tokens, tot.total_types""".stripMargin,

    // Quantized mutual information event_type vs value bucket:
    // parts-per-1e4 floor proportions (clamped >= 1), quarter-bit
    // integer log2 via the bitlength identity, count-weighted terms.
    "q_mutual_info" ->
      """WITH base AS (SELECT event_type AS x,
        |    CAST(floor(value / 10.0) AS BIGINT) * 10 AS y FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        |cx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_x
        |  FROM base GROUP BY 1),
        |cy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_y
        |  FROM base GROUP BY 1),
        |cxy AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy
        |  FROM base GROUP BY 1, 2),
        |j AS (SELECT n_xy,
        |    GREATEST((n_xy * 10000) // n, 1) * 10000 AS num,
        |    GREATEST((n_x * 10000) // n, 1)
        |      * GREATEST((n_y * 10000) // n, 1) AS den
        |  FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN tot),
        |terms AS (SELECT n_xy, CASE WHEN num >= den THEN
        |      length(bin((CAST(num AS HUGEINT) * num * num * num)
        |        // (CAST(den AS HUGEINT) * den * den * den))) - 1
        |    ELSE -(length(bin((CAST(den AS HUGEINT) * den * den * den)
        |        // (CAST(num AS HUGEINT) * num * num * num))) - 1)
        |    END AS qlb FROM j),
        |mi AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    CAST(SUM(n_xy * qlb) AS BIGINT) AS mi_q FROM terms),
        |hx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_x_values,
        |    CAST(SUM(n_x * (length(bin(
        |      (CAST(10000 AS HUGEINT) * 10000 * 10000 * 10000)
        |      // (CAST(px AS HUGEINT) * px * px * px))) - 1))
        |      AS BIGINT) AS hx_q
        |  FROM (SELECT n_x, GREATEST((n_x * 10000) // n, 1) AS px
        |    FROM cx CROSS JOIN tot)),
        |hy AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_y_values,
        |    CAST(SUM(n_y * (length(bin(
        |      (CAST(10000 AS HUGEINT) * 10000 * 10000 * 10000)
        |      // (CAST(py AS HUGEINT) * py * py * py))) - 1))
        |      AS BIGINT) AS hy_q
        |  FROM (SELECT n_y, GREATEST((n_y * 10000) // n, 1) AS py
        |    FROM cy CROSS JOIN tot))
        |SELECT tot.n AS n_rows, mi.n_cells, hx.n_x_values,
        |  hy.n_y_values, mi.mi_q, hx.hx_q, hy.hy_q,
        |  CAST(mi.mi_q AS DOUBLE) / (4.0 * CAST(tot.n AS DOUBLE))
        |    AS mi_bits,
        |  CAST(hx.hx_q AS DOUBLE) / (4.0 * CAST(tot.n AS DOUBLE))
        |    AS hx_bits,
        |  CAST(mi.mi_q AS DOUBLE)
        |    / CAST(GREATEST(LEAST(hx.hx_q, hy.hy_q), 1) AS DOUBLE)
        |    AS nmi
        |FROM tot CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,

    // Gini per event type over floored per-user unit totals:
    // rank-weighted identity (2*S1 - (n+1)*S) / (n*S), ascending
    // (value, user) order, one double division per group.
    "q_value_gini" ->
      """WITH t AS (SELECT event_type AS g, user_id AS k,
        |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(28,6)))) AS BIGINT)
        |      AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT g, x,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY x, k)
        |      AS BIGINT) AS i
        |  FROM t),
        |m AS (SELECT g AS event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(x) AS BIGINT) AS total_units,
        |    CAST(SUM(i * x) AS BIGINT) AS s1
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_keys, total_units,
        |  CASE WHEN n_keys >= 2 AND total_units > 0 THEN
        |    CAST(2 * s1 - (n_keys + 1) * total_units AS DOUBLE)
        |    / CAST(n_keys * total_units AS DOUBLE) END AS gini
        |FROM m""".stripMargin,

    // Chi-squared independence via the observed-cells identity
    // chi2 = N*(S-1), S = sum o^2/(r*c); per-cell double division
    // quantized by a double->DECIMAL(38,8) cast (rounds identically).
    "q_stat_chi2" ->
      """WITH base AS (SELECT event_type AS x,
        |    CAST(FLOOR(value / 50.0) AS BIGINT) * 50 AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        |cx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_x
        |  FROM base GROUP BY 1),
        |cy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_y
        |  FROM base GROUP BY 1),
        |cxy AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy
        |  FROM base GROUP BY 1, 2),
        |cells AS (SELECT CAST(CAST(n_xy * n_xy AS DOUBLE)
        |    / CAST(n_x * n_y AS DOUBLE) AS DECIMAL(38,8)) AS term
        |  FROM cxy JOIN cx USING (x) JOIN cy USING (y)),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    SUM(term) AS s_q FROM cells),
        |rx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_x_values FROM cx),
        |ry AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_y_values FROM cy),
        |fin AS (SELECT n, n_cells, n_x_values, n_y_values,
        |    (n_x_values - 1) * (n_y_values - 1) AS dof,
        |    CASE WHEN (n_x_values - 1) * (n_y_values - 1) > 0 THEN
        |      CAST(n AS DOUBLE) * (CAST(s_q AS DOUBLE) - 1.0)
        |    END AS chi2
        |  FROM tot CROSS JOIN s CROSS JOIN rx CROSS JOIN ry)
        |SELECT n AS n_rows, n_cells, n_x_values, n_y_values, dof,
        |  chi2,
        |  CASE WHEN dof > 0 THEN sqrt(GREATEST(chi2, 0.0)
        |    / (CAST(n AS DOUBLE)
        |      * CAST(LEAST(n_x_values - 1, n_y_values - 1) AS DOUBLE)))
        |  END AS cramers_v
        |FROM fin""".stripMargin,

    // One-way ANOVA from per-group (n, sum x, sum x^2) sufficient
    // statistics; x quantized once at DECIMAL(18,4), x^2 and the
    // between-group mass quantized at scale 4 (2^53 window).
    "q_stat_anova" ->
      """WITH base AS (SELECT event_type AS g,
        |    CAST(value AS DECIMAL(18,4)) AS xq
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |b2 AS (SELECT g, xq, CAST(xq AS DOUBLE) AS xd FROM base),
        |per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    SUM(xq) AS s_g,
        |    SUM(CAST(xd * xd AS DECIMAL(38,4))) AS q_g
        |  FROM b2 GROUP BY 1),
        |per2 AS (SELECT *, CAST(CAST(s_g AS DOUBLE)
        |    * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
        |    AS DECIMAL(38,4)) AS term FROM per),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_g) AS BIGINT) AS n_rows,
        |    SUM(s_g) AS t_sum, SUM(q_g) AS q_sum,
        |    SUM(term) AS b_sum FROM per2),
        |fin AS (SELECT n_rows, k,
        |    CAST(b_sum AS DOUBLE) - CAST(t_sum AS DOUBLE)
        |      * CAST(t_sum AS DOUBLE) / CAST(n_rows AS DOUBLE)
        |      AS ss_between,
        |    CAST(q_sum AS DOUBLE) - CAST(b_sum AS DOUBLE) AS ss_within
        |  FROM agg)
        |SELECT n_rows, k, ss_between, ss_within,
        |  CASE WHEN k > 1 AND n_rows > k AND ss_within > 0.0 THEN
        |    (ss_between / CAST(k - 1 AS DOUBLE))
        |      / (ss_within / CAST(n_rows - k AS DOUBLE)) END AS f_stat,
        |  CASE WHEN ss_between + ss_within > 0.0 THEN
        |    ss_between / (ss_between + ss_within) END AS eta_sq
        |FROM fin""".stripMargin,

    // Spearman rho on per-user (event count, floored value units):
    // doubled average ranks from the distinct-value frames, centered
    // by (n+1) for exactly-zero-mean BIGINT deviations.
    "q_stat_spearman" ->
      """WITH per AS (SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(28,6)))) AS BIGINT)
        |      AS value_units
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per),
        |dx_ AS (SELECT n_events AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM per GROUP BY 1),
        |rx AS (SELECT v, 2 * COALESCE(SUM(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + cnt + 1 AS r2 FROM dx_),
        |dy_ AS (SELECT value_units AS v,
        |    CAST(COUNT(*) AS BIGINT) AS cnt FROM per GROUP BY 1),
        |ry AS (SELECT v, 2 * COALESCE(SUM(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + cnt + 1 AS r2 FROM dy_),
        |j AS (SELECT rx.r2 - (n + 1) AS dx, ry.r2 - (n + 1) AS dy
        |  FROM per JOIN rx ON per.n_events = rx.v
        |  JOIN ry ON per.value_units = ry.v CROSS JOIN tot)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(dx * dy) AS BIGINT) AS sxy,
        |  CAST(SUM(dx * dx) AS BIGINT) AS sxx,
        |  CAST(SUM(dy * dy) AS BIGINT) AS syy,
        |  CASE WHEN SUM(dx * dx) > 0 AND SUM(dy * dy) > 0 THEN
        |    CAST(SUM(dx * dy) AS DOUBLE)
        |      / sqrt(CAST(SUM(dx * dx) AS DOUBLE)
        |        * CAST(SUM(dy * dy) AS DOUBLE)) END AS rho
        |FROM j""".stripMargin,

    // Mann-Whitney U purchase-vs-click: doubled tie-average rank sums
    // from the distinct-value frame, tie-corrected normal z, and the
    // rank-biserial effect size — all integers until the final z.
    "q_stat_mannwhitney" ->
      """WITH base AS (SELECT event_type AS g, value AS v FROM events
        |  WHERE value IS NOT NULL
        |    AND event_type IN ('purchase', 'click')),
        |dv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(COUNT(CASE WHEN g = 'purchase' THEN 1 END) AS BIGINT)
        |      AS cnt_a
        |  FROM base GROUP BY 1),
        |ranked AS (SELECT cnt, cnt_a,
        |    2 * COALESCE(SUM(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + cnt + 1 AS r2 FROM dv),
        |agg AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
        |    CAST(SUM(cnt - cnt_a) AS BIGINT) AS n_b,
        |    CAST(SUM(cnt_a * r2) AS BIGINT) AS r2_a,
        |    CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_cubes
        |  FROM ranked),
        |u AS (SELECT *, r2_a - n_a * (n_a + 1) AS u2_a,
        |    2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b,
        |    n_a + n_b AS n FROM agg),
        |v_ AS (SELECT *, CASE WHEN n > 1 THEN
        |    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
        |      * ((CAST(n AS DOUBLE) + 1.0)
        |        - CAST(tie_cubes AS DOUBLE) / (CAST(n AS DOUBLE)
        |          * (CAST(n AS DOUBLE) - 1.0))) END AS var_u
        |  FROM u)
        |SELECT n_a, n_b, u2_a, u2_b, tie_cubes,
        |  CASE WHEN var_u > 0.0 THEN
        |    (CAST(u2_a AS DOUBLE)
        |      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |      / (2.0 * sqrt(var_u)) END AS z_stat,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(u2_a - u2_b AS DOUBLE)
        |      / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |  END AS rank_biserial
        |FROM v_""".stripMargin,

    // Robust per-group profile: rank-selected lower median and MAD,
    // >3*MAD outlier count/share. Medians are data values, residuals
    // single IEEE subtractions, threshold one double multiply.
    "q_stat_mad" ->
      """WITH base AS (SELECT event_type AS g, value AS v FROM events
        |  WHERE value IS NOT NULL),
        |medr AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS n FROM base),
        |med AS (SELECT g, v AS center, CAST(n AS BIGINT) AS n
        |  FROM medr WHERE rn = (n + 1) // 2),
        |resid AS (SELECT b.g, m.center, m.n,
        |    abs(b.v - m.center) AS resid
        |  FROM base b JOIN med m ON b.g = m.g),
        |madr AS (SELECT g, center, n, resid,
        |    row_number() OVER (PARTITION BY g ORDER BY resid) AS rn
        |  FROM resid),
        |mad AS (SELECT g, center, n, resid AS mad FROM madr
        |  WHERE rn = (n + 1) // 2)
        |SELECT r.g AS event_type, MAX(m.n) AS n,
        |  MAX(m.center) AS center, MAX(m.mad) AS mad,
        |  CAST(SUM(CASE WHEN r.resid > 3.0e0 * m.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  CAST(SUM(CASE WHEN r.resid > 3.0e0 * m.mad THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(MAX(m.n) AS DOUBLE) AS outlier_share
        |FROM resid r JOIN mad m ON r.g = m.g GROUP BY 1""".stripMargin,

    // Local clustering coefficient decile census of the part
    // co-purchase graph: apexes with 2 <= deg <= 128 (hub guard before
    // the wedge self-join), closure via a join on the (u, w) pair,
    // integer ppb lcc floored into bands.
    "q_graph_clustering" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS b,
        |    CAST(l_partkey AS BIGINT) AS i FROM lineitem),
        |p AS (SELECT a.i AS src, c.i AS dst
        |  FROM li a JOIN li c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT src, dst FROM p
        |  UNION ALL SELECT dst, src FROM p),
        |deg AS (SELECT src AS z, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM e GROUP BY 1),
        |kept AS MATERIALIZED (SELECT z, deg FROM deg
        |  WHERE deg BETWEEN 2 AND 128),
        |ze AS MATERIALIZED (SELECT e.src AS z, e.dst, k.deg
        |  FROM e JOIN kept k ON e.src = k.z),
        |wedges AS (SELECT l.z, l.deg, l.dst AS u, r.dst AS w
        |  FROM ze l JOIN ze r ON l.z = r.z AND l.dst < r.dst),
        |closed AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS n_closed
        |  FROM wedges WHERE EXISTS (SELECT 1 FROM e
        |    WHERE e.src = wedges.u AND e.dst = wedges.w)
        |  GROUP BY 1),
        |pn AS (SELECT k.z, k.deg,
        |    COALESCE(c.n_closed, 0) AS n_closed,
        |    k.deg * (k.deg - 1) // 2 AS n_wedges
        |  FROM kept k LEFT JOIN closed c ON k.z = c.z)
        |SELECT (n_closed * 1000000000) // n_wedges // 100000000
        |    AS lcc_band,
        |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(n_closed) AS BIGINT) AS closed_total,
        |  CAST(SUM(n_wedges) AS BIGINT) AS wedge_total
        |FROM pn GROUP BY 1 ORDER BY 1""".stripMargin,

    // ROC-AUC via the rank-statistic identity: r2 = twice the midrank
    // over the distinct-score rollup (the Mann-Whitney machinery), so
    // auc2_num is an exact BIGINT and auc/gini are one double division
    // each. Score = n_chars, label = (lang = 'en').
    "q_eval_auc" ->
      """WITH base AS (SELECT n_chars AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |dv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(y) AS BIGINT) AS cnt_pos FROM base GROUP BY 1),
        |ranked AS (SELECT cnt, cnt_pos,
        |    2 * COALESCE(SUM(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + cnt + 1 AS r2 FROM dv),
        |agg AS (SELECT CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(cnt - cnt_pos) AS BIGINT) AS n_neg,
        |    CAST(SUM(cnt_pos * r2) AS BIGINT) AS r2_pos FROM ranked),
        |a2 AS (SELECT n_pos, n_neg,
        |    r2_pos - n_pos * (n_pos + 1) AS auc2_num FROM agg),
        |a3 AS (SELECT *, CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST(auc2_num AS DOUBLE)
        |      / (2.0e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
        |  END AS auc FROM a2)
        |SELECT n_pos, n_neg, CAST(auc2_num AS BIGINT) AS auc2_num, auc,
        |  CASE WHEN auc IS NOT NULL THEN 2.0e0 * auc - 1.0e0 END AS gini
        |FROM a3""".stripMargin,

    // Split-conformal per event type: calibration = even event_ids,
    // center = exact lower median (rank-selected), q_hat = the
    // ceil((n+1)*0.9)-th absolute residual clamped to n, coverage
    // audited on the odd half. Medians/q_hat are rank-SELECTED values
    // and residuals single IEEE subtractions, so both engines agree
    // bit-for-bit; coverage is one double division.
    "q_conformal" ->
      """WITH base AS (SELECT event_type AS g, value AS v,
        |    (event_id % 2 = 0) AS is_cal
        |  FROM events WHERE value IS NOT NULL),
        |cal AS (SELECT g, v FROM base WHERE is_cal),
        |medr AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS n_cal FROM cal),
        |med AS (SELECT g, v AS center, CAST(n_cal AS BIGINT) AS n_cal
        |  FROM medr WHERE rn = (n_cal + 1) // 2),
        |resid AS (SELECT c.g, m.center, m.n_cal,
        |    abs(c.v - m.center) AS resid
        |  FROM cal c JOIN med m ON c.g = m.g),
        |rr AS (SELECT g, center, n_cal, resid,
        |    row_number() OVER (PARTITION BY g ORDER BY resid) AS rn
        |  FROM resid),
        |qh AS (SELECT g, center, n_cal, resid AS q_hat FROM rr
        |  WHERE rn = least(n_cal,
        |    ((n_cal + 1) * 900000 + 999999) // 1000000))
        |SELECT t.g AS event_type, CAST(MAX(q.n_cal) AS BIGINT) AS n_cal,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  MAX(q.center) AS center, MAX(q.q_hat) AS q_hat,
        |  CAST(SUM(CASE WHEN abs(t.v - q.center) <= q.q_hat
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  CAST(SUM(CASE WHEN abs(t.v - q.center) <= q.q_hat
        |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS coverage
        |FROM (SELECT g, v FROM base WHERE NOT is_cal) t
        |JOIN qh q ON t.g = q.g GROUP BY 1""".stripMargin,

    // Pairwise JSD between language unigram distributions: shares
    // floor-quantized to ppb BIGINTs, every x*log2(1/x) term through
    // the quarter-bit identity floor(4*log2(b/a)) = bitlen(b^4//a^4)-1
    // in HUGEINT (the log2_quarter_bits kernel), so jsd2_u is an exact
    // BIGINT and jsd_bits one double division.
    "q_text_jsd" ->
      """WITH toks AS (SELECT g, tok FROM (SELECT lang AS g,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents) WHERE len(tok) > 0),
        |tfg AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2),
        |ng AS (SELECT g, CAST(SUM(tf) AS BIGINT) AS n_g
        |  FROM tfg GROUP BY 1),
        |ppb AS (SELECT t.g, t.tok, (t.tf * 1000000000) // n.n_g AS p
        |  FROM tfg t JOIN ng n ON t.g = n.g),
        |gs AS (SELECT DISTINCT g FROM ppb),
        |pairs AS (SELECT a.g AS lang_a, b.g AS lang_b
        |  FROM gs a, gs b WHERE a.g < b.g),
        |words AS (SELECT DISTINCT tok FROM ppb),
        |grid AS (SELECT lang_a, lang_b, tok FROM pairs, words),
        |j AS (SELECT lang_a, lang_b, COALESCE(pa.p, 0) AS pa,
        |    COALESCE(pb.p, 0) AS pb
        |  FROM grid
        |  LEFT JOIN ppb pa ON pa.g = lang_a AND pa.tok = grid.tok
        |  LEFT JOIN ppb pb ON pb.g = lang_b AND pb.tok = grid.tok
        |  WHERE COALESCE(pa.p, 0) + COALESCE(pb.p, 0) > 0),
        |term AS (SELECT lang_a, lang_b,
        |    (pa + pb) * (length(bin(
        |      (CAST(2000000000 AS HUGEINT) * 2000000000 * 2000000000
        |        * 2000000000)
        |      // (CAST(pa + pb AS HUGEINT) * (pa + pb) * (pa + pb)
        |        * (pa + pb)))) - 1)
        |    - CASE WHEN pa > 0 THEN pa * (length(bin(
        |        (CAST(1000000000 AS HUGEINT) * 1000000000 * 1000000000
        |          * 1000000000)
        |        // (CAST(pa AS HUGEINT) * pa * pa * pa))) - 1)
        |      ELSE 0 END
        |    - CASE WHEN pb > 0 THEN pb * (length(bin(
        |        (CAST(1000000000 AS HUGEINT) * 1000000000 * 1000000000
        |          * 1000000000)
        |        // (CAST(pb AS HUGEINT) * pb * pb * pb))) - 1)
        |      ELSE 0 END AS term
        |  FROM j)
        |SELECT lang_a, lang_b, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(term) AS BIGINT) AS jsd2_u,
        |  CAST(SUM(term) AS DOUBLE) / 8.0e9 AS jsd_bits
        |FROM term GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Adamic-Adar link prediction over the bidirectional trade graph:
    // middleman weight = 4e9 // floor(4*log2(deg)) (quarter-bit
    // identity, deg in [2, 128] -- hubs structurally dropped before
    // the pair expansion), exact BIGINT scores, top-20 non-adjacent
    // pairs.
    "q_graph_linkpred" ->
      """WITH p AS (SELECT DISTINCT o_custkey * 2 AS src,
        |    l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM p
        |  UNION ALL SELECT dst, src FROM p),
        |deg AS (SELECT src AS z, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM e GROUP BY 1),
        |mids AS (SELECT z, 4000000000 // (length(bin(
        |    CAST(deg AS HUGEINT) * deg * deg * deg)) - 1) AS w_ppb
        |  FROM deg WHERE deg BETWEEN 2 AND 128),
        |ze AS (SELECT e.src AS z, e.dst, m.w_ppb
        |  FROM e JOIN mids m ON e.src = m.z),
        |pairs AS (SELECT l.dst AS u, r.dst AS v, l.w_ppb
        |  FROM ze l JOIN ze r ON l.z = r.z AND l.dst < r.dst),
        |scored AS (SELECT u, v, CAST(SUM(w_ppb) AS BIGINT) AS aa_ppb,
        |    CAST(COUNT(*) AS BIGINT) AS common_neighbors
        |  FROM pairs GROUP BY 1, 2),
        |nonadj AS (SELECT s.* FROM scored s
        |  LEFT JOIN e ON e.src = s.u AND e.dst = s.v
        |  WHERE e.src IS NULL)
        |SELECT u, v, aa_ppb, common_neighbors FROM nonadj
        |ORDER BY aa_ppb DESC, u, v LIMIT 20""".stripMargin,

    // Blocked entity resolution on customer names: blocks over
    // (nation, segment) capped at 1024 rows (over-broad blocks
    // dropped), in-block pairs kept at integer Levenshtein <= 2.
    "q_er_blocked" ->
      """WITH rows0 AS (SELECT c_nationkey, c_mktsegment,
        |    c_custkey AS id, c_name AS name
        |  FROM customer WHERE c_name IS NOT NULL),
        |bl AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(COUNT(*) AS BIGINT) AS bn FROM rows0 GROUP BY 1, 2),
        |kept AS (SELECT r.* FROM rows0 r JOIN bl b
        |  ON r.c_nationkey = b.c_nationkey
        |    AND r.c_mktsegment = b.c_mktsegment
        |  WHERE b.bn <= 1024),
        |pr AS (SELECT a.id AS id_a, b.id AS id_b,
        |    a.name AS name_a, b.name AS name_b,
        |    CAST(levenshtein(a.name, b.name) AS BIGINT) AS distance
        |  FROM kept a JOIN kept b
        |    ON a.c_nationkey = b.c_nationkey
        |      AND a.c_mktsegment = b.c_mktsegment AND a.id < b.id)
        |SELECT id_a, id_b, name_a, name_b, distance FROM pr
        |WHERE distance <= 2
        |ORDER BY distance, id_a, id_b""".stripMargin,

    // Welch's t purchase-vs-click: the ANOVA decimal ladder per group,
    // then the fixed-order (m1-m2)/sqrt(v1/n1+v2/n2) combination and
    // Welch-Satterthwaite degrees of freedom.
    "q_stat_welch" ->
      """WITH base AS (SELECT event_type AS g,
        |    CAST(value AS DECIMAL(18,4)) AS xq
        |  FROM events WHERE value IS NOT NULL
        |    AND event_type IN ('purchase', 'click')),
        |b2 AS (SELECT g, xq, CAST(xq AS DOUBLE) AS xd FROM base),
        |per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    SUM(xq) AS s_g,
        |    SUM(CAST(xd * xd AS DECIMAL(38,4))) AS q_g
        |  FROM b2 GROUP BY 1),
        |m AS (SELECT g, n_g,
        |    CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS mean_g,
        |    CASE WHEN n_g > 1 THEN (CAST(q_g AS DOUBLE)
        |      - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
        |        / CAST(n_g AS DOUBLE))
        |      / (CAST(n_g AS DOUBLE) - 1.0) END AS var_g
        |  FROM per),
        |a AS (SELECT n_g AS n_a, mean_g AS mean_a, var_g AS var_a
        |  FROM m WHERE g = 'purchase'),
        |b AS (SELECT n_g AS n_b, mean_g AS mean_b, var_g AS var_b
        |  FROM m WHERE g = 'click'),
        |j AS (SELECT *, var_a / CAST(n_a AS DOUBLE) AS se_a,
        |    var_b / CAST(n_b AS DOUBLE) AS se_b FROM a CROSS JOIN b),
        |j2 AS (SELECT *, se_a + se_b AS se2 FROM j)
        |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
        |  CASE WHEN se2 > 0.0 THEN (mean_a - mean_b) / sqrt(se2)
        |  END AS t_stat,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0.0 THEN
        |    (se2 * se2) / (se_a * se_a / (CAST(n_a AS DOUBLE) - 1.0)
        |      + se_b * se_b / (CAST(n_b AS DOUBLE) - 1.0))
        |  END AS df_welch
        |FROM j2""".stripMargin,

    // HHI per nation over customer revenue shares: floored BIGINT
    // units, floor-ppb shares, exact-integer sum of squares.
    "q_hhi" ->
      """WITH j AS (SELECT n.n_name, o.o_custkey, o.o_totalprice
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |t AS (SELECT n_name AS g, o_custkey AS k,
        |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(28,6))))
        |      AS BIGINT) AS x
        |  FROM j WHERE o_totalprice IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT g, x,
        |    CAST(SUM(x) OVER (PARTITION BY g) AS BIGINT) AS v_tot
        |  FROM t),
        |s AS (SELECT g, v_tot, (x * 1000000000) // v_tot AS s_ppb
        |  FROM w WHERE v_tot > 0),
        |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(MAX(v_tot) AS BIGINT) AS total_units,
        |    CAST(SUM(s_ppb * s_ppb) // 1000000000 AS BIGINT)
        |      AS hhi_ppb,
        |    CAST(MAX(s_ppb) AS BIGINT) AS top_share_ppb
        |  FROM s GROUP BY 1)
        |SELECT g AS n_name, n_keys, total_units, hhi_ppb,
        |  top_share_ppb,
        |  CASE WHEN hhi_ppb > 0 THEN
        |    1.0e9 / CAST(hhi_ppb AS DOUBLE) END AS effective_n
        |FROM a""".stripMargin,

    // Per-type user value deciles: deterministic ntile over the fully
    // tie-broken (x, k) order, floor-ppb decile and cumulative shares.
    "q_value_deciles" ->
      """WITH t AS (SELECT event_type AS g, user_id AS k,
        |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(28,6)))) AS BIGINT)
        |      AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT g, CAST(ntile(10) OVER (PARTITION BY g
        |      ORDER BY x, k) AS BIGINT) AS decile, x FROM t),
        |a AS (SELECT g, decile, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(x) AS BIGINT) AS units FROM b GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(SUM(units) OVER (PARTITION BY g) AS BIGINT) AS v_tot,
        |    CAST(SUM(units) OVER (PARTITION BY g ORDER BY decile)
        |      AS BIGINT) AS cum_units
        |  FROM a)
        |SELECT g AS event_type, decile, n_keys, units,
        |  CAST((units * 1000000000) // v_tot AS BIGINT) AS share_ppb,
        |  CAST((cum_units * 1000000000) // v_tot AS BIGINT)
        |    AS cum_share_ppb
        |FROM w WHERE v_tot > 0""".stripMargin,

    // Benford first-digit audit: digit via exact BIGINT formatting of
    // floor(value*1e6) (never log10), frozen expected-ppb table.
    "q_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(FLOOR(
        |      o_totalprice * 1.0e6) AS BIGINT) AS VARCHAR), 1, 1)
        |      AS INTEGER) AS digit
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0.0
        |    AND CAST(FLOOR(o_totalprice * 1.0e6) AS BIGINT) > 0),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_d
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n_values FROM c),
        |spine AS (SELECT * FROM (VALUES (1, 301029996),
        |  (2, 176091259), (3, 124938737), (4, 96910013),
        |  (5, 79181246), (6, 66946790), (7, 57991947),
        |  (8, 51152522), (9, 45757491)) AS v(digit, expected_ppb)),
        |f AS (SELECT CAST(spine.digit AS BIGINT) AS digit, n_values,
        |    COALESCE(n_d, CAST(0 AS BIGINT)) AS n_d,
        |    CASE WHEN n_values > 0 THEN
        |      (COALESCE(n_d, CAST(0 AS BIGINT)) * 1000000000)
        |        // n_values
        |    ELSE 0 END AS share_ppb,
        |    CAST(expected_ppb AS BIGINT) AS expected_ppb
        |  FROM spine LEFT JOIN c ON spine.digit = c.digit
        |  CROSS JOIN tot)
        |SELECT digit, n_values, n_d, CAST(share_ppb AS BIGINT)
        |    AS share_ppb, expected_ppb,
        |  CAST(share_ppb - expected_ppb AS BIGINT) AS delta_ppb
        |FROM f ORDER BY digit""".stripMargin,

    // Sweep-line peak concurrency per start day: +1/-1 deltas
    // collapsed per (day, second), running sum, earliest argmax by
    // (running desc, t) rank.
    "q_concurrency" ->
      """WITH b2 AS (SELECT start_s,
        |    (start_s // 86400) * 86400 AS day_s
        |  FROM (SELECT epoch_ns(ts) // 1000000000 AS start_s
        |    FROM events)),
        |d AS (SELECT day_s, t, CAST(SUM(delta) AS BIGINT) AS delta
        |  FROM (SELECT day_s, start_s AS t, 1 AS delta FROM b2
        |    UNION ALL
        |    SELECT day_s, start_s + 1800, -1 FROM b2)
        |  GROUP BY 1, 2),
        |r AS (SELECT day_s, t, CAST(SUM(delta) OVER (
        |    PARTITION BY day_s ORDER BY t) AS BIGINT) AS running
        |  FROM d),
        |p AS (SELECT *, row_number() OVER (PARTITION BY day_s
        |    ORDER BY running DESC, t) AS rn FROM r),
        |s AS (SELECT day_s, CAST(COUNT(*) AS BIGINT) AS n_intervals
        |  FROM b2 GROUP BY 1)
        |SELECT p.day_s, s.n_intervals, p.running AS max_concurrent,
        |  p.t AS peak_at_s
        |FROM p JOIN s USING (day_s) WHERE rn = 1""".stripMargin,

    // Item-item co-occurrence kNN: apriori-pruned within-basket pairs,
    // mirrored, cosine n_pair/sqrt(n_a*n_b), per-item top-5 by
    // (cosine desc, neighbor).
    "q_recsys_itemknn" ->
      """WITH li AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
        |    CAST(l_partkey AS BIGINT) AS i FROM lineitem),
        |freq AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i
        |  FROM li GROUP BY 1 HAVING COUNT(*) >= 2),
        |pruned AS (SELECT li.b, li.i FROM li
        |  JOIN freq ON li.i = freq.i),
        |pairs AS (SELECT a.i AS ia, b.i AS ib,
        |    CAST(COUNT(*) AS BIGINT) AS n_pair
        |  FROM pruned a JOIN pruned b ON a.b = b.b AND a.i < b.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |mir AS (SELECT ia AS item, ib AS neighbor, n_pair FROM pairs
        |  UNION ALL
        |  SELECT ib AS item, ia AS neighbor, n_pair FROM pairs),
        |scored AS (SELECT m.item, m.neighbor, m.n_pair,
        |    fa.n_i AS n_item, fb.n_i AS n_neighbor,
        |    CAST(m.n_pair AS DOUBLE)
        |      / sqrt(CAST(fa.n_i AS DOUBLE) * CAST(fb.n_i AS DOUBLE))
        |      AS cosine
        |  FROM mir m JOIN freq fa ON m.item = fa.i
        |  JOIN freq fb ON m.neighbor = fb.i),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY item
        |    ORDER BY cosine DESC, neighbor) AS BIGINT) AS sim_rank
        |  FROM scored)
        |SELECT item, neighbor, n_pair, n_item, n_neighbor, cosine,
        |  sim_rank
        |FROM r WHERE sim_rank <= 5""".stripMargin,

    // Corpus-level Flesch readability per language: whitespace words,
    // [.!?]+ sentence runs, [aeiouy]+ vowel runs — BIGINT masses, one
    // fixed-order double formula (e0 literals force DOUBLE parsing).
    "q_text_readability" ->
      """WITH base AS (SELECT lang AS g,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |      END AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
        |      AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS y
        |  FROM documents),
        |a AS (SELECT g AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(w) AS BIGINT) AS n_words,
        |    CAST(SUM(s) AS BIGINT) AS n_sentences,
        |    CAST(SUM(y) AS BIGINT) AS n_syllables
        |  FROM base GROUP BY 1)
        |SELECT lang, n_docs, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_sentences > 0 THEN CAST(n_words AS DOUBLE)
        |    / CAST(n_sentences AS DOUBLE) END AS words_per_sentence,
        |  CASE WHEN n_words > 0 THEN CAST(n_syllables AS DOUBLE)
        |    / CAST(n_words AS DOUBLE) END AS syllables_per_word,
        |  CASE WHEN n_sentences > 0 AND n_words > 0 THEN
        |    206.835e0 - 1.015e0 * (CAST(n_words AS DOUBLE)
        |        / CAST(n_sentences AS DOUBLE))
        |      - 84.6e0 * (CAST(n_syllables AS DOUBLE)
        |        / CAST(n_words AS DOUBLE)) END AS flesch
        |FROM a""".stripMargin,

    // Kendall tau-b on the daily (count, value-units) series: full
    // ordered cross product so every mass halves exactly; tie-pair
    // corrections from the equality masses; one sqrt at the end.
    "q_stat_kendall" ->
      """WITH daily AS (SELECT
        |    (epoch_ns(ts) // 1000000000 // 86400) * 86400 AS day_s,
        |    CAST(COUNT(*) AS BIGINT) AS x,
        |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(28,6)))) AS BIGINT)
        |      AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        |s AS (SELECT
        |    CAST(COUNT(CASE WHEN (a.x < b.x AND a.y < b.y)
        |      OR (a.x > b.x AND a.y > b.y) THEN 1 END) AS BIGINT)
        |      AS conc2,
        |    CAST(COUNT(CASE WHEN (a.x < b.x AND a.y > b.y)
        |      OR (a.x > b.x AND a.y < b.y) THEN 1 END) AS BIGINT)
        |      AS disc2,
        |    CAST(COUNT(CASE WHEN a.x = b.x THEN 1 END) AS BIGINT)
        |      AS tx_sq,
        |    CAST(COUNT(CASE WHEN a.y = b.y THEN 1 END) AS BIGINT)
        |      AS ty_sq
        |  FROM daily a CROSS JOIN daily b),
        |f AS (SELECT n, n * (n - 1) // 2 AS n0, conc2 // 2 AS c_pairs,
        |    disc2 // 2 AS d_pairs, (tx_sq - n) // 2 AS n1,
        |    (ty_sq - n) // 2 AS n2
        |  FROM s CROSS JOIN tot)
        |SELECT n AS n_rows, CAST(n0 AS BIGINT) AS n_pairs,
        |  CAST(c_pairs AS BIGINT) AS c_pairs,
        |  CAST(d_pairs AS BIGINT) AS d_pairs,
        |  CAST(n1 AS BIGINT) AS tie_x_pairs,
        |  CAST(n2 AS BIGINT) AS tie_y_pairs,
        |  CASE WHEN n0 > n1 AND n0 > n2 THEN
        |    CAST(c_pairs - d_pairs AS DOUBLE)
        |      / sqrt(CAST(n0 - n1 AS DOUBLE)
        |        * CAST(n0 - n2 AS DOUBLE)) END AS tau_b
        |FROM f""".stripMargin,

    // Price-size skyline: per-price maxima, then the running max over
    // strictly-cheaper prices — dominance without a self-join.
    "q_skyline" ->
      """WITH base AS (SELECT p_retailprice AS x, p_size AS y
        |  FROM part
        |  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
        |perx AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM (SELECT x, y, MAX(y) OVER (PARTITION BY x) AS ymax
        |    FROM base)
        |  WHERE y = ymax GROUP BY 1, 2),
        |w AS (SELECT *, MAX(y) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS mprev FROM perx)
        |SELECT x AS p_retailprice, y AS p_size, n_rows
        |FROM w WHERE mprev IS NULL OR y > mprev""".stripMargin,

    // Heavy-change users: per-key two-period CASE counts, floor-ppb
    // shares of each period's total, top-20 by (|delta| desc, key).
    "q_heavy_change" ->
      """WITH per AS (SELECT user_id AS k,
        |    CAST(COUNT(CASE WHEN NOT (epoch_ns(ts) // 1000000000
        |      >= 1705363200) THEN 1 END) AS BIGINT) AS n_first,
        |    CAST(COUNT(CASE WHEN epoch_ns(ts) // 1000000000
        |      >= 1705363200 THEN 1 END) AS BIGINT) AS n_second
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_first) AS BIGINT) AS t1,
        |    CAST(SUM(n_second) AS BIGINT) AS t2 FROM per),
        |s AS (SELECT k, n_first, n_second,
        |    (n_first * 1000000000) // t1 AS share_first_ppb,
        |    (n_second * 1000000000) // t2 AS share_second_ppb
        |  FROM per CROSS JOIN tot WHERE t1 > 0 AND t2 > 0)
        |SELECT k AS user_id, n_first, n_second,
        |  CAST(share_first_ppb AS BIGINT) AS share_first_ppb,
        |  CAST(share_second_ppb AS BIGINT) AS share_second_ppb,
        |  CAST(abs(share_second_ppb - share_first_ppb) AS BIGINT)
        |    AS delta_ppb
        |FROM s ORDER BY delta_ppb DESC, user_id
        |LIMIT 20""".stripMargin,

    // Lexical diversity per language: (lang, token) rollup, hapax /
    // Simpson masses, quarter-bit Shannon entropy via the HUGEINT
    // b^4 bitlength kernel (the MI/PSI recipe).
    "q_text_diversity" ->
      """WITH toks AS (SELECT g, tok FROM (SELECT lang AS g,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents) WHERE length(tok) > 0),
        |tf AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS n_t
        |  FROM toks GROUP BY 1, 2),
        |per AS (SELECT g, CAST(SUM(n_t) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(COUNT(CASE WHEN n_t = 1 THEN 1 END) AS BIGINT)
        |      AS hapax_types,
        |    CAST(SUM(n_t * (n_t - 1)) AS BIGINT) AS simpson_num
        |  FROM tf GROUP BY 1),
        |ent AS (SELECT tf.g, CAST(SUM(n_t * (length(bin(
        |      (CAST(n_tokens AS HUGEINT) * n_tokens * n_tokens
        |        * n_tokens)
        |      // (CAST(n_t AS HUGEINT) * n_t * n_t * n_t))) - 1))
        |      AS BIGINT) AS entropy_q
        |  FROM tf JOIN per ON tf.g = per.g GROUP BY 1)
        |SELECT per.g AS lang, n_tokens, n_types,
        |  CAST((n_types * 1000000000) // n_tokens AS BIGINT)
        |    AS ttr_ppb,
        |  hapax_types,
        |  CASE WHEN n_tokens > 1 THEN CAST(simpson_num AS DOUBLE)
        |    / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
        |  END AS simpson_d,
        |  entropy_q,
        |  CAST(entropy_q AS DOUBLE)
        |    / (4.0 * CAST(n_tokens AS DOUBLE)) AS entropy_bits
        |FROM per JOIN ent ON per.g = ent.g""".stripMargin,

    // Degree distribution of the symmetric trade graph: node→degree,
    // degree→count, cumulative over the degree frame.
    "q_graph_degree_dist" ->
      """WITH p AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
        |  FROM e GROUP BY 1),
        |hist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |  FROM deg GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS n_total
        |  FROM hist)
        |SELECT degree, n_nodes, n_total,
        |  CAST((n_nodes * 1000000000) // n_total AS BIGINT)
        |    AS node_share_ppb,
        |  CAST(SUM(n_nodes) OVER (ORDER BY degree) AS BIGINT)
        |    AS cum_nodes
        |FROM hist CROSS JOIN tot""".stripMargin,

    // Degree assortativity over the symmetric edge list: exact BIGINT
    // (M, Σjk, Σj, Σj²), one fixed-order double combination.
    "q_graph_assortativity" ->
      """WITH p AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        |  FROM e GROUP BY 1),
        |ann AS (SELECT dj.d AS dj, dk.d AS dk FROM e
        |  JOIN deg dj ON e.src = dj.node
        |  JOIN deg dk ON e.dst = dk.node),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
        |    CAST(SUM(dj * dk) AS BIGINT) AS s_jk,
        |    CAST(SUM(dj) AS BIGINT) AS s_j,
        |    CAST(SUM(dj * dj) AS BIGINT) AS s_jj FROM ann)
        |SELECT m_edges, s_jk, s_j, s_jj,
        |  CASE WHEN CAST(m_edges AS DOUBLE) * CAST(s_jj AS DOUBLE)
        |      - CAST(s_j AS DOUBLE) * CAST(s_j AS DOUBLE) <> 0.0 THEN
        |    (CAST(m_edges AS DOUBLE) * CAST(s_jk AS DOUBLE)
        |      - CAST(s_j AS DOUBLE) * CAST(s_j AS DOUBLE))
        |    / (CAST(m_edges AS DOUBLE) * CAST(s_jj AS DOUBLE)
        |      - CAST(s_j AS DOUBLE) * CAST(s_j AS DOUBLE))
        |  END AS assortativity
        |FROM s""".stripMargin,

    // Zipf slope over the top-1000 types: quarter-bit integer log
    // axes via the HUGEINT b^4 bitlength kernel, BIGINT OLS sums,
    // fixed-order double slope/intercept/r^2.
    "q_text_zipf" ->
      """WITH toks AS (SELECT tok FROM (SELECT
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents) WHERE length(tok) > 0),
        |tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM toks GROUP BY 1 ORDER BY freq DESC, tok LIMIT 1000),
        |ranked AS (SELECT freq, CAST(row_number() OVER (
        |    ORDER BY freq DESC, tok) AS BIGINT) AS rank FROM tf),
        |pts AS (SELECT
        |    CAST(length(bin(CAST(rank AS HUGEINT) * rank * rank
        |      * rank)) - 1 AS BIGINT) AS x,
        |    CAST(length(bin(CAST(freq AS HUGEINT) * freq * freq
        |      * freq)) - 1 AS BIGINT) AS y
        |  FROM ranked),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy FROM pts),
        |f AS (SELECT *,
        |    CAST(n_points * sxx - sx * sx AS DOUBLE) AS den,
        |    CASE WHEN CAST(n_points * sxx - sx * sx AS DOUBLE)
        |        <> 0.0 THEN
        |      CAST(n_points * sxy - sx * sy AS DOUBLE)
        |        / CAST(n_points * sxx - sx * sx AS DOUBLE)
        |    END AS slope FROM s)
        |SELECT n_points, sx, sy, sxx, syy, sxy, slope,
        |  CASE WHEN den <> 0.0 THEN (CAST(sy AS DOUBLE)
        |    - slope * CAST(sx AS DOUBLE))
        |    / CAST(n_points AS DOUBLE) END AS intercept_qb,
        |  CASE WHEN den <> 0.0
        |      AND n_points * syy - sy * sy > 0 THEN
        |    (CAST(n_points * sxy - sx * sy AS DOUBLE)
        |      * CAST(n_points * sxy - sx * sy AS DOUBLE))
        |    / (den * CAST(n_points * syy - sy * sy AS DOUBLE))
        |  END AS r2
        |FROM f""".stripMargin,

    // Hour x weekday heatmap from pure integer epoch arithmetic
    // (dow: epoch day + 3 mod 7, Monday = 0).
    "q_activity_matrix" ->
      """WITH base AS (SELECT epoch_ns(ts) // 1000000000 AS epoch_s
        |  FROM events),
        |b2 AS (SELECT ((epoch_s // 86400) + 3) % 7 AS dow,
        |    (epoch_s % 86400) // 3600 AS hour FROM base),
        |cells AS (SELECT dow, hour, CAST(COUNT(*) AS BIGINT)
        |    AS n_events FROM b2 GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n_total
        |  FROM cells)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT)
        |    AS hour, n_events,
        |  CAST((n_events * 1000000000) // n_total AS BIGINT)
        |    AS share_ppb
        |FROM cells CROSS JOIN tot""".stripMargin,

    // Order->ship latency per priority: exact rank-selected quantiles
    // over the (priority, days) distinct-value frame.
    "q_ship_latency" ->
      """WITH j AS (SELECT o.o_orderpriority AS g,
        |    (epoch_ns(l.l_shipdate) // 1000000000
        |      - epoch_ns(o.o_orderdate) // 1000000000) // 86400
        |      AS lat_days
        |  FROM lineitem l JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey),
        |c AS (SELECT g, lat_days, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM j GROUP BY 1, 2),
        |w AS (SELECT *, CAST(SUM(cnt) OVER (PARTITION BY g
        |      ORDER BY lat_days) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM c)
        |SELECT g AS o_orderpriority,
        |  CAST(MAX(n) AS BIGINT) AS n_rows,
        |  CAST(MIN(lat_days) AS BIGINT) AS min_days,
        |  CAST(MAX(lat_days) AS BIGINT) AS max_days,
        |  CAST(SUM(lat_days * cnt) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
        |    AS mean_days,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN lat_days END)
        |    AS BIGINT) AS p50_days,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN lat_days END)
        |    AS BIGINT) AS p90_days,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN lat_days END)
        |    AS BIGINT) AS p99_days
        |FROM w GROUP BY 1""".stripMargin,

    // Freshness audit: per-type newest record vs the global
    // watermark, all-integer lag and last-day volume.
    "q_dq_freshness" ->
      """WITH base AS (SELECT event_type AS g,
        |    epoch_ns(ts) // 1000000000 AS epoch_s FROM events),
        |wm AS (SELECT CAST(MAX(epoch_s) AS BIGINT) AS watermark_s
        |  FROM base),
        |per AS (SELECT g, watermark_s,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(MAX(epoch_s) AS BIGINT) AS last_epoch_s,
        |    CAST(COUNT(CASE WHEN epoch_s >= watermark_s - 86400
        |      THEN 1 END) AS BIGINT) AS n_last_day
        |  FROM base CROSS JOIN wm GROUP BY 1, 2)
        |SELECT g AS event_type, n_rows, last_epoch_s, watermark_s,
        |  CAST(watermark_s - last_epoch_s AS BIGINT) AS lag_s,
        |  n_last_day,
        |  (watermark_s - last_epoch_s) > 3600 AS is_stale
        |FROM per""".stripMargin,

    // Fano-factor burstiness of the top-20 terms: (term, doc) counts
    // only over the pruned top vocabulary; zero-docs enter through
    // the sufficient-statistic variance form.
    "q_text_burstiness" ->
      """WITH toks AS (SELECT doc, tok FROM (SELECT doc_id AS doc,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents) WHERE length(tok) > 0),
        |top AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tft
        |  FROM toks GROUP BY 1 ORDER BY tft DESC, tok LIMIT 20),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents),
        |perdoc AS (SELECT t.tok, t.doc, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks t JOIN top ON t.tok = top.tok GROUP BY 1, 2),
        |agg AS (SELECT tok AS term, CAST(COUNT(*) AS BIGINT)
        |      AS df_docs,
        |    CAST(SUM(c) AS BIGINT) AS tf_total,
        |    CAST(SUM(c * c) AS BIGINT) AS sum_sq
        |  FROM perdoc GROUP BY 1),
        |f AS (SELECT term, n_docs, df_docs, tf_total, sum_sq,
        |    CAST(tf_total AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |      AS mean_per_doc
        |  FROM agg CROSS JOIN nd)
        |SELECT term, n_docs, df_docs, tf_total, sum_sq, mean_per_doc,
        |  CASE WHEN tf_total > 0 AND n_docs > 0 THEN
        |    (CAST(sum_sq AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |      - mean_per_doc * mean_per_doc) / mean_per_doc
        |  END AS fano
        |FROM f""".stripMargin,

    // Wilson 95% interval per type for P(value >= 100): exact (n, k)
    // rollup, one fixed-order double interval (e0 literals, z*z
    // computed, sqrt IEEE-exact).
    "q_wilson_ci" ->
      """WITH per AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_trials,
        |    CAST(COUNT(CASE WHEN value >= 100.0 THEN 1 END)
        |      AS BIGINT) AS n_success
        |  FROM events GROUP BY 1),
        |f AS (SELECT *, CAST(n_trials AS DOUBLE) AS nd,
        |    CASE WHEN n_trials > 0 THEN CAST(n_success AS DOUBLE)
        |      / CAST(n_trials AS DOUBLE) END AS p_hat FROM per),
        |g AS (SELECT *, 1.0e0 + 1.96e0 * 1.96e0 / nd AS denom
        |  FROM f),
        |h AS (SELECT *,
        |    CASE WHEN n_trials > 0 THEN
        |      (p_hat + 1.96e0 * 1.96e0 / (2.0e0 * nd)) / denom
        |    END AS center,
        |    CASE WHEN n_trials > 0 THEN
        |      1.96e0 * sqrt(p_hat * (1.0e0 - p_hat) / nd
        |        + 1.96e0 * 1.96e0 / (4.0e0 * nd * nd)) / denom
        |    END AS half
        |  FROM g)
        |SELECT event_type, n_trials, n_success, p_hat,
        |  center - half AS wilson_low, center + half AS wilson_high
        |FROM h""".stripMargin,

    // Markov memorylessness: observed 2-step ppb vs the chained
    // 1-step prediction (exact ppb*ppb sums, one floor-div).
    "q_markov_2step" ->
      """WITH seq AS (SELECT event_type AS s0,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000, event_id) AS s1,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000, event_id) AS s2
        |  FROM events),
        |c1 AS (SELECT s0 AS a, s1 AS b, CAST(COUNT(*) AS BIGINT)
        |    AS c1 FROM seq WHERE s1 IS NOT NULL GROUP BY 1, 2),
        |r1 AS (SELECT a, CAST(SUM(c1) AS BIGINT) AS t1 FROM c1
        |  GROUP BY 1),
        |p1 AS (SELECT a, b, (c1 * 1000000000) // t1 AS p_ppb
        |  FROM c1 JOIN r1 USING (a)),
        |c2 AS (SELECT s0 AS a, s2 AS c, CAST(COUNT(*) AS BIGINT)
        |    AS c2 FROM seq WHERE s2 IS NOT NULL GROUP BY 1, 2),
        |r2 AS (SELECT a, CAST(SUM(c2) AS BIGINT) AS t2 FROM c2
        |  GROUP BY 1),
        |obs AS (SELECT a, c, c2 AS n_two_step,
        |    (c2 * 1000000000) // t2 AS obs_ppb
        |  FROM c2 JOIN r2 USING (a)),
        |pred AS (SELECT x.a AS a, y.b AS c,
        |    CAST(SUM(x.p_ppb * y.p_ppb) // 1000000000 AS BIGINT)
        |      AS pred_ppb
        |  FROM p1 x JOIN p1 y ON x.b = y.a GROUP BY 1, 2)
        |SELECT COALESCE(obs.a, pred.a) AS from_state,
        |  COALESCE(obs.c, pred.c) AS to_state,
        |  CAST(COALESCE(n_two_step, 0) AS BIGINT) AS n_two_step,
        |  CAST(COALESCE(obs_ppb, 0) AS BIGINT) AS obs_ppb,
        |  CAST(COALESCE(pred_ppb, 0) AS BIGINT) AS pred_ppb,
        |  CAST(COALESCE(obs_ppb, 0) - COALESCE(pred_ppb, 0)
        |    AS BIGINT) AS gap_ppb
        |FROM obs FULL OUTER JOIN pred
        |  ON obs.a = pred.a AND obs.c = pred.c""".stripMargin,

    // ABC classification: pre-key cumulative boundary tests
    // (multiplied through), floor-PPM shares (ppb would overflow at
    // corpus revenue scale).
    "q_abc_analysis" ->
      """WITH per AS (SELECT l_partkey AS k,
        |    CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(28,6))))
        |      AS BIGINT) AS x
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT k, x,
        |    CAST(SUM(x) OVER (ORDER BY x DESC, k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(x) OVER () AS BIGINT) AS t FROM per),
        |cls AS (SELECT *,
        |    CASE WHEN (cum - x) * 5 < t * 4 THEN 'A'
        |      WHEN (cum - x) * 20 < t * 19 THEN 'B'
        |      ELSE 'C' END AS abc_class
        |  FROM w),
        |agg AS (SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(x) AS BIGINT) AS units,
        |    CAST(MAX(t) AS BIGINT) AS total_units
        |  FROM cls GROUP BY 1)
        |SELECT abc_class, n_keys, units,
        |  CASE WHEN total_units > 0 THEN
        |    CAST((units * 1000000) // total_units AS BIGINT)
        |  ELSE 0 END AS share_ppm
        |FROM agg""".stripMargin,

    // BFS layers from node 2 (customer #1): 4 unrolled frontier
    // expansions with anti-join visited sets.
    "q_graph_bfs" ->
      """WITH p AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |v0 AS (SELECT CAST(2 AS BIGINT) AS node),
        |f1 AS (SELECT DISTINCT dst AS node FROM e
        |  JOIN v0 ON e.src = v0.node
        |  WHERE dst NOT IN (SELECT node FROM v0)),
        |f2 AS (SELECT DISTINCT dst AS node FROM e
        |  JOIN f1 ON e.src = f1.node
        |  WHERE dst NOT IN (SELECT node FROM v0
        |    UNION ALL SELECT node FROM f1)),
        |f3 AS (SELECT DISTINCT dst AS node FROM e
        |  JOIN f2 ON e.src = f2.node
        |  WHERE dst NOT IN (SELECT node FROM v0
        |    UNION ALL SELECT node FROM f1
        |    UNION ALL SELECT node FROM f2)),
        |f4 AS (SELECT DISTINCT dst AS node FROM e
        |  JOIN f3 ON e.src = f3.node
        |  WHERE dst NOT IN (SELECT node FROM v0
        |    UNION ALL SELECT node FROM f1
        |    UNION ALL SELECT node FROM f2
        |    UNION ALL SELECT node FROM f3)),
        |u AS (SELECT 0 AS hop, node FROM v0
        |  UNION ALL SELECT 1, node FROM f1
        |  UNION ALL SELECT 2, node FROM f2
        |  UNION ALL SELECT 3, node FROM f3
        |  UNION ALL SELECT 4, node FROM f4)
        |SELECT CAST(hop AS BIGINT) AS hop,
        |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(MIN(node) AS BIGINT) AS min_node,
        |  CAST(MAX(node) AS BIGINT) AS max_node
        |FROM u GROUP BY 1""".stripMargin,

    // Longest-inactivity-gap histogram: distinct active days, per-key
    // lag gaps, single-day keys report 0.
    "q_user_gaps" ->
      """WITH active AS (SELECT DISTINCT user_id AS k,
        |    (epoch_ns(ts) // 1000000000) // 86400 AS day
        |  FROM events),
        |g AS (SELECT k, day - lag(day) OVER (PARTITION BY k
        |    ORDER BY day) AS gap FROM active),
        |longest AS (SELECT k, CAST(COALESCE(MAX(gap), 0) AS BIGINT)
        |    AS longest_gap_days FROM g GROUP BY 1),
        |hist AS (SELECT longest_gap_days,
        |    CAST(COUNT(*) AS BIGINT) AS n_users FROM longest
        |  GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_total
        |  FROM hist)
        |SELECT longest_gap_days, n_users,
        |  CAST((n_users * 1000000000) // n_total AS BIGINT)
        |    AS user_share_ppb
        |FROM hist CROSS JOIN tot""".stripMargin,

    // Cohort LTV triangle: min-week cohorts, (cohort, age) value
    // cells, per-cohort cumulative, micro-units per cohort user.
    "q_cohort_ltv" ->
      """WITH base AS (SELECT user_id AS k,
        |    ((epoch_ns(ts) // 1000000000) // 86400) // 7 AS week,
        |    CAST(value AS DECIMAL(28,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |cohorts AS (SELECT k, CAST(MIN(week) AS BIGINT)
        |    AS cohort_week FROM base GROUP BY 1),
        |sized AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT)
        |    AS cohort_users FROM cohorts GROUP BY 1),
        |cells AS (SELECT cohort_week,
        |    CAST(week - cohort_week AS BIGINT) AS age_week,
        |    CAST(COUNT(DISTINCT k) AS BIGINT) AS n_active,
        |    CAST(FLOOR(SUM(v)) AS BIGINT) AS units
        |  FROM base JOIN cohorts USING (k) GROUP BY 1, 2),
        |w AS (SELECT *, CAST(SUM(units) OVER (
        |    PARTITION BY cohort_week ORDER BY age_week) AS BIGINT)
        |    AS cum_units FROM cells)
        |SELECT w.cohort_week, age_week, cohort_users, n_active,
        |  units, cum_units,
        |  CAST((cum_units * 1000000) // cohort_users AS BIGINT)
        |    AS cum_units_per_user_ppm
        |FROM w JOIN sized ON w.cohort_week = sized.cohort_week"""
        .stripMargin,

    // Inter-purchase gaps: per-user lag, then the ship-latency exact
    // rank-quantile CTEs over the (type, days) distinct-value frame.
    "q_repurchase_gap" ->
      """WITH p AS (SELECT event_type, ts,
        |    lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_ts
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT event_type AS g,
        |    (epoch_ns(ts) // 1000000000
        |      - epoch_ns(prev_ts) // 1000000000) // 86400 AS lat_days
        |  FROM p WHERE prev_ts IS NOT NULL),
        |c AS (SELECT g, lat_days, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM j GROUP BY 1, 2),
        |w AS (SELECT *, CAST(SUM(cnt) OVER (PARTITION BY g
        |      ORDER BY lat_days) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM c)
        |SELECT g AS event_type,
        |  CAST(MAX(n) AS BIGINT) AS n_rows,
        |  CAST(MIN(lat_days) AS BIGINT) AS min_days,
        |  CAST(MAX(lat_days) AS BIGINT) AS max_days,
        |  CAST(SUM(lat_days * cnt) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
        |    AS mean_days,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN lat_days END)
        |    AS BIGINT) AS p50_days,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN lat_days END)
        |    AS BIGINT) AS p90_days,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN lat_days END)
        |    AS BIGINT) AS p99_days
        |FROM w GROUP BY 1""".stripMargin,

    // Farthest-from-own-centroid label-noise shortlist: quantize6
    // micro-units, round-half-away integer means, exact BIGINT
    // squared deviations, per-label top-3.
    "q_embed_mislabel" ->
      """WITH el AS (SELECT vec_id AS vid, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(CAST(unnest(embedding) AS DOUBLE)
        |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x
        |  FROM embeddings),
        |cm AS (SELECT label, i, CAST(SUM(x) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM el GROUP BY 1, 2),
        |ct AS (SELECT label, i,
        |    (2 * s + CASE WHEN s < 0 THEN -n ELSE n END) // (2 * n)
        |      AS m FROM cm),
        |d2 AS (SELECT el.label, vid,
        |    CAST(SUM((x - m) * (x - m)) AS BIGINT) AS d2_micro2
        |  FROM el JOIN ct ON el.label = ct.label AND el.i = ct.i
        |  GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY label
        |    ORDER BY d2_micro2 DESC, vid) AS BIGINT) AS mis_rank
        |  FROM d2)
        |SELECT label, vid, d2_micro2, mis_rank,
        |  sqrt(CAST(d2_micro2 AS DOUBLE)) / 1.0e6 AS dist
        |FROM r WHERE mis_rank <= 3""".stripMargin,

    // Duplicate-cluster size histogram over the same recursive
    // reachability as q_dedup_components.
    "q_dedup_cluster_sizes" ->
      s"""WITH RECURSIVE
         |w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
         |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(3)}) AS shingle FROM w),
         |sizes AS (SELECT id, COUNT(*) AS set_size FROM sh GROUP BY 1),
         |inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |  WHERE a.id < b.id GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.id = id_a
         |  JOIN sizes sb ON sb.id = id_b
         |  WHERE CAST(n_common AS DOUBLE)
         |      / CAST(sa.set_size + sb.set_size - n_common AS DOUBLE) >= 0.10),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, lab) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
         |labels AS (SELECT id, MIN(lab) AS component FROM reach GROUP BY 1),
         |cl AS (SELECT component, CAST(COUNT(*) AS BIGINT)
         |    AS cluster_size FROM labels GROUP BY 1)
         |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
         |FROM cl GROUP BY 1""".stripMargin,

    // Short/medium/long census per source: fixed char-count bands,
    // integer masses, ppb doc shares of each group.
    "q_text_length_bands" ->
      """WITH base AS (SELECT source AS g,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |      END AS BIGINT) AS n_tokens
        |  FROM documents),
        |b2 AS (SELECT g, n_chars, n_tokens,
        |    CASE WHEN n_chars < 500 THEN 'short'
        |      WHEN n_chars < 2000 THEN 'medium'
        |      ELSE 'long' END AS band FROM base),
        |cells AS (SELECT g, band, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tokens
        |  FROM b2 GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(SUM(n_docs) AS BIGINT) AS g_total
        |  FROM cells GROUP BY 1)
        |SELECT cells.g AS source, band, n_docs, chars, tokens,
        |  CAST((n_docs * 1000000000) // g_total AS BIGINT)
        |    AS doc_share_ppb
        |FROM cells JOIN tot ON cells.g = tot.g""".stripMargin,

    // Linear multi-touch attribution: conversion-delimited segments,
    // per-touch floor credit 1e9 div segment size.
    "q_attribution_markov" -> markovAttribSql,

    // Boilerplate census: per-doc distinct strided char-16-grams,
    // document-frequency rollup, floor-ppb share, top-20 with
    // binary-collation gram ties.
    "q_text_boilerplate" ->
      """WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |    substring(text, CAST(p AS INTEGER), 16) AS g
        |  FROM documents, unnest(range(1, length(text) - 15 + 1, 8))
        |    AS t(p)
        |  WHERE length(text) >= 16),
        |cnt AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df_docs
        |  FROM g GROUP BY 1)
        |SELECT g AS gram, df_docs,
        |  CAST((df_docs * 1000000000) // n_docs AS BIGINT) AS df_ppb
        |FROM cnt, nn WHERE df_docs >= 2
        |ORDER BY df_docs DESC, gram LIMIT 20""".stripMargin,

    // Per-source vs global quantile alignment: rank-selected values
    // at ceil(n*p/100) on both frames, BIGINT gap.
    "q_stat_qq" ->
      """WITH base AS (SELECT source AS g, n_chars AS v FROM documents
        |  WHERE n_chars IS NOT NULL),
        |pg AS (SELECT * FROM (VALUES (10), (25), (50), (75), (90))
        |  t(p)),
        |gr AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS n FROM base),
        |grq AS (SELECT g, p, CAST(n AS BIGINT) AS n_group,
        |    v AS group_value
        |  FROM gr, pg WHERE rn = (n * p + 99) // 100),
        |gl AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
        |    COUNT(*) OVER () AS n FROM base),
        |glq AS (SELECT p, v AS global_value FROM gl, pg
        |  WHERE rn = (n * p + 99) // 100)
        |SELECT g AS source, grq.p, n_group, group_value, global_value,
        |  group_value - global_value AS gap
        |FROM grq JOIN glq ON grq.p = glq.p
        |ORDER BY 1, 2""".stripMargin,

    // Join-key skew telemetry: per key family, distinct keys, rows,
    // floor-ppb mass of the heaviest key / heaviest-10 multiset.
    "q_dq_skew" ->
      """WITH c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY l_partkey),
        |c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY l_suppkey),
        |c3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey),
        |c4 AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
        |SELECT 'lineitem.l_partkey' AS key_family,
        |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST((MAX(cnt) * 1000000000) // SUM(cnt) AS BIGINT)
        |    AS top1_ppb,
        |  CAST(((SELECT SUM(cnt) FROM (SELECT cnt FROM c1
        |      ORDER BY cnt DESC LIMIT 10)) * 1000000000) // SUM(cnt)
        |    AS BIGINT) AS top10_ppb
        |FROM c1
        |UNION ALL SELECT 'lineitem.l_suppkey',
        |  CAST(SUM(cnt) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST((MAX(cnt) * 1000000000) // SUM(cnt) AS BIGINT),
        |  CAST(((SELECT SUM(cnt) FROM (SELECT cnt FROM c2
        |      ORDER BY cnt DESC LIMIT 10)) * 1000000000) // SUM(cnt)
        |    AS BIGINT)
        |FROM c2
        |UNION ALL SELECT 'orders.o_custkey',
        |  CAST(SUM(cnt) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST((MAX(cnt) * 1000000000) // SUM(cnt) AS BIGINT),
        |  CAST(((SELECT SUM(cnt) FROM (SELECT cnt FROM c3
        |      ORDER BY cnt DESC LIMIT 10)) * 1000000000) // SUM(cnt)
        |    AS BIGINT)
        |FROM c3
        |UNION ALL SELECT 'events.user_id',
        |  CAST(SUM(cnt) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST((MAX(cnt) * 1000000000) // SUM(cnt) AS BIGINT),
        |  CAST(((SELECT SUM(cnt) FROM (SELECT cnt FROM c4
        |      ORDER BY cnt DESC LIMIT 10)) * 1000000000) // SUM(cnt)
        |    AS BIGINT)
        |FROM c4
        |ORDER BY key_family""".stripMargin,

    "q_attribution_linear" ->
      """WITH seq AS (SELECT user_id AS k, event_type AS t,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS seg
        |  FROM events),
        |touches AS (SELECT k, t, seg FROM seq WHERE t <> 'purchase'),
        |closed AS (SELECT DISTINCT k, seg FROM seq
        |  WHERE t = 'purchase'),
        |credited AS (SELECT touches.k, touches.t, touches.seg
        |  FROM touches JOIN closed USING (k, seg)),
        |segsize AS (SELECT k, seg, CAST(COUNT(*) AS BIGINT) AS n_seg
        |  FROM credited GROUP BY 1, 2)
        |SELECT t AS touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(1000000000 // n_seg) AS BIGINT) AS credit_ppb
        |FROM credited JOIN segsize USING (k, seg)
        |GROUP BY 1""".stripMargin,

    // Runs test on the daily value series: exact lower median,
    // above/below signs (median ties drop), lag-window run starts.
    "q_stat_runs" ->
      """WITH daily AS (SELECT
        |    (epoch_ns(ts) // 1000000000 // 86400) * 86400 AS o,
        |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(28,6)))) AS BIGINT)
        |      AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |dv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM daily
        |  GROUP BY 1),
        |med AS (SELECT CAST(MIN(v) AS BIGINT) AS median_v FROM (
        |    SELECT v, SUM(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum, SUM(cnt) OVER () AS n FROM dv)
        |  WHERE cum * 2 >= n),
        |signed AS (SELECT o, CASE WHEN v > median_v THEN 1 ELSE 0 END
        |    AS s FROM daily CROSS JOIN med WHERE v <> median_v),
        |seqd AS (SELECT s, lag(s) OVER (ORDER BY o) AS prev_s
        |  FROM signed),
        |runs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
        |    CAST(SUM(s) AS BIGINT) AS n_above,
        |    CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_below,
        |    CAST(SUM(CASE WHEN prev_s IS NULL OR prev_s <> s THEN 1
        |      ELSE 0 END) AS BIGINT) AS n_runs FROM seqd),
        |f AS (SELECT median_v, n_kept, n_above, n_below, n_runs,
        |    CASE WHEN n_kept > 0 THEN
        |      2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |        / CAST(n_kept AS DOUBLE) + 1.0 END AS mu,
        |    CASE WHEN n_kept > 1 THEN
        |      (2.0 * CAST(n_above AS DOUBLE)
        |        * CAST(n_below AS DOUBLE)
        |        * (2.0 * CAST(n_above AS DOUBLE)
        |          * CAST(n_below AS DOUBLE)
        |          - CAST(n_kept AS DOUBLE)))
        |      / (CAST(n_kept AS DOUBLE) * CAST(n_kept AS DOUBLE)
        |        * (CAST(n_kept AS DOUBLE) - 1.0)) END AS var_r
        |  FROM runs CROSS JOIN med)
        |SELECT median_v, n_kept, n_above, n_below, n_runs,
        |  CASE WHEN var_r > 0.0 THEN
        |    (CAST(n_runs AS DOUBLE) - mu) / sqrt(var_r)
        |  END AS z_stat
        |FROM f""".stripMargin,

    // Rate-breach audit: (key, minute) counts, per-key peak +
    // earliest peak minute, top-20 by (peak desc, key).
    "q_rate_breaches" ->
      """WITH pm AS (SELECT user_id AS k,
        |    (epoch_ns(ts) // 1000000000) // 60 AS minute,
        |    CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |pk AS (SELECT k, CAST(MAX(cnt) AS BIGINT) AS peak_per_minute,
        |    CAST(SUM(cnt) AS BIGINT) AS n_events FROM pm GROUP BY 1)
        |SELECT pm.k AS user_id, peak_per_minute,
        |  CAST(MIN(minute) AS BIGINT) AS peak_minute, n_events
        |FROM pm JOIN pk ON pm.k = pk.k AND pm.cnt = pk.peak_per_minute
        |GROUP BY 1, 2, 4
        |ORDER BY peak_per_minute DESC, user_id
        |LIMIT 20""".stripMargin,

    // Mutual top-5 cosine pairs: the q_sim_topk_cosine CTEs over the
    // full corpus with self-pairs excluded BEFORE ranking, then the
    // swapped-key self-join keeps only reciprocal pairs.
    "q_sim_mutual_anchored" ->
      """WITH anch AS (SELECT vec_id FROM embeddings
        |  ORDER BY ((vec_id % 2147483647) * 2654435761) % 4294967296,
        |    vec_id
        |  LIMIT 256),
        |el AS (SELECT vec_id, generate_subscripts(embedding, 1)
        |      AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6))
        |      AS x FROM embeddings),
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE))
        |      AS nrm
        |  FROM el GROUP BY 1),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE)
        |      AS dot
        |  FROM el q JOIN el c ON q.i = c.i
        |  WHERE q.vec_id <> c.vec_id GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM s JOIN norms nq ON nq.vec_id = query_id
        |         JOIN norms nc ON nc.vec_id = corpus_id),
        |tk AS (SELECT query_id, corpus_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, corpus_id) AS BIGINT) AS rank
        |  FROM sc QUALIFY rank <= 5)
        |SELECT a.query_id AS u, a.corpus_id AS v, a.rank AS rank_uv,
        |  b.rank AS rank_vu, a.score AS score
        |FROM tk a JOIN tk b ON a.query_id = b.corpus_id
        |  AND a.corpus_id = b.query_id
        |WHERE a.query_id < a.corpus_id
        |  AND (a.query_id IN (SELECT vec_id FROM anch)
        |    OR a.corpus_id IN (SELECT vec_id FROM anch))""".stripMargin,

    // Memorization census over per-doc-distinct 8-word shingles:
    // type and mass shares sitting in repeated shingles.
    "q_text_memorization" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS words
         |  FROM documents),
         |sh AS (SELECT doc_id AS id, unnest(${shingleExpr(8)})
         |    AS shingle FROM w),
         |ps AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df_docs
         |  FROM sh GROUP BY 1),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |    CAST(COUNT(CASE WHEN df_docs >= 2 THEN 1 END) AS BIGINT)
         |      AS n_dup_shingles,
         |    CAST(SUM(df_docs) AS BIGINT) AS occ_total,
         |    CAST(SUM(CASE WHEN df_docs >= 2 THEN df_docs ELSE 0 END)
         |      AS BIGINT) AS occ_in_dup,
         |    CAST(MAX(df_docs) AS BIGINT) AS max_df FROM ps)
         |SELECT n_shingles, n_dup_shingles, occ_total, occ_in_dup,
         |  max_df,
         |  CAST((n_dup_shingles * 1000000000) // n_shingles AS BIGINT)
         |    AS dup_type_share_ppb,
         |  CAST((occ_in_dup * 1000000000) // occ_total AS BIGINT)
         |    AS dup_mass_share_ppb
         |FROM a""".stripMargin,

    // Heaps growth curve: doc-id deciles, first-occurrence doc per
    // type, cumulative type/token masses.
    "q_vocab_growth" ->
      """WITH dd AS (SELECT doc_id AS doc,
        |    CAST(ntile(10) OVER (ORDER BY doc_id) AS BIGINT)
        |      AS decile FROM documents),
        |toks AS (SELECT doc, tok FROM (SELECT doc_id AS doc,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents) WHERE length(tok) > 0),
        |tpd AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |  FROM toks JOIN dd USING (doc) GROUP BY 1),
        |nd AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM dd GROUP BY 1),
        |fd AS (SELECT tok, MIN(doc) AS first_doc FROM toks
        |  GROUP BY 1),
        |nt AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_types
        |  FROM fd JOIN dd ON fd.first_doc = dd.doc GROUP BY 1),
        |j AS (SELECT nd.decile, n_docs,
        |    CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(new_types, 0) AS BIGINT) AS new_types
        |  FROM nd LEFT JOIN tpd ON nd.decile = tpd.decile
        |  LEFT JOIN nt ON nd.decile = nt.decile)
        |SELECT decile, n_docs, n_tokens, new_types,
        |  CAST(SUM(new_types) OVER (ORDER BY decile) AS BIGINT)
        |    AS cum_types,
        |  CAST(SUM(n_tokens) OVER (ORDER BY decile) AS BIGINT)
        |    AS cum_tokens
        |FROM j""".stripMargin,

    // Class-distinctive terms: floor-ppb shares, floor-permille lift
    // ratio, support floor, per-group top-10.
    "q_text_distinctive" ->
      """WITH toks AS (SELECT g, tok FROM (SELECT lang AS g,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents) WHERE length(tok) > 0),
        |tfg AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS tf_g
        |  FROM toks GROUP BY 1, 2),
        |ng AS (SELECT g, CAST(SUM(tf_g) AS BIGINT) AS n_g FROM tfg
        |  GROUP BY 1),
        |tfa AS (SELECT tok, CAST(SUM(tf_g) AS BIGINT) AS tf_all
        |  FROM tfg GROUP BY 1),
        |na AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n_all FROM ng),
        |scored AS (SELECT g, tok, tf_g,
        |    (tf_g * 1000000000) // n_g AS share_g_ppb,
        |    (tf_all * 1000000000) // n_all AS share_all_ppb
        |  FROM tfg JOIN ng USING (g) JOIN tfa USING (tok)
        |  CROSS JOIN na WHERE tf_g >= 5),
        |l AS (SELECT *, (share_g_ppb * 1000)
        |    // GREATEST(share_all_ppb, 1) AS lift_permille
        |  FROM scored),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY g
        |    ORDER BY lift_permille DESC, tok) AS BIGINT) AS term_rank
        |  FROM l)
        |SELECT g AS lang, tok AS term, tf_g,
        |  CAST(share_g_ppb AS BIGINT) AS share_g_ppb,
        |  CAST(share_all_ppb AS BIGINT) AS share_all_ppb,
        |  CAST(lift_permille AS BIGINT) AS lift_permille, term_rank
        |FROM r WHERE term_rank <= 10""".stripMargin,

    // Token case/format hygiene: anchored character-class regexes
    // (Java and RE2 agree), floor-ppb shares.
    "q_text_case_profile" ->
      """WITH toks AS (SELECT g, tok FROM (SELECT source AS g,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents) WHERE length(tok) > 0),
        |a AS (SELECT g AS source, CAST(COUNT(*) AS BIGINT)
        |      AS n_tokens,
        |    CAST(COUNT(CASE WHEN regexp_matches(tok, '^[A-Z]{2,}$')
        |      THEN 1 END) AS BIGINT) AS n_allcaps,
        |    CAST(COUNT(CASE WHEN regexp_matches(tok, '^[A-Z][a-z]+$')
        |      THEN 1 END) AS BIGINT) AS n_titlecase,
        |    CAST(COUNT(CASE WHEN regexp_matches(tok, '^[0-9]+$')
        |      THEN 1 END) AS BIGINT) AS n_digits
        |  FROM toks GROUP BY 1)
        |SELECT source, n_tokens, n_allcaps, n_titlecase, n_digits,
        |  CAST((n_allcaps * 1000000000) // n_tokens AS BIGINT)
        |    AS allcaps_ppb,
        |  CAST((n_titlecase * 1000000000) // n_tokens AS BIGINT)
        |    AS titlecase_ppb,
        |  CAST((n_digits * 1000000000) // n_tokens AS BIGINT)
        |    AS digits_ppb
        |FROM a""".stripMargin,

    // Per-label norm profile: exact q12 squared norms, rank-picked
    // median, one fixed-order RMS double.
    "q_embed_norms" ->
      """WITH el AS (SELECT vec_id, label,
        |    CAST(CAST(CAST(unnest(embedding) AS DOUBLE)
        |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x
        |  FROM embeddings),
        |n2t AS (SELECT label, vec_id, CAST(SUM(x * x) AS BIGINT)
        |    AS n2 FROM el GROUP BY 1, 2),
        |dv AS (SELECT label, n2, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM n2t GROUP BY 1, 2),
        |w AS (SELECT *, CAST(SUM(cnt) OVER (PARTITION BY label
        |      ORDER BY n2) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY label) AS BIGINT) AS n
        |  FROM dv)
        |SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
        |  CAST(MIN(n2) AS BIGINT) AS min_norm2_q12,
        |  CAST(MAX(n2) AS BIGINT) AS max_norm2_q12,
        |  CAST(SUM(n2 * cnt) AS BIGINT) AS sum_norm2_q12,
        |  CAST(MIN(CASE WHEN cum * 2 >= n THEN n2 END) AS BIGINT)
        |    AS p50_norm2_q12,
        |  sqrt((CAST(SUM(n2 * cnt) AS DOUBLE) / CAST(MAX(n) AS DOUBLE))
        |    / 1.0e12) AS rms_norm
        |FROM w GROUP BY 1""".stripMargin,

    // Nearest-centroid confusion matrix: micro-unit quantization,
    // round-half-away integer means, exact BIGINT distances, ties by
    // centroid label, row-ppb shares.
    "q_embed_confusion" ->
      """WITH el AS (SELECT vec_id AS vid, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(CAST(unnest(embedding) AS DOUBLE)
        |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x
        |  FROM embeddings),
        |cm AS (SELECT label AS clabel, i,
        |    (2 * CAST(SUM(x) AS BIGINT) + CASE WHEN SUM(x) < 0
        |      THEN -CAST(COUNT(*) AS BIGINT)
        |      ELSE CAST(COUNT(*) AS BIGINT) END)
        |      // (2 * CAST(COUNT(*) AS BIGINT)) AS m
        |  FROM el GROUP BY 1, 2),
        |d2 AS (SELECT vid, label, clabel,
        |    CAST(SUM((x - m) * (x - m)) AS BIGINT) AS d2
        |  FROM el JOIN cm ON el.i = cm.i GROUP BY 1, 2, 3),
        |asgn AS (SELECT vid, label, clabel,
        |    row_number() OVER (PARTITION BY vid ORDER BY d2, clabel)
        |      AS rn FROM d2),
        |cells AS (SELECT label AS true_label, clabel AS pred_label,
        |    CAST(COUNT(*) AS BIGINT) AS n_points
        |  FROM asgn WHERE rn = 1 GROUP BY 1, 2),
        |rt AS (SELECT *, CAST(SUM(n_points) OVER (
        |    PARTITION BY true_label) AS BIGINT) AS row_total
        |  FROM cells)
        |SELECT true_label, pred_label, n_points,
        |  CAST((n_points * 1000000000) // row_total AS BIGINT)
        |    AS row_share_ppb
        |FROM rt""".stripMargin,

    // Loyalty census: order-count bands, floored revenue units, ppm
    // shares (abc headroom rule).
    "q_repeat_bands" ->
      """WITH per AS (SELECT o_custkey AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(28,6))))
        |      AS BIGINT) AS units
        |  FROM orders GROUP BY 1),
        |b AS (SELECT *, CASE WHEN n_orders = 1 THEN 'one_time'
        |    WHEN n_orders <= 4 THEN 'repeat_2_4'
        |    WHEN n_orders <= 9 THEN 'loyal_5_9'
        |    ELSE 'power_10_plus' END AS band FROM per),
        |cells AS (SELECT band, CAST(COUNT(*) AS BIGINT)
        |      AS n_customers,
        |    CAST(SUM(n_orders) AS BIGINT) AS n_orders,
        |    CAST(SUM(units) AS BIGINT) AS units FROM b GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS t_cust,
        |    CAST(SUM(units) AS BIGINT) AS t_units FROM cells)
        |SELECT band, n_customers, n_orders, units,
        |  CAST((n_customers * 1000000) // t_cust AS BIGINT)
        |    AS customer_share_ppm,
        |  CASE WHEN t_units > 0 THEN
        |    CAST((units * 1000000) // t_units AS BIGINT)
        |  ELSE 0 END AS revenue_share_ppm
        |FROM cells CROSS JOIN tot""".stripMargin,

    // Brown-Forsythe: exact per-group lower medians, |x - med| one
    // double subtraction, then the anova decimal ladder.
    "q_stat_levene" ->
      """WITH base AS (SELECT event_type AS g, value AS v FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |dvm AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM base GROUP BY 1, 2),
        |medw AS (SELECT g, v, SUM(cnt) OVER (PARTITION BY g
        |      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY g) AS n FROM dvm),
        |med AS (SELECT g, MIN(v) AS med_g FROM medw
        |  WHERE cum * 2 >= n GROUP BY 1),
        |zb AS (SELECT base.g,
        |    CAST(ABS(v - med_g) AS DECIMAL(18,4)) AS xq
        |  FROM base JOIN med ON base.g = med.g),
        |b2 AS (SELECT g, xq, CAST(xq AS DOUBLE) AS xd FROM zb),
        |per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    SUM(xq) AS s_g,
        |    SUM(CAST(xd * xd AS DECIMAL(38,4))) AS q_g
        |  FROM b2 GROUP BY 1),
        |per2 AS (SELECT *, CAST(CAST(s_g AS DOUBLE)
        |    * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
        |    AS DECIMAL(38,4)) AS term FROM per),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_g) AS BIGINT) AS n_rows,
        |    SUM(s_g) AS t_sum, SUM(q_g) AS q_sum,
        |    SUM(term) AS b_sum FROM per2),
        |fin AS (SELECT n_rows, k,
        |    CAST(b_sum AS DOUBLE) - CAST(t_sum AS DOUBLE)
        |      * CAST(t_sum AS DOUBLE) / CAST(n_rows AS DOUBLE)
        |      AS ss_between,
        |    CAST(q_sum AS DOUBLE) - CAST(b_sum AS DOUBLE) AS ss_within
        |  FROM agg)
        |SELECT n_rows, k, ss_between, ss_within,
        |  CASE WHEN k > 1 AND n_rows > k AND ss_within > 0.0 THEN
        |    (ss_between / CAST(k - 1 AS DOUBLE))
        |      / (ss_within / CAST(n_rows - k AS DOUBLE)) END AS f_stat,
        |  CASE WHEN ss_between + ss_within > 0.0 THEN
        |    ss_between / (ss_between + ss_within) END AS eta_sq
        |FROM fin""".stripMargin,

    // Theil-Sen: median of pairwise slopes over the daily series,
    // exact lower rank pick on the fully tie-broken order.
    "q_series_theilsen" ->
      """WITH daily AS (SELECT
        |    (epoch_ns(ts) // 1000000000) // 86400 AS x,
        |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(28,6)))) AS BIGINT)
        |      AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |pairs AS (SELECT a.x AS x1, b.x AS x2,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
        |      AS slope
        |  FROM daily a CROSS JOIN daily b WHERE a.x < b.x),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM pairs),
        |r AS (SELECT slope, CAST(row_number() OVER (ORDER BY slope,
        |    x1, x2) AS BIGINT) AS rn FROM pairs)
        |SELECT n_pairs, slope AS median_slope
        |FROM r CROSS JOIN tot
        |WHERE rn = (n_pairs + 1) // 2""".stripMargin,

    // TwoNN intrinsic dimension: exact q12 pairwise d^2, per-point
    // 1st/2nd NN, shifted quarter-bit log ratios, frozen ln2.
    "q_embed_intrinsic_dim_anchored" ->
      """WITH anch AS (SELECT vec_id FROM embeddings
        |  ORDER BY ((vec_id % 2147483647) * 2654435761) % 4294967296,
        |    vec_id
        |  LIMIT 256),
        |el AS (SELECT vec_id AS vid,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(CAST(CAST(unnest(embedding) AS DOUBLE)
        |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x
        |  FROM embeddings),
        |n2 AS (SELECT vid, CAST(SUM(x * x) AS BIGINT) AS nn
        |  FROM el GROUP BY 1),
        |dots AS (SELECT a.vid AS vid, b.vid AS ovid,
        |    CAST(SUM(a.x * b.x) AS BIGINT) AS dotl
        |  FROM el a JOIN el b ON a.i = b.i AND a.vid <> b.vid
        |  WHERE a.vid IN (SELECT vec_id FROM anch)
        |  GROUP BY 1, 2),
        |d2 AS (SELECT dots.vid, ovid,
        |    CAST(na.nn + nb.nn - 2 * dotl AS BIGINT) AS d2q
        |  FROM dots JOIN n2 na ON na.vid = dots.vid
        |  JOIN n2 nb ON nb.vid = dots.ovid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vid
        |    ORDER BY d2q, ovid) AS rn FROM d2),
        |nn2 AS (SELECT vid,
        |    CAST(MIN(CASE WHEN rn = 1 THEN d2q END) AS BIGINT) AS d1,
        |    CAST(MIN(CASE WHEN rn = 2 THEN d2q END) AS BIGINT) AS d2
        |  FROM r WHERE rn <= 2 GROUP BY 1),
        |f AS (SELECT vid, d1, d2,
        |    GREATEST(0, length(bin(d2)) - 15) AS s FROM nn2
        |  WHERE d1 > 0 AND d2 IS NOT NULL),
        |g AS (SELECT vid, (d2 >> s) AS bq,
        |    GREATEST(d1 >> s, 1) AS aq FROM f),
        |q AS (SELECT CAST(length(bin(
        |    (CAST(bq AS BIGINT) * bq * bq * bq)
        |    // (CAST(aq AS BIGINT) * aq * aq * aq))) - 1 AS BIGINT)
        |    AS qlb FROM g),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
        |    CAST(SUM(qlb) AS BIGINT) AS sum_qlb FROM q)
        |SELECT n_points, sum_qlb,
        |  CASE WHEN sum_qlb > 0 THEN 8.0e0
        |    * CAST(n_points AS DOUBLE)
        |    / (0.6931471805599453e0 * CAST(sum_qlb AS DOUBLE))
        |  END AS id_estimate
        |FROM a""".stripMargin,

    // Lines-per-order histogram with ppb shares and CCDF cumulative.
    "q_basket_sizes" ->
      """WITH per AS (SELECT l_orderkey AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n_lines FROM lineitem
        |  GROUP BY 1),
        |hist AS (SELECT n_lines, CAST(COUNT(*) AS BIGINT)
        |    AS n_baskets FROM per GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_baskets) AS BIGINT) AS n_total
        |  FROM hist)
        |SELECT n_lines, n_baskets,
        |  CAST((n_baskets * 1000000000) // n_total AS BIGINT)
        |    AS basket_share_ppb,
        |  CAST(SUM(n_baskets) OVER (ORDER BY n_lines) AS BIGINT)
        |    AS cum_baskets
        |FROM hist CROSS JOIN tot""".stripMargin,

    // kNN-graph hubness: the full-corpus top-5 CTEs, in-degree
    // rollup, antihubs kept at 0, top-20 by (in_degree desc, vid).
    "q_sim_hubness_anchored" ->
      """WITH anch AS (SELECT vec_id FROM embeddings
        |  ORDER BY ((vec_id % 2147483647) * 2654435761) % 4294967296,
        |    vec_id
        |  LIMIT 256),
        |el AS (SELECT vec_id, generate_subscripts(embedding, 1)
        |      AS i,
        |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6))
        |      AS x FROM embeddings),
        |norms AS (SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE))
        |      AS nrm
        |  FROM el GROUP BY 1),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(SUM(CAST(q.x * c.x AS DECIMAL(25,12))) AS DOUBLE)
        |      AS dot
        |  FROM el q JOIN el c ON q.i = c.i
        |  WHERE q.vec_id <> c.vec_id
        |    AND q.vec_id IN (SELECT vec_id FROM anch) GROUP BY 1, 2),
        |sc AS (SELECT query_id, corpus_id,
        |    dot / (nq.nrm * nc.nrm) AS score
        |  FROM s JOIN norms nq ON nq.vec_id = query_id
        |         JOIN norms nc ON nc.vec_id = corpus_id),
        |tk AS (SELECT query_id, corpus_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, corpus_id) AS BIGINT) AS rank
        |  FROM sc QUALIFY rank <= 5),
        |indeg AS (SELECT corpus_id AS vid,
        |    CAST(COUNT(*) AS BIGINT) AS in_degree FROM tk GROUP BY 1)
        |SELECT e.vec_id AS vid,
        |  CAST(COALESCE(in_degree, 0) AS BIGINT) AS in_degree
        |FROM embeddings e LEFT JOIN indeg ON e.vec_id = indeg.vid
        |ORDER BY in_degree DESC, vid
        |LIMIT 20""".stripMargin
  )
}
