package graft.oracle

import graft.ops.{Dedup, Profile, Sampling, TextOps, VectorOps}

/** DuckDB oracle SQL for every hash-checkable north-star query, GENERATED
  * from the same Scala constants the Spark operators use (seeds, band
  * geometry, stopword/marker lists, thresholds) so the two sides cannot
  * drift. The hash bridge is `md5_number_lower` — see
  * graft.functions.PortableHash for the bit-level contract.
  */
object DuckDbOracles {

  /** DuckDB twin of PortableHash.h31(seed, expr). */
  private def h(seed: String, expr: String): String =
    s"CAST((md5_number_lower('$seed:' || ($expr)) & 2147483647) AS BIGINT)"

  private def inList(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString(", ")

  /** Shared CTEs: tokenized docs and exploded distinct 3-token shingles. */
  private val tokCte =
    "tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)"
  private val shCte =
    """sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
      |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      |  FROM tok WHERE len(t) >= 3)""".stripMargin

  val textTokenStats: String =
    s"""WITH $tokCte
       |SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
       |  round(CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) AS ttr
       |FROM tok""".stripMargin

  val textQuality: String = {
    val stop = inList(TextOps.stopwords)
    s"""WITH $tokCte
       |SELECT doc_id, len(t) AS n_tokens,
       |  round((CAST(length(text) AS DOUBLE) - CAST(len(t) AS DOUBLE) + 1.0) / CAST(len(t) AS DOUBLE), 6) AS mean_token_len,
       |  round(CAST(len(list_filter(t, x -> x IN ($stop))) AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) AS stopword_ratio,
       |  round(0.5 * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE))
       |      + 0.3 * (1.0 - CAST(len(list_filter(t, x -> x IN ($stop))) AS DOUBLE) / CAST(len(t) AS DOUBLE))
       |      + 0.2 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0), 6) AS quality_score
       |FROM tok""".stripMargin
  }

  /** Twin of TextOps.heapsLawFit: same per-source (N, V) points, same
    * log-log closed-form OLS shape and degenerate guards.
    */
  val heapsLawFit: String =
    s"""WITH inst AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
       |per AS (SELECT source, count(*) AS n_tok, count(DISTINCT tok) AS v_tok
       |  FROM inst GROUP BY 1),
       |pts AS (SELECT ln(CAST(n_tok AS DOUBLE)) AS x, ln(CAST(v_tok AS DOUBLE)) AS y FROM per),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM pts)
       |SELECT n AS n_sources,
       |  round(CASE WHEN n * sxx - sx * sx > 0
       |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) ELSE 0.0 END, 6) AS beta,
       |  round(CASE WHEN n * sxx - sx * sx > 0
       |    THEN exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)
       |    ELSE 0.0 END, 6) AS k_coeff,
       |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       |    THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
       |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) ELSE 0.0 END, 6) AS r2
       |FROM s""".stripMargin

  /** Shared BM25 CTE chain (postings, df, doc lengths, corpus stats, query
    * terms, per-(q,doc) score agg) — used verbatim by bm25TopK and
    * rrfFusion so the two cannot drift.
    */
  private def bm25Ctes: String = {
    val terms = TextOps.Bm25Queries.flatMap(_._2).distinct
    val qtRows = TextOps.Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
    s"""inst AS (SELECT doc_id, unnest(t) AS tok FROM tok),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM inst
       |  WHERE tok IN (${inList(terms)}) GROUP BY 1, 2),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tok),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
       |qt AS (SELECT * FROM (VALUES $qtRows) AS v(q_id, qtok)),
       |sc AS (SELECT qt.q_id, tf.doc_id, ${TextOps.bm25TermSql} AS s
       |  FROM tf JOIN qt ON tf.tok = qt.qtok
       |  JOIN dft ON tf.tok = dft.tok
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
       |agg AS (SELECT q_id, doc_id, round(sum(s), 6) AS score FROM sc GROUP BY 1, 2)""".stripMargin
  }

  /** Twin of TextOps.bm25TopK — the scoring expression is the SAME string
    * (bm25TermSql), so only ln()'s ulp crosses the 6dp rounding.
    */
  def bm25TopK(k: Int = 10): String =
    s"""WITH $tokCte,
       |$bm25Ctes
       |SELECT q_id, rank, doc_id, score FROM (
       |  SELECT q_id, doc_id, score,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
       |  FROM agg) WHERE rank <= $k""".stripMargin

  /** Dirichlet-QL CTE chain on top of bm25Ctes (collection frequencies,
    * candidate pool, smoothed per-term scores, per-(q,doc) agg) — shared
    * by qlTopK and rrfFusion.
    */
  private def qlCtes(mu: Double): String =
    s"""cf AS (SELECT tok AS qtok, count(*) AS cf FROM inst
       |  WHERE tok IN (SELECT qtok FROM qt) GROUP BY 1),
       |cand AS (SELECT DISTINCT qt.q_id, tf.doc_id FROM tf JOIN qt ON tf.tok = qt.qtok),
       |qsc AS (SELECT cd.q_id, cd.doc_id,
       |    ln((CAST(coalesce(tf.tf, 0) AS DOUBLE) + $mu * (CAST(cf.cf AS DOUBLE) / CAST(st.sum_dl AS DOUBLE)))
       |      / (CAST(dl.dl AS DOUBLE) + $mu)) AS s
       |  FROM cand cd JOIN qt ON cd.q_id = qt.q_id
       |  LEFT JOIN tf ON tf.doc_id = cd.doc_id AND tf.tok = qt.qtok
       |  JOIN cf ON cf.qtok = qt.qtok
       |  JOIN dl ON dl.doc_id = cd.doc_id CROSS JOIN st),
       |qagg AS (SELECT q_id, doc_id, round(sum(s), 6) AS score FROM qsc GROUP BY 1, 2)""".stripMargin

  /** Twin of TextOps.qlTopK: the shared posting chain plus the Dirichlet
    * chain, ranked per query.
    */
  def qlTopK(k: Int = TextOps.RrfPoolK, mu: Double = TextOps.QlMu): String =
    s"""WITH $tokCte,
       |$bm25Ctes,
       |${qlCtes(mu)}
       |SELECT q_id, rank, doc_id, score FROM (
       |  SELECT q_id, doc_id, score,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
       |  FROM qagg) WHERE rank <= $k""".stripMargin

  /** Twin of TextOps.rrfFusion: the shared BM25 chain plus the Dirichlet
    * query-likelihood chain (tf=0 terms keep their smoothing-only mass via
    * the LEFT join), both ranked to poolK, fused by 1/(C+rank) over the
    * full-outer union — ranks are integers so each reciprocal is an
    * exactly rounded IEEE division on both engines.
    */
  def rrfFusion(
      poolK: Int = TextOps.RrfPoolK,
      k: Int = TextOps.RrfK,
      c: Int = TextOps.RrfC,
      mu: Double = TextOps.QlMu): String =
    s"""WITH $tokCte,
       |$bm25Ctes,
       |bml AS (SELECT q_id, doc_id, r FROM (
       |  SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS r
       |  FROM agg) WHERE r <= $poolK),
       |${qlCtes(mu)},
       |qll AS (SELECT q_id, doc_id, r FROM (
       |  SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS r
       |  FROM qagg) WHERE r <= $poolK),
       |f AS (SELECT coalesce(b.q_id, q.q_id) AS q_id, coalesce(b.doc_id, q.doc_id) AS doc_id,
       |    round(coalesce(1.0 / ($c + b.r), 0.0) + coalesce(1.0 / ($c + q.r), 0.0), 6) AS rrf
       |  FROM bml b FULL JOIN qll q ON b.q_id = q.q_id AND b.doc_id = q.doc_id)
       |SELECT q_id, rank, doc_id, rrf FROM (
       |  SELECT q_id, doc_id, rrf,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id ASC) AS INTEGER) AS rank
       |  FROM f) WHERE rank <= $k""".stripMargin

  /** Twin of TextOps.dsirResample — same hashed-bigram features, Laplace
    * log-ratio assembled per join row from integer counts, same 6dp
    * rounding points, same deterministic hash-Gumbel top-k (ORDER BY +
    * LIMIT, mirroring the Spark TakeOrdered).
    */
  def dsirResample(
      k: Int = TextOps.DsirK,
      buckets: Int = TextOps.DsirBuckets,
      targetLang: String = TextOps.DsirTargetLang): String = {
    val b = buckets
    val u = s"(CAST(${h(TextOps.DsirGumbelSeed, "CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5) / 1000000.0"
    s"""WITH tokl AS (SELECT doc_id, lang = '$targetLang' AS is_t,
       |    string_split(text, ' ') AS t FROM documents),
       |bg AS (SELECT doc_id, is_t, unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i+1])) AS bigram FROM tokl WHERE len(t) >= 2),
       |db AS (SELECT doc_id, is_t, ${h(TextOps.DsirSeed, "bigram")} % $b AS bucket,
       |    count(*) AS n FROM bg GROUP BY 1, 2, 3),
       |bs AS (SELECT bucket, sum(n) AS cr,
       |    sum(CASE WHEN is_t THEN n ELSE 0 END) AS ct FROM db GROUP BY 1),
       |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM bs),
       |lw AS (SELECT doc_id, round(sum(CAST(n AS DOUBLE) *
       |      (ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + $b.0))
       |     - ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + $b.0)))), 6) AS log_w
       |  FROM db JOIN bs USING (bucket) CROSS JOIN tot GROUP BY 1)
       |SELECT doc_id, log_w, round(log_w + -ln(-ln($u)), 6) AS gkey
       |FROM lw ORDER BY gkey DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** Twin of TextOps.charEntropy. The count list is sorted ascending and
    * left-folded (`list_reduce`) so the sequence of IEEE additions matches
    * Spark's `aggregate` fold exactly — `list_distinct` order differs
    * between engines and double summation is order-dependent.
    */
  val charEntropy: String = {
    def ent(l: String): String =
      s"""log2(CAST(len($l) AS DOUBLE)) - list_reduce(list_transform(
         |    list_sort(list_transform(list_distinct($l),
         |      c -> CAST(len(list_filter($l, x -> x = c)) AS DOUBLE))),
         |    c -> c * log2(c)), (a, b) -> a + b) / CAST(len($l) AS DOUBLE)""".stripMargin
    s"""WITH ch AS (SELECT doc_id, string_split(text, '') AS ch FROM documents),
       |base AS (SELECT doc_id, ch,
       |  list_transform(range(1, len(ch)), i -> ch[i] || ch[i+1]) AS bg FROM ch)
       |SELECT doc_id, len(ch) AS n_chars, len(list_distinct(ch)) AS n_uniq_chars,
       |  round(${ent("ch")}, 6) AS char_entropy,
       |  round(${ent("bg")}, 6) AS bigram_entropy,
       |  round(round(${ent("bg")}, 6) - round(${ent("ch")}, 6), 6) AS cond_entropy
       |FROM base""".stripMargin
  }

  /** Twin of TextOps.unigramLogprob: same two-integer-column ln(c/N) per
    * token instance, mean rounded 6dp, integer-exact rare fraction.
    */
  def unigramLogprob(rareMax: Long = TextOps.RareTokenMax): String =
    s"""WITH $tokCte,
       |inst AS (SELECT doc_id, unnest(t) AS tok FROM tok),
       |vc AS (SELECT tok, count(*) AS c FROM inst GROUP BY 1),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vc),
       |sc AS (SELECT i.doc_id, vc.c, tot.n FROM inst i
       |  JOIN vc ON i.tok = vc.tok CROSS JOIN tot)
       |SELECT doc_id, count(*) AS n_tokens,
       |  round(avg(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS mean_logprob,
       |  round(CAST(sum(CASE WHEN c < $rareMax THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS rare_frac
       |FROM sc GROUP BY 1""".stripMargin

  /** Twin of TextOps.bigramLogprob: same Jelinek-Mercer blend from integer
    * counts (λ rendered from the shared constant), same first-token
    * unigram-only case, mean rounded 6dp.
    */
  def bigramLogprob(lambda: Double = TextOps.BigramLambda): String =
    s"""WITH $tokCte,
       |inst AS (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok FROM tok),
       |wp AS (SELECT doc_id, pos, tok,
       |    lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM inst),
       |vc AS (SELECT tok, count(*) AS cu FROM inst GROUP BY 1),
       |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM vc),
       |bc AS (SELECT prev, tok, count(*) AS cb FROM wp WHERE prev IS NOT NULL GROUP BY 1, 2),
       |sc AS (SELECT wp.doc_id,
       |    CASE WHEN wp.prev IS NULL THEN CAST(vc.cu AS DOUBLE) / CAST(tot.n AS DOUBLE)
       |         ELSE $lambda * CAST(bc.cb AS DOUBLE) / CAST(cx.cp AS DOUBLE)
       |           + ${1.0 - lambda} * CAST(vc.cu AS DOUBLE) / CAST(tot.n AS DOUBLE) END AS p
       |  FROM wp
       |  JOIN vc ON wp.tok = vc.tok
       |  LEFT JOIN (SELECT tok AS prev, cu AS cp FROM vc) cx ON wp.prev = cx.prev
       |  LEFT JOIN bc ON wp.prev = bc.prev AND wp.tok = bc.tok
       |  CROSS JOIN tot)
       |SELECT doc_id, count(*) AS n_tokens,
       |  round(avg(ln(p)), 6) AS mean_logprob_bi
       |FROM sc GROUP BY 1""".stripMargin

  /** Twin of TimeSeries.saxSimilarPairs: same PAA/z-norm/SAX pipeline with
    * the same 6dp rounding points, same half-word banding, same exact
    * z-Euclidean verification — all parameters rendered from the shared
    * TimeSeries constants.
    */
  def saxSimilarPairs(
      start: String = graft.ops.TimeSeries.SaxStart,
      threshold: Double = graft.ops.TimeSeries.SaxDistThreshold): String =
    s"""WITH ${saxDistCtes(start)}
       |SELECT ua, ub, dist FROM dist WHERE dist <= $threshold""".stripMargin

  /** Twin of TimeSeries.saxSimilarTopK — the banded candidates under the
    * occupancy cap + exact verify, symmetric emission, per-user rank
    * capped at k.
    */
  def saxSimilarTopK(
      start: String = graft.ops.TimeSeries.SaxStart, k: Int = 5,
      cap: Int = graft.ops.TimeSeries.SaxBucketCap): String =
    s"""WITH ${saxDistCtes(start, Some(cap))},
       |sym2 AS (SELECT ua AS user_id, ub AS neighbor_id, dist FROM dist
       |  UNION ALL SELECT ub, ua, dist FROM dist),
       |ranked AS (SELECT user_id, neighbor_id, dist,
       |    CAST(row_number() OVER (PARTITION BY user_id
       |      ORDER BY dist ASC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM sym2)
       |SELECT user_id, rank, neighbor_id, dist FROM ranked WHERE rank <= $k""".stripMargin

  /** Twin of TimeSeries.saxBandStats — the per-band saturation audit of
    * the SAX banding (mediaBandStats shape).
    */
  def saxBandStats(
      start: String = graft.ops.TimeSeries.SaxStart,
      cap: Int = graft.ops.TimeSeries.SaxBucketCap): String =
    s"""WITH ${saxWordCtes(start)},
       |occ AS (SELECT band, h, count(*) AS m FROM bands GROUP BY 1, 2)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(m) AS BIGINT) AS max_occupancy,
       |  CAST(sum(m * (m - 1) // 2) AS BIGINT) AS candidate_pairs,
       |  CAST(sum(CASE WHEN m > $cap THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_buckets_over_cap,
       |  CAST(sum(CASE WHEN m > $cap THEN m * (m - 1) // 2 ELSE 0 END) AS BIGINT)
       |    AS candidates_over_cap
       |FROM occ GROUP BY band""".stripMargin

  /** SAX word/banding/verify CTE chain through `dist` (ua < ub, no
    * threshold) — shared by the all-pairs and top-k twins. `cap` =
    * Some(n) restricts candidates to buckets of occupancy ≤ n (the
    * serving path); None is the all-pairs baseline.
    */
  private def saxDistCtes(start: String, cap: Option[Int] = None): String = {
    val candSrc = cap.fold("bands") { c =>
      s"""(SELECT bands.* FROM bands
         |    JOIN (SELECT band, h FROM (SELECT band, h, count(*) AS m
         |      FROM bands GROUP BY 1, 2) WHERE m <= $c) sm
         |    ON bands.band = sm.band AND bands.h = sm.h)""".stripMargin
    }
    s"""${saxWordCtes(start)},
       |cand AS (SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
       |  FROM $candSrc a JOIN $candSrc b
       |    ON a.band = b.band AND a.h = b.h AND a.user_id < b.user_id),
       |dist AS (SELECT ua, ub, round(sqrt(sum((za.zv - zb.zv)^2)), 6) AS dist
       |  FROM cand JOIN z za ON ua = za.user_id
       |    JOIN z zb ON ub = zb.user_id AND za.seg = zb.seg
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** The SAX PAA/z-norm/word/banding chain through `z` and `bands` —
    * shared by the pair/top-k twins and the saturation audit.
    */
  private def saxWordCtes(start: String): String = {
    val ts = graft.ops.TimeSeries
    s"""ev AS (SELECT user_id,
       |    CAST(date_diff('day', TIMESTAMP '$start', ts) AS INT) AS d, value
       |  FROM events),
       |seg AS (SELECT user_id, d // ${ts.SaxSegWidth} AS seg,
       |    round(sum(value) / ${ts.SaxSegWidth}.0, 6) AS segv
       |  FROM ev WHERE d >= 0 AND d < ${ts.SaxDays} GROUP BY 1, 2),
       |spine AS (SELECT DISTINCT user_id FROM seg),
       |grid AS (SELECT user_id, unnest(range(0, ${ts.SaxSegCount})) AS seg FROM spine),
       |full_seg AS (SELECT g.user_id, g.seg, coalesce(s.segv, 0.0) AS segv
       |  FROM grid g LEFT JOIN seg s ON g.user_id = s.user_id AND g.seg = s.seg),
       |stats AS (SELECT user_id, round(avg(segv), 6) AS mu,
       |    round(stddev_samp(segv), 6) AS sd FROM full_seg GROUP BY 1),
       |z AS MATERIALIZED (SELECT f.user_id, f.seg,
       |    CASE WHEN sd > 0 THEN round((segv - mu) / sd, 6) ELSE 0.0 END AS zv
       |  FROM full_seg f JOIN stats USING (user_id)),
       |sym AS (SELECT user_id, seg,
       |    CASE WHEN zv < -${ts.SaxBreak} THEN 'a' WHEN zv < 0 THEN 'b'
       |         WHEN zv < ${ts.SaxBreak} THEN 'c' ELSE 'd' END AS s
       |  FROM z),
       |word AS (SELECT user_id, string_agg(s, '' ORDER BY seg) AS w FROM sym GROUP BY 1),
       |bands AS MATERIALIZED (
       |  SELECT user_id, 0 AS band, substring(w, 1, ${ts.SaxBandLen}) AS h FROM word
       |  UNION ALL SELECT user_id, 1, substring(w, ${ts.SaxBandLen + 1}, ${ts.SaxBandLen}) FROM word)"""
      .stripMargin
  }

  /** Twin of Profile.profile over the events table: one UNION ALL branch
    * per column, min/max compared in the column type and cast to VARCHAR
    * last — rendered from the same column list.
    */
  def profileEvents(cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
         |FROM events""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Twin of Profile.contractReport — rendered from the SAME predicate
    * strings (ContractRules), so the audited contract cannot drift.
    */
  def contractReport: String = {
    val aggs = Profile.ContractRules
      .map { case (n, p) => s"""sum(CASE WHEN $p THEN 1 ELSE 0 END) AS "v__$n"""" }
      .mkString(",\n  ")
    val arms = Profile.ContractRules.map { case (n, _) =>
      s"""SELECT '$n' AS rule, CAST("v__$n" AS BIGINT) AS n_violations, n_checked,
         |  CAST((1000000 * "v__$n") // n_checked AS BIGINT) AS violation_ppm FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (SELECT $aggs,
       |  count(*) AS n_checked FROM events)
       |$arms""".stripMargin
  }

  /** Twin of the winsorize_values query: cutoffs from the same direct
    * histogram as quantileRollup (p01/p99 ppm), clip, exact decimal sum.
    */
  def winsorizeValues(granularity: Int = graft.ops.Sketches.QuantileGranularity): String =
    s"""WITH r AS (SELECT event_type, round(value, $granularity) AS vb FROM events),
       |hist AS (SELECT event_type, vb, count(*) AS c FROM r GROUP BY 1, 2),
       |cum AS (SELECT event_type, vb,
       |    sum(c) OVER (PARTITION BY event_type ORDER BY vb) AS cum,
       |    sum(c) OVER (PARTITION BY event_type) AS n
       |  FROM hist),
       |cuts AS (SELECT event_type,
       |    min(CASE WHEN cum * 1000000 >= n * 10000 THEN vb END) AS p01,
       |    min(CASE WHEN cum * 1000000 >= n * 990000 THEN vb END) AS p99
       |  FROM cum GROUP BY 1)
       |SELECT e.event_type, count(*) AS n,
       |  CAST(sum(CASE WHEN value < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       |  CAST(sum(CASE WHEN value > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       |  CAST(sum(CAST(greatest(least(value, p99), p01) AS DECIMAL(18,2))) AS DOUBLE)
       |    AS sum_winsorized
       |FROM events e JOIN cuts USING (event_type)
       |GROUP BY 1""".stripMargin

  /** Twin of Sketches.quantileRollup ∘ quantilePartials, computed DIRECTLY
    * from raw events — the partials-merge path must be indistinguishable
    * from the direct histogram (addition is associative), with the same
    * granularity rounding and integer type-1 cutoffs rendered from the
    * shared constants.
    */
  def quantileRollup(
      granularity: Int = graft.ops.Sketches.QuantileGranularity,
      ps: Seq[(String, Long)] = graft.ops.Sketches.QuantilesPpm): String = {
    val qs = ps.map { case (name, ppm) =>
      s"min(CASE WHEN cum * 1000000 >= n * $ppm THEN vb END) AS $name"
    }.mkString(", ")
    s"""WITH r AS (SELECT event_type, round(value, $granularity) AS vb FROM events),
       |hist AS (SELECT event_type, vb, count(*) AS c FROM r GROUP BY 1, 2),
       |cum AS (SELECT event_type, vb,
       |    sum(c) OVER (PARTITION BY event_type ORDER BY vb) AS cum,
       |    sum(c) OVER (PARTITION BY event_type) AS n
       |  FROM hist)
       |SELECT event_type, CAST(max(n) AS BIGINT) AS n, $qs
       |FROM cum GROUP BY 1""".stripMargin
  }

  /** Twin of TimeSeries.ksDrift over events/value at the psi split. */
  def ksDrift(splitTs: String = graft.ops.TimeSeries.PsiSplitTs): String =
    s"""WITH sided AS (SELECT event_type, value AS v,
       |    ts < CAST('$splitTs' AS TIMESTAMP) AS is_ref FROM events),
       |counts AS (SELECT event_type, v,
       |    sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
       |    sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS cc
       |  FROM sided GROUP BY 1, 2),
       |cum AS (SELECT event_type, v,
       |    sum(cr) OVER (PARTITION BY event_type ORDER BY v) AS r,
       |    sum(cc) OVER (PARTITION BY event_type ORDER BY v) AS c,
       |    sum(cr) OVER (PARTITION BY event_type) AS nr,
       |    sum(cc) OVER (PARTITION BY event_type) AS nc
       |  FROM counts),
       |agg AS (SELECT event_type, CAST(max(nr) AS BIGINT) AS n_ref,
       |    CAST(max(nc) AS BIGINT) AS n_cur,
       |    round(max(abs(CAST(r AS DOUBLE) / nr - CAST(c AS DOUBLE) / nc)), 6) AS ks_d
       |  FROM cum WHERE nr > 0 AND nc > 0 GROUP BY 1)
       |SELECT event_type, n_ref, n_cur, ks_d,
       |  ks_d > round(1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE)
       |    / CAST(n_ref * n_cur AS DOUBLE)), 6) AS drift_05
       |FROM agg""".stripMargin

  /** Gap-filled hourly grid CTEs shared by hourlyAcf and hourlyTrend.
    * `//` keeps the hour bucket in integer floor division (DuckDB `/` is
    * float division; CAST would round-to-nearest).
    */
  private val hourlyFilledCtes: String =
    s"""hc AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hc GROUP BY 1),
       |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM bounds),
       |filled AS (SELECT g.event_type, g.h, CAST(coalesce(hc.c, 0) AS BIGINT) AS c
       |  FROM grid g LEFT JOIN hc ON g.event_type = hc.event_type AND g.h = hc.h)"""
      .stripMargin

  /** Twin of TimeSeries.ewmaHourly: the same gap-filled grid, the same
    * integer power-of-two weights (largest first) and head-normalization
    * denominator — one window block, one final IEEE division.
    */
  def ewmaHourly(w: Int = graft.ops.TimeSeries.EwmaWindow): String = {
    // DECIMAL(38,0) numerator terms mirror the operator's overflow guard
    // (a count near 2³² times the 2³¹ head weight wraps a BIGINT)
    val num = (0 until w)
      .map(j =>
        s"CAST(coalesce(lag(c, $j) OVER win, 0) AS DECIMAL(38,0)) * ${1L << (w - 1 - j)}")
      .mkString(" + ")
    s"""WITH $hourlyFilledCtes,
       |l AS (SELECT event_type, h, c,
       |    least(row_number() OVER win, $w) AS m,
       |    $num AS num
       |  FROM filled WINDOW win AS (PARTITION BY event_type ORDER BY h))
       |SELECT event_type, h, c,
       |  round(CAST(num AS DOUBLE) /
       |    CAST(${1L << w} - (CAST(1 AS BIGINT) << CAST($w - m AS INT)) AS DOUBLE), 6)
       |    AS ewma
       |FROM l""".stripMargin
  }

  /** Twin of TimeSeries.seasonalDow: same gap-filled daily grid, same
    * exact-integer 7·c − sum7 detrending, one division per (type, dow).
    */
  val seasonalDow: String =
    s"""WITH dcte AS (SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |db AS (SELECT event_type, min(d) AS d0, max(d) AS d1 FROM dcte GROUP BY 1),
       |dgrid AS (SELECT event_type, unnest(generate_series(d0, d1)) AS d FROM db),
       |dg AS (SELECT g.event_type, g.d, CAST(coalesce(dcte.c, 0) AS BIGINT) AS c
       |  FROM dgrid g LEFT JOIN dcte ON g.event_type = dcte.event_type AND g.d = dcte.d),
       |t AS (SELECT event_type, d, c,
       |    CAST(sum(c) OVER win AS BIGINT) AS sum7,
       |    count(*) OVER win AS n7
       |  FROM dg WINDOW win AS (PARTITION BY event_type ORDER BY d
       |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
       |SELECT event_type, d % 7 AS dow, count(*) AS n_days,
       |  round(CAST(sum(c * 7 - sum7) AS DOUBLE) / CAST(count(*) * 7 AS DOUBLE), 6)
       |    AS seasonal
       |FROM t WHERE n7 = 7 GROUP BY 1, 2""".stripMargin

  /** Twin of TimeSeries.theilSenDaily: same gap-filled daily grid, same
    * exact-IEEE pairwise slope ordering (no pre-rounding needed), same
    * integer lower-median pick.
    */
  val theilSenDaily: String =
    s"""WITH dcte AS (SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |db AS (SELECT event_type, min(d) AS d0, max(d) AS d1 FROM dcte GROUP BY 1),
       |dgrid AS (SELECT event_type, unnest(generate_series(d0, d1)) AS d FROM db),
       |dg AS (SELECT g.event_type, g.d, CAST(coalesce(dcte.c, 0) AS BIGINT) AS c
       |  FROM dgrid g LEFT JOIN dcte ON g.event_type = dcte.event_type AND g.d = dcte.d),
       |nd AS (SELECT event_type, count(*) AS n_days FROM dg GROUP BY 1),
       |p AS (SELECT a.event_type, a.d AS d1, b.d AS d2,
       |    CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS s
       |  FROM dg a JOIN dg b ON a.event_type = b.event_type AND a.d < b.d),
       |r AS (SELECT event_type, s,
       |    row_number() OVER (PARTITION BY event_type ORDER BY s, d1, d2) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS np FROM p)
       |SELECT r.event_type, r.np AS n_pairs, round(r.s, 6) AS ts_slope_per_day, nd.n_days
       |FROM r JOIN nd ON r.event_type = nd.event_type WHERE rn = (np + 1) // 2""".stripMargin

  /** Twin of TimeSeries.hourlyTrend: same grid, closed-form OLS from exact
    * integer sums (r² numerator squared in double on both sides).
    */
  val hourlyTrend: String =
    s"""WITH $hourlyFilledCtes,
       |tt AS (SELECT event_type, c,
       |    h - min(h) OVER (PARTITION BY event_type) AS t FROM filled),
       |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum(t) AS st,
       |    sum(c) AS sy, sum(t * c) AS sty, sum(t * t) AS stt, sum(c * c) AS syy
       |  FROM tt GROUP BY 1)
       |SELECT event_type, n,
       |  round(CASE WHEN n * stt - st * st > 0
       |    THEN CAST(n * sty - st * sy AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE)
       |    ELSE 0.0 END, 6) AS slope_per_hour,
       |  round(CASE WHEN n * stt - st * st > 0
       |    THEN CAST(sy * stt - st * sty AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE)
       |    ELSE 0.0 END, 6) AS intercept,
       |  round(CASE WHEN n * stt - st * st > 0 AND n * syy - sy * sy > 0
       |    THEN CAST(n * sty - st * sy AS DOUBLE) * CAST(n * sty - st * sy AS DOUBLE)
       |      / (CAST(n * stt - st * st AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
       |    ELSE 0.0 END, 6) AS r2
       |FROM s""".stripMargin

  /** Twin of TimeSeries.hourlyAcf: gap-filled hourly grid, one lag window
    * pass, exact integer power sums, the Pearson division mirrored token
    * for token.
    */
  def hourlyAcf(lags: Seq[Int] = graft.ops.TimeSeries.AcfLags): String = {
    val xCols = lags.map(l => s"lag(c, $l) OVER w AS x$l").mkString(", ")
    val aCtes = lags.map { l =>
      s"""a$l AS (SELECT event_type, $l AS lag, count(x$l) AS n, sum(x$l) AS sx,
         |  sum(CASE WHEN x$l IS NOT NULL THEN y END) AS sy, sum(x$l * y) AS sxy,
         |  sum(x$l * x$l) AS sxx,
         |  sum(CASE WHEN x$l IS NOT NULL THEN y * y END) AS syy
         |  FROM lagged GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val union = lags.map(l => s"SELECT * FROM a$l").mkString(" UNION ALL ")
    s"""WITH $hourlyFilledCtes,
       |lagged AS (SELECT event_type, c AS y, $xCols FROM filled
       |  WINDOW w AS (PARTITION BY event_type ORDER BY h)),
       |$aCtes,
       |u AS ($union)
       |SELECT event_type, lag, CAST(n AS BIGINT) AS n,
       |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
       |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       |    ELSE 0.0 END, 6) AS acf
       |FROM u""".stripMargin
  }

  /** Twin of Sketches.momentPartials + momentsRollup, computed DIRECT from
    * raw values — partials + exact-decimal merge == direct is the
    * contract under test. Derived doubles mirror the Spark expression
    * shapes token for token (left-assoc products, m2·√m2 for m2^1.5).
    */
  val momentsRollup: String = {
    val v = "CAST(value AS DECIMAL(10,2))"
    s"""WITH p AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    sum($v) AS s1, sum($v * $v) AS s2, sum($v * $v * $v) AS s3
       |  FROM events GROUP BY 1),
       |d AS (SELECT event_type, n, CAST(n AS DOUBLE) AS nd, s1,
       |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
       |    CAST(s3 AS DOUBLE) AS s3d
       |  FROM p)
       |SELECT event_type, n, CAST(CAST(s1 AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
       |  round(s1d / nd, 6) AS mean_v,
       |  round((s2d - s1d * s1d / nd) / (nd - 1.0), 6) AS var_samp,
       |  round(CASE WHEN s2d / nd - (s1d / nd) * (s1d / nd) > 0
       |    THEN (s3d / nd - 3.0 * (s1d / nd) * (s2d / nd)
       |          + 2.0 * (s1d / nd) * (s1d / nd) * (s1d / nd))
       |      / ((s2d / nd - (s1d / nd) * (s1d / nd))
       |         * sqrt(s2d / nd - (s1d / nd) * (s1d / nd)))
       |    ELSE 0.0 END, 6) AS skew_pop
       |FROM d""".stripMargin
  }

  /** Twin of Layout.zorderEvents: the bit interleave unrolled into SQL add
    * terms; pmod replicated as ((a % m) + m) % m (DuckDB % keeps sign).
    */
  val zorderEvents: String = {
    val m = 1L << graft.ops.Layout.ZBits
    val terms = (0 until graft.ops.Layout.ZBits).map { i =>
      s"((zx >> $i) & 1) * ${1L << (2 * i)} + ((zy >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("\n    + ")
    s"""WITH z AS (SELECT event_id,
       |    ((user_id % $m) + $m) % $m AS zx,
       |    ((CAST(floor(value) AS BIGINT) % $m) + $m) % $m AS zy
       |  FROM events)
       |SELECT event_id, zx, zy,
       |    $terms AS zval
       |FROM z""".stripMargin
  }

  /** Twin of TextOps.qualityQuantileFilter: same histogram → cumulative →
    * cross-multiplied integer cutoff algorithm, so the threshold matches by
    * construction rather than by matching two engines' quantile
    * interpolation formulas.
    */
  def qualityQuantileFilter(pPpm: Long = TextOps.QualityQuantilePpm): String = {
    val stop = inList(TextOps.stopwords)
    s"""WITH tokl AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |q AS (SELECT doc_id, lang,
       |  round(0.5 * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE))
       |      + 0.3 * (1.0 - CAST(len(list_filter(t, x -> x IN ($stop))) AS DOUBLE) / CAST(len(t) AS DOUBLE))
       |      + 0.2 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0), 6) AS quality_score
       |  FROM tokl),
       |hist AS (SELECT lang, quality_score, count(*) AS c FROM q GROUP BY 1, 2),
       |cum AS (SELECT lang, quality_score,
       |    sum(c) OVER (PARTITION BY lang ORDER BY quality_score) AS cum,
       |    sum(c) OVER (PARTITION BY lang) AS n
       |  FROM hist),
       |thr AS (SELECT lang, min(quality_score) AS lang_thr FROM cum
       |  WHERE cum * 1000000 >= n * $pPpm GROUP BY 1)
       |SELECT q.doc_id, q.lang, q.quality_score, thr.lang_thr
       |FROM q JOIN thr ON q.lang = thr.lang WHERE q.quality_score > thr.lang_thr""".stripMargin
  }

  val textLangId: String = {
    val langs = TextOps.langMarkers.map(_._1)
    val scoreSelects = TextOps.langMarkers.map { case (lang, ms) =>
      s"len(list_filter(t, x -> x IN (${inList(ms)}))) AS s_$lang"
    }.mkString(",\n  ")
    val whens = langs.map { lang =>
      val conds = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }.mkString("\n  ")
    s"""WITH $tokCte,
       |scored AS (SELECT doc_id, $scoreSelects FROM tok)
       |SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
       |  CASE $whens ELSE '${langs.last}' END AS lang_pred
       |FROM scored""".stripMargin
  }

  /** Twin of TextOps.subwordStats — the regex constant is the same Scala
    * value; both engines' engines (Java regex / RE2) agree on this
    * lookahead-free subset.
    */
  val textSubwordStats: String = {
    // DuckDB single-quoted strings take backslashes literally; only the
    // quote needs doubling
    val p = TextOps.bpePattern.replace("'", "''")
    s"""SELECT doc_id, len(regexp_extract_all(text, '$p')) AS n_subtokens,
       |  round(CAST(length(text) AS DOUBLE) / nullif(len(regexp_extract_all(text, '$p')), 0), 6) AS chars_per_token
       |FROM documents""".stripMargin
  }

  /** The unrolled BPE-training CTE chain — twin of TextOps.bpeTrainMerges.
    * `wf` = the word-frequency table (the one distributed aggregation);
    * `m0` = each word as a parenthesized symbol string `(a)(b)(c)` (the
    * form in which `replace` can apply a merge without crossing symbol
    * boundaries); iteration i counts every adjacent symbol pair (the two
    * shifted NON-OVERLAPPING extractions together cover even- and
    * odd-offset pairs, i.e. all of them), picks the argmax with the
    * (count DESC, pair ASC) tie-break, and applies it left-to-right via
    * `replace` — exactly the kernel's scan order. Ends with b1..bV (the
    * chosen merges) and m1..mV (the evolving word symbol strings).
    */
  private def bpeTrainCtes(v: Int): String = {
    val pairPat = """\([a-z]+\)\([a-z]+\)"""
    val headPat = """^\([a-z]+\)"""
    // every iteration CTE is MATERIALIZED: m$i is referenced twice (by
    // p${i+1} and m${i+1}); inlined, the reference tree doubles per
    // iteration and the 2^v expansion exhausts file handles on the base
    // scan before it exhausts memory
    val iters = (1 to v).map { i =>
      s"""p$i AS MATERIALIZED (SELECT pr, sum(n) AS cnt FROM (
         |  SELECT unnest(list_concat(
         |    regexp_extract_all(s, '$pairPat'),
         |    regexp_extract_all(regexp_replace(s, '$headPat', ''), '$pairPat'))) AS pr, n
         |  FROM m${i - 1}) GROUP BY pr),
         |b$i AS MATERIALIZED (SELECT pr,
         |    regexp_extract(pr, '^\\(([a-z]+)\\)', 1) AS lhs,
         |    regexp_extract(pr, '\\(([a-z]+)\\)$$', 1) AS rhs
         |  FROM p$i ORDER BY cnt DESC, pr ASC LIMIT 1),
         |m$i AS MATERIALIZED (SELECT replace(s, b.pr, '(' || b.lhs || b.rhs || ')') AS s, n
         |  FROM m${i - 1}, b$i b)""".stripMargin
    }.mkString(",\n")
    s"""wf AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents) GROUP BY w
       |  ORDER BY n DESC, w ASC LIMIT ${TextOps.BpeMaxVocab}),
       |m0 AS MATERIALIZED (SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS s, n FROM wf),
       |$iters""".stripMargin
  }

  /** Twin of TextOps.bpeMerges — the learned merge table, step by step. */
  def textBpeMerges: String = {
    val v = TextOps.BpeMergeCount
    val union = (1 to v)
      .map(i => s"SELECT $i AS step, lhs, rhs FROM b$i").mkString(" UNION ALL ")
    s"""WITH ${bpeTrainCtes(v)}
       |$union""".stripMargin
  }

  /** Twin of TextOps.bpeTokenStats — the same training replay, then the
    * encode chain e1..eV applies each learned merge to every document
    * word; a word's token count is its surviving '(' count.
    */
  def textBpeTokens: String = {
    val v = TextOps.BpeMergeCount
    val encode = (1 to v).map { i =>
      s"""e$i AS MATERIALIZED (SELECT doc_id, replace(s, b.pr, '(' || b.lhs || b.rhs || ')') AS s
         |  FROM e${i - 1}, b$i b)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeTrainCtes(v)},
       |docw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       |e0 AS (SELECT doc_id, regexp_replace(w, '(.)', '(\\1)', 'g') AS s FROM docw),
       |$encode,
       |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(length(s) - length(replace(s, '(', ''))) AS BIGINT) AS n_tokens
       |  FROM e$v GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(c.n_words, 0) AS n_words,
       |  coalesce(c.n_tokens, 0) AS n_tokens,
       |  round(CAST(c.n_tokens AS DOUBLE) / nullif(c.n_words, 0), 6) AS tokens_per_word
       |FROM documents d LEFT JOIN cnt c ON d.doc_id = c.doc_id""".stripMargin
  }

  val textFingerprint: String =
    s"""WITH $tokCte, $shCte
       |SELECT DISTINCT doc_id, fp_hash FROM
       |  (SELECT doc_id, ${h("fp", "shingle")} AS fp_hash FROM sh)
       |WHERE fp_hash % 8 = 0""".stripMargin

  /** Twin of TextOps.normalizedDedup; 'g' flag = global replace (DuckDB
    * regexp_replace replaces only the first match by default, Spark all).
    */
  val dedupNormalized: String =
    """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_md5,
      |  min(doc_id) AS canonical_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Twin of TextOps.scrubPii — patterns rendered from the same constants. */
  val textScrubPii: String = {
    val scrubbed = TextOps.piiPatterns.foldLeft("text") { case (c, (pat, repl)) =>
      s"regexp_replace($c, '${pat.replace("'", "''")}', '$repl', 'g')"
    }
    s"""SELECT doc_id, $scrubbed AS text_scrubbed,
       |  ($scrubbed <> text) AS had_pii
       |FROM documents""".stripMargin
  }

  /** Planted-boilerplate docs CTE shared by the boilerplate-mining twins —
    * rendered from the same TextOps constants the Spark side plants with.
    */
  private def plantedDocsCte: String =
    s"""docs2 AS (SELECT doc_id, CASE WHEN doc_id % ${TextOps.PlantEvery} = 0
       |  THEN '${TextOps.BoilerplateText} ' || text ELSE text END AS text FROM documents)""".stripMargin

  /** Twin of TextOps.stripBoilerplate over withPlantedBoilerplate: same
    * fixed-width token segmentation (DuckDB subscripts are 1-based, hence
    * (pos-1)//w against Spark's 0-based floor(pos/w)), same portable
    * segment hash, same ≥ minDocs distinct-doc boilerplate rule, same
    * in-order reassembly (NULL text_clean when everything was stripped).
    */
  def stripBoilerplate(
      segTokens: Int = TextOps.SegTokens,
      minDocs: Int = TextOps.BoilerMinDocs): String =
    s"""WITH $plantedDocsCte,
       |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs2),
       |tokp AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM tok),
       |seg AS (SELECT doc_id, (pos - 1) // $segTokens AS seg_idx,
       |    string_agg(tok, ' ' ORDER BY pos) AS seg FROM tokp GROUP BY 1, 2),
       |segh AS (SELECT doc_id, seg_idx, seg, ${h("seg", "seg")} AS seg_h FROM seg),
       |boiler AS (SELECT seg_h FROM
       |    (SELECT seg_h, count(DISTINCT doc_id) AS nd FROM segh GROUP BY 1)
       |  WHERE nd >= $minDocs),
       |kept AS (SELECT * FROM segh WHERE seg_h NOT IN (SELECT seg_h FROM boiler)),
       |totals AS (SELECT doc_id, count(*) AS n_segments FROM segh GROUP BY 1),
       |rebuilt AS (SELECT doc_id, count(*) AS n_kept,
       |    string_agg(seg, ' ' ORDER BY seg_idx) AS text_clean FROM kept GROUP BY 1)
       |SELECT t.doc_id, t.n_segments,
       |  t.n_segments - COALESCE(r.n_kept, 0) AS n_removed, r.text_clean
       |FROM totals t LEFT JOIN rebuilt r USING (doc_id)""".stripMargin

  /** Twin of TextOps.chunkDocuments: same k·stride < n chunk-index rule
    * (count = (n−1)//stride + 1), same 1-based slice of width tokens, same
    * short final chunk.
    */
  def chunkDocuments(
      width: Int = TextOps.ChunkTokens,
      stride: Int = TextOps.ChunkStride): String =
    s"""WITH $tokCte,
       |ch AS (SELECT doc_id, t,
       |    CAST(unnest(range(0, (len(t) - 1) // $stride + 1)) AS INT) AS chunk_idx
       |  FROM tok)
       |SELECT doc_id, chunk_idx,
       |  CAST(least($width, len(t) - chunk_idx * $stride) AS INT) AS n_chunk_tokens,
       |  array_to_string(list_slice(t, chunk_idx * $stride + 1,
       |    least(chunk_idx * $stride + $width, len(t))), ' ') AS chunk_text
       |FROM ch""".stripMargin

  /** Twin of TextOps.dupSpanStats over withPlantedBoilerplate: same
    * positional spans (DuckDB 1-based subscripts vs Spark's 0-based pos —
    * coverage math uses position DIFFERENCES only, so the offset cancels),
    * same ≥2-distinct-docs dup rule, same interval-union token coverage.
    */
  def dupSpanStats(spanTokens: Int = TextOps.SpanTokens): String = {
    val spanExpr = (0 until spanTokens).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH $plantedDocsCte,
       |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs2),
       |sp AS (SELECT doc_id, i AS pos, ${h("ds", spanExpr)} AS span_h
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${spanTokens - 2})) AS i
       |        FROM tok WHERE len(t) >= $spanTokens)),
       |dup AS (SELECT span_h FROM
       |    (SELECT span_h, count(DISTINCT doc_id) AS nd FROM sp GROUP BY 1)
       |  WHERE nd >= 2),
       |dp AS (SELECT doc_id, pos FROM sp WHERE span_h IN (SELECT span_h FROM dup)),
       |cov AS (SELECT doc_id, least($spanTokens,
       |    coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos,
       |      $spanTokens)) AS cov FROM dp),
       |agg AS (SELECT doc_id, CAST(sum(cov) AS BIGINT) AS dup_tokens,
       |    count(*) AS n_dup_spans FROM cov GROUP BY 1),
       |tot AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |    CAST(greatest(len(t) - ${spanTokens - 1}, 0) AS BIGINT) AS n_spans FROM tok)
       |SELECT t.doc_id, t.n_tokens, t.n_spans,
       |  coalesce(a.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
       |  coalesce(a.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
       |  round(CAST(coalesce(a.dup_tokens, 0) AS DOUBLE)
       |    / CAST(t.n_tokens AS DOUBLE), 6) AS dup_token_frac
       |FROM tot t LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** Twin of TextOps.zipfFit: identical (count DESC, token-hash ASC)
    * head ranking via a window, identical closed-form OLS in ln space.
    */
  def zipfFit(n: Int = TextOps.ZipfTopN): String =
    s"""WITH cnt AS (SELECT tok, count(*) AS c FROM (
       |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY 1),
       |hd AS (SELECT rnk, c FROM (
       |  SELECT c, row_number() OVER (ORDER BY c DESC,
       |    ${h("zipf", "tok")} ASC) AS rnk FROM cnt) WHERE rnk <= $n),
       |p AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM hd),
       |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM p)
       |SELECT n AS n_terms,
       |  round(CASE WHEN n * sxx - sx * sx > 0
       |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) ELSE 0.0 END, 6) AS slope,
       |  round(CASE WHEN n * sxx - sx * sx > 0
       |    THEN (sy * sxx - sx * sxy) / (n * sxx - sx * sx) ELSE 0.0 END, 6) AS intercept,
       |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       |    THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
       |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) ELSE 0.0 END, 6) AS r2
       |FROM s""".stripMargin

  /** Twin of TextOps.stripDupSpans over withPlantedBoilerplate: same
    * fixed-width span hashes, keep-first (minimum doc_id canonical)
    * excision, ×spanTokens coverage expansion on dup spans only, and
    * in-order token reassembly ('' when everything was excised).
    */
  def stripDupSpans(spanTokens: Int = TextOps.SpanTokens): String = {
    val spanExpr = (0 until spanTokens).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH $plantedDocsCte,
       |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs2),
       |inst AS (SELECT doc_id, i AS pos, t[i] AS tk
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM tok)),
       |sp AS (SELECT doc_id, i AS pos, ${h("ds", spanExpr)} AS span_h
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${spanTokens - 2})) AS i
       |        FROM tok WHERE len(t) >= $spanTokens)),
       |canon AS (SELECT span_h, min(doc_id) AS canonical_id
       |  FROM (SELECT DISTINCT span_h, doc_id FROM sp) GROUP BY 1
       |  HAVING count(*) >= 2),
       |drp AS (SELECT DISTINCT doc_id, pos FROM (
       |  SELECT s.doc_id, unnest(range(s.pos, s.pos + $spanTokens)) AS pos
       |  FROM sp s JOIN canon c ON s.span_h = c.span_h AND s.doc_id > c.canonical_id)),
       |kept AS (SELECT doc_id, pos, tk FROM inst i
       |  WHERE NOT EXISTS (SELECT 1 FROM drp d
       |    WHERE d.doc_id = i.doc_id AND d.pos = i.pos)),
       |reb AS (SELECT doc_id, count(*) AS n_tokens_after,
       |    string_agg(tk, ' ' ORDER BY pos) AS text_clean
       |  FROM kept GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       |  coalesce(r.n_tokens_after, CAST(0 AS BIGINT)) AS n_tokens_after,
       |  coalesce(r.text_clean, '') AS text_clean
       |FROM tok t LEFT JOIN reb r USING (doc_id)""".stripMargin
  }

  /** Twin of Entity.resolvePairs over Entity.withPlantedDirty: same planted
    * single-character substitution at (c_custkey % 8) + 1 (both engines'
    * substring is 1-based), same (nationkey, exact-decimal-balance) block,
    * same levenshtein verification bound.
    */
  /** Planted-dirty customer CTE shared by the entity-resolution oracles
    * (carries both the DECIMAL blocking balance and the raw double for
    * the survivorship merge).
    */
  private def entityC2Cte(every: Int, idOffset: Long): String =
    s"""c2 AS (
       |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nk,
       |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal, c_acctbal AS abal FROM customer
       |  UNION ALL
       |  SELECT c_custkey + $idOffset,
       |    substring(c_name, 1, CAST(c_custkey % 8 AS INT)) || 'x' ||
       |      substring(c_name, CAST(c_custkey % 8 AS INT) + 2, 1000),
       |    c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)), c_acctbal
       |  FROM customer WHERE c_custkey % $every = 0)""".stripMargin

  /** Twin of SparkEntry's `takedown_batch_report`: per-request ×
    * per-artifact rows-scrubbed/rows-remaining for a BATCHED takedown
    * over freshly built serving artifacts. Every `rows_scrubbed` count is
    * an independent scalar subquery over the artifact's own inline
    * derivation (each with its private WITH chain, so the CTE namespaces
    * of the eight tiers can never collide), filtered to the request's
    * planted id predicate — the same semi-join count the Spark absence
    * audit takes BEFORE the sweep. `rows_remaining` is the constant 0 the
    * post-sweep audit must reproduce: a scrub bug on ANY of the eight
    * tiers breaks the hash here.
    */
  def takedownBatchReport(): String = {
    val f = graft.streaming.StreamingChunkDedup.ChunkIdFactor
    // mirror the Spark side's fixed corpus caps by rewriting every base-
    // table read inside the reused derivation SQL to a sliced subquery
    // (the reused strings reference the tables verbatim; every base read
    // in THIS query must be sliced, so the blanket rewrite is exact)
    def sliced(sql: String): String = sql
      .replace("FROM documents",
        s"FROM (SELECT * FROM documents WHERE doc_id < ${graft.streaming.TakedownSweep.ReportDocCap}) gd")
      .replace("FROM embeddings",
        s"FROM (SELECT * FROM embeddings WHERE vec_id < ${graft.streaming.TakedownSweep.ReportVecCap}) ge")
      .replace("FROM customer",
        s"FROM (SELECT * FROM customer WHERE c_custkey <= ${graft.streaming.TakedownSweep.ReportCustCap}) gc")
    def cnt(inner: String, pred: String): String =
      s"(SELECT CAST(count(*) AS BIGINT) FROM ($inner) zz WHERE $pred)"
    val chunkSigSql = {
      val src = s"SELECT doc_id * $f + chunk_idx AS doc_id, chunk_text AS text " +
        s"FROM (${chunkDocuments()}) c"
      s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t
         |  FROM ($src) zz2), $shCte, $sigCte
         |SELECT doc_id FROM sig""".stripMargin
    }
    val graphSql = s"WITH $embCte, ${graphCtesLabelMean(VectorOps.GraphDegree, VectorOps.GraphProbe)}"
    // one (artifact_table, count-subquery) list per request modality
    def docChecks(p: String): Seq[(String, String)] = Seq(
      "dedup_index.signatures" -> cnt(minhashSignatures, s"doc_id $p"),
      "dedup_index.pairs.a" -> cnt(minhashLshPairs, s"doc_a $p"),
      "dedup_index.pairs.b" -> cnt(minhashLshPairs, s"doc_b $p"),
      "text_index.postings" ->
        s"""(SELECT CAST(coalesce(sum(len(list_distinct(string_split(text, ' ')))), 0) AS BIGINT)
           | FROM documents WHERE doc_id $p)""".stripMargin,
      "text_index.doclens" ->
        s"(SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id $p)",
      "text_index.positions" ->
        s"""(SELECT CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT)
           | FROM documents WHERE doc_id $p)""".stripMargin,
      "chunk_index.signatures" -> cnt(chunkSigSql, s"doc_id // $f $p"))
    def vecChecks(p: String): Seq[(String, String)] = Seq(
      "ann_index.live" ->
        s"(SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id $p)",
      "spann_index.postings" -> cnt(
        s"WITH ${spannCtes(VectorOps.SpannEps, VectorOps.SpannMaxReplicas)} " +
          "SELECT vec_id FROM posted", s"vec_id $p"),
      "graph_ann.postings" -> cnt(s"$graphSql SELECT vec_id FROM nposted", s"vec_id $p"),
      "graph_ann.edges.src" -> cnt(s"$graphSql SELECT src FROM edges", s"src $p"),
      "graph_ann.edges.dst" -> cnt(s"$graphSql SELECT dst FROM edges", s"dst $p"))
    def mediaChecks(pred: String => String): Seq[(String, String)] = Seq(
      "media_index.phash" -> cnt(
        s"WITH $mediaPhashCtes SELECT DISTINCT media_id FROM phx", pred("media_id")),
      "media_index.pairs.a" -> cnt(mediaNearDupPairs(), pred("media_a")),
      "media_index.pairs.b" -> cnt(mediaNearDupPairs(), pred("media_b")))
    def custChecks(p: String): Seq[(String, String)] = Seq(
      "entity_index.records" -> cnt(
        s"WITH ${entityC2Cte(graft.ops.Entity.PlantEvery, 1000000L)} SELECT id FROM c2",
        s"id $p"),
      "entity_index.pairs.a" -> cnt(entityResolutionPairs(), s"id_a $p"),
      "entity_index.pairs.b" -> cnt(entityResolutionPairs(), s"id_b $p"))
    // request 0: docs % 100 = 7, vecs % 100 = 7
    // request 1: docs % 100 = 23, planted-source media (% 97 = 0, raw),
    //            customers % 100 = 0 (every one has a planted dirty twin)
    val rows =
      (docChecks("% 100 = 7") ++ vecChecks("% 100 = 7")).map(0 -> _) ++
        (docChecks("% 100 = 23") ++
          mediaChecks(c =>
            s"$c % 97 = 0 AND $c < ${graft.ops.Multimodal.PlantOffset}") ++
          custChecks("% 100 = 0")).map(1 -> _)
    sliced(rows.map { case (rid, (table, sub)) =>
      s"""SELECT CAST($rid AS INTEGER) AS request_id, '$table' AS artifact_table,
         |  $sub AS rows_scrubbed, CAST(0 AS BIGINT) AS rows_remaining""".stripMargin
    }.mkString("\nUNION ALL\n"))
  }

  def entityResolutionPairs(
      every: Int = graft.ops.Entity.PlantEvery,
      maxDist: Int = graft.ops.Entity.MaxEditDist,
      idOffset: Long = 1000000L): String =
    s"""WITH ${entityC2Cte(every, idOffset)}
       |SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.name, b.name) AS dist
       |FROM c2 a JOIN c2 b ON a.nk = b.nk AND a.bal = b.bal AND a.id < b.id
       |WHERE levenshtein(a.name, b.name) <= $maxDist""".stripMargin

  /** Twin of Entity.goldenRecords: the same blocked matches, exact CC
    * via the recursive reachability CTE (the dedupComponentsExact
    * pattern), min-id representative, keeper-name + max-balance merge,
    * singletons as their own entity.
    */
  def entityGoldenRecords(
      every: Int = graft.ops.Entity.PlantEvery,
      maxDist: Int = graft.ops.Entity.MaxEditDist,
      idOffset: Long = 1000000L): String =
    s"""WITH RECURSIVE ${entityC2Cte(every, idOffset)},
       |mp AS MATERIALIZED (SELECT a.id AS id_a, b.id AS id_b
       |  FROM c2 a JOIN c2 b ON a.nk = b.nk AND a.bal = b.bal AND a.id < b.id
       |  WHERE levenshtein(a.name, b.name) <= $maxDist),
       |medges AS (SELECT id_a AS src, id_b AS dst FROM mp
       |  UNION ALL SELECT id_b AS src, id_a AS dst FROM mp),
       |mnodes AS (SELECT DISTINCT src AS node FROM medges),
       |mreach(node, r) AS (
       |  SELECT node, node FROM mnodes
       |  UNION
       |  SELECT e.src, rch.r FROM medges e JOIN mreach rch ON e.dst = rch.node),
       |mcomp AS (SELECT node AS id, min(r) AS rep FROM mreach GROUP BY 1),
       |ent AS (SELECT coalesce(m.rep, c.id) AS entity_id, c.abal
       |  FROM c2 c LEFT JOIN mcomp m ON c.id = m.id),
       |agg AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
       |    round(max(abal), 2) AS max_acctbal
       |  FROM ent GROUP BY 1)
       |SELECT a.entity_id, a.n_members, c.name, a.max_acctbal
       |FROM agg a JOIN c2 c ON a.entity_id = c.id""".stripMargin

  /** Twin of TextOps.frequentBigrams over withPlantedBoilerplate. The
    * sketch has no SQL twin and needs none: the operator's contract is
    * exact — output = bigrams at/above the ppm threshold with exact counts
    * (MG guarantees candidate completeness above 1/(k+1)) — so the oracle
    * is the plain exact-count query.
    */
  def frequentBigrams(minPpm: Long = TextOps.FreqMinPpm): String =
    s"""WITH $plantedDocsCte,
       |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs2),
       |bg AS (SELECT unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i+1])) AS bigram FROM tok WHERE len(t) >= 2),
       |tot AS (SELECT count(*) AS n FROM bg),
       |vc AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1)
       |SELECT bigram, cnt, round(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac
       |FROM vc CROSS JOIN tot WHERE cnt * 1000000 >= n * $minPpm""".stripMargin

  /** Twin of TextOps.pmiCollocations over withPlantedBoilerplate: same
    * integer counts, same division-shaped probability ratios (no integer
    * cross-products), same (pmi DESC, v, w) boundary ordering.
    */
  def pmiCollocations(
      k: Int = TextOps.PmiK,
      minCount: Long = TextOps.PmiMinCount): String =
    s"""WITH $plantedDocsCte,
       |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs2),
       |inst AS (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok FROM tok),
       |wp AS (SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS tok1 FROM inst),
       |st AS (SELECT count(*) AS n, count(tok1) AS nb FROM wp),
       |cu AS (SELECT tok, count(*) AS cu FROM wp GROUP BY 1),
       |cb AS (SELECT tok, tok1, count(*) AS cb FROM wp WHERE tok1 IS NOT NULL
       |  GROUP BY 1, 2 HAVING count(*) >= $minCount)
       |SELECT cb.tok, cb.tok1, cb.cb,
       |  round(ln((CAST(cb.cb AS DOUBLE) / CAST(st.nb AS DOUBLE)) /
       |    ((CAST(cuv.cu AS DOUBLE) / CAST(st.n AS DOUBLE)) *
       |     (CAST(cuw.cu AS DOUBLE) / CAST(st.n AS DOUBLE)))), 6) AS pmi
       |FROM cb JOIN cu cuv ON cb.tok = cuv.tok
       |JOIN cu cuw ON cb.tok1 = cuw.tok CROSS JOIN st
       |ORDER BY pmi DESC, cb.tok ASC, cb.tok1 ASC LIMIT $k""".stripMargin

  /** Twin of TextOps.tfidfTopTerms: same smooth-IDF formula over exact
    * integer counts, same (tfidf DESC, token ASC) ranking.
    */
  def tfidfTopTerms(k: Int = TextOps.TfidfK): String =
    s"""WITH $tokCte,
       |inst AS (SELECT doc_id, unnest(t) AS tok FROM tok),
       |tf AS (SELECT doc_id, tok, count(*) AS cnt FROM inst GROUP BY 1, 2),
       |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM inst GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |sc AS (SELECT tf.doc_id, tf.tok,
       |    round(CAST(cnt AS DOUBLE) * (ln((1.0 + n) / (1.0 + df)) + 1.0), 6) AS tfidf
       |  FROM tf JOIN df USING (tok) CROSS JOIN n),
       |r AS (SELECT doc_id, tok, tfidf,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY tfidf DESC, tok ASC) AS INT) AS rank
       |  FROM sc)
       |SELECT doc_id, rank, tok, tfidf FROM r WHERE rank <= $k""".stripMargin

  /** Twin of TextOps.vocabCoverage — same (count desc, token asc) vocab
    * tie-break, OOV counts cast to BIGINT to match Spark's sum type.
    */
  def vocabCoverage(vocabSize: Int = TextOps.VocabSize): String =
    s"""WITH $tokCte,
       |inst AS (SELECT doc_id, unnest(t) AS tok FROM tok),
       |vc AS (SELECT tok, count(*) AS cnt FROM inst GROUP BY 1),
       |vocab AS (SELECT tok FROM vc ORDER BY cnt DESC, tok ASC LIMIT $vocabSize),
       |iv AS (SELECT i.doc_id, v.tok IS NOT NULL AS inv
       |  FROM inst i LEFT JOIN vocab v ON i.tok = v.tok)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN NOT inv THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  round(CAST(sum(CASE WHEN NOT inv THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS oov_frac
       |FROM iv GROUP BY 1""".stripMargin

  /** Twin of TextOps.packShards(nShards=8, tokenBudget=1000). */
  val packShards: String =
    s"""WITH base AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |    ${h("shard", "CAST(doc_id AS VARCHAR)")} % 8 AS shard
       |  FROM documents),
       |c AS (SELECT doc_id, shard, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
       |  FROM base)
       |SELECT doc_id, shard, CAST(n_tokens AS INT) AS n_tokens,
       |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 1000) AS BIGINT) AS bin
       |FROM c""".stripMargin

  /** Twin of TextOps.packEfficiencyReport(nShards=8, tokenBudget=1000):
    * same prefix sums, integer split test, per-shard occupancy rollup with
    * n_bins = ceil(total_tokens / budget) by exact integer division —
    * over any docs relation (`source`).
    */
  def packEfficiencyReportFrom(source: String): String =
    s"""WITH base AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |    ${h("shard", "CAST(doc_id AS VARCHAR)")} % 8 AS shard
       |  FROM $source),
       |c AS (SELECT doc_id, shard, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
       |  FROM base),
       |p AS (SELECT shard, n_tokens,
       |    CASE WHEN (cum - n_tokens) % 1000 + n_tokens > 1000 THEN 1 ELSE 0 END AS split
       |  FROM c)
       |SELECT shard,
       |  CAST((sum(n_tokens) + 999) // 1000 AS BIGINT) AS n_bins,
       |  count(*) AS n_docs,
       |  CAST(sum(split) AS BIGINT) AS split_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  round(CAST(sum(n_tokens) AS DOUBLE)
       |    / CAST(((sum(n_tokens) + 999) // 1000) * 1000 AS DOUBLE), 6) AS fill_ratio
       |FROM p GROUP BY 1""".stripMargin

  /** Twin of Sampling.histogramMatch — same integer bucket ids (floor
    * division), same 64-bit integer ppm quotient, same md5-bridge gate.
    */
  def histogramMatch(bucketTokens: Int = Sampling.LenBucketTokens): String =
    s"""WITH b AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) // $bucketTokens AS bucket
       |  FROM documents),
       |c AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
       |m AS (SELECT min(cnt) AS min_cnt FROM c),
       |p AS (SELECT bucket, (1000000 * min_cnt) // cnt AS ppm FROM c, m)
       |SELECT b.doc_id, b.n_tokens, b.bucket, p.ppm
       |FROM b JOIN p ON b.bucket = p.bucket
       |WHERE ${h("lenmatch", "CAST(doc_id AS VARCHAR)")} % 1000000 < p.ppm""".stripMargin

  /** Twin of Sampling.stratifiedSample — ppm rates and the val share come
    * from the same Scala constants; decisions are pure integer arithmetic
    * over the md5 bridge, so both engines keep exactly the same documents.
    */
  /** Per-language ppm CASE arms, shared by stratifiedSample and the
    * composed curation pipeline.
    */
  private val ratesCaseSql: String = Sampling.DefaultRatesPpm
    .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")

  val stratifiedSample: String = {
    val ppmCase = ratesCaseSql
    s"""SELECT doc_id, lang, source,
       |  CASE WHEN ${h("split", "CAST(doc_id AS VARCHAR)")} % 1000 < ${Sampling.ValPerMille}
       |       THEN 'val' ELSE 'train' END AS split
       |FROM documents
       |WHERE ${h("samp", "CAST(doc_id AS VARCHAR)")} % 1000000
       |  < (CASE $ppmCase ELSE ${Sampling.DefaultPpm} END)""".stripMargin
  }

  /** Twin of Sampling.weightedSample over TextOps.qualityScore — the score
    * formula and stopword list render from the same Scala constants as
    * textQuality, the rate is floor()ed from the identical IEEE product,
    * and the keep gate replays the portable hash.
    */
  /** Twin of TimeSeries.cusumChangepoints: the same prefix-scan closed
    * form of the clamped CUSUM folds (running sum + running extremum per
    * user), decimal-exact end to end.
    */
  def cusumChangepoints: String = {
    val cUp = s"CAST(${graft.ops.TimeSeries.CusumTarget} AS DECIMAL(18,2)) + CAST(${graft.ops.TimeSeries.CusumSlack} AS DECIMAL(18,2))"
    val cDn = s"CAST(${graft.ops.TimeSeries.CusumTarget} AS DECIMAL(18,2)) - CAST(${graft.ops.TimeSeries.CusumSlack} AS DECIMAL(18,2))"
    val h = s"CAST(${graft.ops.TimeSeries.CusumThreshold} AS DECIMAL(18,2))"
    s"""WITH b AS (SELECT user_id, ts, event_id,
       |    CAST(value AS DECIMAL(18,2)) AS v FROM events),
       |s AS (SELECT user_id, ts, event_id,
       |    CAST(sum(v) OVER wnd AS DECIMAL(28,2)) AS p,
       |    row_number() OVER wnd AS i
       |  FROM b WINDOW wnd AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |a AS (SELECT user_id, ts, event_id,
       |    CAST(p - i * ($cUp) AS DECIMAL(28,2)) AS a_up,
       |    CAST(p - i * ($cDn) AS DECIMAL(28,2)) AS a_dn FROM s),
       |sc AS (SELECT user_id,
       |    CAST(a_up - least(CAST(0 AS DECIMAL(28,2)), min(a_up) OVER wnd)
       |      AS DECIMAL(28,2)) AS s_plus,
       |    CAST(greatest(CAST(0 AS DECIMAL(28,2)), max(a_dn) OVER wnd) - a_dn
       |      AS DECIMAL(28,2)) AS s_minus
       |  FROM a WINDOW wnd AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, count(*) AS n_events,
       |  CAST(sum(CASE WHEN s_plus > $h THEN 1 ELSE 0 END) AS BIGINT) AS n_up_alarms,
       |  CAST(sum(CASE WHEN s_minus > $h THEN 1 ELSE 0 END) AS BIGINT) AS n_down_alarms,
       |  CAST(CAST(max(s_plus) AS DECIMAL(18,2)) AS DOUBLE) AS peak_up,
       |  CAST(CAST(max(s_minus) AS DECIMAL(18,2)) AS DOUBLE) AS peak_down
       |FROM sc GROUP BY 1""".stripMargin
  }

  /** Twin of Sampling.weightedReservoirPerSource: same hash-drawn u
    * (exact power-of-two divisor), same ln(u)/w race key rounded 6dp,
    * ranked row_number over (key DESC, doc_id ASC) per source.
    */
  def weightedReservoirPerSource(k: Int = Sampling.ReservoirK): String =
    s"""WITH q AS (SELECT doc_id, quality_score FROM ($textQuality) t),
       |r AS (SELECT d.source, d.doc_id,
       |    round(ln(CAST(${h("res", "CAST(d.doc_id AS VARCHAR)")} + 1 AS DOUBLE)
       |      / 2147483648.0) / q.quality_score, 6) AS key
       |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
       |rk AS (SELECT source, doc_id, key,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY key DESC, doc_id ASC) AS INT) AS rank
       |  FROM r)
       |SELECT source, rank, doc_id, key AS race_key FROM rk WHERE rank <= $k""".stripMargin

  def weightedSample(basePpm: Long = Sampling.WeightBasePpm): String = {
    val stop = inList(TextOps.stopwords)
    s"""WITH $tokCte,
       |q AS (SELECT doc_id,
       |  round(0.5 * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE))
       |      + 0.3 * (1.0 - CAST(len(list_filter(t, x -> x IN ($stop))) AS DOUBLE) / CAST(len(t) AS DOUBLE))
       |      + 0.2 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0), 6) AS quality_score
       |  FROM tok)
       |SELECT doc_id, quality_score,
       |  least(1000000, CAST(floor(quality_score * $basePpm) AS BIGINT)) AS rate_ppm
       |FROM q
       |WHERE ${h("wsamp", "CAST(doc_id AS VARCHAR)")} % 1000000
       |  < least(1000000, CAST(floor(quality_score * $basePpm) AS BIGINT))""".stripMargin
  }

  /** Twin of TextOps.decontaminate over TextOps.benchmarkSet — the bench
    * derivation constants render from the same Scala values.
    */
  val decontaminate: String =
    s"""WITH $tokCte, $shCte,
       |bench AS (SELECT doc_id AS bench_id,
       |  array_to_string(t[1:${TextOps.BenchPrefixTokens}], ' ') AS text
       |  FROM tok WHERE doc_id % ${TextOps.BenchEvery} = 0),
       |btok AS (SELECT bench_id, string_split(text, ' ') AS t FROM bench),
       |bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(t) - 1),
       |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
       |  FROM btok WHERE len(t) >= 3),
       |hits AS (SELECT doc_id, count(*) AS n_hits FROM sh JOIN bsh USING (shingle)
       |         GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(hits.n_hits, 0) AS n_hits,
       |  coalesce(hits.n_hits, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits USING (doc_id)""".stripMargin

  /** Twin of Sampling.temperatureMix — α is pinned to 1/2 (sqrt), the
    * totals sum is rounded to 6dp on both sides before the rate division,
    * and membership is the same integer-ppm hash gate as stratifiedSample.
    */
  val temperatureMix: String =
    s"""WITH n AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
       |t AS (SELECT sum(n_s) AS n_tot, round(sum(sqrt(n_s)), 6) AS s_sum FROM n),
       |r AS (SELECT source, least(1000000, CAST(round(
       |        1000000.0 * ${Sampling.MixTargetFrac} * n_tot / s_sum / sqrt(n_s), 0)
       |      AS BIGINT)) AS rate_ppm FROM n, t)
       |SELECT d.doc_id, d.source, r.rate_ppm
       |FROM documents d JOIN r USING (source)
       |WHERE ${h("mix", "CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm""".stripMargin

  /** Twin of Sampling.mixtureEpochPlan — same token rule (split on a
    * single space), same rounding ladder: p = round₆(tokens^α), p_sum =
    * round₆(Σp), weight = round₆(p/p_sum), epochs = min(cap,
    * round₆(budget·tot·weight/tokens)), planned = round₀(epochs·tokens).
    */
  val mixtureEpochPlan: String = {
    val a = Sampling.MixAlpha
    val b = Sampling.MixBudgetMultiple
    val cap = Sampling.MixCapEpochs
    s"""WITH tk AS (SELECT source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
       |ps AS (SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |    round(power(CAST(sum(n_tok) AS DOUBLE), $a), 6) AS p
       |  FROM tk GROUP BY source),
       |tot AS (SELECT sum(n_tokens) AS tot_tokens, round(sum(p), 6) AS p_sum FROM ps),
       |w AS (SELECT source, n_docs, n_tokens,
       |    round(p / p_sum, 6) AS weight,
       |    round($b * tot_tokens * round(p / p_sum, 6) / n_tokens, 6) AS epochs_raw
       |  FROM ps CROSS JOIN tot)
       |SELECT source, n_docs, n_tokens, weight,
       |  least($cap, epochs_raw) AS epochs,
       |  CAST(round(least($cap, epochs_raw) * n_tokens, 0) AS BIGINT) AS planned_tokens,
       |  epochs_raw > $cap AS capped
       |FROM w""".stripMargin
  }

  /** Twin of TimeSeries.psiDrift: same fixed-width bins, Laplace
    * smoothing, and ln-term sum rounded 6dp.
    */
  def psiDrift(
      splitTs: String = graft.ops.TimeSeries.PsiSplitTs,
      binWidth: Double = graft.ops.TimeSeries.PsiBinWidth,
      nBins: Int = graft.ops.TimeSeries.PsiBins): String =
    s"""WITH sided AS (SELECT event_type,
       |    CAST(least(${nBins - 1}, CAST(floor(value / $binWidth) AS BIGINT)) AS INT) AS b,
       |    (ts < TIMESTAMP '$splitTs') AS is_ref
       |  FROM events),
       |counts AS (SELECT event_type, b,
       |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
       |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
       |  FROM sided GROUP BY 1, 2),
       |bins AS (SELECT CAST(unnest(range(0, $nBins)) AS INT) AS b),
       |spine AS (SELECT event_type, b
       |  FROM (SELECT DISTINCT event_type FROM events) CROSS JOIN bins),
       |filled AS (SELECT s.event_type, s.b,
       |    coalesce(c.c_ref, 0) AS c_ref, coalesce(c.c_cur, 0) AS c_cur
       |  FROM spine s LEFT JOIN counts c USING (event_type, b)),
       |tot AS (SELECT event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
       |    CAST(sum(c_cur) AS BIGINT) AS n_cur
       |  FROM filled GROUP BY 1),
       |terms AS (SELECT f.event_type, t.n_ref, t.n_cur,
       |    CAST(f.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + $nBins AS DOUBLE) AS pr,
       |    CAST(f.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + $nBins AS DOUBLE) AS pc
       |  FROM filled f JOIN tot t USING (event_type))
       |SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
       |  round(sum((pc - pr) * ln(pc / pr)), 6) AS psi
       |FROM terms GROUP BY 1""".stripMargin

  /** Shared CTE chain for the TEXT-side drift pair: per-(source, token)
    * cohort counts (doc-id parity), add-one smoothing over each source's
    * union vocabulary.
    */
  private val tokenDriftDistCtes: String =
    s"""tkd AS (SELECT source, doc_id % 2 = 0 AS is_ref,
       |    unnest(string_split(text, ' ')) AS tok FROM documents),
       |tkf AS (SELECT * FROM tkd WHERE length(tok) > 0),
       |tcounts AS (SELECT source, tok,
       |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
       |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
       |  FROM tkf GROUP BY 1, 2),
       |ttots AS (SELECT source, CAST(sum(c_ref) AS BIGINT) AS n_ref,
       |    CAST(sum(c_cur) AS BIGINT) AS n_cur, CAST(count(*) AS BIGINT) AS v
       |  FROM tcounts GROUP BY 1),
       |tdist AS (SELECT c.source, c.tok, t.n_ref, t.n_cur, t.v,
       |    (c.c_ref + 1) / CAST(t.n_ref + t.v AS DOUBLE) AS pr,
       |    (c.c_cur + 1) / CAST(t.n_cur + t.v AS DOUBLE) AS pc
       |  FROM tcounts c JOIN ttots t USING (source))""".stripMargin

  /** Twin of TextOps.corpusTokenDrift. */
  val corpusTokenDrift: String =
    s"""WITH $tokenDriftDistCtes
       |SELECT source, CAST(max(n_ref) AS BIGINT) AS n_ref,
       |  CAST(max(n_cur) AS BIGINT) AS n_cur, CAST(max(v) AS BIGINT) AS vocab,
       |  round(sum(pr * ln(pr / ((pr + pc) / 2)) / 2
       |    + pc * ln(pc / ((pr + pc) / 2)) / 2), 6) AS jsd
       |FROM tdist GROUP BY 1""".stripMargin

  /** Twin of TextOps.tokenDriftTop: rank on the 6dp-ROUNDED contribution
    * (token tie-break) so sub-rounding float noise cannot reorder rows.
    */
  def tokenDriftTop(k: Int = 5): String =
    s"""WITH $tokenDriftDistCtes,
       |tc AS (SELECT source, tok,
       |    round(pr * ln(pr / ((pr + pc) / 2)) / 2
       |      + pc * ln(pc / ((pr + pc) / 2)) / 2, 6) AS contrib
       |  FROM tdist)
       |SELECT source, CAST(rn AS INTEGER) AS rank, tok, contrib FROM (
       |  SELECT source, tok, contrib,
       |    row_number() OVER (PARTITION BY source ORDER BY contrib DESC, tok ASC) AS rn
       |  FROM tc) WHERE rn <= $k""".stripMargin

  /** Twin of TimeSeries.jsDrift: the psiDrift histogram chain with the
    * bounded symmetric divergence terms.
    */
  def jsDrift(
      splitTs: String = graft.ops.TimeSeries.PsiSplitTs,
      binWidth: Double = graft.ops.TimeSeries.PsiBinWidth,
      nBins: Int = graft.ops.TimeSeries.PsiBins): String =
    s"""WITH sided AS (SELECT event_type,
       |    CAST(least(${nBins - 1}, CAST(floor(value / $binWidth) AS BIGINT)) AS INT) AS b,
       |    (ts < TIMESTAMP '$splitTs') AS is_ref
       |  FROM events),
       |counts AS (SELECT event_type, b,
       |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
       |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
       |  FROM sided GROUP BY 1, 2),
       |bins AS (SELECT CAST(unnest(range(0, $nBins)) AS INT) AS b),
       |spine AS (SELECT event_type, b
       |  FROM (SELECT DISTINCT event_type FROM events) CROSS JOIN bins),
       |filled AS (SELECT s.event_type, s.b,
       |    coalesce(c.c_ref, 0) AS c_ref, coalesce(c.c_cur, 0) AS c_cur
       |  FROM spine s LEFT JOIN counts c USING (event_type, b)),
       |tot AS (SELECT event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
       |    CAST(sum(c_cur) AS BIGINT) AS n_cur
       |  FROM filled GROUP BY 1),
       |terms AS (SELECT f.event_type, t.n_ref, t.n_cur,
       |    CAST(f.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + $nBins AS DOUBLE) AS pr,
       |    CAST(f.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + $nBins AS DOUBLE) AS pc
       |  FROM filled f JOIN tot t USING (event_type))
       |SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
       |  round(sum(pr * ln(pr / ((pr + pc) / 2)) / 2
       |    + pc * ln(pc / ((pr + pc) / 2)) / 2), 6) AS jsd
       |FROM terms GROUP BY 1""".stripMargin

  /** Twin of Sampling.cappedPerSource: the bounded-heap aggregator path
    * must be row-identical to a ranking window over the same (hash,
    * doc_id) priority order.
    */
  def cappedPerSource(cap: Int = Sampling.SourceCap): String =
    s"""SELECT source, rank, doc_id FROM (
       |  SELECT source, doc_id, CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY ${h("cap", "CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC) AS INT) AS rank
       |  FROM documents)
       |WHERE rank <= $cap""".stripMargin

  /** Twin of TextOps.repetitionStats; the repetitive flag compares the
    * ROUNDED fractions on both sides (bit-stable across engines).
    */
  def textRepetition(dupFracMax: Double = 0.2, topFracMax: Double = 0.1): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
       |       FROM t, (SELECT unnest(range(1, (SELECT max(len(toks)) FROM t))) AS i) r
       |       WHERE i < len(toks)),
       |c AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams, count(*) AS n_distinct,
       |  round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS dup_frac,
       |  round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS top_frac,
       |  (round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) > $dupFracMax
       |   OR round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) > $topFracMax) AS repetitive
       |FROM c GROUP BY 1""".stripMargin

  /** Twin of TextOps.retentionReport — composed from the same quality /
    * repetition / PII oracle fragments the individual queries use, so the
    * composition cannot drift from its parts.
    */
  def corpusRetention(
      minTokens: Int = 20,
      minQuality: Double = 0.6,
      dupFracMax: Double = 0.2,
      topFracMax: Double = 0.1): String =
    s"""SELECT *, (reject_reason IS NULL) AS retained FROM (
       |  SELECT q.doc_id, q.n_tokens, q.quality_score,
       |    coalesce(r.repetitive, FALSE) AS repetitive, p.had_pii,
       |    CASE WHEN q.n_tokens < $minTokens THEN 'short'
       |         WHEN q.quality_score < $minQuality THEN 'low_quality'
       |         WHEN coalesce(r.repetitive, FALSE) THEN 'repetitive' END AS reject_reason
       |  FROM (SELECT doc_id, n_tokens, quality_score FROM ($textQuality)) q
       |  LEFT JOIN (SELECT doc_id, repetitive FROM (${textRepetition(dupFracMax, topFracMax)})) r
       |    ON q.doc_id = r.doc_id
       |  JOIN (SELECT doc_id, had_pii FROM ($textScrubPii)) p ON q.doc_id = p.doc_id)""".stripMargin

  /** Cross-modal dedup triage twin: lexical membership from the MinHash
    * pair set, semantic membership from the exact cosine pair set, joined
    * onto the document spine (vec_id aligns with doc_id in the testdata).
    */
  def dedupCrossmodal(cosThreshold: Double = 0.35): String =
    s"""WITH lexp AS (SELECT doc_a, doc_b FROM ($minhashLshPairs) p),
       |lex AS (SELECT DISTINCT doc_id FROM
       |  (SELECT doc_a AS doc_id FROM lexp UNION ALL SELECT doc_b FROM lexp)),
       |semp AS (SELECT vec_a, vec_b FROM (${embeddingNearDup(cosThreshold)}) p),
       |sem AS (SELECT DISTINCT doc_id FROM
       |  (SELECT vec_a AS doc_id FROM semp UNION ALL SELECT vec_b FROM semp))
       |SELECT d.doc_id, (l.doc_id IS NOT NULL) AS lexical_dup,
       |  (s.doc_id IS NOT NULL) AS semantic_dup
       |FROM documents d
       |LEFT JOIN lex l ON d.doc_id = l.doc_id
       |LEFT JOIN sem s ON d.doc_id = s.doc_id""".stripMargin

  /** Twin of Dedup.nearDupComponents: the bounded min-label-propagation loop
    * unrolls into chained CTEs (same technique as the k-means oracle) over
    * the MinHash-LSH pair set.
    */
  /** Twin of Graph.pageRank over the MinHash-LSH pair graph: same
    * symmetrized edges, same unrolled power iterations with per-iteration
    * 6dp rank rounding, damping rendered from the shared constant.
    */
  def pagerankNeardup(
      iters: Int = graft.ops.Graph.PrIters,
      damping: Double = graft.ops.Graph.Damping): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (SELECT nd.node,
         |    round((1.0 - $damping) / nn.n + $damping * coalesce(s.in_sum, 0.0), 6) AS rank
         |  FROM nd CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst, sum(r.rank / CAST(d.deg AS DOUBLE)) AS in_sum
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.node JOIN nd d ON e.src = d.node
         |    GROUP BY 1) s ON nd.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT doc_a, doc_b FROM ($minhashLshPairs) p),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |nd AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM nd),
       |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nd CROSS JOIN nn),
       |$iterCtes
       |SELECT nd.node, nd.deg, r.rank
       |FROM nd JOIN r$iters r ON nd.node = r.node""".stripMargin
  }

  /** Twin of Graph.pageRankWeighted over the near-dup pair graph. */
  def pagerankNeardupWeighted(
      iters: Int = graft.ops.Graph.PrIters,
      damping: Double = graft.ops.Graph.Damping): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (SELECT nw.node,
         |    round((1.0 - $damping) / nn.n + $damping * coalesce(s.in_sum, 0.0), 6) AS rank
         |  FROM nw CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst, sum(r.rank * CAST(e.w AS DOUBLE) / CAST(t.tw AS DOUBLE)) AS in_sum
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.node JOIN nw t ON e.src = t.node
         |    GROUP BY 1) s ON nw.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT doc_a, doc_b,
       |    CAST(round(est_jaccard * 1000000, 0) AS BIGINT) AS w
       |  FROM ($minhashLshPairs) p),
       |edges AS (SELECT doc_a AS src, doc_b AS dst, w FROM pairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst, w FROM pairs),
       |nw AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM nw),
       |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nw CROSS JOIN nn),
       |$iterCtes
       |SELECT nw.node, nw.tw AS weight_fp, r.rank
       |FROM nw JOIN r$iters r ON nw.node = r.node""".stripMargin
  }

  /** Twin of TextOps.textRankKeywords: the window-2 co-occurrence graph
    * (lag over token positions, stopwords break the link), token ids
    * through the same portable hash, and the weighted-PageRank rounds
    * unrolled exactly as in pagerankNeardupWeighted — then the top-k by
    * (rank DESC, token ASC).
    */
  def textrankKeywords(
      k: Int = graft.ops.TextOps.TextRankK,
      iters: Int = graft.ops.Graph.PrIters,
      damping: Double = graft.ops.Graph.Damping): String = {
    val stopList = graft.ops.TextOps.stopwords.map(s => s"'$s'").mkString(", ")
    def h(e: String) = graft.functions.PortableHash.h31Sql("tr", e)
    val iterCtes = (1 to iters).map { kk =>
      s"""r$kk AS (SELECT nw.node,
         |    round((1.0 - $damping) / nn.n + $damping * coalesce(s.in_sum, 0.0), 6) AS rank
         |  FROM nw CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst, sum(r.rank * CAST(e.w AS DOUBLE) / CAST(t.tw AS DOUBLE)) AS in_sum
         |    FROM edges e JOIN r${kk - 1} r ON e.src = r.node JOIN nw t ON e.src = t.node
         |    GROUP BY 1) s ON nw.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH tokl AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |inst AS (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
       |  FROM tokl),
       |adj AS (SELECT tok,
       |    lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM inst),
       |cpair AS (SELECT least(prev, tok) AS tok_a, greatest(prev, tok) AS tok_b,
       |    count(*) AS cooc
       |  FROM adj
       |  WHERE prev IS NOT NULL AND prev <> tok
       |    AND prev NOT IN ($stopList) AND tok NOT IN ($stopList)
       |  GROUP BY 1, 2),
       |pairs AS (SELECT ${h("tok_a")} AS doc_a, ${h("tok_b")} AS doc_b,
       |    CAST(round(CAST(cooc AS DOUBLE) * 1000000, 0) AS BIGINT) AS w
       |  FROM cpair),
       |edges AS (SELECT doc_a AS src, doc_b AS dst, w FROM pairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst, w FROM pairs),
       |nw AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM nw),
       |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nw CROSS JOIN nn),
       |$iterCtes,
       |vocab AS (SELECT token, ${h("token")} AS node FROM (
       |  SELECT DISTINCT tok_a AS token FROM cpair
       |  UNION SELECT DISTINCT tok_b AS token FROM cpair))
       |SELECT v.token, nw.tw AS weight_fp, r.rank
       |FROM nw JOIN r$iters r ON nw.node = r.node JOIN vocab v ON nw.node = v.node
       |ORDER BY r.rank DESC, v.token ASC LIMIT $k""".stripMargin
  }

  /** Twin of Graph.labelPropagation: the synchronous rounds unroll to one
    * CTE pair (neighbor-label counts, argmax with min-label tie-break)
    * per iteration — all integer decisions, so the replay is exact.
    */
  def neardupCommunities(iters: Int = graft.ops.Graph.LpIters): String =
    lpaSql(s"SELECT doc_a, doc_b FROM ($minhashLshPairs) p", iters)

  /** Label propagation unrolled over any (doc_a, doc_b[, weight]) pair
    * subquery; `weighted` sums integer micro-unit weights instead of
    * counting edges.
    */
  private def lpaSql(pairsSql: String, iters: Int, weighted: Boolean = false): String = {
    val mass = if (weighted) "CAST(sum(e.w) AS BIGINT)" else "count(*)"
    val iterCtes = (1 to iters).map { k =>
      s"""c$k AS (SELECT e.dst AS node, l.lab, $mass AS c
         |  FROM edges e JOIN l${k - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$k AS (SELECT node, lab FROM (
         |  SELECT node, lab, row_number() OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn
         |  FROM c$k) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val wSel = if (weighted)
      ", CAST(round(weight * 1000000, 0) AS BIGINT) AS w" else ""
    s"""WITH pairs AS ($pairsSql),
       |edges AS (SELECT doc_a AS src, doc_b AS dst$wSel FROM pairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst$wSel FROM pairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
       |$iterCtes
       |SELECT node, lab AS community FROM l$iters""".stripMargin
  }

  /** Twin of the weighted-LPA query: communities by estimated-Jaccard
    * mass over the near-dup pair graph.
    */
  def neardupCommunitiesWeighted(iters: Int = graft.ops.Graph.LpIters): String =
    lpaSql(
      s"SELECT doc_a, doc_b, est_jaccard AS weight FROM ($minhashLshPairs) p",
      iters, weighted = true)

  /** Twin of VectorOps.prfHybridRerank: BM25 seeds joined to embeddings,
    * 6dp per-dimension PRF means (the centroid convention), the RRF pool
    * reranked by the shared cosine expression.
    */
  def prfHybridRerank(
      expandK: Int = VectorOps.PrfExpandK,
      k: Int = TextOps.RrfK): String =
    s"""WITH $embCte,
       |seed AS (SELECT b.q_id, e.v FROM (${bm25TopK(expandK)}) b
       |  JOIN e ON b.doc_id = e.vec_id),
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT q_id, pos, avg(v[pos]) AS m FROM seed, dims GROUP BY 1, 2),
       |prf AS (SELECT q_id, list(round(m, 6) ORDER BY pos) AS qv FROM comp GROUP BY 1),
       |pool AS (SELECT r.q_id, r.doc_id, e.v FROM (${rrfFusion()}) r
       |  JOIN e ON r.doc_id = e.vec_id),
       |scored AS (SELECT p.q_id, p.doc_id, round(${cosSql("prf.qv", "p.v")}, 6) AS cos
       |  FROM pool p JOIN prf ON p.q_id = prf.q_id),
       |ranked AS (SELECT q_id, doc_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, rank, doc_id, cos FROM ranked WHERE rank <= $k""".stripMargin

  /** Twin of Graph.modularityReport over the weighted near-dup LPA
    * partition: integer strength sums, the two final divisions mirrored
    * operation for operation.
    */
  def neardupModularity(iters: Int = graft.ops.Graph.LpIters): String = {
    val lab = lpaSql(
      s"SELECT doc_a, doc_b, est_jaccard AS weight FROM ($minhashLshPairs) p",
      iters, weighted = true)
    s"""WITH wp AS (SELECT doc_a, doc_b,
       |    CAST(round(est_jaccard * 1000000, 0) AS BIGINT) AS w
       |  FROM ($minhashLshPairs) p),
       |edges AS (SELECT doc_a AS src, doc_b AS dst, w FROM wp
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst, w FROM wp),
       |lab AS (SELECT node, community FROM ($lab) l),
       |e2 AS (SELECT e.src, e.dst, e.w, la.community AS ca, lb.community AS cb
       |  FROM edges e JOIN lab la ON e.src = la.node JOIN lab lb ON e.dst = lb.node),
       |tm AS (SELECT CAST(sum(w) AS BIGINT) AS two_m FROM e2),
       |st AS (SELECT ca AS community, count(DISTINCT src) AS n_nodes,
       |    CAST(sum(w) AS BIGINT) AS s_tot,
       |    CAST(sum(CASE WHEN ca = cb THEN w ELSE 0 END) AS BIGINT) AS s_in
       |  FROM e2 GROUP BY 1)
       |SELECT community, n_nodes, s_in, s_tot,
       |  round(CAST(s_in AS DOUBLE) / CAST(two_m AS DOUBLE)
       |    - (CAST(s_tot AS DOUBLE) / CAST(two_m AS DOUBLE))
       |      * (CAST(s_tot AS DOUBLE) / CAST(two_m AS DOUBLE)), 6) AS q_contrib
       |FROM st CROSS JOIN tm""".stripMargin
  }

  /** Twin of the token_communities composition: LPA over the
    * positive-PMI collocation graph.
    */
  def tokenCommunities(iters: Int = graft.ops.Graph.LpIters): String =
    lpaSql(
      s"SELECT tok AS doc_a, tok1 AS doc_b FROM (${pmiCollocations()}) p WHERE pmi > 0",
      iters)

  /** Twin of Graph.triangleStats. The Spark side enumerates with degree
    * orientation (the O(m^1.5) bound); the triangle SET is
    * orientation-independent, so the oracle uses the simple a<b<c
    * three-way join over the canonical (doc_a < doc_b) edge list.
    */
  def neardupTriangles: String =
    s"""WITH pairs AS (SELECT doc_a, doc_b FROM ($minhashLshPairs) p),
       |nodes AS (SELECT doc_a AS node FROM pairs UNION ALL SELECT doc_b AS node FROM pairs),
       |deg AS (SELECT node, count(*) AS deg FROM nodes GROUP BY 1),
       |tri AS (SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c FROM pairs e1
       |  JOIN pairs e2 ON e1.doc_b = e2.doc_a
       |  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
       |pn AS (SELECT unnest([a, b, c]) AS node FROM tri),
       |cnt AS (SELECT node, count(*) AS n_tri FROM pn GROUP BY 1)
       |SELECT d.node, d.deg, CAST(coalesce(c.n_tri, 0) AS BIGINT) AS n_tri,
       |  round(CASE WHEN d.deg >= 2
       |    THEN 2.0 * coalesce(c.n_tri, 0) / (d.deg * (d.deg - 1)) ELSE 0.0 END, 6)
       |    AS clustering_coef
       |FROM deg d LEFT JOIN cnt c ON d.node = c.node""".stripMargin

  /** Twin of Graph.kCore over the near-dup pair graph: the fixed-round
    * peel unrolls to one alive-filtered degree CTE per round, then the
    * final within-core recount.
    */
  def neardupKcore(
      k: Int = graft.ops.Graph.KCoreK,
      rounds: Int = graft.ops.Graph.KCoreMaxRounds): String = {
    // MATERIALIZED throughout: each a_i references a_{i-1} twice, so
    // DuckDB's default CTE inlining would expand the whole LSH chain
    // 2^rounds times — materialization keeps the unrolled peel linear
    val iter = (1 to rounds).map { i =>
      s"""a$i AS MATERIALIZED (SELECT src AS node FROM (
         |  SELECT e.src, count(*) AS c FROM edges e
         |  JOIN a${i - 1} x ON e.src = x.node JOIN a${i - 1} y ON e.dst = y.node
         |  GROUP BY 1) WHERE c >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ($minhashLshPairs) p),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |$iter
       |SELECT e.src AS node, count(*) AS core_deg FROM edges e
       |JOIN a$rounds x ON e.src = x.node JOIN a$rounds y ON e.dst = y.node
       |GROUP BY 1""".stripMargin
  }

  /** Twin of Dedup.nearDupComponentsExact: the fixpoint needs no unrolling
    * in SQL — a RECURSIVE transitive-closure CTE (set semantics, so it
    * terminates) reaches every node of the component and min() picks the
    * representative.
    */
  def dedupComponentsExact: String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ($minhashLshPairs) p),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |reach(node, r) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.src, rch.r FROM edges e JOIN reach rch ON e.dst = rch.node)
       |SELECT node AS doc_id, min(r) AS rep FROM reach GROUP BY 1""".stripMargin

  /** Twin of Dedup.dedupPolicyReport: exact-component winners under both
    * policies plus singletons, decimal-exact quality sums.
    */
  def dedupPolicyReport: String = {
    def roll(policy: String, keepCte: String) =
      s"""SELECT '$policy' AS policy, count(*) AS n_kept,
         |  CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) AS total_quality,
         |  round(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality
         |FROM (SELECT doc_id FROM $keepCte UNION ALL SELECT doc_id FROM singles) k
         |JOIN q USING (doc_id)""".stripMargin
    s"""WITH comp AS ($dedupComponentsExact),
       |q AS (SELECT doc_id, quality_score FROM ($textQuality) t),
       |cq AS (SELECT comp.doc_id, comp.rep, q.quality_score
       |  FROM comp JOIN q USING (doc_id)),
       |mk AS (SELECT min(doc_id) AS doc_id FROM cq GROUP BY rep),
       |qk AS (SELECT doc_id FROM (
       |  SELECT doc_id, row_number() OVER (PARTITION BY rep ORDER BY quality_score DESC, doc_id ASC) AS rn
       |  FROM cq) WHERE rn = 1),
       |singles AS (SELECT doc_id FROM q
       |  WHERE doc_id NOT IN (SELECT doc_id FROM comp))
       |${roll("min_id", "mk")}
       |UNION ALL
       |${roll("best_quality", "qk")}""".stripMargin
  }

  /** Twin of Dedup.dedupGranularityReport: component vs weighted-LPA
    * community survivorship, one best-quality keeper per group plus
    * singletons, decimal-exact quality sums.
    */
  def dedupGranularityReport: String = {
    val commSql = lpaSql(
      s"SELECT doc_a, doc_b, est_jaccard AS weight FROM ($minhashLshPairs) p",
      graft.ops.Graph.LpIters, weighted = true)
    def roll(granularity: String, labCte: String) =
      s"""SELECT '$granularity' AS granularity, count(*) AS n_kept,
         |  CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) AS total_quality
         |FROM (
         |  SELECT doc_id FROM (
         |    SELECT l.doc_id, row_number() OVER (PARTITION BY l.grp
         |      ORDER BY q.quality_score DESC, l.doc_id ASC) AS rn
         |    FROM $labCte l JOIN q ON l.doc_id = q.doc_id) r WHERE rn = 1
         |  UNION ALL SELECT doc_id FROM singles) k
         |JOIN q ON k.doc_id = q.doc_id""".stripMargin
    s"""WITH comp AS (SELECT doc_id, rep AS grp FROM ($dedupComponentsExact) c),
       |comm AS (SELECT node AS doc_id, community AS grp FROM ($commSql) l2),
       |q AS (SELECT doc_id, quality_score FROM ($textQuality) t),
       |singles AS (SELECT doc_id FROM q
       |  WHERE doc_id NOT IN (SELECT doc_id FROM comp))
       |${roll("component", "comp")}
       |UNION ALL
       |${roll("community", "comm")}""".stripMargin
  }

  /** Twin of Dedup.modularityGatedReport: unrolled weighted-LPA labels,
    * the modularity CTE's per-community q_contrib as the trust gate,
    * recursive-CTE exact components as the fallback granularity, the
    * identical ranking window and decimal-exact keeper-quality sums.
    */
  def dedupModularityGatedReport: String = {
    val commSql = lpaSql(
      s"SELECT doc_a, doc_b, est_jaccard AS weight FROM ($minhashLshPairs) p",
      graft.ops.Graph.LpIters, weighted = true)
    val qmin = graft.ops.Dedup.ModularityTrustMin
    s"""WITH lab AS (SELECT node AS doc_id, community FROM ($commSql) l),
       |md AS (SELECT community, q_contrib FROM (${neardupModularity()}) m),
       |comp AS (SELECT doc_id, rep FROM ($dedupComponentsExact) c),
       |q AS (SELECT doc_id, quality_score FROM ($textQuality) t),
       |g AS (SELECT lab.doc_id,
       |    CASE WHEN md.q_contrib > $qmin THEN 'c' || CAST(lab.community AS VARCHAR)
       |         ELSE 'k' || CAST(comp.rep AS VARCHAR) END AS grp,
       |    CASE WHEN md.q_contrib > $qmin THEN 'community' ELSE 'component' END AS kind
       |  FROM lab JOIN md ON lab.community = md.community
       |  JOIN comp ON lab.doc_id = comp.doc_id),
       |r AS (SELECT g.doc_id, g.grp, g.kind, q.quality_score,
       |    row_number() OVER (PARTITION BY g.grp
       |      ORDER BY q.quality_score DESC, g.doc_id ASC) AS rn
       |  FROM g JOIN q ON g.doc_id = q.doc_id),
       |paired AS (SELECT kind, count(DISTINCT grp) AS n_groups, count(*) AS n_docs,
       |    CAST(CAST(sum(CASE WHEN rn = 1 THEN CAST(quality_score AS DECIMAL(18,6))
       |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(18,6)) AS DOUBLE) AS kept_quality
       |  FROM r GROUP BY 1),
       |singles AS (SELECT 'singleton' AS kind, count(*) AS n_groups, count(*) AS n_docs,
       |    CAST(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS kept_quality
       |  FROM q WHERE doc_id NOT IN (SELECT doc_id FROM comp))
       |SELECT * FROM paired UNION ALL SELECT * FROM singles""".stripMargin
  }

  /** Twin of Dedup.modularityGatedSurvivors (projected to
    * doc_id/lang/source): the same gated grouping CTEs, final relation =
    * rn=1 keepers plus unpaired singletons joined back to documents.
    */
  def dedupApplyGated: String = {
    val commSql = lpaSql(
      s"SELECT doc_a, doc_b, est_jaccard AS weight FROM ($minhashLshPairs) p",
      graft.ops.Graph.LpIters, weighted = true)
    val qmin = graft.ops.Dedup.ModularityTrustMin
    s"""WITH lab AS (SELECT node AS doc_id, community FROM ($commSql) l),
       |md AS (SELECT community, q_contrib FROM (${neardupModularity()}) m),
       |comp AS (SELECT doc_id, rep FROM ($dedupComponentsExact) c),
       |q AS (SELECT doc_id, quality_score FROM ($textQuality) t),
       |g AS (SELECT lab.doc_id,
       |    CASE WHEN md.q_contrib > $qmin THEN 'c' || CAST(lab.community AS VARCHAR)
       |         ELSE 'k' || CAST(comp.rep AS VARCHAR) END AS grp
       |  FROM lab JOIN md ON lab.community = md.community
       |  JOIN comp ON lab.doc_id = comp.doc_id),
       |qk AS (SELECT doc_id FROM (
       |  SELECT g.doc_id, row_number() OVER (PARTITION BY g.grp
       |    ORDER BY q.quality_score DESC, g.doc_id ASC) AS rn
       |  FROM g JOIN q ON g.doc_id = q.doc_id) r WHERE rn = 1),
       |singles AS (SELECT doc_id FROM q
       |  WHERE doc_id NOT IN (SELECT doc_id FROM comp))
       |SELECT d.doc_id, d.lang, d.source FROM documents d
       |JOIN (SELECT doc_id FROM qk UNION ALL SELECT doc_id FROM singles) k USING (doc_id)""".stripMargin
  }

  /** Twin of Dedup.bestQualitySurvivorsCommunities (projected to
    * doc_id/lang/source): the unrolled weighted-LPA labels replace the
    * component CTE, then the identical ranking window + singleton union.
    */
  def dedupApplyCommunities: String = {
    val commSql = lpaSql(
      s"SELECT doc_a, doc_b, est_jaccard AS weight FROM ($minhashLshPairs) p",
      graft.ops.Graph.LpIters, weighted = true)
    s"""WITH comm AS (SELECT node AS doc_id, community AS grp FROM ($commSql) l2),
       |q AS (SELECT doc_id, quality_score FROM ($textQuality) t),
       |qk AS (SELECT doc_id FROM (
       |  SELECT c.doc_id, row_number() OVER (PARTITION BY c.grp
       |    ORDER BY q.quality_score DESC, c.doc_id ASC) AS rn
       |  FROM comm c JOIN q ON c.doc_id = q.doc_id) r WHERE rn = 1),
       |singles AS (SELECT doc_id FROM q
       |  WHERE doc_id NOT IN (SELECT doc_id FROM comm))
       |SELECT d.doc_id, d.lang, d.source FROM documents d
       |JOIN (SELECT doc_id FROM qk UNION ALL SELECT doc_id FROM singles) k USING (doc_id)""".stripMargin
  }

  /** The best-quality survivor corpus (all document columns) — the
    * relation the composed pipelines consume; shares its CTEs with
    * dedupPolicyReport's oracle.
    */
  def bestQualitySurvivors: String =
    s"""WITH comp AS ($dedupComponentsExact),
       |q AS (SELECT doc_id, quality_score FROM ($textQuality) t),
       |cq AS (SELECT comp.doc_id, comp.rep, q.quality_score
       |  FROM comp JOIN q USING (doc_id)),
       |qk AS (SELECT doc_id FROM (
       |  SELECT doc_id, row_number() OVER (PARTITION BY rep ORDER BY quality_score DESC, doc_id ASC) AS rn
       |  FROM cq) WHERE rn = 1),
       |singles AS (SELECT doc_id FROM q
       |  WHERE doc_id NOT IN (SELECT doc_id FROM comp))
       |SELECT d.* FROM documents d
       |JOIN (SELECT doc_id FROM qk UNION ALL SELECT doc_id FROM singles) k USING (doc_id)""".stripMargin

  def dedupComponents(iters: Int = 3): String = {
    val iterCtes = (1 to iters).map { n =>
      s"""l$n AS (SELECT l.doc_id, least(l.rep, coalesce(m.nmin, l.rep)) AS rep
         |  FROM l${n - 1} l LEFT JOIN (
         |    SELECT e.src, min(x.rep) AS nmin
         |    FROM edges e JOIN l${n - 1} x ON e.dst = x.doc_id GROUP BY 1
         |  ) m ON l.doc_id = m.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT doc_a, doc_b FROM ($minhashLshPairs) p),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |l0 AS (SELECT DISTINCT src AS doc_id, src AS rep FROM edges),
       |$iterCtes
       |SELECT doc_id, rep FROM l$iters""".stripMargin
  }

  val dedupExactDocs: String =
    """SELECT md5(text) AS text_md5, min(doc_id) AS canonical_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  private val sigCte: String = {
    val mins = Dedup.minhashSeeds.zipWithIndex
      .map { case ((a, b), i) => s"min((h * $a + $b) % ${Dedup.P31}) AS mh$i" }
      .mkString(",\n  ")
    s"""hs AS (SELECT doc_id, ${h("mh", "shingle")} AS h FROM sh),
       |sig AS (SELECT doc_id,
       |  $mins
       |  FROM hs GROUP BY doc_id)""".stripMargin
  }

  val minhashSignatures: String =
    s"""WITH $tokCte, $shCte, $sigCte
       |SELECT * FROM sig""".stripMargin

  /** Body of the LSH band table (UNION ALL over bands) — references `sig`;
    * shared by minhashLshPairs and the composed curation pipeline.
    */
  private val bandsCteBody: String =
    (0 until Dedup.MinhashBands).map { j =>
      val catExpr = (j * Dedup.MinhashRows until (j + 1) * Dedup.MinhashRows)
        .map(i => s"CAST(mh$i AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, ${(0 until Dedup.MinhashK).map(i => s"mh$i").mkString(", ")}, " +
        s"$j AS band, ${h(s"band$j", catExpr)} AS bh FROM sig"
    }.mkString("\n  UNION ALL ")

  /** The pair-select over a `bands` CTE — the banded equi-join + exact
    * signature-agreement estimate.
    */
  private val pairsFromBands: String = {
    val est = (0 until Dedup.MinhashK)
      .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  round(CAST(($est) AS DOUBLE) / ${Dedup.MinhashK}.0, 6) AS est_jaccard
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id""".stripMargin
  }

  val minhashLshPairs: String =
    s"""WITH $tokCte, $shCte, $sigCte,
       |bands AS (
       |  $bandsCteBody
       |)
       |$pairsFromBands""".stripMargin

  /** The same MinHash-LSH pair pipeline over an arbitrary
    * (doc_id, text) relation — only the tok CTE's source changes; the
    * shingle/signature/band fragments are shared verbatim.
    */
  def minhashLshPairsFrom(docsSql: String): String =
    s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t
       |  FROM ($docsSql) zz), $shCte, $sigCte,
       |bands AS (
       |  $bandsCteBody
       |)
       |$pairsFromBands""".stripMargin

  /** Twin of Dedup.lshTuningReport: one banded self-join per (bands,
    * rows) factorization over the SAME materialized signature table,
    * each config's distinct candidate pairs rolled to (count, mean
    * estimate), UNION ALL across configs.
    */
  def lshTuningReport: String = {
    val mhCols = (0 until Dedup.MinhashK).map(i => s"mh$i").mkString(", ")
    val est = (0 until Dedup.MinhashK)
      .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    val per = Dedup.LshTuningConfigs.map { case (b, r) =>
      val bandBody = (0 until b).map { j =>
        val catExpr = (j * r until (j + 1) * r)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString(" || ',' || ")
        s"SELECT doc_id, $mhCols, $j AS band, ${h(s"band$j", catExpr)} AS bh FROM sigm"
      }.mkString("\n    UNION ALL ")
      s"""SELECT $b AS n_bands, $r AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_candidate_pairs,
         |  coalesce(round(avg(est_jaccard), 6), 0.0) AS mean_est_jaccard
         |FROM (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    round(CAST(($est) AS DOUBLE) / ${Dedup.MinhashK}.0, 6) AS est_jaccard
         |  FROM ($bandBody) a JOIN ($bandBody) b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id) zz""".stripMargin
    }
    s"""WITH $tokCte, $shCte, $sigCte,
       |sigm AS MATERIALIZED (SELECT * FROM sig)
       |${per.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Twin of the chunk_neardup_pairs composition: chunks as pseudo-docs
    * (id = doc_id·ChunkIdFactor + chunk_idx — the shared constant the
    * streamed chunk index also writes) through the shared LSH pipeline,
    * keeping only CROSS-document collisions (same-doc chunks overlap by
    * construction at stride < width).
    */
  def chunkNeardupPairs: String = {
    val f = graft.streaming.StreamingChunkDedup.ChunkIdFactor
    val src = s"SELECT doc_id * $f + chunk_idx AS doc_id, chunk_text AS text " +
      s"FROM (${chunkDocuments()}) c"
    s"""SELECT doc_a, doc_b, est_jaccard FROM (${minhashLshPairsFrom(src)}) p
       |WHERE doc_a // $f <> doc_b // $f""".stripMargin
  }

  /** Twin of Dedup.sourceContamination: the shared band-pair fragments
    * labeled with each side's source, canonicalized least/greatest, one
    * matrix aggregate.
    */
  val sourceContamination: String =
    s"""WITH $tokCte, $shCte, $sigCte,
       |bands AS (
       |  $bandsCteBody
       |),
       |pairs AS ($pairsFromBands),
       |lab AS (SELECT least(da.source, db.source) AS source_a,
       |    greatest(da.source, db.source) AS source_b, p.est_jaccard
       |  FROM pairs p
       |  JOIN documents da ON p.doc_a = da.doc_id
       |  JOIN documents db ON p.doc_b = db.doc_id)
       |SELECT source_a, source_b, count(*) AS n_pairs,
       |  round(avg(est_jaccard), 6) AS mean_est_jaccard
       |FROM lab GROUP BY 1, 2""".stripMargin

  /** Twin of Dedup.minhashQualityReport: candidate pairs from the shared
    * band fragments, exact Jaccard recomputed over the candidate-doc
    * shingle subset, one aggregate report row.
    */
  def minhashQualityReport(threshold: Double = Dedup.EstAuditThreshold): String =
    s"""WITH $tokCte, $shCte, $sigCte,
       |bands AS (
       |  $bandsCteBody
       |),
       |pairs AS ($pairsFromBands),
       |pd AS (SELECT DISTINCT node AS doc_id FROM (
       |  SELECT doc_a AS node FROM pairs UNION ALL SELECT doc_b AS node FROM pairs)),
       |shp AS (SELECT s.doc_id, s.shingle FROM sh s JOIN pd ON s.doc_id = pd.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM shp GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM shp a JOIN shp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pe AS (SELECT p.est_jaccard,
       |    round(CAST(coalesce(i.i, 0) AS DOUBLE)
       |      / CAST(sa.n + sb.n - coalesce(i.i, 0) AS DOUBLE), 6) AS exact_jaccard
       |  FROM pairs p JOIN sz sa ON p.doc_a = sa.doc_id
       |  JOIN sz sb ON p.doc_b = sb.doc_id
       |  LEFT JOIN inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b)
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN exact_jaccard >= $threshold THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_true,
       |  CAST(floor(sum(CASE WHEN exact_jaccard >= $threshold THEN 1 ELSE 0 END)
       |    * 1000000 / count(*)) AS BIGINT) AS precision_ppm,
       |  round(avg(abs(est_jaccard - exact_jaccard)), 6) AS mae,
       |  round(avg(est_jaccard - exact_jaccard), 6) AS bias,
       |  round(max(abs(est_jaccard - exact_jaccard)), 6) AS max_abs_err
       |FROM pe""".stripMargin

  /** Twin of the composed `curation_pipeline` query — the end-to-end
    * training-data preparation chain built from the SAME fragments the
    * individual oracles use (retention gates → MinHash-LSH near-dup
    * survivors AMONG the retained subset → stratified sample + split), so
    * the composition cannot drift from its parts. The dedup stage runs
    * over `docsr` (the retained docs) — pair candidacy is a property of
    * the corpus actually being deduplicated, not of the raw table.
    */
  def curationPipeline(): String =
    s"""WITH ret AS (SELECT doc_id FROM (${corpusRetention()}) WHERE retained),
       |docsr AS (SELECT d.* FROM documents d JOIN ret USING (doc_id)),
       |tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM docsr),
       |$shCte, $sigCte,
       |bands AS (
       |  $bandsCteBody
       |),
       |pairs AS ($pairsFromBands),
       |surv AS (SELECT dr.doc_id, dr.lang, dr.source FROM docsr dr
       |  WHERE dr.doc_id NOT IN (SELECT DISTINCT doc_b FROM pairs))
       |SELECT doc_id, lang, source,
       |  CASE WHEN ${h("split", "CAST(doc_id AS VARCHAR)")} % 1000 < ${Sampling.ValPerMille}
       |       THEN 'val' ELSE 'train' END AS split
       |FROM surv
       |WHERE ${h("samp", "CAST(doc_id AS VARCHAR)")} % 1000000
       |  < (CASE $ratesCaseSql ELSE ${Sampling.DefaultPpm} END)""".stripMargin

  private val simhashCte: String = {
    val votes = (0 until Dedup.SimhashBits)
      .map(p => s"sum(CASE WHEN ((hv >> $p) & 1) = 1 THEN 1 ELSE -1 END) AS v$p")
      .mkString(",\n  ")
    val fp = (0 until Dedup.SimhashBits)
      .map(p => s"CASE WHEN v$p > 0 THEN ${1L << p} ELSE 0 END")
      .mkString(" + ")
    s"""hashed AS (SELECT doc_id, ${h("sh", "shingle")} AS hv FROM sh),
       |votes AS (SELECT doc_id,
       |  $votes
       |  FROM hashed GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM votes)""".stripMargin
  }

  val simhashDocs: String =
    s"""WITH $tokCte, $shCte, $simhashCte
       |SELECT doc_id, simhash FROM fp""".stripMargin

  def simhashPairs(maxHamming: Int = 3): String =
    s"""WITH $tokCte, $shCte, $simhashCte,
       |banded AS (SELECT doc_id, simhash, j.band AS band,
       |    ((simhash >> (8 * j.band)) & 255) AS bv
       |  FROM fp, (SELECT unnest(range(0, ${Dedup.SimhashBytes})) AS band) j)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin

  /** Twin of Dedup.fingerprintContainmentPairs over withPlantedQuotes:
    * same truncated-twin planting, same winnowed-fingerprint candidate
    * join, c = i/|A| with the ordered (contained, host) output.
    */
  def containmentPairs(
      minContainment: Double = 0.8, every: Int = 25, idOffset: Long = 2000000L): String =
    s"""WITH docsq AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $idOffset AS doc_id,
       |    array_to_string(t[1:greatest(len(t) // 2, 3)], ' ') AS text
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |  WHERE doc_id % $every = 0),
       |tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM docsq),
       |$shCte,
       |fp AS (SELECT DISTINCT doc_id, fp_hash FROM
       |    (SELECT doc_id, ${h("fp", "shingle")} AS fp_hash FROM sh)
       |  WHERE fp_hash % 8 = 0),
       |sz AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_in, b.doc_id AS doc_host, count(*) AS i
       |  FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_in, doc_host, containment FROM (
       |  SELECT doc_in, doc_host,
       |    round(CAST(i AS DOUBLE) / CAST(sa.n AS DOUBLE), 6) AS containment
       |  FROM inter JOIN sz sa ON doc_in = sa.doc_id)
       |WHERE containment >= $minContainment""".stripMargin

  def ngramJaccardPairs(minJaccard: Double = 0.3): String =
    s"""WITH $tokCte, $shCte,
       |fp AS (SELECT DISTINCT doc_id, fp_hash FROM
       |    (SELECT doc_id, ${h("fp", "shingle")} AS fp_hash FROM sh)
       |  WHERE fp_hash % 8 = 0),
       |sz AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
       |  FROM inter
       |  JOIN sz sa ON doc_a = sa.doc_id
       |  JOIN sz sb ON doc_b = sb.doc_id)
       |WHERE jaccard >= $minJaccard""".stripMargin

  /** Dedup application: survivors after dropping the higher id of every
    * MinHash-LSH pair (wraps the pairs query as a derived table).
    */
  val dedupApplyMinhash: String =
    s"""SELECT d.doc_id, d.lang, d.source FROM documents d
       |WHERE d.doc_id NOT IN (SELECT DISTINCT doc_b FROM ($minhashLshPairs) p)""".stripMargin

  /** Twin of VectorOps.standardize: same E[x²]−E[x]² moments, same
    * max(·,0) cancellation guard and constant-dimension CASE, loop bounds
    * rendered from the shared EmbeddingDim.
    */
  def embeddingStandardize(dim: Int = VectorOps.EmbeddingDim): String = {
    val stats = (1 to dim)
      .map(i => s"avg(v[$i]) AS m$i, avg(v[$i]*v[$i]) AS q$i").mkString(", ")
    val elems = (1 to dim).map { i =>
      s"round(CASE WHEN sqrt(greatest(q$i - m$i*m$i, 0.0)) = 0.0 THEN 0.0 " +
        s"ELSE (v[$i] - m$i) / sqrt(greatest(q$i - m$i*m$i, 0.0)) END, 6)"
    }.mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |st AS (SELECT $stats FROM e),
       |zl AS (SELECT vec_id, [$elems] AS zl FROM e CROSS JOIN st)
       |SELECT vec_id, CAST(generate_subscripts(zl, 1) AS INTEGER) AS d, unnest(zl) AS z
       |FROM zl""".stripMargin
  }

  val embeddingNorms: String =
    """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
      |  round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
      |FROM embeddings""".stripMargin

  /** Cosine between two DOUBLE[] SQL expressions (matches VectorOps.cosine
    * up to accumulation-order ulps, removed by round(·, 6) on both sides).
    */
  /** Twin of the knn_lexical query: symmetrized fingerprint-Jaccard pairs
    * ranked per doc — the aggregator path must match the window form.
    */
  def knnLexical(k: Int = 3, minJaccard: Double = 0.1): String =
    s"""WITH pairs AS (${ngramJaccardPairs(minJaccard)}),
       |sym AS (SELECT doc_a AS doc_id, doc_b AS nb, jaccard FROM pairs
       |  UNION ALL SELECT doc_b AS doc_id, doc_a AS nb, jaccard FROM pairs),
       |r AS (SELECT doc_id, nb, jaccard,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY jaccard DESC, nb ASC) AS INT) AS rank
       |  FROM sym)
       |SELECT doc_id, rank, nb AS neighbor_id, jaccard FROM r WHERE rank <= $k""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  private val embCte =
    "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  def embeddingNearDup(threshold: Double = 0.35): String =
    s"""WITH $embCte
       |SELECT vec_a, vec_b, cos FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    round(${cosSql("a.v", "b.v")}, 6) AS cos
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
       |WHERE cos >= $threshold""".stripMargin

  /** Random-hyperplane LSH twin over the planted-near-dup corpus: the ±1
    * plane components come from the SAME VectorOps.lshSigns array rendered
    * as literal DOUBLE[] lists, so the band values (and therefore the
    * candidate set) cannot drift between engines. round(·, 6) before the
    * sign test absorbs accumulation-order ulps in the two engines' dot
    * products. The planted copies (VectorOps.plantedCorpus) nudge every
    * 20th vector by ±1/64 per component — a power of two, so `v[i] ± delta`
    * is EXACT double arithmetic on both sides. Each 12-bit band value is
    * computed directly (96 signature bits exceed one BIGINT).
    */
  def embeddingLshPairs(
      threshold: Double = 0.85,
      every: Int = 20,
      delta: String = "0.015625",
      idOffset: Long = 1000000L): String = {
    def bvExpr(j: Int): String = (0 until VectorOps.LshRows).map { r =>
      val arr = VectorOps.lshSigns(j * VectorOps.LshRows + r)
        .map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"CASE WHEN round(list_dot_product(v, CAST($arr AS DOUBLE[])), 6) >= 0 THEN ${1L << r} ELSE 0 END"
    }.mkString("\n    + ")
    val bandSelects = (0 until VectorOps.LshBands).map { j =>
      s"SELECT vec_id, $j AS band, CAST(${bvExpr(j)} AS BIGINT) AS bv FROM aug"
    }.mkString("\n  UNION ALL ")
    s"""WITH $embCte,
       |aug AS (SELECT vec_id, v FROM e
       |  UNION ALL
       |  SELECT vec_id + $idOffset AS vec_id,
       |    list_transform(range(1, ${VectorOps.EmbeddingDim + 1}), i -> v[i] +
       |      CASE WHEN (vec_id + i - 1) % 2 = 0 THEN $delta ELSE -$delta END) AS v
       |  FROM e WHERE vec_id % $every = 0),
       |banded AS (
       |  $bandSelects
       |),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos FROM (
       |  SELECT vec_a, vec_b, round(${cosSql("sa.v", "sb.v")}, 6) AS cos
       |  FROM cand JOIN aug sa ON vec_a = sa.vec_id JOIN aug sb ON vec_b = sb.vec_id)
       |WHERE cos >= $threshold""".stripMargin
  }

  /** Twin of VectorOps.quantizeStats: identical double arithmetic
    * (127/amax, component-wise round-half-away), integer summaries.
    */
  val embeddingQuantize: String =
    s"""WITH $embCte,
       |a AS (SELECT vec_id, v, nullif(list_max(list_transform(v, x -> abs(x))), 0.0) AS amax FROM e),
       |q AS (SELECT vec_id, round(127.0 / amax, 6) AS scale,
       |       list_transform(v, x -> CAST(round(x * (127.0 / amax)) AS INT)) AS qv FROM a)
       |SELECT vec_id, scale,
       |  list_min(qv) AS q_min, list_max(qv) AS q_max,
       |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
       |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1
       |FROM q""".stripMargin

  /** Twin of VectorOps.ivfRerankTopK: same int8 quantization rule as
    * embeddingQuantize, same IVF cell CTEs as annIvfTopK, stage-1 ranking
    * on the identically-ordered approximate-cosine division chain, exact
    * re-rank of the shortlist.
    */
  def annIvfRerankTopK(
      k: Int = 10,
      rerankK: Int = VectorOps.RerankShortlist,
      nprobe: Int = 2): String =
    s"""WITH $embCte,
       |qzq AS (SELECT vec_id, v,
       |    sqrt(list_dot_product(v, v)) AS vn,
       |    127.0 / list_max(list_transform(v, x -> abs(x))) AS s,
       |    list_transform(v, x ->
       |      CAST(CAST(round(x * (127.0 / list_max(list_transform(v, y -> abs(y))))) AS INT) AS DOUBLE)) AS q
       |  FROM e),
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT z.vec_id, z.vn, z.s, z.q, cent.cell,
       |    round(${cosSql("z.v", "centroid")}, 6) AS ccos
       |  FROM qzq z CROSS JOIN cent),
       |rc AS (SELECT vec_id, vn, s, q, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore),
       |asg AS (SELECT vec_id, vn, s, q, cell FROM rc WHERE r = 1),
       |qasg AS (SELECT vec_id, vn, s, q, cell FROM rc WHERE r <= $nprobe AND vec_id % 100 = 0),
       |approx AS (SELECT qa.vec_id AS q_id, ca.vec_id AS neighbor_id,
       |    round(list_dot_product(qa.q, ca.q) / (qa.s * ca.s) / (qa.vn * ca.vn), 6) AS acos
       |  FROM qasg qa JOIN asg ca ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id),
       |short AS (SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY acos DESC, neighbor_id ASC) AS r
       |    FROM approx) WHERE r <= $rerankK),
       |ex AS (SELECT sh.q_id, sh.neighbor_id,
       |    round(${cosSql("qe.v", "ce.v")}, 6) AS cos
       |  FROM short sh
       |  JOIN e ce ON sh.neighbor_id = ce.vec_id
       |  JOIN e qe ON sh.q_id = qe.vec_id)
       |SELECT q_id, rank, neighbor_id, cos FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM ex) WHERE rank <= $k""".stripMargin

  /** Twin of VectorOps.clusterCohesion: same label-mean centroids, same
    * (rounded-cos DESC, cell ASC) assignment, same per-cell rollup.
    */
  def clusterCohesion(): String =
    s"""WITH $embCte,
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.label, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |asg AS (SELECT vec_id, label, cell, ccos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore)
       |SELECT cell, count(*) AS n_members,
       |  CAST(sum(CASE WHEN label = cell THEN 1 ELSE 0 END) AS BIGINT) AS n_label_match,
       |  round(avg(ccos), 6) AS mean_cos
       |FROM asg WHERE r = 1 GROUP BY 1""".stripMargin

  /** Twin of VectorOps.clusterBalancedSample: same label-mean quantizer
    * assignment (row_number argmax over rounded cosines), same
    * (hash ASC, vec_id ASC) per-cell priority order, same cap.
    */
  def clusterBalancedSample(cap: Int = VectorOps.CellCap): String =
    s"""WITH $embCte,
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |asg AS (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore),
       |rk AS (SELECT cell, vec_id,
       |    CAST(row_number() OVER (PARTITION BY cell
       |      ORDER BY ${h("cbs", "CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) AS INT) AS rank
       |  FROM asg WHERE r = 1)
       |SELECT cell, rank, vec_id FROM rk WHERE rank <= $cap""".stripMargin

  /** Twin of VectorOps.binaryHammingTopK: per-dimension sign disagreement
    * count (list_filter — the same integer Hamming the packed-word
    * bit_count computes), (hd ASC, id ASC) shortlist window, exact-cosine
    * re-rank of the shortlist only.
    */
  def bqTopK(
      k: Int = 10,
      shortlist: Int = VectorOps.RerankShortlist): String =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
       |ham AS (SELECT q_id, vec_id AS neighbor_id,
       |    len(list_filter(range(1, ${VectorOps.EmbeddingDim + 1}),
       |      i -> (qv[i] > 0) <> (v[i] > 0))) AS hd
       |  FROM q JOIN e ON q_id <> vec_id),
       |short AS (SELECT q_id, neighbor_id FROM (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
       |    ORDER BY hd ASC, neighbor_id ASC) AS rn FROM ham) WHERE rn <= $shortlist),
       |exact AS (SELECT s.q_id, s.neighbor_id, round(${cosSql("q.qv", "e.v")}, 6) AS cos
       |  FROM short s JOIN e ON s.neighbor_id = e.vec_id JOIN q ON s.q_id = q.q_id),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM exact)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin

  /** Twin of VectorOps.bqRecallReport — the shared recall skeleton over
    * the binary-Hamming funnel ranking.
    */
  def bqRecallReport(k: Int = 10): String = recallReportSql(bqTopK(k), k)

  /** Twin of VectorOps.bqIvfTopK: the annIvfTopK assignment CTEs with the
    * sign-disagreement Hamming stage-1 restricted to probed cells and the
    * exact full-dim re-rank of the shortlist only.
    */
  def bqIvfTopK(
      k: Int = 10,
      shortlist: Int = VectorOps.RerankShortlist,
      nprobe: Int = 2): String =
    s"""WITH $embCte,
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.v, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |ranked_cells AS (SELECT vec_id, v, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore),
       |asg AS (SELECT vec_id, v, cell FROM ranked_cells WHERE r = 1),
       |qasg AS (SELECT vec_id, v, cell FROM ranked_cells
       |  WHERE r <= $nprobe AND vec_id % 100 = 0),
       |ham AS (SELECT qa.vec_id AS q_id, ca.vec_id AS neighbor_id,
       |    len(list_filter(range(1, ${VectorOps.EmbeddingDim + 1}),
       |      i -> (qa.v[i] > 0) <> (ca.v[i] > 0))) AS hd
       |  FROM qasg qa JOIN asg ca
       |    ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id),
       |short AS (SELECT q_id, neighbor_id FROM (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
       |    ORDER BY hd ASC, neighbor_id ASC) AS rn FROM ham) WHERE rn <= $shortlist),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
       |exact AS (SELECT s.q_id, s.neighbor_id, round(${cosSql("q.qv", "c2.v")}, 6) AS cos
       |  FROM short s JOIN e c2 ON s.neighbor_id = c2.vec_id
       |  JOIN q ON s.q_id = q.q_id)
       |SELECT q_id, rank, neighbor_id, cos FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM exact) WHERE rank <= $k""".stripMargin

  /** Shared recall@k + MRR SQL skeleton for every *RecallReport twin:
    * brute truth LEFT JOIN the given approximate ranking subquery —
    * metrics from integer hits/ranks only.
    */
  /** Shared CTEs of the navigable-graph tier (VectorOps.graphEdges): the
    * OCCUPANCY-SIZED Lloyd quantizer (dynamic k = ceil(N/occupancy), the
    * kmCentsAutoOf twin — round 13's SCALING.md §4 fix), per-node
    * top-`probe` cell postings, cell-co-member candidates, per-src
    * top-`degree` pruning, symmetrized edge set. `gcand`/`edges` are
    * MATERIALIZED — the beam rounds reference `edges` once per round and
    * DuckDB's CTE inlining would otherwise re-expand the candidate join
    * per reference (the k-core gotcha).
    */
  /** Candidate → directed-top-degree → symmetrized edge CTE chain from a
    * postings CTE — shared by the layer-0 and layer-1 graph builds
    * (`suffix` distinguishes the CTE names).
    */
  private def graphEdgePruneCtes(posted: String, suffix: String, degree: Int): String =
    s"""gcand$suffix AS MATERIALIZED (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst,
       |    round(${cosSql("a.v", "b.v")}, 6) AS cos
       |  FROM $posted a JOIN $posted b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
       |directed$suffix AS (SELECT src, dst, cos FROM (
       |    SELECT src, dst, cos,
       |      row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rn
       |    FROM gcand$suffix) WHERE rn <= $degree),
       |edges$suffix AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM directed$suffix
       |    UNION ALL SELECT dst AS src, src AS dst FROM directed$suffix))""".stripMargin

  private def graphCtes(degree: Int, probe: Int): String =
    s"""${kmeansRankedCtes(autoKSql(), 3)},
       |nposted AS (SELECT vec_id, v, cell FROM ranked_cells WHERE r <= $probe),
       |${graphEdgePruneCtes("nposted", "", degree)}""".stripMargin

  /** The pre-round-13 LABEL-MEAN graph head, kept for the takedown
    * report's graph tier (its Spark side builds the governance artifacts
    * against VectorOps.centroids — the quantizer choice is irrelevant to
    * the scrub mechanism the query certifies, and label means keep the
    * oracle independent of the serving tier's occupancy knob).
    */
  private def graphCtesLabelMean(degree: Int, probe: Int): String =
    s"""dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.v, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |ranked_cells AS (SELECT vec_id, v, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore),
       |nposted AS (SELECT vec_id, v, cell FROM ranked_cells WHERE r <= $probe),
       |${graphEdgePruneCtes("nposted", "", degree)}""".stripMargin

  /** One top-`beam` prune CTE over a scored (q_id, nid, cos) subquery. */
  private def beamPruneCte(name: String, from: String, beam: Int): String =
    s"""$name AS MATERIALIZED (SELECT q_id, nid, cos FROM (
       |    SELECT q_id, nid, cos,
       |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, nid ASC) AS rn
       |    FROM $from) WHERE rn <= $beam)""".stripMargin

  /** The unrolled expand-score-prune rounds over `edges` starting at
    * `${p}beam0` — shared by the flat walk (p="") and the upper-layer
    * walk (p="u"), so a fix to one can never desynchronize the other.
    */
  private def beamRoundCtes(p: String, edges: String, rounds: Int, beam: Int): String =
    (1 to rounds).map { r =>
      val prev = s"${p}beam${r - 1}"
      s"""${p}pool$r AS (SELECT DISTINCT q_id, nid FROM (
         |    SELECT q_id, nid FROM $prev
         |    UNION ALL
         |    SELECT b.q_id, ed.dst AS nid FROM $prev b JOIN $edges ed ON b.nid = ed.src
         |    WHERE ed.dst <> b.q_id)),
         |${p}score$r AS (SELECT p.q_id, p.nid, round(${cosSql("q.qv", "e.v")}, 6) AS cos
         |  FROM ${p}pool$r p JOIN q ON p.q_id = q.q_id JOIN e ON p.nid = e.vec_id),
         |${beamPruneCte(s"${p}beam$r", s"${p}score$r", beam)}""".stripMargin
    }.mkString(",\n")

  /** Query/assignment/seed CTEs shared by the graph walks: `q` (the query
    * set), `qasg` (query → nearest cell), `asg` (corpus r=1 assignment),
    * and a cell-co-member seed scoring against `asgName`.
    */
  private def graphSeedCtes: String =
    s"""q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
       |qasg AS (SELECT vec_id AS q_id, v AS qv, cell FROM ranked_cells
       |  WHERE r = 1 AND vec_id % 100 = 0),
       |asg AS (SELECT vec_id, v, cell FROM ranked_cells WHERE r = 1)""".stripMargin

  private def seedScoreCte(name: String, asgName: String): String =
    s"""$name AS (SELECT qa.q_id, ca.vec_id AS nid,
       |    round(${cosSql("qa.qv", "ca.v")}, 6) AS cos
       |  FROM qasg qa JOIN $asgName ca ON qa.cell = ca.cell AND qa.q_id <> ca.vec_id)"""
      .stripMargin

  private def beamFinalSelect(finalBeam: String, k: Int): String =
    s"""SELECT q_id, CAST(rn AS INTEGER) AS rank, nid AS neighbor_id, cos FROM (
       |  SELECT q_id, nid, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, nid ASC) AS rn
       |  FROM $finalBeam) WHERE rn <= $k""".stripMargin

  /** Twin of VectorOps.graphTopK: IVF-nprobe=1 seed beam, `rounds`
    * unrolled expand-score-prune rounds (each beam MATERIALIZED — the next
    * round references it twice), top-k of the final beam.
    */
  def annGraphTopK(
      k: Int = 10,
      degree: Int = VectorOps.GraphDegree,
      probe: Int = VectorOps.GraphProbe,
      beam: Int = VectorOps.GraphBeam,
      rounds: Int = VectorOps.GraphRounds): String =
    s"""WITH $embCte,
       |${graphCtes(degree, probe)},
       |$graphSeedCtes,
       |${seedScoreCte("seedscore", "asg")},
       |${beamPruneCte("beam0", "seedscore", beam)},
       |${beamRoundCtes("", "edges", rounds, beam)}
       |${beamFinalSelect(s"beam$rounds", k)}""".stripMargin

  def annGraphRecallReport(k: Int = 10): String =
    recallReportSql(annGraphTopK(k), k)

  /** Twin of VectorOps.graph2TopK — the HIERARCHICAL (HNSW upper-layer)
    * traversal: the flat graphCtes plus a layer-1 graph over the
    * hash-sampled node subset (same quantizer), an unrolled narrow beam
    * on layer 1, then the layer-0 beam seeded by (IVF seeds ∪ the
    * layer-1 final beam) and the flat unrolled rounds.
    */
  def annGraph2TopK(
      k: Int = 10,
      degree: Int = VectorOps.GraphDegree,
      probe: Int = VectorOps.GraphProbe,
      beam: Int = VectorOps.GraphBeam,
      rounds: Int = VectorOps.GraphRounds,
      beam1: Int = VectorOps.Layer1Beam,
      rounds1: Int = VectorOps.Layer1Rounds): String = {
    val member = s"${h("lyr", "CAST(vec_id AS VARCHAR)")} % ${VectorOps.Layer1Every} = 0"
    s"""WITH $embCte,
       |${graphCtes(degree, probe)},
       |nposted1 AS (SELECT vec_id, v, cell FROM nposted WHERE $member),
       |${graphEdgePruneCtes("nposted1", "1", degree)},
       |$graphSeedCtes,
       |asg1 AS (SELECT vec_id, v, cell FROM asg WHERE $member),
       |${seedScoreCte("useedscore", "asg1")},
       |${beamPruneCte("ubeam0", "useedscore", beam1)},
       |${beamRoundCtes("u", "edges1", rounds1, beam1)},
       |${seedScoreCte("seedscore", "asg")},
       |seedpool AS (SELECT q_id, nid, max(cos) AS cos FROM (
       |    SELECT q_id, nid, cos FROM seedscore
       |    UNION ALL SELECT q_id, nid, cos FROM ubeam$rounds1)
       |  GROUP BY 1, 2),
       |${beamPruneCte("beam0", "seedpool", beam)},
       |${beamRoundCtes("", "edges", rounds, beam)}
       |${beamFinalSelect(s"beam$rounds", k)}""".stripMargin
  }

  def annGraph2RecallReport(k: Int = 10): String =
    recallReportSql(annGraph2TopK(k), k)

  private def layer1MemberSql: String =
    s"${h("lyr", "CAST(vec_id AS VARCHAR)")} % ${VectorOps.Layer1Every} = 0"

  /** Twin of VectorOps.graphDegreeStatsFrom over the LAYER-1 edge table:
    * the same build CTEs restricted to the hash-sampled upper-layer
    * membership, then the degree rollup.
    */
  def annGraph2DegreeStats(
      degree: Int = VectorOps.GraphDegree,
      probe: Int = VectorOps.GraphProbe): String =
    s"""WITH $embCte,
       |${graphCtes(degree, probe)},
       |nposted1 AS (SELECT vec_id, v, cell FROM nposted WHERE $layer1MemberSql),
       |${graphEdgePruneCtes("nposted1", "1", degree)},
       |deg AS (SELECT src, count(*) AS deg FROM edges1 GROUP BY src)
       |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(deg) AS BIGINT) AS n_edges,
       |  CAST(min(deg) AS BIGINT) AS min_degree,
       |  round(avg(deg), 6) AS avg_degree,
       |  CAST(max(deg) AS BIGINT) AS max_degree
       |FROM deg""".stripMargin

  /** The FILTERED expand-score-prune rounds (twin of the Spark 2-hop
    * loop): each round's pool looks two hops out along the UNFILTERED
    * edges (a non-passing bridge is stepped through, never kept), and
    * scoring joins `scoreSrc` — the passing-only assignment — so only
    * passing nodes can enter the beam.
    */
  private def beamRoundCtesFiltered(
      p: String, edges: String, rounds: Int, beam: Int,
      scoreSrc: String): String =
    (1 to rounds).map { r =>
      val prev = s"${p}beam${r - 1}"
      s"""${p}hop$r AS (SELECT DISTINCT b.q_id, ed.dst AS nid
         |  FROM $prev b JOIN $edges ed ON b.nid = ed.src
         |  WHERE ed.dst <> b.q_id),
         |${p}pool$r AS (SELECT DISTINCT q_id, nid FROM (
         |    SELECT q_id, nid FROM $prev
         |    UNION ALL SELECT q_id, nid FROM ${p}hop$r
         |    UNION ALL SELECT hh.q_id, ed.dst AS nid
         |      FROM ${p}hop$r hh JOIN $edges ed ON hh.nid = ed.src
         |      WHERE ed.dst <> hh.q_id)),
         |${p}score$r AS (SELECT p.q_id, p.nid, round(${cosSql("q.qv", "sx.v")}, 6) AS cos
         |  FROM ${p}pool$r p JOIN q ON p.q_id = q.q_id
         |  JOIN $scoreSrc sx ON p.nid = sx.vec_id),
         |${beamPruneCte(s"${p}beam$r", s"${p}score$r", beam)}""".stripMargin
    }.mkString(",\n")

  /** Twin of VectorOps.graphTopKFilteredFromIndex: the unfiltered graph
    * build CTEs, a passing-only assignment (`corpusFilter` over `e`
    * columns), passing-only IVF seeds, and the 2-hop filtered rounds.
    */
  def annGraphFilteredTopK(
      k: Int = 10,
      degree: Int = VectorOps.GraphDegree,
      probe: Int = VectorOps.GraphProbe,
      beam: Int = VectorOps.GraphBeam,
      rounds: Int = VectorOps.GraphRounds,
      corpusFilter: String = "label % 2 = 0"): String =
    s"""WITH $embCte,
       |${graphCtes(degree, probe)},
       |$graphSeedCtes,
       |fasg AS (SELECT a.vec_id, a.v, a.cell FROM asg a
       |  JOIN e ON a.vec_id = e.vec_id WHERE ($corpusFilter)),
       |${seedScoreCte("fseedscore", "fasg")},
       |${beamPruneCte("fbeam0", "fseedscore", beam)},
       |${beamRoundCtesFiltered("f", "edges", rounds, beam, "fasg")}
       |${beamFinalSelect(s"fbeam$rounds", k)}""".stripMargin

  def annGraphFilteredRecallReport(
      k: Int = 10, corpusFilter: String = "label % 2 = 0"): String =
    recallReportSql(annGraphFilteredTopK(k, corpusFilter = corpusFilter), k,
      truthSql = Some(annBruteTopK(k, corpusFilter = corpusFilter)))

  /** Twin of VectorOps.graph2TopKFilteredFromIndex — the hierarchical
    * router composed with the filtered walk: the unrolled UNFILTERED
    * layer-1 beam (pure navigation), its final beam expanded two hops out
    * along the layer-0 edges (bridge-crossing entry), unioned with the
    * passing-only IVF seeds, scored against the passing assignment, then
    * the standard 2-hop filtered rounds.
    */
  def annGraph2FilteredTopK(
      k: Int = 10,
      degree: Int = VectorOps.GraphDegree,
      probe: Int = VectorOps.GraphProbe,
      beam: Int = VectorOps.GraphBeam,
      rounds: Int = VectorOps.GraphRounds,
      beam1: Int = VectorOps.Layer1Beam,
      rounds1: Int = VectorOps.Layer1Rounds,
      corpusFilter: String = "label % 2 = 0"): String =
    s"""WITH $embCte,
       |${graphCtes(degree, probe)},
       |nposted1 AS (SELECT vec_id, v, cell FROM nposted WHERE $layer1MemberSql),
       |${graphEdgePruneCtes("nposted1", "1", degree)},
       |$graphSeedCtes,
       |asg1 AS (SELECT vec_id, v, cell FROM asg WHERE $layer1MemberSql),
       |${seedScoreCte("useedscore", "asg1")},
       |${beamPruneCte("ubeam0", "useedscore", beam1)},
       |${beamRoundCtes("u", "edges1", rounds1, beam1)},
       |fasg AS (SELECT a.vec_id, a.v, a.cell FROM asg a
       |  JOIN e ON a.vec_id = e.vec_id WHERE ($corpusFilter)),
       |${seedScoreCte("fseedscore", "fasg")},
       |ehop1 AS (SELECT DISTINCT b.q_id, ed.dst AS nid
       |  FROM ubeam$rounds1 b JOIN edges ed ON b.nid = ed.src
       |  WHERE ed.dst <> b.q_id),
       |epool AS (SELECT DISTINCT q_id, nid FROM (
       |    SELECT q_id, nid FROM ubeam$rounds1
       |    UNION ALL SELECT q_id, nid FROM ehop1
       |    UNION ALL SELECT hh.q_id, ed.dst AS nid
       |      FROM ehop1 hh JOIN edges ed ON hh.nid = ed.src
       |      WHERE ed.dst <> hh.q_id
       |    UNION ALL SELECT q_id, nid FROM fseedscore)),
       |f2score0 AS (SELECT p.q_id, p.nid, round(${cosSql("q.qv", "sx.v")}, 6) AS cos
       |  FROM epool p JOIN q ON p.q_id = q.q_id JOIN fasg sx ON p.nid = sx.vec_id),
       |${beamPruneCte("f2beam0", "f2score0", beam)},
       |${beamRoundCtesFiltered("f2", "edges", rounds, beam, "fasg")}
       |${beamFinalSelect(s"f2beam$rounds", k)}""".stripMargin

  def annGraph2FilteredRecallReport(
      k: Int = 10, corpusFilter: String = "label % 2 = 0"): String =
    recallReportSql(annGraph2FilteredTopK(k, corpusFilter = corpusFilter), k,
      truthSql = Some(annBruteTopK(k, corpusFilter = corpusFilter)))

  /** Twin of VectorOps.quantizerDriftReport: label-mean quantizer,
    * nearest-cell assignment with the 6dp per-row cosine, parity
    * cohorts, per-cell occupancy (exact integer-quotient ppm) and
    * mean-cosine drift.
    */
  val quantizerDriftReport: String =
    s"""WITH $embCte,
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.v, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |asgc AS (SELECT vec_id, cell, ccos FROM (
       |    SELECT vec_id, cell, ccos,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |    FROM cscore) WHERE r = 1),
       |agg AS (SELECT cell,
       |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
       |    round(avg(CASE WHEN vec_id % 2 = 0 THEN ccos END), 6) AS mean_cos_ref,
       |    round(avg(CASE WHEN vec_id % 2 = 1 THEN ccos END), 6) AS mean_cos_cur
       |  FROM asgc GROUP BY 1)
       |SELECT cell, n_ref, n_cur,
       |  CAST(floor(abs(n_ref - n_cur) * 1000000 / (n_ref + n_cur)) AS BIGINT) AS occ_drift_ppm,
       |  mean_cos_ref, mean_cos_cur,
       |  round(mean_cos_cur - mean_cos_ref, 6) AS cos_drift
       |FROM agg""".stripMargin

  /** Twin of VectorOps.graphDegreeStats. */
  def annGraphDegreeStats(
      degree: Int = VectorOps.GraphDegree,
      probe: Int = VectorOps.GraphProbe): String =
    s"""WITH $embCte,
       |${graphCtes(degree, probe)},
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
       |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(deg) AS BIGINT) AS n_edges,
       |  CAST(min(deg) AS BIGINT) AS min_degree,
       |  round(avg(deg), 6) AS avg_degree,
       |  CAST(max(deg) AS BIGINT) AS max_degree
       |FROM deg""".stripMargin

  private def recallReportSql(
      approxSql: String, k: Int, truthSql: Option[String] = None): String =
    s"""WITH t AS (SELECT q_id, neighbor_id, rank AS t_rank FROM (
       |${truthSql.getOrElse(annBruteTopK(k))})),
       |a AS (SELECT q_id, neighbor_id, rank AS a_rank FROM (
       |$approxSql))
       |SELECT t.q_id,
       |  CAST(sum(CASE WHEN a.a_rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  round(CAST(sum(CASE WHEN a.a_rank IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / $k, 6) AS recall_at_k,
       |  max(CASE WHEN t.t_rank = 1 AND a.a_rank IS NOT NULL
       |    THEN round(1.0 / a.a_rank, 6) ELSE 0.0 END) AS rr
       |FROM t LEFT JOIN a ON t.q_id = a.q_id AND t.neighbor_id = a.neighbor_id
       |GROUP BY 1""".stripMargin

  /** `corpusFilter` (over `e` columns): restricts CANDIDATE rows only —
    * the filtered-ANN ground truth; the query set stays unrestricted.
    */
  def annBruteTopK(k: Int = 10, corpusFilter: String = "TRUE"): String =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
       |scored AS (SELECT q_id, vec_id AS neighbor_id,
       |    round(${cosSql("qv", "v")}, 6) AS cos
       |  FROM q JOIN e ON q_id <> vec_id WHERE ($corpusFilter)),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin

  /** `corpusFilter`: extra predicate (over `e` columns, carried through
    * `cscore`) restricting CANDIDATE rows — the filtered-ANN twin of
    * ivfScored's corpusPred. The quantizer CTEs stay corpus-wide, exactly
    * like the Spark side.
    */
  def annIvfTopK(
      k: Int = 10, nprobe: Int = 1, corpusFilter: String = "TRUE",
      scoreFilter: String = "TRUE"): String =
    s"""WITH $embCte,
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.label, e.v, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |ranked_cells AS (SELECT vec_id, label, v, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore),
       |asg AS (SELECT vec_id, v, cell FROM ranked_cells WHERE r = 1 AND ($corpusFilter)),
       |qasg AS (SELECT vec_id, v, cell FROM ranked_cells
       |  WHERE r <= $nprobe AND vec_id % 100 = 0),
       |scored AS (SELECT qa.vec_id AS q_id, ca.vec_id AS neighbor_id,
       |    round(${cosSql("qa.v", "ca.v")}, 6) AS cos
       |  FROM qasg qa JOIN asg ca
       |    ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored WHERE ($scoreFilter))
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin

  /** Twin of VectorOps.annRecallReport: the brute and IVF rankings as CTEs
    * (the same SQL the standalone oracles emit), joined on
    * (q_id, neighbor_id) — metrics from integer hits/ranks only.
    */
  def annRecallReport(k: Int = 10, nprobe: Int = 2): String =
    recallReportSql(annIvfTopK(k, nprobe), k)

  /** Twin of VectorOps.mrlIvfTopK: the annIvfTopK assignment CTEs (label
    * means, rounded-cos argmax, r ≤ nprobe query probes) with mrlTopK's
    * prefix-cosine stage-1 restricted to probed cells and the exact
    * full-dim re-rank of the shortlist only.
    */
  def mrlIvfTopK(
      k: Int = 10, prefixDim: Int = 16, shortlist: Int = 30,
      nprobe: Int = 2): String =
    s"""WITH $embCte,
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.v, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |ranked_cells AS (SELECT vec_id, v, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore),
       |asg AS (SELECT vec_id, v[1:$prefixDim] AS cp, cell FROM ranked_cells WHERE r = 1),
       |qasg AS (SELECT vec_id, v[1:$prefixDim] AS qp, cell FROM ranked_cells
       |  WHERE r <= $nprobe AND vec_id % 100 = 0),
       |pscored AS (SELECT qa.vec_id AS q_id, ca.vec_id AS neighbor_id,
       |    round(${cosSql("qa.qp", "ca.cp")}, 6) AS pcos
       |  FROM qasg qa JOIN asg ca
       |    ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id),
       |short AS (SELECT q_id, neighbor_id FROM (
       |  SELECT q_id, neighbor_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY pcos DESC, neighbor_id ASC) AS prank
       |  FROM pscored) WHERE prank <= $shortlist),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
       |exact AS (SELECT s.q_id, s.neighbor_id,
       |    round(${cosSql("q.qv", "c2.v")}, 6) AS cos
       |  FROM short s JOIN e c2 ON s.neighbor_id = c2.vec_id
       |  JOIN q ON s.q_id = q.q_id)
       |SELECT q_id, rank, neighbor_id, cos FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM exact) WHERE rank <= $k""".stripMargin

  /** Twin of VectorOps.mrlIvfRecallReport — the annRecallReport shape over
    * the composed MRL×IVF ranking.
    */
  def mrlIvfRecallReport(k: Int = 10): String =
    recallReportSql(mrlIvfTopK(k), k)

  /** Twin of VectorOps.mrlTopK: prefix-cosine shortlist (6dp + id
    * tie-break keeps the shortlist SET bit-identical), exact re-rank of
    * the shortlist only.
    */
  def mrlTopK(k: Int = 10, prefixDim: Int = 16, shortlist: Int = 30): String =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS q_id, v AS qv, v[1:$prefixDim] AS qp FROM e WHERE vec_id % 100 = 0),
       |c AS (SELECT vec_id, v, v[1:$prefixDim] AS cp FROM e),
       |pscored AS (SELECT q_id, vec_id AS neighbor_id,
       |    round(${cosSql("qp", "cp")}, 6) AS pcos
       |  FROM q JOIN c ON q_id <> vec_id),
       |short AS (SELECT q_id, neighbor_id FROM (
       |  SELECT q_id, neighbor_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY pcos DESC, neighbor_id ASC) AS prank
       |  FROM pscored) WHERE prank <= $shortlist),
       |exact AS (SELECT s.q_id, s.neighbor_id,
       |    round(${cosSql("q.qv", "c2.v")}, 6) AS cos
       |  FROM short s JOIN e c2 ON s.neighbor_id = c2.vec_id
       |  JOIN q ON s.q_id = q.q_id)
       |SELECT q_id, rank, neighbor_id, cos FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM exact) WHERE rank <= $k""".stripMargin

  /** Twin of VectorOps.mrlRecallReport — same composition as
    * pqRecallReport over the funnel ranking.
    */
  def mrlRecallReport(k: Int = 10): String =
    recallReportSql(mrlTopK(k), k)

  /** Twin of VectorOps.pqRecallReport: brute truth vs the PQ-ADC ranking,
    * metrics from integer hits/ranks only (the annRecallReport shape).
    */
  def pqRecallReport(k: Int = 10): String =
    recallReportSql(pqAdcTopK(k), k)

  val mediaMeta: String =
    s"""SELECT doc_id AS media_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image'
       |       WHEN doc_id % 3 = 1 THEN 'audio'
       |       ELSE 'video' END AS media_type,
       |  length(text) AS n_bytes,
       |  ${h("w", "text")} % 1280 + 1 AS width,
       |  ${h("h", "text")} % 720 + 1 AS height
       |FROM documents""".stripMargin

  /** Recursive-CTE twin of graft.streaming.Sessionize (batch mode): session
    * starts unfold one per user per iteration — the next start is the first
    * event breaking the gap (vs previous event) or the cap (vs session
    * start), exactly the Scala fold's decision order (gap label wins when
    * both break). Timestamps are truncated to epoch-millis throughout
    * because the Scala op folds on `Timestamp.getTime`.
    */
  def customSessions(gapMs: Long, capMs: Long): String =
    s"""WITH RECURSIVE ev AS (
       |  SELECT CAST(user_id AS VARCHAR) AS user_id, ts,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS i
       |  FROM events
       |),
       |sess(user_id, start_i) AS (
       |  SELECT user_id, CAST(1 AS BIGINT) FROM ev WHERE i = 1
       |  UNION ALL
       |  SELECT s.user_id, min(e.i)
       |  FROM sess s
       |  JOIN ev st ON st.user_id = s.user_id AND st.i = s.start_i
       |  JOIN ev e  ON e.user_id = s.user_id AND e.i > s.start_i
       |  JOIN ev p  ON p.user_id = s.user_id AND p.i = e.i - 1
       |  WHERE (epoch_ms(e.ts) - epoch_ms(p.ts) > $gapMs)
       |     OR (epoch_ms(e.ts) - epoch_ms(st.ts) > $capMs)
       |  GROUP BY s.user_id
       |),
       |bounds AS (
       |  SELECT user_id, start_i,
       |         lead(start_i) OVER (PARTITION BY user_id ORDER BY start_i) AS next_i
       |  FROM sess
       |),
       |agg AS (
       |  SELECT b.user_id, b.start_i, b.next_i,
       |         min(e.ts) AS session_start, max(e.ts) AS last_ts, count(*) AS n_events
       |  FROM bounds b JOIN ev e ON e.user_id = b.user_id
       |    AND e.i >= b.start_i AND (b.next_i IS NULL OR e.i < b.next_i)
       |  GROUP BY 1,2,3
       |)
       |SELECT a.user_id,
       |       make_timestamp(epoch_ms(a.session_start) * 1000) AS session_start,
       |       make_timestamp((epoch_ms(a.last_ts) + $gapMs) * 1000) AS session_end,
       |       a.n_events,
       |       CASE WHEN a.next_i IS NULL THEN 'flush'
       |            WHEN epoch_ms(nx.ts) - epoch_ms(pv.ts) > $gapMs THEN 'gap'
       |            ELSE 'cap' END AS closed_by
       |FROM agg a
       |LEFT JOIN ev nx ON nx.user_id = a.user_id AND nx.i = a.next_i
       |LEFT JOIN ev pv ON pv.user_id = a.user_id AND pv.i = a.next_i - 1""".stripMargin

  /** The unrolled-Lloyd CTE chain shared by every kmeans-backed oracle:
    * `e` must already be in scope; emits dims, it0 (seeded init),
    * it1..itN (assign + per-component mean), ranked_cells and asg (the
    * final per-vector cell assignment). Fixed `iters` is what makes the
    * loop unrollable; per-iteration 6dp rounding on BOTH engines stops
    * accumulation-order ulps compounding across iterations.
    */
  private def kmeansAsgCtes(kmK: Int, iters: Int): String =
    s"""${kmeansRankedCtes(kmK.toString, iters)},
       |asg AS (SELECT vec_id, v, cell FROM ranked_cells WHERE r = 1)""".stripMargin

  /** The chain without the final `asg` CTE (dims, it0..itN, ranked_cells)
    * for consumers that define their own assignment CTEs (the graph
    * family's graphSeedCtes also emits an `asg`). `kmKSql` is any scalar
    * SQL expression — an integer literal, or the DYNAMIC-K subquery
    * `autoKSql` that derives k = ceil(count/occupancy) from the corpus
    * itself, keeping the oracle hash-green at every SF without a
    * hard-coded cell count.
    */
  private def kmeansRankedCtes(kmKSql: String, iters: Int): String = {
    val init =
      s"""it0 AS (SELECT CAST(rn - 1 AS INT) AS cell, v AS centroid FROM (
         |  SELECT v, row_number() OVER (
         |    ORDER BY (vec_id * 2654435761) % 2147483647, vec_id) AS rn FROM e)
         |  WHERE rn <= ($kmKSql))""".stripMargin
    val iterCtes = (1 to iters).map { n =>
      s"""it${n}_asg AS (SELECT vec_id, v, cell FROM (
         |  SELECT e.vec_id, e.v, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.v", "c.centroid")}, 6) DESC, c.cell ASC) AS r
         |  FROM e CROSS JOIN it${n - 1} c) WHERE r = 1),
         |it${n}_comp AS (SELECT cell, pos, avg(v[pos]) AS m
         |  FROM it${n}_asg, dims GROUP BY 1, 2),
         |it$n AS (SELECT cell, list(round(m, 6) ORDER BY pos) AS centroid
         |  FROM it${n}_comp GROUP BY cell)""".stripMargin
    }.mkString(",\n")
    s"""dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |$init,
       |$iterCtes,
       |ranked_cells AS (SELECT e.vec_id, e.v, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(${cosSql("e.v", "c.centroid")}, 6) DESC, c.cell ASC) AS r
       |  FROM e CROSS JOIN it$iters c)""".stripMargin
  }

  /** The dynamic-k scalar subquery: k = ⌈count(e)/occupancy⌉, the SQL twin
    * of VectorOps.autoCellCount — both engines derive the same k from the
    * same corpus and the same occupancy constant.
    */
  private def autoKSql(
      occ: Int = VectorOps.QuantizerTargetOccupancy): String =
    s"SELECT greatest(1, CAST(ceil(count(*) / $occ.0) AS INT)) FROM e"

  /** Twin of VectorOps.kmeansCentroids + ivfTopK(coarse = kmeans). */
  def annIvfKmeansTopK(k: Int = 10, kmK: Int = 10, iters: Int = 3): String = {
    s"""WITH $embCte,
       |${kmeansAsgCtes(kmK, iters)},
       |qasg AS (SELECT vec_id, v, cell FROM ranked_cells
       |  WHERE r = 1 AND vec_id % 100 = 0),
       |scored AS (SELECT qa.vec_id AS q_id, ca.vec_id AS neighbor_id,
       |    round(${cosSql("qa.v", "ca.v")}, 6) AS cos
       |  FROM qasg qa JOIN asg ca
       |    ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Twin of ivfTopK over the OCCUPANCY-SIZED quantizer (kmCentsAutoOf):
    * the dynamic-k Lloyd chain + the annIvfKmeansTopK serving shape with
    * r ≤ nprobe query probes. Hash-green at any SF because k derives from
    * the corpus count on both engines.
    */
  def annIvfAutoTopK(
      k: Int = 10, nprobe: Int = 2,
      occ: Int = VectorOps.QuantizerTargetOccupancy, iters: Int = 3): String =
    s"""WITH $embCte,
       |${kmeansRankedCtes(autoKSql(occ), iters)},
       |asg AS (SELECT vec_id, v, cell FROM ranked_cells WHERE r = 1),
       |qasg AS (SELECT vec_id, v, cell FROM ranked_cells
       |  WHERE r <= $nprobe AND vec_id % 100 = 0),
       |scored AS (SELECT qa.vec_id AS q_id, ca.vec_id AS neighbor_id,
       |    round(${cosSql("qa.v", "ca.v")}, 6) AS cos
       |  FROM qasg qa JOIN asg ca
       |    ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin

  /** recall@k + MRR of the auto-quantizer IVF path vs brute truth. */
  def annIvfAutoRecallReport(k: Int = 10, nprobe: Int = 2): String =
    recallReportSql(annIvfAutoTopK(k, nprobe), k)

  /** Twin of the `quantizer_auto_report` query: the derived cell count and
    * the per-cell occupancy distribution of the occupancy-sized quantizer —
    * the one-row audit proving the cells ∝ N/occupancy discipline holds on
    * the corpus at hand (max_occupancy staying O(target) is what bounds
    * every within-cell join downstream).
    */
  def quantizerAutoReport(
      occ: Int = VectorOps.QuantizerTargetOccupancy, iters: Int = 3): String =
    s"""WITH $embCte,
       |${kmeansRankedCtes(autoKSql(occ), iters)},
       |asg AS (SELECT vec_id, cell FROM ranked_cells WHERE r = 1),
       |occ AS (SELECT cell, count(*) AS n FROM asg GROUP BY 1)
       |SELECT CAST($occ AS BIGINT) AS target_occupancy,
       |  CAST(count(*) AS BIGINT) AS k_cells,
       |  CAST(sum(n) AS BIGINT) AS n_vectors,
       |  CAST(min(n) AS BIGINT) AS min_occupancy,
       |  CAST(max(n) AS BIGINT) AS max_occupancy,
       |  round(avg(n), 6) AS avg_occupancy
       |FROM occ""".stripMargin

  /** Per-subspace PQ CTE chain (prefix p$s): sliced sub-vectors, the same
    * unrolled-Lloyd shape as kmeansAsgCtes (hashed-id init, 6dp-rounded
    * cosine argmax, 6dp-rounded means), ending in p${s}_cb (the codebook)
    * and p${s}_asg (the per-vector code). Twin of
    * VectorOps.pqCodebooks/pqEncode applied to subspace `s`.
    */
  private def pqSubCtes(s: Int, kmK: Int, iters: Int, src: String = "e"): String = {
    val lo = s * VectorOps.PqSubDim
    val hi = lo + VectorOps.PqSubDim
    val init =
      s"""p${s}_it0 AS (SELECT CAST(rn - 1 AS INT) AS cell, v AS centroid FROM (
         |  SELECT v, row_number() OVER (
         |    ORDER BY (vec_id * 2654435761) % 2147483647, vec_id) AS rn FROM es$s)
         |  WHERE rn <= $kmK)""".stripMargin
    val iterCtes = (1 to iters).map { n =>
      s"""p${s}_it${n}_asg AS (SELECT vec_id, v, cell FROM (
         |  SELECT e.vec_id, e.v, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.v", "c.centroid")}, 6) DESC, c.cell ASC) AS r
         |  FROM es$s e CROSS JOIN p${s}_it${n - 1} c) WHERE r = 1),
         |p${s}_it${n}_comp AS (SELECT cell, pos, avg(v[pos]) AS m
         |  FROM p${s}_it${n}_asg, sdims GROUP BY 1, 2),
         |p${s}_it$n AS (SELECT cell, list(round(m, 6) ORDER BY pos) AS centroid
         |  FROM p${s}_it${n}_comp GROUP BY cell)""".stripMargin
    }.mkString(",\n")
    s"""es$s AS (SELECT vec_id, v[${lo + 1}:$hi] AS v FROM $src),
       |$init,
       |$iterCtes,
       |p${s}_cb AS (SELECT cell, centroid FROM p${s}_it$iters),
       |p${s}_asg AS (SELECT vec_id, cell FROM (
       |  SELECT e.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(${cosSql("e.v", "c.centroid")}, 6) DESC, c.cell ASC) AS r
       |  FROM es$s e CROSS JOIN p${s}_cb c) WHERE r = 1)""".stripMargin
  }

  private def pqAllCtes(
      kmK: Int = VectorOps.PqK, iters: Int = VectorOps.PqIters,
      src: String = "e"): String =
    s"""sdims AS (SELECT unnest(range(1, ${VectorOps.PqSubDim + 1})) AS pos),
       |${(0 until VectorOps.PqM).map(s => pqSubCtes(s, kmK, iters, src)).mkString(",\n")}""".stripMargin

  /** Twin of VectorOps.pqCodebooksDf — scalar component rows read from the
    * final iteration's mean CTE (whose 6dp-rounded values ARE the codebook
    * list entries).
    */
  def pqCodebooks: String = {
    val it = VectorOps.PqIters
    val union = (0 until VectorOps.PqM)
      .map(s => s"SELECT $s AS subspace, cell, CAST(pos AS BIGINT) AS pos, " +
        s"round(m, 6) AS m FROM p${s}_it${it}_comp")
      .mkString(" UNION ALL ")
    s"""WITH $embCte,
       |${pqAllCtes()}
       |$union""".stripMargin
  }

  /** Twin of VectorOps.pqEncode over the trained codebooks: the encoded
    * artifact (vec_id, 6dp norm, m codes) checked directly.
    */
  def pqEncode: String = {
    val codeJoins = (0 until VectorOps.PqM)
      .map(s => s"JOIN p${s}_asg a$s ON e.vec_id = a$s.vec_id").mkString(" ")
    val codeCols = (0 until VectorOps.PqM).map(s => s"a$s.cell AS c$s").mkString(", ")
    s"""WITH $embCte,
       |${pqAllCtes()}
       |SELECT e.vec_id, round(sqrt(list_dot_product(e.v, e.v)), 6) AS vnorm, $codeCols
       |FROM e $codeJoins""".stripMargin
  }

  /** Twin of VectorOps.pqAdcTopK: codes joined back to codebooks, list
    * concat = the reconstructed vector, exact-query / stored-norm cosine.
    */
  def pqAdcTopK(k: Int = 10): String = pqAdcTopKFrom(embCte, k)

  /** Leading CTE block that rebinds `e` to the Hadamard-rotated corpus:
    * sign(i,j) = (−1)^bit_count(i AND j) replayed with DuckDB's bit_count,
    * j-ascending sum per output coordinate, ×1/√d (exact 0.125 for d=64,
    * the identical multiply the FWHT kernel applies), then the kernel's
    * own ⌊x·2²⁰+½⌋/2²⁰ dyadic quantizer (see HadamardRotate scaladoc:
    * binary-grid components keep the k-means replay's sums exact, where
    * a decimal grid put centroid means on .5 rounding boundaries that the
    * engines resolved apart). MATERIALIZED: every downstream PQ CTE
    * references `e` — inlined, DuckDB re-executes the d² rotation per
    * reference and runs out of memory.
    */
  private def rotEmbCte: String = {
    val d = VectorOps.EmbeddingDim
    val inv = 1.0 / math.sqrt(d.toDouble)
    s"""e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |hd AS (SELECT unnest(range(0, $d)) AS i),
       |hrot AS (SELECT a.vec_id, a.label, i.i AS i,
       |    floor(sum(CASE WHEN bit_count(i.i & j.i) % 2 = 0
       |                   THEN a.v[j.i + 1] ELSE -a.v[j.i + 1] END
       |              ORDER BY j.i) * $inv * 1048576.0 + 0.5) / 1048576.0 AS r
       |  FROM e0 a CROSS JOIN hd i CROSS JOIN hd j GROUP BY 1, 2, 3),
       |e AS MATERIALIZED (SELECT vec_id, label, list(r ORDER BY i) AS v FROM hrot GROUP BY 1, 2)""".stripMargin
  }

  /** Twin of VectorOps.pqRotAdcTopK: the pqAdcTopK statement verbatim over
    * the rotated `e` — rotation happens before training, encoding, and
    * query projection alike, exactly as the Spark path rotates once at the
    * frame boundary.
    */
  def pqRotAdcTopK(k: Int = 10): String = pqAdcTopKFrom(rotEmbCte, k)

  /** Twin of VectorOps.pqRotRecallReport: brute truth stays on the RAW
    * corpus (cosine is rotation-invariant, so the truth set is unchanged);
    * only the approximate ranking runs in rotated space.
    */
  def pqRotRecallReport(k: Int = 10): String =
    recallReportSql(pqRotAdcTopK(k), k)

  /** Leading CTE block that rebinds `e` to the OPQ-allocated corpus —
    * the variance-balanced snake permutation replayed as pure SQL: both
    * moments 6dp-rounded (the meanVector convention), variance to exact
    * integer micro-units, one rank window (variance DESC, dim ASC), the
    * closed-form snake target, and one within-subspace order window;
    * the permuted vector is a list() re-gather ordered by the new
    * position. MATERIALIZED like the Hadamard twin — every downstream PQ
    * CTE references `e`.
    */
  private def opqEmbCte: String = {
    val d = VectorOps.EmbeddingDim
    val m = VectorOps.PqM
    s"""e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |odims AS (SELECT unnest(range(1, ${d + 1})) AS j),
       |dvar AS (SELECT j, CAST(round(
       |    (round(avg(v[j] * v[j]), 6) - round(avg(v[j]), 6) * round(avg(v[j]), 6))
       |    * 1000000, 0) AS BIGINT) AS micro
       |  FROM e0 CROSS JOIN odims GROUP BY j),
       |drank AS (SELECT j, row_number() OVER (ORDER BY micro DESC, j ASC) - 1 AS r
       |  FROM dvar),
       |dsnake AS (SELECT j, r,
       |    CASE WHEN ((r // $m) % 2) = 0 THEN r % $m ELSE $m - 1 - (r % $m) END AS s
       |  FROM drank),
       |operm AS (SELECT j, s * ${VectorOps.PqSubDim} +
       |    row_number() OVER (PARTITION BY s ORDER BY r ASC) AS p FROM dsnake),
       |e AS MATERIALIZED (SELECT vec_id, label, list(v[j] ORDER BY p) AS v
       |  FROM e0 CROSS JOIN operm GROUP BY vec_id, label)""".stripMargin
  }

  /** Twin of VectorOps.pqOpqAdcTopK: the pqAdcTopK statement verbatim
    * over the OPQ-permuted `e` — allocation happens before training,
    * encoding, and query projection alike.
    */
  def pqOpqAdcTopK(k: Int = 10): String = pqAdcTopKFrom(opqEmbCte, k)

  /** Twin of VectorOps.pqOpqRecallReport: brute truth on the RAW corpus
    * (permutation-invariant cosine), approximate ranking in allocated
    * space.
    */
  def pqOpqRecallReport(k: Int = 10): String =
    recallReportSql(pqOpqAdcTopK(k), k)

  /** Shared leading CTE block for the SPANN twins: label-mean centroids,
    * the per-(vec, cell) rounded centroid cosine with its (ccos DESC,
    * cell ASC) rank, and the CLOSURE posting table — rank ≤ maxReplicas
    * AND ccos within eps of the vector's best (both sides 6dp-rounded
    * doubles minus an exact constant, the engine-exact cut the Spark
    * projection makes).
    */
  private def spannCtes(eps: Double, maxReplicas: Int): String =
    s"""$embCte,
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.v, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |ranked_cells AS (SELECT vec_id, v, cell, ccos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r,
       |    max(ccos) OVER (PARTITION BY vec_id) AS best
       |  FROM cscore),
       |posted AS (SELECT vec_id, v, cell, r FROM ranked_cells
       |  WHERE r <= $maxReplicas AND ccos >= best - $eps)""".stripMargin

  /** Twin of VectorOps.spannTopK: single-probe queries over the closure
    * postings, candidates de-duplicated (a boundary vector posted to
    * several probed cells surfaces once).
    */
  def annSpannTopK(
      k: Int = 10, nprobe: Int = 1,
      eps: Double = VectorOps.SpannEps,
      maxReplicas: Int = VectorOps.SpannMaxReplicas): String =
    s"""WITH ${spannCtes(eps, maxReplicas)},
       |qasg AS (SELECT vec_id, v, cell FROM ranked_cells
       |  WHERE r <= $nprobe AND vec_id % 100 = 0),
       |scored AS (SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS neighbor_id,
       |    round(${cosSql("qa.v", "ca.v")}, 6) AS cos
       |  FROM qasg qa JOIN posted ca
       |    ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin

  /** Twin of VectorOps.spannRecallReport. */
  def spannRecallReport(k: Int = 10): String =
    recallReportSql(annSpannTopK(k), k)

  /** Twin of VectorOps.spannCellStats: postings per cell split into
    * primary (r = 1) vs boundary replicas.
    */
  def spannCellStats(
      eps: Double = VectorOps.SpannEps,
      maxReplicas: Int = VectorOps.SpannMaxReplicas): String =
    s"""WITH ${spannCtes(eps, maxReplicas)}
       |SELECT cell,
       |  CAST(count(*) AS BIGINT) AS n_postings,
       |  CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_primary,
       |  CAST(sum(CASE WHEN r > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary
       |FROM posted GROUP BY 1""".stripMargin

  private def pqAdcTopKFrom(lead: String, k: Int): String = {
    val codeJoins = (0 until VectorOps.PqM)
      .map(s => s"JOIN p${s}_asg a$s ON e.vec_id = a$s.vec_id").mkString(" ")
    val codeCols = (0 until VectorOps.PqM).map(s => s"a$s.cell AS c$s").mkString(", ")
    val cbJoins = (0 until VectorOps.PqM)
      .map(s => s"JOIN p${s}_cb cb$s ON c.c$s = cb$s.cell").mkString(" ")
    val rv = (0 until VectorOps.PqM).map(s => s"cb$s.centroid").mkString(" || ")
    s"""WITH $lead,
       |${pqAllCtes()},
       |codes AS (SELECT e.vec_id,
       |    round(sqrt(list_dot_product(e.v, e.v)), 6) AS vnorm, $codeCols
       |  FROM e $codeJoins),
       |rec AS (SELECT c.vec_id AS neighbor_id, c.vnorm, $rv AS rv
       |  FROM codes c $cbJoins),
       |q AS (SELECT vec_id AS q_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
       |  FROM e WHERE vec_id % 100 = 0),
       |scored AS (SELECT q_id, neighbor_id,
       |    round(list_dot_product(qv, rv) / (qn * vnorm), 6) AS cos
       |  FROM q JOIN rec ON q_id <> neighbor_id),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Twin of VectorOps.ivfPqTopK: the annIvfTopK coarse-assignment CTEs
    * (label means, rounded-cos argmax, r ≤ nprobe probes) composed with
    * pqAdcTopK's codebook-replay/reconstruction CTEs — ADC scoring
    * restricted to probed cells.
    */
  def ivfPqTopK(
      k: Int = 10, nprobe: Int = 2, corpusFilter: String = "TRUE"): String = {
    val codeJoins = (0 until VectorOps.PqM)
      .map(s => s"JOIN p${s}_asg a$s ON e.vec_id = a$s.vec_id").mkString(" ")
    val codeCols = (0 until VectorOps.PqM).map(s => s"a$s.cell AS c$s").mkString(", ")
    val cbJoins = (0 until VectorOps.PqM)
      .map(s => s"JOIN p${s}_cb cb$s ON c.c$s = cb$s.cell").mkString(" ")
    val rv = (0 until VectorOps.PqM).map(s => s"cb$s.centroid").mkString(" || ")
    s"""WITH $embCte,
       |dims AS (SELECT unnest(range(1, ${VectorOps.EmbeddingDim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.label, e.v, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |ranked_cells AS (SELECT vec_id, label, v, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore),
       |casg AS (SELECT vec_id, cell FROM ranked_cells
       |  WHERE r = 1 AND ($corpusFilter)),
       |qasg AS (SELECT vec_id, v, cell FROM ranked_cells
       |  WHERE r <= $nprobe AND vec_id % 100 = 0),
       |${pqAllCtes()},
       |codes AS (SELECT e.vec_id,
       |    round(sqrt(list_dot_product(e.v, e.v)), 6) AS vnorm, $codeCols
       |  FROM e $codeJoins),
       |rec AS (SELECT c.vec_id AS neighbor_id, c.vnorm, $rv AS rv
       |  FROM codes c $cbJoins),
       |scored AS (SELECT qa.vec_id AS q_id, rec.neighbor_id,
       |    round(list_dot_product(qa.v, rec.rv)
       |      / (sqrt(list_dot_product(qa.v, qa.v)) * rec.vnorm), 6) AS cos
       |  FROM qasg qa JOIN casg ca
       |    ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id
       |  JOIN rec ON rec.neighbor_id = ca.vec_id),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Twin of VectorOps.ivfPqRecallReport — the annRecallReport shape over
    * the compressed cell-pruned ranking.
    */
  def ivfPqRecallReport(k: Int = 10): String =
    recallReportSql(ivfPqTopK(k), k)

  /** Twin of VectorOps.ivfPqRefineTopK: the full ivfPqTopK statement at
    * rerankK becomes the shortlist derived table (same 6dp-rounded ADC
    * ranking, neighbor-id tie-break ⇒ identical shortlist SET), then the
    * exact brute-force scoring rule re-ranks the fetched rows.
    */
  def ivfPqRefineTopK(
      k: Int = 10,
      rerankK: Int = VectorOps.RerankShortlist,
      nprobe: Int = 2): String =
    s"""WITH short AS (SELECT q_id, neighbor_id FROM (
       |${ivfPqTopK(rerankK, nprobe)}
       |) s),
       |e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ex AS (SELECT sh.q_id, sh.neighbor_id,
       |    round(${cosSql("qe.v", "ce.v")}, 6) AS cos
       |  FROM short sh
       |  JOIN e2 ce ON sh.neighbor_id = ce.vec_id
       |  JOIN e2 qe ON sh.q_id = qe.vec_id)
       |SELECT q_id, rank, neighbor_id, cos FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM ex) WHERE rank <= $k""".stripMargin

  /** Twin of VectorOps.ivfPqRefineRecallReport. */
  def ivfPqRefineRecallReport(k: Int = 10): String =
    recallReportSql(ivfPqRefineTopK(k), k)

  /** Twin of VectorOps.ivfRpqTopK (residual IVFPQ): the coarse-assignment
    * CTEs feed a residual CTE (v − assigned 6dp centroid, index-lambda
    * subtraction), the standard PQ replay trains/encodes over `res`, and
    * scoring decomposes as q·centroid[cell] (per probe row) + q·rec(codes)
    * (per candidate) — token-for-token the Spark expression.
    */
  def ivfRpqTopK(k: Int = 10, nprobe: Int = 2): String = {
    val dim = VectorOps.EmbeddingDim
    val codeJoins = (0 until VectorOps.PqM)
      .map(s => s"JOIN p${s}_asg a$s ON e.vec_id = a$s.vec_id").mkString(" ")
    val codeCols = (0 until VectorOps.PqM).map(s => s"a$s.cell AS c$s").mkString(", ")
    val cbJoins = (0 until VectorOps.PqM)
      .map(s => s"JOIN p${s}_cb cb$s ON c.c$s = cb$s.cell").mkString(" ")
    val rv = (0 until VectorOps.PqM).map(s => s"cb$s.centroid").mkString(" || ")
    s"""WITH $embCte,
       |dims AS (SELECT unnest(range(1, ${dim + 1})) AS pos),
       |comp AS (SELECT label, pos, avg(v[pos]) AS m FROM e, dims GROUP BY 1, 2),
       |cent AS (SELECT label AS cell, list(round(m, 6) ORDER BY pos) AS centroid
       |  FROM comp GROUP BY label),
       |cscore AS (SELECT e.vec_id, e.v, cent.cell,
       |    round(${cosSql("e.v", "centroid")}, 6) AS ccos
       |  FROM e CROSS JOIN cent),
       |ranked_cells AS (SELECT vec_id, v, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscore),
       |casg AS (SELECT vec_id, cell FROM ranked_cells WHERE r = 1),
       |res AS (SELECT rc.vec_id,
       |    list_transform(range(1, ${dim + 1}), i -> rc.v[i] - c.centroid[i]) AS v
       |  FROM ranked_cells rc JOIN cent c ON rc.cell = c.cell WHERE rc.r = 1),
       |${pqAllCtes(src = "res")},
       |codes AS (SELECT e.vec_id,
       |    round(sqrt(list_dot_product(e.v, e.v)), 6) AS vnorm, $codeCols
       |  FROM e $codeJoins),
       |rec AS (SELECT c.vec_id AS neighbor_id, c.vnorm, $rv AS rv
       |  FROM codes c $cbJoins),
       |qasg AS (SELECT rc.vec_id, rc.v, rc.cell,
       |    list_dot_product(rc.v, c.centroid) AS qdotc
       |  FROM ranked_cells rc JOIN cent c ON rc.cell = c.cell
       |  WHERE rc.r <= $nprobe AND rc.vec_id % 100 = 0),
       |scored AS (SELECT qa.vec_id AS q_id, rec.neighbor_id,
       |    round((qa.qdotc + list_dot_product(qa.v, rec.rv))
       |      / (sqrt(list_dot_product(qa.v, qa.v)) * rec.vnorm), 6) AS cos
       |  FROM qasg qa JOIN casg ca
       |    ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id
       |  JOIN rec ON rec.neighbor_id = ca.vec_id),
       |ranked AS (SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Twin of VectorOps.ivfRpqRecallReport. */
  def ivfRpqRecallReport(k: Int = 10): String =
    recallReportSql(ivfRpqTopK(k), k)

  /** Twin of VectorOps.semanticDedup: unrolled-Lloyd assignment, then
    * within-cell near-dup pairs drop the higher vec_id.
    */
  def semanticDedup(kmK: Int = 10, iters: Int = 3, threshold: Double = 0.35): String =
    s"""WITH $embCte,
       |${kmeansAsgCtes(kmK, iters)},
       |drops AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(${cosSql("a.v", "b.v")}, 6) >= $threshold)
       |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
       |FROM asg a LEFT JOIN drops d ON a.vec_id = d.vec_id""".stripMargin

  /** Subcell CTE chain shared by the capped-SemDeDup twins: the final
    * Lloyd assignment re-joined to its centroids for the winning cosine,
    * then subcell = ⌊(rank-1)/cap⌋ under (ccos DESC, vec_id ASC).
    */
  private def subcellCtes(kmK: Int, iters: Int, cap: Int): String =
    s"""${kmeansAsgCtes(kmK, iters)},
       |asgx AS (SELECT a.vec_id, a.v, a.cell,
       |    round(${cosSql("a.v", "c.centroid")}, 6) AS ccos
       |  FROM asg a JOIN it$iters c ON a.cell = c.cell),
       |subc AS (SELECT vec_id, v, cell,
       |    CAST((row_number() OVER (PARTITION BY cell
       |      ORDER BY ccos DESC, vec_id ASC) - 1) // $cap AS INT) AS subcell
       |  FROM asgx)""".stripMargin

  /** Twin of VectorOps.semanticDedupCapped: the unrolled-Lloyd
    * assignment, deterministic subcell chunking, and within-(cell,
    * subcell) drops.
    */
  def semanticDedupCapped(
      kmK: Int = 10, iters: Int = 3, threshold: Double = 0.35,
      cap: Int = VectorOps.SemDedupCellCap): String =
    s"""WITH $embCte,
       |${subcellCtes(kmK, iters, cap)},
       |drops AS (SELECT DISTINCT b.vec_id FROM subc a JOIN subc b
       |    ON a.cell = b.cell AND a.subcell = b.subcell AND a.vec_id < b.vec_id
       |  WHERE round(${cosSql("a.v", "b.v")}, 6) >= $threshold)
       |SELECT s.vec_id, s.cell, s.subcell, (d.vec_id IS NULL) AS kept
       |FROM subc s LEFT JOIN drops d ON s.vec_id = d.vec_id""".stripMargin

  /** Twin of VectorOps.semanticDedupCapReport — per-cell cap accounting:
    * pair-scan volume and drop counts, capped vs uncapped.
    */
  def semanticDedupCapReport(
      kmK: Int = 10, iters: Int = 3, threshold: Double = 0.35,
      cap: Int = VectorOps.SemDedupCellCap): String =
    s"""WITH $embCte,
       |${subcellCtes(kmK, iters, cap)},
       |occ AS (SELECT cell, CAST(count(*) AS BIGINT) AS occupancy,
       |    CAST(count(DISTINCT subcell) AS BIGINT) AS n_subcells
       |  FROM subc GROUP BY 1),
       |ssz AS (SELECT cell, subcell, count(*) AS m FROM subc GROUP BY 1, 2),
       |pc AS (SELECT cell, CAST(sum(m * (m - 1) // 2) AS BIGINT) AS pairs_capped
       |  FROM ssz GROUP BY 1),
       |dcap AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_drops_capped FROM (
       |    SELECT DISTINCT a.cell, b.vec_id FROM subc a JOIN subc b
       |      ON a.cell = b.cell AND a.subcell = b.subcell AND a.vec_id < b.vec_id
       |    WHERE round(${cosSql("a.v", "b.v")}, 6) >= $threshold) GROUP BY 1),
       |dfull AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_drops_uncapped FROM (
       |    SELECT DISTINCT a.cell, b.vec_id FROM subc a JOIN subc b
       |      ON a.cell = b.cell AND a.vec_id < b.vec_id
       |    WHERE round(${cosSql("a.v", "b.v")}, 6) >= $threshold) GROUP BY 1)
       |SELECT o.cell, o.occupancy, o.n_subcells, pc.pairs_capped,
       |  CAST(o.occupancy * (o.occupancy - 1) // 2 AS BIGINT) AS pairs_uncapped,
       |  coalesce(dcap.n_drops_capped, 0) AS n_drops_capped,
       |  coalesce(dfull.n_drops_uncapped, 0) AS n_drops_uncapped
       |FROM occ o JOIN pc USING (cell)
       |LEFT JOIN dcap USING (cell) LEFT JOIN dfull USING (cell)""".stripMargin

  /** Twin of the composed `embedding_curation_pipeline` query, built from
    * the same fragments the individual oracles use (unrolled-Lloyd
    * assignment → tightness gate → SemDeDup drops among the gated →
    * per-cell hash-priority cap), so the composition cannot drift from
    * its parts.
    */
  def embeddingCurationPipeline(
      kmK: Int = 10, iters: Int = 3,
      gateMinCos: Double = VectorOps.GateMinCos,
      threshold: Double = 0.35,
      cap: Int = VectorOps.CellCap,
      dedupCap: Int = VectorOps.SemDedupCellCap): String =
    s"""WITH $embCte,
       |${kmeansAsgCtes(kmK, iters)},
       |cc AS MATERIALIZED (SELECT a.vec_id, a.cell, a.v,
       |    round(${cosSql("a.v", "c.centroid")}, 6) AS ccos
       |  FROM asg a JOIN it$iters c ON a.cell = c.cell
       |  WHERE round(${cosSql("a.v", "c.centroid")}, 6) >= $gateMinCos),
       |ccs AS (SELECT vec_id, cell, v,
       |    CAST((row_number() OVER (PARTITION BY cell
       |      ORDER BY ccos DESC, vec_id ASC) - 1) // $dedupCap AS INT) AS subcell
       |  FROM cc),
       |drops AS (SELECT DISTINCT b.vec_id FROM ccs a JOIN ccs b
       |    ON a.cell = b.cell AND a.subcell = b.subcell AND a.vec_id < b.vec_id
       |  WHERE round(${cosSql("a.v", "b.v")}, 6) >= $threshold),
       |surv AS (SELECT vec_id, cell FROM cc
       |  WHERE vec_id NOT IN (SELECT vec_id FROM drops)),
       |rk AS (SELECT cell, vec_id,
       |    CAST(row_number() OVER (PARTITION BY cell
       |      ORDER BY ${h("ecp", "CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) AS INT) AS rank
       |  FROM surv)
       |SELECT cell, rank, vec_id FROM rk WHERE rank <= $cap""".stripMargin

  /** Twin of VectorOps.randomProjection: the Rademacher rows render from
    * VectorOps.rpSigns verbatim, so both engines project with the same
    * matrix by construction.
    */
  val randomProjection: String = {
    val scale = s"sqrt(${VectorOps.RpDim}.0)"
    val cols = (0 until VectorOps.RpDim).map { j =>
      val arr = VectorOps.rpSigns(j)
        .map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"round(list_dot_product(v, CAST($arr AS DOUBLE[])) / $scale, 6) AS r$j"
    }.mkString(",\n  ")
    s"""WITH $embCte
       |SELECT vec_id,
       |  $cols
       |FROM e""".stripMargin
  }

  val mediaTypedMeta: String = {
    val t = "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"
    s"""SELECT doc_id AS media_id, $t AS media_type, length(text) AS n_bytes,
       |  CASE WHEN ($t) = 'audio' THEN ${h("sr", "text")} % 4 * 16000 + 8000 END AS sample_rate,
       |  CASE WHEN ($t) = 'audio' THEN ${h("ch", "text")} % 2 + 1 END AS channels,
       |  CASE WHEN ($t) = 'video' THEN ${h("fps", "text")} % 3 * 6 + 18 END AS fps,
       |  CASE WHEN ($t) = 'video' THEN ${h("dur", "text")} % 300 + 1 END AS duration_s,
       |  CASE WHEN ($t) = 'image' THEN ${h("w", "text")} % 1280 + 1 END AS width,
       |  CASE WHEN ($t) = 'image' THEN ${h("h", "text")} % 720 + 1 END AS height
       |FROM documents""".stripMargin
  }

  /** Byte-moments twin of Multimodal.stubDecode: documents text is ASCII
    * (verified in testdata), so per-char `ord` == per-byte value and
    * char length == byte length. Sum/sumsq accumulate exactly as integers
    * on both sides; the divisions mirror the Scala operation order
    * (sum/n, sumSq/n - mean*mean) so the doubles agree bit-for-bit before
    * the final round(·, 6).
    */
  val mediaFeatures: String =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image'
       |         WHEN doc_id % 3 = 1 THEN 'audio'
       |         ELSE 'video' END AS media_type,
       |    text, length(text) AS n FROM documents),
       |u AS (SELECT media_id, text, n, unnest(range(1, n + 1)) AS i FROM m),
       |agg AS (SELECT media_id,
       |    sum(ord(substr(text, CAST(i AS INT), 1))) AS s,
       |    sum(ord(substr(text, CAST(i AS INT), 1)) * ord(substr(text, CAST(i AS INT), 1))) AS s2,
       |    min(ord(substr(text, CAST(i AS INT), 1))) AS mn,
       |    max(ord(substr(text, CAST(i AS INT), 1))) AS mx
       |  FROM u GROUP BY 1)
       |SELECT m.media_id, m.media_type, CAST(m.n AS INT) AS n_bytes,
       |  round(CAST(m.n AS DOUBLE), 6) AS f0,
       |  CASE WHEN m.n = 0 THEN 0.0 ELSE round(CAST(s AS DOUBLE) / m.n, 6) END AS f1,
       |  CASE WHEN m.n = 0 THEN 0.0 ELSE round(CAST(s2 AS DOUBLE) / m.n - (CAST(s AS DOUBLE) / m.n) * (CAST(s AS DOUBLE) / m.n), 6) END AS f2,
       |  CASE WHEN m.n = 0 THEN 0.0 ELSE round(CAST(mn AS DOUBLE), 6) END AS f3,
       |  CASE WHEN m.n = 0 THEN 0.0 ELSE round(CAST(mx AS DOUBLE), 6) END AS f4,
       |  CASE WHEN m.n = 0 THEN 0.0 ELSE round(CAST(ord(substr(m.text, 1, 1)) AS DOUBLE), 6) END AS f5,
       |  CASE WHEN m.n = 0 THEN 0.0 ELSE round(CAST(ord(substr(m.text, m.n, 1)) AS DOUBLE), 6) END AS f6,
       |  CASE WHEN m.n = 0 THEN 0.0 ELSE round(CAST(ord(substr(m.text, CAST(m.n // 2 AS INT) + 1, 1)) AS DOUBLE), 6) END AS f7
       |FROM m LEFT JOIN agg ON m.media_id = agg.media_id""".stripMargin

  /** Shared CTE chain replaying the perceptual blockhash over the PLANTED
    * media corpus (Multimodal.withPlantedMediaDups + stubPerceptual):
    * equal-fraction 64-block byte means vs the payload mean as all-integer
    * cross products, packed into four 16-bit band words. `phx` densifies
    * to exactly 4 band rows per media (short payloads leave bands unset =
    * 0, matching the Scala zero-init). MATERIALIZED: each CTE feeds
    * several consumers.
    */
  private def mediaPhashCtes: String = {
    val (blocks, bandBits) =
      (graft.ops.Multimodal.PhashBlocks, graft.ops.Multimodal.PhashBandBits)
    val bands = graft.ops.Multimodal.PhashBands
    s"""pd AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${graft.ops.Multimodal.PlantOffset},
       |    substr(text, 1, 9) || 'zzz' || substr(text, 13),
       |    '${graft.ops.Multimodal.RepostSource}'
       |  FROM documents
       |  WHERE doc_id % ${graft.ops.Multimodal.PlantEvery} = 0 AND length(text) >= 64),
       |m AS (SELECT doc_id AS media_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image'
       |         WHEN doc_id % 3 = 1 THEN 'audio'
       |         ELSE 'video' END AS media_type,
       |    text, length(text) AS n, source FROM pd),
       |u AS (SELECT media_id, text, n, unnest(range(0, n)) AS i FROM m),
       |bs AS MATERIALIZED (SELECT media_id, n, (i * $blocks) // n AS blk,
       |    CAST(sum(ord(substr(text, CAST(i + 1 AS INT), 1))) AS BIGINT) AS s,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM u GROUP BY 1, 2, 3),
       |tot AS (SELECT media_id, CAST(sum(s) AS BIGINT) AS t FROM bs GROUP BY 1),
       |phr AS MATERIALIZED (SELECT bs.media_id, CAST(blk // $bandBits AS INT) AS band,
       |    CAST(sum(CASE WHEN s * n > t * w
       |      THEN (1 << CAST(blk % $bandBits AS INT)) ELSE 0 END) AS INT) AS bw
       |  FROM bs JOIN tot USING (media_id) GROUP BY 1, 2),
       |phx AS MATERIALIZED (SELECT g.media_id, g.band, CAST(coalesce(phr.bw, 0) AS INT) AS bw
       |  FROM (SELECT m.media_id, j.band FROM m,
       |    (SELECT CAST(unnest(range(0, $bands)) AS INT) AS band) j) g
       |  LEFT JOIN phr ON g.media_id = phr.media_id AND g.band = phr.band)"""
      .stripMargin
  }

  /** Twin of Multimodal.perceptualHash over the planted corpus. */
  val mediaPhash: String = {
    val pivots = (0 until graft.ops.Multimodal.PhashBands)
      .map(j => s"CAST(max(CASE WHEN band = $j THEN bw END) AS INT) AS pb$j")
      .mkString(",\n  ")
    s"""WITH $mediaPhashCtes
       |SELECT m.media_id, m.media_type,
       |  $pivots
       |FROM phx JOIN m USING (media_id)
       |GROUP BY 1, 2""".stripMargin
  }

  private def mediaPairCtes: String =
    s"""cand AS (SELECT a.media_id AS ma, b.media_id AS mb
       |  FROM phx a JOIN phx b
       |    ON a.band = b.band AND a.bw = b.bw AND a.media_id < b.media_id
       |  GROUP BY 1, 2),
       |hams AS MATERIALIZED (SELECT c.ma, c.mb,
       |    CAST(sum(bit_count(xor(CAST(pa.bw AS BIGINT), CAST(pb.bw AS BIGINT)))) AS BIGINT)
       |      AS hamming
       |  FROM cand c
       |  JOIN phx pa ON pa.media_id = c.ma
       |  JOIN phx pb ON pb.media_id = c.mb AND pb.band = pa.band
       |  GROUP BY 1, 2)""".stripMargin

  /** Twin of Multimodal.mediaNearDupPairs: banded candidates (any
    * identical 16-bit band word) + exact-Hamming verify.
    */
  def mediaNearDupPairs(maxHam: Int = graft.ops.Multimodal.PhashMaxHam): String =
    s"""WITH $mediaPhashCtes,
       |$mediaPairCtes
       |SELECT ma AS media_a, mb AS media_b, hamming
       |FROM hams WHERE hamming <= $maxHam""".stripMargin

  /** Twin of Multimodal.mediaBandStats — the per-band saturation audit. */
  def mediaBandStats(cap: Int = graft.ops.Multimodal.MediaBucketCap): String =
    s"""WITH $mediaPhashCtes,
       |occ AS (SELECT band, bw, count(*) AS m FROM phx GROUP BY 1, 2)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(m) AS BIGINT) AS max_occupancy,
       |  CAST(sum(m * (m - 1) // 2) AS BIGINT) AS candidate_pairs,
       |  CAST(sum(CASE WHEN m > $cap THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_buckets_over_cap,
       |  CAST(sum(CASE WHEN m > $cap THEN m * (m - 1) // 2 ELSE 0 END) AS BIGINT)
       |    AS candidates_over_cap
       |FROM occ GROUP BY band""".stripMargin

  /** Capped twin of `mediaPairCtes` (same terminal `hams` name so pipeline
    * consumers can swap pair variants without touching their downstream
    * CTEs): candidates restricted to buckets at-or-under the cap; the
    * exact-Hamming verify still reads every band word of the surviving
    * pairs.
    */
  private def mediaPairCappedCtes(cap: Int): String =
    s"""occ AS (SELECT band, bw, count(*) AS m FROM phx GROUP BY 1, 2),
       |phs AS (SELECT phx.* FROM phx
       |  JOIN occ ON phx.band = occ.band AND phx.bw = occ.bw
       |  WHERE occ.m <= $cap),
       |cand AS (SELECT a.media_id AS ma, b.media_id AS mb
       |  FROM phs a JOIN phs b
       |    ON a.band = b.band AND a.bw = b.bw AND a.media_id < b.media_id
       |  GROUP BY 1, 2),
       |hams AS MATERIALIZED (SELECT c.ma, c.mb,
       |    CAST(sum(bit_count(xor(CAST(pa.bw AS BIGINT), CAST(pb.bw AS BIGINT)))) AS BIGINT)
       |      AS hamming
       |  FROM cand c
       |  JOIN phx pa ON pa.media_id = c.ma
       |  JOIN phx pb ON pb.media_id = c.mb AND pb.band = pa.band
       |  GROUP BY 1, 2)""".stripMargin

  /** Entropy-banding CTE chain (twin of Multimodal.trainBitFractions /
    * entropyBandAssignment / entropyBandedPhash): per-bit set fractions
    * over the cohort, (|p−0.5| ASC, bit ASC) ranking, round-robin deal of
    * rank r to band r mod 4 / position r div 4, and the re-gathered
    * entropy band words `ephx` (same shape as phx). The division is one
    * double over exact integer counts, so the ranking — hence the
    * assignment — is engine-identical.
    */
  private def mediaEntropyCtes: String = {
    val (bands, bits) =
      (graft.ops.Multimodal.PhashBands, graft.ops.Multimodal.PhashBandBits)
    s"""ebits AS MATERIALIZED (SELECT phx.media_id, phx.band * $bits + i.i AS bit,
       |    (phx.bw >> i.i) & 1 AS v
       |  FROM phx, (SELECT CAST(unnest(range(0, $bits)) AS INT) AS i) i),
       |efrac AS (SELECT bit, CAST(sum(v) AS DOUBLE) / (SELECT count(*) FROM m) AS p
       |  FROM ebits GROUP BY 1),
       |erank AS (SELECT bit,
       |    row_number() OVER (ORDER BY abs(p - 0.5) ASC, bit ASC) - 1 AS r
       |  FROM efrac),
       |ephx AS MATERIALIZED (SELECT eb.media_id, CAST(rk.r % $bands AS INT) AS band,
       |    CAST(sum(eb.v << CAST(rk.r // $bands AS INT)) AS INT) AS bw
       |  FROM ebits eb JOIN erank rk USING (bit) GROUP BY 1, 2)""".stripMargin
  }

  /** Twin of Multimodal.mediaEntropyBandStats — the §1 saturation audit
    * under the trained banding, same columns as mediaBandStats.
    */
  def mediaEntropyBandStats(cap: Int = graft.ops.Multimodal.MediaBucketCap): String =
    s"""WITH $mediaPhashCtes,
       |$mediaEntropyCtes,
       |occ AS (SELECT band, bw, count(*) AS m FROM ephx GROUP BY 1, 2)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(m) AS BIGINT) AS max_occupancy,
       |  CAST(sum(m * (m - 1) // 2) AS BIGINT) AS candidate_pairs,
       |  CAST(sum(CASE WHEN m > $cap THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_buckets_over_cap,
       |  CAST(sum(CASE WHEN m > $cap THEN m * (m - 1) // 2 ELSE 0 END) AS BIGINT)
       |    AS candidates_over_cap
       |FROM occ GROUP BY band""".stripMargin

  /** Twin of Multimodal.mediaNearDupPairsEntropy: entropy-banded capped
    * candidates; the exact-Hamming verify still reads the ORIGINAL band
    * words.
    */
  def mediaNearDupPairsEntropy(
      maxHam: Int = graft.ops.Multimodal.PhashMaxHam,
      cap: Int = graft.ops.Multimodal.MediaBucketCap): String =
    s"""WITH $mediaPhashCtes,
       |$mediaEntropyCtes,
       |occ AS (SELECT band, bw, count(*) AS m FROM ephx GROUP BY 1, 2),
       |phs AS (SELECT ephx.* FROM ephx
       |  JOIN occ ON ephx.band = occ.band AND ephx.bw = occ.bw
       |  WHERE occ.m <= $cap),
       |cand AS (SELECT a.media_id AS ma, b.media_id AS mb
       |  FROM phs a JOIN phs b
       |    ON a.band = b.band AND a.bw = b.bw AND a.media_id < b.media_id
       |  GROUP BY 1, 2),
       |hams AS MATERIALIZED (SELECT c.ma, c.mb,
       |    CAST(sum(bit_count(xor(CAST(pa.bw AS BIGINT), CAST(pb.bw AS BIGINT)))) AS BIGINT)
       |      AS hamming
       |  FROM cand c
       |  JOIN phx pa ON pa.media_id = c.ma
       |  JOIN phx pb ON pb.media_id = c.mb AND pb.band = pa.band
       |  GROUP BY 1, 2)
       |SELECT ma AS media_a, mb AS media_b, hamming
       |FROM hams WHERE hamming <= $maxHam""".stripMargin

  /** Twin of Multimodal.mediaNearDupPairsCapped. */
  def mediaNearDupPairsCapped(
      maxHam: Int = graft.ops.Multimodal.PhashMaxHam,
      cap: Int = graft.ops.Multimodal.MediaBucketCap): String =
    s"""WITH $mediaPhashCtes,
       |${mediaPairCappedCtes(cap)}
       |SELECT ma AS media_a, mb AS media_b, hamming
       |FROM hams WHERE hamming <= $maxHam""".stripMargin

  /** Twin of Multimodal.mediaPhashTopK: banded candidates per query
    * medium (media_id % 100 = 0), exact-Hamming rank, top-k.
    */
  def mediaPhashTopK(k: Int = 5): String =
    s"""WITH $mediaPhashCtes,
       |qcand AS (SELECT a.media_id AS q_id, b.media_id AS media_id
       |  FROM phx a JOIN phx b
       |    ON a.band = b.band AND a.bw = b.bw AND a.media_id <> b.media_id
       |  WHERE a.media_id % 100 = 0
       |  GROUP BY 1, 2),
       |qham AS (SELECT c.q_id, c.media_id,
       |    CAST(sum(bit_count(xor(CAST(pa.bw AS BIGINT), CAST(pb.bw AS BIGINT)))) AS BIGINT)
       |      AS hamming
       |  FROM qcand c
       |  JOIN phx pa ON pa.media_id = c.q_id
       |  JOIN phx pb ON pb.media_id = c.media_id AND pb.band = pa.band
       |  GROUP BY 1, 2)
       |SELECT q_id, CAST(rn AS INTEGER) AS rank, media_id, hamming FROM (
       |  SELECT q_id, media_id, hamming,
       |    row_number() OVER (PARTITION BY q_id ORDER BY hamming ASC, media_id ASC) AS rn
       |  FROM qham) WHERE rn <= $k""".stripMargin

  /** Twin of the media survivorship query: exact connected components over
    * the perceptual pair graph (the dedupComponentsExact recursive CTE on
    * a different pair subquery), min-id keeper per component, everything
    * else passes through.
    */
  def mediaDedupApply(maxHam: Int = graft.ops.Multimodal.PhashMaxHam): String =
    s"""WITH RECURSIVE $mediaPhashCtes,
       |$mediaPairCtes,
       |medges AS (SELECT ma AS src, mb AS dst FROM hams WHERE hamming <= $maxHam
       |  UNION ALL SELECT mb AS src, ma AS dst FROM hams WHERE hamming <= $maxHam),
       |mnodes AS (SELECT DISTINCT src AS node FROM medges),
       |mreach(node, r) AS (
       |  SELECT node, node FROM mnodes
       |  UNION
       |  SELECT e.src, rch.r FROM medges e JOIN mreach rch ON e.dst = rch.node),
       |mcomp AS (SELECT node AS doc_id, min(r) AS rep FROM mreach GROUP BY 1)
       |SELECT m.media_id FROM m
       |WHERE m.media_id NOT IN (SELECT doc_id FROM mcomp WHERE doc_id <> rep)"""
      .stripMargin

  /** Twin of Multimodal.mediaSourceContaminationFrom over the planted
    * (reposted) media corpus: the verified perceptual pairs joined onto
    * both endpoints' sources, canonicalized unordered, aggregated to the
    * which-sources-repost-from-which matrix.
    */
  def mediaSourceContamination(
      maxHam: Int = graft.ops.Multimodal.PhashMaxHam): String =
    s"""WITH $mediaPhashCtes,
       |$mediaPairCtes,
       |p AS (SELECT ma, mb, hamming FROM hams WHERE hamming <= $maxHam)
       |SELECT least(a.source, b.source) AS source_a,
       |  greatest(a.source, b.source) AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  round(avg(hamming), 6) AS mean_hamming
       |FROM p JOIN m a ON p.ma = a.media_id JOIN m b ON p.mb = b.media_id
       |GROUP BY 1, 2""".stripMargin

  /** Twin of the composed `media_curation_pipeline` query, built from the
    * SAME fragments the individual media oracles use (byte-moment gates →
    * perceptual near-dup exact-CC survivorship AMONG the gated media →
    * per-source capped sample), so the composition cannot drift from its
    * parts. The dedup stage consumes the OCCUPANCY-CAPPED pair table
    * (SCALING.md §1: the uncapped banded join saturates quadratically on
    * low-entropy corpora; `media_neardup_pairs` stays the labeled
    * all-pairs baseline), filtered to both-endpoints-gated — identical to
    * pairing the gated subset, since fingerprints, banding and bucket
    * occupancy are derived corpus-wide per media.
    */
  def mediaCurationPipeline(
      maxHam: Int = graft.ops.Multimodal.PhashMaxHam,
      cap: Int = Sampling.SourceCap,
      bucketCap: Int = graft.ops.Multimodal.MediaBucketCap): String = {
    val (minB, maxMean, minVar) = (graft.ops.Multimodal.MinMediaBytes,
      graft.ops.Multimodal.MaxMeanByte, graft.ops.Multimodal.MinByteVar)
    s"""WITH RECURSIVE $mediaPhashCtes,
       |${mediaPairCappedCtes(bucketCap)},
       |fo AS (SELECT media_id, n,
       |    ord(substr(text, CAST(i + 1 AS INT), 1)) AS o FROM u),
       |fagg AS (SELECT media_id, max(n) AS n,
       |    CAST(sum(o) AS BIGINT) AS s, CAST(sum(o * o) AS BIGINT) AS s2
       |  FROM fo GROUP BY 1),
       |gate AS MATERIALIZED (SELECT media_id FROM fagg
       |  WHERE n >= $minB
       |    AND round(CAST(s AS DOUBLE) / n, 6) <= $maxMean
       |    AND round(CAST(s2 AS DOUBLE) / n
       |      - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 6) >= $minVar),
       |gpairs AS MATERIALIZED (SELECT ma, mb FROM hams
       |  WHERE hamming <= $maxHam
       |    AND ma IN (SELECT media_id FROM gate)
       |    AND mb IN (SELECT media_id FROM gate)),
       |gedges AS (SELECT ma AS src, mb AS dst FROM gpairs
       |  UNION ALL SELECT mb AS src, ma AS dst FROM gpairs),
       |gnodes AS (SELECT DISTINCT src AS node FROM gedges),
       |greach(node, r) AS (
       |  SELECT node, node FROM gnodes
       |  UNION
       |  SELECT e.src, rch.r FROM gedges e JOIN greach rch ON e.dst = rch.node),
       |gcomp AS (SELECT node AS media_id, min(r) AS rep FROM greach GROUP BY 1),
       |sel AS (SELECT m.source, m.media_id FROM m JOIN gate USING (media_id)
       |  WHERE m.media_id NOT IN (SELECT media_id FROM gcomp WHERE media_id <> rep))
       |SELECT source, rank, media_id FROM (
       |  SELECT source, media_id, CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY ${h("cap", "CAST(media_id AS VARCHAR)")} ASC, media_id ASC) AS INT) AS rank
       |  FROM sel)
       |WHERE rank <= $cap""".stripMargin
  }

  /** Twin of Multimodal.resizePlan over the image subset of mediaMeta. */
  def mediaResize(boxW: Int = 256, boxH: Int = 256): String = {
    val scale = s"least($boxW.0 / width, $boxH.0 / height)"
    s"""WITH m AS (SELECT doc_id AS media_id,
       |    ${h("w", "text")} % 1280 + 1 AS width,
       |    ${h("h", "text")} % 720 + 1 AS height
       |  FROM documents WHERE doc_id % 3 = 0),
       |r AS (SELECT media_id, width, height,
       |    round($scale, 6) AS scale,
       |    greatest(1, CAST(floor(width * $scale) AS INT)) AS out_w,
       |    greatest(1, CAST(floor(height * $scale) AS INT)) AS out_h
       |  FROM m)
       |SELECT media_id, width, height, scale, out_w, out_h,
       |  CAST(out_w AS BIGINT) * out_h * 3 AS out_bytes
       |FROM r""".stripMargin
  }

  val mediaFrameSample: String =
    s"""SELECT doc_id AS media_id, CAST(j.frame_idx AS INTEGER) AS frame_idx,
       |  ${h("fr", "substr(text, 1 + 64 * j.frame_idx, 64)")} AS frame_hash
       |FROM documents, (SELECT unnest(range(0, 8)) AS frame_idx) j
       |WHERE doc_id % 3 = 2 AND j.frame_idx <= (length(text) - 1) // 64""".stripMargin

  /** Shared CTE chain replaying Classify.nbLangScores: hashed-feature
    * multinomial NB with fixed-point (micro-nat) log terms — the integer
    * quantization is what makes the sum and argmax engine-independent.
    */
  private def nbScoreCtes: String = {
    val f = graft.ops.Classify.NbFeatures
    val fp = graft.ops.Classify.FpScale
    val feat = s"CAST(${h(graft.ops.Classify.NbSeed, "tok")} % $f AS BIGINT)"
    s"""ltok AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |inst AS (SELECT doc_id, lang, unnest(t) AS tok FROM ltok),
       |fi AS (SELECT doc_id, lang, $feat AS feat FROM inst),
       |cnt AS (SELECT lang AS cls, feat, count(*) AS c FROM fi GROUP BY 1, 2),
       |ctot AS (SELECT lang AS cls, count(*) AS tot FROM fi GROUP BY 1),
       |cdocs AS (SELECT lang AS cls, count(*) AS nd FROM documents GROUP BY 1),
       |tdocs AS (SELECT count(*) AS n_total FROM documents),
       |pri AS (SELECT cls, CAST(round(ln(CAST(nd AS DOUBLE) / CAST(n_total AS DOUBLE)) * $fp, 0) AS BIGINT) AS prior_fp
       |  FROM cdocs CROSS JOIN tdocs),
       |terms AS (SELECT fi.doc_id, fi.lang, cl.cls,
       |    CAST(round(ln(CAST(COALESCE(cnt.c, 0) + 1 AS DOUBLE) / CAST(ctot.tot + $f AS DOUBLE)) * $fp, 0) AS BIGINT) AS t_fp
       |  FROM fi CROSS JOIN (SELECT cls FROM cdocs) cl
       |  JOIN ctot ON cl.cls = ctot.cls
       |  LEFT JOIN cnt ON cl.cls = cnt.cls AND fi.feat = cnt.feat),
       |ds AS (SELECT doc_id, lang, cls, sum(t_fp) AS s_fp FROM terms GROUP BY 1, 2, 3),
       |sc AS (SELECT doc_id, lang, ds.cls, s_fp + prior_fp AS score_fp
       |  FROM ds JOIN pri ON ds.cls = pri.cls),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_fp DESC, cls ASC) AS rn FROM sc)""".stripMargin
  }

  /** Twin of Classify.nbLangClassify. */
  def nbLangClassify: String =
    s"""WITH $nbScoreCtes
       |SELECT doc_id, lang, cls AS pred_lang,
       |  round(CAST(score_fp AS DOUBLE) / ${graft.ops.Classify.FpScale}.0, 6) AS score,
       |  CAST(CASE WHEN cls = lang THEN 1 ELSE 0 END AS BIGINT) AS correct
       |FROM rk WHERE rn = 1""".stripMargin

  /** Twin of TextOps.retrievalNdcgReport: term-coverage qrels, exact
    * CASE-rendered 2^rel − 1 gains, per-rank terms quantized to integer
    * micro-units before summation (the fixed-point convention), the three
    * system rankings nested as subqueries of their own oracle SQL.
    */
  def retrievalNdcgReport(k: Int = TextOps.RrfK): String = {
    val maxRel = TextOps.Bm25Queries.map(_._2.size).max
    val qtVals = TextOps.Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
    def gain(rel: String) =
      s"(CASE ${(0 to maxRel).map(r => s"WHEN $rel = $r THEN ${(1L << r) - 1L}").mkString(" ")} END)"
    def term(rel: String, rank: String) =
      s"CAST(round(1000000.0 * CAST(${gain(rel)} AS DOUBLE) / log2(CAST($rank AS DOUBLE) + 1.0), 0) AS BIGINT)"
    s"""WITH qt2(q_id, qtok) AS (VALUES $qtVals),
       |dt AS (SELECT DISTINCT doc_id, tok FROM
       |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) u),
       |qr AS (SELECT qt2.q_id, dt.doc_id, count(*) AS rel
       |  FROM dt JOIN qt2 ON dt.tok = qt2.qtok GROUP BY 1, 2),
       |irk AS (SELECT q_id, doc_id, rel,
       |    row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, doc_id ASC) AS rank FROM qr),
       |idcg AS (SELECT q_id, sum(${term("rel", "rank")}) AS idcg_fp
       |  FROM irk WHERE rank <= $k GROUP BY 1),
       |sysr AS (
       |  SELECT 'bm25' AS method, q_id, rank, doc_id FROM (${bm25TopK(k)}) b
       |  UNION ALL SELECT 'ql' AS method, q_id, rank, doc_id FROM (${qlTopK(k)}) q
       |  UNION ALL SELECT 'rrf' AS method, q_id, rank, doc_id FROM (${rrfFusion()}) r),
       |dcg AS (SELECT method, s.q_id, sum(${term("coalesce(qr.rel, 0)", "s.rank")}) AS dcg_fp
       |  FROM sysr s LEFT JOIN qr ON s.q_id = qr.q_id AND s.doc_id = qr.doc_id
       |  GROUP BY 1, 2)
       |SELECT d.q_id, d.method,
       |  round(CAST(dcg_fp AS DOUBLE) / CAST(idcg_fp AS DOUBLE), 6) AS ndcg
       |FROM dcg d JOIN idcg i ON d.q_id = i.q_id""".stripMargin
  }

  /** Twin of TimeSeries.incidentWindowHits: the plain range join (the
    * bucketization is a Spark-side execution strategy; the result set is
    * identical by construction).
    */
  def incidentWindowHits: String =
    s"""WITH win AS (SELECT ts AS ws, ts + INTERVAL 30 MINUTE AS we
       |  FROM events WHERE event_type = 'error'),
       |hits AS (SELECT DISTINCT e.event_id, e.event_type
       |  FROM events e JOIN win ON e.ts >= win.ws AND e.ts < win.we),
       |tot AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY 1),
       |hc AS (SELECT event_type, count(*) AS n_hits FROM hits GROUP BY 1)
       |SELECT t.event_type, t.n_events,
       |  CAST(coalesce(hc.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST((coalesce(hc.n_hits, 0) * 1000000) // t.n_events AS BIGINT) AS hit_ppm
       |FROM tot t LEFT JOIN hc ON t.event_type = hc.event_type""".stripMargin

  /** Twin of TextOps.corpusManifest: same per-doc fingerprint mod 2³¹−1
    * and commutative digest sum.
    */
  def corpusManifest: String = {
    val fp = h("manifest", "CAST(doc_id AS VARCHAR) || ':' || text")
    s"""SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(sum(($fp * 65537 + doc_id) % 2147483647) % 2147483647 AS BIGINT) AS content_hash
       |FROM documents GROUP BY 1""".stripMargin
  }

  /** Twin of TextOps.phraseSearch: per phrase, the n-way positional
    * self-join at consecutive 1-based positions, unioned across phrases —
    * words and ids rendered from the shared PhraseQueries constant.
    */
  def phraseSearch(phrases: Seq[(Int, String)] = TextOps.PhraseQueries): String = {
    val parts = phrases.map { case (qid, phrase) =>
      val ws = phrase.split(" ")
      val joins = ws.zipWithIndex.drop(1).map { case (w, i) =>
        s"JOIN inst a$i ON a0.doc_id = a$i.doc_id AND a$i.pos = a0.pos + $i AND a$i.tok = '$w'"
      }.mkString(" ")
      s"""SELECT $qid AS q_id, a0.doc_id, count(*) AS n_matches
         |FROM inst a0 $joins
         |WHERE a0.tok = '${ws.head}'
         |GROUP BY 2""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $tokCte,
       |inst AS (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok FROM tok)
       |$parts""".stripMargin
  }

  /** Twin of Profile.storageProfile: same unpivot, day-partitioned run
    * counting (null-safe change points), integer-ppm quotients, CASE
    * advice — columns and thresholds rendered from the shared constants.
    */
  def storageProfile: String = {
    val p = graft.ops.Profile
    val branches = p.StorageCols.map(c =>
      s"SELECT '$c' AS col, CAST(ts AS DATE) AS day, event_id, CAST($c AS VARCHAR) AS v FROM events")
      .mkString("\n  UNION ALL ")
    s"""WITH lng AS ($branches),
       |r AS (SELECT col, v,
       |    CASE WHEN lag(v) OVER (PARTITION BY col, day ORDER BY event_id)
       |      IS NOT DISTINCT FROM v THEN 0 ELSE 1 END AS chg
       |  FROM lng),
       |a AS (SELECT col, count(*) AS n_rows, count(DISTINCT v) AS n_distinct,
       |    CAST(sum(chg) AS BIGINT) AS n_runs FROM r GROUP BY 1)
       |SELECT col, n_rows, n_distinct, n_runs,
       |  CAST((n_distinct * 1000000) // n_rows AS BIGINT) AS distinct_ppm,
       |  CAST((n_runs * 1000000) // n_rows AS BIGINT) AS runs_ppm,
       |  CASE WHEN (n_runs * 1000000) // n_rows <= ${p.RlePpmMax} THEN 'rle'
       |    WHEN (n_distinct * 1000000) // n_rows <= ${p.DictPpmMax} THEN 'dict'
       |    ELSE 'plain' END AS advice
       |FROM a""".stripMargin
  }

  /** Twin of Sketches.dailyValueBands: per-(type, day) type-1 band cuts
    * from the same histogram/cumulative-rank arithmetic.
    */
  def dailyValueBands(ps: Seq[(String, Long)] = graft.ops.Sketches.BandPpm): String = {
    val cuts = ps.map { case (name, ppm) =>
      s"min(CASE WHEN cum * 1000000 >= n * $ppm THEN vb END) AS $name"
    }.mkString(",\n  ")
    s"""WITH h AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    round(value, 2) AS vb, count(*) AS c
       |  FROM events GROUP BY 1, 2, 3),
       |cum AS (SELECT event_type, day, vb,
       |    sum(c) OVER (PARTITION BY event_type, day ORDER BY vb) AS cum,
       |    sum(c) OVER (PARTITION BY event_type, day) AS n FROM h)
       |SELECT event_type, day, CAST(max(n) AS BIGINT) AS n,
       |  $cuts
       |FROM cum GROUP BY 1, 2""".stripMargin
  }

  /** Twin of Sketches.madOutliers: the same two histogram/cumulative-rank
    * medians, 2dp re-rounded deviations, and integer k·MAD flag.
    */
  def madOutliers(k: Int = graft.ops.Sketches.MadK): String =
    s"""WITH vals AS (SELECT event_type, round(value, 2) AS vb FROM events),
       |h1 AS (SELECT event_type, vb, count(*) AS c FROM vals GROUP BY 1, 2),
       |c1 AS (SELECT event_type, vb,
       |    sum(c) OVER (PARTITION BY event_type ORDER BY vb) AS cum,
       |    sum(c) OVER (PARTITION BY event_type) AS n FROM h1),
       |med AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |    min(CASE WHEN cum * 1000000 >= n * 500000 THEN vb END) AS med
       |  FROM c1 GROUP BY 1),
       |dev AS (SELECT v.event_type, med.n, med.med, round(abs(v.vb - med.med), 2) AS d
       |  FROM vals v JOIN med USING (event_type)),
       |h2 AS (SELECT event_type, d, count(*) AS c FROM dev GROUP BY 1, 2),
       |c2 AS (SELECT event_type, d,
       |    sum(c) OVER (PARTITION BY event_type ORDER BY d) AS cum,
       |    sum(c) OVER (PARTITION BY event_type) AS n FROM h2),
       |mad AS (SELECT event_type,
       |    min(CASE WHEN cum * 1000000 >= n * 500000 THEN d END) AS mad
       |  FROM c2 GROUP BY 1)
       |SELECT dev.event_type, max(dev.n) AS n, max(dev.med) AS med,
       |  max(mad.mad) AS mad,
       |  CAST(sum(CASE WHEN dev.d > $k * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  CAST((sum(CASE WHEN dev.d > $k * mad.mad THEN 1 ELSE 0 END) * 1000000) // max(dev.n) AS BIGINT) AS outlier_ppm
       |FROM dev JOIN mad USING (event_type)
       |GROUP BY 1""".stripMargin

  /** Shared CTEs replaying Privacy.quasi/classSizes. */
  private def kAnonCtes: String =
    s"""q AS (SELECT event_id, event_type, CAST(ts AS DATE) AS day,
       |    CAST(floor(value / ${graft.ops.Privacy.ValueBucket}) AS BIGINT) AS vb
       |  FROM events),
       |cs AS (SELECT event_type, day, vb, count(*) AS cls_n FROM q GROUP BY 1, 2, 3)""".stripMargin

  /** Twin of Privacy.kAnonymityReport. */
  def kAnonymityReport(k: Long = graft.ops.Privacy.KAnon): String =
    s"""WITH $kAnonCtes
       |SELECT event_type, count(*) AS n_classes, CAST(sum(cls_n) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN cls_n < $k THEN cls_n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       |  CAST(min(cls_n) AS BIGINT) AS min_class,
       |  CAST((sum(CASE WHEN cls_n < $k THEN cls_n ELSE 0 END) * 1000000) // sum(cls_n) AS BIGINT) AS risk_ppm
       |FROM cs GROUP BY 1""".stripMargin

  /** Twin of Privacy.lDiversityReport: the quasi classes with a
    * distinct-user count, rolled up per event_type.
    */
  def lDiversityReport(l: Long = graft.ops.Privacy.LDiv): String =
    s"""WITH q AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
       |    CAST(floor(value / ${graft.ops.Privacy.ValueBucket}) AS BIGINT) AS vb
       |  FROM events),
       |cs AS (SELECT event_type, day, vb, count(*) AS cls_n,
       |    count(DISTINCT user_id) AS n_sens FROM q GROUP BY 1, 2, 3)
       |SELECT event_type, count(*) AS n_classes, CAST(sum(cls_n) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN n_sens < $l THEN 1 ELSE 0 END) AS BIGINT) AS low_classes,
       |  CAST(sum(CASE WHEN n_sens < $l THEN cls_n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       |  CAST(min(n_sens) AS BIGINT) AS min_diversity,
       |  CAST((sum(CASE WHEN n_sens < $l THEN cls_n ELSE 0 END) * 1000000)
       |    // sum(cls_n) AS BIGINT) AS risk_ppm
       |FROM cs GROUP BY 1""".stripMargin

  /** Twin of Privacy.tClosenessReport: the same exact-integer TVD ppm
    * per class (in-class |c_u·N − g_u·n_c| sum plus the folded
    * absent-user term), one integer division, the same rollup.
    */
  def tClosenessReport(tPpm: Long = graft.ops.Privacy.TCloseTPpm): String =
    s"""WITH base AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(floor(value / ${graft.ops.Privacy.ValueBucket}) AS BIGINT) AS vb,
       |    user_id
       |  FROM events),
       |cu AS (SELECT event_type, day, vb, user_id, count(*) AS c_u
       |  FROM base GROUP BY 1, 2, 3, 4),
       |cls AS (SELECT event_type, day, vb, CAST(sum(c_u) AS BIGINT) AS cls_n
       |  FROM cu GROUP BY 1, 2, 3),
       |gu AS (SELECT event_type, user_id, count(*) AS g_u
       |  FROM base GROUP BY 1, 2),
       |gn AS (SELECT event_type, CAST(sum(g_u) AS BIGINT) AS n_tot
       |  FROM gu GROUP BY 1),
       |pc AS (SELECT cu.event_type, cu.day, cu.vb, cls.cls_n, gn.n_tot,
       |    sum(abs(CAST(cu.c_u AS HUGEINT) * gn.n_tot
       |      - CAST(gu.g_u AS HUGEINT) * cls.cls_n)) AS num_in,
       |    CAST(sum(gu.g_u) AS BIGINT) AS g_in
       |  FROM cu
       |  JOIN cls ON cu.event_type = cls.event_type AND cu.day = cls.day AND cu.vb = cls.vb
       |  JOIN gu ON cu.event_type = gu.event_type AND cu.user_id = gu.user_id
       |  JOIN gn ON cu.event_type = gn.event_type
       |  GROUP BY 1, 2, 3, 4, 5),
       |tvd AS (SELECT event_type, cls_n,
       |    CAST(((num_in + (CAST(n_tot AS HUGEINT) - g_in) * cls_n) * 1000000)
       |      // (CAST(2 AS HUGEINT) * cls_n * n_tot) AS BIGINT) AS tvd_ppm
       |  FROM pc)
       |SELECT event_type, count(*) AS n_classes, CAST(sum(cls_n) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN tvd_ppm > $tPpm THEN 1 ELSE 0 END) AS BIGINT) AS far_classes,
       |  CAST(sum(CASE WHEN tvd_ppm > $tPpm THEN cls_n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       |  CAST(max(tvd_ppm) AS BIGINT) AS max_tvd_ppm,
       |  CAST((sum(CASE WHEN tvd_ppm > $tPpm THEN cls_n ELSE 0 END) * 1000000)
       |    // sum(cls_n) AS BIGINT) AS risk_ppm
       |FROM tvd GROUP BY 1""".stripMargin

  /** Twin of Privacy.tClosenessApply: the fixed number of far-class
    * suppression rounds unrolled verbatim — per round the class/global/
    * total rollups of the SURVIVING census, the same exact-integer TVD
    * quotient, and a NOT EXISTS anti-join dropping far classes. Every
    * round's census is MATERIALIZED: it feeds four derived tables, and
    * DuckDB's CTE inlining would otherwise re-expand the chain
    * exponentially (the k-core lesson).
    */
  def tClosenessApply(
      tPpm: Long = graft.ops.Privacy.TCloseApplyTPpm,
      rounds: Int = graft.ops.Privacy.TCloseApplyRounds): String = {
    val roundCtes = (0 until rounds).map { i =>
      s"""cls$i AS MATERIALIZED (SELECT event_type, day, vb, CAST(sum(c_u) AS BIGINT) AS cls_n
         |  FROM cu$i GROUP BY 1, 2, 3),
         |gu$i AS MATERIALIZED (SELECT event_type, user_id, CAST(sum(c_u) AS BIGINT) AS g_u
         |  FROM cu$i GROUP BY 1, 2),
         |gn$i AS MATERIALIZED (SELECT event_type, CAST(sum(g_u) AS BIGINT) AS n_tot
         |  FROM gu$i GROUP BY 1),
         |far$i AS MATERIALIZED (SELECT event_type, day, vb FROM (
         |  SELECT cu.event_type, cu.day, cu.vb, cls.cls_n, gn.n_tot,
         |      sum(abs(CAST(cu.c_u AS HUGEINT) * gn.n_tot
         |        - CAST(gu.g_u AS HUGEINT) * cls.cls_n)) AS num_in,
         |      CAST(sum(gu.g_u) AS BIGINT) AS g_in
         |    FROM cu$i cu
         |    JOIN cls$i cls ON cu.event_type = cls.event_type AND cu.day = cls.day AND cu.vb = cls.vb
         |    JOIN gu$i gu ON cu.event_type = gu.event_type AND cu.user_id = gu.user_id
         |    JOIN gn$i gn ON cu.event_type = gn.event_type
         |    GROUP BY 1, 2, 3, 4, 5)
         |  WHERE CAST(((num_in + (CAST(n_tot AS HUGEINT) - g_in) * cls_n) * 1000000)
         |    // (CAST(2 AS HUGEINT) * cls_n * n_tot) AS BIGINT) > $tPpm),
         |cu${i + 1} AS MATERIALIZED (SELECT cu.* FROM cu$i cu
         |  WHERE NOT EXISTS (SELECT 1 FROM far$i f
         |    WHERE f.event_type = cu.event_type AND f.day = cu.day AND f.vb = cu.vb))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH base AS (SELECT event_id, event_type, CAST(ts AS DATE) AS day,
       |    CAST(floor(value / ${graft.ops.Privacy.ValueBucket}) AS BIGINT) AS vb,
       |    user_id
       |  FROM events),
       |cu0 AS MATERIALIZED (SELECT event_type, day, vb, user_id, count(*) AS c_u
       |  FROM base GROUP BY 1, 2, 3, 4),
       |$roundCtes
       |SELECT b.event_id, b.event_type, b.user_id
       |FROM base b
       |WHERE EXISTS (SELECT 1 FROM cu$rounds k
       |  WHERE k.event_type = b.event_type AND k.day = b.day AND k.vb = b.vb)"""
      .stripMargin
  }

  /** Twin of Privacy.kAnonymize. */
  def kAnonymize(k: Long = graft.ops.Privacy.KAnon): String =
    s"""WITH $kAnonCtes
       |SELECT q.event_id, q.event_type,
       |  CASE WHEN cls_n >= $k THEN q.day END AS day,
       |  CASE WHEN cls_n >= $k THEN q.vb END AS vb,
       |  CAST(CASE WHEN cls_n < $k THEN 1 ELSE 0 END AS BIGINT) AS suppressed
       |FROM q JOIN cs ON q.event_type = cs.event_type AND q.day = cs.day AND q.vb = cs.vb""".stripMargin

  /** VALUES table of the CMS universal-hash constants, rendered from the
    * shared Sketches geometry so the two engines can never disagree on a
    * hash row.
    */
  private def cmsHashRows: String = {
    val sk = graft.ops.Sketches
    (0 until sk.CmsDepth)
      .map(i => s"(${i}, ${sk.CmsA(i)}, ${sk.CmsB(i)})").mkString(", ")
  }

  /** Shared CTEs replaying Sketches.cmsSketch / cmsEstimates: pure integer
    * universal hashing, per-cell counts, min-over-rows estimates.
    */
  private def cmsCtes: String = {
    val sk = graft.ops.Sketches
    val cell = s"((h.a * user_id + h.b) % ${sk.CmsPrime}) % ${sk.CmsWidth}"
    s"""hh(row_idx, a, b) AS (VALUES $cmsHashRows),
       |cells AS (SELECT CAST(h.row_idx AS INT) AS row_idx,
       |    CAST($cell AS BIGINT) AS col_idx
       |  FROM events CROSS JOIN hh h),
       |sk AS (SELECT row_idx, col_idx, count(*) AS cnt FROM cells GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT user_id FROM events),
       |probe AS (SELECT user_id, CAST(h.row_idx AS INT) AS row_idx,
       |    CAST($cell AS BIGINT) AS col_idx
       |  FROM cand CROSS JOIN hh h),
       |est AS (SELECT user_id, min(cnt) AS est_cnt
       |  FROM probe JOIN sk USING (row_idx, col_idx) GROUP BY 1)""".stripMargin
  }

  /** Twin of Sketches.cmsSketch. */
  def cmsSketch: String =
    s"""WITH $cmsCtes
       |SELECT row_idx, col_idx, cnt FROM sk""".stripMargin

  /** Twin of Sketches.cmsHeavyHitters. */
  def cmsHeavyHitters(
      num: Long = graft.ops.Sketches.CmsHeavyNum,
      den: Long = graft.ops.Sketches.CmsHeavyDen): String =
    s"""WITH $cmsCtes,
       |exact AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1),
       |tot AS (SELECT count(*) AS n_total, count(DISTINCT user_id) AS n_keys FROM events)
       |SELECT user_id, exact_cnt, est_cnt, est_cnt - exact_cnt AS overestimate
       |FROM est JOIN exact USING (user_id) CROSS JOIN tot
       |WHERE est_cnt * n_keys * $den >= n_total * $num""".stripMargin

  /** Twin of Sketches.cmsJoinSizeEstimate: both sides' sketch tables from
    * the shared hash family, row-wise inner products, min over rows —
    * pure integer arithmetic, replayed bit-exactly.
    */
  def cmsJoinSizeEstimate: String = {
    val sk = graft.ops.Sketches
    val cell = s"((h.a * user_id + h.b) % ${sk.CmsPrime}) % ${sk.CmsWidth}"
    s"""WITH hh(row_idx, a, b) AS (VALUES $cmsHashRows),
       |ska AS (SELECT CAST(h.row_idx AS INT) AS row_idx,
       |    CAST($cell AS BIGINT) AS col_idx, count(*) AS ca
       |  FROM events CROSS JOIN hh h WHERE event_type = 'click' GROUP BY 1, 2),
       |skb AS (SELECT CAST(h.row_idx AS INT) AS row_idx,
       |    CAST($cell AS BIGINT) AS col_idx, count(*) AS cb
       |  FROM events CROSS JOIN hh h WHERE event_type = 'purchase' GROUP BY 1, 2),
       |est AS (SELECT CAST(min(coalesce(dot, 0)) AS BIGINT) AS est_pairs
       |  FROM (SELECT DISTINCT CAST(row_idx AS INT) AS row_idx FROM hh) r
       |  LEFT JOIN (SELECT ska.row_idx, sum(ca * cb) AS dot
       |    FROM ska JOIN skb USING (row_idx, col_idx) GROUP BY 1) d
       |  USING (row_idx)),
       |fa AS (SELECT user_id, count(*) AS ca FROM events
       |  WHERE event_type = 'click' GROUP BY 1),
       |fb AS (SELECT user_id, count(*) AS cb FROM events
       |  WHERE event_type = 'purchase' GROUP BY 1),
       |ex AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS exact_pairs
       |  FROM fa JOIN fb USING (user_id))
       |SELECT exact_pairs, est_pairs, est_pairs - exact_pairs AS overestimate
       |FROM ex CROSS JOIN est""".stripMargin
  }

  /** Twin of Sketches.hllOverlapReport: exact pairwise overlap/union from
    * the distinct (type, user) self-join; the budget boolean asserted
    * TRUE — a sketch drifting outside the band hash-mismatches here.
    */
  def hllOverlapReport: String =
    s"""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
       |n AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
       |ov AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
       |    count(*) AS ov_cnt
       |  FROM tu x JOIN tu y
       |    ON x.user_id = y.user_id AND x.event_type < y.event_type
       |  GROUP BY 1, 2),
       |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    a.n AS n_a, b.n AS n_b
       |  FROM n a JOIN n b ON a.event_type < b.event_type)
       |SELECT type_a, type_b, n_a, n_b,
       |  coalesce(ov_cnt, 0) AS exact_overlap,
       |  n_a + n_b - coalesce(ov_cnt, 0) AS exact_union,
       |  TRUE AS overlap_within_budget
       |FROM pairs LEFT JOIN ov USING (type_a, type_b)""".stripMargin

  /** Shared CTEs for the Bloom twins: the k probe positions from the
    * universal-hash VALUES table, folded into (word_idx, bits) words by
    * bit_or — the same pure integer arithmetic as the Spark side.
    */
  private def bloomCtes: String = {
    val sk = graft.ops.Sketches
    val hashRows = (0 until sk.BloomK)
      .map(i => s"(${sk.BloomA(i)}, ${sk.BloomB(i)})").mkString(", ")
    def pos(key: String) =
      s"CAST(((h.a * $key + h.b) % ${sk.CmsPrime}) % ${sk.BloomBits} AS BIGINT)"
    s"""bh(a, b) AS (VALUES $hashRows),
       |bpos AS (SELECT ${pos("user_id")} AS pos FROM events CROSS JOIN bh h),
       |bsk AS (SELECT pos // ${sk.BloomWordBits} AS word_idx,
       |    bit_or(CAST(1 AS BIGINT) << CAST(pos % ${sk.BloomWordBits} AS INT)) AS bits
       |  FROM bpos GROUP BY 1)""".stripMargin
  }

  /** Twin of Sketches.bloomSketch. */
  def bloomSketch: String =
    s"""WITH $bloomCtes
       |SELECT word_idx, bits FROM bsk""".stripMargin

  /** Twin of Sketches.bloomProbeReport: present keys must all hit (no
    * false negatives); the anti-joined shifted cohort's hit rate is the
    * measured false-positive rate. Absent WORDS read as bits = 0 through
    * the left join, as on the Spark side.
    */
  def bloomProbeReport: String = {
    val sk = graft.ops.Sketches
    val posC =
      s"CAST(((h.a * c.user_id + h.b) % ${sk.CmsPrime}) % ${sk.BloomBits} AS BIGINT)"
    s"""WITH $bloomCtes,
       |present AS (SELECT DISTINCT user_id FROM events),
       |absent AS (SELECT p.user_id + ${sk.BloomAbsentOffset} AS user_id FROM present p
       |  WHERE NOT EXISTS (SELECT 1 FROM present q
       |    WHERE q.user_id = p.user_id + ${sk.BloomAbsentOffset})),
       |cand AS (SELECT 'present' AS cohort, user_id FROM present
       |  UNION ALL SELECT 'absent' AS cohort, user_id FROM absent),
       |probes AS (SELECT c.cohort, c.user_id, $posC AS pos
       |  FROM cand c CROSS JOIN bh h),
       |hit AS (SELECT cohort, user_id,
       |    min(CASE WHEN (coalesce(s.bits, 0)
       |      & (CAST(1 AS BIGINT) << CAST(pos % ${sk.BloomWordBits} AS INT))) <> 0
       |      THEN 1 ELSE 0 END) AS all_set
       |  FROM probes p LEFT JOIN bsk s ON p.pos // ${sk.BloomWordBits} = s.word_idx
       |  GROUP BY 1, 2)
       |SELECT cohort, count(*) AS n_keys, CAST(sum(all_set) AS BIGINT) AS n_found,
       |  round(CAST(sum(all_set) AS DOUBLE) / count(*), 6) AS hit_rate
       |FROM hit GROUP BY 1""".stripMargin
  }

  /** Twin of Classify.nbLangConfusion. */
  def nbLangConfusion: String =
    s"""WITH $nbScoreCtes
       |SELECT lang, cls AS pred_lang, count(*) AS n
       |FROM rk WHERE rn = 1 GROUP BY 1, 2""".stripMargin

  /** Twin of Classify.nbMarginCalibration. */
  def nbMarginCalibration: String = {
    val (bw, cap) = (graft.ops.Classify.MarginBucketFp, graft.ops.Classify.MarginBucketMax)
    s"""WITH $nbScoreCtes,
       |t2 AS (SELECT doc_id, lang,
       |    max(CASE WHEN rn = 1 THEN cls END) AS pred,
       |    max(CASE WHEN rn = 1 THEN score_fp END) AS s1,
       |    max(CASE WHEN rn = 2 THEN score_fp END) AS s2
       |  FROM rk WHERE rn <= 2 GROUP BY 1, 2),
       |mb AS (SELECT lang, pred,
       |    CAST(CASE WHEN s2 IS NULL THEN $cap
       |      ELSE least((s1 - s2) // $bw, $cap) END AS BIGINT) AS margin_bucket
       |  FROM t2)
       |SELECT margin_bucket, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST((sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS acc_ppm
       |FROM mb GROUP BY 1""".stripMargin
  }
}
