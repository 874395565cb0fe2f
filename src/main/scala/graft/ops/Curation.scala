package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.9 — corpus-curation operators a production training-data pipeline
  * runs between "raw crawl" and "tokenizer": segment-level (paragraph)
  * dedup, domain-mixture resampling, token-budget selection, soft dedup
  * weighting, and model-score bucketing. All five are deterministic and
  * oracle-checked; every shape is shuffle-bounded (no all-pairs, no global
  * row-at-a-time sort over the corpus — see each scaladoc for the 100 TB
  * argument).
  */
object Curation {
  import Tables._

  /** Seen-set Bloom probe of `nd` (new docs) against `cp` (corpus) — the
    * reusable core of q_dedup_seen. Both inputs need (doc_id, text);
    * doc_id must be unique within nd. Returns (doc_id, candidate,
    * actual_dup) with the no-false-negative guarantee actual ⇒ candidate
    * (pinned on planted dups in CurationSpec). */
  def seenBloom(nd: DataFrame, cp: DataFrame): DataFrame = {
    val bit = expr("CAST(conv(substring(md5(concat('sb', " +
      "CAST(dep AS STRING), ':', text)), 1, 6), 16, 10) AS BIGINT) % 65536")
    val bits = cp
      .select(explode(sequence(lit(0), lit(3))).as("dep"), col("text"))
      .select(bit.as("bit")).distinct()
    val pr = nd
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("dep"),
              col("text"))
      .select(col("doc_id"), bit.as("bit"))
    val hits = pr
      .join(broadcast(bits.withColumn("m", lit(1))), Seq("bit"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("m"), lit(0))).as("h"))
    val tr = nd
      .join(cp.select(col("text")).distinct().withColumn("t", lit(1)),
            Seq("text"), "left")
      .select(col("doc_id"), coalesce(col("t"), lit(0)).as("actual_dup"))
    hits.join(tr, Seq("doc_id"))
      .select(col("doc_id"), (col("h") === 4).cast("long").as("candidate"),
              col("actual_dup").cast("long").as("actual_dup"))
      .orderBy("doc_id")
  }

  /** md5-derived uniform in [0,1) keyed on a column — the engine-portable
    * deterministic RNG used by all sampling ops (same spelling as
    * q_sample_hash / weightedSample). */
  private def u(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    expr(s"CAST(conv(substring(md5(CAST(${key.toString} AS STRING)), 1, 4), 16, 10) AS BIGINT)") /
      lit(65536.0)

  /** Corpus-level duplicate-segment removal (the CCNet/RefinedWeb
    * paragraph-dedup pass, with fixed 8-token segments standing in for
    * paragraphs since the fixture text has no line structure): split each
    * doc into non-overlapping 8-token segments, keep only each segment's
    * globally-first occurrence (min (doc_id, seg_idx)), and reassemble the
    * surviving text per doc.
    *
    * Scale shape: first-occurrence is a groupBy(seg).min(struct) — partial
    * aggregation combines map-side, so a boilerplate segment repeated 10⁹
    * times at 100 TB reduces to one row per partition before the shuffle
    * (a row_number window over the same key would funnel the hot segment
    * through one task; the agg+join formulation is chosen for exactly that
    * reason). Reassembly groups by doc_id — bounded by document size. */
  def dedupSegments(docs: DataFrame, segTokens: Int): DataFrame = {
    val segs = segmentize(docs, segTokens)
    val first = segs.groupBy("seg")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("f"))
    val kept = col("doc_id") === col("f.doc_id") && col("seg_idx") === col("f.seg_idx")
    segs.join(first, Seq("seg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
           count(when(kept, lit(1))).as("n_kept"),
           concat_ws(" ", transform(
             array_sort(collect_list(when(kept, struct(col("seg_idx"), col("seg"))))),
             x => x("seg"))).as("new_text"))
      .orderBy("doc_id")
  }

  /** One row per (doc_id, seg_idx, seg): fixed `segTokens`-token segments
    * in document order (last segment ragged) — the shared segmentation of
    * [[dedupSegments]] and [[scrubBoilerplate]]. Map-only (explode of an
    * in-row slice transform), so segment volume ≈ corpus token volume and
    * every downstream aggregate shuffles on the segment text/hash, never
    * the document payload. */
  private def segmentize(docs: DataFrame, segTokens: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
                   ceil(size(col("toks")) / lit(segTokens.toDouble)).cast("int") - 1),
          i => array_join(slice(col("toks"), i * segTokens + 1, lit(segTokens)), " ")))
          .as(Seq("seg_idx", "seg")))

  /** RefinedWeb/CCNet-style boilerplate scrub: a segment that occurs in
    * ≥ `minDocs` DISTINCT documents is boilerplate (nav bars, license
    * blurbs, cookie banners) and is removed from EVERY document — unlike
    * [[dedupSegments]]' keep-first policy, which preserves the first
    * copy of each duplicated segment. Output is per-doc: total segments,
    * surviving segments, and the scrubbed text reassembled in segment
    * order.
    *
    * Scale: the document-frequency table is a (seg → count distinct)
    * aggregate — one shuffle keyed on the segment string (at 100 TB,
    * key on xxhash64(seg) and the df table is a fraction of corpus
    * size); the scrub decision is a join back on the same key, so both
    * exchanges reuse one partitioning. No corpus-sized table is ever
    * broadcast or collected. */
  def scrubBoilerplate(docs: DataFrame, segTokens: Int, minDocs: Int): DataFrame = {
    val segs = segmentize(docs, segTokens)
    val df = segs.groupBy("seg")
      .agg(count_distinct(col("doc_id")).as("df"))
    val kept = col("df") < minDocs
    segs.join(df, Seq("seg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
           count(when(kept, lit(1))).as("n_kept"),
           concat_ws(" ", transform(
             array_sort(collect_list(when(kept, struct(col("seg_idx"), col("seg"))))),
             x => x("seg"))).as("new_text"))
      .orderBy("doc_id")
  }

  /** Domain-mixture resampling — apply target mixture weights (the DoReMi /
    * data-mixing step) by downsampling over-represented domains with the
    * deterministic hash uniform: rate_d = min(1, w_d·N/n_d). The per-domain
    * rate table is domain-count-sized (bounded by the number of domains,
    * not the corpus) so broadcasting it is correct at any scale; the keep
    * decision itself is map-only.
    *
    * Domains NOT listed in `weights` are excluded entirely (inner join
    * against the rate table) — the mixture definition is the allowlist.
    * Pass an explicit weight-0 entry only for documentation value; both
    * spellings drop the domain. */
  def mixDomains(docs: DataFrame, weights: Seq[(String, Double)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toDF("lang", "w")
    val cnt = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val tot = docs.agg(count(lit(1)).as("t"))
    val rates = cnt.join(w, Seq("lang")).crossJoin(tot)
      .select(col("lang"),
              Det.r6(least(lit(1.0), col("w") * col("t") / col("n"))).as("rate"))
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(rates), Seq("lang"))
      .filter(u(col("doc_id")) < col("rate"))
      .select("doc_id", "lang", "rate")
      .orderBy("doc_id")
  }

  /** Token-budget corpus selection: greedily take whole quality-score
    * groups from the highest score down while the running token total
    * stays within the budget (¼ of corpus tokens). Selection granularity
    * is the ROUNDED quality score, which makes the running-sum window
    * operate on at most 10⁴+1 distinct-score rows regardless of corpus
    * size — the partition-less window is bounded by construction, never
    * corpus-sized (the naive per-doc running sum would be a global sort).
    * The selected-scores table is likewise ≤10⁴ rows → broadcast join. */
  def budgetSelect(docs: DataFrame, nStopwords: Int): DataFrame = {
    // NOT cached although referenced three times: AQE exchange reuse
    // already shares the scan/aggregation across the branches, and an A/B
    // at sf0.1 measured the cache ~0.8 s SLOWER (materialization cost +
    // broken pipelining) than the reused exchanges
    val qual = LlmOps.qualityScoresCore(docs, nStopwords)
      .select("doc_id", "quality", "n_toks")
    val g = qual.groupBy("quality").agg(sum(col("n_toks")).as("g_toks"))
    val b = qual.agg(sum(col("n_toks")).as("t"))
      .select(expr("t div 4").as("budget"))
    val wq = Window.orderBy(col("quality").desc)
    val sel = g.withColumn("cum", sum(col("g_toks")).over(wq))
      .crossJoin(broadcast(b))
      .filter(col("cum") <= col("budget"))
      .select("quality")
    qual.join(broadcast(sel), Seq("quality"))
      .select("doc_id", "quality", "n_toks")
      .orderBy("doc_id")
  }

  /** Soft dedup — the "keep everything, downweight duplicates" alternative
    * to dropping: each doc's training weight is 1/n over its exact-dup
    * group (on whitespace/punctuation-normalized text, same normalization
    * as [[LlmOps.normalizedDedup]]). One groupBy + one join back, both on
    * the normalized key; map-side combine bounds the hot-key cost the same
    * way exact dedup does. */
  def softDedupWeights(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val keyed = docs.select(col("doc_id"), norm.as("k"))
    val groups = keyed.groupBy("k").agg(count(lit(1)).as("n_copies"))
    keyed.join(groups, Seq("k"))
      .select(col("doc_id"), col("n_copies"),
              Det.r6(lit(1.0) / col("n_copies")).as("weight"))
      .orderBy("doc_id")
  }

  /** Model-score (perplexity-style) bucketing: histogram the corpus over
    * `nBuckets` fixed-width buckets of the bigram LM score on the ABSOLUTE
    * range [−6, 0] (a bigram log-prob is ≤ 0; −6 ≈ P=2.5e−3 floors normal
    * text), outliers clamped into the edge buckets; empty buckets simply
    * don't materialize. Absolute bounds — not corpus min/max — are the
    * 100 TB formulation twice over: the plan is one scoring pass + a
    * ≤nBuckets-group aggregate (a data-derived range costs a second full
    * scoring pass for the 1-row min/max — measured +2.5 s at sf0.1), and
    * bucket k means the same fluency band on every corpus shard, so
    * per-shard histograms merge by simple addition. The default 256-wide
    * grid (width 6/256 = 0.0234375, exactly binary-representable, so both
    * engines floor identically) resolves a σ≈0.03 score distribution. */
  def lmScoreBuckets(docs: DataFrame, nBuckets: Int): DataFrame =
    lmScoreBucketsFromScores(LlmOps.lmScoresCore(docs), nBuckets)

  /** [[lmScoreBuckets]] from an already-built per-doc score table — the
    * [[DocCore.lmScores]] seam (the bigram model build is shared
    * with q_text_lmscore). */
  private[graft] def lmScoreBucketsFromScores(scores: DataFrame,
                                              nBuckets: Int): DataFrame = {
    val lo = -6.0
    val width = -lo / nBuckets
    val bucket = greatest(lit(0L), least(lit(nBuckets.toLong - 1),
      floor((col("lm_score") - lit(lo)) / lit(width))))
    scores.select("doc_id", "lm_score")
      .select(col("doc_id"), col("lm_score"), bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
           Det.r6(avg(col("lm_score"))).as("avg_score"),
           min(col("lm_score")).as("min_score"),
           max(col("lm_score")).as("max_score"))
      .orderBy("bucket")
  }

  /** DSIR hashed-importance weights — the reusable core of q_sample_dsir.
    * `docs` needs (doc_id, lang, text); the target distribution is the
    * `targetLang` slice. Both bucket tables are ≤ `nBuckets` rows →
    * broadcast; per-bucket log-ratios are pre-floored to BIGINT
    * micro-units so the per-doc sum is exact and associative. */
  def dsirWeights(docs: DataFrame, targetLang: String, nBuckets: Int): DataFrame = {
    val fb = docs
      .select(col("doc_id"), col("lang"),
              explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("lang"),
        expr(s"CAST(conv(substring(md5(concat('ds', tok)), 1, 4), 16, 10) AS BIGINT) % $nBuckets")
          .as("b"))
    val tgt = fb.filter(col("lang") === targetLang)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val raw = fb.groupBy("b").agg(count(lit(1)).as("cr"))
    val tot = fb.agg(count(lit(1)).as("r_tot"),
                     count(when(col("lang") === targetLang, 1)).as("t_tot"))
    val nb = nBuckets.toDouble
    val lr = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        floor((log((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("t_tot") + lit(nb)))
             - log((col("cr") + lit(1.0)) / (col("r_tot") + lit(nb))))
          * lit(1000000.0) + lit(0.5)).cast("long").as("lr"))
    fb.join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_toks"), sum(col("lr")).as("wsum"))
      .select(col("doc_id"), col("n_toks"),
              (col("wsum") / lit(1000000.0)).as("logw"),
              (col("wsum") > 0).cast("long").as("keep"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Oracle CTE shared by budget_select (identical to q_sample_weighted's
  // quality pipeline — same stopword top-5, same rounding spelling).
  private val qualCte =
    """bag AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |stop AS (
      |  SELECT tok FROM (
      |    SELECT tok, count(*) AS cnt FROM bag GROUP BY tok) t
      |  QUALIFY row_number() OVER (ORDER BY cnt DESC, tok ASC) <= 5),
      |stopcnt AS (
      |  SELECT b.doc_id, count(*) AS n_stop
      |  FROM bag b JOIN stop s ON b.tok = s.tok GROUP BY b.doc_id),
      |base AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM documents),
      |qual AS (
      |  SELECT base.doc_id, base.n_toks,
      |    floor((0.5 * least(base.n_toks / 50.0, 1.0)
      |           + 0.5 * (1.0 - coalesce(sc.n_stop, 0) * 1.0 / base.n_toks))
      |          * 10000.0 + 0.5) / 10000.0 AS quality
      |  FROM base LEFT JOIN stopcnt sc ON base.doc_id = sc.doc_id)""".stripMargin

  val ops: Seq[OpDef] = Seq(

    OpDef(
      "q_dedup_segments",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
        |         array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS seg
        |  FROM t, LATERAL (SELECT unnest(range(0,
        |    CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS i) u),
        |r AS (
        |  SELECT doc_id, seg_idx, seg,
        |         row_number() OVER (PARTITION BY seg
        |                            ORDER BY doc_id, seg_idx) AS rn
        |  FROM segs)
        |SELECT doc_id,
        |  count(*) AS n_segs,
        |  count(*) FILTER (WHERE rn = 1) AS n_kept,
        |  coalesce(array_to_string(list(seg ORDER BY seg_idx)
        |                             FILTER (WHERE rn = 1), ' '), '') AS new_text
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) => dedupSegments(documents(s, d), 8) },

    OpDef(
      "q_scrub_boilerplate",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
        |         array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS seg
        |  FROM t, LATERAL (SELECT unnest(range(0,
        |    CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS i) u),
        |df AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
        |SELECT s.doc_id, count(*) AS n_segs,
        |  count(*) FILTER (WHERE df.df < 3) AS n_kept,
        |  coalesce(array_to_string(list(s.seg ORDER BY s.seg_idx)
        |             FILTER (WHERE df.df < 3), ' '), '') AS new_text
        |FROM segs s JOIN df ON s.seg = df.seg
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin
    ) { (s, d) => scrubBoilerplate(documents(s, d), 8, 3) },

    OpDef(
      "q_mix_domains",
      """WITH w(lang, w) AS (VALUES
        |  ('en', 0.4), ('fr', 0.2), ('es', 0.2), ('zh', 0.1), ('de', 0.1)),
        |c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT count(*) AS t FROM documents),
        |r AS (SELECT c.lang,
        |        floor(least(1.0, CAST(w.w AS DOUBLE) * t.t / c.n)
        |              * 1000000.0 + 0.5) / 1000000.0 AS rate
        |      FROM c JOIN w ON c.lang = w.lang, t)
        |SELECT d.doc_id, d.lang, r.rate
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT)
        |      / 65536.0 < r.rate
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, d) =>
      mixDomains(documents(s, d),
        Seq("en" -> 0.4, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.1, "de" -> 0.1))
    },

    OpDef(
      "q_budget_select",
      s"""WITH $qualCte,
        |g AS (SELECT quality, sum(n_toks) AS g_toks FROM qual GROUP BY quality),
        |b AS (SELECT CAST(sum(n_toks) AS BIGINT) // 4 AS budget FROM qual),
        |rsum AS (SELECT quality,
        |           sum(g_toks) OVER (ORDER BY quality DESC) AS cum FROM g),
        |sel AS (SELECT quality FROM rsum, b WHERE cum <= b.budget)
        |SELECT q.doc_id, q.quality, q.n_toks
        |FROM qual q JOIN sel ON q.quality = sel.quality
        |ORDER BY q.doc_id""".stripMargin
    ) { (s, d) => budgetSelect(documents(s, d), 5) },

    OpDef(
      "q_dedup_soft",
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                        ' +', ' ', 'g')) AS k
        |  FROM documents),
        |g AS (SELECT k, count(*) AS n_copies FROM n GROUP BY k)
        |SELECT n.doc_id, g.n_copies,
        |  floor((1.0 / g.n_copies) * 1000000.0 + 0.5) / 1000000.0 AS weight
        |FROM n JOIN g ON n.k = g.k
        |ORDER BY n.doc_id""".stripMargin
    ) { (s, d) => softDedupWeights(documents(s, d)) },

    OpDef(
      "q_text_lmbuckets",
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |  FROM docs, unnest(range(1, len(toks))) AS t(i)
        |  WHERE len(toks) >= 2),
        |c2 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c2 GROUP BY w1),
        |sc AS (
        |  SELECT bg.doc_id,
        |    floor((avg(ln(c2.c12 * 1.0 / c1.c1))) * 1000000.0 + 0.5) / 1000000.0
        |      AS lm_score
        |  FROM bg
        |  JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
        |  JOIN c1 ON bg.w1 = c1.w1
        |  GROUP BY bg.doc_id),
        |bk AS (
        |  SELECT sc.doc_id, sc.lm_score,
        |    CAST(greatest(0, least(255, floor((sc.lm_score + 6.0) / 0.0234375)))
        |      AS BIGINT) AS bucket
        |  FROM sc)
        |SELECT bucket, count(*) AS n_docs,
        |  floor((avg(lm_score)) * 1000000.0 + 0.5) / 1000000.0 AS avg_score,
        |  min(lm_score) AS min_score, max(lm_score) AS max_score
        |FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, d) => lmScoreBucketsFromScores(DocCore.lmScores(s, d), 256) },

    /** Gopher-style rule filter (Rae et al. 2021 §A1.1, adapted to the
      * fixture's lowercase space-joined text): per-document word count,
      * mean word length, type–token ratio, and single-character-word
      * fraction, each gated by a fixed bound, conjoined into a keep flag.
      * Entirely map-only — every signal is an in-row HOF over the token
      * array (array_distinct is O(L) hashing, not a sort), so the filter
      * runs at scan speed with zero shuffles at any corpus size: the
      * shape a first-pass quality gate must have at 100 TB.
      *
      * Threshold compares happen on r4-ROUNDED signals, so both engines
      * gate on the identical grid value and a boundary document cannot
      * split the engines. */
    OpDef(
      "q_text_gopher",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    floor((list_sum(list_transform(toks, w -> length(w))) * 1.0
        |           / len(toks)) * 10000.0 + 0.5) / 10000.0 AS mean_wlen,
        |    floor((len(list_distinct(toks)) * 1.0 / len(toks))
        |          * 10000.0 + 0.5) / 10000.0 AS ttr,
        |    floor((len(list_filter(toks, w -> length(w) <= 1)) * 1.0
        |           / len(toks)) * 10000.0 + 0.5) / 10000.0 AS short_frac
        |  FROM t)
        |SELECT doc_id, n_words, mean_wlen, ttr, short_frac,
        |  CAST((n_words BETWEEN 20 AND 2000)
        |       AND (mean_wlen BETWEEN 3.0 AND 8.0)
        |       AND (ttr >= 0.3) AND (short_frac <= 0.1) AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val t = documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val n = size(col("toks"))
      val m = t.select(col("doc_id"),
        n.cast("long").as("n_words"),
        Det.r4(aggregate(transform(col("toks"), w => length(w)),
                         lit(0L), (a, x) => a + x) * lit(1.0) / n)
          .as("mean_wlen"),
        Det.r4(size(array_distinct(col("toks"))) * lit(1.0) / n).as("ttr"),
        Det.r4(size(filter(col("toks"), w => length(w) <= 1)) * lit(1.0) / n)
          .as("short_frac"))
      m.select(col("doc_id"), col("n_words"), col("mean_wlen"), col("ttr"),
               col("short_frac"),
               (col("n_words").between(20, 2000) &&
                col("mean_wlen").between(3.0, 8.0) &&
                col("ttr") >= 0.3 && col("short_frac") <= 0.1)
                 .cast("long").as("keep"))
        .orderBy("doc_id")
    },

    /** Incremental crawl dedup against a SEEN-SET BLOOM FILTER — the
      * pattern that replaces a new-batch ⋈ full-corpus join when the
      * corpus no longer fits a join build side: the corpus compresses to
      * a ≤ 65536-row distinct set-bit table (k=4 salted-md5 bits over the
      * text, same construction as q_agg_bloom), which BROADCASTS — its
      * size is bounded by the filter geometry, never the corpus — and
      * each new doc probes its 4 bits map-side. all-bits-set ⇒ candidate
      * duplicate (false positives possible at the filter's ~0.3% rate;
      * verify only those against storage); any bit clear ⇒ PROVABLY new,
      * no corpus lookup at all. The output carries the exact-match truth
      * column so the oracle hash itself pins the no-false-negative
      * guarantee (actual_dup = 1 ⇒ candidate = 1); a production pipeline
      * would run the truth join only for the candidate slice. */
    OpDef(
      "q_dedup_seen",
      """WITH nd AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |cp AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        |bits AS (
        |  SELECT DISTINCT
        |    CAST('0x' || substring(md5('sb' || CAST(d.dep AS VARCHAR)
        |                                || ':' || cp.text), 1, 6) AS BIGINT)
        |      % 65536 AS bit
        |  FROM cp CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(dep)),
        |pr AS (
        |  SELECT nd.doc_id,
        |    CAST('0x' || substring(md5('sb' || CAST(d.dep AS VARCHAR)
        |                                || ':' || nd.text), 1, 6) AS BIGINT)
        |      % 65536 AS bit
        |  FROM nd CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(dep)),
        |hits AS (
        |  SELECT pr.doc_id, count(b.bit) AS h
        |  FROM pr LEFT JOIN bits b ON pr.bit = b.bit
        |  GROUP BY pr.doc_id),
        |tr AS (
        |  SELECT nd.doc_id,
        |    CASE WHEN EXISTS (SELECT 1 FROM cp WHERE cp.text = nd.text)
        |         THEN 1 ELSE 0 END AS actual_dup
        |  FROM nd)
        |SELECT h.doc_id, CAST(h.h = 4 AS BIGINT) AS candidate,
        |       CAST(tr.actual_dup AS BIGINT) AS actual_dup
        |FROM hits h JOIN tr ON h.doc_id = tr.doc_id
        |ORDER BY h.doc_id""".stripMargin
    ) { (s, d) =>
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      seenBloom(docs.filter(col("doc_id") % 10 === 0),
                docs.filter(col("doc_id") % 10 =!= 0))
    },

      /** Temperature-based mixture rates (the multilingual-sampling step of
      * XLM-R / mT5): per-language empirical share p_l is flattened to
      * q_l ∝ p_l^α (α = 0.3), boosting low-resource languages, and the
      * table reports the resampling boost q/p plus the expected post-mix
      * doc count. One corpus pass (the per-language count) feeds a
      * languages-sized table — every downstream step is bounded by the
      * number of languages, never the corpus, so the op costs one
      * aggregation at any scale.
      *
      * Determinism: p^α is spelled exp(α·ln p) on BOTH engines (the ln/exp
      * pair the lmscore family already hash-matches with), immediately
      * floored to integer micro-units; the mixture normalizer is then an
      * exact BIGINT sum, so no cross-engine float-sum-order hazard exists
      * anywhere in the chain. */
    OpDef(
      "q_mix_temperature",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT count(*) AS t FROM documents),
        |p AS (
        |  SELECT lang, n, t.t,
        |    floor((n * 1.0 / t.t) * 1000000.0 + 0.5) / 1000000.0 AS p
        |  FROM c, t),
        |a AS (
        |  SELECT lang, n, t, p,
        |    CAST(floor(exp(0.3 * ln(p)) * 1000000.0 + 0.5) AS BIGINT) AS pai
        |  FROM p),
        |s AS (SELECT CAST(sum(pai) AS BIGINT) AS s FROM a),
        |q AS (
        |  SELECT lang, n, p,
        |    floor((pai * 1.0 / s.s) * 1000000.0 + 0.5) / 1000000.0 AS q, t
        |  FROM a, s)
        |SELECT lang, CAST(n AS BIGINT) AS n, p, q,
        |  floor((q / p) * 1000000.0 + 0.5) / 1000000.0 AS boost,
        |  CAST(floor(q * t + 0.5) AS BIGINT) AS exp_n
        |FROM q ORDER BY lang""".stripMargin
    ) { (s, d) =>
      val docs = documents(s, d)
      val c = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val t = docs.agg(count(lit(1)).as("t"))
      val p = c.crossJoin(broadcast(t))
        .select(col("lang"), col("n"), col("t"),
                Det.r6(col("n") * lit(1.0) / col("t")).as("p"))
      val a = p.withColumn("pai",
        floor(exp(lit(0.3) * log(col("p"))) * lit(1000000.0) + lit(0.5))
          .cast("long"))
      val sm = a.agg(sum(col("pai")).as("s"))
      a.crossJoin(broadcast(sm))
        .select(col("lang"), col("n").cast("long").as("n"), col("p"),
                Det.r6(col("pai") * lit(1.0) / col("s")).as("q"), col("t"))
        .select(col("lang"), col("n"), col("p"), col("q"),
                Det.r6(col("q") / col("p")).as("boost"),
                floor(col("q") * col("t") + lit(0.5)).cast("long").as("exp_n"))
        .orderBy("lang")
    },

    /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
      * for Language Models via Importance Resampling"), fixture-adapted:
      * the target distribution is the corpus's `en` slice, features are
      * unigrams HASHED into 1024 buckets, and each document's weight is
      * the summed log-likelihood ratio of its tokens under the
      * add-1-smoothed target vs raw bucket distributions.
      *
      * The hashing is the entire 100 TB story: both feature tables are
      * bounded by the 1024-bucket geometry — never by vocabulary or corpus
      * — so they BROADCAST, the per-token lookup is map-side, and the only
      * shuffle is the per-doc aggregation. Per-bucket log-ratios are
      * floored to BIGINT micro-units before the per-doc sum, so the
      * many-term sum is exact integer arithmetic on both engines (the
      * double formulation would hash-diverge on partial-agg order). */
    OpDef(
      "q_sample_dsir",
      """WITH bag AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |fb AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substring(md5('ds' || tok), 1, 4) AS BIGINT) % 1024 AS b
        |  FROM bag),
        |tgt AS (SELECT b, count(*) AS ct FROM fb WHERE lang = 'en' GROUP BY b),
        |raw AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
        |tot AS (SELECT count(*) AS r_tot,
        |               count(*) FILTER (WHERE lang = 'en') AS t_tot FROM fb),
        |lr AS (
        |  SELECT raw.b,
        |    CAST(floor((ln((coalesce(tgt.ct, 0) + 1.0) / (tot.t_tot + 1024.0))
        |              - ln((raw.cr + 1.0) / (tot.r_tot + 1024.0)))
        |         * 1000000.0 + 0.5) AS BIGINT) AS lr
        |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot)
        |SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(lr.lr) AS BIGINT) / 1000000.0 AS logw,
        |  CAST(CAST(sum(lr.lr) AS BIGINT) > 0 AS BIGINT) AS keep
        |FROM fb JOIN lr ON fb.b = lr.b
        |GROUP BY fb.doc_id ORDER BY fb.doc_id""".stripMargin
    ) { (s, d) => dsirWeights(documents(s, d), "en", 1024) },

    /** Per-document novelty scoring — the redundancy signal a curation
      * pipeline uses to downweight content already covered by EARLIER
      * documents (crawl order = doc_id): each doc's distinct word-3-grams
      * are split into first-occurrences (this doc has the corpus-minimum
      * doc_id for the gram) vs already-seen, and novelty = the
      * first-occurrence fraction. Reuses [[LlmOps.grams]], the same
      * shingle construction as the whole dedup family.
      *
      * Scale shape: first-occurrence is groupBy(gram).min(doc_id) — the
      * identical map-side-combining shape as dedupSegments, so a
      * boilerplate gram repeated 10⁹ times collapses per-partition before
      * the shuffle; the join back is on the gram key; the per-doc rollup
      * is bounded by document size. */
    OpDef(
      "q_text_novelty",
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
        |    FROM docs WHERE len(toks) >= 3)),
        |f AS (SELECT g, min(doc_id) AS first_id FROM grams GROUP BY g)
        |SELECT grams.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(*) FILTER (WHERE f.first_id = grams.doc_id) AS BIGINT)
        |    AS n_novel,
        |  floor((count(*) FILTER (WHERE f.first_id = grams.doc_id) * 1.0
        |         / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS novelty
        |FROM grams JOIN f ON grams.g = f.g
        |GROUP BY grams.doc_id ORDER BY grams.doc_id""".stripMargin
    ) { (s, d) =>
      val g = LlmOps.grams(documents(s, d))
      val first = g.groupBy("g").agg(min(col("doc_id")).as("first_id"))
      g.join(first, Seq("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
             count(when(col("first_id") === col("doc_id"), 1)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
                Det.r6(col("n_novel") * lit(1.0) / col("n_grams")).as("novelty"))
        .orderBy("doc_id")
    },

    /** Chi-square test of independence over the lang × source
      * contingency table — the "is my corpus mix confounded?" diagnostic
      * (are languages distributed evenly across sources, or does one
      * source dominate a language?). Three bounded aggregations (cells,
      * row totals, column totals) + a 1-row N; the cell table is bounded
      * by |langs|·|sources|, never the corpus. Per-cell (O−E)²/E terms
      * are floored to BIGINT micro-units before the statistic sum, so the
      * many-cell total is exact integer arithmetic on both engines (the
      * same discipline as q_agg_ttest's moments). */
    OpDef(
      "q_agg_chisq",
      """WITH o AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, count(*) AS rl FROM documents GROUP BY 1),
        |c AS (SELECT source, count(*) AS cs FROM documents GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |cells AS (
        |  SELECT o.lang, o.source,
        |    CAST(floor(((o.o - (r.rl * 1.0 * c.cs / n.n))
        |                * (o.o - (r.rl * 1.0 * c.cs / n.n))
        |                / (r.rl * 1.0 * c.cs / n.n))
        |               * 1000000.0 + 0.5) AS BIGINT) AS ci
        |  FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
        |       AS BIGINT) AS df,
        |  CAST(sum(ci) AS BIGINT) / 1000000.0 AS chi2
        |FROM cells""".stripMargin
    ) { (s, d) =>
      val docs = documents(s, d)
      val o = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val r = docs.groupBy("lang").agg(count(lit(1)).as("rl"))
      val c = docs.groupBy("source").agg(count(lit(1)).as("cs"))
      val n = docs.agg(count(lit(1)).as("n"))
      val e = col("rl") * lit(1.0) * col("cs") / col("n")
      val cells = o.join(r, Seq("lang")).join(c, Seq("source"))
        .crossJoin(broadcast(n))
        .select(col("lang"), col("source"),
          floor(((col("o") - e) * (col("o") - e) / e) * lit(1000000.0)
                + lit(0.5)).cast("long").as("ci"))
      cells.agg(count(lit(1)).as("n_cells"),
        ((countDistinct(col("lang")) - 1) * (countDistinct(col("source")) - 1))
          .cast("long").as("df"),
        sum(col("ci")).as("cisum"))
        .select(col("n_cells"), col("df"),
                (col("cisum") / lit(1000000.0)).as("chi2"))
    },

    /** Cluster topic labeling — the "what is this embedding cluster
      * about?" readout of a semantic-dedup/diversity pipeline: join docs
      * to their embedding labels, score tokens per cluster by TF·IDF
      * (IDF over clusters, not docs — a topic term is one concentrated in
      * few clusters), keep the top 3 per cluster.
      *
      * Scale shape: token TF is a groupBy with map-side combine; the
      * cluster-DF table is vocabulary-bounded and never joins the corpus
      * (it joins the TF table); the 1-row cluster count broadcasts; the
      * per-cluster top-3 is WindowGroupLimit — partial top-k per
      * partition before the exchange, never a global sort. */
    OpDef(
      "q_text_cluster_topics",
      """WITH dl AS (
        |  SELECT d.text, e.label
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |bag AS (
        |  SELECT label, unnest(string_split(text, ' ')) AS tok FROM dl),
        |tf AS (SELECT label, tok, count(*) AS tf FROM bag GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |k AS (SELECT count(DISTINCT label) AS k FROM tf),
        |sc AS (
        |  SELECT tf.label, tf.tok,
        |    floor((tf.tf * ln((k.k + 1.0) / (df.df + 1.0)))
        |          * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN k)
        |SELECT label, CAST(rnk AS BIGINT) AS rnk, tok, score FROM (
        |  SELECT label, tok, score,
        |    row_number() OVER (PARTITION BY label
        |                       ORDER BY score DESC, tok ASC) AS rnk
        |  FROM sc) r
        |WHERE rnk <= 3 ORDER BY label, rnk""".stripMargin
    ) { (s, d) =>
      val dl = documents(s, d)
        .join(embeddings(s, d).select(col("vec_id"), col("label")),
              col("doc_id") === col("vec_id"))
      val tf = dl.select(col("label"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("label", "tok").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val k = tf.agg(countDistinct(col("label")).as("k"))
      val sc = tf.join(dfT, Seq("tok")).crossJoin(broadcast(k))
        .select(col("label"), col("tok"),
          Det.r6(col("tf") * log((col("k") + lit(1.0)) / (col("df") + lit(1.0))))
            .as("score"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("score").desc, col("tok").asc)
      sc.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("label"), col("rnk"), col("tok"), col("score"))
        .orderBy("label", "rnk")
    },

    /** URL canonicalization dedup — the crawl-frontier normalization pass
      * (RFC 3986 §6 plus the tracking-param strip every production crawler
      * applies): lowercase the host, drop the trailing slash, remove
      * `utm_*` query params, then exact-dedup on the canonical form. The
      * fixture has no URL column, so the op plants the noise
      * deterministically (case/slash/utm variants keyed off doc_id) and
      * the dedup must collapse exactly the planted groups. Canonicalize
      * is map-only regex work; the dedup is one groupBy on the canonical
      * key with map-side combine — the same shuffle-bounded shape as
      * q_dedup_exact, with the (short) canonical URL as the key. */
    OpDef(
      "q_dedup_url",
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END ||
        |    '.example.com/page/' || (doc_id % 100) ||
        |    CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
        |    '?id=' || (doc_id % 100) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN '&utm_campaign=x' ELSE '' END
        |      AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, url,
        |    'https://' || lower(regexp_extract(url, '^https://([^/?]+)', 1))
        |      || rtrim(regexp_extract(url, '^https://[^/?]+([^?]*)', 1), '/')
        |      || '?'
        |      || regexp_replace(regexp_extract(url, '\?(.*)$', 1),
        |                        '&utm_[a-z_]+=[^&]*', '', 'g') AS canon
        |  FROM u)
        |SELECT canon, CAST(count(*) AS BIGINT) AS n_variants,
        |       min(doc_id) AS keep_id
        |FROM c GROUP BY canon ORDER BY canon""".stripMargin
    ) { (s, d) =>
      val url = concat(lit("https://"),
        when(col("doc_id") % 5 === 0, upper(col("source")))
          .otherwise(col("source")),
        lit(".example.com/page/"), col("doc_id") % 100,
        when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
        lit("?id="), col("doc_id") % 100,
        when(col("doc_id") % 3 === 0, lit("&utm_source=feed")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("&utm_campaign=x")).otherwise(lit("")))
      val canon = concat(lit("https://"),
        lower(regexp_extract(col("url"), "^https://([^/?]+)", 1)),
        rtrim(regexp_extract(col("url"), "^https://[^/?]+([^?]*)", 1), "/"),
        lit("?"),
        regexp_replace(regexp_extract(col("url"), "\\?(.*)$", 1),
                       "&utm_[a-z_]+=[^&]*", ""))
      documents(s, d).select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), canon.as("canon"))
        .groupBy("canon")
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keep_id"))
        .orderBy("canon")
    },

    /** Cluster-stratified diversity sample: assign every vector to its
      * nearest label-centroid (the q_sim_ann_ivf coarse quantizer), then
      * keep the 2 hash-first vectors per cell — the "spread the sample
      * across embedding space" selection a curation pipeline uses so a
      * dominant mode can't monopolize the budget.
      *
      * Scale shape: the k×dim centroid table broadcasts; assignment is an
      * argmax folded into groupBy(vec_id).max(struct(sim, −cell)) — the
      * n×k candidate stream collapses map-side to one row per vector
      * (generated and reduced inside the same task), so the only full
      * shuffle carries n assignment rows into the per-cell top-2 window,
      * which Spark executes as WindowGroupLimit (partial top-2 per
      * partition before the exchange). Selection order is md5(vec_id) —
      * the same engine-portable deterministic RNG as q_sample_hash. */
    OpDef(
      "q_sample_diverse",
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cpos AS (
        |  SELECT label, i AS pos, avg(v[i]) AS cx
        |  FROM e, (SELECT unnest(range(1, 65)) AS i)
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label AS cell, list(cx ORDER BY pos) AS cv
        |  FROM cpos GROUP BY label),
        |sims AS (
        |  SELECT e.vec_id, c.cell,
        |    floor((list_sum(list_transform(range(1, 65), i -> e.v[i] * c.cv[i])))
        |          * 1000000.0 + 0.5) / 1000000.0 AS sim
        |  FROM e, cent c),
        |asg AS (
        |  SELECT vec_id, cell, sim FROM (
        |    SELECT vec_id, cell, sim,
        |      row_number() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell ASC) AS rn
        |    FROM sims) WHERE rn = 1),
        |pick AS (
        |  SELECT cell, vec_id, sim,
        |    row_number() OVER (PARTITION BY cell
        |                       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC,
        |                                vec_id ASC) AS pick
        |  FROM asg)
        |SELECT cell, CAST(pick AS BIGINT) AS pick, vec_id, sim
        |FROM pick WHERE pick <= 2
        |ORDER BY cell, pick""".stripMargin
    ) { (s, d) =>
      graft.GraftFunctions.register(s)
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"),
                transform(col("embedding"), x => x.cast("double")).as("v"))
      val cent = e
        .select(col("label").as("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("cx"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
                       p => p.getField("cx")).as("cv"))
      val sims = e.join(broadcast(cent))
        .select(col("vec_id"), col("cell"),
                Det.r6(expr("graft_dot(v, cv)")).as("sim"))
      // argmax as max(struct(sim, −cell)): highest sim, ties to the
      // smallest cell — partial-aggregates map-side where a window would
      // shuffle the full n×k candidate stream
      val asg = sims
        .groupBy("vec_id")
        .agg(max(struct(col("sim"), (-col("cell")).as("nc"))).as("m"))
        .select(col("vec_id"), (-col("m.nc")).cast("int").as("cell"),
                col("m.sim").as("sim"))
      val wPick = Window.partitionBy(col("cell"))
        .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      asg.withColumn("pick", row_number().over(wPick).cast("long"))
        .filter(col("pick") <= 2)
        .select("cell", "pick", "vec_id", "sim")
        .orderBy("cell", "pick")
    },

    /** Data-constrained repetition schedule (Muennighoff et al. 2023,
      * "Scaling Data-Constrained Language Models") — when the token
      * budget exceeds what a domain holds, you repeat it, but returns
      * decay fast past ~4 epochs. Budget = 2× total corpus tokens, split
      * uniformly across languages; each language's plan is
      * epochs = min(4, ceil(target / available)) and the tokens actually
      * served = min(target, epochs × available) — a shortfall on tiny
      * domains is surfaced, not silently backfilled. Pure integer
      * arithmetic (ceil-div spelled (t + a − 1) div a) on one bounded
      * per-language aggregate + a 1-row budget broadcast. */
    OpDef(
      "q_mix_epochs",
      """WITH t AS (
        |  SELECT lang,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
        |  FROM documents GROUP BY 1),
        |g AS (SELECT CAST(2 * sum(avail) AS BIGINT) AS budget,
        |             count(*) AS nl FROM t),
        |a AS (SELECT lang, avail, budget // nl AS target FROM t, g)
        |SELECT lang, avail, CAST(target AS BIGINT) AS target_toks,
        |  CAST(least(4, (target + avail - 1) // avail) AS BIGINT) AS epochs,
        |  CAST(least(target, least(4, (target + avail - 1) // avail) * avail)
        |       AS BIGINT) AS eff_toks
        |FROM a ORDER BY lang""".stripMargin
    ) { (s, d) =>
      val t = documents(s, d)
        .groupBy("lang")
        .agg(sum(size(split(col("text"), " "))).cast("long").as("avail"))
      val g = t.agg((lit(2) * sum(col("avail"))).cast("long").as("budget"),
                    count(lit(1)).as("nl"))
      t.crossJoin(broadcast(g))
        .select(col("lang"), col("avail"),
                expr("budget div nl").as("target_toks"))
        .withColumn("epochs",
          least(lit(4L), expr("(target_toks + avail - 1) div avail")))
        .withColumn("eff_toks",
          least(col("target_toks"), col("epochs") * col("avail")))
        .orderBy("lang")
    },

    /** Code-vs-prose routing signals — pretraining corpora route code and
      * natural language to different tokenizers/mixtures, and the first
      * pass is a cheap scan-speed heuristic, not a model: per-doc symbol
      * density (brackets/operators), digit density, and uppercase density
      * as character-count fractions, conjoined into an is_codelike flag.
      * Every signal is codegen'd string arithmetic (length minus length-
      * after-strip), fully map-only — zero shuffles at any corpus size
      * (the q_text_gopher discipline). Patterns stay in the ASCII subset
      * where Java regex and RE2 agree; fractions r6-round before the
      * threshold compare. */
    OpDef(
      "q_text_code_detect",
      """WITH s AS (
        |  SELECT doc_id, length(text) AS n,
        |    length(text) - length(regexp_replace(text, '[=;<>(){}\[\]]', '',
        |                                         'g')) AS n_sym,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS n_dig,
        |    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
        |      AS n_up
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id,
        |  floor((n_sym * 1.0 / n) * 1000000.0 + 0.5) / 1000000.0 AS sym_frac,
        |  floor((n_dig * 1.0 / n) * 1000000.0 + 0.5) / 1000000.0 AS dig_frac,
        |  floor((n_up * 1.0 / n) * 1000000.0 + 0.5) / 1000000.0 AS up_frac,
        |  CAST(CASE WHEN floor((n_sym * 1.0 / n) * 1000000.0 + 0.5)
        |                 / 1000000.0 > 0.02
        |             OR floor((n_dig * 1.0 / n) * 1000000.0 + 0.5)
        |                 / 1000000.0 > 0.15
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_codelike
        |FROM s ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      def stripped(pat: String) =
        length(col("text")) - length(regexp_replace(col("text"), pat, ""))
      val sig = documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), length(col("text")).as("n"),
                stripped("[=;<>(){}\\[\\]]").as("n_sym"),
                stripped("[0-9]").as("n_dig"),
                stripped("[A-Z]").as("n_up"))
      sig.select(col("doc_id"),
          Det.r6(col("n_sym") * lit(1.0) / col("n")).as("sym_frac"),
          Det.r6(col("n_dig") * lit(1.0) / col("n")).as("dig_frac"),
          Det.r6(col("n_up") * lit(1.0) / col("n")).as("up_frac"))
        .withColumn("is_codelike",
          when(col("sym_frac") > 0.02 || col("dig_frac") > 0.15, 1L)
            .otherwise(0L))
        .orderBy("doc_id")
    },

    /** Quality-vs-tokens Pareto curve — q_budget_select answers "what
      * fits THIS budget"; planning needs the whole trade-off artifact:
      * for every quality-sorted prefix (at ROUNDED-score-group
      * granularity, the budget_select discipline that keeps the window
      * over ≤ 10⁴+1 rows at any corpus size), the cumulative docs,
      * cumulative tokens, and token-weighted mean quality of the prefix.
      * Quality sits on the r4 grid, so score×tokens products are exact
      * BIGINT and every cumulative sum is order-exact; one rounded
      * division per output row. */
    OpDef(
      "q_budget_pareto",
      s"""WITH $qualCte,
        |g AS (SELECT quality, count(*) AS n_docs,
        |             CAST(sum(n_toks) AS BIGINT) AS g_toks
        |      FROM qual GROUP BY quality),
        |r AS (
        |  SELECT quality, n_docs, g_toks,
        |    CAST(sum(n_docs) OVER wq AS BIGINT) AS cum_docs,
        |    CAST(sum(g_toks) OVER wq AS BIGINT) AS cum_toks,
        |    CAST(sum(CAST(floor(quality * 10000.0 + 0.5) AS BIGINT) * g_toks)
        |         OVER wq AS BIGINT) AS cum_qtoks
        |  FROM g
        |  WINDOW wq AS (ORDER BY quality DESC ROWS UNBOUNDED PRECEDING))
        |SELECT quality, CAST(n_docs AS BIGINT) AS n_docs, cum_docs, cum_toks,
        |  floor((cum_qtoks * 1.0 / cum_toks / 10000.0) * 10000.0 + 0.5)
        |    / 10000.0 AS prefix_quality
        |FROM r ORDER BY quality DESC""".stripMargin
    ) { (s, d) =>
      val qual = LlmOps.qualityScoresCore(documents(s, d), 5)
        .select("doc_id", "quality", "n_toks")
      val g = qual.groupBy("quality")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_toks")).cast("long").as("g_toks"))
      val wq = org.apache.spark.sql.expressions.Window
        .orderBy(col("quality").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      g.select(col("quality"), col("n_docs"), col("g_toks"),
          sum(col("n_docs")).over(wq).cast("long").as("cum_docs"),
          sum(col("g_toks")).over(wq).cast("long").as("cum_toks"),
          sum(floor(col("quality") * lit(10000.0) + lit(0.5)).cast("long")
              * col("g_toks")).over(wq).cast("long").as("cum_qtoks"))
        .select(col("quality"), col("n_docs"), col("cum_docs"), col("cum_toks"),
          Det.r4(col("cum_qtoks") * lit(1.0) / col("cum_toks") / lit(10000.0))
            .as("prefix_quality"))
        .orderBy(col("quality").desc)
    },

    /** Blocklist safety gate — the term-level content filter every crawl
      * pipeline runs before training (the C4 badwords pass). The list is a
      * compile-time constant here; in production it is a few thousand terms
      * — either way it is BOUNDED and travels to every task as part of the
      * codegen'd expression (or a broadcast array), so the gate is MAP-ONLY:
      * no shuffle, no join, linear in corpus bytes at any scale. Matching is
      * token-exact (not substring — "scunthorpe" must not trip a "thorpe"
      * entry): per doc, the count of blocklist TERMS present, the count of
      * token OCCURRENCES matching the list, and the resulting gate flag.
      * Iterating the 3-term list per row (terms × tokens) is the right
      * asymmetry: the list is O(1) per row; building tokens-as-set instead
      * would hash the whole document per row for the same answer. */
    OpDef(
      "q_text_blocklist",
      """SELECT doc_id,
        |  CAST(len(list_filter(['slow', 'big', 'hash'],
        |         t -> list_contains(string_split(text, ' '), t)))
        |       AS BIGINT) AS n_terms,
        |  CAST(len(list_filter(string_split(text, ' '),
        |         t -> t IN ('slow', 'big', 'hash'))) AS BIGINT) AS n_occ,
        |  CAST(CASE WHEN len(list_filter(['slow', 'big', 'hash'],
        |         t -> list_contains(string_split(text, ' '), t))) > 0
        |       THEN 1 ELSE 0 END AS BIGINT) AS blocked
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      documents(s, d).select(
          col("doc_id"),
          expr("CAST(size(filter(array('slow', 'big', 'hash'), " +
               "t -> array_contains(split(text, ' '), t))) AS BIGINT)")
            .as("n_terms"),
          expr("CAST(size(filter(split(text, ' '), " +
               "t -> t IN ('slow', 'big', 'hash'))) AS BIGINT)")
            .as("n_occ"))
        .withColumn("blocked",
          when(col("n_terms") > 0, 1L).otherwise(0L))
        .orderBy("doc_id")
    },

    /** Deterministic negative sampling — the contrastive-training data
      * prep step: each anchor doc draws 4 pseudo-random peers via the
      * md5 uniform (neg_id = hash(anchor, j) mod N), accidental
      * self-draws dropped (so a row can have < 4 negatives — documented,
      * not padded). Because doc_ids are dense 0..N−1 in the fixture, the
      * modulus always lands on a real doc; a sparse-id corpus would first
      * build the same dense index with a rank window.
      *
      * Scale shape: the corpus count is a 1-row broadcast; draw
      * generation is map-only (bounded ×4 explode); resolving the
      * negative's attributes is one equi-join on neg_id — shuffle-bounded,
      * never quadratic, and uniformity of the md5 draw is asserted in
      * CurationSpec. */
    OpDef(
      "q_sample_negatives",
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |draws AS (
        |  SELECT d.doc_id, CAST(j AS BIGINT) AS j,
        |    CAST('0x' || substring(md5('neg' || CAST(d.doc_id AS VARCHAR)
        |                                || ':' || CAST(j AS VARCHAR)), 1, 12)
        |         AS BIGINT) % n.n AS neg_id
        |  FROM documents d, n, UNNEST(range(0, 4)) AS t(j))
        |SELECT dr.doc_id, dr.j, dr.neg_id, doc.lang AS neg_lang,
        |       doc.source AS neg_source
        |FROM draws dr JOIN documents doc ON dr.neg_id = doc.doc_id
        |WHERE dr.neg_id <> dr.doc_id
        |ORDER BY dr.doc_id, dr.j""".stripMargin
    ) { (s, d) =>
      val docs = documents(s, d)
      val n = docs.agg(count(lit(1)).as("n"))
      val draws = docs.select(col("doc_id"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), explode(sequence(lit(0L), lit(3L))).as("j"),
                col("n"))
        .select(col("doc_id"), col("j"),
          (expr("CAST(conv(substring(md5(concat('neg', CAST(doc_id AS STRING)," +
             " ':', CAST(j AS STRING))), 1, 12), 16, 10) AS BIGINT)")
             % col("n")).as("neg_id"))
        .filter(col("neg_id") =!= col("doc_id"))
      draws.join(
          docs.select(col("doc_id").as("neg_id"), col("lang").as("neg_lang"),
                      col("source").as("neg_source")),
          Seq("neg_id"))
        .select("doc_id", "j", "neg_id", "neg_lang", "neg_source")
        .orderBy("doc_id", "j")
    }
  )
}
