package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus quality signals beyond [[TextAnalysis.quality]]'s basic ratios:
  * the Gopher-style rule filter (Rae et al. 2021, "Scaling Language Models",
  * appendix A — the public heuristic suite C4/Gopher/RefinedWeb pipelines
  * all run), per-document unigram Shannon entropy, DSIR-style hashed-n-gram
  * importance weights (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"), and a per-source token-distribution KL-drift
  * report.
  *
  * Determinism discipline (file-wide, same as [[TextAnalysis]]): every
  * floating term is rounded to 6 dp BEFORE aggregation and summed as
  * DECIMAL(20,6) — decimal addition is exact, so the result is independent
  * of addition order and bit-identical across engines and partitionings.
  */
object QualitySignals {

  // ── Gopher rule thresholds, tuned to split the synthetic corpus ─────────
  // (word counts 10..99 median 56; TTR p10 ≈ 0.32; top-word frac p90 ≈ 0.14)
  val MinWords = 20
  val MaxWords = 90
  val MinAvgWordLen = 3.0
  val MaxAvgWordLen = 10.0
  val MinStopHits = 2
  val MinTtr = 0.35
  val MaxTopWordFrac = 0.125

  /** Gopher-style per-document rule filter: word-count bounds, mean word
    * length bounds, minimum stopword evidence, type-token-ratio floor
    * (kills "batch batch batch" repetition), and a most-common-word
    * dominance ceiling (Gopher's "fraction of tokens in the most frequent
    * word" rule). One boolean per rule plus the conjunction, so a curation
    * run can report WHICH rule rejected each document.
    *
    * Scale shape: pure per-row array expressions — zero shuffles, fully
    * codegen'd, streams at any corpus size. The top-word count is computed
    * inside the row (`transform` over distinct words + `filter` counts,
    * O(distinct·words) per doc) rather than an explode + groupBy, trading
    * bounded per-row CPU for the absence of a corpus-wide shuffle. */
  def gopherRules(s: SparkSession, d: String): DataFrame = {
    val stopArr = array(TextAnalysis.Stopwords.map(lit): _*)
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nw", size(col("ws")))
      .withColumn("top_c",
        array_max(expr("transform(array_distinct(ws), w -> size(filter(ws, x -> x = w)))")))
      .select(
        col("doc_id"), col("lang"), col("source"),
        col("nw").as("n_words"),
        ((length(col("text")) - col("nw") + 1).cast(DoubleType) / col("nw"))
          .as("avg_word_len"),
        size(filter(col("ws"), w => array_contains(stopArr, w))).as("stop_hits"),
        (size(array_distinct(col("ws"))).cast(DoubleType) / col("nw")).as("ttr"),
        (col("top_c").cast(DoubleType) / col("nw")).as("top_word_frac"))
      .withColumn("wc_ok", col("n_words") >= MinWords && col("n_words") <= MaxWords)
      .withColumn("awl_ok",
        col("avg_word_len") >= MinAvgWordLen && col("avg_word_len") <= MaxAvgWordLen)
      .withColumn("stop_ok", col("stop_hits") >= MinStopHits)
      .withColumn("ttr_ok", col("ttr") >= MinTtr)
      .withColumn("top_ok", col("top_word_frac") <= MaxTopWordFrac)
      .withColumn("pass",
        col("wc_ok") && col("awl_ok") && col("stop_ok") && col("ttr_ok") && col("top_ok"))
      .orderBy("doc_id")
  }

  val gopherRulesSql: String = {
    val stopList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (SELECT doc_id, lang, source, text,
                     string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw
                   FROM documents),
        f AS (SELECT doc_id, lang, source,
                CAST(nw AS INT) AS n_words,
                CAST(length(text) - nw + 1 AS DOUBLE) / nw AS avg_word_len,
                CAST(len(list_filter(ws, x -> x IN ($stopList))) AS INT) AS stop_hits,
                CAST(len(list_distinct(ws)) AS DOUBLE) / nw AS ttr,
                CAST(list_max(list_transform(list_distinct(ws),
                  w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / nw
                  AS top_word_frac
              FROM w)
        SELECT *,
          n_words >= $MinWords AND n_words <= $MaxWords AS wc_ok,
          avg_word_len >= $MinAvgWordLen AND avg_word_len <= $MaxAvgWordLen AS awl_ok,
          stop_hits >= $MinStopHits AS stop_ok,
          ttr >= $MinTtr AS ttr_ok,
          top_word_frac <= $MaxTopWordFrac AS top_ok,
          (n_words >= $MinWords AND n_words <= $MaxWords)
            AND (avg_word_len >= $MinAvgWordLen AND avg_word_len <= $MaxAvgWordLen)
            AND stop_hits >= $MinStopHits AND ttr >= $MinTtr
            AND top_word_frac <= $MaxTopWordFrac AS pass
        FROM f ORDER BY doc_id"""
  }

  /** Per-document unigram Shannon entropy H = −Σ p(w)·ln p(w) plus the
    * length-normalized variant H / ln(n) ∈ [0, 1] — the information-density
    * signal that separates natural text (high) from template/repetition spam
    * (low) independent of document length.
    *
    * Scale shape: like [[gopherRules]], entirely per-row array expressions —
    * distinct-word counts, per-word −p·ln p terms rounded to 6 dp and summed
    * with an exact DECIMAL fold (`aggregate`) — so the value is independent
    * of both addition order and partitioning, with zero shuffles. */
  def wordEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n", size(col("ws")))
      .withColumn("cs",
        expr("transform(array_distinct(ws), w -> size(filter(ws, x -> x = w)))"))
      .withColumn("ent", expr(
        """aggregate(
             transform(cs, c -> cast(round(-(c / cast(n as double))
               * ln(c / cast(n as double)), 6) as decimal(20,6))),
             cast(0 as decimal(20,6)),
             (a, x) -> cast(a + x as decimal(20,6)))"""))
      .select(
        col("doc_id"),
        col("n").as("n_words"),
        size(col("cs")).as("n_distinct"),
        round(col("ent").cast(DoubleType), 6).as("entropy"),
        when(col("n") > 1,
          round(col("ent").cast(DoubleType) / log(col("n").cast(DoubleType)), 6))
          .otherwise(0.0).as("norm_entropy"))
      .orderBy("doc_id")

  val wordEntropySql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       t AS (SELECT doc_id, unnest(ws) AS word, len(ws) AS n FROM w),
       c AS (SELECT doc_id, word, any_value(n) AS n, count(*) AS c
             FROM t GROUP BY doc_id, word),
       tm AS (SELECT doc_id, n,
                CAST(round(-(c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)), 6)
                  AS DECIMAL(20,6)) AS term
              FROM c),
       a AS (SELECT doc_id, any_value(n) AS n, CAST(count(*) AS INT) AS n_distinct,
               sum(term) AS ent
             FROM tm GROUP BY doc_id)
       SELECT doc_id, CAST(n AS INT) AS n_words, n_distinct,
         round(CAST(ent AS DOUBLE), 6) AS entropy,
         CASE WHEN n > 1 THEN round(CAST(ent AS DOUBLE) / ln(CAST(n AS DOUBLE)), 6)
              ELSE 0.0 END AS norm_entropy
       FROM a ORDER BY doc_id"""

  // ── DSIR importance weights ─────────────────────────────────────────────

  /** Hashed-feature space size. 256 buckets keeps the model table trivially
    * broadcastable while still separating the synthetic vocabulary; a real
    * deployment uses 10k–100k buckets — the plan shape is unchanged because
    * the model stays bucket-arity, never vocab-arity. */
  val DsirBuckets = 256

  /** Laplace pseudo-count for both the target and raw bucket distributions. */
  val DsirAlpha = 0.5

  /** The target slice whose distribution defines "wanted" data. */
  val DsirTargetLang = "en"

  /** DSIR-style importance weights: estimate the target ([[DsirTargetLang]]
    * documents) and raw (whole corpus) unigram distributions over
    * [[DsirBuckets]] hashed buckets, then score every document by its mean
    * per-token log-likelihood ratio ln(p_target / p_raw). Documents whose
    * token mix resembles the target score positive and would be kept /
    * upsampled by importance resampling (Xie et al. 2023).
    *
    * Scale shape: ONE corpus aggregation builds both bucket count columns
    * (bucket-arity = 256 rows, map-side combined); totals are a 1-row
    * rollup of that table; the per-bucket log-ratio table broadcasts back
    * onto the token stream for a doc-arity aggregation. The token hash is
    * md5-prefix arithmetic shared verbatim with the oracle. */
  def dsirWeights(s: SparkSession, d: String): DataFrame = {
    val alphaB = DsirAlpha * DsirBuckets // exact in binary: 0.5 * 256 = 128.0
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .withColumn("b",
        conv(substring(md5(col("w")), 1, 7), 16, 10).cast(LongType) % DsirBuckets)
    val buckets = toks.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct"))
    val tot = buckets.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val llr = buckets.crossJoin(broadcast(tot))
      .select(col("b"), round(log(
        ((col("ct") + DsirAlpha) / (col("tt") + alphaB)) /
          ((col("cr") + DsirAlpha) / (col("tr") + alphaB))), 6).as("llr"))
    toks.join(broadcast(llr), "b")
      .groupBy("doc_id")
      .agg(
        first(col("lang")).as("lang"),
        count(lit(1)).cast(IntegerType).as("n_tokens"),
        sum(col("llr").cast(DecimalType(20, 6))).as("sllr"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("sllr").cast(DoubleType) / col("n_tokens"), 6).as("avg_llr"))
      .withColumn("keep", col("avg_llr") > 0.0)
      .orderBy("doc_id")
  }

  val dsirWeightsSql: String =
    s"""WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                      FROM documents),
        tb AS (SELECT doc_id, lang,
                 CAST('0x' || substr(md5(w), 1, 7) AS BIGINT) % $DsirBuckets AS b
               FROM toks),
        bc AS (SELECT b, count(*) AS cr,
                 sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS ct
               FROM tb GROUP BY b),
        tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(ct) AS BIGINT) AS tt
                FROM bc),
        llr AS (SELECT b, round(ln(((ct + $DsirAlpha) / (tt + 128.0))
                  / ((cr + $DsirAlpha) / (tr + 128.0))), 6) AS llr
                FROM bc, tot),
        a AS (SELECT t.doc_id, any_value(t.lang) AS lang,
                CAST(count(*) AS INT) AS n_tokens,
                sum(CAST(l.llr AS DECIMAL(20,6))) AS sllr
              FROM tb t JOIN llr l USING (b) GROUP BY t.doc_id)
        SELECT doc_id, lang, n_tokens,
          round(CAST(sllr AS DOUBLE) / n_tokens, 6) AS avg_llr,
          round(CAST(sllr AS DOUBLE) / n_tokens, 6) > 0.0 AS keep
        FROM a ORDER BY doc_id"""

  /** Per-source token-distribution drift vs the corpus: KL(source ‖ corpus)
    * = Σ_w p_s(w)·ln(p_s(w)/p_c(w)) over the unigram distributions — the
    * monitoring statistic a crawl-ops team alerts on when one source's
    * content shifts (spam flood, template change) relative to the pool.
    * No smoothing is needed: every source token is by construction in the
    * corpus distribution, so the ratio is always finite.
    *
    * Scale shape: ONE (source × word) corpus aggregation; corpus marginals
    * are a word-arity rollup OF that table (never a second corpus pass)
    * joined back on the word key (co-partitioned equi-join — at web scale
    * both sides are vocab-arity, far below corpus-arity); per-source totals
    * are source-arity broadcasts; the KL terms round to 6 dp and sum as
    * exact DECIMAL per source. */
  def sourceDrift(s: SparkSession, d: String): DataFrame = {
    val sw = graft.TrackedCaches.track(
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c")).cache())
    val corpus = sw.groupBy("w").agg(sum("c").as("cc"))
    val totals = sw.groupBy("source").agg(sum("c").as("ts"))
    val t = totals.agg(sum("ts").as("t"))
    sw.join(corpus, "w")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(t))
      .withColumn("term",
        round((col("c").cast(DoubleType) / col("ts")) *
          log((col("c").cast(DoubleType) * col("t")) /
            (col("ts").cast(DoubleType) * col("cc"))), 6)
          .cast(DecimalType(20, 6)))
      .groupBy("source")
      .agg(
        count(lit(1)).cast(IntegerType).as("vocab"),
        first(col("ts")).as("n_tokens"),
        sum(col("term")).as("skl"))
      .select(col("source"), col("vocab"), col("n_tokens"),
        round(col("skl").cast(DoubleType), 6).as("kl_drift"))
      .orderBy("source")
  }

  // ── Quality-weighted sampling ───────────────────────────────────────────

  /** High-tier entropy floor (corpus median norm_entropy ≈ 0.77). */
  val HighEntropyFloor = 0.78

  /** Per-tier keep rates, in millionths (exact integers so the hash
    * threshold comparison is integer-exact in both engines). */
  val HighKeepPpm = 1000000L // keep all
  val MidKeepPpm = 500000L   // keep half
  val LowKeepPpm = 100000L   // keep 10%

  /** Quality-weighted sampling — the FineWeb-style soft filter: instead of
    * a hard reject, documents are tiered by the quality signals
    * ([[gopherRules]] pass × [[wordEntropy]] information density) and kept
    * at a per-tier rate via the deterministic md5 hash (the
    * [[TextAnalysis.mixtureRebalance]] coin). Tier 2 (rules pass, high
    * entropy) keeps everything; tier 1 (rules pass) keeps half; tier 0
    * keeps 10% — preserving a low-quality trickle for robustness, which is
    * why soft beats hard filtering.
    *
    * Scale shape: both signal operators are shuffle-free per-row passes
    * (plan-gated in QualitySignalsSpec), joined doc-arity; the verdict is a
    * per-row integer hash compare. Streams at any corpus size. */
  def qualityWeightedSample(s: SparkSession, d: String): DataFrame = {
    val rules = gopherRules(s, d).select(col("doc_id"), col("pass"))
    val ent = wordEntropy(s, d).select(col("doc_id"), col("norm_entropy"))
    Tables.documents(s, d).select("doc_id", "lang", "source")
      .join(rules, "doc_id")
      .join(ent, "doc_id")
      .withColumn("tier",
        when(col("pass") && col("norm_entropy") >= HighEntropyFloor, 2)
          .when(col("pass"), 1).otherwise(0))
      .withColumn("keep_ppm",
        when(col("tier") === 2, HighKeepPpm)
          .when(col("tier") === 1, MidKeepPpm).otherwise(LowKeepPpm))
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 7), 16, 10)
          .cast(LongType) % 1000000L)
      .withColumn("kept", col("h") < col("keep_ppm"))
      .select("doc_id", "lang", "source", "tier", "keep_ppm", "kept")
      .orderBy("doc_id")
  }

  val qualityWeightedSampleSql: String =
    s"""WITH rules AS ($gopherRulesSql),
        ent AS ($wordEntropySql),
        t AS (SELECT d.doc_id, d.lang, d.source,
                CASE WHEN r.pass AND e.norm_entropy >= $HighEntropyFloor THEN 2
                     WHEN r.pass THEN 1 ELSE 0 END AS tier
              FROM documents d
              JOIN rules r USING (doc_id) JOIN ent e USING (doc_id))
        SELECT doc_id, lang, source, tier,
          CAST(CASE tier WHEN 2 THEN $HighKeepPpm WHEN 1 THEN $MidKeepPpm
               ELSE $LowKeepPpm END AS BIGINT) AS keep_ppm,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
            % 1000000
            < CASE tier WHEN 2 THEN $HighKeepPpm WHEN 1 THEN $MidKeepPpm
                ELSE $LowKeepPpm END AS kept
        FROM t ORDER BY doc_id"""

  val sourceDriftSql: String =
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w
                     FROM documents),
       sw AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
       corpus AS (SELECT w, CAST(sum(c) AS BIGINT) AS cc FROM sw GROUP BY w),
       totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS ts FROM sw GROUP BY source),
       t AS (SELECT CAST(sum(ts) AS BIGINT) AS t FROM totals),
       terms AS (SELECT sw.source,
                   CAST(round((CAST(sw.c AS DOUBLE) / ts.ts)
                     * ln((CAST(sw.c AS DOUBLE) * t.t)
                         / (CAST(ts.ts AS DOUBLE) * c.cc)), 6)
                     AS DECIMAL(20,6)) AS term,
                   ts.ts
                 FROM sw JOIN corpus c USING (w) JOIN totals ts USING (source)
                 CROSS JOIN t)
       SELECT source, CAST(count(*) AS INT) AS vocab,
         any_value(ts) AS n_tokens,
         round(CAST(sum(term) AS DOUBLE), 6) AS kl_drift
       FROM terms GROUP BY source ORDER BY source"""
}
