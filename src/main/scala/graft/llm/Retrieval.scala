package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text retrieval over the documents table — the lookup side of a curation
  * pipeline (decontamination probes against eval sets, quality-by-example
  * retrieval, near-query mining). Reference scope: the reference has no
  * retrieval; this extends the LLM-pipeline surface the same way the ANN
  * family does for vectors.
  *
  * Both rankers share one inverted-index shape: postings (doc, term, tf)
  * built in a single corpus pass, joined on term against the (tiny,
  * broadcast) query-side term lists. Cost is bounded by posting-list
  * length: query terms with df above [[Retrieval.MaxDfPct]]% of the corpus
  * are dropped before the join (their BM25 idf is ~0 anyway — the classic
  * stopword cut), so no single term can drag in a corpus-scale posting
  * list. At web scale the
  * next steps are impact-ordered postings + WAND-style early exit; the
  * join shape here is what those optimize, not replace.
  *
  * Determinism for the oracle diff (file-wide discipline): every per-term
  * double is rounded to 6 dp and summed as DECIMAL(20,6) — exact and
  * order-independent — then the total is rounded back to 6 dp; ranking
  * ties break on doc_id. Arithmetic is written with EXPLICIT parentheses
  * mirrored token-for-token in the DuckDB SQL, because IEEE ops are only
  * reproducible if associated identically. */
object Retrieval {

  val TopK = 10
  val NumQueries = 5    // query set = doc_id < 5, the ANN-family idiom
  val K1 = 1.2          // BM25 term-frequency saturation
  val B = 0.75          // BM25 length normalization
  val RrfK = 60         // reciprocal-rank-fusion damping (the standard 60)
  // Stopword ceiling: query terms present in more than this percent of
  // documents are dropped before the postings join. 85% cuts the Zipfian
  // stopword head (the/of/and-class terms) whose posting lists are the
  // corpus-scale join risk while their idf contributes ~nothing; it is set
  // ABOVE the synthetic corpus's common-term plateau (df ~75-80% of docs —
  // 31-term vocabulary), where a typical 50% cut would silently drop the
  // entire vocabulary and return nothing.
  val MaxDfPct = 85
  val ListK = 30        // per-ranker candidate depth fed into the fusion

  /** One row per (doc, term) occurrence count, split on single spaces —
    * the tokenization every text operator in the library uses. */
  private[graft] def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** The standing corpus side of BM25: postings WITH the doc length folded
    * in (so scoring probes ONE table — no per-batch doc-arity join), term
    * dfs, and the 1-row corpus stats. `cache` pins them (via TrackedCaches)
    * for callers that probe the index repeatedly — the streaming
    * decontamination gate builds it ONCE and scores every micro-batch
    * against it without another corpus pass. */
  private[graft] case class Bm25Index(tf: DataFrame, dft: DataFrame,
      stats: DataFrame)

  private[graft] def buildIndex(docs: DataFrame, cache: Boolean = false): Bm25Index = {
    def pin(df: DataFrame): DataFrame =
      if (cache) graft.TrackedCaches.track(df.cache()) else df
    val tf0 = pin(postings(docs))
    val dl = tf0.groupBy("doc_id").agg(sum("tf").as("len"))
    val stats = pin(dl.agg(count(lit(1)).as("n"),
      (sum("len").cast(DoubleType) / count(lit(1))).as("avglen")))
    val tf = pin(tf0.join(dl, "doc_id"))
    val dft = pin(tf0.groupBy("term").agg(count(lit(1)).as("df")))
    Bm25Index(tf, dft, stats)
  }

  /** (query_id, doc_id, score) of every (query, corpus-doc) pair sharing a
    * sub-ceiling term. `queryTerms` is (query_id, term) — distinct terms,
    * the short-query convention; df/length/stats all come from the INDEX
    * side only, so a score depends on nothing but the standing corpus and
    * the query's own terms (the invariance the streaming gate relies on). */
  private[graft] def scoreAgainst(ix: Bm25Index, queryTerms: DataFrame): DataFrame =
    ix.tf
      .join(broadcast(queryTerms.join(ix.dft, "term")), "term")
      .crossJoin(broadcast(ix.stats))
      .filter(col("doc_id") =!= col("query_id") && col("df") * 100 <= col("n") * MaxDfPct)
      .withColumn("ts", round(
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * (col("len") / col("avglen")))),
        6).cast(DecimalType(20, 6)))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("ts").cast(DoubleType), 6).as("score"))

  /** BM25 top-k: score = sum over shared terms of
    * ln(1 + (N - df + 0.5)/(df + 0.5)) * (tf*(k1+1)) / (tf + k1*(1 - b + b*len/avglen))
    * — the Robertson/Lucene formulation (always-positive idf). The corpus
    * pass builds postings + doc lengths once; df is a term-arity aggregate;
    * the 1-row (N, avglen) stats and the query term lists broadcast. */
  def bm25TopK(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val ix = buildIndex(docs, cache = true)
    val qt = ix.tf.filter(col("doc_id") < NumQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val agg = scoreAgainst(ix, qt)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    agg.withColumn("rk", row_number().over(w).cast(IntegerType))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("doc_id"), col("score"))
      .orderBy("query_id", "rk")
  }

  val bm25Sql: String =
    s"""WITH toks AS (SELECT doc_id, u.t AS term
                      FROM documents, unnest(string_split(text, ' ')) u(t)),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dl AS (SELECT doc_id, sum(tf) AS len FROM tf GROUP BY 1),
        stats AS (SELECT count(*) AS n,
                    CAST(sum(len) AS DOUBLE) / count(*) AS avglen FROM dl),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        qt AS (SELECT doc_id AS query_id, term FROM tf WHERE doc_id < $NumQueries),
        sc AS (SELECT q.query_id, f.doc_id,
                 CAST(round(ln(1.0 + (CAST(s.n AS BIGINT) - d.df + 0.5) / (d.df + 0.5))
                   * (f.tf * ${K1 + 1.0})
                   / (f.tf + $K1 * (${1.0 - B} + $B * (CAST(l.len AS DOUBLE) / s.avglen))),
                   6) AS DECIMAL(20, 6)) AS ts
               FROM qt q
               JOIN dft d USING (term)
               JOIN tf f USING (term)
               JOIN dl l ON l.doc_id = f.doc_id, stats s
               WHERE f.doc_id <> q.query_id AND d.df * 100 <= s.n * $MaxDfPct),
        agg AS (SELECT query_id, doc_id,
                  round(CAST(sum(ts) AS DOUBLE), 6) AS score
                FROM sc GROUP BY 1, 2)
        SELECT query_id, rk, doc_id, score FROM (
          SELECT query_id, doc_id, score,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS INT) AS rk
          FROM agg) WHERE rk <= $TopK
        ORDER BY query_id, rk"""

  /** Hybrid retrieval by reciprocal-rank fusion: each query's BM25 ranking
    * and its token-set Jaccard ranking (two genuinely different signals —
    * weighted term overlap vs set overlap) are cut at [[ListK]], and every
    * candidate scores sum(1/(RrfK + rank)) over the lists it appears in.
    * RRF needs only RANKS, so the fusion is immune to the scorers' scale
    * difference — the reason it is the standard first hybrid. Plan shape:
    * both rankers reuse the same broadcast-query postings join; fusion is
    * a union of two (query, doc, rank) lists followed by one tiny
    * aggregate. */
  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val tf = graft.TrackedCaches.track(postings(docs).cache())
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum("len").cast(DoubleType) / count(lit(1))).as("avglen"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nd = tf.groupBy("doc_id").agg(count(lit(1)).as("nterms"))
    val qt = tf.filter(col("doc_id") < NumQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val qn = nd.filter(col("doc_id") < NumQueries)
      .select(col("doc_id").as("query_id"), col("nterms").as("qterms"))

    val base = tf
      .join(broadcast(qt.join(dft, "term")), "term")
      .crossJoin(broadcast(stats))
      .filter(col("doc_id") =!= col("query_id") && col("df") * 100 <= col("n") * MaxDfPct)

    val bm = base.join(dl, "doc_id")
      .withColumn("ts", round(
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * (col("len") / col("avglen")))),
        6).cast(DecimalType(20, 6)))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("ts").cast(DoubleType), 6).as("score"))
    val wb = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    val bmRanks = bm.withColumn("rk", row_number().over(wb))
      .filter(col("rk") <= ListK).select("query_id", "doc_id", "rk")

    // Token-SET Jaccard: |q ∩ d| / (|q| + |d| - |q ∩ d|), integer-exact
    // until the one division, rounded before ranking.
    val jac = base
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("inter"))
      .join(nd, "doc_id").join(broadcast(qn), "query_id")
      .withColumn("jac", round(
        col("inter").cast(DoubleType) /
          (col("qterms") + col("nterms") - col("inter")).cast(DoubleType), 6))
    val wj = Window.partitionBy("query_id").orderBy(col("jac").desc, col("doc_id"))
    val jacRanks = jac.withColumn("rk", row_number().over(wj))
      .filter(col("rk") <= ListK).select("query_id", "doc_id", "rk")

    val fused = bmRanks.unionByName(jacRanks)
      .withColumn("contrib", round(lit(1.0) / (lit(RrfK) + col("rk")), 6)
        .cast(DecimalType(20, 6)))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("contrib").cast(DoubleType), 6).as("rrf"),
        count(lit(1)).cast(IntegerType).as("n_lists"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w).cast(IntegerType))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("doc_id"), col("rrf"), col("n_lists"))
      .orderBy("query_id", "rk")
  }

  val hybridRrfSql: String =
    s"""WITH toks AS (SELECT doc_id, u.t AS term
                      FROM documents, unnest(string_split(text, ' ')) u(t)),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dl AS (SELECT doc_id, sum(tf) AS len FROM tf GROUP BY 1),
        stats AS (SELECT count(*) AS n,
                    CAST(sum(len) AS DOUBLE) / count(*) AS avglen FROM dl),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT doc_id, count(*) AS nterms FROM tf GROUP BY 1),
        qt AS (SELECT doc_id AS query_id, term FROM tf WHERE doc_id < $NumQueries),
        qn AS (SELECT doc_id AS query_id, nterms AS qterms FROM nd
               WHERE doc_id < $NumQueries),
        base AS (SELECT q.query_id, f.doc_id, f.tf, d.df
                 FROM qt q JOIN dft d USING (term) JOIN tf f USING (term), stats s
                 WHERE f.doc_id <> q.query_id AND d.df * 100 <= s.n * $MaxDfPct),
        bm AS (SELECT b.query_id, b.doc_id,
                 round(CAST(sum(
                   CAST(round(ln(1.0 + (CAST(s.n AS BIGINT) - b.df + 0.5) / (b.df + 0.5))
                     * (b.tf * ${K1 + 1.0})
                     / (b.tf + $K1 * (${1.0 - B} + $B * (CAST(l.len AS DOUBLE) / s.avglen))),
                     6) AS DECIMAL(20, 6))) AS DOUBLE), 6) AS score
               FROM base b JOIN dl l ON l.doc_id = b.doc_id, stats s
               GROUP BY 1, 2),
        bmr AS (SELECT query_id, doc_id, rk FROM (
                  SELECT query_id, doc_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, doc_id) AS rk
                  FROM bm) WHERE rk <= $ListK),
        jac AS (SELECT i.query_id, i.doc_id,
                  round(CAST(i.inter AS DOUBLE)
                    / CAST(q.qterms + n.nterms - i.inter AS DOUBLE), 6) AS jac
                FROM (SELECT query_id, doc_id, count(*) AS inter
                      FROM base GROUP BY 1, 2) i
                JOIN nd n ON n.doc_id = i.doc_id
                JOIN qn q ON q.query_id = i.query_id),
        jr AS (SELECT query_id, doc_id, rk FROM (
                 SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY jac DESC, doc_id) AS rk
                 FROM jac) WHERE rk <= $ListK),
        fused AS (SELECT query_id, doc_id,
                    round(CAST(sum(CAST(round(1.0 / ($RrfK + rk), 6)
                      AS DECIMAL(20, 6))) AS DOUBLE), 6) AS rrf,
                    CAST(count(*) AS INT) AS n_lists
                  FROM (SELECT * FROM bmr UNION ALL SELECT * FROM jr)
                  GROUP BY 1, 2)
        SELECT query_id, rk, doc_id, rrf, n_lists FROM (
          SELECT query_id, doc_id, rrf, n_lists,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, doc_id) AS INT) AS rk
          FROM fused) WHERE rk <= $TopK
        ORDER BY query_id, rk"""
}
