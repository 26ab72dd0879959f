package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus cartography for tokenizer/vocabulary work: the Zipf rank-frequency
  * fit a corpus-health dashboard plots, and the adjacent-character-pair
  * counts that drive the first BPE merge (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the public BPE
  * formulation every modern tokenizer starts from).
  *
  * Determinism: the [[TextAnalysis]] discipline — every floating term is
  * rounded to 6 dp before an exact DECIMAL(20,6) sum, so results are
  * independent of addition order and partitioning.
  */
object CorpusStats {

  /** Ranks used for the Zipf fit. Top-heavy on purpose: the law holds in
    * the head, and 50 points is plenty for a 2-parameter line. */
  val ZipfRanks = 50

  /** Per-source Zipf fit: ordinary-least-squares slope/intercept of
    * ln(count) against ln(rank) over the top-[[ZipfRanks]] tokens — a
    * healthy natural-language source fits slope ≈ −1 (Zipf's law); a
    * template/spam-flooded source flattens or cliffs.
    *
    * Scale shape: ONE (source × word) corpus aggregation; the rank window
    * runs over that vocab-arity table partitioned by source (bounded by
    * vocabulary, never corpus-arity); the OLS moments are four
    * decimal-summed source-arity aggregates; the closed-form line is
    * per-source scalar arithmetic. Moment terms (x, y, x², x·y) round to
    * 6 dp before the exact sum; slope rounds last, and the intercept is
    * derived from the ROUNDED slope so both engines agree bit-for-bit. */
  def zipfSlope(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val ranked = counts
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("c").desc, col("w"))))
      .filter(col("rank") <= ZipfRanks)
      .withColumn("x", round(log(col("rank").cast(DoubleType)), 6))
      .withColumn("y", round(log(col("c").cast(DoubleType)), 6))
    val dec = DecimalType(20, 6)
    val moments = ranked.groupBy("source").agg(
      count(lit(1)).cast(IntegerType).as("n_ranks"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum(round(col("x") * col("y"), 6).cast(dec)).as("sxy"),
      sum(round(col("x") * col("x"), 6).cast(dec)).as("sxx"))
    moments
      .withColumn("slope", round(
        (col("n_ranks") * col("sxy").cast(DoubleType)
          - col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          (col("n_ranks") * col("sxx").cast(DoubleType)
            - col("sx").cast(DoubleType) * col("sx").cast(DoubleType)), 6))
      .withColumn("intercept", round(
        (col("sy").cast(DoubleType) - col("slope") * col("sx").cast(DoubleType))
          / col("n_ranks"), 6))
      .select("source", "n_ranks", "slope", "intercept")
      .orderBy("source")
  }

  val zipfSlopeSql: String =
    s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w
                      FROM documents),
        counts AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
        ranked AS (SELECT source, c,
                     row_number() OVER (PARTITION BY source ORDER BY c DESC, w)
                       AS rank
                   FROM counts),
        xy AS (SELECT source,
                 round(ln(CAST(rank AS DOUBLE)), 6) AS x,
                 round(ln(CAST(c AS DOUBLE)), 6) AS y
               FROM ranked WHERE rank <= $ZipfRanks),
        m AS (SELECT source, CAST(count(*) AS INT) AS n_ranks,
                sum(CAST(x AS DECIMAL(20,6))) AS sx,
                sum(CAST(y AS DECIMAL(20,6))) AS sy,
                sum(CAST(round(x * y, 6) AS DECIMAL(20,6))) AS sxy,
                sum(CAST(round(x * x, 6) AS DECIMAL(20,6))) AS sxx
              FROM xy GROUP BY source),
        fit AS (SELECT source, n_ranks,
                  round((n_ranks * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (n_ranks * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
                  CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
                FROM m)
        SELECT source, n_ranks, slope,
          round((syd - slope * sxd) / n_ranks, 6) AS intercept
        FROM fit ORDER BY source"""

  /** Merges reported by [[bpePairs]]. */
  val BpeTopK = 50

  /** First-iteration BPE merge candidates: counts of adjacent character
    * pairs inside word occurrences (weighted by occurrence, exactly as BPE
    * training counts them), ranked; the top row is the pair the first merge
    * would fuse. `share` is each pair's fraction of all pair positions.
    *
    * Scale shape: explode to (word occurrence × pair position) — a linear
    * map pass — then ONE map-side-combined count over the pair key (arity
    * ≤ alphabet², tiny); the 1-row total broadcasts back. The top-k is a
    * TakeOrdered over the pair-arity table, never a global sort of data. */
  def bpePairs(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
    val counts = graft.TrackedCaches.track(
      pairs.groupBy("pair").agg(count(lit(1)).as("n")).cache())
    val total = counts.agg(sum("n").as("t"))
    counts.crossJoin(broadcast(total))
      .select(col("pair"), col("n"),
        round(col("n").cast(DoubleType) / col("t"), 6).as("share"))
      .orderBy(col("n").desc, col("pair"))
      .limit(BpeTopK)
  }

  val bpePairsSql: String =
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        pairs AS (SELECT substr(w, i, 2) AS pair
                  FROM toks, unnest(range(1, length(w))) AS u(i)
                  WHERE length(w) >= 2),
        c AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
        SELECT pair, n, round(CAST(n AS DOUBLE) / t.t, 6) AS share
        FROM c, t ORDER BY n DESC, pair LIMIT $BpeTopK"""
}
