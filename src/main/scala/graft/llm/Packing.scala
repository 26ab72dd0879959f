package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-sequence assembly: the two layout transforms every LLM
  * pre-training pipeline runs after curation — packing documents into
  * fixed-length training sequences (concat-and-split) and exploding
  * documents into overlapping fixed-size context chunks. Both are pure
  * layout computations over token offsets; neither shuffles beyond the
  * one range partition the global offset needs.
  */
object Packing {

  /** Tokens per packed training sequence. */
  val SeqLen = 256L

  /** Concat-and-split sequence packing: lay all documents end-to-end in
    * doc_id order and cut the token stream every [[SeqLen]] tokens. Emits
    * one row per (document, sequence) span — the shard map a training
    * loader needs to assemble each sequence: which slice of which document
    * lands where. Documents crossing a cut get one row per side.
    *
    * The only global step is the running token offset, which goes through
    * [[graft.ops.Analytics.scalableCumSum]] (range partition + per-partition
    * offsets — two passes over a persisted sorted RDD), NOT a
    * single-partition window; the span explosion after it is per-row. At
    * 100 TB the token stream is ~25B sequences: every stage here is
    * range-partitioned or embarrassingly parallel.
    */
  def seqPack(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("toks"))
    graft.ops.Analytics.scalableCumSum(docs, Seq("doc_id"), "toks", "cum")
      .withColumn("off", col("cum") - col("toks"))
      // a doc intersects sequences floor(off/S) .. floor((off+toks-1)/S)
      .select(col("doc_id"), col("toks"), col("off"),
        explode(sequence(expr(s"off div $SeqLen"),
          expr(s"(off + toks - 1) div $SeqLen"))).as("seq_id"))
      .select(col("doc_id"), col("seq_id"),
        (greatest(col("off"), col("seq_id") * SeqLen) - col("off"))
          .as("doc_tok_start"),
        (least(col("off") + col("toks"), (col("seq_id") + lit(1L)) * SeqLen)
          - greatest(col("off"), col("seq_id") * SeqLen)).as("n_toks"))
      .orderBy("seq_id", "doc_id")
  }

  /** Oracle mirror: window cumsum for the offset; the span explosion uses a
    * constant 0..3 series + WHERE (DuckDB v1.0 generate_series can't
    * lateral-join a column bound) — docs are <= 100 tokens so never span
    * more than ceil(100/256)+1 = 2 sequences. */
  val seqPackSql: String =
    s"""WITH t AS (SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
          FROM documents),
        c AS (SELECT doc_id, toks,
                CAST(sum(toks) OVER (ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) - toks AS BIGINT) AS off
              FROM t),
        x AS (SELECT doc_id, toks, off, (off // $SeqLen) + j AS seq_id
              FROM c CROSS JOIN generate_series(0, 3) g(j)
              WHERE (off // $SeqLen) + j <= (off + toks - 1) // $SeqLen)
        SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
          CAST(greatest(off, seq_id * $SeqLen) - off AS BIGINT) AS doc_tok_start,
          CAST(least(off + toks, (seq_id + 1) * $SeqLen)
               - greatest(off, seq_id * $SeqLen) AS BIGINT) AS n_toks
        FROM x ORDER BY seq_id, doc_id"""

  /** Tokens per context chunk / stride between chunk starts. Stride <
    * chunk gives the overlap that keeps boundary-spanning n-grams visible
    * to retrieval/embedding passes. */
  val ChunkLen = 32L
  val ChunkStride = 24L

  /** Overlapping fixed-size context chunks per document (chunk k covers
    * tokens [k*stride, k*stride + len)); the last chunk is the first one
    * whose window reaches the end of the document, so short tails fold
    * into the previous chunk's overlap instead of emitting a fragment.
    * Pure per-row explode + slice — no shuffle at all except the
    * presentation sort; at 100 TB this is a map-only pass. */
  def docChunks(s: SparkSession, d: String): DataFrame = {
    val C = ChunkLen; val T = ChunkStride
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("toks", size(col("ws")).cast(LongType))
      .withColumn("kmax",
        expr(s"CASE WHEN toks <= $C THEN 0L ELSE (toks - $C + ${T - 1}) div $T END"))
      .select(col("doc_id"), col("ws"), col("toks"),
        explode(sequence(lit(0L), col("kmax"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * T).as("tok_start"),
        least(lit(C), col("toks") - col("chunk_id") * T).as("n_toks"),
        array_join(slice(col("ws"),
            (col("chunk_id") * T + 1).cast(IntegerType),
            least(lit(C), col("toks") - col("chunk_id") * T).cast(IntegerType)),
          " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Oracle mirror; same constant-series trick (max 100 tokens →
    * kmax <= ceil((100-32)/24) = 3). list_slice is 1-based inclusive on
    * both ends, so the end index is start + n_toks - 1. */
  val docChunksSql: String = {
    val C = ChunkLen; val T = ChunkStride
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
          FROM documents),
        k AS (SELECT doc_id, ws, toks, j AS chunk_id
              FROM w CROSS JOIN generate_series(0, 7) g(j)
              WHERE j <= CASE WHEN toks <= $C THEN 0
                         ELSE (toks - $C + ${T - 1}) // $T END)
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
          CAST(chunk_id * $T AS BIGINT) AS tok_start,
          CAST(least($C, toks - chunk_id * $T) AS BIGINT) AS n_toks,
          array_to_string(list_slice(ws, chunk_id * $T + 1,
            chunk_id * $T + least($C, toks - chunk_id * $T)), ' ') AS chunk_text
        FROM k ORDER BY doc_id, chunk_id"""
  }

  /** Length-bucketed batching padding-waste report: assign every document to
    * its next-power-of-two token-length bucket (the standard bucketed-batch
    * policy — each batch's tensor is the bucket ceiling, so a doc pads
    * bucket_len − toks slots) and report, per bucket, the padded capacity
    * and the pad fraction — plus `naive_pad_frac`, the fraction the SAME
    * docs would waste padded to the corpus-wide max length (the
    * no-bucketing baseline a trainer compares against). All integer
    * arithmetic until the two final 6-dp ratios.
    *
    * next_pow2(n) = 1 << bit_length(n−1) with the n = 1 special case (both
    * engines render bin(0) as "0", length 1, which would misbucket 1 → 2).
    *
    * Scale shape: one corpus scan → per-row integer ops → a ≤64-row bucket
    * aggregate (map-side combined) with the 1-row corpus max broadcast back.
    * No windows, no joins wider than bucket-arity. */
  def padWaste(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast(LongType).as("nw"))
      .filter(col("nw") >= 1)
      .withColumn("bkt",
        when(col("nw") === 1, 0)
          .otherwise(length(bin(col("nw") - 1)).cast(IntegerType)))
    val maxNw = docs.agg(max("nw").as("max_nw"))
    docs.groupBy("bkt")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("tokens"))
      .withColumn("bucket_len",
        expr("cast(shiftleft(cast(1 as bigint), bkt) as bigint)"))
      .crossJoin(broadcast(maxNw))
      .select(col("bkt"), col("bucket_len"), col("n_docs"), col("tokens"),
        (col("n_docs") * col("bucket_len")).as("padded_tokens"),
        round(lit(1.0) - col("tokens").cast(DoubleType)
          / (col("n_docs") * col("bucket_len")), 6).as("pad_frac"),
        round(lit(1.0) - col("tokens").cast(DoubleType)
          / (col("n_docs") * col("max_nw")), 6).as("naive_pad_frac"))
      .orderBy("bkt")
  }

  val padWasteSql: String =
    """WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
          FROM documents WHERE len(string_split(text, ' ')) >= 1),
       b AS (SELECT nw, CASE WHEN nw = 1 THEN 0
                 ELSE CAST(length(bin(nw - 1)) AS INT) END AS bkt FROM d),
       m AS (SELECT max(nw) AS max_nw FROM d),
       g AS (SELECT bkt, count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS tokens
             FROM b GROUP BY bkt)
       SELECT bkt, CAST(1 << bkt AS BIGINT) AS bucket_len, n_docs, tokens,
         CAST(n_docs * (1 << bkt) AS BIGINT) AS padded_tokens,
         round(1.0 - CAST(tokens AS DOUBLE) / (n_docs * (1 << bkt)), 6)
           AS pad_frac,
         round(1.0 - CAST(tokens AS DOUBLE) / (n_docs * max_nw), 6)
           AS naive_pad_frac
       FROM g CROSS JOIN m ORDER BY bkt"""
}
