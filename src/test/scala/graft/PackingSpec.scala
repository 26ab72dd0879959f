package graft

import graft.llm.Packing
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Sequence packing + context chunking. The oracle gate hash-checks the
  * span maps; these specs gate the structural invariants behind them:
  * every packed sequence except the tail holds exactly SeqLen tokens with
  * no token lost or duplicated, chunks tile each document with the
  * configured overlap, and the packing plan contains no WindowExec (the
  * global offset must come from the scalable cumsum, not a
  * single-partition window). */
class PackingSpec extends SparkSpec {

  test("seqPack partitions the token stream exactly: full sequences, no loss") {
    val spans = Packing.seqPack(spark, Sf).cache()
    val totalToks = Tables.documents(spark, Sf)
      .select(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    val perSeq = spans.groupBy("seq_id")
      .agg(sum("n_toks").as("toks")).collect()
    val lastSeq = perSeq.map(_.getLong(0)).max
    perSeq.foreach { r =>
      val (seq, toks) = (r.getLong(0), r.getLong(1))
      if (seq != lastSeq)
        assert(toks == Packing.SeqLen, s"sequence $seq holds $toks tokens")
      else assert(toks > 0 && toks <= Packing.SeqLen)
    }
    assert(perSeq.map(_.getLong(1)).sum == totalToks,
      "packed spans lose or duplicate tokens")
    // sequence ids are dense 0..last (no empty sequence in the middle)
    assert(perSeq.map(_.getLong(0)).sorted.sameElements(0L to lastSeq))
    spans.unpersist()
  }

  test("seqPack spans within a doc are contiguous and start at 0") {
    val bad = Packing.seqPack(spark, Sf)
      .groupBy("doc_id")
      .agg(min("doc_tok_start").as("first"),
        sum("n_toks").as("covered"),
        (max(col("doc_tok_start") + col("n_toks"))).as("end"))
      .filter(col("first") =!= 0 || col("covered") =!= col("end"))
      .count()
    assert(bad == 0, s"$bad docs have gappy or offset span coverage")
  }

  test("seqPack plans without a WindowExec") {
    val df = Packing.seqPack(spark, Sf)
    df.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val windows = helper.collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(windows.isEmpty, "global offset fell back to a window")
  }

  test("docChunks tiles every document with the configured overlap") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks"))
    val chunks = Packing.docChunks(spark, Sf).cache()
    // chunk_text really holds n_toks tokens
    val badText = chunks
      .filter(size(split(col("chunk_text"), " ")).cast("long") =!= col("n_toks"))
      .count()
    assert(badText == 0, s"$badText chunks whose text disagrees with n_toks")
    // coverage: last chunk reaches the end of the doc, first starts at 0,
    // consecutive chunks overlap by ChunkLen - ChunkStride (except a short tail)
    val cover = chunks.groupBy("doc_id")
      .agg(min("tok_start").as("first"),
        max(col("tok_start") + col("n_toks")).as("end"),
        count(lit(1)).as("n"))
      .join(docs, "doc_id")
    assert(cover.filter(col("first") =!= 0 || col("end") =!= col("toks")).count() == 0,
      "chunks do not span the document")
    // stride law: chunk k starts at k*stride
    val badStart = chunks
      .filter(col("tok_start") =!= col("chunk_id") * Packing.ChunkStride)
      .count()
    assert(badStart == 0)
    chunks.unpersist()
  }

  test("padWaste buckets conserve token mass and obey the next-pow2 law") {
    val docs = Tables.documents(spark, Sf)
      .select(size(split(col("text"), " ")).cast("long").as("nw"))
      .filter(col("nw") >= 1)
      .collect().map(_.getLong(0))
    def nextPow2(n: Long): Long = { var p = 1L; while (p < n) p <<= 1; p }
    val expect = docs.groupBy(nextPow2)
      .map { case (blen, ns) => blen -> (ns.length.toLong, ns.sum) }
    val rows = Packing.padWaste(spark, Sf).collect()
    assert(rows.map(_.getLong(1)).toSet == expect.keySet,
      "bucket lengths diverge from per-doc next-pow2")
    rows.foreach { r =>
      val (blen, nDocs, toks, padded) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (eN, eT) = expect(blen)
      assert(nDocs == eN && toks == eT, s"bucket $blen counts diverge")
      assert(padded == nDocs * blen)
      val padFrac = r.getDouble(5); val naive = r.getDouble(6)
      assert(padFrac >= 0 && padFrac < 1)
      // naive column replays exactly: pad every doc in the bucket to the
      // corpus max. (No inequality vs padFrac: the TOP bucket's pow2
      // ceiling can exceed the corpus max, where bucketing legitimately
      // wastes more than max-padding — 128 vs a 97-token corpus max here.)
      val maxNw = docs.max
      val expNaive = BigDecimal(1.0 - toks.toDouble / (nDocs * maxNw))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(naive - expNaive) < 1e-9,
        s"bucket $blen: naive $naive != replayed $expNaive")
    }
    assert(rows.map(_.getLong(3)).sum == docs.sum, "token mass not conserved")
  }
}
