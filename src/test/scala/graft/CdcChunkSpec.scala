package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Content-defined chunking. The oracle gate hash-checks the chunk map;
  * this spec gates the property the algorithm exists for —
  * content-locality: a single-token edit may only change the chunks
  * whose window touches the edit, and every later chunk must re-align
  * and keep its fingerprint bit-for-bit. A fixed-stride chunker fails
  * this (the edit shifts every downstream boundary). */
class CdcChunkSpec extends SparkSpec {

  test("chunks tile each document exactly") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks"))
    val bad = Dedup.cdcChunksOf(Tables.documents(spark, Sf))
      .groupBy("doc_id")
      .agg(min("tok_start").as("first"), sum("n_toks").as("covered"),
        max(col("tok_start") + col("n_toks")).as("end"))
      .join(docs, "doc_id")
      .filter(col("first") =!= 1 || col("covered") =!= col("toks")
        || col("end") =!= col("toks") + 1)
      .count()
    assert(bad == 0, s"$bad docs with gappy chunk coverage")
  }

  test("a one-token edit leaves all chunks outside its window intact") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").cache()
    // flip one token in the middle of every document
    val edited = docs.select(col("doc_id"),
      expr("""concat_ws(' ', transform(split(text, ' '),
               (t, i) -> CASE WHEN i = cast(size(split(text, ' ')) / 2 as int)
                         THEN 'EDITED' ELSE t END))""").as("text"))
    val before = Dedup.cdcChunksOf(docs)
      .select(col("doc_id"), col("chunk_hash")).cache()
    val after = Dedup.cdcChunksOf(edited)
      .select(col("doc_id"), col("chunk_hash")).cache()
    // per doc: chunks lost by the edit (in before, not in after)
    val lost = before.exceptAll(after).groupBy("doc_id")
      .agg(count(lit(1)).as("n_lost"))
    val worst = lost.agg(max("n_lost")).head().getLong(0)
    val nDocs = docs.count()
    val docsTouched = lost.count()
    // the edited token sits in exactly one chunk; its hash must change
    assert(docsTouched == nDocs,
      s"edit changed no chunk in ${nDocs - docsTouched} docs")
    // locality: the edit may destroy the chunk it sits in plus at most the
    // chunks whose 3-token boundary window straddles it (boundary created
    // or destroyed next to the edit) — never the whole document
    assert(worst <= 3, s"an edit invalidated $worst chunks — boundaries " +
      "did not re-align (content locality broken)")
    val meanKept = 1.0 -
      lost.agg(sum("n_lost")).head().getLong(0).toDouble /
        before.count().toDouble
    assert(meanKept > 0.5,
      f"only $meanKept%.2f of chunk instances survive a 1-token edit")
    docs.unpersist(); before.unpersist(); after.unpersist()
  }
}
