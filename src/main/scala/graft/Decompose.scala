package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-term wall-time decomposition of the deep-scale watch-list queries —
  * the measurement tool behind the 100×-ladder rule that a bend must be
  * decomposed before any fix is trusted (SCALING.md). For each named query
  * it times the operator's own pipeline PREFIXES (exposed as
  * `<query>Stages` beside each operator, so the decomposition measures the
  * exact frames the query builds, not a reconstruction): each prefix is
  * noop-written in its own cold pass with builder caches drained and a GC
  * between passes, exactly like the ScaleTest ladder times whole queries.
  * The printed `delta` column is prefix(i) − prefix(i−1) ≈ the cost of the
  * stage the prefix adds, attributable because every pass re-runs its
  * upstream from the same cold state.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<corpus> runMain graft.Decompose <query> ...
  * Queries: q_dedup_incremental q_dup_ngram_fraction q_containment
  *          q_bm25_topk
  */
object Decompose {
  private def stagesOf(s: SparkSession, d: String,
      name: String): Seq[(String, () => Unit)] = name match {
    case "q_dedup_incremental" =>
      llm.Dedup.incrementalDedupStages(s, d).map { case (n, df) => n -> write(df) }
    case "q_dup_ngram_fraction" =>
      llm.Dedup.dupNgramFractionStages(s, d).map { case (n, df) => n -> write(df) }
    case "q_containment" =>
      llm.Dedup.containmentPairsStages(s, d).map { case (n, df) => n -> write(df) }
    case "q_rand_projection" =>
      llm.Similarity.randProjectionStages(s, d).map { case (n, df) => n -> write(df) }
    case "q_bm25_topk" =>
      // buildIndex is eager (stats collect + cache counts), so its stage is
      // the call itself; the scatter stage is the flat postings-join scorer
      // the routed planner falls back to (its dominant-cost twin).
      Seq(
        "index_build" -> (() => { llm.Retrieval.buildIndex(
          Tables.documents(s, d).select("doc_id", "text"), cache = true); () }),
        "flat_scatter" -> (() => {
          val ix = llm.Retrieval.buildIndex(
            Tables.documents(s, d).select("doc_id", "text"), cache = true)
          val qt = ix.tf.filter(col("doc_id") < llm.Retrieval.NumQueries)
            .select(col("doc_id").as("query_id"), col("term"))
          write(llm.Retrieval.scoreAgainst(ix, qt))()
        }),
        "full" -> write(SparkEntry.queries(name)(s, d)))
    case other =>
      Seq("full" -> write(SparkEntry.queries(other)(s, d)))
  }

  private def write(df: DataFrame): () => Unit =
    () => df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", ShuffleDir.path)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      // Warm pass at sf0.001: codegen + classloading out of the deltas.
      val warm = "/root/testdata/sf0.001"
      if (new java.io.File(warm).isDirectory && warm != sf)
        try stagesOf(spark, warm, name).foreach(_._2())
        catch { case _: Throwable => () }
      TrackedCaches.release(); spark.catalog.clearCache()
      System.gc()
      var prev = 0.0
      println(s"[decompose] $name @ $sf  (prefix wall s, delta s)")
      stagesOf(spark, sf, name).foreach { case (stage, run) =>
        val t0 = System.nanoTime()
        run()
        val dt = (System.nanoTime() - t0) / 1e9
        TrackedCaches.release(); spark.catalog.clearCache()
        System.gc(); Thread.sleep(300)
        println(f"[decompose]   $stage%-18s ${dt}%8.2f  ${dt - prev}%+8.2f")
        prev = dt
      }
    }
    spark.stop()
  }
}
