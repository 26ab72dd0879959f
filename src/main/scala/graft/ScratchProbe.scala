package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

// Throwaway 100x decomposition probe — deleted before commit.
object ScratchProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", ShuffleDir.path)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/tmp/graft_docs100x_c100_m5_d1000000_07c81891"

    if (args.headOption.contains("incr2")) {
      t("full query COLD") {
        llm.Dedup.incrementalDedup(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      TrackedCaches.release()
      spark.catalog.clearCache()
      t("full query COLD again") {
        llm.Dedup.incrementalDedup(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      TrackedCaches.release()
    }

    if (args.headOption.contains("incr")) {
      import graft.llm.Dedup
      val m = Dedup.getClass.getDeclaredMethod("cappedShingles",
        classOf[SparkSession], classOf[String])
      m.setAccessible(true)
      val sh = TrackedCaches.track(
        m.invoke(Dedup, spark, d).asInstanceOf[DataFrame].cache())
      t("cappedShingles build+count") { println("rows=" + sh.count()) }
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      t("sizes") { sizes.write.format("noop").mode("overwrite").save() }
      val batch = sh.filter(col("doc_id") % 5 === 0).as("a")
      val corpus = sh.filter(col("doc_id") % 5 =!= 0).as("b")
      val inter = batch.join(corpus, col("a.sh") === col("b.sh"), "inner")
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("i"))
      t("inter join rows") { println("interRows=" + inter.count()) }
      t("full query") {
        llm.Dedup.incrementalDedup(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      TrackedCaches.release()
    }

    if (args.headOption.contains("decontam")) {
      import graft.llm.Retrieval
      val corpus = Tables.documents(spark, d).filter(col("doc_id") % 5 =!= 0)
        .select("doc_id", "text")
      val ix = t("buildIndex") { Retrieval.buildIndex(corpus, cache = true) }
      val fwd = t("forwardIndex") { Retrieval.forwardIndex(ix, cache = true) }
      t("fwd count") { println("fwdRows=" + fwd.count()) }
      val batch = Tables.documents(spark, d).filter(col("doc_id") % 5 === 0)
        .select("doc_id", "text")
      graft.plans.TopKPerKey.ensureRegistered(spark)
      val qt = Retrieval.postings(batch)
        .select(col("doc_id").as("query_id"), col("term"))
      val qd = TrackedCaches.track(Retrieval.subCeilingQueryDf(ix, qt).cache())
      t("qd build") { println("qdRows=" + qd.count()) }
      val cand = t("screenCandidatesQd construct (driver actions)") {
        Retrieval.screenCandidatesQd(ix, qd)
      }
      println("waveStats=" + spark.conf.getOption("graft.retrieval.waveStats"))
      val candC = TrackedCaches.track(cand.cache())
      t("stage1 execute") { println("candRows=" + candC.count()) }
      val scores = Retrieval.scoreCandidatesQd(ix, fwd, qd,
        candC.select("query_id", "doc_id"))
      t("stage2 score+top1") {
        val top = graft.plans.TopKPerKey.topKPerKey(scores, 1, Seq("query_id"),
          Seq("score" -> false, "doc_id" -> true))
        println("topRows=" + top.count())
      }
      TrackedCaches.release()
    }
    spark.stop()
  }
}
