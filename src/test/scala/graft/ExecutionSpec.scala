package graft

import graft.llm.Multimodal
import graft.ops.{Analytics, Execution}
import org.apache.spark.sql.functions._

/** Specs for execution-control ops, the scalable row-number, the typed
  * aggregator, and the multimodal stub pipeline. */
class ExecutionSpec extends SparkSpec {
  import spark.implicits._

  test("scalableRowNumber produces a dense 1..n sequence in key order") {
    val ev = Tables.events(spark, Sf).select("event_id", "user_id")
    val numbered = Analytics.scalableRowNumber(ev, "event_id").cache()
    val n = numbered.count()
    val stats = numbered.agg(min("num"), max("num"), countDistinct("num")).head()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == n && stats.getLong(2) == n)
    // order agreement: num rank must equal event_id rank
    val misordered = numbered
      .withColumn("byKey",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("event_id")))
      .filter(col("num") =!= col("byKey")).count()
    assert(misordered == 0)
    numbered.unpersist()
  }

  test("CentsVariance matches Spark's var_samp within tolerance") {
    val df = Execution.varianceAgg(spark, Sf)
    val ref = Tables.customer(spark, Sf)
      .groupBy("c_nationkey").agg(var_samp(col("c_acctbal")).as("v"))
    val joined = df.join(ref, "c_nationkey")
      .select(max(abs(col("bal_variance") - col("v")))).head().getDouble(0)
    assert(joined < 1e-6, s"max |centsVar - var_samp| = $joined")
  }

  test("cached fanout reports in-memory caching and both branches") {
    val rows = Execution.cachedFanout(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("by_type", "by_user"))
    assert(rows.forall(_.getBoolean(2)), "cache was not in memory")
  }

  test("multimodal feature extraction is deterministic and complete") {
    val feats = Multimodal.mediaFeatures(spark, Sf).cache()
    assert(feats.count() == Tables.documents(spark, Sf).count())
    // brightness of lowercase ASCII text must sit in the printable band
    val bad = feats.filter(col("brightness") < 32 || col("brightness") > 122).count()
    assert(bad == 0)
    // rerun -> identical output (stub is deterministic)
    val again = Multimodal.mediaFeatures(spark, Sf)
    assert(feats.exceptAll(again).count() == 0)
    feats.unpersist()
  }

  test("pivot row sums equal per-user event counts") {
    val p = Execution.pivotCounts(spark, Sf)
      .withColumn("total",
        col("click") + col("purchase") + col("view") + col("signup") + col("error"))
      .select("user_id", "total")
    val byUser = Tables.events(spark, Sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    assert(p.join(byUser, "user_id").filter(col("total") =!= col("n")).count() == 0)
  }
}
