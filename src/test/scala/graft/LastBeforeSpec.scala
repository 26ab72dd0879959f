package graft

import graft.ops.Advanced
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** The custom LastBefore operator (O(1)-state as-of enrichment): must equal
  * the window formulation bit-for-bit and must plan WITHOUT WindowExec. */
class LastBeforeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("native as-of == window as-of, including null (no-prior-click) rows") {
    val native = Advanced.asofNative(spark, Sf)
    val window = Advanced.asofJoin(spark, Sf)
    assert(native.schema == window.schema)
    assert(native.count() == window.count())
    assert(native.exceptAll(window).count() == 0)
    assert(window.exceptAll(native).count() == 0)
    // both formulations must agree on which purchases have NO prior click
    assert(native.filter(col("prev_click_us").isNull).count() ==
      window.filter(col("prev_click_us").isNull).count())
  }

  test("native as-of plans one exchange and zero WindowExec") {
    val df = Advanced.asofNative(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val windows = collectWithSubqueries(plan) { case w: WindowExec => w }
    assert(windows.isEmpty, s"custom operator must replace the window:\n$plan")
    val exchanges = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
    // one clustering exchange for the operator; the presentation orderBy adds
    // a range exchange — nothing else may shuffle
    assert(exchanges.size <= 2,
      s"expected <= 2 exchanges (cluster + presentation sort), got ${exchanges.size}:\n$plan")
    assert(collectWithSubqueries(plan) {
      case e: graft.plans.LastBeforeExec => e
    }.size == 1, s"expected the LastBeforeExec node in:\n$plan")
  }

  test("marker visibility is strictly-before within equal order keys") {
    import spark.implicits._
    // user 1: click and purchase at the SAME ts; click has smaller event_id
    // -> visible. user 2: purchase precedes the click -> null.
    val rows = Seq(
      (1L, 1L, "click", 100L), (2L, 1L, "purchase", 100L),
      (3L, 2L, "purchase", 50L), (4L, 2L, "click", 60L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
      .withColumn("is_click", col("event_type") === "click")
    val out = graft.plans.LastBefore.lastBefore(rows,
        Seq("user_id"), Seq("ts_us", "event_id"), "is_click", "ts_us", "prev_click_us")
      .filter(col("event_type") === "purchase")
      .select("event_id", "prev_click_us")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(2L -> 100L, 3L -> -1L), s"got $out")
  }
}
