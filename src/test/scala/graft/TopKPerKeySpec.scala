package graft

import graft.plans.{PartialTopKExec, TopKPerKey, TopKPerKeyExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerKey operator: physical shape (partial -> exchange ->
  * final) and exact agreement with the window-function formulation. */
class TopKPerKeySpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def viaOperator = {
    val o = Tables.orders(spark, Sf).select("o_orderkey", "o_custkey", "o_totalprice")
    TopKPerKey.topKPerKey(o, 3, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true))
  }

  test("plans as partial -> exchange -> final with no sort") {
    val df = viaOperator
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: TopKPerKeyExec => e }.nonEmpty)
    val partials = collectWithSubqueries(plan) { case e: PartialTopKExec => e }
    assert(partials.nonEmpty)
    assert(collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }.nonEmpty,
      "expected the key exchange between partial and final")
    assert(collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, "top-k must not sort whole partitions")
  }

  test("matches the window formulation exactly") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
    assert(viaOperator.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaOperator).count() == 0)
  }

  test("k larger than any group returns everything") {
    val o = Tables.orders(spark, Sf).select("o_orderkey", "o_custkey")
    val all = TopKPerKey.topKPerKey(o, 1000000, Seq("o_custkey"),
      Seq("o_orderkey" -> true))
    assert(all.count() == o.count())
  }

  test("empty key = global top-k: exactly k rows, the right ones") {
    // AllTuples distribution must gather every partial heap before the final
    // pass — k rows total, not k per input partition.
    val o = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_totalprice")
      .repartition(7) // >1 partition so a distribution bug would show
    val top = TopKPerKey.topKPerKey(o, 5, Seq.empty,
      Seq("o_totalprice" -> false, "o_orderkey" -> true))
    val expected = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5)
    assert(top.count() == 5, "global top-k must return exactly k rows")
    assert(top.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(top).count() == 0)
  }
}
