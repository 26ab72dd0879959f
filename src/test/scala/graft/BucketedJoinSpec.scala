package graft

import graft.ops.Advanced
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The whole point of bucketing: the join itself must plan with NO shuffle
  * exchange on either input (bucket layout satisfies the join's
  * distribution requirement). */
class BucketedJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("bucketed join plans without exchanges under the join") {
    // At spec scale Spark would broadcast the small side (also shuffle-free,
    // but trivially); disable broadcast to force the big-big sort-merge shape
    // bucketing exists for.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val df =
      try Advanced.bucketedJoin(spark, Sf)
      finally ()
    df.collect() // finalize AQE on THIS queryExecution (a write would spawn its own)
    val plan = df.queryExecution.executedPlan
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val joins = collectWithSubqueries(plan) { case j: SortMergeJoinExec => j }
    assert(joins.nonEmpty, s"expected a sort-merge join in:\n$plan")
    val shufflesBelowJoin = joins.flatMap(j =>
      collectWithSubqueries(j) { case e: ShuffleExchangeExec => e })
    assert(shufflesBelowJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n$plan")
  }

  test("approx distinct within configured error of exact") {
    val rows = Advanced.approxDistinct(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: approx count outside 5% of exact ${r.getLong(1)}")
    }
  }
}
