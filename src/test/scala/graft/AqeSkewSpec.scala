package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Documents WHEN AQE's runtime skew split replaces the manual salt in
  * ops.Advanced.saltedJoin — and when it can't.
  *
  * AQE's OptimizeSkewedJoin inspects the finished shuffle map stage and
  * splits any reducer partition larger than max(threshold, factor x median)
  * into advisory-sized sub-reads, replicating the other side's partition —
  * salting-at-runtime, driven by measured sizes instead of a guessed
  * SaltFactor. It applies to shuffle-based joins ONLY: a pre-bucketed
  * co-located join (Advanced.bucketedJoin) has no shuffle stage to measure
  * or split, which is exactly where the manual salt (or a re-bucket)
  * remains the answer. */
class AqeSkewSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("AQE splits the hot partition of an unsalted skewed join") {
    val s = spark
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // Test-scale thresholds: detection wants size > max(threshold,
      // factor * median); the hot key below is ~70x the median partition.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(s.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // 90% of the big side lands on key 0 — one reducer partition carries
      // ~70x the median and must be split at runtime.
      val big = s.range(0, 200000).select(
        when(col("id") % 10 =!= 9, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val dim = s.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = big.join(dim, "k")
      // collect() (not count()) so the inspected QueryExecution is the one
      // that ran — count() spawns its own, leaving this plan un-finalized.
      val n = joined.collect().length.toLong
      // 180k hot-key matches + the 100 ids ending in 9 below 1000.
      assert(n == 180100L, s"join result wrong: $n")
      val smjs = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, "expected a sort-merge join in the executed plan")
      assert(smjs.exists(_.isSkewJoin),
        "OptimizeSkewedJoin did not mark the join as skew-split — " +
          "the hot partition ran as one straggler task")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
