package graft

import org.apache.spark.sql.functions._

/** Every SparkEntry query must execute at sf0.001; known-cardinality queries
  * get golden assertions. (Exact value correctness is the DuckDB oracle's
  * job — scripts/check.py; these specs guard execution and invariants.) */
class QueriesSpec extends SparkSpec {

  /** Queries that legitimately may return zero rows on the tiny corpus. */
  private val mayBeEmpty = Set(
    "q_join_anti", "q_set_except", "q_cosine_pairs",
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram_jaccard",
    "q_containment", "q_pmi_pairs")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, Sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("every oracle has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  test("entry (flagship) returns rows with contiguous numbering") {
    val df = SparkEntry.entry(spark).cache()
    val n = df.count()
    assert(n > 0)
    val nums = df.agg(min("num"), max("num"), countDistinct("num")).head()
    assert(nums.getInt(0) == 1)
    assert(nums.getInt(1).toLong == n)
    assert(nums.getLong(2) == n)
    df.unpersist()
  }

  test("flagship numbering has no single-partition window in the plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val df = SparkEntry.entry(spark)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, s"flagship must not use a window:\n$plan")
    val singleExchanges = plan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    assert(singleExchanges.isEmpty,
      s"flagship must not funnel through one partition:\n$plan")
  }

  test("q_global_count matches raw parquet count") {
    val expected = spark.read.parquet(s"$Sf/lineitem.parquet").count()
    val got = SparkEntry.queries("q_global_count")(spark, Sf).head().getLong(0)
    assert(got == expected)
  }

  test("q_time_dim date parts stay in range") {
    val df = SparkEntry.queries("q_time_dim")(spark, Sf)
    val bad = df.filter(
      col("weekday") < 1 || col("weekday") > 7 ||
        col("week") < 1 || col("week") > 53 ||
        col("hour") < 0 || col("hour") > 23 ||
        col("month") =!= 1 || col("year") =!= 2024)
    assert(bad.count() == 0)
  }

  test("q_topk is ordered descending with correct size") {
    val rows = SparkEntry.queries("q_topk")(spark, Sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q_ann_topk returns exactly k neighbors per query, ranked") {
    val df = SparkEntry.queries("q_ann_topk")(spark, Sf)
    val perQuery = df.groupBy("query_id").count().collect()
    assert(perQuery.length == graft.llm.Similarity.NumQueries)
    assert(perQuery.forall(_.getLong(1) == graft.llm.Similarity.TopK))
    // scores non-increasing within each query
    val viol = df.selectExpr("query_id",
        "cos - lag(cos) over (partition by query_id order by rk) as d")
      .filter(col("d") > 1e-12).count()
    assert(viol == 0)
  }
}
