package graft
import org.apache.spark.sql.SparkSession
/** Plan/timing probe for optimization work: for each query name on the
  * command line, prints the `.explain("formatted")` physical plan (the
  * plans/r16 evidence format) — or, with `time:<name>`, three timed noop
  * runs. Builds the session exactly like Bench (extensions registered, so
  * custom strategies like TopKPerKey plan the same way). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.local.dir", ShuffleDir.path)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.warehouse.dir","/tmp/graft_warehouse")
      .config("spark.ui.enabled","false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { q =>
      if (q.startsWith("time:")) {
        val name = q.stripPrefix("time:")
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
          println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
        }
      } else if (q.startsWith("raw:")) {
        val name = q.stripPrefix("raw:")
        println(s"########## $name")
        println(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString.take(20000))
      } else {
        println(s"########## $q")
        val df = SparkEntry.queries(q)(spark, sf)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    }
    spark.stop()
  }
}
