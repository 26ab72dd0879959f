package graft

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Invariant specs for the newest pipeline operators: clustering validity,
  * quantization error bounds, sampling properties. */
class PipelineOpsSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  test("dedup clusters: every near-dup pair lands in one cluster, one keeper each") {
    val clusters = Dedup.dedupClusters(spark, Sf).cache()
    val pairs = Dedup.ngramJaccardPairs(spark, Sf).select("doc_a", "doc_b")
    val a = clusters.as("a"); val b = clusters.as("b")
    val split = pairs
      .join(a, col("doc_a") === col("a.doc_id"))
      .join(b, col("doc_b") === col("b.doc_id"))
      .filter(col("a.cluster_id") =!= col("b.cluster_id"))
    assert(split.count() == 0, "a near-dup pair was split across clusters")
    val keepers = clusters.groupBy("cluster_id")
      .agg(sum(when(col("is_keeper"), 1).otherwise(0)).as("n"))
      .filter(col("n") =!= 1)
    assert(keepers.count() == 0, "every cluster has exactly one keeper")
    // cluster id is the minimum member
    assert(clusters.filter(col("cluster_id") > col("doc_id")).count() == 0)
    clusters.unpersist()
  }

  test("int8 quantization: dequantization error within half a step") {
    val q = Similarity.quantizeVectors(spark, Sf)
      .join(Tables.embeddings(spark, Sf), "vec_id")
      .withColumn("qvec", expr("transform(split(qvec_csv, ','), v -> CAST(v AS INT))"))
    // |x - q*max/127| <= max/254 (+ eps for the rounded scale column)
    val bad = q.select(
        expr("""aggregate(zip_with(embedding, qvec,
                  (x, qq) -> abs(CAST(x AS DOUBLE) - qq * scale_max / 127.0)),
                0D, (m, v) -> greatest(m, v))""").as("max_err"),
        (col("scale_max") / 254.0 + lit(1e-6)).as("bound"))
      .filter(col("max_err") > col("bound"))
    assert(bad.count() == 0)
  }

  test("k-means training reduces the IVF quantization objective") {
    val sx = Similarity.scaledEmb(spark, Sf).cache()
    val n = sx.count()
    val k = Similarity.centroidsFor(n)
    val seed = Similarity.seedCentroids(spark, Sf, sx, k)
    val trained = Similarity.trainCentroids(sx, seed, n, k)
    def objective(cents: org.apache.spark.sql.DataFrame): Long =
      sx.crossJoin(broadcast(cents))
        .withColumn("dist", expr(
          "aggregate(zip_with(sarr, carr, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"))
        .groupBy("vec_id").agg(min("dist").as("d"))
        .agg(sum("d")).head().getLong(0)
    val before = objective(seed)
    val after = objective(trained)
    assert(after < before,
      s"training must reduce total within-cell distance: $before -> $after")
    // every vector keeps exactly one cell, and all centroids survive
    val cells = Similarity.assignCells(sx, trained).cache()
    assert(cells.count() == sx.count())
    assert(cells.select("cell").distinct().count() <= k)
    cells.unpersist(); sx.unpersist()
  }

  test("hash sample is stable and roughly 10%") {
    val s1 = TextAnalysis.hashSample(spark, Sf)
    val s2 = TextAnalysis.hashSample(spark, Sf)
    assert(s1.exceptAll(s2).count() == 0, "sampling must be deterministic")
    val total = Tables.documents(spark, Sf).count().toDouble
    val frac = s1.count() / total
    assert(frac > 0.03 && frac < 0.25, s"sample fraction $frac implausible for 10%")
  }

  test("stratified sample: exactly k per stratum (or the whole stratum)") {
    val k = 20
    val sizes = Tables.documents(spark, Sf).groupBy("lang").count()
    val got = TextAnalysis.stratifiedSample(spark, Sf, k).groupBy("lang")
      .agg(count(lit(1)).as("n"), max("rk").as("max_rk"))
    val bad = got.join(sizes, "lang")
      .filter(col("n") =!= least(lit(k.toLong), col("count")))
    assert(bad.count() == 0)
  }

  test("object-store roundtrip: scan reads the scheme-qualified bucket URI") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = graft.ops.Relational.objectStoreRoundtrip(spark, Sf)
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a file scan over the bucket")
    val roots = scans.flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(roots.exists(p =>
        p.startsWith("file:") && p.contains("graft_store_bucket")),
      s"scan must read the scheme-qualified bucket, got $roots")
    // Bucket holds the uploaded objects, nothing else (no staging leak).
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val uri = new java.net.URI(roots.head)
    val fs = FileSystem.get(uri, spark.sparkContext.hadoopConfiguration)
    val objs = fs.listStatus(new HPath(roots.head)).map(_.getPath.getName)
    assert(objs.nonEmpty && objs.forall(_.endsWith(".json")),
      s"bucket must contain only uploaded JSON objects, got ${objs.toSeq}")
  }
}
