package graft

import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the approximate-ANN paths against the brute-force ground truth.
  *
  * The oracle gate proves annLsh/annIvf match DuckDB running the SAME
  * approximation — it cannot catch an approximation that is simply bad.
  * This spec closes that gap: recall@10 of each approximate path vs
  * [[Similarity.annTopK]] on the 500-vector corpus (5 queries, so 50
  * ground-truth neighbors). Bounds are measured floors, not aspirations:
  * the corpus is RANDOM embeddings (max cos ~0.51), the adversarial case
  * for LSH/IVF — real text embeddings cluster and recall only goes up.
  */
class RecallSpec extends SparkSpec {

  /** Top-10-per-query neighbor set of a (query_id, neighbor_id, cos) frame. */
  private def top10(df: DataFrame): Set[(Long, Long)] = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val truth: Set[(Long, Long)] =
    Similarity.annTopK(spark, Sf).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recall(approx: Set[(Long, Long)]): Double =
    (truth intersect approx).size.toDouble / truth.size

  test("banded multi-probe LSH recall@10 vs brute force") {
    val r = recall(top10(Similarity.annLsh(spark, Sf)))
    info(f"annLsh recall@10 = $r%.2f (8 bands x 4 planes, hamming-1 probes)")
    // Banding alone measured 0.58; query-side hamming-1 probing took the
    // measured recall to 1.00 here — floor set with margin for corpus drift.
    assert(r >= 0.90, f"annLsh recall@10 $r%.2f below measured floor 0.90")
  }

  test("multi-probe IVF recall@10 vs brute force") {
    val r = recall(top10(Similarity.annIvf(spark, Sf)))
    info(f"annIvf recall@10 = $r%.2f " +
      f"(k=${Similarity.centroidsFor(500)}, nprobe=${Similarity.NumProbes})")
    // Measured ladder: 0.86 at fixed k=16/nprobe=10 (62.5% of the corpus
    // scanned — a fraction that never shrinks); 0.82/0.88 at corpus-sized
    // k=22 with nprobe 10/12 (scan fraction 45%/55% HERE, but falling as
    // nprobe/sqrt(N) with corpus growth — 27% already at sf0.1). A 4th
    // k-means iteration DROPPED recall at k=8 — converging harder on
    // uniform noise sharpens boundaries that carry no signal. Floor set at
    // 0.80; clustered real-world embeddings measure higher.
    assert(r >= 0.80, f"annIvf recall@10 $r%.2f below measured floor 0.80")
  }
}
