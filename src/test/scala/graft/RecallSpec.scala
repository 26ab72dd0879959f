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
    // k from the ACTUAL corpus count — annIvf derives it the same way, so
    // the reported k/nprobe cannot drift from the code under test if the
    // test corpus is ever regenerated at a different size.
    val k = Similarity.centroidsFor(Tables.embeddings(spark, Sf).count())
    val r = recall(top10(Similarity.annIvf(spark, Sf)))
    info(f"annIvf recall@10 = $r%.2f (k=$k, nprobe=${Similarity.probesFor(k)})")
    // Measured ladder: 0.86 at fixed k=16/nprobe=10 (62.5% of the corpus
    // scanned — a fraction that never shrinks); 0.82/0.88 at corpus-sized
    // k=22 with nprobe 10/12. On THIS 500-vector corpus the NumProbes floor
    // dominates (12/22 = 55% scanned); what holds at scale is the FRACTION
    // — see the scan-fraction test below and the vecs ladder in
    // Similarity's multi-probe comment. A 4th k-means iteration DROPPED
    // recall at k=8 — converging harder on uniform noise sharpens
    // boundaries that carry no signal. Floor set at 0.80; clustered
    // real-world embeddings measure higher.
    assert(r >= 0.80, f"annIvf recall@10 $r%.2f below measured floor 0.80")
  }

  test("two-stage int8 rescore holds the exact-scoring IVF recall") {
    // annIvfRescore ranks the probed candidates on int8 codes first and
    // exact-rescores only RescoreK survivors per query. The quantization
    // toll would show as true neighbors mis-ranked below RescoreK by the
    // int8 pass; with RescoreK=50 of ~270 candidates the measured recall
    // equals the exact-scoring path's (0.88 here). Floor matches annIvf's.
    val got = llm.Similarity.annIvfRescore(spark, Sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = recall(got)
    info(f"annIvfRescore recall@10 = $r%.2f (RescoreK=${llm.Similarity.RescoreK})")
    assert(r >= 0.80, f"annIvfRescore recall@10 $r%.2f below floor 0.80")
  }

  test("hard negatives are near-misses: full depth, below top-k, few true neighbors") {
    val rows = Similarity.hardNegatives(spark, Sf).collect()
    assert(rows.length == Similarity.NumQueries * Similarity.HardNegK,
      "every query mines its full negative depth on this corpus")
    assert(rows.forall { r =>
      val rk = r.getAs[Int]("rk")
      rk > Similarity.TopK && rk <= Similarity.TopK + Similarity.HardNegK
    })
    // "Hard" means close-but-not-neighbor: mined pairs may contain the few
    // true neighbors IVF mis-ranked below its top-k (that is recall's
    // complement, ~0.12 here), but never more.
    val mined = rows.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet
    val leaked = (truth intersect mined).size.toDouble / truth.size
    info(f"true neighbors leaked into the negative pool: $leaked%.2f of truth")
    assert(leaked <= 0.20,
      f"$leaked%.2f of true neighbors in the negatives — recall floor broken upstream")
    graft.TrackedCaches.release()
  }

  test("random projection preserves corpus geometry within the JL bound") {
    // q_rand_projection ships exact integer components r_j = Σ ±v_i; the
    // JL estimate of cos(x, y) is cos of the 16-dim reduced vectors. The
    // oracle gate proves both engines compute the same integers — THIS test
    // proves the integers are a useful sketch: reduced-space cosine tracks
    // full-space cosine for the 5 query vectors against the whole corpus.
    // The ±1/√k JL error for k=16 is σ≈0.25 per pair on orthogonal-ish
    // random vectors — bounds below are measured on this corpus with margin.
    val rp = Similarity.randProjection(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(",").map(_.toDouble)).toMap
    val full = Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val errs = for {
      q <- 0L until Similarity.NumQueries.toLong
      v <- full.keys if v != q
    } yield math.abs(cos(rp(q), rp(v)) - cos(full(q), full(v)))
    val mean = errs.sum / errs.size
    val p99 = errs.sorted.apply((errs.size * 99) / 100)
    info(f"JL cosine distortion over ${errs.size} pairs: mean $mean%.3f, p99 $p99%.3f")
    assert(mean <= 0.25, f"mean cosine distortion $mean%.3f above the JL bound")
    assert(p99 <= 0.75, f"p99 cosine distortion $p99%.3f above the measured envelope")
  }

  test("clustered corpus: IVF recall >= 0.80 at scan fraction <= 10%") {
    // The shipped ~30% probe budget is sized by the UNIFORM random corpus —
    // the adversarial case, where true neighbors spread evenly across cells.
    // Real embeddings cluster; this gate measures what that structure buys:
    // on a mixture-of-Gaussians corpus (40 clusters x 50 members, N=2000 —
    // the sf0.1 corpus size, so k=45 cells like production) the SAME
    // integer-exact training concentrates each cluster in few cells, and
    // probing k/10 = 4 cells (8.9% — under a third of the uniform budget)
    // holds recall@10 at >= 0.80. ScaleTest's clustered ladder extends this
    // to N=20000 (k=141) and sweeps fractions 1.4-30%.
    val dir = ScaleTest.clusteredVecsDir(40, 50)
    if (!new java.io.File(s"$dir/_built").exists()) {
      ScaleTest.buildClusteredVecs(spark, dir, 40, 50)
      new java.io.File(s"$dir/_built").createNewFile()
    }
    val n = Tables.embeddings(spark, dir).count()
    val k = Similarity.centroidsFor(n)
    val nprobe = k / 10
    val frac = nprobe.toDouble / k
    assert(frac <= 0.10, f"clustered gate must probe <= 10%% of cells, got $frac%.3f")
    val truthC = top10(Similarity.annTopK(spark, dir))
    val got = top10(Similarity.annIvfWith(spark, dir, nprobe))
    graft.TrackedCaches.release()
    val r = (truthC intersect got).size.toDouble / truthC.size
    info(f"clustered N=$n: k=$k, nprobe=$nprobe (scan fraction $frac%.3f), recall@10 = $r%.2f")
    assert(r >= 0.80,
      f"clustered recall@10 $r%.2f below 0.80 at scan fraction $frac%.3f")
  }

  test("IVF probe budget holds a bounded scan fraction at corpus scale") {
    // The 100-TB contract of probesFor: once the corpus outgrows the
    // small-corpus floor (NumProbes), the probed share of cells — and with
    // uniform cell sizes the scanned share of the corpus — stays ~ProbePct%
    // instead of decaying recall (fixed nprobe) or pinning a constant
    // oversized scan (fixed k). The vecs ladder measured the 0.80-recall
    // line at 25.5-30% on the adversarial random corpus, so 31% is the
    // bound with the +0.5 rounding included.
    for (n <- Seq(20000L, 1000000L, 1000000000L)) {
      val k = Similarity.centroidsFor(n)
      val frac = Similarity.probesFor(k).toDouble / k
      info(f"N=$n%,d: k=$k, nprobe=${Similarity.probesFor(k)}, scan fraction $frac%.3f")
      assert(frac <= 0.31, f"scan fraction $frac%.3f exceeds 0.31 at N=$n")
      assert(frac >= 0.25, f"scan fraction $frac%.3f below the 0.80-recall line at N=$n")
    }
  }
}
