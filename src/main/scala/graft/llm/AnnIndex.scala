package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.Tables
import graft.functions.VectorFunctions.floatCosine

/** Standing (persisted) IVF ANN index: build ONCE into bucketed parquet,
  * then answer every future top-k query with a probe-only plan that reads
  * just the probed cell partitions.
  *
  * [[Similarity.annIvf]] is the right QUERY shape (never all-pairs,
  * broadcast-centroid training, multi-probe equi-join) but it re-trains
  * and re-assigns the whole corpus on every call — fine for a one-shot
  * curation query, wrong for the serving pattern the reference's notebook
  * implies (load once, query repeatedly: transform-data.py materializes
  * its dimension tables once and reuses them across queries). At 100 TB
  * the economics are stark: training + assignment is the N·√N kernel and
  * a full-corpus pass, while a probe touches ~nprobe of the √N cells —
  * an O(nprobe·√N)-row read IF the storage layout lets the scan skip the
  * other cells. This class makes the layout do exactly that:
  *
  *   base/centroids/   k = √N trained centroid rows (integer grid —
  *                     [[Similarity.trainCentroids]]' exact arithmetic,
  *                     so a rebuild reproduces them bit-for-bit)
  *   base/cells/       the corpus hive-partitioned BY CELL
  *                     (`cell=<id>/part-*.parquet`, one file per cell:
  *                     the build repartitions on the partition column
  *                     first, so appends never small-file-storm)
  *   base/_meta        staleness marker: corpus dir + row count — a
  *                     probe against a changed corpus rebuilds instead
  *                     of silently serving a stale index
  *
  * The probe plan filters the cells scan with a static partition-column
  * predicate (`cell IN (probed…)`), so the FileSourceScan's
  * PartitionFilters prune every unprobed directory BEFORE any rows are
  * read — the 100 TB move; PlanShapeSpec asserts it. Collecting the
  * probed-cell set to the driver is bounded by construction: it is a
  * projection of the query-probe frame the plan broadcasts into the join
  * anyway (≤ |queries|·nprobe rows), so the collect can never exceed the
  * broadcast the query already requires.
  *
  * The probe tail (exact float cosine over probed candidates, rounded
  * 4 dp) is the SAME code as [[Similarity.annIvf]]'s, and training is
  * deterministic integer k-means — so a standing-index answer is
  * row-identical to the rebuild-every-time answer (AnnIndexSpec proves
  * it) and `q_ann_ivf_standing` reuses [[Similarity.annIvfSql]] verbatim:
  * persistence moves the cost regime, never the semantics.
  */
object AnnIndex {
  import Similarity.{centroidsFor, probesFor, scaledOf, assignCells,
    probeCells, seedCentroidsOf, trainCentroids, NumQueries}

  private def centroidsDir(base: String) = s"$base/centroids"
  private def cellsDir(base: String)     = s"$base/cells"
  private def metaPath(base: String)     = s"$base/_meta"

  /** Build the index at `base` unless `_meta` shows it was already built
    * from this corpus (same dir, same corpus-file content signature —
    * name/length/mtime of every file, so an in-place rewrite with the
    * same row count still rebuilds). Returns true iff a build ran. The
    * build is the amortized one-time cost: train (on the
    * [[Similarity.SamplePerCell]]-bounded slice), assign every vector to
    * its cell (the unavoidable full-corpus pass), and lay the corpus out
    * cell-partitioned so probes can skip. The marker also records the
    * corpus row count n: [[probe]] derives its budget as
    * probesFor(centroidsFor(n)) — NOT from the stored centroid row
    * count, which can be smaller when training empties a cell (ties
    * break to one seed; the other's cell drops out of the groupBy) and
    * would silently diverge from [[Similarity.annIvf]]'s budget. */
  def buildIfStale(s: SparkSession, d: String, base: String): Boolean = {
    val sig = StandingIndex.sourceSig(s"$d/embeddings.parquet")
    val mp = java.nio.file.Paths.get(metaPath(base))
    val prior: Option[String] =
      if (java.nio.file.Files.exists(mp))
        Some(new String(java.nio.file.Files.readAllBytes(mp), "UTF-8"))
      else None
    if (prior.exists(_.startsWith(s"dir=$d sig=$sig n="))) return false
    StandingIndex.reset(base)
    val emb = Tables.embeddings(s, d)
    val n = emb.count()
    val sx = graft.TrackedCaches.track(scaledOf(emb).cache())
    val k = centroidsFor(n)
    val cents = trainCentroids(sx, seedCentroidsOf(emb, sx, k), n, k)
    cents.write.mode("overwrite").parquet(centroidsDir(base))
    assignCells(sx, cents)
      .join(emb, "vec_id")
      .select(col("cell"), col("vec_id"), col("embedding"))
      // One write task per cell dir: repartition ON the partition column
      // so each cell's rows land in exactly one task → one file per
      // `cell=<id>/` directory at any corpus scale (k = √N directories).
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(cellsDir(base))
    StandingIndex.commit(base, s"dir=$d sig=$sig n=$n")
    true
  }

  /** Probe-only top-candidate query against a standing index: no
    * training, no corpus assignment — read k centroid rows, route each
    * query to its [[Similarity.probesFor]] nearest cells, and scan ONLY
    * those cell partitions for exact-cosine scoring. `queries` is any
    * (vec_id, embedding) frame; output matches [[Similarity.annIvf]]'s
    * (query_id, neighbor_id, cos) contract. */
  def probe(s: SparkSession, base: String, queries: DataFrame): DataFrame = {
    val n = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(metaPath(base))), "UTF-8")
      .split(" n=")(1).trim.toLong
    val cents = s.read.parquet(centroidsDir(base))
    // The annIvf-identical budget: from the corpus count the index was
    // built over, never from surviving centroid rows (scaladoc above).
    val nprobe = probesFor(centroidsFor(n))
    // Two consumers (the probed-cells collect and the broadcast join):
    // cache the query-routing frame so the centroid cross-join + window
    // run once per probe.
    val q = graft.TrackedCaches.track(
      probeCells(scaledOf(queries), cents, nprobe)
        .withColumnRenamed("vec_id", "query_id")
        .join(queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qe")), "query_id").cache())
    // The probed-cell set is a projection of the frame broadcast into
    // the join below, so this collect is bounded by the same budget as
    // that broadcast (≤ |queries|·nprobe ints). Path-level pruning (the
    // StandingIndex idiom): only the probed cell directories are listed
    // and read; the isin filter stays as the plan-visible
    // PartitionFilters witness.
    val probed = q.select("cell").distinct()
      .collect().map(_.getInt(0).toLong).sorted
    StandingIndex.prunedRead(s, cellsDir(base), "cell", probed)
      .join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(floatCosine(col("qe"), col("embedding")), 4).as("cos"))
      .orderBy("query_id", "neighbor_id")
  }

  /** The shipped query: same query set and semantics as `q_ann_ivf`, via
    * the standing index (built on first call, probe-only after — a bench
    * rerun measures the serving regime, which is the feature). Oracle:
    * [[Similarity.annIvfSql]] unchanged. */
  def annIvfStanding(s: SparkSession, d: String): DataFrame = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_standing"
    buildIfStale(s, d, base)
    probe(s, base,
      Tables.embeddings(s, d).filter(col("vec_id") < NumQueries))
  }
}
