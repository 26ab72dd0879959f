package graft

import java.nio.file.{Files, Paths}

import graft.llm.StandingIndex
import org.scalatest.funsuite.AnyFunSuite

/** Recovery-protocol properties of the standing-index shared machinery
  * that the per-index suites (AnnIndexSpec, RetrievalSpec, DedupSpec)
  * exercise only on the happy path: the marker-suspend exception
  * contract, and linkRec's metadata-vs-data cloning split. */
class StandingIndexSpec extends SparkSpec {

  private def mkIndex(): java.nio.file.Path = {
    val base = Files.createTempDirectory("graft_standing_spec")
    Files.createDirectories(base.resolve("cells"))
    Files.write(base.resolve("cells/part-0.parquet"),
      "livebytes".getBytes("UTF-8"))
    StandingIndex.commit(base.toString, "sig v1")
    base
  }

  test("marker-suspend: pre-destructive failure restores the marker") {
    val base = mkIndex()
    // Body fails BEFORE touching any live file — the compactTable tmp-
    // write failure mode. Scratch under _compact_* must not read as
    // live-state divergence.
    val boom = intercept[RuntimeException] {
      StandingIndex.withMarkerSuspended(base.toString) {
        Files.createDirectories(base.resolve("_compact_cells"))
        Files.write(base.resolve("_compact_cells/part-0.parquet"),
          "halfwritten".getBytes("UTF-8"))
        throw new RuntimeException("tmp write failed")
      }
    }
    assert(boom.getMessage == "tmp write failed")
    assert(StandingIndex.upToDate(base.toString, "sig v1"),
      "a transient pre-destructive failure must not cost a full rebuild")
    Fs.deleteRec(base)
  }

  test("marker-suspend: failure after live mutation stays unmarked") {
    val base = mkIndex()
    intercept[RuntimeException] {
      StandingIndex.withMarkerSuspended(base.toString) {
        // The destructive phase started: the live table is gone.
        Fs.deleteRec(base.resolve("cells"))
        throw new RuntimeException("swap failed")
      }
    }
    assert(!Files.exists(base.resolve("_meta")),
      "a half-rewritten index must stay unmarked (rebuildable)")
    Fs.deleteRec(base)
  }

  test("marker-suspend: success restores the marker over a mutated tree") {
    val base = mkIndex()
    StandingIndex.withMarkerSuspended(base.toString) {
      Files.write(base.resolve("cells/part-1.parquet"),
        "compacted".getBytes("UTF-8"))
      ()
    }
    assert(StandingIndex.upToDate(base.toString, "sig v1"))
    Fs.deleteRec(base)
  }

  test("concurrency contract: the tree reads STALE while maintenance is " +
      "suspended, and serves again after") {
    // The single-writer contract (StandingIndex object scaladoc) rests on
    // exactly this observable: withMarkerSuspended unmarks the tree for
    // the duration of the body, so a build-if-stale probe from a second
    // session inside that window would read "stale" and start a rebuild
    // into the live tree — a second unserialized writer. This spec pins
    // the window's boundaries: stale INSIDE the body (the documented
    // hazard, not an accident a refactor may silently remove), served
    // again immediately after.
    val base = mkIndex()
    var staleInside = false
    StandingIndex.withMarkerSuspended(base.toString) {
      staleInside = !StandingIndex.upToDate(base.toString, "sig v1") &&
        !StandingIndex.markerStartsWith(base.toString, "sig")
      ()
    }
    assert(staleInside,
      "a concurrent prober inside the maintenance window must read the " +
        "tree as stale — if this starts failing, the suspension protocol " +
        "changed and the documented concurrency contract must be rewritten")
    assert(StandingIndex.upToDate(base.toString, "sig v1"),
      "the marker must be restored the moment maintenance completes")
    Fs.deleteRec(base)
  }

  test("linkRec byte-copies metadata files so a clone re-stamp cannot " +
      "corrupt the pristine marker") {
    val src = mkIndex()
    val dst = Files.createTempDirectory("graft_standing_clone")
    Fs.deleteRec(dst); // linkRec creates the root itself via walk order
    Fs.linkRec(src, dst)
    // Data file: hard-linked (same inode) — the metadata-scale clone.
    val srcIno = Files.getAttribute(
      src.resolve("cells/part-0.parquet"), "unix:ino")
    val dstIno = Files.getAttribute(
      dst.resolve("cells/part-0.parquet"), "unix:ino")
    assert(srcIno == dstIno, "data files must be hard-linked")
    // Marker: independent bytes — re-stamping the clone (the
    // StandingIndex.commit truncate-in-place write) leaves the pristine
    // index's marker intact.
    StandingIndex.commit(dst.toString, "sig v2 (clone)")
    assert(StandingIndex.upToDate(src.toString, "sig v1"),
      "re-stamping the clone corrupted the pristine marker")
    assert(StandingIndex.upToDate(dst.toString, "sig v2 (clone)"))
    Fs.deleteRec(src); Fs.deleteRec(dst)
  }

  test("full purge through compactTable leaves a readable, " +
      "append-compatible table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val base = Files.createTempDirectory("graft_standing_purge").toString
    val rows = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "v")
    StandingIndex.writeBucketed(rows, col("doc_id"), 4, s"$base/t")
    // The all-rows-deleted rewrite (a purge of the whole population):
    // without the ensureReadable guard this swaps in a data-less dir
    // (only _SUCCESS) that the next read can't infer a schema from.
    StandingIndex.compactTable(spark, base, "t", "bucket",
      _.filter(lit(false)))
    val empty = spark.read.parquet(s"$base/t")
    assert(empty.count() == 0, "the purged table must serve empty")
    assert(empty.columns.toSet == Set("doc_id", "v", "bucket"),
      s"schema lost: ${empty.columns.toList}")
    // prunedRead's full-read fallback path must serve too.
    assert(StandingIndex.prunedRead(spark, s"$base/t", "bucket", Seq(9L))
      .count() == 0)
    // Later partitioned appends must land in the same (uniform) layout.
    StandingIndex.appendBucketed(rows, col("doc_id"), 4, s"$base/t")
    assert(spark.read.parquet(s"$base/t").count() == 3,
      "the schemaed-empty state must stay append-compatible")
    // A plain re-compaction of the refilled table keeps every row.
    StandingIndex.compactTable(spark, base, "t", "bucket")
    assert(spark.read.parquet(s"$base/t").count() == 3)
    Fs.deleteRec(Paths.get(base))
  }

  test("compactFlat of an all-deleted delta table keeps the schema readable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    val base = Files.createTempDirectory("graft_standing_flat").toString
    // Delta rows that sum to zero everywhere — the rollup drops them all.
    Seq((1L, 5L), (1L, -5L)).toDF("doc_id", "n0")
      .write.parquet(s"$base/n0")
    StandingIndex.compactFlat(spark, base, "n0",
      _.groupBy("doc_id").agg(sum("n0").as("n0"))
        .filter(col("n0") =!= 0L))
    val e = spark.read.parquet(s"$base/n0")
    assert(e.count() == 0 && e.columns.toSet == Set("doc_id", "n0"),
      s"all-zero-sum rollup bricked the flat table: ${e.columns.toList}")
    Fs.deleteRec(Paths.get(base))
  }

  test("compaction swap is rename-only and reaps a stale aside dir " +
      "from a previous crash") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft_standing_swap").toString
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v")
      .write.parquet(s"$base/t")
    // A crash between swapDirs' two renames leaves the old live tree
    // under _old_<table>; the next compaction must reap it, not trip
    // over it.
    Files.createDirectories(Paths.get(s"$base/_old_t/junk"))
    Files.write(Paths.get(s"$base/_old_t/junk/stale.txt"),
      "stale".getBytes("UTF-8"))
    StandingIndex.compactFlat(spark, base, "t",
      _.filter(col("doc_id") === 1L))
    val t = spark.read.parquet(s"$base/t")
    assert(t.count() == 1 && t.columns.toSet == Set("doc_id", "v"))
    // Swap hygiene: neither the temp nor the aside dir survives.
    assert(!Files.exists(Paths.get(s"$base/_compact_t")),
      "temp dir must not survive the swap")
    assert(!Files.exists(Paths.get(s"$base/_old_t")),
      "aside dir must be deleted after the rename swap")
    Fs.deleteRec(Paths.get(base))
  }
}
