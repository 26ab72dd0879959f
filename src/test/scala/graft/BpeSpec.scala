package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** BPE merge-training specs: an in-memory replay of the full algorithm over
  * the real corpus, crafted-corpus proofs of the overlap/greedy semantics,
  * and the joiner/bound preconditions the oracle depends on. */
class BpeSpec extends SparkSpec {

  /** Reference replay: word-level BPE with occurrence counts, (cnt DESC,
    * pair-string ASC) winner selection, and leftmost non-overlapping
    * application — the exact semantics the distributed trainer and the
    * DuckDB oracle both implement. */
  private def replay(texts: Seq[String], rounds: Int): Seq[(Int, String, String, Long, Long)] = {
    var docs = texts.map(_.split(" ", -1).toVector)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      r += 1
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      docs.foreach(us => us.sliding(2).filter(_.size == 2)
        .foreach(p => counts((p(0), p(1))) += 1))
      if (counts.isEmpty) done = true
      else {
        val ((t1, t2), cnt) = counts.minBy { case ((a, b), n) => (-n, a + " " + b) }
        docs = docs.map { us =>
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < us.length) {
            if (i + 1 < us.length && us(i) == t1 && us(i + 1) == t2) {
              next += t1 + "_" + t2; i += 2 // leftmost, non-overlapping
            } else { next += us(i); i += 1 }
          }
          next.toVector
        }
        out += ((r, t1, t2, cnt, docs.map(_.length.toLong).sum))
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], rounds: Int = Bpe.MergeRounds) = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Bpe.bpeMergesOf(spark, df, rounds).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("merge table equals the in-memory replay on the real corpus") {
    val texts = Tables.documents(spark, Sf).select("text")
      .collect().map(_.getString(0)).toSeq
    val got = Bpe.bpeMerges(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    val expect = replay(texts, Bpe.MergeRounds)
    assert(got == expect, s"merge divergence:\n got   ${got.take(3)}\n expect ${expect.take(3)}")
    assert(got.size == Bpe.MergeRounds, "corpus must sustain all rounds")
    // units_after strictly decreases: every merge applies at least once
    got.map(_._5).sliding(2).foreach { case Seq(a, b) => assert(b < a); case _ => }
  }

  test("apply report agrees with the replay's final tokenization per doc") {
    val docRows = Tables.documents(spark, Sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // replay the training and keep the final unit vectors per doc
    var docs = docRows.map { case (id, t) => id -> t.split(" ", -1).toVector }.toMap
    (1 to Bpe.MergeRounds).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      docs.values.foreach(us => us.sliding(2).filter(_.size == 2)
        .foreach(p => counts((p(0), p(1))) += 1))
      val ((t1, t2), _) = counts.minBy { case ((a, b), n) => (-n, a + " " + b) }
      docs = docs.view.mapValues { us =>
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < us.length) {
          if (i + 1 < us.length && us(i) == t1 && us(i + 1) == t2) {
            next += t1 + "_" + t2; i += 2
          } else { next += us(i); i += 1 }
        }
        next.toVector
      }.toMap
    }
    val got = Bpe.bpeApply(spark, Sf).collect()
    assert(got.nonEmpty && got.length == docRows.length)
    got.foreach { r =>
      val id = r.getLong(0)
      val before = docs(id) // final units; before count from raw text
      assert(r.getInt(1) == docRows.find(_._1 == id).get._2.split(" ", -1).length)
      assert(r.getInt(2) == before.length,
        s"doc $id: units_after ${r.getInt(2)} != replay ${before.length}")
      assert(r.getInt(2) <= r.getInt(1))
    }
    // merges actually compressed something somewhere
    assert(got.exists(r => r.getInt(2) < r.getInt(1)))
  }

  test("applyWith a pre-trained merge table reproduces the trainer's apply") {
    // The production split: train once, then tokenize via the pure-map
    // applyWith — must match the trainer-coupled bpeApply row-for-row.
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
    val merges = Bpe.bpeMerges(spark, Sf).collect()
      .map(r => (r.getAs[String]("left_unit"), r.getAs[String]("right_unit")))
      .toSeq
    val viaTable = Bpe.bpeApplyWith(docs, merges).collect().map(_.toSeq).toSeq
    val coupled = Bpe.bpeApply(spark, Sf).collect().map(_.toSeq).toSeq
    assert(viaTable.nonEmpty && viaTable == coupled,
      "applyWith diverged from the trainer-coupled apply")
  }

  test("delta-maintained trainer equals the recounting baseline") {
    import spark.implicits._
    // Real corpus: full 8-round table equality, including units_after —
    // which cross-checks the delta path's char-shrink arithmetic against
    // the baseline's next-round-pair-sum derivation.
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(tbl(Bpe.bpeMergesDeltaOf(spark, docs)) ==
      tbl(Bpe.bpeMergesOf(spark, docs)), "delta trainer diverged on the corpus")
    // Crafted overlap chain: the delta recount of a changed doc must
    // handle overlapping occurrences and chained merges like the baseline.
    val chain = Seq.fill(3)("a a a a").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    assert(tbl(Bpe.bpeMergesDeltaOf(spark, chain, 3)) ==
      tbl(Bpe.bpeMergesOf(spark, chain, 3)), "delta trainer diverged on overlap chain")
  }

  test("early exhaustion: trainer ends its table, apply still agrees") {
    import spark.implicits._
    // "x y z" x3 fully merges in 2 rounds ((x,y) then (x_y,z)) — the
    // default MergeRounds=8 keeps asking, so rounds 3..8 exercise the
    // exhaustion path (empty pair table) in the trainer, the delta
    // trainer, AND — via q_bpe_exhaustion's driver gate — the oracle's
    // LEFT JOIN w$i fallback at the DuckDB engine level.
    val texts = Seq.fill(3)("x y z")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = run(texts) // default rounds = MergeRounds
    assert(got == replay(texts, Bpe.MergeRounds),
      s"exhaustion table diverged from replay: $got")
    assert(got.size == 2 && got.last._5 == 3L,
      s"expected 2 rounds ending at 3 corpus units, got $got")
    // applyWith under the early-ended table: every doc collapses to 1 unit.
    val merges = got.map(m => (m._2, m._3))
    val applied = Bpe.bpeApplyWith(df, merges).collect()
    assert(applied.forall(r => r.getInt(1) == 3 && r.getInt(2) == 1),
      "applyWith mis-handled a fully-merged corpus")
    // The delta trainer survives exhaustion identically (its top.isEmpty
    // path plus the counts > 0 filter must agree with the baseline).
    val delta = Bpe.bpeMergesDeltaOf(spark, df).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(delta == got, s"delta trainer diverged under exhaustion: $delta")
  }

  test("rounds parameter genuinely bounds the trainer") {
    // A corpus that could sustain many merges must stop at the requested
    // round count — the crafted-corpus tests depend on this bound, not on
    // the corpus happening to exhaust.
    val got = run(Seq.fill(3)("p q r s t u v w"), rounds = 2)
    assert(got.size == 2, s"expected 2 rounds, got ${got.size}: $got")
  }

  test("merges chain: a later winner contains an earlier merged unit") {
    // "x y z" xN: round 1 ties (x,y)/(y,z) at N -> lexicographic picks
    // (x,y); round 2's only pair is (x_y, z) -> the chained merge.
    val got = run(Seq.fill(4)("x y z"), rounds = 2)
    assert(got.map(m => (m._1, m._2, m._3, m._4)) ==
      Seq((1, "x", "y", 4L), (2, "x_y", "z", 4L)), s"chain broke: $got")
    assert(got.last._5 == 4L, "fully merged corpus is one unit per doc")
  }

  test("overlapping pair occurrences count individually but apply leftmost-first") {
    // "a a a a": pair (a,a) occurs 3 times; application merges positions
    // (1,2) and (3,4) -> 2 units. One doc is enough to pin the semantics.
    val got = run(Seq("a a a a"), rounds = 1).head
    assert((got._2, got._3, got._4) == (("a", "a", 3L)),
      s"overlap counting broke: $got")
    assert(got._5 == 2L, s"leftmost application broke: $got")
  }

  test("merge patterns respect unit boundaries (no substring collisions)") {
    // (b,c) wins with 3; "ab c" must NOT be rewritten by the ' b c '
    // pattern even though "b c" appears inside it as a substring.
    val got = run(Seq("b c", "b c", "b c", "ab c", "ab c"), rounds = 1).head
    assert((got._2, got._3, got._4) == (("b", "c", 3L)), s"wrong winner: $got")
    // 3 merged docs at 1 unit + 2 untouched docs at 2 units
    assert(got._5 == 3L + 4L, s"boundary collision: $got")
  }

  test("oracle preconditions hold: no joiner/parens in the vocabulary, units under the bound") {
    val bad = Tables.documents(spark, Sf)
      .filter(col("text").contains("_") || col("text").contains("(") ||
        col("text").contains(")")).count()
    assert(bad == 0, "corpus text contains a reserved encoding character")
    val maxUnits = Tables.documents(spark, Sf)
      .select(size(split(col("text"), " ")).as("n"))
      .agg(max("n")).head().getInt(0)
    assert(maxUnits <= Bpe.MaxUnits,
      s"doc with $maxUnits units exceeds the oracle's MaxUnits=${Bpe.MaxUnits}")
  }

  test("standing tokenizer: apply-from-persisted-merges equals train+apply; reruns skip training") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bpe_standing"
    graft.Fs.deleteRec(java.nio.file.Paths.get(base))
    val standing = Bpe.bpeStandingApply(spark, Sf)
      .collect().map(_.toString).toSeq
    val trained = Bpe.bpeApply(spark, Sf).collect().map(_.toString).toSeq
    assert(standing.nonEmpty)
    assert(standing == trained,
      "standing apply diverged from the train+apply path")
    // The serving contract: a second call must reuse the persisted table
    // — the marker is up to date, so no trainer pass rewrites merges/.
    val mergesDir = java.nio.file.Paths.get(s"$base/merges")
    val before = java.nio.file.Files.getLastModifiedTime(mergesDir).toMillis
    val again = Bpe.bpeStandingApply(spark, Sf)
      .collect().map(_.toString).toSeq
    val after = java.nio.file.Files.getLastModifiedTime(mergesDir).toMillis
    assert(again == trained)
    assert(after == before, "second call retrained — the marker is broken")
  }
}
