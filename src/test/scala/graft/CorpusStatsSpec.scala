package graft

import graft.llm.CorpusStats

/** Tokenizer/cartography statistics: full independent Scala recomputation
  * (the oracle then cross-checks DuckDB). */
class CorpusStatsSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def corpus: Seq[(String, String)] =
    Tables.documents(spark, Sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("zipf slope recomputes per source under the decimal-moment discipline") {
    val bySource = corpus.groupBy(_._1)
    val expected = bySource.map { case (src, docs) =>
      val counts = docs.flatMap(_._2.split(" ", -1)).groupBy(identity)
        .map { case (w, o) => (w, o.length.toLong) }.toSeq
      val top = counts.sortBy { case (w, c) => (-c, w) }.take(CorpusStats.ZipfRanks)
      val xy = top.zipWithIndex.map { case ((_, c), i) =>
        (round6(math.log(i + 1.0)), round6(math.log(c.toDouble)))
      }
      val n = xy.length
      val sx = xy.map(p => BigDecimal(p._1)).sum.toDouble
      val sy = xy.map(p => BigDecimal(p._2)).sum.toDouble
      val sxy = xy.map(p => BigDecimal(round6(p._1 * p._2))).sum.toDouble
      val sxx = xy.map(p => BigDecimal(round6(p._1 * p._1))).sum.toDouble
      val slope = round6((n * sxy - sx * sy) / (n * sxx - sx * sx))
      src -> (n, slope, round6((sy - slope * sx) / n))
    }
    val rows = CorpusStats.zipfSlope(spark, Sf).collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val (n, slope, intercept) = expected(r.getString(0))
      assert(r.getAs[Int]("n_ranks") == n, s"${r.getString(0)} n_ranks")
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-9,
        s"${r.getString(0)}: slope ${r.getAs[Double]("slope")} vs $slope")
      assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-9)
      // Frequencies are non-increasing in rank, so the fitted line must fall.
      assert(r.getAs[Double]("slope") < 0.0)
    }
  }

  test("bpe pair counts recompute exactly with deterministic tie order") {
    val exact = corpus.flatMap(_._2.split(" ", -1))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, o) => (p, o.length.toLong) }
    val total = exact.values.sum
    val top = exact.toSeq.sortBy { case (p, n) => (-n, p) }.take(CorpusStats.BpeTopK)
    val rows = CorpusStats.bpePairs(spark, Sf).collect()
    assert(rows.length == math.min(CorpusStats.BpeTopK, exact.size))
    rows.zip(top).foreach { case (r, (p, n)) =>
      assert(r.getString(0) == p && r.getLong(1) == n,
        s"rank mismatch: got (${r.getString(0)}, ${r.getLong(1)}), want ($p, $n)")
      assert(math.abs(r.getAs[Double]("share") - round6(n.toDouble / total)) < 1e-9)
    }
  }
}
