package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** MMR re-rank: full independent replay — quantize, score, and run the
  * greedy selection in plain Scala from the raw embeddings, then demand the
  * distributed pipeline reproduce it EXACTLY (the integer-only objective
  * makes bit-equality the right bar, not approximation). */
class MmrSpec extends SparkSpec {

  test("mmr selection matches an independent in-memory greedy replay") {
    val raw = Tables.embeddings(spark, Sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    // int8 quantization, same formula as the pipeline
    val q8 = raw.map { case (id, v) =>
      val ma = v.map(x => math.abs(x.toDouble)).max
      id -> v.map(x => math.max(-127L, math.min(127L,
        math.floor(x.toDouble * 127.0 / ma + 0.5).toLong)))
    }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = (0L until Similarity.NumQueries).flatMap { q =>
      val rel = q8.keys.filter(_ != q).map(id => id -> dot(q8(q), q8(id))).toSeq
      val cand = rel.sortBy { case (id, r) => (-r, id) }.take(Similarity.MmrCand)
      var sel = Vector.empty[(Long, Long, Long)] // (doc, rel, pen)
      for (step <- 1 to Similarity.MmrK) {
        val pool = cand.filterNot { case (id, _) => sel.exists(_._1 == id) }
          .map { case (id, r) =>
            val pen = if (sel.isEmpty) 0L
              else sel.map(s => dot(q8(id), q8(s._1))).max
            (id, r, pen)
          }
        val best = pool.maxBy { case (id, r, pen) => (r - pen, -id) }
        sel = sel :+ best
      }
      sel.zipWithIndex.map { case ((id, r, pen), i) => (q, i + 1, id, r, pen) }
    }.toSet
    val got = Similarity.mmrRerank(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"diverged: extra=${got -- expected}, missing=${expected -- got}")
  }

  test("mmr diversifies: selected max pairwise sim <= plain top-k's") {
    // Not a theorem for arbitrary inputs at fixed k, but holds on this
    // corpus and guards the objective wiring (a sign flip would invert it).
    val raw = Tables.embeddings(spark, Sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q8 = raw.map { case (id, v) =>
      val ma = v.map(x => math.abs(x.toDouble)).max
      id -> v.map(x => math.max(-127L, math.min(127L,
        math.floor(x.toDouble * 127.0 / ma + 0.5).toLong)))
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def maxPairSim(ids: Seq[Long]): Long =
      (for (a <- ids; b <- ids if a < b) yield dot(q8(a), q8(b))).max
    val sel = Similarity.mmrRerank(spark, Sf).collect()
      .groupBy(_.getLong(0))
    sel.foreach { case (q, rows) =>
      val mmrIds = rows.map(_.getLong(2)).toSeq
      val topIds = q8.keys.filter(_ != q).toSeq
        .map(id => id -> dot(q8(q), q8(id)))
        .sortBy { case (id, r) => (-r, id) }
        .take(Similarity.MmrK).map(_._1)
      assert(maxPairSim(mmrIds) <= maxPairSim(topIds),
        s"query $q: MMR set no more diverse than plain top-k")
    }
  }
}
