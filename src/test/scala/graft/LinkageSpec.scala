package graft

import graft.functions.{JaroWinklerImpl, StringDistance}
import graft.ops.Linkage
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Record-linkage family: kernel exactness for the custom Jaro-Winkler
  * expression (textbook vectors + interpreted-vs-codegen agreement) and the
  * structural guarantees of blocked matching and entity resolution. */
class LinkageSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler kernel: textbook vectors, identity, symmetry, empties") {
    // the two canonical examples from Winkler's papers, at the exact doubles
    // the common native implementations produce
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
    for ((a, b) <- Seq(("prefix", "preface"), ("red widget", "blue widget")))
      assert(jw(a, b) == jw(b, a), s"asymmetric on ($a, $b)")
  }

  test("jaro_winkler expression: codegen path agrees with the kernel") {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("dwayne", "duane"),
      ("red widget", "red widgets"), ("small ring", "small king"),
      ("", "x"), ("abcd", "abcd"))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), StringDistance.jaroWinkler(col("a"), col("b")).as("jw"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)),
        s"codegen result diverged on (${r.getString(0)}, ${r.getString(1)})")
    }
    // NULL propagation (nullIntolerant)
    val n = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
      .select(StringDistance.jaroWinkler(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("fuzzy join: pairs share a block, distances honest and bounded") {
    val rows = Linkage.fuzzyJoin(spark, Sf).collect()
    assert(rows.nonEmpty, "no fuzzy candidates in the corpus dictionary")
    rows.foreach { r =>
      val (a, b, dist) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(a < b, "pair not canonically ordered")
      assert(a.split(' ').last == b.split(' ').last, "pair crosses blocks")
      assert(dist >= 1 && dist <= Linkage.MaxEditDist)
    }
  }

  test("jw linkage: every accepted pair clears the threshold exactly") {
    val rows = Linkage.jwLinkage(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= Linkage.JwThreshold)
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
  }

  test("entity resolution: matched pairs share a canonical, transitively") {
    val canon = Linkage.resolveEntities(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val pairs = Linkage.fuzzyJoin(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(canon(a) == canon(b), s"pair ($a, $b) split across clusters")
    }
    // transitivity through a shared middle name
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
    for ((m, out) <- adj; (_, x) <- out; (_, y) <- out)
      assert(canon(x) == canon(y), s"$x ~ $m ~ $y not transitive")
    // untouched names are their own canonical
    val matched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    canon.collect { case (n, c) if !matched.contains(n) =>
      assert(c == n, s"singleton $n re-canonicalized to $c")
    }
  }
}
