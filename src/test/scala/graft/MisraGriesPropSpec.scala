package graft

import scala.collection.mutable

import graft.ops.Sketches.{MgCapacity, MisraGries}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the Misra-Gries sketch OFF-Spark: the mergeable-
  * summaries guarantee (any item with freq > n/(capacity+1) survives any
  * merge tree) is what makes the heavy-hitters candidate pass sound under
  * map-side combine, task-level parallelism, and AQE re-partitioning — so
  * it is gated directly, over random streams and random partition splits,
  * not just the one corpus the oracle sees. Plain scalacheck generators
  * (deterministic seeds — the scalatest bridge isn't in the offline cache). */
class MisraGriesPropSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // Zipf-ish stream: heavy tokens t0..t9 mixed into a long uniform tail, so
  // real heavy hitters exist amid enough distinct noise to overflow buffers.
  private val streamGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(2000, 8000)
    toks <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.chooseNum(0, 9).map(i => s"t$i"),
      5 -> Gen.chooseNum(0, 5000).map(i => s"noise$i")))
  } yield toks

  private def runSketch(parts: Seq[Seq[String]]): Map[String, Long] = {
    val bufs = parts.map { p =>
      p.foldLeft(MisraGries.zero)((b, t) => MisraGries.reduce(b, t))
    }
    val merged = bufs.foldLeft(MisraGries.zero)((a, b) =>
      MisraGries.merge(a, mutable.Map(b.toSeq: _*)))
    MisraGries.finish(merged)
  }

  test("every true heavy hitter survives random streams and random splits") {
    (1 to 25).foreach { i =>
      val stream = sample(streamGen, i.toLong)
      val nParts = 1 + math.abs(stream.hashCode()) % 7
      val parts = stream.grouped(math.max(1, stream.size / nParts)).toSeq
      val sketch = runSketch(parts.map(_.toSeq))
      val n = stream.size.toLong
      val freqs = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val mustSurvive = freqs.filter(_._2 * (MgCapacity + 1) > n).keys.toSet
      val missed = mustSurvive -- sketch.keySet
      assert(missed.isEmpty,
        s"seed $i: sketch (size ${sketch.size}) lost guaranteed items $missed " +
          s"(n=$n, parts=${parts.size})")
      assert(sketch.size <= MgCapacity, s"seed $i: buffer exceeded capacity")
    }
  }

  test("sketch counts never overcount the true frequency") {
    (1 to 10).foreach { i =>
      val stream = sample(streamGen, 100L + i)
      val sketch = runSketch(Seq(stream))
      val freqs = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      sketch.foreach { case (t, c) =>
        assert(c <= freqs.getOrElse(t, 0L),
          s"seed $i: sketch overcounts $t: $c > ${freqs.getOrElse(t, 0L)}")
      }
    }
  }
}
