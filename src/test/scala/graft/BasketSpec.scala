package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._

/** Market-basket association rules. The oracle gate hash-checks the top-100
  * report at sf0.01; this spec replays the whole computation brute-force in
  * memory at sf0.001 (6k lineitems, 200 parts) and demands the shipped
  * top-100 is exactly the head of the replayed full ranking — counts,
  * measures, order, and cut all at once. */
class BasketSpec extends SparkSpec {

  test("basketPairs matches an in-memory brute-force replay, including the top-100 cut") {
    // Brute force: order -> distinct part set -> all unordered pairs.
    val items = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size
    val partN = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { parts =>
      val sorted = parts.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.size)
        pairN((sorted(i), sorted(j))) = pairN.getOrElse((sorted(i), sorted(j)), 0L) + 1
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val full = pairN.toSeq
      .filter(_._2 >= Analytics.MinPairSupport)
      .map { case ((a, b), n) =>
        (a, b, n, r6(n.toDouble / nOrders), r6(n.toDouble / partN(a)),
          r6(n.toDouble * nOrders / (partN(a) * partN(b))))
      }
      .sortBy { case (a, b, n, _, _, _) => (-n, a, b) }
      .take(100)

    val got = Analytics.basketPairs(spark, Sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
    }.toSeq
    assert(got.size == 100, s"expected a full top-100, got ${got.size}")
    assert(got == full, "shipped top-100 diverges from the brute-force replay")
  }

  test("basketPairs measures satisfy the association-rule identities") {
    val rows = Analytics.basketPairs(spark, Sf).collect()
    rows.foreach { r =>
      val (n, support, conf, lift) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(n >= Analytics.MinPairSupport)
      assert(support > 0 && support <= 1.0)
      // confidence >= support always (n_a <= n_orders)
      assert(conf + 1e-9 >= support, s"conf $conf < support $support")
      assert(lift > 0)
    }
  }
}
