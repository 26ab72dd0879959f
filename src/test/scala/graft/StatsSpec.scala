package graft

import graft.ops.Stats
import org.apache.spark.sql.functions._

/** ANALYZE-surface specs: the oracle hash-checks values; these gate the
  * semantic claims — one-scan stats exactness and equi-depth uniformity. */
class StatsSpec extends SparkSpec {

  test("table stats columns agree with direct per-column recomputes") {
    val rows = Stats.tableStats(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val o = Tables.orders(spark, Sf)
    assert(rows("o_orderstatus").getLong(1) ==
      o.select("o_orderstatus").distinct().count())
    assert(rows("o_orderkey").getLong(2) == 0L, "synthetic keys have no nulls")
    val (mn, mx) = (rows("o_totalprice").getDouble(3), rows("o_totalprice").getDouble(4))
    val direct = o.agg(min("o_totalprice"), max("o_totalprice")).head()
    assert(mn == direct.getDouble(0) && mx == direct.getDouble(1))
    // string-profiled columns carry string extrema, numeric carry numeric
    assert(rows("o_orderpriority").isNullAt(3) && !rows("o_orderpriority").isNullAt(5))
    assert(!rows("o_custkey").isNullAt(3) && rows("o_custkey").isNullAt(5))
  }

  test("equi-depth histogram: buckets tile the domain and hold ~equal mass") {
    val h = Stats.equidepthHist(spark, Sf).collect()
    assert(h.map(_.getInt(0)).toSeq == (1 to Stats.HistBuckets))
    val n = Tables.lineitem(spark, Sf).count()
    assert(h.map(_.getLong(3)).sum == n, "bucket counts must conserve rows")
    // equi-depth: no bucket further than 25% from the ideal n/B depth
    // (interpolated cuts over near-continuous cents make this tight)
    val ideal = n.toDouble / Stats.HistBuckets
    h.foreach { r =>
      assert(math.abs(r.getLong(3) - ideal) <= 0.25 * ideal,
        s"bucket ${r.getInt(0)} depth ${r.getLong(3)} vs ideal $ideal")
    }
    // boundaries are monotone and adjacent buckets share their edge
    val bounds = h.sortBy(_.getInt(0)).map(r => (r.getDouble(1), r.getDouble(2)))
    bounds.foreach { case (lo, hi) => assert(lo <= hi) }
    bounds.zip(bounds.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi == lo2, "adjacent buckets must share their boundary")
    }
  }
}
