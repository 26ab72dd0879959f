package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.Tables

/** ANALYZE-style table/column statistics — the stats-collection surface a
  * cost-based optimizer (and a data-quality dashboard) runs against every
  * table: exact per-column NDV / null counts / extrema in ONE scan, and an
  * equi-depth histogram for selectivity estimation.
  *
  * Scale notes: the column-stats pass is a single full-scan aggregate with
  * map-side partial aggregation — one job regardless of column count (the
  * per-column aggregates ride the same scan), which is how ANALYZE must
  * behave at 100 TB; NDV here is exact count-distinct (multiple distinct
  * aggregates expand to Spark's expand-node plan — the exact-stats cost a
  * production run pays weekly, with approx_count_distinct as the cheap
  * daily path, q_approx_distinct). The histogram computes its cut points
  * from one tiny percentile aggregate broadcast back over the scan — no
  * global sort, no window. */
object Stats {

  /** Orders columns profiled by [[tableStats]], with their numeric cast
    * (null Column = non-numeric, profiled as strings). */
  private def numOf(c: String): Option[Column] = c match {
    case "o_orderkey" | "o_custkey" => Some(col(c).cast("double"))
    case "o_totalprice"             => Some(col(c))
    // cast-to-timestamp first: the source corpus scans as LTZ (no-op cast)
    // but Spark-written replicas (ScaleTest) carry TIMESTAMP_NTZ, which
    // unix_micros rejects; the NTZ->LTZ cast is wall-clock-exact in the
    // UTC session.
    case "o_orderdate" =>
      Some(unix_micros(col(c).cast("timestamp")).cast("double"))
    case _                          => None
  }
  private val StatCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Exact per-column statistics of `orders` in one scan: NDV, null count,
    * numeric extrema (timestamps as epoch micros) and lexicographic string
    * extrema. One row per column. */
  def tableStats(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val aggs = StatCols.flatMap { c =>
      val base = Seq(
        countDistinct(col(c)).as(s"ndv_$c"),
        sum(col(c).isNull.cast(LongType)).as(s"nulls_$c"))
      numOf(c) match {
        case Some(n) => base ++ Seq(min(n).as(s"mn_$c"), max(n).as(s"mx_$c"))
        case None => base ++ Seq(
          min(col(c).cast("string")).as(s"mns_$c"),
          max(col(c).cast("string")).as(s"mxs_$c"))
      }
    }
    val row = o.agg(aggs.head, aggs.tail: _*)
    val stacked = StatCols.map { c =>
      val (mnN, mxN, mnS, mxS) =
        if (numOf(c).isDefined)
          (col(s"mn_$c"), col(s"mx_$c"),
            lit(null).cast("string"), lit(null).cast("string"))
        else
          (lit(null).cast("double"), lit(null).cast("double"),
            col(s"mns_$c"), col(s"mxs_$c"))
      row.select(lit(c).as("col_name"), col(s"ndv_$c").as("ndv"),
        col(s"nulls_$c").as("n_nulls"), mnN.as("min_num"), mxN.as("max_num"),
        mnS.as("min_str"), mxS.as("max_str"))
    }
    stacked.reduce(_.union(_)).orderBy("col_name")
  }

  val tableStatsSql: String = {
    val rows = StatCols.map { c =>
      val (mn, mx, mns, mxs) = c match {
        case "o_orderdate" =>
          (s"CAST(epoch_us($c) AS DOUBLE)", s"CAST(epoch_us($c) AS DOUBLE)",
            "NULL", "NULL")
        case "o_orderkey" | "o_custkey" | "o_totalprice" =>
          (s"CAST($c AS DOUBLE)", s"CAST($c AS DOUBLE)", "NULL", "NULL")
        case _ =>
          ("NULL", "NULL", s"CAST($c AS VARCHAR)", s"CAST($c AS VARCHAR)")
      }
      s"""SELECT '$c' AS col_name, count(DISTINCT $c) AS ndv,
          count(*) - count($c) AS n_nulls,
          CAST(min($mn) AS DOUBLE) AS min_num, CAST(max($mx) AS DOUBLE) AS max_num,
          CAST(min($mns) AS VARCHAR) AS min_str, CAST(max($mxs) AS VARCHAR) AS max_str
          FROM orders"""
    }
    rows.mkString("", "\n        UNION ALL ", "\n        ORDER BY col_name")
  }

  /** Equi-depth bucket count for [[equidepthHist]]. */
  val HistBuckets = 8

  /** Equi-depth histogram of lineitem extended price (integer cents): cut
    * points at the k/[[HistBuckets]] interpolated quantiles, row counts per
    * bucket by threshold comparison. The optimizer-selectivity shape: depth
    * is ~uniform by construction, so range-predicate estimates read
    * straight off bucket fractions.
    *
    * Cost note (round-9 isolated best-of-2): ~3.5-3.9 s wall / ~9 cpu-s at
    * sf0.1 — the EXACT `percentile` aggregate buffers a per-value count
    * map over 6M rows (plus a second scan for the bucket pass); that is
    * the price of oracle-exact cut points, paid by design (the sketch
    * alternative is the separately-shipped q_approx_quantile). Round 8's
    * 2.28 s row was a favorable min of the same plan, not a regression
    * baseline. */
  def equidepthHist(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(round(col("l_extendedprice") * 100, 0).cast(LongType).as("c"))
    val fracs = (1 until HistBuckets).map(_.toDouble / HistBuckets)
    val cuts = li.agg(
      expr(s"percentile(c, array(${fracs.mkString(", ")}))").as("q"),
      min("c").as("lo0"), max("c").as("hiN"))
    // bucket = 1 + number of interior cut points strictly below the value
    val bucket = (0 until HistBuckets - 1)
      .map(i => (col("c") > col("q").getItem(i)).cast(IntegerType))
      .reduce(_ + _) + 1
    li.crossJoin(broadcast(cuts))
      .groupBy(bucket.cast(IntegerType).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(cuts))
      .select(col("bucket"),
        (0 until HistBuckets).map(i =>
          when(col("bucket") === i + 1,
            if (i == 0) col("lo0").cast("double") else col("q").getItem(i - 1))
        ).reduceRight((a, b) => a.otherwise(b)).as("lo"),
        (0 until HistBuckets).map(i =>
          when(col("bucket") === i + 1,
            if (i == HistBuckets - 1) col("hiN").cast("double")
            else col("q").getItem(i))
        ).reduceRight((a, b) => a.otherwise(b)).as("hi"),
        col("cnt"))
      .orderBy("bucket")
  }

  val equidepthHistSql: String = {
    val fracs = (1 until HistBuckets)
      .map(k => s"quantile_cont(c, ${k.toDouble / HistBuckets}) AS q$k")
      .mkString(", ")
    val bucketExpr = (1 until HistBuckets)
      .map(k => s"CAST(c > q$k AS INT)").mkString(" + ")
    val loCase = (1 to HistBuckets).map { b =>
      if (b == 1) s"WHEN bucket = 1 THEN CAST(lo0 AS DOUBLE)"
      else s"WHEN bucket = $b THEN q${b - 1}"
    }.mkString(" ")
    val hiCase = (1 to HistBuckets).map { b =>
      if (b == HistBuckets) s"WHEN bucket = $b THEN CAST(hiN AS DOUBLE)"
      else s"WHEN bucket = $b THEN q$b"
    }.mkString(" ")
    s"""WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
          FROM lineitem),
        cuts AS (SELECT $fracs, min(c) AS lo0, max(c) AS hiN FROM li),
        b AS (SELECT CAST(1 + $bucketExpr AS INT) AS bucket, count(*) AS cnt
              FROM li CROSS JOIN cuts GROUP BY 1)
        SELECT bucket, CASE $loCase END AS lo, CASE $hiCase END AS hi, cnt
        FROM b CROSS JOIN cuts ORDER BY bucket"""
  }
}
