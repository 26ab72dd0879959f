package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on relational edge lists — the Pregel-lite
  * family (message = equi-join on src, combine = groupBy dst) that
  * complements [[graft.llm.Dedup.minLabelComponents]]'s connected
  * components. Everything is integer arithmetic so the fixed-iteration
  * result is bit-identical on any engine — the same determinism discipline
  * as the IVF centroid training.
  */
object Graph {

  /** Damping numerator/denominator: rank' = Base + (Damp * msgs) div 100. */
  val PrDamp = 85L
  val PrBase = 150000L
  val PrInit = 1000000L
  val PrIters = 3

  /** Fixed-iteration integer PageRank over the part↔supplier co-occurrence
    * graph (distinct (l_partkey, l_suppkey) from lineitem, both directions,
    * so every node has in- and out-edges and there is no dangling-mass
    * term). Ranks are integers scaled by 1e6; contributions use integer
    * division (truncating on both engines for non-negatives), so three
    * rounds are deterministic and hash-match the oracle's unrolled CTE
    * chain.
    *
    * Scale shape: the node set here is dimension-sized (parts + suppliers,
    * ~21k at sf0.1) while the edge list is fact-sized (~1.2M), so each round
    * BROADCASTS the per-node contribution vector against the cached edge
    * list and map-side-combines the groupBy(dst) — the edge list is scanned
    * from cache, never shuffled, and the only shuffle per round is ≤|nodes|
    * partial sums. That is the right plan whenever the node vector fits a
    * broadcast (any graph whose vertex set is dims-scale); for a web-scale
    * vertex set, flip the hint off and the same code degrades to the
    * classic shuffle formulation — edges pre-bucketed on src, one shuffle
    * of the rank vector per round. */
  def pageRank(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = graft.TrackedCaches.track(
      e0.select(concat(lit("p:"), col("p")).as("src"),
          concat(lit("s:"), col("sk")).as("dst"))
        .union(e0.select(concat(lit("s:"), col("sk")).as("src"),
          concat(lit("p:"), col("p")).as("dst")))
        .cache())
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    var pr = deg.select(col("src").as("node"), lit(PrInit).as("pr"))
    (1 to PrIters).foreach { _ =>
      val contrib = pr.join(broadcast(deg), pr("node") === deg("src"))
        .select(col("node"), expr("pr div d").as("c"))
      pr = edges.join(broadcast(contrib), edges("src") === contrib("node"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
        .select(col("dst").as("node"),
          (lit(PrBase) + expr(s"($PrDamp * m) div 100")).as("pr"))
    }
    pr.select(col("node"), col("pr").as("rank")).orderBy("node")
  }

  val pageRankSql: String = {
    // One CTE per round, the same integer formulas. DuckDB's sum(BIGINT) is
    // HUGEINT -> cast back before the next round's arithmetic.
    def round(prev: String, out: String) =
      s"""$out AS (
            SELECT e.dst AS node,
                   $PrBase + ($PrDamp * CAST(sum(r.rank // dg.d) AS BIGINT)) // 100 AS rank
            FROM edges e
            JOIN $prev r ON e.src = r.node
            JOIN deg dg ON e.src = dg.src
            GROUP BY e.dst)"""
    s"""WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
        edges AS (SELECT 'p:' || p AS src, 's:' || sk AS dst FROM e0
                  UNION ALL
                  SELECT 's:' || sk, 'p:' || p FROM e0),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, CAST($PrInit AS BIGINT) AS rank FROM deg),
        ${round("r0", "r1")},
        ${round("r1", "r2")},
        ${round("r2", "r3")}
        SELECT node, rank FROM r3 ORDER BY node"""
  }
}
