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
    * partial sums. Rounds materialize eagerly (localCheckpoint) so round t's
    * broadcast build doesn't re-plan rounds 1..t-1. Node ids stay LONGS
    * throughout the joins (parity-encoded: part p → 2p, supplier s → 2s+1);
    * the display string ("p:…"/"s:…") is minted only in the final
    * projection — integer hash joins, no string keys in the hot path. That
    * is the right plan whenever the node vector fits a broadcast (any graph
    * whose vertex set is dims-scale); for a web-scale vertex set, flip the
    * hint off and the same code degrades to the classic shuffle
    * formulation — edges pre-bucketed on src, one rank-vector shuffle per
    * round. */
  /** Parity-encoded long-keyed edge list (cached+tracked) and out-degrees. */
  private[graft] def prGraph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = graft.TrackedCaches.track(
      e0.select((col("p") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .union(e0.select((col("sk") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
        .cache())
    (edges, edges.groupBy("src").agg(count(lit(1)).as("d")))
  }

  /** One un-materialized propagation round — the plan PlanShapeSpec audits
    * (pageRank checkpoints each round, which truncates the visible plan). */
  private[graft] def prRound(edges: DataFrame, deg: DataFrame, pr: DataFrame): DataFrame = {
    val contrib = pr.join(broadcast(deg), pr("nid") === deg("src"))
      .select(col("nid"), expr("pr div d").as("c"))
    edges.join(broadcast(contrib), edges("src") === contrib("nid"))
      .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      .select(col("dst").as("nid"),
        (lit(PrBase) + expr(s"($PrDamp * m) div 100")).as("pr"))
  }

  def pageRank(s: SparkSession, d: String): DataFrame = {
    val (edges, deg0) = prGraph(s, d)
    // The rank and degree vectors are node-scale (~21k rows at sf0.1, two
    // longs each) — materialize them to LOCAL relations (the trainCentroids
    // discipline, llm/Similarity.scala): each round's broadcast then builds
    // from driver-local data instead of re-running a cluster job, and round
    // t's plan never nests rounds 1..t-1 (the problem localCheckpoint(true)
    // solved before, at the cost of an eager materialization job per round).
    // For a web-scale vertex set this collect is the thing to flip back to a
    // checkpointed distributed vector — see the scaladoc above.
    def localize(df: DataFrame): DataFrame =
      s.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
    val deg = localize(deg0)
    var pr = deg.select(col("src").as("nid"), lit(PrInit).as("pr"))
    (1 to PrIters).foreach { _ =>
      pr = localize(prRound(edges, deg, pr))
    }
    pr.select(
        when(col("nid") % 2 === 0, concat(lit("p:"), expr("nid div 2")))
          .otherwise(concat(lit("s:"), expr("(nid - 1) div 2")))
          .as("node"),
        col("pr").as("rank"))
      .orderBy("node")
  }

  /** One un-materialized round of the distributed formulation — [[prRound]]'s
    * integer arithmetic with every broadcast replaced by a hinted
    * shuffle-hash join (PlanShapeSpec audits this plan: no broadcast, no
    * sort-merge of the edge list). */
  private[graft] def prRoundDist(edges: DataFrame, deg: DataFrame,
      pr: DataFrame): DataFrame = {
    val contrib = pr.join(deg.hint("shuffle_hash"), pr("nid") === deg("src"))
      .select(col("nid"), expr("pr div d").as("c"))
    edges.join(contrib.hint("shuffle_hash"), edges("src") === contrib("nid"))
      .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      .select(col("dst").as("nid"),
        (lit(PrBase) + expr(s"($PrDamp * m) div 100")).as("pr"))
  }

  /** [[pageRank]] without the driver-localized rank vector — the web-scale
    * formulation the batch variant's scaladoc points at, executed: the rank
    * vector stays a DISTRIBUTED dataset for the whole run (each round
    * materializes via eager localCheckpoint — executor-resident partitions,
    * no driver collect, lineage truncated so round t never re-plans rounds
    * 1..t-1), edges are pre-bucketed on src ONCE and read from cache every
    * round, and the per-round joins are hinted shuffle-hash so no side is
    * ever broadcast — the shape that survives a vertex set too large for
    * any single machine. Round arithmetic is [[prRound]]'s bit-for-bit
    * (same integer formulas), so the output hash-matches [[pageRank]] and
    * shares its DuckDB oracle; PlanShapeSpec additionally asserts the rank
    * lineage carries no LocalTableScan (the driver-localization marker) and
    * that the edge list is not re-shuffled per round.
    *
    * Cost trade vs [[pageRank]]: each round shuffles ~|nodes| rank rows on
    * nid (deg and the post-agg rank vector share the src/nid partitioning,
    * so the contribution join is co-partitioned) — at dims-scale the
    * broadcast variant wins (nothing shuffles at all), which is why it
    * stays the shipped default; at web scale the broadcast build itself is
    * the bottleneck and THIS plan is the one that runs. */
  def pageRankDistributed(s: SparkSession, d: String): DataFrame = {
    val (edges0, _) = prGraph(s, d)
    // Pre-bucket on src: every round's message join reuses this layout, so
    // the fact-sized edge list is shuffled exactly once, here.
    val edges = graft.TrackedCaches.track(
      edges0.repartition(col("src")).cache())
    // Degrees inherit the src bucketing (partial agg, no exchange).
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    var pr = deg.select(col("src").as("nid"), lit(PrInit).as("pr"))
      .localCheckpoint(true)
    (1 to PrIters).foreach { _ =>
      pr = prRoundDist(edges, deg, pr).localCheckpoint(true)
    }
    pr.select(
        when(col("nid") % 2 === 0, concat(lit("p:"), expr("nid div 2")))
          .otherwise(concat(lit("s:"), expr("(nid - 1) div 2")))
          .as("node"),
        col("pr").as("rank"))
      .orderBy("node")
  }

  val pageRankSql: String = {
    // One CTE per round, the same integer formulas. DuckDB's sum(BIGINT) is
    // HUGEINT -> cast back before the next round's arithmetic.
    def round(prev: String, out: String) =
      s"""$out AS (
            SELECT e.dst AS nid,
                   $PrBase + ($PrDamp * CAST(sum(r.pr // dg.d) AS BIGINT)) // 100 AS pr
            FROM edges e
            JOIN $prev r ON e.src = r.nid
            JOIN deg dg ON e.src = dg.src
            GROUP BY e.dst)"""
    s"""WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
        edges AS (SELECT p * 2 AS src, sk * 2 + 1 AS dst FROM e0
                  UNION ALL
                  SELECT sk * 2 + 1, p * 2 FROM e0),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        r0 AS (SELECT src AS nid, CAST($PrInit AS BIGINT) AS pr FROM deg),
        ${round("r0", "r1")},
        ${round("r1", "r2")},
        ${round("r2", "r3")}
        SELECT CASE WHEN nid % 2 = 0 THEN 'p:' || CAST(nid // 2 AS BIGINT)
                    ELSE 's:' || CAST((nid - 1) // 2 AS BIGINT) END AS node,
               pr AS rank
        FROM r3 ORDER BY node"""
  }

  /** Hot-part cap for the co-supply edge builder: a part supplied by f
    * suppliers contributes f(f-1)/2 candidate edges, so an unbounded hot
    * part is a quadratic reducer — the SAME failure mode as a stop-shingle
    * in the Jaccard index, and the same fix ([[graft.llm.Dedup.ShingleDfCap]]
    * discipline): parts above the cap carry no co-supply signal worth a
    * quadratic blowup and are dropped BEFORE pairing. The oracle applies
    * the identical cap. */
  val CoSupplyCap = 50

  /** Strong-tie floor for the triangle graph: supplier pairs are edges only
    * with at least this many shared parts. Corpus-wide co-occurrence over a
    * small supplier dimension saturates — at sf0.1 EVERY pair shares ≥ 1 of
    * the 20k parts (mean 17), making the ≥1 graph the complete K_1000 with
    * C(1000,3) ≈ 166M triangles, an output-size blowup no enumeration
    * algorithm can dodge (measured: 756 cpu-s). Thresholding on tie
    * STRENGTH is the standard projection fix for dense co-occurrence
    * graphs: the ≥30 upper tail keeps 2 015 of 499 500 pairs at sf0.1
    * (avg degree 4) while at the small correctness SFs — where shared-part
    * counts run 130–190 — every edge clears the bar, so the graph (and the
    * brute-force spec replay) is unchanged there. */
  val MinSharedParts = 30L

  /** Per-node triangle counts over the supplier STRONG co-supply graph
    * (pairs sharing ≥ [[MinSharedParts]] sub-[[CoSupplyCap]] parts) — the
    * standard cluster-coefficient / community-density signal.
    *
    * Scale shape: the classic DEGREE-ORDERED orientation. Each undirected
    * edge is directed from the (degree, id)-smaller endpoint to the larger,
    * which makes every node's out-degree O(sqrt(|E|)) on any graph; the
    * wedge join (paths u→v, u→w) therefore touches sum(outdeg²) =
    * O(|E|^1.5) candidate wedges instead of sum(deg²), which a hub node
    * would otherwise drive quadratic. Wedge closure is ONE equi-join of
    * the wedge list against the directed edge list — everything is
    * equi-joins over integer keys. Edge building aggregates the per-part
    * pair stream (bounded by [[CoSupplyCap]]²/2 per part) into weighted
    * pairs BEFORE the threshold filter — one map-side-combined shuffle on
    * the pair key. */
  def triangleCounts(s: SparkSession, d: String): DataFrame = {
    // The (part, supplier) projection is referenced THREE times — the df
    // cap aggregate and both sides of the pairing self-join — and each
    // reference otherwise re-runs the full lineitem scan + distinct
    // shuffle. Measured isolated A/B at sf0.1 (interleaved best-of-2,
    // r11): uncached 4.59-4.66 s wall / 17.8-19.5 cpu-s vs cached
    // 4.09-4.25 s / 14.8-15.3 cpu-s — ~10% wall, ~20% cpu here, and the
    // saving scales with the fact:projection size ratio (at 100 TB the
    // avoided work is two extra full fact scans). Both cached frames are
    // supplier/part-scale, far below the fact.
    val ps = graft.TrackedCaches.track(Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk")).distinct()
      .cache())
    val keep = ps.groupBy("p").agg(count(lit(1)).as("f"))
      .filter(col("f") <= CoSupplyCap)
    val capped = graft.TrackedCaches.track(ps.join(keep.select("p"), "p").cache())
    // Lineage cuts (the PageRank localCheckpoint discipline). The edge
    // builder (full scan + per-part pairing fan-out + pair aggregate) is by
    // far the expensive subtree, and `edges` is referenced from deg, the
    // orientation join, both wedge sides and the closure — without a cut
    // Spark INLINES the builder at every reference and the pairing runs ~8x
    // in one plan (measured: 7.3 s wall at sf0.1 with 2-core utilization —
    // pure recompute serialization). The thresholded edge list is tiny, so
    // materialize it eagerly; dirEdges gets the same cut because it is
    // referenced three times (two wedge sides + the closure), each of which
    // would otherwise replay the deg aggregation and orientation joins.
    // Downstream, every join runs over node-scale local tables and
    // broadcasts.
    val edges = capped.select(col("p"), col("sk").as("a"))
      .join(capped.select(col("p"), col("sk").as("b")), "p")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= MinSharedParts)
      .select("a", "b").localCheckpoint(true)
    val deg = edges.select(col("a").as("n")).union(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // Orient a->b iff (deg(a), a) < (deg(b), b)
    val dirEdges = edges
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(true)
    val wedges = dirEdges.select(col("src"), col("dst").as("v"))
      .join(dirEdges.select(col("src"), col("dst").as("w")), "src")
      .filter(col("v") < col("w"))
    val tris = wedges.join(
      dirEdges.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select(col("src").as("x"), col("v").as("y"), col("w").as("z"))
    val perNode = tris.select(col("x").as("n"))
      .union(tris.select(col("y").as("n")))
      .union(tris.select(col("z").as("n")))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("supplier"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy("supplier")
  }

  val triangleCountsSql: String =
    s"""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
        keep AS (SELECT p FROM ps GROUP BY p HAVING count(*) <= $CoSupplyCap),
        capped AS (SELECT ps.p, ps.sk FROM ps JOIN keep ON ps.p = keep.p),
        edges AS (SELECT x.sk AS a, y.sk AS b
                  FROM capped x JOIN capped y ON x.p = y.p AND x.sk < y.sk
                  GROUP BY 1, 2 HAVING count(*) >= $MinSharedParts),
        deg AS (SELECT n, count(*) AS deg FROM (
                  SELECT a AS n FROM edges UNION ALL SELECT b FROM edges)
                GROUP BY n),
        de AS (SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b)
                           THEN e.a ELSE e.b END AS src,
                      CASE WHEN (da.deg, e.a) < (db.deg, e.b)
                           THEN e.b ELSE e.a END AS dst
               FROM edges e
               JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n),
        tri AS (SELECT w1.src AS x, w1.dst AS y, w2.dst AS z
                FROM de w1 JOIN de w2
                  ON w1.src = w2.src AND w1.dst < w2.dst
                JOIN de c ON c.src = w1.dst AND c.dst = w2.dst),
        pn AS (SELECT n, count(*) AS n_tri FROM (
                 SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri)
               GROUP BY n)
        SELECT deg.n AS supplier, deg.deg,
          coalesce(pn.n_tri, 0) AS n_tri
        FROM deg LEFT JOIN pn ON deg.n = pn.n
        ORDER BY supplier"""

  /** BFS depth cap for [[reachBfs]]. Three hops covers the supply-chain
    * question ("a recall of part X touches which suppliers, then which
    * co-supplied parts, then which of THEIR suppliers") while keeping the
    * un-deduplicated recursive frontier bounded: recursive CTEs cannot
    * aggregate inside the loop, so frontier rows multiply by node degree
    * per hop (~550k rows total here at either test SF) — the depth cap is
    * what bounds that product, the same role the round count plays in the
    * iterative family. */
  val BfsMaxHop = 3

  /** Seed node: part 1, parity-encoded like the PageRank node ids. */
  val BfsSeed = 2L

  /** Min-hop reachability from one part over the part↔supplier graph via a
    * RECURSIVE CTE (Spark 4's WITH RECURSIVE / UnionLoopExec) — the
    * supply-chain blast-radius query, and the library's declarative-SQL
    * counterpart to the hand-rolled iterative traversals: bounded-depth
    * traversals fit the recursive-CTE form directly; UNBOUNDED fixpoints
    * (components, ranks) stay with the checkpointed driver-loop kernels
    * ([[pageRankDist]], [[graft.llm.Dedup]]'s min-label components), which
    * dedupe the frontier between rounds — the thing the recursion's
    * UNION ALL loop cannot do.
    *
    * Scale shape: the edge list is built ONCE, eagerly materialized
    * (localCheckpoint — the [[triangleCounts]] lineage-cut discipline), and
    * registered as the view the recursion scans each iteration; every hop
    * is then one equi-join of the (hop-bounded) frontier against that
    * local table, and the min-hop aggregate runs once, after the loop.
    * Node ids stay parity-encoded longs inside the loop; strings are
    * minted only in the final projection. */
  def reachBfs(s: SparkSession, d: String): DataFrame = {
    val ps = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk")).distinct()
    val edges = ps.select((col("p") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionByName(ps.select((col("sk") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
      .localCheckpoint(true)
    edges.createOrReplaceTempView("graft_bfs_edges")
    s.sql(s"""
      WITH RECURSIVE reach(nid, hop) AS (
        SELECT CAST($BfsSeed AS BIGINT) AS nid, 0 AS hop
        UNION ALL
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN graft_bfs_edges e ON e.src = r.nid
        WHERE r.hop < $BfsMaxHop
      )
      SELECT CASE WHEN nid % 2 = 0 THEN concat('p:', CAST(nid DIV 2 AS STRING))
                  ELSE concat('s:', CAST((nid - 1) DIV 2 AS STRING)) END AS node,
             min(hop) AS hop
      FROM reach GROUP BY nid ORDER BY hop, node""")
  }

  /** The DISTRIBUTED twin of [[reachBfs]] — iterative deduped-frontier BFS,
    * the [[pageRankDistributed]] move applied to traversal: each round
    * expands the frontier by one equi-join against the pre-bucketed edge
    * list, DEDUPLICATES it (distinct), and anti-joins away every node
    * already visited, so a round's frontier is bounded by |unvisited
    * nodes| no matter the path multiplicity — exactly the aggregation the
    * recursive CTE's UNION ALL loop cannot express (its frontier rows
    * multiply by node degree per hop, which is why [[reachBfs]] carries
    * [[BfsMaxHop]]). First-discovery order IS min-hop order in BFS, so
    * hop labels need no post-aggregation; with `maxHop = None` the loop
    * runs to the true fixpoint (frontier empty = component exhausted) in
    * at most diameter rounds, which a depth-capped recursion cannot reach
    * on a high-diameter graph without exponential frontier blowup.
    *
    * Scale shape: edges shuffle ONCE into the src bucketing and are read
    * from cache every round; the per-round join is hinted shuffle-hash on
    * that layout (no broadcast — the frontier can be node-scale); visited
    * and frontier materialize via eager localCheckpoint so round t never
    * re-plans rounds 1..t-1 (executor-resident, no driver collect). The
    * per-round `count()` on the already-checkpointed frontier is the loop's
    * only driver-visible scalar — the termination test. Output is
    * hash-identical to [[reachBfs]] at the same cap (GraphSpec proves
    * both cap-equality and uncapped fixpoint termination) and shares its
    * DuckDB oracle. */
  def reachBfsDistributed(s: SparkSession, d: String,
      maxHop: Option[Int] = Some(BfsMaxHop)): DataFrame = {
    val ps = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk")).distinct()
    val edges0 = ps.select((col("p") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionByName(ps.select((col("sk") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
    val edges = graft.TrackedCaches.track(
      edges0.repartition(col("src")).cache())
    var visited = edges.sparkSession.range(1)
      .select(lit(BfsSeed).as("nid"), lit(0).as("hop"))
      .localCheckpoint(true)
    var frontier = visited
    var hop = 0
    var frontierSize = 1L
    while (frontierSize > 0 && maxHop.forall(hop < _)) {
      hop += 1
      frontier = bfsRound(edges, visited, frontier, hop).localCheckpoint(true)
      frontierSize = frontier.count()
      if (frontierSize > 0)
        visited = visited.unionByName(frontier).localCheckpoint(true)
    }
    visited.select(
        when(col("nid") % 2 === 0, concat(lit("p:"), expr("nid div 2")))
          .otherwise(concat(lit("s:"), expr("(nid - 1) div 2")))
          .as("node"),
        col("hop").cast("int").as("hop"))
      .orderBy("hop", "node")
  }

  /** One BFS expansion round: frontier -> unvisited neighbors at `hop`.
    * Shuffle-hash-hinted against the pre-bucketed edges so neither side
    * broadcasts (the frontier can be node-scale at web scale); split out so
    * PlanShapeSpec can audit the physical round. */
  private[graft] def bfsRound(edges: DataFrame, visited: DataFrame,
      frontier: DataFrame, hop: Int): DataFrame =
    edges.hint("shuffle_hash")
      .join(frontier.select(col("nid").as("src")), "src")
      .select(col("dst").as("nid")).distinct()
      .join(visited.select("nid"), Seq("nid"), "left_anti")
      .select(col("nid"), lit(hop).as("hop"))

  val reachBfsSql: String =
    s"""WITH RECURSIVE
        ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
        e AS (SELECT p * 2 AS src, sk * 2 + 1 AS dst FROM ps
              UNION ALL
              SELECT sk * 2 + 1, p * 2 FROM ps),
        reach(nid, hop) AS (
          SELECT CAST($BfsSeed AS BIGINT), 0
          UNION ALL
          SELECT e.dst, r.hop + 1 FROM reach r JOIN e ON e.src = r.nid
          WHERE r.hop < $BfsMaxHop
        )
        SELECT CASE WHEN nid % 2 = 0 THEN 'p:' || CAST(nid // 2 AS BIGINT)
                    ELSE 's:' || CAST((nid - 1) // 2 AS BIGINT) END AS node,
          CAST(min(hop) AS INT) AS hop
        FROM reach GROUP BY nid ORDER BY hop, node"""
}
