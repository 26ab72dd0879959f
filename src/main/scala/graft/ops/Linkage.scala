package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Tables
import graft.functions.StringDistance

/** Record linkage / entity resolution over the part-name dictionary —
  * blocked fuzzy matching, the standard dedup-adjacent primitive for
  * catalog and master-data pipelines.
  *
  * Scale design: linkage NEVER pairs fact rows. Stage 1 collapses the fact
  * table to the distinct-entity dictionary with occurrence counts (one
  * map-side-combined aggregate; dictionary cardinality is vocabulary-bounded
  * and grows sublinearly in corpus size). Stage 2 blocks the dictionary on a
  * cheap deterministic key and compares only within blocks via an equi-join
  * — candidate pairs are quadratic in BLOCK size over the dictionary, not in
  * corpus rows, the same f-bounding idea as the MinHash band join
  * (llm/Dedup.scala). At 100 TB the dictionary still broadcasts. */
object Linkage {

  /** Max accepted edit distance for a fuzzy name match. */
  val MaxEditDist = 3

  /** Jaro-Winkler acceptance threshold for the similarity-scored variant. */
  val JwThreshold = 0.8

  /** Distinct-name dictionary with occurrence counts and the blocking key
    * (the name's last token — for `adjective noun` product names, the noun
    * is the stable head word that typo'd/variant adjectives share). */
  private def dictionary(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("blk", element_at(split(col("name"), " "), -1))

  /** Blocked Levenshtein linkage: candidate name pairs that share a block
    * and sit within [[MaxEditDist]] edits (identical names are the exact
    * dedup family's job, so distance 0 is excluded). Integer edit distance
    * makes the verdict engine-exact. */
  def fuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val dict = dictionary(s, d)
    val a = dict.select(col("name").as("name_a"), col("n").as("n_a"), col("blk"))
    val b = dict.select(col("name").as("name_b"), col("n").as("n_b"), col("blk"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist").between(1, MaxEditDist))
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
      .orderBy("name_a", "name_b")
  }

  val fuzzyJoinSql: String =
    s"""WITH dict AS (SELECT p_name AS name, count(*) AS n,
            string_split(p_name, ' ')[-1] AS blk
          FROM part GROUP BY p_name)
        SELECT a.name AS name_a, b.name AS name_b,
          CAST(levenshtein(a.name, b.name) AS INT) AS dist,
          a.n AS n_a, b.n AS n_b
        FROM dict a JOIN dict b ON a.blk = b.blk AND a.name < b.name
        WHERE levenshtein(a.name, b.name) BETWEEN 1 AND $MaxEditDist
        ORDER BY name_a, name_b"""

  /** Blocked Jaro-Winkler linkage through the library's codegen'd
    * [[graft.functions.JaroWinkler]] expression — the similarity-scored
    * variant of [[fuzzyJoin]] (prefix-weighted, length-normalized, the
    * classic name-matching score). The kernel is bit-identical to the
    * oracle's native implementation, so the score column and the threshold
    * verdict are both engine-exact. */
  def jwLinkage(s: SparkSession, d: String): DataFrame = {
    val dict = dictionary(s, d)
    val a = dict.select(col("name").as("name_a"), col("n").as("n_a"), col("blk"))
    val b = dict.select(col("name").as("name_b"), col("n").as("n_b"), col("blk"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", StringDistance.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("jw") >= JwThreshold)
      .select(col("name_a"), col("name_b"), col("jw"), col("n_a"), col("n_b"))
      .orderBy("name_a", "name_b")
  }

  val jwLinkageSql: String =
    s"""WITH dict AS (SELECT p_name AS name, count(*) AS n,
            string_split(p_name, ' ')[-1] AS blk
          FROM part GROUP BY p_name)
        SELECT a.name AS name_a, b.name AS name_b,
          jaro_winkler_similarity(a.name, b.name) AS jw,
          a.n AS n_a, b.n AS n_b
        FROM dict a JOIN dict b ON a.blk = b.blk AND a.name < b.name
        WHERE jaro_winkler_similarity(a.name, b.name) >= $JwThreshold
        ORDER BY name_a, name_b"""

  /** Fact-table resolution: map every part row to its linkage cluster
    * representative — the canonical name is the cluster's most frequent
    * name (tie-break lexicographic), clusters being connected components of
    * the [[fuzzyJoin]] match graph computed via min-label propagation over
    * the DICTIONARY (vocabulary-sized, so the iteration cost is independent
    * of fact cardinality), then applied to facts with one broadcast join. */
  def resolveEntities(s: SparkSession, d: String): DataFrame = {
    val dict = graft.TrackedCaches.track(
      dictionary(s, d).select("name", "n").cache())
    val edges = graft.TrackedCaches.track(
      fuzzyJoin(s, d).select(col("name_a"), col("name_b")).cache())
    // Min-label propagation to fixpoint over the tiny dictionary graph:
    // labels move only downward and the name set is finite, so this
    // terminates; iteration count is the graph diameter.
    var labels = dict.select(col("name"), col("name").as("root"))
    var changed = true
    while (changed) {
      val viaEdges = edges.join(labels, col("name_b") === col("name"))
        .select(col("name_a").as("name"), col("root"))
        .union(edges.join(labels, col("name_a") === col("name"))
          .select(col("name_b").as("name"), col("root")))
        .union(labels)
        .groupBy("name").agg(min("root").as("new_root"))
      // Truncate lineage each round (the same discipline as the dedup
      // cluster propagation) so the fixpoint loop's plan stays flat.
      val next = viaEdges.withColumnRenamed("new_root", "root")
        .localCheckpoint(eager = true)
      changed = next.join(labels.withColumnRenamed("root", "old_root"), "name")
        .filter(col("root") =!= col("old_root")).limit(1).count() > 0
      labels = next
    }
    val canon = labels.join(dict, "name")
      .groupBy("root")
      .agg(max(struct(col("n"), col("name"))).getField("name").as("canonical"))
    labels.join(canon, "root").join(dict, "name")
      .select(col("name"), col("canonical"), col("n"))
      .orderBy("name")
  }

  val resolveEntitiesSql: String =
    s"""WITH RECURSIVE dict AS (SELECT p_name AS name, count(*) AS n,
            string_split(p_name, ' ')[-1] AS blk
          FROM part GROUP BY p_name),
        e AS (SELECT a.name AS na, b.name AS nb
              FROM dict a JOIN dict b ON a.blk = b.blk AND a.name < b.name
              WHERE levenshtein(a.name, b.name) BETWEEN 1 AND $MaxEditDist),
        edges AS (SELECT na, nb FROM e UNION ALL SELECT nb, na FROM e),
        walk(name, root) AS (
          SELECT name, name FROM dict
          UNION
          SELECT edges.na, walk.root FROM walk
          JOIN edges ON edges.nb = walk.name AND walk.root < edges.na),
        labels AS (SELECT name, min(root) AS root FROM walk GROUP BY name),
        canon AS (SELECT l.root,
            (max({'n': d.n, 'name': l.name})).name AS canonical
          FROM labels l JOIN dict d ON l.name = d.name GROUP BY l.root)
        SELECT l.name, c.canonical, d.n
        FROM labels l JOIN canon c ON l.root = c.root
        JOIN dict d ON l.name = d.name
        ORDER BY l.name"""
}
