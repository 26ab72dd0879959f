package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline data-quality operators: constraint auditing and SCD-2 dimension
  * maintenance — the ETL-surface a production ingest (like the reference's
  * star-schema build) runs before/while publishing tables.
  */
object Quality {

  /** Data-quality audit across the star schema: per-check violation counts
    * (referential integrity, domain ranges, duplicates). One row per check —
    * the shape a pipeline gate consumes.
    *
    * Built as ONE lazy plan (a union of aggregate branches), not N driver
    * actions: the three row-local lineitem checks fuse into a single
    * conditional-aggregate scan (then stack() unpivots), the duplicate check
    * is one groupBy branch, and the referential checks stay as anti-join
    * count branches. At 100 TB this is the difference between one pass per
    * table and seven full-table jobs. */
  def dqReport(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)

    // All three row-local lineitem checks in a single scan; count(when(...))
    // is null-skipping so each column is an independent violation count.
    val liChecks = li.agg(
        count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))
          .as("domain_discount_out_of_range"),
        count(when(col("l_quantity") <= 0, 1))
          .as("domain_quantity_nonpositive"),
        count(when(col("l_orderkey").isNull || col("l_partkey").isNull, 1))
          .as("null_lineitem_keys"))
      .select(expr(
        """stack(3,
             'domain_discount_out_of_range', domain_discount_out_of_range,
             'domain_quantity_nonpositive', domain_quantity_nonpositive,
             'null_lineitem_keys', null_lineitem_keys)
           AS (check_name, violations)"""))

    def countBranch(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))

    val fkLineitem = countBranch("fk_lineitem_orders_orphans",
      li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti"))
    val fkOrders = countBranch("fk_orders_customer_orphans",
      o.join(c, o("o_custkey") === c("c_custkey"), "left_anti"))
    val fkCustomers = countBranch("fk_customer_nation_orphans",
      c.join(n, c("c_nationkey") === n("n_nationkey"), "left_anti"))
    val dupOrders = countBranch("unique_orderkey_duplicates",
      o.groupBy("o_orderkey").agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1))

    liChecks
      .unionByName(fkLineitem)
      .unionByName(fkOrders)
      .unionByName(fkCustomers)
      .unionByName(dupOrders)
      .orderBy("check_name")
  }

  val dqReportSql: String =
    """SELECT * FROM (
         SELECT 'fk_lineitem_orders_orphans' AS check_name, count(*) AS violations
         FROM lineitem WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
         UNION ALL
         SELECT 'fk_orders_customer_orphans', count(*)
         FROM orders WHERE NOT EXISTS
           (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
         UNION ALL
         SELECT 'fk_customer_nation_orphans', count(*)
         FROM customer WHERE NOT EXISTS
           (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
         UNION ALL
         SELECT 'domain_discount_out_of_range', count(*)
         FROM lineitem WHERE l_discount < 0 OR l_discount > 1
         UNION ALL
         SELECT 'domain_quantity_nonpositive', count(*)
         FROM lineitem WHERE l_quantity <= 0
         UNION ALL
         SELECT 'unique_orderkey_duplicates', count(*)
         FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
         UNION ALL
         SELECT 'null_lineitem_keys', count(*)
         FROM lineitem WHERE l_orderkey IS NULL OR l_partkey IS NULL)
       ORDER BY check_name"""

  /** DQ detection variant: inject a deterministic corruption set (negative
    * quantities on every 997th lineitem row, orphaned order keys on every
    * 991st) and prove the checks actually fire — the audit must count
    * exactly the injected rows. */
  def dqDetect(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 997 === 0, -col("l_quantity"))
          .otherwise(col("l_quantity")))
      .withColumn("l_orderkey",
        when(col("l_orderkey") % 991 === 0, -col("l_orderkey") - 1000000000L)
          .otherwise(col("l_orderkey")))
    val o = Tables.orders(s, d)
    // Same single-lazy-plan shape as dqReport: union of count branches,
    // zero driver-side actions.
    val badQty = li.filter(col("l_quantity") < 0)
      .agg(count(lit(1)).as("violations"))
      .select(lit("injected_negative_qty").as("check_name"), col("violations"))
    val orphans = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("injected_fk_orphans").as("check_name"), col("violations"))
    badQty.unionByName(orphans).orderBy("check_name")
  }

  val dqDetectSql: String =
    """WITH li AS (
         SELECT CASE WHEN l_orderkey % 997 = 0 THEN -l_quantity
                     ELSE l_quantity END AS l_quantity,
                CASE WHEN l_orderkey % 991 = 0 THEN -l_orderkey - 1000000000
                     ELSE l_orderkey END AS l_orderkey
         FROM lineitem)
       SELECT * FROM (
         SELECT 'injected_fk_orphans' AS check_name, count(*) AS violations
         FROM li WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_orderkey = li.l_orderkey)
         UNION ALL
         SELECT 'injected_negative_qty', count(*)
         FROM li WHERE l_quantity < 0)
       ORDER BY check_name"""

  /** SCD Type-2 dimension build: apply a deterministic change-set to the
    * customer dim, emitting versioned rows (old version closed, new version
    * current). The change-set is derived from the data itself (customers
    * whose balance exceeds a threshold "move" to segment PREMIUM) so the
    * oracle can reproduce it exactly. Shape: union of (unchanged current),
    * (closed old), (opened new) — the standard merge-free SCD-2 formulation,
    * one broadcast-joinable change-set against the dim. */
  def scd2Build(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val changed = c.filter(col("c_acctbal") > 9000)
    val unchanged = c.filter(col("c_acctbal") <= 9000)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        lit(1).as("version"), lit(true).as("is_current"))
    val closedOld = changed
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        lit(1).as("version"), lit(false).as("is_current"))
    val openedNew = changed
      .select(col("c_custkey"), col("c_name"), lit("PREMIUM").as("c_mktsegment"),
        lit(2).as("version"), lit(true).as("is_current"))
    unchanged.unionByName(closedOld).unionByName(openedNew)
      .orderBy("c_custkey", "version")
  }

  val scd2BuildSql: String =
    """SELECT c_custkey, c_name, c_mktsegment, 1 AS version,
              true AS is_current
       FROM customer WHERE c_acctbal <= 9000
       UNION ALL
       SELECT c_custkey, c_name, c_mktsegment, 1, false
       FROM customer WHERE c_acctbal > 9000
       UNION ALL
       SELECT c_custkey, c_name, 'PREMIUM', 2, true
       FROM customer WHERE c_acctbal > 9000
       ORDER BY c_custkey, version"""

  /** MERGE INTO / CDC-apply: a deterministic change batch (updates for
    * custkey % 10 == 0, deletes for % 10 == 1, inserts above the current
    * max key) applied to the customer base table in ONE full-outer join —
    * matched+U rewrites the row, matched+D drops it, unmatched-source
    * inserts, unmatched-base passes through. This is the upsert kernel
    * under every lakehouse MERGE: at 100 TB both sides shuffle on the merge
    * key once (or zero times if the base is bucketed on it), and the change
    * batch is typically small enough that AQE flips the join to broadcast.
    * Oracle: the same three-way CASE as portable SQL. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    // Balances as integer cents throughout (the varianceAgg discipline):
    // double round() tie-breaking is engine-specific; integer +/div is not.
    val base = Tables.customer(s, d)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100, 0).cast(LongType).as("cents"))
    val changes = base
      .filter(col("c_custkey") % 10 <= 1)
      .select(col("c_custkey").as("k"),
        when(col("c_custkey") % 10 === 0, "U").otherwise("D").as("op"),
        (col("cents") + 10000L).as("new_cents"))
      .unionByName(base.filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 3000000L).as("k"), lit("I").as("op"),
          expr("cents div 2").as("new_cents")))
    base.join(changes, col("c_custkey") === col("k"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(
        coalesce(col("c_custkey"), col("k")).as("custkey"),
        when(col("op") === "U" || col("op") === "I", col("new_cents"))
          .otherwise(col("cents")).as("acctbal_cents"),
        coalesce(col("op"), lit("=")).as("applied_op"))
      .orderBy("custkey")
  }

  val mergeUpsertSql: String =
    """WITH base AS (
         SELECT c_custkey,
                CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
         FROM customer),
       changes AS (
         SELECT c_custkey AS k,
                CASE WHEN c_custkey % 10 = 0 THEN 'U' ELSE 'D' END AS op,
                cents + 10000 AS new_cents
         FROM base WHERE c_custkey % 10 <= 1
         UNION ALL
         SELECT c_custkey + 3000000, 'I', cents // 2
         FROM base WHERE c_custkey % 97 = 0)
       SELECT coalesce(c_custkey, k) AS custkey,
              CASE WHEN op IN ('U', 'I') THEN new_cents ELSE cents END
                AS acctbal_cents,
              coalesce(op, '=') AS applied_op
       FROM base FULL JOIN changes ON c_custkey = k
       WHERE coalesce(op, '') <> 'D'
       ORDER BY custkey"""

  /** Key-skew diagnostic — what a data engineer runs BEFORE picking a join
    * strategy or salt factor: per-key group sizes of the fact table's join
    * key, reduced to the decision numbers (hottest-key share, top-10
    * share, and the salt factor that levels the hottest key to average
    * load). One shuffle for the key histogram; the top-10 is a
    * TakeOrdered, never a global sort; everything else is scalar. The
    * recommended salt is what [[graft.ops.Advanced.saltedJoin]] consumes. */
  def skewReport(s: SparkSession, d: String): DataFrame = {
    val sizes = graft.TrackedCaches.track(
      Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("sz")).cache())
    val top10 = sizes.orderBy(col("sz").desc, col("user_id")).limit(10)
      .agg(sum("sz").as("top10_rows"))
    sizes.agg(count(lit(1)).as("n_keys"), sum("sz").as("total_rows"),
        max("sz").as("max_sz"))
      .crossJoin(broadcast(top10))
      .select(col("n_keys"), col("total_rows"), col("max_sz"),
        (col("total_rows").cast(DoubleType) / col("n_keys")).as("avg_sz"),
        (col("max_sz").cast(DoubleType) / col("total_rows")).as("top1_share"),
        (col("top10_rows").cast(DoubleType) / col("total_rows"))
          .as("top10_share"),
        ceil(col("max_sz") * col("n_keys") / col("total_rows"))
          .cast(LongType).as("rec_salt"))
  }

  val skewReportSql: String =
    """WITH sz AS (SELECT user_id, count(*) AS sz FROM events GROUP BY user_id),
       t10 AS (SELECT CAST(sum(sz) AS BIGINT) AS top10_rows FROM (
                 SELECT sz FROM sz ORDER BY sz DESC, user_id LIMIT 10)),
       a AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(sz) AS BIGINT) AS total_rows,
               CAST(max(sz) AS BIGINT) AS max_sz
             FROM sz)
       SELECT n_keys, total_rows, max_sz,
         CAST(total_rows AS DOUBLE) / n_keys AS avg_sz,
         CAST(max_sz AS DOUBLE) / total_rows AS top1_share,
         CAST(top10_rows AS DOUBLE) / total_rows AS top10_share,
         CAST(ceil(max_sz * n_keys / total_rows) AS BIGINT) AS rec_salt
       FROM a, t10"""

  /** Snapshot diff — the table-versioning primitive (lakehouse time-travel
    * diff / CDC backfill audit): given version v1 (the events table) and v2
    * (v1 with a deterministic synthetic edit set: deletes where
    * event_id % 97 = 0, value updates where % 89 = 0, inserts cloned at
    * +10M ids where % 101 = 0), emit every changed key with its change
    * type and the before/after values in cents.
    *
    * Scale shape: ONE full-outer equi-join on the key — the canonical diff;
    * unchanged rows are filtered AFTER the join by an integer comparison,
    * so the output is change-sized. At 100 TB both sides bucket on the key
    * and the join co-locates without a shuffle. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val v1 = Tables.events(s, d)
      .select(col("event_id"),
        round(col("value") * 100, 0).cast(LongType).as("cents"))
    val v2 = v1.filter(col("event_id") % 97 =!= 0)
      .select(col("event_id"),
        when(col("event_id") % 89 === 0, col("cents") + 100)
          .otherwise(col("cents")).as("cents"))
      .union(v1.filter(col("event_id") % 101 === 0)
        .select((col("event_id") + 10000000L).as("event_id"), col("cents")))
    v1.select(col("event_id"), col("cents").as("old_cents"))
      .join(v2.select(col("event_id"), col("cents").as("new_cents")),
        Seq("event_id"), "full_outer")
      .withColumn("change_type",
        when(col("new_cents").isNull, "D")
          .when(col("old_cents").isNull, "I")
          .when(col("old_cents") =!= col("new_cents"), "U"))
      .filter(col("change_type").isNotNull)
      .select(col("event_id"), col("change_type"),
        coalesce(col("old_cents"), lit(-1L)).as("old_cents"),
        coalesce(col("new_cents"), lit(-1L)).as("new_cents"))
      .orderBy("event_id")
  }

  val snapshotDiffSql: String =
    """WITH v1 AS (SELECT event_id,
           CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       v2 AS (SELECT event_id,
           CASE WHEN event_id % 89 = 0 THEN cents + 100 ELSE cents END AS cents
         FROM v1 WHERE event_id % 97 <> 0
         UNION ALL
         SELECT event_id + 10000000, cents FROM v1 WHERE event_id % 101 = 0),
       j AS (SELECT coalesce(v1.event_id, v2.event_id) AS event_id,
           v1.cents AS old_cents, v2.cents AS new_cents
         FROM v1 FULL OUTER JOIN v2 ON v1.event_id = v2.event_id)
       SELECT event_id,
         CASE WHEN new_cents IS NULL THEN 'D'
              WHEN old_cents IS NULL THEN 'I'
              ELSE 'U' END AS change_type,
         coalesce(old_cents, -1) AS old_cents,
         coalesce(new_cents, -1) AS new_cents
       FROM j
       WHERE new_cents IS NULL OR old_cents IS NULL OR old_cents <> new_cents
       ORDER BY event_id"""

  /** The incremental-refresh horizon: orders strictly before this date are
    * the standing materialized view; the rest are the delta batch a daily
    * refresh would ingest (3 674 of 15 000 orders at sf0.01 — both sides
    * load-bearing). */
  val IncrCutoff = "2000-01-01"

  /** Incremental materialized-view maintenance: a per-customer order summary
    * (order count, lifetime cents, last order date) kept fresh by MERGING a
    * delta-batch aggregate into the standing aggregate instead of rescanning
    * the fact table. All three measures are algebraic under insert-only
    * deltas — count and sum combine by +, max by greatest — so
    * agg(base) ⊕ agg(delta) ≡ agg(base ∪ delta), which is exactly what the
    * full-recompute oracle checks.
    *
    * Scale shape: this is THE pattern that keeps a 100 TB fact table's
    * dashboards incremental — the standing MV is customer-arity (dimension
    * scale), the refresh scans only the delta's date partition (here a
    * partition filter on o_orderdate; on a date-partitioned lake the scan
    * prunes to one day), and the merge is one customer-keyed full-outer join
    * of two dimension-arity aggregates. Nothing touches the historical fact
    * partitions. */
  def incrAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey"),
      round(col("o_totalprice") * 100, 0).cast(LongType).as("cents"),
      col("o_orderdate"))
    def mv(df: DataFrame): DataFrame =
      df.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum("cents").as("total_cents"),
        max("o_orderdate").as("last_order"))
    val base = mv(o.filter(col("o_orderdate") < lit(IncrCutoff).cast("timestamp")))
    val delta = mv(o.filter(col("o_orderdate") >= lit(IncrCutoff).cast("timestamp")))
    base.toDF("o_custkey", "b_n", "b_cents", "b_last")
      .join(delta.toDF("o_custkey", "d_n", "d_cents", "d_last"),
        Seq("o_custkey"), "full_outer")
      .select(
        col("o_custkey").as("custkey"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("b_cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
          .as("total_cents"),
        greatest(col("b_last"), col("d_last")).as("last_order"))
      .orderBy("custkey")
  }

  /** The oracle is the FULL RECOMPUTE over the unioned fact table — equality
    * is the correctness statement of incremental maintenance. */
  val incrAggSql: String =
    """SELECT o_custkey AS custkey, count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents,
         max(o_orderdate) AS last_order
       FROM orders GROUP BY 1 ORDER BY custkey"""
}
