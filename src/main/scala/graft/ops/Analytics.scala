package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytics breadth beyond the reference surface (SURVEY.md §7 M2):
  * full aggregate suite, rollup/cube/grouping-sets, outer/semi/anti joins,
  * set ops, top-k, frame-spec windows, JSON + array functions, time windows,
  * sessionization.
  *
  * Float determinism policy (oracle parity): any SUM/AVG over non-integral
  * doubles goes through DECIMAL(18,4) so the aggregate is exact and
  * order-independent — summation order differs between Spark partitions and
  * DuckDB, and double addition is not associative. Integral-valued doubles
  * (l_quantity) and COUNTs are exact in any order and stay native.
  */
object Analytics {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** TPC-H Q1-shaped pricing summary: multi-aggregate groupBy with partial
    * (map-side) aggregation; one exchange on the 6-value group key. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H-Q5-shaped 6-way join: revenue per nation for one region and one
    * order year — the canonical star-with-snowflake join-ordering workload.
    * Plan: region→nation→supplier fold into a broadcast chain (all
    * dims-scale), customer joins orders on custkey, lineitem joins on
    * (orderkey, suppkey + nation equality) — the fact table is filtered by
    * the broadcast dims BEFORE its aggregation shuffle, and the only big
    * exchanges are the orders⋈lineitem key shuffles. Revenue sums through
    * DECIMAL(18,4) (exact, order-independent) and casts to double at the
    * end — the q1_agg discipline. */
  def q5Shape(s: SparkSession, d: String): DataFrame = {
    val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, d)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy("n_name")
  }

  val q5ShapeSql: String =
    """SELECT n_name,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS revenue
       FROM region
       JOIN nation   ON n_regionkey = r_regionkey
       JOIN supplier ON s_nationkey = n_nationkey
       JOIN lineitem ON l_suppkey = s_suppkey
       JOIN orders   ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY n_name
       ORDER BY n_name"""

  /** ROLLUP hierarchy totals with explicit grouping_id disambiguation. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast(IntegerType).as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** CUBE over two dims. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("o_totalprice"))).cast(DoubleType).as("sum_price"),
        grouping_id().cast(IntegerType).as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** GROUPING SETS via spark.sql over temp views — mirrors the reference's
    * mixed DataFrame/SQL style (T:269-285). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
             COUNT(1) AS cnt, CAST(grouping_id() AS INT) AS gid
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
        GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, o_orderstatus ASC NULLS FIRST,
               o_orderpriority ASC NULLS FIRST""")
  }

  /** LEFT OUTER join preserving customers with zero orders; count(col) skips
    * nulls so empty customers report 0. */
  def joinLeftOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  /** LEFT SEMI join: customers having >= 1 order (EXISTS). */
  def joinSemi(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI join: customers with no orders (NOT EXISTS). */
  def joinAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  private def usersOf(s: SparkSession, d: String, et: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === et).select("user_id")

  /** UNION DISTINCT of two event cohorts. */
  def setUnion(s: SparkSession, d: String): DataFrame =
    usersOf(s, d, "click").union(usersOf(s, d, "purchase"))
      .distinct().orderBy("user_id")

  /** INTERSECT of two event cohorts. */
  def setIntersect(s: SparkSession, d: String): DataFrame =
    usersOf(s, d, "click").intersect(usersOf(s, d, "purchase"))
      .orderBy("user_id")

  /** EXCEPT: clickers who never purchased. */
  def setExcept(s: SparkSession, d: String): DataFrame =
    usersOf(s, d, "click").except(usersOf(s, d, "purchase"))
      .orderBy("user_id")

  /** FULL OUTER join: per-user click vs purchase activity, both sides
    * preserved (users with only one kind of event survive with a zero on
    * the other). Same shuffle shape as the inner join — hash exchanges on
    * the key; both inputs are pre-aggregated to user cardinality first so
    * the outer join never carries raw events. */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def cnt(t: String, out: String) = ev.filter(col("event_type") === t)
      .groupBy("user_id").agg(count(lit(1)).as(out))
    val c = cnt("click", "clicks")
    val p = cnt("purchase", "purchases")
    c.join(p, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("clicks"), lit(0L)).as("clicks"),
        coalesce(col("purchases"), lit(0L)).as("purchases"))
      .orderBy("user_id")
  }

  val joinFullSql: String =
    """WITH c AS (SELECT user_id, count(*) AS clicks FROM events
                  WHERE event_type = 'click' GROUP BY user_id),
        p AS (SELECT user_id, count(*) AS purchases FROM events
              WHERE event_type = 'purchase' GROUP BY user_id)
       SELECT coalesce(c.user_id, p.user_id) AS user_id,
              coalesce(clicks, 0) AS clicks,
              coalesce(purchases, 0) AS purchases
       FROM c FULL JOIN p ON c.user_id = p.user_id
       ORDER BY user_id"""

  /** EXCEPT ALL: multiset difference — each user's click rows minus one row
    * per purchase row (bag semantics, duplicates significant). Spark plans
    * this as an aggregate computing per-row multiplicities then a
    * generator — no join explosion. */
  def setExceptAll(s: SparkSession, d: String): DataFrame =
    usersOf(s, d, "click").exceptAll(usersOf(s, d, "purchase"))
      .orderBy("user_id")

  val setExceptAllSql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
       EXCEPT ALL
       SELECT user_id FROM events WHERE event_type = 'purchase'
       ORDER BY user_id"""

  /** INTERSECT ALL: multiset intersection (min of the two multiplicities). */
  def setIntersectAll(s: SparkSession, d: String): DataFrame =
    usersOf(s, d, "click").intersectAll(usersOf(s, d, "purchase"))
      .orderBy("user_id")

  val setIntersectAllSql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
       INTERSECT ALL
       SELECT user_id FROM events WHERE event_type = 'purchase'
       ORDER BY user_id"""

  /** Top-k by value with deterministic tie-break — TakeOrderedAndProject, not
    * a global sort: only k rows per partition survive to the driver merge. */
  def topK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** LAG over a per-user event sequence (frame-free analytic window). */
  def windowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select("event_id", "user_id", "value", "prev_value", "next_type")
      .orderBy("event_id")
  }

  /** Running total with an explicit ROWS frame. The corpus has DUPLICATE
    * (l_orderkey, l_linenumber) pairs, so the window order includes partkey,
    * quantity and price: any rows still tied are identical in the summed
    * column, making every prefix sum deterministic; running_qty joins the
    * final sort for a fully deterministic output order. */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .withColumn("running_qty", sum(col("l_quantity")).over(w))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "running_qty")
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "running_qty")
  }

  /** RANGE-frame window: per-user trailing-1-hour event count and value sum.
    * RANGE (unlike ROWS) bounds the frame by ORDER-key DISTANCE — all peers
    * at the same timestamp share one frame, so the result is deterministic
    * under ties without a tie-break column. The order key is epoch seconds
    * (numeric RANGE offsets are engine-portable; interval frames are not).
    * Same shuffle shape as any partitioned window: one exchange on
    * user_id, per-key sorted state, a sliding frame bounded by wall-clock
    * density rather than row count. */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"))
      .rangeBetween(-3600L, 0L)
    Tables.events(s, d)
      .withColumn("ts_s", expr("unix_micros(ts) div 1000000"))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .withColumn("trail_sum",
        sum(dec(col("value"))).over(w).cast(DoubleType))
      .select("event_id", "user_id", "ts_s", "trail_cnt", "trail_sum")
      .orderBy("user_id", "ts_s", "event_id")
  }

  val windowRangeFrameSql: String =
    """SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         count(*) OVER w AS trail_cnt,
         CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trail_sum
       FROM events
       WINDOW w AS (PARTITION BY user_id
                    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
       ORDER BY user_id, ts_s, event_id"""

  /** RANK / DENSE_RANK per nation (ties share rank — deterministic without a
    * tie-break because rank is order-stable under equal keys). */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
    Tables.customer(s, d)
      .withColumn("bal_rank", rank().over(w))
      .withColumn("bal_dense_rank", dense_rank().over(w))
      .select("c_custkey", "c_nationkey", "c_acctbal", "bal_rank", "bal_dense_rank")
      .orderBy("c_custkey")
  }

  /** FIRST_VALUE / LAST_VALUE over explicit frames: each user's first and
    * latest event value as of each row (running frame for last, full-frame
    * first). */
  def windowFirstLast(s: SparkSession, d: String): DataFrame = {
    val base = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"), col("value"),
        first(col("value")).over(run).as("first_value_so_far"),
        last(col("value")).over(run).as("latest_value"))
      .orderBy("event_id")
  }

  val windowFirstLastSql: String =
    """SELECT event_id, user_id, value,
       first_value(value) OVER w AS first_value_so_far,
       last_value(value) OVER w AS latest_value
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY event_id"""

  /** Conditional aggregation (FILTER / count_if shapes) in one pass. */
  def conditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        sum(when(col("event_type") === "purchase", dec(col("value")))
          .otherwise(lit(0).cast(DecimalType(18, 4))))
          .cast(DoubleType).as("purchase_value"),
        max(when(col("event_type") === "error", col("ts"))).as("last_error"))
      .orderBy("user_id")

  val conditionalAggSql: String =
    """SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS clicks,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(18,4))
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase_value,
       max(CASE WHEN event_type = 'error' THEN ts END) AS last_error
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** Date arithmetic suite: day diffs, additions, truncations — all integer
    * or timestamp-exact. */
  def dateArithmetic(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType))
          .as("days_to_2002"),
        date_add(col("o_orderdate").cast(DateType), 30).as("due_date"),
        date_trunc("month", col("o_orderdate")).as("order_month"),
        last_day(col("o_orderdate").cast(DateType)).as("month_end"))
      .orderBy("o_orderkey")

  val dateArithmeticSql: String =
    """SELECT o_orderkey,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
         AS days_to_2002,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
       FROM orders ORDER BY o_orderkey"""

  /** Distribution window functions: ntile / percent_rank / cume_dist — all
    * integer-ratio math (exact doubles, engine-portable). Total order via the
    * unique key keeps every value deterministic. */
  def windowDistribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .select(
        col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_custkey")
  }

  val windowDistributionSql: String =
    """SELECT c_custkey, c_nationkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
       ORDER BY c_custkey"""

  /** Deterministic per-group mode (most frequent value, ties to the smallest
    * value) — count + rank, no sketch. */
  def modeAgg(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_quantity"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
      .orderBy("l_returnflag")
  }

  val modeAggSql: String =
    """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
                  FROM lineitem GROUP BY 1, 2),
        r AS (SELECT l_returnflag, l_quantity, n,
                row_number() OVER (PARTITION BY l_returnflag
                  ORDER BY n DESC, l_quantity) AS rk
              FROM c)
       SELECT l_returnflag, l_quantity AS mode_qty, n
       FROM r WHERE rk = 1 ORDER BY l_returnflag"""

  /** JSON field extraction from events.props — codegen'd path expression, no
    * UDF. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .orderBy("event_id")

  /** Semi-structured extraction through Spark 4's VARIANT type: props is
    * parsed ONCE into the binary variant encoding, then every access is a
    * typed `variant_get` path lookup — the engine-native answer to
    * schema-on-read JSON at scale, vs [[jsonExtract]]'s per-access string
    * re-parse (get_json_object re-tokenizes the JSON text for every path
    * it serves; variant parses once and serves any number of typed reads
    * from the binary form). Both extraction styles stay whole-stage
    * codegen'd; the aggregate is the usual map-side-combined shuffle on a
    * 10-value key. */
  def variantExtract(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("graft_variant_events")
    s.sql("""
      SELECT variant_get(v, '$.k', 'bigint') % 10 AS k_mod,
             count(*) AS cnt,
             sum(variant_get(v, '$.k', 'bigint')) AS k_sum
      FROM (SELECT parse_json(props) AS v FROM graft_variant_events)
      GROUP BY 1 ORDER BY 1""")
  }

  val variantExtractSql: String =
    """SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod,
         count(*) AS cnt,
         CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum
       FROM events GROUP BY 1 ORDER BY 1"""

  /** Window-function breadth beyond the frame/rank suites: nth_value and
    * IGNORE NULLS first_value over a FULL partition frame — per user, the
    * second event type ever and the value of the first purchase (nulls from
    * non-purchase rows skipped by the window itself, not a pre-filter).
    * Both engines need the explicit ROWS UNBOUNDED..UNBOUNDED frame (the
    * ORDER BY default frame stops at CURRENT ROW, where nth_value(2) is
    * null on row 1 — a classic silent-wrong-answer). Money rides as cents.
    * Windows are user-partitioned; the distinct() collapses the per-row
    * window results to one row per user. */
  def windowNth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase",
          round(col("value") * 100, 0).cast(LongType)).as("purchase_cents"))
      .select(col("user_id"),
        nth_value(col("event_type"), 2).over(w).as("second_type"),
        first(col("purchase_cents"), ignoreNulls = true).over(w)
          .as("first_purchase_cents"))
      .distinct()
      .orderBy("user_id")
  }

  val windowNthSql: String =
    """SELECT DISTINCT user_id,
         nth_value(event_type, 2) OVER w AS second_type,
         first_value(CASE WHEN event_type = 'purchase'
             THEN CAST(round(value * 100, 0) AS BIGINT) END IGNORE NULLS)
           OVER w AS first_purchase_cents
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY user_id"""

  /** Case-insensitive grouping through Spark 4's COLLATION support: the
    * part-type dimension is deterministically case-mixed (even keys
    * uppercased), then re-unified by grouping on the UTF8_LCASE-collated
    * key — the engine-native answer to dirty categorical data, vs the
    * lower()-everything rewrite (which loses the original casing; here
    * min(t) — binary, NOT collated, so deterministic within a
    * case-insensitive group — reports a canonical spelling). The collated
    * group-by is still one map-side-combined hash aggregate; collation
    * changes the key's equality/hash functions, not the plan shape. */
  def collationGroup(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("graft_collate_part")
    s.sql("""
      WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE p_type END
                 AS t,
               p_retailprice
        FROM graft_collate_part)
      SELECT min(t) AS p_type, count(*) AS cnt,
             CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
      FROM mixed
      GROUP BY t COLLATE UTF8_LCASE
      ORDER BY p_type""")
  }

  /** ASCII-only domain, so lcase-collated equality == equality of lower(). */
  val collationGroupSql: String =
    """WITH mixed AS (
         SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE p_type END
                  AS t,
                p_retailprice
         FROM part)
       SELECT min(t) AS p_type, count(*) AS cnt,
         CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_price
       FROM mixed GROUP BY lower(t) ORDER BY p_type"""

  /** Scalar UDF surface via a SQL-body function (Spark 4 CREATE FUNCTION
    * ... RETURN expr): the margin formula registers as a named reusable
    * function, and — unlike a Scala/Python UDF black box — the body
    * INLINES into the Catalyst plan, so the pricing aggregate below stays
    * fully codegen'd, pushdown-eligible, and engine-portable (the oracle
    * runs the same arithmetic inline). This is the library's recommended
    * UDF tier before reaching for a compiled Expression. Determinism: the
    * per-row margin has at most 6 decimals (2 dp price x 2 dp rate x 2 dp
    * rate), so the declared DECIMAL(18,6) return type represents it
    * EXACTLY — a scale-4 return was measured to diverge from the oracle on
    * half-ties (Spark casts HALF_UP, DuckDB HALF_EVEN); only the final sum
    * casts to double. */
  def sqlUdf(s: SparkSession, d: String): DataFrame = {
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(
               p DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DECIMAL(18,6)
             RETURN CAST(p AS DECIMAL(18,4)) * CAST(1.0 - disc AS DECIMAL(5,2))
                    * CAST(1.0 + tax AS DECIMAL(5,2))""")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_udf_lineitem")
    s.sql("""
      SELECT l_returnflag,
             count(*) AS cnt,
             CAST(sum(graft_margin(l_extendedprice, l_discount, l_tax))
                  AS DOUBLE) AS net_revenue
      FROM graft_udf_lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** The inner CAST to DECIMAL(18,6) mirrors the FUNCTION's declared
    * return type; it is exact (the product has at most 6 decimals), so
    * both engines agree bit-for-bit. */
  val sqlUdfSql: String =
    """SELECT l_returnflag, count(*) AS cnt,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                  * CAST(1.0 - l_discount AS DECIMAL(5,2))
                  * CAST(1.0 + l_tax AS DECIMAL(5,2)) AS DECIMAL(18,6)))
              AS DOUBLE) AS net_revenue
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Array functions over the embeddings table (array<float> native column). */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        element_at(col("embedding"), 64).as("last_val"),
        col("label"))
      .orderBy("vec_id")

  /** String function suite (P-extensions): upper/substr/length/replace/LIKE. */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_brand"), "#", "-").as("brand_dash"),
        col("p_type").like("%ECO%").as("is_economy"))
      .orderBy("p_partkey")

  /** CASE WHEN bucketing + math suite (sqrt is IEEE-correctly-rounded, so it
    * matches across engines; no libm-dependent fns in oracle-checked paths). */
  def caseMath(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 200000, "large")
          .when(col("o_totalprice") >= 100000, "medium")
          .otherwise("small").as("bucket"),
        round(col("o_totalprice"), 0).as("price_rounded"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice")).as("price_ceil"),
        abs(col("o_totalprice") - 150000.0).as("dist_150k"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        (col("o_orderkey") % 10).as("key_mod"))
      .orderBy("o_orderkey")

  /** GROUP BY ... HAVING. */
  def havingAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 15)
      .orderBy("o_custkey")

  /** Correlated-subquery shape: customers above their nation's average
    * balance. Expressed as a window (one exchange on nationkey) — the
    * correlated scalar subquery would rescan per-group; the window computes
    * all group averages in a single pass. Decimal-sum avg for oracle parity. */
  def aboveAvgCustomers(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    Tables.customer(s, d)
      .withColumn("nation_avg",
        (sum(col("c_acctbal").cast(DecimalType(18, 2))).over(w).cast(DoubleType)
          / count(lit(1)).over(w)))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Tumbling event-time window (batch analog of a streaming window; SURVEY
    * §2.9). Epoch-aligned 1h windows == date_trunc('hour'). */
  def tumblingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("win_start"), col("cnt"), col("sum_value"))
      .orderBy("win_start")

  /** Sliding event-time window (2h width, 1h slide): every event lands in
    * two windows; Spark's window() generator expands them, the oracle mirrors
    * with a two-branch UNION ALL of shifted truncations. */
  def slidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("win_start"), col("cnt"), col("sum_value"))
      .orderBy("win_start")

  val slidingWindowSql: String =
    """WITH w AS (
         SELECT date_trunc('hour', ts) AS win_start, value FROM events
         UNION ALL
         SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, value FROM events)
       SELECT win_start, count(*) AS cnt,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       FROM w GROUP BY 1 ORDER BY win_start"""

  /** Minimum co-occurrence count for a part pair to appear in the
    * market-basket report — drops the pair_n = 1 noise floor (112k of 116k
    * candidate pairs at sf0.01) before the ratio joins. */
  val MinPairSupport = 2L

  /** Market-basket association mining over order line items: the top pairs
    * of parts bought together, with the three classic association-rule
    * measures — support (pair frequency over all orders), confidence
    * (P(b | a), directional), and lift (observed co-rate over the
    * independence expectation). Counts are integer-exact; ratios are
    * IEEE-double divisions of those integers rounded at 6 dp.
    *
    * Scale shape: pair generation is ONE self equi-join of the distinct
    * (order, part) incidence list on the order key — the per-key quadratic
    * is bounded by basket size (≤ 13 parts per order in this corpus, ≤ 7 in
    * TPC-H proper; a retail schema bounds it by the cart), so the join
    * output is O(rows × basket), never all-pairs in the part dimension. The
    * part-frequency table used for confidence/lift is part-arity (dimension
    * scale, ≪ facts) and broadcasts onto the pair counts; the order total is
    * a 1-row broadcast. Pairs below [[MinPairSupport]] are dropped BEFORE
    * the ratio joins, and the final top-100 is a TakeOrdered, not a global
    * sort. */
  def basketPairs(s: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    val nOrders = items.select(countDistinct("okey").as("n_orders"))
    val partCounts = items.groupBy("part").agg(count(lit(1)).as("n_part"))
    val pairs = items.toDF("okey", "part_a")
      .join(items.toDF("okey", "part_b"), "okey")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= MinPairSupport)
    pairs
      .join(broadcast(partCounts.toDF("part_a", "n_a")), "part_a")
      .join(broadcast(partCounts.toDF("part_b", "n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("pair_n"),
        round(col("pair_n").cast(DoubleType) / col("n_orders"), 6)
          .as("support"),
        round(col("pair_n").cast(DoubleType) / col("n_a"), 6)
          .as("conf_a_to_b"),
        round(col("pair_n").cast(DoubleType) * col("n_orders")
          / (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("pair_n").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  val basketPairsSql: String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
                       FROM lineitem),
        n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
        ic AS (SELECT part, count(*) AS n_part FROM items GROUP BY part),
        pc AS (SELECT a.part AS part_a, b.part AS part_b,
                 count(*) AS pair_n
               FROM items a JOIN items b
                 ON a.okey = b.okey AND a.part < b.part
               GROUP BY 1, 2)
        SELECT part_a, part_b, pair_n,
          round(CAST(pair_n AS DOUBLE) / n_orders, 6) AS support,
          round(CAST(pair_n AS DOUBLE) / ia.n_part, 6) AS conf_a_to_b,
          round(CAST(pair_n AS DOUBLE) * n_orders
                / (ia.n_part * ib.n_part), 6) AS lift
        FROM pc
        JOIN ic ia ON pc.part_a = ia.part
        JOIN ic ib ON pc.part_b = ib.part
        CROSS JOIN n
        WHERE pair_n >= ${MinPairSupport}
        ORDER BY pair_n DESC, part_a, part_b LIMIT 100"""

  /** Sessionization (30-min inactivity gap) via gaps-and-islands: lag to mark
    * session starts, running sum to assign session ids, then per-session agg.
    * Same shape Structured Streaming's session window computes incrementally. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > 30L * 60 * 1000, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy("user_id", "sess_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"))
      .orderBy("user_id", "sess_id")
  }

  /** Full aggregate suite: min/max/avg/sum/count(distinct) in one pass. */
  def aggSuite(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        countDistinct(col("l_partkey")).as("n_parts"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy("l_returnflag")

  /** Per-partition materialization audit of the last [[scalableRowNumber]]
    * call: (accumulator, partition count). The accumulator bumps once per
    * PARTITION each time the post-shuffle sorted data is computed, so
    * value == partition count proves the sort ran exactly once (cache hits
    * on the persisted RDD don't re-run it). SingleScanSpec gates this.
    * Thread-local so concurrent queries (parallel specs, multi-threaded
    * bench) each observe their own call's audit, not the last writer's. */
  private[graft] val numberingAudit =
    new ThreadLocal[(org.apache.spark.util.LongAccumulator, Int)]

  /** Scalable deterministic global row-number: per-partition counts + offsets
    * instead of a single-partition window — the 100 TB answer to the
    * reference's W2 (T:294-298). Range-partitions by the order key so
    * partition index order == key order; with a unique key the assigned ids
    * equal rank(key) regardless of partitioning, so the result is
    * deterministic and oracle-comparable. This IS the numbering path of the
    * flagship factSongplays (oracle-gated against the window formulation);
    * the extra counts pass collects one int per partition.
    *
    * The sorted RDD is persisted (MEMORY_AND_DISK) across the counts and
    * numbering passes: shuffle-file reuse already makes the upstream
    * scan/join execute once, but without the persist the post-shuffle
    * sort-within-partitions would run in BOTH passes — a second full sort
    * of the fact table at scale. The ContextCleaner unpersists the RDD once
    * the returned frame is released. */
  def scalableRowNumber(df: DataFrame, orderCol: String): DataFrame = {
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    val schema = sorted.schema.add(StructField("num", LongType, nullable = false))
    val acc = spark.sparkContext.longAccumulator("graft.rowNumber.sortMaterializations")
    val base = graft.TrackedCaches.trackRdd(
      sorted.rdd.mapPartitions { it => acc.add(1); it }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    numberingAudit.set((acc, base.getNumPartitions))
    val counts = base.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size))
    }.collect().sortBy(_._1)
    val offsets = counts.map(_._2.toLong).scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = base.mapPartitionsWithIndex { case (i, it) =>
      var n = bc.value(i)
      it.map { r => n += 1; Row.fromSeq(r.toSeq :+ n) }
    }
    spark.createDataFrame(out, schema)
  }

  /** Scalable global running sum of `weightCol` in `orderCols` order — the
    * weighted sibling of [[scalableRowNumber]] (an unpartitioned
    * sum-over-window would funnel everything through one task). Same shape:
    * range-partition on the order columns, one persisted sort, a counts
    * pass collecting ONE partial sum per partition, then per-partition
    * running sums seeded by the broadcast offsets. `orderCols` must be a
    * total order (add a tiebreak column) and `weightCol` must be LongType. */
  def scalableCumSum(df: DataFrame, orderCols: Seq[String], weightCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    val sorted = df.repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(StructField(outCol, LongType, nullable = false))
    val wIdx = sorted.schema.fieldIndex(weightCol)
    val base = graft.TrackedCaches.trackRdd(sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val partial = base.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.map(_.getLong(wIdx)).sum))
    }.collect().sortBy(_._1)
    val offsets = partial.map(_._2).scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = base.mapPartitionsWithIndex { case (i, it) =>
      var acc = bc.value(i)
      it.map { r => acc += r.getLong(wIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(out, schema)
  }
}
