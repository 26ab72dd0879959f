package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.Tables

/** Product/event analytics over the `events` stream table — the funnel /
  * cohort / sequence / time-series operators a clickstream warehouse runs
  * daily. The reference's pipeline stops at the star-schema fact build
  * (reference transform-data.py:229-266); these are the downstream consumers
  * of that fact table, expressed Spark-first.
  *
  * Scale notes common to the family: every aggregate is keyed by `user_id`
  * (or a small derived dimension), so each stage is one map-side-combined
  * shuffle on the user key; window functions are always PARTITIONED BY
  * user_id (never a global single-partition window), so WindowExec
  * parallelism is user-cardinality wide. At 100 TB the user dimension is
  * orders of magnitude smaller than the event stream, which keeps every
  * per-user aggregate broadcastable back onto the stream when needed.
  */
object EventAnalytics {

  /** Ordered conversion funnel signup -> view -> click -> purchase: a user
    * counts for step k only with an event of step k's type STRICTLY AFTER
    * their step-(k-1) qualifying time (min-after chaining, the standard
    * funnel semantics — an out-of-order click before signup does not
    * convert). Output: one row per step with the surviving-user count and
    * the conversion rate vs step 1.
    *
    * Scale shape: each step is filter -> per-user min -> equi-join on
    * user_id with the (already user-aggregated, hence small) previous step.
    * The per-step aggregate shrinks monotonically, so joins 2..k are
    * broadcast-sized long before 100 TB of raw events matter. */
  def eventFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val stepDfs = funnelTimes(ev)
    val counts = stepDfs.zip(FunnelSteps).zipWithIndex.map {
      case ((df, tpe), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step_idx"), lit(tpe).as("step"), col("n_users"))
    }.reduce(_.union(_))
    val base = counts.filter(col("step_idx") === 1)
      .select(col("n_users").as("base_users"))
    counts.crossJoin(broadcast(base))
      .select(col("step_idx"), col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("base_users"), 4)
          .as("conv_pct"))
      .orderBy("step_idx")
  }

  /** Funnel step order — strict event-type chain over the corpus's five
    * types (signup precedes engagement which precedes purchase). */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** The funnel's per-step qualifying-time chain: one (user_id, t) frame
    * per step, each built from the previous step's aggregate by min-after
    * chaining. Shared by [[eventFunnel]] and [[funnelLatency]]. */
  private def funnelTimes(ev: DataFrame): Seq[DataFrame] = {
    def firstOf(tpe: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .groupBy("user_id").agg(min("ts").as("t"))
    def nextAfter(prev: DataFrame, tpe: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .join(prev.select(col("user_id"), col("t").as("t_prev")), "user_id")
        .filter(col("ts") > col("t_prev"))
        .groupBy("user_id").agg(min("ts").as("t"))
    FunnelSteps.tail.scanLeft(firstOf(FunnelSteps.head))(nextAfter)
  }

  /** Median time-to-convert between consecutive funnel steps: for each
    * adjacent step pair, the EXACT median gap (doubled-middle-sum over
    * integer micros — the [[anomalyMad]] order-stat discipline) across the
    * users who reached the later step, reported in seconds. The product
    * question behind every funnel chart: where do users stall, and for how
    * long.
    *
    * Scale shape: the step chain is [[funnelTimes]] (shrinking user-keyed
    * aggregates); each pair's median runs order-stat windows PARTITIONED BY
    * the pair label over user-count rows — pair cardinality is the
    * parallelism floor, but the input is the (tiny) converted-user set, not
    * the event stream. */
  def funnelLatency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val steps = funnelTimes(ev)
    val gaps = steps.zip(steps.tail).zip(
      FunnelSteps.zip(FunnelSteps.tail)).map { case ((a, b), (na, nb)) =>
        a.select(col("user_id"), col("t").as("ta"))
          .join(b.select(col("user_id"), col("t").as("tb")), "user_id")
          .select(lit(s"$na->$nb").as("pair"), col("user_id"),
            (unix_micros(col("tb")) - unix_micros(col("ta"))).as("gap_us"))
      }.reduce(_.union(_))
    val w = Window.partitionBy("pair").orderBy("gap_us", "user_id")
    val n = Window.partitionBy("pair")
    gaps.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(n))
      .groupBy("pair")
      .agg(count(lit(1)).as("n_users"),
        sum(
          when(col("rn") === expr("(cnt + 1) div 2"), col("gap_us")).otherwise(0L) +
          when(col("rn") === expr("cnt div 2 + 1"), col("gap_us")).otherwise(0L))
          .as("med2_us"))
      .select(col("pair"), col("n_users"),
        (col("med2_us") / 2000000.0).as("median_s"))
      .orderBy("pair")
  }

  val funnelLatencySql: String = {
    val pairs = FunnelSteps.zip(FunnelSteps.tail).zipWithIndex
    val stepCtes = FunnelSteps.zipWithIndex.map { case (tpe, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id, min(ts) AS t FROM events
                   WHERE event_type = '$tpe' GROUP BY user_id)"""
      else
        s"""s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                 JOIN s$i ON e.user_id = s$i.user_id AND e.ts > s$i.t
                 WHERE e.event_type = '$tpe' GROUP BY e.user_id)"""
    }.mkString(",\n        ")
    val gapSel = pairs.map { case ((na, nb), i) =>
      s"""SELECT '$na->$nb' AS pair, a.user_id,
          epoch_us(b.t) - epoch_us(a.t) AS gap_us
          FROM s${i + 1} a JOIN s${i + 2} b ON a.user_id = b.user_id"""
    }.mkString("\n          UNION ALL ")
    s"""WITH $stepCtes,
        gaps AS ($gapSel),
        r AS (SELECT pair, gap_us,
            row_number() OVER (PARTITION BY pair ORDER BY gap_us, user_id) AS rn,
            count(*) OVER (PARTITION BY pair) AS cnt
          FROM gaps)
        SELECT pair, count(*) AS n_users,
          CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN gap_us ELSE 0 END
            + CASE WHEN rn = cnt // 2 + 1 THEN gap_us ELSE 0 END) AS BIGINT)
            / 2000000.0 AS median_s
        FROM r GROUP BY pair ORDER BY pair"""
  }

  /** Channel encoding for [[lastTouchAttribution]]: small ids packed into
    * the LastBefore value's low bits (value = ts_us * 8 + id). */
  val TouchChannels: Seq[(String, Int)] =
    Seq("click" -> 1, "view" -> 2, "signup" -> 3, "error" -> 4)

  /** Last-touch revenue attribution through the library's [[graft.plans
    * .LastBefore]] CUSTOM PHYSICAL OPERATOR (O(1)-state forward merge-scan
    * — no WindowExec row-group buffering): each purchase credits the last
    * strictly-preceding non-purchase event by the same user; purchases
    * with no preceding touch credit the 'none' channel. The packed value
    * (ts_us * 8 + channel_id) rides the operator's single value slot and
    * decodes with one modulus.
    *
    * Scale shape: one exchange+sort on (user, time) driven by the
    * operator's requiredChildDistribution, then a channel-arity rollup. */
  def lastTouchAttribution(s: SparkSession, d: String): DataFrame = {
    val chCase = TouchChannels.foldRight(lit(null).cast(LongType): Column) {
      case ((tpe, id), rest) =>
        when(col("event_type") === tpe, lit(id.toLong)).otherwise(rest)
    }
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("ch", chCase)
      .withColumn("is_touch", col("event_type") =!= "purchase")
      .withColumn("packed", col("ts_us") * 8 + coalesce(col("ch"), lit(0L)))
    val attributed = graft.plans.LastBefore.lastBefore(ev,
        keyNames = Seq("user_id"), orderNames = Seq("ts_us", "event_id"),
        condCol = "is_touch", valueCol = "packed", outName = "last_touch")
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        TouchChannels.foldRight(lit("none"): Column) { case ((tpe, id), rest) =>
          when(col("last_touch") % 8 === id, tpe).otherwise(rest)
        })
    attributed.groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 100, 0).cast(LongType)).as("cents"))
      .orderBy("channel")
  }

  val lastTouchAttributionSql: String = {
    val chCase = TouchChannels.map { case (tpe, id) =>
      s"WHEN event_type = '$tpe' THEN CAST($id AS BIGINT)"
    }.mkString(" ")
    val decode = TouchChannels.map { case (tpe, id) =>
      s"WHEN last_touch % 8 = $id THEN '$tpe'"
    }.mkString(" ")
    s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
            epoch_us(ts) AS ts_us,
            CASE $chCase ELSE NULL END AS ch
          FROM events),
        m AS (SELECT event_id, user_id, event_type, value,
            last_value(CASE WHEN event_type <> 'purchase'
                THEN ts_us * 8 + coalesce(ch, 0) END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS last_touch
          FROM ev),
        p AS (SELECT CASE $decode ELSE 'none' END AS channel, value
              FROM m WHERE event_type = 'purchase')
        SELECT channel, count(*) AS n_purchases,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM p GROUP BY channel ORDER BY channel"""
  }

  val eventFunnelSql: String = {
    val Seq(t1, t2, t3, t4) = FunnelSteps
    s"""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = '$t1' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
               WHERE e.event_type = '$t2' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
               WHERE e.event_type = '$t3' GROUP BY e.user_id),
        s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
               WHERE e.event_type = '$t4' GROUP BY e.user_id),
        c AS (SELECT 1 AS step_idx, '$t1' AS step, count(*) AS n_users FROM s1
              UNION ALL
              SELECT 2, '$t2', count(*) FROM s2
              UNION ALL
              SELECT 3, '$t3', count(*) FROM s3
              UNION ALL
              SELECT 4, '$t4', count(*) FROM s4)
        SELECT step_idx, step, n_users,
          round(CAST(n_users AS DOUBLE)
                / (SELECT n_users FROM c WHERE step_idx = 1), 4) AS conv_pct
        FROM c ORDER BY step_idx"""
  }

  /** Weekly cohort retention: users are cohorted by the Monday-truncated
    * week of their FIRST event; each (cohort, active-week) cell counts the
    * cohort's users active that week, with retention as a fraction of the
    * cohort size. The offset-0 cell is the cohort size by construction.
    *
    * Scale shape: two per-user aggregates (first-event, distinct active
    * weeks — both map-side combined), one equi-join on user_id, then a
    * low-cardinality (cohort, offset) aggregate. No global windows. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "ts")
    val firsts = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cohort_week"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val cells = active.join(firsts, "user_id")
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7)
          .cast(IntegerType).as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("cohort_size"), 4)
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  val cohortRetentionSql: String =
    """WITH f AS (SELECT user_id,
           CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
         FROM events GROUP BY user_id),
       a AS (SELECT DISTINCT user_id,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events),
       cells AS (SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS week_offset,
           count(*) AS n_users
         FROM a JOIN f ON a.user_id = f.user_id
         GROUP BY 1, 2),
       sz AS (SELECT cohort_week, n_users AS cohort_size FROM cells
              WHERE week_offset = 0)
       SELECT c.cohort_week, c.week_offset, c.n_users,
         round(CAST(c.n_users AS DOUBLE) / sz.cohort_size, 4) AS retention
       FROM cells c JOIN sz ON c.cohort_week = sz.cohort_week
       ORDER BY c.cohort_week, c.week_offset"""

  /** First-order Markov transition matrix over per-user event sequences:
    * count (prev_type -> type) for consecutive events ordered by
    * (ts, event_id) within each user, with the row-normalized transition
    * probability. The standard behavioral-sequence model input.
    *
    * Scale shape: one user-partitioned lag window (WindowExec parallel in
    * user cardinality), then a 5x5-cardinality aggregate and a tiny
    * broadcast join for the row totals. */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts", "event_id")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = ev
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
    val cnt = pairs.groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val totals = cnt.groupBy("prev_type").agg(sum("cnt").as("total"))
    cnt.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("event_type"), col("cnt"),
        round(col("cnt").cast("double") / col("total"), 4).as("prob"))
      .orderBy("prev_type", "event_type")
  }

  val eventTransitionsSql: String =
    """WITH p AS (SELECT user_id, event_type,
           lag(event_type, 1) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_type
         FROM events),
       cnt AS (SELECT prev_type, event_type, count(*) AS cnt FROM p
               WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       t AS (SELECT prev_type, sum(cnt) AS total FROM cnt GROUP BY 1)
       SELECT cnt.prev_type, cnt.event_type, cnt.cnt,
         round(CAST(cnt.cnt AS DOUBLE) / t.total, 4) AS prob
       FROM cnt JOIN t ON cnt.prev_type = t.prev_type
       ORDER BY cnt.prev_type, cnt.event_type"""

  /** Sampled-user modulus for the gap-fill grid — keeps the densified
    * output at dashboard size (the grid is per-user-hours, so an unsampled
    * run at high SF would dwarf every other verify artifact). */
  val GapFillUserMod = 50

  /** Hourly gap-fill with forward fill (time-series densification): for
    * each sampled user, materialize every hour between their first and last
    * event, carry the hour's LAST observed value (latest (ts, event_id))
    * forward across silent hours, and flag which grid rows were observed.
    * The standard resample-and-ffill primitive for telemetry/IoT feeds.
    *
    * Scale shape: the grid is generated per user with `sequence()` (no
    * driver loop, no cross join against a global calendar); the fill is a
    * user-partitioned running `last(ignoreNulls)` window. Grid width is
    * bounded by each user's own activity span. */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("user_id") % GapFillUserMod === 0)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    // Last observed value per (user, hour): max over a (ts, event_id, value)
    // struct — lexicographic struct ordering picks the latest event without
    // a window, and event_id uniqueness makes the pick deterministic.
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(max(struct(col("ts"), col("event_id"), col("value")))
        .getField("value").as("hv"))
    val grids = ev.groupBy("user_id")
      .agg(date_trunc("hour", min("ts")).as("h0"),
           date_trunc("hour", max("ts")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grids.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h").as("hour"),
        last("hv", ignoreNulls = true).over(w).as("value"),
        col("hv").isNotNull.as("observed"))
      .orderBy("user_id", "hour")
  }

  val gapFillSql: String =
    s"""WITH ev AS (SELECT user_id, ts, event_id, value FROM events
                    WHERE user_id % $GapFillUserMod = 0),
        hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
            (max({'ts': ts, 'eid': event_id, 'v': value})).v AS hv
          FROM ev GROUP BY 1, 2),
        grid AS (SELECT user_id, unnest(generate_series(
              date_trunc('hour', min(ts)), date_trunc('hour', max(ts)),
              INTERVAL 1 HOUR)) AS h
          FROM ev GROUP BY user_id)
        SELECT g.user_id, g.h AS hour,
          last_value(hourly.hv IGNORE NULLS) OVER (
            PARTITION BY g.user_id ORDER BY g.h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
          hourly.hv IS NOT NULL AS observed
        FROM grid g LEFT JOIN hourly
          ON g.user_id = hourly.user_id AND g.h = hourly.h
        ORDER BY g.user_id, hour"""

  /** MAD anomaly threshold multiplier (the classic 3-sigma-equivalent
    * robust cut; deviations beyond 3x the median absolute deviation). */
  val MadK = 3

  /** Per-user robust anomaly detection: flag events whose value deviates
    * from the user's median by more than [[MadK]]x the user's median
    * absolute deviation. All order statistics are computed over integer
    * cents via the doubled-middle-sum trick (m2 = lo+hi middle order
    * stats), so median and MAD are EXACT integers on both engines — no
    * interpolated-double drift — and the flag predicate
    * 2*dev > [[MadK]]*mad2 is pure integer arithmetic.
    *
    * Scale shape: two user-partitioned sort windows (row_number + count)
    * and two user-keyed aggregates; the per-user stats table then joins
    * back onto the stream once. Nothing global. */
  def anomalyMad(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("value") * 100, 0).cast(LongType).as("c"))
    ev.join(userRobustStats(ev), "user_id")
      .withColumn("dev", abs(lit(2) * col("c") - col("m2")))
      .filter(lit(2) * col("dev") > lit(MadK) * col("mad2"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("dev"), col("m2"), col("mad2"))
      .orderBy("user_id", "event_id")
  }

  /** Per-user robust stats over integer cents: doubled median (`m2` = sum of
    * the two middle order stats) and doubled MAD (`mad2`, same trick over
    * the doubled deviations) — exact integers end to end, shared by
    * [[anomalyMad]] and the streaming anomaly gate. Input must carry
    * (user_id, event_id, c). */
  private[graft] def userRobustStats(ev: DataFrame): DataFrame = {
    def middleSum(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("user_id").orderBy(col(valueCol), col("event_id"))
      val n = Window.partitionBy("user_id")
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(n))
        .groupBy("user_id")
        .agg(sum(
          when(col("rn") === expr("(cnt + 1) div 2"), col(valueCol)).otherwise(0L) +
          when(col("rn") === expr("cnt div 2 + 1"), col(valueCol)).otherwise(0L))
          .as(out))
    }
    val med = middleSum(ev, "c", "m2")
    val dev = ev.join(med, "user_id")
      .withColumn("dev", abs(lit(2) * col("c") - col("m2")))
    val mad = middleSum(dev.select(col("user_id"), col("event_id"),
      col("dev").as("c")), "c", "mad2")
    med.join(mad, "user_id")
  }

  val anomalyMadSql: String =
    s"""WITH ev AS (SELECT user_id, event_id, value,
            CAST(round(value * 100) AS BIGINT) AS c FROM events),
        r AS (SELECT user_id, event_id, c,
            row_number() OVER (PARTITION BY user_id ORDER BY c, event_id) AS rn,
            count(*) OVER (PARTITION BY user_id) AS cnt
          FROM ev),
        med AS (SELECT user_id,
            CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN c ELSE 0 END
              + CASE WHEN rn = cnt // 2 + 1 THEN c ELSE 0 END) AS BIGINT) AS m2
          FROM r GROUP BY user_id),
        dv AS (SELECT ev.user_id, ev.event_id, ev.value,
            CAST(abs(2 * ev.c - med.m2) AS BIGINT) AS dev, med.m2
          FROM ev JOIN med ON ev.user_id = med.user_id),
        r2 AS (SELECT user_id, event_id, dev,
            row_number() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS rn,
            count(*) OVER (PARTITION BY user_id) AS cnt
          FROM dv),
        mad AS (SELECT user_id,
            CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN dev ELSE 0 END
              + CASE WHEN rn = cnt // 2 + 1 THEN dev ELSE 0 END) AS BIGINT) AS mad2
          FROM r2 GROUP BY user_id)
        SELECT dv.user_id, dv.event_id, dv.value, dv.dev, dv.m2, mad.mad2
        FROM dv JOIN mad ON dv.user_id = mad.user_id
        WHERE 2 * dv.dev > $MadK * mad.mad2
        ORDER BY dv.user_id, dv.event_id"""

  /** CUSUM shift threshold multiplier: flag when the one-sided cumulative
    * sum exceeds [[CusumK]] x the user's daily-total MAD (D-scaled). At 4,
    * ~10% of user-days flag on this corpus — both verdicts exercised. */
  val CusumK = 4

  /** Per-user CUSUM level-shift detection over daily spend — the classic
    * sequential change-point statistic, flagging SUSTAINED upward drifts
    * the pointwise MAD detector ([[anomalyMad]]) cannot see. Everything is
    * exact integer arithmetic: daily totals in cents, deviations scaled by
    * the user's day count D (d_i = D*t_i - T avoids the mean division),
    * and the clipped recurrence S_i = max(0, S_{i-1} + d_i) computed
    * DISTRIBUTED via the prefix-min identity
    * `S_i = P_i - min(0, min_{j<=i} P_j)` — two user-partitioned running
    * windows instead of an inherently-sequential loop. Flag when
    * 2*S_i > [[CusumK]] * D * mad2 (the doubled-MAD robust scale from
    * [[userRobustStats]] over the daily totals).
    *
    * Scale shape: one daily aggregate, one per-user aggregate, the
    * order-stat windows and the two running windows — all keyed or
    * partitioned on user_id, nothing global. */
  def cusumShift(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast(LongType)).as("t"))
      .withColumn("dn", expr("unix_micros(day) div 86400000000"))
    val tot = daily.groupBy("user_id")
      .agg(count(lit(1)).as("days"), sum("t").as("total"))
    val stats = userRobustStats(
      daily.select(col("user_id"), col("dn").as("event_id"), col("t").as("c")))
    val w = Window.partitionBy("user_id").orderBy("dn")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(tot, "user_id")
      .withColumn("dd", col("days") * col("t") - col("total"))
      .withColumn("p", sum("dd").over(w))
      .withColumn("s2",
        lit(2) * (col("p") - least(lit(0L), min("p").over(w))))
      .join(stats, "user_id")
      .filter(col("s2") > lit(CusumK) * col("days") * col("mad2"))
      .select(col("user_id"), col("day"), col("t").as("t_cents"),
        col("s2"), (lit(CusumK) * col("days") * col("mad2")).as("thresh2"))
      .orderBy("user_id", "day")
  }

  val cusumShiftSql: String =
    s"""WITH daily AS (SELECT user_id,
            CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS t,
            epoch_us(CAST(date_trunc('day', ts) AS TIMESTAMP)) // 86400000000 AS dn
          FROM events GROUP BY 1, 2),
        tot AS (SELECT user_id, count(*) AS days,
            CAST(sum(t) AS BIGINT) AS total FROM daily GROUP BY 1),
        r AS (SELECT user_id, dn, t,
            row_number() OVER (PARTITION BY user_id ORDER BY t, dn) AS rn,
            count(*) OVER (PARTITION BY user_id) AS cnt
          FROM daily),
        med AS (SELECT user_id,
            CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN t ELSE 0 END
              + CASE WHEN rn = cnt // 2 + 1 THEN t ELSE 0 END) AS BIGINT) AS m2
          FROM r GROUP BY user_id),
        dv AS (SELECT daily.user_id, dn,
            CAST(abs(2 * t - m2) AS BIGINT) AS dev
          FROM daily JOIN med USING (user_id)),
        r2 AS (SELECT user_id, dn, dev,
            row_number() OVER (PARTITION BY user_id ORDER BY dev, dn) AS rn,
            count(*) OVER (PARTITION BY user_id) AS cnt
          FROM dv),
        mad AS (SELECT user_id,
            CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN dev ELSE 0 END
              + CASE WHEN rn = cnt // 2 + 1 THEN dev ELSE 0 END) AS BIGINT) AS mad2
          FROM r2 GROUP BY user_id),
        sc AS (SELECT d.user_id, d.day, d.t, d.dn, tot.days,
            CAST(tot.days * d.t - tot.total AS BIGINT) AS dd
          FROM daily d JOIN tot USING (user_id)),
        pf AS (SELECT *, CAST(sum(dd) OVER (PARTITION BY user_id ORDER BY dn
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
          FROM sc),
        s AS (SELECT *, CAST(2 * (p - least(CAST(0 AS BIGINT),
              min(p) OVER (PARTITION BY user_id ORDER BY dn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS BIGINT) AS s2
          FROM pf)
        SELECT s.user_id, s.day, s.t AS t_cents, s.s2,
          CAST($CusumK * s.days * mad.mad2 AS BIGINT) AS thresh2
        FROM s JOIN mad USING (user_id)
        WHERE s.s2 > $CusumK * s.days * mad.mad2
        ORDER BY s.user_id, s.day"""

  /** RFM (recency / frequency / monetary) customer segmentation over
    * purchase events, scored into quartiles AGAINST THRESHOLDS rather than
    * with a global ntile: a single-partition ntile window is the classic
    * scale-killer at a 10^9-user dimension, while three quartile cut
    * points (one tiny percentile aggregate, broadcast back) score the same
    * segments with one embarrassingly parallel comparison pass.
    *
    * Recency is measured in whole days back from the corpus's last event;
    * monetary is exact integer cents. Quartile thresholds interpolate over
    * integers at .25/.5/.75, which both engines compute bit-identically
    * (same a + (b-a)*f form over exactly-representable integers). */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val anchor = ev.agg(max("ts").as("anchor"))
    val rfm = ev.filter(col("event_type") === "purchase")
      .crossJoin(broadcast(anchor))
      .groupBy("user_id")
      .agg(
        min(datediff(col("anchor"), col("ts"))).cast(LongType).as("rec_days"),
        count(lit(1)).as("n_purch"),
        sum(round(col("value") * 100, 0).cast(LongType)).as("cents"))
    val cuts = rfm.agg(
      expr("percentile(rec_days, array(0.25, 0.5, 0.75))").as("rq"),
      expr("percentile(n_purch, array(0.25, 0.5, 0.75))").as("fq"),
      expr("percentile(cents, array(0.25, 0.5, 0.75))").as("mq"))
    def score(metric: String, qs: String, higherIsBetter: Boolean) = {
      val cmp = (i: Int) =>
        if (higherIsBetter) col(metric) >= col(qs).getItem(i)
        else col(metric) <= col(qs).getItem(i)
      (lit(1) + cmp(0).cast(IntegerType) + cmp(1).cast(IntegerType) +
        cmp(2).cast(IntegerType)).cast(IntegerType)
    }
    rfm.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("rec_days"), col("n_purch"), col("cents"),
        score("rec_days", "rq", higherIsBetter = false).as("r_score"),
        score("n_purch", "fq", higherIsBetter = true).as("f_score"),
        score("cents", "mq", higherIsBetter = true).as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
      .orderBy("user_id")
  }

  val rfmSegmentsSql: String =
    """WITH anchor AS (SELECT max(ts) AS anchor FROM events),
       rfm AS (SELECT user_id,
           CAST(min(date_diff('day', e.ts, a.anchor)) AS BIGINT) AS rec_days,
           count(*) AS n_purch,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM events e CROSS JOIN anchor a
         WHERE event_type = 'purchase' GROUP BY user_id),
       cuts AS (SELECT
           quantile_cont(rec_days, 0.25) AS r1, quantile_cont(rec_days, 0.5) AS r2,
           quantile_cont(rec_days, 0.75) AS r3,
           quantile_cont(n_purch, 0.25) AS f1, quantile_cont(n_purch, 0.5) AS f2,
           quantile_cont(n_purch, 0.75) AS f3,
           quantile_cont(cents, 0.25) AS m1, quantile_cont(cents, 0.5) AS m2,
           quantile_cont(cents, 0.75) AS m3
         FROM rfm),
       scored AS (SELECT user_id, rec_days, n_purch, cents,
           CAST(1 + CAST(rec_days <= r3 AS INT) + CAST(rec_days <= r2 AS INT)
              + CAST(rec_days <= r1 AS INT) AS INT) AS r_score,
           CAST(1 + CAST(n_purch >= f1 AS INT) + CAST(n_purch >= f2 AS INT)
              + CAST(n_purch >= f3 AS INT) AS INT) AS f_score,
           CAST(1 + CAST(cents >= m1 AS INT) + CAST(cents >= m2 AS INT)
              + CAST(cents >= m3 AS INT) AS INT) AS m_score
         FROM rfm CROSS JOIN cuts)
       SELECT user_id, rec_days, n_purch, cents, r_score, f_score, m_score,
         CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
           || CAST(m_score AS VARCHAR) AS segment
       FROM scored ORDER BY user_id"""

  /** Conversion window for [[funnelWindowed]]: a step counts only within
    * this many hours of the previous step's qualifying time — the "convert
    * within a day" product constraint that unbounded funnels miss. */
  val ConvWindowHours = 24

  /** The [[eventFunnel]] chain under a per-step conversion WINDOW: step k
    * qualifies only with an event strictly after step k-1's time AND within
    * [[ConvWindowHours]] of it. Same min-after chaining, same shrinking
    * user-keyed aggregates — the time bound just tightens each join's
    * filter, so the 100 TB shape is unchanged (and the bound makes each
    * step MORE selective, never wider). */
  def funnelWindowed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    def firstOf(tpe: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .groupBy("user_id").agg(min("ts").as("t"))
    def nextWithin(prev: DataFrame, tpe: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .join(prev.select(col("user_id"), col("t").as("t_prev")), "user_id")
        .filter(col("ts") > col("t_prev") &&
          col("ts") <= col("t_prev") + expr(s"INTERVAL $ConvWindowHours HOURS"))
        .groupBy("user_id").agg(min("ts").as("t"))
    val steps = FunnelSteps.tail.scanLeft(firstOf(FunnelSteps.head))(nextWithin)
    val counts = steps.zip(FunnelSteps).zipWithIndex.map {
      case ((df, tpe), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step_idx"), lit(tpe).as("step"), col("n_users"))
    }.reduce(_.union(_))
    val base = counts.filter(col("step_idx") === 1)
      .select(col("n_users").as("base_users"))
    counts.crossJoin(broadcast(base))
      .select(col("step_idx"), col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("base_users"), 4)
          .as("conv_pct"))
      .orderBy("step_idx")
  }

  val funnelWindowedSql: String = {
    val Seq(t1, t2, t3, t4) = FunnelSteps
    def step(i: Int, tpe: String) =
      s"""s$i AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s${i - 1} ON e.user_id = s${i - 1}.user_id
                 AND e.ts > s${i - 1}.t
                 AND e.ts <= s${i - 1}.t + INTERVAL $ConvWindowHours HOUR
               WHERE e.event_type = '$tpe' GROUP BY e.user_id)"""
    s"""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = '$t1' GROUP BY user_id),
        ${step(2, t2)},
        ${step(3, t3)},
        ${step(4, t4)},
        c AS (SELECT 1 AS step_idx, '$t1' AS step, count(*) AS n_users FROM s1
              UNION ALL SELECT 2, '$t2', count(*) FROM s2
              UNION ALL SELECT 3, '$t3', count(*) FROM s3
              UNION ALL SELECT 4, '$t4', count(*) FROM s4)
        SELECT step_idx, step, n_users,
          round(CAST(n_users AS DOUBLE)
                / (SELECT n_users FROM c WHERE step_idx = 1), 4) AS conv_pct
        FROM c ORDER BY step_idx"""
  }

  /** Path length for [[eventPaths]] (3 = the "user journey" trigram). */
  val PathLen = 3
  val PathTopK = 20

  /** Top user journeys: the most frequent length-[[PathLen]] CONTIGUOUS
    * event-type sequences across all per-user timelines — the product
    * question behind every Sankey/flow chart ("what do users actually do,
    * in order"). Sequences are user-partitioned lead() windows (never a
    * global window); the path aggregate is path-arity (|event_types|³ ≤ a
    * few hundred keys here), map-side combined; the top-20 is a
    * TakeOrdered with a full deterministic tie-break. */
  def eventPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(PathTopK)
  }

  val eventPathsSql: String =
    s"""WITH o AS (SELECT user_id, event_type,
            lead(event_type, 1) OVER w AS e2,
            lead(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
        FROM o WHERE e3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, path LIMIT $PathTopK"""

  /** A/B experiment readout: users deterministically hash-split into two
    * arms (md5 parity — the [[graft.llm.TextAnalysis]] salted-split
    * discipline, so assignment is stable and balanced), compared on mean
    * per-user spend via the WELCH t-statistic. Everything up to the final
    * statistic is integer-exact — per-user spend in cents, arm-level
    * n / Σx / Σx² as longs — so the double arithmetic that produces the
    * t value runs on identical integers in both engines and rounds
    * identically at 4 dp. Output: one row per arm with its components,
    * plus the shared t_stat (the analyst-facing number).
    *
    * Scale shape: one user-keyed aggregate (map-side combined) over the
    * fact stream, then a 2-row arm rollup; the t computation is scalar.
    * At 100 TB the per-user aggregate is the only real work. */
  def abTest(s: SparkSession, d: String): DataFrame =
    abTestOf(Tables.events(s, d)
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100, 0).cast(LongType)).as("cents"))
      .withColumn("arm",
        when(expr("conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10)")
          .cast(LongType) % 2 === 0, "A").otherwise("B")))

  /** [[abTest]] over an explicit (cents, arm) per-user frame — split out so
    * EventAnalyticsSpec can prove the degenerate-arm guard on crafted
    * corpora. The Welch statistic divides by (n-1), n, and the pooled
    * standard error, so an arm with fewer than 2 users, or two arms with
    * zero within-arm variance, has NO defined t — those corpora emit a
    * NULL t_stat (with the arm components still reported) instead of the
    * NaN/Infinity an unguarded formula produces. */
  private[graft] def abTestOf(perUser: DataFrame): DataFrame = {
    val arms = perUser.groupBy("arm").agg(
      count(lit(1)).as("n_users"),
      sum("cents").as("sum_cents"),
      sum(col("cents") * col("cents")).as("sumsq_cents"))
    val wide = arms.groupBy().pivot("arm", Seq("A", "B")).agg(
      first("n_users").as("n"), first("sum_cents").as("sum"),
      first("sumsq_cents").as("sumsq"))
    val se2 =
      ((col("A_sumsq") - col("A_sum").cast("double") * col("A_sum") / col("A_n"))
        / (col("A_n") - 1) / col("A_n")) +
      ((col("B_sumsq") - col("B_sum").cast("double") * col("B_sum") / col("B_n"))
        / (col("B_n") - 1) / col("B_n"))
    val t = wide.select(
      col("A_n"), col("A_sum"), col("A_sumsq"),
      col("B_n"), col("B_sum"), col("B_sumsq"),
      when(col("A_n") > 1 && col("B_n") > 1 && se2 > 0,
        round(
          (col("A_sum").cast("double") / col("A_n")
            - col("B_sum").cast("double") / col("B_n"))
          / sqrt(se2), 4)).as("t_stat"))
    t.select(col("A_n").as("n_a"), col("A_sum").as("sum_cents_a"),
      col("B_n").as("n_b"), col("B_sum").as("sum_cents_b"), col("t_stat"))
  }

  val abTestSql: String =
    """WITH u AS (SELECT user_id,
            CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY 1),
       armed AS (SELECT cents,
            CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
          FROM u),
       s AS (SELECT arm, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS sc,
               CAST(sum(cents * cents) AS BIGINT) AS sq
             FROM armed GROUP BY arm),
       w AS (SELECT
               max(CASE WHEN arm = 'A' THEN n END) AS n_a,
               max(CASE WHEN arm = 'A' THEN sc END) AS sum_a,
               max(CASE WHEN arm = 'A' THEN sq END) AS sq_a,
               max(CASE WHEN arm = 'B' THEN n END) AS n_b,
               max(CASE WHEN arm = 'B' THEN sc END) AS sum_b,
               max(CASE WHEN arm = 'B' THEN sq END) AS sq_b
             FROM s)
       SELECT n_a, sum_a AS sum_cents_a, n_b, sum_b AS sum_cents_b,
         CASE WHEN n_a > 1 AND n_b > 1 AND
           ((sq_a - CAST(sum_a AS DOUBLE) * sum_a / n_a) / (n_a - 1) / n_a
            + (sq_b - CAST(sum_b AS DOUBLE) * sum_b / n_b) / (n_b - 1) / n_b) > 0
         THEN round(
           (CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b)
           / sqrt(
             (sq_a - CAST(sum_a AS DOUBLE) * sum_a / n_a) / (n_a - 1) / n_a
             + (sq_b - CAST(sum_b AS DOUBLE) * sum_b / n_b) / (n_b - 1) / n_b),
           4) END AS t_stat
       FROM w"""
}
