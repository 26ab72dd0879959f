package graft

import graft.ops.Analytics
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Structured Streaming specs: streaming results must agree with their batch
  * equivalents (the streaming queries are incremental recomputations of the
  * same logical aggregation). */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window == batch tumbling window") {
    val streamed = EventStreams.tumblingWindowStream(spark, Sf)
      .select("win_start", "cnt", "sum_value")
    val batch = Analytics.tumblingWindow(spark, Sf)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream attribution join == batch self-join (incl. cross-batch pairs)") {
    val streamed = EventStreams.streamStreamJoin(spark, Sf)
    val ev = Tables.events(spark, Sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        unix_micros(col("ts")).as("v_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        unix_micros(col("ts")).as("p_us"))
    val batch = v.join(p, col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("cnt"),
        floor(min(col("p_us") - col("v_us")) / lit(1000000L)).as("min_delay_s"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream join matches across micro-batch boundaries (state survives)") {
    // Two event-time-contiguous chunks, one file per trigger: the view lands
    // in batch 0, its purchase (20 min later, same user) in batch 1. A match
    // proves the view side's join state survived the micro-batch boundary.
    import java.nio.file._
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_ss_cross")
    if (Files.exists(base)) {
      Files.walk(base).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(base)
    val hourUs = 3600L * 1000000
    val t0 = 1700000000L * 1000000
    import spark.implicits._
    // chunk 0: an old view (evicted: 3h before chunk max), a fresh view
    // (10 min before chunk max), and a max-ts marker event.
    val chunk0 = Seq(
      (1L, t0, 7L, "view", 1.0),
      (2L, t0 + 3 * hourUs - 600L * 1000000, 8L, "view", 1.0),
      (3L, t0 + 3 * hourUs, 9L, "click", 0.0))
    // chunk 1: a purchase matching the fresh view (20 min after it), and a
    // user-7 purchase 3h after user 7's view — outside the 30-min bound, so
    // user 7 must NOT appear in the output.
    val chunk1 = Seq(
      (4L, t0 + 3 * hourUs + 600L * 1000000, 8L, "purchase", 5.0),
      (5L, t0 + 3 * hourUs + 700L * 1000000, 7L, "purchase", 5.0))
    Seq(chunk0, chunk1).zipWithIndex.foreach { case (rows, i) =>
      val tmp = base.resolve(s"_stage_$i")
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = base.resolve(f"chunk_$i%02d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    val pairs = EventStreams.attributionPairs(spark, base.toString, filesPerTrigger = 1)
      .select("user_id", "view_id", "purchase_id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == Set((8L, 2L, 4L)),
      s"expected exactly the cross-batch pair (8,2,4), got ${pairs.mkString(",")}")
  }

  test("left-outer stream-stream join emits unmatched view after watermark closes window") {
    // chunk 0: user 8's view (matched in chunk 1), user 7's view (never
    // matched). chunk 1: user 8's purchase 20 min after the view, plus a
    // marker view+purchase pair 3h later. The markers matter: watermarks are
    // computed per join side AFTER the event_type filters, so only late view
    // and purchase events (not clicks) advance them. They push both side
    // watermarks to t0 + 2h — past user 7's t0+30min match horizon, so the
    // no-data eviction batch MUST emit user 7's view with a null purchase.
    import java.nio.file._
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_ss_outer")
    if (Files.exists(base)) {
      Files.walk(base).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(base)
    val hourUs = 3600L * 1000000
    val t0 = 1700000000L * 1000000
    import spark.implicits._
    val chunk0 = Seq(
      (1L, t0, 7L, "view", 1.0),
      (2L, t0, 8L, "view", 1.0))
    val chunk1 = Seq(
      (3L, t0 + 1200L * 1000000, 8L, "purchase", 5.0),
      (4L, t0 + 3 * hourUs, 9L, "view", 0.0),
      (5L, t0 + 3 * hourUs, 9L, "purchase", 0.0))
    Seq(chunk0, chunk1).zipWithIndex.foreach { case (rows, i) =>
      val tmp = base.resolve(s"_stage_$i")
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = base.resolve(f"chunk_$i%02d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    val rows = EventStreams.attributionPairs(spark, base.toString,
        filesPerTrigger = 1, joinType = "left_outer", queryName = "graft_ss_outer_t")
      .select("user_id", "view_id", "purchase_id").collect()
    val got = rows.map(r =>
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((8L, 2L, 3L), (9L, 4L, 5L), (7L, 1L, -1L)),
      s"expected matches (8,2,3),(9,4,5) and watermark-evicted null (7,1,null), got ${got}")
  }

  test("q_stream_stream_outer matches the horizon-filtered batch left join") {
    val streamed = EventStreams.streamStreamOuter(spark, Sf)
    assert(streamed.count() > 0)
    val ev = Tables.events(spark, Sf).cache()
    // Horizon anchors on min over side maxima — the join's global watermark.
    val maxUs = ev.filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
      .agg(min(col("m"))).head().getLong(0)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        unix_micros(col("ts")).as("v_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val batch = v.join(p, col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"), "left_outer")
      .filter(col("purchase_id").isNotNull || col("v_us") < maxUs - 5460000000L)
      .groupBy(col("v_user").as("user_id"))
      .agg(sum(when(col("purchase_id").isNotNull, 1L).otherwise(0L)).as("matched"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("unmatched"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("native session_window stream == horizon-filtered batch sessions") {
    val streamed = EventStreams.sessionWindowStream(spark, Sf)
    assert(streamed.count() > 0)
    val maxUs = Tables.events(spark, Sf)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val batch = Analytics.sessionize(spark, Sf)
      .filter(unix_micros(col("sess_end")) < maxUs - 5460000000L)
      .select(col("user_id"), unix_micros(col("sess_start")).as("start_us"),
        col("n_events"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stateful streaming sessions match batch gaps-and-islands sessions") {
    val streamed = EventStreams.sessionizeStream(spark, Sf)
      .select(col("user_id"), col("sess_start").as("start_us"), col("n_events"))
    val batch = Analytics.sessionize(spark, Sf)
      .select(col("user_id"),
        unix_micros(col("sess_start")).as("start_us"), col("n_events"))
    // Streaming (append mode + event-time timeout) cannot emit each user's
    // final open session at end-of-input; every emitted session must exist in
    // the batch result, and most batch sessions must be emitted.
    val extra = streamed.exceptAll(batch).count()
    assert(extra == 0, s"$extra streamed sessions not present in batch result")
    val emitted = streamed.count()
    val total = batch.count()
    assert(emitted >= total - Tables.events(spark, Sf)
      .select("user_id").distinct().count(),
      s"too few sessions emitted: $emitted of $total")
  }

  test("file sink restart over the same checkpoint is exactly-once (no re-emission)") {
    val dir = EventStreams.stageEvents(spark, Sf)
    val base = java.nio.file.Files.createTempDirectory("graft_filesink_spec").toString
    EventStreams.runFileSinkOnce(spark, dir, base)
    val first = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).sorted.toSeq
    assert(first.nonEmpty, "first run must flush at least one closed window")
    assert(first.map(_._1).distinct.size == first.size,
      "append sink emitted a window twice within one run")
    // Restart against the same checkpoint + path with no new input: the
    // file-commit log must replay nothing and duplicate nothing.
    EventStreams.runFileSinkOnce(spark, dir, base)
    val second = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).sorted.toSeq
    assert(second == first,
      s"restart changed the sink contents: ${second.size} rows vs ${first.size}")
  }

  test("CDC apply: state versions grow monotonically to the batch rollup") {
    val finalState = EventStreams.streamCdcApply(spark, Sf).cache()
    // the run leaves its versioned state chain on disk — audit it
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_stream_cdc")
    import scala.jdk.CollectionConverters._
    val versions = java.nio.file.Files.list(base).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("v"))
      .map(_.drop(1).toInt).toSeq.sorted
    assert(versions.size >= 2, s"expected >= 2 state versions, got $versions")
    val totals = versions.map { v =>
      spark.read.parquet(base.resolve(s"v$v").toString)
        .agg(sum("n_events")).head().getLong(0)
    }
    assert(totals == totals.sorted,
      s"per-version event totals not monotone: $totals")
    assert(totals.distinct.size == totals.size,
      s"a merge round absorbed no events (stalled chain): $totals")
    val batchTotal = Tables.events(spark, Sf).count()
    assert(totals.last == batchTotal,
      s"final state covers ${totals.last} events, corpus has $batchTotal")
    finalState.unpersist()
  }
}
