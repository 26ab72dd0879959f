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
}
