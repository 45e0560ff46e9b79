package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  lazy val events = graft.sources.Tables.table(spark, dir, "events").cache()

  test("streaming windowed counts == batch twin (file source, memory sink)") {
    // file source needs a directory — stage the single parquet file into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = EventStreams.readEventStream(spark, streamDir.toString)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("wc_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wc_out")
        .select("window_start", "event_type", "n", "value_milli")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.windowedCountsBatch(events)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming exact dedup drops repeated payloads within the watermark") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = EventStreams.readEventStream(spark, streamDir.toString)
    // event_type has only 5 distinct values → dedup on it keeps exactly 5
    val q = graft.pipeline.Dedup.streamingExactDedup(stream, "event_type", "ts")
      .select("event_type")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 5)
    } finally q.stop()
  }

  test("stream-stream interval join == batch twin") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = EventStreams.readEventStream(spark, streamDir.toString)
    val q = EventStreams.errorClickJoin(stream)
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_out").collect().map(_.toSeq).toSet
      val batch = EventStreams.errorClickJoinBatch(events).collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming grouped topX == batch topXAgg after one pass") {
    val ds = events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    // single-batch streaming state == batch top-N (ts in millis)
    val got = EventStreams.streamingTopX(ds, 3)
    // flatMapGroupsWithState requires a streaming source for incremental
    // execution, but executes fine on a static Dataset as one batch:
    val gotSet = got.collect().map(t => (t._1, t._2, t._3)).toSet
    val expect = graft.api.Gis.topXAgg(
      events.withColumn("ts_ms", expr("unix_micros(ts) div 1000")),
      "user_id", "ts_ms", "event_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotSet == expect)
  }

  test("batch sessionization: partitions all events into disjoint sessions") {
    val sessions = EventStreams.sessionizeBatch(events, gapMs = 60 * 60 * 1000L)
    val total = sessions.agg(sum("n_events")).head.getLong(0)
    assert(total == events.count())
    // sessions are ordered and non-overlapping per user
    // schema: user_id, session_idx, n_events, first_ts, last_ts
    val perUser = sessions.collect().groupBy(_.getLong(0))
    perUser.values.foreach { ss =>
      val sorted = ss.sortBy(_.getLong(1)) // by session_idx
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) < b.getLong(3)) // last_ts < next first_ts
        case _ =>
      }
    }
  }

  test("stateful sessionization emits closed sessions") {
    val ds = events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    // run through the batch-equivalent semantics by feeding all events at once:
    // a single batch means sessions stay open unless gaps occur inside it.
    val gap = 60 * 60 * 1000L
    val sessionsBatch = EventStreams.sessionizeBatch(events, gap)
    val closedInBatch = sessionsBatch.count() - events.select("user_id").distinct().count()
    assert(closedInBatch >= 0) // structural sanity: >= 0 sessions closed mid-stream
    assert(ds.count() == events.count())
  }
}
