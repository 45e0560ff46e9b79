package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The late-data CONTRACT, pinned exactly: the streaming twins' prefix-
 * equality specs feed in-order batches, so watermark eviction never
 * fires there — these tests craft batches that arrive ACROSS the
 * watermark boundary and assert the exact kept/dropped partition.
 *
 * Spark's documented rule for windowed aggregation: a late row is
 * dropped PER WINDOW — it still contributes to every overlapping window
 * whose end is above the current watermark, and only the already-
 * finalized windows miss it (a straddling hop-window event lands in a
 * strict subset of its k = duration/slide memberships). For
 * `dropDuplicates` the state itself is keyed on the dedup column with
 * the event-time watermark bounding state retention.
 */
class LateDataSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2021-06-01 $hhmm:00")

  test("hoppingCounts late batch: straddling event keeps only open windows; " +
    "older-than-all drops; fresh keeps all 4") {
    val input = MemoryStream[(Long, Timestamp, String, Double)](spark)
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
    // 1 h windows hopping by 15 min, 15 min watermark delay
    val q = EventStreams.hoppingCounts(events,
        window_ = "1 hour", slide = "15 minutes", watermark = "15 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_hop_out").start()
    try {
      // batch 1 (in order): two clicks at 12:00 and 12:05
      // → watermark after the batch: 12:05 − 15 min = 11:50
      input.addData((1L, ts("12:00"), "click", 1.0), (2L, ts("12:05"), "click", 1.0))
      q.processAllAvailable()
      // batch 2 (late, spanning the boundary):
      //  eA 11:40 — its 4 windows end 11:45/12:00/12:15/12:30; the one
      //             ending 11:45 ≤ wm is finalized → eA lands in only 3
      //  eB 10:30 — every window end ≤ 11:30 ≤ wm → dropped entirely
      //  eC 12:10 — fresh → all 4 windows
      input.addData((3L, ts("11:40"), "click", 1.0), (4L, ts("10:30"), "click", 1.0),
        (5L, ts("12:10"), "click", 1.0))
      q.processAllAvailable()
      // batch 3: far-future flush event advances the watermark past every
      // click window end (14:00 − 15 min = 13:45), finalizing them all
      input.addData((6L, ts("14:00"), "flush", 1.0))
      q.processAllAvailable()
      val got = spark.table("late_hop_out")
        .filter(col("event_type") === "click")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // exact per-window membership after the late batch:
      //   11:00 ← eA                       = 1
      //   11:15 ← e1, e2, eA, eC          = 4
      //   11:30 ← e1, e2, eA, eC          = 4
      //   11:45 ← e1, e2, eC              = 3
      //   12:00 ← e1, e2, eC              = 3
      // (10:45 — eA's finalized window — absent; eB nowhere)
      assert(got == Map("11:00" -> 1L, "11:15" -> 4L, "11:30" -> 4L,
        "11:45" -> 3L, "12:00" -> 3L),
        s"late-data kept/dropped partition diverged: $got")
    } finally q.stop()
  }

  test("sessionCounts late batch: a late-but-still-open event RETROACTIVELY " +
    "extends the session start; older-than-all drops") {
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.sessionCounts(events,
        gap = "10 minutes", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_sess_out").start()
    try {
      // batch 1 (in order): u1 at 12:00 and 12:05 → one open session
      // [12:00, 12:15); watermark after the batch = 12:05 − 10 = 11:55
      input.addData((1L, ts("12:00"), 1L, "click", 1.0),
        (2L, ts("12:05"), 1L, "click", 1.0))
      q.processAllAvailable()
      // batch 2 across the boundary:
      //  eA u1 11:50 — LATE (ts < wm) but its per-event window
      //    [11:50, 12:00) ends ABOVE the watermark → kept, touches the
      //    open session's start → merges, dragging start back to 11:50
      //  eB u1 11:40 — window [11:40, 11:50) ends below the watermark →
      //    dropped entirely
      input.addData((3L, ts("11:50"), 1L, "click", 1.0),
        (4L, ts("11:40"), 1L, "click", 1.0))
      q.processAllAvailable()
      // batch 3: far-future flush advances the watermark past the
      // session end (13:30 − 10 min = 13:20 > 12:15) → finalize + emit
      input.addData((5L, ts("13:30"), 99L, "flush", 1.0))
      q.processAllAvailable()
      val got = spark.table("late_sess_out")
        .filter(col("user_id") === 1L)
        .select(date_format(col("session_start"), "HH:mm"),
          date_format(col("session_end"), "HH:mm"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(got.toSeq == Seq(("11:50", "12:15", 3L)),
        s"late-session kept/dropped partition diverged: ${got.toSeq}")
    } finally q.stop()
  }

  test("errorClickJoinOuter: unmatched error emits its NULL row only after " +
    "the watermark proves no click can still arrive") {
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.errorClickJoinOuter(events,
        intervalMs = 10 * 60 * 1000L, watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("outer_join_out").start()
    try {
      // u1's error has a click 5 min before (matches); u2's error has none
      input.addData((1L, ts("11:55"), 1L, "click", 1.0),
        (2L, ts("12:00"), 1L, "error", 1.0),
        (3L, ts("12:00"), 2L, "error", 1.0))
      q.processAllAvailable()
      val early = spark.table("outer_join_out")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
      // matched row flows immediately; u2's error is HELD — a click with
      // ts in [11:50, 12:00] could still arrive (wm is only 11:50)
      assert(early == Set((2L, Some(1L), 1L)),
        s"unmatched error must wait for the watermark, got: $early")
      // advancing the watermark needs far-future events that SURVIVE the
      // type filters on BOTH join sides (a filtered-out "flush" type never
      // reaches either watermark node — the global watermark is the min
      // over both sides); eviction then runs at the END of the batch where
      // the watermark advanced, so the null row appears in the batch AFTER
      // — the same end-of-batch cadence the dedup contract pins
      input.addData((9L, ts("13:00"), 99L, "click", 1.0),
        (10L, ts("13:00"), 99L, "error", 1.0))
      q.processAllAvailable()
      input.addData((11L, ts("13:30"), 99L, "click", 1.0),
        (12L, ts("13:30"), 99L, "error", 1.0))
      q.processAllAvailable()
      val after = spark.table("outer_join_out")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
      assert(after == Set((2L, Some(1L), 1L), (3L, None, 2L),
        (10L, Some(9L), 99L), (12L, Some(11L), 99L)),
        s"null-row emission diverged: $after")
    } finally q.stop()
  }

  test("streamingExactDedup late batch: older-than-watermark rows drop; " +
    "live dups suppress; expired-state dup re-emits exactly once") {
    // dropDuplicatesWithinWatermark's three-way contract, pinned: (1) an
    // input row older than the watermark is dropped outright (its state
    // horizon already passed — keeping it could produce nondeterministic
    // dedup against evicted state); (2) a duplicate whose original's
    // state is live is suppressed; (3) a duplicate arriving after its
    // original's state EXPIRED (wm > original ts + delay) re-emits — the
    // documented state-bounding approximation exact batch dedup doesn't
    // have. This spec is also the regression pin for the r8 find that
    // plain dropDuplicates on the hash key never evicted state at all
    // (unbounded state growth; expired dups never re-emitted).
    val input = MemoryStream[(String, Timestamp)](spark)
    val docs = input.toDF().toDF("text", "ts")
    val q = graft.pipeline.Dedup.streamingExactDedup(docs, "text", "ts",
        watermark = "10 minutes")
      .select(col("text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("late_dedup_out").start()
    try {
      // batch 1: a, b at 12:00 → wm = 11:50
      input.addData(("a", ts("12:00")), ("b", ts("12:00")))
      q.processAllAvailable()
      // batch 2 across the boundary:
      //  ("a", 12:01) duplicate against live state → suppressed
      //  ("c", 11:40) ts < wm                      → dropped as late
      //  ("d", 11:55) new key, ts ≥ wm             → emitted
      input.addData(("a", ts("12:01")), ("c", ts("11:40")), ("d", ts("11:55")))
      q.processAllAvailable()
      val afterLate = spark.table("late_dedup_out")
        .collect().map(_.getString(0)).toSet
      assert(afterLate == Set("a", "b", "d"),
        s"late-row contract diverged (late 'c' drops, dup 'a' suppressed): $afterLate")
      // batch 3: advance the watermark to 12:50 → every key's state
      // (event times ≤ 12:01) is evicted after this batch
      input.addData(("z", ts("13:00")))
      q.processAllAvailable()
      // batches 4+5: "a" again with fresh timestamps — the original
      // state (ts 12:00 < wm) is expired, so the duplicate RE-EMITS
      // exactly once (the state-bound approximation, pinned). Two
      // batches because eviction runs at batch END, after that batch's
      // input is checked: whichever batch the re-emission lands in, the
      // OTHER "a" is suppressed against the refreshed state — a → 2.
      input.addData(("a", ts("13:05")))
      q.processAllAvailable()
      input.addData(("a", ts("13:06")))
      q.processAllAvailable()
      val counts = spark.table("late_dedup_out")
        .groupBy(col("text")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("a" -> 2L, "b" -> 1L, "d" -> 1L, "z" -> 1L),
        s"expired-state re-emission contract diverged: $counts")
    } finally q.stop()
  }
}
