package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the `events` table shape
 * (event_id, ts, user_id, event_type, value, props).
 *
 * The reference is batch-only (SURVEY §2.5: streaming absent), so this is
 * the idiomatic-extension layer: watermarked tumbling windows and stateful
 * sessionization. Each streaming transform has a batch twin with identical
 * semantics (used by the DuckDB-oracle correctness gate; the streaming path
 * is exercised in tests with a file source + memory sink).
 */
object EventStreams {

  /** value → integer cents with Spark SQL `round()` semantics (HALF_UP,
    * away from zero for negatives). Scala's `math.round` is floor(x+0.5)
    * — for negative values landing exactly on a half-cent it rounds
    * toward +∞ and diverges from the batch replay the JVM-side twins are
    * documented to equal, so every JVM-side twin rounds through here. */
  private[streaming] def roundCents(v: Double): Long = {
    val c = v * 100.0
    if (c < 0) -math.round(-c) else math.round(c)
  }

  /** Raw file schema: ts arrives as micros TIMESTAMP with
    * isAdjustedToUTC=false (TIMESTAMP_NTZ in Spark); normalized to
    * TimestampType on read (see [[graft.sources.Tables.normalizeEventTs]];
    * the batch path additionally accepts the older nanos-INT64 layout). */
  val eventFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming file source over a directory of event parquet files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.configure(spark)
    graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(eventFileSchema).parquet(dir))
  }

  /** Tumbling-window counts per event_type with late-data watermark. */
  def windowedCounts(events: DataFrame,
                     window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_milli"))

  /** Batch twin of [[windowedCounts]] — same plan on a static DataFrame. */
  def windowedCountsBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_milli"))

  /**
   * Streaming twin of [[graft.pipeline.EventAnalytics.downsampleOhlc]]:
   * watermarked tumbling-window OHLC candles. Open/close ride the same
   * (ts_us, event_id, cents) struct min/max as the batch op, so partial
   * candles MERGE exactly across micro-batches (min/max/sum/count are
   * all associative) and state per (key, window) is O(1); late data
   * within the watermark folds into its candle, later data drops.
   * `bucket_start` is emitted as epoch seconds, matching the batch twin
   * bit-for-bit for epoch-aligned windows.
   */
  def ohlcStream(events: DataFrame, window_ : String = "1 day",
                 watermark: String = "2 days",
                 keyCol: String = "event_type"): DataFrame =
    events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col(keyCol))
      .agg(count(lit(1)).as("n"),
        min(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("close_cents"),
        sum(col("cents")).as("sum_cents"))
      .select(expr("unix_seconds(window.start)").as("bucket_start"),
        col(keyCol), col("n"), col("open_cents"), col("high_cents"),
        col("low_cents"), col("close_cents"), col("sum_cents"))

  /**
   * HOPPING (sliding) window counts: duration `window_`, slide `slide`
   * < duration, so each event contributes to duration/slide overlapping
   * windows (the rate-over-trailing-hour-updated-every-15-min report
   * tumbling windows can't express). Spark's `window()` expands the
   * replicas natively; epoch-aligned starts, so the integer oracle
   * unrolls the same k = duration/slide window memberships. Null-ts
   * rows are dropped (the module contract — a null time belongs to no
   * window, and Spark would otherwise emit a null-window group).
   */
  def hoppingCounts(events: DataFrame,
                    window_ : String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_milli"))

  /** Batch twin of [[hoppingCounts]] — same plan on a static DataFrame. */
  def hoppingCountsBatch(events: DataFrame,
                         window_ : String = "1 hour",
                         slide: String = "15 minutes"): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_milli"))

  /**
   * SESSION-window aggregates via Spark's native `session_window`: a
   * dynamic-length window that extends while events keep arriving within
   * `gap` of the LAST event and closes after a quiet gap — per-user
   * activity bursts without fixed boundaries (what tumbling/hopping
   * windows can't express; the declarative sibling of the
   * flatMapGroupsWithState [[sessionize]], with watermark-managed state
   * instead of hand-rolled timeouts). An event at EXACTLY gap after the
   * previous one still MERGES — per-event windows [t, t+gap) join while
   * next.start ≤ current.end, so only a strictly-longer-than-gap quiet
   * period splits (spec-pinned at ±1 µs); `session_end` = last event +
   * gap. Null-ts rows are dropped (the module contract).
   *
   * State at scale: streaming session state is keyed (user, open window)
   * and evicted once the watermark passes `session_end` — bounded by
   * concurrently-active users, not history.
   */
  def sessionCounts(events: DataFrame,
                    gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .filter(col("ts").isNotNull)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("value_milli"))

  /** Batch twin of [[sessionCounts]] — same plan on a static DataFrame. */
  def sessionCountsBatch(events: DataFrame,
                         gap: String = "30 minutes"): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("value_milli"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, n_events: Int, first_ts: Long, last_ts: Long,
                     total_value: Double, closed: Boolean)

  /**
   * Stateful sessionization: per-user sessions closed after `gapMs` of
   * inactivity (flatMapGroupsWithState with processing-time timeout).
   */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(_.copy(closed = true)).iterator
            state.remove()
            out
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            if (events.isEmpty) Iterator.empty
            else {
              var cur = state.getOption
              val closed = Seq.newBuilder[Session]
              events.foreach { ev =>
                val t = ev.ts.getTime
                cur match {
                  case Some(s) if t - s.last_ts <= gapMs =>
                    cur = Some(s.copy(n_events = s.n_events + 1, last_ts = t,
                      total_value = s.total_value + ev.value))
                  case Some(s) =>
                    closed += s.copy(closed = true)
                    cur = Some(Session(userId, 1, t, t, ev.value, closed = false))
                  case None =>
                    cur = Some(Session(userId, 1, t, t, ev.value, closed = false))
                }
              }
              cur.foreach(state.update)
              state.setTimeoutDuration(gapMs)
              closed.result().iterator
            }
          }
      }
  }

  /**
   * Streaming grouped top-N-earliest (the reference's TopX semantics over an
   * unbounded stream): per-key bounded heap held in GroupState, re-emitted
   * on update. State is O(n) per key forever — the streaming twin of
   * Gis.topXAgg.
   */
  def streamingTopX(events: Dataset[Event], n: Int): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[(Long, Long)], (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Seq[(Long, Long)]]) =>
          val prev = state.getOption.getOrElse(Seq.empty)
          val merged = (prev ++ batch.map(e => (e.ts.getTime, e.event_id)))
            .sorted.distinct.take(n)
          state.update(merged)
          merged.iterator.map { case (ts, id) => (userId, ts, id) }
      }
  }

  /**
   * Stream-stream interval join: each error event matched to clicks by the
   * same user within the preceding `intervalMs`, both sides watermarked so
   * join state is bounded.
   */
  def errorClickJoin(events: DataFrame, intervalMs: Long = 10 * 60 * 1000L,
                     watermark: String = "30 minutes"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    errors.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL ${intervalMs / 1000} SECONDS"))
      .select(col("error_id"), col("click_id"), col("user_id"))
  }

  /** Batch twin of [[errorClickJoin]]. */
  def errorClickJoinBatch(events: DataFrame, intervalMs: Long = 10 * 60 * 1000L): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    errors.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL ${intervalMs / 1000} SECONDS"))
      .select(col("error_id"), col("click_id"), col("user_id"))
  }

  /**
   * LEFT OUTER stream-stream interval join: like [[errorClickJoin]], but
   * an error with NO click in its window still emits — with a NULL
   * click_id — and the null row is emitted only once the watermark
   * proves no matching click can still arrive (Spark holds the row in
   * join state until then; the timing is pinned in LateDataSpec). The
   * batch twin is the plain left join, so the oracle-facing semantics
   * are ordinary SQL while the streaming path carries the
   * state-eviction contract.
   */
  def errorClickJoinOuter(events: DataFrame,
                          intervalMs: Long = 10 * 60 * 1000L,
                          watermark: String = "30 minutes"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    errors.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL ${intervalMs / 1000} SECONDS"),
      "left_outer")
      .select(col("error_id"), col("click_id"), col("user_id"))
  }

  /** Batch twin of [[errorClickJoinOuter]]. */
  def errorClickJoinOuterBatch(events: DataFrame,
                               intervalMs: Long = 10 * 60 * 1000L): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    errors.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL ${intervalMs / 1000} SECONDS"),
      "left_outer")
      .select(col("error_id"), col("click_id"), col("user_id"))
  }

  /** Batch sessionization twin: session = cumulative count of gap-breaks per
    * user (classic windowed gaps-and-islands). */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order by the millisecond-truncated time (+ event_id tiebreak) so batch,
    // streaming, and external oracles agree even when events share a ms
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    events
      .withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > gapMs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("first_ts"),
        max(col("ts_ms")).as("last_ts"))
  }

  /**
   * Skew-resistant sessionize: identical output to [[sessionizeBatch]], but
   * the event-level window runs over (user_id, time-bucket), so a hot
   * user's events spread across `buckets` tasks. Phase 2 re-sessionizes the
   * per-bucket SESSION SUMMARIES per user — merging sessions that span a
   * bucket boundary (gap ≤ gapMs across it) and renumbering — which is the
   * same per-user serial pass but over sessions, not events: orders of
   * magnitude smaller on the dense-traffic keys that cause the skew in the
   * first place. (A hot user whose every event is its own session still
   * degrades to the unsalted cost — inherent to emitting per-user ordinals.)
   * Measured at one user owning 50% of 8M rows: 12.5 s → ~5 s.
   *
   * `tsRange` — the (min, max) of `unix_micros(ts) div 1000` when the
   * caller already knows it (partition metadata, an upstream agg) — skips
   * the one-pass span probe job, mirroring [[graft.api.AsofJoin.asofJoinSalted]]'s
   * parameter of the same name. Any superset of the true range is valid
   * (buckets just get coarser).
   */
  def sessionizeBatchSalted(events: DataFrame, gapMs: Long = 30 * 60 * 1000L,
                            buckets: Int = 32,
                            tsRange: Option[(Long, Long)] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events.withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
    val (minTs, maxTs) = tsRange.getOrElse {
      val Array(mn, mx) = e.agg(min(col("ts_ms")), max(col("ts_ms")))
        .head().toSeq.map(v => Option(v).map(_.asInstanceOf[Long]).getOrElse(0L)).toArray
      (mn, mx)
    }
    val span = math.max(1L, maxTs - minTs + 1)
    val tagged = e.withColumn("__b",
      ((col("ts_ms") - lit(minTs)) * lit(buckets.toLong) / lit(span)).cast("int"))

    // phase 1: sessions within (user, bucket) — buckets are time ranges, so
    // in-bucket order is global order restricted to the bucket
    val byUserBucket = Window.partitionBy(col("user_id"), col("__b"))
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    val local = tagged
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(byUserBucket))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > gapMs, 1).otherwise(0))
      .withColumn("local_idx", sum(col("new_session")).over(
        byUserBucket.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__b"), col("local_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("first_ts"),
        max(col("ts_ms")).as("last_ts"))

    // phase 2: sessionize the summaries (sessions are time-disjoint and
    // bucket boundaries are time boundaries, so first_ts order is global
    // session order); boundary sessions with cross-bucket gap ≤ gapMs merge
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("first_ts").asc)
    local
      .withColumn("prev_last", lag(col("last_ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_last").isNull || col("first_ts") - col("prev_last") > gapMs, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(sum(col("n_events")).as("n_events"),
        min(col("first_ts")).as("first_ts"),
        max(col("last_ts")).as("last_ts"))
  }

  /** A kept (rate-limit survivor) event — [[throttleStream]] output row. */
  case class Kept(user_id: Long, event_type: String, event_id: Long,
                  ts_us: Long)

  /**
   * Streaming twin of [[graft.pipeline.EventAnalytics.throttle]]: per
   * (user_id, event_type), emit an event iff it is the key's first or at
   * least `minGapMs` after the last KEPT event; GroupState carries the
   * last-kept micros timestamp across micro-batches.
   *
   * Arrival contract (same family as `dedupLinesStream`'s): within a key,
   * event time must be non-decreasing ACROSS batches — the decision state
   * is a single watermark-free scalar, so a late event older than the last
   * kept one would be throttled against the wrong anchor. Within one
   * batch the group iterator is re-sorted by (ts_us, event_id), so any
   * intra-batch order is fine. Under that contract the emitted set equals
   * the batch operator's output on the concatenated input. State is one
   * long per active key and never expires (NoTimeout) — bound it upstream
   * by key cardinality, as with the other decision twins.
   */
  def throttleStream(events: Dataset[Event], minGapMs: Long): Dataset[Kept] = {
    import events.sparkSession.implicits._
    val gapUs = minGapMs * 1000L
    events
      .filter(e => e.ts != null) // null-ts contract of the batch twin
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, Kept](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((uid, etype), batch, state) =>
          val sorted = batch.toSeq.sortBy { e =>
            val i = e.ts.toInstant
            (i.getEpochSecond * 1000000L + i.getNano / 1000L, e.event_id)
          }
          var last = state.getOption.getOrElse(-1L)
          val out = Seq.newBuilder[Kept]
          sorted.foreach { e =>
            val i = e.ts.toInstant
            val t = i.getEpochSecond * 1000000L + i.getNano / 1000L
            if (last == -1L || t - last >= gapUs) {
              last = t
              out += Kept(uid, etype, e.event_id, t)
            }
          }
          state.update(last)
          out.result().iterator
      }
  }

  /** [[decayedCountsStream]] output row: a key's decayed score AS OF its
    * latest observed period. */
  case class Decayed(key: String, period: Long, decayed: Long)

  /**
   * Streaming twin of [[graft.pipeline.EventAnalytics.decayedCounts]],
   * keyed by event_type: GroupState holds (last folded period, score);
   * each batch buckets its events to periods, walks every period from
   * the state's period + 1 through the batch's last — gap periods decay
   * with the IDENTICAL truncating step `s = (s·α) div 1000 + n`, so the
   * emitted score equals the batch operator's (key, period, decayed) row
   * at the key's latest period over the events seen so far (the batch op
   * additionally decays every key to the GLOBAL end for cross-key
   * comparability; apply the same α-steps to align ends). In-order
   * arrival contract as the rest of the family; null-ts/null-key events
   * ignored (the batch contract). State is two longs per key, NoTimeout.
   */
  def decayedCountsStream(events: Dataset[Event], alphaPermille: Int,
                          periodDays: Int = 1): Dataset[Decayed] = {
    import events.sparkSession.implicits._
    require(alphaPermille >= 0 && alphaPermille <= 1000,
      s"alphaPermille must be in [0, 1000], got $alphaPermille")
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val periodUs = periodDays * 86400L * 1000000L
    events
      .filter(e => e.ts != null && e.event_type != null)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Long), Decayed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, batch, state) =>
          val periods = batch.map { e =>
            val i = e.ts.toInstant
            (i.getEpochSecond * 1000000L + i.getNano / 1000L) / periodUs
          }.toSeq
          if (periods.isEmpty) Iterator.empty
          else {
            val counts = periods.groupBy(identity)
              .map { case (p, xs) => p -> xs.size.toLong }
            var (last, s) = state.getOption.getOrElse((periods.min - 1, 0L))
            val end = math.max(last, periods.max)
            var p = last + 1
            while (p <= end) {
              s = s * alphaPermille / 1000 + counts.getOrElse(p, 0L)
              p += 1
            }
            state.update((end, s))
            Iterator.single(Decayed(key, end, s))
          }
      }
  }

  /** A closed-bucket CUSUM row — [[cusumStream]] output. */
  case class CusumAlarm(event_type: String, bucket_start: Long, x: Long,
                        s: Long, alarm: Long)

  /**
   * Streaming twin of
   * [[graft.pipeline.EventAnalytics.cusumFrozen]]: the per-key Page
   * recursion Sₜ = max(0, Sₜ₋₁ + xₜ − target − slack) over CLOSED time
   * buckets, with FROZEN per-key (target, slack, h) from a profiling
   * run — the live ingest-drift alarm. A bucket closes (and emits its
   * row) when a LATER bucket's first event arrives for the key; each
   * key's final bucket stays pending in state, so the stream equals the
   * batch replay minus each key's last bucket — the day's alarm fires
   * when the day completes, the natural monitoring contract. Keys
   * absent from `frozen` drop (explicit manifest). In-order arrival
   * contract as the rest of the decision-twin family; state per key is
   * three longs (pending bucket, pending sum, running S), NoTimeout.
   */
  def cusumStream(events: Dataset[Event],
                  frozen: Map[String, (Long, Long, Long)],
                  bucketSeconds: Long = 86400L): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    require(bucketSeconds > 0, s"bucketSeconds must be > 0: $bucketSeconds")
    require(frozen.nonEmpty, "frozen parameter map must be non-empty")
    val bucketUs = bucketSeconds * 1000000L
    events
      .filter(e => e.ts != null && frozen.contains(e.event_type))
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Long, Long), CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, batch, state) =>
          val (target, slack, h) = frozen(key)
          val sums = scala.collection.mutable.TreeMap.empty[Long, Long]
          batch.foreach { e =>
            val i = e.ts.toInstant
            val us = i.getEpochSecond * 1000000L + i.getNano / 1000L
            val b = us / bucketUs
            sums(b) = sums.getOrElse(b, 0L) + roundCents(e.value)
          }
          if (sums.isEmpty) Iterator.empty
          else {
            var (pb, px, s) = state.getOption
              .getOrElse((Long.MinValue, 0L, 0L))
            if (pb != Long.MinValue)
              sums(pb) = sums.getOrElse(pb, 0L) + px
            val keys = sums.keys.toSeq // ascending (TreeMap)
            val out = keys.dropRight(1).map { b =>
              val x = sums(b)
              s = math.max(0L, s + x - target - slack)
              CusumAlarm(key, b * bucketSeconds, x, s,
                if (s > h) 1L else 0L)
            }
            val last = keys.last
            state.update((last, sums(last), s))
            out.iterator
          }
      }
  }

  /** A per-key running TWAP row — [[twapStream]] output. */
  case class TwapRunning(event_type: String, n_intervals: Long, dur_us: Long,
                         weighted_cents_us: Long, twap_cents: Long)

  /**
   * Streaming twin of [[graft.pipeline.EventAnalytics.twap]]: the
   * last-observation-carried-forward step integral, with each key's last
   * (ts, event_id, cents) observation held in GroupState so intervals
   * SPAN micro-batches. Each batch folds its events in (ts, event_id)
   * order — every event after the key's first closes one interval
   * (zero-length ties included, the batch convention) — and emits ONE
   * row per key with the RUNNING totals; the final emission per key
   * equals the batch operator's row exactly (a key that has seen only
   * one observation emits nothing, the batch n_intervals > 0 contract).
   * Cents rounding via [[roundCents]] (SQL HALF_UP). In-order arrival
   * contract as the rest of the decision-twin family; state is four
   * longs + the running triple per key, NoTimeout.
   */
  def twapStream(events: Dataset[Event]): Dataset[TwapRunning] = {
    import events.sparkSession.implicits._
    // state: (lastUs, lastEventId, lastCents, n, dur, w)
    events
      .filter(e => e.ts != null && e.event_type != null)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long, Long), TwapRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, batch, state) =>
          val sorted = batch.map { e =>
            val i = e.ts.toInstant
            (i.getEpochSecond * 1000000L + i.getNano / 1000L, e.event_id,
              roundCents(e.value))
          }.toSeq.sortBy(t => (t._1, t._2))
          if (sorted.isEmpty) Iterator.empty
          else {
            var (lastUs, lastEid, lastCents, n, dur, w) =
              state.getOption.getOrElse((Long.MinValue, 0L, 0L, 0L, 0L, 0L))
            var init = state.getOption.isDefined
            sorted.foreach { case (us, eid, cents) =>
              if (init) {
                n += 1
                dur += us - lastUs
                w += lastCents * (us - lastUs)
              }
              lastUs = us; lastEid = eid; lastCents = cents; init = true
            }
            state.update((lastUs, lastEid, lastCents, n, dur, w))
            if (n > 0)
              Iterator.single(TwapRunning(key, n, dur, w, w / math.max(dur, 1L)))
            else Iterator.empty
          }
      }
  }

  /** A windowed-funnel conversion — [[funnelWindowStream]] output row. */
  case class Conversion(user_id: Long, conv_ts: Long)

  /**
   * Streaming twin of [[graft.pipeline.EventAnalytics.funnelWindow]]: the
   * same latest-start DP, with the per-step dp array and the converted
   * flag in GroupState; emits one [[Conversion]] per user at the moment
   * the first valid chain completes (earliest completion, exactly the
   * batch `conv_ts`). Users that never convert emit nothing — the batch
   * twin lists them with converted = 0. In-order arrival contract as the
   * rest of the family; state is `steps.size + 1` longs per user,
   * NoTimeout.
   */
  def funnelWindowStream(events: Dataset[Event], steps: Seq[String],
                         windowMs: Long): Dataset[Conversion] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"funnel steps must be non-empty and distinct, got $steps")
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.size
    val windowUs = windowMs * 1000L
    events
      .filter(e => e.ts != null && stepIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], Conversion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Array[Long]]) =>
          // state layout: dp(0..k-1) ++ conv at index k, -1 = unset
          val st = state.getOption.getOrElse(Array.fill(k + 1)(-1L))
          val sorted = batch.toSeq.sortBy { e =>
            val i = e.ts.toInstant
            (i.getEpochSecond * 1000000L + i.getNano / 1000L, e.event_id)
          }
          val out = Seq.newBuilder[Conversion]
          sorted.foreach { e =>
            val s = stepIdx(e.event_type)
            val i = e.ts.toInstant
            val t = i.getEpochSecond * 1000000L + i.getNano / 1000L
            val chainOk =
              s == 0 || (st(s - 1) != -1L && t - st(s - 1) <= windowUs)
            if (chainOk) {
              val start = if (s == 0) t else st(s - 1)
              st(s) = math.max(st(s), start)
              if (s == k - 1 && st(k) == -1L) {
                st(k) = t
                out += Conversion(uid, t)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** A consecutive event-type pair — [[transitionsStream]] output row. */
  case class Transition(user_id: Long, prev_type: String, event_type: String)

  /**
   * Streaming twin of [[graft.pipeline.EventAnalytics.transitions]]'
   * pair stream: per user, emit each consecutive (prev_type, event_type)
   * pair; GroupState carries the last event type so pairs span
   * micro-batches. Aggregating the emitted pairs (count per pair, then
   * the permille share) reproduces the batch report exactly under the
   * in-order arrival contract shared by the other event twins. State is
   * one string per user, NoTimeout.
   */
  def transitionsStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.ts != null) // null-ts contract of the batch twin
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[String]) =>
          val sorted = batch.toSeq.sortBy { e =>
            val i = e.ts.toInstant
            (i.getEpochSecond * 1000000L + i.getNano / 1000L, e.event_id)
          }
          var prev = state.getOption.orNull
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            if (prev != null) out += Transition(uid, prev, e.event_type)
            prev = e.event_type
          }
          if (prev != null) state.update(prev)
          out.result().iterator
      }
  }

  /** A per-(key, period) integer series point — [[rollingAnomaliesStream]]
    * input row (the shape [[graft.pipeline.EventAnalytics.gapFill]] emits,
    * with `x` the unit-scaled metric). */
  case class SeriesPoint(user_id: Long, period: Long, x: Long)

  /** A flagged series point — [[rollingAnomaliesStream]] output row; same
    * columns and arithmetic as the batch operator's. */
  case class AnomalyFlag(user_id: Long, period: Long, x: Long,
                         n_window: Long, dev2_scaled: Long,
                         bound_scaled: Long, is_anomaly: Long)

  /**
   * Streaming twin of [[graft.pipeline.EventAnalytics.rollingAnomalies]]:
   * the same exact-integer z-test — flag iff
   * (n·x − Σx)² > k²·(n·Σx² − (Σx)²) over the trailing `window` points —
   * evaluated online. GroupState carries the last `window − 1` x values
   * per key (a bounded ring of longs), so the trailing frame spans
   * micro-batches and each point is scored exactly once, on arrival —
   * the live-dashboard form of the batch detector.
   *
   * Arrival contract (the family's): per key, `period` non-decreasing
   * ACROSS batches (within a batch the iterator is re-sorted by period);
   * the series is expected dense per key — feed gapFill-shaped output,
   * as the batch twin documents. Under that contract the emitted flags
   * equal the batch operator's rows on the concatenated series. State is
   * ≤ window − 1 longs per key, NoTimeout.
   */
  def rollingAnomaliesStream(points: Dataset[SeriesPoint], k: Int = 3,
                             window: Int = 7, minPeriods: Int = 3)
      : Dataset[AnomalyFlag] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(window >= 2 && minPeriods >= 2 && minPeriods <= window,
      s"need 2 <= minPeriods <= window, got $minPeriods/$window")
    import points.sparkSession.implicits._
    points
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[SeriesPoint], state: GroupState[Seq[Long]]) =>
          var hist = state.getOption.getOrElse(Seq.empty)
          val out = batch.toSeq.sortBy(_.period).map { p =>
            val frame = hist.takeRight(window - 1) :+ p.x
            val n = frame.size.toLong
            val s = frame.sum
            val s2 = frame.map(v => v * v).sum
            val dev2 = (n * p.x - s) * (n * p.x - s)
            val bound = k.toLong * k * (n * s2 - s * s)
            hist = (hist :+ p.x).takeRight(window - 1)
            AnomalyFlag(uid, p.period, p.x, n, dev2, bound,
              if (n >= minPeriods && dev2 > bound) 1L else 0L)
          }
          state.update(hist)
          out.iterator
      }
  }

  /** A funnel step completion — [[funnelStream]] output row. `stage` is
    * 1-based (stage i ⇔ `steps(i-1)` completed at `ts_us`). */
  case class StageAdvance(user_id: Long, stage: Int, ts_us: Long)

  /**
   * Streaming twin of [[graft.pipeline.EventAnalytics.funnel]]: per user,
   * emit a [[StageAdvance]] the moment each funnel step first completes
   * (earliest-completion, strictly-after semantics — identical decision
   * rule). GroupState carries the per-step completion times, so a funnel
   * can advance across micro-batches; each stage is emitted at most once
   * per user, ever.
   *
   * Arrival contract: per user, event time non-decreasing ACROSS batches
   * (within a batch the iterator is re-sorted). Under it, the advances
   * reproduce the batch operator exactly: a user's max emitted stage is
   * the batch `stage`, and each advance's ts_us is the batch `ts_i`.
   * Users that never complete step 1 emit nothing (the batch twin lists
   * them with stage 0). State is `steps.size` longs per user, NoTimeout.
   */
  def funnelStream(events: Dataset[Event],
                   steps: Seq[String]): Dataset[StageAdvance] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"funnel steps must be non-empty and distinct, got $steps")
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.size
    events
      .filter(e => e.ts != null && stepIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], StageAdvance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Array[Long]]) =>
          val done = state.getOption.getOrElse(Array.fill(k)(-1L))
          val sorted = batch.toSeq.sortBy { e =>
            val i = e.ts.toInstant
            (i.getEpochSecond * 1000000L + i.getNano / 1000L, e.event_id)
          }
          val out = Seq.newBuilder[StageAdvance]
          sorted.foreach { e =>
            val s = stepIdx(e.event_type)
            if (done(s) == -1L) {
              val i = e.ts.toInstant
              val t = i.getEpochSecond * 1000000L + i.getNano / 1000L
              if (s == 0 || (done(s - 1) != -1L && t > done(s - 1))) {
                done(s) = t
                out += StageAdvance(uid, s + 1, t)
              }
            }
          }
          state.update(done)
          out.result().iterator
      }
  }
}
