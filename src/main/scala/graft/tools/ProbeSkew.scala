package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Skew probe for the window-partitioned operators (VERDICT r2 item 9):
 * times asofJoin and sessionizeBatch on a uniform corpus vs one where a
 * single hot user owns `hotShare` of all rows — the worst case for
 * Window.partitionBy(user_id), where the hot key lands on one task.
 *
 *   sbt "runMain graft.tools.ProbeSkew [rows] [hotShare]"
 */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 2000000L
    val hotShare = if (args.length > 1) args(1).toDouble else 0.5
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("probe-skew")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic events: uniform = id-hash user spread over
    // 100k users; skewed = first hotShare of rows all belong to user 0
    def corpus(skewed: Boolean): DataFrame = {
      val hotCut = (rows * hotShare).toLong
      spark.range(rows).select(
        col("id").as("event_id"),
        (if (skewed) when(col("id") < hotCut, 0L)
          .otherwise(pmod(hash(col("id")), lit(100000)).cast("long"))
         else pmod(hash(col("id")), lit(100000)).cast("long")).as("user_id"),
        // ~1 event/user/minute, hot user sees one event per 20ms => sessions
        timestamp_micros((lit(1700000000000000L) +
          pmod(hash(col("id"), lit(7)), lit(86400000L)) * 1000L)).as("ts"),
        when(pmod(col("id"), lit(5)) === 0, "error").otherwise("click").as("event_type"))
    }

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[skew] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    for (skewed <- Seq(false, true)) {
      val tag = if (skewed) "skewed " else "uniform"
      val ev = corpus(skewed).cache()
      ev.count()
      t(s"$tag sessionize        ") {
        graft.streaming.EventStreams.sessionizeBatch(ev, gapMs = 60000L).count()
      }
      t(s"$tag sessionize salted ") {
        graft.streaming.EventStreams.sessionizeBatchSalted(ev, gapMs = 60000L).count()
      }
      def asofWith(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Long = {
        val e = ev.withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"), col("ts_ms"))
        val clicks = e.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts_ms"))
          .agg(max(col("event_id")).as("event_id"))
        f(errors, clicks).count()
      }
      t(s"$tag asof              ") {
        asofWith((l, r) => graft.api.AsofJoin.asofJoin(l, r,
          keyCol = "user_id", leftTsCol = "ts_ms", rightTsCol = "ts_ms",
          rightPayload = Seq("event_id"), rightIdCol = "event_id"))
      }
      t(s"$tag asof salted       ") {
        asofWith((l, r) => graft.api.AsofJoin.asofJoinSalted(l, r,
          keyCol = "user_id", leftTsCol = "ts_ms", rightTsCol = "ts_ms",
          rightPayload = Seq("event_id"), rightIdCol = "event_id"))
      }
      t(s"$tag asof salted+range ") {
        asofWith((l, r) => graft.api.AsofJoin.asofJoinSalted(l, r,
          keyCol = "user_id", leftTsCol = "ts_ms", rightTsCol = "ts_ms",
          rightPayload = Seq("event_id"), rightIdCol = "event_id",
          tsRange = Some((1700000000000L, 1700000000000L + 86400000L))))
      }
      ev.unpersist()
    }
    spark.stop()
  }
}
