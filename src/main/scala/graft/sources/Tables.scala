package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Typed loaders for the engine's parquet tables.
 *
 * The `events` table is written with TIMESTAMP(NANOS) precision, which the
 * vectorized parquet reader rejects unless
 * `spark.sql.legacy.parquet.nanosAsLong` is set; we read nanos as long and
 * convert to microsecond TimestampType (truncation, matching what any
 * micros-based engine sees).
 */
object Tables {

  /** Set once per session; runtime-settable. */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /**
   * The events `ts` column has shipped under two parquet schemas:
   * nanos-annotated INT64 (which Spark surfaces as a nanos long under
   * `nanosAsLong` — truncate to micros) and plain micros TIMESTAMP with
   * isAdjustedToUTC=false (which Spark surfaces as TIMESTAMP_NTZ).
   * Normalize both to TimestampType so downstream `unix_micros`
   * arithmetic is schema-independent; the NTZ→TZ cast is wall-clock-
   * preserving because every session here pins spark.sql.session.timeZone
   * to UTC — the same micros DuckDB's `epoch_us(ts)` reads.
   */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  // DataFrame (logical plan) cache: avoids re-listing files and re-reading
  // parquet footers on every query of a multi-query run. Weakly keyed by
  // session so stopped sessions (and their plans) can be collected.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]())

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        cache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((sfDir, name), { _ =>
      configure(spark)
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events") normalizeEventTs(df) else df
    })
  }

  // Row-count cache: a parquet count() is metadata-cheap but still a job;
  // gate queries that pass counts as PLAN-BUILD hints (broadcast byte
  // budgets, LSH auto-tune) should not pay it once per invocation.
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  /** Cached row count per (sfDir, table) — computed once per JVM. */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long =
    countCache.computeIfAbsent((sfDir, name),
      _ => java.lang.Long.valueOf(table(spark, sfDir, name).count())).longValue()
}
