package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * JSONL (newline-delimited JSON) ingest with corrupt-line quarantine —
 * the crawl-dump reality at 100 TB: a fraction of lines is always
 * truncated/mangled (mid-write kills, encoding damage), and a reader
 * that either crashes (FAILFAST) or silently drops them (DROPMALFORMED)
 * is operationally wrong. PERMISSIVE mode with an explicit
 * corrupt-record column keeps every line observable: good rows parse
 * into the declared schema, bad rows land with the raw line in
 * `_corrupt` and null data fields — so the pipeline can count, sample,
 * and quarantine them instead of guessing.
 *
 * The schema is DECLARED, never inferred: inference is a full extra
 * pass over the data (2× the ingest scan at lake scale) and
 * non-deterministic under corpus drift — a schema contract belongs to
 * the caller. Scale shape: one scan, per-line parse, no shuffle;
 * everything downstream is ordinary projections.
 *
 * Caveat (Spark PERMISSIVE semantics): fields parsed BEFORE the
 * malformation point may be populated alongside `_corrupt` — classify
 * rows by `_corrupt IS NOT NULL`, never by data-field nullness, and
 * exclude corrupt rows from aggregates explicitly.
 */
object Jsonl {

  /** Read `path` as JSONL against the DDL schema, quarantining malformed
    * lines into a `_corrupt` column (raw line; null for good rows). */
  def readQuarantined(spark: SparkSession, path: String,
                      ddl: String): DataFrame = {
    val schema = StructType.fromDDL(ddl).add("_corrupt", StringType)
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }
}
