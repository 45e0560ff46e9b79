package graft.streaming

import graft.pipeline.{Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the `documents` table shape
 * (doc_id, text, lang, source, n_chars) — the ingestion-time half of a
 * training-data pipeline: as document files land, they are quality-scored,
 * deterministically sampled, and scanned for benchmark contamination
 * BEFORE anything accumulates state.
 *
 * All three twins reuse the batch operators unchanged: they are built
 * purely from stateless codegen'd expressions (sample, quality) or a
 * streaming-supported aggregation (contamination), so the exact same plan
 * fragment runs incrementally — the twin guarantee is structural, not a
 * re-implementation. Tests pin streaming output == batch output on the
 * same files.
 */
object DocStreams {

  val docFileSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming file source over a directory of document parquet files. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.configure(spark)
    spark.readStream.schema(docFileSchema).parquet(dir)
  }

  /** Streaming deterministic sample: the md5-threshold filter is stateless,
    * so selection is identical to the batch pass at any micro-batch split —
    * the property that makes sampled corpus curation auditable. */
  def sampledStream(docs: DataFrame, fraction: Double): DataFrame =
    Sampling.deterministicFraction(docs, "doc_id", fraction)

  /** Streaming quality scoring: stateless projection, appended per row. */
  def qualityStream(docs: DataFrame): DataFrame =
    TextAnalysis.withQualityScore(docs, "text")

  /** Streaming contamination scan: broadcast probe join + streaming
    * aggregate; emit with Update/Complete mode. State is O(|probes|). */
  def contaminationStream(docs: DataFrame, probes: Seq[String]): DataFrame =
    TextAnalysis.contaminationProbes(docs, probes)
}
