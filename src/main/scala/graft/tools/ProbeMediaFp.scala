package graft.tools

import org.apache.spark.sql.functions._

/** Fingerprint-structure probe for the media dedup family: distinct
  * (format, h0, h1) count vs items, and the hamming histogram of the
  * pair table — tells whether an equal-fingerprint collapse (the
  * hamming-0 graph-equivalence rewrite) pays on a given corpus. */
object ProbeMediaFp {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val spark = Probe.session("graft-probe-media-fp")
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val media = graft.pipeline.Multimodal.demoContainerTable(
      spark, docs, "doc_id", "text")
    val hashes = graft.pipeline.Multimodal.perceptualHashes(spark, media)
      .toDF().cache()
    val n = hashes.count()
    val distinct = hashes.select("format", "h0", "h1").distinct().count()
    println(s"[probe-media-fp] $sfDir items=$n distinct_fp=$distinct " +
      f"(collapse factor ${n.toDouble / distinct}%.1f)")
    val pairs = graft.pipeline.Dedup.hash64Pairs(hashes, "media_id", "format")
    pairs.groupBy(col("hamming")).agg(count(lit(1)).as("n"))
      .orderBy(col("hamming")).collect()
      .foreach(r => println(s"[probe-media-fp] hamming=${r.getLong(0)} pairs=${r.getLong(1)}"))
    hashes.unpersist()
    spark.stop()
  }
}
