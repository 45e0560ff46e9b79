package graft.tools

import org.apache.spark.sql.functions._

/**
 * Verdict-r12 #2 probe: the REALISTIC small-delta point for incremental
 * keep-list maintenance, next to the all-components-touched worst case the
 * r12 probe measured. Shape = the lake cadence:
 *
 *   one-time (corpus at rest, not part of the marginal cost):
 *     - chunk-sorted minhash index over the 99% "corpus" slice
 *     - component labels of the corpus ([[Dedup.minhashLshLabels]] — the
 *       round-13 connectivity-sufficient path, so the base labeling is
 *       itself linear)
 *   per arriving batch (the MARGINAL cost this probe times):
 *     - batch-internal pairs (minhashLshPairs on the 1% batch)
 *     - batch-vs-corpus pairs (dedupAgainstIndex — index probe, no corpus
 *       re-scan)
 *     - clusterKeepListIncremental fold -> keep-list of the union
 *
 * Prints one JSON line per scale dir: marginal batch seconds vs the
 * from-scratch textKeepList over the union, and their ratio.
 */
object ProbeIncrKeeplist {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    val spark = Probe.session("graft-probe-incr-keeplist")
    spark.sparkContext.setLogLevel("WARN")
    val out = dirs.map { dir =>
      val docs = graft.sources.Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
      val base = docs.filter(pmod(col("doc_id"), lit(100)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
      val idx = s"/tmp/graft_incr_idx_${java.util.UUID.randomUUID().toString.take(8)}"
      // one-time corpus artifacts
      val t0 = System.nanoTime()
      graft.pipeline.Dedup.writeMinhashIndex(base, idx)
      val labels = graft.pipeline.Checkpoints.materialize(
        graft.pipeline.Dedup.minhashLshLabels(base, "doc_id", "text"), None)
      labels.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      // marginal batch cost
      val t1 = System.nanoTime()
      val vsCorpus = graft.pipeline.Dedup.dedupAgainstIndex(spark, idx, batch, base)
        .select(col("new_id").as("id_a"), col("corpus_id").as("id_b"))
      val internal = graft.pipeline.Dedup.minhashLshPairs(batch, "doc_id", "text")
        .select(col("id_a"), col("id_b"))
      val keep = graft.pipeline.Dedup.clusterKeepListIncremental(
        labels, vsCorpus.unionByName(internal), docs, "doc_id", "n_chars")
      val keepRows = keep.count()
      val marginalSec = (System.nanoTime() - t1) / 1e9
      // from-scratch reference over the union
      val t2 = System.nanoTime()
      val fullRows = graft.pipeline.Dedup.textKeepList(docs, "doc_id", "text", "n_chars").count()
      val fullSec = (System.nanoTime() - t2) / 1e9
      assert(keepRows == fullRows, s"row mismatch: incr $keepRows vs full $fullRows")
      println(f"[probe-incr] $dir build=$buildSec%.2fs marginal=$marginalSec%.2fs " +
        f"full=$fullSec%.2fs marginal/full=${marginalSec / fullSec}%.3f")
      f""""$dir":{"one_time_build_sec":$buildSec%.2f,"marginal_batch_sec":$marginalSec%.2f,"full_recompute_sec":$fullSec%.2f,"marginal_over_full":${marginalSec / fullSec}%.3f,"rows":$keepRows}"""
    }
    println(s"""{"probe":"incr_keeplist_small_delta","delta":"1pct","queries":${out.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
