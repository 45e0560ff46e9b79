package graft.tools

import org.apache.spark.sql.functions._

/**
 * Incremental keep-list maintenance probe — the q_dedup_keeplist_incr lake
 * shape with PER-STAGE timing, at a configurable batch fraction:
 *
 *   one-time (corpus at rest):
 *     - chunk-sorted minhash index over the (1 − 1/mod) "corpus" slice
 *     - component labels REGROUPED from that index
 *       ([[graft.pipeline.Dedup.minhashLshLabelsFromIndex]] — no second
 *       signature pass)
 *   per arriving batch (the marginal cost):
 *     - batch-internal star edges (linear [[Dedup.minhashLshLabels]])
 *     - batch-vs-corpus connective edges
 *       ([[Dedup.dedupAgainstIndexConnective]] — one verified edge per
 *       (batch doc, corpus component) + exact residue round)
 *     - [[Dedup.clusterKeepListIncremental]] fold → keep-list of the union
 *
 * Prints one JSON line per scale dir with stage seconds, the marginal
 * total vs the from-scratch textKeepList, and a row-equality check.
 *
 *   sbt "runMain graft.tools.ProbeIncrKeeplist <mod> <dir> [dir ...]"
 */
object ProbeIncrKeeplist {
  def main(args: Array[String]): Unit = {
    val mod = if (args.nonEmpty) args(0).toInt else 100
    val dirs = if (args.length > 1) args.drop(1).toSeq
               else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    val spark = Probe.session("graft-probe-incr-keeplist")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val out = dirs.map { dir =>
      val docs = graft.sources.Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
      val base = docs.filter(pmod(col("doc_id"), lit(mod)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(mod)) === 0)
      val idx = s"/tmp/graft_incr_idx_${java.util.UUID.randomUUID().toString.take(8)}"
      // one-time corpus artifacts
      val (_, idxSec) = t { graft.pipeline.Dedup.writeMinhashIndex(base, idx) }
      val (labels, labSec) = t {
        val l = graft.pipeline.Checkpoints.materialize(
          graft.pipeline.Dedup.minhashLshLabels(base, "doc_id", "text"), None)
        l.count(); l
      }
      // the from-index regroup, timed for the trade-off record: on this
      // short-doc corpus re-signing beats the band+sig join regroup; at a
      // real text ≫ index ratio the trade inverts (see the scaladoc)
      val (_, labIdxSec) = t {
        graft.pipeline.Dedup.minhashLshLabelsFromIndex(spark, idx, base).count()
      }
      // marginal batch cost, stage by stage
      val (internal, intSec) = t {
        val i = graft.pipeline.Checkpoints.materialize(
          graft.pipeline.Dedup.minhashLshLabels(batch, "doc_id", "text"), None)
        i.count(); i
      }
      val (cross, crossSec) = t {
        val cr = graft.pipeline.Checkpoints.materialize(
          graft.pipeline.Dedup.dedupAgainstIndexConnective(
            spark, idx, batch, base, labels)
            .select(col("new_id").as("id_a"), col("corpus_id").as("id_b")), None)
        cr.count(); cr
      }
      val (keepRows, foldSec) = t {
        graft.pipeline.Dedup.clusterKeepListIncremental(
          labels,
          cross.unionByName(internal
            .select(col("id").as("id_a"), col("cluster").as("id_b"))),
          docs, "doc_id", "n_chars").count()
      }
      val marginalSec = intSec + crossSec + foldSec
      // from-scratch reference over the union
      val (fullRows, fullSec) = t {
        graft.pipeline.Dedup.textKeepList(docs, "doc_id", "text", "n_chars").count()
      }
      assert(keepRows == fullRows, s"row mismatch: incr $keepRows vs full $fullRows")
      println(f"[probe-incr] $dir mod=$mod idx=$idxSec%.2f lab=$labSec%.2f " +
        f"labFromIdx=$labIdxSec%.2f int=$intSec%.2f cross=$crossSec%.2f " +
        f"fold=$foldSec%.2f marginal=$marginalSec%.2fs full=$fullSec%.2fs " +
        f"marginal/full=${marginalSec / fullSec}%.3f")
      f""""$dir":{"index_build_sec":$idxSec%.2f,"labels_sec":$labSec%.2f,"labels_from_index_sec":$labIdxSec%.2f,"batch_internal_sec":$intSec%.2f,"cross_connective_sec":$crossSec%.2f,"fold_sec":$foldSec%.2f,"marginal_batch_sec":$marginalSec%.2f,"full_recompute_sec":$fullSec%.2f,"marginal_over_full":${marginalSec / fullSec}%.3f,"rows":$keepRows}"""
    }
    println(s"""{"probe":"incr_keeplist","batch_mod":$mod,"queries":${out.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
