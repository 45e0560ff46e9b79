package graft.tools

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/**
 * Forced-shuffle exercise of [[graft.pipeline.Dedup.ngramJaccardPairs]]'
 * candidate-volume guard on a REPLICA-DEGENERATE corpus (every doc
 * replicated `SPARK_GRAFT_REPLICAS`×, the shape that ENOSPC'd the
 * containment shuffle path in r10): runs the operator on the FORCED
 * shuffle verify path (corpusSizeHint = -1; auto sizing would broadcast
 * this corpus) twice, once at the default 16 GiB budget and once at a
 * deliberately tiny budget that must trip the guard, printing the
 * observed guard/cap metrics each time. Pass criteria (printed, asserted):
 * both runs COMPLETE; the tiny-budget run records
 * guard_kept_candidates < guard_total_candidates and a reduced
 * guard_effective_cap — capped with observable drops, never silent.
 */
object ProbeNgramGuard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    val spark = Probe.session("graft-probe-ngram-guard")
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = (0 until replicas).map(i =>
        docs.select((col("doc_id") * replicas + i).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    println(s"[probe-ngram-guard] sfDir=$sfDir replicas=$replicas " +
      s"corpus=${corpus.count()} docs")

    def run(label: String, budget: Long): (Long, Map[String, Any]) = {
      val obs = new Observation(s"ngram-guard-$label")
      val t0 = System.nanoTime()
      // corpusSizeHint = -1: FORCE the shuffle path (auto sizing would
      // broadcast this corpus and the guard would rightly never engage)
      val pairs = graft.pipeline.Dedup.ngramJaccardPairs(
        corpus, "doc_id", "text", metrics = Some(obs),
        corpusSizeHint = -1L, maxVerifyBytes = budget).count()
      println(f"[probe-ngram-guard] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs, " +
        s"pairs=$pairs")
      val m = obs.get
      println(s"[probe-ngram-guard] $label metrics: ${m.toSeq.sortBy(_._1).mkString(", ")}")
      (pairs, m)
    }

    val (pairsDefault, mDefault) = run("default-budget", 16L << 30)
    // a budget small enough that the replica corpus MUST trip the guard
    // hard (but not so small the capped result is EMPTY: AQE's
    // empty-relation propagation then rewrites away the metrics node —
    // the stderr guard log is the observable in that last extreme)
    val (pairsTiny, mTiny) = run("tiny-budget", 256L << 20)
    val total = mTiny("guard_total_candidates").asInstanceOf[Number].longValue
    val kept = mTiny("guard_kept_candidates").asInstanceOf[Number].longValue
    val cap = mTiny("guard_effective_cap").asInstanceOf[Number].longValue
    assert(kept < total,
      s"tiny budget must record drops: kept=$kept total=$total")
    assert(cap < 10000, s"tiny budget must reduce the cap: $cap")
    assert(pairsTiny <= pairsDefault,
      "capped run can only lose pairs, never invent them")
    println(s"[probe-ngram-guard] OK: default pairs=$pairsDefault " +
      s"(guard total=${mDefault("guard_total_candidates")}), tiny-budget " +
      s"pairs=$pairsTiny kept=$kept/$total cap=$cap — observable drops, no ENOSPC")
    spark.stop()
  }
}
