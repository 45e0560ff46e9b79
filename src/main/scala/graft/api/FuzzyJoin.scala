package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance (Levenshtein ≤ τ) similarity join — the fuzzy record-
 * linkage / near-identical-title join a curation pipeline runs when
 * near-duplicates differ by typos rather than shared shingles (n-gram
 * Jaccard misses a one-char edit inside every gram; edit distance is the
 * right metric for short keys: titles, names, URLs, product strings).
 *
 * Algorithm: PassJoin segment blocking (Li, Deng, Wang, Feng,
 * "PassJoin: A Partition-based Method for Similarity Joins", VLDB 2012)
 * — the pigeonhole principle over τ+1 contiguous segments:
 *
 *  - INDEX side: each string of length l is split into τ+1 segments
 *    (even split, longer segments last); if ed(s, t) ≤ τ, an optimal
 *    alignment edits at most τ segments, so AT LEAST ONE segment of s
 *    appears in t verbatim, start-shifted by at most τ.
 *  - PROBE side: each string of length m emits, for every compatible
 *    index length l ∈ [m−τ, m+τ] and every segment slot i, the
 *    substrings at start shift ∈ [−τ, τ] — a CONSTANT ≤ (2τ+1)²(τ+1)
 *    signatures per row (the classic tighter window is a subset; the
 *    fixed window keeps the recipe oracle-replayable).
 *  - candidates = equi-join on (l, segment-slot, segment-text), id pairs
 *    deduped, then verified with the engine-native `levenshtein` (Spark's
 *    3-arg thresholded form short-circuits the DP above τ).
 *
 * The blocking is EXACT (no false negatives): every true pair survives
 * by the pigeonhole lemma; every candidate is verified. Strings shorter
 * than τ+1 chars produce zero-length segments that match liberally —
 * correct, just unselective; realistic keys dwarf τ.
 *
 * Scale shape: the signature join shuffles (length, slot, segment) keys —
 * each side ships ~|text| bytes of segments total, the equi-join shape of
 * every blocking dedup here; texts themselves are re-joined by id only
 * onto the DEDUPED candidate pairs (verify-on-candidates, the
 * minhash-verify shape — pair texts never ride the signature shuffle).
 * A pathological segment (one token shared by everything) skews its
 * bucket like any blocking key; the [[graft.pipeline.Dedup]] capped-
 * bucket machinery applies if a corpus ever needs it.
 */
object FuzzyJoin {

  /** (start, width) of segment `i` of a length-`l` string split into
    * `k = tau+1` even parts, first `k − l mod k` parts narrower. */
  private def segWidth(l: Column, i: Column, k: Int): Column =
    (l.cast("int") / k).cast("int") +
      when(i >= lit(k) - pmod(l.cast("int"), lit(k)), 1).otherwise(0)

  private def segStart(l: Column, i: Column, k: Int): Column =
    i * (l.cast("int") / k).cast("int") +
      greatest(lit(0), i - (lit(k) - pmod(l.cast("int"), lit(k))))

  /** Index-side signatures: one row per (id, length, slot, segment). */
  private def indexSignatures(df: DataFrame, tau: Int,
                              idCol: String, textCol: String): DataFrame = {
    val k = tau + 1
    df.select(col(idCol).as("__lid"), col(textCol).as("__ls"))
      .filter(col("__ls").isNotNull)
      .withColumn("__l", length(col("__ls")).cast("int"))
      .withColumn("__i", explode(sequence(lit(0), lit(tau))))
      .select(col("__lid"), col("__l"), col("__i"),
        substring(col("__ls"),
          segStart(col("__l"), col("__i"), k) + 1,
          segWidth(col("__l"), col("__i"), k)).as("__seg"))
  }

  /** Probe-side signatures: substrings at every compatible (length, slot,
    * shift), deduped per (id, length, slot, segment). */
  private def probeSignatures(df: DataFrame, tau: Int,
                              idCol: String, textCol: String): DataFrame = {
    val k = tau + 1
    df.select(col(idCol).as("__rid"), col(textCol).as("__rs"))
      .filter(col("__rs").isNotNull)
      .withColumn("__m", length(col("__rs")).cast("int"))
      .withColumn("__l", explode(sequence(col("__m") - tau, col("__m") + tau)))
      .filter(col("__l") >= 0)
      .withColumn("__i", explode(sequence(lit(0), lit(tau))))
      .withColumn("__w", segWidth(col("__l"), col("__i"), k))
      .withColumn("__d", explode(sequence(lit(-tau), lit(tau))))
      .withColumn("__p", segStart(col("__l"), col("__i"), k) + col("__d"))
      .filter(col("__p") >= 0 && col("__p") + col("__w") <= col("__m"))
      .select(col("__rid"), col("__l"), col("__i"),
        substring(col("__rs"), col("__p") + 1, col("__w")).as("__seg"))
      .dropDuplicates("__rid", "__l", "__i", "__seg")
  }

  /**
   * All (leftId, rightId, dist) pairs with levenshtein(left, right) ≤ tau.
   * Output columns: `id_l`, `id_r`, `dist`.
   */
  def editDistanceJoin(left: DataFrame, right: DataFrame, tau: Int,
                       idCol: String = "id", textCol: String = "text"): DataFrame = {
    require(tau >= 1 && tau <= 8, "tau must be in [1, 8] (signature fanout is (2tau+1)^2(tau+1))")
    val cand = indexSignatures(left, tau, idCol, textCol)
      .join(probeSignatures(right, tau, idCol, textCol), Seq("__l", "__i", "__seg"))
      .select(col("__lid"), col("__rid"))
      .distinct()
    val lt = left.select(col(idCol).as("__lid"), col(textCol).as("__ls"))
    val rt = right.select(col(idCol).as("__rid"), col(textCol).as("__rs"))
    cand.join(lt, "__lid").join(rt, "__rid")
      .withColumn("dist", expr(s"levenshtein(__ls, __rs, $tau)"))
      .filter(col("dist") >= 0)
      .select(col("__lid").as("id_l"), col("__rid").as("id_r"),
        col("dist").cast("long").as("dist"))
  }

  /**
   * Self-join convenience: unordered pairs (id_a < id_b) of distinct rows
   * within edit distance `tau`. Output: `id_a`, `id_b`, `dist`.
   */
  def editDistanceSelfJoin(df: DataFrame, tau: Int,
                           idCol: String = "id", textCol: String = "text"): DataFrame =
    editDistanceJoin(df, df, tau, idCol, textCol)
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l").as("id_a"), col("id_r").as("id_b"), col("dist"))
}
