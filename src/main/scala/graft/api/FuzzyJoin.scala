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
    * shift), deduped per (id, length, slot, segment) SCAN-LOCALLY — the
    * candidate set is built and distinct'ed inside one higher-order
    * expression, so one generator fires per row and the dedup needs no
    * shuffle (which also keeps this stage legal and stateless on a
    * stream).
    *
    * The shift window is the multi-match-aware one from the PassJoin
    * paper (Li, Deng & Feng, ICDE 2011 §3.2), not the loose ±τ: with
    * Δ = m − l, slot i admits shifts
    * `dd ∈ [max(−i, Δ−(τ−i)), min(i, Δ+(τ−i))]` — at most i edits can
    * fall before slot i (each moves the alignment by ≤1) and at most
    * τ−i after it, so any match outside the window would need > τ edits.
    * Still exact (a superset of every true match's alignment), but
    * ~3× fewer probe signatures at τ=2 than the fixed ±τ window
    * (ProbeFuzzy measures the win). */
  private def probeSignatures(df: DataFrame, tau: Int,
                              idCol: String, textCol: String): DataFrame = {
    val k = tau + 1
    val m = col("__m")
    val combos = flatten(transform(sequence(m - tau, m + tau), l => {
      val delta = m - l
      flatten(transform(sequence(lit(0), lit(tau)), i =>
        transform(sequence(greatest(-i, delta - (lit(tau) - i)),
            least(i, delta + (lit(tau) - i))), dd =>
          struct(l.as("l"), i.as("i"),
            (segStart(l, i, k) + dd).as("p"),
            segWidth(l, i, k).as("w")))))
    }))
    val valid = filter(combos, cb =>
      cb.getField("l") >= 0 && cb.getField("p") >= 0 &&
        cb.getField("p") + cb.getField("w") <= m)
    val sigs = array_distinct(transform(valid, cb =>
      struct(cb.getField("l").as("__l"), cb.getField("i").as("__i"),
        col("__rs").substr(cb.getField("p") + 1, cb.getField("w")).as("__seg"))))
    df.select(col(idCol).as("__rid"), col(textCol).as("__rs"))
      .filter(col("__rs").isNotNull)
      .withColumn("__m", length(col("__rs")).cast("int"))
      .select(col("__rid"), explode(sigs).as("__sig"))
      .select(col("__rid"), col("__sig.__l").as("__l"),
        col("__sig.__i").as("__i"), col("__sig.__seg").as("__seg"))
  }

  /**
   * All (leftId, rightId, dist) pairs with levenshtein(left, right) ≤ tau.
   * Output columns: `id_l`, `id_r`, `dist`.
   *
   * CONTRACT: `idCol` must be unique within each side (like
   * [[writeEditIndex]]'s tau, this is baked into the algebra: candidate
   * pairs are distinct'ed on ids, so a duplicated id would first merge
   * distinct strings' candidates and then cross-multiply against every
   * text copy in the verify re-join, emitting pairs verified against the
   * WRONG text). Violations that could reach the output fail the job
   * with a named error rather than silently producing bogus pairs; the
   * check is an id-keyed partial aggregate fused into the verify
   * re-join's own shuffle, not an extra corpus pass.
   */
  def editDistanceJoin(left: DataFrame, right: DataFrame, tau: Int,
                       idCol: String = "id", textCol: String = "text"): DataFrame = {
    require(tau >= 1 && tau <= 8, "tau must be in [1, 8] (signature fanout is (2tau+1)^2(tau+1))")
    // enforce the unique-id contract on the verify side: one text per id,
    // or a named failure (the raise feeds the text the verify consumes,
    // so it cannot be pruned)
    def uniqueTexts(df: DataFrame, side: String, out: String): DataFrame =
      df.select(col(idCol).as(s"__${side}id"), col(textCol).as(out))
        .groupBy(col(s"__${side}id"))
        .agg(count(lit(1)).as("__n"), max(col(out)).as(out))
        .select(col(s"__${side}id"),
          when(col("__n") > 1, raise_error(concat(
            lit(s"editDistanceJoin: duplicate $side-side $idCol "),
            col(s"__${side}id").cast("string"))))
            .otherwise(col(out)).as(out))
    val cand = indexSignatures(left, tau, idCol, textCol)
      .join(probeSignatures(right, tau, idCol, textCol), Seq("__l", "__i", "__seg"))
      .select(col("__lid"), col("__rid"))
      .distinct()
    val lt = uniqueTexts(left, "l", "__ls")
    val rt = uniqueTexts(right, "r", "__rs")
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

  /**
   * Persist the index side for INCREMENTAL fuzzy matching: segment
   * signatures range-partitioned and sorted by segment text (parquet
   * row-group min/max prunes probe equality lookups) plus the id→text
   * table the verify stage re-joins. A 100 TB reference set is segmented
   * ONCE; every arriving batch probes signatures instead of re-reading
   * reference texts — the [[graft.pipeline.Dedup.writeMinhashIndex]]
   * shape for edit distance. `tau` is baked into the layout (segment
   * boundaries depend on it); probe with the same value.
   */
  def writeEditIndex(df: DataFrame, path: String, tau: Int,
                     idCol: String = "id", textCol: String = "text",
                     numPartitions: Int = 8): Unit = {
    indexSignatures(df, tau, idCol, textCol)
      .repartitionByRange(numPartitions, col("__seg"))
      .sortWithinPartitions(col("__seg"))
      .write.mode("overwrite").parquet(s"$path/signatures")
    df.select(col(idCol).as("__lid"), col(textCol).as("__ls"))
      .filter(col("__ls").isNotNull)
      .write.mode("overwrite").parquet(s"$path/texts")
    // tau is baked into the segment boundaries; persist it so a probe
    // with a different value fails loudly instead of silently missing
    // pairs (the pigeonhole guarantee only holds at the written tau)
    df.sparkSession.range(1).select(lit(tau).as("tau"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /**
   * Match an arriving batch against a [[writeEditIndex]] reference set:
   * all (index id, batch id, dist ≤ tau) pairs. Stateless stream-static
   * shape — this is the `foreachBatch` body of (or directly a transform
   * on) a streaming source; pass `dedupCandidates = false` on a stream
   * (a global distinct is stateful there) and collapse the per-matching-
   * signature duplicate pairs downstream, exactly the
   * [[graft.streaming.DocStreams.dedupAgainstIndexStream]] contract.
   */
  def editDistanceAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                               path: String, batch: DataFrame, tau: Int,
                               idCol: String = "id", textCol: String = "text",
                               dedupCandidates: Boolean = true): DataFrame = {
    val writtenTau = spark.read.parquet(s"$path/meta").head().getAs[Int]("tau")
    require(writtenTau == tau,
      s"index at $path was segmented for tau=$writtenTau, probed with tau=$tau " +
        "— the pigeonhole guarantee only holds at the written value")
    val sigs = spark.read.parquet(s"$path/signatures")
    val texts = spark.read.parquet(s"$path/texts")
    val candRaw = probeSignatures(batch, tau, idCol, textCol)
      .join(sigs, Seq("__l", "__i", "__seg"))
      .select(col("__lid"), col("__rid"))
    val cand = if (dedupCandidates) candRaw.distinct() else candRaw
    cand.join(texts, "__lid")
      .join(batch.select(col(idCol).as("__rid"), col(textCol).as("__rs")), "__rid")
      .withColumn("dist", expr(s"levenshtein(__ls, __rs, $tau)"))
      .filter(col("dist") >= 0)
      .select(col("__lid").as("id_l"), col("__rid").as("id_r"),
        col("dist").cast("long").as("dist"))
  }
}
