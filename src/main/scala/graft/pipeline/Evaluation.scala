package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Retrieval-quality evaluation — the measurement half of every retriever
 * in this engine (BM25, ANN top-k, the LSH/IVF/PQ/SQ8 approximate
 * paths): given ranked results and a relevance truth set, emit the
 * standard eval counters per query. All outputs are INTEGER (recall as
 * permille, MRR as the first relevant rank — callers derive 1/rank), so
 * the report is hash-exact across engines and runs, the same decision as
 * every other report operator here.
 */
object Evaluation {

  /**
   * Per-query ranked-retrieval metrics: `n_retrieved`, `n_relevant`
   * (truth-set size — the recall denominator, counting relevant docs the
   * retriever MISSED), `n_hits` (retrieved ∩ relevant),
   * `recall_permille` = hits·1000 div relevant, and `first_rel_rank`
   * (the MRR numerator's rank; 0 when no relevant doc was retrieved).
   *
   * `results` carries (queryCols…, idCol, rankCol); `truth` carries
   * (queryCols…, idCol). With empty `queryCols` the report is one global
   * row (single-query evaluation). Plan: one broadcast-able join of two
   * ≤k·|queries| tables + two tiny aggregates — never corpus-sized.
   */
  def retrievalEval(results: DataFrame, truth: DataFrame,
                    queryCols: Seq[String] = Seq.empty,
                    idCol: String = "doc_id",
                    rankCol: String = "rank"): DataFrame = {
    val qc = queryCols.map(col)
    val rel = truth.select(queryCols.map(col) :+ col(idCol): _*)
      .withColumn("__rel", lit(1L))
    val marked = results.join(rel, queryCols :+ idCol, "left")
    val perQ = marked.groupBy(qc: _*).agg(
      count(lit(1)).as("n_retrieved"),
      sum(coalesce(col("__rel"), lit(0L))).as("n_hits"),
      coalesce(min(when(col("__rel").isNotNull, col(rankCol))), lit(0L))
        .cast("long").as("first_rel_rank"))
    val truthCounts = truth.groupBy(qc: _*)
      .agg(count(lit(1)).as("n_relevant"))
    val joined =
      if (queryCols.isEmpty) perQ.crossJoin(truthCounts)
      else perQ.join(truthCounts, queryCols)
    joined.withColumn("recall_permille",
        expr("(n_hits * 1000) div n_relevant"))
      .select(qc ++ Seq(col("n_retrieved"), col("n_relevant"), col("n_hits"),
        col("recall_permille"), col("first_rel_rank")): _*)
  }

  /**
   * Reciprocal-rank fusion (Cormack et al. SIGIR'09) — the standard
   * hybrid-search combiner for a lexical and a vector ranking:
   * score(d) = Σ_lists scale div (kConst + rank_d), summed over the
   * lists that retrieved d (absent-from-list contributes nothing, the
   * usual convention). INTEGER division at `scale` = 1e6 keeps the fused
   * score hash-exact across engines while preserving rank resolution to
   * k + rank ≲ 1e3.
   *
   * Each input carries (idCol, rankCol) with 1-based ranks. Plan: union
   * of k-sized ranking lists + one tiny aggregate — never corpus-sized;
   * the heavy lifting stays in the rankers.
   */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String = "doc_id",
              rankCol: String = "rank", kConst: Int = 60,
              scale: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(kConst >= 0, s"kConst must be >= 0, got $kConst")
    rankings.map(_.select(col(idCol), col(rankCol).cast("long").as("__r")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"${scale}L div ($kConst + __r)")).as("rrf_score"))
  }

  /**
   * Binary-classifier evaluation — the calibration report behind every
   * classifier-based quality filter (the GPT-3 LR filter / FineWeb-Edu
   * scorer pattern: score documents, keep above a threshold; this
   * operator says what the threshold buys). One row:
   * confusion counts at `threshold` (predict positive iff score ≥ t),
   * precision/recall/F1 in permille, and EXACT ROC-AUC in permille via
   * the tie-corrected Mann–Whitney statistic — per distinct score s:
   * U2 += 2·pos(s)·negBelow(s) + pos(s)·neg(s) (ties contribute half,
   * kept integer by carrying 2U), AUC = 1000·U2 div (2·P·N). All-integer
   * throughout, so the whole report replays cross-engine.
   *
   * Labels must be 0/1 (validated — a 2 would silently corrupt the
   * positive tallies); null labels/scores drop. Scores must be integers:
   * a calibrated classifier emits quantized scores (permille/centile), so
   * the per-score tally table is vocabulary-bounded — that is also the
   * SCALE contract: the corpus-sized input collapses to ≤
   * `maxDistinctScores` (score, pos, neg) rows in ONE map-side-combined
   * aggregate, and only that bounded table rides the ordered cumsum
   * window. Raw unbounded scores (e.g. raw logits at float precision)
   * must be quantized first; the cap throws rather than letting a
   * single-partition window absorb an unbounded table.
   */
  def binaryEval(df: DataFrame, labelCol: String, scoreCol: String,
                 threshold: Long,
                 maxDistinctScores: Long = 65536L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val t = df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(labelCol).cast("long").as("y"),
        col(scoreCol).cast("long").as("s"))
    // the tally cache is SCOPED: the output is one row, so it is
    // materialized here (validation pass + final aggregate share the
    // cached tally) and the cache released before returning — repeated
    // library calls in a long-lived session must not accumulate entries
    val g = t.groupBy(col("s"))
      .agg(sum(col("y")).as("cp"),
        (count(lit(1)) - sum(col("y"))).as("cn"),
        min(col("y")).as("__miny"), max(col("y")).as("__maxy"))
      .cache()
    try {
      val v = g.agg(count(lit(1)), coalesce(min(col("__miny")), lit(0L)),
        coalesce(max(col("__maxy")), lit(0L))).head()
      require(v.getLong(0) <= maxDistinctScores,
        s"${v.getLong(0)} distinct scores > cap $maxDistinctScores — " +
          "quantize scores (permille/centile) before evaluating")
      require(v.getLong(1) >= 0L && v.getLong(2) <= 1L,
        s"labels must be 0/1, saw [${v.getLong(1)}, ${v.getLong(2)}]")
      val w = Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val out = g.withColumn("nb", coalesce(sum(col("cn")).over(w), lit(0L)))
        .agg(coalesce(sum(col("cp")), lit(0L)).as("n_pos"),
          coalesce(sum(col("cn")), lit(0L)).as("n_neg"),
          coalesce(sum(col("cp") * col("nb") * 2L + col("cp") * col("cn")),
            lit(0L)).as("__u2"),
          coalesce(sum(when(col("s") >= threshold, col("cp")).otherwise(0L)),
            lit(0L)).as("tp"),
          coalesce(sum(when(col("s") >= threshold, col("cn")).otherwise(0L)),
            lit(0L)).as("fp"))
        .withColumn("n", col("n_pos") + col("n_neg"))
        .withColumn("fn", col("n_pos") - col("tp"))
        .withColumn("tn", col("n_neg") - col("fp"))
        .withColumn("precision_permille",
          expr("(tp * 1000) div greatest(tp + fp, 1)"))
        .withColumn("recall_permille",
          expr("(tp * 1000) div greatest(n_pos, 1)"))
        .withColumn("f1_permille",
          expr("(tp * 2000) div greatest(2 * tp + fp + fn, 1)"))
        .withColumn("auc_permille",
          expr("(__u2 * 1000) div greatest(2 * n_pos * n_neg, 1)"))
        .select(col("n"), col("n_pos"), col("n_neg"), col("tp"), col("fp"),
          col("fn"), col("tn"), col("precision_permille"),
          col("recall_permille"), col("f1_permille"), col("auc_permille"))
      val rows = out.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally g.unpersist(blocking = false)
  }

  /**
   * Reliability (calibration) bins — [[binaryEval]]'s companion plot
   * data: equal-WIDTH integer score bins over the observed [min, max]
   * (bin = (s − min)·bins div (max − min + 1), so every score maps to
   * exactly one of `bins` bins with no float boundary ambiguity), each
   * with its count, positive count, observed positive rate and mean
   * score in permille of the corpus — a well-calibrated scorer shows
   * pos_rate tracking the bin's score range. Two passes: one min/max
   * aggregate (two driver-held longs, the q_winsorize shape), one
   * map-side-combined group-by over ≤ `bins` keys. Output ≤ `bins` rows
   * at any corpus size; all-integer.
   */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of [2, 1000]: $bins")
    val t = df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(labelCol).cast("long").as("y"),
        col(scoreCol).cast("long").as("s"))
    val mm = t.agg(min(col("s")), max(col("s"))).head()
    if (mm.isNullAt(0)) return t.select(lit(0L).as("bin"), lit(0L).as("n"),
      lit(0L).as("n_pos"), lit(0L).as("pos_rate_permille"),
      lit(0L).as("mean_score")).limit(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // (s − lo)·bins must not wrap: with raw 64-bit scores (range ~2^63)
    // the product overflows long and silently produces negative bins —
    // same quantize-first contract as binaryEval, enforced not assumed
    require(BigInt(hi) - BigInt(lo) < BigInt(Long.MaxValue / bins),
      s"score range [$lo, $hi] too wide for $bins equal-width integer bins " +
        "(the bin product would overflow long) — quantize scores first")
    t.withColumn("bin",
        expr(s"((s - ${lo}L) * ${bins}L) div ${hi - lo + 1}L"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("s")).as("__ss"))
      .withColumn("pos_rate_permille", expr("(n_pos * 1000) div n"))
      .withColumn("mean_score", expr("__ss div n"))
      .select(col("bin"), col("n"), col("n_pos"),
        col("pos_rate_permille"), col("mean_score"))
  }
}
