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
                 maxDistinctScores: Long = 65536L): DataFrame =
    binaryEvalGrouped(df, Seq.empty, labelCol, scoreCol, threshold,
      maxDistinctScores)

  /**
   * [[binaryEval]] per group — the k-fold cross-validation / per-source
   * report form: one output row per group with the identical counters
   * (per-group confusion, P/R/F1 permille, exact tie-corrected AUC).
   * The bounded-window contract generalizes: the corpus collapses to
   * per-(group, score) tallies — the cap bounds the TOTAL tally rows —
   * and the cumsum window partitions by group, so no single partition
   * ever exceeds the cap.
   */
  def binaryEvalGrouped(df: DataFrame, groupCols: Seq[String],
                        labelCol: String, scoreCol: String,
                        threshold: Long,
                        maxDistinctScores: Long = 65536L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val gc = groupCols.map(col)
    val t = df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(gc ++ Seq(col(labelCol).cast("long").as("y"),
        col(scoreCol).cast("long").as("s")): _*)
    // the tally cache is SCOPED: the output is groups-sized, so it is
    // materialized here (validation pass + final aggregate share the
    // cached tally) and the cache released before returning — repeated
    // library calls in a long-lived session must not accumulate entries
    val g = t.groupBy(gc :+ col("s"): _*)
      .agg(sum(col("y")).as("cp"),
        (count(lit(1)) - sum(col("y"))).as("cn"),
        min(col("y")).as("__miny"), max(col("y")).as("__maxy"))
      .cache()
    try {
      val v = g.agg(count(lit(1)), coalesce(min(col("__miny")), lit(0L)),
        coalesce(max(col("__maxy")), lit(0L))).head()
      require(v.getLong(0) <= maxDistinctScores,
        s"${v.getLong(0)} distinct (group, score) tallies > cap $maxDistinctScores — " +
          "quantize scores (permille/centile) before evaluating")
      require(v.getLong(1) >= 0L && v.getLong(2) <= 1L,
        s"labels must be 0/1, saw [${v.getLong(1)}, ${v.getLong(2)}]")
      val w = (if (groupCols.isEmpty) Window.orderBy(col("s"))
               else Window.partitionBy(gc: _*).orderBy(col("s")))
        .rowsBetween(Window.unboundedPreceding, -1)
      val grouped = g.withColumn("nb", coalesce(sum(col("cn")).over(w), lit(0L)))
      val aggs = Seq(
          coalesce(sum(col("cp")), lit(0L)).as("n_pos"),
          coalesce(sum(col("cn")), lit(0L)).as("n_neg"),
          coalesce(sum(col("cp") * col("nb") * 2L + col("cp") * col("cn")),
            lit(0L)).as("__u2"),
          coalesce(sum(when(col("s") >= threshold, col("cp")).otherwise(0L)),
            lit(0L)).as("tp"),
          coalesce(sum(when(col("s") >= threshold, col("cn")).otherwise(0L)),
            lit(0L)).as("fp"))
      val out = (if (groupCols.isEmpty) grouped.agg(aggs.head, aggs.tail: _*)
                 else grouped.groupBy(gc: _*).agg(aggs.head, aggs.tail: _*))
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
        .select(gc ++ Seq(col("n"), col("n_pos"), col("n_neg"), col("tp"),
          col("fp"), col("fn"), col("tn"), col("precision_permille"),
          col("recall_permille"), col("f1_permille"), col("auc_permille")): _*)
      val rows = out.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally g.unpersist(blocking = false)
  }

  /** Exact integer square root — the shared [[IntMath.isqrt]] (one
    * definition for this and [[Preference]]'s Wilson bound). */
  private def isqrt(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    IntMath.isqrt(x)

  /**
   * Per-group class-balance report — the label-QC pass before a
   * stratified split or classifier training: for each group, the class
   * count, majority-class share, and GINI IMPURITY 1 − Σ(cᵢ/n)² in its
   * exact integer form (1000·(n² − Σcᵢ²)) div n² — 0 for a single-class
   * group, →1000·(1 − 1/k) for k balanced classes. Gini (not entropy)
   * because it is RATIONAL: no transcendental log, so the report is
   * hash-exact cross-engine like every statistic here.
   *
   * Plan shape: one map-side-combined (group, label) count, then a
   * groups-sized aggregate — a 100 TB corpus pays one scan; exact while
   * group sizes stay under ~3·10⁹ rows (n² in a long).
   */
  def classBalance(df: DataFrame, groupCols: Seq[String],
                   labelCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val counts = df.filter(col(labelCol).isNotNull)
      .groupBy(gc :+ col(labelCol).as("__l"): _*)
      .agg(count(lit(1)).as("c"))
    counts.groupBy(gc: _*)
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_classes"),
        max(col("c")).as("__maxc"),
        sum(col("c") * col("c")).as("__sq"))
      .withColumn("majority_permille", expr("(__maxc * 1000) div n"))
      .withColumn("gini_permille",
        expr("(1000 * (n * n - __sq)) div (n * n)"))
      .select(gc ++ Seq(col("n"), col("n_classes"),
        col("majority_permille"), col("gini_permille")): _*)
  }

  /**
   * Grouped Spearman rank correlation — "do two document scores agree?"
   * (two quality classifiers, an old and a new scorer, human vs model):
   * Pearson's formula on TIE-AVERAGED ranks, carried in pure integers by
   * doubling the average rank (2·avg = 2·min_rank + ties − 1, always
   * integral). Output per group: `n` and `spearman_micro` =
   * 10⁶·(nΣab − ΣaΣb) / (⌊√(nΣa²−(Σa)²)⌋·⌊√(nΣb²−(Σb)²)⌋) with exact
   * isqrts — a DEFINED integer statistic within 1 micro of the real ρ,
   * hash-exact across engines. Constant columns report 0 via the guarded
   * denominator.
   *
   * The long moments bound the group size: nΣa² ≤ 4n⁴ must fit 2⁶³, so
   * groups are require-capped at 6,000 rows (4·6000⁴ < 2⁶³; the micro
   * scaling is exact past that via a two-stage long-division split) —
   * rank correlation is routinely computed on a deterministic sample at
   * corpus scale (the statistic is rank-based; a uniform sample
   * estimates it with standard error ~1/√n). `sampleIdCol` makes the
   * operator SELF-SUFFICIENT above the cap: when given, each group is
   * deterministically reduced to its `maxGroupRows` rows of smallest
   * (md5(id), id) — the hash-order sampling convention shared with the
   * q_sample_* machinery, replayable in any engine as
   * `row_number() over (partition by g order by md5(cast(id as
   * varchar)), id) <= cap`; under-cap groups pass through UNCHANGED (the
   * filter keeps all n rows when n ≤ cap), so results at small scales
   * are identical with or without the front-end. Without `sampleIdCol`
   * the over-cap contract remains a loud throw.
   * Plan: (optional) one sampling window + two rank windows per group +
   * one map-side-combined moments aggregate; output is groups-sized.
   */
  def rankCorrelation(df: DataFrame, groupCols: Seq[String],
                      xCol: String, yCol: String,
                      maxGroupRows: Long = 6000L,
                      sampleIdCol: Option[String] = None): DataFrame = {
    require(maxGroupRows <= 6000L,
      s"maxGroupRows > 6000 would overflow the long rank moments (4n^4)")
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val filtered = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val base = sampleIdCol match {
      case Some(idc) =>
        val w = Window.partitionBy(gc: _*)
          .orderBy(md5(col(idc).cast("string")).asc, col(idc).asc)
        filtered
          .select(gc ++ Seq(col(idc), col(xCol).cast("long").as("x"),
            col(yCol).cast("long").as("y")): _*)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= maxGroupRows)
          .select(gc ++ Seq(col("x"), col("y")): _*)
      case None =>
        filtered.select(gc ++ Seq(col(xCol).cast("long").as("x"),
          col(yCol).cast("long").as("y")): _*)
    }
    // 2·tie-averaged-rank = 2·min_rank + ties − 1 (rank() is the 1-based
    // min rank of the tie group; the tie count is a per-(group, value)
    // window count)
    def rank2(c: String) =
      lit(2L) * rank().over(Window.partitionBy(gc: _*).orderBy(col(c).asc))
        .cast("long") +
        count(lit(1)).over(Window.partitionBy(gc :+ col(c): _*)) - lit(1L)
    val ranked = base
      .withColumn("a", rank2("x"))
      .withColumn("b", rank2("y"))
    val moments = ranked.groupBy(gc: _*).agg(
      count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"),
      sum(col("a") * col("b")).as("sab"),
      sum(col("a") * col("a")).as("saa"),
      sum(col("b") * col("b")).as("sbb"))
    moments
      .withColumn("__chk", when(col("n") > maxGroupRows,
        raise_error(lit(s"rankCorrelation: group exceeds $maxGroupRows rows — " +
          "sample or quantize first (long moments would overflow)"))
          .cast("long")).otherwise(lit(0L)))
      .withColumn("dx", expr("n * saa - sa * sa + __chk"))
      .withColumn("dy", expr("n * sbb - sb * sb"))
      .withColumn("den", greatest(isqrt(col("dx")) * isqrt(col("dy")), lit(1L)))
      .withColumn("num", expr("n * sab - sa * sb"))
      // exact ⌊10⁶·num/den⌋ via two-stage long division (num·10⁶ would
      // overflow once den ≳ 9·10¹²; num·10³ stays safe under the row cap)
      .withColumn("q1", expr("(num * 1000) div den"))
      .withColumn("r1", expr("(num * 1000) % den"))
      .withColumn("spearman_micro", expr("q1 * 1000 + (r1 * 1000) div den"))
      .select(gc ++ Seq(col("n"), col("spearman_micro")): _*)
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

  /**
   * EQUAL-FREQUENCY (quantile) reliability bins — the standard
   * calibration-plot binning (each bin holds ~n/bins examples, so tail
   * bins are never starved the way equal-WIDTH bins are on skewed score
   * distributions): bin edges are the EXACT score values at ranks
   * ⌈i·n/bins⌉ located by [[Sketches.kthValues]]' shared-scan histogram
   * refinement (~log(range) counting scans, no sort), and
   * bin(s) = #{edges e : s > e} — ties at an edge deterministically fall
   * LEFT, and duplicate edges (heavy ties) simply merge bins, both
   * exactly replayable. Output shape identical to [[calibrationBins]];
   * ≤ bins rows at any corpus size.
   */
  def calibrationBinsQuantile(df: DataFrame, labelCol: String,
                              scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of [2, 1000]: $bins")
    val t = df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(labelCol).cast("long").as("y"),
        col(scoreCol).cast("long").as("s"))
    val n = t.count()
    if (n == 0) return t.select(lit(0L).as("bin"), lit(0L).as("n"),
      lit(0L).as("n_pos"), lit(0L).as("pos_rate_permille"),
      lit(0L).as("mean_score")).limit(0)
    val ranks = (1 until bins).map(i => (i * n + bins - 1) / bins)
      .filter(k => k >= 1 && k <= n)
    val edges = Sketches.kthValues(t, "s", ranks)
    val binCol = edges.foldLeft(lit(0L)) { (acc, e) =>
      acc + when(col("s") > lit(e), 1L).otherwise(0L)
    }
    t.withColumn("bin", binCol)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("s")).as("__ss"))
      .withColumn("pos_rate_permille", expr("(n_pos * 1000) div n"))
      .withColumn("mean_score", expr("__ss div n"))
      .select(col("bin"), col("n"), col("n_pos"),
        col("pos_rate_permille"), col("mean_score"))
  }
}
