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
}
