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
}
