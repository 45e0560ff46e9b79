package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Pairwise-preference analytics — the RLHF/eval-data half of corpus
 * curation: human (or judge-model) A-vs-B comparisons arrive as
 * (winner, loser) pairs, and the pipeline needs a leaderboard that is
 * robust at low sample counts, plus label-quality agreement checks
 * between raters. Everything here follows the repo-wide determinism
 * contract: INTEGER outputs only (permille scores, exact integer square
 * roots), so every report is hash-exact across engines and runs.
 */
object Preference {

  /** Exact integer square root — the shared [[IntMath.isqrt]]. */
  private def isqrt(x: Column): Column = IntMath.isqrt(x)

  /**
   * Preference leaderboard with a Wilson lower-confidence-bound rank
   * (Wilson '27 score interval at z = 2, the Agresti–Coull choice —
   * the standard "sort by lower bound, not by raw win rate" rule for
   * small-sample rankings). Input: one row per comparison with
   * `winnerCol` / `loserCol` item ids. Output per item:
   * `wins`, `losses`, `games`, `winrate_permille`, and
   * `wilson_lcb_permille` = 1000·(w + 2 − 2·√(w(n−w)/n + 1)) / (n + 4)
   * carried out entirely in scaled integer arithmetic (exact isqrt),
   * clamped at 0.
   *
   * Plan shape: the pair table maps to (item, win, loss) rows and one
   * map-side-combined groupBy reduces it to an items-sized frame — a
   * 100 TB comparison log pays one scan + one shuffle bounded by the
   * item-id cardinality, and every per-item formula is scalar. The
   * intermediate q = ⌊w(n−w)/n⌋ / r = w(n−w) mod n split keeps the
   * permille scaling overflow-safe to ~3·10⁹ games per item.
   */
  def leaderboard(pairs: DataFrame, winnerCol: String = "winner",
                  loserCol: String = "loser"): DataFrame = {
    val wins = pairs.select(col(winnerCol).as("item"),
      lit(1L).as("win"), lit(0L).as("loss"))
    val losses = pairs.select(col(loserCol).as("item"),
      lit(0L).as("win"), lit(1L).as("loss"))
    val tallies = wins.unionAll(losses).groupBy("item")
      .agg(sum("win").as("wins"), sum("loss").as("losses"))
    // R ≈ 10⁶·(w(n−w)/n + 1) via the overflow-safe quotient/remainder split
    // (all divisions are INTEGER div — the oracle replays the same tree)
    tallies
      .withColumn("games", col("wins") + col("losses"))
      .withColumn("bigr", expr(
        "((wins * losses) div games) * 1000000 + " +
          "(((wins * losses) % games) * 1000000) div games + 1000000"))
      .withColumn("winrate_permille", expr("(wins * 1000) div games"))
      .withColumn("s", isqrt(col("bigr")))
      .withColumn("wilson_lcb_permille",
        greatest(expr("(1000 * (wins + 2) - 2 * s) div (games + 4)"), lit(0L)))
      .select("item", "wins", "losses", "games", "winrate_permille",
        "wilson_lcb_permille")
  }

  /**
   * Cohen's kappa inter-annotator agreement (Cohen '60) — the standard
   * label-QC gate before preference or classifier labels enter a
   * training mix. Input: one row per doubly-labeled item with the two
   * raters' labels. Output: ONE row — `n_items`, `n_agree`,
   * `po_permille` (observed agreement), `pe_permille` (chance
   * agreement from the marginals), and
   * `kappa_permille` = 1000·(n·agree − Σ_k aₖbₖ) / (n² − Σ_k aₖbₖ),
   * the exact integer form of (p₀−pₑ)/(1−pₑ).
   *
   * Plan shape: one map-side-combined groupBy on the (a, b) label pair
   * — bounded by the label domain squared, never corpus-sized — then
   * marginal products over that tiny frame. Perfect chance agreement
   * (n² = Σaₖbₖ, constant raters) yields kappa 0 by convention via the
   * guarded denominator.
   */
  def agreementKappa(labels: DataFrame, labelACol: String,
                     labelBCol: String): DataFrame = {
    val pairCounts = labels.groupBy(col(labelACol).as("la"), col(labelBCol).as("lb"))
      .agg(count(lit(1)).as("c"))
    // marginal counts per label on each side, joined on label so the
    // chance term Σ_k aₖ·bₖ is a label-domain-sized equi-join
    val aCounts = pairCounts.groupBy(col("la").as("k")).agg(sum("c").as("ak"))
    val bCounts = pairCounts.groupBy(col("lb").as("k")).agg(sum("c").as("bk"))
    val chance = aCounts.join(bCounts, Seq("k"), "inner")
      .agg(coalesce(sum(col("ak") * col("bk")), lit(0L)).as("sum_ab"))
    val totals = pairCounts.agg(
      sum("c").as("n_items"),
      coalesce(sum(when(col("la") === col("lb"), col("c"))), lit(0L)).as("n_agree"))
    totals.crossJoin(broadcast(chance)).select(
      col("n_items"), col("n_agree"),
      expr("(n_agree * 1000) div n_items").as("po_permille"),
      expr("(sum_ab * 1000) div (n_items * n_items)").as("pe_permille"),
      expr("(1000 * (n_items * n_agree - sum_ab)) div " +
        "greatest(n_items * n_items - sum_ab, 1)").as("kappa_permille"))
  }
}
