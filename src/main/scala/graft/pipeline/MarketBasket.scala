package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise association mining (the support/confidence/lift core of
 * Agrawal-Srikant frequent itemsets, restricted to 2-itemsets — the size
 * that powers "bought together" co-occurrence reports without the
 * exponential lattice).
 *
 * All metrics are integer permille so reports hash-compare across
 * engines: confidence(a→b) = n_ab·1000 div n_a, lift = n_ab·N·1000 div
 * (n_a·n_b) where N is the basket count.
 */
object MarketBasket {

  /**
   * Co-occurrence pair rules over (basket, item) rows. Duplicate
   * (basket, item) pairs collapse first, so support counts baskets, not
   * line items. Pairs are emitted once with `item_a < item_b`;
   * directional confidences cover both rule orientations.
   *
   * Scale shape: the self-join expands within a basket only — one
   * shuffle keyed by basket, output bounded by Σ basketSize² — and
   * `maxBasketSize` drops degenerate mega-baskets (a single viral basket
   * of 10⁵ items would alone emit 5·10⁹ pairs; the standard guard in
   * every production basket miner). Dropped-basket count is observable
   * by diffing `n_baskets` against the unguarded distinct count. The
   * `minSupport` filter runs before the item-count joins, so the
   * (item_a, item_b) aggregate is the only pair-sized shuffle.
   *
   * Overflow headroom: lift's numerator is n_ab·N·1000 ≤ N²·1000 in the
   * degenerate every-basket-shares-the-pair case — under 2⁶³ for
   * N < 9·10⁷ baskets, far more in practice since n_ab is a pair's
   * support — and ANSI mode faults loudly rather than wrapping if a
   * corpus ever crosses it.
   */
  /** The shared (basket, item) prep: nulls out, (basket, item) deduped so
    * support counts baskets, mega-baskets dropped, result materialized
    * ONCE for the many downstream consumers (see [[pairRules]]'s scan
    * audit). */
  private def basketItems(df: DataFrame, basketCol: String, itemCol: String,
                          maxBasketSize: Int,
                          checkpointDir: Option[String]): DataFrame = {
    val items0 = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("i").isNotNull && col("b").isNotNull)
      .distinct()
    val sizes = items0.groupBy(col("b")).agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
    // materialize once: items feeds FIVE consumers (both join sides, both
    // item-count tables, and transitively the basket count) whose pruned
    // subplans would otherwise each re-derive the distinct from the scan —
    // measured 9 parquet scans → 1 on the sf0.1 gate. checkpointDir opts
    // into the fault-tolerant materialization (see Checkpoints)
    Checkpoints.materialize(
      items0.join(sizes, "b").select(col("b"), col("i")), checkpointDir)
  }

  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long = 2, maxBasketSize: Int = 1000,
                checkpointDir: Option[String] = None): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val items = basketItems(df, basketCol, itemCol, maxBasketSize, checkpointDir)
    val nBaskets = items.select(col("b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val left = items.select(col("b"), col("i").as("item_a"))
    val right = items.select(col("b"), col("i").as("item_b"))
    val pairs = left.join(right, Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val cntA = items.groupBy(col("i").as("item_a")).agg(count(lit(1)).as("n_a"))
    val cntB = items.groupBy(col("i").as("item_b")).agg(count(lit(1)).as("n_b"))
    pairs.join(cntA, "item_a").join(cntB, "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        expr("n_ab * 1000 div n_a").as("conf_ab_permille"),
        expr("n_ab * 1000 div n_b").as("conf_ba_permille"),
        expr("n_ab * n_baskets * 1000 div (n_a * n_b)").as("lift_permille"))
  }

  /**
   * Top-k 3-itemset association rules — [[pairRules]] one lattice level
   * up, with the classic Apriori candidate prune keeping the shape
   * tractable: a triple {a,b,c} with support ≥ minSupport necessarily has
   * its {a,b} sub-pair at support ≥ minSupport, so candidate generation
   * extends only FREQUENT-pair occurrences by a third same-basket item
   * (candidate volume ≤ frequent-pair occurrences × basket size — never
   * the unguarded Σ size³ triple stream; `maxBasketSize` bounds the
   * extension fan-out). Output is the `topK` triples by
   * (support DESC, item_a, item_b, item_c ASC) — a total order, so the
   * cut is deterministic and SQL-replayable — with each rule
   * orientation's integer-permille confidence (the three sub-pair
   * supports all ≥ minSupport by the same monotonicity, so the metric
   * joins never lose a row).
   *
   * One Σ size²-bounded self-join (the pair stream), one frequent-pair
   * semi-restriction, one bounded extension join, one triple aggregate,
   * then a TakeOrderedAndProject at `topK` — the ≤topK survivors
   * broadcast into the three pair-count joins.
   *
   * The pair stream is derived twice (frequent-pair aggregate +
   * candidate generation) from the CHECKPOINTED items table rather than
   * materialized: measured 1.09× warm at sf0.1
   * ([[graft.tools.ProbeTriples]]) — inside noise — while materializing
   * Σ size² rows is a real storage cost at 100 TB. Recompute wins.
   */
  def tripleRules(df: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long = 2, maxBasketSize: Int = 1000,
                  topK: Int = 1000,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 3, s"maxBasketSize must be >= 3, got $maxBasketSize")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val items = basketItems(df, basketCol, itemCol, maxBasketSize, checkpointDir)
    val pairOcc = items.select(col("b"), col("i").as("item_a"))
      .join(items.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
    // frequent pairs, materialized once: they gate candidate generation
    // AND supply all three sub-pair supports for the final metrics
    val freqPairs = Checkpoints.materialize(
      pairOcc.groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= minSupport),
      checkpointDir)
    val triples = pairOcc
      .join(freqPairs.select(col("item_a"), col("item_b")),
        Seq("item_a", "item_b"), "left_semi")
      .join(items.select(col("b"), col("i").as("item_c")), Seq("b"))
      .filter(col("item_b") < col("item_c"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= minSupport)
      .orderBy(col("n_abc").desc, col("item_a").asc, col("item_b").asc,
        col("item_c").asc)
      .limit(topK)
    def sub(lo: String, hi: String, as: String): DataFrame =
      freqPairs.select(col("item_a").as(lo), col("item_b").as(hi),
        col("n_pair").as(as))
    triples
      .join(sub("item_a", "item_b", "n_ab"), Seq("item_a", "item_b"))
      .join(sub("item_a", "item_c", "n_ac"), Seq("item_a", "item_c"))
      .join(sub("item_b", "item_c", "n_bc"), Seq("item_b", "item_c"))
      .select(col("item_a"), col("item_b"), col("item_c"), col("n_abc"),
        col("n_ab"), col("n_ac"), col("n_bc"),
        expr("n_abc * 1000 div n_ab").as("conf_ab_c_permille"),
        expr("n_abc * 1000 div n_ac").as("conf_ac_b_permille"),
        expr("n_abc * 1000 div n_bc").as("conf_bc_a_permille"))
  }
}
