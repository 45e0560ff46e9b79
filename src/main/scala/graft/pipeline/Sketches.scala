package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic cardinality sketches.
 *
 * Companion to the Space-Saving heavy hitters
 * ([[org.apache.spark.sql.graft.SpaceSavingTopK]]): both are mergeable
 * bounded-state summaries whose behavior is exactly replayable in SQL
 * because the hash is md5 — no engine-private seed, so a DuckDB oracle
 * recomputes the identical sketch rather than trusting an error bound.
 */
object Sketches {

  /**
   * KMV (k-minimum-values) distinct-count estimate per group
   * (Bar-Yossef et al. '02): hash each value to 32 bits (first 8 md5 hex
   * chars), keep the k smallest DISTINCT hashes per group, and estimate
   *   |D| ≈ (k-1) · 2³² / h_k
   * where h_k is the k-th smallest hash; groups holding fewer than k
   * distinct hashes report their EXACT count (`n_kept < k` ⇒
   * `est_distinct = n_kept`). Standard error is ~1/√(k−2). Estimates are
   * of distinct 32-bit hashes — 32-bit collisions among distinct values
   * merge, the usual sketch caveat (negligible until ~2¹⁶ distinct per
   * group; use a longer prefix above that).
   *
   * Scale shape: values are hashed AT THE SCAN, so only (group, hash32)
   * pairs ever shuffle — once for the hash dedup, once more as ≤k-row
   * bounded heaps ([[org.apache.spark.sql.graft.TopNByOrd]] partials) per
   * map task × group. The payload column never moves.
   *
   * Output: groupCol, `n_kept` (min(k, distinct hashes)), `est_distinct`.
   */
  def distinctKmv(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")
    // hash 0 maps to 1: h_k is a divisor, and a value whose md5 opens with
    // eight hex zeros (p ≈ 2⁻³² per distinct value, but input-controlled)
    // would otherwise hard-fail the estimate with DIVIDE_BY_ZERO under
    // ANSI. Merging hash 0 into hash 1 shifts the estimate negligibly;
    // the DuckDB oracle applies the identical mapping.
    val h = greatest(
      conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
        .cast("long"),
      lit(1L))
    val hashes = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), h.as("__h"))
      .distinct()
    import org.apache.spark.sql.GraftShims
    val minK = GraftShims.column(org.apache.spark.sql.graft.TopNByOrd(
      GraftShims.expression(col("__h")),
      GraftShims.expression(col("__h")), k).toAggregateExpression())
    hashes.groupBy(col(groupCol)).agg(minK.as("__mins"))
      .select(col(groupCol),
        size(col("__mins")).cast("long").as("n_kept"),
        when(size(col("__mins")) < k, size(col("__mins")).cast("long"))
          .otherwise(
            expr(s"(${k - 1} * 4294967296L) div element_at(__mins, $k).ord"))
          .as("est_distinct"))
  }

  /**
   * HyperLogLog distinct-count estimate per group (Flajolet et al. '07),
   * fully DETERMINISTIC and integer-exact so a SQL oracle rebuilds the
   * identical sketch — the replayable twin of Spark's own
   * `approx_count_distinct` (whose HLL++ uses an engine-private hash and
   * bias tables, so it can never be cross-engine-gated).
   *
   * Register layout on the 32-bit md5-prefix hash (0 mapped to 1, same as
   * [[distinctKmv]]): the top `b` bits pick one of m = 2^b registers, and
   * ρ = leading-zeros-within-the-remaining-(32−b)-bits + 1 updates the
   * register max. The harmonic mean is computed EXACTLY in integers by
   * scaling each 2^−M_j term to 2^(32−M_j) (registers never hit store
   * 2^32), so
   *   est = (α_permille · m² · 2³²) div (1000 · Σ_j 2^(32−M_j))
   * replays bit-for-bit in any engine — no float, no pow, no ln. The
   * standard small-range linear-counting correction needs ln and is
   * deliberately NOT applied; `n_hit` (registers touched) is emitted so a
   * caller can apply it — use [[distinctKmv]] when exact small counts
   * matter (it reports them exactly).
   *
   * Standard error ≈ 1.04/√m (13% at the default b=6). `b` capped at 10
   * so α·m²·2³² stays in Long range.
   *
   * Scale shape: values hash AT THE SCAN; the (group, register) partial
   * max combines map-side to ≤ m rows per group per task, so the shuffle
   * carries bounded register tables, never values — the classic
   * mergeable-sketch contract.
   *
   * Output: groupCol, `n_hit` (registers touched, ≤ m), `est_distinct`.
   */
  def distinctHll(df: DataFrame, groupCol: String, valueCol: String,
                  b: Int = 6): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, valueCol, b), groupCol, b)

  private def alphaPermille(b: Int): Long = b match {
    case 4 => 673
    case 5 => 697
    case 6 => 709
    case _ => math.round(721.3 / (1 + 1.079 / (1L << b))) // Flajolet's α_m
  }

  /**
   * The HLL sketch STATE as a DataFrame: one (group, `register`,
   * `rho_max`) row per touched register — the mergeable artifact behind
   * [[distinctHll]]. Persist this per shard/partition/day (≤ 2^b rows per
   * group, parquet-friendly), then union any set of shard tables into
   * [[hllEstimate]]: register max commutes, so merge-then-estimate equals
   * the estimate over the concatenated raw data EXACTLY — the classic
   * mergeable-sketch contract that makes 100 TB incremental
   * distinct-counting a metadata operation instead of a corpus re-scan.
   */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
                   b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 10, s"b must be in [4, 10], got $b")
    val wBits = 32 - b
    val wMod = 1L << wBits
    val h = greatest(
      conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
        .cast("long"),
      lit(1L))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), h.as("__h"))
      .select(col(groupCol), expr(s"__h div ${wMod}L").as("register"),
        expr(s"__h % ${wMod}L").as("__w"))
      .select(col(groupCol), col("register"),
        when(col("__w") === 0L, lit(wBits + 1L))
          .otherwise(lit(wBits.toLong) - length(bin(col("__w"))) + 1L)
          .as("rho"))
      .groupBy(col(groupCol), col("register"))
      .agg(max(col("rho")).as("rho_max"))
  }

  /**
   * Bottom-k uniform-sample quantile sketch — the quantile member of the
   * deterministic sketch trio (with [[distinctKmv]]/[[distinctHll]] for
   * cardinality and SpaceSaving for heavy hitters). The k rows with the
   * smallest md5(rowId) hashes form an order-independent uniform sample
   * of each group (the classic bottom-k sketch), and the reported
   * quantiles are the EXACT lower quantiles of that sample:
   * `q_p = sample_sorted[(p·(n−1)) div 1000]`. Sampling error is the
   * usual O(1/√k) quantile bound; everything after the hash is integer,
   * so a SQL oracle rebuilds the identical sketch.
   *
   * `idCol` must be a UNIQUE row key within the group (it drives the
   * sample membership); `valueCol` must be integral (cast/scale floats
   * to cents/milli upstream, as the gates do). Hash ties break by value
   * — total order, deterministic cross-engine.
   *
   * Mergeable: [[quantileSample]] exposes the (group, hv, v) bottom-k
   * rows; union shard tables and re-sketch — min-k by hash commutes, so
   * merge-then-quantile equals quantile-over-union exactly (spec-pinned).
   *
   * Scale shape: rows hash AT THE SCAN; the bounded [[TopNByOrd]] heaps
   * combine map-side to ≤ k rows per task × group, so the shuffle carries
   * samples, never the corpus — same contract as KMV.
   *
   * Output: groupCol, `n_sample`, one `q<p>` column per requested
   * permille (e.g. q500 = median estimate).
   */
  def quantileSketch(df: DataFrame, groupCol: String, idCol: String,
                     valueCol: String, k: Int,
                     qsPermille: Seq[Int] = Seq(250, 500, 750)): DataFrame = {
    require(qsPermille.nonEmpty && qsPermille.forall(p => p >= 0 && p <= 1000),
      s"quantile permilles must be in [0, 1000], got $qsPermille")
    val base = quantileSample(df, groupCol, idCol, valueCol, k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("v"))).as("__vals"))
    val qCols = qsPermille.map { p =>
      expr(s"element_at(__vals, CAST(($p * (size(__vals) - 1)) div 1000 AS INT) + 1)")
        .as(s"q$p")
    }
    base.select(col(groupCol) +:
      size(col("__vals")).cast("long").as("n_sample") +: qCols: _*)
  }

  /**
   * The mergeable state behind [[quantileSketch]]: per group, the k rows
   * with the smallest `hv = md5₃₂(rowId)` (0→1, as everywhere), as
   * (groupCol, `hv`, `v`) rows. Persist per shard; union any set of shard
   * tables and feed back through this function (idempotent — min-k of a
   * union of min-k's is the global min-k) or into [[quantileSketch]]'s
   * aggregation via the same path.
   */
  def quantileSample(df: DataFrame, groupCol: String, idCol: String,
                     valueCol: String, k: Int): DataFrame = {
    val h = greatest(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long"),
      lit(1L))
    bottomK(df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol), h.as("__h"),
        col(valueCol).cast("long").as("__v")), groupCol, k)
  }

  /** Merge [[quantileSample]] shard tables: min-k of a union of min-k's
    * is the global min-k, so this returns exactly the sample the whole
    * concatenated corpus would have produced. `k` must match the shards'. */
  def quantileSampleMerge(shards: DataFrame, groupCol: String,
                          k: Int): DataFrame =
    bottomK(shards.select(col(groupCol), col("hv").as("__h"),
      col("v").as("__v")), groupCol, k)

  private def bottomK(rows: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")
    import org.apache.spark.sql.GraftShims
    val minK = GraftShims.column(org.apache.spark.sql.graft.TopNByOrd(
      GraftShims.expression(col("__h")),
      GraftShims.expression(col("__v")), k).toAggregateExpression())
    rows.groupBy(col(groupCol)).agg(minK.as("__mins"))
      .select(col(groupCol), explode(col("__mins")).as("__e"))
      .select(col(groupCol), col("__e.ord").as("hv"), col("__e.id").as("v"))
  }

  /** Merge + estimate over [[hllRegisters]] tables (any union of them —
    * merging IS `max` per register, re-done here, so shard tables can be
    * concatenated as-is). Same integer-exact harmonic mean as
    * [[distinctHll]]; `b` must match the registers' build. */
  def hllEstimate(registers: DataFrame, groupCol: String,
                  b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 10, s"b must be in [4, 10], got $b")
    val m = 1L << b
    registers
      .groupBy(col(groupCol), col("register"))
      .agg(max(col("rho_max")).as("__M"))
      .groupBy(col(groupCol)).agg(
        count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(1L, CAST(32 - __M AS INT))")).as("__sp"))
      .select(col(groupCol), col("n_hit"),
        expr(s"(${alphaPermille(b)} * ${m * m} * 4294967296L) div " +
          s"(1000 * (__sp + (${m}L - n_hit) * 4294967296L))")
          .as("est_distinct"))
  }
}
