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
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
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
}
