package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generic multi-dimensional storage layout: Z-order (Morton) clustering
 * for parquet row-group skipping on MULTIPLE range columns at once — the
 * layout lever behind Databricks' OPTIMIZE ZORDER and the generic
 * sibling of this repo's special-purpose layouts (geohash `gh_prefix`
 * for spatial scans, `lsh_bucket` for ANN probes, token shards for
 * trainer hand-off). A table sorted on ONE column skips row groups only
 * for predicates on that column; sorting on the bit-interleaved z-value
 * makes every row group a small axis-aligned rectangle in (a, b) space,
 * so min/max stats prune scans for range predicates on EITHER column.
 *
 * The interleave is the classic magic-bits spread (5 shift-or-mask
 * steps per column — plain codegen'd long arithmetic, no UDF).
 */
object Layout {

  private val Masks = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 32 bits of `c` to the even bit positions of a long. */
  private def spread(c: Column): Column =
    Masks.foldLeft(c) { case (x, (s, m)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /**
   * The 64-bit Morton code of two 32-bit coordinates: bits of `a` on even
   * positions, `b` on odd. Both inputs MUST be in [0, 2³²) — bucket or
   * offset real values first (e.g. `unix_micros(ts) div 1000000` and an
   * id mod-bucket); the range guard is woven into the value expression,
   * so column pruning cannot elide it (ANSI-faults on violation).
   */
  def zorder2(a: Column, b: Column): Column = {
    val bound = lit(4294967296L)
    val guarded = (c: Column, name: String) =>
      when(c.isNull || c < 0 || c >= bound,
        expr(s"CAST(raise_error('zorder2: $name out of [0, 2^32)') AS BIGINT)"))
        .otherwise(c.cast("long"))
    spread(guarded(a, "a")).bitwiseOR(shiftleft(spread(guarded(b, "b")), 1))
  }

  /**
   * Write `df` parquet clustered by the z-order of two range columns:
   * range-repartition on the z-value (balanced output files even under
   * skew — range boundaries come from a sample), sort within partitions,
   * drop the helper column. Predicates on EITHER column then prune row
   * groups via parquet min/max stats — no directory scheme needed, so
   * this composes with any `partitionBy` the caller adds upstream.
   */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String): Unit =
    df.withColumn("__z", zorder2(col(colA), col(colB)))
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
