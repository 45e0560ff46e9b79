package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact-integer Column arithmetic for the pipeline operators.
  * One definition, referenced everywhere, so a future fixup can never
  * drift between call sites (the r11 ADVICE duplication finding). */
private[pipeline] object IntMath {

  /**
   * Exact integer square root as a Column: floor(sqrt(x)) for a
   * non-negative BIGINT x. Starts from the IEEE correctly-rounded
   * double sqrt (off by at most one ulp after floor) and applies a
   * one-step integer fixup in BOTH directions, so the result is the
   * true isqrt regardless of rounding — the identical expression tree
   * replays in DuckDB. Used by [[Preference.leaderboard]]'s Wilson
   * bound and [[Evaluation.rankCorrelation]]'s denominator.
   */
  def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    when(s0 * s0 > x, s0 - 1)
      .when((s0 + 1) * (s0 + 1) <= x, s0 + 1)
      .otherwise(s0)
  }
}
