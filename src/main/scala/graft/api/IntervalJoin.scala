package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval-LOOKUP join: match each fact row's scalar to the interval(s)
 * `[lo, hi)` containing it — the IP-range→geo, balance→tier,
 * timestamp→release-window lookup every enrichment pipeline runs.
 *
 * Spark's own plan for `facts JOIN intervals ON v >= lo AND v < hi` is a
 * BroadcastNestedLoopJoin — every row probes EVERY interval, O(n·m) work
 * that melts down once the interval table has real size. This operator
 * buckets both sides on `floor(value / bucketWidth)`: each interval
 * replicates to the buckets its span touches, facts compute one bucket
 * scan-locally, and the match becomes a broadcast HASH join on the
 * bucket key (plan-asserted in PlanSpec) followed by the exact range
 * filter. The bucket containing a value always appears in the covering
 * interval's bucket list (floor is monotone), so bucketing is a pure
 * candidate-superset — no false negatives, and the bucket arithmetic
 * never needs cross-engine parity because the final filter re-checks
 * the REAL predicate.
 *
 * Pick `bucketWidth` near the median interval span: replication factor
 * is ~span/width + 1 per interval, probe fan-out is the per-bucket
 * interval count (overlapping intervals multiply candidates, which is
 * the join's actual output semantics anyway).
 *
 * Scale shape: intervals (replicated by their span/width) broadcast;
 * facts never shuffle and probe one hash bucket each. For an interval
 * table too big to broadcast, the same bucket columns support a shuffle
 * hash join unchanged.
 */
object IntervalJoin {

  def lookup(facts: DataFrame, valueCol: String, intervals: DataFrame,
             loCol: String = "lo", hiCol: String = "hi",
             bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val reps = intervals
      .withColumn("__b", explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val probed = facts.withColumn("__b", bucketOf(col(valueCol)))
    probed.join(broadcast(reps), "__b")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__b")
  }
}
