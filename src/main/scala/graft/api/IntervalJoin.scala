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
 * Scale shape: intervals (replicated by their span/width) broadcast by
 * default; facts never shuffle and probe one hash bucket each. For an
 * interval table too big to broadcast, pass `broadcastIntervals = false`
 * and the same bucket columns drive a shuffle join unchanged.
 *
 * Guards: an interval with `lo > hi` fails the job with a named error
 * (a silent descending `sequence` would drop the row instead), and any
 * interval spanning more than `maxBucketsPerInterval` buckets fails
 * fast — one corrupt mega-span would otherwise explode to Spark's
 * array-size limit and flood the broadcast.
 */
object IntervalJoin {

  def lookup(facts: DataFrame, valueCol: String, intervals: DataFrame,
             loCol: String = "lo", hiCol: String = "hi",
             bucketWidth: Double,
             broadcastIntervals: Boolean = true,
             maxBucketsPerInterval: Long = 1 << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val loB = bucketOf(col(loCol))
    val hiB = bucketOf(col(hiCol))
    // the checks feed the sequence's upper bound, so column pruning can
    // never optimize them away
    val hiChecked =
      when(col(loCol) > col(hiCol),
        raise_error(concat(lit(s"IntervalJoin: $loCol > $hiCol for interval ["),
          col(loCol), lit(", "), col(hiCol), lit(")"))))
      .when(hiB - loB + 1 > maxBucketsPerInterval,
        raise_error(concat(lit("IntervalJoin: interval ["), col(loCol),
          lit(", "), col(hiCol),
          lit(s") spans more than $maxBucketsPerInterval buckets at " +
            s"width $bucketWidth — raise bucketWidth or maxBucketsPerInterval"))))
      .otherwise(hiB)
    val reps = intervals.withColumn("__b", explode(sequence(loB, hiChecked)))
    val probed = facts.withColumn("__b", bucketOf(col(valueCol)))
    probed.join(if (broadcastIntervals) broadcast(reps) else reps, "__b")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__b")
  }
}
