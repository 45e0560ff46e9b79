package graft.util

import org.apache.logging.log4j.LogManager
import org.scalatest.funsuite.AnyFunSuite

/**
 * The bounded-window WARN mute is message-specific and COUNTED: only the
 * "No Partition Defined" false positive is dropped (and tallied in
 * [[Logs.suppressedWindowWarns]], which the bench record surfaces); any
 * other warning from the window-exec loggers still flows — the pre-r8
 * package-level ERROR mute would have hidden a future genuinely-unbounded
 * window's perf signal.
 */
class LogsSpec extends AnyFunSuite {

  test("no-partition WARN is counted; other window warnings are not") {
    // mirror the mains' ordering: Spark initializes log4j (root level WARN
    // via setLogLevel) BEFORE the filter installs — without this the
    // default config's ERROR root level drops the WARN before it can
    // reach the LoggerConfig filter at all
    graft.SparkTestBase.spark
    Logs.muteBoundedWindowWarn()
    Logs.muteBoundedWindowWarn() // idempotent: second install must not double-count
    val logger =
      LogManager.getLogger("org.apache.spark.sql.execution.window.WindowExec")
    val before = Logs.suppressedWindowWarns.get()
    logger.warn("No Partition Defined for Window operation! Moving all data " +
      "to a single partition, this can cause serious performance degradation.")
    assert(Logs.suppressedWindowWarns.get() == before + 1,
      "the no-partition WARN must route through the counting DENY filter exactly once")
    logger.warn("some other window warning that must not be suppressed")
    assert(Logs.suppressedWindowWarns.get() == before + 1,
      "non-matching warnings must not be counted (or suppressed)")
  }

  test("unpersist-checkpoint WARN is counted; other rdd warnings are not") {
    graft.SparkTestBase.spark
    Logs.muteUnpersistCheckpointWarn()
    Logs.muteUnpersistCheckpointWarn() // idempotent
    val logger = LogManager.getLogger("org.apache.spark.rdd.MapPartitionsRDD")
    val before = Logs.suppressedUnpersistWarns.get()
    logger.warn("RDD 42 was locally checkpointed, its lineage has been " +
      "truncated and cannot be recomputed after unpersisting")
    assert(Logs.suppressedUnpersistWarns.get() == before + 1,
      "the unpersist WARN must route through the counting DENY filter exactly once")
    logger.warn("some other rdd warning that must not be suppressed")
    assert(Logs.suppressedUnpersistWarns.get() == before + 1,
      "non-matching rdd warnings must not be counted (or suppressed)")
  }
}
