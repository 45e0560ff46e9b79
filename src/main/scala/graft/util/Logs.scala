package graft.util

/** Log hygiene for the driver-facing mains. */
object Logs {

  /**
   * Mute WindowExec's "No Partition Defined … serious performance
   * degradation" WARN for this JVM.
   *
   * Several gate queries rank BOUNDED post-limit sets (zipf vocab ≤ topV
   * rows, BM25/RRF top-20) with a global-order window — single-partition
   * by construction and size-bounded, so the warning is a false positive
   * that pollutes the driver-parsed bench/verify logs. It cannot be
   * silenced in the plan: Spark 4's `EliminateWindowPartitions` optimizer
   * rule folds away any constant partition key, so the classic
   * `partitionBy(lit(0))` idiom no longer works. Muting is scoped to the
   * window-exec loggers only; every other WARN still surfaces.
   */
  def muteBoundedWindowWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
}
