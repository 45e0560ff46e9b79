package graft.tools

/**
 * A/B the containmentPairs verify-join path on one corpus: auto sizing
 * (corpusSizeHint = 0, broadcast when the gram table fits) vs forced
 * shuffle (corpusSizeHint = -1). Written for the round-11 regression
 * triage: the auto-broadcast gate flipped the sf1 gate query from the
 * shuffled to the broadcast verify and its median moved 28 s → 48 s —
 * this probe attributes the difference on demand.
 *
 *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.tools.ProbeVerifyPath"
 */
object ProbeVerifyPath {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val shingle = sys.env.getOrElse("SPARK_GRAFT_SHINGLE", "9").toInt
    val spark = Probe.session("graft-probe-verifypath")
    val df = graft.sources.Tables.table(spark, sfDir, "documents")
    def run(hint: Long, label: String): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.pipeline.Dedup.containmentPairs(df, "doc_id", "text",
          thresholdPermille = 800, shingle = shingle,
          corpusSizeHint = hint).count()
        println(f"[probe-verifypath] $label run$i: pairs=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        spark.catalog.clearCache()
        System.gc()
      }
    }
    run(-1L, "forced-shuffle")
    run(0L, "auto (broadcast when fits)")
    spark.stop()
  }
}
