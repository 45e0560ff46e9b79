package graft.tools

import org.apache.spark.sql.SparkSession

// head-to-head: flat vs fused exact Jaccard pipeline at a given sf dir
object ProbeFused {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("probe-fused").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.registerAll(spark)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val n = docs.count()
    for (round <- 1 to 2;
         variant <- Seq("flat", "fused-array-nosf", "fused-array-sf3", "fused-bitset")) {
      val t0 = System.nanoTime()
      val cnt = (variant match {
        case "flat" =>
          graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            threshold = 0.8, corpusSizeHint = n)
        case "fused-array-nosf" =>
          graft.pipeline.Dedup.ngramJaccardPairsFused(docs, "doc_id", "text",
            threshold = 0.8, corpusSizeHint = n, mode = "array", suffixFilterDepth = 0)
        case "fused-array-sf3" =>
          graft.pipeline.Dedup.ngramJaccardPairsFused(docs, "doc_id", "text",
            threshold = 0.8, corpusSizeHint = n, mode = "array", suffixFilterDepth = 3)
        case _ =>
          graft.pipeline.Dedup.ngramJaccardPairsFused(docs, "doc_id", "text",
            threshold = 0.8, mode = "bitset")
      }).count()
      println(f"[fusedprobe] round$round $variant rows=$cnt ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
