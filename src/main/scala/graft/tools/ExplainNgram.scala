package graft.tools

import org.apache.spark.sql.SparkSession

// one-off: shuffle-count audit of the bitset vs array exact-join plans
object ExplainNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .appName("explain-ngram").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.registerAll(spark)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    for (mode <- Seq("bitset", "array")) {
      val df = graft.pipeline.Dedup.ngramJaccardPairsFused(docs, "doc_id", "text",
        threshold = 0.8, mode = mode)
      df.count()
      val plan = df.queryExecution.executedPlan
      def finalPlan(p: org.apache.spark.sql.execution.SparkPlan) = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      var shuffles = 0
      finalPlan(plan).foreach {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => shuffles += 1
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => shuffles += 1
        case _ =>
      }
      println(s"[explain] mode=$mode shuffles=$shuffles")
    }
    spark.stop()
  }
}
