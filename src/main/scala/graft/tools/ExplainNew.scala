package graft.tools

// quick plan audit: SPARK_GRAFT_EXPLAIN=q_a,q_b overrides the default list
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("explain").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.functions.registerAll(spark)
    val d = "/root/testdata/sf0.01"
    val qs = sys.env.get("SPARK_GRAFT_EXPLAIN").map(_.split(",").toSeq)
      .getOrElse(Seq("q_pivot", "q_percentile", "q_sample_group", "q_sample_frac", "q_grouping_sets"))
    for (q <- qs) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    }
    spark.stop()
  }
}