package graft.tools

import org.apache.spark.sql.SparkSession

// debug: what does the within() plan scan on each storage layout?
object ProbeStorage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-storage").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.registerAll(spark)
    val poly = "POLYGON ((-75.62 44.32, -75.38 44.32, -75.38 44.48, " +
      "-75.62 44.48, -75.62 44.32))"
    for (p <- Seq("/tmp/graft_store_part", "/tmp/graft_store_flat")) {
      val df = spark.read.parquet(p)
      val q = graft.api.Gis.within(df, poly)
      val t0 = System.nanoTime()
      val n = q.count()
      println(s"== $p  matched=$n  ${(System.nanoTime() - t0) / 1e9}s")
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      println(scan.toString.linesIterator.take(12).mkString("\n"))
      println(q.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Scan") || l.contains("Partition") || l.contains("Filter"))
        .take(8).mkString("\n"))
    }
    spark.stop()
  }
}
