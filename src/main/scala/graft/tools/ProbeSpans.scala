package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeSpans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val q = graft.pipeline.Dedup.sharedSpanStats(docs)
    q.count()
    println(f"[spans] ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val plan = q.queryExecution.executedPlan.toString
    println("[spans] broadcast join? " + plan.contains("BroadcastHashJoin"))
    println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")).take(8).mkString("\n"))
    spark.stop()
  }
}
