package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeAssoc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-assoc").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val df = graft.pipeline.MarketBasket.pairRules(li, "l_orderkey", "l_partkey", 2)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    val shuffles = "Exchange".r.findAllIn(plan).length
    println(s"[probe] parquet scans: $scans, exchanges: $shuffles")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name rows=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    t("warm1")(graft.pipeline.MarketBasket.pairRules(li, "l_orderkey", "l_partkey", 2).count())
    t("warm2")(graft.pipeline.MarketBasket.pairRules(li, "l_orderkey", "l_partkey", 2).count())
    spark.stop()
  }
}
