package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbePagerank {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-pagerank")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val o = spark.read.parquet(s"$d/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
    val l = spark.read.parquet(s"$d/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
    val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    t("edges distinct count")(println(e0.count()))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    t("warm edges again")(println(sym.count()))
    t("pagerank 2 iters")(println(graft.pipeline.Graph.pagerankInt(sym, 2).count()))
    t("pagerank 2 iters again")(println(graft.pipeline.Graph.pagerankInt(sym, 2).count()))
    spark.stop()
  }
}
