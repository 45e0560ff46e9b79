package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured experiment: where does q_bm25's wall time go at sf0.1?
  * Times each stage of the BM25 plan in isolation on a warm session. */
object ProbeBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-bm25")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.registerAll(spark)
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  (rows=$n)")
    }
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    docs.count() // warm
    val terms = Seq("merge", "window", "table")
    val toks = split(trim(col("text")), "\\s+")
    timed("scan+count")(docs.count())
    timed("tokenize+size")(docs.select(size(toks).as("n")).agg(sum("n")).count())
    timed("filter-hits")(docs.select(
      filter(toks, t => t.isInCollection(terms)).as("h")).agg(sum(size(col("h")))).count())
    timed("base+stats")(docs.select(size(toks).cast("long").as("dl"),
      filter(toks, t => t.isInCollection(terms)).as("hits"))
      .agg(count(lit(1)), sum(col("dl"))).count())
    timed("tf-groupBy") {
      docs.select(col("doc_id"), size(toks).cast("long").as("dl"),
          filter(toks, t => t.isInCollection(terms)).as("hits"))
        .filter(size(col("hits")) > 0)
        .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf")).count()
    }
    timed("full-bm25")(
      graft.pipeline.TextAnalysis.bm25(docs, terms, topN = 20).count())
    timed("full-bm25-again")(
      graft.pipeline.TextAnalysis.bm25(docs, terms, topN = 20).count())
    spark.stop()
  }
}
