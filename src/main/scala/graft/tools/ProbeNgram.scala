package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// stage-by-stage cost probe for Dedup.ngramJaccardPairs at a given sf dir
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("probe-ngram").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.registerAll(spark)
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.graft.ShingleHashes
    def c(e: org.apache.spark.sql.catalyst.expressions.Expression) = GraftShims.column(e)
    def e(col: org.apache.spark.sql.Column) = GraftShims.expression(col)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val threshold = 0.8
    val df = graft.sources.Tables.table(spark, sfDir, "documents")
    val base = df.select(col("doc_id").as("id"), col("text"))
    val docGrams = base.select(col("id"),
      array_sort(c(ShingleHashes(e(col("text")), e(lit(5))))).as("grams")).cache()
    val exploded = docGrams
      .select(col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("gram"))
      .cache()
    timed("exploded rows")(println("  n=" + exploded.count()))
    val dfreq = exploded.groupBy(col("gram")).agg(count(lit(1)).as("gdf")).cache()
    timed("dfreq rows")(println("  n=" + dfreq.count()))
    import org.apache.spark.sql.expressions.Window
    val rarity = Window.partitionBy(col("id")).orderBy(col("gdf").asc, col("gram").asc)
    val prefix = exploded.join(dfreq, "gram")
      .withColumn("rk", row_number().over(rarity))
      .filter(col("rk") <=
        col("sz") - ceil(col("sz") * lit(threshold) - lit(1e-9)).cast("int") + lit(1))
      .select(col("gram"), col("id"), col("sz"), col("rk"))
      .cache()
    timed("prefix rows")(println("  n=" + prefix.count()))
    val grouped = prefix.groupBy(col("gram"))
      .agg(collect_list(struct(col("id"), col("sz"), col("rk"))).as("items"))
      .filter(size(col("items")).between(2, 10000)).cache()
    timed("buckets")(println("  n=" + grouped.count() + " maxsz=" +
      grouped.agg(max(size(col("items")))).head.get(0)))
    val candidates = grouped
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .filter(col("b.sz") * lit(threshold) <= col("a.sz") + lit(1e-6) &&
        col("a.sz") * lit(threshold) <= col("b.sz") + lit(1e-6))
      .filter(lit(threshold / (1.0 + threshold)) * (col("a.sz") + col("b.sz")) - lit(1e-6) <=
        lit(1.0) + least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    timed("raw candidate rows")(println("  n=" + candidates.count()))
    val dedup = candidates.dropDuplicates("id_a", "id_b").cache()
    timed("distinct candidates")(println("  n=" + dedup.count()))
    val ga = docGrams.select(col("id").as("id_a"), col("grams").as("g_a"))
    val gb = docGrams.select(col("id").as("id_b"), col("grams").as("g_b"))
    val out = dedup.join(ga, "id_a").join(gb, "id_b")
      .withColumn("jaccard", c(org.apache.spark.sql.graft.SortedJaccard(e(col("g_a")), e(col("g_b")))))
      .filter(col("jaccard") >= threshold)
    timed("verified pairs")(println("  n=" + out.count()))
    spark.stop()
  }
}
