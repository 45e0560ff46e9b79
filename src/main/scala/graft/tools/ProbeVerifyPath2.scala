package graft.tools

/** Candidate-count attribution for the containment shuffle path: how many
  * candidate pairs does the guarded construction actually produce, and
  * what does each stage cost? (round-11 ENOSPC triage). */
object ProbeVerifyPath2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val shingle = 9
    val threshold = 800
    val spark = Probe.session("graft-probe-verifypath2")
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ShingleHashes
    def c(x: org.apache.spark.sql.catalyst.expressions.Expression) =
      GraftShims.column(x)
    def e(x: org.apache.spark.sql.Column) = GraftShims.expression(x)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pvp2] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      r
    }
    val df = graft.sources.Tables.table(spark, sfDir, "documents")
    val base = df.select(col("doc_id").as("id"), col("text"))
    val docGrams = base.select(col("id"),
      array_sort(c(ShingleHashes(e(col("text")), e(lit(shingle))))).as("grams"))
      .filter(size(col("grams")) > 0).localCheckpoint(true)
    timed("docs")(docGrams.count())
    val exploded = docGrams
      .select(col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("gram"))
      .localCheckpoint(true)
    timed("gram rows")(exploded.count())
    val dfreq = exploded.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
      .localCheckpoint(true)
    timed("distinct grams")(dfreq.count())
    println("[pvp2] gdf histogram coarse: " +
      dfreq.groupBy(expr("CASE WHEN gdf <= 568 THEN 'le568' WHEN gdf <= 10000 THEN 'le10k' ELSE 'gt10k' END"))
        .agg(count(lit(1)).as("n"), sum(col("gdf")).as("slots")).collect().mkString(", "))
    val rarity = Window.partitionBy(col("id")).orderBy(col("gdf").asc, col("gram").asc)
    val prefix = exploded.join(dfreq, "gram")
      .withColumn("rk", row_number().over(rarity))
      .filter(col("rk") <=
        col("sz") - expr(s"($threshold * sz + 999) div 1000") + lit(1))
      .select(col("gram"), col("id").as("id_s"), col("sz").as("sz_s"))
      .localCheckpoint(true)
    timed("prefix rows")(prefix.count())
    val grouped = exploded.groupBy(col("gram"))
      .agg(collect_list(struct(col("id"), col("sz"))).as("items"))
      .filter(size(col("items")).between(2, 568))
    val cands = grouped.join(prefix, "gram")
      .select(col("id_s"), col("sz_s"), explode(col("items")).as("b"))
      .filter(col("sz_s") < col("b.sz") ||
        (col("sz_s") === col("b.sz") && col("id_s") =!= col("b.id")))
      .select(least(col("id_s"), col("b.id")).as("id_a"),
        greatest(col("id_s"), col("b.id")).as("id_b"))
    timed("raw candidate enumerations (gdf<=568)")(cands.count())
    timed("distinct candidates (gdf<=568)")(cands.dropDuplicates("id_a", "id_b").count())
    spark.stop()
  }
}
