package graft.tools

import org.apache.spark.sql.functions._

/**
 * Stage attribution for [[graft.pipeline.Dedup.containmentPairs]] — the
 * heaviest sf1 bench query (~50% of the sf1 total). Rebuilds the
 * operator's stages one by one on SPARK_GRAFT_SF_DIR (default
 * /tmp/graft_sf1) and times/counts each, so "containment is slow" becomes
 * "stage X produces N rows and costs T seconds".
 */
object ProbeContainment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val threshold = 800
    // default matches the gate query's re-gated config (shingle=9)
    val shingle = sys.env.getOrElse("SPARK_GRAFT_SHINGLE", "9").toInt
    val spark = Probe.session("graft-probe-containment")
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.{ShingleHashes, SortedIntersectAtLeast}
    def c(x: org.apache.spark.sql.catalyst.expressions.Expression) =
      GraftShims.column(x)
    def e(x: org.apache.spark.sql.Column) = GraftShims.expression(x)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-containment] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val df = graft.sources.Tables.table(spark, sfDir, "documents")
    println(s"[probe-containment] sfDir=$sfDir shingle=$shingle threshold=$threshold")
    // SPARK_GRAFT_STAGES=false skips the stage-by-stage attribution (whose
    // own localCheckpoint materializations are deliberately unguarded) and
    // runs only the guarded end-to-end operator — the right mode for
    // disk-bounded probe hosts
    if (sys.env.getOrElse("SPARK_GRAFT_STAGES", "true") != "false") {
    val base = df.select(col("doc_id").as("id"), col("text"))
    val docGrams = base.select(col("id"),
      array_sort(c(ShingleHashes(e(col("text")), e(lit(shingle))))).as("grams"))
      .filter(size(col("grams")) > 0)
      .localCheckpoint(true)
    val nDocs = timed("docGrams (shingle+sort+materialize)")(docGrams.count())
    val exploded = docGrams
      .select(col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("gram"))
      .localCheckpoint(true)
    val nGramRows = timed("exploded gram rows (materialize)")(exploded.count())
    val dfreq = exploded.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
      .localCheckpoint(true)
    val nDistinctGrams = timed("dfreq (gram document frequencies)")(dfreq.count())
    val rarity = Window.partitionBy(col("id")).orderBy(col("gdf").asc, col("gram").asc)
    val prefix = exploded.join(dfreq, "gram")
      .withColumn("rk", row_number().over(rarity))
      .filter(col("rk") <=
        col("sz") - expr(s"($threshold * sz + 999) div 1000") + lit(1))
      .select(col("gram"), col("id").as("id_s"), col("sz").as("sz_s"))
      .localCheckpoint(true)
    val nPrefix = timed("prefix rows (dfreq join + per-doc rarity window)")(prefix.count())
    val grouped = exploded.groupBy(col("gram"))
      .agg(collect_list(struct(col("id"), col("sz"))).as("items"))
      .localCheckpoint(true)
    val nBuckets = timed("full inverted index (collect_list buckets)")(grouped.count())
    val bucketStats = grouped.select(size(col("items")).as("n"))
      .agg(sum(col("n")), max(col("n")), expr("percentile_approx(n, 0.99)")).head()
    println(s"[probe-containment] bucket rows=$nBuckets sum=${bucketStats.get(0)} " +
      s"max=${bucketStats.get(1)} p99=${bucketStats.get(2)}")
    val rawCand = grouped.join(prefix, "gram")
      .select(col("id_s"), col("sz_s"), explode(col("items")).as("b"))
      .filter(col("sz_s") < col("b.sz") ||
        (col("sz_s") === col("b.sz") && col("id_s") =!= col("b.id")))
      .select(least(col("id_s"), col("b.id")).as("id_a"),
        greatest(col("id_s"), col("b.id")).as("id_b"))
    val nRawCand = timed("candidate stream PRE-dedup (bucket explode)")(rawCand.count())
    val candidates = rawCand.dropDuplicates("id_a", "id_b").localCheckpoint(true)
    val nCand = timed("candidates post-dedup (shuffle)")(candidates.count())
    val ga = docGrams.select(col("id").as("id_a"), col("grams").as("g_a"))
    val gb = docGrams.select(col("id").as("id_b"), col("grams").as("g_b"))
    val verified = candidates.join(broadcast(ga), "id_a").join(broadcast(gb), "id_b")
      .withColumn("__min", least(size(col("g_a")), size(col("g_b"))))
      .withColumn("__need", expr(s"($threshold * __min + 999) div 1000").cast("int"))
      .withColumn("__inter",
        c(SortedIntersectAtLeast(e(col("g_a")), e(col("g_b")), e(col("__need")))))
      .filter(col("__inter") >= col("__need").cast("long"))
    val nPairs = timed("verify (broadcast join + early-abandon intersect)")(verified.count())
    println(s"[probe-containment] docs=$nDocs gramRows=$nGramRows " +
      s"distinctGrams=$nDistinctGrams prefixRows=$nPrefix rawCand=$nRawCand " +
      s"cand=$nCand pairs=$nPairs")
    }
    // end-to-end at the gate config, with the capBuckets + volume-guard
    // metrics observed: on a replica-degenerate corpus whose shuffled
    // verify would exceed the byte budget, the run must COMPLETE with the
    // drops recorded here (guard_kept < guard_total), never ENOSPC
    val obs = new org.apache.spark.sql.Observation("probe-containment-guard")
    val t0 = System.nanoTime()
    val nOpPairs = graft.pipeline.Dedup.containmentPairs(
      df, "doc_id", "text", threshold, shingle = shingle,
      metrics = Some(obs)).count()
    println(f"[probe-containment] full operator end-to-end (shingle=$shingle): " +
      f"${(System.nanoTime() - t0) / 1e9}%.2fs, pairs=$nOpPairs")
    println(s"[probe-containment] guard/cap metrics: ${obs.get.toSeq.sortBy(_._1).mkString(", ")}")
    spark.stop()
  }
}
