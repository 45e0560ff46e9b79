package graft.tools

/**
 * Verdict-r12 #5 probe: the scale-sensitive five, one more decade up.
 * Builds sf100 (= 10× the sf10 replica corpus = 1000× the driver's bench
 * scale: 5 M documents / 600 M lineitem / 100 M events, ~17 GB parquet)
 * with [[ScaleUp]] if absent, then
 * times each query once at sf10 and once at sf100 — min-of-1 by design:
 * the point is ratio-scale evidence and guard behavior (candidate-volume
 * guards must cap loudly rather than ENOSPC), not a tight benchmark. A
 * query that exhausts the host records -1 instead of killing the probe.
 */
object ProbeSf100 {
  private val Five = sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
    .map(_.split(",").map(_.trim).toSeq)
    .getOrElse(Seq("q_dedup_keeplist", "q_dedup_media_h7",
      "q_dedup_containment", "q_pagerank", "q_assoc_pairs"))

  def main(args: Array[String]): Unit = {
    val sf10 = if (args.length > 0) args(0) else "/tmp/graft_sf10"
    val sf100 = if (args.length > 1) args(1) else "/tmp/graft_sf100"
    val spark = Probe.session("graft-probe-sf100")
    spark.sparkContext.setLogLevel("WARN")
    // the brief's partition-sizing rule, applied: at sf100 a 32-partition
    // shuffle puts ~2.5 M sig-carrying rows in every aggregation task and
    // 32 concurrent hash maps blow the heap (measured AGGREGATE_OUT_OF_
    // MEMORY on the first attempt). 256 initial partitions keep per-task
    // state ~300 MB; AQE coalesces the small shuffles back down, so sf10
    // numbers are unaffected.
    spark.conf.set("spark.sql.shuffle.partitions", 256)
    if (!new java.io.File(s"$sf100/lineitem.parquet").exists())
      ScaleUp.run(spark, sf10, sf100, factor = 10)
    graft.SparkEntry.queries("q_agg_q1")(spark, sf10).count() // warmup
    def time(name: String, dir: String): Double = scala.util.Try {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }.recover { case ex =>
      System.err.println(s"[probe-sf100] $name@$dir failed: ${ex.getMessage}")
      -1.0
    }.get
    // a multi-query sf100 marathon accumulates shuffle files from FINISHED
    // jobs (ContextCleaner only reclaims them on a driver GC — measured:
    // 55 GB of block-manager dirs and ENOSPC three queries in). Force the
    // GC between timed runs so each query starts from a clean disk floor.
    def gcShuffles(): Unit = { System.gc(); Thread.sleep(3000) }
    val out = Five.map { q =>
      val a = time(q, sf10)
      gcShuffles()
      val b = time(q, sf100)
      gcShuffles()
      val ratio = if (a > 0 && b > 0) b / a else -1.0
      println(f"[probe-sf100] $q sf10=$a%.2fs sf100=$b%.2fs ratio=$ratio%.2f")
      f""""$q":{"sf10_sec":$a%.2f,"sf100_sec":$b%.2f,"ratio":$ratio%.2f}"""
    }
    println(s"""{"probe":"sf100","runs_min_of":1,"queries":${out.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
