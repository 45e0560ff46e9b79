package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale-behavior probes backing the r8 evidence items:
 *
 *  - [[ProbeSf10]]: the 5 heaviest bench queries timed at sf1 AND a
 *    generated sf10 slice (10× sf1 = 100× the driver's bench scale),
 *    min-of-2 per scale, ratios printed. sf1 ratios near 1–3× say
 *    scheduling overhead still dominates there; sf10 is where a hidden
 *    superlinearity would first show.
 *
 *  - [[ProbeAttrib]]: names the two widest sf1/sf0.1 ratios from the r7
 *    medians record with a measured cause — q_dedup_cosine (3.3×): the
 *    LSH candidate-pair volume and the n-aware (bands, planes) choice at
 *    each scale; q_heavy_ngrams (7.1×): the exploded gram-stream volume
 *    (the sketch itself is capacity-bounded, so stream volume IS the
 *    cost driver).
 */
object ProbeSf10 {
  private val Heavy = sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
    .map(_.split(",").map(_.trim).toSeq)
    .getOrElse(Seq("q_assoc_triples", "q_clustering_coeff",
      "q_pagerank_weighted", "q_dedup_cosine", "q_dedup_clusters_incr"))

  def main(args: Array[String]): Unit = {
    val sf01 = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sf1 = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val sf10 = if (args.length > 2) args(2) else "/tmp/graft_sf10"
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val spark = Probe.session("graft-probe-sf10")
    if (!new java.io.File(s"$sf1/lineitem.parquet").exists())
      ScaleUp.run(spark, sf01, sf1, factor = 10)
    if (!new java.io.File(s"$sf10/lineitem.parquet").exists())
      ScaleUp.run(spark, sf1, sf10, factor = 10)
    // warmup (codegen/session)
    graft.SparkEntry.queries("q_agg_q1")(spark, sf1).count()
    // a query that exhausts the probe host (disk/heap) records -1 instead
    // of killing the whole probe — the wall is itself a result
    def time(name: String, dir: String): Double = scala.util.Try {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }.recover { case ex =>
      System.err.println(s"[probe-sf10] $name@$dir failed: ${ex.getMessage}")
      -1.0
    }.get
    def minOk(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0); if (ok.isEmpty) -1.0 else ok.min
    }
    val out = Heavy.map { q =>
      val a = minOk((1 to runs).map(_ => time(q, sf1)))
      val b = minOk((1 to runs).map(_ => time(q, sf10)))
      val ratio = if (a > 0 && b > 0) b / a else -1.0
      println(f"[probe-sf10] $q sf1=$a%.2fs sf10=$b%.2fs ratio=$ratio%.2f")
      (q, a, b)
    }
    val json = out.map { case (q, a, b) =>
      val ratio = if (a > 0 && b > 0) b / a else -1.0
      f""""$q":{"sf1_sec":$a%.3f,"sf10_sec":$b%.3f,"ratio":$ratio%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"probe":"sf10","runs_min_of":$runs,"queries":$json}""")
    spark.stop()
  }
}

/** Shared probe session config — mirrors Bench's local[32] posture. */
object Probe {
  def session(name: String): SparkSession = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // unlike Bench (sf0.1/sf1, where local-disk I/O is cheap and
      // compression only costs CPU), the sf10 probe shuffles tens of GB —
      // uncompressed they exhaust the probe host's disk (measured: a 49 GB
      // block-manager dir and ENOSPC on the first attempt), so the probe
      // runs with the cluster posture: compressed shuffle + spill
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      // same posture for persisted/checkpointed block-manager disk blocks
      // (localCheckpoint + cache spill): Spark's default leaves them
      // UNCOMPRESSED, which at sf100 makes a 1.1 B-edge loop-invariant
      // table ~3-4x larger on scratch disk than it needs to be
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.util.Logs.muteBoundedWindowWarn()
    graft.sql.functions.registerAll(s)
    s
  }
}

object ProbeAttrib {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = Probe.session("graft-probe-attrib")
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.graft.VecLshBands
    def c(x: org.apache.spark.sql.catalyst.expressions.Expression) =
      GraftShims.column(x)
    def e(x: org.apache.spark.sql.Column) = GraftShims.expression(x)

    val parts = dirs.map { dir =>
      // --- q_dedup_cosine: candidate volume under the n-aware banding ---
      val embs = graft.sources.Tables.table(spark, dir, "embeddings")
      val n = embs.count()
      val (b, r) = graft.pipeline.Dedup.cosineLshParams(
        threshold = 0.5, targetRecall = 0.999, corpusSize = n)
      // Σ C(occupancy, 2) over every (band, bucket) — the exact number of
      // candidate pairs the bucket-local pair explode emits before the
      // cosine verify (the verify is a per-pair map-side filter, so this
      // volume IS the operator's scale driver)
      val cand = embs
        .select(col("vec_id"), posexplode(
          c(VecLshBands(e(col("embedding")), e(lit(b)), e(lit(r)), e(lit(42L))))))
        .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) div 2"))).head().getLong(0)
      // the full verify pass materializes `cand` candidate pairs through
      // two joins; past ~1e9 candidates that is the measured wall of
      // threshold-0.5 hyperplane LSH (the Dedup scaladoc's "IVF-partition
      // first" regime) — the volume number IS the attribution there, so
      // the probe reports it and skips the infeasible join
      val verified =
        if (cand <= 1000000000L)
          graft.SparkEntry.queries("q_dedup_cosine")(spark, dir).count()
        else -1L

      // --- q_heavy_ngrams: exploded gram-stream volume ---
      val docs = graft.sources.Tables.table(spark, dir, "documents")
      val grams = docs.select(explode(
        graft.pipeline.TextAnalysis.tokenNgramsAll(col("text"), 3)).as("gram"))
      val gramCount = grams.count()
      val gramDistinct = grams.select(approx_count_distinct(col("gram")))
        .head().getLong(0)
      println(f"[probe-attrib] $dir vecs=$n bands=$b planes=$r " +
        f"cand_pairs=$cand verified=$verified grams=$gramCount distinct~$gramDistinct")
      f""""$dir":{"vectors":$n,"bands":$b,"planes_per_band":$r,"candidate_pairs":$cand,"verified_pairs":$verified,"grams":$gramCount,"grams_distinct_approx":$gramDistinct}"""
    }
    println(s"""{"probe":"attrib","dirs":${parts.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}

/**
 * Verdict-r12 #3 probe: a synthetic corpus whose pre-token vocabulary
 * exceeds 2²⁰ (the trainBpe histogram cap) must TRAIN, not throw — the
 * truncation contract in [[graft.pipeline.TextAnalysis.trainBpe]]. 1.3 M
 * distinct pre-tokens, zipf-ish counts via repetition of the low ids, 50
 * merges; prints one JSON line with the wall time and the merge count.
 */
object ProbeBpeVocab {
  def main(args: Array[String]): Unit = {
    val spark = Probe.session("graft-probe-bpe-vocab")
    import org.apache.spark.sql.functions._
    val nTokens = 1300000L // > 1 << 20 distinct pre-tokens
    // docs of 64 tokens each; ids 0..999 additionally repeat ×100 so the
    // head of the distribution is genuinely frequent (merges must find
    // real mass above minPairCount, as in a natural corpus)
    val head = spark.range(100000L).select((col("id") % 1000L).as("tid"))
    val tail = spark.range(nTokens).select(col("id").as("tid"))
    val docs = tail.unionAll(head)
      .select(col("tid"), (monotonically_increasing_id() % 20000L).as("doc"))
      .groupBy(col("doc"))
      .agg(concat_ws(" ", collect_list(concat(lit("tk"), col("tid")))).as("text"))
    val t0 = System.nanoTime()
    val merges = graft.pipeline.TextAnalysis.trainBpe(docs, numMerges = 50)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"bpe_vocab_cliff","distinct_pretokens":$nTokens,"merges_learned":${merges.length},"sec":$sec%.2f,"completed":true}""")
    spark.stop()
  }
}
