package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
 * prints ONE JSON line {"metric":...,"queries":{...}}.
 *
 * Per-query timing wraps a full action (count) on a warm session; one
 * untimed warmup query first absorbs session/codegen startup so the numbers
 * measure the plans, not JVM warmup.
 *
 * Scale pass: unless SPARK_GRAFT_SCALE_SF1=false, the run then materializes
 * a deterministic 10× copy of the data ([[graft.tools.ScaleUp]]) and re-runs
 * every query on it, so the emitted line carries driver-recorded sf1 numbers
 * (`sf1_total`/`sf1_queries`) next to the base-scale ones — scale behavior
 * is measured in the recorded bench, not claimed from side notes.
 */
object Bench {
  // SPARK_GRAFT_ONLY=q_a,q_b restricts the run for focused re-benching of a
  // hot query before a commit (the full JSON stays the driver contract)
  private val only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)

  private def timeAll(spark: SparkSession, sfDir: String): Seq[(String, Double)] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }

  private def toJsonMap(results: Seq[(String, Double)]): String =
    results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // single-node local shuffles: compression costs more than the local
      // disk I/O it saves (these stay ON for any real cluster deployment,
      // where network bandwidth dominates)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.registerAll(spark)

    // warmup: session init + codegen paths
    SparkEntry.queries("q_agg_q1")(spark, sfDir).count()

    val results = timeAll(spark, sfDir)
    val total = results.map(_._2).sum

    // 10× scale pass (driver-recorded sf1 numbers), skippable via env
    val scalePart =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE_SF1", "true") == "false") ""
      else scala.util.Try {
        val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
        val tScale0 = System.nanoTime()
        graft.tools.ScaleUp.run(spark, sfDir, sf1Dir, factor = 10)
        val scaleSec = (System.nanoTime() - tScale0) / 1e9
        val sf1Results = timeAll(spark, sf1Dir)
        val sf1Total = sf1Results.map(_._2).sum
        f""","sf1_total":$sf1Total%.3f,"sf1_scaleup_sec":$scaleSec%.3f,"sf1_queries":${toJsonMap(sf1Results)}"""
      }.recover { case e =>
        System.err.println(s"[bench] sf1 scale pass failed: ${e.getMessage}")
        ""
      }.get

    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${toJsonMap(results)},"sf":"$sfDir"$scalePart}"""
    println(line)
    // belt-and-braces for log-wrapped stdout: also drop the line in a file.
    // A failed side-file write must never fail an otherwise successful bench.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(Some("/tmp/graft_bench.json")).foreach { p =>
      scala.util.Try(java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8")))
        .recover { case e => System.err.println(s"[bench] side-file write failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
