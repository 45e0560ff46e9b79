package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measured justification for scoring with the codegen'd
 * [[org.apache.spark.sql.graft.HashedLinearScore]] expression instead of
 * the relational formulation (explode features → broadcast-join the
 * weight table → per-doc sum). Both produce identical scores (asserted);
 * the question is cost. The relational path materializes one row per
 * feature (tens per document) through a join and a hash aggregate —
 * at 100 TB that is a feature-stream orders of magnitude larger than the
 * corpus; the expression path is one scan-local projection. Numbers land
 * in ROUND_NOTES.
 */
object ProbeClassifier {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull).cache()
    docs.count()
    val b = 4096
    val weights = Array.tabulate(b)(i => (i % 21).toLong - 10L)
    val st = graft.pipeline.TextAnalysis.classifierState(spark, weights, bias = 5L)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def exprSum(): Long = docs.select(
        graft.pipeline.TextAnalysis.classifierScore(
          split(trim(col("text")), "\\s+"), st).as("s"))
      .agg(sum(col("s"))).head().getLong(0)
    def joinSum(): Long = {
      val ws = split(trim(col("text")), "\\s+")
      val n1 = greatest(size(ws) - 1, lit(0))
      val feats = concat(ws, zip_with(slice(ws, lit(1), n1), slice(ws, lit(2), n1),
        (a, x) => concat(a, lit(" "), x)))
      val wdf = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toSeq.toDF("bucket", "w")
      val perDoc = docs.select(col("doc_id"), explode(feats).as("f"))
        .select(col("doc_id"),
          pmod(conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long"),
            lit(b.toLong)).as("bucket"))
        .join(broadcast(wdf), "bucket")
        .groupBy(col("doc_id")).agg((sum(col("w")) + lit(5L)).as("s"))
      perDoc.agg(sum(col("s"))).head().getLong(0)
    }
    // warm both paths once (codegen/jit), then report the second run
    val (e1, _) = timed(exprSum()); val (_, eSec) = timed(exprSum())
    val (j1, _) = timed(joinSum()); val (_, jSec) = timed(joinSum())
    require(e1 == j1, s"paths diverged: $e1 vs $j1")
    println(f"[classifier] expr=$eSec%.2fs join=$jSec%.2fs ratio=${jSec / eSec}%.1fx (sums equal: $e1)")
    spark.stop()
  }
}
