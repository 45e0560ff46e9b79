package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Measured-experiment driver: IVF delivered recall + wall time as nProbe
  * sweeps, so the gate configuration is a chosen point on a measured
  * recall/cost curve (numbers land in ROUND_NOTES / commit messages).
  *
  *   sbt "runMain graft.tools.ProbeIvf <sfDir> [nCells] [k]"
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nCells = if (args.length > 1) args(1).toInt else 8
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = graft.sources.Tables.table(spark, sfDir, "embeddings").cache()
    embs.count()
    val centroids = graft.pipeline.Similarity.ivfTrain(embs, nCells = nCells, iters = 3)
    val q = embs.filter(col("vec_id") === 0L).select("embedding").head()
      .getSeq[Float](0).toArray
    for (nProbe <- 1 to nCells) {
      val t0 = System.nanoTime()
      val r = graft.pipeline.Similarity.ivfDeliveredRecall(embs, centroids, q, k, nProbe)
      val t1 = System.nanoTime()
      val t2 = System.nanoTime()
      graft.pipeline.Similarity.ivfTopK(embs, centroids, q, k, nProbe).count()
      val t3 = System.nanoTime()
      println(f"[probe-ivf] nCells=$nCells nProbe=$nProbe recall=$r%.2f " +
        f"topk_sec=${(t3 - t2) / 1e9}%.2f (recall_probe_sec=${(t1 - t0) / 1e9}%.2f)")
    }
    spark.stop()
  }
}
