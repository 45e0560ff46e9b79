package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, GraftShims}

/** Stage-by-stage decomposition of the textKeepList label path (dev probe). */
object ProbeKeeplist {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShims.column(e)
  private def e(col: Column) = GraftShims.expression(col)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = Probe.session("graft-probe-keeplist")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graft.{MinHashSig, SigBands, SigJaccard}
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[decomp] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val (bands, shingle, threshold, numHashes, maxBucket) = (16, 5, 0.8, 64, 1000)
    val chainBands = 8
    val base = docs.select(col("doc_id").cast("long").as("id"), col("text")).filter(col("text").isNotNull)
    val sigs = t("sigs materialize") { graft.pipeline.Checkpoints.materialize(
      base.select(col("id"), c(MinHashSig(e(col("text")), e(lit(numHashes)), e(lit(shingle)))).as("sig")), None) }
    def bucketsUpTo(maxBand: Int, carrySig: Boolean): DataFrame = {
      val exploded = sigs
        .select(col("id"), col("sig"), posexplode(c(SigBands(e(col("sig")), e(lit(bands))))))
      val slice = if (maxBand >= bands) exploded else exploded.filter(col("pos") < maxBand)
      val member = if (carrySig) struct(col("id"), col("sig")) else col("id")
      slice.groupBy(col("pos"), col("col"))
        .agg(sort_array(collect_list(member)).as("items"))
        .filter(size(col("items")).between(2, maxBucket))
    }
    val estOk = (a: Column, b: Column) => c(SigJaccard(e(a), e(b))) >= threshold - 0.2
    def verifyOnly(cand: DataFrame): DataFrame = {
      val ta = base.select(col("id").as("id_a"), col("text").as("text_a"))
      val tb = base.select(col("id").as("id_b"), col("text").as("text_b"))
      cand.join(ta, "id_a").join(tb, "id_b")
        .filter(graft.pipeline.Dedup.ngramJaccard(col("text_a"), col("text_b"), shingle) >= threshold)
        .select(col("id_a"), col("id_b"))
    }
    val sa = sigs.select(col("id").as("id_a"), col("sig").as("__sa"))
    val sb = sigs.select(col("id").as("id_b"), col("sig").as("__sb"))
    val chainCand = bucketsUpTo(chainBands, carrySig = false)
      .select(explode(expr(
        "transform(slice(items, 1, size(items) - 1), " +
          "(x, i) -> struct(x AS id_a, items[i + 1] AS id_b))")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(sa, "id_a").join(sb, "id_b")
      .filter(estOk(col("__sa"), col("__sb")))
      .select(col("id_a"), col("id_b"))
    println(s"[decomp] chainCand rows=${t("chainCand count")(chainCand.count())}")
    val edges1 = t("edges1 materialize") { graft.pipeline.Checkpoints.materialize(verifyOnly(chainCand), None) }
    println(s"[decomp] edges1 rows=${edges1.count()}")
    val lab1 = t("lab1 clusters") { graft.pipeline.Checkpoints.materialize(graft.pipeline.Dedup.clusters(edges1), None) }
    val pairsArr = {
      import spark.implicits._
      lab1.select(col("id").cast("long"), col("cluster").cast("long"))
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    val bc = spark.sparkContext.broadcast((pairsArr.map(_._1), pairsArr.map(_._2)))
    val crossBuckets = t("cross buckets materialize") { graft.pipeline.Checkpoints.materialize(bucketsUpTo(bands, carrySig = true), None) }
    val crossCand = crossBuckets
      .select(c(org.apache.spark.sql.graft.CrossLabelPairs(
        e(col("items")), e(lit(threshold - 0.2)), bc)))
      .dropDuplicates("id_a", "id_b")
    println(s"[decomp] crossCand rows=${t("crossCand count")(crossCand.count())}")
    val edges2 = t("edges2 materialize") { graft.pipeline.Checkpoints.materialize(verifyOnly(crossCand), None) }
    println(s"[decomp] edges2 rows=${edges2.count()}")
    val fin = t("clustersIncremental") { graft.pipeline.Dedup.clustersIncremental(lab1, edges2).count() }
    println(s"[decomp] final labels=$fin")
    spark.stop()
  }
}
