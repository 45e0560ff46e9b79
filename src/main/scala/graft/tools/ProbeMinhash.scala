package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShims

/** Temporary dev probe: stage-by-stage timing of minhashLshPairs. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graft.{MinHashSig, NgramJaccard, SigBands, SigJaccard}
    def c(e: org.apache.spark.sql.catalyst.expressions.Expression) = GraftShims.column(e)
    def e(col: org.apache.spark.sql.Column) = GraftShims.expression(col)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val res = f
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); res
    }

    val base = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    t("warmup (docs count)")(base.count())
    val sigs = base.select(col("id"),
      c(MinHashSig(e(col("text")), e(lit(64)), e(lit(5)))).as("sig"))
    t("1 signature pass")(sigs.selectExpr("max(sig[0])").collect())
    val grouped = sigs
      .select(col("id"), posexplode(c(SigBands(e(col("sig")), e(lit(16))))))
      .groupBy(col("pos"), col("col"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    val pairs = grouped
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    t("2 raw pairs")(println("[probe] raw = " + pairs.count()))
    val dd = pairs.dropDuplicates("id_a", "id_b")
    t("3 distinct pairs")(println("[probe] distinct = " + dd.count()))
    val sa = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
    val est = dd.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est", c(SigJaccard(e(col("sig_a")), e(col("sig_b")))))
      .filter(col("est") >= 0.6)
      .select("id_a", "id_b")
    t("4 estimate prefilter (recomputes up to here)")(println("[probe] est = " + est.count()))
    val ta = base.select(col("id").as("id_a"), col("text").as("text_a"))
    val tb = base.select(col("id").as("id_b"), col("text").as("text_b"))
    val ver = est.join(ta, "id_a").join(tb, "id_b")
      .withColumn("jaccard", c(NgramJaccard(e(col("text_a")), e(col("text_b")), e(lit(5)))))
      .filter(col("jaccard") >= 0.8)
    t("5 full pipeline end-to-end")(println("[probe] verified = " + ver.count()))
    spark.stop()
  }
}
