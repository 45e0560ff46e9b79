package graft.tools

import graft.pipeline.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShims

/** Temporary dev probe: stage-by-stage timing of cosineNearDupPairs. */
object ProbeCosine {
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
    import org.apache.spark.sql.graft.{VecCosine, VecLshBands}
    def c(e: org.apache.spark.sql.catalyst.expressions.Expression) = GraftShims.column(e)
    def e(col: org.apache.spark.sql.Column) = GraftShims.expression(col)

    val embs = Tables.table(spark, sfDir, "embeddings")
    val n = embs.count()
    val (b, r) = Dedup.cosineLshParams(0.5, 0.999, n)
    println(s"[probe] n=$n bands=$b planes=$r")
    val base = embs.select(col("vec_id").as("id"), col("embedding").as("vec"))

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val res = f
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); res
    }

    t("signBands count") {
      base.select(col("id"), c(VecLshBands(e(col("vec")), e(lit(b)), e(lit(r)), e(lit(42L)))).as("bands"))
        .selectExpr("sum(bands[0])").collect()
    }
    val grouped = base
      .select(col("id"), posexplode(c(VecLshBands(e(col("vec")), e(lit(b)), e(lit(r)), e(lit(42L))))))
      .groupBy(col("pos"), col("col"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 10000))
    val pairs = grouped
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    val rawPairs = t("raw candidate pairs count")(pairs.count())
    println(s"[probe] raw pairs = $rawPairs")
    val dd = pairs.dropDuplicates("id_a", "id_b").cache()
    val nd = t("distinct pairs")(dd.count())
    println(s"[probe] distinct pairs = $nd")
    val va = base.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val vb = base.select(col("id").as("id_b"), col("vec").as("vec_b"))
    t("verify join + cosine") {
      dd.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine", c(VecCosine(e(col("vec_a")), e(col("vec_b")))))
        .filter(col("cosine") >= 0.5).count()
    }
    spark.stop()
  }
}
