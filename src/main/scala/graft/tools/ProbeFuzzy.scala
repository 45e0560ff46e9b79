package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measured experiment: PassJoin segment blocking vs the brute-force
 * quadratic for the edit-distance self-join, on a synthetic typo corpus
 * scaled well past the gate fixture (the gate's 64 distinct part names
 * sit at the scheduling floor and measure nothing).
 *
 * Corpus: N base words of 8-18 chars over a 12-letter alphabet, each
 * with one planted distance-1..2 variant — the near-identical-title
 * regime the operator exists for.
 */
object ProbeFuzzy {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_FUZZY_N", "5000").toInt
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-fuzzy")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val alphabet = "abcdefghijkl"
    def word(len: Int) = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (0 until n).flatMap { i =>
      val b = word(8 + rnd.nextInt(11))
      val v = rnd.nextInt(2) match {
        case 0 => b.updated(rnd.nextInt(b.length), alphabet(rnd.nextInt(12))).toString
        case 1 => b.patch(rnd.nextInt(b.length), Nil, 1)
      }
      Seq(b, v)
    }.distinct.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "text").repartition(32).cache()
    df.count()
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (pairs=$c)")
    }
    // signature volume = rows out of the two explodes (index slots + probe
    // window) — the deterministic measure of the blocking shuffle, immune
    // to the host's wall-clock noise
    def sigVolume(name: String, tau: Int): Unit = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val j = graft.api.FuzzyJoin.editDistanceSelfJoin(df, tau)
      // execute THIS QueryExecution's own plan instance (count()/write
      // build fresh QueryExecutions and leave these metric objects at zero)
      j.queryExecution.toRdd.count()
      def gens(p: SparkPlan): Seq[Long] = {
        val self = p match {
          case g: org.apache.spark.sql.execution.GenerateExec =>
            g.metrics.get("numOutputRows").map(_.value).toSeq
          case _ => Seq.empty
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        self ++ kids.flatMap(gens)
      }
      val rows = gens(j.queryExecution.executedPlan)
      println(s"[probe] $name explode output rows: ${rows.mkString(", ")} (sum=${rows.sum})")
    }
    timed("passjoin tau=2") {
      graft.api.FuzzyJoin.editDistanceSelfJoin(df, tau = 2).count()
    }
    timed("passjoin tau=1") {
      graft.api.FuzzyJoin.editDistanceSelfJoin(df, tau = 1).count()
    }
    sigVolume("tau=2", 2)
    sigVolume("tau=3", 3)
    timed("brute crossjoin tau=2") {
      val a = df.select($"id".as("ia"), $"text".as("ta"))
      val b = df.select($"id".as("ib"), $"text".as("tb"))
      a.crossJoin(b).filter($"ia" < $"ib")
        .filter(expr("levenshtein(ta, tb, 2)") >= 0).count()
    }
    spark.stop()
  }
}
