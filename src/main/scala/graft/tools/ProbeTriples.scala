package graft.tools

import org.apache.spark.sql.functions._

/**
 * Measures whether materializing the Σ size²-bounded pair-occurrence
 * stream (which the current tripleRules derives TWICE — once into the
 * frequent-pair aggregate, once for candidate generation) beats
 * recomputing it from the checkpointed items table. Warm min-of-2 per
 * variant on the sf0.1 brand-basket gate shape.
 */
object ProbeTriples {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("probe-triples")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  rows=$n $s%.2fs"); s
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val part = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_brand"))
    val joined = li.join(part, col("l_partkey") === col("p_partkey"))

    def current(): Long = graft.pipeline.MarketBasket.tripleRules(
      joined, "l_orderkey", "p_brand", minSupport = 2, topK = 300).count()

    def materializedPairs(): Long = {
      val items0 = joined.select(col("l_orderkey").as("b"), col("p_brand").as("i"))
        .filter(col("i").isNotNull && col("b").isNotNull).distinct()
      val sizes = items0.groupBy(col("b")).agg(count(lit(1)).as("__sz"))
        .filter(col("__sz") <= 1000)
      val items = items0.join(sizes, "b").select(col("b"), col("i"))
        .localCheckpoint(true)
      val pairOcc = items.select(col("b"), col("i").as("item_a"))
        .join(items.select(col("b"), col("i").as("item_b")), Seq("b"))
        .filter(col("item_a") < col("item_b"))
        .localCheckpoint(true) // <-- the variant under test
      val freqPairs = pairOcc.groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("n_pair")).filter(col("n_pair") >= 2)
        .localCheckpoint(true)
      val triples = pairOcc
        .join(freqPairs.select(col("item_a"), col("item_b")),
          Seq("item_a", "item_b"), "left_semi")
        .join(items.select(col("b"), col("i").as("item_c")), Seq("b"))
        .filter(col("item_b") < col("item_c"))
        .groupBy(col("item_a"), col("item_b"), col("item_c"))
        .agg(count(lit(1)).as("n_abc"))
        .filter(col("n_abc") >= 2)
        .orderBy(col("n_abc").desc, col("item_a").asc, col("item_b").asc,
          col("item_c").asc)
        .limit(300)
      def sub(lo: String, hi: String, as: String) =
        freqPairs.select(col("item_a").as(lo), col("item_b").as(hi),
          col("n_pair").as(as))
      triples
        .join(sub("item_a", "item_b", "n_ab"), Seq("item_a", "item_b"))
        .join(sub("item_a", "item_c", "n_ac"), Seq("item_a", "item_c"))
        .join(sub("item_b", "item_c", "n_bc"), Seq("item_b", "item_c"))
        .count()
    }

    println("[probe] current (pairOcc derived twice):")
    val a = math.min(timed(current()), timed(current()))
    println("[probe] pairOcc materialized:")
    val b = math.min(timed(materializedPairs()), timed(materializedPairs()))
    println(f"[probe] current=$a%.2fs materialized=$b%.2fs ratio=${a / b}%.2fx")
    spark.stop()
  }
}
