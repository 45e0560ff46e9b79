package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{MinHashBands, NgramJaccard, SimHash64}

/**
 * Document deduplication for large-scale training-data pipelines.
 *
 * Scale design: every method is a declarative plan built from
 * candidate-generation (cheap blocking key, one shuffle on the key) +
 * verification (exact similarity on candidate pairs only). Nothing is
 * quadratic in the corpus; the only quadratic term is within an LSH bucket,
 * which `maxBucket` caps (skew guard — a degenerate bucket of near-identical
 * boilerplate would otherwise explode the pair count at 100 TB).
 */
object Dedup {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShims.column(e)
  private def e(col: Column) = GraftShims.expression(col)

  /** LSH band keys per document: array position = band index. */
  def minhashBands(text: Column, numHashes: Int, bands: Int, shingle: Int): Column =
    c(MinHashBands(e(text), e(lit(numHashes)), e(lit(bands)), e(lit(shingle))))

  def simhash(text: Column, shingle: Int = 5): Column =
    c(SimHash64(e(text), e(lit(shingle))))

  def ngramJaccard(a: Column, b: Column, n: Int = 5): Column =
    c(NgramJaccard(e(a), e(b), e(lit(n))))

  /**
   * Exact dedup: one representative row id per identical tuple of `cols`
   * (hash-groupBy; partial aggregation makes this one map-side-combined
   * shuffle). Groups on the COLUMN VALUES themselves, never on a string
   * concatenation (whose boundaries are ambiguous: "x y"+"z" vs "x"+"y z").
   * Returns (dup_hash, n_dups, keep_id); dup_hash only labels the group.
   */
  def exact(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
      .select(md5(concat_ws(" ", cols.map(col): _*)).as("dup_hash"),
        col("n_dups"), col("keep_id"))

  /**
   * MinHash+LSH near-duplicate pairs: shingle → minhash → band → bucket
   * equi-join → exact n-gram-Jaccard verification. Emits (id_a, id_b,
   * jaccard) with id_a < id_b and jaccard ≥ threshold.
   *
   * Plan shape: posexplode(bands) → shuffle on (band, key) via self-join →
   * distinct candidate pairs → verify. Bucket-size cap `maxBucket` drops
   * degenerate buckets (counted, not silent — they are all-pairs-identical
   * boilerplate; callers handling them should exact-dedup first).
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16, shingle: Int = 5,
                      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    // default 64 hashes / 16 bands of 4: detection prob at s=0.8 is
    // 1-(1-0.8^4)^16 ≈ 0.9998 — same band width as 128/32 at half the
    // signature cost (the dominant term of corpus-scale dedup)
    import org.apache.spark.sql.graft.{MinHashSig, SigBands, SigJaccard}
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))

    // 1. one signature pass per document (the only scan of the full text)
    val sigs = base
      .select(col("id"),
        c(MinHashSig(e(col("text")), e(lit(numHashes)), e(lit(shingle)))).as("sig"))

    // 2. band → bucket; pairs generated INSIDE each bucket (groupBy +
    //    double-explode), so candidate generation shuffles only (id, band),
    //    never the text. maxBucket caps the quadratic term on skewed buckets.
    val buckets = sigs
      .select(col("id"), posexplode(c(SigBands(e(col("sig")), e(lit(bands))))))
      .groupBy(col("pos"), col("col"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val pairs = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // 3. cheap signature-estimate prefilter kills LSH false positives before
    //    the exact verify has to re-shingle any text
    val sa = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
    val estimated = pairs.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est", c(SigJaccard(e(col("sig_a")), e(col("sig_b")))))
      .filter(col("est") >= threshold - 0.2)
      .select("id_a", "id_b")

    // 4. exact n-gram-Jaccard verification on surviving candidates only
    val ta = base.select(col("id").as("id_a"), col("text").as("text_a"))
    val tb = base.select(col("id").as("id_b"), col("text").as("text_b"))
    estimated.join(ta, "id_a").join(tb, "id_b")
      .withColumn("jaccard", ngramJaccard(col("text_a"), col("text_b"), shingle))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /**
   * SimHash near-duplicate pairs at Hamming distance ≤ 3: pigeonhole over
   * 4 16-bit chunks (≤3 differing bits ⇒ at least one chunk identical), so
   * candidates come from 4 equi-join passes, then exact popcount verify.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingle: Int = 5, maxHamming: Int = 3,
                   maxBucket: Int = 10000): DataFrame = {
    require(maxHamming <= 3, "chunked pigeonhole bound holds for maxHamming <= 3")
    // same shape as minhashLshPairs: bucket-local pair generation, one
    // shuffle; maxBucket guards the degenerate chunk (e.g. all-zero upper
    // bits across a homogeneous corpus) from going quadratic
    val buckets = df
      .select(col(idCol).as("id"), simhash(col(textCol), shingle).as("sh"))
      .select(col("id"), col("sh"), posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .groupBy(col("pos"), col("col"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("items"))
      .filter(size(col("items")).between(2, maxBucket))
    buckets
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Connected components over near-dup pairs → (id, cluster) where cluster
   * is the minimum id reachable through the pair graph: the "pick one
   * representative per duplicate cluster" step that turns pairs into an
   * actionable drop-list.
   *
   * Algorithm: iterative min-label propagation (each round, every node
   * adopts the smallest label in its neighborhood; near-dup graphs have
   * tiny diameters, so this converges in a few rounds). Each iteration is
   * two shuffles over the EDGE list only — never the corpus. Iteration cap
   * + convergence check (count of changed labels) bound the work.
   */
  def clusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      // undirected: both directions
      .union(pairs.select(col("id_b").cast("long").as("id_a"), col("id_a").cast("long").as("id_b")))
      .toDF("src", "dst").cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")).cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node's candidate label: min over own label and neighbors' labels
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("cluster"))
      val next = labels.select(col("id"), col("cluster"))
        .union(neighborLabels)
        .groupBy(col("id"))
        .agg(min(col("cluster")).as("cluster"))
        .cache()
      // the first round always changes labels on any non-trivial graph —
      // skip its convergence probe (one join + action saved)
      val changed =
        if (iter == 0) 1L
        else next.join(labels.withColumnRenamed("cluster", "old"), "id")
          .filter(col("cluster") =!= col("old")).limit(1).count()
      if (iter == 0) next.count() // materialize the cache either way
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /**
   * Streaming exact dedup: drop rows whose canonical text hash was already
   * seen, with state bounded by the watermark (late duplicates beyond the
   * watermark pass through — the standard streaming trade-off).
   */
  def streamingExactDedup(stream: DataFrame, textCol: String, tsCol: String,
                          watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("__dup_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("__dup_hash")
      .drop("__dup_hash")

  /**
   * Embedding near-duplicate pairs: cosine-LSH sign-bucket blocking + exact
   * cosine verification (threshold on similarity). One shuffle on bucket.
   */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double = 0.95, planes: Int = 12,
                         seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.graft.{VecCosine, VecLshBucket}
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", c(VecLshBucket(e(col("vec")), e(lit(planes)), e(lit(seed)))))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", c(VecCosine(e(col("vec_a")), e(col("vec_b")))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .dropDuplicates("id_a", "id_b")
  }
}
