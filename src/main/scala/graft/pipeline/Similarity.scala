package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{VecCosineConst, VecLshBucket, VecOps}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`).
 *
 * Scale design: brute-force top-k plans as one scan + TakeOrderedAndProject
 * (per-partition bounded heap, driver merges k rows — no full sort, no big
 * shuffle). The LSH variant prunes the scan to matching sign-buckets first;
 * at 100 TB the embedding table would be stored bucketed by
 * `vec_lsh_bucket` so the bucket predicate becomes partition pruning.
 */
object Similarity {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShims.column(e)
  private def e(col: Column) = GraftShims.expression(col)

  def cosineTo(vec: Column, query: Array[Float]): Column =
    c(VecCosineConst(e(vec), query))

  def lshBucket(vec: Column, planes: Int = 12, seed: Long = 42L): Column =
    c(VecLshBucket(e(vec), e(lit(planes)), e(lit(seed))))

  /** Exact brute-force cosine top-k. Deterministic order: (score desc, id). */
  def cosineTopK(df: DataFrame, query: Array[Float], k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), cosineTo(col(vecCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** Top-k for a query vector already in the table (one driver lookup). */
  def cosineTopKById(df: DataFrame, queryId: Long, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = df.filter(col(idCol) === queryId).select(col(vecCol)).head()
      .getSeq[Float](0).toArray
    cosineTopK(df, q, k, idCol, vecCol)
  }

  /**
   * LSH-pruned approximate top-k: only rows whose sign-bucket is within
   * `maxFlips` bit flips of the query's bucket are scored (probing the
   * 1-flip neighborhood recovers most near-misses at planes≤16). Falls back
   * to brute force when the probed buckets hold fewer than k rows.
   */
  def cosineTopKLsh(df: DataFrame, query: Array[Float], k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    planes: Int = 12, seed: Long = 42L, maxFlips: Int = 1): DataFrame = {
    val qBucket = VecOps.signBucket(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(query), planes, seed)
    val buckets: Seq[Long] = maxFlips match {
      case 0 => Seq(qBucket)
      case _ => qBucket +: (0 until planes).map(p => qBucket ^ (1L << p))
    }
    val pruned = df.filter(lshBucket(col(vecCol), planes, seed).isin(buckets: _*))
    val candidates = cosineTopK(pruned, query, k, idCol, vecCol)
    if (pruned.limit(k).count() >= k) candidates
    else cosineTopK(df, query, k, idCol, vecCol)
  }
}
