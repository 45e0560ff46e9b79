package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resilient aggregation: two-stage salted aggregates for hot keys.
 * With a handful of dominant keys (the 100 TB reality: one boilerplate
 * domain, one "und" language, one empty-string bucket), a plain groupBy
 * funnels a whole key into one reducer; salting splits each key across
 * `salt` reducers and recombines, at the cost of one extra (tiny) shuffle.
 * (AQE skew-join handles the join case; this covers aggregation.)
 */
object Skew {

  /** Deterministic salt from any column (stable across retries — never
    * rand(), which breaks task re-execution). */
  def saltOf(c: Column, salt: Int): Column = pmod(xxhash64(c), lit(salt))

  /** groupBy(key).count with salting. */
  def saltedCount(df: DataFrame, keyCol: String, saltFrom: String, salt: Int = 16): DataFrame =
    df.withColumn("__salt", saltOf(col(saltFrom), salt))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salted sum of a long column. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
                saltFrom: String, salt: Int = 16): DataFrame =
    df.withColumn("__salt", saltOf(col(saltFrom), salt))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("total"))
}
