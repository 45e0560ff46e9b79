package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot maintenance for an immutable-file corpus — the refresh step of
 * a continuously-crawled training set: version N+1 = version N with a
 * changeset (new/updated documents plus deletion tombstones) applied.
 * Table formats (Delta/Iceberg/Hudi) run this MERGE inside their commit
 * protocol; the operator here is the same relational core expressed on
 * plain DataFrames, so any parquet-shaped corpus can be rolled forward.
 *
 * Scale shape: one shuffle of each side on the key (a sort-merge anti
 * join), or a broadcast anti join when the changeset is small — the
 * typical crawl delta is ≪ the corpus, so Spark's size estimate (or an
 * explicit `broadcast(changes)` by the caller) turns the whole apply into
 * a map-side pass over the base: the corpus never shuffles at all. No
 * driver materialization anywhere.
 */
object Snapshots {
  /**
   * Apply a CDC changeset: `changes` rows carry `opCol` ∈
   * {"upsert", "delete"}. Result = base rows whose key has NO change row
   * (any op), plus the upsert rows' payload. Exactly-one-change-per-key is
   * the caller's contract (enforce upstream with e.g. a window over a
   * change-sequence column; duplicated upserts would both survive).
   */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    val payloadCols = base.columns.toSeq
    val untouched = base.join(changes.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val upserts = changes.filter(col(opCol) === lit("upsert"))
      .select(payloadCols.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** Upsert-only convenience: every `updates` row replaces-or-inserts. */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame =
    applyChanges(base, updates.withColumn("__op", lit("upsert")),
      keyCols, opCol = "__op")
}
