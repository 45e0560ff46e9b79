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

  /**
   * SCD TYPE-2 history build (Kimball's slowly-changing dimension): turn
   * an observation log (key, ts, attributes) into versioned validity
   * intervals — one row per key × attribute-state RUN, `valid_from` = the
   * run's first observation, `valid_to` = the next version's start (NULL
   * while current), `version_n` = 1-based version ordinal. Consecutive
   * observations with identical attributes collapse into one version; a
   * value that REAPPEARS later starts a new version (runs, not distinct
   * states — the dimension-table contract that makes as-of joins against
   * the history exact).
   *
   * Determinism: rows order by (ts, attributes) within a key, so same-ts
   * observations with different attributes produce adjacent zero-length
   * versions in attribute order — deterministic and SQL-replayable rather
   * than arrival-order-dependent. Null keys/timestamps are dropped (the
   * module null contract: an unplaceable observation versions nothing).
   * Attribute comparison is null-safe (a null attribute value is a state,
   * not a wildcard).
   *
   * Scale shape: ONE shuffle by key, then two per-key sorted windows (lag
   * to find run starts, lead for valid_to) — never a global sort. Per-key
   * history length bounds window memory; dimension keys are users/parts/
   * suppliers, so histories are thin even when the log is 100 TB.
   *
   * Output: (keyCol, attrCols..., valid_from, valid_to, version_n).
   */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
           attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must not be empty")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc +: attrCols.map(col(_).asc): _*)
    val st = struct(attrCols.map(col): _*)
    val changed = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k") +: col(tsCol).as("__ts") +:
        attrCols.map(col): _*)
      .withColumn("__prev", lag(st, 1).over(ord))
      .filter(col("__prev").isNull || !(st <=> col("__prev")))
    changed
      .withColumn("version_n", row_number().over(ord).cast("long"))
      .withColumn("valid_to", lead(col("__ts"), 1).over(ord))
      .select(col("__k").as(keyCol) +: attrCols.map(col) :+
        col("__ts").as("valid_from") :+ col("valid_to") :+
        col("version_n"): _*)
  }

  /** Upsert-only convenience: every `updates` row replaces-or-inserts. */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame =
    applyChanges(base, updates.withColumn("__op", lit("upsert")),
      keyCols, opCol = "__op")

  /**
   * Snapshot diff — the audit inverse of [[applyChanges]]: classify every
   * key across two corpus versions as `added` (key only in `next`),
   * `removed` (key only in `base`), or `changed` (key in both, payload
   * digest differs); unchanged keys are dropped unless
   * `includeUnchanged`. This is what a pipeline runs before promoting a
   * refreshed training set: "what did this crawl actually change, and is
   * the churn rate sane?"
   *
   * The payload digest is md5 over `compareCols` joined with a U+0001
   * separator, NULL encoded as U+0002 — a fixed byte recipe (not
   * engine-native struct hashing) so any engine recomputes the identical
   * digest; columns with free-form text that could contain the separators
   * still compare correctly unless a crafted pair collides across a
   * column boundary (the standard concat-digest caveat). The NULL
   * sentinel shares that caveat: a column whose actual string value is
   * exactly the one-char U+0002 digests identically to NULL, so a
   * NULL-to-U+0002 edit classifies as `unchanged` — acceptable for real text (U+0002 is
   * a C0 control byte), but encode NULLs out-of-band upstream if a
   * corpus can legitimately carry them.
   *
   * NULL keys never equi-join, so a NULL-keyed row shows up as `removed`
   * on the base side AND `added` on the next side rather than comparing —
   * keys are expected non-null (they are ids); pre-filter or coalesce
   * upstream if a corpus ever carries null ids.
   *
   * Scale shape: each side projects to (key, 16-byte digest) AT THE SCAN
   * — full payloads never shuffle — then one sort-merge full-outer join
   * on the key. Both sides are corpus-sized, so two compact shuffles is
   * the floor for an exact diff; a small-delta refresh should diff
   * against [[applyChanges]]' input changeset instead (no join at all).
   */
  def diff(base: DataFrame, next: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String],
           includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "keyCols and compareCols must not be empty")
    def digested(df: DataFrame, name: String): DataFrame =
      df.select(keyCols.map(col) :+
        md5(concat_ws("\u0001",
          compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))
          .as(name): _*)
    val b = digested(base, "old_md5")
    val n = digested(next, "new_md5")
    val joined = b.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") =!= col("new_md5"), "changed")
          .otherwise("unchanged"))
    if (includeUnchanged) joined
    else joined.filter(col("change") =!= "unchanged")
  }
}
