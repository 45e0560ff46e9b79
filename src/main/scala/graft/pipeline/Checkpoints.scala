package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Materialization policy for iterative operators ([[Graph.pagerankInt]],
 * [[Dedup.clusters]], [[MarketBasket.pairRules]]): every loop round (or
 * multiply-consumed invariant table) must be eagerly materialized with
 * TRUNCATED lineage — caching alone keeps the full logical plan and the
 * doubling self-joins OOM the driver on deep chains (the clusters()
 * lesson).
 *
 * Two rungs, chosen by the caller:
 *
 *  - `localCheckpoint` (default, `dir = None`): blocks live on executor
 *    local storage. Right for local[*] and for short interactive jobs —
 *    no distributed-FS round trip — but NOT fault-tolerant at cluster
 *    scale: losing one executor mid-run kills the job unrecoverably,
 *    because the truncated lineage cannot recompute the lost blocks.
 *
 *  - reliable `checkpoint` (`dir = Some(path)`): blocks are written to
 *    `path` (HDFS/S3/any Hadoop FS). A long PageRank or clustering run
 *    on a 1000-executor cluster survives executor loss; the cost is one
 *    distributed write per materialization. This is the 100 TB posture —
 *    opt in by passing the cluster's checkpoint directory.
 */
object Checkpoints {

  /**
   * Eagerly materialize `df` with truncated lineage: reliable
   * `checkpoint` into `dir` when set, `localCheckpoint` otherwise.
   * Sets the session's checkpoint location to `dir` on first use (the
   * SparkContext holds one checkpoint dir; passing different dirs to
   * concurrent operators in one session follows last-set semantics —
   * use one dir per session, as on a real cluster).
   */
  def materialize(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      // `setCheckpointDir(d)` registers `d/<uuid>`; re-set only when the
      // REQUESTED dir differs from the parent of the registered one,
      // compared as normalized paths — the old substring `contains` check
      // let a previously set `/ckpt/ab` spuriously satisfy a request for
      // `/ckpt/a`, silently leaving checkpoints in the wrong directory
      val want = new org.apache.hadoop.fs.Path(d).toUri.getPath
      val has = sc.getCheckpointDir.map(c =>
        new org.apache.hadoop.fs.Path(c).getParent.toUri.getPath)
      if (!has.contains(want)) sc.setCheckpointDir(d)
      df.checkpoint(eager = true)
    case None =>
      // SERIALIZED storage, not Spark's deserialized MEMORY_AND_DISK
      // default: checkpointed tables here are multi-million-row loop
      // invariants, and the deserialized unroll materializes fat row
      // objects per partition — measured at a 1.1 B-edge PageRank input,
      // 32 concurrent unroll tasks OOM'd a 64 g heap. Serialized batches
      // unroll under the memory manager's bounded estimate, store 3-5×
      // smaller, spill cleanly, and compress on disk under
      // spark.rdd.compress; the once-per-iteration deserialization cost
      // is noise next to the join/aggregate work that consumes them.
      df.localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
  }
}
