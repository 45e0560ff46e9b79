package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph analytics over edge DataFrames.
 *
 * Companion to the connected-component labeling in
 * [[graft.pipeline.Dedup]] (dup-cluster labeling): where clusters answer
 * "which nodes are the same", PageRank answers "which nodes matter" —
 * the standard centrality pass over provenance/link graphs when weighting
 * crawl domains for a training mix (Page et al. '99).
 *
 * Arithmetic is INTEGER-exact (fixed-point ranks, integer division for
 * both the per-edge contribution and the damping blend), so a SQL oracle
 * replays every iteration bit-for-bit and results are independent of
 * partitioning and summation order.
 */
object Graph {

  /**
   * Fixed-point PageRank over a directed edge list (`src`, `dst` long
   * columns; duplicate edges are collapsed unless `assumeDistinct` asserts
   * the caller already did — results assume a simple graph either way).
   *
   * r_0(v) = scale;
   * r_{t+1}(v) = ((1000-d)·scale + d·Σ_{(u,v)∈E} (r_t(u) div outdeg(u))) div 1000
   * with d = `dampingPermille`. Dangling mass (nodes with no out-edges)
   * is dropped, the common simplification; feed a symmetrized edge list if
   * every node must conserve mass (the gate does).
   *
   * Per iteration: the contribution join is keyed on `src` against the
   * once-computed out-degree table, then ONE shuffle aggregates inflow by
   * `dst`; the node-side left join keeps rank rows for inflow-less nodes.
   * The logical plan grows linearly in `iters` (no self-join doubling —
   * cf. the clusters() lineage lesson), and long iteration chains are
   * localCheckpoint-ed every 8 rounds to keep plan size constant.
   *
   * Overflow headroom: Σ inflow ≤ n·scale, so d·Σ stays under 2^63 for
   * n·scale < 9.2e18/1000 — at the default scale 1e6 that is ~9e9 nodes.
   */
  def pagerankInt(edges: DataFrame, iters: Int, dampingPermille: Int = 850,
                  scale: Long = 1000000L,
                  assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0,1000], got $dampingPermille")
    // null endpoints carry no edge semantics and would otherwise drop out
    // of the contribution join but still mint a phantom node row
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    // `assumeDistinct` skips the dedup shuffle when the caller's edge list
    // is distinct by construction (e.g. a symmetrized union of disjoint
    // orientations) — on the sf0.1 purchase-graph gate that is a full
    // extra pass over 1.17M edges
    val e = if (assumeDistinct) cast else cast.distinct()
    // materialize the loop-invariant tables once: every iteration's lineage
    // references edgeDeg and nodes, so without this the upstream edge
    // derivation (often a join) re-executes per iteration
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgeDeg = e.join(deg, "src").localCheckpoint(eager = true)
    var ranks = nodes.withColumn("rank", lit(scale))
    for (i <- 1 to iters) {
      val inflow = edgeDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      ranks = nodes
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), expr(
          s"((${1000 - dampingPermille} * ${scale}L) + " +
            s"$dampingPermille * coalesce(inflow, 0L)) div 1000").as("rank"))
      if (i % 8 == 0 && i < iters) ranks = ranks.localCheckpoint(eager = true)
    }
    ranks
  }
}
