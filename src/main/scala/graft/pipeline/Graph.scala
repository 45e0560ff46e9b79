package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Loop-invariant tables shared by the fixed-iteration and convergence
    * drivers: distinct nodes (carrying a 0/1 `seed` teleport flag — all-1
    * when unseeded), the edge list joined with out-degrees (or out-weight
    * totals), the dangling-node set (no out-edges), the node and seed
    * counts, and whether edges carry weights. */
  private case class PrGraph(nodes: DataFrame, edgeDeg: DataFrame,
                             dangling: DataFrame, nNodes: Long,
                             nSeeds: Long, weighted: Boolean)

  private def prepare(edges: DataFrame, assumeDistinct: Boolean,
                      redistributeDangling: Boolean,
                      checkpointDir: Option[String],
                      weightCol: Option[String] = None,
                      seeds: Option[DataFrame] = None): PrGraph = {
    // null endpoints carry no edge semantics and would otherwise drop out
    // of the contribution join but still mint a phantom node row; in
    // weighted mode a null/non-positive weight likewise carries no flow
    val base = edges.filter(col("src").isNotNull && col("dst").isNotNull)
    val e = weightCol match {
      case Some(w) =>
        // filter on the CAST value, not the source column: a fractional
        // weight in (0, 1) passes `col(w) > 0` but truncates to 0 on the
        // long cast, minting a zero-weight edge whose owner gets wsum = 0
        // (ANSI DIVIDE_BY_ZERO in the flow split) while wrongly counting
        // as non-dangling — post-cast filtering drops it like any other
        // non-positive weight
        val cast = base
          .select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst"),
            col(w).cast("long").as("w"))
          .filter(col("w").isNotNull && col("w") > 0)
        // duplicate (src, dst) edges carry ADDITIVE flow in weighted
        // mode — sum them (assumeDistinct skips the aggregate when the
        // caller pre-aggregated)
        if (assumeDistinct) cast
        else cast.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      case None =>
        val cast = base.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        // `assumeDistinct` skips the dedup shuffle when the caller's edge
        // list is distinct by construction (e.g. a symmetrized union of
        // disjoint orientations) — on the sf0.1 purchase-graph gate that
        // is a full extra pass over 1.17M edges
        if (assumeDistinct) cast else cast.distinct()
    }
    // materialize the loop-invariant tables once: every iteration's lineage
    // references edgeDeg and nodes, so without this the upstream edge
    // derivation (often a join) re-executes per iteration.
    // `e` itself is CACHED first (not checkpointed): four subplans consume
    // it (both nodeIds branches, deg, edgeDeg), and column pruning
    // specializes them enough that ReuseExchange misses — measured at
    // sf100 (600 M-row lineitem → 1.1 B-edge purchase graph) the
    // un-truncated edge derivation re-ran its join+distinct per consumer
    // and the accumulated shuffle files alone exhausted the probe host's
    // disk before the first iteration. A columnar cache (compressed,
    // ~3-4× smaller on disk than checkpoint blocks) is the right vehicle
    // because `e` is DEAD once the invariants exist: it is unpersisted
    // (blocking, so the scratch space is back before the iterations
    // start) right after edgeDeg materializes — a checkpoint would pin
    // those blocks for the whole query. Lineage truncation isn't needed
    // here (one derivation level); the loop-facing tables below stay
    // checkpointed so iteration plans remain constant-size. DISK_ONLY, not
    // MEMORY_AND_DISK: at 1.1 B edges the in-memory columnar build competes
    // with 32 concurrent join/aggregate tasks for the unified pool
    // (measured: heap OOM at 48 g) — the cache is read exactly three more
    // times sequentially, so streaming compressed batches off local disk
    // costs little and leaves the whole pool to execution.
    val eM = e.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nodeIds = eM.select(col("src").as("node"))
      .union(eM.select(col("dst").as("node"))).distinct()
    // personalized mode: nodes carry a 0/1 teleport flag — seeds outside
    // the graph's node set are ignored (they have no edges to rank over);
    // unseeded runs get seed = 1 everywhere, which makes every seeded
    // formula below collapse to the uniform-teleport original
    val nodes = Checkpoints.materialize(
      seeds match {
        case Some(s) =>
          val sd = s.select(col("node").cast("long").as("node"))
            .filter(col("node").isNotNull).distinct()
            .withColumn("__is_seed", lit(1L))
          nodeIds.join(sd, Seq("node"), "left")
            .select(col("node"), coalesce(col("__is_seed"), lit(0L)).as("seed"))
        case None => nodeIds.withColumn("seed", lit(1L))
      },
      checkpointDir)
    val deg = weightCol match {
      case Some(_) => eM.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
      case None => eM.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    }
    // pre-partitioned by `src` — the key every iteration's contribution
    // join probes — so checkpoint's preserved partitioning lets the loop
    // exchange only the per-round rank table, never the edge table (the
    // deg join often broadcasts, which would otherwise leave edgeDeg with
    // the scan's arbitrary partitioning and re-shuffle it every iteration)
    val edgeDeg = Checkpoints.materialize(
      eM.join(deg, "src").repartition(col("src")), checkpointDir)
    // every eM consumer (nodes, deg→edgeDeg) has materialized by here —
    // release the edge cache NOW (blocking) so the iterations inherit its
    // scratch space; dangling/counts below read only checkpointed tables
    eM.unpersist(blocking = true)
    // dangling = nodes with no out-edge; only materialized (and the node
    // count only collected) when redistribution needs them
    val dangling =
      if (!redistributeDangling) nodes.limit(0)
      else Checkpoints.materialize(
        nodes.join(edgeDeg.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti"),
        checkpointDir)
    val n = if (redistributeDangling) nodes.count() else 0L
    // dangling mass teleports to the SEED set (uniformly among seeds) in
    // personalized mode — unseeded, nSeeds = nNodes and the share is the
    // original dm div n to every node
    val nSeeds =
      if (!redistributeDangling) 0L
      else if (seeds.isEmpty) n
      else {
        val k = nodes.filter(col("seed") === 1L).count()
        require(k > 0, "personalized PageRank with redistributeDangling " +
          "needs ≥ 1 seed inside the graph's node set")
        k
      }
    PrGraph(nodes, edgeDeg, dangling, n, nSeeds, weightCol.isDefined)
  }

  /** One PageRank step: contribution join on `src`, ONE inflow shuffle by
    * `dst`, node-side left join keeping inflow-less nodes; optionally adds
    * the per-SEED share of the dangling mass (a broadcast 1-row frame) to
    * seed nodes' inflow before damping (unseeded: every node is a seed, so
    * this is the uniform share). Weighted graphs contribute
    * `(rank · w) div Σw` per edge instead of the equal split; the teleport
    * base term `(1000−d)·scale` lands only on seed nodes. */
  private def step(g: PrGraph, ranks: DataFrame, dampingPermille: Int,
                   scale: Long, redistributeDangling: Boolean): DataFrame = {
    val contrib =
      if (g.weighted) expr("(rank * w) div wsum") else expr("rank div outdeg")
    val inflow = g.edgeDeg
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst"), contrib.as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
    val withDangling = if (redistributeDangling) {
      // Σ rank over dangling nodes, shared equally among the nSeeds seed
      // nodes: each seed receives dm div nSeeds extra inflow (integer
      // division; the ≤ nSeeds−1 remainder is dropped — bounded,
      // documented leakage, same as the damping blend's own div
      // truncation). The 1-row mass frame broadcasts.
      val dm = ranks.join(g.dangling.select("node"), "node")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__dm"))
      g.nodes
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dm))
        .select(col("node"), col("seed"),
          (coalesce(col("inflow"), lit(0L)) +
            expr(s"(__dm div ${g.nSeeds}L) * seed")).as("inflow"))
    } else {
      g.nodes.join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
    }
    withDangling.select(col("node"), expr(
      s"((${1000 - dampingPermille} * ${scale}L * seed) + " +
        s"$dampingPermille * coalesce(inflow, 0L)) div 1000").as("rank"))
  }

  /**
   * Fixed-point PageRank over a directed edge list (`src`, `dst` long
   * columns; duplicate edges are collapsed unless `assumeDistinct` asserts
   * the caller already did — results assume a simple graph either way).
   *
   * r_0(v) = scale;
   * r_{t+1}(v) = ((1000-d)·scale + d·(Σ_{(u,v)∈E} (r_t(u) div outdeg(u)) + D_t)) div 1000
   * with d = `dampingPermille` and D_t the dangling term: 0 by default
   * (dangling mass DROPPED, the common simplification — feed a symmetrized
   * edge list if every node must conserve mass, as the gate does), or the
   * equal per-node share `(Σ_{outdeg(u)=0} r_t(u)) div n` when
   * `redistributeDangling` is set (the Page et al. teleport-style
   * correction; integer remainder < n is dropped per round).
   *
   * Per iteration: the contribution join is keyed on `src` against the
   * once-computed out-degree table, then ONE shuffle aggregates inflow by
   * `dst`; the node-side left join keeps rank rows for inflow-less nodes.
   * The logical plan grows linearly in `iters` (no self-join doubling —
   * cf. the clusters() lineage lesson), and long iteration chains are
   * checkpointed every 8 rounds to keep plan size constant.
   *
   * `checkpointDir`: None (default) materializes loop invariants and
   * round checkpoints with `localCheckpoint` — right for local[*], NOT
   * fault-tolerant (executor loss kills the run). Pass the cluster's
   * reliable checkpoint directory for the 100 TB posture; see
   * [[Checkpoints.materialize]].
   *
   * Overflow headroom: Σ inflow ≤ n·scale, so d·Σ stays under 2^63 for
   * n·scale < 9.2e18/1000 — at the default scale 1e6 that is ~9e9 nodes.
   */
  /** With `weightCol` set, edges carry integer weights: node u sends
    * `(r(u)·w(u,v)) div Σ_x w(u,x)` to v (the weighted-PageRank flow
    * split); duplicate (src, dst) edges SUM their weights (additive flow)
    * unless `assumeDistinct` says the caller pre-aggregated; null or
    * non-positive weights drop the edge. Weight-1 edges reproduce the
    * unweighted results bit-for-bit (w=1 ⇒ Σw = outdeg). Overflow
    * headroom shifts to r·w < 2⁶³ — keep weights unit-scaled, not milli,
    * when ranks can concentrate. */
  /** With `seeds` set (a single `node` column), PageRank is PERSONALIZED
    * (Page et al. '99 §6; Haveliwala '02 topic-sensitive): the teleport
    * term `(1000−d)·scale` lands only on seed nodes, the initial rank is
    * `scale` on seeds and 0 elsewhere, and — under `redistributeDangling`
    * — dangling mass returns uniformly to the SEED set rather than to all
    * nodes. Non-seed ranks then measure proximity to the seed
    * neighborhood: the crawl-curation variant ("rank domains near my
    * trusted seeds"). Seeds outside the graph's node set are ignored;
    * `seeds = all nodes` reproduces standard PageRank bit-for-bit (spec-
    * pinned). Composes with `weightCol`. */
  def pagerankInt(edges: DataFrame, iters: Int, dampingPermille: Int = 850,
                  scale: Long = 1000000L,
                  assumeDistinct: Boolean = false,
                  redistributeDangling: Boolean = false,
                  checkpointDir: Option[String] = None,
                  weightCol: Option[String] = None,
                  seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0,1000], got $dampingPermille")
    val g = prepare(edges, assumeDistinct, redistributeDangling,
      checkpointDir, weightCol, seeds)
    var ranks = g.nodes.select(col("node"),
      expr(s"${scale}L * seed").as("rank"))
    for (i <- 1 to iters) {
      ranks = step(g, ranks, dampingPermille, scale, redistributeDangling)
      if (i % 8 == 0 && i < iters)
        ranks = Checkpoints.materialize(ranks, checkpointDir)
    }
    ranks
  }

  /**
   * Convergence-mode PageRank: iterate until the L1 rank delta
   * ‖r_{t+1} − r_t‖₁ ≤ `tolL1` (fixed-point units), capped at `maxIters`
   * rounds — the production form when the iteration count isn't known up
   * front. Returns (ranks, iterations run, final L1 delta).
   *
   * Damping contracts the rank map (‖Δ_{t+1}‖₁ ≲ d/1000·‖Δ_t‖₁ + n·ε_div
   * where ε_div ≤ 1 is the integer-truncation noise per node), so the
   * delta decays geometrically to an n-bounded floor; pick tolL1 ≳ a few
   * × n for guaranteed termination (required: tolL1 ≥ 1). Throws if
   * `maxIters` rounds pass without reaching `tolL1` — returning
   * unconverged ranks silently would defeat the contract (same policy as
   * [[Dedup.clusters]]).
   *
   * Each round is materialized ([[Checkpoints.materialize]] — the delta
   * check is an action anyway, and truncation keeps plans constant-size)
   * and the delta rides a second bounded aggregate over the joined
   * old/new rank tables — one extra ≤n-row shuffle per round, the price
   * of the stopping rule.
   */
  def pagerankIntConverged(edges: DataFrame, tolL1: Long, maxIters: Int = 50,
                           dampingPermille: Int = 850,
                           scale: Long = 1000000L,
                           assumeDistinct: Boolean = false,
                           redistributeDangling: Boolean = false,
                           checkpointDir: Option[String] = None,
                           weightCol: Option[String] = None,
                           seeds: Option[DataFrame] = None)
      : (DataFrame, Int, Long) = {
    require(tolL1 >= 1, s"tolL1 must be >= 1, got $tolL1")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0,1000], got $dampingPermille")
    val g = prepare(edges, assumeDistinct, redistributeDangling,
      checkpointDir, weightCol, seeds)
    var ranks = Checkpoints.materialize(
      g.nodes.select(col("node"), expr(s"${scale}L * seed").as("rank")),
      checkpointDir)
    var iter = 0
    var delta = Long.MaxValue
    while (delta > tolL1 && iter < maxIters) {
      val next = Checkpoints.materialize(
        step(g, ranks, dampingPermille, scale, redistributeDangling),
        checkpointDir)
      delta = next.withColumnRenamed("rank", "__new")
        .join(ranks.withColumnRenamed("rank", "__old"), "node")
        .agg(coalesce(sum(abs(col("__new") - col("__old"))), lit(0L)))
        .head().getLong(0)
      ranks = next
      iter += 1
    }
    if (delta > tolL1)
      throw new IllegalStateException(
        s"pagerankIntConverged: L1 delta $delta still above tolL1=$tolL1 " +
          s"after $maxIters rounds — raise maxIters or tolL1")
    (ranks, iter, delta)
  }

  /**
   * Per-node triangle counts over an undirected simple graph (edges in
   * either orientation; duplicates and self-loops collapse/drop) — the
   * local clustering signal link-graph curation thresholds on (a crawl
   * domain whose neighborhood closes no triangles is a link farm's
   * signature, and n_triangles is the numerator of the local clustering
   * coefficient).
   *
   * Algorithm: the classic degree-ordered orientation (Schank-Wagner) —
   * rank nodes by (degree, id), orient every edge low→high rank, and
   * enumerate each wedge only at its minimum-rank apex. Each triangle is
   * found exactly once, and the wedge self-join is bounded by
   * Σ outdeg² = O(m^{3/2}) on ANY graph (an oriented out-degree never
   * exceeds √(2m)) — the bound that keeps hub-dominated webgraphs
   * feasible where the naive wedge count Σ deg² explodes.
   *
   * Plan: canonical-edge distinct, a broadcast-size degree table joined
   * twice, ONE wedge self-join keyed on the apex, one closure semi-join
   * keyed on the (v1, v2) pair, one explode+count. Equality joins only.
   *
   * Output: (node, n_triangles) for every node in ≥ 1 triangle.
   */
  /** Shared canonical simple-graph pass for the triangle family: distinct
    * low-high edge pairs (duplicates/orientations collapse, self-loops
    * drop) plus the per-node degree table derived from them. `canon` is
    * eagerly materialized ([[Checkpoints.materialize]]) because every
    * caller feeds it to ≥ 2 consumers (degrees + the orientation join,
    * and in [[clusteringCoefficients]] also the coefficient denominator)
    * — column pruning specializes the subplans and defeats ReuseExchange,
    * so without truncation the raw edge list is re-scanned per consumer. */
  private def canonDeg(edges: DataFrame, checkpointDir: Option[String])
      : (DataFrame, DataFrame) = {
    val canon = Checkpoints.materialize(
      edges.filter(col("src").isNotNull && col("dst").isNotNull)
        .select(
          least(col("src").cast("long"), col("dst").cast("long")).as("a"),
          greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
        .filter(col("a") < col("b"))
        .distinct(),
      checkpointDir)
    val deg = canon.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    (canon, deg)
  }

  def triangleCounts(edges: DataFrame,
                     checkpointDir: Option[String] = None): DataFrame = {
    val (canon, deg) = canonDeg(edges, checkpointDir)
    triangleCountsFrom(canon, deg, checkpointDir)
  }

  /** Triangle counting proper, over a pre-canonicalized (canon, deg) pair
    * from [[canonDeg]] — split out so [[clusteringCoefficients]] shares
    * ONE canonical pass instead of re-deriving it. */
  private def triangleCountsFrom(canon: DataFrame, deg: DataFrame,
                                 checkpointDir: Option[String]): DataFrame = {
    // orient low→high (degree, id) rank; keep the canonical pair around
    val oriented = Checkpoints.materialize(
      canon
        .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
        .select(
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("a"))
            .otherwise(col("b")).as("u"),
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("b"))
            .otherwise(col("a")).as("v"),
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("db"))
            .otherwise(col("da")).as("dv")),
      checkpointDir)
    // wedges at the apex u, both spokes oriented out of u; order the two
    // endpoints by the SAME (degree, id) rank so the closing edge — also
    // oriented by rank — matches (v1, v2) directly
    val e1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = e1.join(e2, "u")
      .filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
    val tris = wedges.join(
      oriented.select(col("u").as("v1"), col("v").as("v2")),
      Seq("v1", "v2"), "left_semi")
    tris.select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** The synchronous LPA vote table shared by the fixed-round and
    * convergence drivers: adjacency = both orientations of the canonical
    * simple graph PLUS a self-loop per node (the node's own current label
    * votes — the standard damping that keeps bipartite structures from
    * oscillating forever), materialized once since every round joins it. */
  private def lpaAdjacency(edges: DataFrame,
                           checkpointDir: Option[String]): DataFrame = {
    val (canon, deg) = canonDeg(edges, checkpointDir)
    lpaAdjacencyFrom(canon, deg, checkpointDir)
  }

  /** lpaAdjacency from a pre-computed [[canonDeg]] pair — split out so the
    * stats/modularity composites run ONE canonical pass for both the LPA
    * rounds and the per-community rollup instead of re-deriving the edge
    * source per operator (measured: the orders⋈lineitem edge join plus the
    * canonical distinct executed twice per composite gate). */
  private def lpaAdjacencyFrom(canon: DataFrame, deg: DataFrame,
                               checkpointDir: Option[String]): DataFrame =
    // pre-partitioned by the per-round join key: checkpoint preserves the
    // physical partitioning, so every round's vote join exchanges only the
    // (≤ n-row) label table instead of re-shuffling the adjacency — one
    // up-front exchange replaces `iters` of them (see the module-level
    // invariant-partitioning note)
    Checkpoints.materialize(
      canon.select(col("a").as("node"), col("b").as("nbr"))
        .union(canon.select(col("b").as("node"), col("a").as("nbr")))
        .union(deg.select(col("n").as("node"), col("n").as("nbr")))
        .repartition(col("nbr")),
      checkpointDir)

  /** The fixed-round LPA loop over a prepared adjacency — shared by
    * [[labelPropagation]] and the shared-canonical-pass composites. */
  private def runLpa(adj: DataFrame, iters: Int,
                     checkpointDir: Option[String]): DataFrame = {
    var labels = adj.select(col("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iters) {
      labels = lpaStep(adj, labels)
      if (i % 8 == 0 && i < iters)
        labels = Checkpoints.materialize(labels, checkpointDir)
    }
    labels
  }

  /** One synchronous LPA round: every node adopts the label occurring most
    * often among its neighbors and itself, ties broken toward the SMALLEST
    * label — fully deterministic (no random visit order), so the result is
    * partition-invariant and a SQL oracle replays it round by round. The
    * per-node argmax is max(struct(c, -label)) — an ordinary partially-
    * aggregated hash aggregate, so each round's second shuffle carries at
    * most one row per (partition, node) and nothing is SORTED (the window
    * form paid an extra sort per round: the three LPA gates measured
    * 20.9 s → 12.3 s at sf0.1, n=3 medians). Negating the label turns the
    * min-label tie-break into plain struct max for ANY label sign
    * (max −label ≡ min label); only Long.MinValue would overflow, and
    * labels are node ids, which the data model keeps far from it. */
  private def lpaStep(adj: DataFrame, labels: DataFrame): DataFrame = {
    val votes = adj
      .join(labels.withColumnRenamed("node", "nbr"), "nbr")
      .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
    votes
      .groupBy(col("node"))
      .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
      .select(col("node"), (-col("m.nl")).as("label"))
  }

  /**
   * Label-propagation community detection (Raghavan et al. '07), the
   * deterministic SYNCHRONOUS variant: labels start as the node ids, and
   * each round every node adopts the most frequent label in its closed
   * neighborhood (neighbors + itself), ties toward the smallest label.
   * Runs exactly `iters` rounds — the oracle-replayable form; communities
   * are the curation complement of [[Dedup.clusters]] (dup clusters find
   * "same content", communities find "same neighborhood" — mirror FARMS
   * vs mirror files in a crawl graph).
   *
   * Self-loops in the input drop and duplicate/bidirectional edges
   * collapse (the [[canonDeg]] canonical pass — shared, single edge-list
   * scan); the self-VOTE is added back explicitly, once per node, as the
   * oscillation damper. Each round is one adjacency join + one (node,
   * label) count shuffle + one per-node window; rounds are checkpointed
   * every 8 to keep plan growth linear (the clusters() lineage lesson).
   *
   * Output: (node, community) — community = the final label.
   */
  def labelPropagation(edges: DataFrame, iters: Int,
                       checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    runLpa(lpaAdjacency(edges, checkpointDir), iters, checkpointDir)
      .select(col("node"), col("label").as("community"))
  }

  /** `communityStats(edges, labelPropagation(edges, iters))` with ONE
    * canonical pass: the naive composition re-derives the edge source and
    * the canonical distinct once for the LPA adjacency and once for the
    * stats rollup — here a single [[canonDeg]] feeds both (exact same
    * rows by construction; the gate's oracle hash is unchanged). */
  def communityStatsLpa(edges: DataFrame, iters: Int,
                        checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val (canon, deg) = canonDeg(edges, checkpointDir)
    val communities =
      runLpa(lpaAdjacencyFrom(canon, deg, checkpointDir), iters, checkpointDir)
        .select(col("node"), col("label").as("community"))
    communityStatsFrom(canon, deg, communities, checkpointDir)
  }

  /** `modularityPermille(edges, labelPropagation(edges, iters))` with ONE
    * canonical pass — the [[communityStatsLpa]] sharing applied to the
    * modularity composite. */
  def modularityPermilleLpa(edges: DataFrame, iters: Int,
                            checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val (canon, deg) = canonDeg(edges, checkpointDir)
    val communities =
      runLpa(lpaAdjacencyFrom(canon, deg, checkpointDir), iters, checkpointDir)
        .select(col("node"), col("label").as("community"))
    modularityFrom(canon, deg, communities, checkpointDir)
  }

  /**
   * Convergence-mode LPA: iterate until NO node changes label, capped at
   * `maxIters` rounds; throws if the cap passes first (returning
   * unconverged communities silently would defeat the contract — same
   * policy as [[pagerankIntConverged]] and [[Dedup.clusters]]). The
   * deterministic min-label tie-break plus the self-vote make the common
   * oscillators (bipartite cores) settle; genuinely cyclic label states
   * hit the cap and throw. Returns (communities, rounds run).
   *
   * Each round is materialized (the change-count check is an action
   * anyway) and the change count is one ≤n-row join — the price of the
   * stopping rule, same shape as the PageRank delta check.
   */
  def labelPropagationConverged(edges: DataFrame, maxIters: Int = 50,
                                checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val adj = lpaAdjacency(edges, checkpointDir)
    var labels = Checkpoints.materialize(
      adj.select(col("node")).distinct().withColumn("label", col("node")),
      checkpointDir)
    var iter = 0
    var changed = Long.MaxValue
    while (changed > 0 && iter < maxIters) {
      val next = Checkpoints.materialize(lpaStep(adj, labels), checkpointDir)
      changed = next.withColumnRenamed("label", "__new")
        .join(labels.withColumnRenamed("label", "__old"), "node")
        .filter(col("__new") =!= col("__old")).count()
      labels = next
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"labelPropagationConverged: $changed labels still changing after " +
          s"$maxIters rounds — raise maxIters (oscillating label state)")
    (labels.select(col("node"), col("label").as("community")), iter)
  }

  /**
   * Per-community structure stats over the canonical simple graph:
   * member count, total degree mass, and INTRA-community edge count —
   * the ingredients of the Newman-Girvan modularity and the per-cluster
   * report a curation pass reads ("is this community a dense mirror farm
   * or a loose topical neighborhood"). Nodes missing from `communities`
   * are dropped (their edges contribute degree but no membership);
   * communities are typically [[labelPropagation]] output.
   *
   * Plan: one shared canonical pass ([[canonDeg]]), the label table
   * joined onto each edge endpoint (two equality joins), one count per
   * community — all shuffles keyed on node or community.
   *
   * Output: (community, n_nodes, degree_sum, intra_edges).
   */
  def communityStats(edges: DataFrame, communities: DataFrame,
                     checkpointDir: Option[String] = None): DataFrame = {
    val (canon, deg) = canonDeg(edges, checkpointDir)
    communityStatsFrom(canon, deg, communities, checkpointDir)
  }

  private def communityStatsFrom(canon: DataFrame, deg: DataFrame,
                                 communities: DataFrame,
                                 checkpointDir: Option[String]): DataFrame = {
    val lab = Checkpoints.materialize(
      communities.select(col("node").cast("long").as("node"),
        col("community").cast("long").as("community"))
        .filter(col("node").isNotNull && col("community").isNotNull),
      checkpointDir)
    val intra = canon
      .join(lab.select(col("node").as("a"), col("community").as("ca")), "a")
      .join(lab.select(col("node").as("b"), col("community").as("cb")), "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    deg.join(lab, deg("n") === lab("node"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("degree_sum"))
      .join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"), col("degree_sum"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"))
  }

  /**
   * Newman-Girvan modularity of a community partition, integer permille:
   * Q = Σ_c [ e_c/m − (D_c/2m)² ] over the canonical simple graph, which
   * clears denominators to the single integer division
   * `Q_permille = 1000 · Σ_c (4·m·e_c − D_c²) div (4·m²)` — every term
   * exact, so the SQL oracle replays it bit-for-bit. Q ∈ (−500, 1000]
   * permille; higher = denser-than-chance communities (a near-zero Q for
   * an LPA partition says the graph has no real community structure —
   * the signal that stops a curation rule from acting on noise).
   *
   * Overflow headroom: 4·m·e_c ≤ 4m² < 2⁶³ needs m < 1.5e9 canonical
   * edges per run — partition larger graphs or rescale first.
   *
   * Output: one row (m_edges, q_permille).
   */
  def modularityPermille(edges: DataFrame, communities: DataFrame,
                         checkpointDir: Option[String] = None): DataFrame = {
    // ONE canonical pass feeds the stats AND the edge count
    val (canon, deg) = canonDeg(edges, checkpointDir)
    modularityFrom(canon, deg, communities, checkpointDir)
  }

  private def modularityFrom(canon: DataFrame, deg: DataFrame,
                             communities: DataFrame,
                             checkpointDir: Option[String]): DataFrame = {
    val stats = communityStatsFrom(canon, deg, communities, checkpointDir)
    val m = canon.agg(count(lit(1)).as("m_edges"))
    val num = stats.crossJoin(broadcast(m))
      .agg(coalesce(sum(
        expr("4 * m_edges * intra_edges - degree_sum * degree_sum")),
        lit(0L)).as("__num"))
    // the 1-row m frame rides along so an empty partition (or empty
    // graph) yields (0, 0) instead of a division fault
    m.crossJoin(broadcast(num))
      .select(col("m_edges"),
        when(col("m_edges") === 0L, lit(0L))
          .otherwise(expr("1000 * __num div (4 * m_edges * m_edges)"))
          .as("q_permille"))
  }

  /**
   * Local clustering coefficient, integer permille:
   * `2000·tri(v) div (d(v)·(d(v)−1))` over the canonical simple graph —
   * the per-node "how closed is this neighborhood" ratio whose LOW
   * values flag link farms (many neighbors, no closure) and whose HIGH
   * values flag mirror cliques. Nodes with degree < 2 have no defined
   * coefficient and are omitted; triangle-free nodes of degree ≥ 2
   * report 0. Degrees and triangles both come from the same canonical
   * edge set (duplicates/orientations collapse, self-loops drop), so
   * the ratio is consistent by construction; [[canonDeg]] supplies ONE
   * shared canonical pass (materialized) feeding both the coefficient
   * denominator and the triangle numerator — the raw edge list is
   * scanned once, not re-derived per consumer.
   *
   * Output: (node, degree, n_triangles, coeff_permille).
   */
  /**
   * Fixed-point HITS hubs & authorities (Kleinberg '99) over a DIRECTED
   * edge list — the complement of PageRank on bipartite-flavored link
   * graphs: authorities are pointed-to quality, hubs are good pointers
   * (on a crawl graph: directories/aggregators vs content pages; on a
   * purchase graph: buyers vs suppliers).
   *
   * Iteration t (h_0 = `scale` everywhere):
   *   a_t(v) = max-normalized Σ_{(u,v)∈E} h_{t−1}(u)
   *   h_t(u) = max-normalized Σ_{(u,v)∈E} a_t(v)
   * with max-normalization x ← (x · scale) div max(x) — the integer-exact
   * stand-in for Kleinberg's L2 norm (any per-round rescale yields the
   * same fixed direction; max keeps the top score at exactly `scale`).
   * Every step is integer division, so a SQL oracle unrolls the rounds
   * bit-for-bit and results are partition/summation-order independent.
   *
   * Per half-step: ONE contribution join + ONE inflow shuffle (same shape
   * as [[pagerankInt]]'s step), plus a 1-row max frame that broadcasts
   * into the normalize projection. Nodes with no in-edges hold authority
   * 0, no out-edges hub 0 (left joins keep their rows). Long chains
   * checkpoint every 2 rounds (the lineage lesson — and HITS compounds
   * twice per round, so the pagerank cadence of 8 is too lax here).
   *
   * Overflow headroom: raw ≤ n·scale and the normalize multiplies by
   * `scale`, so n·scale² < 2⁶³ — at the default scale 1e6 that is ~9.2e6
   * nodes; drop `scale` to 1e4 for ~9e10-node graphs (precision trades at
   * 1/scale per round).
   *
   * Output: (node, hub, auth) for every node of the graph.
   */
  def hitsInt(edges: DataFrame, iters: Int, scale: Long = 1000000L,
              assumeDistinct: Boolean = false,
              checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    val e = Checkpoints.materialize(
      if (assumeDistinct) cast else cast.distinct(), checkpointDir)
    val nodes = Checkpoints.materialize(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(),
      checkpointDir)
    var hubs = nodes.select(col("node"), lit(scale).as("hub"))
    var auths = nodes.select(col("node"), lit(0L).as("auth"))
    for (i <- 1 to iters) {
      auths = hitsHalfStep(nodes, e.select(col("src").as("__from"),
        col("dst").as("__to")), hubs.withColumnRenamed("hub", "__x"),
        scale, "auth")
      hubs = hitsHalfStep(nodes, e.select(col("dst").as("__from"),
        col("src").as("__to")), auths.withColumnRenamed("auth", "__x"),
        scale, "hub")
      // Cadence 2, NOT pagerank's 8: each half-step references its input
      // twice (the raw-sum feeds both the max frame and the normalize
      // join), so an un-checkpointed round QUADRUPLES the tree-expanded
      // plan — 4^8 at cadence 8 OOMs the optimizer; 4^2 = 16x is safe.
      // (An r13-optimization experiment materialized every half-step's
      // raw-sum instead — plan-optimal, but the 8 extra checkpoint jobs
      // measured q_hits 2.4 s → 4.2 s warm at sf0.1: per-job overhead
      // beats the duplicated small joins at bench scale. Reverted.)
      if (i % 2 == 0 && i < iters) {
        auths = Checkpoints.materialize(auths, checkpointDir)
        hubs = Checkpoints.materialize(hubs, checkpointDir)
      }
    }
    nodes.join(hubs, "node").join(auths, "node")
      .select(col("node"), col("hub"), col("auth"))
  }

  /** One HITS half-step: sum `__x` scores over edges (__from carries the
    * score, __to receives), then max-normalize to `scale` via a broadcast
    * 1-row max frame; inflow-less nodes read 0. The empty-sum guard
    * (max = 0) keeps an edgeless graph at all-zero instead of faulting. */
  private def hitsHalfStep(nodes: DataFrame, edges: DataFrame,
                           scores: DataFrame, scale: Long,
                           outName: String): DataFrame = {
    val raw = edges.join(scores.withColumnRenamed("node", "__from"), "__from")
      .groupBy(col("__to").as("node")).agg(sum(col("__x")).as("__raw"))
    val mx = raw.agg(coalesce(max(col("__raw")), lit(0L)).as("__mx"))
    nodes.join(raw, Seq("node"), "left")
      .crossJoin(broadcast(mx))
      .select(col("node"),
        when(col("__mx") === 0L, lit(0L))
          .otherwise(expr(s"(coalesce(__raw, 0L) * ${scale}L) div __mx"))
          .as(outName))
  }

  def clusteringCoefficients(edges: DataFrame,
                             checkpointDir: Option[String] = None): DataFrame = {
    val (canon, degND) = canonDeg(edges, checkpointDir)
    val deg = degND.select(col("n").as("node"), col("d").as("degree"))
    deg.filter(col("degree") >= 2)
      .join(triangleCountsFrom(canon, degND, checkpointDir), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("2000 * coalesce(n_triangles, 0L) div (degree * (degree - 1))")
          .as("coeff_permille"))
  }

  /** Both-orientation adjacency of the canonical simple graph (self-loops
    * dropped, duplicate/bidirectional edges collapsed), materialized once —
    * every peel round re-joins it. */
  private def kcoreAdjacency(edges: DataFrame,
                             checkpointDir: Option[String]): DataFrame = {
    val (canon, _) = canonDeg(edges, checkpointDir)
    Checkpoints.materialize(
      canon.select(col("a").as("node"), col("b").as("nbr"))
        .union(canon.select(col("b").as("node"), col("a").as("nbr"))),
      checkpointDir)
  }

  /** Degrees restricted to the alive subgraph: adjacency rows whose BOTH
    * endpoints survive (two semi-joins), then one count shuffle by node.
    * Alive nodes with zero alive neighbors emit no row — callers that need
    * them (the final report) left-join and coalesce to 0. */
  private def aliveDegrees(adj: DataFrame, alive: DataFrame): DataFrame =
    adj.join(alive, Seq("node"), "left_semi")
      .join(alive.withColumnRenamed("node", "nbr"), Seq("nbr"), "left_semi")
      .groupBy(col("node")).agg(count(lit(1)).as("c"))

  /** The shared peel loop: `iters` rounds of "drop every node with < k
    * alive-subgraph degree", then the (node, core_degree) report over the
    * survivors. The alive set feeds two semi-joins per round (plan doubles
    * per round — the lineage lesson at k-core's own rate), so rounds
    * checkpoint every 4; the final set is materialized because the report
    * references it three more times. */
  private def peel(adj: DataFrame, k: Int, iters: Int,
                   checkpointDir: Option[String]): DataFrame = {
    var alive = adj.select(col("node")).distinct()
    for (i <- 1 to iters) {
      alive = aliveDegrees(adj, alive).filter(col("c") >= k).select("node")
      if (i % 4 == 0 && i < iters)
        alive = Checkpoints.materialize(alive, checkpointDir)
    }
    kcoreReport(adj, Checkpoints.materialize(alive, checkpointDir))
  }

  private def kcoreReport(adj: DataFrame, alive: DataFrame): DataFrame =
    alive.join(aliveDegrees(adj, alive), Seq("node"), "left")
      .select(col("node"), coalesce(col("c"), lit(0L)).as("core_degree"))

  /**
   * k-core peeling (Seidman '83) over the canonical simple UNDIRECTED
   * graph: run exactly `iters` rounds of "remove every node whose degree
   * among still-alive nodes is < k" — the crawl-curation filter that
   * strips tendrils and leaf-level link spam while keeping the dense
   * center (the vertical density complement of [[labelPropagation]]'s
   * horizontal partition). Fixed rounds are the oracle-replayable form,
   * and peeling is IDEMPOTENT past its fixpoint (alive_{t+1} ⊆ alive_t,
   * and a no-op round stays a no-op), so any `iters` ≥ the graph's peel
   * depth returns the true k-core; [[kcoreConverged]] finds the depth.
   *
   * Per round: two semi-joins of the once-materialized adjacency against
   * the alive set + ONE degree-count shuffle — no row ever carries more
   * than (node, nbr), so a 100 TB link graph peels at edge-list scan
   * cost per round. Rounds checkpoint every 4 (the alive plan doubles
   * per round — each round references alive twice).
   *
   * Output: (node, core_degree) for surviving nodes; core_degree is the
   * degree WITHIN the surviving subgraph (≥ k once converged).
   */
  def kcore(edges: DataFrame, k: Int, iters: Int,
            checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    peel(kcoreAdjacency(edges, checkpointDir), k, iters, checkpointDir)
  }

  /**
   * Convergence-mode k-core: peel until a round removes nothing, capped
   * at `maxIters` rounds; throws if the cap passes first (same policy as
   * [[pagerankIntConverged]] / [[labelPropagationConverged]] — an
   * unconverged core returned silently would defeat the ≥-k contract).
   * Termination is guaranteed in ≤ n rounds since alive only shrinks;
   * the change check is a count comparison (monotone shrinkage makes
   * count equality set equality). Returns (report, peel rounds run, the
   * last being the confirming no-op).
   */
  def kcoreConverged(edges: DataFrame, k: Int, maxIters: Int = 50,
                     checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val adj = kcoreAdjacency(edges, checkpointDir)
    var alive = Checkpoints.materialize(
      adj.select(col("node")).distinct(), checkpointDir)
    var n = alive.count()
    var iter = 0
    var changed = true
    while (changed && iter < maxIters) {
      val next = Checkpoints.materialize(
        aliveDegrees(adj, alive).filter(col("c") >= k).select("node"),
        checkpointDir)
      val m = next.count()
      changed = m != n
      alive = next; n = m; iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"kcoreConverged: still peeling after $maxIters rounds — raise " +
          "maxIters")
    (kcoreReport(adj, alive), iter)
  }

  // ------------------------------------------------------ BFS distances

  /** Shared BFS setup: the distinct null-free long edge list (the
    * loop-invariant table every round joins — materialized once) and the
    * round-0 distance table (seeds ∩ graph nodes at distance 0; seeds
    * outside the node set are ignored, mirroring [[pagerankInt]]'s seeded
    * contract — they have no edges to measure distance over).
    * `assumeDistinct` skips the dedup shuffle when the caller's edge list
    * is distinct by construction (e.g. a symmetrized union of disjoint
    * orientations). */
  private def bfsSetup(edges: DataFrame, seeds: DataFrame,
                       assumeDistinct: Boolean,
                       checkpointDir: Option[String])
      : (DataFrame, DataFrame) = {
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    // NOT pre-partitioned by the round join key (unlike [[ccSetup]] /
    // [[prepare]]): the BFS/SSSP gate graphs are selective filters whose
    // per-round joins broadcast or AQE-coalesce at bench scale, so the
    // extra up-front exchange measured as a pure loss (q_sssp 1.7 → 3.2 s)
    val e = Checkpoints.materialize(
      if (assumeDistinct) cast else cast.distinct(), checkpointDir)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val d0 = Checkpoints.materialize(
      seeds.select(col("node").cast("long").as("node"))
        .filter(col("node").isNotNull).distinct()
        .join(nodes, Seq("node"), "left_semi")
        .withColumn("dist", lit(0L)),
      checkpointDir)
    (e, d0)
  }

  /** One propagation round: every reached node offers dist+1 along its
    * out-edges; the offer stream unions with the current table and
    * min-folds per node — ONE join keyed on the current node + ONE min
    * shuffle, rows never wider than (node, dist). */
  private def bfsStep(e: DataFrame, dist: DataFrame): DataFrame =
    dist.select(col("node").as("src"), col("dist"))
      .join(e, "src")
      .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      .union(dist)
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))

  /**
   * Multi-source BFS distances: minimum hop count from any seed along
   * DIRECTED src→dst edges (union both orientations for undirected
   * distance). The crawl-depth / link-distance primitive: "how far is
   * every page from the trusted seed set" feeds crawl frontier budgeting
   * and TrustRank-style curation cuts the same way [[pagerankInt]]'s
   * seeded mode feeds importance weighting.
   *
   * Runs exactly `rounds` propagation rounds. Distances min-fold, so
   * rounds are IDEMPOTENT past the fixpoint (a no-op round stays a no-op)
   * and any `rounds` ≥ the true seed eccentricity returns exact
   * distances — the oracle-replayable form, like [[kcore]];
   * [[bfsDistancesConverged]] finds the depth. Nodes unreachable within
   * `rounds` emit NO row. Seeds outside the graph's node set are ignored.
   *
   * The dist plan references itself twice per round (offer + union), so
   * rounds checkpoint every 4 — the k-core doubling rate. At 100 TB each
   * round costs one edge-list scan keyed on the frontier; rows never
   * carry more than (node, dist).
   */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, rounds: Int,
                   assumeDistinct: Boolean = false,
                   checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val (e, d0) = bfsSetup(edges, seeds, assumeDistinct, checkpointDir)
    var dist = d0
    for (i <- 1 to rounds) {
      dist = bfsStep(e, dist)
      if (i % 4 == 0 && i < rounds)
        dist = Checkpoints.materialize(dist, checkpointDir)
    }
    dist
  }

  /**
   * Convergence-mode BFS: propagate until a round changes nothing, capped
   * at `maxRounds` (throws if the cap passes first — house policy, see
   * [[kcoreConverged]]). The change check is (row count, Σ dist)
   * equality: reached-set growth raises the count and any distance
   * improvement strictly lowers the sum while min-folding can never raise
   * one, so the pair is stable iff the table is. Termination ≤ n rounds.
   * Returns (distances, rounds run — the last being the confirming no-op).
   */
  def bfsDistancesConverged(edges: DataFrame, seeds: DataFrame,
                            maxRounds: Int = 50,
                            assumeDistinct: Boolean = false,
                            checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val (e, d0) = bfsSetup(edges, seeds, assumeDistinct, checkpointDir)
    var dist = d0
    var state = dist.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L)))
      .head()
    var iter = 0
    var changed = true
    while (changed && iter < maxRounds) {
      val next = Checkpoints.materialize(bfsStep(e, dist), checkpointDir)
      val ns = next.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L)))
        .head()
      changed = ns != state
      dist = next; state = ns; iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"bfsDistancesConverged: still propagating after $maxRounds " +
          "rounds — raise maxRounds")
    (dist, iter)
  }

  // -------------------------------------------- weighted shortest paths

  /** Loop invariants for the min-plus rounds: cast endpoints/weight to
    * long, drop null endpoints, drop null/non-positive weights ON THE
    * CAST VALUE (the [[prepare]] lesson: a fractional weight in (0, 1)
    * passes a pre-cast `> 0` check but truncates to 0), min-fold parallel
    * (src, dst) edges to the CHEAPEST weight — the min-plus semiring's
    * parallel-composition rule, unlike PageRank's additive flow — and
    * seed distances at 0 for seeds inside the node set. */
  private def ssspSetup(edges: DataFrame, seeds: DataFrame,
                        weightCol: String, assumeMinFolded: Boolean,
                        checkpointDir: Option[String])
      : (DataFrame, DataFrame) = {
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w").isNotNull && col("w") >= 1)
    val e = Checkpoints.materialize(
      if (assumeMinFolded) cast
      else cast.groupBy(col("src"), col("dst")).agg(min(col("w")).as("w")),
      checkpointDir)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val d0 = Checkpoints.materialize(
      seeds.select(col("node").cast("long").as("node"))
        .filter(col("node").isNotNull).distinct()
        .join(nodes, Seq("node"), "left_semi")
        .withColumn("dist", lit(0L)),
      checkpointDir)
    (e, d0)
  }

  /** One Bellman-Ford relaxation round: every reached node offers
    * dist + w along its out-edges; the offer stream unions with the
    * current table and min-folds per node — the [[bfsDistances]] step
    * with the edge weight in place of the +1 hop. ONE join keyed on the
    * current node + ONE min shuffle; rows never wider than (node, dist). */
  private def ssspStep(e: DataFrame, dist: DataFrame): DataFrame =
    dist.select(col("node").as("src"), col("dist"))
      .join(e, "src")
      .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      .union(dist)
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))

  /**
   * Multi-source WEIGHTED shortest-path distances (distributed
   * Bellman-Ford over the min-plus semiring): minimum total edge weight
   * from any seed along DIRECTED src→dst edges. The cost-aware sibling of
   * [[bfsDistances]] — crawl-frontier budgeting where hops are not
   * equal (fetch latency, link trust cost), or cheapest-route lookups
   * over any integer-weighted relation.
   *
   * Weights must be POSITIVE integers: null/non-positive weights drop at
   * entry (checked on the cast value), parallel (src, dst) edges min-fold
   * to the cheapest (set `assumeMinFolded` when the caller already
   * aggregated — skips one shuffle). Positivity plus min-folding make
   * rounds monotone and IDEMPOTENT past the fixpoint, so any `rounds` ≥
   * the longest optimal path's HOP count returns exact distances — the
   * oracle-replayable form ([[kcore]]/[[bfsDistances]] pattern); note a
   * weighted optimum can use MORE hops than the BFS depth (a long cheap
   * detour beats a short expensive hop), so probe the hop bound, not the
   * unweighted eccentricity. [[ssspWeightedConverged]] finds the depth.
   * Nodes unreachable within `rounds` emit NO row; seeds outside the node
   * set are ignored; distance sums fault loudly on long overflow under
   * ANSI rather than wrapping.
   *
   * The dist plan references itself twice per round (offer + union), so
   * rounds checkpoint every 4 — the BFS doubling rate. At 100 TB each
   * round costs one edge-list scan keyed on the frontier; rows never
   * carry more than (node, dist), and the weight rides the materialized
   * edge table, never the shuffle stream.
   */
  def ssspWeighted(edges: DataFrame, seeds: DataFrame, rounds: Int,
                   weightCol: String = "w",
                   assumeMinFolded: Boolean = false,
                   checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val (e, d0) = ssspSetup(edges, seeds, weightCol, assumeMinFolded,
      checkpointDir)
    var dist = d0
    for (i <- 1 to rounds) {
      dist = ssspStep(e, dist)
      if (i % 4 == 0 && i < rounds)
        dist = Checkpoints.materialize(dist, checkpointDir)
    }
    dist
  }

  /**
   * Convergence-mode weighted SSSP: relax until a round changes nothing,
   * capped at `maxRounds` (throws if the cap passes first — house
   * policy). The change check is (row count, Σ dist) equality — sound for
   * the same reason as [[bfsDistancesConverged]]: reached-set growth
   * raises the count and any relaxation strictly lowers the sum while
   * min-folding can never raise one. Positive weights bound termination
   * at ≤ n rounds (every optimal path is simple). Returns (distances,
   * rounds run — the last being the confirming no-op).
   */
  def ssspWeightedConverged(edges: DataFrame, seeds: DataFrame,
                            weightCol: String = "w",
                            maxRounds: Int = 50,
                            assumeMinFolded: Boolean = false,
                            checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val (e, d0) = ssspSetup(edges, seeds, weightCol, assumeMinFolded,
      checkpointDir)
    var dist = d0
    var state = dist.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L)))
      .head()
    var iter = 0
    var changed = true
    while (changed && iter < maxRounds) {
      val next = Checkpoints.materialize(ssspStep(e, dist), checkpointDir)
      val ns = next.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L)))
        .head()
      changed = ns != state
      dist = next; state = ns; iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"ssspWeightedConverged: still relaxing after $maxRounds " +
          "rounds — raise maxRounds")
    (dist, iter)
  }

  // -------------------------------------------- temporal reachability

  private def temporalSetup(edges: DataFrame, seeds: DataFrame,
                            timeCol: String, startTime: Long,
                            assumeDistinct: Boolean,
                            checkpointDir: Option[String])
      : (DataFrame, DataFrame) = {
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col(timeCol).cast("long").as("t"))
      .filter(col("t").isNotNull)
    val e = Checkpoints.materialize(
      if (assumeDistinct) cast else cast.distinct(), checkpointDir)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val d0 = Checkpoints.materialize(
      seeds.select(col("node").cast("long").as("node"))
        .filter(col("node").isNotNull).distinct()
        .join(nodes, Seq("node"), "left_semi")
        .withColumn("arrival", lit(startTime)),
      checkpointDir)
    (e, d0)
  }

  /** One earliest-arrival round: every reached node offers each outgoing
    * CONTACT whose instant respects its own arrival (t ≥ arrival, or
    * strictly > in strict mode); the offer's value is the contact
    * instant; offers union the current table and min-fold — the
    * [[ssspWeighted]] step with an eligibility filter inside the join. */
  private def temporalStep(e: DataFrame, arr: DataFrame,
                           strict: Boolean): DataFrame = {
    val joined = arr.select(col("node").as("src"), col("arrival"))
      .join(e, "src")
    val eligible =
      if (strict) joined.filter(col("t") > col("arrival"))
      else joined.filter(col("t") >= col("arrival"))
    eligible.select(col("dst").as("node"), col("t").as("arrival"))
      .union(arr)
      .groupBy(col("node")).agg(min(col("arrival")).as("arrival"))
  }

  /**
   * Temporal (time-respecting) reachability — earliest arrival from a
   * seed set over TIMESTAMPED contacts (Holme & Saramäki, Physics
   * Reports '12): an edge (u → v, t) can carry the spread only if u was
   * reached by time t, and then v is reached AT t. The
   * information-flow / contagion primitive a static reachability gets
   * WRONG: a path whose edges run backward in time transmits nothing,
   * so temporal reach ⊆ static reach (spec-pinned). `strict` requires
   * t > arrival (no same-instant relay chains).
   *
   * Runs exactly `rounds` min-fold rounds = earliest arrival via
   * time-respecting paths of ≤ `rounds` CONTACTS ("reachable within k
   * interactions" — itself the quantity of interest on contact
   * networks). Arrival values live in the finite edge-time lattice and
   * min-folding is monotone, so rounds are idempotent past the fixpoint
   * and any `rounds` ≥ the longest minimal time-respecting path's hop
   * count returns the exact fixpoint; [[temporalReachabilityConverged]]
   * finds that depth. Seeds start at `startTime` (contacts before it
   * are ignored for them). Nodes unreachable within `rounds` emit no
   * row.
   *
   * Per round: ONE join keyed on the current node with the eligibility
   * predicate evaluated inside it + ONE min shuffle; rows never wider
   * than (node, arrival); contacts ride the materialized edge table.
   */
  def temporalReachability(edges: DataFrame, seeds: DataFrame, rounds: Int,
                           timeCol: String = "t", startTime: Long = 0L,
                           strict: Boolean = false,
                           assumeDistinct: Boolean = false,
                           checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val (e, d0) = temporalSetup(edges, seeds, timeCol, startTime,
      assumeDistinct, checkpointDir)
    var arr = d0
    for (i <- 1 to rounds) {
      arr = temporalStep(e, arr, strict)
      if (i % 4 == 0 && i < rounds)
        arr = Checkpoints.materialize(arr, checkpointDir)
    }
    arr
  }

  /**
   * Convergence-mode temporal reachability: propagate until a round
   * changes nothing, capped at `maxRounds` (throws past the cap).
   * Change check: (row count, Σ arrival) — reach growth raises the
   * count, any improvement strictly lowers the sum, min-folding never
   * raises one (the [[bfsDistancesConverged]] argument). Termination is
   * bounded by the finite edge-time lattice. Returns (arrivals, rounds
   * run — the last being the confirming no-op).
   */
  def temporalReachabilityConverged(edges: DataFrame, seeds: DataFrame,
                                    timeCol: String = "t",
                                    startTime: Long = 0L,
                                    strict: Boolean = false,
                                    maxRounds: Int = 100,
                                    assumeDistinct: Boolean = false,
                                    checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val (e, d0) = temporalSetup(edges, seeds, timeCol, startTime,
      assumeDistinct, checkpointDir)
    var arr = d0
    var state = arr.agg(count(lit(1)), coalesce(sum(col("arrival")), lit(0L)))
      .head()
    var iter = 0
    var changed = true
    while (changed && iter < maxRounds) {
      val next = Checkpoints.materialize(temporalStep(e, arr, strict),
        checkpointDir)
      val ns = next.agg(count(lit(1)), coalesce(sum(col("arrival")), lit(0L)))
        .head()
      changed = ns != state
      arr = next; state = ns; iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"temporalReachabilityConverged: still propagating after " +
          s"$maxRounds rounds — raise maxRounds")
    (arr, iter)
  }

  // ---------------------------------------------- connected components

  private def ccSetup(edges: DataFrame, assumeDistinct: Boolean,
                      checkpointDir: Option[String])
      : (DataFrame, DataFrame) = {
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    // components are an UNDIRECTED notion — symmetrize, so directed input
    // yields weakly connected components (assumeDistinct promises the
    // symmetrized union is duplicate-free, e.g. parity-disjoint encodings)
    val sym = cast.union(cast.select(col("dst").as("src"), col("src").as("dst")))
    // pre-partitioned by `src`, the key every min-label round joins on —
    // checkpoint preserves it, so the rounds exchange only the label table
    val e = Checkpoints.materialize(
      (if (assumeDistinct) sym else sym.distinct()).repartition(col("src")),
      checkpointDir)
    val l0 = Checkpoints.materialize(
      e.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")),
      checkpointDir)
    (e, l0)
  }

  /** One min-label round: every node offers its label along its edges;
    * offers union the current table and min-fold per node — the
    * [[bfsDistances]] step shape with the label in place of dist + 1. */
  private def ccStep(e: DataFrame, labels: DataFrame): DataFrame =
    labels.select(col("node").as("src"), col("label"))
      .join(e, "src")
      .select(col("dst").as("node"), col("label"))
      .union(labels)
      .groupBy(col("node")).agg(min(col("label")).as("label"))

  /**
   * Weakly connected components by synchronous min-label propagation:
   * every node converges to the MINIMUM node id of its component — the
   * same labeling [[graft.pipeline.Dedup.clusters]] produces by
   * union-find/pointer-doubling (spec-pinned equal), but as a fixed
   * number of min-fold rounds, which makes the whole trajectory
   * oracle-replayable (the [[bfsDistances]]/[[kcore]] pattern: min-fold
   * rounds are idempotent past the fixpoint, so any `rounds` ≥ the
   * labeled graph's propagation depth — the min node's eccentricity
   * within each component — is exact; [[componentLabelsConverged]]
   * finds the depth). Use clusters() when the edge list is a near-dup
   * pair stream (it has the driver fast path and the O(log n) doubling
   * for deep chains); use this when round-replayability or the
   * graph-API shape is wanted.
   *
   * Output: (node, component) — component = min member id.
   */
  def componentLabels(edges: DataFrame, rounds: Int,
                      assumeDistinct: Boolean = false,
                      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val (e, l0) = ccSetup(edges, assumeDistinct, checkpointDir)
    var labels = l0
    for (i <- 1 to rounds) {
      labels = ccStep(e, labels)
      if (i % 4 == 0 && i < rounds)
        labels = Checkpoints.materialize(labels, checkpointDir)
    }
    labels.select(col("node"), col("label").as("component"))
  }

  /**
   * Convergence-mode components: propagate until a round changes
   * nothing, capped at `maxRounds` (throws past the cap — house policy).
   * Change check: Σ label alone — the node set is fixed after setup and
   * labels only ever decrease, so the sum is stable iff no label moved.
   * Termination ≤ the largest component's min-node eccentricity (≤ n).
   * Returns (labels, rounds run — the last being the confirming no-op).
   */
  def componentLabelsConverged(edges: DataFrame,
                               maxRounds: Int = 50,
                               assumeDistinct: Boolean = false,
                               checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val (e, l0) = ccSetup(edges, assumeDistinct, checkpointDir)
    var labels = l0
    var state = labels.agg(coalesce(sum(col("label")), lit(0L))).head()
    var iter = 0
    var changed = true
    while (changed && iter < maxRounds) {
      val next = Checkpoints.materialize(ccStep(e, labels), checkpointDir)
      val ns = next.agg(coalesce(sum(col("label")), lit(0L))).head()
      changed = ns != state
      labels = next; state = ns; iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"componentLabelsConverged: still propagating after $maxRounds " +
          "rounds — raise maxRounds")
    (labels.select(col("node"), col("label").as("component")), iter)
  }

  // ------------------------------------------------ degree distribution

  /**
   * Degree-distribution profile of a directed edge list — the first pass
   * run on any new provenance/link graph, BEFORE choosing algorithm knobs:
   * the hub tail sizes [[commonNeighbors]]' `maxApexDegree`,
   * [[kcore]]'s k, and the LSH band caps, and a power-law check here is
   * cheaper than discovering skew as a straggler task later. Per
   * direction (`out`/`in`): log2-bucketed node counts — bucket = bit
   * length of the degree ([[graft.pipeline.Curation]]'s histogram
   * bucketing), so bucket b holds degrees in [2^(b-1), 2^b) — with each
   * bucket's exact min/max degree.
   *
   * Null endpoints drop; duplicate edges dedup unless `assumeDistinct`.
   * Plan: two map-side-combined aggregate pairs over bare (node) keys —
   * rows never wider than (node, degree), output bounded by 64 buckets
   * per direction regardless of corpus size.
   */
  def degreeHistogram(edges: DataFrame,
                      assumeDistinct: Boolean = false): DataFrame = {
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    val e = if (assumeDistinct) cast else cast.distinct()
    def side(key: String, dir: String): DataFrame =
      e.groupBy(col(key).as("node")).agg(count(lit(1)).as("deg"))
        .groupBy(length(bin(col("deg"))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("deg")).as("min_degree"),
          max(col("deg")).as("max_degree"))
        .withColumn("direction", lit(dir))
    side("src", "out").unionByName(side("dst", "in"))
      .select(col("direction"), col("bucket"), col("n_nodes"),
        col("min_degree"), col("max_degree"))
  }

  // -------------------------------------------------- common neighbors

  /**
   * Common-neighbor link-prediction scores (Liben-Nowell & Kleinberg
   * CIKM'03): for every node pair sharing ≥ `minCommon` neighbors in the
   * canonical simple graph, the shared-neighbor count — wedge enumeration
   * grouped by endpoint pair, the OPEN-wedge complement of
   * [[triangleCounts]]. On a bipartite provenance graph this IS
   * co-engagement similarity ("users sharing ≥ m suppliers", "pages
   * sharing ≥ m linking hosts"); with `excludeExisting` the non-adjacent
   * survivors are the classic link-prediction candidate set.
   *
   * Besides the raw count, every pair carries two integer refinements of
   * the classic link-prediction literature, both SQL-replayable:
   * `aa_permille` — the Adamic-Adar surrogate Σ_apex 1000 div
   * floor(log₂ deg(apex)) (floor(log₂ d) = bit length − 1, pure bit
   * arithmetic; rare shared neighbors weigh more than hubs; a wedge apex
   * always has deg ≥ 2, so the divisor is ≥ 1) — and `jaccard_permille`
   * — the neighborhood Jaccard 1000·|N(a)∩N(b)| div (|N(a)|+|N(b)|−|∩|)
   * (structural similarity normalized for degree, so two low-degree
   * nodes sharing everything outrank two hubs sharing a sliver).
   *
   * Cost is Σ_apex deg² — quadratic in hub degree, like every exact
   * common-neighbor method. `maxApexDegree` caps the apexes enumerated
   * (one 10⁶-degree hub alone contributes 10¹² wedges at web scale);
   * skipped apexes make counts a LOWER bound — pairs can only drop,
   * never appear spuriously (the [[MarketBasket]] mega-basket guard
   * family; callers needing exactness raise the cap explicitly). The
   * `minCommon` cut applies BEFORE the existing-edge anti-join, and
   * wedges shuffle as bare (p, q, weight) rows — payloads never move.
   *
   * Output: (a, b, n_common, aa_permille, jaccard_permille) with a < b.
   */
  def commonNeighbors(edges: DataFrame, minCommon: Int = 1,
                      excludeExisting: Boolean = false,
                      maxApexDegree: Int = 100000,
                      checkpointDir: Option[String] = None): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    require(maxApexDegree >= 2,
      s"maxApexDegree must be >= 2 (a wedge needs 2 neighbors), got $maxApexDegree")
    val (canon, deg) = canonDeg(edges, checkpointDir)
    val adj = canon.select(col("a").as("apex"), col("b").as("nbr"))
      .union(canon.select(col("b").as("apex"), col("a").as("nbr")))
    // each adjacency row carries its apex's AA weight so the wedge join
    // needs no second degree lookup; floor(log2 d) = bit length - 1.
    // Degree-1 apexes form no wedges — dropping them up front is
    // result-invariant AND keeps the weight's log2(d) divisor >= 1
    val capped = adj.join(
      deg.filter(col("d") >= 2 && col("d") <= maxApexDegree)
        .select(col("n").as("apex"),
          expr("1000L div CAST(length(bin(d)) - 1 AS BIGINT)").as("aa_w")),
      Seq("apex"))
    val cn = capped.select(col("apex"), col("aa_w"), col("nbr").as("p"))
      .join(capped.select(col("apex"), col("nbr").as("q")), Seq("apex"))
      .filter(col("p") < col("q"))
      .groupBy(col("p"), col("q"))
      .agg(count(lit(1)).as("n_common"), sum(col("aa_w")).as("aa_permille"))
      .filter(col("n_common") >= minCommon)
    val out =
      if (excludeExisting)
        cn.join(canon, cn("p") === canon("a") && cn("q") === canon("b"),
          "left_anti")
      else cn
    // Jaccard needs each endpoint's FULL degree: two joins of the bounded
    // survivor set against the node-sized degree table (never the wedges)
    out
      .join(deg.select(col("n").as("p"), col("d").as("__dp")), "p")
      .join(deg.select(col("n").as("q"), col("d").as("__dq")), "q")
      .select(col("p").as("a"), col("q").as("b"), col("n_common"),
        col("aa_permille"),
        expr("(1000 * n_common) div (__dp + __dq - n_common)")
          .as("jaccard_permille"))
  }

  // ------------------------------------------------------- random walks

  /** The deterministic per-step pick hash: the first 60 bits of
    * md5("start:walk:step:cur") as a non-negative long — uniform enough
    * that pick bias is ≤ outdeg/2⁶⁰, and replayable in any engine that
    * has md5 over strings (DuckDB: CAST('0x' || substr(md5(…), 1, 15)
    * AS BIGINT)). */
  private def walkPick(step: Int): org.apache.spark.sql.Column =
    expr("CAST(conv(substring(md5(concat_ws(':', CAST(start AS STRING), " +
      s"CAST(walk AS STRING), '$step', CAST(cur AS STRING))), 1, 15), " +
      "16, 10) AS BIGINT)")

  /**
   * Deterministic "random" walks — the DeepWalk / node2vec(p=q=1) corpus
   * prep (Perozzi et al. KDD'14): `walksPerNode` walks of `length` steps
   * start at EVERY node; at step s a walk at node v moves to the
   * out-neighbor whose rank among v's neighbors (sorted by id) is
   * md5(start:walk:s:v) mod outdeg(v). The md5-driven choice makes the
   * walk corpus a pure function of the edge list — partition-independent,
   * rerun-stable, and SQL-replayable — while distributing uniformly over
   * neighbors up to a ≤ outdeg/2⁶⁰ bias. Walks that reach a node with no
   * out-edges stop early (rows up to the dead end emit); symmetrize the
   * edge list for never-dying undirected walks.
   *
   * Per step: one join against the per-node out-degree table to compute
   * the pick index, then one EQUI-join against the (src, idx) adjacency —
   * both shuffles keyed on the current node, no fan-out (the pick is
   * resolved before touching adjacency, so a hub's 10⁶ neighbors are
   * never replicated per walk). State rows never carry more than
   * (start, walk, cur); at 100 TB the walk frontier is
   * nodes × walksPerNode rows regardless of edge count.
   *
   * Output: (start, walk, step, node) — step 0 is the start node itself.
   */
  def randomWalks(edges: DataFrame, walksPerNode: Int, length: Int,
                  assumeDistinct: Boolean = false,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    require(length >= 1, s"length must be >= 1, got $length")
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    val e = Checkpoints.materialize(
      if (assumeDistinct) cast else cast.distinct(), checkpointDir)
    // neighbor ranks: one window shuffle over the edge list, materialized
    // once — every step equi-joins it on (src, idx)
    val adj = Checkpoints.materialize(
      e.select(col("src"), col("dst"),
        (row_number().over(
          Window.partitionBy(col("src")).orderBy(col("dst"))) - 1)
          .cast("long").as("nbr_idx")),
      checkpointDir)
    val deg = Checkpoints.materialize(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), checkpointDir)
    val starts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var state = starts
      .select(col("node").as("start"),
        explode(sequence(lit(0L), lit(walksPerNode - 1L))).as("walk"),
        col("node").as("cur"))
    val steps = scala.collection.mutable.ArrayBuffer(
      state.select(col("start"), col("walk"), lit(0L).as("step"),
        col("cur").as("node")))
    for (s <- 1 to length) {
      val picked = state.join(deg, state("cur") === deg("src"))
        .select(col("start"), col("walk"), col("cur"),
          pmod(walkPick(s), col("outdeg")).as("pick"))
      // materialize EVERY step: the final union reads all L frontiers, so
      // an unmaterialized chain re-executes O(L²/2) joins (L=40 DeepWalk
      // walks would pay ~800 joins); each frontier is only
      // nodes × walksPerNode rows — cheap to pin
      state = Checkpoints.materialize(
        picked
          .join(adj, picked("cur") === adj("src") &&
            picked("pick") === adj("nbr_idx"))
          .select(col("start"), col("walk"), col("dst").as("cur")),
        checkpointDir)
      steps += state.select(col("start"), col("walk"),
        lit(s.toLong).as("step"), col("cur").as("node"))
    }
    steps.reduce(_ union _)
  }

  /**
   * node2vec biased walks (Grover & Leskovec KDD'16) — the second-order
   * extension of [[randomWalks]]: having arrived at `cur` FROM `prev`,
   * each neighbor x of cur carries an unnormalized integer weight
   *
   *   - `returnPermille`  when x == prev            (the 1/p return knob)
   *   - 1000              when edge (prev → x) exists (BFS-ish stay-near)
   *   - `farPermille`     otherwise                  (the 1/q explore knob)
   *
   * and the step picks the neighbor whose cumulative-weight interval
   * (id-sorted) contains md5(start:walk:step:cur) mod Σweights — the
   * [[randomWalks]] determinism contract extended to weighted choice, so
   * the whole corpus is still a pure function of the edge list and
   * replays verbatim in SQL. Step 1 has no prev and picks uniformly
   * (identical to randomWalks' first hop). Neighbor classification uses
   * DIRECTED edge membership — symmetrize the input for the standard
   * undirected node2vec.
   *
   * Cost note: biased steps must SCORE EVERY neighbor of the frontier —
   * Σ_{walks} deg(cur) weight evaluations per step, quadratic in hub
   * degree the way every exact node2vec implementation is (the reference
   * implementations pre-materialize alias tables of the same size). But
   * the scoring is IN-ROW, not row-fan-out: each step equi-joins the
   * frontier against the once-materialized id-sorted adjacency-ARRAY
   * table (current node's array + prev's array) and resolves the
   * weighted pick inside one codegen'd expression
   * ([[org.apache.spark.sql.graft.Node2vecChoose]] — a two-pointer merge
   * over the two sorted arrays). The previous shape exploded the frontier
   * into per-neighbor rows, left-joined an edge-existence mark per
   * (prev, nbr), and ran a per-walk windowed cumsum: three shuffles of
   * Σ deg fan rows plus a window sort per step, for the same arithmetic
   * (measured at the sf0.1 gate: 3.9 s → 2.1 s warm, 8.4 s → 3.4 s cold;
   * zero Window nodes left in the plan). Shuffled rows never carry more
   * than one
   * adjacency array per frontier row — a 10⁶-degree hub ships its 8 MB
   * array once per walk VISIT, the same volume the fan shipped as rows,
   * but through one shuffle instead of three and with no sort behind it.
   * Each step's surviving frontier (nodes × walksPerNode rows) is
   * materialized, the randomWalks lineage rule.
   *
   * Output: (start, walk, step 0..length, node), like [[randomWalks]].
   */
  def node2vecWalks(edges: DataFrame, walksPerNode: Int, length: Int,
                    returnPermille: Int = 500, farPermille: Int = 500,
                    assumeDistinct: Boolean = false,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    require(length >= 1, s"length must be >= 1, got $length")
    require(returnPermille >= 1 && returnPermille <= 1000000,
      s"returnPermille out of [1, 1e6]: $returnPermille")
    require(farPermille >= 1 && farPermille <= 1000000,
      s"farPermille out of [1, 1e6]: $farPermille")
    val cast = edges.filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    val e = Checkpoints.materialize(
      if (assumeDistinct) cast else cast.distinct(), checkpointDir)
    // id-sorted adjacency ARRAYS (sort_array ∘ collect_list ≡ the old
    // row_number-by-dst ranking — e is distinct, so no duplicate ties),
    // materialized once; every step reads it by equi-join
    val adjList = Checkpoints.materialize(
      e.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs")),
      checkpointDir)
    val starts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val s0 = starts
      .select(col("node").as("start"),
        explode(sequence(lit(0L), lit(walksPerNode - 1L))).as("walk"),
        col("node").as("cur"))
    val steps = scala.collection.mutable.ArrayBuffer(
      s0.select(col("start"), col("walk"), lit(0L).as("step"),
        col("cur").as("node")))
    // step 1: no prev yet — the uniform randomWalks hop (pick = hash mod
    // outdeg over the id-sorted neighbors, exactly the old (src, nbr_idx)
    // equi-join's row), carrying prev out. element_at is 1-based.
    val j1 = s0.join(adjList, s0("cur") === adjList("src"))
    var state = Checkpoints.materialize(
      j1.select(col("start"), col("walk"), col("cur").as("prev"),
        element_at(col("nbrs"),
          (pmod(walkPick(1), size(col("nbrs")).cast("long")) + 1L)
            .cast("int")).as("cur")),
      checkpointDir)
    steps += state.select(col("start"), col("walk"), lit(1L).as("step"),
      col("cur").as("node"))
    for (s <- 2 to length) {
      val withCur = state.join(adjList, state("cur") === adjList("src"))
        .select(col("start"), col("walk"), col("prev"), col("cur"),
          col("nbrs"))
      val withPrev = withCur.join(
        adjList.select(col("src").as("__p"), col("nbrs").as("prev_nbrs")),
        col("prev") === col("__p"))
      state = Checkpoints.materialize(
        withPrev.select(col("start"), col("walk"), col("cur").as("prev"),
          colOf(org.apache.spark.sql.graft.Node2vecChoose(
            exprOf(col("nbrs")), exprOf(col("prev_nbrs")),
            exprOf(col("prev")), exprOf(walkPick(s)),
            returnPermille.toLong, farPermille.toLong)).as("cur")),
        checkpointDir)
      steps += state.select(col("start"), col("walk"),
        lit(s.toLong).as("step"), col("cur").as("node"))
    }
    steps.reduce(_ union _)
  }

  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column = org.apache.spark.sql.GraftShims.column(e)
  private def exprOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftShims.expression(c)
}
