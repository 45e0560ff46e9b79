package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for corpus curation.
 *
 * Seeded `df.sample` is partition-dependent: a repartition, a different
 * file split, or a different executor count changes WHICH rows are kept
 * (the seed is mixed with the partition index). A training-data pipeline
 * needs the opposite — a sample that is a pure function of row identity, so
 * reruns, backfills, and audits at any parallelism (or on another engine)
 * select the same rows. Both operators here key the randomness on
 * md5(id): uniform, stable, and reproducible anywhere md5 exists.
 *
 * Scale: `deterministicFraction` is a scan-local filter (no shuffle, fully
 * codegen'd, pushes nothing to the driver). `perGroupDeterministic` is one
 * shuffle on the group key + a per-group top-k; for severely hot groups the
 * bounded-heap aggregate used by TopX ([[graft.sql]] topn_by_ord) is the
 * drop-in upgrade, but the sampling use case caps k at thousands, where the
 * window variant's sort-within-group is already the cheaper plan.
 */
object Sampling {
  /** Hex threshold such that P[md5hex < threshold] == p for a uniform
    * 128-bit hash: floor(p * 2^128) as 32 lowercase hex chars. The same
    * literal works verbatim in any engine that can compare hex strings. */
  def fractionThresholdHex(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"fraction out of range: $p")
    // java BigDecimal: exact arithmetic by default (scala's wrapper applies
    // a 34-digit MathContext that would round 2^128)
    val t = BigInt(new java.math.BigDecimal(p)
      .multiply(new java.math.BigDecimal((BigInt(1) << 128).bigInteger))
      .toBigInteger)
    val capped = t.min((BigInt(1) << 128) - 1)
    f"%%32s".format(capped.toString(16)).replace(' ', '0')
  }

  /** Keep ~fraction `p` of rows, chosen by id-hash threshold — identical
    * selection at any parallelism. */
  def deterministicFraction(df: DataFrame, idCol: String, p: Double): DataFrame =
    df.filter(md5(col(idCol).cast("string")) < lit(fractionThresholdHex(p)))

  /**
   * Deterministic corpus mixing: per-group keep fractions (the "data
   * mixture" step that reweights sources before training — 50% of src A,
   * 10% of src B, drop the rest). Selection is the same md5-of-id
   * threshold as [[deterministicFraction]], evaluated against a per-group
   * threshold CASE — still a scan-local codegen'd filter, no shuffle, no
   * join, reproducible at any parallelism. Groups absent from `fractions`
   * are dropped (explicit mixture = explicit manifest). Because one hash
   * drives every group, mixtures NEST: raising a group's fraction keeps a
   * superset of the previous sample — the property that makes mixture
   * sweeps comparable run-to-run.
   */
  def deterministicMix(df: DataFrame, groupCol: String, idCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    require(fractions.nonEmpty, "fractions must not be empty")
    val thresh = fractions.foldLeft(lit(null).cast("string")) {
      case (acc, (g, p)) =>
        when(col(groupCol) === lit(g), lit(fractionThresholdHex(p))).otherwise(acc)
    }
    // null threshold (unlisted group) compares to null -> filter drops it
    df.filter(md5(col(idCol).cast("string")) < thresh)
  }

  /**
   * Deterministic train/val/test split: every row gets a split label from
   * disjoint md5(id)-threshold bands — a pure function of row identity, so
   * the assignment is leakage-free by construction (no row can change
   * split across reruns, engines, repartitions, or corpus growth: new ids
   * land in bands, old ids never move — the property shuffling splitters
   * lack). `weights` must sum to 1 (±1e-9); the last band absorbs hash
   * rounding. Scan-local CASE, zero shuffles.
   *
   * GROUP-AWARE splits (the duplicate-leakage guard) are this same
   * function keyed on a group column instead of the row id: pass a
   * dup-cluster representative ([[Dedup.clusters]] labels), a content
   * hash (`md5(text)` — exact dups co-travel), or a URL domain as
   * `idCol`, and every member of the group lands in the SAME band — a
   * near-dup pair can then never straddle train/val (spec-pinned in
   * SamplingTextSpec).
   */
  def deterministicSplit(df: DataFrame, idCol: String,
                         weights: Seq[(String, Double)]): DataFrame = {
    require(weights.size >= 2, "need at least two splits")
    require(weights.forall(_._2 > 0), "weights must be positive")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val cum = weights.init.scanLeft(0.0)(_ + _._2).tail
    val h = md5(col(idCol).cast("string"))
    val splitCol = weights.init.zip(cum).foldRight(lit(weights.last._1)) {
      case (((name, _), c), acc) =>
        when(h < lit(fractionThresholdHex(c)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", splitCol)
  }

  /**
   * Deterministic k-FOLD assignment (cross-validation / sharded-eval
   * folds): fold = 32-bit md5 prefix of the id, mod k — a pure function
   * of row identity, so folds are stable across reruns, partitionings,
   * and engines, and an id keeps its fold as the corpus grows (the
   * property leakage-free CV needs: fold(i) never depends on which other
   * rows exist). Scan-local projection, zero shuffles; expected fold
   * sizes are uniform to md5 quality. The same 32-bit-prefix idiom as
   * the hashed-feature classifier, replayable in any engine with hex
   * string arithmetic.
   */
  def deterministicFolds(df: DataFrame, idCol: String = "doc_id",
                         k: Int = 5): DataFrame = {
    require(k >= 2 && k <= (1 << 16), "k must be in [2, 65536]")
    df.withColumn("fold",
      pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
        lit(k.toLong)))
  }

  /**
   * Token-budget sampling: per source, keep documents in deterministic
   * (md5(id), id) order until the source's TOKEN budget is exhausted —
   * "take N billion tokens of web, M of code", the unit real mixtures are
   * specified in. A doc is kept while its EXCLUSIVE running token sum is
   * under budget, so the last kept doc may overrun by its own tail — the
   * same conveyor contract as [[TextAnalysis.packBudgeted]], which keeps
   * the selection a pure function of (group, id-order, token counts).
   * Sources absent from `budgets` are dropped (explicit manifest).
   * `tokenCount` plugs the denominator (pass a BPE counter for
   * tokenizer-truth budgets). One shuffle: each source's window sorts
   * independently; the hash order also makes samples NEST across budget
   * increases (a bigger budget keeps a superset).
   */
  def sampleByTokenBudget(df: DataFrame, budgets: Map[String, Long],
                          groupCol: String = "source", idCol: String = "doc_id",
                          textCol: String = "text",
                          tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                            TextAnalysis.tokenCountWs): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      "budgets must be non-empty and positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = budgets.foldLeft(lit(null).cast("long")) { case (acc, (g, b)) =>
      when(col(groupCol) === lit(g), lit(b)).otherwise(acc)
    }
    df.withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("__cum") < budget) // null budget (unlisted source) drops
      .select(col(idCol), col(groupCol), col("n_tokens"))
  }

  /**
   * Epoch-based mixing (upsampling): per-source epoch multipliers — the
   * LLaMA-style "web ×1, books ×2, code ×0.5" recipe. A multiplier
   * n + f (integer + fraction) replicates every doc n times and once more
   * for the deterministic md5-threshold fraction f of ids, emitting one
   * row per (doc, epoch). Selection of the fractional epoch nests with f
   * and is a pure function of row identity — reruns and engines agree.
   * Scan-local: the CASE picks the per-row count, sequence+explode emits
   * epochs; no shuffle at any scale. Sources absent from `epochs` drop.
   */
  def mixWithEpochs(df: DataFrame, epochs: Map[String, Double],
                    groupCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(epochs.nonEmpty, "epochs must not be empty")
    require(epochs.values.forall(e => e > 0 && e <= 100), "epoch factors must be in (0, 100]")
    val whole = epochs.foldLeft(lit(null).cast("long")) { case (acc, (g, ep)) =>
      when(col(groupCol) === lit(g), lit(math.floor(ep).toLong)).otherwise(acc)
    }
    val fracThresh = epochs.foldLeft(lit(null).cast("string")) { case (acc, (g, ep)) =>
      val f = ep - math.floor(ep)
      when(col(groupCol) === lit(g), lit(fractionThresholdHex(f))).otherwise(acc)
    }
    val n = whole + when(md5(col(idCol).cast("string")) < fracThresh, 1L).otherwise(0L)
    df.withColumn("__n", n)
      .filter(col("__n") > 0)
      .select(col(idCol), col(groupCol),
        explode(sequence(lit(0L), col("__n") - 1L)).as("epoch"))
  }

  /**
   * TEMPERATURE-based source rebalancing — the multilingual/multi-source
   * α-sampling recipe (XLM, mT5: sample source g proportional to n_g^α,
   * α < 1 flattens the distribution so small sources are up-represented).
   * α is fixed at 1/2 and computed as INTEGER isqrt — w_g = floor(√n_g) is
   * exact integer arithmetic for n_g < 2^52 (IEEE sqrt is correctly
   * rounded; a non-square's root is never within half-ulp of an integer at
   * that scale), so quotas replay bit-identically cross-engine with no
   * float thresholds anywhere. Each source keeps its first
   * quota_g = floor(T·w_g / Σw) rows in (md5(id), id) order — the same
   * rank-vs-exact-quota contract as [[proportionalStratified]], so samples
   * nest as T grows and reruns agree row-for-row. Σ quota_g ≤ T (floors);
   * a quota above n_g simply keeps the whole source.
   *
   * Scale shape: source counts are one map-side-combined aggregate on a
   * group-cardinality-bounded table (sources number in the thousands, not
   * billions); quota arithmetic happens on that tiny table (the
   * unpartitioned window is over #sources rows) and broadcasts back; the
   * corpus itself shuffles ONCE for the per-source rank window.
   */
  def temperatureResample(df: DataFrame, totalTarget: Long,
                          groupCol: String = "source",
                          idCol: String = "doc_id"): DataFrame = {
    require(totalTarget > 0, "totalTarget must be positive")
    require(totalTarget <= (1L << 37),
      "totalTarget * isqrt(group count) must stay below 2^63 for exact quotas")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val quotas = counts
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
      .withColumn("__wsum", sum(col("__w")).over(Window.partitionBy()))
      .withColumn("__quota", expr(s"($totalTarget * __w) div __wsum"))
      .select(col(groupCol), col("__quota"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.join(broadcast(quotas), Seq(groupCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /**
   * Deterministic GLOBAL training order: every row gets the ordinal of
   * its (md5(id), id) key in the corpus-wide total order — the "shuffle
   * once, stream forever" ordering trainers consume, reproducible across
   * engines, reruns, and partitionings because it is a pure function of
   * row identity. The naive formulation (row_number over a global ORDER
   * BY) collapses to a single-partition window; here the hash key's first
   * 16 bits map rows into `buckets` ORDER-PRESERVING, DATA-INDEPENDENT
   * ranges (bucket = h16·buckets >> 16 — a fixed monotone map, so no
   * sampled range boundaries and no cross-job nondeterminism), the tiny
   * per-bucket count table turns into broadcast exclusive offsets, and
   * the ordinal is offset + the bucket-local rank. Two jobs (count +
   * rank), each fully parallel; md5 uniformity keeps buckets balanced.
   */
  def globalTrainingOrder(df: DataFrame, idCol: String = "doc_id",
                          buckets: Int = 256): DataFrame =
    globalOrderedOffsets(df, lit(1L), idCol, buckets)
      .withColumnRenamed("global_offset", "ordinal")

  /**
   * [[globalTrainingOrder]]'s machinery generalized to WEIGHTED offsets:
   * every row gets the exclusive prefix sum of `weight` over the
   * corpus-wide (md5(id), id) order as `global_offset` (weight 1 makes
   * this the training ordinal). Same two fully-parallel jobs — bucket
   * weight sums become broadcast exclusive bucket offsets, then a
   * bucket-local window sum finishes the prefix — never a
   * single-partition window. This is the placement step of
   * [[graft.pipeline.TextAnalysis.buildExamples]]: with weight = token
   * count, `global_offset` is each document's first-token position in
   * the concatenated training stream.
   */
  def globalOrderedOffsets(df: DataFrame, weight: Column,
                           idCol: String = "doc_id",
                           buckets: Int = 256): DataFrame = {
    require(buckets >= 1 && buckets <= 65536, s"buckets out of [1, 65536]: $buckets")
    val key = md5(col(idCol).cast("string"))
    val h16 = conv(substring(key, 1, 4), 16, 10).cast("long")
    val bkt = shiftright(h16 * lit(buckets.toLong), 16)
    val keyed = df.withColumn("__w", weight.cast("long"))
      .withColumn("__key", key).withColumn("__bkt", bkt)
    val counts = keyed.groupBy(col("__bkt")).agg(sum(col("__w")).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__bkt", "__off")
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(col("__key").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offDf), "__bkt")
      .withColumn("global_offset",
        col("__off") + coalesce(sum(col("__w")).over(w), lit(0L)))
      .drop("__w", "__key", "__bkt", "__off")
  }

  /** Exactly min(k, |group|) rows per group, chosen by id-hash order — a
    * deterministic per-stratum reservoir (stratified sampling with a hard
    * per-stratum cap). */
  def perGroupDeterministic(df: DataFrame, groupCols: Seq[String],
                            idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * PROPORTIONAL stratified sampling: exactly
   * max(minPerGroup, floor(frac·N_g + 0.5)) rows from every stratum (capped
   * at N_g), chosen in (md5(id), id) order — the eval-set construction that
   * keeps every stratum's share equal to its corpus share, while
   * [[perGroupDeterministic]]'s fixed k flattens strata and
   * [[deterministicFraction]]'s global threshold only hits shares in
   * expectation (a rare stratum can lose every row to hash luck; here
   * `minPerGroup` floors it, the way survey samplers keep rare strata
   * represented). The quota is an exact per-group count, not a
   * probability, so repeated runs agree row-for-row, and because one hash
   * order drives every frac, samples NEST across frac increases.
   *
   * Plan: ONE shuffle on the stratum key serves both the group count
   * (window aggregate) and the rank — Spark reuses the exchange, so the
   * cost equals the fixed-k variant's. The 0.5 rounding offset is exact in
   * double for any frac expressible as p/2^k·10^-m at sane group sizes;
   * the same floor(frac·n + 0.5) arithmetic replays in any engine.
   */
  /**
   * Deterministic WEIGHTED sampling without replacement: min(k, |group|)
   * rows per group chosen by ascending integer priority
   * `h div w` — h = the 60-bit md5 prefix of the id (the
   * [[graft.pipeline.Graph.randomWalks]] hash idiom), w = the row's
   * positive integer weight. The integer surrogate of the
   * Efraimidis–Spirakis A-Res exponential keys (IPL '06): P[h div w < t]
   * ≈ t·w / 2⁶⁰, so inclusion odds scale ∝ w — doubling a weight halves
   * its expected priority — while everything stays a pure function of
   * (id, w): repeated runs agree row-for-row, the selection replays in
   * any engine as `ORDER BY h // w, h, id` (both operands non-negative,
   * so truncating and flooring division agree), and because ONE total
   * order drives every k, samples NEST across k increases. The
   * importance-weighted cousin of [[perGroupDeterministic]]: quality-
   * or DSIR-weighted corpus subsetting where better documents should
   * win more sampling slots but the draw must stay reproducible.
   *
   * Weight hygiene (the [[graft.pipeline.Graph]] lesson, checked on the
   * CAST value so a fractional weight in (0, 1) cannot slip through as
   * zero): null/non-positive weights mean "never sample" — those rows
   * drop from the candidate pool entirely.
   *
   * Plan: one shuffle on the group key, bounded rank filter — identical
   * cost shape to [[perGroupDeterministic]]; only (group, priority)
   * ordering state sorts, payloads ride along untouched.
   *
   * Column contract: names starting with `__` are RESERVED working
   * columns throughout this object (here: __w/__h/__pri/__rn). Rather
   * than silently overwrite-and-drop a caller column of the same name —
   * which would corrupt the promised payload ride-along — a colliding
   * input is rejected loudly (advisor r9).
   */
  def weightedSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val reserved = Seq("__w", "__h", "__pri", "__rn")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with reserved working " +
        "columns (the __ prefix is reserved by graft.pipeline.Sampling); " +
        "rename them before sampling")
    val win = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__pri").asc, col("__h").asc, col(idCol).asc)
    df.withColumn("__w", col(weightCol).cast("long"))
      .filter(col("__w").isNotNull && col("__w") >= 1)
      .withColumn("__h",
        conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("__pri", expr("__h div __w"))
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .drop("__w", "__h", "__pri", "__rn")
  }

  def proportionalStratified(df: DataFrame, groupCols: Seq[String],
                             idCol: String, frac: Double,
                             minPerGroup: Int = 1): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac out of (0,1]: $frac")
    require(minPerGroup >= 0, "minPerGroup must be >= 0")
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    val quota = greatest(lit(minPerGroup.toLong),
      floor(lit(frac) * count(lit(1)).over(part) + lit(0.5)).cast("long"))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__quota", quota)
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /**
   * Largest-remainder (Hamilton) apportionment of an integer budget
   * across weighted sources — the exact-integer step every corpus-mixing
   * recipe needs between "per-source weights" and "per-source token
   * budgets": allocations sum to EXACTLY `budget`, each source gets
   * ⌊budget·wᵢ/W⌋ plus one extra unit for the `budget mod W`-largest
   * remainders (ties broken by key ascending, the deterministic
   * convention). Output per source: the weight, `base_alloc`, `extra`
   * (0/1), and the final `alloc`.
   *
   * Plan shape: `weights` is a sources-sized frame (one row per source,
   * produced upstream by a map-side-combined count/sum), so the total-W
   * aggregate broadcasts as a 1-row frame and the remainder rank is one
   * window over #sources rows — nothing here ever sees the corpus.
   * Overflow-safe while budget·wᵢ fits a long (require-guarded).
   */
  def apportion(weights: DataFrame, keyCol: String, weightCol: String,
                budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val totals = weights.agg(
      coalesce(sum(col(weightCol)), lit(0L)).as("__w_total"),
      coalesce(max(col(weightCol)), lit(0L)).as("__w_max"),
      coalesce(min(col(weightCol)), lit(0L)).as("__w_min"))
    val withTotal = weights.crossJoin(broadcast(totals))
    val rankW = Window.orderBy(
      expr(s"(($budget * $weightCol) % __w_total)").desc, col(keyCol).asc)
    val wCap = if (budget == 0) Long.MaxValue else Long.MaxValue / budget
    withTotal
      // the guard lives inside a REFERENCED column so pruning keeps it;
      // a NEGATIVE weight would silently break the Σalloc == budget
      // invariant (negative base_alloc rows + leftover units exceeding
      // the row count), so it routes into the same loud failure
      .withColumn("base_alloc", when(
        col("__w_max") > lit(wCap) || col("__w_total") <= 0 ||
          col("__w_min") < 0,
        raise_error(lit(
          "apportion: negative weight, zero total weight, or " +
            "budget * max(weight) overflows long"))
          .cast("long"))
        .otherwise(expr(s"($budget * $weightCol) div __w_total")))
      .withColumn("__rem_rank", row_number().over(rankW))
      .withColumn("extra", when(
        col("__rem_rank") <= lit(budget) - expr(
          s"sum(base_alloc) over ()"), 1L).otherwise(0L))
      .withColumn("alloc", col("base_alloc") + col("extra"))
      .select(col(keyCol), col(weightCol), col("base_alloc"), col("extra"),
        col("alloc"))
  }
}
