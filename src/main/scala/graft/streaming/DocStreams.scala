package graft.streaming

import graft.pipeline.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the `documents` table shape
 * (doc_id, text, lang, source, n_chars) — the ingestion-time half of a
 * training-data pipeline: as document files land, they are quality-scored,
 * deterministically sampled, and scanned for benchmark contamination
 * BEFORE anything accumulates state.
 *
 * All three twins reuse the batch operators unchanged: they are built
 * purely from stateless codegen'd expressions (sample, quality) or a
 * streaming-supported aggregation (contamination), so the exact same plan
 * fragment runs incrementally — the twin guarantee is structural, not a
 * re-implementation. Tests pin streaming output == batch output on the
 * same files.
 */
object DocStreams {

  val docFileSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming file source over a directory of document parquet files. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.configure(spark)
    spark.readStream.schema(docFileSchema).parquet(dir)
  }

  /** Streaming deterministic sample: the md5-threshold filter is stateless,
    * so selection is identical to the batch pass at any micro-batch split —
    * the property that makes sampled corpus curation auditable. */
  def sampledStream(docs: DataFrame, fraction: Double): DataFrame =
    Sampling.deterministicFraction(docs, "doc_id", fraction)

  /** Streaming quality scoring: stateless projection, appended per row. */
  def qualityStream(docs: DataFrame): DataFrame =
    TextAnalysis.withQualityScore(docs, "text")

  /** Streaming contamination scan: broadcast probe join + streaming
    * aggregate; emit with Update/Complete mode. State is O(|probes|). */
  def contaminationStream(docs: DataFrame, probes: Seq[String]): DataFrame =
    TextAnalysis.contaminationProbes(docs, probes)

  /** Streaming boilerplate-line removal: the per-line rules are
    * scan-local, so cleaning is identical at any micro-batch split. */
  def boilerplateStream(docs: DataFrame, minWords: Int = 5): DataFrame =
    TextAnalysis.removeBoilerplate(docs, minWords = minWords)

  /** Streaming quality-classifier scoring: broadcast-model projection —
    * the model crosses the wire once per executor, rows score statelessly
    * as they arrive (the ingestion-gate shape). */
  def classifierStream(docs: DataFrame,
                       state: org.apache.spark.sql.graft.HashedLinearState): DataFrame = {
    import org.apache.spark.sql.functions._
    docs.withColumn("score",
      TextAnalysis.classifierScore(split(trim(col("text")), "\\s+"), state))
  }

  /** Streaming token-denominated chunking: the chunk array is one
    * stateless expression pass + generator — batch-split invariant. */
  def chunkByTokensStream(docs: DataFrame,
                          state: org.apache.spark.sql.graft.BpeState,
                          maxTokens: Long): DataFrame =
    TextAnalysis.chunkByTokens(docs, state, maxTokens)

  /** Streaming BM25 scoring against a frozen [[TextAnalysis.Bm25Model]]
    * (extracted once from the corpus at rest): stateless scan-local
    * projection, the retrieval-model ingestion-gate shape — and
    * bit-identical to the batch [[TextAnalysis.bm25]] scores over the
    * model corpus (pinned in the spec). Docs matching no query term are
    * not retrieved, matching batch semantics. */
  def bm25Stream(docs: DataFrame, model: TextAnalysis.Bm25Model): DataFrame = {
    import org.apache.spark.sql.functions._
    docs.withColumn("n_terms", TextAnalysis.bm25MatchedTerms(col("text"), model))
      .withColumn("bm25", TextAnalysis.bm25Score(col("text"), model))
      .filter(col("n_terms") > 0)
  }

  /** Streaming n-gram decontamination: the batch operator unchanged on a
    * stream — eval-set grams reduce ONCE on the static side and broadcast;
    * the stream side is a stateless explode + broadcast join, and the only
    * state is the per-contaminated-doc running count (update/complete
    * mode). The shape every ingestion gate wants: eval sets are frozen,
    * documents flow. */
  def contaminationNgramsStream(docs: DataFrame, evalDocs: DataFrame,
                                n: Int = 3): DataFrame =
    TextAnalysis.contaminationNgrams(docs, evalDocs, n)

  /**
   * Streaming SimHash near-duplicate detection — the stateful twin of
   * [[Dedup.simhashPairs]]: each doc's 64-bit simhash fans out to its 4
   * pigeonhole chunk buckets (≤ 3 differing bits ⇒ at least one identical
   * 16-bit chunk, so completeness carries over); per bucket, GroupState
   * holds the (id, simhash) pairs seen so far (16 bytes each, capped at
   * `maxBucket` — append-only state keeps the FIRST maxBucket arrivals
   * where the batch op drops over-cap buckets wholesale), and an arriving
   * doc emits a pair for every stored doc within `maxHamming`. Pairs
   * surface the moment their second member arrives — the streaming shape
   * of near-dup detection against all history. A pair colliding in several
   * chunks is emitted once per chunk; collapse downstream exactly as the
   * batch op's dropDuplicates does.
   */
  def simhashPairsStream(docs: DataFrame, shingle: Int = 5, maxHamming: Int = 3,
                         maxBucket: Int = 10000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.functions._
    require(maxHamming <= 3, "chunked pigeonhole bound holds for maxHamming <= 3")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("id"),
        Dedup.simhash(col("text"), shingle).as("sh"))
      .select(col("id"), col("sh"), posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .select(concat_ws("_", col("pos"), col("col")).as("bucket"), col("id"), col("sh"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[Seq[(Long, Long)]]) =>
          val seen = state.getOption.getOrElse(Seq.empty).toBuffer
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          rows.toArray.sortBy(_._2).foreach { case (_, id, sh) =>
            seen.foreach { case (pid, psh) =>
              if (pid != id) {
                val h = java.lang.Long.bitCount(psh ^ sh).toLong
                if (h <= maxHamming)
                  out += (if (pid < id) (pid, id, h) else (id, pid, h))
              }
            }
            if (seen.length < maxBucket) seen += ((id, sh))
          }
          state.update(seen.toSeq)
          out.iterator
      }.toDF("id_a", "id_b", "hamming")
  }

  /**
   * Streaming MinHash-LSH near-duplicate detection — the stateful twin of
   * [[Dedup.minhashLshPairs]], completing the near-dup streaming story
   * (exact dedup, SimHash, and now MinHash all have stream twins).
   *
   * State discipline is the 100 TB design point: per (band, bucket) key,
   * `GroupState` holds only (id, signature) sketches — `numHashes` longs
   * per doc, never text — capped at `maxBucket` (append-only: the FIRST
   * maxBucket arrivals stay, where the batch op drops over-cap buckets
   * wholesale). An arriving doc emits a candidate for every stored sketch
   * whose slot-match estimate clears `threshold - 0.2`, the batch
   * prefilter verbatim. Exact n-gram-Jaccard verification then runs as a
   * STREAM-STATIC join against the corpus-at-rest (`corpus`): texts come
   * from the lake at verify time, not from state — the stateless join
   * Structured Streaming executes per micro-batch with no extra state.
   *
   * LAKE-FRESHNESS PRECONDITION: the verify join is inner, so a candidate
   * pair whose text has not yet landed in `corpus` when its micro-batch
   * verifies is dropped PERMANENTLY — state remembers sketches, not
   * texts, and the pair is never re-checked. Deploy with ingestion
   * committing to the lake before (or atomically with) the stream source
   * (the natural file-source layout, where `docs` streams the same files
   * `corpus` reads). If the stream can run ahead of the lake, set
   * `surfaceMissingTexts = true`: the verify join widens to LEFT and a
   * candidate with an un-landed text is EMITTED with `jaccard = NULL`
   * instead of silently vanishing — downstream alerts on
   * `jaccard IS NULL` and re-verifies those pairs once the lake catches
   * up. (Off by default: the extra rows would break twin equality.)
   *
   * A pair colliding in several bands is emitted once per band; collapse
   * downstream exactly as the batch op's dropDuplicates does. With caps
   * unhit, the verified output over any file sequence equals the batch
   * operator on the union of those files (pinned by test).
   */
  def minhashPairsStream(docs: DataFrame, corpus: DataFrame,
                         numHashes: Int = 64, bands: Int = 16, shingle: Int = 5,
                         threshold: Double = 0.8, maxBucket: Int = 10000,
                         surfaceMissingTexts: Boolean = false): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.graft.{MinHashSig, SigBands}
    val spark = docs.sparkSession
    import spark.implicits._
    def c(ex: org.apache.spark.sql.catalyst.expressions.Expression) = GraftShims.column(ex)
    def e(column: org.apache.spark.sql.Column) = GraftShims.expression(column)
    val estFloor = threshold - 0.2
    val candidates = docs
      .select(col("doc_id").cast("long").as("id"),
        c(MinHashSig(e(col("text")), e(lit(numHashes)), e(lit(shingle)))).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(c(SigBands(e(col("sig")), e(lit(bands))))))
      .select(concat_ws("_", col("pos"), col("col")).as("bucket"), col("id"), col("sig"))
      .as[(String, Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, Seq[Long])],
         state: GroupState[Seq[(Long, Seq[Long])]]) =>
          val seen = state.getOption.getOrElse(Seq.empty).toBuffer
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          rows.toArray.sortBy(_._2).foreach { case (_, id, sig) =>
            seen.foreach { case (pid, psig) =>
              if (pid != id) {
                // slot-match estimate, the SigJaccard formula verbatim
                val n = math.min(psig.length, sig.length)
                var eq = 0
                var i = 0
                while (i < n) { if (psig(i) == sig(i)) eq += 1; i += 1 }
                if (n > 0 && eq.toDouble / n >= estFloor)
                  out += (if (pid < id) (pid, id) else (id, pid))
              }
            }
            if (seen.length < maxBucket) seen += ((id, sig))
          }
          state.update(seen.toSeq)
          out.iterator
      }.toDF("id_a", "id_b")
    verifyAgainstLake(candidates, corpus, shingle, threshold, surfaceMissingTexts)
  }

  /** Stream-static exact-Jaccard verify shared by the near-dup twins.
    * `surfaceMissingTexts` widens to LEFT joins: a candidate whose text
    * has not landed in the lake is emitted with `jaccard = NULL` (alert +
    * re-verify later) instead of silently vanishing. */
  private def verifyAgainstLake(candidates: DataFrame, corpus: DataFrame,
                                shingle: Int, threshold: Double,
                                surfaceMissingTexts: Boolean): DataFrame = {
    import org.apache.spark.sql.functions._
    val ta = corpus.select(col("doc_id").cast("long").as("id_a"), col("text").as("text_a"))
    val tb = corpus.select(col("doc_id").cast("long").as("id_b"), col("text").as("text_b"))
    if (surfaceMissingTexts)
      candidates.join(ta, Seq("id_a"), "left").join(tb, Seq("id_b"), "left")
        .withColumn("jaccard",
          when(col("text_a").isNull || col("text_b").isNull, lit(null).cast("double"))
            .otherwise(Dedup.ngramJaccard(col("text_a"), col("text_b"), shingle)))
        .filter(col("jaccard").isNull || col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    else
      candidates.join(ta, "id_a").join(tb, "id_b")
        .withColumn("jaccard", Dedup.ngramJaccard(col("text_a"), col("text_b"), shingle))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
  }

  /**
   * Streaming EXACT n-gram-Jaccard near-duplicate detection — the stateful
   * twin of [[Dedup.ngramJaccardPairs]], completing the dedup streaming
   * story: exact-hash, SimHash, MinHash AND the exact join now all have
   * stream twins.
   *
   * Shape = AllPairs prefix filtering in GroupState: each arriving doc
   * emits its prefix grams (the first `sz − ⌈t·sz⌉ + 1` of its SORTED
   * distinct gram hashes — hash order is the stream's fixed total order,
   * where the batch op ranks by corpus df; any common total order
   * preserves the prefix lemma, so the two enumerate different CANDIDATE
   * sets but identical verified outputs). Per prefix-gram bucket, state
   * holds (id, sz, rk) triples — 16 B per entry, never text — capped at
   * `maxBucket` first arrivals; an arriving doc pairs against stored
   * entries that also pass the batch op's length and positional filters
   * verbatim. Exact verification runs as the same STREAM-STATIC join
   * against the corpus at rest as [[minhashPairsStream]] — and inherits
   * its LAKE-FRESHNESS PRECONDITION (candidates verify against `corpus`
   * at micro-batch time; see that scaladoc).
   *
   * A pair colliding on several prefix grams is emitted once per gram;
   * collapse downstream exactly as the batch op's dropDuplicates does.
   * With caps unhit, verified output over any file sequence equals the
   * batch operator on the union of those files (pinned by test).
   */
  def ngramPairsStream(docs: DataFrame, corpus: DataFrame,
                       shingle: Int = 5, threshold: Double = 0.8,
                       maxBucket: Int = 10000,
                       surfaceMissingTexts: Boolean = false): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.graft.ShingleHashes
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    def c(ex: org.apache.spark.sql.catalyst.expressions.Expression) = GraftShims.column(ex)
    def e(column: org.apache.spark.sql.Column) = GraftShims.expression(column)
    val ratio = threshold / (1.0 + threshold)
    val candidates = docs
      .select(col("doc_id").cast("long").as("id"),
        array_sort(c(ShingleHashes(e(col("text")), e(lit(shingle))))).as("grams"))
      .withColumn("sz", size(col("grams")))
      .filter(col("sz") > 0)
      // same 1e-9 ceil slack as the batch prefix (can only lengthen —
      // sound); rk is 1-based position in the stream's hash order
      .select(col("id"), col("sz"), posexplode(slice(col("grams"), lit(1),
        col("sz") - ceil(col("sz") * lit(threshold) - lit(1e-9)).cast("int") + lit(1))))
      .select(col("col").as("gram"), col("id"), col("sz"), (col("pos") + 1).as("rk"))
      .as[(Long, Long, Int, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Int, Int)],
         state: GroupState[Seq[(Long, Int, Int)]]) =>
          val seen = state.getOption.getOrElse(Seq.empty).toBuffer
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          rows.toArray.sortBy(_._2).foreach { case (_, id, sz, rk) =>
            seen.foreach { case (pid, psz, prk) =>
              if (pid != id) {
                val (aSz, aRk, bSz, bRk) =
                  if (pid < id) (psz, prk, sz, rk) else (sz, rk, psz, prk)
                // batch length + positional filters, same FP slack direction
                val lenOk = bSz * threshold <= aSz + 1e-6 &&
                  aSz * threshold <= bSz + 1e-6
                val posOk = ratio * (aSz + bSz) - 1e-6 <=
                  1.0 + math.min(aSz - aRk, bSz - bRk)
                if (lenOk && posOk)
                  out += (if (pid < id) (pid, id) else (id, pid))
              }
            }
            if (seen.length < maxBucket) seen += ((id, sz, rk))
          }
          state.update(seen.toSeq)
          out.iterator
      }.toDF("id_a", "id_b")
    verifyAgainstLake(candidates, corpus, shingle, threshold, surfaceMissingTexts)
  }

  /**
   * Streaming sequence packing — the stateful twin of
   * [[TextAnalysis.packBudgeted]]: per group (`source`), a running token
   * sum lives in `GroupState` (one long per group) and each doc's pack_id
   * is the exclusive cumulative sum div `budgetTokens`, exactly the batch
   * formula. Rows are doc_id-sorted WITHIN each micro-batch before the sum
   * continues, so with in-order arrival (each batch's ids after the
   * previous batch's, per group — the natural shape for append-only
   * ingestion) the assignment is identical to the batch operator's global
   * doc_id order; out-of-order arrival packs in arrival order, the same
   * trade watermarked streaming dedup makes for late rows.
   *
   * `tokenCount` is the same pluggable denominator as the batch op's —
   * pass `t => TextAnalysis.tokenCountBpe(t, state)` to budget the stream
   * in real tokenizer tokens (the projection is stateless, so streaming
   * support is untouched).
   */
  def packBudgetedStream(docs: DataFrame, budgetTokens: Long = 512L,
                         tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                           TextAnalysis.tokenCountWs): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"),
        coalesce(tokenCount(col("text")).cast("long"), lit(0L)).as("n_tokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(Long, String, Long)], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toArray.sortBy(_._1).map { case (id, _, n) =>
            val pid = cum / budgetTokens
            cum += n
            (id, source, n, pid)
          }
          state.update(cum)
          out.iterator
      }.toDF("doc_id", "source", "n_tokens", "pack_id")
  }

  /**
   * Streaming INCREMENTAL dedup: each micro-batch of arriving documents
   * probes the persisted [[graft.pipeline.Dedup.writeMinhashIndex]] index.
   * Stream-static joins only (index and corpus both at rest), so the
   * query is completely STATELESS — no GroupState, no watermark, nothing
   * accumulates: the production shape of ingestion-time dedup, where the
   * index is rebuilt on the lake's compaction cadence while arrivals
   * probe it continuously. Inherits the LAKE-FRESHNESS precondition of
   * the other near-dup twins on the corpus-text verify side;
   * `surfaceMissingTexts` widens to a LEFT join + NULL jaccard so stale
   * candidates surface instead of vanishing. A pair colliding in several
   * bands emits once per band; collapse downstream exactly as the batch
   * op's dropDuplicates does.
   */
  def dedupAgainstIndexStream(docs: DataFrame, indexPath: String,
                              corpus: DataFrame, numHashes: Int = 64,
                              bands: Int = 16, shingle: Int = 5,
                              threshold: Double = 0.8,
                              surfaceMissingTexts: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.{MinHashSig, SigBands, SigJaccard}
    def c(ex: org.apache.spark.sql.catalyst.expressions.Expression) = GraftShims.column(ex)
    def e(column: org.apache.spark.sql.Column) = GraftShims.expression(column)
    val spark = docs.sparkSession
    // split index layout (see [[graft.pipeline.Dedup.writeMinhashIndex]]):
    // the band join carries skinny rows; corpus signatures attach to the
    // surviving candidates via a second stream-static join
    val bandsIdx = spark.read.parquet(s"$indexPath/bands")
    val sigsIdx = spark.read.parquet(s"$indexPath/sigs")
    val bband = docs
      .select(col("doc_id").cast("long").as("new_id"), col("text").as("new_text"),
        c(MinHashSig(e(col("text")), e(lit(numHashes)), e(lit(shingle)))).as("new_sig"))
      .select(col("new_id"), col("new_text"), col("new_sig"),
        posexplode(c(SigBands(e(col("new_sig")), e(lit(bands))))).as(Seq("band", "key")))
    val cand = bband.join(bandsIdx, Seq("band", "key"))
      .join(sigsIdx.select(col("id"), col("sig")), "id")
      .filter(c(SigJaccard(e(col("sig")), e(col("new_sig")))) >= threshold - 0.2)
      .select(col("new_id"), col("new_text"), col("id").as("corpus_id"))
    val ct = corpus.select(col("doc_id").cast("long").as("corpus_id"),
      col("text").as("corpus_text"))
    val verified =
      if (surfaceMissingTexts)
        cand.join(ct, Seq("corpus_id"), "left")
          .withColumn("jaccard",
            when(col("corpus_text").isNull, lit(null).cast("double"))
              .otherwise(graft.pipeline.Dedup.ngramJaccard(
                col("new_text"), col("corpus_text"), shingle)))
          .filter(col("jaccard").isNull || col("jaccard") >= threshold)
      else
        cand.join(ct, Seq("corpus_id"))
          .withColumn("jaccard", graft.pipeline.Dedup.ngramJaccard(
            col("new_text"), col("corpus_text"), shingle))
          .filter(col("jaccard") >= threshold)
    verified.select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /**
   * FROZEN-MODEL streaming twin of
   * [[graft.pipeline.Curation.perplexityBuckets]] (the
   * [[bm25Stream]] pattern): arriving pre-scored docs are bucketed
   * against a broadcast per-group boundary table built by
   * [[graft.pipeline.Curation.perplexityThresholds]] — bucket = first
   * boundary holding the score, scores beyond every boundary land in
   * the last bucket (CCNet scores new shards against last month's
   * percentiles exactly this way). Stateless: one broadcast join + a
   * scan-local array count.
   *
   * Equality contract with the batch NTILE: identical for every doc
   * whose score differs from all bucket boundaries; docs TIED at a
   * boundary all take the earlier bucket here, where batch NTILE splits
   * the tie by id to keep frequencies equal. Frozen-model semantics,
   * not a defect — documented like the arrival-order contracts. Groups
   * absent from the threshold table are dropped (inner join): an
   * unknown language has no percentiles to score against.
   */
  def perplexityBucketsStream(scored: DataFrame, thresholds: DataFrame,
                              groupCol: String = "lang",
                              scoreCol: String = "mean_centibits",
                              nBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    scored.join(broadcast(thresholds), groupCol)
      .withColumn("bucket",
        least(lit(nBuckets.toLong),
          size(filter(col("bucket_his"), h => h < col(scoreCol))).cast("long") + 1L))
      .withColumn("bucket_label",
        graft.pipeline.Curation.bucketLabel(col("bucket"), nBuckets))
      .drop("bucket_his")
  }

  /**
   * Cross-batch stateful streaming twin of
   * [[graft.pipeline.Dedup.dedupLines]]' first-occurrence DECISION
   * stream: emits one (doc_id, pos) row for every eligible line
   * occurrence that LOSES keeper selection — exactly the drop table the
   * batch splice consumes. State per line digest is the 12-byte keeper
   * (id, pos); eligibility (trimmed length ≥ minLen) matches the batch
   * op, so short/blank structural lines never enter state.
   *
   * ARRIVAL-ORDER CONTRACT (the [[minhashPairsStream]] lake-freshness
   * pattern): within a micro-batch the keeper is the (id, pos) minimum,
   * but ACROSS batches it is first-ARRIVAL. Stream drops equal the batch
   * op's drops exactly when files arrive in ascending doc-id order (then
   * arrival order and (id, pos) order coincide); out-of-order arrival
   * keeps every drop decision valid — a line whose digest is in state is
   * a duplicate either way — but attributes the kept copy to the earlier
   * ARRIVAL, not the smaller id. Document order, not a defect.
   *
   * Scale shape: state is one (id, pos) pair per DISTINCT eligible line
   * digest — the same cardinality as the [[graft.pipeline.Dedup.writeLineIndex]]
   * artifact, streamed instead of persisted; per batch, each digest
   * group ships its occurrences only.
   */
  def dedupLinesStream(docs: DataFrame, minLen: Int = 10,
                       sep: String = "\n"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(minLen >= 1, "minLen must be positive")
    firstOccurrenceDrops(docs
      .select(col("doc_id").cast("long").as("id"),
        posexplode(split(col("text"), sep)).as(Seq("pos", "ln")))
      .filter(length(trim(col("ln"))) >= minLen)
      .select(md5(col("ln")).as("dg"), col("id"), col("pos")))
  }

  /**
   * Cross-batch streaming DECISION twin of
   * [[graft.pipeline.Dedup.dedupSentenceSpans]] (the C4 three-sentence
   * rule): emits one (doc_id, pos) row per span START that loses global
   * first-occurrence selection — downstream expands each start to its
   * `spanLen` covered sentences and splices, exactly the batch op's
   * coverage-union. State per distinct span digest is the 12-byte
   * keeper. Same arrival-order contract as [[dedupLinesStream]].
   */
  def sentenceSpanDropsStream(docs: DataFrame, spanLen: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    require(spanLen >= 2, "spanLen must be at least 2")
    val pieces = regexp_extract_all(col("text"),
      lit("[^.!?]*[.!?]+|[^.!?]+$"), lit(0))
    val spans = docs
      .select(col("doc_id").cast("long").as("id"), pieces.as("ps"))
      .select(col("id"),
        when(size(col("ps")) >= spanLen,
          transform(sequence(lit(0), size(col("ps")) - spanLen),
            p => md5(array_join(
              transform(slice(col("ps"), p + 1, lit(spanLen)), x => trim(x)),
              "\u001F"))))
          .otherwise(array().cast("array<string>")).as("spans"))
      .select(col("id"), posexplode(col("spans")).as(Seq("pos", "dg")))
    firstOccurrenceDrops(spans.select(col("dg"), col("id"), col("pos")))
  }

  /** Shared cross-batch first-occurrence core: input (dg, id, pos)
    * occurrence stream; GroupState per digest holds the keeper (id, pos);
    * emits every losing occurrence. Within a batch the keeper is the
    * (id, pos) minimum; across batches it is first arrival. A redelivered
    * copy of the keeper's OWN row (reprocessed file, checkpoint rebuild)
    * is filtered against the stored keeper, never emitted as a drop of
    * itself — dropping the last surviving copy downstream is the one
    * unrecoverable failure mode. State is one (long, int) per distinct
    * digest under NoTimeout: unbounded over an unbounded digest stream by
    * design (first-occurrence semantics NEED every digest forever); bound
    * the run, or compact via the batch [[graft.pipeline.Dedup]] paths,
    * when the digest universe outgrows executor state. */
  private def firstOccurrenceDrops(occurrences: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = occurrences.sparkSession
    import spark.implicits._
    occurrences.as[(String, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, Int)],
         state: GroupState[(Long, Int)]) =>
          val occs = rows.map(t => (t._2, t._3)).toArray
          if (state.exists) {
            val keep = state.get
            occs.iterator.filterNot(_ == keep)
          } else {
            val keep = occs.min
            state.update(keep)
            occs.iterator.filterNot(_ == keep)
          }
      }
      .toDF("doc_id", "pos")
  }

  /**
   * Streaming twin of [[graft.pipeline.Dedup.hash64Pairs]] — live media
   * near-dup detection as fingerprints land: per (group, chunk-pos,
   * chunk-value) band bucket, GroupState holds the fingerprints seen so
   * far (capped at `maxBucket`, the batch cap contract), and each
   * arriving fingerprint emits its exact-popcount-verified pairs
   * against every EARLIER arrival in the bucket — so pairs span
   * micro-batches. Banding follows `maxHamming` exactly as the batch op
   * (4×16-bit ≤ 3, 8×8-bit 4–7). A pair colliding in several chunks is
   * emitted once per chunk — collapse downstream exactly as the batch
   * op's dropDuplicates does; with caps unhit, the deduped union over
   * any file sequence equals the batch operator on the union of those
   * files (pinned by test). Input rows: (idCol, groupCol, h0, h1) —
   * e.g. a [[graft.pipeline.Multimodal.perceptualHashes]]-shaped
   * stream; the heavy media bytes stay in the upstream fingerprint
   * scan, state is 24 B per seen fingerprint per band.
   */
  def hash64PairsStream(hashes: DataFrame, idCol: String = "media_id",
                        groupCol: String = "format", maxHamming: Int = 3,
                        maxBucket: Int = 10000): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(maxHamming >= 0 && maxHamming <= 7,
      "chunked pigeonhole bound holds for maxHamming <= 7")
    val spark = hashes.sparkSession
    import spark.implicits._
    hashes
      .select(col(idCol).cast("long").as("id"), col(groupCol).as("grp"),
        col("h0").cast("long"), col("h1").cast("long"))
      .select(col("id"), col("grp"), col("h0"), col("h1"),
        posexplode(array(Dedup.hash64Chunks(col("h0"), col("h1"), maxHamming): _*)))
      // null-safe group key: concat_ws SKIPS nulls, so a null group would
      // collapse to "pos_val" and could collide with a real group's key —
      // the batch op's groupBy treats null groups as one bucket, mirrored
      // here with an explicit sentinel (null fingerprints never pair on
      // either path: their XOR popcount is null)
      .select(concat_ws("_", coalesce(col("grp").cast("string"), lit("\u0000")),
          col("pos"), col("col")).as("bucket"),
        col("id"), col("h0"), col("h1"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, Long, Long)],
         state: GroupState[Seq[(Long, Long, Long)]]) =>
          val seen = state.getOption.getOrElse(Seq.empty).toBuffer
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          // id-ascending within the batch: the arrival-order convention of
          // the decision-twin family (deterministic under id-ordered files)
          rows.toArray.sortBy(_._2).foreach { case (_, id, h0, h1) =>
            seen.foreach { case (pid, p0, p1) =>
              if (pid != id) {
                val d = java.lang.Long.bitCount(p0 ^ h0) +
                  java.lang.Long.bitCount(p1 ^ h1)
                if (d <= maxHamming)
                  out += (if (pid < id) (pid, id, d.toLong)
                          else (id, pid, d.toLong))
              }
            }
            if (seen.length < maxBucket) seen += ((id, h0, h1))
          }
          state.update(seen.toSeq)
          out.iterator
      }
      .toDF("id_a", "id_b", "hamming")
  }
  /**
   * Streaming near-dup KEEP-LIST maintenance — the text family's
   * incremental twin of [[graft.pipeline.Dedup.textKeepList]], in the
   * new-batch-vs-index probe shape of
   * [[graft.pipeline.Dedup.hash64AgainstIndex]]: per micro-batch,
   *
   *   1. batch-internal near-dup pairs (the batch op unchanged on the
   *      small batch),
   *   2. batch-vs-corpus pairs via the PERSISTED chunk-sorted minhash
   *      index ([[graft.pipeline.Dedup.dedupAgainstIndex]] — the corpus
   *      text is never re-signed, its index rows prune by key),
   *   3. [[graft.pipeline.Dedup.clustersIncremental]] folds the delta into
   *      the persisted labeling (only touched components re-solve),
   *   4. the batch appends to the corpus store and the index.
   *
   * State lives under `workDir` (labels, index, corpus, checkpoint) — the
   * lake layout, not executor memory: a 100 TB corpus is fingerprinted
   * once and each arriving file pays batch-sized work. Read the keep-list
   * at any time with [[textKeepListResult]]; with bucket caps unhit, after
   * processing any file sequence it equals
   * [[graft.pipeline.Dedup.textKeepList]] over the union of those files
   * (pinned by the split-file spec) — the family twin contract.
   */
  def textKeepListStream(docs: DataFrame, workDir: String,
                         idCol: String = "doc_id", textCol: String = "text",
                         scoreCol: String = "n_chars",
                         numHashes: Int = 64, bands: Int = 16,
                         shingle: Int = 5, threshold: Double = 0.8,
                         maxBucket: Int = 1000)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    val idxDir = s"$workDir/index"
    val corpusDir = s"$workDir/corpus"
    val labelsDir = s"$workDir/labels"
    docs.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // truncate lineage once: the batch feeds the pair probe, the index
        // append, and the corpus append
        val b = batch
          .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"),
            col(scoreCol).cast("long").as("score"))
          .filter(col("text").isNotNull)
          .localCheckpoint(true)
        val fs = new java.io.File(corpusDir)
        val internal = Dedup.minhashLshPairs(b, "doc_id", "text",
            numHashes, bands, shingle, threshold, maxBucket)
          .select(col("id_a"), col("id_b"))
        val pairs =
          if (fs.exists()) {
            val corpus = spark.read.parquet(corpusDir)
            Dedup.dedupAgainstIndex(spark, idxDir, b, corpus, "doc_id", "text",
                numHashes, bands, shingle, threshold)
              .select(col("new_id").as("id_a"), col("corpus_id").as("id_b"))
              .unionByName(internal)
          } else internal
        val prior =
          if (new java.io.File(labelsDir).exists()) spark.read.parquet(labelsDir)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("cluster",
                org.apache.spark.sql.types.LongType))))
        // localCheckpoint BEFORE the overwrite: the new labeling reads the
        // directory it is about to replace
        val next = Dedup.clustersIncremental(prior, pairs).localCheckpoint(true)
        next.write.mode("overwrite").parquet(labelsDir)
        Dedup.writeMinhashIndex(b, idxDir, "doc_id", "text",
          numHashes, bands, shingle, mode = "append")
        b.write.mode("append").parquet(corpusDir)
        ()
      }
      .start()
  }

  /** The keep-list of everything [[textKeepListStream]] has absorbed so
    * far: persisted labels + corpus scores through the batch keeper tail
    * ([[graft.pipeline.Dedup.keepListFromLabels]] — identical keeper and
    * singleton-restore semantics). */
  def textKeepListResult(spark: SparkSession, workDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Dedup.keepListFromLabels(
      spark.read.parquet(s"$workDir/labels"),
      spark.read.parquet(s"$workDir/corpus")
        .select(col("doc_id"), col("score")),
      "doc_id", "score")
  }

}
