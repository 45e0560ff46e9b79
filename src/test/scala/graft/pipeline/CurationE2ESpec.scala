package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * End-to-end curation pipeline over the real corpus: the operators are
 * individually oracled; this suite pins that they COMPOSE — normalize →
 * exact-dedup drop → near-dup cluster drop → quality floor → train/val/
 * test split → BPE-budgeted packing — with the cross-operator invariants
 * a production pipeline relies on (no duplicate text survives, splits are
 * disjoint and leakage-free, packs respect the trained-tokenizer budget,
 * and the whole chain is deterministic end to end).
 */
class CurationE2ESpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  private def runPipeline() = {
    // 1. canonical text (NFC + lower + ws collapse) — dedup keys off this
    val normed = docs.withColumn("canon", TextAnalysis.normalizeText($"text"))
    // 2. exact dedup on the canonical text: keep min doc_id per group
    val keepExact = Dedup.exact(normed, "doc_id", Seq("canon"))
      .select($"keep_id".as("doc_id"))
    val afterExact = normed.join(keepExact, "doc_id")
    // 3. near-dup clusters over the survivors: drop non-representatives
    val pairs = Dedup.minhashLshPairs(afterExact.select($"doc_id", $"canon".as("text")),
      "doc_id", "text", threshold = 0.8, maxBucket = 100000)
    val dropNear = Dedup.clusters(pairs.select($"id_a", $"id_b"))
      .filter($"id" =!= $"cluster").select($"id".as("doc_id"))
    val afterNear = afterExact.join(dropNear, Seq("doc_id"), "left_anti")
    // 4. quality floor on the scored corpus
    val quality = TextAnalysis.withQualityScore(afterNear, "text")
      .filter($"quality_score" >= 0.3)
    // 5. leakage-free split, then 6. BPE-budgeted packing of the train band
    val split = Sampling.deterministicSplit(quality, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val merges = TextAnalysis.trainBpe(split.filter($"split" === "train"), numMerges = 100)
    val st = TextAnalysis.bpeState(spark, merges)
    val packed = TextAnalysis.packBudgeted(split.filter($"split" === "train"),
      groupCols = Seq("source"), budgetTokens = 256L,
      tokenCount = t => TextAnalysis.tokenCountBpe(t, st))
    (afterExact, afterNear, split, merges, packed)
  }

  test("curation chain: dedup/quality/split/pack invariants hold on the real corpus") {
    val (afterExact, afterNear, split, merges, packed) = runPipeline()

    // exact dedup: canonical texts unique afterwards, representatives are min ids
    val n = afterExact.count()
    assert(afterExact.select("canon").distinct().count() == n)
    assert(n <= docs.count()) // sf0.01 happens to have no exact dups; near-dups below do fire

    // near-dup drop keeps one representative per cluster: re-running the
    // pair search on survivors finds no pair of docs that BOTH survived a
    // cluster (pairs within a cluster all share the min-id representative)
    val survivorPairs = Dedup.minhashLshPairs(
      afterNear.select($"doc_id", $"canon".as("text")), "doc_id", "text",
      threshold = 0.8, maxBucket = 100000)
    assert(survivorPairs.count() == 0,
      "no near-duplicate pair may survive representative selection")

    // split: total, disjoint by construction; train is the large band
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == split.count())
    assert(Set("train", "val", "test").subsetOf(bySplit.keySet))
    assert(bySplit("train") > bySplit.getOrElse("val", 0L) &&
      bySplit("train") > bySplit.getOrElse("test", 0L))

    // packing: every pack's doc set is contiguous in doc_id order within
    // its source, and the exclusive-cumsum start of each pack is under
    // budget boundaries (pack_id = cum div budget exactly)
    val rows = packed.select($"source", $"doc_id", $"n_tokens", $"pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      var cum = 0L
      g.sortBy(_._2).foreach { case (_, _, nTok, packId) =>
        assert(packId == cum / 256L, "pack assignment must equal exclusive cumsum div budget")
        cum += nTok
      }
    }
    assert(merges.nonEmpty && rows.nonEmpty)
  }

  test("Curation.curate == the hand-built chain (API composes identically)") {
    val (_, _, split, _, _) = runPipeline()
    val api = Curation.curate(docs)
    assert(api.select($"doc_id", $"split").collect().map(_.toSeq).toSet ==
      split.select($"doc_id", $"split").collect().map(_.toSeq).toSet)
  }

  test("v2 chain: rules floor -> line dedup -> budget sample -> epochs compose") {
    // the round's new operators composed the way a production pipeline
    // would: Gopher rule floor (relaxed to the synthetic corpus), global
    // line dedup of shared boilerplate, per-source token budget, epoch mix
    val boiler = docs.withColumn("text",
      concat(lit("boilerplate header for every document here\n"), $"text"))
    val ruled = TextAnalysis.gopherRules(boiler, minWords = 10)
      .filter($"r_word_count" === 1L && $"r_mean_word_len" === 1L)
      .select("doc_id")
    val kept = boiler.join(ruled, "doc_id")
    val cleaned = Dedup.dedupLines(kept)
    // exactly one survivor carries the shared header line
    val carriers = cleaned.filter($"cleaned".contains("boilerplate header")).count()
    assert(carriers == 1L, s"header must survive exactly once, got $carriers")
    assert(cleaned.count() == kept.count(), "line dedup must not drop documents")
    // budget-sample the cleaned corpus (re-attach source), then epoch-mix
    val sampled = Sampling.sampleByTokenBudget(
      cleaned.join(docs.select("doc_id", "source"), "doc_id")
        .select($"doc_id", $"source", $"cleaned".as("text")),
      Map("src0" -> 1500L, "src1" -> 800L))
    val perSrc = sampled.groupBy("source").agg(sum("n_tokens").as("t"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // budget respected up to the conveyor overrun (one doc's tail)
    val maxDoc = sampled.agg(max("n_tokens")).head.getLong(0)
    assert(perSrc("src0")._1 < 1500L + maxDoc && perSrc("src1")._1 < 800L + maxDoc)
    val mixed = Sampling.mixWithEpochs(
      sampled.select($"doc_id", $"source"), Map("src0" -> 2.0, "src1" -> 1.5))
    val m = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("src0") == 2 * perSrc("src0")._2, "whole-epoch copies must be exact")
    assert(m("src1") >= perSrc("src1")._2 && m("src1") <= 2 * perSrc("src1")._2)
  }

  test("v3 chain: url dedup -> boilerplate -> classifier floor -> temperature -> token chunks") {
    // this round's operators composed as a crawl-side pipeline: page-level
    // URL dedup, line cleaning, model-scored floor, α-rebalance, windowing
    val st = TextAnalysis.bpeState(spark, graft.text.BpeFixture.merges)
    val clf = TextAnalysis.classifierState(spark,
      Array.tabulate(512)(i => (i % 9).toLong - 3L), bias = 0L)
    // plant colliding page URLs (several docs per page key) and a closed line
    val crawled = docs.filter($"text".isNotNull).withColumn("text",
      concat($"text", lit(".\nsee https://example.com/p"),
        pmod($"doc_id", lit(13)), lit("\nClick here")))
    val paged = graft.pipeline.Provenance.dedupByUrl(crawled)
    val pages = paged.filter($"kept" === 1L)
    // exactly one survivor per page key; URL-less docs impossible here
    assert(pages.count() == pages.select("url_key").distinct().count())
    val cleaned = TextAnalysis.removeBoilerplate(pages)
      .select($"doc_id", $"source", $"cleaned".as("text"))
    // the planted nav/url lines are gone, the closed prose line stays
    assert(cleaned.filter($"text".contains("Click here")).count() == 0L)
    assert(cleaned.filter(length($"text") > 0).count() > 0L)
    val scored = cleaned.withColumn("score",
      TextAnalysis.classifierScore(split(trim($"text"), "\\s+"), clf))
    val floored = scored.filter($"score" >= -50L)
    val rebalanced = Sampling.temperatureResample(floored, totalTarget = 60L)
    // quotas are exact: re-derive them from the floored counts
    val counts = floored.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wsum = counts.values.map(n => math.sqrt(n.toDouble).toLong).sum
    val got = rebalanced.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (g, n) =>
      val quota = math.min(n, 60L * math.sqrt(n.toDouble).toLong / wsum)
      assert(got.getOrElse(g, 0L) == quota, s"source $g: n=$n")
    }
    // window the survivors in real tokens; chunks rebuild their documents
    val chunks = TextAnalysis.chunkByTokens(rebalanced, st, maxTokens = 16L)
    val rebuilt = chunks.groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct($"chunk_idx", $"chunk")))
        .getField("chunk")).as("back"))
    val joined = rebalanced.join(rebuilt, "doc_id")
    assert(joined.filter($"back" =!= $"text").count() == 0L,
      "chunks must concatenate back to their documents")
  }

  test("v4 chain: snapshot refresh -> diff audit -> repetition filter -> ccnet buckets -> folds") {
    // 1. roll the corpus forward with a changeset, audit the churn
    val changes = docs.filter($"doc_id" % 9 === 0)
      .withColumn("text", concat($"text", lit(" refreshed crawl content")))
      .withColumn("op", lit("upsert"))
    val next = Snapshots.applyChanges(docs, changes, Seq("doc_id"))
    val audit = Snapshots.diff(docs, next, Seq("doc_id"), Seq("text"))
      .groupBy("change").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every change row is an upsert of an existing key → all 'changed'
    assert(audit == Map("changed" -> docs.filter($"doc_id" % 9 === 0).count()))
    // 2. repetition rules floor (the refreshed corpus is word soup → passes)
    val clean = next.join(
      TextAnalysis.repetitionRules(next).filter($"passes" === 1).select("doc_id"),
      "doc_id")
    // 3. CCNet buckets over the LM score; keep head + middle per language
    val st = TextAnalysis.lmStateFromVocab(TextAnalysis.zipfVocab(clean, "text", topV = 200))
    val toks = split(trim($"text"), "\\s+")
    val scored = clean.select($"doc_id", $"lang",
        size(toks).cast("long").as("n_tokens"),
        TextAnalysis.lmSurprisal(toks, st).as("sb"))
      .withColumn("mean_centibits", expr("(sb * 100) div n_tokens"))
    val bucketed = Curation.perplexityBuckets(scored)
    val kept = bucketed.filter($"bucket_label" =!= "tail")
    // ntile buckets are equal-frequency: head+middle keeps ~2/3 per language
    val perLang = bucketed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // NTILE gives the tail bucket exactly floor(n/3) rows
    perLang.foreach { case (l, n) =>
      assert(keptLang(l) == n - n / 3, s"lang $l: n=$n")
    }
    // 4. folds partition the survivors totally and stably
    val folds = Sampling.deterministicFolds(kept)
    assert(folds.filter($"fold" < 0 || $"fold" > 4).count() == 0)
    assert(folds.count() == kept.count())
    // chain determinism
    val again = Sampling.deterministicFolds(
      Curation.perplexityBuckets(scored).filter($"bucket_label" =!= "tail"))
    assert(again.select("doc_id", "fold").collect().map(_.toSeq).toSet ==
      folds.select("doc_id", "fold").collect().map(_.toSeq).toSet)
  }

  test("v5 chain: blocklist gate -> word-minhash clusters -> canonical keeper -> drift audit -> classifier eval") {
    // the round-10 operators composed the way a production refresh runs:
    // 1. page-level blocklist gate (C4 §2.2): drop any doc with a hit
    val bl = Curation.blocklistStats(docs, Seq("forbidden phrase", "spamword"))
    val clean = docs.join(bl.filter($"is_clean" === 1L).select("doc_id"), "doc_id")
    assert(clean.count() == docs.count(), "synthetic corpus has no bad words — gate must pass all")
    // 2. near-dup clusters on the PUBLISHED unit (13-word shingles @ 0.8)
    val pairs = Dedup.minhashLshPairsWords(clean, "doc_id", "text")
      .select($"id_a", $"id_b")
    val labels = Dedup.clusters(pairs)
    // 3. canonical keeper per cluster by length; survivors = keepers +
    //    every unclustered doc
    val canon = Dedup.clusterCanonical(labels, clean, "doc_id", "n_chars")
    val dropIds = canon.filter($"is_keeper" === 0L).select($"id".as("doc_id"))
    val survivors = clean.join(dropIds, Seq("doc_id"), "left_anti")
    val nClusters = labels.select("cluster").distinct().count()
    assert(survivors.count() == clean.count() - (labels.count() - nClusters),
      "each cluster must lose exactly (size - 1) members")
    // keepers are the longest member of each cluster (ties min id) —
    // spot-verify against a driver replica
    val replica = labels.join(clean.select($"doc_id".as("id"), $"n_chars"), "id")
      .collect().groupBy(_.getLong(1)).map { case (c, rows) =>
        c -> rows.map(r => (r.getLong(0), r.getLong(2))).minBy { case (id, len) => (-len, id) }._1
      }
    val keepers = canon.filter($"is_keeper" === 1L).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(keepers == replica)
    // 4. drift audit: survivors vs the raw corpus — dropping near-dups
    //    must not shift any token share by more than noise (< 10 permille)
    val drift = TextAnalysis.vocabDrift(docs, survivors, topK = 5, minCount = 5L)
      .collect().map(_.getLong(5))
    assert(drift.forall(d => math.abs(d) < 10L), drift.mkString(","))
    // 5. classifier eval over the survivors: the has-"slow" label against
    //    the n_chars score — AUC must replay identically across reruns
    val scored = survivors.select(
      when(array_contains(array_remove(split(lower(coalesce($"text", lit(""))),
        "[^a-z]+"), ""), "slow"), 1L).otherwise(0L).as("label"),
      $"n_chars".cast("long").as("score"))
    val e1 = Evaluation.binaryEval(scored, "label", "score", 300L).head().toSeq
    val e2 = Evaluation.binaryEval(scored, "label", "score", 300L).head().toSeq
    assert(e1 == e2)
    assert(e1.head.asInstanceOf[Long] == survivors.count())
  }

  test("curation chain is deterministic end to end") {
    val (_, _, s1, m1, p1) = runPipeline()
    val (_, _, s2, m2, p2) = runPipeline()
    assert(m1 == m2, "trained tokenizer must be a pure function of the corpus")
    assert(s1.select("doc_id", "split").collect().map(_.toSeq).toSet ==
      s2.select("doc_id", "split").collect().map(_.toSeq).toSet)
    assert(p1.collect().map(_.toSeq).toSet == p2.collect().map(_.toSeq).toSet)
  }
}
