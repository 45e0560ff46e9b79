package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Reciprocal-rank fusion: hand-computed formula replay and the
  * union/absence semantics. */
class EvaluationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("rrfFuse == hand formula over two lists with partial overlap") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val b = Seq((12L, 1L), (10L, 2L), (13L, 3L)).toDF("doc_id", "rank")
    val got = Evaluation.rrfFuse(Seq(a, b))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def f(r: Long) = 1000000L / (60 + r)
    assert(got == Map(
      10L -> (2L, f(1) + f(2)),
      11L -> (1L, f(2)),
      12L -> (2L, f(3) + f(1)),
      13L -> (1L, f(3))))
  }

  test("rrfFuse single list is a pure rank transform; kConst shifts") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val got = Evaluation.rrfFuse(Seq(a), kConst = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 500000L))
    intercept[IllegalArgumentException](Evaluation.rrfFuse(Seq.empty))
    intercept[IllegalArgumentException](Evaluation.rrfFuse(Seq(a), kConst = -1))
  }

  test("rrfFuse order: consensus docs outrank single-list toppers at depth") {
    // doc 5 is rank 3 in BOTH lists; doc 9 is rank 1 in one list only —
    // with k=60, 2/(60+3) > 1/(60+1): agreement wins, the RRF property
    val a = Seq((9L, 1L), (7L, 2L), (5L, 3L)).toDF("doc_id", "rank")
    val b = Seq((8L, 1L), (6L, 2L), (5L, 3L)).toDF("doc_id", "rank")
    val scores = Evaluation.rrfFuse(Seq(a, b))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(5L) > scores(9L))
  }

  test("E2E retrieval chain: BM25 -> SQ8 sims -> MMR diversify -> eval") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    // 1. lexical retrieval: BM25 top-20, rank via the gate's window idiom
    val bm = TextAnalysis.bm25(docs, Seq("merge", "window", "table"), topN = 20)
    val ranked = bm.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("bm25").desc, col("doc_id").asc)))
    // 2. integer relevance from rank (MMR scores must be integer);
    //    pairwise similarity = exact SQ8 code dots of the candidates
    val cands = ranked.select(lit(0L).as("qid"), col("doc_id").as("id"),
      (lit(21L) - col("rank")).as("rel"))
    val codes = Similarity.sq8Encode(embs).select(col("vec_id").as("id"),
      col("sq_codes"))
    val cc = cands.select(col("qid"), col("id")).join(codes, Seq("id"))
    val sims = cc.as("x").join(cc.as("y"),
        col("x.qid") === col("y.qid") && col("x.id") < col("y.id"))
      .select(col("x.qid").as("qid"), col("x.id").as("a"), col("y.id").as("b"),
        Similarity.intDot(col("x.sq_codes"), col("y.sq_codes")).as("sim"))
    // 3. MMR diversify to 8
    val mmr = Similarity.mmrRerank(cands, sims, k = 8, lambdaPermille = 600)
    val picked = mmr.collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(picked.length == 8 && picked.map(_._2).sorted.toSeq == (1L to 8L))
    val candSet = cands.select("id").collect().map(_.getLong(0)).toSet
    assert(picked.map(_._1).toSet.subsetOf(candSet))
    // rank 1 of MMR == BM25 rank 1 (pure relevance before any penalty)
    val top1 = ranked.filter(col("rank") === 1).head().getAs[Long]("doc_id")
    assert(picked.find(_._2 == 1L).get._1 == top1)
    // 4. diversification property: the MMR pick's mean pairwise sim is
    //    <= the pure-relevance top-8's (ties allowed)
    def meanPairSim(ids: Set[Long]): Double = {
      val rows = sims.filter(col("a").isin(ids.toSeq: _*) &&
        col("b").isin(ids.toSeq: _*)).select("sim")
        .collect().map(_.getLong(0))
      if (rows.isEmpty) 0.0 else rows.sum.toDouble / rows.length
    }
    val pureTop8 = ranked.filter(col("rank") <= 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(meanPairSim(picked.map(_._1).toSet) <= meanPairSim(pureTop8))
    // 5. evaluation composes: recall of the diversified 8 against the
    //    BM25 top-20 truth is exactly 8/20
    val ev = Evaluation.retrievalEval(
      mmr.select(col("id").as("doc_id"), col("rank")),
      ranked.select("doc_id")).head()
    assert(ev.getAs[Long]("n_retrieved") == 8L &&
      ev.getAs[Long]("n_relevant") == 20L &&
      ev.getAs[Long]("n_hits") == 8L &&
      ev.getAs[Long]("recall_permille") == 400L &&
      ev.getAs[Long]("first_rel_rank") == 1L)
  }

  test("binaryEvalGrouped: each group equals its own single-group binaryEval") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 400).map { i =>
      val s = rnd.nextInt(100).toLong
      (i % 3L, if (s + rnd.nextInt(40) > 80) 1L else 0L, s)
    }
    val df = rows.toDF("g", "y", "s")
    val grouped = Evaluation.binaryEvalGrouped(df, Seq("g"), "y", "s", threshold = 50)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    for (g <- 0L to 2L) {
      val solo = Evaluation.binaryEval(df.filter($"g" === g), "y", "s", threshold = 50)
        .head.toSeq
      assert(grouped(g) == solo, s"group $g diverges from its solo eval")
    }
    // the ungrouped path is unchanged by the refactor (golden tie fixture
    // lives in PipelineSpec; here just shape + totals)
    val all = Evaluation.binaryEval(df, "y", "s", threshold = 50).head
    assert(all.getAs[Long]("n") == 400L)
  }

  test("calibrationBinsQuantile: brute replay, near-equal masses, tie merging") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (0 until 500).map(i => (if (rnd.nextInt(100) < 30) 1L else 0L,
      (rnd.nextGaussian() * 1000).toLong))
    val df = rows.toDF("y", "s")
    val bins = 10
    val got = Evaluation.calibrationBinsQuantile(df, "y", "s", bins)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // brute: exact rank edges + strictly-greater edge count
    val n = rows.size
    val sorted = rows.map(_._2).sorted
    val edges = (1 until bins).map(i => sorted(((i * n + bins - 1) / bins - 1).toInt))
    val brute = rows.groupBy { case (_, s) => edges.count(s > _).toLong }
      .map { case (b, rs) =>
        b -> (rs.size.toLong, rs.map(_._1).sum,
          rs.map(_._1).sum * 1000 / rs.size, rs.map(_._2).sum / rs.size)
      }
    assert(got == brute)
    // continuous-ish scores → every bin within 2x of the ideal mass
    assert(got.size == bins)
    got.values.foreach { case (cnt, _, _, _) =>
      assert(cnt >= n / bins / 2 && cnt <= n / bins * 2, s"starved bin: $cnt") }
    // heavy ties: one dominant score merges bins (fewer than `bins` rows,
    // masses still partition n)
    val tied = ((0 until 300).map(_ => (0L, 7L)) ++
      (0 until 50).map(i => (1L, 100L + i))).toDF("y", "s")
    val tb = Evaluation.calibrationBinsQuantile(tied, "y", "s", bins)
      .collect().map(r => r.getLong(1)).sum
    assert(tb == 350L)
  }

  test("classBalance: hand Gini values, single-class zero, balanced limit") {
    import spark.implicits._
    val rows = Seq.fill(50)(("a", "en")) ++ Seq.fill(50)(("a", "fr")) ++ // balanced 2
      Seq.fill(100)(("b", "en")) ++                                     // single class
      Seq.fill(90)(("c", "en")) ++ Seq.fill(10)(("c", "fr"))            // 90/10
    val r = Evaluation.classBalance(rows.toDF("g", "l"), Seq("g"), "l")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r("a") == ((100L, 2L, 500L, 500L)))   // 1 − 2·(1/2)² = 0.5
    assert(r("b") == ((100L, 1L, 1000L, 0L)))
    assert(r("c") == ((100L, 2L, 900L, 180L)))   // 1 − 0.81 − 0.01 = 0.18
    // null labels drop
    val withNull = (rows :+ (("a", null.asInstanceOf[String]))).toDF("g", "l")
    assert(Evaluation.classBalance(withNull, Seq("g"), "l")
      .filter($"g" === "a").head.getLong(1) == 100L)
  }

  test("rankCorrelation: hand values, ties, anti-correlation, guards") {
    import spark.implicits._
    // perfect monotone agreement → 1.0 (within isqrt flooring)
    val perfect = (1L to 20L).map(i => ("a", i, i * 10)).toDF("g", "x", "y")
    val p = Evaluation.rankCorrelation(perfect, Seq("g"), "x", "y").head
    assert(p.getAs[Long]("spearman_micro") >= 999999L)
    // perfect reversal → −1.0
    val rev = (1L to 20L).map(i => ("a", i, 100 - i)).toDF("g", "x", "y")
    val r = Evaluation.rankCorrelation(rev, Seq("g"), "x", "y").head
    assert(r.getAs[Long]("spearman_micro") <= -999999L)
    // brute Pearson-on-tie-averaged-ranks replay on random tied data
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map(_ => (s"g${rnd.nextInt(2)}",
      rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    def isqrt(v: Long): Long = { var s = math.sqrt(v.toDouble).toLong
      while (s * s > v) s -= 1; while ((s + 1) * (s + 1) <= v) s += 1; s }
    val brute = rows.groupBy(_._1).map { case (g, rs) =>
      def ranks2(vs: Seq[Long]): Seq[Long] = {
        val sorted = vs.sorted
        vs.map(v => 2L * (sorted.indexOf(v) + 1) + vs.count(_ == v) - 1)
      }
      val a = ranks2(rs.map(_._2)); val b = ranks2(rs.map(_._3))
      val n = rs.size.toLong
      val sa = a.sum; val sb = b.sum
      val sab = a.zip(b).map(t => t._1 * t._2).sum
      val saa = a.map(v => v * v).sum; val sbb = b.map(v => v * v).sum
      val den = math.max(isqrt(n * saa - sa * sa) * isqrt(n * sbb - sb * sb), 1L)
      g -> (1000000L * (n * sab - sa * sb) / den)
    }
    val got = Evaluation.rankCorrelation(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(got == brute)
    // constant column → 0 via the guarded denominator
    val const = (1L to 10L).map(i => ("c", 5L, i)).toDF("g", "x", "y")
    assert(Evaluation.rankCorrelation(const, Seq("g"), "x", "y")
      .head.getAs[Long]("spearman_micro") == 0L)
    // group-size cap throws loudly
    val big = (1L to 100L).map(i => ("z", i, i)).toDF("g", "x", "y")
    intercept[Exception](
      Evaluation.rankCorrelation(big, Seq("g"), "x", "y", maxGroupRows = 50L)
        .collect())
  }

  test("rankCorrelation sampling front-end: over-cap groups sample, under-cap identical") {
    import spark.implicits._
    // an over-cap group completes (no throw) with sampleIdCol, and the
    // result equals the brute statistic over the deterministic hash-order
    // sample — the smallest (md5(id), id) rows per group
    val rows = (0L until 100L).map(i => ("z", i, i * 3 % 17, i * 7 % 13))
    val df = rows.toDF("g", "id", "x", "y").repartition(5)
    val cap = 50L
    val got = Evaluation.rankCorrelation(df, Seq("g"), "x", "y",
      maxGroupRows = cap, sampleIdCol = Some("id")).head
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val sampleIds = rows.map(_._2).sortBy(i => (md5hex(i.toString), i))
      .take(cap.toInt).toSet
    val sampled = rows.filter(r => sampleIds(r._2)).map(r => ("z", r._3, r._4))
    val expect = Evaluation.rankCorrelation(
      sampled.toDF("g", "x", "y"), Seq("g"), "x", "y").head
    assert(got.getLong(1) == cap)
    assert(got.getLong(2) == expect.getLong(2))
    // under the cap the front-end is a strict no-op
    val small = (0L until 30L).map(i => ("s", i, i % 7, i % 5))
      .toDF("g", "id", "x", "y")
    val a = Evaluation.rankCorrelation(small, Seq("g"), "x", "y",
      sampleIdCol = Some("id")).head
    val b = Evaluation.rankCorrelation(small.drop("id"), Seq("g"), "x", "y").head
    assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2))
  }
}
