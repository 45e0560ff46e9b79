package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force differential + guard semantics for pairwise association
  * rules. */
class MarketBasketSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long)], minSupport: Long,
                    maxBasketSize: Int)
      : Set[(Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val items = rows.distinct
      .groupBy(_._1).filter(_._2.size <= maxBasketSize)
    val n = items.size.toLong
    val cnt = items.values.flatten.toSeq.groupBy(_._2)
      .map { case (i, v) => i -> v.size.toLong }
    val pairs = items.values.toSeq.flatMap { is =>
      val s = is.map(_._2).sorted
      for (a <- s; b <- s if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= minSupport)
    pairs.map { case ((a, b), nab) =>
      (a, b, nab, cnt(a), cnt(b), nab * 1000 / cnt(a), nab * 1000 / cnt(b),
        nab * n * 1000 / (cnt(a) * cnt(b)))
    }.toSet
  }

  test("pairRules == brute force across seeds (dup lines collapse)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 19)
      // duplicates included deliberately: support must count baskets
      val rows = (0 until 800).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(25).toLong))
      val got = MarketBasket.pairRules(rows.toDF("b", "i"), "b", "i",
        minSupport = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toSet
      assert(got == brute(rows, 2, 1000), s"seed $seed")
    }
  }

  test("minSupport 1 keeps every pair; higher thresholds nest") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 400).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(15).toLong))
    val df = rows.toDF("b", "i")
    def keys(ms: Long) = MarketBasket.pairRules(df, "b", "i", ms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val k1 = keys(1); val k2 = keys(2); val k3 = keys(3)
    assert(k1 == brute(rows, 1, 1000).map(t => (t._1, t._2)))
    assert(k3.subsetOf(k2) && k2.subsetOf(k1))
  }

  test("mega-baskets are dropped and leave the basket denominator") {
    val normal = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    val mega = (0 until 50).map(i => (9L, 100L + i))
    val out = MarketBasket.pairRules((normal ++ mega).toDF("b", "i"),
      "b", "i", minSupport = 2, maxBasketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(7)))
    // only the (10, 11) pair survives; N = 2 baskets after the drop,
    // so lift = 2*2*1000/(2*2) = 1000 — a mega-basket left in the
    // denominator would read 2*3*1000/(2*2) = 1500
    assert(out.toSeq == Seq((10L, 11L, 2L, 1000L)))
  }

  test("pairRules is partition-invariant") {
    val rnd = new scala.util.Random(8)
    val rows = (0 until 600).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(20).toLong))
    val df = rows.toDF("b", "i")
    val a = MarketBasket.pairRules(df, "b", "i", 2).collect().map(_.toSeq).toSet
    val b = MarketBasket.pairRules(df.repartition(13), "b", "i", 2)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  /** Brute 3-itemset top-k: all within-basket triples, support filter,
    * (support DESC, a, b, c ASC) cut, sub-pair confidences. */
  private def bruteTriples(rows: Seq[(Long, Long)], minSupport: Long,
                           maxBasketSize: Int, topK: Int)
      : Seq[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val items = rows.distinct
      .groupBy(_._1).filter(_._2.size <= maxBasketSize)
    val pairs = items.values.toSeq.flatMap { is =>
      val s = is.map(_._2).sorted
      for (a <- s; b <- s if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val triples = items.values.toSeq.flatMap { is =>
      val s = is.map(_._2).sorted
      for (a <- s; b <- s if a < b; cc <- s if b < cc) yield (a, b, cc)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= minSupport).toSeq
      .sortBy { case ((a, b, cc), n) => (-n, a, b, cc) }
      .take(topK)
    triples.map { case ((a, b, cc), n) =>
      val (ab, ac, bc) = (pairs((a, b)), pairs((a, cc)), pairs((b, cc)))
      (a, b, cc, n, ab, ac, bc, n * 1000 / ab, n * 1000 / ac, n * 1000 / bc)
    }
  }

  test("tripleRules == brute force across seeds; top-k cut binds") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 41)
      // small item domain → dense co-occurrence so triples genuinely repeat
      val rows = (0 until 900).map(_ =>
        (rnd.nextInt(50).toLong, rnd.nextInt(12).toLong))
      val want = bruteTriples(rows, 2, 1000, 25)
      assert(want.size == 25, s"seed $seed: cut must bind for the test to bite")
      val got = MarketBasket.tripleRules(rows.toDF("b", "i"), "b", "i",
        minSupport = 2, topK = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8), r.getLong(9))).toSet
      assert(got == want.toSet, s"seed $seed")
    }
  }

  test("tripleRules is partition-invariant") {
    val rnd = new scala.util.Random(14)
    val rows = (0 until 700).map(_ =>
      (rnd.nextInt(45).toLong, rnd.nextInt(11).toLong))
    val df = rows.toDF("b", "i")
    val a = MarketBasket.tripleRules(df, "b", "i", 2, topK = 40)
      .collect().map(_.toSeq).toSet
    val b = MarketBasket.tripleRules(df.repartition(13), "b", "i", 2, topK = 40)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("tripleRules: Apriori monotonicity holds on every emitted rule") {
    val rnd = new scala.util.Random(6)
    val rows = (0 until 700).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(10).toLong))
    val out = MarketBasket.tripleRules(rows.toDF("b", "i"), "b", "i",
      minSupport = 3, topK = 1000).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(3)
      assert(n >= 3 && r.getLong(4) >= n && r.getLong(5) >= n && r.getLong(6) >= n,
        s"sub-pair support below triple support in $r")
    }
  }
}
