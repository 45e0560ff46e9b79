package graft.api

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized differential for the as-of joins: plain and salted variants
 * must both equal a from-scratch brute force (latest right row with
 * rts <= lts per key; ties at equal ts resolve to the greatest right id)
 * on collision-rich data — duplicate timestamps on both sides, keys with
 * no right rows, and left rows earlier than every right row.
 */
class AsofDifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def bruteAsof(left: Seq[(Long, Long, Long)],
                        right: Seq[(Long, Long, Long, String)])
      : Map[Long, Option[String]] = {
    val byKey = right.groupBy(_._1)
    left.map { case (lid, k, lts) =>
      val m = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= lts)
        .sortBy(r => (r._2, r._3)) // (ts, rid) ascending; last = winner
        .lastOption
      lid -> m.map(_._4)
    }.toMap
  }

  private def runCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val left = (0 until 150).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(20).toLong))
    val right = (0 until 90).map(i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(20).toLong, i.toLong, s"p$i"))
    val want = bruteAsof(left, right)
    val wantInner = want.collect { case (lid, Some(p)) => lid -> p }

    val lDf = left.toDF("lid", "k", "ts")
    val rDf = right.toDF("k", "ts", "rid", "payload")

    val plain = AsofJoin.asofJoin(lDf, rDf, "k", "ts", "ts",
        Seq("payload"), "rid")
      .select($"lid", $"asof_payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(plain == wantInner, s"seed $seed plain inner")

    val outer = AsofJoin.asofJoin(lDf, rDf, "k", "ts", "ts",
        Seq("payload"), "rid", inner = false)
      .select($"lid", $"asof_payload").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(outer == want, s"seed $seed plain outer")

    val salted = AsofJoin.asofJoinSalted(lDf, rDf, "k", "ts", "ts",
        Seq("payload"), "rid", buckets = 4)
      .select($"lid", $"asof_payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(salted == wantInner, s"seed $seed salted inner")

    val saltedOuter = AsofJoin.asofJoinSalted(lDf, rDf, "k", "ts", "ts",
        Seq("payload"), "rid", inner = false, buckets = 4)
      .select($"lid", $"asof_payload").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(saltedOuter == want, s"seed $seed salted outer")
  }

  test("asofJoin and asofJoinSalted == brute force across seeds") {
    Seq(1, 2, 3).foreach(runCase)
  }

  test("asofJoinTolerance == brute force with a staleness bound across seeds") {
    def bruteTol(left: Seq[(Long, Long, Long)],
                 right: Seq[(Long, Long, Long, String)],
                 tol: Long): Map[Long, Option[String]] = {
      val byKey = right.groupBy(_._1)
      left.map { case (lid, k, lts) =>
        val m = byKey.getOrElse(k, Seq.empty)
          .filter(_._2 <= lts).sortBy(r => (r._2, r._3)).lastOption
          .filter(r => lts - r._2 <= tol) // the tolerance kills stale matches
        lid -> m.map(_._4)
      }.toMap
    }
    Seq(4, 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val left = (0 until 150).map(i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(20).toLong))
      val right = (0 until 90).map(i =>
        (rnd.nextInt(7).toLong, rnd.nextInt(20).toLong, i.toLong, s"p$i"))
      val lDf = left.toDF("lid", "k", "ts")
      val rDf = right.toDF("k", "ts", "rid", "payload")
      Seq(0L, 3L, 100L).foreach { tol => // 0 = exact-ts only; 100 ≈ unbounded
        val want = bruteTol(left, right, tol)
        val inner = AsofJoin.asofJoinTolerance(lDf, rDf, "k", "ts", "ts",
            Seq("payload"), "rid", toleranceTs = tol)
          .select($"lid", $"asof_payload").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(inner == want.collect { case (l, Some(p)) => l -> p },
          s"seed $seed tol $tol inner")
        val outer = AsofJoin.asofJoinTolerance(lDf, rDf, "k", "ts", "ts",
            Seq("payload"), "rid", toleranceTs = tol, inner = false)
          .select($"lid", $"asof_payload").collect()
          .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        assert(outer == want, s"seed $seed tol $tol outer")
      }
      // tol = unbounded must equal plain asofJoin exactly
      val plain = AsofJoin.asofJoin(lDf, rDf, "k", "ts", "ts", Seq("payload"), "rid")
        .select($"lid", $"asof_payload").collect().map(_.toSeq).toSet
      val loose = AsofJoin.asofJoinTolerance(lDf, rDf, "k", "ts", "ts",
          Seq("payload"), "rid", toleranceTs = Long.MaxValue)
        .select($"lid", $"asof_payload").collect().map(_.toSeq).toSet
      assert(plain == loose, s"seed $seed unbounded-tolerance parity")
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoinTolerance(Seq((1L, 1L, 1L)).toDF("lid", "k", "ts"),
        Seq((1L, 1L, 1L, "p")).toDF("k", "ts", "rid", "payload"),
        "k", "ts", "ts", Seq("payload"), "rid", toleranceTs = -1L)
    }
  }
}
