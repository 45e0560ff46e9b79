package graft.api

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized differential for the spatial joins against a from-scratch
 * O(n·m) brute force — the same hunt that exposed the half-open
 * cell-edge pruning bug in round 6: point sets deliberately include
 * coordinates EXACTLY on geohash cell edges (dyadic grid multiples), at
 * the poles, and at the antimeridian, where the encode's `>= mid`
 * refinement rowkeys a point into the next cell and any 9-cell
 * neighborhood reasoning is most fragile.
 */
class SpatialJoinDifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // precision-2 cell dims: 11.25° lon × 5.625° lat — radius at/below these
  // selects p >= 2, so edge-aligned points at these multiples sit exactly
  // on cell boundaries
  private val cellW = 11.25
  private val cellH = 5.625

  private def pointSet(seed: Int, n: Int): Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val onGrid = rnd.nextInt(3) == 0
      val lon =
        if (onGrid) -180.0 + rnd.nextInt(64) * (cellW / 2)
        else -180.0 + rnd.nextDouble() * 360.0
      val lat =
        if (onGrid) -90.0 + rnd.nextInt(64) * (cellH / 2)
        else -90.0 + rnd.nextDouble() * 180.0
      (i.toLong, lon, lat)
    } ++ Seq( // corners of the domain: poles + antimeridian, exact
      (n + 0L, -180.0, -90.0), (n + 1L, 179.999, 89.999),
      (n + 2L, -180.0, 89.999), (n + 3L, 179.999, -90.0),
      (n + 4L, 0.0, 0.0), (n + 5L, -cellW, cellH))
  }

  private def bruteWithin(as: Seq[(Long, Double, Double)],
                          bs: Seq[(Long, Double, Double)],
                          r: Double): Set[(Long, Long)] =
    (for {
      (ai, alon, alat) <- as
      (bi, blon, blat) <- bs
      if (alon - blon) * (alon - blon) + (alat - blat) * (alat - blat) <= r * r
    } yield (ai, bi)).toSet

  test("distanceJoin == brute force incl. exact cell-edge points") {
    for (seed <- 1 to 4; r <- Seq(cellH, cellH / 2, cellW)) {
      val as = pointSet(seed, 120)
      val bs = pointSet(seed + 100, 140)
      val aDf = as.toDF("id", "lon", "lat")
      val bDf = bs.toDF("id", "lon", "lat")
      val got = SpatialJoin.distanceJoin(aDf, bDf, r)
        .select($"a_id", $"b_id")
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      val want = bruteWithin(as, bs, r)
      val missing = want -- got
      val extra = got -- want
      assert(missing.isEmpty && extra.isEmpty,
        s"seed $seed r $r missing=${missing.take(5)} extra=${extra.take(5)}")
    }
  }

  test("knnJoinAgg == brute KNN with (distance, id) tie order") {
    for (seed <- 5 to 7) {
      val as = pointSet(seed, 60)
      val bs = pointSet(seed + 50, 90)
      val r = cellH
      val k = 3
      val got = SpatialJoin.knnJoinAgg(
        as.toDF("id", "lon", "lat"), bs.toDF("id", "lon", "lat"),
        k, r, "id", "id")
        .collect().map(row => (row.getLong(0), row.getLong(1), row.getDouble(2)))
        .groupBy(_._1).map { case (a, v) =>
          a -> v.map(t => (t._3, t._2)).toSeq.sorted
        }
      val want = as.map { case (ai, alon, alat) =>
        val cand = bs.flatMap { case (bi, blon, blat) =>
          val d = math.sqrt((alon - blon) * (alon - blon) +
            (alat - blat) * (alat - blat))
          if (d <= r) Some((d, bi)) else None
        }.sorted.take(k)
        ai -> cand
      }.filter(_._2.nonEmpty).toMap
      assert(got.keySet == want.keySet, s"seed $seed key sets")
      want.foreach { case (a, cand) =>
        assert(got(a) == cand, s"seed $seed a=$a got=${got(a)} want=$cand")
      }
    }
  }
}
