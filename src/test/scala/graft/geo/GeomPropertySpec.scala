package graft.geo

import graft.geo.Geom._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the geometry layer. Coordinates are small integers
 * rendered as doubles, so every on-geometry predicate below is exact IEEE
 * arithmetic (integer-valued doubles add/multiply exactly in this range) —
 * the properties test semantics, not float luck.
 */
class GeomPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val coord: Gen[Int] = Gen.choose(-50, 50)
  private val pt: Gen[Pt] = for { x <- coord; y <- coord } yield Pt(x.toDouble, y.toDouble)

  private val pointGen: Gen[Geometry] = pt.map(Point.apply)
  private val multiPointGen: Gen[Geometry] =
    Gen.nonEmptyListOf(pt).map(ps => MultiPoint(ps.distinct.toIndexedSeq))
  private val lineGen: Gen[LineString] = for {
    ps <- Gen.listOfN(4, pt)
    if ps.distinct.size >= 2
  } yield LineString(ps.toIndexedSeq)
  private val rectGen: Gen[Polygon] = for {
    x0 <- Gen.choose(-50, 40); y0 <- Gen.choose(-50, 40)
    w <- Gen.choose(1, 10); h <- Gen.choose(1, 10)
  } yield Polygon(IndexedSeq(Pt(x0, y0), Pt(x0, y0 + h), Pt(x0 + w, y0 + h), Pt(x0 + w, y0)))
  private val geomGen: Gen[Geometry] = Gen.oneOf(
    pointGen, multiPointGen, lineGen.map(identity[Geometry]),
    rectGen.map(identity[Geometry]),
    Gen.listOfN(2, Gen.oneOf(pointGen, lineGen.map(identity[Geometry]), rectGen.map(identity[Geometry])))
      .map(gs => GeometryCollection(gs.toIndexedSeq)))

  test("toWkt/parseWkt round-trips every geometry type") {
    check(forAll(geomGen) { g => parseWkt(toWkt(g)) == g })
  }

  test("covers agrees with the definition on defining vertices") {
    // every defining vertex is ON the geometry, hence covered
    check(forAll(geomGen) { g =>
      g.exteriorPoints.forall(p => g.covers(p.x, p.y))
    })
  }

  test("covers is translation-invariant on the integer grid") {
    val shift: Gen[(Int, Int)] = for { dx <- coord; dy <- coord } yield (dx, dy)
    def translate(g: Geometry, dx: Double, dy: Double): Geometry = g match {
      case Point(p) => Point(Pt(p.x + dx, p.y + dy))
      case MultiPoint(ps) => MultiPoint(ps.map(p => Pt(p.x + dx, p.y + dy)))
      case LineString(ps) => LineString(ps.map(p => Pt(p.x + dx, p.y + dy)))
      case MultiLineString(ls) =>
        MultiLineString(ls.map(l => LineString(l.pts.map(p => Pt(p.x + dx, p.y + dy)))))
      case Polygon(r, hs) => Polygon(r.map(p => Pt(p.x + dx, p.y + dy)),
        hs.map(_.map(p => Pt(p.x + dx, p.y + dy))))
      case MultiPolygon(ps) =>
        MultiPolygon(ps.map(p => translate(p, dx, dy).asInstanceOf[Polygon]))
      case GeometryCollection(gs) => GeometryCollection(gs.map(translate(_, dx, dy)))
    }
    check(forAll(geomGen, pt, shift) { (g, q, s) =>
      val (dx, dy) = s
      g.covers(q.x, q.y) == translate(g, dx.toDouble, dy.toDouble)
        .covers(q.x + dx, q.y + dy)
    })
  }

  test("LineString covers exactly the points on its segments (integer probe grid)") {
    // brute-force reference: a point is on segment (a,b) iff collinear and
    // within bounds — checked in exact integer arithmetic
    def onSegInt(ax: Int, ay: Int, bx: Int, by: Int, px: Int, py: Int): Boolean = {
      val cross = (bx - ax).toLong * (py - ay) - (by - ay).toLong * (px - ax)
      cross == 0 &&
        px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
        py >= math.min(ay, by) && py <= math.max(ay, by)
    }
    check(forAll(lineGen, pt) { (l, q) =>
      val want = l.pts.sliding(2).exists { s =>
        onSegInt(s(0).x.toInt, s(0).y.toInt, s(1).x.toInt, s(1).y.toInt,
          q.x.toInt, q.y.toInt)
      }
      l.covers(q.x, q.y) == want
    })
  }

  test("Polygon covers == independent winding-number oracle on star polygons") {
    // star-shaped simple polygons (sort integer offsets by angle around a
    // center): possibly concave, never self-intersecting — where even-odd
    // ray casting is most at risk. The oracle is a from-scratch winding
    // number + exact integer on-boundary test; for simple polygons the two
    // definitions must agree everywhere.
    val starGen: Gen[IndexedSeq[Pt]] = for {
      cx <- Gen.choose(-20, 20); cy <- Gen.choose(-20, 20)
      n <- Gen.choose(3, 8)
      offs <- Gen.listOfN(n * 3, for {
        dx <- Gen.choose(-12, 12); dy <- Gen.choose(-12, 12)
        if dx != 0 || dy != 0
      } yield (dx, dy))
    } yield {
      val byAngle = offs.distinct
        .groupBy { case (dx, dy) => math.atan2(dy.toDouble, dx.toDouble) }
        .map(_._2.head).toSeq
        .sortBy { case (dx, dy) => math.atan2(dy.toDouble, dx.toDouble) }
      byAngle.map { case (dx, dy) => Pt(cx + dx.toDouble, cy + dy.toDouble) }
        .toIndexedSeq
    }
    def cross(a: Pt, b: Pt, px: Long, py: Long): Long =
      (b.x.toLong - a.x.toLong) * (py - a.y.toLong) -
        (b.y.toLong - a.y.toLong) * (px - a.x.toLong)
    def onSegInt(a: Pt, b: Pt, px: Long, py: Long): Boolean =
      cross(a, b, px, py) == 0 &&
        px >= math.min(a.x, b.x).toLong && px <= math.max(a.x, b.x).toLong &&
        py >= math.min(a.y, b.y).toLong && py <= math.max(a.y, b.y).toLong
    def refCovers(ring: IndexedSeq[Pt], px: Long, py: Long): Boolean = {
      val edges = (ring :+ ring.head).sliding(2).map(s => (s(0), s(1))).toSeq
      if (edges.exists { case (a, b) => onSegInt(a, b, px, py) }) return true
      var wn = 0
      edges.foreach { case (a, b) =>
        if (a.y.toLong <= py) {
          if (b.y.toLong > py && cross(a, b, px, py) > 0) wn += 1
        } else if (b.y.toLong <= py && cross(a, b, px, py) < 0) wn -= 1
      }
      wn != 0
    }
    val probe: Gen[(Int, Int)] = for {
      x <- Gen.choose(-35, 35); y <- Gen.choose(-35, 35)
    } yield (x, y)
    check(forAll(starGen.suchThat(_.length >= 3), probe) { (ring, q) =>
      val (qx, qy) = q
      Polygon(ring).covers(qx.toDouble, qy.toDouble) ==
        refCovers(ring, qx.toLong, qy.toLong)
    })
  }

  test("geohash cells are half-open: encode lands in decodeBbox with strict east/north") {
    // the exact semantic the pruning planner's cellsEncodeCover relies on
    val coordD: Gen[Double] = Gen.oneOf(
      Gen.choose(-179.0, 179.0),
      Gen.choose(-64, 64).map(_ / 2.0), // cell-edge-rich dyadic values
      Gen.oneOf(-180.0, 0.0, 45.0, 90.0, -90.0))
    val prec: Gen[Int] = Gen.choose(1, 9)
    check(forAll(coordD, coordD, prec) { (lon0, lat0, p) =>
      val lon = math.max(-180.0, math.min(180.0, lon0))
      val lat = math.max(-90.0, math.min(90.0, lat0 / 2)) // keep |lat| <= 90
      val h = Geohash.encode(lat, lon, p)
      val (latLo, latHi, lonLo, lonHi) = Geohash.decodeBbox(h)
      lon >= lonLo && lat >= latLo &&
        (lon < lonHi || lonHi >= 180.0) && (lat < latHi || latHi >= 90.0)
    })
  }

  test("prefix pruning is sound: covered points stay inside returned prefixes") {
    // scale coords into a small lon/lat window so geohash precision stays
    // meaningful; soundness = any covered probe's geohash extends a prefix
    val smallGeom: Gen[Geometry] = Gen.oneOf(
      pointGen, multiPointGen, lineGen.map(identity[Geometry]), rectGen.map(identity[Geometry]))
    check(Prop.forAll(smallGeom) { g0 =>
      def shrink(g: Geometry): Geometry = g match {
        case Point(p) => Point(Pt(p.x / 10, p.y / 10))
        case MultiPoint(ps) => MultiPoint(ps.map(p => Pt(p.x / 10, p.y / 10)))
        case LineString(ps) => LineString(ps.map(p => Pt(p.x / 10, p.y / 10)))
        case Polygon(r, hs) => Polygon(r.map(p => Pt(p.x / 10, p.y / 10)),
          hs.map(_.map(p => Pt(p.x / 10, p.y / 10))))
        case other => other
      }
      val g = shrink(g0)
      GeohashPruning.minimumBoundingPrefixes(g) match {
        case None => true // full-scan fallback is always sound
        case Some(prefixes) =>
          g.exteriorPoints.forall { p =>
            val h = Geohash.encode(p.y, p.x, 12)
            prefixes.exists(h.startsWith)
          }
      }
    })
  }
}
