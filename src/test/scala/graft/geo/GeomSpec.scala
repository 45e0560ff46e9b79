package graft.geo

import graft.geo.Geom._
import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {

  private val square = parseWktPolygon("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")

  test("WKT parse strips closing repeat") {
    assert(square.ring.length == 4)
    assert(square.ring.head == Pt(0, 0))
  }

  test("covers: interior, exterior") {
    assert(square.covers(5, 5))
    assert(!square.covers(-0.001, 5))
    assert(!square.covers(5, 10.001))
  }

  test("covers is boundary-inclusive (JTS covers, not contains)") {
    // vertices
    assert(square.covers(0, 0) && square.covers(10, 10))
    // edge midpoints (incl. horizontal edges — ray-casting corner case)
    assert(square.covers(0, 5) && square.covers(10, 5))
    assert(square.covers(5, 0) && square.covers(5, 10))
  }

  test("covers: NaN coordinates rejected (WithinFilter.java:93-96 parity)") {
    assert(!square.covers(Double.NaN, 5))
    assert(!square.covers(5, Double.NaN))
  }

  test("reference boundary golden: rect over y=x line keeps 2 then 3 points") {
    // TestWithinFilter.java:108-135 — 10 points (i,i), i=1..10.
    val pts = (1 to 10).map(i => (i.toDouble, i.toDouble))
    val r1 = parseWktPolygon(
      "POLYGON ((0.0 0.0, 0.0 2.999, 2.999 2.999, 2.999 0.0, 0.0 0.0))")
    assert(pts.count { case (x, y) => r1.covers(x, y) } == 2)
    val r2 = parseWktPolygon(
      "POLYGON ((0.0 0.0, 0.0 3.0, 3.0 3.0, 3.0 0.0, 0.0 0.0))")
    assert(pts.count { case (x, y) => r2.covers(x, y) } == 3)
  }

  test("non-convex polygon covers") {
    // L-shape: unit notch removed from top-right
    val l = parseWktPolygon("POLYGON ((0 0, 0 2, 1 2, 1 1, 2 1, 2 0, 0 0))")
    assert(l.covers(0.5, 1.5))
    assert(!l.covers(1.5, 1.5)) // inside the notch
    assert(l.covers(1, 1.5))    // notch boundary
    assert(l.covers(1.5, 1))    // notch boundary
  }

  test("centroid of square") {
    val c = square.centroid
    assert(math.abs(c.x - 5) < 1e-12 && math.abs(c.y - 5) < 1e-12)
  }

  test("convex hull of grid points is its 4 corners") {
    val pts = for (i <- 0 to 3; j <- 0 to 3) yield Pt(i, j)
    val hull = convexHull(pts)
    assert(hull.ring.toSet == Set(Pt(0, 0), Pt(3, 0), Pt(3, 3), Pt(0, 3)))
    pts.foreach(p => assert(hull.covers(p.x, p.y)))
  }

  test("hull covers polygon iff all vertices inside") {
    val hull = convexHull(Seq(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4)))
    assert(hull.coversPolygon(parseWktPolygon("POLYGON ((1 1, 1 3, 3 3, 3 1, 1 1))")))
    assert(!hull.coversPolygon(parseWktPolygon("POLYGON ((1 1, 1 5, 3 5, 3 1, 1 1))")))
  }

  test("euclidean distance parity (degrees, not meters)") {
    assert(euclidean(0, 0, 3, 4) == 5.0)
  }

  test("random points: covers agrees with strict-interior test off-boundary") {
    val rnd = new scala.util.Random(7)
    val tri = parseWktPolygon("POLYGON ((0 0, 10 0, 5 8, 0 0))")
    (1 to 1000).foreach { _ =>
      val x = rnd.nextDouble() * 12 - 1; val y = rnd.nextDouble() * 10 - 1
      // reference implementation: barycentric sign test for this triangle
      val s1 = (10 - 0) * (y - 0) - (0 - 0) * (x - 0)       // edge (0,0)-(10,0)
      val s2 = (5 - 10) * (y - 0) - (8 - 0) * (x - 10)      // edge (10,0)-(5,8)
      val s3 = (0 - 5) * (y - 8) - (0 - 8) * (x - 5)        // edge (5,8)-(0,0)
      val strictlyIn = s1 > 0 && s2 > 0 && s3 > 0
      val strictlyOut = s1 < 0 || s2 < 0 || s3 < 0
      if (strictlyIn) assert(tri.covers(x, y), s"($x,$y) should be covered")
      else if (strictlyOut) assert(!tri.covers(x, y), s"($x,$y) should not be covered")
    }
  }

  test("fuzz: covers on random convex polygons agrees with half-plane sign tests") {
    val rnd = new scala.util.Random(99)
    (1 to 50).foreach { _ =>
      // random convex polygon: hull of random points
      val pts = Seq.fill(8)(Pt(rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10))
      val hull = convexHull(pts)
      val ring = hull.ring
      // CCW sign test (boundary-inclusive)
      def signCovers(x: Double, y: Double): Boolean =
        ring.indices.forall { i =>
          val a = ring(i); val b = ring((i + 1) % ring.length)
          (b.x - a.x) * (y - a.y) - (b.y - a.y) * (x - a.x) >= 0
        }
      (1 to 200).foreach { _ =>
        val x = rnd.nextDouble() * 24 - 12
        val y = rnd.nextDouble() * 24 - 12
        // skip points within fp-noise of an edge: the two formulations may
        // legitimately differ there (different arithmetic, both "correct")
        val nearEdge = ring.indices.exists { i =>
          val a = ring(i); val b = ring((i + 1) % ring.length)
          val cross = (b.x - a.x) * (y - a.y) - (b.y - a.y) * (x - a.x)
          val len = math.hypot(b.x - a.x, b.y - a.y)
          math.abs(cross) / math.max(len, 1e-12) < 1e-9
        }
        if (!nearEdge)
          assert(hull.covers(x, y) == signCovers(x, y), s"($x,$y) vs $ring")
      }
    }
  }

  test("fuzz: geohash neighbor relation is symmetric away from poles") {
    val rnd = new scala.util.Random(123)
    (1 to 200).foreach { _ =>
      val lat = rnd.nextDouble() * 160 - 80
      val lon = rnd.nextDouble() * 360 - 180
      val p = rnd.nextInt(6) + 1
      val g = Geohash.encode(lat, lon, p)
      Geohash.neighbors(g).foreach { n =>
        assert(Geohash.neighbors(n).contains(g), s"asymmetric: $g <-> $n")
      }
    }
  }

  test("minimumBoundingPrefixes covers reference Midtown polygon") {
    val midtown = parseWktPolygon(
      "POLYGON ((-73.980844 40.758703, -73.987214 40.761369, " +
        "-73.990839 40.756400, -73.984422 40.753642, -73.980844 40.758703))")
    val Some(prefixes) = GeohashPruning.minimumBoundingPrefixes(midtown)
    assert(prefixes.nonEmpty && prefixes.size <= 9)
    // soundness: every point of the polygon ring lies in some prefix cell
    midtown.ring.foreach { p =>
      val g = Geohash.encode(p.y, p.x, 12)
      assert(prefixes.exists(g.startsWith), s"ring point $p outside prefix set $prefixes")
    }
    // hull of the prefix cells covers the whole polygon
    assert(GeohashPruning.hullOfCells(prefixes).coversPolygon(midtown))
  }

  test("minimumBoundingPrefixes: huge polygon coarsens or falls back, never throws") {
    val world = parseWktPolygon("POLYGON ((-179 -89, -179 89, 179 89, 179 -89, -179 -89))")
    GeohashPruning.minimumBoundingPrefixes(world) match {
      case Some(prefixes) => assert(GeohashPruning.hullOfCells(prefixes).coversPolygon(world))
      case None => succeed
    }
  }

  // ---- interior rings (holes) + MULTIPOLYGON (JTS covers parity) ----

  private val holed = parseWktPolygon(
    "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (3 3, 3 7, 7 7, 7 3, 3 3))")

  test("holed polygon: interior kept, hole interior excluded") {
    assert(holed.covers(1, 1), "point between shell and hole")
    assert(holed.covers(8, 5), "point right of the hole")
    assert(!holed.covers(5, 5), "point strictly inside the hole")
    assert(!holed.covers(11, 5), "point outside the shell")
  }

  test("holed polygon: hole boundary is polygon boundary — covered (JTS covers)") {
    assert(holed.covers(3, 5), "point ON the hole's left edge")
    assert(holed.covers(3, 3), "point ON a hole vertex")
    assert(holed.covers(0, 5), "outer boundary stays inclusive")
  }

  test("multiple holes and WKT round-trip with holes") {
    val two = parseWktPolygon(
      "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1), (8 8, 8 9, 9 9, 9 8, 8 8))")
    assert(two.holes.length == 2)
    assert(!two.covers(1.5, 1.5) && !two.covers(8.5, 8.5) && two.covers(5, 5))
    val rt = parseWktPolygon(toWkt(two))
    assert(rt.ring == two.ring && rt.holes == two.holes)
  }

  test("MULTIPOLYGON: in-any-part covered, between parts not") {
    val mp = parseWkt(
      "MULTIPOLYGON (((0 0, 0 2, 2 2, 2 0, 0 0)), ((5 0, 5 2, 7 2, 7 0, 5 0)))")
    assert(mp.isInstanceOf[MultiPolygon])
    assert(mp.covers(1, 1), "first part interior")
    assert(mp.covers(6, 1), "second part interior")
    assert(mp.covers(2, 1), "part boundary inclusive")
    assert(!mp.covers(3.5, 1), "gap between parts")
    assert(!mp.covers(8, 1), "outside both")
    val rt = parseWkt(toWkt(mp))
    assert(rt == mp, "MULTIPOLYGON WKT round-trip")
  }

  test("POINT: parse, covers iff equal, round-trip") {
    // JTS covers(point) on a POINT query: true exactly at the point
    val p = parseWkt("POINT (1.5 -2.5)")
    assert(p == Geom.Point(Geom.Pt(1.5, -2.5)))
    assert(p.covers(1.5, -2.5))
    assert(!p.covers(1.5, -2.4999) && !p.covers(0, 0))
    assert(p.bbox == (1.5, 1.5, -2.5, -2.5))
    assert(p.centroid == Geom.Pt(1.5, -2.5))
    assert(parseWkt(toWkt(p)) == p)
  }

  test("MULTIPOINT: both WKT coordinate forms, covers any member") {
    val a = parseWkt("MULTIPOINT ((1 2), (3 4))")
    val b = parseWkt("MULTIPOINT (1 2, 3 4)")
    assert(a == b)
    assert(a.covers(1, 2) && a.covers(3, 4))
    assert(!a.covers(2, 3))
    assert(a.centroid == Geom.Pt(2.0, 3.0))
    assert(parseWkt(toWkt(a)) == a)
  }

  test("LINESTRING: covers on-segment points incl. vertices, not off-line") {
    val l = parseWkt("LINESTRING (0 0, 4 0, 4 3)")
    // vertices, interior segment points
    assert(l.covers(0, 0) && l.covers(4, 0) && l.covers(4, 3))
    assert(l.covers(2, 0) && l.covers(4, 1.5))
    // off the line, and NOT the segment-closure back to the start
    assert(!l.covers(2, 1) && !l.covers(2, 1.5) && !l.covers(5, 0))
    // closure preserved: a closed linestring keeps its last segment
    val closed = parseWkt("LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)")
    assert(closed.covers(0, 0.5), "closing segment (0 1)-(0 0) must be kept")
    // length-weighted centroid: segments (0 0)-(4 0) len 4 mid (2,0) and
    // (4 0)-(4 3) len 3 mid (4,1.5) → ((8+12)/7, (0+4.5)/7)
    assert(math.abs(l.centroid.x - 20.0 / 7) < 1e-12 &&
      math.abs(l.centroid.y - 4.5 / 7) < 1e-12)
    assert(parseWkt(toWkt(l)) == l)
  }

  test("MULTILINESTRING: covers any part, round-trip") {
    val ml = parseWkt("MULTILINESTRING ((0 0, 1 1), (5 5, 6 5))")
    assert(ml.covers(0.5, 0.5) && ml.covers(5.5, 5))
    assert(!ml.covers(3, 3))
    assert(parseWkt(toWkt(ml)) == ml)
  }

  test("GEOMETRYCOLLECTION: union covers, areal-dominant centroid, round-trip") {
    val gc = parseWkt(
      "GEOMETRYCOLLECTION (POINT (50 50), LINESTRING (20 0, 30 0), " +
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0)))")
    // covered by any member: polygon interior+boundary, line, the point
    assert(gc.covers(5, 5) && gc.covers(0, 0) && gc.covers(25, 0) && gc.covers(50, 50))
    assert(!gc.covers(25, 1) && !gc.covers(50, 51) && !gc.covers(11, 5))
    // JTS: centroid of the highest-dimension members only (the polygon)
    assert(gc.centroid == Geom.Pt(5.0, 5.0))
    val (x0, x1, y0, y1) = gc.bbox
    assert((x0, x1, y0, y1) == (0.0, 50.0, 0.0, 50.0))
    assert(parseWkt(toWkt(gc)) == gc)
    // nested collection also parses
    val nested = parseWkt("GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (1 2)))")
    assert(nested.covers(1, 2))
  }

  test("non-areal geometries prune and refine through minimumBoundingPrefixes") {
    // the generic pruning path is sound for any geometry whose extent is
    // inside the convex hull of its exteriorPoints
    val l = parseWkt("LINESTRING (-73.99 40.75, -73.97 40.76)")
    val prefixes = GeohashPruning.minimumBoundingPrefixes(l)
    assert(prefixes.nonEmpty && prefixes.get.nonEmpty)
    val gc = parseWkt("GEOMETRYCOLLECTION (POINT (-73.98 40.755), " +
      "POLYGON ((-73.99 40.75, -73.99 40.76, -73.98 40.76, -73.98 40.75, -73.99 40.75)))")
    assert(GeohashPruning.minimumBoundingPrefixes(gc).nonEmpty)
  }

  test("still-unsupported WKT gets a clean error") {
    val g = intercept[IllegalArgumentException](parseWkt("WAT (1 2)"))
    assert(g.getMessage.contains("unsupported WKT"))
    val c = intercept[IllegalArgumentException](parseWkt("CIRCULARSTRING (0 0, 1 1, 2 0)"))
    assert(c.getMessage.contains("unsupported WKT"))
  }

  test("MULTIPOLYGON with a holed part + bbox/centroid sanity") {
    val mp = parseWkt(
      "MULTIPOLYGON (((0 0, 0 10, 10 10, 10 0, 0 0), (3 3, 3 7, 7 7, 7 3, 3 3)), ((20 0, 20 4, 24 4, 24 0, 20 0)))")
    assert(!mp.covers(5, 5), "hole interior in part 1")
    assert(mp.covers(3, 5), "hole boundary covered")
    assert(mp.covers(22, 2), "part 2 interior")
    assert(mp.bbox == (0.0, 24.0, 0.0, 10.0))
    // net-area weighting: part1 area 100-16=84 centered (5,5); part2 16 at (22,2)
    val c = mp.centroid
    assert(math.abs(c.x - (5.0 * 84 + 22.0 * 16) / 100) < 1e-9)
    assert(math.abs(c.y - (5.0 * 84 + 2.0 * 16) / 100) < 1e-9)
  }

  test("holed centroid shifts away from the hole") {
    val p = parseWktPolygon(
      "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (6 4, 6 6, 8 6, 8 4, 6 4))")
    // shell 100 at (5,5); hole 4 at (7,5) → x = (500 - 28)/96
    assert(math.abs(p.centroid.x - (500.0 - 28.0) / 96) < 1e-9)
    assert(math.abs(p.centroid.y - 5.0) < 1e-9)
  }

  test("minimumBoundingPrefixes covers a holed polygon and a multipolygon") {
    val holedMidtown = parseWkt(
      "POLYGON ((-73.99 40.75, -73.99 40.762, -73.97 40.762, -73.97 40.75, -73.99 40.75), " +
        "(-73.985 40.754, -73.985 40.758, -73.975 40.758, -73.975 40.754, -73.985 40.754))")
    val Some(p1) = GeohashPruning.minimumBoundingPrefixes(holedMidtown)
    assert(GeohashPruning.hullOfCells(p1).coversPolygon(holedMidtown))
    val mp = parseWkt(
      "MULTIPOLYGON (((-73.99 40.75, -73.99 40.76, -73.98 40.76, -73.98 40.75, -73.99 40.75)), " +
        "((-73.97 40.75, -73.97 40.76, -73.96 40.76, -73.96 40.75, -73.97 40.75)))")
    val Some(p2) = GeohashPruning.minimumBoundingPrefixes(mp)
    // soundness: every exterior vertex of every part lands in a prefix cell
    mp.exteriorPoints.foreach { p =>
      val g = Geohash.encode(p.y, p.x, 12)
      assert(p2.exists(g.startsWith), s"vertex $p outside prefix set $p2")
    }
    assert(GeohashPruning.hullOfCells(p2).coversPolygon(mp))
  }

  test("collection/multipoint prefix search stays tight for far-apart members") {
    // a collection mixing members on two coasts must prune per member,
    // not coarsen the single-center search to a continent-sized block
    val gc = parseWkt(
      "GEOMETRYCOLLECTION (POLYGON ((-74.0 40.7, -74.0 40.76, -73.94 40.76, -73.94 40.7, -74.0 40.7)), " +
        "POINT (-122.4 37.77), LINESTRING (-87.7 41.8, -87.64 41.86))")
    val Some(prefixes) = GeohashPruning.minimumBoundingPrefixes(gc)
    assert(prefixes.forall(_.length >= 3), s"coarse prefixes: $prefixes")
    gc.exteriorPoints.foreach { p =>
      val g = Geohash.encode(p.y, p.x, 12)
      assert(prefixes.exists(g.startsWith), s"vertex $p outside $prefixes")
    }
    // a bare POINT member prunes to its own max-precision cell
    val Some(pt) = GeohashPruning.minimumBoundingPrefixes(parseWkt("POINT (-122.4 37.77)"))
    assert(pt == Seq(Geohash.encode(37.77, -122.4, 7)), pt)
    // far-apart MULTIPOINT: per-point union, all precision-7 cells
    val Some(mpts) = GeohashPruning.minimumBoundingPrefixes(
      parseWkt("MULTIPOINT ((-74.0 40.7), (-122.4 37.77))"))
    assert(mpts.size == 2 && mpts.forall(_.length == 7), mpts)
  }

  test("multipolygon prefix search stays tight for far-apart parts (per-part union)") {
    // NYC-ish and Chicago-ish blocks ~12 degrees apart: a single-center
    // search would coarsen until one cell block spans both
    val mp = parseWkt(
      "MULTIPOLYGON (((-74.0 40.7, -74.0 40.76, -73.94 40.76, -73.94 40.7, -74.0 40.7)), " +
        "((-87.7 41.8, -87.7 41.86, -87.64 41.86, -87.64 41.8, -87.7 41.8)))")
    val Some(prefixes) = GeohashPruning.minimumBoundingPrefixes(mp)
    // per-part sets keep precision >= 3 (a precision-3 cell is ~1.4 x 1.4
    // degrees); a whole-geometry search would have to drop to 1 or fail
    assert(prefixes.forall(_.length >= 3), s"coarse prefixes: $prefixes")
    assert(prefixes.size <= 18, s"too many prefixes: ${prefixes.size}")
    mp.exteriorPoints.foreach { p =>
      val g = Geohash.encode(p.y, p.x, 12)
      assert(prefixes.exists(g.startsWith), s"vertex $p outside $prefixes")
    }
    // each part individually covered by the union's cell hulls per-part:
    mp match {
      case MultiPolygon(parts) => parts.foreach { part =>
        val Some(own) = GeohashPruning.minimumBoundingPrefixes(part)
        assert(own.forall(prefixes.contains), "per-part set must be in the union")
      }
      case _ => fail("expected multipolygon")
    }
  }
}
