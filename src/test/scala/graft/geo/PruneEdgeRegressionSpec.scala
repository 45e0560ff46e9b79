package graft.geo

import graft.geo.Geom._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Regression: prefix pruning vs the half-open geohash encode. A query
 * whose boundary lies EXACTLY on a geohash cell's east/north edge (here
 * lon = 0.0, the "7z*"/"kp*" meridian at every precision) encodes its
 * on-edge points into the NEXT cell, so the closed convex-hull covers
 * test the reference uses (WithinQuery.java:89/:94) over-claims and
 * silently drops on-edge rows. Found by GeomPropertySpec's pruning
 * soundness property; pinned here deterministically.
 */
class PruneEdgeRegressionSpec extends AnyFunSuite {

  private def soundFor(g: Geometry): Unit =
    GeohashPruning.minimumBoundingPrefixes(g).foreach { prefixes =>
      g.exteriorPoints.foreach { p =>
        val h = Geohash.encode(p.y, p.x, 12)
        assert(prefixes.exists(h.startsWith),
          s"vertex $p geohash $h outside prefix set $prefixes")
      }
    }

  test("query boundary exactly on a cell east edge stays inside the prefix set") {
    // x ∈ [-0.9, 0.0]: 0.0 is the east edge of every west-of-meridian cell
    soundFor(Polygon(IndexedSeq(Pt(-0.9, -3.6), Pt(-0.9, -2.9),
      Pt(0.0, -2.9), Pt(0.0, -3.6))))
    // and on a north edge (lat 0.0 is a bisection edge at every precision)
    soundFor(Polygon(IndexedSeq(Pt(-10.3, -0.7), Pt(-10.3, 0.0),
      Pt(-10.1, 0.0), Pt(-10.1, -0.7))))
  }

  test("degenerate on-edge queries: POINT and vertical LINESTRING at lon 0") {
    soundFor(Point(Pt(0.0, -3.0)))
    soundFor(LineString(IndexedSeq(Pt(0.0, -3.0), Pt(0.0, -2.95))))
  }

  test("global east/north maxima stay inclusive (encode clamps into last cell)") {
    soundFor(Point(Pt(180.0, 45.0)))
    soundFor(Point(Pt(100.0, 90.0)))
    soundFor(Polygon(IndexedSeq(Pt(179.9, 89.9), Pt(179.9, 90.0),
      Pt(180.0, 90.0), Pt(180.0, 89.9))))
  }

  test("antimeridian-adjacent query coarsens or full-scans, never a wrapped block") {
    // a query hugging lon = 180 from the west: neighbor sets that would
    // wrap the antimeridian are rejected by the tiling check
    val g = Polygon(IndexedSeq(Pt(179.2, 10.2), Pt(179.2, 10.4),
      Pt(179.9, 10.4), Pt(179.9, 10.2)))
    soundFor(g)
  }
}
