package graft.geo

/**
 * Minimal pure-Scala computational geometry, sized to the reference's actual
 * JTS surface (reference: src/main/java/tech/stackable/gis/hbase/WithinQuery.java —
 * `WKTReader.read` :184, `Geometry.covers` :89/:94/:136, `convexHull` :76,
 * `getCentroid` :82; filter/WithinFilter.java:99 `covers(point)`).
 *
 * Semantics pinned by the reference's golden tests:
 *  - `covers` is boundary-INCLUSIVE (point on an edge/vertex is kept) —
 *    TestWithinFilter.java:108-135 (rect to 2.999 keeps 2 pts, to 3.0 keeps 3).
 *  - distance is planar Euclidean in degrees (DistanceComparator.java:20-27),
 *    NOT great-circle.
 *
 * Coordinates are (x=lon, y=lat) throughout, matching WKT axis order.
 */
object Geom {

  final case class Pt(x: Double, y: Double)

  /**
   * A simple polygon given by its exterior ring (first point NOT repeated at
   * the end internally; WKT's closing repeat is stripped on parse).
   */
  final case class Polygon(ring: IndexedSeq[Pt]) {
    require(ring.length >= 3, s"polygon needs >=3 distinct vertices, got ${ring.length}")

    /** Axis-aligned bounds: (xMin, xMax, yMin, yMax). */
    lazy val bbox: (Double, Double, Double, Double) = {
      var xMin = Double.PositiveInfinity; var xMax = Double.NegativeInfinity
      var yMin = Double.PositiveInfinity; var yMax = Double.NegativeInfinity
      ring.foreach { p =>
        if (p.x < xMin) xMin = p.x; if (p.x > xMax) xMax = p.x
        if (p.y < yMin) yMin = p.y; if (p.y > yMax) yMax = p.y
      }
      (xMin, xMax, yMin, yMax)
    }

    /**
     * Boundary-inclusive point-in-polygon (JTS `covers` semantics for
     * point arguments): true if the point is in the interior OR exactly on
     * the boundary. Even-odd ray casting with an explicit on-segment test.
     */
    def covers(px: Double, py: Double): Boolean = {
      if (px.isNaN || py.isNaN) return false
      val (xMin, xMax, yMin, yMax) = bbox
      if (px < xMin || px > xMax || py < yMin || py > yMax) return false
      val n = ring.length
      var inside = false
      var j = n - 1
      var i = 0
      while (i < n) {
        val a = ring(j); val b = ring(i)
        if (onSegment(a, b, px, py)) return true
        if ((a.y > py) != (b.y > py)) {
          val xInt = a.x + (py - a.y) * (b.x - a.x) / (b.y - a.y)
          if (px < xInt) inside = !inside
        }
        j = i; i += 1
      }
      inside
    }

    /**
     * True if every vertex of `other` is covered. Exact containment test when
     * `this` is convex (the only shape the reference ever tests against a
     * polygon: the convex hull of geohash-cell corners, WithinQuery.java:89/:94).
     */
    def coversPolygon(other: Polygon): Boolean =
      other.ring.forall(p => covers(p.x, p.y))

    /** Area centroid (shoelace); falls back to vertex mean for degenerate rings. */
    lazy val centroid: Pt = {
      var a2 = 0.0; var cx = 0.0; var cy = 0.0
      val n = ring.length
      var i = 0
      while (i < n) {
        val p = ring(i); val q = ring((i + 1) % n)
        val cross = p.x * q.y - q.x * p.y
        a2 += cross
        cx += (p.x + q.x) * cross
        cy += (p.y + q.y) * cross
        i += 1
      }
      if (math.abs(a2) < 1e-12) {
        Pt(ring.map(_.x).sum / n, ring.map(_.y).sum / n)
      } else {
        Pt(cx / (3 * a2), cy / (3 * a2))
      }
    }
  }

  private def onSegment(a: Pt, b: Pt, px: Double, py: Double): Boolean = {
    val cross = (b.x - a.x) * (py - a.y) - (b.y - a.y) * (px - a.x)
    if (cross != 0.0) return false
    px >= math.min(a.x, b.x) && px <= math.max(a.x, b.x) &&
      py >= math.min(a.y, b.y) && py <= math.max(a.y, b.y)
  }

  /** Planar Euclidean distance in coordinate units (degrees), per the
    * reference's DistanceComparator.java:20-27 / Point2D.distance. */
  def euclidean(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    math.sqrt(dx * dx + dy * dy)
  }

  /** Great-circle distance in meters (haversine) — an addition over the
    * reference, which only has Euclidean-degrees. */
  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val R = 6371008.8
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /**
   * Parse a WKT POLYGON's exterior ring (the only geometry the reference
   * queries with: WithinQuery.java:184-185). Also accepts POINT.
   * Holes (interior rings) are not supported — the reference never uses them.
   */
  def parseWktPolygon(wkt: String): Polygon = {
    val s = wkt.trim
    val upper = s.toUpperCase(java.util.Locale.ROOT)
    require(upper.startsWith("POLYGON"), s"expected POLYGON WKT, got: ${s.take(30)}")
    val open = s.indexOf('(')
    require(open >= 0, s"malformed WKT: $s")
    // exterior ring = first (...) group inside the outer parens
    val innerOpen = s.indexOf('(', open + 1)
    require(innerOpen >= 0, s"malformed POLYGON WKT: $s")
    val innerClose = s.indexOf(')', innerOpen + 1)
    require(innerClose >= 0, s"malformed POLYGON WKT: $s")
    val coords = s.substring(innerOpen + 1, innerClose)
    val pts = coords.split(',').map { pair =>
      val t = pair.trim.split("\\s+")
      require(t.length >= 2, s"malformed coordinate '$pair'")
      Pt(t(0).toDouble, t(1).toDouble)
    }.toIndexedSeq
    // WKT closes the ring by repeating the first point; store it open.
    val ring = if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
    Polygon(ring)
  }

  /** WKT text of a polygon (closing the ring), inverse of parseWktPolygon —
    * covers the reference's filter round-trip surface (F6: WithinFilter
    * toByteArray/parseFrom ships the WKT text, Filter.proto:12-17). */
  def toWkt(p: Polygon): String =
    (p.ring :+ p.ring.head)
      .map(pt => s"${pt.x} ${pt.y}")
      .mkString("POLYGON ((", ", ", "))")

  /** Convex hull (Andrew's monotone chain), returned as a CCW polygon. */
  def convexHull(points: Seq[Pt]): Polygon = {
    val pts = points.distinct.sortBy(p => (p.x, p.y)).toIndexedSeq
    require(pts.length >= 3, s"hull needs >=3 distinct points, got ${pts.length}")
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    val lower = scala.collection.mutable.ArrayBuffer.empty[Pt]
    pts.foreach { p =>
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer.empty[Pt]
    pts.reverse.foreach { p =>
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toIndexedSeq
    if (hull.length >= 3) Polygon(hull)
    else Polygon(pts) // collinear degenerate; callers only use covers()
  }
}
