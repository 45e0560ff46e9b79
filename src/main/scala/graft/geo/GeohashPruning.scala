package graft.geo

import graft.geo.Geom.{Geometry, Polygon, Pt}

/**
 * Spatial-predicate → geohash-prefix pruning: the planner-side rewrite the
 * reference hand-codes in the client (reference:
 * src/main/java/tech/stackable/gis/hbase/WithinQuery.java:47-102 —
 * cell corners :47-68, hull-of-cells :70-77, minimumBoundingPrefixes :79-102;
 * KNN candidates: KNNQuery.java:31,84-88).
 *
 * On geohash-sorted/partitioned storage, a prefix predicate becomes
 * partition + row-group pruning at the Parquet scan — the Spark analog of
 * the reference's HBase start-row/PrefixFilter range scans.
 */
object GeohashPruning {

  /** The 4 corner coordinates of one geohash cell (WithinQuery.java:47-68). */
  def cellCorners(geohash: String): Seq[Pt] = {
    val (latLo, latHi, lonLo, lonHi) = Geohash.decodeBbox(geohash)
    Seq(Pt(lonLo, latLo), Pt(lonLo, latHi), Pt(lonHi, latLo), Pt(lonHi, latHi))
  }

  /** Convex hull of the corners of a set of geohash cells (WithinQuery.java:70-77). */
  def hullOfCells(cells: Seq[String]): Polygon =
    Geom.convexHull(cells.flatMap(cellCorners))

  /**
   * Minimum bounding prefix set for a query polygon, searching precision
   * maxPrecision→1 (reference default 7→1, WithinQuery.java:79-102):
   * at each precision take the cell of the query centroid; if that single
   * cell's hull covers the polygon → 1 prefix; else if the hull of the cell
   * plus its 8 neighbors covers → 9 prefixes; else coarsen.
   *
   * Unlike the reference (which throws IllegalArgumentException,
   * WithinQuery.java:100-101), an uncoverable query yields None and callers
   * fall back to a full scan — correct at any query size.
   */
  def minimumBoundingPrefixes(query: Geometry, maxPrecision: Int = 7): Option[Seq[String]] = {
    query match {
      case Geom.MultiPolygon(polys) if polys.length > 1 =>
        // per-part search, then union: far-apart parts (two cities) would
        // otherwise force the single-center search to coarsen until one
        // cell block spans both — per-part sets keep each part's pruning
        // tight. Sound: a covered point is covered by SOME part, hence in
        // that part's prefix set.
        unionOfParts(polys, maxPrecision)
      // the same per-member union for every other multi-part geometry: a
      // collection mixing members on two continents must not coarsen the
      // whole search to one planet-sized cell block
      case Geom.GeometryCollection(gs) => unionOfParts(gs, maxPrecision)
      case Geom.MultiPoint(pts) if pts.length > 1 =>
        unionOfParts(pts.map(Geom.Point.apply), maxPrecision)
      case Geom.MultiLineString(ls) if ls.length > 1 =>
        unionOfParts(ls, maxPrecision)
      case _ =>
        val c = query.centroid
        var precision = maxPrecision
        while (precision >= 1) {
          val center = Geohash.encode(c.y, c.x, precision)
          if (hullOfCells(Seq(center)).coversPolygon(query)) return Some(Seq(center))
          val nine = center +: Geohash.neighbors(center)
          if (hullOfCells(nine).coversPolygon(query)) return Some(nine)
          precision -= 1
        }
        None
    }
  }

  /** Per-part prefix search, unioned. Sound: a covered point is covered
    * by SOME part, hence in that part's prefix set; None (uncoverable
    * part) poisons the whole union — callers fall back to a full scan. */
  private def unionOfParts(parts: Seq[Geometry],
                           maxPrecision: Int): Option[Seq[String]] = {
    val sets = parts.map(p => minimumBoundingPrefixes(p, maxPrecision))
    if (sets.forall(_.isDefined)) Some(sets.flatMap(_.get).distinct)
    else None
  }

  /** KNN candidate prefixes: cell of the query point at `precision` plus its
    * 8 neighbors (KNNQuery.java:31,84-88; default precision 7 ≈ ±0.7 km). */
  def knnPrefixes(lon: Double, lat: Double, precision: Int = 7): Seq[String] =
    Geohash.cellAndNeighbors(lat, lon, precision)
}
