package graft.geo

/**
 * Pure-Scala geohash codec (standard public-domain algorithm: interleave
 * longitude/latitude bisection bits, 5 bits per base32 character).
 *
 * Replaces the reference's `ch.hsr:geohash` usage
 * (reference: src/main/java/tech/stackable/gis/hbase/Ingest.java:77 —
 * `GeoHash.withCharacterPrecision(lat, lon, 12).toBase32()`), and
 * `GeoHash.getAdjacent` (reference: KNNQuery.java:86-88).
 *
 * All methods are pure, allocation-light, and safe to call from Catalyst
 * expression eval / codegen on executors.
 */
object Geohash {
  final val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val Base32Index: Array[Int] = {
    val a = Array.fill(128)(-1)
    var i = 0
    while (i < Base32.length) { a(Base32.charAt(i).toInt) = i; i += 1 }
    a
  }

  /** Encode (lat, lon) to a base32 geohash of `precision` characters. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new java.lang.StringBuilder(precision)
    var even = true // even bit positions refine longitude
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Bounding box of a geohash cell: (latMin, latMax, lonMin, lonMax). */
  def decodeBbox(geohash: String): (Double, Double, Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var even = true
    var i = 0
    while (i < geohash.length) {
      val c = geohash.charAt(i)
      val idx = if (c < 128) Base32Index(c.toInt) else -1
      require(idx >= 0, s"invalid geohash character '$c' in '$geohash'")
      var b = 4
      while (b >= 0) {
        val bitSet = ((idx >> b) & 1) == 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (bitSet) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bitSet) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    (latLo, latHi, lonLo, lonHi)
  }

  /** Center point (lat, lon) of a geohash cell. */
  def decodeCenter(geohash: String): (Double, Double) = {
    val (latLo, latHi, lonLo, lonHi) = decodeBbox(geohash)
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  /**
   * The up-to-8 adjacent cells of a geohash (N, NE, E, SE, S, SW, W, NW),
   * computed by offsetting the cell center by one cell width/height and
   * re-encoding. Cells beyond the poles are dropped; longitude wraps.
   * Order is not significant to any caller (prefix pruning treats the
   * result as a set, as the reference does: KNNQuery.java:84-88).
   */
  def neighbors(geohash: String): Seq[String] = {
    val (latLo, latHi, lonLo, lonHi) = decodeBbox(geohash)
    val latC = (latLo + latHi) / 2
    val lonC = (lonLo + lonHi) / 2
    val dLat = latHi - latLo
    val dLon = lonHi - lonLo
    val out = Seq.newBuilder[String]
    var di = -1
    while (di <= 1) {
      var dj = -1
      while (dj <= 1) {
        if (!(di == 0 && dj == 0)) {
          val lat = latC + di * dLat
          var lon = lonC + dj * dLon
          if (lon >= 180.0) lon -= 360.0
          if (lon < -180.0) lon += 360.0
          if (lat > -90.0 && lat < 90.0) {
            val n = encode(lat, lon, geohash.length)
            if (n != geohash) out += n
          }
        }
        dj += 1
      }
      di += 1
    }
    out.result().distinct
  }

  /** Cell + its neighbors (the reference's 9-cell KNN candidate set). */
  def cellAndNeighbors(lat: Double, lon: Double, precision: Int): Seq[String] = {
    val c = encode(lat, lon, precision)
    c +: neighbors(c)
  }
}
