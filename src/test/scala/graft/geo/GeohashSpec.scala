package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeohashSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def randLat() = rnd.nextDouble() * 180 - 90
  private def randLon() = rnd.nextDouble() * 360 - 180

  // Public known vectors (Wikipedia "Geohash" article examples).
  test("known vectors") {
    assert(Geohash.encode(42.605, -5.603, 5) == "ezs42")
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
  }

  test("reference compatibility: 12-char key shape for a wifi row") {
    // First data row of the reference's wifi fixture:
    // /root/reference/data/wifi_4326.txt:2 → (-73.99282722, 40.73340614).
    val gh = Geohash.encode(40.73340614, -73.99282722, 12)
    assert(gh.length == 12)
    assert(gh == "dr5rsr2161m0") // Greenwich Village ⊂ dr5rs; pinned vector
    val (lat, lon) = Geohash.decodeCenter(gh)
    assert(math.abs(lat - 40.73340614) < 1e-6) // within half a 12-char cell
    assert(math.abs(lon + 73.99282722) < 1e-6)
  }

  test("encode/decode round-trip: point is inside its own cell") {
    (1 to 500).foreach { _ =>
      val lat = randLat(); val lon = randLon()
      val p = rnd.nextInt(12) + 1
      val gh = Geohash.encode(lat, lon, p)
      val (latLo, latHi, lonLo, lonHi) = Geohash.decodeBbox(gh)
      assert(lat >= latLo && lat <= latHi, s"lat $lat not in [$latLo,$latHi] for $gh")
      assert(lon >= lonLo && lon <= lonHi, s"lon $lon not in [$lonLo,$lonHi] for $gh")
    }
  }

  test("prefix nesting: longer geohash starts with shorter one") {
    (1 to 200).foreach { _ =>
      val lat = randLat(); val lon = randLon()
      val g12 = Geohash.encode(lat, lon, 12)
      (1 to 11).foreach(p => assert(g12.startsWith(Geohash.encode(lat, lon, p))))
    }
  }

  test("neighbors: 8 distinct adjacent cells away from poles/antimeridian") {
    val n = Geohash.neighbors("dr5rs")
    assert(n.size == 8)
    assert(n.forall(_.length == 5))
    assert(!n.contains("dr5rs"))
    val (latC, lonC) = Geohash.decodeCenter("dr5rs")
    val (latLo, latHi, lonLo, lonHi) = Geohash.decodeBbox("dr5rs")
    val dLat = latHi - latLo; val dLon = lonHi - lonLo
    n.foreach { g =>
      val (la, lo) = Geohash.decodeCenter(g)
      assert(math.abs(la - latC) <= dLat * 1.5 && math.abs(lo - lonC) <= dLon * 1.5)
    }
  }

  test("neighbors wrap longitude and clip at poles") {
    val eastEdge = Geohash.encode(0.0, 179.99, 4)
    assert(Geohash.neighbors(eastEdge).size == 8) // wraps across antimeridian
    val nearPole = Geohash.encode(89.99, 0.0, 4)
    val n = Geohash.neighbors(nearPole)
    assert(n.size >= 5 && n.size <= 8) // northern row clipped
  }
}
