package graft

import graft.geom.Geodesy
import org.scalatest.funsuite.AnyFunSuite

/**
 * Parity with the reference's geodesy suite
 * (geomesa-utils/src/test/.../geohash/GeomDistanceTest.scala): the same
 * survey fixtures — Flinders Peak→Buninyong (the canonical Vincenty test
 * line from the Geoscience Australia dataset), the CCRi local/remote
 * pairs, and the New Mexico direct-problem move — at the reference's own
 * tolerances, against this engine's independently derived Vincenty
 * inverse and direct implementations.
 */
class GeodesyParitySpec extends AnyFunSuite {

  test("Flinders Peak, AUS is 54972.271 m from Buninyong (GeomDistanceTest:40-47)") {
    val d = Geodesy.vincentyMeters(144.4248678889, -37.9510334167,
      143.9264955278, -37.6528211389)
    assert(math.abs(d - 54972.271) < 0.01)
  }

  test("CCRi is 433.5 m from Albemarle High School (GeomDistanceTest:49-56)") {
    val d = Geodesy.vincentyMeters(-78.4953560, 38.0752150, -78.5002901, 38.0754152)
    assert(math.abs(d - 433.5) < 0.01)
  }

  test("CCRi is 14301344.142 m from Mount Potts, NZ (GeomDistanceTest:58-65)") {
    val d = Geodesy.vincentyMeters(-78.4953560, 38.0752150, 170.919998, -43.498299)
    assert(math.abs(d - 14301344.142) < 0.01)
  }

  test("New Mexico: direct problem 2,300,000 m due west of CCRi (GeomDistanceTest:67-79)") {
    val (x, y) = Geodesy.vincentyMove(-78.4953560, 38.0752150, -90.0, 2300000)
    assert(math.abs(x - -104.060) < 0.01)
    assert(math.abs(y - 35.236) < 0.01)
    // and the inverse of the direct recovers the distance
    val d = Geodesy.vincentyMeters(-78.4953560, 38.0752150, x, y)
    assert(math.abs(d - 2300000) < 0.1)
  }

  test("direct+inverse round-trip across the antimeridian stays normalized") {
    val (x, y) = Geodesy.vincentyMove(179.5, -20.0, 90.0, 300000)
    assert(x >= -180 && x <= 180 && x < 0) // crossed into the west
    assert(math.abs(Geodesy.vincentyMeters(179.5, -20.0, x + 360, y) - 300000) < 0.1)
  }
}
