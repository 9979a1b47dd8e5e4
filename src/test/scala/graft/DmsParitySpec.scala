package graft

import graft.functions.TextRT
import org.scalatest.funsuite.AnyFunSuite

/**
 * Parity with the reference's DMS parser suite
 * (geomesa-core/src/test/.../csv/DMSTest.scala): the same accepted forms
 * (colons, packed, leading sign flipping the hemisphere, all eight
 * hemisphere characters in both cases) and the same rejections
 * (seconds/minutes/degrees out of range). Where the reference throws
 * IllegalArgumentException, this engine's SQL-idiomatic analog is
 * NaN → null at the expression surface (documented at TextRT.dmsToDeg).
 */
class DmsParitySpec extends AnyFunSuite {

  private val dms = 38 + (4 + 31.17 / 60.0) / 60.0 // DMS(38,04,31.17,North)

  test("hemisphere recognizes all valid characters, both cases (DMSTest:27-36)") {
    assert(TextRT.dmsToDeg("38:04:31.17N") === dms)
    assert(TextRT.dmsToDeg("38:04:31.17n") === dms)
    assert(TextRT.dmsToDeg("38:04:31.17S") === -dms)
    assert(TextRT.dmsToDeg("38:04:31.17s") === -dms)
    assert(TextRT.dmsToDeg("38:04:31.17E") === dms)
    assert(TextRT.dmsToDeg("38:04:31.17e") === dms)
    assert(TextRT.dmsToDeg("38:04:31.17W") === -dms)
    assert(TextRT.dmsToDeg("38:04:31.17w") === -dms)
  }

  test("hemisphere rejects invalid characters (DMSTest:38-40)") {
    assert(TextRT.dmsToDeg("38:04:31.17Q").isNaN)
  }

  test("parses DMS strings with colons (DMSTest:46-48)") {
    assert(TextRT.dmsToDeg("38:04:31.17N") === dms)
  }

  test("parses DMS strings without colons (DMSTest:50-52)") {
    assert(TextRT.dmsToDeg("380431.17N") === dms)
  }

  test("parses DMS strings with signs — sign flips the hemisphere (DMSTest:54-56)") {
    // "-38:04:31.17S" equals DMS(38,04,31.17,North): minus of South
    assert(TextRT.dmsToDeg("-38:04:31.17S") === dms)
  }

  test("rejects too many seconds (DMSTest:58-60)") {
    assert(TextRT.dmsToDeg("38:04:61.17N").isNaN)
  }

  test("rejects too many minutes (DMSTest:62-64)") {
    assert(TextRT.dmsToDeg("38:64:31.17N").isNaN)
  }

  test("rejects too many degrees (DMSTest:66-68)") {
    // the reference's own fixture ("98:04:61.17N") also has 61 seconds, so
    // it cannot isolate the degree bound; keep it AND a seconds-in-range
    // 98-degree latitude so the maxDeg=90 check is actually exercised
    assert(TextRT.dmsToDeg("98:04:61.17N").isNaN)
    assert(TextRT.dmsToDeg("98:04:31.17N").isNaN)
    // …but 98 degrees IS a valid longitude: only the latitude bound is 90
    assert(TextRT.dmsToDeg("98:04:31.17E") === 98 + (4 + 31.17 / 60.0) / 60.0)
  }
}
