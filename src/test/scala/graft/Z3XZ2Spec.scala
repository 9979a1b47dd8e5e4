package graft

import graft.index.{XZ2, Z2, Z3}
import org.scalatest.funsuite.AnyFunSuite

class Z3XZ2Spec extends AnyFunSuite {
  private val rnd = new scala.util.Random(11)

  test("z3 spread3/squash3 round-trip") {
    (0 until 500).foreach { _ =>
      val v = rnd.nextLong() & 0x1fffffL
      assert(Z3.squash3(Z3.spread3(v)) === v)
    }
  }

  test("z3 interleave splits back to x/y/t") {
    (0 until 300).foreach { _ =>
      val x = rnd.nextLong() & 0x7ffffL
      val y = rnd.nextLong() & 0x7ffffL
      val t = rnd.nextLong() & 0x7ffffL
      val z = Z3.interleave(x, y, t)
      assert(Z3.squash3(z) === x)
      assert(Z3.squash3(z >> 1) === y)
      assert(Z3.squash3(z >> 2) === t)
    }
  }

  test("z3 encode puts (lon, lat, t) inside cell bounds") {
    val period = 7L * 86400
    (0 until 300).foreach { _ =>
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val sec = math.abs(rnd.nextLong() % (100L * period))
      val res = 1 + rnd.nextInt(Z3.MaxRes)
      val id = Z3.encode(lon, lat, sec, period, res)
      val (x0, y0, t0, x1, y1, t1) = Z3.bounds(id, period)
      assert(lon >= x0 - 1e-9 && lon <= x1 + 1e-9)
      assert(lat >= y0 - 1e-9 && lat <= y1 + 1e-9)
      val off = sec - Z3.timeBin(sec, period) * period
      assert(off >= t0 - 1e-6 && off <= t1 + 1e-6)
    }
  }

  test("z3 coverBBoxTime covers every interior point's encode") {
    val period = 86400L
    val cells = Z3.coverBBoxTime(-10, -10, 10, 10, 1000, 50000, period, 4).toSet
    (0 until 300).foreach { _ =>
      val lon = rnd.nextDouble() * 20 - 10
      val lat = rnd.nextDouble() * 20 - 10
      val sec = 1000 + math.abs(rnd.nextLong() % 49000)
      assert(cells.contains(Z3.encode(lon, lat, sec, period, 4)))
    }
  }

  test("timeBin floors negatives correctly") {
    assert(Z3.timeBin(-1, 100) === -1L)
    assert(Z3.timeBin(0, 100) === 0L)
    assert(Z3.timeBin(199, 100) === 1L)
  }

  test("xz2: doubled cell anchored at encode's cell contains the envelope") {
    (0 until 500).foreach { _ =>
      val x0 = rnd.nextDouble() * 340 - 180
      val y0 = rnd.nextDouble() * 160 - 90
      val w = math.pow(10, rnd.nextDouble() * 4 - 3) // 1e-3 .. 10 deg
      val h = math.pow(10, rnd.nextDouble() * 4 - 3)
      val (x1, y1) = (math.min(180, x0 + w), math.min(90, y0 + h))
      val id = XZ2.encode(x0, y0, x1, y1, maxRes = 12)
      val r = Z2.resOf(id)
      val (cx0, cy0, cx1, cy1) = Z2.bounds(id)
      val cw = cx1 - cx0; val ch = cy1 - cy0
      assert(x0 >= cx0 - 1e-9 && y0 >= cy0 - 1e-9, "anchor cell holds min corner")
      assert(x1 <= cx0 + 2 * cw + 1e-9 && y1 <= cy0 + 2 * ch + 1e-9,
        s"doubled cell must contain envelope: res $r env=($x0,$y0,$x1,$y1) cell=($cx0,$cy0,$cx1,$cy1)")
    }
  }

  test("xz2 queryCover finds every extent whose envelope intersects the window") {
    val maxRes = 8
    val win = (0.0, 0.0, 20.0, 10.0)
    val cover = XZ2.queryCover(win._1, win._2, win._3, win._4, maxRes, budget = 100000).toSet
    (0 until 1000).foreach { _ =>
      val x0 = rnd.nextDouble() * 340 - 180
      val y0 = rnd.nextDouble() * 160 - 90
      val w = math.pow(10, rnd.nextDouble() * 3 - 2)
      val h = math.pow(10, rnd.nextDouble() * 3 - 2)
      val (x1, y1) = (math.min(180, x0 + w), math.min(90, y0 + h))
      val intersects = !(x1 < win._1 || win._3 < x0 || y1 < win._2 || win._4 < y0)
      if (intersects) {
        val id = XZ2.encode(x0, y0, x1, y1, maxRes)
        assert(cover.contains(id), s"missing xz cell for env=($x0,$y0,$x1,$y1) res=${Z2.resOf(id)}")
      }
    }
  }

  test("geohash strings: public test vectors + round-trip + Z2 cell agreement") {
    import graft.index.GeoHashStr
    // canonical public vectors (Niemeyer geohash)
    assert(GeoHashStr.encode(-5.6, 42.6, 5) === "ezs42")
    assert(GeoHashStr.encode(10.40744, 57.64911, 11) === "u4pruydqqvj")
    val (clon, clat) = GeoHashStr.decodeCenter("ezs42")
    assert(math.abs(clon - (-5.6)) < 0.03 && math.abs(clat - 42.6) < 0.03)
    // round-trip: any point decodes into a cell containing it
    val rnd2 = new scala.util.Random(5)
    (0 until 300).foreach { _ =>
      val lon = rnd2.nextDouble() * 360 - 180
      val lat = rnd2.nextDouble() * 180 - 90
      val h = GeoHashStr.encode(lon, lat, 8)
      val (x0, y0, x1, y1) = GeoHashStr.decodeBounds(h)
      assert(lon >= x0 && lon <= x1 && lat >= y0 && lat <= y1)
      // prefix property: coarser hash is a prefix (hierarchy like Z2 parents)
      assert(h.startsWith(GeoHashStr.encode(lon, lat, 4)))
    }
  }

  test("xz2 maxResForBudget: chosen res never overflows queryCover for any window up to the stated size") {
    import graft.functions.TextRT
    def rnd(seed: Long): Double = (TextRT.mix64(seed) & 0xffffffffL).toDouble / 0x100000000L.toDouble
    (0 until 60).foreach { i =>
      val w = rnd(i * 5 + 1) * 359 + 0.01
      val h = rnd(i * 5 + 2) * 179 + 0.01
      val res = XZ2.maxResForBudget(w, h, maxRes = 12, budget = 65536)
      // any window at most w x h anywhere in the world must fit the budget
      val x0 = math.min(180 - w, rnd(i * 5 + 3) * 360 - 180)
      val y0 = math.min(90 - h, rnd(i * 5 + 4) * 180 - 90)
      val cover = XZ2.queryCover(x0, y0, x0 + w, y0 + h, res) // must not throw
      assert(cover.length <= 65536)
      assert(res >= 0 && res <= 12)
    }
  }
}
