package graft

import graft.index.Z2
import org.scalatest.funsuite.AnyFunSuite

/** Pure unit + property-style tests (seeded random sampling) for the Z2
  * curve — everything else (covers, joins, pruning) leans on these
  * invariants (SURVEY.md §7.1 item 2). */
class Z2Spec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def lons = Array.fill(200)(rnd.nextDouble() * 360.0 - 180.0)
  private def lats = Array.fill(200)(rnd.nextDouble() * 180.0 - 90.0)

  test("spread/squash round-trip") {
    (0 until 500).foreach { _ =>
      val v = rnd.nextLong() & 0x7fffffffL
      assert(Z2.squash(Z2.spread(v)) === v)
    }
  }

  test("interleave splits back to x and y") {
    (0 until 500).foreach { _ =>
      val x = rnd.nextLong() & ((1L << 29) - 1)
      val y = rnd.nextLong() & ((1L << 29) - 1)
      val z = Z2.interleave(x, y)
      assert(Z2.squash(z) === x)
      assert(Z2.squash(z >> 1) === y)
    }
  }

  test("encode puts the point inside its cell bounds") {
    for (lon <- lons; lat <- lats.take(5); res <- Seq(1, 5, 12, 29)) {
      val id = Z2.encode(lon, lat, res)
      val (x0, y0, x1, y1) = Z2.bounds(id)
      assert(lon >= x0 - 1e-9 && lon <= x1 + 1e-9, s"lon $lon not in [$x0,$x1] res $res")
      assert(lat >= y0 - 1e-9 && lat <= y1 + 1e-9, s"lat $lat not in [$y0,$y1] res $res")
      assert(Z2.resOf(id) === res)
    }
  }

  test("boundary clamping: lon=180 / lat=90 land in the last cell") {
    for (res <- Seq(1, 5, 12)) {
      val id = Z2.encode(180.0, 90.0, res)
      assert(Z2.xOf(id) === Z2.cellsPerDim(res) - 1)
      assert(Z2.yOf(id) === Z2.cellsPerDim(res) - 1)
    }
  }

  test("parent contains child (prefix hierarchy) and is encode at coarser res") {
    for (lon <- lons.take(50); lat <- lats.take(4)) {
      val fine = Z2.encode(lon, lat, Z2.MaxRes)
      for (coarse <- Seq(1, 3, 7, 15, 28)) {
        val p = Z2.parent(fine, coarse)
        assert(p === Z2.encode(lon, lat, coarse), s"parent mismatch at res $coarse")
        val (px0, py0, px1, py1) = Z2.bounds(p)
        val (cx0, cy0, cx1, cy1) = Z2.bounds(fine)
        assert(px0 <= cx0 + 1e-12 && py0 <= cy0 + 1e-12 && px1 >= cx1 - 1e-12 && py1 >= cy1 - 1e-12)
      }
      assert(Z2.parent(fine, Z2.MaxRes) === fine)
    }
  }

  test("neighbors: adjacency, antimeridian wrap, pole clamp") {
    val c = Z2.encode(0.5, 0.5, 5)
    val ns = Z2.neighbors(c)
    assert(ns.length === 8)
    assert(!ns.contains(c))
    ns.foreach { n =>
      assert(Z2.resOf(n) === 5)
      val dxRaw = math.abs(Z2.xOf(n) - Z2.xOf(c))
      val dx = math.min(dxRaw, Z2.cellsPerDim(5) - dxRaw) // wrap-aware
      val dy = math.abs(Z2.yOf(n) - Z2.yOf(c))
      assert(dx <= 1 && dy <= 1)
    }
    val top = Z2.encode(0.5, 89.99, 3)
    assert(Z2.neighbors(top).length === 5)
    val left = Z2.encode(-179.99, 0.5, 3)
    assert(Z2.neighbors(left).exists(n => Z2.xOf(n) === Z2.cellsPerDim(3) - 1))
  }

  test("coverBBox covers the encode of any point inside the bbox") {
    for (lon <- lons.take(40); lat <- lats.take(4)) {
      val lonC = math.min(lon, 179.0); val latC = math.min(lat, 89.0)
      for (res <- Seq(2, 5, 8)) {
        val cells = Z2.coverBBox(lonC, latC, lonC + 0.5, latC + 0.5, res)
        assert(cells.length === Z2.coverSize(lonC, latC, lonC + 0.5, latC + 0.5, res))
        assert(cells.contains(Z2.encode(lonC + 0.25, latC + 0.25, res)))
      }
    }
  }

  test("chooseRes picks finest level within budget, degrades on overflow") {
    val levels = Array(3, 5, 7, 9, 12)
    val r = Z2.chooseRes(-180, -90, 180, 90, 256, levels)
    assert(Z2.coverSize(-180, -90, 180, 90, r) <= 256 || r === levels.head)
    assert(Z2.chooseRes(0, 0, 0.001, 0.001, 256, levels) === 12)
  }
}
