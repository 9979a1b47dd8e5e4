package graft.index

/**
 * Z3 spatio-temporal curve: bit-interleaved (lon, lat, time) for
 * time-windowed spatial queries — the third dimension the reference fakes
 * with its date-string key tier (reference: row = shard~type~geohash~
 * yyyyMMddHH, geomesa-core/.../data/AccumuloDataStore.scala:100-111;
 * real Z3 appears in later GeoMesa — here derived from the same public
 * bit-interleave construction as Z2).
 *
 * Time is handled GeoMesa-style as (period bin, offset-within-period):
 * `bin = epochSec / periodSec`, and the curve interleaves lon, lat and the
 * offset fraction. Join/prune key is the pair (bin, z3 cell id) — both
 * plain Longs, so a two-column equi-join/partition-prune.
 *
 * A packed id carries (z << 5) | res with res = bits per dimension (≤ 19:
 * 3*19 + 5 = 62 bits).
 */
object Z3 {
  val MaxRes = 19

  /** Put a 0,0 between each of the low 21 bits of v. */
  @inline def spread3(v: Long): Long = {
    var x = v & 0x1fffffL
    x = (x | (x << 32)) & 0x1f00000000ffffL
    x = (x | (x << 16)) & 0x1f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  @inline def squash3(v: Long): Long = {
    var x = v & 0x1249249249249249L
    x = (x | (x >> 2)) & 0x10c30c30c30c30c3L
    x = (x | (x >> 4)) & 0x100f00f00f00f00fL
    x = (x | (x >> 8)) & 0x1f0000ff0000ffL
    x = (x | (x >> 16)) & 0x1f00000000ffffL
    x = (x | (x >> 32)) & 0x1fffffL
    x
  }

  @inline def interleave(x: Long, y: Long, t: Long): Long =
    spread3(x) | (spread3(y) << 1) | (spread3(t) << 2)

  @inline def pack(z: Long, res: Int): Long = (z << 5) | res.toLong
  @inline def resOf(id: Long): Int = (id & 0x1fL).toInt
  @inline def zOf(id: Long): Long = id >>> 5
  def xOf(id: Long): Long = squash3(zOf(id))
  def yOf(id: Long): Long = squash3(zOf(id) >> 1)
  def tOf(id: Long): Long = squash3(zOf(id) >> 2)

  @inline private def clamp(v: Long, n: Long): Long =
    if (v < 0) 0L else if (v >= n) n - 1 else v

  /** Time-period bin of an epoch-seconds timestamp. */
  @inline def timeBin(epochSec: Long, periodSec: Long): Long = {
    // floorDiv so pre-epoch timestamps bin correctly
    Math.floorDiv(epochSec, periodSec)
  }

  /** Z3 cell id of (lon, lat, epochSec) at `res` bits/dim; the time
   *  dimension is the offset within the period bin. */
  def encode(lon: Double, lat: Double, epochSec: Long, periodSec: Long, res: Int): Long = {
    val n = 1L << res
    val x = clamp(((lon + 180.0) / 360.0 * n).toLong, n)
    val y = clamp(((lat + 90.0) / 180.0 * n).toLong, n)
    val off = epochSec - timeBin(epochSec, periodSec) * periodSec
    val t = clamp((off.toDouble / periodSec * n).toLong, n)
    pack(interleave(x, y, t), res)
  }

  /** Bounds (lonMin, latMin, tMinOff, lonMax, latMax, tMaxOff) of a cell;
   *  time bounds are offsets within the period. */
  def bounds(id: Long, periodSec: Long): (Double, Double, Double, Double, Double, Double) = {
    val r = resOf(id)
    val n = (1L << r).toDouble
    val x = xOf(id); val y = yOf(id); val t = tOf(id)
    (x / n * 360.0 - 180.0, y / n * 180.0 - 90.0, t / n * periodSec,
     (x + 1) / n * 360.0 - 180.0, (y + 1) / n * 180.0 - 90.0, (t + 1) / n * periodSec)
  }

  /** Cells intersecting a (bbox × time-offset-range) query within one
   *  period bin (caller enumerates bins; reference analog: per-day key
   *  ranges from DatePlanner, QueryPlanners.scala:426-496). */
  def coverBBoxTime(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                    offMin: Long, offMax: Long, periodSec: Long, res: Int): Array[Long] = {
    val n = 1L << res
    val x0 = clamp(((lonMin + 180.0) / 360.0 * n).toLong, n)
    val x1 = clamp(((lonMax + 180.0) / 360.0 * n).toLong, n)
    val y0 = clamp(((latMin + 90.0) / 180.0 * n).toLong, n)
    val y1 = clamp(((latMax + 90.0) / 180.0 * n).toLong, n)
    val t0 = clamp((offMin.toDouble / periodSec * n).toLong, n)
    val t1 = clamp((offMax.toDouble / periodSec * n).toLong, n)
    val out = Array.newBuilder[Long]
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) {
        var t = t0
        while (t <= t1) { out += pack(interleave(x, y, t), res); t += 1 }
        y += 1
      }
      x += 1
    }
    out.result()
  }
}
