package graft.index

/**
 * Z2 space-filling curve over (lon, lat) — the Spark-native analog of the
 * reference's bit-interleaved GeoHash (reference:
 * geomesa-utils/.../geohash/GeoHash.scala:149-160 interleaves lon/lat bits;
 * we do the same but keep the cell id as a packed Long instead of a base-32
 * string, which sorts, compares and joins natively in Tungsten rows).
 *
 * A cell id packs (z-value, resolution): `id = (z << 5) | res` where `res`
 * is bits-per-dimension (0..29). Lexicographic order of ids at one
 * resolution == Z-order; parents are prefixes of children (shift by 2 bits
 * per level), mirroring the reference's geohash prefix hierarchy.
 */
object Z2 {
  val MaxRes = 29 // 2*29 + 5 = 63 bits

  /** Spread the low 31 bits of x so there is a 0 bit between each
   *  ("Binary Magic Numbers" bit-interleave, public-domain bit hack). */
  @inline def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  @inline def squash(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }

  /** x in even bits (lon), y in odd bits (lat). */
  @inline def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  @inline def cellsPerDim(res: Int): Long = 1L << res

  /** Discretize lon [-180,180] to a grid coordinate at `res` bits. The top
   *  edge (lon=180 / lat=90) is clamped into the last cell, matching the
   *  reference's boundary handling (GeoHash.scala:149-160). */
  @inline def lonToX(lon: Double, res: Int): Long = {
    val n = cellsPerDim(res)
    val x = ((lon + 180.0) / 360.0 * n).toLong
    if (x < 0) 0L else if (x >= n) n - 1 else x
  }

  @inline def latToY(lat: Double, res: Int): Long = {
    val n = cellsPerDim(res)
    val y = ((lat + 90.0) / 180.0 * n).toLong
    if (y < 0) 0L else if (y >= n) n - 1 else y
  }

  /** Packed cell id for a point at resolution `res`. */
  def encode(lon: Double, lat: Double, res: Int): Long =
    pack(interleave(lonToX(lon, res), latToY(lat, res)), res)

  @inline def pack(z: Long, res: Int): Long = (z << 5) | res.toLong
  @inline def resOf(id: Long): Int = (id & 0x1fL).toInt
  @inline def zOf(id: Long): Long = id >>> 5

  def xOf(id: Long): Long = squash(zOf(id))
  def yOf(id: Long): Long = squash(zOf(id) >> 1)

  /** Ancestor of a cell at a coarser resolution. */
  def parent(id: Long, coarserRes: Int): Long = {
    val r = resOf(id)
    require(coarserRes <= r, s"parent res $coarserRes > cell res $r")
    pack(zOf(id) >>> (2 * (r - coarserRes)), coarserRes)
  }

  /** (lonMin, latMin, lonMax, latMax) of a cell. */
  def bounds(id: Long): (Double, Double, Double, Double) = {
    val r = resOf(id)
    val n = cellsPerDim(r).toDouble
    val x = xOf(id); val y = yOf(id)
    (x / n * 360.0 - 180.0, y / n * 180.0 - 90.0,
     (x + 1) / n * 360.0 - 180.0, (y + 1) / n * 180.0 - 90.0)
  }

  /** The ≤8 touching cells at the same resolution (reference:
   *  TouchingGeoHashes.scala). Clamps at poles, wraps at the anti-meridian. */
  def neighbors(id: Long): Array[Long] = {
    val r = resOf(id)
    val n = cellsPerDim(r)
    val x = xOf(id); val y = yOf(id)
    val out = Array.newBuilder[Long]
    var dx = -1
    while (dx <= 1) {
      var dy = -1
      while (dy <= 1) {
        if (dx != 0 || dy != 0) {
          val nx = ((x + dx) % n + n) % n // lon wraps
          val ny = y + dy
          if (ny >= 0 && ny < n) out += pack(interleave(nx, ny), r)
        }
        dy += 1
      }
      dx += 1
    }
    out.result().distinct
  }

  /** Number of cells at `res` intersecting the bbox (no enumeration). */
  def coverSize(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double, res: Int): Long = {
    val x0 = lonToX(lonMin, res); val x1 = lonToX(lonMax, res)
    val y0 = latToY(latMin, res); val y1 = latToY(latMax, res)
    (x1 - x0 + 1) * (y1 - y0 + 1)
  }

  /** All cells at `res` intersecting the bbox. Caller enforces budget via
   *  coverSize first (reference overflow path: QueryPlanners.scala:344-360
   *  degrades to a coarse range; we degrade to a coarser resolution). */
  def coverBBox(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double, res: Int): Array[Long] = {
    val x0 = lonToX(lonMin, res); val x1 = lonToX(lonMax, res)
    val y0 = latToY(latMin, res); val y1 = latToY(latMax, res)
    val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
    var i = 0
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) { out(i) = pack(interleave(x, y), res); i += 1; y += 1 }
      x += 1
    }
    out
  }

  /** Finest resolution from `levels` whose bbox cover fits `budget`;
   *  falls back to the coarsest level. */
  def chooseRes(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                budget: Int, levels: Array[Int]): Int = {
    var i = levels.length - 1
    while (i > 0 && coverSize(lonMin, latMin, lonMax, latMax, levels(i)) > budget) i -= 1
    levels(i)
  }

  /**
   * Sorted, merged [lo, hi] ranges of PACKED cell ids at `fineRes` covering
   * the bbox: the cover is enumerated at the coarser `coverRes`, each cover
   * cell expands to the contiguous fine-key interval of its descendants
   * (parents are bit prefixes, so a cover cell's subtree is one contiguous
   * z-range), and z-adjacent cover cells merge into one range. This is the
   * reference's range planning over SORTED keys
   * (geomesa-core/.../index/STIdxStrategy.scala:219-257 plans key ranges,
   * not just tablet pruning) — the ranges become `cell BETWEEN` conjuncts
   * that parquet row-group min/max stats prune inside hot buckets.
   */
  def coverRanges(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                  coverRes: Int, fineRes: Int): Array[(Long, Long)] = {
    require(fineRes >= coverRes, s"fineRes $fineRes < coverRes $coverRes")
    val shift = 2 * (fineRes - coverRes)
    val zs = coverBBox(lonMin, latMin, lonMax, latMax, coverRes).map(zOf).sorted
    val merged = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    zs.foreach { z =>
      if (merged.nonEmpty && merged.last(1) + 1 == z) merged.last(1) = z
      else merged += Array(z, z)
    }
    merged.map { r =>
      (pack(r(0) << shift, fineRes), pack(((r(1) + 1) << shift) - 1, fineRes))
    }.toArray
  }
}
