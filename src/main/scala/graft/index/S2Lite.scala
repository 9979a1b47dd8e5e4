package graft.index

/**
 * S2-style hierarchical cell index: cube-face projection + per-face Hilbert
 * curve (the published S2 cell design — quadratic face→ST transform for
 * near-uniform cell area, Hilbert locality within each face; re-derived
 * from the public S2 geometry documentation and the public-domain Hilbert
 * d↔(x,y) algorithm — no S2 code used). Unlike Z2 over equirectangular
 * lon/lat, cells have no polar singularity and bounded aspect distortion,
 * which is what BASELINE.json's north star asks of the "H3/S2" index tier.
 *
 * Cell id layout: `raw = (face << 2L) | hilbertPos`, packed as
 * `id = (raw << 5) | L` — the same (value, resolution) packing as
 * [[Z2]], so ids sort, compare and join natively. Parent cells are
 * prefixes: `parent(id, L') = pack(raw >> 2(L-L'), L')` (the Hilbert
 * position is hierarchical: truncating the recursion at a coarser level
 * truncates the position bits).
 *
 * MaxLevel 27 keeps `6 * 4^27 << 5` within 63 bits.
 */
object S2Lite {
  val MaxLevel = 27

  // ---- sphere <-> face/(u,v) ----

  /** (face 0..5, u, v) for a lon/lat point. Faces 0/1/2 = +x/+y/+z,
    * 3/4/5 = -x/-y/-z; u,v = the two minor components divided by |major|
    * in fixed axis order (x:(y,z), y:(x,z), z:(x,y)). */
  def faceUV(lonDeg: Double, latDeg: Double): (Int, Double, Double) = {
    val lon = math.toRadians(lonDeg); val lat = math.toRadians(latDeg)
    val x = math.cos(lat) * math.cos(lon)
    val y = math.cos(lat) * math.sin(lon)
    val z = math.sin(lat)
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) (if (x >= 0) 0 else 3, y / ax, z / ax)
    else if (ay >= ax && ay >= az) (if (y >= 0) 1 else 4, x / ay, z / ay)
    else (if (z >= 0) 2 else 5, x / az, y / az)
  }

  /** Unit-sphere point for (face, u, v); u/v may lie outside [-1,1] (the
    * face plane extends past the cube edge — used for cross-face
    * neighbors). Returns (lonDeg, latDeg). */
  def faceUVToLonLat(face: Int, u: Double, v: Double): (Double, Double) = {
    val (x, y, z) = face match {
      case 0 => (1.0, u, v)
      case 3 => (-1.0, u, v)
      case 1 => (u, 1.0, v)
      case 4 => (u, -1.0, v)
      case 2 => (u, v, 1.0)
      case _ => (u, v, -1.0)
    }
    val r = math.sqrt(x * x + y * y + z * z)
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(math.asin(z / r)))
  }

  /** Quadratic ST transform (S2's area-uniformizing projection):
    * u ∈ [-1,1] → s ∈ [0,1]. */
  @inline def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  /** Inverse of [[uvToST]]; monotonic and well-defined slightly outside
    * [0,1] too (cross-face neighbor probes rely on that). */
  @inline def stToUV(s: Double): Double =
    if (s >= 0.5) (4 * s * s - 1) / 3 else (1 - 4 * (1 - s) * (1 - s)) / 3

  // ---- Hilbert curve (public-domain iterative algorithm) ----

  /** (i,j) → Hilbert position within a 2^level × 2^level grid. */
  def hilbertPos(level: Int, iIn: Long, jIn: Long): Long = {
    val n = 1L << level
    var x = iIn; var y = jIn
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant (full-width complement: later steps only read
      // bits below s, where n-1-x equals the local complement)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert position → (i,j). */
  def hilbertXY(level: Int, dIn: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = dIn
    var s = 1L
    while (s < (1L << level)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  // ---- cell ids ----

  @inline def pack(raw: Long, level: Int): Long = (raw << 5) | level.toLong
  @inline def levelOf(id: Long): Int = (id & 0x1fL).toInt
  @inline def rawOf(id: Long): Long = id >>> 5
  @inline def faceOf(id: Long): Int = (rawOf(id) >>> (2 * levelOf(id))).toInt
  @inline def posOf(id: Long): Long = rawOf(id) & ((1L << (2 * levelOf(id))) - 1)

  def encode(lonDeg: Double, latDeg: Double, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of [0, $MaxLevel]")
    val (face, u, v) = faceUV(lonDeg, latDeg)
    encodeFaceST(face, uvToST(u), uvToST(v), level)
  }

  def encodeFaceST(face: Int, s: Double, t: Double, level: Int): Long = {
    val n = 1L << level
    def clamp(x: Long) = if (x < 0) 0L else if (x >= n) n - 1 else x
    val i = clamp(math.floor(s * n).toLong)
    val j = clamp(math.floor(t * n).toLong)
    val pos = if (level == 0) 0L else hilbertPos(level, i, j)
    pack((face.toLong << (2 * level)) | pos, level)
  }

  def parent(id: Long, coarserLevel: Int): Long = {
    val l = levelOf(id)
    require(coarserLevel <= l, s"parent level $coarserLevel > cell level $l")
    pack(rawOf(id) >>> (2 * (l - coarserLevel)), coarserLevel)
  }

  def children(id: Long): Array[Long] = {
    val l = levelOf(id)
    require(l < MaxLevel, "already at max level")
    Array.tabulate(4)(q => pack((rawOf(id) << 2) | q, l + 1))
  }

  /** Cell center as (lonDeg, latDeg). */
  def center(id: Long): (Double, Double) = {
    val l = levelOf(id)
    val n = 1L << l
    val (i, j) = if (l == 0) (0L, 0L) else hilbertXY(l, posOf(id))
    val s = (i + 0.5) / n
    val t = (j + 0.5) / n
    faceUVToLonLat(faceOf(id), stToUV(s), stToUV(t))
  }

  /** The ≤8 edge/corner-touching cells, including across cube faces:
    * same-face steps re-encode (face, s', t') directly; out-of-face steps
    * go through the (unclamped) face plane → sphere → re-encode. */
  def neighbors(id: Long): Array[Long] = {
    val l = levelOf(id)
    val n = 1L << l
    val face = faceOf(id)
    val (i, j) = if (l == 0) (0L, 0L) else hilbertXY(l, posOf(id))
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var di = -1
    while (di <= 1) {
      var dj = -1
      while (dj <= 1) {
        if (di != 0 || dj != 0) {
          val ni = i + di; val nj = j + dj
          val cell =
            if (ni >= 0 && ni < n && nj >= 0 && nj < n)
              pack((face.toLong << (2 * l)) | hilbertPos(l, ni, nj), l)
            else {
              // step to the neighbor cell's center through the face plane
              val s = (ni + 0.5) / n
              val t = (nj + 0.5) / n
              val (lon, lat) = faceUVToLonLat(face, stToUV(s), stToUV(t))
              encode(lon, lat, l)
            }
          if (cell != id) out += cell
        }
        dj += 1
      }
      di += 1
    }
    out.toArray
  }

  /**
   * Cells at `level` covering a lon/lat bbox — sound over-approximation by
   * sampled encode + one-ring neighbor closure: the sample grid steps at
   * under half the minimum cell angular extent (quadratic projection keeps
   * cell edges within ~1.5× of the nominal 90°/2^level), so every cell
   * intersecting the box either contains a sample or touches a cell that
   * does; the neighbor closure adds the latter. Distinct, unordered.
   */
  def coverBBox(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                level: Int): Array[Long] = {
    val cellDeg = 90.0 / (1L << level)
    val step = cellDeg / 3.0
    val seeds = scala.collection.mutable.LinkedHashSet[Long]()
    val latLo = math.max(-90.0, latMin); val latHi = math.min(90.0, latMax)
    var lat = latLo
    var continueLat = true
    while (continueLat) {
      if (lat >= latHi) { lat = latHi; continueLat = false }
      // WIDEN lon steps by 1/cos(lat): cells are metrically uniform (cube
      // face), so near the poles a cell spans MORE lon degrees and a
      // metric-constant sample step needs FEWER lon samples per row —
      // shrinking here would make high-latitude boxes a per-row CPU bomb
      // without adding completeness
      val lonStep = step / math.max(0.05, math.cos(math.toRadians(math.min(89.0, math.abs(lat)))))
      var lon = lonMin
      var continueLon = true
      while (continueLon) {
        if (lon >= lonMax) { lon = lonMax; continueLon = false }
        seeds += encode(lon, lat, level)
        lon += lonStep
      }
      lat += step
    }
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    seeds.foreach { c => out += c; neighbors(c).foreach(out += _) }
    out.toArray
  }

  /** Per-box adaptive cover: the finest ladder level whose estimated cover
    * fits `budget`, then [[coverBBox]] at that level. Each box gets its OWN
    * resolution — one world-sized polygon in the input no longer coarsens
    * every other row's cover (the r2 global-widest-polygon degrade). */
  def coverBBoxBudget(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                      budget: Int, levels: Array[Int]): Array[Long] = {
    val l = chooseLevel(lonMin, latMin, lonMax, latMax, budget, levels)
    coverBBox(lonMin, latMin, lonMax, latMax, l)
  }

  /** Cover size guard: the finest level from `levels` whose cover stays
    * under `budget` (probe on the seed grid count, cheap upper bound). */
  def chooseLevel(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                  budget: Int, levels: Array[Int]): Int = {
    var i = levels.length - 1
    def estimate(l: Int): Long = {
      val cellDeg = 90.0 / (1L << l)
      val nLat = ((latMax - latMin) / (cellDeg / 3.0)).toLong + 2
      val nLon = ((lonMax - lonMin) / (cellDeg / 3.0)).toLong + 2
      nLat * nLon * 9 / 4 // seeds × ring factor, conservative
    }
    while (i > 0 && estimate(levels(i)) > budget) i -= 1
    levels(i)
  }
}
