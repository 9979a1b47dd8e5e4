package graft.index

/**
 * XZ2: single-cell assignment for extended objects (boxes/lines/polygons) —
 * the "extended node" variant of Z2 (Böhm/Klump/Kriegel "XZ-Ordering", a
 * published index for spatially extended objects). Where the reference
 * multi-indexes a non-point geometry into ≤5 geohashes and dedupes at query
 * time (geomesa-core/.../index/STIndexEntry.scala:45-59), XZ assigns exactly
 * ONE cell: the quadtree cell anchored at the envelope's min corner whose
 * DOUBLED extent covers the envelope. One index row per geometry → no
 * duplicates, no post-join dedupe.
 *
 * Query side: a window W matches every geometry whose enlarged cell
 * intersects W, i.e. candidate cells at each res r are the cells
 * intersecting W *expanded by one cell width* at r (a cell anchored up to
 * one width left/below W can still reach into W once doubled).
 */
object XZ2 {
  val MaxRes: Int = Z2.MaxRes

  /** Finest res where the envelope fits inside a doubled cell anchored at
   *  the envelope's min-corner cell. */
  def resFor(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double, maxRes: Int): Int = {
    val w = (lonMax - lonMin) / 360.0
    val h = (latMax - latMin) / 180.0
    val ext = math.max(w, h)
    // doubled cell at res r has normalized width 2 * 2^-r; need ext <= 2^-r
    // (then [min, min+ext] ⊆ [anchor, anchor + 2*cellW) always holds)
    if (ext <= 0) maxRes
    else {
      var r = math.min(maxRes, math.max(0, math.floor(-math.log(ext) / math.log(2.0)).toInt))
      // FP guard: the one-cell-width query expansion is only sound while
      // ext <= 2^-r (envelope spans at most one cell width)
      while (r > 0 && math.pow(2.0, -r) < ext) r -= 1
      r
    }
  }

  /** The single XZ2 cell id of an envelope. */
  def encode(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double, maxRes: Int = MaxRes): Long = {
    val r = resFor(lonMin, latMin, lonMax, latMax, maxRes)
    Z2.encode(lonMin, latMin, r)
  }

  /**
   * Largest safe maxRes for a join whose widest query window is
   * `maxW`×`maxH` degrees: the finest resolution at which the CUMULATIVE
   * query cover (all levels 0..r, each expanded one cell width down/left)
   * still fits `budget`. Degrading maxRes is only sound when BOTH sides of
   * the join use it — the encode side must not index finer than the query
   * cover enumerates (coarser cells over-approximate soundly; reference
   * overflow path: QueryPlanners.scala:344-360).
   */
  def maxResForBudget(maxW: Double, maxH: Double, maxRes: Int, budget: Int = 65536): Int = {
    var r = 0
    var total = 0L
    var best = 0
    while (r <= maxRes) {
      val cellW = 360.0 / (1L << r)
      val cellH = 180.0 / (1L << r)
      // worst-case cell count for a maxW×maxH window expanded one cell
      // width: floor(w/cellW)+3 columns (fractional span +1, expansion +1,
      // anchor straddle +1) — a strict upper bound on Z2.coverSize, so the
      // per-window `require` in queryCover can never fire at this res
      val cols = math.min(1L << r, (maxW / cellW).toLong + 3)
      val rows = math.min(1L << r, (maxH / cellH).toLong + 3)
      total += cols * rows
      if (total > budget) return best
      best = r
      r += 1
    }
    best
  }

  /** Candidate XZ2 cells (all resolutions 0..maxRes) for a query window:
   *  cells whose doubled extent could intersect the window. Used as the
   *  probe-side key set of an XZ join. */
  /** Budget default matches the reference's enumerated-key cap
    * (MAX_KEYS_IN_LIST = 65536, QueryPlanners.scala:272-274). */
  def queryCover(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                 maxRes: Int = MaxRes, budget: Int = 65536): Array[Long] = {
    val out = Array.newBuilder[Long]
    var r = 0
    var total = 0L
    while (r <= maxRes) {
      val cellW = 360.0 / (1L << r)
      val cellH = 180.0 / (1L << r)
      // expand down/left one cell width: anchors there still reach into W
      val exLonMin = math.max(-180.0, lonMin - cellW)
      val exLatMin = math.max(-90.0, latMin - cellH)
      val sz = Z2.coverSize(exLonMin, exLatMin, lonMax, latMax, r)
      // never truncate silently — a missing res level would drop matches;
      // callers pick a smaller maxRes for the whole join instead
      require(total + sz <= budget,
        s"xz2 query cover exceeds budget $budget at res $r; lower maxRes")
      total += sz
      out ++= Z2.coverBBox(exLonMin, exLatMin, lonMax, latMax, r)
      r += 1
    }
    out.result()
  }
}
