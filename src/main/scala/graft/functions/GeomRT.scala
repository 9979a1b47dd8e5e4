package graft.functions

import java.util.{LinkedHashMap => JLinkedHashMap, Map => JMap}

import graft.geom.{GeomCodec, Geodesy}
import graft.index.Z2
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/**
 * Runtime kernels for the ST_* / cell_* Catalyst expressions. Every method
 * is a static call over plain JVM types (Array[Byte], Double, Long) so
 * generated code can invoke it directly and whole-stage codegen spans stay
 * intact (the expressions' doGenCode emits `graft.functions.GeomRT.xxx(...)`).
 *
 * The first argument of each binary predicate is prepared and cached in a
 * per-thread LRU keyed by WKB content — in cell-join refinement the build
 * side (regions) repeats across probe matches, so each distinct geometry is
 * parsed + prepared once per thread, not once per output row. This is the
 * Spark analog of the reference's one-time iterator setup
 * (geomesa-core/.../iterators/SpatioTemporalIntersectingIterator.scala:56-70).
 */
object GeomRT {

  private final class BytesKey(val b: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(b)
    override def equals(o: Any): Boolean = o match {
      case k: BytesKey => (k.b eq b) || java.util.Arrays.equals(k.b, b)
      case _ => false
    }
  }

  private val prepCache = ThreadLocal.withInitial[JLinkedHashMap[BytesKey, PreparedGeometry]](() =>
    new JLinkedHashMap[BytesKey, PreparedGeometry](256, 0.75f, true) {
      override def removeEldestEntry(e: JMap.Entry[BytesKey, PreparedGeometry]): Boolean = size > 1024
    })

  def prepared(b: Array[Byte]): PreparedGeometry = {
    val cache = prepCache.get
    val key = new BytesKey(b)
    var p = cache.get(key)
    if (p == null) {
      p = PreparedGeometryFactory.prepare(GeomCodec.fromWkb(b))
      cache.put(key, p)
    }
    p
  }

  // ---- predicates (arg0 prepared) ----
  def contains(a: Array[Byte], b: Array[Byte]): Boolean = prepared(a).contains(GeomCodec.fromWkb(b))
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean = prepared(a).intersects(GeomCodec.fromWkb(b))
  def within(a: Array[Byte], b: Array[Byte]): Boolean = prepared(b).contains(GeomCodec.fromWkb(a))
  def covers(a: Array[Byte], b: Array[Byte]): Boolean = prepared(a).covers(GeomCodec.fromWkb(b))
  def overlaps(a: Array[Byte], b: Array[Byte]): Boolean = prepared(a).overlaps(GeomCodec.fromWkb(b))
  def crosses(a: Array[Byte], b: Array[Byte]): Boolean = prepared(a).crosses(GeomCodec.fromWkb(b))
  def touches(a: Array[Byte], b: Array[Byte]): Boolean = prepared(a).touches(GeomCodec.fromWkb(b))
  def disjoint(a: Array[Byte], b: Array[Byte]): Boolean = prepared(a).disjoint(GeomCodec.fromWkb(b))
  def equalsGeom(a: Array[Byte], b: Array[Byte]): Boolean =
    GeomCodec.fromWkb(a).equalsTopo(GeomCodec.fromWkb(b))

  /** Planar (degree-space) distance test without sqrt where possible. */
  def dwithinDeg(a: Array[Byte], b: Array[Byte], deg: Double): Boolean = {
    val ga = GeomCodec.fromWkb(a); val gb = GeomCodec.fromWkb(b)
    if (ga.getGeometryType == "Point" && gb.getGeometryType == "Point") {
      val ca = ga.getCoordinate; val cb = gb.getCoordinate
      val dx = ca.x - cb.x; val dy = ca.y - cb.y
      dx * dx + dy * dy < deg * deg
    } else ga.isWithinDistance(gb, deg)
  }

  /** Reference DWithin semantics: meters converted to a local degree buffer
   *  (FilterHelper.scala:111-123), then planar within-distance. */
  def dwithinMeters(a: Array[Byte], b: Array[Byte], meters: Double): Boolean = {
    val ga = GeomCodec.fromWkb(a); val gb = GeomCodec.fromWkb(b)
    val lat = ga.getCoordinate.y
    ga.isWithinDistance(gb, Geodesy.metersToDegrees(meters, lat))
  }

  // ---- measures ----
  def distance(a: Array[Byte], b: Array[Byte]): Double =
    GeomCodec.fromWkb(a).distance(GeomCodec.fromWkb(b))
  def distanceSphere(a: Array[Byte], b: Array[Byte]): Double = {
    val ca = GeomCodec.fromWkb(a).getCoordinate; val cb = GeomCodec.fromWkb(b).getCoordinate
    Geodesy.haversineMeters(ca.x, ca.y, cb.x, cb.y)
  }
  def distanceSpheroid(a: Array[Byte], b: Array[Byte]): Double = {
    val ca = GeomCodec.fromWkb(a).getCoordinate; val cb = GeomCodec.fromWkb(b).getCoordinate
    Geodesy.vincentyMeters(ca.x, ca.y, cb.x, cb.y)
  }
  def area(a: Array[Byte]): Double = GeomCodec.fromWkb(a).getArea
  def length(a: Array[Byte]): Double = GeomCodec.fromWkb(a).getLength

  // ---- constructors / transforms ----
  def point(lon: Double, lat: Double): Array[Byte] = GeomCodec.toWkb(GeomCodec.point(lon, lat))
  def makeBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Byte] =
    GeomCodec.toWkb(GeomCodec.box(xmin, ymin, xmax, ymax))
  def fromWkt(s: String): Array[Byte] = GeomCodec.toWkb(GeomCodec.fromWkt(s))
  def asText(b: Array[Byte]): String = GeomCodec.toWkt(GeomCodec.fromWkb(b))
  def centroid(b: Array[Byte]): Array[Byte] = GeomCodec.toWkb(GeomCodec.fromWkb(b).getCentroid)
  def envelope(b: Array[Byte]): Array[Byte] = GeomCodec.toWkb(GeomCodec.fromWkb(b).getEnvelope)
  def buffer(b: Array[Byte], d: Double): Array[Byte] = GeomCodec.toWkb(GeomCodec.fromWkb(b).buffer(d))
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    GeomCodec.toWkb(GeomCodec.fromWkb(a).union(GeomCodec.fromWkb(b)))
  def simplify(b: Array[Byte], tol: Double): Array[Byte] =
    GeomCodec.toWkb(org.locationtech.jts.simplify.TopologyPreservingSimplifier.simplify(GeomCodec.fromWkb(b), tol))

  // ---- accessors ----
  def x(b: Array[Byte]): Double = GeomCodec.fromWkb(b).getCoordinate.x
  def y(b: Array[Byte]): Double = GeomCodec.fromWkb(b).getCoordinate.y
  def xmin(b: Array[Byte]): Double = GeomCodec.fromWkb(b).getEnvelopeInternal.getMinX
  def ymin(b: Array[Byte]): Double = GeomCodec.fromWkb(b).getEnvelopeInternal.getMinY
  def xmax(b: Array[Byte]): Double = GeomCodec.fromWkb(b).getEnvelopeInternal.getMaxX
  def ymax(b: Array[Byte]): Double = GeomCodec.fromWkb(b).getEnvelopeInternal.getMaxY
  def geometryType(b: Array[Byte]): String = GeomCodec.fromWkb(b).getGeometryType
  def numPoints(b: Array[Byte]): Int = GeomCodec.fromWkb(b).getNumPoints
  def isValidGeom(b: Array[Byte]): Boolean = GeomCodec.fromWkb(b).isValid

  // ---- cell index ----
  def cellOf(b: Array[Byte], res: Int): Long = {
    val g = GeomCodec.fromWkb(b)
    val c = if (g.getGeometryType == "Point") g.getCoordinate else g.getCentroid.getCoordinate
    Z2.encode(c.x, c.y, res)
  }

  /** Cells at `res` intersecting the geometry (bbox enumeration + exact
   *  intersects filter for non-rectangles — reference decomposition:
   *  GeohashUtils.decomposeGeometry:723-739). */
  def cover(b: Array[Byte], res: Int): Array[Long] = {
    val g = GeomCodec.fromWkb(b)
    coverGeom(g, res)
  }

  def coverGeom(g: Geometry, res: Int): Array[Long] = {
    val env = g.getEnvelopeInternal
    val cand = Z2.coverBBox(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, res)
    if (g.isRectangle || g.getGeometryType == "Point") cand
    else {
      val prep = PreparedGeometryFactory.prepare(g)
      cand.filter { id =>
        val (x0, y0, x1, y1) = Z2.bounds(id)
        prep.intersects(GeomCodec.box(x0, y0, x1, y1))
      }
    }
  }

  /** Adaptive cover: finest resolution from `levels` whose bbox cover fits
   *  `budget` (reference cover budget: QueryPlanners.scala:272-274). */
  def coverBudget(b: Array[Byte], budget: Int, levels: Array[Int]): Array[Long] = {
    val g = GeomCodec.fromWkb(b)
    val env = g.getEnvelopeInternal
    val res = Z2.chooseRes(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, budget, levels)
    coverGeom(g, res)
  }

  def cellBox(id: Long): Array[Byte] = {
    val (x0, y0, x1, y1) = Z2.bounds(id)
    makeBox(x0, y0, x1, y1)
  }

  // ---- XZ2 extent index ----
  def xz2(b: Array[Byte], maxRes: Int): Long = {
    val env = GeomCodec.fromWkb(b).getEnvelopeInternal
    graft.index.XZ2.encode(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, maxRes)
  }

  def xz2QueryCover(b: Array[Byte], maxRes: Int): Array[Long] = {
    val env = GeomCodec.fromWkb(b).getEnvelopeInternal
    graft.index.XZ2.queryCover(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, maxRes)
  }

  /** WKB box of a base-32 geohash cell. */
  def geohashBoxWkb(hash: String): Array[Byte] = {
    val (x0, y0, x1, y1) = graft.index.GeoHashStr.decodeBounds(hash)
    makeBox(x0, y0, x1, y1)
  }
}
