package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/**
 * Geometry ⇄ bytes plumbing. Row format is WKB in a BinaryType column —
 * JTS objects never sit in Tungsten rows (SURVEY.md §1.4: "keep JTS off the
 * row format"). Readers/writers are stateful in JTS, so they live in
 * ThreadLocals (the reference caches per-thread decoders the same way,
 * STIndexEntry.scala:115-121).
 */
object GeomCodec {
  val factory = new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), 4326)

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))

  def fromWkb(b: Array[Byte]): Geometry = wkbReader.get.read(b)

  /**
   * Decode with a 2D-point fast path: a plain (no SRID/Z) WKB point is
   * exactly 21 bytes — byte order, uint32 type == 1, two doubles — and is
   * the probe-side shape of every page-scale join, so skipping the
   * WKBReader stream machinery removes most of the per-row refine
   * allocation. Anything else falls back to the full reader.
   */
  def fromWkbFast(b: Array[Byte]): Geometry =
    if (b != null && b.length == 21 && (b(0) == 0 || b(0) == 1)) {
      val bb = java.nio.ByteBuffer.wrap(b)
      bb.order(if (b(0) == 1) java.nio.ByteOrder.LITTLE_ENDIAN
               else java.nio.ByteOrder.BIG_ENDIAN)
      if (bb.getInt(1) == 1)
        factory.createPoint(new Coordinate(bb.getDouble(5), bb.getDouble(13)))
      else fromWkb(b)
    } else fromWkb(b)
  def toWkb(g: Geometry): Array[Byte] = wkbWriter.get.write(g)
  def fromWkt(s: String): Geometry = wktReader.get.read(s)
  def toWkt(g: Geometry): String = wktWriter.get.write(g)

  def point(lon: Double, lat: Double): Geometry =
    factory.createPoint(new Coordinate(lon, lat))

  def box(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geometry =
    factory.toGeometry(new Envelope(xmin, xmax, ymin, ymax))

  /**
   * Per-thread memo of the most recent decoded geometry, keyed by the byte
   * array's object identity. Literal predicates (query windows) and the
   * build side of broadcast joins re-present the SAME array instance every
   * row, so the query geometry is parsed and prepared once per thread
   * instead of once per row — the Spark analog of the reference's one-time
   * iterator setup (SpatioTemporalIntersectingIterator.scala:56-70).
   */
  private final class Memo {
    var key: Array[Byte] = _
    var geom: Geometry = _
    var prep: PreparedGeometry = _
  }
  private val memo = ThreadLocal.withInitial[Memo](() => new Memo)

  def prepared(b: Array[Byte]): PreparedGeometry = {
    val m = memo.get
    if (m.key ne b) {
      m.key = b
      m.geom = fromWkb(b)
      m.prep = null
    }
    if (m.prep == null) m.prep = PreparedGeometryFactory.prepare(m.geom)
    m.prep
  }

  def cached(b: Array[Byte]): Geometry = {
    val m = memo.get
    if (m.key ne b) {
      m.key = b
      m.geom = fromWkb(b)
      m.prep = null
    } else if (m.geom == null) m.geom = fromWkb(b)
    m.geom
  }
}
