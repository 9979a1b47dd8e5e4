package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Kernels + expressions for opaque binary (media) columns. */
object BinaryRT {
  /** Histogram of byte values folded into `bins` buckets. */
  def byteHistogram(b: Array[Byte], bins: Int): Array[Long] = {
    val out = new Array[Long](bins)
    var i = 0
    while (i < b.length) {
      out(((b(i) & 0xff) * bins) >>> 8) += 1
      i += 1
    }
    out
  }

  /** Deterministic content fingerprint of a binary payload (FNV-1a). */
  def binFingerprint(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Frame sampling: `n` evenly-spaced equal slices of the payload (the
    * Spark-side batch shape of video frame extraction; the real codec
    * decode is STUBBED — no media libs in this environment). */
  def frameSample(b: Array[Byte], n: Int): Array[Array[Byte]] = {
    if (n <= 0 || b.length == 0) return Array.empty
    val step = math.max(1, b.length / n)
    Array.tabulate(math.min(n, b.length)) { i =>
      val start = i * step
      java.util.Arrays.copyOfRange(b, start, math.min(b.length, start + step))
    }
  }
}

/** byte_histogram(binary, bins) → array<long>. */
case class ByteHistogram(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, n: Any): Any =
    new GenericArrayData(BinaryRT.byteHistogram(b.asInstanceOf[Array[Byte]], n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.BinaryRT.byteHistogram($b, $n))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** bin_fingerprint(binary) → long. */
case class BinFingerprint(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    BinaryRT.binFingerprint(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.BinaryRT.binFingerprint($b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** frame_sample(binary, n) → array<binary> (generator input for explode). */
case class FrameSample(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, n: Any): Any = {
    val frames = BinaryRT.frameSample(b.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
    new GenericArrayData(frames.asInstanceOf[Array[Any]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) graft.functions.BinaryRT.frameSample($b, $n))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** bin_encode(idHash int, lat float, lon float, dtgSec long) → 16-byte
  * little-endian viewer record — reference BIN export format
  * (geomesa-filter/.../Convert2ViewerFunction.scala:24-100: id-hash, lat,
  * lon, seconds packed LE). */
object BinEncodeRT {
  def encode(idHash: Int, lat: Float, lon: Float, dtgSec: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(idHash).putFloat(lat).putFloat(lon).putInt(dtgSec.toInt)
    bb.array()
  }
  def decodeLat(b: Array[Byte]): Float =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat(4)
  def decodeLon(b: Array[Byte]): Float =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat(8)
  def decodeId(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(0)
  def decodeSec(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(12)
  /** Full record decode as an InternalRow (the struct kernel [[BinDecode]]
    * calls from interpreted and generated code alike). */
  def decodeRow(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    org.apache.spark.sql.catalyst.InternalRow(
      decodeId(b), decodeLat(b), decodeLon(b), decodeSec(b))
}

/** bin_decode(binary) → struct<id_hash:int, lat:float, lon:float, sec:int> —
  * the read half of [[BinEncode]] (reference Convert2ViewerFunction decode,
  * geomesa-filter/.../Convert2ViewerFunction.scala:102-150). */
case class BinDecode(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("id_hash", IntegerType, nullable = false),
    StructField("lat", FloatType, nullable = false),
    StructField("lon", FloatType, nullable = false),
    StructField("sec", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    BinEncodeRT.decodeRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.BinEncodeRT.decodeRow($b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class BinEncode(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(id: Any, lat: Any, lon: Any, sec: Any): Any =
    BinEncodeRT.encode(id.asInstanceOf[Int], lat.asInstanceOf[Float],
      lon.asInstanceOf[Float], sec.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.functions.BinEncodeRT.encode($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(a, b, c, d)
}
