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
  * little-endian viewer record, byte-compatible with the reference BIN
  * export format (geomesa-filter/.../Convert2ViewerFunction.scala:119-135,
  * `put`): track-id hash @0, whole seconds @4, lat @8, lon @12, all LE.
  * The 24-byte "reachback" form appends a 64-bit label @16 (:85-93). */
object BinEncodeRT {
  def encode(idHash: Int, lat: Float, lon: Float, dtgSec: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(idHash).putInt(dtgSec.toInt).putFloat(lat).putFloat(lon)
    bb.array()
  }
  def encodeExt(idHash: Int, lat: Float, lon: Float, dtgSec: Long,
                label: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(idHash).putInt(dtgSec.toInt).putFloat(lat).putFloat(lon).putLong(label)
    bb.array()
  }
  def decodeId(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(0)
  def decodeSec(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4)
  def decodeLat(b: Array[Byte]): Float =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat(8)
  def decodeLon(b: Array[Byte]): Float =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat(12)
  def decodeLabel(b: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong(16)
  /** Track-id key: Java String.hashCode, what the reference writes at @0
    * (Convert2ViewerFunction.scala:131 `trackId.map(_.hashCode)`). */
  def trackHash(id: org.apache.spark.unsafe.types.UTF8String): Int =
    id.toString.hashCode
  /** convert2viewer's label derivation (Convert2ViewerFunction.scala:43):
    * the first 8 bytes of the id, summed little-endian into a long. */
  def idLabel(id: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = id.getBytes // UTF8String already holds the UTF-8 bytes
    var out = 0L
    var i = 0
    while (i < bytes.length && i < 8) { out += (bytes(i) & 0xffL) << (8 * i); i += 1 }
    out
  }
  /** Full record decode as an InternalRow (the struct kernel [[BinDecode]]
    * calls from interpreted and generated code alike); 24-byte records
    * carry the label, 16-byte ones decode it as null. */
  def decodeRow(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    org.apache.spark.sql.catalyst.InternalRow(
      decodeId(b), decodeLat(b), decodeLon(b), decodeSec(b),
      // a full 24-byte record is required for the label (a 17-23-byte
      // truncated record must not crash the whole scan on getLong(16))
      if (b.length >= 24) decodeLabel(b) else null)
}

/** bin_decode(binary) → struct<id_hash:int, lat:float, lon:float, sec:int,
  * label:long> — the read half of [[BinEncode]] (reference
  * Convert2ViewerFunction decode, :152-171: 24-byte records yield
  * ExtendedValues with a label, 16-byte ones BasicValues → null label). */
case class BinDecode(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("id_hash", IntegerType, nullable = false),
    StructField("lat", FloatType, nullable = false),
    StructField("lon", FloatType, nullable = false),
    StructField("sec", IntegerType, nullable = false),
    StructField("label", LongType, nullable = true)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    BinEncodeRT.decodeRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.BinEncodeRT.decodeRow($b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** java_string_hash(string) → int — the exact track-id key the reference
  * BIN format stores (Java String.hashCode, not Murmur3). */
case class JavaStringHash(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    BinEncodeRT.trackHash(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.BinEncodeRT.trackHash($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** bin_label(string) → long — convert2viewer's id→label packing (first 8
  * id bytes summed LE), for the 24-byte reachback export. */
case class BinLabel(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    BinEncodeRT.idLabel(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.BinEncodeRT.idLabel($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** The 24-byte extended record: [[BinEncode]] plus a 64-bit label. */
case class BinEncodeExt(first: Expression, second: Expression, third: Expression,
                        fourth: Expression, fifth: Expression)
    extends QuinaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def children: Seq[Expression] = Seq(first, second, third, fourth, fifth)
  override protected def nullSafeEval(id: Any, lat: Any, lon: Any, sec: Any, label: Any): Any =
    BinEncodeRT.encodeExt(id.asInstanceOf[Int], lat.asInstanceOf[Float],
      lon.asInstanceOf[Float], sec.asInstanceOf[Long], label.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d, e) =>
      s"graft.functions.BinEncodeRT.encodeExt($a, $b, $c, $d, $e)")
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3), newChildren(4))
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
