package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Media expressions over binary payload columns — image branch backed by
  * REAL JDK `javax.imageio` codecs ([[ImageRT]]); all null-tolerant
  * (undecodable bytes → null, never an exception). */

/** image_meta(payload) → struct(width, height, format) from a header-only
  * parse; null when the bytes are not a decodable image. */
case class ImageMetaExpr(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ImageRT.imageMetaRow(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.ImageRT.imageMetaRow($v);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** image_resize(payload, w, h) → PNG bytes of the bilinear-resized image. */
case class ImageResizeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, w: Any, h: Any): Any =
    ImageRT.imageResize(v.asInstanceOf[Array[Byte]], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, w, h) =>
      s"""
         |${ev.value} = graft.functions.ImageRT.imageResize($v, $w, $h);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t)
}

/** image_luma_hist(payload, bins) → luminance histogram over decoded
  * pixels. */
case class ImageLumaHist(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, b: Any): Any = {
    val h = ImageRT.lumaHistogram(v.asInstanceOf[Array[Byte]], b.asInstanceOf[Int])
    if (h == null) null else new GenericArrayData(h)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"""
         |long[] h = graft.functions.ImageRT.lumaHistogram($v, $b);
         |if (h == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(h); }
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** audio_meta(payload) → struct(sample_rate, channels, frames) via JDK
  * javax.sound.sampled; null when not decodable audio. */
case class AudioMetaExpr(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("frames", LongType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    AudioRT.audioMeta(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.AudioRT.audioMeta($v);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** audio_rms_envelope(payload, bins) → fixed-point RMS energy per time
  * window over the decoded PCM signal. */
case class AudioRmsEnvelope(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, b: Any): Any = {
    val h = AudioRT.rmsEnvelope(v.asInstanceOf[Array[Byte]], b.asInstanceOf[Int])
    if (h == null) null else new GenericArrayData(h)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"""
         |long[] h = graft.functions.AudioRT.rmsEnvelope($v, $b);
         |if (h == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(h); }
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Column API + SQL registration for the media expressions. */
object mx {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftshim.ColumnShim
  private def col(e: Expression): Column = ColumnShim.column(e)
  private def ex(c: Column): Expression = ColumnShim.expression(c)

  def imageMeta(payload: Column): Column = col(ImageMetaExpr(ex(payload)))
  def imageResize(payload: Column, w: Column, h: Column): Column =
    col(ImageResizeExpr(ex(payload), ex(w), ex(h)))
  def imageLumaHist(payload: Column, bins: Column): Column =
    col(ImageLumaHist(ex(payload), ex(bins)))
  def audioMeta(payload: Column): Column = col(AudioMetaExpr(ex(payload)))
  def audioRmsEnvelope(payload: Column, bins: Column): Column =
    col(AudioRmsEnvelope(ex(payload), ex(bins)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("image_meta", es => ImageMetaExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("image_resize", es => ImageResizeExpr(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("image_luma_hist", es => ImageLumaHist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("audio_meta", es => AudioMetaExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("audio_rms_envelope", es => AudioRmsEnvelope(es(0), es(1)), "built-in")
  }
}
