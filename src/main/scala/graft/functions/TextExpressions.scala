package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-pipeline expressions over [[TextRT]] (dedup signatures,
 *  language-ID, quality scoring, fingerprinting). */

/** minhash(text, numHashes, shingleSize) → array<long>. */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any, n: Any, s: Any): Any =
    new GenericArrayData(TextRT.minHash(t.asInstanceOf[UTF8String].toString,
      n.asInstanceOf[Int], s.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, s) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.TextRT.minHash($t.toString(), $n, $s))")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** lsh_bands(sig, rowsPerBand) → array<long> of band bucket keys. */
case class LshBands(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(sig: Any, r: Any): Any = {
    val arr = sig.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    new GenericArrayData(TextRT.lshBands(arr, r.asInstanceOf[Int]))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sig, r) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.TextRT.lshBands($sig.toLongArray(), $r))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

abstract class TextToLong(fn: String) extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextRT.$fn($t.toString())")
}

case class SimHash64(child: Expression) extends TextToLong("simHash") {
  override protected def nullSafeEval(t: Any): Any =
    TextRT.simHash(t.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** fingerprint(text, window) → long. */
case class Fingerprint(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any, w: Any): Any =
    TextRT.fingerprint(t.asInstanceOf[UTF8String].toString, w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.functions.TextRT.fingerprint($t.toString(), $w)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class LangGuess(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    UTF8String.fromString(TextRT.langGuess(t.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.TextRT.langGuess($t.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class QualityScore(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    TextRT.qualityScore(t.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextRT.qualityScore($t.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class TokenCount(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    TextRT.tokenCount(t.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextRT.tokenCount($t.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** shingle_hashes(text, n) → sorted distinct array<long> of word-n-gram
  * FNV hashes (the ngram_jaccard set, precomputed once per document). */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any, n: Any): Any =
    new GenericArrayData(TextRT.shingleHashes(
      t.asInstanceOf[UTF8String].toString, n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.TextRT.shingleHashes($t.toString(), $n))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sorted_jaccard(a, b) → double over two shingle_hashes arrays — the same
  * value ngram_jaccard(textA, textB, n) returns, at merge cost per pair. */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextRT.sortedJaccard(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(),
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextRT.sortedJaccard($a.toLongArray(), $b.toLongArray())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** ngram_jaccard(a, b, n) → double — exact verify for LSH candidates. */
case class NgramJaccard(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, n: Any): Any =
    TextRT.ngramJaccard(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, n) =>
      s"graft.functions.TextRT.ngramJaccard($a.toString(), $b.toString(), $n)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** hamming(a, b) → int — SimHash near-dup distance. */
case class Hamming64(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextRT.hammingDist(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dms_to_deg(str) → decimal degrees; null for unparseable/out-of-range
  * (reference F9 DMS parsing, csv/DMS.scala:44-67). */
case class DmsToDeg(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any = {
    val v = TextRT.dmsToDeg(t.asInstanceOf[UTF8String].toString)
    if (java.lang.Double.isNaN(v)) null else v
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = graft.functions.TextRT.dmsToDeg($t.toString());
         |if (java.lang.Double.isNaN(${ev.value})) ${ev.isNull} = true;
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** deg_to_dms(deg, isLat) → "d:mm:ss.ssH" string (reference DMS.toString). */
case class DegToDms(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(d: Any, isLat: Any): Any =
    UTF8String.fromString(TextRT.degToDms(d.asInstanceOf[Double], isLat.asInstanceOf[Boolean]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, b) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.TextRT.degToDms($d, $b))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
