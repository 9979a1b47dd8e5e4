package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector-LSH expressions over array<float> embedding columns
  * (runtime kernels in [[VecRT]]; driver computes the same keys without a
  * job). */

/** lsh_key(vec, bits) → sign-of-projection bucket key. */
case class LshKey(left: Expression, right: Expression) extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, b: Any): Any =
    VecRT.lshKey(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray(),
      b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b) =>
      s"graft.functions.VecRT.lshKey($v.toFloatArray(), $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** lsh_probes(vec, bits, nprobe) → array<long> multiprobe key set (base
  * key + single flips of the nprobe-1 weakest signs). */
case class LshProbes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, b: Any, n: Any): Any =
    new GenericArrayData(VecRT.lshProbes(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray(),
      b.asInstanceOf[Int], n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecRT.lshProbes($v.toFloatArray(), $b, $n))")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t)
}

/** Column API + SQL registration for vector expressions. */
object vx {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftshim.ColumnShim
  private def col(e: Expression): Column = ColumnShim.column(e)
  private def ex(c: Column): Expression = ColumnShim.expression(c)

  def lshKey(vec: Column, bits: Column): Column = col(LshKey(ex(vec), ex(bits)))
  def lshProbes(vec: Column, bits: Column, nprobe: Column): Column =
    col(LshProbes(ex(vec), ex(bits), ex(nprobe)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("lsh_key", es => LshKey(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("lsh_probes", es => LshProbes(es(0), es(1), es(2)), "built-in")
  }
}
