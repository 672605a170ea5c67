package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<double>`
  * columns, with whole-stage codegen.
  *
  * Why a custom Expression (the brief's preference order (b)): the
  * higher-order-function formulation `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` materializes an intermediate array per row and evaluates
  * a lambda per element; this compiles to a tight primitive loop over
  * the two `ArrayData` buffers — no allocation, no virtual calls —
  * which matters when ANN scoring computes millions of dot products
  * per partition. Accumulation order is the same left-to-right fold,
  * so results are bit-identical to the HOF version
  * ([[VectorOps.dot]]).
  *
  * Nulls: a null array yields null (BinaryExpression's default
  * null-safety); null *elements* are not expected (embeddings are
  * dense) and read as 0-bits per ArrayData semantics.
  *
  * Registered for SQL as `graft_dot` via [[graft.GraftExtensions]];
  * DataFrame callers use [[VectorOps.dotNative]] (no registration
  * needed).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // (return type inferred — AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}
