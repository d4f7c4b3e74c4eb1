package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst kernel for the embedding dot product — the hottest
  * vector-math path (brute-force cosine, IVF assignment/probe, LSH
  * projections, embedding near-dup verification all reduce to it).
  *
  * Why a custom `Expression`: the higher-order-function form
  * `aggregate(zip_with(a, b, x·y), 0.0, +)` materializes an intermediate
  * array and evaluates a lambda per element OUTSIDE whole-stage codegen
  * (higher-order functions are interpreted in Spark). This node compiles to
  * a plain Java loop via `doGenCode` — same left-to-right double
  * accumulation, so results are bit-identical to the HOF fold (and to
  * DuckDB's `list_dot_product`, which the oracle queries hash against).
  *
  * Null semantics mirror the HOF form exactly: a null array → null; a null
  * element or a length mismatch (zip_with pads with null) → null.
  */
object VectorKernel {
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  // nullable even for non-null inputs: length mismatch / null element → null
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product expects array<float|double>, got $t")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.plans.VectorKernel.dot(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column-API entry point. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expr(a), GraftColumnBridge.expr(b)))
}
