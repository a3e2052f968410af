package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Codegen'd sequential dot product of two numeric arrays.
  *
  * The DataFrame-API formulation
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`) is correct but
  * runs Catalyst's *interpreted* higher-order-function path: three
  * array traversals, a materialized product array, and a boxed lambda
  * call per element. This expression emits a single fused
  * multiply-accumulate loop into whole-stage codegen — the kernel a
  * 100 TB similarity scan spends its time in.
  *
  * Semantics match the HOF version exactly: elements are widened to
  * double and accumulated left-to-right (same IEEE operation order, so
  * results are bit-identical to the HOF plan *and* to the DuckDB
  * oracle's `list_sum(list_transform(...))`), null elements count as
  * 0, and iteration stops at the shorter array.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|long|int> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else num(x, i, lt)
      val yv = if (y.isNullAt(i)) 0.0 else num(y, i, rt)
      acc += xv * yv
      i += 1
    }
    acc
  }

  private def num(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case LongType    => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
  }

  private def accessor(t: DataType): String = t match {
    case FloatType   => "getFloat"
    case DoubleType  => "getDouble"
    case LongType    => "getLong"
    case IntegerType => "getInt"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = accessor(elemType(left))
    val ra = accessor(elemType(right))
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // every local must be freshName'd: two dot_products in one
      // non-nullable codegen scope would otherwise declare duplicate
      // Java locals and knock the whole stage back to interpreted mode
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $x.isNullAt($i) ? 0.0 : (double) $x.$la($i);
         |  double $yv = $y.isNullAt($i) ? 0.0 : (double) $y.$ra($i);
         |  $acc += $xv * $yv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point: `dotp(a, b)`. */
  def dotp(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
