package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** In-order double-precision dot product of two float/double arrays — a
  * native Catalyst Expression for the similarity-search hot loop.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * allocates an intermediate array and walks boxed lambda closures per
  * element; this expression is one fused codegen'd loop over the
  * ArrayData, which is what you want when the pair join evaluates it
  * billions of times. Accumulation order (index-ascending, double acc)
  * is IDENTICAL to the higher-order formulation, so results are
  * bit-for-bit unchanged.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckSuccess
    else TypeCheckFailure("vector_dot requires array<float> or array<double> arguments, got " +
      s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // mismatched array lengths yield null (matching the zip_with/aggregate
  // fallback, which null-pads the shorter side), so the result can be
  // null even for non-nullable children
  override def nullable: Boolean = true

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val aF = elemType(left) == FloatType
    val bF = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {
  /** Column API; resolves via the GraftExtensions function registry. */
  def vector_dot(a: Column, b: Column): Column = call_function("vector_dot", a, b)
}
