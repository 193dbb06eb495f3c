package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string (document fingerprint).
  *
  * h = Σ byte_i · B^(n-1-i)  (mod 2^64, Java long wrap-around)
  *
  * A native Catalyst Expression with whole-stage codegen — one pass over
  * the UTF-8 bytes, no UDF serialization, stays inside the codegen'd
  * stage (the preference order of SURVEY.md §7.5 / the build brief:
  * native Expression > Scala UDF). Wrap-around multiplication is
  * intentional and exempt from ANSI overflow checks because the
  * arithmetic is emitted directly as Java.
  *
  * Spark 4 note: `ExpectsInputTypes`/`AbstractDataType` are
  * `private[sql]` there, so input checking is a direct
  * `checkInputDataTypes` override, and the Column API goes through the
  * public function registry (`GraftExtensions` + `call_function`)
  * rather than a private Column constructor.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckSuccess
    else TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hashBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val B = 1000003L

  /** Shared by interpreted eval and generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** Column-level API: `rolling_hash(col)`. Resolves through the session
    * function registry — sessions must be built with [[graft.GraftSession]]
    * (or `spark.sql.extensions=graft.GraftExtensions`).
    */
  def rolling_hash(c: Column): Column = call_function("rolling_hash", c)
}
