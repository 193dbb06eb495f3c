package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.classic.ExpressionUtils.column

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
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
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

  /** Column-level API: `rolling_hash(col)`. */
  def rolling_hash(c: Column): Column = column(RollingHash(c.expr))
}
