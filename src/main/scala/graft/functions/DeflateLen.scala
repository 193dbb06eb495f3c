package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string's UTF-8 bytes (RFC 1951 via
  * `java.util.zip.Deflater`, fixed level 6, raw stream) — the
  * compression-ratio quality signal every large web-corpus pipeline
  * computes (Rae et al. '21 Gopher §A1.1 and Penedo et al. '24
  * FineWeb both gate on it): highly repetitive boilerplate compresses
  * far below natural prose, and random/encoded blobs barely compress
  * at all, so `deflated/raw` separates both failure modes from clean
  * text with ONE cheap pass.
  *
  * Native codegen Expression (the §7.5 preference order); each call
  * uses a fresh Deflater released in a finally block — no shared
  * state, safe under whole-stage codegen. The byte count is
  * deterministic for a fixed JDK/zlib (the harness pins one); no SQL
  * engine exposes DEFLATE, so operators built on this carry law-based
  * spec checks and a rows-only gate entry rather than a value oracle.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckSuccess
    else TypeCheckFailure(
      s"deflate_len requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    DeflateLen.length(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.DeflateLen.length($x.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)

  override def prettyName: String = "deflate_len"
}

object DeflateLen {

  /** Shared by interpreted eval and generated code. */
  def length(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
