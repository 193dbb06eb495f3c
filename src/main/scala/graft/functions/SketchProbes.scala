package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native probe expressions for broadcast-size sketches — the codegen
  * replacements for the two residual Scala UDFs (CMS point estimates,
  * Bloom membership). The serialized sketch rides the plan as a
  * foldable binary literal child: each task deserializes it ONCE into
  * a transient lazy field, then every row probe is a plain virtual
  * call from generated code — no per-row boxing, no ScalaUDF node, no
  * codegen fence around the rest of the projection.
  *
  * Spark's own sketch expressions are `private[sql]` (BloomFilter
  * probes exist only inside runtime-filter injection; CMS has no
  * expression form at all), so these go through the same PUBLIC
  * `SparkSessionExtensions.injectFunction` route as the rest of
  * graft.functions.
  */
case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || !left.foldable)
      TypeCheckFailure("cms_estimate requires a foldable binary serialized sketch")
    else if (right.dataType != StringType)
      TypeCheckFailure(s"cms_estimate requires a string item, got ${right.dataType.catalogString}")
    else TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(
      left.eval(null).asInstanceOf[Array[Byte]]))

  override def nullSafeEval(l: Any, r: Any): Any =
    cms.estimateCount(r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, item) =>
      s"${ev.value} = $ref.estimateCount($item.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

/** True iff ANY element of the string array might be in the Bloom
  * filter (the decontamination any-match probe) — short-circuits on the
  * first hit, skips null elements.
  */
case class BloomAnyContain(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || !left.foldable)
      TypeCheckFailure("bloom_any_contain requires a foldable binary serialized filter")
    else right.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"bloom_any_contain requires array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(
      left.eval(null).asInstanceOf[Array[Byte]]))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val arr = r.asInstanceOf[ArrayData]
    var i = 0
    var found = false
    while (i < arr.numElements() && !found) {
      if (!arr.isNullAt(i))
        found = bf.mightContainString(arr.getUTF8String(i).toString)
      i += 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bf", bf, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, arr) => {
      val i = ctx.freshName("i")
      val found = ctx.freshName("found")
      s"""
         |boolean $found = false;
         |for (int $i = 0; $i < $arr.numElements() && !$found; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $found = $ref.mightContainString($arr.getUTF8String($i).toString());
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomAnyContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_any_contain"
}

/** Scalar long-key Bloom membership — the probe side of the
  * runtime-filter / semi-join-reduction pattern ([[graft.ops.Joins
  * .bloomPreJoin]]): the dimension's key filter rides the plan as a
  * binary literal and prunes fact rows BEFORE the join exchange.
  * Spark's own BloomFilterMightContain is `private[sql]` (injected
  * runtime filters only), hence this public-route twin.
  */
case class BloomContainsLong(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || !left.foldable)
      TypeCheckFailure("bloom_contains_long requires a foldable binary serialized filter")
    else if (right.dataType != LongType)
      TypeCheckFailure(s"bloom_contains_long requires a bigint key, got ${right.dataType.catalogString}")
    else TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(
      left.eval(null).asInstanceOf[Array[Byte]]))

  override def nullSafeEval(l: Any, r: Any): Any =
    bf.mightContainLong(r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bf", bf, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, key) =>
      s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_contains_long"
}
