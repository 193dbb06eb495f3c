package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.util.Random

/** Native sketch expressions for the dedup hot path.
  *
  * Both consume a pre-hashed `array<bigint>` column (built with the
  * codegen'd `transform(..., xxhash64)` built-ins) and produce the
  * sketch in ONE fused loop. The composable formulation — 64 separate
  * `array_min(transform(...))` / `aggregate(...)` columns — walks the
  * array 64 times through boxed lambda closures and allocates 64
  * intermediate arrays per row; at corpus scale the sketch step is
  * CPU-bound, so this is where a native Expression pays for itself
  * (SURVEY §7.5 preference order).
  */

/** MinHash signature: for hash slot j, min over the input hashes h of
  * (a_j·h + b_j) mod P, P = 2^31-1 (Mersenne). Returns array<bigint> of
  * length numHashes; null for an empty/null input array.
  */
case class MinHashSigs(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"minhash_sigs requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // an EMPTY input array also yields null, so this expression can be
  // null even when its child is non-nullable; without this override,
  // nullSafeCodeGen would emit `false = true;` for non-nullable
  // children — uncompilable generated Java and a silent fallback to
  // interpreted evaluation
  override def nullable: Boolean = true

  @transient private lazy val (permA, permB) = MinHashSigs.perms(numHashes, seed)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val mins = MinHashSigs.compute(hs, permA, permB)
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", permA, "long[]")
    val bRef = ctx.addReferenceObj("permB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[${numHashes}];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < ${numHashes}; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${MinHashSigs.P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  /** 31-bit Mersenne prime; operands stay < 2^62 — no overflow. */
  final val P = 2147483647L

  /** The permutation family — MUST stay the single source of truth so
    * signatures are stable across the codebase.
    */
  def perms(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val r = new Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    (0 until numHashes).foreach { j =>
      a(j) = 1L + r.nextInt((P - 1).toInt).toLong
      b(j) = r.nextInt(P.toInt).toLong
    }
    (a, b)
  }

  /** Shared by interpreted eval and tests. */
  def compute(hs: ArrayData, a: Array[Long], b: Array[Long]): Array[Long] = {
    val mins = Array.fill(a.length)(Long.MaxValue)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var j = 0
      while (j < a.length) {
        val v = (a(j) * h + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }
}

/** 64-bit SimHash over an array of token hashes: bit b of the result is
  * set iff Σ over hashes of (±1 per bit b) is positive. One loop, 64
  * counters, no allocation per slot.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"simhash64 requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. */
  def compute(hs: ArrayData): Long = {
    val cnt = new Array[Int](64)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        cnt(b) += (((h >>> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
