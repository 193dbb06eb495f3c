package graft.ops

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics (vs naive formulations) and physical-plan structure for
  * the temporal joins: as-of must plan with NO join operator at all,
  * range must plan as an equi-join, never nested-loop/cartesian.
  */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // plan inspected with AQE off: the static plan's operator choice is
  // what matters, and it keeps TreeNode.collect a full traversal
  // (no opaque QueryStageExec wrappers)
  private def staticPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  // left: (key, t, tag)  right: (key, rt, v)
  private lazy val left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l0"),
    ("b", 10L, "l3"), ("c", 10L, "l4")
  ).toDF("k", "t", "tag")
  private lazy val right = Seq(
    ("a", 10L, "r10"), ("a", 15L, "r15"), ("a", 2L, "r2"),
    ("b", 11L, "r11")
  ).toDF("k", "rt", "v")

  test("asofJoin backward: inclusive latest-at-or-before per key, null when none") {
    val out = Joins.asofJoin(
        left, right.select(col("k"), col("rt"), col("v")), Seq("k"), "t", "rt")
      .select("k", "t", "tag", "rt", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    // a@10 matches r10 exactly (inclusive); a@20 matches r15; a@5 matches r2;
    // b@10 has no prior right row; c has no right rows at all
    assert(out.exists { case (k, t, _, _, v) => k == "a" && t == 10L && v.contains("r10") })
    assert(out.exists { case (k, t, _, _, v) => k == "a" && t == 20L && v.contains("r15") })
    assert(out.exists { case (k, t, _, _, v) => k == "a" && t == 5L && v.contains("r2") })
    assert(out.exists { case (k, t, _, _, v) => k == "b" && t == 10L && v.isEmpty })
    assert(out.exists { case (k, t, _, _, v) => k == "c" && t == 10L && v.isEmpty })
    assert(out.size === 5, "exactly one output row per left row")
  }

  test("asofJoinForward: inclusive earliest-at-or-after per key") {
    val out = Joins.asofJoinForward(
        left, right.select(col("k"), col("rt"), col("v")), Seq("k"), "t", "rt")
      .select("k", "t", "rt", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toSet
    assert(out.exists { case (k, t, _, v) => k == "a" && t == 10L && v.contains("r10") })
    assert(out.exists { case (k, t, _, v) => k == "a" && t == 20L && v.isEmpty })
    assert(out.exists { case (k, t, _, v) => k == "a" && t == 5L && v.contains("r10") })
    assert(out.exists { case (k, t, _, v) => k == "b" && t == 10L && v.contains("r11") })
    assert(out.size === 5)
  }

  test("asofJoin ties on (key, time) resolve to the greatest payload deterministically") {
    val dupRight = Seq(("a", 10L, "rA"), ("a", 10L, "rB")).toDF("k", "rt", "v")
    val out = Joins.asofJoin(Seq(("a", 10L)).toDF("k", "t"), dupRight, Seq("k"), "t", "rt")
    // payload struct (rt, v) ascending -> last() picks ("rB")
    assert(out.select("v").as[String].collect().toSeq === Seq("rB"))
  }

  test("asofJoin plans with a window, not a join operator") {
    val plan = staticPlan(Joins.asofJoin(
      left, right.select(col("k"), col("rt"), col("v")), Seq("k"), "t", "rt"))
    val joins = plan.collect { case j: BaseJoinExec => j }
    assert(joins.isEmpty, s"expected no join operator, got:\n$plan")
  }

  test("rangeJoin equals the naive non-equi join, boundaries half-open") {
    val points = Seq((1L, 0L), (2L, 10L), (3L, 25L), (4L, 30L), (5L, 99L))
      .toDF("pid", "x")
    // [10,30) spans multiple width-7 buckets; [30,31) catches nothing at 30? no: 30 matches
    val intervals = Seq((100L, 10L, 30L), (200L, 28L, 45L), (300L, 500L, 600L))
      .toDF("iid", "s", "e")
    val got = Joins.rangeJoin(points, intervals, "x", "s", "e", bucketWidth = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.as("p").join(intervals.as("i"),
        col("x") >= col("s") && col("x") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want === Set((2L, 100L), (3L, 100L), (4L, 200L)),
      "x=10 matches start-inclusive, x=30 misses end-exclusive, x=30 inside [28,45)")
  }

  test("rangeJoin plans as an equi-join, never nested-loop or cartesian") {
    val points = Seq((1L, 0L), (2L, 10L)).toDF("pid", "x")
    val intervals = Seq((100L, 10L, 30L)).toDF("iid", "s", "e")
    val plan = staticPlan(Joins.rangeJoin(points, intervals, "x", "s", "e", 7L))
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, s"nested-loop/cartesian plan:\n$plan")
    assert(plan.collect { case j: BaseJoinExec => j }.nonEmpty,
      "expected an equi-join operator")
  }

  // overlap fixture: [0,20) spans 3 width-7 buckets and overlaps both
  // right intervals; [25,26) only the long one; adjacency ([20,x) vs
  // [0,20)) must NOT count (half-open); each pair exactly once even
  // when the overlap itself spans several buckets
  private lazy val leftIv = Seq((1L, 0L, 20L), (2L, 25L, 26L), (3L, 90L, 95L))
    .toDF("lid", "ls", "le")
  private lazy val rightIv = Seq((100L, 5L, 40L), (200L, 19L, 21L), (300L, 20L, 22L))
    .toDF("rid", "rs", "re")

  test("intervalOverlapJoin equals the naive non-equi join, each pair exactly once") {
    val got = Joins.intervalOverlapJoin(leftIv, rightIv,
        "ls", "le", "rs", "re", bucketWidth = 7L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "a pair was emitted more than once")
    val want = leftIv.join(rightIv, col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === want)
    assert(want === Set((1L, 100L), (1L, 200L), (2L, 100L)),
      "[0,20) meets [19,21) but NOT [20,22) (half-open adjacency)")
  }

  test("intervalOverlapJoin matches the naive join on random intervals and widths") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val l = Seq.tabulate(40) { i =>
        val s = rnd.nextInt(200).toLong; (i.toLong, s, s + 1 + rnd.nextInt(30))
      }.toDF("lid", "ls", "le")
      val r = Seq.tabulate(40) { i =>
        val s = rnd.nextInt(200).toLong; (i.toLong, s, s + 1 + rnd.nextInt(30))
      }.toDF("rid", "rs", "re")
      val width = 1L + rnd.nextInt(40)
      val got = Joins.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", width)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length === got.toSet.size, s"round $round width $width: duplicate pair")
      val want = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got.toSet === want, s"round $round width $width diverged from naive join")
    }
  }

  test("intervalOverlapJoin plans as an equi-join, never nested-loop or cartesian") {
    val plan = staticPlan(Joins.intervalOverlapJoin(leftIv, rightIv,
      "ls", "le", "rs", "re", 7L))
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, s"nested-loop/cartesian plan:\n$plan")
    assert(plan.collect { case j: BaseJoinExec => j }.nonEmpty,
      "expected an equi-join operator")
  }

  test("bloomPreJoin equals the plain join exactly (false positives removed by the join)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val fact = Seq.tabulate(500)(i => (i.toLong, s"f$i")).toDF("fk", "payload")
    val dim = Seq.tabulate(25)(i => ((i * 17).toLong, s"d$i")).toDF("dk", "name")
    // high fpp to force false positives through the probe
    val got = graft.ops.Joins.bloomPreJoin(fact, dim, "fk", "dk", fpp = 0.2)
      .select("fk", "payload", "name").collect().map(_.toSeq).toSet
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name").collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("agmsJoinCardinality: exact truth; estimate matches a JVM md5 replay") {
    val s = spark
    import s.implicits._
    val aKeys = Seq(1L, 1L, 2L, 5L, 5L, 5L)
    val bKeys = Seq(1L, 2L, 2L, 3L, 5L)
    val a = aKeys.toDF("k"); val b = bKeys.toDF("k")
    val r = graft.ops.Joins.agmsJoinCardinality(a, "k", b, "k", counters = 32)
      .head()
    // truth = Σ f_A(k)·f_B(k) = 2·1 + 1·2 + 3·1 = 7
    assert(r.getAs[Long]("truth") === 7L)
    assert(r.getAs[Long]("n_a") === 6L && r.getAs[Long]("n_b") === 5L)
    // replay the coins with JVM md5: sign_j(k) = parity of hex digit j
    def hex(k: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString
    def counter(keys: Seq[Long], j: Int): Long = keys.map { k =>
      if ("13579bdf".contains(hex(k).charAt(j - 1))) -1L else 1L
    }.sum
    val expected = (1 to 32)
      .map(j => counter(aKeys, j) * counter(bKeys, j)).sum / 32.0
    assert(math.abs(r.getAs[Double]("estimate") - expected) < 1e-6)
    // self-join sketch products are squares: estimate >= 0 always
    val self = graft.ops.Joins.agmsJoinCardinality(a, "k", a, "k", 32).head()
    assert(self.getAs[Double]("estimate") >= 0.0)
    assert(self.getAs[Long]("truth") === (4L + 1L + 9L)) // Σ f²
  }
}
