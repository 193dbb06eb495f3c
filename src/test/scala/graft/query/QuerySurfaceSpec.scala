package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the classified snapshot diff: every label reachable, and
  * the content hash immune to the two classic false-equality traps
  * (column order, null-vs-concatenation ambiguity).
  */
class QuerySurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def statusOf(src: Seq[(String, String, String)],
                       tgt: Seq[(String, String, String)]): Map[String, String] = {
    val s = src.toDF("k", "c1", "c2")
    val t = tgt.toDF("k", "c1", "c2")
    QuerySurface.diffClassify(s, t, Seq("k"))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[String]("status")).toMap
  }

  test("diffClassify labels added / removed / changed / unchanged") {
    val got = statusOf(
      src = Seq(("a", "x", "1"), ("b", "x", "1"), ("c", "x", "1")),
      tgt = Seq(("a", "x", "1"), ("b", "y", "1"), ("d", "x", "1")))
    assert(got === Map("a" -> "unchanged", "b" -> "changed",
      "c" -> "added", "d" -> "removed"))
  }

  test("hash is column-order safe: reordered target columns still compare equal") {
    val s = Seq(("a", "x", "1")).toDF("k", "c1", "c2")
    val t = Seq(("a", "1", "x")).toDF("k", "c2", "c1") // same values, swapped layout
    val got = QuerySurface.diffClassify(s, t, Seq("k"))
      .collect().map(r => r.getAs[String]("status"))
    assert(got === Array("unchanged"))
  }

  test("hash distinguishes null placement and concatenation boundaries") {
    // ("ab", null) vs (null, "ab"): without a null sentinel both sides
    // would hash the bare string "ab"; ("ab","c") vs ("a","bc") would
    // collide without a separator
    val got = statusOf(
      src = Seq(("n", "ab", null), ("s", "ab", "c")),
      tgt = Seq(("n", null, "ab"), ("s", "a", "bc")))
    assert(got === Map("n" -> "changed", "s" -> "changed"))
  }
}
