package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the data-quality expectation builders: violation counts are
  * exact (k copies of a key = k-1 violations; nulls violate range), and
  * the report verdict is derived, not asserted.
  */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expectUnique counts surplus copies exactly; clean keys pass") {
    val df = Seq("a", "a", "a", "b", "c", "c").toDF("k")
    val r = Profile.expectUnique(df, "u", Seq("k")).collect().head
    assert(r.getAs[Long]("n_violations") === 3L) // (3-1) + (2-1)
    val clean = Profile.expectUnique(Seq("x", "y").toDF("k"), "u", Seq("k"))
      .collect().head
    assert(clean.getAs[Long]("n_violations") === 0L)
  }

  test("skewReport: hand-computed shares and skew factors, rank order total") {
    // keys: a x4, b x2, c x1, d x1 -> n_keys 4, n_rows 8, uniform = 2
    val df = Seq("a", "a", "a", "a", "b", "b", "c", "d").toDF("k")
    val got = Profile.skewReport(df, "k", topK = 2).orderBy("rank").collect()
    assert(got.length === 2)
    assert(got(0).getAs[String]("key") === "a")
    assert(got(0).getAs[Long]("cnt") === 4L)
    assert(got(0).getAs[Double]("share") === 0.5)
    assert(got(0).getAs[Double]("skew_factor") === 2.0) // 4 / (8/4)
    assert(got(1).getAs[String]("key") === "b")
    assert(got(1).getAs[Double]("skew_factor") === 1.0)
    assert(got(0).getAs[Long]("n_keys") === 4L)
    assert(got(0).getAs[Long]("n_rows") === 8L)
  }

  test("expectInRange treats nulls and out-of-range as violations") {
    val df = Seq(Some(0.0), Some(0.05), Some(0.09), None).toDF("v")
    val r = Profile.expectInRange(df, "r", "v", 0.0, 0.08).collect().head
    assert(r.getAs[Long]("n_violations") === 2L) // 0.09 and null
  }

  test("expectReferential counts orphan fact rows, not distinct orphan keys") {
    val fact = Seq(1L, 2L, 2L, 9L, 9L, 9L).toDF("fk")
    val dim = Seq(1L, 2L).toDF("pk")
    val r = Profile.expectReferential(fact, "fk", "fk", dim, "pk").collect().head
    assert(r.getAs[Long]("n_violations") === 3L) // the three 9s
  }

  test("histogram rollup merges to the one-shot global histogram; quantiles land in the containing bin") {
    val df = Seq.tabulate(300)(i => (s"g${i % 3}", (i * 7) % 100))
      .toDF("g", "v")
    // merge-law: element-wise sum of per-group bins == ungrouped histogram
    val rolled = Profile.histogramRollup(df, "g", "v", 0.0, 100.0, 10)
    assert(rolled.count() === 3)
    val merged = Profile.mergeHistogramBins(rolled).collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n")).toMap
    val oneShot = Profile.histogram(df, "v", 0.0, 100.0, 10).collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("n")).toMap
    assert(merged === oneShot)
    // quantile law: each q's row is the bin containing q*N, est inside it
    val qs = Profile.binQuantiles(Profile.mergeHistogramBins(rolled),
      Seq(0.1, 0.5, 0.95), 0.0, 10.0).collect()
    assert(qs.length === 3)
    qs.foreach { r =>
      val t = r.getAs[Double]("q") * r.getAs[Long]("total")
      assert(r.getAs[Long]("cum_before") < t &&
        r.getAs[Long]("cum_before") + r.getAs[Long]("bin_n") >= t)
      val lo = r.getAs[Double]("lo_edge")
      assert(r.getAs[Double]("est") >= lo && r.getAs[Double]("est") <= lo + 10.0)
    }
  }

  test("schemaDrift classifies added/removed/retyped/unchanged; identical schemas all unchanged") {
    val table = Seq((1L, "x", 0.5)).toDF("id", "name", "score")
    val batch = table.select(col("id").cast("int").as("id"), col("name"),
      lit(true).as("flag")) // retype id, drop score, add flag
    val m = Profile.schemaDrift(table, batch).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("status")).toMap
    assert(m === Map("id" -> "retyped", "name" -> "unchanged",
      "score" -> "removed", "flag" -> "added"))
    // reflexive law: diffing a frame against itself reports no drift
    val self = Profile.schemaDrift(table, table).collect()
    assert(self.forall(_.getAs[String]("status") == "unchanged"))
    // type strings are Spark DDL (what a contract file would record)
    val byCol = Profile.schemaDrift(table, batch).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[String]("table_type"), r.getAs[String]("batch_type"))).toMap
    assert(byCol("id") === (("BIGINT", "INT")))
    assert(byCol("flag") === ((null, "BOOLEAN")))
  }

  test("psiDrift: identical slices give psi 0; a shifted slice gives the hand value") {
    import org.apache.spark.sql.functions.col
    val a = Seq.tabulate(100)(i => i % 10).toDF("v") // uniform 0..9
    val same = Profile.psiDrift(a, a, "v", Seq(5.0)).collect()
    assert(same.forall(_.getAs[Double]("psi_total") === 0.0))
    // b concentrated below 5: ref 50/50, cur 100/0 across the 2 buckets
    val b = Seq.tabulate(100)(i => i % 5).toDF("v")
    val drift = Profile.psiDrift(a, b, "v", Seq(5.0)).collect()
    val p0 = 51.0 / 102; val q0 = 101.0 / 102
    val p1 = 51.0 / 102; val q1 = 1.0 / 102
    val want = BigDecimal((p0 - q0) * math.log(p0 / q0) + (p1 - q1) * math.log(p1 / q1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(drift.head.getAs[Double]("psi_total") - want) < 2e-6)
    assert(drift.head.getAs[Double]("psi_total") > 0.25, "this shift must read as drifted")
  }

  test("datasetCard: hand-checked counts, dup mass, exact lower median") {
    // 5 docs; two share identical text (dup mass 2); n_chars 3,3,5,7,9
    val docs = Seq(
      (1L, "a b", "en", "web", 3),
      (2L, "a b", "en", "web", 3),
      (3L, "c d e", "en", "book", 5),
      (4L, "f g h i", "fr", "web", 7),
      (5L, "j k l m n", "fr", "code", 9))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Profile.datasetCard(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_words") === 2 + 2 + 3 + 4 + 5)
    assert(r.getAs[Long]("n_langs") === 2L)
    assert(r.getAs[Long]("n_sources") === 3L)
    assert(r.getAs[Long]("n_dup_docs") === 2L)
    assert(math.abs(r.getAs[Double]("dup_rate") - 0.4) < 1e-15)
    assert(r.getAs[Long]("median_chars") === 5L) // rank 3 of 5
    val mq = r.getAs[Double]("mean_quality")
    assert(mq > 0.0 && mq <= 1.0)
  }

  test("qualityReport derives pass from the violation count") {
    val rep = Profile.qualityReport(Seq(
      Profile.expectComplete(Seq(Some("x"), None).toDF("c"), "has_null", "c"),
      Profile.expectComplete(Seq(Some("x")).toDF("c"), "clean", "c")))
      .collect().map(r => r.getAs[String]("check_name") -> r.getAs[Boolean]("pass")).toMap
    assert(rep === Map("has_null" -> false, "clean" -> true))
  }

  test("vocabDrift: identical corpora give JS 0; disjoint vocabularies give ln 2; shift ranks the mover first") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta")).toDF("doc_id", "text")
    val same = Profile.vocabDrift(a, a, topK = 3).collect()
    assert(same.forall(_.getAs[Double]("js_divergence") === 0.0),
      "identical distributions must have zero divergence")
    assert(same.forall(_.getAs[Long]("shift_nano") === 0L))
    // fully disjoint vocabularies: JS = ln 2 (each side's mass entirely
    // on its own terms, m = p/2 everywhere)
    val b = Seq((3L, "omega psi chi"), (4L, "omega psi phi")).toDF("doc_id", "text")
    val disj = Profile.vocabDrift(a, b, topK = 3).collect()
    val js = disj.head.getAs[Double]("js_divergence")
    assert(math.abs(js - math.log(2.0)) < 1e-6,
      s"disjoint vocabularies must score ln 2, got $js")
    // the biggest single probability shift tops the report
    val c = Seq((5L, "alpha alpha alpha alpha beta gamma")).toDF("doc_id", "text")
    val top = Profile.vocabDrift(a, c, topK = 1).collect().head
    assert(top.getAs[String]("term") === "alpha",
      "the term whose probability moved most must rank first")
  }

  test("referentialIntegrity: orphans, null FKs and childless parents all counted") {
    val s = spark
    import s.implicits._
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profile.referentialIntegrity(child, "fk", parent, "pk", "c->p")
      .head()
    assert(r.getAs[String]("relation") === "c->p")
    assert(r.getAs[Long]("n_child") === 5L)
    assert(r.getAs[Long]("n_null_fk") === 1L)
    assert(r.getAs[Long]("n_orphan_rows") === 1L) // the key-9 row
    assert(r.getAs[Long]("n_orphan_keys") === 1L)
    assert(r.getAs[Long]("n_parent_keys") === 3L)
    assert(r.getAs[Long]("n_childless_parents") === 1L) // key 3
    assert(math.abs(r.getAs[Double]("orphan_rate") - 0.2) < 1e-9)
    // clean relation: everything zero except the population counts
    val clean = Profile.referentialIntegrity(
      Seq(1L, 2L).toDF("fk"), "fk", parent, "pk", "ok").head()
    assert(clean.getAs[Long]("n_orphan_rows") === 0L)
    assert(clean.getAs[Double]("orphan_rate") === 0.0)
  }
}
