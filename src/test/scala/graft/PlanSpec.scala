package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Structural plan audits — the properties that make queries survive a
  * 100× scale-up are asserted on the physical/optimized plans, not just
  * observed in `.explain` output during review.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withAqeOff[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("column pruning reaches the scan: h1 reads only its 5 needed lineitem columns") {
    val q = SparkEntry.queries("h1_pricing_summary")(spark, sf)
    val scans = withAqeOff(q.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    })
    assert(scans.nonEmpty)
    val readCols = scans.head.requiredSchema.fieldNames.toSet
    assert(readCols === Set("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"),
      s"scan reads $readCols")
  }

  test("filter pushdown reaches the scan: a pushed predicate appears in the scan metadata") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 40).select("l_orderkey")
    val scan = withAqeOff(df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }).get
    assert(scan.metadata("PushedFilters").contains("GreaterThan(l_quantity"),
      s"PushedFilters = ${scan.metadata("PushedFilters")}")
  }

  test("tx6 TF-IDF vocab join carries no forced broadcast (unbounded vocabulary)") {
    // the planner may still CHOOSE broadcast from size estimates (fine —
    // estimates grow with the corpus and flip it to sort-merge at scale);
    // what must not exist is a HINT forcing broadcast of the vocab side
    // regardless of size. The one-row n_docs scalar is the only
    // legitimate hint.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val hints = Text.topTfidfTerms(docs, k = 3)
      .queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
    assert(hints.size === 1,
      s"expected only the scalar n_docs broadcast hint, found ${hints.size}")
    // and that sole hinted subtree is the single-row scalar, not the vocab
    assert(hints.head.child.schema.fieldNames.toSeq === Seq("n_docs"))
  }

  test("flagship j1 plan stays at 3 exchanges (2 dedup windows + final sort)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val q = SparkEntry.queries("j1_flagship_upsert")(spark, sf)
    val exchanges = withAqeOff(q.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    })
    // the union's latest-wins window must reuse the children's
    // co-partitioning — a 4th exchange means that reuse regressed
    assert(exchanges.size <= 3,
      s"flagship merge grew to ${exchanges.size} exchanges")
  }

  test("broadcast dims: h4 joins supplier and nation via broadcast, not shuffle") {
    val q = SparkEntry.queries("h4_top_suppliers")(spark, sf)
    val plan = withAqeOff(q.queryExecution.executedPlan)
    val broadcasts = plan.collect { case b: BroadcastExchangeExec => b }
    assert(broadcasts.size >= 2, "both dim tables must arrive by broadcast")
  }
}
