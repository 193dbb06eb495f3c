package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.TestSpark
import graft.merge.Merge

class BucketedLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "update_at", "note")
  }

  private def randRows(r: Random, n: Int) = Seq.fill(n)((
    s"k${r.nextInt(40)}",
    f"2024-01-01T00:${r.nextInt(60)}%02d:${r.nextInt(60)}%02d.${r.nextInt(1000000)}%06d+0000",
    s"v${r.nextInt(1000)}"))

  test("upsertJoin is equivalent to union-window upsert") {
    val r = new Random(11)
    val snap = Merge.dedupLatest(df(randRows(r, 120)), "id", "update_at")
    val delta = df(randRows(r, 90))
    val a = Merge.upsert(snap, delta)
    val b = Merge.upsertJoin(snap, delta)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("upsertJoin keeps a delta-only row whose version is null") {
    import spark.implicits._
    val snap = Seq(("k1", "2024-01-01T00:00:05.000000+0000", "s")).toDF("id", "update_at", "note")
    val delta = Seq(("k9", null.asInstanceOf[String], "d-nullver")).toDF("id", "update_at", "note")
    val out = Merge.upsertJoin(snap, delta).orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(out === Seq(("k1", "s"), ("k9", "d-nullver")),
      "a delta-only null-version row must survive, not collapse to all-NULL")
  }

  test("upsertJoin collapses null-key rows on both sides exactly like upsert") {
    import spark.implicits._
    val snap = Seq(("k1", "2024-01-01T00:00:05.000000+0000", "s1"),
      (null.asInstanceOf[String], "2024-01-01T00:00:01.000000+0000", "s-null"))
      .toDF("id", "update_at", "note")
    val delta = Seq((null.asInstanceOf[String], "2024-01-01T00:00:09.000000+0000", "d-null"))
      .toDF("id", "update_at", "note")
    val a = Merge.upsert(snap, delta)
    val b = Merge.upsertJoin(snap, delta)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(b.filter(col("id").isNull).count() === 1,
      "all null-key rows must collapse to ONE winner, not accumulate per tick")
    assert(b.filter(col("id").isNull).head().getString(2) === "d-null")
  }

  test("mergeCommit recovers from a crash between DROP and RENAME") {
    val r = new Random(23)
    val tbl = "graft_bucketed_crash_test"
    Seq(tbl, s"${tbl}_staging").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val snap = Merge.dedupLatest(df(randRows(r, 100)), "id", "update_at")
    BucketedLake.bulkWrite(snap, tbl, nBuckets = 4)
    val delta1 = df(randRows(r, 30))
    BucketedLake.mergeCommit(spark, delta1, tbl, nBuckets = 4)
    val committed = BucketedLake.read(spark, tbl).localCheckpoint()

    // simulate the crash window: the merged result sits in staging and
    // the table vanished before the rename completed
    BucketedLake.bulkWrite(committed, s"${tbl}_staging", nBuckets = 4)
    spark.sql(s"DROP TABLE $tbl")

    val delta2 = df(randRows(r, 20))
    BucketedLake.mergeCommit(spark, delta2, tbl, nBuckets = 4)
    val want = Merge.upsert(committed, delta2)
    val got = BucketedLake.read(spark, tbl)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "post-crash commit must resume from the staged snapshot, not re-bootstrap from the delta")
    Seq(tbl, s"${tbl}_staging").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("bucketed snapshot merges with no exchange on the snapshot side") {
    val r = new Random(5)
    val tbl = "graft_bucketed_lake_test"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_staging")
    val snap = Merge.dedupLatest(df(randRows(r, 200)), "id", "update_at")
    BucketedLake.bulkWrite(snap, tbl, nBuckets = 8)

    val delta = df(randRows(r, 50))
    assert(BucketedLake.snapshotSideShuffleFree(spark, tbl, delta),
      "expected at most one hash exchange (the delta side) in the merge plan:\n" +
        Merge.upsertJoin(BucketedLake.read(spark, tbl), delta)
          .queryExecution.executedPlan.toString)

    // and the commit produces the same table as the reference upsert
    // (materialized BEFORE the commit swaps the underlying files)
    val want = Merge.upsert(BucketedLake.read(spark, tbl), delta).localCheckpoint()
    BucketedLake.mergeCommit(spark, delta, tbl, nBuckets = 8)
    val got = BucketedLake.read(spark, tbl)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
