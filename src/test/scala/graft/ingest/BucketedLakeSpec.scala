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
