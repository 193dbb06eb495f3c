package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The law that justifies HashBucketLake's existence: a merge tick
  * must read and rewrite ONLY the buckets the delta's keys hash into —
  * untouched bucket directories stay byte-identical on disk.
  */
class HashBucketLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lakeRows(rows: (String, String, Int)*) =
    rows.toSeq.toDF("id", "update_at", "amount")

  private def bucketFiles(dir: String): Map[String, Map[String, Long]] =
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("bucket="))
      .map { b =>
        b.getName -> b.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap
      }.toMap

  test("merge rewrites only touched buckets; content is latest-wins") {
    val root = Files.createTempDirectory("graft_hbl").toString
    val dir = Paths.get(root, "lake").toString
    val init = lakeRows(
      ("k1", "2024-01-01", 1), ("k2", "2024-01-01", 2), ("k3", "2024-01-01", 3),
      ("k4", "2024-01-01", 4), ("k5", "2024-01-01", 5), ("k6", "2024-01-01", 6))
    HashBucketLake.bulkWrite(init, dir, nBuckets = 8)
    val before = bucketFiles(dir)
    assert(before.nonEmpty)

    Thread.sleep(1100) // mtime granularity guard
    // delta updates k1 and inserts k9
    val delta = lakeRows(("k1", "2024-01-02", 100), ("k9", "2024-01-02", 9))
    HashBucketLake.mergeCommit(spark, delta, dir, nBuckets = 8)
    val after = bucketFiles(dir)

    val touched = delta.withColumn("b", HashBucketLake.bucketOf(col("id"), 8))
      .select("b").distinct().collect().map(r => s"bucket=${r.getLong(0)}").toSet
    // untouched buckets: identical file name->mtime maps
    before.keys.filterNot(touched).foreach { b =>
      assert(after(b) === before(b), s"untouched $b was rewritten")
    }
    // touched buckets: rewritten (different files or mtimes)
    touched.filter(before.contains).foreach { b =>
      assert(after(b) !== before(b), s"touched $b was not rewritten")
    }
    // content: latest-wins merge of all keys
    val got = HashBucketLake.read(spark, dir)
      .select("id", "update_at", "amount").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got("k1") === (("2024-01-02", 100)), "updated key takes the delta version")
    assert(got("k9") === (("2024-01-02", 9)), "new key inserted")
    assert(got("k2") === (("2024-01-01", 2)), "untouched key preserved")
    assert(got.size === 7)
  }

  test("null-key delta rows bucket deterministically instead of crashing the touched-bucket listing") {
    val root = Files.createTempDirectory("graft_hbl_null").toString
    val dir = Paths.get(root, "lake").toString
    HashBucketLake.bulkWrite(lakeRows(("k1", "2024-01-01", 1)), dir, nBuckets = 4)
    val delta = Seq((Option("k1"), "2024-01-02", 10), (Option.empty[String], "2024-01-02", 99))
      .toDF("id", "update_at", "amount")
    HashBucketLake.mergeCommit(spark, delta, dir, nBuckets = 4) // NPE'd before the coalesce fix
    val got = HashBucketLake.read(spark, dir).select("id", "amount").collect()
      .map(r => Option(r.getString(0)) -> r.getInt(1)).toMap
    assert(got(Some("k1")) === 10)
    assert(got(None) === 99, "null-key row must land in a real bucket, not the Hive default partition")
    // and it must live under a real bucket=N dir (prunable), never __HIVE_DEFAULT_PARTITION__
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(!dirs.exists(_.contains("HIVE_DEFAULT")), s"found $dirs")
  }

  test("mergeCommit tiebreak resolves equal-(key, version) duplicates inside one delta") {
    val root = Files.createTempDirectory("graft_hbl_tb").toString
    val dir = Paths.get(root, "lake").toString
    HashBucketLake.bulkWrite(lakeRows(("k1", "2024-01-01", 1)), dir, nBuckets = 4)
    val delta = Seq(("k1", "2024-01-02", 5, 100L), ("k1", "2024-01-02", 7, 200L))
      .toDF("id", "update_at", "amount", "event_id")
    HashBucketLake.mergeCommit(spark, delta, dir, nBuckets = 4,
      tiebreak = Seq(col("event_id").desc))
    val got = HashBucketLake.read(spark, dir).select("amount").collect().map(_.getInt(0))
    assert(got.toSeq === Seq(7), "event_id DESC tiebreak must pick the higher event_id row")
  }

  test("first mergeCommit on an empty dir bootstraps the lake") {
    val root = Files.createTempDirectory("graft_hbl2").toString
    val dir = Paths.get(root, "lake").toString
    HashBucketLake.mergeCommit(spark,
      lakeRows(("a", "2024-01-01", 1), ("a", "2024-01-02", 2)), dir, nBuckets = 4)
    val got = HashBucketLake.read(spark, dir).select("id", "amount").collect()
    assert(got.length === 1 && got.head.getInt(1) === 2, "bootstrap dedups latest-wins")
  }

  test("snapshot read of a merge is partition-pruned to the touched buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = Files.createTempDirectory("graft_hbl3").toString
    val dir = Paths.get(root, "lake").toString
    HashBucketLake.bulkWrite(lakeRows(
      ("k1", "2024-01-01", 1), ("k2", "2024-01-01", 2), ("k3", "2024-01-01", 3),
      ("k4", "2024-01-01", 4), ("k5", "2024-01-01", 5), ("k6", "2024-01-01", 6)),
      dir, nBuckets = 8)
    val nBucketDirs = bucketFiles(dir).size
    val touched = Seq(0L, 1L) // any strict subset of existing buckets
    val pruned = HashBucketLake.read(spark, dir).filter(col("bucket").isin(touched: _*))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.relation.partitionSchema.fieldNames.contains("bucket"))
    val selected = scan.selectedPartitions.partitionCount
    assert(selected <= touched.size && selected < nBucketDirs,
      s"scan selected $selected of $nBucketDirs partitions — pruning failed")
  }
}
