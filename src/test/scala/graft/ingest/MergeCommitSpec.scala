package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.merge.Merge

/** The scale-critical property: a merge commit touches ONLY the
  * partitions present in the delta (O(delta) work per tick), and still
  * produces exactly the same table as a full-table upsert would.
  */
class MergeCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lakeRows(rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    Ingest.withPartitionColumns(
      rows.toDF("id", "create_at", "note")
        .withColumn("update_at", col("create_at")))
  }

  private def day(d: Int, sec: Int) = f"2024-01-$d%02dT00:00:$sec%02d.000000+0000"

  test("mergeCommit rewrites only delta partitions and matches full upsert") {
    val lake = Files.createTempDirectory("graft_lake").toString
    val snapshot = lakeRows(Seq(
      ("k1", day(1, 1), "d1-a"), ("k2", day(1, 2), "d1-b"),
      ("k3", day(2, 1), "d2-a"), ("k4", day(3, 1), "d3-a")))
    TableWriter.bulkWrite(snapshot, lake)

    val untouchedDir = Paths.get(lake, "create_year=2024", "create_month=01", "create_day=03")
    def filesOf(p: java.nio.file.Path): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val w = Files.walk(p)
      try w.iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
      finally w.close()
    }
    val before = filesOf(untouchedDir)

    // delta updates k1 (same day-1 partition, newer version) + inserts k5 into day 2
    val delta = lakeRows(Seq(("k1", day(1, 1), "d1-a2"), ("k5", day(2, 5), "d2-new")))
      .withColumn("update_at", concat(lit("2024-02-01T"), substring(col("update_at"), 12, 20)))
    TableWriter.mergeCommit(spark, delta, lake)

    val after = filesOf(untouchedDir)
    assert(before === after, "day-3 partition files must be untouched by a day-1/2 delta")

    // exceptAll resolves by POSITION; parquet read-back moves partition
    // columns to the end, so realign first
    val want = Merge.upsert(snapshot, delta)
    val got = TableWriter.read(spark, lake).select(want.columns.map(col).toIndexedSeq: _*)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.filter(col("id") === "k1").head().getAs[String]("note") === "d1-a2")
    assert(got.count() === 5)
  }

  test("mergeCommit on an empty lake bootstraps via bulk write") {
    val lake = Files.createTempDirectory("graft_lake_empty").resolve("tbl").toString
    val delta = lakeRows(Seq(("k1", day(1, 1), "a"), ("k2", day(2, 1), "b")))
    TableWriter.mergeCommit(spark, delta, lake)
    assert(TableWriter.read(spark, lake).count() === 2)
  }

  test("compactPartition shrinks one day's file count without changing data or neighbors") {
    import scala.jdk.CollectionConverters._
    val lake = Files.createTempDirectory("graft_lake_compact").toString
    val rows = lakeRows((1 to 24).map(i => (s"k$i", day(1, i), s"v$i")) ++
      Seq(("x1", day(2, 1), "other-day")))
    TableWriter.bulkWrite(rows.repartition(6), lake)
    def filesIn(d: Int): Seq[java.nio.file.Path] = {
      val p = Paths.get(lake, "create_year=2024", "create_month=01", f"create_day=$d%02d")
      val w = Files.walk(p)
      try w.iterator().asScala.filter(f =>
        Files.isRegularFile(f) && f.toString.endsWith(".parquet")).toSeq
      finally w.close()
    }
    assert(filesIn(1).size > 1, "fixture must start fragmented")
    val day2Before = filesIn(2).map(_.toString).sorted
    val before = TableWriter.read(spark, lake).localCheckpoint()

    TableWriter.compactPartition(spark, lake, "2024", "01", "01")

    assert(filesIn(1).size === 1, "day-1 must compact to one file")
    assert(filesIn(2).map(_.toString).sorted === day2Before, "day-2 files untouched")
    val after = TableWriter.read(spark, lake)
      .select(before.columns.map(col).toIndexedSeq: _*)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("compactPartition does not duplicate partitions under default type inference") {
    val lake = Files.createTempDirectory("graft_lake_infer").toString
    TableWriter.bulkWrite(lakeRows(Seq(
      ("k1", day(8, 1), "a"), ("k2", day(8, 2), "b"), ("k3", day(9, 1), "c"))), lake)
    val n0 = TableWriter.read(spark, lake).count()
    // the Spark DEFAULT: partition dirs like create_day=08 infer as int
    // 8; a naive rewrite would then write create_day=8 BESIDE it and
    // every read would return the day twice
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "true")
    try {
      TableWriter.compactPartition(spark, lake, "2024", "01", "08")
    } finally {
      spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    }
    assert(!Files.exists(Paths.get(lake, "create_year=2024", "create_month=1")),
      "an unpadded twin partition directory must not appear")
    assert(TableWriter.read(spark, lake).count() === n0, "no row may be duplicated")
  }

  test("partition pruning stays physical under default type inference") {
    // the schema-pinned read must keep create_* as real partition
    // columns: a post-read lpad rewrite would silently turn the merge
    // tick's O(delta) pruned scan into an O(table) post-scan filter on
    // inference-enabled (non-Graft) sessions
    val lake = Files.createTempDirectory("graft_lake_infprune").toString
    TableWriter.bulkWrite(lakeRows(Seq(
      ("a", day(1, 1), "x"), ("b", day(2, 1), "y"), ("c", day(3, 1), "z"))), lake)
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "true")
    try {
      val pred = TableWriter.touchedPartitionsPredicate(
        lakeRows(Seq(("a", day(1, 2), "x2")))).get
      val pruned = TableWriter.read(spark, lake).filter(pred)
      assert(pruned.collect().length === 1)
      val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
      assert(scan.metrics("numFiles").value === 1,
        s"expected a 1-file pruned scan under inference; got ${scan.metrics("numFiles").value}")
    } finally {
      spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    }
  }

  test("bulkWrite zstd parquet round-trips identically to snappy") {
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("graft_lake_zstd")
    val rows = lakeRows(Seq(
      ("k1", day(1, 1), "a"), ("k2", day(2, 1), "b"), ("k3", day(3, 1), "c")))
    TableWriter.bulkWrite(rows, base.resolve("snappy").toString)
    TableWriter.bulkWrite(rows, base.resolve("zstd").toString, codec = "zstd")
    val a = TableWriter.read(spark, base.resolve("snappy").toString)
    val b = TableWriter.read(spark, base.resolve("zstd").toString)
      .select(a.columns.map(col).toIndexedSeq: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val zfiles = Files.walk(base.resolve("zstd")).iterator().asScala
      .filter(f => f.toString.endsWith(".parquet")).toSeq
    assert(zfiles.nonEmpty && zfiles.forall(_.getFileName.toString.contains("zstd")),
      s"expected zstd-coded part files, got: ${zfiles.map(_.getFileName).mkString(", ")}")
  }

  test("snapshot scan is partition-pruned to the delta's partitions") {
    val lake = Files.createTempDirectory("graft_lake_prune").toString
    TableWriter.bulkWrite(lakeRows(Seq(
      ("a", day(1, 1), "x"), ("b", day(2, 1), "y"), ("c", day(3, 1), "z"))), lake)
    val delta = lakeRows(Seq(("a", day(1, 2), "x2")))
    val pred = TableWriter.touchedPartitionsPredicate(delta).get
    val pruned = TableWriter.read(spark, lake).filter(pred)
    // physical proof of pruning: the scan's numFiles metric after
    // execution must be 1 of the 3 partition files (df.inputFiles shows
    // the UNPRUNED listing, so it can't be used here)
    val plan = pruned.queryExecution.executedPlan
    assert(pruned.collect().length === 1)
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value === 1,
      s"expected the scan to read 1 pruned file; plan:\n$plan")
  }

  test("purgeKeys rewrites only key-named partitions and deletes emptied ones") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft_purge").toString
    val flat = Seq(
      ("acc1", day(1, 1), "a"), ("acc2", day(1, 2), "b"), // day 1: mixed
      ("acc1", day(2, 1), "c"),                           // day 2: acc1 only -> emptied
      ("acc3", day(3, 1), "d"))                           // day 3: untouched
      .toDF("account", "create_at", "note")
      .withColumn("update_at", col("create_at"))
    val rows = Ingest.withPartitionColumns(Ingest.withId(flat))
    TableWriter.bulkWrite(rows, lake)

    def filesOf(p: java.nio.file.Path): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val w = Files.walk(p)
      try w.iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
      finally w.close()
    }
    val d3 = Paths.get(lake, "create_year=2024", "create_month=01", "create_day=03")
    val before = filesOf(d3)

    TableWriter.purgeKeys(spark, lake,
      rows.filter(col("account") === "acc1").select("id"))

    val got = TableWriter.read(spark, lake)
    assert(got.select("account").as[String].collect().sorted === Array("acc2", "acc3"))
    assert(Files.notExists(
      Paths.get(lake, "create_year=2024", "create_month=01", "create_day=02")),
      "a fully-purged partition directory must be deleted, not left stale")
    assert(before === filesOf(d3),
      "a partition the key set does not name must keep its exact files")

    // malformed keys (no ',create_at:<ts>' suffix) must fail LOUDLY:
    // the derived partition predicate would match nothing and the RTBF
    // purge would silently delete nothing — a compliance failure
    val err = intercept[IllegalArgumentException] {
      TableWriter.purgeKeys(spark, lake,
        Seq("not-a-synthetic-id").toDF("id"))
    }
    assert(err.getMessage.contains("purgeKeys"))
  }

  test("writeAuditPublish: failed audit stages but never flips the pointer") {
    import spark.implicits._
    import graft.ops.Profile
    val dir = Files.createTempDirectory("wap").toString
    def audit(df: DataFrame): DataFrame = Profile.qualityReport(Seq(
      Profile.expectUnique(df, "pk", Seq("k")),
      Profile.expectComplete(df, "v_complete", "v")))
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val (_, ok1) = VersionedDir.writeAuditPublish(clean, dir, 1L, audit)
    assert(ok1 && VersionedDir.currentVersion(spark, dir) === Some(1L))
    // duplicate key + null value: audit fails, pointer must stay at 1
    val bad = Seq((1L, "a"), (1L, "a"), (3L, null.asInstanceOf[String])).toDF("k", "v")
    val (rep2, ok2) = VersionedDir.writeAuditPublish(bad, dir, 2L, audit)
    assert(!ok2)
    assert(VersionedDir.currentVersion(spark, dir) === Some(1L))
    assert(VersionedDir.current(spark, dir).get.count() === 2L)
    // the staged dir is preserved for debugging
    assert(Files.exists(Paths.get(dir, "v=2")))
    val reports = rep2.collect().map(r =>
      r.getAs[String]("check_name") -> r.getAs[Long]("n_violations")).toMap
    assert(reports("pk") === 1L && reports("v_complete") === 1L)
    // a corrected batch publishes over the failed stage
    val fixed = Seq((1L, "a"), (3L, "c")).toDF("k", "v")
    val (_, ok3) = VersionedDir.writeAuditPublish(fixed, dir, 2L, audit)
    assert(ok3 && VersionedDir.currentVersion(spark, dir) === Some(2L))
  }

  test("commitLedger: order-free fingerprints, chained hashes, tamper detection") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_ledger").resolve("t").toString
    def digest(df: org.apache.spark.sql.DataFrame) =
      concat(df("k").cast("string"), lit(":"), md5(df("v")))
    VersionedDir.publish(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, 0L)
    VersionedDir.publish(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir, 1L)
    val led = VersionedDir.commitLedger(spark, dir, digest)
      .orderBy("version").collect()
    assert(led.map(_.getAs[Long]("n_rows")).toSeq === Seq(2L, 3L))
    assert(led.map(_.getAs[String]("chain_md5")).distinct.length === 2)
    // fingerprint is ORDER-FREE: republishing v0 with rows swapped
    // leaves the whole chain bit-identical
    VersionedDir.publish(Seq((2L, "b"), (1L, "a")).toDF("k", "v"), dir, 0L)
    val led2 = VersionedDir.commitLedger(spark, dir, digest)
      .orderBy("version").collect()
    assert(led2.map(_.getAs[String]("chain_md5")).toSeq ===
      led.map(_.getAs[String]("chain_md5")).toSeq)
    // tampering with HISTORY (v0 content) changes v0's link AND v1's
    VersionedDir.publish(Seq((1L, "a"), (2L, "TAMPERED")).toDF("k", "v"), dir, 0L)
    val led3 = VersionedDir.commitLedger(spark, dir, digest)
      .orderBy("version").collect()
    assert(led3(0).getAs[String]("chain_md5") !== led(0).getAs[String]("chain_md5"))
    assert(led3(1).getAs[String]("chain_md5") !== led(1).getAs[String]("chain_md5"))
  }
}
