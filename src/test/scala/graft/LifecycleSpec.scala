package graft

import java.nio.file.{Files, Path, Paths}
import java.time.{Duration, Instant}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.codec.DynamoDbJson
import graft.faker.TransactionFaker
import graft.ingest.{Ingest, TableWriter}
import graft.merge.Merge
import graft.model.Schemas
import graft.orchestrate.{CdcTracker, Persist}
import graft.query.QuerySurface
import graft.sources.Manifest

/** The reference's whole example.ipynb lifecycle in one deterministic
  * run: DynamoDB export (S4/S5/S6 manifests + tracker + .json.gz data)
  * → initial load (S1/K1) → CDC landing (K3) → cron-tracker planned,
  * file-capped incremental merges (S2/S3/P9/O4/T3-T6, K2) → full-table
  * compare oracle (J2/S7). The CDC feed REPLAYS events that predate the
  * export snapshot, so convergence also proves replay idempotency (T8)
  * end-to-end, exactly like Hudi's precombine makes the reference
  * tolerate the stream/export overlap.
  */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("export → initial load → CDC catch-up ticks → source/lake compare is clean") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lifecycle")
    // ~1 s per event → 1600 events span ~30 minutes of partitions, so
    // the 1-minute interval cap forces a real multi-tick catch-up
    val faker = new TransactionFaker(seed = 42L, tickMicros = 1000000L)

    // ---- phase 1: business writes happen; at T0 an export is taken
    val preExport = faker.events(800)
    val snapshotAtT0 = faker.tableState

    val exportId = "01690000000000-deadbeef"
    val exportRoot = root.resolve("exports").toString
    val dataDir = s"$exportRoot/AWSDynamoDB/$exportId/data"
    DynamoDbJson.encodeExportLines(snapshotAtT0.toDF())
      .write.mode("overwrite").option("compression", "gzip").text(dataDir)

    // the reference's worker names its outputs NNNNNN.json.gz
    // (…post_processor_worker.py:61-67); Spark's text sink emits
    // .txt.gz part files, so rename to the wire convention
    Files.list(Paths.get(dataDir)).iterator().asScala
      .filter(_.toString.endsWith(".txt.gz")).toSeq.zipWithIndex
      .foreach { case (f, i) =>
        Files.move(f, f.resolveSibling(f"$i%06d.json.gz"))
      }
    // manifest-files.json + export tracker, then resolve the dir back
    // through the S4 path like initial_load.py:79-90 does
    val dataFiles = Files.list(Paths.get(dataDir)).iterator().asScala
      .filter(_.toString.endsWith(".json.gz")).toSeq.sortBy(_.toString)
    Manifest.writeDataFiles(
      dataFiles.map(f => (1L, "md5-x", "etag-x",
        s"AWSDynamoDB/$exportId/data/${f.getFileName}")).toDF(
        "itemCount", "md5Checksum", "etag", "dataFileS3Key"),
      root.resolve("manifest").toString)
    Manifest.writeExportTracker(
      Manifest.ExportTracker(s"arn:aws:dynamodb:us-east-1:1:table/T/export/$exportId"),
      root.resolve("tracker.json").toString)

    val tracker = Manifest.readExportTracker(root.resolve("tracker.json").toString)
    assert(tracker.dataDir(exportRoot) === dataDir)
    val manifest = Manifest.readDataFiles(spark, root.resolve("manifest").toString)
    val exportFiles = manifest.select("dataFileS3Key").as[String].collect().sorted
      .map(k => s"$exportRoot/$k").toSeq

    // S2 explicit-file-list read of the export, decode, initial load
    val decoded = DynamoDbJson.decodeExportLines(
      spark.read.text(exportFiles: _*))
    val lakePath = root.resolve("lake").toString
    TableWriter.bulkWrite(Ingest.toLakeRows(decoded), lakePath)
    assert(TableWriter.read(spark, lakePath).count() === snapshotAtT0.size.toLong)

    // ---- phase 2: CDC continues; the FULL event log (incl. pre-T0
    // replays) lands minute-partitioned
    val postExport = faker.events(800)
    val finalState = faker.tableState
    val landingDir = root.resolve("landing").toString
    val allEvents = (preExport ++ postExport).toDF()
    Ingest.landCdc(Merge.filterRemoves(allEvents, "eventName").drop("eventName"), landingDir)

    // ---- phase 3: cron ticks — tracker state machine + job-input serde
    def relFiles(): Seq[String] = {
      val w = Files.walk(Paths.get(landingDir))
      try w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".json"))
        .map(p => Paths.get(landingDir).relativize(p).toString).toSeq
      finally w.close()
    }

    val firstMinute = relFiles().sorted.head.split('/').init.mkString("/")
    var state = CdcTracker.State(
      // bootstrap one minute BEFORE the first landed partition
      CdcTracker.partitionOf(
        CdcTracker.parsePartition(firstMinute).minus(Duration.ofMinutes(1))),
      None, None, readyToRunNext = true)
    val lastMinute = relFiles().sorted.last.split('/').init.mkString("/")
    val now = CdcTracker.parsePartition(lastMinute).plus(Duration.ofMinutes(3))

    var ticks = 0
    var merged = 0
    while (ticks < 50 && CdcTracker.parsePartition(state.lastProcessedPartition)
        .isBefore(CdcTracker.parsePartition(lastMinute))) {
      CdcTracker.plan(state, now, relFiles(), maxFiles = 100,
          maxInterval = Duration.ofMinutes(1)) match {
        case Some(p) =>
          // job-input round-trip (S3) exactly like orchestration.py:240-277
          val inputPath = root.resolve(s"input_$ticks.json").toString
          Persist.writeJobInput(Persist.JobInput(
            p.startAfterPartition, p.endBeforePartition, p.files), inputPath)
          val input = Persist.readJobInput(inputPath)
          if (input.s3uriList.nonEmpty) {
            val delta = Ingest.toLakeRows(
              Ingest.readCdcFiles(spark, input.s3uriList.map(f => s"$landingDir/$f")))
            TableWriter.mergeCommit(spark, delta, lakePath)
            merged += input.s3uriList.size
          }
          state = CdcTracker.completed(CdcTracker.launched(state, p, s"run-$ticks"))
        case None =>
          state = CdcTracker.completed(state)
      }
      ticks += 1
    }
    assert(merged > 0, "at least one incremental merge must have run")
    assert(ticks > 2, "the 1-minute interval cap must force multiple ticks")

    // ---- phase 4: the compare oracle (compare.py:50-79)
    val source = Ingest.toLakeRows(finalState.toDF())
    val lake = TableWriter.read(spark, lakePath)
      .select(source.columns.map(col).toIndexedSeq: _*)
    val (onlySource, onlyLake) = QuerySurface.compare(source, lake)
    assert(onlySource.isEmpty && onlyLake.isEmpty,
      s"source/lake diverged: ${onlySource.count()} source-only, ${onlyLake.count()} lake-only rows")
    assert(lake.count() === finalState.size.toLong)

    // ---- phase 5: the Athena-style raw-SQL read surface over the lake
    graft.query.SqlSurface.registerLake(spark, lakePath)
    val nSql = graft.query.SqlSurface.countRows(spark, "transactions")
      .head().getLong(0)
    assert(nSql === finalState.size.toLong)
    val prev = graft.query.SqlSurface.previewSql(spark, "transactions", 5).collect()
    assert(prev.length === 5)
    val distinctAccts = graft.query.SqlSurface.query(spark,
      "SELECT COUNT(DISTINCT account) AS n FROM transactions").head().getLong(0)
    assert(distinctAccts > 0 && distinctAccts <= nSql)

    // ---- phase 6: landing retention — minute partitions at or before
    // the tracker cursor are pruned (transient zone must not grow
    // forever; the reference leans on S3 lifecycle rules for this)
    def minuteDirs(): Seq[String] = {
      val w = Files.walk(Paths.get(landingDir))
      try w.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("minute="))
        .map(p => Paths.get(landingDir).relativize(p).toString).toSeq
      finally w.close()
    }
    val before = minuteDirs()
    assert(before.nonEmpty)
    val removed = Ingest.pruneLanding(landingDir, state.lastProcessedPartition)
    assert(removed === before.count(_ <= state.lastProcessedPartition))
    val after = minuteDirs()
    assert(after.forall(_ > state.lastProcessedPartition),
      "only unprocessed partitions may remain in the landing zone")
    assert(before.size - after.size === removed)
    assert(Ingest.pruneLanding(landingDir, state.lastProcessedPartition) === 0,
      "retention must be idempotent")
  }

  test("backfill->stream handoff: a key updated in BOTH halves resolves to the stream-side latest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_handoff")
    val lake = s"$root/lake/tbl"
    val cols = Seq("account", "create_at", "update_at", "entity", "amount", "is_credit", "note")
    // hour A (batch backfill): key K at v1 + an A-only key
    val hourA = Seq(
      ("acc-K", "2024-01-02T00:00:01.000000+0000", "2024-01-02T00:00:01.000000+0000", "e1", 10, 1, "v1"),
      ("acc-A", "2024-01-02T00:00:02.000000+0000", "2024-01-02T00:00:02.000000+0000", "e1", 20, 0, "a")
    ).toDF(cols: _*)
    // hour B (streamed): the SAME key K re-updated at v2 + a B-only key
    val hourB = Seq(
      ("acc-K", "2024-01-02T00:00:01.000000+0000", "2024-01-02T01:00:01.000000+0000", "e2", 11, 1, "v2"),
      ("acc-B", "2024-01-02T01:00:03.000000+0000", "2024-01-02T01:00:03.000000+0000", "e1", 30, 0, "b")
    ).toDF(cols: _*)
    graft.ingest.TableWriter.mergeCommit(spark,
      graft.ingest.Ingest.toLakeRows(hourA), lake)
    val landing = s"$root/landing"
    graft.ingest.Ingest.landCdc(hourB, landing)
    graft.streaming.CdcStream.mergeStream(spark, landing, lake,
      s"$root/ckpt", maxFilesPerTrigger = 1, availableNow = true).awaitTermination()
    val got = graft.ingest.TableWriter.read(spark, lake)
      .select("id", "update_at", "note").orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(got.length === 3, s"3 distinct keys expected, got ${got.toSeq}")
    val k = got.find(_._1.startsWith("account:acc-K")).get
    assert(k._2 === "v2",
      "the stream-side re-update of a batch-backfilled key must win (precombine on update_at)")
    assert(got.exists(_._1.startsWith("account:acc-A")) &&
      got.exists(_._1.startsWith("account:acc-B")))
  }
}
