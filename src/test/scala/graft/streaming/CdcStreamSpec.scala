package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ingest.TableWriter
import graft.model.Schemas

/** End-to-end Structured Streaming coverage: landing (T1/T2/T7/K3),
  * continuous merge (T5/T8/K2) and checkpoint-resume on new files only.
  * Uses the file source — the same surface the production pipeline uses.
  */
class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(name: String, acct: String, sec: Int, note: String): String =
    ev2(name, acct, sec, sec, note)

  /** create_at (the immutable range key) and update_at set separately —
    * needed to express replays/updates of an existing record.
    */
  private def ev2(name: String, acct: String, createSec: Int, updateSec: Int,
                  note: String): String =
    s"""{"eventName":"$name","account":"$acct","create_at":"2024-01-01T00:00:${f"$createSec%02d"}.000000+0000","update_at":"2024-01-01T00:00:${f"$updateSec%02d"}.000000+0000","entity":"E","amount":1,"is_credit":0,"note":"$note"}"""

  test("landing stream drops REMOVE and lands minute-partitioned files; merge stream builds and maintains the lake") {
    val root = Files.createTempDirectory("graft_stream")
    val srcDir = root.resolve("src").toString
    val landingDir = root.resolve("landing").toString
    val lakeDir = root.resolve("lake").toString
    Files.createDirectories(Paths.get(srcDir))

    Files.writeString(Paths.get(srcDir, "batch1.json"), Seq(
      ev("INSERT", "acc-1", 1, "v1"),
      ev("INSERT", "acc-2", 2, "v1"),
      ev("REMOVE", "acc-3", 3, "gone"),
      ev("MODIFY", "acc-1", 1, "v2")).mkString("\n"))

    val streamSchema = Schemas.flatCdcRow.add("eventName", "string")
    val src = spark.readStream.schema(streamSchema).json(srcDir)

    // ---- landing leg
    val landQ = CdcStream.landingStream(src, landingDir,
      root.resolve("ckpt_land").toString, triggerInterval = "1 seconds")
    landQ.processAllAvailable()
    landQ.stop()

    val landed = spark.read.schema(Schemas.flatCdcRow).json(landingDir)
    assert(landed.count() === 3, "REMOVE must be dropped at landing")
    assert(landed.filter(col("account") === "acc-3").count() === 0)
    // minute-partition dirs exist (K3 layout)
    assert(Files.exists(Paths.get(landingDir,
      "year=2024", "month=01", "day=01", "hour=00", "minute=00")))

    // ---- merge leg
    val mergeQ = CdcStream.mergeStream(spark, landingDir, lakeDir,
      root.resolve("ckpt_merge").toString, triggerInterval = "1 seconds")
    mergeQ.processAllAvailable()
    mergeQ.stop()

    val lake = TableWriter.read(spark, lakeDir)
    assert(lake.count() === 2, "one row per key after latest-wins merge")
    // same update_at for acc-1's two versions -> delta row order within
    // one batch resolves by content tiebreak; both rows carry v1/v2 with
    // the SAME key+version, so just assert single row per key
    assert(lake.select("id").distinct().count() === 2)

    // ---- checkpoint resume: a new source batch flows through the
    // landing stream (the landing dir carries a _spark_metadata sink
    // log, so the merge source only trusts files the SINK committed —
    // hand-dropped files are invisible by design; that IS the
    // exactly-once contract)
    Files.writeString(Paths.get(srcDir, "batch2.json"),
      """{"eventName":"MODIFY","account":"acc-1","create_at":"2024-01-01T00:00:01.000000+0000","update_at":"2024-01-01T00:01:00.000000+0000","entity":"E","amount":1,"is_credit":0,"note":"v3"}""")
    val landQ2 = CdcStream.landingStream(
      spark.readStream.schema(streamSchema).json(srcDir), landingDir,
      root.resolve("ckpt_land").toString, triggerInterval = "1 seconds")
    landQ2.processAllAvailable()
    landQ2.stop()

    val mergeQ2 = CdcStream.mergeStream(spark, landingDir, lakeDir,
      root.resolve("ckpt_merge").toString, triggerInterval = "1 seconds")
    mergeQ2.processAllAvailable()
    mergeQ2.stop()

    val lake2 = TableWriter.read(spark, lakeDir)
    assert(lake2.count() === 2)
    assert(lake2.filter(col("account") === "acc-1").head().getAs[String]("note") === "v3",
      "newer landed version must win after checkpoint resume")
  }

  test("latestPerKeyStream: custom state emits a key only when its latest version changes") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_stream_state")
    val srcDir = root.resolve("src").toString
    Files.createDirectories(Paths.get(srcDir))
    Files.writeString(Paths.get(srcDir, "b1.json"), Seq(
      ev("INSERT", "acc-1", 1, "v1"),
      ev("MODIFY", "acc-1", 1, "v2"),   // same update_at: arriving wins tie
      ev("REMOVE", "acc-9", 2, "gone"),
      ev("INSERT", "acc-2", 3, "w1")).mkString("\n"))

    val streamSchema = Schemas.flatCdcRow.add("eventName", "string")
    // one long-running query fed incrementally (the memory sink cannot
    // recover from a checkpoint, and this matches real operation anyway)
    val q = CdcStream.latestPerKeyStream(
        spark.readStream.schema(streamSchema).json(srcDir)
          .as[graft.model.CdcEvent])
      .writeStream.format("memory").queryName("graft_latest_state")
      .outputMode("update")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    q.processAllAvailable()
    val out1 = spark.table("graft_latest_state")
      .select("account", "note").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out1.toSet === Set(("acc-1", "v2"), ("acc-2", "w1")),
      s"one emission per key, REMOVE dropped; got ${out1.toSeq}")

    // batch 2: an OLDER replay of acc-1's record (same create_at key,
    // older update_at — must emit nothing) + a real update to acc-2
    Files.writeString(Paths.get(srcDir, "b2.json"), Seq(
      ev2("MODIFY", "acc-1", 1, 0, "stale-replay"),
      ev2("MODIFY", "acc-2", 3, 9, "w2")).mkString("\n"))
    q.processAllAvailable()
    q.stop()
    val out2 = spark.table("graft_latest_state")
      .select("account", "note").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out2.count(_ == ("acc-2", "w2")) === 1, "real update must be emitted")
    assert(!out2.contains(("acc-1", "stale-replay")),
      "an older replayed version must not displace the state winner")
    assert(out2.length === out1.length + 1, "exactly one new emission in batch 2")
  }

  test("stream dedup: duplicates across micro-batches drop; first occurrence wins") {
    val root = Files.createTempDirectory("graft_stream_dedup")
    val srcDir = root.resolve("src").toString
    Files.createDirectories(Paths.get(srcDir))
    Files.writeString(Paths.get(srcDir, "b1.json"), Seq(
      ev("INSERT", "acc-1", 1, "first"),
      ev("INSERT", "acc-1", 2, "dup-same-batch"),
      ev("INSERT", "acc-2", 3, "first")).mkString("\n"))
    val streamSchema = Schemas.flatCdcRow.add("eventName", "string")
    val q = spark.readStream.schema(streamSchema).json(srcDir)
      .withColumn("ts", to_timestamp(substring(col("update_at"), 1, 26),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withWatermark("ts", "90 days")
      .dropDuplicates("account", "entity")
      .select("account", "entity")
      .writeStream.format("memory").queryName("graft_stream_dedup")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    q.processAllAvailable()
    val out1 = spark.table("graft_stream_dedup").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out1.toSet === Set(("acc-1", "E"), ("acc-2", "E")))
    assert(out1.length === 2, "in-batch duplicate must drop")
    // batch 2: a cross-batch duplicate (state must remember acc-1) and
    // one genuinely new key
    Files.writeString(Paths.get(srcDir, "b2.json"), Seq(
      ev("INSERT", "acc-1", 4, "dup-cross-batch"),
      ev("INSERT", "acc-3", 5, "first")).mkString("\n"))
    q.processAllAvailable()
    q.stop()
    val out2 = spark.table("graft_stream_dedup").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out2.length === 3, s"cross-batch duplicate must drop; got ${out2.toSeq}")
    assert(out2.toSet === Set(("acc-1", "E"), ("acc-2", "E"), ("acc-3", "E")))
  }

  test("session windows: gap-merged sessions emit only once the watermark closes them") {
    val root = Files.createTempDirectory("graft_stream_sess")
    val srcDir = root.resolve("src").toString
    Files.createDirectories(Paths.get(srcDir))
    def row(acct: String, hh: Int, mm: Int): String = {
      val ts = f"2024-01-01T$hh%02d:$mm%02d:00.000000+0000"
      s"""{"account":"$acct","create_at":"$ts","update_at":"$ts","entity":"E","amount":1,"is_credit":0,"note":"n"}"""
    }
    // a: 00:00 and 00:02 merge (gap 5m); 00:20 is its own session.
    // z at 02:00 advances the watermark (1m delay) past both.
    Files.writeString(Paths.get(srcDir, "b1.json"), Seq(
      row("a", 0, 0), row("a", 0, 2), row("a", 0, 20),
      row("z", 2, 0)).mkString("\n"))
    val q = spark.readStream.schema(Schemas.flatCdcRow).json(srcDir)
      .withColumn("ts", to_timestamp(substring(col("update_at"), 1, 26),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "5 minutes").as("sw"), col("account"))
      .agg(count(lit(1)).cast("long").as("n_events"))
      .select(col("account"),
        col("sw.start").cast("string").as("st"),
        col("sw.end").cast("string").as("en"), col("n_events"))
      .writeStream.format("memory").queryName("graft_sessions")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("graft_sessions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    // z's own session is still OPEN (wm = 01:59 < its end) — only a's
    assert(out.toSet === Set(
      ("a", "2024-01-01 00:00:00", "2024-01-01 00:07:00", 2L),
      ("a", "2024-01-01 00:20:00", "2024-01-01 00:25:00", 1L)),
      s"closed gap-merged sessions only; got ${out.toSeq}")
  }

  test("windowedStreamJoin: pairs within the window, never across windows") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft_ssj")
    val aDir = root.resolve("a").toString
    val bDir = root.resolve("b").toString
    Files.createDirectories(Paths.get(aDir))
    Files.createDirectories(Paths.get(bDir))
    // left: k1 in minute 00, k2 in minute 01; right: k1 in minute 00
    // (joins), k1 in minute 01 (different window -> must NOT join k1's
    // minute-00 row), k2 in minute 01 (joins)
    Files.writeString(Paths.get(aDir, "a.json"),
      """{"k":"k1","t":"2024-01-01T00:00:10.000000+0000","av":1}
        |{"k":"k2","t":"2024-01-01T00:01:10.000000+0000","av":2}""".stripMargin)
    Files.writeString(Paths.get(bDir, "b.json"),
      """{"k":"k1","t":"2024-01-01T00:00:50.000000+0000","bv":10}
        |{"k":"k1","t":"2024-01-01T00:01:20.000000+0000","bv":11}
        |{"k":"k2","t":"2024-01-01T00:01:40.000000+0000","bv":12}""".stripMargin)
    val aSchema = "k STRING, t STRING, av INT"
    val bSchema = "k STRING, t STRING, bv INT"
    val left = spark.readStream.schema(aSchema).json(aDir)
      .withColumn("ts_a", to_timestamp(col("t"), Schemas.TsPattern)).drop("t")
    val right = spark.readStream.schema(bSchema).json(bDir)
      .withColumn("ts_b", to_timestamp(col("t"), Schemas.TsPattern)).drop("t")
    CdcStream.windowedStreamJoin(left, "ts_a", right, "ts_b",
        windowDur = "1 minute", watermark = "10 minutes", keys = Seq("k"))
      .select("k", "av", "bv")
      .writeStream.format("memory").queryName("ssj_spec")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start().awaitTermination()
    val got = spark.table("ssj_spec").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === Set(("k1", 1, 10), ("k2", 2, 12)),
      "only same-window pairs may join")
  }

  test("minuteCounts: streaming tumbling windows with 2-minute watermark emit per-minute counts") {
    val root = Files.createTempDirectory("graft_stream_win")
    val srcDir = root.resolve("src").toString
    Files.createDirectories(Paths.get(srcDir))
    def row(min: Int, sec: Int): String = {
      val ts = f"2024-01-01T00:$min%02d:$sec%02d.000000+0000"
      s"""{"account":"a","create_at":"$ts","update_at":"$ts","entity":"E","amount":1,"is_credit":0,"note":"n"}"""
    }
    Files.writeString(Paths.get(srcDir, "b1.json"),
      Seq(row(0, 10), row(0, 40), row(1, 5), row(5, 0)).mkString("\n"))

    val src = spark.readStream.schema(Schemas.flatCdcRow).json(srcDir)
    val counts = CdcStream.minuteCounts(src)
    val q = counts.writeStream
      .format("memory").queryName("graft_minute_counts")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    q.processAllAvailable()
    // append mode only emits windows the watermark has CLOSED: max event
    // 00:05:00 - 2min watermark = 00:03 -> windows 00:00 and 00:01 are
    // final, 00:05 is still open (T3 semantics)
    val out = spark.table("graft_minute_counts")
      .select(col("window.start").cast("string").as("w"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    q.stop()
    assert(out === Map(
      "2024-01-01 00:00:00" -> 2L,
      "2024-01-01 00:01:00" -> 1L),
      s"closed windows only; got $out")
  }

  test("sketchMaintenance: versioned snapshots, pointer read-back, replay idempotency") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sketch")
    val srcDir = root.resolve("src").toString
    val sketchDir = root.resolve("sketches").toString
    val data = (0 until 900).map(i => (s"d${i % 3}", (i % 200).toLong))
    data.toDF("day", "u").repartition(3).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(data.toDF("day", "u").schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    CdcStream.sketchMaintenance(stream, sketchDir, "day", "u",
      root.resolve("ckpt").toString)

    val cur = CdcStream.currentSketches(spark, sketchDir).get
    def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("day"), expr("hll_sketch_estimate(sk)").as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 days x 200 distinct users; lgK=14 is near-exact at this size
    val est = estimates(cur)
    assert(est.keySet === Set("d0", "d1", "d2"))
    est.values.foreach(v => assert(math.abs(v - 200L) <= 10L, s"estimate $v"))

    // replay simulation: re-merge the WHOLE input's sketch into the
    // current snapshot — register-wise max means estimates are unchanged
    val replayed = cur.unionByName(
        data.toDF("day", "u").groupBy(col("day"))
          .agg(expr("hll_sketch_agg(u, 14)").as("sk")))
      .groupBy(col("day")).agg(expr("hll_union_agg(sk)").as("sk"))
    assert(estimates(replayed) === est,
      "re-merging already-counted data must not change any estimate")

    // pointer names the last snapshot; earlier versions remain on disk
    val vDirs = new java.io.File(sketchDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v=")).map(_.getName)
    assert(vDirs.length >= 2, s"expected per-epoch snapshot dirs, got ${vDirs.toSeq}")

    // retention: prune to the most recent snapshot; the pointer target
    // survives and still reads back the same estimates
    val removed = CdcStream.pruneSketchVersions(spark, sketchDir, keep = 1)
    assert(removed === vDirs.length - 1)
    assert(estimates(CdcStream.currentSketches(spark, sketchDir).get) === est,
      "pruning old snapshots must not touch the current one")
  }

  test("viewMaintenance: signed-delta view tracks the upserted state; full replay converges") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_view")
    def df(rows: (String, String, String, Long, String, Double)*) =
      rows.toDF("id", "account", "update_at", "event_id", "entity", "amount")
    val snap = df(
      ("k1", "a1", "2024-01-01", 10L, "order", 10.0),
      ("k2", "a1", "2024-01-01", 11L, "order", 20.0),
      ("k3", "a2", "2024-01-01", 12L, "order", 30.0))
    val delta = df(
      ("k1", "a1", "2024-01-02", 20L, "order", 15.0),  // update
      ("k3", "a2", "2024-01-02", 21L, "error", 0.0),   // tombstone
      ("k4", "a3", "2024-01-02", 22L, "order", 5.0),   // insert
      ("k2", "a1", "2023-01-01", 23L, "order", 99.0))  // stale no-op
    val srcDir = root.resolve("src").toString
    delta.repartition(2).write.mode("overwrite").parquet(srcDir)

    def drain(ckpt: String): Map[String, (Long, Double)] = {
      val stream = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      CdcStream.viewMaintenance(stream, snap,
        root.resolve("state").toString, root.resolve("view").toString,
        col("entity") === "error", ckpt)
      graft.ingest.VersionedDir.current(spark, root.resolve("view").toString).get
        .collect().map(r => r.getAs[String]("account") ->
          (r.getAs[Long]("n_rows"),
            r.getAs[java.math.BigDecimal]("total").doubleValue())).toMap
    }
    val v1 = drain(root.resolve("ckpt1").toString)
    assert(v1 === Map("a1" -> ((2L, 35.0)), "a3" -> ((1L, 5.0))))
    // state table agrees with the view at every key
    val st = graft.ingest.VersionedDir.current(spark, root.resolve("state").toString).get
    assert(st.count() === 3 && st.filter(col("id") === "k3").count() === 0)
    // crash-replay convergence: a FRESH checkpoint replays every batch
    // against explicit v=batchId-1 reads — the rebuilt chain must land
    // on the identical view (signed sums applied exactly once)
    val v2 = drain(root.resolve("ckpt2").toString)
    assert(v2 === v1)
  }

  test("prune never deletes the pointed-at snapshot, even with a newer unpointed dir") {
    // crash-window shape: v=N exists on disk but _LATEST still names
    // v=N-1 (the epoch died between the snapshot write and the pointer
    // flip). keep=1 keeps the newest dir BY NUMBER (v=N) — the pointer
    // target must survive anyway, or readers break.
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    import spark.implicits._
    Seq(("d1", 1L)).toDF("day", "u").write.parquet(s"$dir/v=1")
    Seq(("d1", 2L)).toDF("day", "u").write.parquet(s"$dir/v=2")
    Seq(("d1", 3L)).toDF("day", "u").write.parquet(s"$dir/v=3")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_LATEST"),
      "2".getBytes("UTF-8"))
    val removed = CdcStream.pruneSketchVersions(spark, dir, keep = 1)
    assert(removed === 1, "only v=1 is deletable: v=3 is newest, v=2 is pointed-at")
    val left = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v=")).map(_.getName).toSet
    assert(left === Set("v=2", "v=3"))
    assert(CdcStream.currentSketches(spark, dir).get.count() === 1L,
      "the pointed-at snapshot must still read back")
  }

  test("streamQualityCounts: epoch-keyed commits; full replay leaves totals fixed") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sq")
    val srcDir = root.resolve("src").toString
    val outDir = root.resolve("counts").toString
    val data = (0 until 90).map(i => (s"s${i % 3}", i % 2 == 0))
    data.toDF("stratum", "keep").repartition(3).write.mode("overwrite").parquet(srcDir)
    def drain(ck: String): Unit = CdcStream.streamQualityCounts(
      spark.readStream.schema(data.toDF("stratum", "keep").schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      outDir, "stratum", "keep", root.resolve(ck).toString)
    def totals: Map[String, (Long, Long)] = spark.read.parquet(outDir)
      .groupBy("stratum").agg(sum("n_docs").as("d"), sum("n_keep").as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    drain("ck1")
    val first = totals
    assert(first === Map("s0" -> (30L, 15L), "s1" -> (30L, 15L), "s2" -> (30L, 15L)))
    // epoch dirs: one per micro-batch (3 files, maxFilesPerTrigger=1)
    val epochs = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("epoch=")).map(_.getName)
    assert(epochs.length === 3, s"expected 3 epoch dirs, got ${epochs.toSeq}")
    // full replay with a FRESH checkpoint reprocesses every file into
    // the same epoch ids — overwrite semantics keep totals identical
    drain("ck2")
    assert(totals === first, "replay must rewrite epochs, not double-count")
  }
}
