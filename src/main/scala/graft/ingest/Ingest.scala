package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Batch ingestion: initial-load derivations and CDC landing.
  *
  * Spark-first replacement for the reference's two Glue jobs' transform
  * sections (glue_jobs/initial_load.py:124-153,
  * glue_jobs/incremental.py:118-148) and the stream consumer's
  * minute-partitioned landing (dynamodb_stream_consumer.py:62-90).
  */
object Ingest {

  /** Synthetic record key: `"account:" + account + ",create_at:" + create_at`
    * (initial_load.py:124-133, dynamodb_table.py:31-44).
    */
  def withId(df: DataFrame): DataFrame =
    df.withColumn("id", concat(
      lit("account:"), col("account"), lit(",create_at:"), col("create_at")))

  /** 5-level partition columns by fixed-offset substring of the
    * zero-padded ISO string (initial_load.py:134-153). The substring
    * trick is deliberate: it never parses the timestamp, so it is
    * codegen-friendly and immune to format/locale drift — but it REQUIRES
    * the validated wire format (Schemas.TsPattern); we enforce it with an
    * explicit schema instead of inference.
    */
  def withPartitionColumns(df: DataFrame, src: String = "create_at"): DataFrame =
    df.withColumn("create_year", substring(col(src), 1, 4))
      .withColumn("create_month", substring(col(src), 6, 2))
      .withColumn("create_day", substring(col(src), 9, 2))
      .withColumn("create_hour", substring(col(src), 12, 2))
      .withColumn("create_minute", substring(col(src), 15, 2))

  /** Full initial-load transform: flat rows -> 13-column lake rows. */
  def toLakeRows(flat: DataFrame): DataFrame = {
    val derived = withPartitionColumns(withId(flat))
    derived.select("id", "account", "create_at", "update_at", "entity",
      "amount", "is_credit", "note", "create_year", "create_month",
      "create_day", "create_hour", "create_minute")
  }

  /** Initial load: read the processed export (gzip JSON-lines of flat
    * rows, explicit schema — never inferred) and derive the lake shape.
    * Replaces initial_load.py:95-153 (DynamicFrame scan + withColumns).
    */
  def initialLoad(spark: SparkSession, dir: String): DataFrame =
    toLakeRows(spark.read.schema(Schemas.flatCdcRow)
      .option("recursiveFileLookup", "true").json(dir))

  /** CDC landing: minute-partitioned JSON-lines keyed by update_at
    * (dynamodb_stream_consumer.py:62-90). NOTE the reference asymmetry:
    * landing partitions derive from update_at (arrival window), lake
    * partitions from create_at (event time) — SURVEY.md §1.2.
    *
    * At 100 TB, minute-level dirs in the LAKE would be tiny-file
    * pathological; minute granularity is kept only here in the transient
    * landing zone, which is pruned by the orchestrator's time-range scan
    * and compacted away by the merge job.
    */
  def landCdc(events: DataFrame, dir: String): Unit = {
    val partitioned = events
      .withColumn("year", substring(col("update_at"), 1, 4))
      .withColumn("month", substring(col("update_at"), 6, 2))
      .withColumn("day", substring(col("update_at"), 9, 2))
      .withColumn("hour", substring(col("update_at"), 12, 2))
      .withColumn("minute", substring(col("update_at"), 15, 2))
    // hash-repartition on the partition columns: each minute's rows
    // land in exactly one task, so the dynamic partitionBy write emits
    // ONE file per minute dir (the bounded-small-files contract) while
    // the write itself parallelizes across executors — a caller-side
    // coalesce(1) enforced the same file layout serially, which at
    // 100 TB/day of CDC would bottleneck the whole landing path on a
    // single task
    partitioned
      .repartition(col("year"), col("month"), col("day"),
        col("hour"), col("minute"))
      .write
      .partitionBy("year", "month", "day", "hour", "minute")
      .mode("append").json(dir)
  }

  /** Read back a set of landed CDC files (explicit file list, like the
    * incremental Glue job's manifest-driven scan — incremental.py:103-110).
    */
  def readCdcFiles(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.schema(Schemas.flatCdcRow).json(paths: _*)

  /** Landing-zone retention: delete minute partitions the merge has
    * already absorbed (relative partition path <= the tracker cursor,
    * i.e. `CdcTracker.State.lastProcessedPartition` — the cursor is the
    * last minute INSIDE the processed half-open range, so `<=` is
    * exact). The reference leans on S3 lifecycle rules for this; an
    * explicit idempotent cleanup keeps the transient landing zone from
    * accumulating minute-dirs forever. Driver-side listing is O(dirs) —
    * the same order of work as the tracker's own partition listing.
    * Returns the number of minute partitions removed.
    */
  def pruneLanding(dir: String, throughPartition: String): Int = {
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    if (!Files.exists(root)) return 0
    val doomed = {
      val s = Files.walk(root, 5)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("minute=")
          && root.relativize(p).toString <= throughPartition)
        .toVector
      finally s.close()
    }
    doomed.foreach { p =>
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
    // sweep now-empty parent dirs (hour/day/month/year) bottom-up
    val all = {
      val s = Files.walk(root)
      try s.sorted(Comparator.reverseOrder[Path]()).iterator().asScala.toVector
      finally s.close()
    }
    all.foreach { p =>
      if (p != root && Files.isDirectory(p)) {
        val ls = Files.list(p)
        val empty = try !ls.iterator().hasNext finally ls.close()
        if (empty) Files.delete(p)
      }
    }
    doomed.size
  }
}

/** Idempotent lake writer emulating Hudi COPY_ON_WRITE semantics with
  * plain Parquet (no Hudi jar in this environment — SURVEY.md §7).
  * Dynamic partition overwrite rewrites only the partitions present in
  * the incoming batch, which is what Hudi COW does per commit.
  */
object TableWriter {
  import graft.merge.Merge

  val partitionCols: Seq[String] =
    Seq("create_year", "create_month", "create_day")

  /** Bulk write (initial load): full overwrite, like Hudi
    * `mode("overwrite")` (initial_load.py:163-186). Lake layout coarsens
    * to day-level partitions (SURVEY.md §7.6 item 5): minute-level dirs
    * at 100 TB mean ~5e5 dirs/year × tiny files; day-level keeps pruning
    * effective with healthy file sizes.
    */
  def bulkWrite(lake: DataFrame, path: String, codec: String = "snappy"): Unit =
    lake.write.option("compression", codec)
      .partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  /** Upsert commit: merge result written with dynamic partition
    * overwrite — only partitions present in `merged` are replaced.
    */
  def upsertWrite(merged: DataFrame, path: String): Unit =
    merged.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)

  /** A disjunction of partition-column equalities for the distinct
    * partitions present in `delta` — collected to the driver (tiny: one
    * tuple per touched DAY; a CDC tick caps at 100 minute-files, so a
    * handful of days at most) and pushed into the snapshot scan, where
    * Catalyst turns it into partition-directory pruning.
    */
  def touchedPartitionsPredicate(delta: DataFrame): Option[Column] = {
    val parts = delta.select(partitionCols.map(col): _*).distinct().collect()
    if (parts.isEmpty) None
    else Some(parts.map { r =>
      partitionCols.zipWithIndex
        // null-safe <=>: a null partition value (__HIVE_DEFAULT_PARTITION__)
        // must still select its existing versions, or merging silently
        // duplicates those keys
        .map { case (c, i) => col(c) <=> lit(r.getString(i)) }
        .reduce(_ && _)
    }.reduce(_ || _))
  }

  /** The O(delta)-cost upsert commit — the scale path for the CDC loop.
    *
    * The lake is partitioned by create_* which derive from `create_at`,
    * an IMMUTABLE component of the record key `id` (initial_load.py:
    * 124-153: id = account + create_at). Hence every existing version of
    * a delta key lives in a partition the delta itself names — pruning
    * the snapshot to the delta's partitions loses nothing, and the merge
    * is exact while doing O(touched partitions) work per commit instead
    * of O(table) (at 100 TB: a few GB read+rewritten per tick, not the
    * lake).
    *
    * `localCheckpoint` materializes only that pruned merged slice before
    * the dynamic overwrite replaces the files it was read from (Spark
    * refuses a same-path read-write cycle otherwise); the checkpoint
    * cost is O(delta partitions), not O(table).
    */
  def mergeCommit(spark: SparkSession, delta: DataFrame, path: String,
                  keyCol: String = "id", versionCol: String = "update_at"): Unit = {
    if (!new java.io.File(path).exists()) {
      // bootstrap: the first delta IS the table — but it can still carry
      // several versions of one key, so it gets the same in-batch dedup
      // a merge would apply
      bulkWrite(Merge.dedupLatest(delta, keyCol, versionCol), path)
    } else {
      touchedPartitionsPredicate(delta).foreach { pred =>
        val snapshotSlice = read(spark, path).filter(pred)
        val merged = Merge.upsert(snapshotSlice, delta, keyCol, versionCol)
        upsertWrite(merged.localCheckpoint(), path)
      }
    }
  }

  /** Read the lake with partition columns pinned to their canonical
    * zero-padded STRING form. A session with partition type inference
    * enabled (the Spark default; GraftSession disables it) reads
    * `create_day=08` back as int 8 — and a subsequent dynamic-overwrite
    * write would then create `create_day=8` BESIDE the existing
    * `create_day=08`, silently duplicating the partition's rows on read
    * (both dirs parse to the same logical value). Every TableWriter
    * write path routes through this read, so the library is safe on any
    * session, not just GraftSession.
    *
    * The pin is a USER-SPECIFIED SCHEMA, not a post-read rewrite: a
    * user schema disables partition type inference for that read, so
    * the directory string `08` survives as-is AND the `create_*`
    * columns remain genuine partition columns — filters on them (the
    * merge tick's touched-partitions predicate, compaction's day
    * predicate) still prune at the directory level. A `withColumn`
    * rewrite would have silently turned those O(delta) scans into
    * O(table) post-scan filters on inference-enabled sessions.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val first = spark.read.parquet(path)
    if (partitionCols.forall(c =>
        first.schema(c).dataType == org.apache.spark.sql.types.StringType)) first
    else {
      // schema-only pass above (footer + dir listing); re-read with the
      // partition columns forced to string
      val pinned = org.apache.spark.sql.types.StructType(first.schema.map { f =>
        if (partitionCols.contains(f.name))
          f.copy(dataType = org.apache.spark.sql.types.StringType)
        else f
      })
      spark.read.schema(pinned).parquet(path)
    }
  }

  /** Small-file compaction for one day partition: every 10 s merge tick
    * adds a few files to each touched day, so a hot partition
    * accumulates thousands of small files over days — the classic CDC
    * lake pathology. Rewrite just that partition into `targetFiles`
    * files via the same dynamic-overwrite path a merge commit uses:
    * O(partition) IO, untouched partitions keep their files, readers
    * see the old file set until the atomic-per-file swap completes.
    * Run on a compaction cadence (hourly/daily), not per tick.
    */
  def compactPartition(spark: SparkSession, path: String,
                       year: String, month: String, day: String,
                       targetFiles: Int = 1): Unit = {
    val pred = col("create_year") === year &&
      col("create_month") === month && col("create_day") === day
    val slice = read(spark, path).filter(pred).coalesce(targetFiles)
    // localCheckpoint breaks the read-from/write-to-same-path cycle;
    // cost is O(this partition), never the table
    upsertWrite(slice.localCheckpoint(), path)
  }

  /** Right-to-be-forgotten purge: delete every lake row whose `keyCol`
    * is in `keys`, rewriting ONLY the partitions that can contain those
    * keys — O(touched partitions), never a table scan.
    *
    * Works because the record key embeds its immutable `create_at`
    * (initial_load.py:124-133), the same invariant [[mergeCommit]]
    * leans on: the key set itself NAMES its partitions, so the touched
    * set derives from the keys alone (no lake read to locate them).
    * Inside each touched partition the survivors are a broadcastable
    * anti-join (the purge set is small — a user's keys, not a corpus).
    *
    * Dynamic partition overwrite cannot DELETE a partition that ends up
    * empty (it only replaces partitions present in the written data),
    * so fully-purged partitions are removed explicitly through the
    * Hadoop FileSystem — without this, readers would keep seeing every
    * purged row of any partition the purge emptied.
    */
  def purgeKeys(spark: SparkSession, path: String, keys: DataFrame,
                keyCol: String = "id"): Unit = {
    val withTs = keys.select(col(keyCol).as("__k"),
      substring_index(col(keyCol), ",create_at:", -1).as("create_at"))
    // fail LOUDLY if any key lacks the synthetic-id suffix (custom
    // keyCol, malformed id): the partition predicate derived from a bad
    // extraction matches nothing and the RTBF purge would silently
    // delete nothing — a silent compliance failure. Purge sets are
    // small (a user's keys), so this extra pass is cheap.
    val bad = withTs.filter(!col("create_at").rlike(
      "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{6}[+-]\\d{4}$")).count()
    require(bad == 0,
      s"purgeKeys: $bad key(s) do not embed a ',create_at:<${Schemas.TsPattern}>' " +
        "suffix; refusing to purge (the derived partition predicate would be wrong)")
    val withParts = Ingest.withPartitionColumns(withTs)
    touchedPartitionsPredicate(withParts).foreach { pred =>
      val touched = withParts.select(partitionCols.map(col): _*).distinct()
        .collect().map(r => partitionCols.indices.map(r.getString).toSeq)
      val slice = read(spark, path).filter(pred)
      val kept = slice.join(
          broadcast(keys.select(col(keyCol).as("__k")).distinct()),
          slice(keyCol) === col("__k"), "left_anti")
        .localCheckpoint()
      val surviving = kept.select(partitionCols.map(col): _*).distinct()
        .collect().map(r => partitionCols.indices.map(r.getString).toSeq).toSet
      upsertWrite(kept, path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.filterNot(surviving).foreach { p =>
        val dir = partitionCols.zip(p).map { case (c, v) => s"$c=$v" }
          .mkString(path + "/", "/", "")
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      }
    }
  }
}
