package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** Versioned parquet snapshot dir with an atomic `_LATEST` pointer —
  * the commit pattern behind the streaming HLL sketch table (hl2) and
  * the incremental dedup signature store (dd12): each publish writes a
  * NEW `v=<version>` dir and then flips the pointer with a single
  * atomic overwrite-rename, so readers never observe a partial table
  * and a crash at any point leaves the previous snapshot live.
  *
  * Replay safety is the CALLER's contract: re-publishing the same
  * version overwrites the same dir (idempotent), and merge-style
  * callers (HLL union) are idempotent by algebra.
  */
object VersionedDir {

  /** Write `df` as snapshot `v=<version>` under `dir` WITHOUT moving
    * the pointer — readers of `current` still see the prior snapshot.
    */
  def stage(df: DataFrame, dir: String, version: Long): Unit =
    df.write.mode("overwrite").parquet(s"$dir/v=$version")

  /** Atomically point `_LATEST` at an (already staged) version. */
  def flipPointer(spark: SparkSession, dir: String, version: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val tmp = new Path(dir, s"_LATEST.$version.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    // atomic overwrite-rename: no delete-then-rename window in which a
    // crash would leave NO pointer; FileContext.rename throws on
    // failure rather than returning an unchecked boolean
    val fc = FileContext.getFileContext(new Path(dir).toUri, conf)
    fc.rename(tmp, new Path(dir, "_LATEST"), Options.Rename.OVERWRITE)
  }

  /** Write `df` as snapshot `v=<version>` under `dir` and atomically
    * point `_LATEST` at it.
    */
  def publish(df: DataFrame, dir: String, version: Long): Unit = {
    stage(df, dir, version)
    flipPointer(df.sparkSession, dir, version)
  }

  /** Write-audit-publish (the Iceberg/lakehouse WAP integrity gate):
    * stage the batch as a new snapshot, run the caller's audit against
    * the STAGED files (what was actually written, not the input plan),
    * and flip the pointer only when no report row has `pass = false`.
    * A failed audit leaves the previous snapshot live and the staged
    * dir on disk for debugging. Returns (report, published).
    *
    * The audit function receives the staged DataFrame and returns a
    * report with a boolean `pass` column — compose it from
    * [[graft.ops.Profile]]'s expectation builders via `qualityReport`.
    */
  def writeAuditPublish(df: DataFrame, dir: String, version: Long,
                        audit: DataFrame => DataFrame): (DataFrame, Boolean) = {
    stage(df, dir, version)
    val staged = df.sparkSession.read.parquet(s"$dir/v=$version")
    val report = audit(staged)
    val ok = report.filter(col("pass") === false).limit(1).count() == 0
    if (ok) flipPointer(df.sparkSession, dir, version)
    (report, ok)
  }

  /** The version `_LATEST` names, or None before the first publish. */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] = {
    val ptr = new Path(dir, "_LATEST")
    val fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ptr)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(ptr).getLen.toInt)
      val in = fs.open(ptr)
      try in.readFully(0, buf) finally in.close()
      scala.util.Try(new String(buf, "UTF-8").trim.toLong).toOption
    }
  }

  /** Read the pointed-at snapshot, or None before the first publish. */
  def current(spark: SparkSession, dir: String): Option[DataFrame] =
    currentVersion(spark, dir).map(v => spark.read.parquet(s"$dir/v=$v"))

  /** Delete every snapshot dir older than the `keep` most recent,
    * NEVER the pointed-at one (even when a crash left a newer unpointed
    * dir above it). Returns the number of dirs removed.
    */
  def prune(spark: SparkSession, dir: String, keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the current snapshot")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0
    else {
      val versions = fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .map(s => s.getPath.getName.stripPrefix("v=").toLong)
        .sorted
      val pointed = currentVersion(spark, dir)
      val drop = versions.dropRight(keep).filterNot(pointed.contains)
      drop.foreach(v => fs.delete(new Path(dir, s"v=$v"), true))
      drop.size
    }
  }

  /** Hash-chained commit ledger over every `v=` snapshot (the
    * blockchain-shaped integrity record a lakehouse audit wants: any
    * retroactive edit to ANY historical snapshot changes every later
    * chain hash). Per version, ascending:
    *
    *  - `content_fp` — an ORDER-FREE row-hash sum (each row's
    *    `rowDigest` column md5-folded to 60 bits, summed exactly as
    *    decimal, reduced mod 2⁶⁰): combinable, so fingerprinting a
    *    snapshot is ONE aggregate at any scale — no sort, no
    *    collect, unlike a concatenation digest;
    *  - `chain_md5 = md5(prev_chain || ':' || content_fp)`, seeded
    *    with the empty-string sentinel "genesis".
    *
    * Verification = recompute and compare (the registration's oracle
    * does exactly that from the raw table); a mismatch names the first
    * version whose history was rewritten.
    *
    * The per-version fold is a driver loop over the (bounded) version
    * list; each step is one combinable aggregate.
    */
  def commitLedger(spark: SparkSession, dir: String,
                   rowDigest: DataFrame => org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => s.getPath.getName.stripPrefix("v=").toLong)
      .sorted
    val M = 1152921504606846976L // 2^60
    var chain = "genesis"
    val rows = versions.map { v =>
      val snap = spark.read.parquet(s"$dir/v=$v")
      val r = snap.agg(count(lit(1)).cast("long").as("n"),
          pmod(sum(conv(substring(md5(rowDigest(snap)), 1, 15), 16, 10)
            .cast("long").cast("decimal(38,0)")), lit(M).cast("decimal(38,0)"))
            .cast("long").as("fp"))
        .head()
      val fp = if (r.isNullAt(1)) 0L else r.getLong(1)
      chain = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$chain:$fp".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (v, r.getLong(0), fp, chain)
    }
    import spark.implicits._
    rows.toDF("version", "n_rows", "content_fp", "chain_md5")
  }

  /** VACUUM dry-run: classify every snapshot under `dir` the way a
    * retention pass would treat it, WITHOUT deleting anything — the
    * audit a lakehouse runs before (and instead of, on disagreement)
    * the destructive [[prune]]. Statuses:
    *
    *  - `pointed` — the snapshot `_LATEST` serves;
    *  - `prunable` — EXACTLY what [[prune]] with the same `keep`
    *    would delete (all but the `keep` most recent, never the
    *    pointed one);
    *  - `staged_unpointed` — NEWER than the pointer and inside the
    *    retention window (a crash between [[stage]] and
    *    [[flipPointer]] leaves these; surfaced for manual review);
    *  - `retained` — everything else in the window.
    *
    * `n_stray_files` (repeated on every row, audit-style) counts
    * direct children of the root that are neither the `_LATEST`
    * pointer (or its in-flight `_LATEST.*.tmp`) nor a `v=` snapshot —
    * tmp files an interrupted writer left behind.
    *
    * The version list and the per-snapshot counts are a driver loop
    * over the BOUNDED snapshot set (the commitLedger discipline); each
    * count is one distributed aggregate.
    */
  def vacuumReport(spark: SparkSession, dir: String,
                   keep: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keep >= 1, "must keep at least the current snapshot")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val children = if (fs.exists(root)) fs.listStatus(root).toSeq else Seq.empty
    val versions = children
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => s.getPath.getName.stripPrefix("v=").toLong)
      .sorted
    val stray = children.count { s =>
      val n = s.getPath.getName
      n != "_LATEST" && !n.startsWith("_LATEST.") &&
        !(s.isDirectory && n.startsWith("v="))
    }.toLong
    val pointed = currentVersion(spark, dir)
    // mirror prune() EXACTLY: prunable = all but the `keep` most recent
    // (staged-above-pointer dirs count toward the window, as they do
    // there), never the pointed one — a dry run that disagrees with
    // the delete pass it previews is worse than none
    val pruneSet =
      versions.dropRight(keep).filterNot(pointed.contains).toSet
    val rows = versions.map { v =>
      val status =
        if (pointed.contains(v)) "pointed"
        else if (pruneSet.contains(v)) "prunable"
        else if (pointed.exists(v > _)) "staged_unpointed"
        else "retained"
      val n = spark.read.parquet(s"$dir/v=$v").count()
      (v, status, n, stray)
    }
    import spark.implicits._
    rows.toDF("version", "status", "n_rows", "n_stray_files")
  }
}
