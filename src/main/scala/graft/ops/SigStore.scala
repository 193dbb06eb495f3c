package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.storage.StorageLevel
import graft.ingest.VersionedDir

/** Continuously-maintained MinHash signature store: the incremental
  * near-dup dedup of [[Dedup.dedupDeltaAgainstSignatures]] lifted from
  * a one-shot delta to an EPOCH LOOP — the operation a continuously
  * refreshed training corpus runs. Each epoch's batch dedups against
  * the persisted signature snapshot AND against itself, survivors'
  * signatures append to the store, and the store advances one
  * crash-safe version (the hl2 commit pattern: `v=<epoch>` snapshot
  * dir + atomic `_LATEST` pointer flip via
  * [[graft.ingest.VersionedDir.publish]]).
  *
  * Dedup policy per epoch, deterministic and batch-explicit:
  *
  *  - CROSS: a batch doc with any signature-agreement hit (est >=
  *    threshold) against the CURRENT store is dropped. Self-id hits
  *    are excluded ([[Dedup.sigAgreementPairs]]), which is what makes
  *    a replayed epoch see its own prior append harmlessly.
  *  - INTRA: for batch-internal pairs (d1 < d2, est >= threshold) the
  *    LATER id drops — the same one-pass greedy policy as
  *    [[Dedup.dropNearDuplicates]], applied regardless of d1's own
  *    fate (greedy, not transitive closure; documented, and exactly
  *    reproducible by the oracle).
  *  - Only SURVIVOR signatures enter the store: a dropped doc never
  *    blocks future docs (its near-dup representative already in the
  *    store does).
  *
  * Crash safety / replay idempotency (the commit design): the output
  * and the store advance are both keyed by epoch id with
  * mode-overwrite writes, and the dedup decision is a deterministic
  * function of (batch, pointed-at store). Replaying an epoch after
  * ANY crash point recomputes the identical survivor set — if the
  * pointer already flipped, the replay sees its own survivors in the
  * store, but self-id hits are excluded and two same-epoch survivors
  * are never mutual near-dups (an est >= t pair would have dropped
  * one), so nothing changes — then rewrites the same `v=` dir and
  * `epoch=` output in place.
  *
  * Scale: the store holds ~64 longs per surviving doc (3 orders
  * smaller than text); per epoch the batch is signed ONCE (narrow
  * codegen pass), candidates band-join ids only, and the store
  * rewrite is O(store) parquet — at 100 TB the store is the ~100 GB
  * artifact an incremental crawl refresh actually keeps hot, with
  * retention handled by [[graft.ingest.VersionedDir.prune]].
  */
object SigStore {

  /** Run one dedup epoch: returns the surviving rows of `batch` (all
    * original columns) and advances the store at `storeDir` to
    * `v=<epochId>`. See the object doc for the policy.
    *
    * `storePartitions` right-sizes the store-snapshot files (the store
    * rewrite otherwise inherits the shuffle partition count — at test
    * SFs that is 8 near-empty files plus 8 commit-protocol rounds per
    * epoch). Pick ⌈store bytes / 128 MB⌉; 0 keeps the plan's own
    * partitioning.
    */
  def ingestEpoch(batch: DataFrame, storeDir: String, epochId: Long,
                  estThreshold: Double = 0.5,
                  numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
                  textCol: String = "text", idCol: String = "doc_id",
                  hashFn: Column => Column = Dedup.xxShingleHash,
                  bandHashFn: Column => Column = c => xxhash64(c),
                  storePartitions: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    // sign the batch ONCE; three consumers (cross join, intra join,
    // survivor append) read the persisted form
    val bsig = Dedup.minhashSignatures(batch, numHashes, shingleK,
        textCol, idCol, hashFn = hashFn)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val store = VersionedDir.current(spark, storeDir)
    val crossDrop = store match {
      case Some(st) => Dedup.sigAgreementPairs(bsig, st, estThreshold,
          numHashes, bands, bandHashFn, ordered = false)
        .select(col("d1").as("__drop"))
      case None => bsig.select(col("d").as("__drop")).limit(0)
    }
    val intraDrop = Dedup.sigAgreementPairs(bsig, bsig, estThreshold,
        numHashes, bands, bandHashFn, ordered = true)
      .select(col("d2").as("__drop"))
    val dropIds = crossDrop.union(intraDrop).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val survivors = batch.join(dropIds,
      batch(idCol) === dropIds("__drop"), "left_anti")
    val survSigs = bsig.join(
      survivors.select(col(idCol).as("d")), Seq("d"), "left_semi")
    // dropDuplicates(d) absorbs the replayed-epoch case where the
    // pointed-at store already contains this epoch's survivors
    val newStore0 = store
      .map(_.unionByName(survSigs).dropDuplicates("d"))
      .getOrElse(survSigs)
    val newStore =
      if (storePartitions > 0) newStore0.coalesce(storePartitions) else newStore0
    VersionedDir.publish(newStore, storeDir, epochId)
    survivors
  }

  /** Structured Streaming maintenance: each micro-batch runs
    * [[ingestEpoch]] (batch id = epoch id) and writes its survivors to
    * `outDir/epoch=<id>` — both writes idempotent under replay, per
    * the object doc. AvailableNow drains everything landed, in
    * `maxFilesPerTrigger`-bounded epochs, then stops — the testable
    * catch-up form (the T1-style processing-time trigger is a
    * one-line swap).
    */
  def maintain(stream: DataFrame, storeDir: String, outDir: String,
               checkpointDir: String,
               estThreshold: Double = 0.5,
               numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
               textCol: String = "text", idCol: String = "doc_id",
               hashFn: Column => Column = Dedup.xxShingleHash,
               bandHashFn: Column => Column = c => xxhash64(c),
               storePartitions: Int = 0): Unit = {
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val surv = ingestEpoch(batch, storeDir, id, estThreshold,
            numHashes, bands, shingleK, textCol, idCol, hashFn, bandHashFn,
            storePartitions)
          surv.write.mode("overwrite").parquet(s"$outDir/epoch=$id")
        }
      }
      .start().awaitTermination()
  }
}
