package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ingest.{Ingest, TableWriter}
import graft.merge.Merge
import graft.model.Schemas

/** Structured Streaming replacement for the reference's whole
  * cron+tracker+Glue orchestration (SURVEY.md §2.9): the checkpoint
  * replaces the S3 tracker document (T5), `maxFilesPerTrigger` replaces
  * the 100-file cap (T4/O4), the 10s processing-time trigger replaces
  * the Lambda batching window (T1), and the 2-minute watermark replaces
  * the orchestrator's `utcnow - 2min` clamp (T3).
  */
object CdcStream {

  /** Stream landed CDC JSON files and continuously merge them into the
    * lake table at `lakePath`. `foreachBatch` serializes merges exactly
    * like MaxConcurrentRuns=1 did for the Glue job.
    */
  def mergeStream(
      spark: SparkSession,
      landingDir: String,
      lakePath: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 100,
      triggerInterval: String = "10 seconds"): StreamingQuery = {
    val raw = spark.readStream
      .schema(Schemas.flatCdcRow)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .json(landingDir)

    raw.writeStream
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // Partition-pruned merge: O(touched partitions) per tick, not
          // O(table) — see TableWriter.mergeCommit.
          TableWriter.mergeCommit(spark, Ingest.toLakeRows(batch), lakePath)
        }
      }
      .start()
  }

  /** Stream of decoded CDC events -> minute-partitioned landing files,
    * replacing the stream-consumer Lambda (dynamodb_stream_consumer.py:
    * 62-90). REMOVE events dropped by design (T7).
    */
  def landingStream(
      events: DataFrame, // streaming DF with flatCdcRow cols + eventName
      landingDir: String,
      checkpointDir: String,
      triggerInterval: String = "10 seconds"): StreamingQuery = {
    val flat = Merge.filterRemoves(events).drop("eventName")
      .withColumn("year", substring(col("update_at"), 1, 4))
      .withColumn("month", substring(col("update_at"), 6, 2))
      .withColumn("day", substring(col("update_at"), 9, 2))
      .withColumn("hour", substring(col("update_at"), 12, 2))
      .withColumn("minute", substring(col("update_at"), 15, 2))
    flat.writeStream
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .partitionBy("year", "month", "day", "hour", "minute")
      .format("json")
      .option("path", landingDir)
      .start()
  }

  /** Windowed freshness metrics over the event stream: 1-minute tumbling
    * counts with the reference's 2-minute late-data tolerance (T2+T3).
    */
  def minuteCounts(events: DataFrame): DataFrame =
    events
      .withColumn("update_ts",
        to_timestamp(col("update_at"), Schemas.TsPattern))
      .withWatermark("update_ts", "2 minutes")
      .groupBy(window(col("update_ts"), "1 minute"))
      .agg(count(lit(1)).as("n_events"))
}
