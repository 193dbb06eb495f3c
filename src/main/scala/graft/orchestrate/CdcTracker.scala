package graft.orchestrate

import java.time.{Duration, Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** Pure-functional port of the reference's CDC orchestration state
  * machine (dynamodb_to_datalake/incremental_load_orchestration.py:39-330).
  *
  * The reference persists this as a JSON document on S3 and mutates it
  * from a 60s cron loop; here it is an immutable value + pure
  * transition functions, so the range computation, watermark clamp and
  * file cap are unit-testable exactly like the reference's (broken)
  * tests intended. The Structured Streaming variant
  * (graft.streaming.CdcStream) replaces the whole tracker with a
  * checkpoint — this class exists for batch/cron-style operation and
  * for capability parity.
  */
object CdcTracker {
  /** Partition-path minute format: `year=%Y/month=%m/day=%d/hour=%H/minute=%M`
    * (orchestration.py:32).
    */
  private val fmt = DateTimeFormatter
    .ofPattern("'year='yyyy'/month='MM'/day='dd'/hour='HH'/minute='mm")
    .withZone(ZoneOffset.UTC)

  def partitionOf(t: Instant): String = fmt.format(t.truncatedTo(ChronoUnit.MINUTES))

  def parsePartition(p: String): Instant = {
    val re = raw"year=(\d{4})/month=(\d{2})/day=(\d{2})/hour=(\d{2})/minute=(\d{2})".r
    p match {
      case re(y, mo, d, h, mi) =>
        Instant.parse(f"$y-$mo-${d}T$h:$mi:00Z")
      case _ => throw new IllegalArgumentException(s"bad partition: $p")
    }
  }

  /** Tracker state (orchestration.py:141-154). */
  final case class State(
      lastProcessedPartition: String,
      nextProcessedPartition: Option[String],
      lastRunId: Option[String],
      readyToRunNext: Boolean)

  object State {
    def bootstrap(now: Instant): State =
      State(partitionOf(now.minus(Duration.ofMinutes(2))), None, None,
        readyToRunNext = true)
  }

  /** Planned work for one tick: half-open minute range + capped files. */
  final case class Plan(
      startAfterPartition: String, // exclusive lower bound
      endBeforePartition: String,  // exclusive upper bound
      files: Seq[String])

  /** Compute the next half-open partition range
    * `[last + 1min, min(now - watermark, last + maxInterval))`
    * (orchestration.py:190-225). Returns None when the watermark makes
    * the range empty (T6 empty-batch fast-path).
    *
    * @param watermark late-data safety margin, 2 min in the reference
    *                  (orchestration.py:204 = T3)
    */
  def nextRange(state: State, now: Instant,
                maxInterval: Duration = Duration.ofDays(365),
                watermark: Duration = Duration.ofMinutes(2)): Option[(String, String)] = {
    val last = parsePartition(state.lastProcessedPartition)
    val lo = last.plus(Duration.ofMinutes(1))
    // latest processable minute: min(now - watermark, last + maxInterval)
    val hiWm = now.minus(watermark).truncatedTo(ChronoUnit.MINUTES)
    val hiCap = last.plus(maxInterval)
    val hiIncl = if (hiWm.isBefore(hiCap)) hiWm else hiCap
    if (hiIncl.isBefore(lo)) None
    else Some((partitionOf(lo), partitionOf(hiIncl.plus(Duration.ofMinutes(1)))))
  }

  /** Select landed files lexicographically inside the range and cap at
    * maxFiles (orchestration.py:194-225 = P9/O4). `files` are
    * partition-relative paths starting with `year=`; the lexicographic
    * range predicate works because the partition format zero-pads.
    */
  def plan(state: State, now: Instant, files: Seq[String],
           maxFiles: Int = 100,
           maxInterval: Duration = Duration.ofDays(365),
           watermark: Duration = Duration.ofMinutes(2)): Option[Plan] =
    nextRange(state, now, maxInterval, watermark).map { case (lo, hi) =>
      val selected = files.sorted
        .filter(f => f >= lo && f < hi) // half-open [lo, hi)
        .take(maxFiles)
      Plan(lo, hi, selected)
    }

  /** Job launched: remember the in-flight range (orchestration.py:240-277). */
  def launched(state: State, plan: Plan, runId: String): State =
    state.copy(
      nextProcessedPartition = Some(plan.endBeforePartition),
      lastRunId = Some(runId),
      readyToRunNext = false)

  /** Job reached a terminal state: advance the cursor
    * (orchestration.py:286-330 = T5). Advancing on ANY terminal state
    * (even failure) matches the reference; replay safety comes from the
    * merge's latest-wins idempotency (T8), not from the tracker.
    */
  def completed(state: State): State =
    state.nextProcessedPartition match {
      case Some(next) => State(
        // cursor = last minute INSIDE the processed half-open range
        partitionOf(parsePartition(next).minus(Duration.ofMinutes(1))),
        None, state.lastRunId, readyToRunNext = true)
      case None => state.copy(readyToRunNext = true)
    }
}
