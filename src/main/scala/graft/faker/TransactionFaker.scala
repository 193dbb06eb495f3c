package graft.faker

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import scala.collection.mutable
import scala.util.Random
import graft.model.{CdcEvent, Transaction}

/** Deterministic seeded workload generator mirroring the reference's
  * data_faker (dynamodb_to_datalake/data_faker.py:32-163): 70% inserts /
  * 30% updates (line 152), updates touch only `note` + `update_at` on
  * one of the latest-3 rows of a random existing account
  * (data_faker.py:105-126), timestamps strictly monotonic.
  *
  * Driver-side fixture generator only — test inputs for the engine, not
  * a distributed op.
  */
final class TransactionFaker(seed: Long,
                             start: Instant = Instant.parse("2023-07-27T00:00:00Z"),
                             tickMicros: Long = 10000L) {
  private val rnd = new Random(seed)
  private val fmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ").withZone(ZoneOffset.UTC)
  private var clock = start
  // account -> its rows, newest last (only latest 3 are update targets)
  private val byAccount = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Transaction]]
  private val words = Vector("three", "way", "peace", "sing", "town", "trial",
    "indeed", "opportunity", "determine", "specific", "market", "value")

  private def tick(): String = {
    // tickMicros + 0..100% jitter (strictly monotone clock), default
    // ~10ms like the reference's sleep cadence (data_faker.py:144-157);
    // tests stretch it to span many minutes
    clock = clock.plusNanos((tickMicros + rnd.nextLong(tickMicros)) * 1000L)
    fmt.format(clock)
  }
  private def phone(): String =
    f"${rnd.nextInt(900) + 100}%03d-${rnd.nextInt(900) + 100}%03d-${rnd.nextInt(9000) + 1000}%04d"
  private def sentence(): String =
    Seq.fill(3 + rnd.nextInt(5))(words(rnd.nextInt(words.size))).mkString(" ").capitalize + "."
  private def entity(): String =
    words(rnd.nextInt(words.size)).capitalize + ", " + words(rnd.nextInt(words.size)).capitalize + " and " + words(rnd.nextInt(words.size)).capitalize

  private def insert(): CdcEvent = {
    val ts = tick()
    val acct = if (byAccount.nonEmpty && rnd.nextDouble() < 0.5)
      byAccount.keys.toIndexedSeq(rnd.nextInt(byAccount.size))
    else phone()
    val t = Transaction(acct, ts, ts, entity(),
      rnd.nextInt(1000) + 1, rnd.nextInt(2), sentence())
    byAccount.getOrElseUpdate(acct, mutable.ArrayBuffer.empty) += t
    CdcEvent("INSERT", t.account, t.create_at, t.update_at, t.entity,
      t.amount, t.is_credit, t.note)
  }

  private def update(): CdcEvent = {
    val accts = byAccount.keys.toIndexedSeq
    val rows = byAccount(accts(rnd.nextInt(accts.size)))
    val target = rows(rows.size - 1 - rnd.nextInt(math.min(3, rows.size)))
    val updated = target.copy(update_at = tick(), note = sentence())
    rows(rows.indexOf(target)) = updated
    CdcEvent("MODIFY", updated.account, updated.create_at, updated.update_at,
      updated.entity, updated.amount, updated.is_credit, updated.note)
  }

  /** Next CDC event: 70% insert / 30% update-of-note. */
  def next(): CdcEvent =
    if (byAccount.isEmpty || rnd.nextDouble() < 0.7) insert() else update()

  def events(n: Int): Seq[CdcEvent] = Seq.fill(n)(next())

  /** Current source-of-truth table state (the "DynamoDB scan" side of
    * the compare oracle, compare.py:17-26).
    */
  def tableState: Seq[Transaction] = byAccount.values.flatten.toSeq
}
