package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for incremental aggregate maintenance: maintain ≡ recompute,
  * stale deltas are no-ops, tombstones retract, emptied groups vanish,
  * and the base is only consulted for delta-named keys.
  */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, account, update_at, event_id, entity, amount)
  private def df(rows: (String, String, String, Long, String, Double)*) =
    rows.toDF("id", "account", "update_at", "event_id", "entity", "amount")

  private val base = df(
    ("k1", "a1", "2024-01-01", 10L, "order", 10.0),
    ("k2", "a1", "2024-01-01", 11L, "order", 20.0),
    ("k3", "a2", "2024-01-01", 12L, "order", 30.0))
  private val aggV1 = Materialize.groupAgg(base, "account", "amount")

  private def maintained(delta: org.apache.spark.sql.DataFrame) =
    Materialize.maintainAgg(aggV1, base, delta, col("entity") === "error")
      .select(col("account"), col("n_rows"), col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("update retracts the old contribution and adds the new one") {
    val delta = df(("k1", "a1", "2024-01-02", 20L, "order", 15.0))
    assert(maintained(delta) === Set(("a1", 2L, 35.0), ("a2", 1L, 30.0)))
  }

  test("stale delta (older version) is a no-op; equal version defers to sequence") {
    val stale = df(("k1", "a1", "2023-12-31", 20L, "order", 99.0))
    assert(maintained(stale) === Set(("a1", 2L, 30.0), ("a2", 1L, 30.0)))
    val loseSeq = df(("k2", "a1", "2024-01-01", 5L, "order", 99.0)) // seq 5 < 11
    assert(maintained(loseSeq) === Set(("a1", 2L, 30.0), ("a2", 1L, 30.0)))
    val winSeq = df(("k2", "a1", "2024-01-01", 99L, "order", 25.0))
    assert(maintained(winSeq) === Set(("a1", 2L, 35.0), ("a2", 1L, 30.0)))
  }

  test("tombstone retracts; a group emptied by deletes disappears") {
    val delta = df(("k3", "a2", "2024-01-02", 20L, "error", 0.0))
    assert(maintained(delta) === Set(("a1", 2L, 30.0)))
  }

  test("insert of a new key creates / extends its group; delete of an absent key is a no-op") {
    val delta = df(
      ("k9", "a3", "2024-01-02", 20L, "order", 7.5),
      ("k8", "a3", "2024-01-02", 21L, "error", 0.0))
    assert(maintained(delta) ===
      Set(("a1", 2L, 30.0), ("a2", 1L, 30.0), ("a3", 1L, 7.5)))
  }

  test("many events per key reduce to the winner first (delete-first on version ties)") {
    val delta = df(
      ("k1", "a1", "2024-01-02", 20L, "order", 50.0),
      ("k1", "a1", "2024-01-02", 21L, "error", 0.0)) // same version: delete wins
    assert(maintained(delta) === Set(("a1", 1L, 20.0), ("a2", 1L, 30.0)))
  }

  test("maintain equals full recompute after the same upsert (random-ish mix)") {
    val delta = df(
      ("k1", "a1", "2024-01-03", 30L, "order", 1.0),   // update
      ("k2", "a1", "2023-01-01", 31L, "order", 2.0),   // stale no-op
      ("k3", "a2", "2024-01-03", 32L, "error", 0.0),   // delete
      ("k7", "a2", "2024-01-03", 33L, "order", 3.0))   // insert
    val merged = graft.merge.Merge.upsertWithTombstones(
      base, delta, col("entity") === "error", "id", "update_at",
      Seq(col("event_id").desc))
    val recomputed = Materialize.groupAgg(merged, "account", "amount")
      .select(col("account"), col("n_rows"), col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(maintained(delta) === recomputed)
  }
}
