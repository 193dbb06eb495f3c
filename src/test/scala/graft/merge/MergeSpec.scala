package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.TestSpark

/** The upsert laws the reference gets from Hudi (recordkey + precombine,
  * incremental.py:176-177) and replay tolerance T8 — now actually
  * verified instead of claimed.
  */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "update_at", "note")
  }

  private def multisetEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("dedupLatest keeps exactly the max-version row per key") {
    val d = df(Seq(
      ("k1", "2024-01-01T00:00:01.000000+0000", "old"),
      ("k1", "2024-01-01T00:00:03.000000+0000", "new"),
      ("k1", "2024-01-01T00:00:02.000000+0000", "mid"),
      ("k2", "2024-01-01T00:00:01.000000+0000", "only")))
    val out = Merge.dedupLatest(d, "id", "update_at").orderBy("id").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("k1", "new"), ("k2", "only")))
  }

  test("upsert: latest wins, delta beats snapshot on version ties") {
    val snap = df(Seq(
      ("k1", "2024-01-01T00:00:05.000000+0000", "snap-newer"),
      ("k2", "2024-01-01T00:00:01.000000+0000", "snap-tied"),
      ("k3", "2024-01-01T00:00:01.000000+0000", "snap-only")))
    val delta = df(Seq(
      ("k1", "2024-01-01T00:00:01.000000+0000", "delta-older"),
      ("k2", "2024-01-01T00:00:01.000000+0000", "delta-tied"),
      ("k4", "2024-01-01T00:00:09.000000+0000", "delta-new")))
    val out = Merge.upsert(snap, delta).orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(out === Seq(
      ("k1", "snap-newer"),   // older delta must NOT overwrite
      ("k2", "delta-tied"),   // Hudi precombine tie -> incoming wins
      ("k3", "snap-only"),
      ("k4", "delta-new")))
  }

  test("upsert is idempotent under replay (T8): merge(merge(s,d),d) = merge(s,d)") {
    val r = new Random(42)
    def randRows(n: Int) = Seq.fill(n)((
      s"k${r.nextInt(30)}",
      f"2024-01-01T00:00:${r.nextInt(60)}%02d.${r.nextInt(1000000)}%06d+0000",
      s"v${r.nextInt(1000)}"))
    val snap = Merge.dedupLatest(df(randRows(100)), "id", "update_at")
    val delta = df(randRows(80))
    val once = Merge.upsert(snap, delta)
    val twice = Merge.upsert(once, delta)
    assert(multisetEqual(once, twice))
  }

  test("upsert result = global dedupLatest when snapshot and delta partition the feed") {
    val r = new Random(7)
    val all = df(Seq.fill(200)((
      s"k${r.nextInt(40)}",
      f"2024-01-01T00:${r.nextInt(60)}%02d:${r.nextInt(60)}%02d.${r.nextInt(1000000)}%06d+0000",
      s"v${r.nextInt(1000)}")))
    val withMod = all.withColumn("m", pmod(xxhash64(col("note")), lit(2)))
    val snap = Merge.dedupLatest(withMod.filter(col("m") === 0).drop("m"), "id", "update_at")
    val delta = withMod.filter(col("m") === 1).drop("m")
    val merged = Merge.upsert(snap, delta)
    val globalLatest = Merge.dedupLatest(all, "id", "update_at")
    // NB: equality can only differ on per-key version ties; ties across
    // sides resolve delta-first in upsert but content-hash in global
    // dedup — the generator makes versions collide rarely; compare on
    // (id, update_at) which is tie-insensitive.
    assert(multisetEqual(merged.select("id", "update_at"), globalLatest.select("id", "update_at")))
  }

  test("upsertJoin == upsert over randomized feeds incl. null keys (5 rounds)") {
    val r = new Random(7)
    def randRows(n: Int) = Seq.fill(n)((
      if (r.nextInt(20) == 0) null else s"k${r.nextInt(25)}",
      f"2024-01-01T00:00:${r.nextInt(60)}%02d.${r.nextInt(1000000)}%06d+0000",
      s"v${r.nextInt(1000)}"))
    for (_ <- 1 to 5) {
      val snap = Merge.dedupLatest(df(randRows(60)), "id", "update_at")
      val delta = df(randRows(40))
      assert(multisetEqual(
        Merge.upsert(snap, delta),
        Merge.upsertJoin(snap, delta)),
        "join-formulated upsert must agree with the union+window form")
    }
  }

  test("sequential ticks == one combined merge when (key, version) pairs are unique") {
    val r = new Random(11)
    // unique versions per (key, tick-row): composition is deterministic
    // (tie order between two deltas is otherwise unspecified)
    def rows(n: Int, salt: Int) = Seq.tabulate(n)(i => (
      s"k${r.nextInt(20)}",
      f"2024-01-01T00:$salt%02d:${i % 60}%02d.${r.nextInt(1000000)}%06d+0000",
      s"v$salt-$i"))
    for (round <- 1 to 3) {
      val snap = Merge.dedupLatest(df(rows(50, 1)), "id", "update_at")
      val d1 = df(rows(30, 2))
      val d2 = df(rows(30, 3))
      val sequential = Merge.upsert(Merge.upsert(snap, d1), d2)
      val combined = Merge.upsert(snap,
        Merge.dedupLatest(d1.unionByName(d2), "id", "update_at"))
      assert(multisetEqual(sequential, combined),
        s"round $round: tick-by-tick catch-up must equal one combined merge")
    }
  }

  test("scd2 history + interval containment answers point-in-time probes") {
    import spark.implicits._
    // versions of k1 at seconds 1, 3, 5; the PIT rule is half-open
    // containment [valid_from, valid_to), so a probe AT a version's own
    // timestamp sees that version, and probes before the first or for
    // an unknown key see null
    def ts(s: Int) = f"2024-01-01T00:00:$s%02d.000000+0000"
    val hist = Merge.scd2History(
      df(Seq(("k1", ts(1), "v1"), ("k1", ts(3), "v3"), ("k1", ts(5), "v5"))),
      Seq("id"), "update_at")
      .select(col("id"), col("valid_from"), col("valid_to"), col("note"))
    val probes = Seq(("k1", ts(0)), ("k1", ts(1)), ("k1", ts(2)),
      ("k1", ts(3)), ("k1", ts(6)), ("k2", ts(6))).toDF("id", "probe_ts")
    val got = probes.as("p").join(hist.as("h"),
        col("p.id") === col("h.id") && col("probe_ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("probe_ts") < col("valid_to")), "left")
      .select(col("p.id"), col("probe_ts"), col("note"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("k1", ts(0), null), ("k1", ts(1), "v1"), ("k1", ts(2), "v1"),
      ("k1", ts(3), "v3"), ("k1", ts(6), "v5"), ("k2", ts(6), null)))
  }

  test("filterRemoves drops REMOVE; tombstone upsert deletes the key") {
    import spark.implicits._
    val ev = Seq(("INSERT", "k1"), ("REMOVE", "k2"), ("MODIFY", "k3"))
      .toDF("eventName", "id")
    assert(Merge.filterRemoves(ev).select("id").as[String].collect().sorted === Array("k1", "k3"))

    val snap = df(Seq(
      ("k1", "2024-01-01T00:00:01.000000+0000", "a"),
      ("k2", "2024-01-01T00:00:01.000000+0000", "b")))
    val delta = df(Seq(
      ("k2", "2024-01-01T00:00:02.000000+0000", "DEL"),
      ("k3", "2024-01-01T00:00:02.000000+0000", "c")))
    val out = Merge.upsertWithTombstones(snap, delta, isDelete = col("note") === "DEL")
      .select("id").as[String].collect().sorted
    assert(out === Array("k1", "k3"))
  }

  test("tombstone upsert tiebreak: delete-first on version ties, then sequence — total order") {
    import spark.implicits._
    def df(rows: Seq[(String, String, String, Int)]) =
      rows.toDF("id", "update_at", "note", "seq")
    val snap = df(Seq(("k1", "2024-01-01T00:00:01.000000+0000", "a", 0),
      ("k2", "2024-01-01T00:00:01.000000+0000", "a", 1)))
    // contract (mirrored by the j4 oracle): version desc, then
    // delete-first, THEN the caller's sequence. So an equal-version
    // delete removes the key even when an insert carries a higher seq
    // (conservative: a tie with a tombstone is a tombstone)...
    val delta = df(Seq(
      ("k1", "2024-01-01T00:00:02.000000+0000", "DEL", 2),
      ("k1", "2024-01-01T00:00:02.000000+0000", "b", 3),
      // ...and two equal-version INSERTS resolve by seq, reproducibly
      ("k2", "2024-01-01T00:00:02.000000+0000", "x", 4),
      ("k2", "2024-01-01T00:00:02.000000+0000", "y", 5)))
    val out = Merge.upsertWithTombstones(snap, delta,
      isDelete = col("note") === "DEL", tiebreak = Seq(col("seq").desc))
    val rows = out.select("id", "note").as[(String, String)].collect().sorted
    assert(rows === Array(("k2", "y")), "k1 tombstoned on the tie; k2 takes seq-5 insert")
  }
}
