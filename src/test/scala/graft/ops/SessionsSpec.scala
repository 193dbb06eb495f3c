package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for sessionization, session windows, trailing range frames, and
  * the deterministic hash split.
  */
class SessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** user 1: three events 10 min apart, then a 2 h silence, then one
    * more — two sessions. user 2: a single event — one session.
    * Two events share an exact timestamp (tie) inside session 1.
    */
  private lazy val fixture = {
    import spark.implicits._
    Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 10:10:00"), 2.0),
      (3L, 1L, ts("2024-01-01 10:10:00"), 3.0), // tie with event 2
      (4L, 1L, ts("2024-01-01 10:20:00"), 4.0),
      (5L, 1L, ts("2024-01-01 12:20:01"), 5.0), // 2h 1s gap -> new session
      (6L, 2L, ts("2024-01-01 09:00:00"), 6.0)
    ).toDF("event_id", "user_id", "ts", "value")
  }

  private val TwoHoursUs = 7200000000L

  test("sessionize splits exactly at gaps > threshold, ties stay together") {
    val got = Sessions.sessionStats(fixture, "user_id", "ts",
        lit(TwoHoursUs), "event_id")
      .orderBy("user_id", "session_idx").collect()
    assert(got.length === 3)
    val s1 = got(0)
    assert(s1.getAs[Long]("n_events") === 4L) // events 1-4 incl. the tie
    assert(s1.getAs[Long]("duration_us") === 1200000000L) // 20 min
    val s2 = got(1)
    assert(s2.getAs[Long]("n_events") === 1L)
    assert(s2.getAs[Long]("duration_us") === 0L)
    assert(got(2).getAs[Long]("user_id") === 2L)
  }

  test("sessionize: exactly-gap-sized silence does NOT split (strict >)") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 12:00:00")) // exactly 2h later
    ).toDF("event_id", "user_id", "ts")
    val n = Sessions.sessionize(df, "user_id", "ts", lit(TwoHoursUs), "event_id")
      .agg(max("session_idx")).head.getLong(0)
    assert(n === 1L)
  }

  test("native session_window agrees with sessionize on session count and sizes") {
    val manual = Sessions.sessionStats(fixture, "user_id", "ts",
        lit(TwoHoursUs), "event_id")
      .select("user_id", "n_events").orderBy("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val native = fixture
      .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select("user_id", "n_events").orderBy("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(manual === native)
  }

  test("streaming session_window emits the same closed sessions as batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sess-stream").toString
    // a far-future flush event advances the final watermark past every
    // real session's close (end = last event + gap); its own session
    // stays open and must NOT be emitted
    val flush = Seq((99L, 99L, ts("2024-01-02 00:00:00"), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    fixture.unionByName(flush).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(fixture.schema).parquet(s"$dir/in")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
      .agg(count(lit(1)).as("n_events"))
    val q = stream.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").option("checkpointLocation", s"$dir/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append mode with a 0s watermark emits every session closed by the
    // final watermark advance = all of them for a bounded input
    val got = spark.table("sess_out")
      .select("user_id", "n_events").orderBy("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 1L), (1L, 4L), (2L, 1L)))
  }

  test("session stream resumes from checkpoint: each session emitted exactly once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sess-resume").toString
    def drain(): Seq[(Long, Long)] = {
      val q = spark.readStream
        .schema(fixture.schema.add("batch", "string"))
        .parquet(s"$dir/in")
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"))
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$dir/out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    // phase 1: the base fixture + a flush event on 2024-01-02 closes
    // the three real sessions; the flush's own session stays open
    val a = fixture.withColumn("batch", lit("a")).unionByName(
      Seq((99L, 99L, ts("2024-01-02 00:00:00"), 0.0, "a"))
        .toDF("event_id", "user_id", "ts", "value", "batch"))
    a.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val e1 = drain()
    assert(e1.sorted === Seq((1L, 1L), (1L, 4L), (2L, 1L)))
    // phase 2: only NEW files land (post-watermark events + a later
    // flush); the resumed query closes the old open session and the new
    // one, and must NOT re-emit anything from phase 1
    val b = Seq(
      (100L, 50L, ts("2024-01-03 09:00:00"), 1.0, "b"),
      (101L, 50L, ts("2024-01-03 09:30:00"), 1.0, "b"),
      (102L, 98L, ts("2024-01-05 00:00:00"), 0.0, "b")
    ).toDF("event_id", "user_id", "ts", "value", "batch")
    b.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val all = drain()
    val e2 = all.diff(e1)
    assert(e2.sorted === Seq((50L, 2L), (99L, 1L))) // new + previously-open
    assert(all.size === e1.size + e2.size, "no session may be emitted twice")
  }

  test("trailingWindow range frame includes timestamp-tie peers both ways") {
    val got = Sessions.trailingWindow(fixture, "user_id", "ts", "value",
        horizonUs = 600000000L) // 10 min
      .orderBy("event_id").collect()
    // events 2 and 3 tie at 10:10 -> each sees {1,2,3} (1 is 10 min back,
    // inclusive) regardless of tiebreak order
    assert(got(1).getAs[Long]("trail_n") === 3L)
    assert(got(2).getAs[Long]("trail_n") === 3L)
    assert(got(1).getAs[Double]("trail_sum") === 6.0)
    assert(got(2).getAs[Double]("trail_sum") === 6.0)
    // event 5 is alone in its trailing 10 min
    assert(got(4).getAs[Long]("trail_n") === 1L)
  }

  test("hashSplit is stable under corpus growth and splits disjointly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fr = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val full = Curate.hashSplit(docs, "doc_id", fr)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val half = Curate.hashSplit(docs.filter(col("doc_id") % 2 === 0), "doc_id", fr)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // growth stability: every doc keeps its assignment in the subset run
    assert(half.forall { case (id, sp) => full(id) == sp })
    // all three splits are populated and the major split dominates
    val bySplit = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("invertedIndex: df counts each doc once, postings sorted and capped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "apple banana")
    ).toDF("doc_id", "text")
    val ix = Search.invertedIndex(docs, minDf = 2L, postingCap = 2)
      .orderBy("term").collect()
    assert(ix.map(_.getString(0)).toSeq === Seq("apple", "banana"))
    val apple = ix(0)
    assert(apple.getAs[Long]("df") === 3L) // repeated in-doc token counts once
    assert(apple.getAs[String]("postings_head") === "1,2") // sorted, capped at 2
    assert(ix(1).getAs[String]("postings_head") === "1,3")
  }

  test("rfmSegments: quintiles partition entities; monotone spend orders the m-score") {
    import spark.implicits._
    // 10 entities, one order each on distinct days, spend = 100·id:
    // every metric is a strict total order, so each quintile holds 2
    val orders = (1 to 10).map(i =>
      (i.toLong, ts(f"2024-01-$i%02d 00:00:00"), 100.0 * i))
      .toDF("cust", "odate", "amount")
    val seg = Sessions.rfmSegments(orders, "cust", "odate", "amount", q = 5)
      .collect()
    assert(seg.map(_.getAs[Long]("n_entities")).sum === 10L)
    // freq is constant (all 1): ntile falls back to the id tiebreak,
    // still a partition into 5 buckets of 2
    val mTotal = seg.groupBy(_.getAs[Long]("m")).view
      .mapValues(_.map(_.getAs[Long]("n_entities")).sum).toMap
    assert(mTotal === (1L to 5L).map(_ -> 2L).toMap)
    // spend grows with id and recency grows with id: the top-m segment
    // is also the most recent (r = 5) and has the highest avg spend
    val byM = seg.sortBy(_.getAs[Long]("m"))
    assert(byM.last.getAs[Double]("avg_monetary") >
      byM.head.getAs[Double]("avg_monetary"))
    val topM = seg.filter(_.getAs[Long]("m") === 5L)
    assert(topM.forall(_.getAs[Long]("r") === 5L))
    // recency is measured against the dataset max date: the newest
    // entity has rec_days = 0
    assert(seg.filter(_.getAs[Long]("r") === 5L)
      .map(_.getAs[Long]("rec_min")).min === 0L)
  }
}
