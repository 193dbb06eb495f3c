package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("gapFill inserts missing buckets per key; forwardFill carries last value") {
    val df = Seq(
      ("k1", ts(0), 10), ("k1", ts(3), 13),
      ("k2", ts(1), 21), ("k2", ts(2), 22)
    ).toDF("k", "m", "v")
    val filled = TimeSeries.forwardFill(
      TimeSeries.gapFill(df, "m", "1 minute", keys = Seq("k")),
      "m", Seq("v"), keys = Seq("k"))
    val rows = filled.orderBy("k", "m").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(14, 16),
        Option(r.get(2)).map(_.asInstanceOf[Int]), r.getInt(3)))
    assert(rows.toSeq === Seq(
      ("k1", "00", Some(10), 10),
      ("k1", "01", None, 10),     // gap: null raw, ffilled 10
      ("k1", "02", None, 10),
      ("k1", "03", Some(13), 13),
      ("k2", "01", Some(21), 21),
      ("k2", "02", Some(22), 22)  // k2 has no gaps; spine stops at its own max
    ))
  }

  test("gapFill with no keys spans the global min..max") {
    val df = Seq((ts(5), 1), (ts(8), 2)).toDF("m", "v")
    val got = TimeSeries.gapFill(df, "m", "1 minute")
    assert(got.count() === 4) // 05,06,07,08
    assert(got.filter(col("v").isNull).count() === 2)
  }

  test("ewmaSpikes: hand-computed truncated EWMA; spike only on the jump") {
    // key A: 10, 10, 10, 30 — first three rows: ewma = 10 exactly;
    // row 4 (window 4, α=0.2): num = .512·10 + .64·10 + .8·10 + 30,
    // den = .512 + .64 + .8 + 1 -> ewma ≈ 16.775…, dev ≈ 13.2 > 8
    val df = Seq(("A", 1L, 10.0), ("A", 2L, 10.0), ("A", 3L, 10.0), ("A", 4L, 30.0))
      .toDF("k", "seq", "v")
    val got = TimeSeries.ewmaSpikes(df, "v", Seq("seq"), Seq("k"))
      .orderBy("seq").collect()
    assert(math.abs(got(0).getAs[Double]("ewma") - 10.0) < 1e-12)
    assert(math.abs(got(2).getAs[Double]("ewma") - 10.0) < 1e-12)
    val num = 0.512 * 10 + 0.64 * 10 + 0.8 * 10 + 30.0
    val den = 0.512 + 0.64 + 0.8 + 1.0
    assert(math.abs(got(3).getAs[Double]("ewma") - num / den) < 1e-9)
    assert(got.map(_.getAs[Boolean]("spike")).toSeq === Seq(false, false, false, true))
  }

  private def hourly(xs: Long*) = {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00")
    xs.zipWithIndex.map { case (x, i) => (ts(i), x) }.toDF("b", "x")
  }

  test("acf: alternating series gives -5/6 at lag 1, +2/3 at lag 2") {
    // x = 1,0,1,0,1,0: n-scaled devs ±3; den = 6·9 = 54
    // lag1: 5 terms of -9 → -45/54; lag2: 4 terms of +9 → 36/54
    val got = TimeSeries.acf(hourly(1L, 0L, 1L, 0L, 1L, 0L), maxLag = 2)
      .orderBy("lag").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_terms") === 5L)
    assert(math.abs(got(0).getAs[Double]("acf") - (-45.0 / 54.0)) < 1e-9)
    assert(got(1).getAs[Long]("n_terms") === 4L)
    assert(math.abs(got(1).getAs[Double]("acf") - (36.0 / 54.0)) < 1e-9)
    spark.catalog.clearCache()
  }

  test("cusumChangepoint: level step found at the last pre-shift bucket") {
    // 0,0,0,10,10,10: C_t peaks (|-90|) at t=3; means 0 → 10
    val r = TimeSeries.cusumChangepoint(hourly(0L, 0L, 0L, 10L, 10L, 10L))
      .collect().head
    assert(r.getAs[Long]("t_star") === 3L)
    assert(r.getAs[Double]("c_max") === 15.0)
    assert(r.getAs[Double]("mean_before") === 0.0)
    assert(r.getAs[Double]("mean_after") === 10.0)
    assert(r.getAs[Double]("delta") === 10.0)
  }

  test("seasonalDecompose: diurnal spike dominates; seasonal means balance") {
    // 6 days hourly: noon spikes to 100, otherwise 10 → strongly diurnal
    val rows = (0 until 24 * 6).map { i =>
      val ts = java.sql.Timestamp.valueOf(
        f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")
      (ts, if (i % 24 == 12) 100L else 10L)
    }
    val got = TimeSeries.seasonalDecompose(rows.toDF("b", "x"))
      .orderBy("hod").collect()
    assert(got.length === 24)
    val strength = got.head.getAs[Double]("seasonal_strength")
    assert(strength > 0.95, s"diurnal strength $strength")
    val peak = got.maxBy(_.getAs[Double]("seasonal"))
    assert(peak.getAs[Long]("hod") === 12L)
    assert(peak.getAs[Double]("seasonal") > 50.0)
    // per-hour seasonal means are means of the detrended series: their
    // cnt-weighted sum equals the total detrended mass up to floor slop
    val wsum = got.map(r => r.getAs[Double]("seasonal") * r.getAs[Long]("cnt")).sum
    val nWin = got.head.getAs[Long]("n_windows")
    assert(got.map(_.getAs[Long]("cnt")).sum === nWin)
    assert(math.abs(wsum) < 1.0, s"weighted seasonal sum $wsum")
    spark.catalog.clearCache()
  }

  test("denseCountSeries: gaps appear as zero-count buckets") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00"),
      ts("2024-01-01 03:05:00")).map(Tuple1(_)).toDF("ts")
    val got = TimeSeries.denseCountSeries(ev, "ts", "hour")
      .orderBy("b").collect().map(_.getAs[Long]("x")).toSeq
    assert(got === Seq(2L, 0L, 0L, 1L)) // hours 00..03, gaps zero-filled
  }

  test("periodogram: a pure 24h cosine dominates the 12h and 168h bins") {
    def ts(i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 3600000L)
    val series = (0 until 72).map(t =>
      (ts(t), 100L + math.round(50.0 * math.cos(2 * math.Pi * t / 24))))
      .toDF("b", "x")
    val got = TimeSeries.periodogram(series, Seq(12, 24, 168))
      .orderBy("period").collect()
    val byP = got.map(r => r.getAs[Long]("period") -> r).toMap
    assert(byP(24L).getAs[Boolean]("dominant"))
    assert(!byP(12L).getAs[Boolean]("dominant") && !byP(168L).getAs[Boolean]("dominant"))
    assert(byP(24L).getAs[Double]("power") > 100.0 * byP(12L).getAs[Double]("power"))
    // cosine phase: the signal lands in s_cos, s_sin stays near zero
    assert(math.abs(byP(24L).getAs[Double]("s_sin")) <
      math.abs(byP(24L).getAs[Double]("s_cos")) / 100.0)
    assert(got.forall(_.getAs[Long]("n_buckets") === 72L))
  }

  test("saxMotifs: a strict alternation yields exactly the two alternating words") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // 12 buckets alternating 0/10: z = ±1 -> symbols a/c alternating
    val series = (0 until 12)
      .map(h => (ts(h), if (h % 2 == 0) 0L else 10L)).toDF("b", "x")
    val got = TimeSeries.saxMotifs(series, wordLen = 4, topK = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[String]("word")).toSet === Set("acac", "caca"))
    assert(got.map(_.getAs[Long]("cnt")).sum === 9L) // 12 - 4 + 1 windows
    assert(got.forall(_.getAs[Long]("n_windows") === 9L))
    // counts desc with word tiebreak: acac (5) before caca (4)
    assert(got.head.getAs[String]("word") === "acac")
    assert(got.head.getAs[Long]("cnt") === 5L)
  }

  test("dtwPairs: a one-day lag warps to near zero where L1 cannot") {
    // a: [1,1,5,1], b: [1,1,1,5] (b is a one day behind a):
    // DTW path (1,1)(2,2)(2,3)(3,4)(4,4) costs 0+0+0+0+4 = 4;
    // Euclidean L1 = 0+0+4+4 = 8
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$d 00:00:00")
    val rows =
      (Seq.fill(1)(day(1)) ++ Seq.fill(1)(day(2)) ++
        Seq.fill(5)(day(3)) ++ Seq.fill(1)(day(4))).map(("a", _)) ++
      (Seq.fill(1)(day(1)) ++ Seq.fill(1)(day(2)) ++
        Seq.fill(1)(day(3)) ++ Seq.fill(5)(day(4))).map(("b", _))
    val got = TimeSeries.dtwPairs(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getString(0), r.getString(1)) === (("a", "b")))
    assert(r.getAs[Long]("n_buckets") === 4L)
    assert(r.getAs[Long]("n_buckets_full") === 4L) // under the 40 cap
    assert(r.getAs[Long]("dtw_dist") === 4L)
    assert(r.getAs[Long]("euclid_l1") === 8L)
    // identical series: DTW exactly zero
    val same = rows.filter(_._1 == "a") ++
      rows.filter(_._1 == "a").map { case (_, t) => ("c", t) }
    val z = TimeSeries.dtwPairs(same.toDF("event_type", "ts"),
      "event_type", "ts").collect().head
    assert(z.getAs[Long]("dtw_dist") === 0L)
    assert(z.getAs[Long]("euclid_l1") === 0L)
  }

  test("dtwPairs: truncation past 40 buckets is visible, never silent") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + d * 86400000L)
    // 45-day spine: both series truncate to the first 40 buckets and
    // n_buckets_full reports the untruncated spine length
    val rows = (0 until 45).map(d => ("a", day(d))) ++
      (0 until 45 by 2).map(d => ("b", day(d)))
    val r = TimeSeries.dtwPairs(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect().head
    assert(r.getAs[Long]("n_buckets") === 40L)
    assert(r.getAs[Long]("n_buckets_full") === 45L)
  }
}
