package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: dense spine generation, gap filling and
  * forward fill — the resampling primitives monitoring and
  * feature-engineering pipelines run over event streams.
  */
object TimeSeries {

  /** Left-join `df` onto the dense `step`-spaced spine spanning each
    * key group's [min, max] of `timeCol`; missing buckets appear with
    * null value columns. `timeCol` must already be bucket-aligned
    * (e.g. date_trunc'd) or the join will miss.
    *
    * Scale: the spine derives from a tiny per-key (min, max) aggregate
    * and explodes to exactly the output rows — never materialized
    * wider than the result. With `keys` the join and the downstream
    * fill windows hash-partition per key; keyless use is for single
    * bounded series (a dashboard hour), not corpus scale.
    */
  def gapFill(df: DataFrame, timeCol: String, step: String,
              keys: Seq[String] = Nil): DataFrame = {
    val bounds = if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*)
    val spine = bounds
      .agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"),
          expr(s"INTERVAL $step"))).as(timeCol): _*)
    spine.join(df, keys :+ timeCol, "left")
  }

  /** Adds `<c>_ffill` for each value column: the last non-null value at
    * or before the row's `timeCol`, per key group. Implemented with
    * `last(ignoreNulls)` over a running window — one pass, no self
    * join.
    */
  /** Truncated normalized EWMA (the pandas `ewm(adjust=True)` form over
    * a bounded trailing window) + deviation-spike flag — the standard
    * streaming drift monitor. The unbounded recursive EWMA is not
    * window-expressible without numerically-explosive (1-α)^-k terms,
    * so production systems truncate: with window W the dropped tail
    * weight is (1-α)^W (< 1% for α=0.2, W=20).
    *
    * The weighted sum runs as an IN-ROW ordered fold over the
    * collect_list frame — deterministic summation order, so an external
    * oracle reproduces it with the same left fold. One exchange on the
    * key; the frame is O(W) values per row.
    */
  def ewmaSpikes(df: DataFrame, valueCol: String, orderCols: Seq[String],
                 keys: Seq[String], alpha: Double = 0.2, window: Int = 20,
                 spikeThreshold: Double = 8.0): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val decay = lit(1.0 - alpha)
    val withArr = df.withColumn("__arr", collect_list(col(valueCol)).over(w))
    val n = size(col("__arr"))
    val num = aggregate(sequence(lit(1), n), lit(0.0),
      (acc, i) => acc + pow(decay, (n - i).cast("double"))
        * element_at(col("__arr"), i))
    val den = aggregate(sequence(lit(1), n), lit(0.0),
      (acc, i) => acc + pow(decay, (n - i).cast("double")))
    withArr
      .withColumn("ewma", num / den)
      .withColumn("dev", col(valueCol) - col("ewma"))
      .withColumn("spike", abs(col("dev")) > spikeThreshold)
      .drop("__arr")
  }

  def forwardFill(df: DataFrame, timeCol: String, valueCols: Seq[String],
                  keys: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(s"${c}_ffill", last(col(c), ignoreNulls = true).over(w)))
  }

  /** Seasonal-naive forecast backtest (the standard forecasting
    * BASELINE every model must beat — Hyndman & Athanasopoulos §5.2):
    * bucket the series per key, predict each bucket's mean by the
    * bucket exactly one `season` earlier, and score MAE / MAPE over
    * every bucket whose seasonal ancestor exists.
    *
    * Determinism: per-bucket means come from micro-quantized exact
    * integer sums (one combinable shuffle), re-quantized to micro
    * longs, so every |error| is an exact long and MAE is an exact
    * ratio; MAPE terms pico-quantize before the order-free sum.
    *
    * Scale: the seasonal lookup is an EQUI-join on
    * (key, bucket − season) — no window over an unpartitioned order,
    * no gap-sensitive row-lag misalignment; missing ancestors simply
    * drop out (and are counted). Everything shuffled is (key,
    * timestamp, long) triples.
    */
  def seasonalNaiveBacktest(df: DataFrame, keyCol: String, tsCol: String,
                            valueCol: String, bucket: String = "hour",
                            season: String = "24 hours"): DataFrame = {
    val buckets = df
      .select(col(keyCol).as("k"), date_trunc(bucket, col(tsCol)).as("b"),
        floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long").as("q"))
      .groupBy("k", "b")
      .agg(count(lit(1)).cast("long").as("cnt"), sum("q").as("sq"))
      .withColumn("v_micro",
        floor(col("sq").cast("double") / col("cnt").cast("double") + lit(0.5)).cast("long"))
      .select("k", "b", "v_micro").persist()
    val joined = buckets.as("cur").join(
        buckets.select(col("k"), (col("b") + expr(s"INTERVAL $season")).as("b"),
          col("v_micro").as("pred_micro")).as("prev"),
        Seq("k", "b"), "left")
    joined
      .groupBy(col("k").as(keyCol))
      .agg(
        count(lit(1)).cast("long").as("n_buckets"),
        sum(when(col("pred_micro").isNotNull, 1L).otherwise(0L)).cast("long").as("n_forecast"),
        sum(when(col("pred_micro").isNotNull,
          abs(col("v_micro") - col("pred_micro"))).otherwise(lit(0L)))
          .cast("long").as("abs_err_micro"),
        sum(when(col("pred_micro").isNotNull && col("v_micro") =!= 0L,
          floor(abs(col("v_micro") - col("pred_micro")).cast("double") /
            abs(col("v_micro")).cast("double") * lit(1e12) + lit(0.5)).cast("long"))
          .otherwise(lit(0L))).cast("long").as("ape_pico"))
      .select(col(keyCol), col("n_buckets"), col("n_forecast"),
        round(col("abs_err_micro").cast("double") /
          col("n_forecast").cast("double") / 1e6, 6).as("mae"),
        round(col("ape_pico").cast("double") /
          col("n_forecast").cast("double") / 1e12, 9).as("mape"))
  }

  /** Dense event-count series: one row per `bucket` from the global
    * min to max of `tsCol`, with `x` = exact event count (0 where no
    * events landed — a missing bucket IS a zero observation, which
    * row-lag operators would otherwise silently skip).
    *
    * Scale: the spine derives from a one-row (min, max) aggregate and
    * is time-range/bucket–sized — corpus-independent; the count
    * aggregate is combinable.
    */
  def denseCountSeries(df: DataFrame, tsCol: String,
                       bucket: String = "hour"): DataFrame = {
    val counts = df.groupBy(date_trunc(bucket, col(tsCol)).as("b"))
      .agg(count(lit(1)).cast("long").as("x"))
    val spine = counts.agg(min("b").as("__lo"), max("b").as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL 1 $bucket"))).as("b"))
    spine.join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("x"), lit(0L)).as("x"))
  }

  /** Sample autocorrelation function at lags 1..maxLag over a DENSE
    * integer series (b, x) — the periodicity / burstiness audit:
    * `acf_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²` (the standard biased
    * estimator: full-series denominator, n−k numerator terms).
    *
    * Exactness: deviations are n-SCALED (`n·x_t − Σx` — exact
    * integers, no float mean), so every numerator/denominator is an
    * order-free decimal sum; one division per lag at the end.
    *
    * Scale: the single-partition lead-window runs over the SERIES
    * table (time-range/bucket rows, corpus-independent), and all
    * maxLag numerators accumulate in ONE aggregate pass.
    */
  def acf(series: DataFrame, maxLag: Int = 12): DataFrame = {
    val zero = lit(0).cast("decimal(38,0)")
    val s = series.select(col("b"), col("x").cast("long").as("x"))
    val tot = s.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"))
    val w = Window.orderBy("b")
    val withLeads = (1 to maxLag).foldLeft(s)((d, k) =>
      d.withColumn(s"x_$k", lead(col("x"), k).over(w)))
    val dev = (c: org.apache.spark.sql.Column) =>
      col("n").cast("decimal(38,0)") * c.cast("decimal(38,0)") - col("sx")
    val aggs: Seq[org.apache.spark.sql.Column] =
      sum(dev(col("x")) * dev(col("x"))).as("den") +:
      (1 to maxLag).flatMap(k => Seq(
        sum(when(col(s"x_$k").isNotNull, dev(col("x")) * dev(col(s"x_$k")))
          .otherwise(zero)).as(s"num_$k"),
        sum(when(col(s"x_$k").isNotNull, 1L).otherwise(0L)).cast("long")
          .as(s"nt_$k")))
    val m = withLeads.crossJoin(broadcast(tot))
      .agg(aggs.head, aggs.tail: _*).persist()
    (1 to maxLag).map(k => m.select(lit(k).as("lag"),
        col(s"nt_$k").as("n_terms"),
        round(col(s"num_$k").cast("double") / col("den").cast("double"), 9)
          .as("acf")))
      .reduce(_ unionByName _)
  }

  /** Classical seasonal decomposition (the moving-average STL-lite of
    * Macaulay 1931 / the X-11 first pass) of a dense hourly count
    * series: trend = centered 25-hour moving average, seasonal =
    * hour-of-day means of the detrended series, plus the
    * strength-of-seasonality statistic `max(0, 1 − Var(remainder)/
    * Var(detrended))` (Wang/Smith/Hyndman 2006) — "is this metric
    * actually diurnal, and by how much?".
    *
    * Exactness: the trend stays an exact 25-term integer SUM (the
    * detrended value is `25·x − trendSum`, never a float mean);
    * per-hour seasonal means and remainders pico-quantize via floor
    * divisions; variances come from exact decimal moment sums. One
    * display division per output column.
    *
    * Scale: everything after the bucket-count aggregate runs on the
    * SERIES table (corpus-independent); the MA window and the
    * hour-of-day group-by are both spine-sized.
    */
  def seasonalDecompose(series: DataFrame, period: Int = 24,
                        halfWindow: Int = 12): DataFrame = {
    val win = 2 * halfWindow + 1
    val s = series.select(col("b"), col("x").cast("long").as("x"))
    val wMa = Window.orderBy("b").rowsBetween(-halfWindow, halfWindow)
    val wCnt = Window.orderBy("b").rowsBetween(-halfWindow, halfWindow)
    val tr = s
      .withColumn("t_sum", sum(col("x")).over(wMa).cast("long"))
      .withColumn("t_cnt", count(lit(1)).over(wCnt).cast("long"))
      .filter(col("t_cnt") === win) // full centered windows only
      .withColumn("d", lit(win.toLong) * col("x") - col("t_sum"))
      .withColumn("hod", hour(col("b")).cast("long"))
      .withColumn("d_pico", expr(s"""CASE WHEN d >= 0
        | THEN (d * 1000000000000L) div ${win}L
        | ELSE -((-d * 1000000000000L) div ${win}L) END""".stripMargin))
      .persist()
    val byHour = tr.groupBy("hod").agg(
      count(lit(1)).cast("long").as("cnt"),
      sum(col("d_pico").cast("decimal(38,0)")).as("sd"))
      .withColumn("s_pico", expr("""CASE WHEN sd >= 0
        | THEN CAST(sd div cnt AS BIGINT)
        | ELSE CAST(-((-sd) div cnt) AS BIGINT) END""".stripMargin))
      .persist()
    val rem = tr.join(byHour.select(col("hod"), col("s_pico")), "hod")
      .select((col("d_pico") - col("s_pico")).as("r_pico"),
        col("d_pico"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val mom = rem.agg(
      count(lit(1)).cast("long").as("n"),
      sum(dec(col("d_pico"))).as("sdd"),
      sum(dec(col("d_pico")) * dec(col("d_pico"))).as("sdd2"),
      sum(dec(col("r_pico"))).as("srr"),
      sum(dec(col("r_pico")) * dec(col("r_pico"))).as("srr2"))
    val nd = col("n").cast("double")
    val varD = (col("sdd2").cast("double") -
      col("sdd").cast("double") * col("sdd").cast("double") / nd) / (nd - 1.0)
    val varR = (col("srr2").cast("double") -
      col("srr").cast("double") * col("srr").cast("double") / nd) / (nd - 1.0)
    val strength = greatest(lit(0.0), lit(1.0) - varR / varD)
    val scal = mom.select(col("n").as("n_windows"),
      round(strength, 9).as("seasonal_strength"))
    byHour.crossJoin(broadcast(scal))
      .select(col("hod"), col("cnt"),
        round(col("s_pico").cast("double") / 1e12, 6).as("seasonal"),
        col("n_windows"), col("seasonal_strength"))
  }

  /** SAX motif discovery (Lin/Keogh 2003 symbolic aggregate
    * approximation, word-per-bucket form): z-normalize the dense
    * series, map each bucket to {a,b,c} by the Gaussian tercile
    * breakpoints ±0.4307…, slide a `wordLen` window, and rank the
    * recurring words — "what shapes does this metric repeat?" (the
    * hourly double-peak, the overnight flat, the spike-decay).
    *
    * Determinism: mean/sd come from exact integer moments in ONE fixed
    * double expression; the breakpoint compares are on bit-identical
    * doubles (same literal, same operation order), so symbols cannot
    * flip across engines; word counts are exact longs and the top-k
    * orders by (count desc, word asc).
    *
    * Scale: everything runs on the SERIES table (corpus-independent);
    * the lead window and word rollup are spine-sized.
    */
  def saxMotifs(series: DataFrame, wordLen: Int = 4,
                topK: Int = 10): DataFrame = {
    val s = series.select(col("b"), col("x").cast("long").as("x"))
    val m = s.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("x").cast("decimal(38,0)") * col("x").cast("decimal(38,0)"))
        .as("sxx"))
    val mean = col("sx").cast("double") / col("n").cast("double")
    val sd = sqrt(col("sxx").cast("double") / col("n").cast("double")
      - mean * mean)
    val bp = 0.4307272992954576 // Gaussian tercile breakpoint
    val z = (col("x").cast("double") - mean) / sd
    val sym = when(z < lit(-bp), "a").when(z < lit(bp), "b").otherwise("c")
    val w = Window.orderBy("b")
    val withSym = s.crossJoin(broadcast(m)).select(col("b"), sym.as("s0"))
    val withLeads = (1 until wordLen).foldLeft(withSym)((d, k) =>
      d.withColumn(s"s$k", lead(col("s0"), k).over(w)))
    val words = withLeads
      .filter((1 until wordLen).map(k => col(s"s$k").isNotNull)
        .reduce(_ && _))
      .select(concat((0 until wordLen).map(k => col(s"s$k")): _*).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
      .persist()
    val nw = words.agg(sum("cnt").cast("long").as("n_windows"))
    val top = words
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("word").asc)).cast("long"))
      .filter(col("rank") <= topK)
      .crossJoin(broadcast(nw))
      .select(col("rank"), col("word"), col("cnt"), col("n_windows"))
      .localCheckpoint() // topK rows; lets the cache drop
    words.unpersist(false)
    top
  }

  /** Single-bin DFT periodogram at candidate periods (the Goertzel /
    * spectral-peak test: "is this metric 24-hourly, 12-hourly, or
    * weekly?") over a dense integer series. For each period p the
    * series folds to p residue classes; the centered cos/sin sums
    * use n-SCALED exact integer deviations per class
    * (`dev_r = n·Σ_{t≡r}x − cnt_r·Σx`), multiplied by PLAN-TIME
    * twiddle literals cos/sin(2πr/p) — the same doubles in both
    * engines, so the only quantization is one micro-floor per residue
    * (p terms). Dominance is decided on EXACT integer power
    * (sc² + ss² in micro² units) — no float compare picks the winner.
    *
    * Scale: one spine-sized residue aggregate per period; everything
    * else is p-bounded.
    *
    * Overflow cap: the dominance integer `p_int = sc² + ss²` squares
    * decimal(38,0) sums where |sc| scales as n_buckets·Σ|x|·1e6 — the
    * square overflows decimal(38,0) (→ null dominant for EVERY period)
    * once |sc| ≳ 3·10¹⁸. With hourly buckets that bound holds up to
    * ~10 years × |x| ≲ 10⁶·mean-deviation; for longer/higher-volume
    * series pre-aggregate to coarser buckets or rescale x before
    * calling (same caveat style as lcc1/auc1).
    */
  def periodogram(series: DataFrame,
                  periods: Seq[Int] = Seq(12, 24, 168)): DataFrame = {
    val s = series.select(col("b"), col("x").cast("long").as("x"))
    val tot = s.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"))
    val w = Window.orderBy("b")
    val indexed = s.withColumn("t", (row_number().over(w) - 1).cast("long"))
      .persist()
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val legs = periods.map { p =>
      val cosArr = typedlit((0 until p).map(r => math.cos(2.0 * math.Pi * r / p)))
      val sinArr = typedlit((0 until p).map(r => math.sin(2.0 * math.Pi * r / p)))
      val res = indexed
        .groupBy((col("t") % p).cast("int").as("r"))
        .agg(count(lit(1)).cast("long").as("cnt"),
          sum(col("x").cast("decimal(38,0)")).as("sr"))
        .crossJoin(broadcast(tot))
        .withColumn("dev", dec(col("n")) * col("sr") - dec(col("cnt")) * col("sx"))
        .withColumn("tc", floor(col("dev").cast("double") *
          element_at(cosArr, col("r") + 1) * lit(1e6) + lit(0.5)).cast("long"))
        .withColumn("ts", floor(col("dev").cast("double") *
          element_at(sinArr, col("r") + 1) * lit(1e6) + lit(0.5)).cast("long"))
      res.agg(max("n").as("n"),
          sum(dec(col("tc"))).as("sc"), sum(dec(col("ts"))).as("ss"))
        .select(lit(p.toLong).as("period"), col("n"),
          col("sc"), col("ss"), (col("sc") * col("sc") + col("ss") * col("ss"))
            .as("p_int"))
    }
    val all = legs.reduce(_ unionByName _)
    val wAll = Window.orderBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nd = col("n").cast("double")
    val norm = (c: org.apache.spark.sql.Column) =>
      round(c.cast("double") / 1e6 / (nd * nd), 9)
    val out = all
      .withColumn("p_max", max(col("p_int")).over(wAll))
      .select(col("period"), col("n").as("n_buckets"),
        norm(col("sc")).as("s_cos"), norm(col("ss")).as("s_sin"),
        round((col("sc").cast("double") / 1e6 / (nd * nd)) *
          (col("sc").cast("double") / 1e6 / (nd * nd)) +
          (col("ss").cast("double") / 1e6 / (nd * nd)) *
          (col("ss").cast("double") / 1e6 / (nd * nd)), 9).as("power"),
        (col("p_int") === col("p_max")).as("dominant"))
      .localCheckpoint() // |periods| rows; lets the cache drop
    indexed.unpersist(false)
    out
  }

  /** CUSUM changepoint detection (Page 1954) over a dense integer
    * series: `C_t = Σ_{i≤t}(x_i − x̄)` peaks where the level shifts;
    * emits the argmax-|C| bucket (earliest on ties) with the
    * before/after means and their delta — the "when did the rate
    * change" monitoring primitive.
    *
    * Exactness: n-scaled partial sums `n·cum_t − t·Σx` are exact
    * integers, the argmax boundary orders by (|C| desc, t asc) —
    * integers again; the four display divisions happen on the single
    * winning row.
    *
    * Scale: one cumulative window over the SERIES table (corpus-
    * independent length), a TakeOrdered(1) — no global sort of
    * anything corpus-sized.
    */
  def cusumChangepoint(series: DataFrame): DataFrame = {
    val s = series.select(col("b"), col("x").cast("long").as("x"))
    val tot = s.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"))
    val wCum = Window.orderBy("b").rowsBetween(Long.MinValue, 0)
    val wRow = Window.orderBy("b")
    val cum = s
      .withColumn("cum", sum(col("x")).over(wCum).cast("decimal(38,0)"))
      .withColumn("t", row_number().over(wRow).cast("long"))
    val j = cum.crossJoin(broadcast(tot))
      .withColumn("c_t", col("n").cast("decimal(38,0)") * col("cum") -
        col("t").cast("decimal(38,0)") * col("sx"))
    val top = j.orderBy(abs(col("c_t")).desc, col("t").asc).limit(1)
    val before = col("cum").cast("double") / col("t").cast("double")
    val after = (col("sx") - col("cum")).cast("double") /
      (col("n") - col("t")).cast("double")
    top.select(col("b").as("change_b"), col("t").as("t_star"), col("n"),
      round(abs(col("c_t")).cast("double") / col("n").cast("double"), 6)
        .as("c_max"),
      round(before, 6).as("mean_before"),
      when(col("n") > col("t"), round(after, 6)).otherwise(lit(0.0))
        .as("mean_after"),
      when(col("n") > col("t"), round(after - before, 6)).otherwise(lit(0.0))
        .as("delta"))
  }

  /** Banded dynamic-time-warping distance (Sakoe & Chiba, TASSP'78)
    * between every pair of per-key integer series — THE alignment-
    * tolerant series similarity (two keys with the same shape shifted
    * by a lag are "close" under DTW and "far" under Euclidean):
    * `D[i][j] = |a_i − b_j| + min(D[i−1][j], D[i][j−1], D[i−1][j−1])`
    * restricted to the |i−j| ≤ `band` diagonal corridor. Emits the
    * exact DTW distance and the Euclidean-companion Σ|a_i − b_i| so
    * the warping GAIN is auditable per pair, plus `n_buckets_full`
    * (the untruncated spine length) beside `n_buckets` so the static
    * 40-bucket DP bound is visible, never silent.
    *
    * Determinism: the whole DP is exact integer arithmetic — no
    * floats anywhere. The corridor DP runs as `len` chained column
    * projections, each building the next DP row with an in-row
    * left-to-right fold (the unigramDp chained-projection discipline;
    * the oracle unrolls the same rows as CTEs because DuckDB's
    * list-accumulator `list_reduce` is broken in vectorized batches).
    *
    * Scale: series build with one (key, bucket) count shuffle; pairs
    * are keys-bounded (k² rows carrying two fixed-length arrays); the
    * DP is IN-ROW constant work per pair — nothing corpus-sized ever
    * joins.
    */
  def dtwPairs(df: DataFrame, keyCol: String, tsCol: String,
               bucket: String = "day", band: Int = 3): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("k"),
        date_trunc(bucket, col(tsCol)).as("b"))
      .agg(count(lit(1)).cast("long").as("x"))
    val spine = counts.agg(min("b").as("__lo"), max("b").as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL 1 $bucket"))).as("b"))
    val keys = counts.select("k").distinct()
    val dense = keys.crossJoin(spine)
      .join(counts, Seq("k", "b"), "left")
      .groupBy("k")
      .agg(array_sort(collect_list(struct(col("b"),
        coalesce(col("x"), lit(0L)).as("x")))).as("sx"))
      .select(col("k"), expr("transform(sx, s -> s.x)").as("s"),
        size(col("sx")).cast("long").as("nf"))
    // static DP unroll bound; longer series truncate to the first 40
    // buckets — NOT silent: n_buckets_full carries the untruncated
    // spine length so a consumer sees exactly when the bound bites
    // (n_buckets < n_buckets_full)
    val maxLen = 40
    val pairs = dense.select(col("k").as("ka"), col("nf"),
        expr(s"slice(s, 1, $maxLen)").as("sa"))
      .join(dense.select(col("k").as("kb"),
        expr(s"slice(s, 1, $maxLen)").as("sb")),
        col("ka") < col("kb"))
      .withColumn("len", size(col("sa")))
    // DP row i (1-based over sa): dp[j] = DTW of sa[1..i] vs sb[1..j],
    // INF outside the band. Row 0 seeds j=0 only; each round folds the
    // next row left to right carrying the running dp[i][j-1].
    val INF = 4611686018427387904L // 2^62: safe to add costs onto
    val n = 40 // matches the maxLen slice above; rows beyond len no-op
    var dp = pairs.withColumn("dp", expr(
      s"transform(sequence(0, len), j -> CASE WHEN j = 0 THEN 0L ELSE ${INF}L END)"))
    for (i <- 1 to n) {
      dp = dp.withColumn("dp", expr(
        s"""CASE WHEN $i > len THEN dp ELSE
           |  aggregate(sequence(1, len),
           |    CAST(array(${INF}L) AS ARRAY<BIGINT>),
           |    (acc, j) -> array_append(acc,
           |      CASE WHEN abs(j - $i) > $band THEN ${INF}L ELSE
           |        abs(element_at(sa, $i) - element_at(sb, j)) +
           |        least(element_at(dp, j + 1),
           |          element_at(dp, j),
           |          element_at(acc, j))
           |      END))
           |END""".stripMargin))
    }
    dp.select(col("ka"), col("kb"), col("len").cast("long").as("n_buckets"),
      col("nf").as("n_buckets_full"),
      element_at(col("dp"), col("len") + 1).as("dtw_dist"),
      expr("""aggregate(sequence(1, len), 0L, (acc, i) ->
             |  acc + abs(element_at(sa, i) - element_at(sb, i)))"""
        .stripMargin).as("euclid_l1"))
  }
}
