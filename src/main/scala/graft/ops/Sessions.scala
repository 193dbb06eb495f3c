package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization and time-range windowing over event streams — the
  * gaps-and-islands primitives behind user-behavior analytics,
  * conversation-thread assembly for chat-log training corpora, and
  * rate-limited feature windows.
  *
  * Reference analog: the minute-window grouping the CDC pipeline lands
  * by (SURVEY §2.9 T2) is a fixed tumbling window; these are the
  * data-dependent variants (a session ends when the USER goes quiet,
  * not when the clock ticks).
  */
object Sessions {

  /** Gap-based sessionization: assigns every event a per-key
    * `session_idx` (1-based, in time order); a new session starts when
    * the gap from the key's previous event exceeds `gap`. Ties on
    * `tsCol` break by `tieCol` so the island assignment is
    * engine-reproducible.
    *
    * Scale: one hash exchange on `keyCol`; both windows (the lag and
    * the running sum) share that partitioning AND the same sort order,
    * so Catalyst plans a single Exchange + single Sort. State per key
    * is a scan — no self-join, no O(events²) anything. Skewed power
    * users are a window-function skew (one key's events on one task);
    * at 100 TB bound it by splitting keys on a coarse time prefix
    * first if a single key exceeds a task's memory.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gap: Column, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(
      prev.isNull || unix_micros(col(tsCol)) - prev > gap, 1L).otherwise(0L)
    events.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session roll-up of [[sessionize]]: start/end/event-count and
    * exact integer-microsecond duration. The aggregate reuses the
    * session assignment's (key) partitioning — (key, session_idx) is a
    * refinement, so AQE-era Spark still needs one exchange for the
    * groupBy; at scale that exchange carries (key, idx, ts) triples,
    * never payloads.
    */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   gap: Column, tieCol: String): DataFrame =
    sessionize(events, keyCol, tsCol, gap, tieCol)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("duration_us"))

  /** Trailing time-range aggregate: for every event, the count and
    * exact decimal sum of `valueCol` over the key's events in
    * [ts − `horizonUs`, ts] — a RANGE frame on integer microseconds, so
    * peers (exact-tie timestamps) are all included and the result is
    * order-independent and engine-exact.
    *
    * Scale: same single-exchange shape as [[sessionize]]; the range
    * frame is a sliding two-pointer over the sorted run, O(n) per key.
    */
  def trailingWindow(events: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, horizonUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-horizonUs, 0)
    events
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum",
        sum(col(valueCol).cast("decimal(18,6)")).over(w).cast("double"))
  }

  /** RFM segmentation (Hughes 1994 — the classic customer-value
    * triage): per entity recency (days since last activity, vs the
    * dataset's max date), frequency (activity count) and monetary
    * (exact micro-quantized spend), each scored into `q` quintile-style
    * buckets, then rolled up per (r, f, m) segment with its size and
    * average spend — "who are our champions / at-risk / hibernating".
    *
    * Determinism: monetary sums are exact micro longs; the three
    * `ntile` scores run over TOTALLY ordered (metric, entity-id) pairs
    * so bucketing is engine-exact (higher bucket = better: more
    * recent / more frequent / higher spend).
    *
    * Scale: one combinable per-entity rollup (the only input-sized
    * pass); the ntile total orders run on the ENTITY table. At true
    * scale swap ntile for fixed thresholds or percentile_approx cuts —
    * the rollup shape is unchanged; the segment output is q³-bounded.
    */
  def rfmSegments(orders: DataFrame, entityCol: String, tsCol: String,
                  amountCol: String, q: Int = 5): DataFrame = {
    val per = orders
      .select(col(entityCol).as("e"), col(tsCol).as("t"),
        floor(col(amountCol) * lit(1e6) + lit(0.5)).cast("long").as("a"))
      .groupBy("e")
      .agg(max("t").as("last_t"), count(lit(1)).cast("long").as("freq"),
        sum("a").as("mon_micro"))
    val anchor = per.agg(max("last_t").as("__anchor"))
    val scored = per.crossJoin(broadcast(anchor))
      .withColumn("rec_days", datediff(col("__anchor"), col("last_t")).cast("long"))
      .withColumn("r", ntile(q).over(
        Window.orderBy(col("rec_days").desc, col("e").asc)).cast("long"))
      .withColumn("f", ntile(q).over(
        Window.orderBy(col("freq").asc, col("e").asc)).cast("long"))
      .withColumn("m", ntile(q).over(
        Window.orderBy(col("mon_micro").asc, col("e").asc)).cast("long"))
    scored.groupBy("r", "f", "m")
      .agg(count(lit(1)).cast("long").as("n_entities"),
        sum(col("mon_micro").cast("decimal(38,0)")).as("seg_micro"),
        min("rec_days").as("rec_min"), max("rec_days").as("rec_max"))
      .select(col("r"), col("f"), col("m"), col("n_entities"),
        col("rec_min"), col("rec_max"),
        round(col("seg_micro").cast("double") /
          col("n_entities").cast("double") / 1e6, 6).as("avg_monetary"))
  }

  /** Multi-touch conversion attribution (the first-touch / last-touch
    * / linear trio every funnel analysis starts from): for each
    * conversion event, credit the user's PRECEDING non-conversion
    * touches — 10⁶ micro-units of credit per conversion per model,
    * split by the model's rule. Conversions with no prior touch
    * credit a synthetic `(direct)` channel, so every model's column
    * sums to exactly `10⁶ · n_conversions` (the books balance — the
    * audit a marketing-attribution table must pass).
    *
    * Determinism: touch order is the (ts, seq) total order; linear
    * credit is `10⁶ div n` per touch with the remainder assigned to
    * the FIRST touch, so credits are exact integers that sum exactly.
    *
    * Scale: one user-keyed equi-join of conversions to touches (both
    * sides partition on the user — two shuffles of narrow rows), then
    * combinable channel sums. Per-user touch history is session-
    * bounded by construction; a pathological power user is the
    * standard salting case.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  seqCol: String, channelCol: String,
                  isConversion: Column): DataFrame = {
    val base = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(seqCol).cast("long").as("sq"), col(channelCol).as("ch"),
      isConversion.as("conv"))
    val convs = base.filter(col("conv"))
      .select(col("u"), col("ts").as("cts"), col("sq").as("csq"))
    val touches = base.filter(!col("conv"))
      .select(col("u"), col("ts"), col("sq"), col("ch"))
    // the precedence predicate must be part of the JOIN condition: a
    // post-join filter would DROP a conversion whose only matches are
    // later touches, instead of leaving the null row that credits
    // '(direct)'
    val joined = convs.as("c").join(touches.as("t"),
        col("c.u") === col("t.u") &&
          (col("t.ts") < col("c.cts") ||
            (col("t.ts") === col("c.cts") && col("t.sq") < col("c.csq"))),
        "left")
      .select(col("c.u").as("u"), col("c.cts").as("cts"),
        col("c.csq").as("csq"), col("t.ts").as("ts"),
        col("t.sq").as("sq"), col("t.ch").as("ch"))
    val w = Window.partitionBy("u", "cts", "csq")
    val ranked = joined
      .withColumn("n_t", count(col("sq")).over(w).cast("long"))
      .withColumn("r", row_number().over(
        w.orderBy(col("ts").asc_nulls_first, col("sq").asc_nulls_first)))
    val credits = ranked.select(
      when(col("n_t") === 0L, lit("(direct)")).otherwise(col("ch")).as("channel"),
      when(col("n_t") === 0L, 1000000L)
        .when(col("r") === 1, 1000000L).otherwise(0L).as("first_micro"),
      when(col("n_t") === 0L, 1000000L)
        .when(col("r") === col("n_t"), 1000000L).otherwise(0L).as("last_micro"),
      when(col("n_t") === 0L, 1000000L)
        .otherwise(expr("1000000L div n_t") +
          when(col("r") === 1, expr("1000000L % n_t")).otherwise(0L))
        .as("linear_micro"))
    credits.groupBy("channel")
      .agg(sum("first_micro").cast("long").as("first_micro"),
        sum("last_micro").cast("long").as("last_micro"),
        sum("linear_micro").cast("long").as("linear_micro"))
  }
}
