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
  def forwardFill(df: DataFrame, timeCol: String, valueCols: Seq[String],
                  keys: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(s"${c}_ffill", last(col(c), ignoreNulls = true).over(w)))
  }
}
