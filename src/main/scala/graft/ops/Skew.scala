package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overwhelm a single reducer.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  * GraftSession); this explicit salt is for the cases AQE can't touch —
  * e.g. a skewed key feeding a window, or a build side too big to
  * broadcast but small enough to replicate `buckets` times.
  *
  * `saltedJoin(big, small, key, buckets)`: the big side gets a
  * deterministic per-row salt in [0, buckets); the small side is
  * exploded once per salt value; the join key becomes (key, salt), so a
  * hot key's rows spread over `buckets` reducers. Row-content hashing
  * keeps the salt deterministic across retries (a `rand()` salt would
  * break replay idempotency).
  */
object Skew {

  def withSalt(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))

  /** Inner equi-join `big ⋈ small` on `bigKey = smallKey`, salted. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 buckets: Int = 16): DataFrame = {
    val b = withSalt(big, buckets)
    // sequence(int, int) yields array<int>, so the exploded salt is
    // already int (a generator can't be nested under a cast)
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"))
      .drop("__salt")
  }

  /** Top-k per key over a skew-prone ordering: two-phase
    * WindowGroupLimit by hand — per-salt top-k first (bounded state per
    * reducer), then global top-k over `buckets × k` survivors.
    */
  def saltedTopK(df: DataFrame, keyCol: String, order: Column, k: Int,
                 buckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = withSalt(df, buckets)
    val w1 = Window.partitionBy(col(keyCol), col("__salt")).orderBy(order)
    val survivors = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(order)
    survivors.withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= k).drop("__rn", "__salt")
  }
}
