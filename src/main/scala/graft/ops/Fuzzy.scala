package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching: all pairs within Levenshtein distance 1 via
  * deletion-neighborhood blocking (the FastSS/SymSpell trick).
  *
  * Completeness: for strings a, b with lev(a,b) ≤ 1, the sets
  * {a} ∪ deletes1(a) and {b} ∪ deletes1(b) intersect — equality
  * trivially, substitution via deleting the substituted position from
  * both, insert/delete via deleting the inserted char from the longer
  * side. So an equi-join on deletion variants finds EVERY qualifying
  * pair (no LSH-style recall loss), and `levenshtein` verification
  * removes the false positives the blocking admits.
  *
  * Scale design: each string fans out to length+1 variant keys — a
  * narrow, linear blow-up — and candidates come from one equi-join on
  * the variant's md5 carrying ids only. Verification runs once per
  * DISTINCT candidate pair. The naive alternative is an O(n²) cross
  * join with a levenshtein in the condition — unrunnable at corpus
  * vocabulary sizes; this is the inverted-index shape that is.
  */
object Fuzzy {

  /** All-pairs self-join: every unordered pair (s1 < s2) of distinct
    * values of `strCol` with lev ≤ 1. Output: (s1, s2, dist).
    */
  def selfJoinLev1(df: DataFrame, strCol: String): DataFrame = {
    val strs = df.select(col(strCol).as("s")).distinct()
    val s = col("s")
    // variant i=0 is the string itself; variant i in 1..len deletes
    // char i. substr is 1-based; both engines agree on that.
    val variants = transform(sequence(lit(0), length(s)), i =>
      when(i === lit(0), s).otherwise(
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i))))
    val keyed = strs.select(s, explode(array_distinct(variants)).as("v"))
      .select(s, md5(col("v")).as("vk"))
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.vk") === col("b.vk") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s1"), col("b.s").as("s2"))
      .distinct()
    cand.withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= 1)
  }
}
