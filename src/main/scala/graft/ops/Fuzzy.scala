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

  /** Candidate pairs from the 1-deletion neighborhood (complete for
    * lev ≤ 1). `strs` must be a single distinct column `s`.
    */
  def deletionCandidates(strs: DataFrame): DataFrame = {
    val s = col("s")
    // variant i=0 is the string itself; variant i in 1..len deletes
    // char i. substr is 1-based; both engines agree on that.
    val variants = transform(sequence(lit(0), length(s)), i =>
      when(i === lit(0), s).otherwise(
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i))))
    val keyed = strs.select(s, explode(array_distinct(variants)).as("v"))
      .select(s, md5(col("v")).as("vk"))
    keyed.as("a").join(keyed.as("b"),
        col("a.vk") === col("b.vk") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s1"), col("b.s").as("s2"))
      .distinct()
  }

  /** Candidate pairs sharing at least one character n-gram — the
    * SECOND blocking family, catching the edit shapes a 1-deletion
    * block structurally cannot (transpositions and double edits are
    * lev = 2). By the count filter, any pair with lev ≤ d and
    * min-length > d·n + n − 1 shares an n-gram, so the blocker is
    * complete for lev ≤ 2 on strings longer than 8 chars at n = 3
    * (shorter strings degrade gracefully: their single truncated gram
    * still blocks exact-prefix relatives).
    *
    * Scale note: the gram index joins on md5(gram) carrying strings
    * only, same shape as the deletion index; on corpora where common
    * grams explode the join (shared prefixes, boilerplate), prune the
    * index to each string's RAREST grams by document frequency — the
    * PPJoin prefix discipline (`Dedup.prefixJaccardPairs`) applied to
    * the blocking index; completeness then holds per that prefix
    * lemma's overlap bound instead of the count filter.
    */
  def ngramCandidates(strs: DataFrame, n: Int = 3): DataFrame = {
    val s = col("s")
    val grams = transform(sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
      i => s.substr(i, lit(n)))
    val keyed = strs.select(s, explode(array_distinct(grams)).as("g"))
      .select(s, md5(col("g")).as("gk"))
    keyed.as("a").join(keyed.as("b"),
        col("a.gk") === col("b.gk") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s1"), col("b.s").as("s2"))
      .distinct()
  }

  /** All-pairs self-join: every unordered pair (s1 < s2) of distinct
    * values of `strCol` with lev ≤ 1. Output: (s1, s2, dist).
    */
  def selfJoinLev1(df: DataFrame, strCol: String): DataFrame =
    deletionCandidates(df.select(col(strCol).as("s")).distinct())
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= 1)

  /** Multi-blocker fuzzy self-join: candidates are the UNION of the
    * 1-deletion neighborhood and the char-n-gram block — so the
    * match-verify stage is not tied to any one blocker's recall shape —
    * verified at lev ≤ `maxDist`. Complete for lev ≤ 1 always (the
    * deletion blocker), and for lev ≤ 2 on strings longer than
    * 2n + n − 1 chars (the gram blocker's count filter); the edge set
    * is exactly "lev ≤ 1, or lev = 2 sharing an n-gram", which an
    * external oracle can restate declaratively.
    */
  def selfJoinFuzzy(df: DataFrame, strCol: String,
                    maxDist: Int = 2, n: Int = 3): DataFrame = {
    val strs = df.select(col(strCol).as("s")).distinct()
    deletionCandidates(strs).unionByName(ngramCandidates(strs, n))
      .dropDuplicates("s1", "s2")
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= maxDist)
  }
}
