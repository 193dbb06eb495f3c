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
  def ngramCandidates(strs: DataFrame, n: Int = 3,
                      dfCap: Long = Long.MaxValue): DataFrame = {
    val s = col("s")
    val grams = transform(sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
      i => s.substr(i, lit(n)))
    val keyed0 = strs.select(s, explode(array_distinct(grams)).as("g"))
      .select(s, md5(col("g")).as("gk"))
    // df-cap pruning (the stop-gram discipline): grams shared by more
    // than dfCap strings are vocabulary chrome ("use"/"ser" in user-N
    // ids) that would block everything with everything — drop them from
    // the INDEX and let er2's pair-completeness metric certify that the
    // surviving rare grams still cover the true pairs.
    val keyed =
      if (dfCap == Long.MaxValue) keyed0
      else {
        val df = keyed0.groupBy("gk").agg(count(lit(1)).as("__df"))
        keyed0.join(df.filter(col("__df") <= dfCap).select("gk"), "gk")
      }
    keyed.as("a").join(keyed.as("b"),
        col("a.gk") === col("b.gk") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s1"), col("b.s").as("s2"))
      .distinct()
  }

  /** [[ngramCandidates]]'s pair set CARRYING each pair's smallest
    * shared-gram document frequency — one gram join then serves every
    * df-cap variant as a filter (`min_df <= cap` ⇔ "shares a gram the
    * capped index keeps", since df is global either way), instead of a
    * re-join per cap. Used by [[blockingQuality]], which needs the
    * capped AND uncapped sets of the SAME vocabulary.
    */
  def ngramCandidatesWithDf(strs: DataFrame, n: Int = 3): DataFrame = {
    val s = col("s")
    val grams = transform(sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
      i => s.substr(i, lit(n)))
    val keyed0 = strs.select(s, explode(array_distinct(grams)).as("g"))
      .select(s, md5(col("g")).as("gk"))
    val dfc = keyed0.groupBy("gk").agg(count(lit(1)).as("__df"))
    val keyed = keyed0.join(dfc, "gk")
    keyed.as("a").join(keyed.as("b"),
        col("a.gk") === col("b.gk") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
      .agg(min(col("a.__df")).as("min_df"))
  }

  /** All-pairs self-join: every unordered pair (s1 < s2) of distinct
    * values of `strCol` with lev ≤ 1. Output: (s1, s2, dist).
    */
  def selfJoinLev1(df: DataFrame, strCol: String): DataFrame =
    deletionCandidates(df.select(col(strCol).as("s")).distinct())
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= 1)

  private def segLen(l: Column, k: Int, p: Int): Column = {
    val m = floor(l.cast("double") / p).cast("int")
    m + when(lit(k) >= lit(p) - pmod(l, lit(p)), 1).otherwise(0)
  }

  private def segStart(l: Column, k: Int, p: Int): Column = {
    val m = floor(l.cast("double") / p).cast("int")
    lit(1) + lit(k) * m + greatest(lit(0), lit(k) - (lit(p) - pmod(l, lit(p))))
  }

  /** Candidate pairs for lev ≤ d via PassJoin-style SEGMENT blocking
    * (Li, Deng, Feng, Wang, "PassJoin: a partition-based method for
    * similarity joins", VLDB'11), with an extra pigeonhole twist that
    * makes it robust to shared boilerplate affixes:
    *
    *  - Every string splits into P = 2d+1 even segments (longer tails
    *    last) and INDEXES all of them under (length, segId, content).
    *  - In an optimal ≤ d edit script, each operation breaks at most
    *    ONE segment of the partner's split and merely SHIFTS the rest
    *    by ≤ d positions — so at least P − d = d+1 segments are
    *    preserved verbatim within a ±d start window. By pigeonhole,
    *    ANY (d+1)-subset of segment ids — even a different subset per
    *    probing string — still contains a preserved segment. So each
    *    string probes only its d+1 RAREST segments (by global
    *    (length, segId, content) document frequency — the AllPairs
    *    rare-first discipline applied to segment blocking), emitting
    *    its substrings at the segment positions of every candidate
    *    partner length (ℓ ∈ [L−d, L+d]) shifted by ≤ d.
    *
    * Rarity-ranked probing is what keeps this linear on corpora whose
    * strings share CONSTANT AFFIXES (URLs, path-like keys): the
    * boilerplate segments are indexed (they must be, for completeness)
    * but probed by almost nobody — every string's rare segments are
    * its discriminative ones — so the quadratic collision a shared
    * gram/segment causes in a symmetric blocker never enters the
    * join. Cost: ≤ (d+1)(2d+1)² probe keys per string — 45 at d = 2 —
    * each a fixed-width row, with the join output bounded by
    * Σ df(probed segment). `probeIds` pins a fixed id subset instead
    * (skipping the df pass) when the discriminative region is known a
    * priori.
    *
    * REGIME honesty (measured): the advantage needs the discriminative
    * content to SPAN ≥ d+1 of the 2d+1 segments. Short keys whose
    * entropy sits in a narrow suffix (zero-padded ids, `user-NNN`)
    * leave ≤ d discriminative segments, so at least one probed segment
    * is boilerplate and candidate volume approaches the symmetric
    * blocker's — with more plan stages on top. For those corpora, if
    * the pair density is high the simple gram blocker is already
    * output-bound (er1's case: 21% of all pairs qualify); if it is
    * low, normalize the key (strip the literal affix) before joining.
    */
  def segmentCandidates(strs: DataFrame, d: Int = 2,
                        probeIds: Option[Seq[Int]] = None): DataFrame = {
    require(d >= 1, "segment blocking needs d >= 1")
    val p = 2 * d + 1
    probeIds.foreach(ids =>
      require(ids.size >= d + 1, s"need at least ${d + 1} probed segment ids"))
    val s = col("s")
    val bigL = length(s)
    val idx = strs.select(s,
        explode(array((0 until p).map { k =>
          struct(bigL.as("l"), lit(k).as("k"),
            s.substr(segStart(bigL, k, p), segLen(bigL, k, p)).as("c"))
        }: _*)).as("seg"))
      .select(s.as("bs"), col("seg.l"), col("seg.k"), col("seg.c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // which ids each string probes: a fixed subset, or its d+1 rarest
    // segments (df over the index keys; ties to the lower id)
    val chosen = probeIds match {
      case Some(ids) =>
        strs.select(s.as("as"), explode(array(ids.map(lit(_)): _*)).as("k"))
      case None =>
        val dfc = idx.groupBy("l", "k", "c").agg(count(lit(1)).as("df"))
        idx.join(dfc, Seq("l", "k", "c"))
          .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("bs"))
              .orderBy(col("df").asc, col("k").asc)))
          .filter(col("rk") <= d + 1)
          .select(col("bs").as("as"), col("k"))
    }
    val probeStructs = for {
      k <- 0 until p
      dl <- -d to d
      off <- -d to d
    } yield {
      val ell = bigL + dl
      val sl = segLen(ell, k, p)
      val pos = segStart(ell, k, p) + off
      // a zero-length segment is matchable anywhere — emit it once
      // (pos pinned to 1) so array_distinct collapses the window
      val posN = when(sl === 0, lit(1)).otherwise(pos)
      when(ell >= 1 && posN >= 1 && posN + sl - lit(1) <= bigL,
        struct(ell.as("l"), lit(k).as("k"), s.substr(posN, sl).as("c")))
    }
    val probe = strs.select(s,
        explode(array_distinct(filter(array(probeStructs: _*), x => x.isNotNull))).as("seg"))
      .select(s.as("as"), col("seg.l"), col("seg.k"), col("seg.c"))
      .join(chosen, Seq("as", "k"), "left_semi")
    probe.join(idx, Seq("l", "k", "c"))
      .filter(col("as") =!= col("bs"))
      .select(least(col("as"), col("bs")).as("s1"),
        greatest(col("as"), col("bs")).as("s2"))
      .distinct()
  }

  /** All-pairs self-join: every unordered pair (s1 < s2) of distinct
    * values of `strCol` with lev ≤ `maxDist`, via [[segmentCandidates]]
    * — COMPLETE for any `maxDist` (unlike the gram blocker's
    * length-conditioned completeness), with the blocking cost
    * concentrated on the probed discriminative segments. Output:
    * (s1, s2, dist).
    */
  def selfJoinLev(df: DataFrame, strCol: String, maxDist: Int = 2,
                  probeIds: Option[Seq[Int]] = None): DataFrame =
    segmentCandidates(df.select(col(strCol).as("s")).distinct(), maxDist, probeIds)
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= maxDist)

  /** Blocking-quality metrics — the record-linkage evaluation pair
    * (Christen 2012): REDUCTION RATIO (how much of the n² pair space
    * the blocker prunes) and PAIR COMPLETENESS (what fraction of true
    * lev ≤ maxDist pairs survive blocking). The multi-blocker union is
    * complete for lev ≤ 1 by construction, so completeness < 1 can only
    * come from lev-2 pairs outside the gram blocker's length bound —
    * exactly what this metric makes visible.
    *
    * The ONLY quadratic piece is the truth join, and it is bounded by
    * construction: above `maxVocab` distinct strings the truth is
    * estimated on a DETERMINISTIC STRATIFIED SAMPLE — per length
    * stratum (true pairs need |len(a)−len(b)| ≤ maxDist, so length is
    * the variance-relevant stratum), each stratum keeps its
    * ceil(count · maxVocab/n) smallest strings by md5 order. The theta
    * join then runs sample×sample (≤ maxVocab² cells, never n²), the
    * completeness ratio n_caught/n_truth is the standard pair-sampled
    * estimator (pairs drawn with probability ≈ (maxVocab/n)², σ ≤
    * 1/(2·√n_truth_sampled)), and the reduction ratio is UNAFFECTED —
    * candidates and the n²/2 denominator always come from the full
    * vocabulary; the blockers are the linear, scalable part. In the
    * sampled regime `n_truth`/`n_caught` carry the within-sample
    * counts (the ratio columns are the estimates); below the guard the
    * exact path is byte-identical to before.
    */
  def blockingQuality(df: DataFrame, strCol: String,
                      maxDist: Int = 2, n: Int = 3,
                      dfCap: Long = 30L,
                      maxVocab: Long = 10000L): DataFrame = {
    require(maxVocab > 0, "maxVocab must be positive")
    val strs = df.select(col(strCol).as("s")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nStr = strs.count()
    val truthBase =
      if (nStr <= maxVocab) strs
      else {
        val frac = maxVocab.toDouble / nStr
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(length(col("s"))).orderBy(md5(col("s")), col("s"))
        strs
          .withColumn("__rk", row_number().over(w))
          .withColumn("__n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(length(col("s")))))
          .filter(col("__rk") <= ceil(col("__n") * lit(frac)))
          .select("s")
      }
    val truth = truthBase.as("a").join(truthBase.as("b"), col("a.s") < col("b.s"))
      .select(col("a.s").as("s1"), col("b.s").as("s2"))
      .filter(levenshtein(col("s1"), col("s2")) <= maxDist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTruth = truth.count()
    def row(name: String, cand: DataFrame): DataFrame = {
      val c = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = strs.sparkSession.range(1).select(
        lit(name).as("blocker"),
        lit(nStr).as("n_strings"),
        lit(nStr * (nStr - 1) / 2).as("n_all_pairs"),
        lit(c.count()).as("n_candidates"),
        lit(nTruth).as("n_truth"),
        lit(truth.join(c, Seq("s1", "s2"), "left_semi").count()).as("n_caught"))
        .withColumn("pair_completeness",
          round(col("n_caught").cast("double") / col("n_truth").cast("double"), 6))
        .withColumn("reduction_ratio",
          round(lit(1.0) - col("n_candidates").cast("double")
            / col("n_all_pairs").cast("double"), 6))
      c.unpersist()
      out
    }
    // both blocker variants from ONE deletion join and ONE gram join:
    // the capped gram set is a min_df filter over the uncapped pairs
    val delC = deletionCandidates(strs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gp = ngramCandidatesWithDf(strs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def union2(g: DataFrame) = delC.unionByName(g).dropDuplicates("s1", "s2")
    val out = row("union_full", union2(gp.select("s1", "s2")))
      .unionByName(row("union_dfcap",
        union2(gp.filter(col("min_df") <= dfCap).select("s1", "s2"))))
    delC.unpersist(); gp.unpersist(); strs.unpersist(); truth.unpersist()
    out
  }

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
