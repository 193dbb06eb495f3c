package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Completeness law for deletion-neighborhood blocking: every edit
  * kind within distance 1 must be found; nothing beyond distance 1 may
  * appear.
  */
class FuzzySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("selfJoinLev1 finds substitution, insertion, deletion; rejects d>=2") {
    val strs = Seq(
      "alpha",   // base
      "alphb",   // substitution at end          -> d=1
      "alphas",  // insertion at end             -> d=1
      "alph",    // deletion at end              -> d=1
      "blpha",   // substitution at start        -> d=1
      "lpha",    // deletion at start            -> d=1
      "alxxa",   // two substitutions            -> d=2, must NOT pair with alpha
      "zzz"      // unrelated
    ).toDF("s")
    val got = Fuzzy.selfJoinLev1(strs, "s").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val withAlpha = got.collect {
      case ("alpha", x) => x
      case (x, "alpha") => x
    }
    assert(withAlpha.toSet === Set("alphb", "alphas", "alph", "blpha", "lpha"))
    assert(!got.contains(("alpha", "alxxa")) && !got.contains(("alxxa", "alpha")))
    assert(got.forall { case (a, b) => a < b }, "pairs must be ordered s1 < s2")
    // d=1 pairs among the variants themselves are legitimate (e.g.
    // "alph"/"lpha" is d=2, but "alphb"/"alphbs"... none added here);
    // just assert no pair involves zzz
    assert(got.forall { case (a, b) => a != "zzz" && b != "zzz" })
  }

  test("selfJoinLev1 handles single-char strings and duplicates") {
    val strs = Seq("a", "b", "ab", "a").toDF("s")
    val got = Fuzzy.selfJoinLev1(strs, "s").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getInt(2))).toMap
    // "a"~"b" substitution, "a"~"ab" insertion, "b"~"ab" substitution+? lev(b,ab)=1 (insert a)
    assert(got === Map(("a", "b") -> 1, ("a", "ab") -> 1, ("ab", "b") -> 1))
  }

  test("a transposition pair (d=2) resolves via the n-gram blocker, not the deletion one") {
    // "account-1234" vs "account-1243": a transposition = lev 2 — the
    // 1-deletion neighborhood CANNOT block it (their deletion variants
    // never meet), but the pair shares plenty of 3-grams, so the
    // second blocking family catches it and the union resolves the
    // pair. This is the law ER composition relies on: adding a blocker
    // widens recall without touching the matcher.
    val strs = Seq("account-1234", "account-1243", "unrelated-xyz").toDF("s")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val lev1 = pairs(Fuzzy.selfJoinLev1(strs, "s"))
    assert(lev1.isEmpty, "the deletion blocker alone must miss the d=2 transposition")
    val multi = pairs(Fuzzy.selfJoinFuzzy(strs, "s", maxDist = 2))
    assert(multi === Set(("account-1234", "account-1243", 2)))
  }

  test("segment blocking equals the n-squared levenshtein join on random corpora") {
    // the PassJoin pigeonhole (2d+1 segments, d+1 probed) must lose NO
    // pair at any d — checked against the brute-force cross join on a
    // dense 3-letter alphabet with lengths straddling the
    // segments-longer-than-strings degenerate zone
    val rnd = new scala.util.Random(41)
    for (round <- 1 to 2; d <- Seq(1, 2)) {
      val strs = Seq.fill(40)(
        Seq.fill(1 + rnd.nextInt(10))("abc" (rnd.nextInt(3))).mkString).distinct.toDF("s")
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val fast = pairs(Fuzzy.selfJoinLev(strs, "s", maxDist = d))
      val slow = pairs {
        import org.apache.spark.sql.functions._
        val a = strs.select(col("s").as("s1"))
        val b = strs.select(col("s").as("s2"))
        a.crossJoin(b).filter(col("s1") < col("s2"))
          .withColumn("dist", levenshtein(col("s1"), col("s2")))
          .filter(col("dist") <= d)
      }
      assert(fast === slow, s"round $round d=$d: segment blocking diverged")
      assert(fast.nonEmpty, s"degenerate fixture round $round d=$d")
    }
  }

  test("segment blocking finds the transposition pair without probing the shared prefix") {
    // the er1 shape: constant "account-" prefix, discriminative tail.
    // The tail-probed segment blocker must resolve the d=2
    // transposition (which the 1-deletion neighborhood cannot block)
    // while only ever probing tail segments.
    val strs = Seq("account-1234", "account-1243", "unrelated-xyz").toDF("s")
    val got = Fuzzy.selfJoinLev(strs, "s", maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(("account-1234", "account-1243", 2)))
  }

  test("selfJoinFuzzy remains complete for every d<=1 edit kind (superset of lev-1)") {
    val strs = Seq("alpha", "alphb", "alphas", "alph", "blpha", "lpha", "zzz").toDF("s")
    def keyset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val lev1 = keyset(Fuzzy.selfJoinLev1(strs, "s"))
    val multi = keyset(Fuzzy.selfJoinFuzzy(strs, "s", maxDist = 2))
    assert(lev1.subsetOf(multi), "the union blocker must never lose a lev-1 pair")
    assert(multi.forall { case (a, b) => a != "zzz" && b != "zzz" })
  }

  test("blockingQuality: complete + reductive on a realistic name vocabulary") {
    // distinct surnames + one planted typo each: truth = the 5 planted
    // pairs; everything else is far apart, so a good blocker should be
    // both complete (catch all 5) and reductive (prune most of n²)
    val names = Seq("anderson", "martinez", "thompson", "richards", "caldwell")
    val typos = Seq("andersen", "martines", "thompsen", "richerds", "calddwell")
    val strs = (names ++ typos).toDF("s")
    val got = Fuzzy.blockingQuality(strs, "s", maxDist = 2, dfCap = 4)
      .collect().map(r => r.getAs[String]("blocker") ->
        (r.getAs[Long]("n_truth"), r.getAs[Double]("pair_completeness"),
          r.getAs[Double]("reduction_ratio"))).toMap
    val (nTruthF, pcF, rrF) = got("union_full")
    assert(nTruthF === 5L, s"expected exactly the 5 planted pairs, got $nTruthF")
    assert(pcF === 1.0, "full union blocker must catch every planted typo")
    assert(rrF > 0.5, s"blocker should prune most of n^2 here, got rr=$rrF")
    val (_, pcC, rrC) = got("union_dfcap")
    assert(pcC === 1.0, "df-cap keeps completeness on a non-adversarial vocab")
    assert(rrC >= rrF, "df-cap can only shrink the candidate set")
  }

  test("blockingQuality: above maxVocab the truth is stratified-sampled, ratios converge") {
    // er2's shape at scale: a user-NNN vocabulary with planted lev<=2
    // relatives. The guard must (a) keep the exact path byte-identical
    // below maxVocab, (b) above it shrink the truth join to the sample
    // (never n²), (c) leave the reduction ratio untouched (candidates
    // stay full-vocab), and (d) estimate completeness near the exact
    // value — deterministically, so two runs agree bit for bit.
    import org.apache.spark.sql.functions.col
    val base = (0 until 120).map(i => f"user-$i%04d")
    val typos = (0 until 120 by 3).map(i => f"user-$i%04d".dropRight(1)) // deletions: lev 1
    val strs = (base ++ typos).toDF("s")
    def rows(maxVocab: Long) =
      Fuzzy.blockingQuality(strs, "s", maxDist = 2, dfCap = 30, maxVocab = maxVocab)
        .collect().map(r => r.getAs[String]("blocker") ->
          (r.getAs[Long]("n_truth"), r.getAs[Long]("n_caught"),
            r.getAs[Double]("pair_completeness"),
            r.getAs[Double]("reduction_ratio"))).toMap
    val exact = rows(maxVocab = 100000L)
    val sampled = rows(maxVocab = 80L)
    val sampled2 = rows(maxVocab = 80L)
    assert(sampled === sampled2, "sampling must be deterministic (md5-ordered strata)")
    for (blocker <- Seq("union_full", "union_dfcap")) {
      val (ntE, _, pcE, rrE) = exact(blocker)
      val (ntS, ncS, pcS, rrS) = sampled(blocker)
      assert(rrS === rrE, s"$blocker: reduction ratio must not change under sampling")
      assert(ntS < ntE, s"$blocker: sampled truth must be a strict subset ($ntS vs $ntE)")
      assert(ntS > 0, s"$blocker: the stratified sample must retain some true pairs")
      assert(ncS <= ntS, s"$blocker: caught cannot exceed sampled truth")
      assert(math.abs(pcS - pcE) <= 0.2,
        s"$blocker: sampled completeness $pcS should approximate exact $pcE")
    }
  }
}
