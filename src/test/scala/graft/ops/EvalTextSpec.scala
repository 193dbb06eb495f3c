package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Unit laws for the round-13 eval/privacy/retrieval additions: BLEU,
  * chrF, Rényi efficiency, Krippendorff's α, l-diversity/t-closeness,
  * and MaxSim late-interaction retrieval.
  */
class EvalTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bleu: identical pair scores exactly 1; missing 4-gram scores 0") {
    val same = Seq((1L, "the cat sat on the mat today", "the cat sat on the mat today"))
      .toDF("pid", "ref", "cand")
    val r = Text.bleu(same, "ref", "cand", "pid").head()
    assert(r.getAs[Long]("bleu_nano") === 1000000000L)
    assert(r.getAs[Long]("ref_len") === 7L)
    // a 3-token candidate has no 4-gram in common by construction
    val short = Seq((1L, "a b c d e", "x y z"))
      .toDF("pid", "ref", "cand")
    assert(Text.bleu(short, "ref", "cand", "pid")
      .head().getAs[Long]("bleu_nano") === 0L)
    spark.catalog.clearCache()
  }

  test("bleu: brevity penalty bites a short but precise candidate") {
    // cand is a strict prefix: all clipped precisions 1, BP = exp(1-8/5)
    val pre = Seq((1L, "a b c d e f g h", "a b c d e"))
      .toDF("pid", "ref", "cand")
    val r = Text.bleu(pre, "ref", "cand", "pid").head()
    val expected = math.floor(math.exp(1.0 - 8.0 / 5.0) * 1e9 + 0.5).toLong
    assert(r.getAs[Long]("bleu_nano") === expected)
    spark.catalog.clearCache()
  }

  test("chrF: identical pair scores 1e6 at every n; disjoint scores 0") {
    val same = Seq((1L, "abcdef", "abcdef")).toDF("pid", "ref", "cand")
    val rows = Text.chrF(same, "ref", "cand", "pid").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[Long]("f_micro") === 1000000L))
    assert(rows.forall(_.getAs[Long]("chrf_micro") === 1000000L))
    val disj = Seq((1L, "aaaa", "bbbb")).toDF("pid", "ref", "cand")
    assert(Text.chrF(disj, "ref", "cand", "pid").collect()
      .forall(_.getAs[Long]("chrf_micro") === 0L))
    spark.catalog.clearCache()
  }

  test("renyiEfficiency: uniform token distribution is maximally efficient") {
    val docs = Seq("alpha beta gamma delta").toDF("text")
    val r = Text.renyiEfficiency(docs).head()
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("vocab") === 4L)
    // H2 = ln 4 and H/ln V = 1 exactly (uniform); Shannon rides pico
    // quantization so allow 1 nano of slack
    assert(r.getAs[Long]("eff2_nano") === 1000000000L)
    assert(math.abs(r.getAs[Long]("eff_shannon_nano") - 1000000000L) <= 1L)
    // a skewed distribution is strictly less efficient
    val skew = Seq("a a a a a a b").toDF("text")
    val s = Text.renyiEfficiency(skew).head()
    assert(s.getAs[Long]("eff2_nano") < 1000000000L)
  }

  test("krippendorffAlpha: hand-computed nominal alpha; singletons dropped") {
    // items {a,a}, {b,b}, {a,b} + one unpairable singleton:
    // D_o terms 0, 0, 2e12; n = 6, n_a = n_b = 3, D_e raw = 18
    // alpha = 1 - 5 * 2 / 18 = 4/9
    val ratings = Seq(
      ("i1", "a"), ("i1", "a"), ("i2", "b"), ("i2", "b"),
      ("i3", "a"), ("i3", "b"), ("solo", "a")).toDF("item", "label")
    val r = Stats.krippendorffAlpha(ratings, "item", "label").head()
    assert(r.getAs[Long]("n_items_used") === 3L)
    assert(r.getAs[Long]("n_items_dropped") === 1L)
    assert(r.getAs[Long]("n_values") === 6L)
    assert(r.getAs[Long]("alpha_nano") === 444444444L)
    // perfect agreement across a 2-category universe
    val perfect = Seq(("i1", "a"), ("i1", "a"), ("i2", "b"), ("i2", "b"))
      .toDF("item", "label")
    assert(Stats.krippendorffAlpha(perfect, "item", "label")
      .head().getAs[Long]("alpha_nano") === 1000000000L)
  }

  test("lDiversityReport: distinct/entropy l and exact TV distance") {
    // g1 sensitive {x,x,y}; g2 {x,y,y,z}; global x=3 y=3 z=1, N=7
    val df = Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "x"), ("g2", "y"), ("g2", "y"), ("g2", "z"))
      .toDF("grp", "sens")
    val got = Curate.lDiversityReport(df, Seq("grp"), "sens")
      .orderBy("grp").collect()
    val g1 = got(0)
    assert(g1.getAs[Long]("n_g") === 3L)
    assert(g1.getAs[Long]("l_distinct") === 2L)
    // TV numerators: |2*7-3*3|=5, |1*7-3*3|=2, |0*7-1*3|=3 -> 10
    // t_tv = 10e6 div (2*3*7) = 238095
    assert(g1.getAs[Long]("t_tv_micro") === 238095L)
    // entropy l = exp(H({2/3,1/3})) ~ 1.8899
    assert(math.abs(g1.getAs[Long]("entropy_l_micro") - 1889882L) <= 2L)
    // a group mirroring the global distribution has TV ~ 0
    val uni = Seq(("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y"))
      .toDF("grp", "sens")
    assert(Curate.lDiversityReport(uni, Seq("grp"), "sens").collect()
      .forall(_.getAs[Long]("t_tv_micro") === 0L))
  }

  test("fimTransform: lengths partition the doc; short docs pass through; deterministic") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "tiny doc"), // n = 2 < 3: never applied
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = Curate.fimTransform(docs).orderBy("doc_id").collect()
    got.foreach { r =>
      assert(r.getAs[Long]("prefix_len") + r.getAs[Long]("middle_len") +
        r.getAs[Long]("suffix_len") === r.getAs[Long]("n_tokens"))
    }
    val tiny = got.find(_.getAs[Long]("doc_id") == 2L).get
    assert(!tiny.getAs[Boolean]("fim_applied"))
    // passthrough digest = md5 of the original token join
    assert(tiny.getAs[String]("psm_md5") ===
      spark.sql("SELECT md5('tiny doc')").head().getString(0))
    assert(tiny.getAs[String]("psm_md5") === tiny.getAs[String]("spm_md5"))
    got.filter(_.getAs[Boolean]("fim_applied")).foreach { r =>
      assert(r.getAs[Long]("middle_len") >= 1L)
      assert(r.getAs[String]("psm_md5") !== r.getAs[String]("spm_md5"))
    }
    // determinism: a second run is bit-identical
    val again = Curate.fimTransform(docs).orderBy("doc_id").collect()
    assert(got.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("bbitMinhashEval: exact duplicates agree on every slot and every bit") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different text about spark catalyst expression trees"))
      .toDF("doc_id", "text")
    val got = Dedup.bbitMinhashEval(docs, threshold = 0.3).collect()
    assert(got.length === 1) // only the duplicate pair survives
    val r = got.head
    assert(r.getAs[Long]("jaccard_micro") === 1000000L)
    assert(r.getAs[Long]("slot_matches") === 64L)
    assert(r.getAs[Long]("bit_collisions") === 64L)
    assert(r.getAs[Long]("full_est_micro") === 1000000L)
    assert(r.getAs[Long]("bbit_est_micro") === 1000000L)
    assert(r.getAs[Long]("err_full_micro") === 0L)
    assert(r.getAs[Long]("err_bbit_micro") === 0L)
    spark.catalog.clearCache()
  }

  test("spearmanRho: monotone = 1, reversed = -1, tie-averaged hand case") {
    val up = Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L))
      .toDF("k", "x", "y")
    assert(Stats.spearmanRho(up, "k", "x", "y")
      .head().getAs[Long]("rho_nano") === 1000000000L)
    val down = Seq(("a", 1L, 30L), ("b", 2L, 20L), ("c", 3L, 10L))
      .toDF("k", "x", "y")
    assert(Stats.spearmanRho(down, "k", "x", "y")
      .head().getAs[Long]("rho_nano") === -1000000000L)
    // x-ties: x ranks (avg) = 1.5, 1.5, 3; y = 1, 2, 3
    // rho = cov/sd = sqrt(3)/2 on these ranks
    val tied = Seq(("a", 1L, 10L), ("b", 1L, 20L), ("c", 2L, 30L))
      .toDF("k", "x", "y")
    val r = Stats.spearmanRho(tied, "k", "x", "y").head()
    assert(math.abs(r.getAs[Long]("rho_nano") / 1e9 -
      math.sqrt(3.0) / 2.0) < 1e-8)
    // constant metric: zero variance reports 0, no NaN
    val const = Seq(("a", 5L, 10L), ("b", 5L, 20L)).toDF("k", "x", "y")
    assert(Stats.spearmanRho(const, "k", "x", "y")
      .head().getAs[Long]("rho_nano") === 0L)
  }

  test("vacuumReport: classifies retention states without deleting; counts strays") {
    import graft.ingest.VersionedDir
    val dir = java.nio.file.Files.createTempDirectory("vac_spec").toString
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    VersionedDir.publish(df1, dir, 1L)
    VersionedDir.publish(df1.union(Seq((3L, "c")).toDF("id", "v")), dir, 2L)
    VersionedDir.publish(df1, dir, 3L)
    VersionedDir.stage(df1, dir, 4L) // crash leftover, never pointed
    val got = VersionedDir.vacuumReport(spark, dir, keep = 2)
      .orderBy("version").collect()
    assert(got.map(r => r.getAs[Long]("version") -> r.getAs[String]("status"))
      .toSeq === Seq(1L -> "prunable", 2L -> "prunable", 3L -> "pointed",
        4L -> "staged_unpointed"))
    assert(got.forall(_.getAs[Long]("n_stray_files") === 0L))
    assert(got(1).getAs[Long]("n_rows") === 3L)
    // the dry run deleted nothing: every snapshot still readable
    assert(spark.read.parquet(s"$dir/v=1").count() === 2L)
    // prune deletes exactly the rows the dry run called prunable
    assert(VersionedDir.prune(spark, dir, keep = 2) === 2)
  }

  test("queryLikelihood: term-bearing docs rank above smoothed background; no-hit docs dropped") {
    val docs = Seq(
      (1L, "spark spark spark is fast"),
      (2L, "spark appears once here today"),
      (3L, "nothing relevant in this document at all"))
      .toDF("doc_id", "text")
    val got = Search.queryLikelihood(docs, Seq("spark"), mu = 10.0)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    // same length, higher tf -> strictly higher smoothed likelihood
    assert(got(0).getAs[Long]("score_nano") > got(1).getAs[Long]("score_nano"))
  }

  test("keynessLlr: a focus-only term tops the list; balanced terms score ~0") {
    val docs = (Seq.fill(10)(("en", "common words here plus shibboleth")) ++
      Seq.fill(10)(("fr", "common words here plus autrechose")))
      .zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "lang", "text")
    val got = Text.keynessLlr(docs, col("lang") === "en", topK = 10,
      minCount = 5L).collect()
    val byTerm = got.map(r => r.getAs[String]("term") -> r).toMap
    assert(byTerm("shibboleth").getAs[Boolean]("overused"))
    assert(!byTerm("autrechose").getAs[Boolean]("overused"))
    // perfectly balanced terms have G2 exactly 0
    assert(byTerm("common").getAs[Long]("g2_micro") === 0L)
    // the two discriminators dominate the balanced terms
    assert(byTerm("shibboleth").getAs[Long]("g2_micro") >
      byTerm("common").getAs[Long]("g2_micro"))
  }

  test("attribution: credits sum to 1e6 per conversion per model; direct handled") {
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // user A: view -> click -> purchase; user B: purchase with no touch
    val ev = Seq(
      ("A", ts(1), 1L, "view"), ("A", ts(2), 2L, "click"),
      ("A", ts(3), 3L, "purchase"),
      ("B", ts(1), 4L, "purchase"))
      .toDF("user_id", "t", "event_id", "event_type")
    val got = Sessions.attribution(ev, "user_id", "t", "event_id",
      "event_type", col("event_type") === "purchase")
      .orderBy("channel").collect()
    val m = got.map(r => r.getAs[String]("channel") ->
      (r.getAs[Long]("first_micro"), r.getAs[Long]("last_micro"),
        r.getAs[Long]("linear_micro"))).toMap
    assert(m("view") === ((1000000L, 0L, 500000L)))
    assert(m("click") === ((0L, 1000000L, 500000L)))
    assert(m("(direct)") === ((1000000L, 1000000L, 1000000L)))
    // books balance: every model sums to 1e6 * n_conversions
    Seq(m.values.map(_._1).sum, m.values.map(_._2).sum,
      m.values.map(_._3).sum).foreach(s => assert(s === 2000000L))
  }

  test("neymanAllocation: allocations sum to budget exactly; noisy strata earn more") {
    // A: big + noisy; B: same size, constant; C: small + noisy
    val df = (Seq.tabulate(100)(i => ("A", (i % 10).toDouble * 10)) ++
      Seq.fill(100)(("B", 5.0)) ++
      Seq.tabulate(20)(i => ("C", (i % 10).toDouble * 10)))
      .toDF("h", "v")
    val got = Stats.neymanAllocation(df, "h", "v", budget = 1000L)
      .orderBy("stratum").collect()
    assert(got.map(_.getAs[Long]("n_alloc")).sum === 1000L)
    val m = got.map(r => r.getAs[String]("stratum") ->
      r.getAs[Long]("n_alloc")).toMap
    assert(m("A") > m("C")) // same sigma, 5x the size
    assert(m("A") > m("B")) // same size, sigma 0 vs noisy
    assert(m("B") <= 1L)    // constant stratum: weight-1 screening only
  }

  test("simpsonAudit: a textbook reversal is flagged; aligned strata are not") {
    // classic 2-stratum reversal: within each stratum treatment wins,
    // pooled it loses (treatment concentrated in the hard stratum)
    val rows =
      Seq.fill(18)(("easy", false, true)) ++ Seq.fill(2)(("easy", false, false)) ++ // 90%
      Seq.fill(2)(("easy", true, true)) ++                                          // 100%
      Seq.fill(2)(("hard", false, false)) ++                                        // 0%
      Seq.fill(6)(("hard", true, true)) ++ Seq.fill(12)(("hard", true, false))      // 33%
    val df = rows.toDF("h", "tr", "y")
    val got = Stats.simpsonAudit(df, "h", "tr", "y").orderBy("stratum").collect()
    assert(got.forall(_.getAs[Int]("sign") === 1))        // treated wins within
    assert(got.forall(_.getAs[Int]("pooled_sign") === -1)) // loses pooled
    assert(got.forall(_.getAs[Boolean]("reversed")))
    assert(got.head.getAs[Long]("n_reversed") === 2L)
  }

  test("negativeSamplingTable: power damps frequency; wheel ends at 2^60") {
    val docs = Seq(Seq.fill(16)("big").mkString(" ") + " small").toDF("text")
    val got = Text.negativeSamplingTable(docs, topK = 10).orderBy("rank").collect()
    assert(got.map(_.getAs[String]("token")).toSeq === Seq("big", "small"))
    val pBig = got(0).getAs[Long]("p_micro")
    // raw share would be 16/17 = 941k; 16^.75 = 8 -> 8/9 = 888k
    assert(pBig === (8L * 1000000L) / 9L)
    // the last wheel boundary is exactly 2^60 (integer division of
    // cum == tot)
    assert(got.last.getAs[Long]("wheel_hi") === 1152921504606846976L)
  }

  test("deLongAucTest: tie-aware AUCs exact; identical scorers z=0; antisymmetric") {
    val rows = Seq(
      (10L, 1L, true), (9L, 5L, true), (8L, 1L, true), (2L, 5L, true),
      (1L, 1L, false), (2L, 5L, false), (3L, 1L, false), (7L, 5L, false))
      .toDF("sa", "sb", "y")
    val r = Classify.deLongAucTest(rows, "sa", "sb", "y").head()
    // hand: A wins 13.5 of 16 pairs (one tie at 2) = 0.84375
    assert(r.getAs[Long]("auc_a_micro") === 843750L)
    // identical scorers: covariance cancels variance exactly -> z = 0
    val same = Classify.deLongAucTest(
      rows.select(col("sa"), col("sa").as("sb2"), col("y")),
      "sa", "sb2", "y").head()
    assert(same.getAs[Long]("z_nano") === 0L)
    assert(same.getAs[Long]("auc_a_micro") === same.getAs[Long]("auc_b_micro"))
    // swapping the scorers flips the sign of z
    val fwd = Classify.deLongAucTest(rows, "sa", "sb", "y").head()
    val rev = Classify.deLongAucTest(rows, "sb", "sa", "y").head()
    assert(fwd.getAs[Long]("z_nano") === -rev.getAs[Long]("z_nano"))
  }

  test("linearCka: identity = 1; invariant to dimension permutation; zero-variance guarded") {
    val vecs = Seq.tabulate(12)(r =>
      (r.toLong, Array.tabulate(8)(i => math.sin(r * 8 + i + 1).toFloat).toSeq))
      .toDF("vec_id", "va")
    val same = vecs.withColumn("vb", col("va"))
    assert(Pca.linearCka(same, "va", "vb", "vec_id")
      .head().getAs[Long]("cka_nano") === 1000000000L)
    // permuting dimensions is orthogonal: CKA must stay ~1 (within
    // pico-quantization of the Frobenius terms)
    val perm = vecs.withColumn("vb", reverse(col("va")))
    assert(Pca.linearCka(perm, "va", "vb", "vec_id")
      .head().getAs[Long]("cka_nano") >= 999999000L)
    // a constant representation has zero centered variance: report 0
    val const = vecs.withColumn("vb",
      transform(col("va"), _ => lit(2.5f)))
    assert(Pca.linearCka(const, "va", "vb", "vec_id")
      .head().getAs[Long]("cka_nano") === 0L)
  }

  test("youdenThreshold: picks the separating cut on a hand ROC; tie goes high") {
    // scores: positives {5,4,3}, negatives {2,1} -> threshold 3 is
    // perfect (J = 1)
    val perfect = Seq((5L, true), (4L, true), (3L, true), (2L, false),
      (1L, false)).toDF("sc", "y")
    val r = Classify.youdenThreshold(perfect, "sc", "y").head()
    assert(r.getAs[Long]("threshold") === 3L)
    assert(r.getAs[Long]("j_micro") === 1000000L)
    assert(r.getAs[Long]("tp") === 3L && r.getAs[Long]("tn") === 2L)
    // overlap: pos {4,2}, neg {3,1}: J(4)=.5, J(3)=0, J(2)=.5, J(1)=0
    // -> tie between 4 and 2 resolves to the HIGHER threshold
    val tie = Seq((4L, true), (2L, true), (3L, false), (1L, false))
      .toDF("sc", "y")
    assert(Classify.youdenThreshold(tie, "sc", "y")
      .head().getAs[Long]("threshold") === 4L)
  }

  test("forwardChainingFolds: cumulative trains, next-bucket vals, no future leakage") {
    def ts(d: Int, h: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        d * 86400000L * 7 + h * 3600000L)
    val ev = (for { w <- 0 until 4; i <- 0 to w } yield (ts(w, i), w))
      .toDF("t", "tag")
    val got = Curate.forwardChainingFolds(ev, "t", "week")
      .orderBy("fold").collect()
    assert(got.length === 3) // 4 weeks -> 3 folds
    assert(got.map(_.getAs[Long]("n_train")).toSeq === Seq(1L, 3L, 6L))
    assert(got.map(_.getAs[Long]("n_val")).toSeq === Seq(2L, 3L, 4L))
    assert(got.forall(_.getAs[Boolean]("boundary_ok")))
  }

  test("riskCoverage: confident-correct prefix has zero risk; full coverage = plain error rate") {
    // 10 items: 6 confident & correct, 2 confident & wrong at lower
    // confidence, 2 unconfident correct
    val rows =
      Seq.tabulate(6)(i => (i.toLong, 0.99, true)) ++
      Seq(6L -> ((0.90, false)), 7L -> ((0.10, true))).map { case (i, (s, y)) => (i, s, y) } ++
      Seq((8L, 0.55, true), (9L, 0.45, false))
    val df = rows.toDF("id", "p", "y")
    val got = Classify.riskCoverage(df, "p", "y", "id")
      .orderBy("coverage_micro").collect()
    assert(got.length === 10)
    // first deciles (most confident = the 6 correct) carry zero risk
    assert(got.head.getAs[Long]("risk_micro") === 0L)
    // full coverage risk = overall error rate: errors are id 6 (pred 1,
    // y false) and id 7 (pred 0, y true) and id 9 (pred 0... 0.45 -> pred 0,
    // y false -> correct). So 2 errors of 10.
    assert(got.last.getAs[Long]("coverage_micro") === 1000000L)
    assert(got.last.getAs[Long]("risk_micro") === 200000L)
    // AURC identical on every row and bounded by the worst prefix risk
    assert(got.map(_.getAs[Long]("aurc_micro")).distinct.length === 1)
    assert(got.head.getAs[Long]("aurc_micro") <= 200000L)
  }

  test("lshPlanner: nested bands give monotone candidates; exact dups always recalled") {
    val docs = (Seq.tabulate(20)(i =>
      (i.toLong, s"unique document number $i about topic ${i % 7} with words $i")) ++
      Seq((100L, "unique document number 3 about topic 3 with words 3"))) // exact dup of 3
      .toDF("doc_id", "text")
    val got = Dedup.lshPlanner(docs, threshold = 0.9).orderBy(col("bands").desc)
      .collect()
    assert(got.length === 4)
    assert(got.map(_.getAs[Long]("n_truth")).distinct.length === 1)
    // band nesting: agreement on a wide band implies agreement on its
    // halves, so candidate sets shrink as bands shrink
    val cands = got.map(_.getAs[Long]("n_cand"))
    assert(cands.zip(cands.tail).forall { case (a, b) => a >= b })
    // an exact duplicate agrees on EVERY band: recalled at every config
    assert(got.forall(_.getAs[Long]("tp") >= 1L))
    // the analytic S-curve is monotone in band count too
    val sc = got.map(_.getAs[Long]("s_curve_nano"))
    assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    // with the sample covering the corpus, the full and sampled
    // candidate volumes coincide
    assert(got.forall(r =>
      r.getAs[Long]("n_cand_full") === r.getAs[Long]("n_cand")))
    spark.catalog.clearCache()
    // BOUNDED truth leg: a sample smaller than the corpus restricts the
    // quality universe (n_cand <= n_cand_full) while the band sweep
    // still counts full-corpus candidates
    val bounded = Dedup.lshPlanner(docs, threshold = 0.9, sampleDocs = 8)
      .orderBy(col("bands").desc).collect()
    assert(bounded.length === 4)
    assert(bounded.forall(r =>
      r.getAs[Long]("n_cand") <= r.getAs[Long]("n_cand_full")))
    // sampled precision stays a sample-universe ratio: tp <= n_cand
    assert(bounded.forall(r =>
      r.getAs[Long]("tp") <= r.getAs[Long]("n_cand")))
    spark.catalog.clearCache()
  }

  test("pairedBootstrap: dominant system wins every replicate; identical systems never do") {
    val items = Seq.tabulate(40)(i =>
      (i.toLong, 0.8 + (i % 5) * 0.01, 0.6 + (i % 5) * 0.01))
      .toDF("id", "a", "b")
    val r = Stats.pairedBootstrap(items, "a", "b", "id").head()
    assert(r.getAs[Long]("n_rows") === 40L)
    assert(r.getAs[Long]("delta_full_micro") === 200000L)
    assert(r.getAs[Long]("n_wins") === 32L)
    assert(r.getAs[Long]("win_micro") === 1000000L)
    assert(r.getAs[Long]("delta_lo_micro") === 200000L) // constant delta
    assert(r.getAs[Long]("delta_hi_micro") === 200000L)
    // identical systems: every replicate delta is exactly zero
    val same = Stats.pairedBootstrap(
      items.select(col("id"), col("a"), col("a").as("b2")),
      "a", "b2", "id").head()
    assert(same.getAs[Long]("n_wins") === 0L)
    assert(same.getAs[Long]("delta_full_micro") === 0L)
    assert(same.getAs[Long]("delta_lo_micro") === 0L)
    assert(same.getAs[Long]("delta_hi_micro") === 0L)
  }

  test("maxSimTopK: identical vector scores exactly parts; ranking follows parts matched") {
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 10).toFloat)
    // n2 = exact copy (sim 4), n3 = copy with last 32 dims zeroed out
    // except tiny noise (two token slots degrade)
    val w = v.take(32) ++ Array.fill(32)(0.001f)
    val df = Seq((1L, v.toSeq), (2L, v.toSeq), (3L, w.toSeq))
      .toDF("vec_id", "embedding")
    val got = Similarity.maxSimTopK(df, df.filter(col("vec_id") === 1L), k = 2)
      .orderBy("rank").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_id") === 2L)
    assert(got(0).getAs[Long]("maxsim_micro") === 4000000L)
    assert(got(1).getAs[Long]("n_id") === 3L)
    assert(got(1).getAs[Long]("maxsim_micro") < 4000000L)
    assert(got(1).getAs[Long]("maxsim_micro") > 2000000L) // first 2 tokens intact
  }

  test("maxSimTopK candidates: full candidate set equals the full scan; " +
      "a restricted set only ever scores its pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(60)
    val q = e.limit(4)
    val full = Similarity.maxSimTopK(e, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getAs[Long]("maxsim_micro"))).toSet
    // all-pairs candidates -> identical result (the prefilter is pure
    // pruning, never a scorer change)
    val allPairs = q.select(col("vec_id").as("q_id"))
      .crossJoin(e.select(col("vec_id").as("n_id")))
    val viaCand = Similarity.maxSimTopK(e, q, k = 3,
        candidates = Some(allPairs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getAs[Long]("maxsim_micro"))).toSet
    assert(viaCand === full, "all-pairs candidates diverged from full scan")
    // LSH candidates: output pairs are a subset of the candidate set
    val cand = Similarity.srpCandidates(e, q, nPlanes = 12, nTables = 8)
    val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Similarity.maxSimTopK(e, q, k = 3, candidates = Some(cand))
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
    assert(pruned.forall(candSet.contains),
      "prefiltered MaxSim emitted a pair outside its candidate set")
  }
}
