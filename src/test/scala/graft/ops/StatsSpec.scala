package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed cases for the inference-statistics family (Welch t,
  * Cohen's kappa, column MI), A-Priori pair mining, and the retrieval
  * eval harness.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prefixSum: matches the single-partition window on shuffled input") {
    val n = 500
    val df = spark.createDataFrame(
      scala.util.Random.shuffle((1 to n).toList).map(i => (i.toLong, i.toLong * 3, i.toLong % 7))
    ).toDF("id", "a", "b").repartition(7)
    val got = graft.ops.Stats.prefixSum(df, Seq(col("id").asc), Seq("a", "b"))
      .orderBy("id").collect()
    var (ca, cb) = (0L, 0L)
    (1 to n).zip(got).foreach { case (i, r) =>
      ca += i.toLong * 3; cb += i.toLong % 7
      assert(r.getAs[Long]("id") === i.toLong)
      assert(r.getAs[Long]("cum_a") === ca, s"cum_a at $i")
      assert(r.getAs[Long]("cum_b") === cb, s"cum_b at $i")
    }
  }

  test("welchTTest: hand-computed t, df, and significance") {
    // control [1,2,3]: mean 2, var 1 — treatment [2,4,6,8]: mean 5, var 20/3
    // se2 = 1/3 + (20/3)/4 = 2; t = (2-5)/sqrt(2); df = 4/(1/18 + 25/27)
    val df = Seq(("control", 1.0), ("control", 2.0), ("control", 3.0),
      ("treatment", 2.0), ("treatment", 4.0), ("treatment", 6.0), ("treatment", 8.0))
      .toDF("arm", "v")
    val r = Stats.welchTTest(df, "v", "arm", "control", "treatment").collect().head
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Double]("mean_a") === 2.0)
    assert(r.getAs[Double]("mean_b") === 5.0)
    assert(math.abs(r.getAs[Double]("var_a") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_b") - 20.0 / 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("t_stat") - (-3.0 / math.sqrt(2.0))) < 1e-9)
    assert(math.abs(r.getAs[Double]("df_welch") - 4.0 / (1.0 / 18.0 + 25.0 / 27.0)) < 1e-9)
    assert(r.getAs[Boolean]("significant")) // |t| = 2.121 > 1.96
  }

  test("cohenKappa: the textbook 2x2 example gives kappa 0.4") {
    // yes/yes 20, yes/no 5, no/yes 10, no/no 15:
    // p_o = 35/50 = 0.7; p_e = (25*30 + 25*20)/50^2 = 0.5; kappa = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val got = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .orderBy("label_a", "label_b").collect()
    assert(got.length === 4)
    val head = got.head
    assert(head.getAs[Long]("n") === 50L)
    assert(head.getAs[Double]("p_o") === 0.7)
    assert(head.getAs[Double]("p_e") === 0.5)
    assert(math.abs(head.getAs[Double]("kappa") - 0.4) < 1e-9)
    val cell = got.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_cell")).toMap
    assert(cell(("yes", "yes")) === 20L && cell(("no", "yes")) === 10L)
  }

  test("columnMi: identity columns give MI = H = ln 2 and NMI = 1; independence gives 0") {
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")).toDF("a", "b")
    val d = Stats.columnMi(dep, "a", "b").collect().head
    assert(math.abs(d.getAs[Double]("mi_total") - math.log(2.0)) < 1e-9)
    assert(math.abs(d.getAs[Double]("nmi") - 1.0) < 1e-9)
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = Stats.columnMi(ind, "a", "b").collect().head
    assert(math.abs(i.getAs[Double]("mi_total")) < 1e-9)
  }

  test("frequentPairs: A-Priori pruning and hand-computed support/confidence/lift") {
    // baskets: 1{A,B,C} 2{A,B} 3{A,B} 4{C,D}; minSupport 2
    // items: A3 B3 C2 D1(pruned); only pair (A,B) support 3 survives
    val df = Seq((1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"),
      (3, "A"), (3, "B"), (4, "C"), (4, "D")).toDF("basket", "item")
    val got = Itemsets.frequentPairs(df, "basket", "item", minSupport = 2L).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[String]("item_a") === "A" && r.getAs[String]("item_b") === "B")
    assert(r.getAs[Long]("n_ab") === 3L)
    assert(r.getAs[Double]("support") === 0.75) // 3/4 baskets
    assert(r.getAs[Double]("confidence") === 1.0) // 3/3
    assert(math.abs(r.getAs[Double]("lift") - 4.0 / 3.0) < 1e-12) // 3*4/(3*3)
  }

  test("sequentialPatterns: order matters, presence not occurrences, min support") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    // user 1: a b a b  (contains a>b twice but counts ONCE)
    // user 2: a b c    user 3: b a (reversed — contains b>a, NOT a>b... it does contain a? no a>b since order b,a)
    val ev = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "a"),
      (1L, ts(4), 4L, "b"),
      (2L, ts(1), 5L, "a"), (2L, ts(2), 6L, "b"), (2L, ts(3), 7L, "c"),
      (3L, ts(1), 8L, "b"), (3L, ts(2), 9L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Itemsets.sequentialPatterns(ev, "user_id", "ts", "event_id",
        "event_type", minSupport = 2L).collect()
      .map(r => r.getAs[String]("pattern") -> r.getAs[Long]("n_support")).toMap
    // a>b supported by users 1 and 2 (ONCE each despite user 1's repeat)
    assert(got("a>b") === 2L)
    // b>a appears for users 1 and 3
    assert(got("b>a") === 2L)
    // b>c only user 2 -> below min support, absent
    assert(!got.contains("b>c"))
    // ordered trigram a>b>a only user 1 -> absent at minSupport 2
    assert(!got.contains("a>b>a"))
  }

  test("retrievalMetrics: equal-length corpus ranks by tf — perfect ndcg and mrr") {
    // all dl equal => score strictly increases with tf => run == ideal
    val docs = Seq((1L, "t t t"), (2L, "t t x"), (3L, "t x y"), (4L, "z z z"))
      .toDF("doc_id", "text")
    val r = Search.retrievalMetrics(docs, Seq("t"), k = 10).collect().head
    assert(r.getAs[Long]("n_retrieved") === 3L) // d4 has no 't'
    assert(r.getAs[Long]("n_rel_total") === 2L) // tf >= 2: d1, d2
    assert(r.getAs[Long]("n_rel_at_k") === 2L)
    assert(r.getAs[Double]("ndcg") === 1.0)
    assert(r.getAs[Double]("mrr") === 1.0)
    assert(r.getAs[Double]("p_at_k") === 0.2)
    assert(r.getAs[Double]("r_at_k") === 1.0)
  }

  test("retrievalMetrics: length normalization can demote a relevant doc — ndcg < 1, mrr = 1/2") {
    // d1: tf 1, dl 1 outranks d2: tf 2, dl 20 under BM25 length norm
    val filler = (1 to 18).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, "t"), (2L, s"t t $filler")).toDF("doc_id", "text")
    val r = Search.retrievalMetrics(docs, Seq("t"), k = 10).collect().head
    assert(r.getAs[Double]("mrr") === 0.5) // first rel-2 doc at rank 2
    val ndcg = r.getAs[Double]("ndcg")
    assert(ndcg > 0.0 && ndcg < 1.0) // run order != ideal order
    assert(r.getAs[Long]("n_rel_total") === 1L)
  }

  test("zipfFit: a perfect two-point Zipf pair fits slope -1") {
    // counts 4 and 2 at ranks 1 and 2: slope = (ln2 - ln4)/(ln2 - ln1) = -1
    val docs = Seq((1L, "a a a a b b")).toDF("doc_id", "text")
    val got = Text.zipfFit(docs, fitN = 2, topK = 2).orderBy("rank").collect()
    assert(got.length === 2)
    assert(got(0).getAs[String]("term") === "a" && got(0).getAs[Long]("cnt") === 4L)
    assert(math.abs(got(0).getAs[Double]("slope") - (-1.0)) < 1e-6)
    // intercept = mean(y) - slope*mean(x) = ln4 at rank 1 for a perfect fit
    assert(math.abs(got(0).getAs[Double]("intercept") - math.log(4.0)) < 1e-6)
  }

  test("embeddingDrift: orthogonal mean shift — deltas exact, mean cosine 0; identity gives 0 drift, cosine 1") {
    val old = Seq((1L, Seq(0.9f, 0.1f)), (2L, Seq(1.1f, -0.1f)), (3L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val nw = Seq((4L, Seq(0.1f, 0.9f)), (5L, Seq(-0.1f, 1.1f)), (6L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingDrift(old, nw).orderBy("dim").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Double]("mean_old") === 1.0 && got(0).getAs[Double]("mean_new") === 0.0)
    assert(got(0).getAs[Double]("delta") === -1.0)
    assert(got(1).getAs[Double]("delta") === 1.0)
    assert(got(0).getAs[Double]("mean_cosine") === 0.0) // means are orthogonal
    val same = Similarity.embeddingDrift(old, old).orderBy("dim").collect()
    assert(same.forall(r => r.getAs[Double]("delta") === 0.0))
    assert(same.forall(r => math.abs(r.getAs[Double]("mean_cosine") - 1.0) < 1e-9))
  }

  test("benfordAudit: digit from integer cents (sub-1 values included), exact counts, chi2 positive") {
    // 1.0->100->'1', 1.5->150->'1', 2.3->230->'2', 9.99->999->'9', 0.05->5->'5'
    val df = Seq(1.0, 1.5, 2.3, 9.99, 0.05, -3.0).toDF("v") // negatives excluded
    val got = Stats.benfordAudit(df, "v").orderBy("digit").collect()
    val counts = got.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n_d")).toMap
    assert(counts === Map(1 -> 2L, 2 -> 1L, 5 -> 1L, 9 -> 1L))
    assert(got.head.getAs[Long]("n") === 5L)
    assert(got.head.getAs[Double]("share") === 0.4)
    assert(math.abs(got.head.getAs[Double]("expected_p") - math.log10(2.0)) < 1e-9)
    assert(got.head.getAs[Double]("chi2") > 0.0)
  }

  test("gini: uniform values give 0, full concentration gives (n-1)/n") {
    val eq = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("id", "x")
    assert(Stats.gini(eq, "x", "id").collect().head.getAs[Double]("gini") === 0.0)
    val conc = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 10L)).toDF("id", "x")
    val r = Stats.gini(conc, "x", "id").collect().head
    assert(r.getAs[Double]("gini") === 0.75) // (n-1)/n
    assert(r.getAs[Long]("total_q") === 10L)
  }

  test("conformalGate: tau is the exact k-th order statistic; coverage counted on the held-out split") {
    val cal = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val ev = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val r = Stats.conformalGate(cal, ev, "s", "id", alpha = 0.2).collect().head
    assert(r.getAs[Long]("k") === 2L) // floor(0.2 * 11)
    assert(r.getAs[Double]("tau") === 2.0)
    assert(r.getAs[Long]("n_covered") === 9L) // scores >= 2.0
    assert(r.getAs[Double]("coverage") === 0.9)
    assert(r.getAs[Boolean]("coverage_ok"))
  }

  test("seasonalNaiveBacktest: bucket means, 24h-ago prediction, hand-computed MAE/MAPE") {
    def at(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:$m%02d:00")
    val df = Seq(
      ("a", at(0, 10), 1.0), ("a", at(0, 20), 2.0), // h0 mean 1.5
      ("a", at(24, 5), 2.0),                        // h24: pred 1.5, err 0.5
      ("a", at(48, 5), 2.0)                         // h48: pred 2.0, err 0
    ).toDF("k", "ts", "v")
    val r = graft.ops.TimeSeries.seasonalNaiveBacktest(df, "k", "ts", "v")
      .collect().head
    assert(r.getAs[Long]("n_buckets") === 3L)
    assert(r.getAs[Long]("n_forecast") === 2L)
    assert(r.getAs[Double]("mae") === 0.25) // (0.5 + 0)/2
    assert(math.abs(r.getAs[Double]("mape") - 0.125) < 1e-9) // (0.5/2.0 + 0)/2
  }

  test("sortedNeighborhoodPairs: only within-window sort neighbors pair, verified by distance") {
    val df = Seq((1L, "aa"), (2L, "ab"), (3L, "zz"), (4L, "ac")).toDF("id", "s")
    val got = Fuzzy.sortedNeighborhoodPairs(df, "s", "id", window = 2, maxDist = 1)
      .collect().map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"))).toSet
    // sort order aa,ab,ac,zz — adjacent pairs only, (ac,zz) fails lev<=1
    assert(got === Set(("aa", "ab"), ("ab", "ac")))
  }

  test("phraseSearch: consecutive positions only, counts and first position exact; 3-term phrases chain") {
    val docs = Seq(
      (1L, "x table hash y table hash"), // 2 occurrences, first at pos 1
      (2L, "table z hash"),              // gap — no match
      (3L, "hash table")                 // reversed — no match
    ).toDF("doc_id", "text")
    val got = Search.phraseSearch(docs, Seq("table", "hash")).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("doc_id") === 1L)
    assert(got.head.getAs[Long]("n_occurrences") === 2L)
    assert(got.head.getAs[Long]("first_pos") === 1L)
    val tri = Search.phraseSearch(
      Seq((1L, "a b c a b c"), (2L, "a b x c")).toDF("doc_id", "text"),
      Seq("a", "b", "c")).collect()
    assert(tri.length === 1 && tri.head.getAs[Long]("n_occurrences") === 2L)
  }

  test("decayedTopK: one-halflife-old events contribute exactly half; ties break by key") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00")
    val df = Seq(
      ("a", ts(48)),              // at anchor: weight 1.0
      ("b", ts(24)), ("b", ts(24)), // one halflife old: 0.5 + 0.5 = 1.0
      ("c", ts(0))                // two halflives: 0.25
    ).toDF("k", "ts")
    val got = Search.decayedTopK(df, "k", "ts", halfLifeHours = 24.0, k = 10)
      .orderBy(col("decayed_pico").desc, col("key").asc).collect()
    assert(got.map(_.getAs[String]("key")).toSeq === Seq("a", "b", "c"))
    assert(got(0).getAs[Double]("decayed") === 1.0)
    assert(got(1).getAs[Double]("decayed") === 1.0)
    assert(got(2).getAs[Double]("decayed") === 0.25)
    assert(got(1).getAs[Long]("n_events") === 2L)
  }

  test("fellegiSunterScores: u from exact pair counts, agreement/disagreement weights hand-computed") {
    // f1 values a,a,b,c over 4 records: u = 2·1/(4·3) = 1/6
    val recs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("id", "f1")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id1", "id2")
    val got = Fuzzy.fellegiSunterScores(recs, "id", Seq("f1"), cands, m = 0.9)
      .orderBy("id1", "id2").collect()
    val u = 2.0 / 12.0
    assert(got(0).getAs[Boolean]("agree_f1"))
    assert(math.abs(got(0).getAs[Double]("weight") - math.log(0.9 / u)) < 1e-6)
    assert(got(0).getAs[Boolean]("is_match")) // ln(5.4) > 0
    assert(!got(1).getAs[Boolean]("agree_f1"))
    assert(math.abs(got(1).getAs[Double]("weight") -
      math.log((1.0 - 0.9) / (1.0 - u))) < 1e-6)
    assert(!got(1).getAs[Boolean]("is_match")) // ln(0.12) < 0
  }

  test("withReadability: hand-counted words/sentences/syllables and the exact Flesch forms") {
    // "the cat sat. it sat!" -> 5 words, 2 sentences, 5 syllable runs
    val df = Seq((1L, "the cat sat. it sat!")).toDF("doc_id", "text")
    val r = Text.withReadability(df).collect().head
    assert(r.getAs[Long]("rd_words") === 5L)
    assert(r.getAs[Long]("rd_sentences") === 2L)
    assert(r.getAs[Long]("rd_syllables") === 5L)
    val ease = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0)
    assert(math.abs(r.getAs[Double]("flesch_ease") - ease) < 1e-9)
    val grade = 0.39 * (5.0 / 2.0) + 11.8 * (5.0 / 5.0) - 15.59
    assert(math.abs(r.getAs[Double]("fk_grade") - grade) < 1e-9)
    // punctuation-free text floors sentences at 1 instead of dividing by 0
    val bare = Text.withReadability(Seq((2L, "no end")).toDF("doc_id", "text"))
      .collect().head
    assert(bare.getAs[Long]("rd_sentences") === 1L)
  }

  test("gridDensityClusters: adjacent dense cells merge, distant ones don't, sparse points are noise") {
    def pts(n: Int, x: Float, y: Float, base: Long) =
      (0 until n).map(i => (base + i, Seq(x, y)))
    val df = (pts(12, 0.01f, 0.01f, 0L) ++ pts(12, 0.06f, 0.01f, 100L) ++
      pts(12, 0.5f, 0.5f, 200L) ++ pts(3, -0.3f, -0.3f, 300L))
      .toDF("vec_id", "embedding")
    val got = Similarity.gridDensityClusters(df, cellSize = 0.05, minPts = 10)
      .orderBy("cluster_id").collect()
    val noise = got.filter(_.getAs[Long]("cluster_id") == -1L)
    val clusters = got.filter(_.getAs[Long]("cluster_id") != -1L)
    assert(clusters.length === 2) // merged adjacent pair + the far cell
    assert(clusters.map(_.getAs[Long]("n_points")).sorted.toSeq === Seq(12L, 24L))
    assert(clusters.find(_.getAs[Long]("n_points") == 24L).get.getAs[Long]("n_cells") === 2L)
    assert(noise.head.getAs[Long]("n_points") === 3L)
  }

  test("nucleusVocab: integer top-p rule includes the crossing successor and no more") {
    // context 'a': successors b x2, c x1 (total 3)
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val wide = Text.nucleusVocab(df, pNum = 9, pDenom = 10, minTotal = 1)
      .filter(col("t1") === "a").collect().head
    assert(wide.getAs[Long]("nucleus_n") === 2L) // 2/3 < 0.9: c also needed
    assert(wide.getAs[Double]("nucleus_mass") === 1.0)
    val tight = Text.nucleusVocab(df, pNum = 1, pDenom = 2, minTotal = 1)
      .filter(col("t1") === "a").collect().head
    assert(tight.getAs[Long]("nucleus_n") === 1L) // b alone crosses 1/2
    assert(math.abs(tight.getAs[Double]("nucleus_mass") - 2.0 / 3.0) < 1e-9)
  }

  test("classificationReport: hand-computed per-class P/R/F1, accuracy, macro-F1") {
    // labels a,a,b,b vs preds a,b,b,b
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")).toDF("label", "pred")
    val got = Stats.classificationReport(df, "pred", "label").orderBy("cls").collect()
    val a = got(0); val b = got(1)
    assert(a.getAs[String]("cls") === "a" && a.getAs[Long]("tp") === 1L
      && a.getAs[Long]("fp") === 0L && a.getAs[Long]("fn") === 1L)
    assert(a.getAs[Double]("precision") === 1.0 && a.getAs[Double]("recall") === 0.5)
    assert(math.abs(a.getAs[Double]("f1") - 2.0 / 3.0) < 1e-9)
    assert(math.abs(b.getAs[Double]("f1") - 0.8) < 1e-9) // 4/(4+1+0)
    assert(a.getAs[Double]("accuracy") === 0.75)
    assert(math.abs(a.getAs[Double]("macro_f1") - (2.0 / 3.0 + 0.8) / 2.0) < 1e-6)
    val (lo, hi) = (a.getAs[Double]("wilson_lo"), a.getAs[Double]("wilson_hi"))
    assert(lo > 0.0 && lo < 0.75 && hi > 0.75 && hi < 1.0) // CI brackets accuracy
  }

  test("fleissKappa: perfect agreement gives 1; the textbook 2-item case gives 0.25") {
    val perfect = Seq((1L, "x", "x", "x"), (2L, "y", "y", "y"))
      .toDF("id", "r1", "r2", "r3")
    val p = Stats.fleissKappa(perfect, "id", Seq("r1", "r2", "r3")).collect().head
    assert(p.getAs[Double]("kappa") === 1.0)
    // item1 (x,x,y), item2 (y,y,y): p_bar 2/3, p_e 5/9, kappa 1/4
    val mixed = Seq((1L, "x", "x", "y"), (2L, "y", "y", "y"))
      .toDF("id", "r1", "r2", "r3")
    val m = Stats.fleissKappa(mixed, "id", Seq("r1", "r2", "r3"))
      .orderBy("cat").collect()
    assert(math.abs(m.head.getAs[Double]("p_bar") - 2.0 / 3.0) < 1e-9)
    assert(math.abs(m.head.getAs[Double]("p_e") - 5.0 / 9.0) < 1e-6)
    assert(math.abs(m.head.getAs[Double]("kappa") - 0.25) < 1e-6)
    assert(m.map(_.getAs[String]("cat")).toSeq === Seq("x", "y"))
  }

  test("calibrationReport: perfectly calibrated bins give ECE 0; a wrong classifier doesn't") {
    // bin 2 (score .25): half positive -> rate .5 vs pred .25 => gap .25
    // bin 7 (score .75): all positive -> rate 1.0 vs pred .75 => gap .25
    val df = Seq((0.25, 1L), (0.25, 0L), (0.75, 1L), (0.75, 1L))
      .toDF("s", "y")
    val got = Curate.calibrationReport(df, "s", "y").orderBy("bucket").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Int]("bucket") === 2 && got(1).getAs[Int]("bucket") === 7)
    assert(got(0).getAs[Double]("rate") === 0.5)
    assert(got(0).getAs[Double]("mean_pred") === 0.25)
    assert(math.abs(got(0).getAs[Double]("ece") - 0.25) < 1e-9) // .5*.25 + .5*.25
    // calibrated: predicted 0.5, observed half positive -> ECE 0
    val cal = Curate.calibrationReport(
      Seq((0.5, 1L), (0.5, 0L)).toDF("s", "y"), "s", "y").collect()
    assert(math.abs(cal.head.getAs[Double]("ece")) < 1e-9)
    // score 1.0 lands in the LAST bucket, not an 11th
    val edge = Curate.calibrationReport(
      Seq((1.0, 1L)).toDF("s", "y"), "s", "y").collect()
    assert(edge.head.getAs[Int]("bucket") === 9)
  }

  test("quantileNormalize: a hot-running source maps onto the pooled distribution") {
    // source A scores run 10x hotter than B but have the same shape:
    // after normalization, equal within-group ranks get equal values
    val df = Seq(
      (1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
      (4L, "B", 1.0), (5L, "B", 2.0), (6L, "B", 3.0)
    ).toDF("id", "src", "score")
    val got = Curate.quantileNormalize(df, "score", "src", "id")
      .orderBy("id").collect()
    val norm = got.map(r => r.getAs[Long]("id") -> r.getAs[Double]("norm_value")).toMap
    // pooled sorted: 1,2,3,10,20,30 (N=6); q in {0,.5,1} -> pooled idx {0,3,5}
    assert(norm(1L) === 1.0 && norm(4L) === 1.0)   // both group minima
    assert(norm(2L) === 10.0 && norm(5L) === 10.0) // both medians -> idx round(2.5)=3
    assert(norm(3L) === 30.0 && norm(6L) === 30.0) // both maxima
  }

  test("dpCountRelease: deterministic draws, exact counts, noise scales as 1/epsilon") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(70)("b")).toDF("k")
    val r1 = Curate.dpCountRelease(df, "k", epsilon = 1.0).orderBy("key").collect()
    val r1b = Curate.dpCountRelease(df, "k", epsilon = 1.0).orderBy("key").collect()
    assert(r1.map(_.toSeq).toSeq === r1b.map(_.toSeq).toSeq) // reproducible release
    assert(r1.map(r => r.getAs[String]("key") -> r.getAs[Long]("true_n")).toMap
      === Map("a" -> 30L, "b" -> 70L))
    val r2 = Curate.dpCountRelease(df, "k", epsilon = 2.0).orderBy("key").collect()
    r1.zip(r2).foreach { case (a, b) =>
      val n1 = a.getAs[Double]("noisy_n") - a.getAs[Long]("true_n")
      val n2 = b.getAs[Double]("noisy_n") - b.getAs[Long]("true_n")
      assert(math.abs(n1 - 2.0 * n2) < 2e-6) // same uniform draw, scale 1/eps
      assert(n1 != 0.0) // the mechanism actually perturbs
    }
  }

  test("kCore early-exit at the fixpoint matches the full fixed-round peel") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("src", "dst")
    val a = Graph.kCore(e, k = 2, rounds = 8).orderBy("v").collect().map(_.toSeq).toSeq
    val b = Graph.kCore(e, k = 2, rounds = 100).orderBy("v").collect().map(_.toSeq).toSeq
    assert(a === b) // converged rounds are no-ops
  }

  test("JaroWinkler kernel: textbook values, 0.7 boost threshold, empties, window-0 swaps") {
    def jw(a: String, b: String) =
      graft.functions.JaroWinkler.similarity(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(jw("", "") === 0.0 && jw("a", "") === 0.0) // DuckDB's empty convention
    assert(jw("ab", "ba") === 0.0) // window 0 admits only same-position matches
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6) // jaro 0.6 <= 0.7: NO prefix boost
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444444445) < 1e-12) // integer half-transpositions
    assert(jw("same", "same") === 1.0)
    // column path (native expression under TestSpark's extensions)
    val got = Seq(("martha", "marhta")).toDF("a", "b")
      .select(Fuzzy.jaroWinklerCol(col("a"), col("b")).as("jw")).collect().head
    assert(math.abs(got.getAs[Double]("jw") - 0.9611111111111111) < 1e-12)
  }

  test("audienceOverlap: hand-computed intersection/jaccard; zero-overlap pairs absent; sketch bounds hold") {
    val df = Seq(("s1", 1L), ("s1", 2L), ("s1", 3L), ("s2", 2L), ("s2", 3L),
      ("s2", 4L), ("s3", 9L)).toDF("seg", "m")
    val got = Stats.audienceOverlap(df, "seg", "m").collect()
    assert(got.length === 1) // only (s1,s2) overlaps; s3 pairs never appear
    val r = got.head
    assert(r.getAs[String]("seg_a") === "s1" && r.getAs[String]("seg_b") === "s2")
    assert(r.getAs[Long]("n_inter") === 2L && r.getAs[Long]("n_union") === 4L)
    assert(r.getAs[Double]("jaccard") === 0.5)
    assert(r.getAs[Boolean]("sketch_inter_ok") && r.getAs[Boolean]("sketch_union_ok"))
  }

  test("ksTest: hand-computed D on two small samples") {
    // A=[1,2,3], B=[2,3,4]: sup |F_A - F_B| = 1/3 (numerator 3 over n_a*n_b=9)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val r = Stats.ksTest(df, "v", "g", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Long]("d_num") === 3L)
    assert(math.abs(r.getAs[Double]("d_stat") - 1.0 / 3.0) < 1e-9)
    // crit = 1.358*sqrt(6/9) ≈ 1.109 > D → not rejected
    assert(!r.getAs[Boolean]("reject"))
  }

  test("mannWhitney: tie-corrected U and z on a hand case") {
    // A=[1,2,3], B=[2,3,4]: avg ranks 1, 2.5, 4.5 → R_A=8, U_A=2
    // ties: two groups of 2 → T=12; var = 9*(210-12)/360 = 4.95
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("arm", "v")
    val r = Stats.mannWhitney(df, "v", "arm", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("u_a") === 2.0)
    assert(r.getAs[Long]("tie_term") === 12L)
    assert(math.abs(r.getAs[Double]("z_stat") - (-2.5 / math.sqrt(4.95))) < 1e-6)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("captureRecapture: hand-computed Chapman estimate and exact counts") {
    val a = (1L to 60L).map(Tuple1(_)).toDF("id")
    val b = (41L to 100L).map(Tuple1(_)).toDF("id")
    val r = Stats.captureRecapture(a, b).collect().head
    assert(r.getAs[Long]("n1") === 60L && r.getAs[Long]("n2") === 60L)
    assert(r.getAs[Long]("m") === 20L && r.getAs[Long]("n_true") === 100L)
    val nHat = 61.0 * 61.0 / 21.0 - 1.0
    assert(math.abs(r.getAs[Double]("n_hat") - math.floor(nHat * 1e3 + 0.5) / 1e3) < 1e-12)
    val se = math.sqrt(61.0 * 61.0 * 40.0 * 40.0 / (21.0 * 21.0 * 22.0))
    assert(math.abs(r.getAs[Double]("se") - math.floor(se * 1e6 + 0.5) / 1e6) < 1e-12)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("n_hat"))
    assert(r.getAs[Double]("ci_hi") > r.getAs[Double]("n_hat"))
  }

  test("experimentHealth: balanced arms pass SRM; hand-checked Wilson and OR") {
    // 40 control (10 conv) vs 40 treatment (20 conv), values constant
    val rows = (1 to 40).map(i => ("control", if (i <= 10) 200.0 else 50.0)) ++
      (1 to 40).map(i => ("treatment", if (i <= 20) 200.0 else 50.0))
    val r = Stats.experimentHealth(rows.toDF("arm", "v"), "v", "arm",
      "control", "treatment", convThreshold = 100.0).collect().head
    assert(r.getAs[Long]("n_a") === 40L && r.getAs[Long]("n_b") === 40L)
    assert(r.getAs[Double]("srm_chi2") === 0.0 && r.getAs[Boolean]("srm_ok"))
    assert(r.getAs[Double]("rate_a") === 0.25 && r.getAs[Double]("rate_b") === 0.5)
    // OR = (20·30)/(10·20) = 3
    assert(r.getAs[Double]("odds_ratio") === 3.0)
    // Wilson bounds bracket the rates and stay in [0,1]
    assert(r.getAs[Double]("rate_a_lo") < 0.25 && r.getAs[Double]("rate_a_hi") > 0.25)
    assert(r.getAs[Double]("rate_b_lo") < 0.5 && r.getAs[Double]("rate_b_hi") > 0.5)
    assert(r.getAs[Double]("rate_a_lo") > 0.0 && r.getAs[Double]("rate_b_hi") < 1.0)
    assert(r.getAs[Double]("mde_abs") > 0.0)
    // a 90/10 split must FAIL SRM
    val skew = (1 to 90).map(_ => ("control", 1.0)) ++ (1 to 10).map(_ => ("treatment", 1.0))
    val s2 = Stats.experimentHealth(skew.toDF("arm", "v"), "v", "arm",
      "control", "treatment", 0.5).collect().head
    assert(!s2.getAs[Boolean]("srm_ok"))
    assert(s2.getAs[Double]("srm_chi2") === 64.0) // (90-50)²/50·2
    assert(s2.getAs[Double]("odds_ratio").isNaN) // universal conversion: OR undefined
  }

  test("kaplanMeier: hand-computed curve with censoring; all-censored is empty") {
    // deaths at t=2 (d=2, n=5) and t=4 (d=1, n=3); censored at 10, 30
    // S(2) = 3/5 = 0.6; S(4) = 0.6 * 2/3 = 0.4 — exact integer folds
    val lab = Seq((2L, false), (2L, false), (4L, false), (10L, true),
      (30L, true)).toDF("t", "cens")
    val got = Stats.kaplanMeier(lab).orderBy("t_day").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("t_day") === 2L)
    assert(got(0).getAs[Long]("n_risk") === 5L)
    assert(got(0).getAs[Long]("n_deaths") === 2L)
    assert(got(0).getAs[Long]("survival_micro") === 600000L) // S=0.6
    assert(got(1).getAs[Long]("t_day") === 4L)
    assert(got(1).getAs[Long]("n_risk") === 3L)
    assert(got(1).getAs[Long]("survival_micro") === 400000L) // S=0.4
    // every subject censored → no death times → empty curve, no crash
    val allCens = Seq((1L, true), (2L, true)).toDF("t", "cens")
    assert(Stats.kaplanMeier(allCens).count() === 0L)
  }

  test("theilSen: robust to an outlier OLS would chase") {
    // y = 2x + 1 at x = 1..7 except a wild outlier at x = 6 —
    // paired slopes (0,3),(1,4),(2,5): [2, 2, 331.67] → median 2;
    // median residual (y − 2x) stays 1
    val pts = ((1 to 7).map { i =>
      val y = if (i == 6) 1000L else 2L * i + 1
      (i * 1000000L, y * 1000000L, i.toLong)
    }).toDF("x_q", "y_q", "tb")
    val r = Stats.theilSen(pts).collect().head
    assert(r.getAs[Long]("n") === 7L && r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    spark.catalog.clearCache()
  }

  test("olsNormal2: recovers an exact plane with r2 = 1") {
    // y = 2 + 3·x1 + 5·x2 on four non-collinear points
    val pts = Seq((1L, 0L), (0L, 1L), (2L, 1L), (1L, 3L))
      .map { case (x1, x2) => (2L + 3L * x1 + 5L * x2, x1, x2) }
    val r = Stats.olsNormal2(pts.toDF("y_q", "x1", "x2")).collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("b0") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
  }

  test("olsNormal2: matches the hand-solved normal equations with noise") {
    // y = x1 + residuals on points where the fit is NOT exact
    val df = Seq((1L, 1L, 0L), (3L, 2L, 0L), (2L, 3L, 1L), (5L, 4L, 1L))
      .toDF("y_q", "x1", "x2")
    val r = Stats.olsNormal2(df).collect().head
    // solved by hand via numpy-style elimination of X^T X b = X^T y:
    // moments: n=4 sy=11 sx1=10 sx2=2 sx11=30 sx12=7 sx22=2 sx1y=33 sx2y=7 syy=39
    // det(A) = 4(60-49) - 10(20-14) + 2(70-60) = 4; closed form gives
    // b = (-1.75, 2.5, -3.5) (checked against numpy lstsq)
    val detA = 4.0
    val b0 = (11.0 * (60 - 49) - 10 * (33 * 2 - 7 * 7) + 2 * (33 * 7 - 30 * 7)) / detA
    val b1 = (4.0 * (33 * 2 - 7 * 7) - 11 * (10 * 2 - 7 * 2) + 2 * (10 * 7 - 33 * 2)) / detA
    val b2 = (4.0 * (30 * 7 - 33 * 7) - 10 * (10 * 7 - 33 * 2) + 11 * (10 * 7 - 30 * 2)) / detA
    assert(math.abs(r.getAs[Double]("b0") - b0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1") - b1) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") - b2) < 1e-9)
    val sse = 39.0 - b0 * 11 - b1 * 33 - b2 * 7
    val sst = 39.0 - 11.0 * 11.0 / 4.0
    assert(math.abs(r.getAs[Double]("r2") - (1.0 - sse / sst)) < 1e-12)
  }

  test("paretoSkyline: matches brute-force dominance on random points") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong, rnd.nextInt(8).toLong))
    val df = pts.toDF("id", "x", "y", "z").repartition(5)
    val got = Stats.paretoSkyline(df, "id", Seq("x", "y", "z"))
      .collect().map(_.getAs[Long]("id")).toSet
    val brute = pts.filter { p =>
      !pts.exists(q => q._2 >= p._2 && q._3 >= p._3 && q._4 >= p._4 &&
        (q._2 > p._2 || q._3 > p._3 || q._4 > p._4))
    }.map(_._1).toSet
    assert(got === brute)
    spark.catalog.clearCache()
  }

  test("paretoSkyline: hand case — duplicates both survive, dominated drop") {
    val df = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 4L, 6L), (4L, 3L, 3L),
      (5L, 6L, 1L)).toDF("id", "a", "b")
    val got = Stats.paretoSkyline(df, "id", Seq("a", "b"))
      .collect().map(_.getAs[Long]("id")).toSet
    // 4 is dominated by 1/2; equal points 1,2 both stay; 3 and 5 are
    // incomparable corners
    assert(got === Set(1L, 2L, 3L, 5L))
    spark.catalog.clearCache()
  }

  test("cupedAdjust: perfectly predictive covariate zeroes adjusted variance") {
    // y = x exactly → θ=1, var_adj=0, reduction=1, and the CUPED lift
    // collapses to 0 because the arms' y-gap is fully explained by x
    val df = Seq(("control", 1L, 1L), ("control", 2L, 2L),
      ("treatment", 3L, 3L), ("treatment", 4L, 4L)).toDF("arm", "x_q", "y_q")
    val r = Stats.cupedAdjust(df).collect().head
    assert(r.getAs[Long]("n_c") === 2L && r.getAs[Long]("n_t") === 2L)
    assert(r.getAs[Double]("theta") === 1.0)
    assert(r.getAs[Double]("var_adj") === 0.0)
    assert(r.getAs[Double]("var_reduction") === 1.0)
    assert(r.getAs[Double]("diff_cuped") === 0.0)
    assert(math.abs(r.getAs[Double]("diff_raw") - 2e-6) < 1e-12) // micro units
  }

  test("cupedAdjust: independent covariate leaves the lift untouched") {
    // x constant → cov=0 would divide by zero var(x); use x uncorrelated:
    // x = (1,2,1,2) against y = (10,10,20,20): cov(x,y)=0 → θ=0
    val df = Seq(("control", 1L, 10L), ("control", 2L, 10L),
      ("treatment", 1L, 20L), ("treatment", 2L, 20L)).toDF("arm", "x_q", "y_q")
    val r = Stats.cupedAdjust(df).collect().head
    assert(r.getAs[Double]("theta") === 0.0)
    assert(r.getAs[Double]("diff_cuped") === r.getAs[Double]("diff_raw"))
    assert(r.getAs[Double]("var_reduction") === 0.0)
  }

  test("poissonBootstrap: constant metric pins every replicate to it; weights behave") {
    val df = (1 to 800).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val rows = Stats.poissonBootstrap(df, "id", "v", reps = 16).collect()
    assert(rows.length === 16)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_b") === 5.0)    // constant metric: exact
      assert(r.getAs[Double]("est_mean") === 5.0)
      assert(r.getAs[Double]("se_boot") === 0.0)
      assert(r.getAs[Double]("ci_lo") === 5.0 && r.getAs[Double]("ci_hi") === 5.0)
      // Poisson(1) effective n concentrates around n (±4σ ≈ ±113)
      val nEff = r.getAs[Long]("n_eff")
      assert(nEff > 800 - 120 && nEff < 800 + 120, s"n_eff $nEff")
    }
  }

  test("corrMatrix: perfectly correlated / anti-correlated columns") {
    val df = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0))
      .toDF("x", "y", "z")
    val got = Stats.corrMatrix(df, Seq("x", "y", "z"))
      .orderBy("col_a", "col_b").collect()
    assert(got.length === 3)
    val m = got.map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) ->
      r.getAs[Double]("corr")).toMap
    assert(m(("x", "y")) === 1.0)
    assert(m(("x", "z")) === -1.0)
    assert(m(("y", "z")) === -1.0)
    assert(got.forall(_.getAs[Long]("n") === 3L))
  }

  test("stratifiedAte: hand-built confounder, single-arm stratum dropped") {
    import spark.implicits._
    // stratum A: treated mean 10, control mean 8 (diff 2, 4 units)
    // stratum B: treated mean 20, control mean 19 (diff 1, 4 units)
    // stratum C: control only (2 units) -> dropped
    val units = Seq(
      ("A", true, 10.0), ("A", true, 10.0), ("A", false, 8.0), ("A", false, 8.0),
      ("B", true, 20.0), ("B", true, 20.0), ("B", false, 19.0), ("B", false, 19.0),
      ("C", false, 5.0), ("C", false, 7.0)
    ).toDF("stratum", "treated", "outcome")
    val got = Stats.stratifiedAte(units, "stratum", "treated", "outcome")
      .orderBy("stratum").collect()
    assert(got.length === 2)
    assert(got.forall(_.getAs[Long]("n_strata_used") === 2L))
    assert(got.forall(_.getAs[Long]("n_strata_dropped") === 1L))
    assert(got.forall(_.getAs[Long]("n_units_dropped") === 2L))
    // ate = (4·2 + 4·1)/8 = 1.5
    assert(got.head.getAs[Long]("ate_micro") === 1500000L)
    val a = got.find(_.getAs[String]("stratum") == "A").get
    assert(a.getAs[Long]("diff_micro") === 2000000L)
    // naive diff over the used strata: treated mean 15, control 13.5
    assert(got.head.getAs[Long]("naive_diff_micro") === 1500000L)
  }

  test("stratifiedAte: confounding separates ate from naive_diff") {
    import spark.implicits._
    // treated concentrate in the high-outcome stratum: naive diff is
    // inflated, the stratified estimate recovers the within-stratum 1.0
    val units = Seq.tabulate(40) { i =>
      val hi = i < 20
      val treated = if (hi) i < 16 else i < 24 // 16/4 vs 4/16 split
      val base = if (hi) 100.0 else 10.0
      (if (hi) "hi" else "lo", treated, base + (if (treated) 1.0 else 0.0))
    }.toDF("stratum", "treated", "outcome")
    val got = Stats.stratifiedAte(units, "stratum", "treated", "outcome")
      .collect()
    assert(got.head.getAs[Long]("ate_micro") === 1000000L)
    assert(got.head.getAs[Long]("naive_diff_micro") > 30000000L) // confounded
  }

  test("jarqueBera: symmetric two-point mass has skew 0, kurt -2; normal-ish passes") {
    import spark.implicits._
    val twoPoint = (1 to 100).map(i => ("a", if (i % 2 == 0) 1.0 else -1.0))
      .toDF("g", "v")
    val r = Stats.jarqueBera(twoPoint, "v", "g").head()
    assert(r.getAs[Long]("n") === 100L)
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-9)
    assert(math.abs(r.getAs[Double]("ex_kurtosis") - (-2.0)) < 1e-9)
    // JB = 100/6 · (0 + 4/4) = 16.67 > 5.991: two-point mass is not normal
    assert(r.getAs[Boolean]("reject_normal"))
    // a symmetric triangular-ish sample: skew exactly 0, and the JB
    // statistic obeys its defining identity n/6·(S² + K²/4)
    val tri = (-20 to 20).flatMap(k => Seq.fill(21 - math.abs(k))(("t", k / 10.0)))
      .toDF("g", "v")
    val t = Stats.jarqueBera(tri, "v", "g").head()
    assert(math.abs(t.getAs[Double]("skewness")) < 1e-9)
    val n = t.getAs[Long]("n").toDouble
    val s = t.getAs[Double]("skewness"); val k = t.getAs[Double]("ex_kurtosis")
    assert(math.abs(t.getAs[Double]("jb_stat") - n / 6.0 * (s * s + k * k / 4.0)) < 1e-6)
  }

  test("groupSequential: a massive effect crosses every OBF look; boundaries shrink to z_alpha") {
    import spark.implicits._
    def ts(w: Int, i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        w * 7L * 86400000L + i * 3600000L)
    // 3 weeks x (8 control around 0.5, 8 treatment around 10.5)
    val rows = for {
      w <- 0 until 3; i <- 0 until 8; arm <- Seq("control", "treatment")
    } yield (ts(w, i), arm,
      (if (arm == "treatment") 10.0 else 0.0) + (i % 2).toDouble)
    val df = rows.toDF("ts", "arm", "v")
    val got = Stats.groupSequential(df, "ts", "arm", "v",
      "control", "treatment").orderBy("k").collect()
    assert(got.length === 3)
    assert(got.forall(_.getAs[Long]("n_looks") === 3L))
    // boundary at look k = 1.96·sqrt(3/k); final look = 1.96
    assert(math.abs(got(0).getAs[Long]("boundary_micro") / 1e6 -
      1.96 * math.sqrt(3.0)) < 1e-5)
    assert(got(2).getAs[Long]("boundary_micro") === 1960000L)
    // diff = 10 exactly at every look; z enormous -> crossed everywhere
    got.foreach { r =>
      assert(r.getAs[Long]("diff_micro") === 10000000L)
      assert(r.getAs[Boolean]("crossed"))
      assert(r.getAs[Long]("z_micro") > r.getAs[Long]("boundary_micro"))
    }
    // cumulative ns: 8, 16, 24 per arm
    assert(got.map(_.getAs[Long]("n_t")).toSeq === Seq(8L, 16L, 24L))
  }

  test("groupSequential: a bucket missing from one arm drops only that look, not all later ones") {
    import spark.implicits._
    def ts(w: Int, i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        w * 7L * 86400000L + i * 3600000L)
    // weeks 0,1,2 treatment; control SKIPS week 1 — per-arm ranks would
    // diverge at k=2 and the old (w,k) join dropped week 2's look too
    val rows =
      (for { w <- 0 until 3; i <- 0 until 4 }
        yield (ts(w, i), "treatment", 10.0 + (i % 2))) ++
      (for { w <- Seq(0, 2); i <- 0 until 4 }
        yield (ts(w, i), "control", 0.0 + (i % 2)))
    val got = Stats.groupSequential(rows.toDF("ts", "arm", "v"),
      "ts", "arm", "v", "control", "treatment").orderBy("k").collect()
    // looks at weeks 0 and 2 survive; k re-ranked densely over them
    assert(got.length === 2)
    assert(got.map(_.getAs[Long]("k")).toSeq === Seq(1L, 2L))
    assert(got.forall(_.getAs[Long]("n_looks") === 2L))
    // week-2 look's cumulative treatment n INCLUDES the orphan week 1
    assert(got(1).getAs[Long]("n_t") === 12L)
    assert(got(1).getAs[Long]("n_c") === 8L)
  }

  test("kmvThetaSetOps: small sets are exact; estimators within bounds when engaged") {
    import spark.implicits._
    // sets below k are EXACT: A = {1..10}, B = {6..15}: inter 5, aonly 5
    val small = ((1 to 10).map(i => ("A", i.toLong)) ++
      (6 to 15).map(i => ("B", i.toLong))).toDF("seg", "m")
    val r = Stats.kmvThetaSetOps(small, "seg", "m", k = 64).head()
    assert(r.getAs[Long]("n_a") === 10L)
    assert(r.getAs[Long]("n_inter") === 5L)
    assert(r.getAs[Long]("est_a_micro") === 10000000L)
    assert(r.getAs[Long]("est_union_micro") === 15000000L)
    assert(r.getAs[Long]("est_inter_micro") === 5000000L)
    assert(r.getAs[Long]("est_anotb_micro") === 5000000L)
    assert(r.getAs[Boolean]("ok_union") && r.getAs[Boolean]("ok_inter") &&
      r.getAs[Boolean]("ok_anotb"))
    // engaged estimators (n >> k): bounds hold, A-not-B sums with inter
    val big = ((1 to 900).map(i => ("A", i.toLong)) ++
      (301 to 1200).map(i => ("B", i.toLong))).toDF("seg", "m")
    val rb = Stats.kmvThetaSetOps(big, "seg", "m", k = 64).head()
    assert(rb.getAs[Boolean]("ok_union") && rb.getAs[Boolean]("ok_inter") &&
      rb.getAs[Boolean]("ok_anotb"))
    // a + (a-not-b) decomposition: est_inter + est_anotb ≈ est_a scale
    val sumAb = (rb.getAs[Long]("est_inter_micro") +
      rb.getAs[Long]("est_anotb_micro")) / 1e6
    assert(math.abs(sumAb - 900.0) < 0.5 * 900.0)
  }

  test("kendallTauB: perfect agreement 1, reversal -1, ties adjusted") {
    import spark.implicits._
    val up = Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L))
      .toDF("k", "x", "y")
    assert(Stats.kendallTauB(up, "k", "x", "y")
      .head().getAs[Long]("tau_b_nano") === 1000000000L)
    val down = Seq(("a", 1L, 30L), ("b", 2L, 20L), ("c", 3L, 10L))
      .toDF("k", "x", "y")
    assert(Stats.kendallTauB(down, "k", "x", "y")
      .head().getAs[Long]("tau_b_nano") === -1000000000L)
    // one x-tie: C=2, D=0, n0=3, tx=1, ty=0 -> tau = 2/sqrt(2*3)
    val tied = Seq(("a", 1L, 10L), ("b", 1L, 20L), ("c", 2L, 30L))
      .toDF("k", "x", "y")
    val r = Stats.kendallTauB(tied, "k", "x", "y").head()
    assert(r.getAs[Long]("concordant") === 2L)
    assert(r.getAs[Long]("ties_x") === 1L)
    assert(math.abs(r.getAs[Long]("tau_b_nano") / 1e9 -
      2.0 / math.sqrt(6.0)) < 1e-8)
  }

  test("groupSequential: empty after arm filter returns an empty table, no NPE") {
    import spark.implicits._
    val df = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x", 1.0))
      .toDF("ts", "arm", "v")
    assert(Stats.groupSequential(df, "ts", "arm", "v",
      "control", "treatment").count() === 0L)
  }

  test("theilsU: deterministic direction scores 1, independent scores 0, asymmetry shows") {
    import spark.implicits._
    // b determines a (a = parity of b) but a does not determine b
    val det = (1 to 80).map(i => (s"p${i % 2}", s"b${i % 8}")).toDF("a", "b")
    val r = Stats.theilsU(det, "a", "b").head()
    assert(math.abs(r.getAs[Double]("u_a_given_b") - 1.0) < 1e-6)
    assert(r.getAs[Double]("u_b_given_a") < 0.5) // 1 of 3 bits explained
    assert(r.getAs[Double]("u_b_given_a") > 0.3)
    // exact independence: both directions 0
    val ind = (1 to 80).map(i => (s"p${i % 2}", s"q${(i / 2) % 2}"))
      .toDF("a", "b")
    val r0 = Stats.theilsU(ind, "a", "b").head()
    assert(math.abs(r0.getAs[Double]("u_a_given_b")) < 1e-6)
    assert(math.abs(r0.getAs[Double]("u_b_given_a")) < 1e-6)
    // marginal entropy sanity: H(a) = ln 2 for the fair binary label
    assert(math.abs(r0.getAs[Double]("h_a") - math.log(2.0)) < 1e-6)
  }

  test("diffInDiff: recovers the constructed effect net of the shared trend") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val pre = ts("2024-01-05 00:00:00"); val post = ts("2024-01-20 00:00:00")
    // shared trend +1; treatment adds +3 on top -> DiD = 3
    val rows = (0 until 20).flatMap { i =>
      val jit = (i % 2).toDouble * 0.5 // variance so SE > 0
      Seq((pre, false, 1.0 + jit), (post, false, 2.0 + jit),
        (pre, true, 3.0 + jit), (post, true, 7.0 + jit))
    }
    val got = Stats.diffInDiff(rows.toDF("ts", "treated", "v"),
      "ts", "treated", "v", "2024-01-16 00:00:00").head()
    assert(got.getAs[Long]("n_ctrl_pre") === 20L)
    assert(math.abs(got.getAs[Double]("mean_treat_post") - 7.25) < 1e-6)
    assert(math.abs(got.getAs[Double]("did") - 3.0) < 1e-6)
    assert(got.getAs[Boolean]("significant"))
    // identical trends, no effect: DiD = 0, not significant
    val none = (0 until 20).flatMap { i =>
      val jit = (i % 2).toDouble * 0.5
      Seq((pre, false, 1.0 + jit), (post, false, 2.0 + jit),
        (pre, true, 5.0 + jit), (post, true, 6.0 + jit))
    }
    val g0 = Stats.diffInDiff(none.toDF("ts", "treated", "v"),
      "ts", "treated", "v", "2024-01-16 00:00:00").head()
    assert(math.abs(g0.getAs[Double]("did")) < 1e-9)
    assert(!g0.getAs[Boolean]("significant"))
  }

  test("sinkhornOt: opposite point masses cost the full circular distance; identical cost 0") {
    import spark.implicits._
    // all A-mass at bin 0, all B-mass at bin 12: the only feasible
    // coupling moves everything 12 bins -> cost = 12 at any epsilon
    val far = (1 to 5).flatMap(_ => Seq((0L, true), (12L, false)))
      .toDF("hod", "isa")
    val r = Stats.sinkhornOt(far, "hod", "isa", bins = 24, eps = 4.0,
      iters = 6).head()
    assert(r.getAs[Long]("n_a") === 5L && r.getAs[Long]("n_b") === 5L)
    assert(math.abs(r.getAs[Double]("ot_cost") - 12.0) < 1e-6)
    assert(r.getAs[Double]("row_marginal_err") < 1e-9)
    // identical point masses: the coupling is a single diagonal cell
    val same = (1 to 5).flatMap(_ => Seq((3L, true), (3L, false)))
      .toDF("hod", "isa")
    val s0 = Stats.sinkhornOt(same, "hod", "isa", 24, 4.0, 6).head()
    assert(math.abs(s0.getAs[Double]("ot_cost")) < 1e-9)
    // spread histograms: cost strictly positive, marginals converged
    val mix = ((1 to 20).map(i => ((i % 24).toLong, true)) ++
      (1 to 20).map(i => (((i + 6) % 24).toLong, false))).toDF("hod", "isa")
    val m = Stats.sinkhornOt(mix, "hod", "isa", 24, 4.0, 6).head()
    assert(m.getAs[Double]("ot_cost") > 0.0)
    assert(m.getAs[Double]("row_marginal_err") < 0.05)
  }

  test("wasserstein1: hand cases — shifted point masses and identical samples") {
    import spark.implicits._
    // A = {0,0}, B = {10,10}: W1 = 10 exactly
    val shift = Seq((0L, true), (0L, true), (10L, false), (10L, false))
      .toDF("v", "a")
    val r = Stats.wasserstein1(shift, "v", "a").head()
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(math.abs(r.getAs[Double]("wasserstein1") - 10.0) < 1e-9)
    // identical samples: W1 = 0
    val same = Seq((1L, true), (5L, true), (1L, false), (5L, false))
      .toDF("v", "a")
    assert(Stats.wasserstein1(same, "v", "a").head()
      .getAs[Double]("wasserstein1") === 0.0)
    // A = {0,10}, B = {5,5}: |F_A - F_B| = 1/2 on [0,5) and [5,10) -> W1 = 5
    val mix = Seq((0L, true), (10L, true), (5L, false), (5L, false))
      .toDF("v", "a")
    assert(math.abs(Stats.wasserstein1(mix, "v", "a").head()
      .getAs[Double]("wasserstein1") - 5.0) < 1e-9)
  }

  test("proportionFunnel: extreme groups flag, the on-rate group does not") {
    import spark.implicits._
    val rows = (1 to 100).flatMap(i => Seq(
      ("A", true), ("B", false), ("C", i <= 50)))
    val got = Stats.proportionFunnel(rows.toDF("g", "p"), "g", "p")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got("A").getAs[Boolean]("flag_high") && !got("A").getAs[Boolean]("flag_low"))
    assert(got("B").getAs[Boolean]("flag_low") && !got("B").getAs[Boolean]("flag_high"))
    assert(!got("C").getAs[Boolean]("flag_low") && !got("C").getAs[Boolean]("flag_high"))
    assert(got.values.forall(_.getAs[Double]("global_rate") === 0.5))
    // Wilson interval brackets the rate and stays inside [0, 1]
    got.values.foreach { r =>
      assert(r.getAs[Double]("wilson_lo") >= 0.0 && r.getAs[Double]("wilson_hi") <= 1.0)
      assert(r.getAs[Double]("wilson_lo") <= r.getAs[Double]("rate") + 1e-9)
      assert(r.getAs[Double]("wilson_hi") >= r.getAs[Double]("rate") - 1e-9)
    }
  }

  test("cramersV: identical columns give V=1, independent columns V~0, zero cells counted") {
    import spark.implicits._
    val df = (1 to 80).map { i =>
      val a = if (i % 2 == 0) "x" else "y"
      (a, a, if (i % 4 < 2) "p" else "q")
    }.toDF("c1", "c2", "c3")
    val got = Stats.cramersV(df,
      Seq(("c1", col("c1")), ("c2", col("c2")), ("c3", col("c3"))))
      .collect().map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) -> r).toMap
    val same = got(("c1", "c2"))
    assert(math.abs(same.getAs[Double]("cramers_v") - 1.0) < 1e-6)
    assert(same.getAs[Long]("dof") === 1L)
    assert(same.getAs[Long]("n") === 80L)
    // c1 alternates by parity, c3 by i%4: exactly independent
    val ind = got(("c1", "c3"))
    assert(math.abs(ind.getAs[Double]("cramers_v")) < 1e-6)
    assert(math.abs(ind.getAs[Double]("chi2")) < 1e-6)
  }

  test("nelsonAalen: hand case 2/3 then +1, exact micro display") {
    val lt = Seq((1L, false), (1L, false), (2L, false)).toDF("t", "cens")
    val got = Stats.nelsonAalen(lt).orderBy("t_day").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_risk") === 3L)
    assert(got(0).getAs[Long]("hazard_micro") === 666667L) // 2/3
    assert(got(1).getAs[Long]("n_risk") === 1L)
    assert(got(1).getAs[Long]("hazard_micro") === 1666667L) // 2/3 + 1
  }

  test("icc21: perfect item agreement = 1, pure rater effect = 0") {
    val perfect = Seq(("A", "r1", 1.0), ("A", "r2", 1.0),
      ("B", "r1", 2.0), ("B", "r2", 2.0)).toDF("it", "ra", "y")
    val p = Stats.icc21(perfect, "it", "ra", "y").head()
    assert(p.getAs[Long]("n_items") === 2L)
    assert(p.getAs[Long]("icc21_nano") === 1000000000L)
    // raters disagree systematically, items identical -> no item signal
    val raterOnly = Seq(("A", "r1", 1.0), ("A", "r2", 2.0),
      ("B", "r1", 1.0), ("B", "r2", 2.0)).toDF("it", "ra", "y")
    val r = Stats.icc21(raterOnly, "it", "ra", "y").head()
    assert(r.getAs[Long]("icc21_nano") === 0L)
    // incomplete items are dropped and counted
    val withHole = perfect.unionByName(Seq(("C", "r1", 9.0)).toDF("it", "ra", "y"))
    assert(Stats.icc21(withHole, "it", "ra", "y").head()
      .getAs[Long]("n_dropped") === 1L)
  }

  test("mondrianConformal: per-group quantile thresholds and exact coverage") {
    // group A: cal scores 1..9 -> k = max(1, (10*0.1e6) div 1e6) = 1,
    // tau = smallest = 1e6; eval 5 scores all >= 1 -> coverage 1.
    // group B: cal scores 10, 20 -> k = 1, tau = 10e6; eval {5, 15} ->
    // coverage 1/2.
    val cal = ((1 to 9).map(i => ("A", i.toDouble, i.toLong)) ++
      Seq(("B", 10.0, 100L), ("B", 20.0, 101L))).toDF("g", "s", "id")
    val ev = ((11 to 15).map(i => ("A", i.toDouble, i.toLong)) ++
      Seq(("B", 5.0, 200L), ("B", 15.0, 201L))).toDF("g", "s", "id")
    val got = Stats.mondrianConformal(cal, ev, "g", "s", "id")
      .orderBy("grp").collect()
    assert(got(0).getAs[Long]("k") === 1L)
    assert(got(0).getAs[Long]("tau_micro") === 1000000L)
    assert(got(0).getAs[Long]("coverage_micro") === 1000000L)
    assert(got(1).getAs[Long]("tau_micro") === 10000000L)
    assert(got(1).getAs[Long]("coverage_micro") === 500000L)
  }

  test("bestOfN: exact order-statistic expectation on a hand case") {
    // one prompt, scores 1, 2, 3: E[max of 1] = 2, E[max of 2] =
    // (0*1 + 1*2 + 2*3)/C(3,2) = 8/3, E[max of 3] = 3
    val df = Seq((0L, 1.0, 1L), (0L, 2.0, 2L), (0L, 3.0, 3L))
      .toDF("p", "s", "id")
    val got = Stats.bestOfN(df, "p", "s", "id", maxN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) === 2000000L)
    assert(got(2L) === 2666666L) // floor(8e6 / 3)
    assert(got(3L) === 3000000L)
  }

  test("bestOfN: curve is monotone in n; short prompts cap at their own N") {
    val rows = (0L until 40L).map(i => (i % 8, (i * 37 % 11).toDouble, i))
    val short = Seq((100L, 5.0, 1000L), (100L, 7.0, 1001L)) // N_p = 2
    val got = Stats.bestOfN((rows ++ short).toDF("p", "s", "id"),
      "p", "s", "id", maxN = 5).orderBy("n").collect()
    val means = got.map(_.getLong(2))
    assert(means.sliding(2).forall(w => w(0) <= w(1)))
    // n = 1, 2 include the short prompt; n >= 3 only the 8 full ones
    val prompts = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prompts(1L) === 9L && prompts(2L) === 9L && prompts(3L) === 8L)
  }

  test("bestOfN: a group past the exact-long binomial cap fails loudly") {
    // cap for maxN = 5 is ~4100: 4200 candidates in one prompt would
    // silently overflow the long weight fold — must raise instead
    val big = (0L until 4200L).map(i => (0L, (i % 97).toDouble, i))
      .toDF("p", "s", "id")
    val e = intercept[Exception] {
      Stats.bestOfN(big, "p", "s", "id", maxN = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("exceeds the exact-long binomial cap")))
    // well under the cap: unaffected
    val ok = (0L until 100L).map(i => (0L, i.toDouble, i)).toDF("p", "s", "id")
    assert(Stats.bestOfN(ok, "p", "s", "id", maxN = 5).count() === 5L)
  }
}
