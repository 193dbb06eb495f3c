package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the trained-classifier family beyond the oracle's value
  * checks: probability-mass sanity of the learned NB model, argmax
  * dominance on separable toy data, and the Gaussian model's moment
  * identities.
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("NB model: per-class token likelihoods + unseen mass sum to 1") {
    val m = Classify.naiveBayesTrain(docs)
    // Σ_observed P(t|c) + (V - observed_c) · P(unseen|c) = 1 exactly
    val vocab = m.tokenLikes.select("__tok").distinct().count().toDouble
    val perClass = m.tokenLikes.groupBy("__cls")
      .agg(sum(exp(col("__log_like"))).as("obs_mass"),
        count(lit(1)).cast("double").as("n_obs"))
      .join(m.classStats, "__cls")
      .withColumn("total",
        col("obs_mass") + (lit(vocab) - col("n_obs")) * exp(col("__log_default")))
      .select("total").as[Double].collect()
    assert(perClass.nonEmpty)
    perClass.foreach(t => assert(math.abs(t - 1.0) < 1e-9, s"mass $t != 1"))
  }

  test("NB classify: separable toy corpus is perfectly recovered") {
    val toy = Seq(
      (1L, "apple banana apple fruit", "fruit"),
      (2L, "banana apple apple sweet", "fruit"),
      (3L, "carrot potato onion root", "veg"),
      (4L, "potato carrot soup onion", "veg"),
      (5L, "apple banana fruit salad", "fruit"),
      (6L, "onion soup root potato", "veg")
    ).toDF("doc_id", "text", "source")
    val m = Classify.naiveBayesTrain(toy)
    val pred = Classify.naiveBayesClassify(toy, m)
      .join(toy.select("doc_id", "source"), "doc_id")
    assert(pred.filter(col("pred") =!= col("source")).isEmpty,
      "separable classes must self-classify perfectly")
  }

  test("NB classify: unlabeled corpus scores; empty docs get prior-only argmax") {
    val m = Classify.naiveBayesTrain(docs)
    // production shape: the scoring corpus has NO label column, and one
    // doc tokenizes to nothing — it must survive with a prior-only score
    val unlabeled = Seq((900L, "the quick fox"), (901L, ""), (902L, "   "))
      .toDF("doc_id", "text")
    val out = Classify.naiveBayesClassify(unlabeled, m).collect()
    assert(out.length === 3, "every doc, including empty ones, is scored")
    val priorArgmax = m.classStats
      .orderBy(col("__log_prior").desc, col("__cls").asc)
      .select("__cls").first().getString(0)
    out.filter(r => r.getLong(0) >= 901L).foreach { r =>
      assert(r.getString(1) === priorArgmax,
        "zero-token docs must classify to the max-prior class")
    }
  }

  test("NB classify: argmax beats every alternative score it emitted") {
    val m = Classify.naiveBayesTrain(docs)
    val out = Classify.naiveBayesClassify(docs, m)
    // one row per doc, total preserved
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
  }

  test("Gaussian NB: moments match the definition and scoring is total") {
    val model = Classify.gaussianNbTrain(embs)
    val labels = embs.select(col("label").cast("long")).distinct()
      .as[Long].collect().sorted
    assert(model.map(_.cls).toSeq == labels.toSeq, "one model row per class")
    // priors' exp sums to 1
    val priorMass = model.map(m => math.exp(m.logPrior)).sum
    assert(math.abs(priorMass - 1.0) < 1e-9)
    // spot-check one (class, dim) mean against a direct aggregate
    val c0 = model.head
    val mu0 = embs.filter(col("label").cast("long") === c0.cls)
      .select(avg(element_at(col("embedding").cast("array<double>"), 1)))
      .head().getDouble(0)
    assert(math.abs(c0.mu(0) - mu0) < 1e-12)
    val out = Classify.gaussianNbClassify(embs, model)
    assert(out.count() === embs.count())
    // a generative model trained on separable synthetic labels should
    // beat the 1/|C| prior baseline by a wide margin
    val acc = out.filter(col("correct")).count().toDouble / out.count()
    assert(acc > 2.0 / labels.length,
      s"accuracy $acc suspiciously close to random")
  }

  test("logisticGd: first-step closed form; separable data fits perfectly") {
    val feats = Seq(
      (1L, 1.0, 2.0, 1.0), (2L, 1.0, 3.0, 1.0), (3L, 1.0, 2.5, 1.0),
      (4L, 1.0, -2.0, 0.0), (5L, 1.0, -3.0, 0.0), (6L, 1.0, -2.5, 0.0)
    ).toDF("id", "f0", "f1", "y")
    val fc = Seq("f0", "f1")
    // step 1 from zero init: sigma(0) = 0.5, grad_j = sum(x_j*(0.5-y))/n
    val w1 = Classify.logisticGd(feats, fc, "y", steps = 1)
    val rows = Seq((1.0, 2.0, 1.0), (1.0, 3.0, 1.0), (1.0, 2.5, 1.0),
      (1.0, -2.0, 0.0), (1.0, -3.0, 0.0), (1.0, -2.5, 0.0))
    val g0 = rows.map { case (f0, _, y) => f0 * (0.5 - y) }.sum / 6.0
    val g1 = rows.map { case (_, f1, y) => f1 * (0.5 - y) }.sum / 6.0
    assert(math.abs(w1(0) - (-g0)) < 1e-12 && math.abs(w1(1) - (-g1)) < 1e-12)
    // separable by sign(f1): a few more steps classify perfectly
    val w = Classify.logisticGd(feats, fc, "y", steps = 5)
    val scored = Classify.logisticScore(feats, fc, w)
    assert(scored.filter((col("pred") === true) =!= (col("y") === 1.0)).isEmpty,
      "separable toy set must be perfectly classified")
  }

  test("ivfIndex + ivfQueryIndex === fused ivfTopK (bit-identical)") {
    val cents = Similarity.fixedCentroids(16, 64)
    val fused = Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 8),
      k = 5, centroids = cents)
    val idx = Similarity.ivfIndex(embs, cents)
    val split = Similarity.ivfQueryIndex(idx, embs.filter(col("vec_id") < 8),
      k = 5, nProbe = 6, centroids = cents)
    assert(split.exceptAll(fused).isEmpty && fused.exceptAll(split).isEmpty,
      "split build/query path must equal the fused path exactly")
  }

  test("shuffleQualityReport: per-shard rows, shares in [0,1], KL >= 0") {
    val rep = Curate.shuffleQualityReport(
      Curate.epochShuffle(docs, nShards = 4, seed = 1L)).cache()
    assert(rep.count() === 4)
    val bad = rep.filter(col("max_share") < 0 || col("max_share") > 1 ||
      col("kl") < -1e-12 || col("entropy") < -1e-12)
    assert(bad.isEmpty, "entropy/KL/shares out of range")
    // doc conservation across shards
    val total = rep.agg(sum("n_docs")).head().getLong(0)
    assert(total === docs.count())
  }

  test("bradleyTerry: dominance orders strengths; 2:1 odds recover ~2/3 win prob") {
    val s = spark
    import s.implicits._
    // a beats b 8/8, b beats c 8/8, a beats c 8/8 → strict strength order
    val chain = (Seq.fill(8)(("a", "b")) ++ Seq.fill(8)(("b", "c")) ++
      Seq.fill(8)(("a", "c"))).toDF("w", "l")
    val st = Classify.bradleyTerry(chain, "w", "l").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(st("a") > st("b") && st("b") > st("c"))
    // x beats y 20 times, y beats x 10 → fitted P(x>y) ≈ 2/3
    val odds = (Seq.fill(20)(("x", "y")) ++ Seq.fill(10)(("y", "x"))).toDF("w", "l")
    val so = Classify.bradleyTerry(odds, "w", "l").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    val p = so("x") / (so("x") + so("y"))
    assert(math.abs(p - 2.0 / 3.0) < 0.01, s"fitted P(x beats y) = $p")
    // determinism: the integer-arithmetic fit is bit-identical on rerun
    val again = Classify.bradleyTerry(odds, "w", "l").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(again === so)
  }

  test("classifierReport: hand-computed per-class PRF1 with macro/micro rows") {
    val s = spark
    import s.implicits._
    // truth a: 3 (2 right, 1 → b); truth b: 2 (1 right, 1 → c);
    // truth c: 1 (0 right, → a)
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"),
      ("c", "a")).toDF("truth", "pred")
    val got = Classify.classifierReport(df, "truth", "pred")
      .orderBy("cls").collect()
      .map(r => r.getAs[String]("cls") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("tp") === 2L && a.getAs[Long]("fp") === 1L &&
      a.getAs[Long]("fn") === 1L && a.getAs[Long]("support") === 3L)
    assert(math.abs(a.getAs[Double]("precision") - 2.0 / 3.0) < 1e-6)
    assert(math.abs(a.getAs[Double]("recall") - 2.0 / 3.0) < 1e-6)
    assert(math.abs(a.getAs[Double]("f1") - 2.0 / 3.0) < 1e-6) // 4/(4+1+1)=2/3
    val c = got("c")
    assert(c.getAs[Double]("precision") === 0.0 && c.getAs[Double]("recall") === 0.0)
    // micro = accuracy = 3/6
    assert(got("__micro").getAs[Double]("precision") === 0.5)
    assert(got("__micro").getAs[Long]("support") === 6L)
    // macro = mean of per-class metrics over 3 classes
    val macroP = got("__macro").getAs[Double]("precision")
    assert(math.abs(macroP - (2.0 / 3.0 + 0.5 + 0.0) / 3.0) < 1e-6)
    spark.catalog.clearCache()
  }

  test("bradleyTerryDistributed: bit-identical to the collect fit; uncapped past 64 items") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val pairs = (1 to 200).map { _ =>
      val a = s"it${rnd.nextInt(30)}"; val b = s"it${rnd.nextInt(30)}"
      if (a <= b) (a, b) else (b, a)
    }.filter(p => p._1 != p._2).toDF("w", "l")
    val ref = Classify.bradleyTerry(pairs, "w", "l", iters = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val dist = Classify.bradleyTerryDistributed(pairs, "w", "l", iters = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(dist === ref) // exact, not approximate: integer floor state
    // >64 items: the collect fit refuses, the distributed fit runs
    val big = (0 until 100).map(i => (s"x$i", s"x${(i + 1) % 100}")).toDF("w", "l")
    assertThrows[IllegalArgumentException](
      Classify.bradleyTerry(big, "w", "l", iters = 2))
    val fit = Classify.bradleyTerryDistributed(big, "w", "l", iters = 2)
    assert(fit.count() === 100L)
    // a pure cycle is symmetric: every item fits the same strength
    val ss = fit.select("strength").distinct().count()
    assert(ss === 1L, "cycle symmetry broken")
    spark.catalog.clearCache()
  }

  test("rocPrReport: hand-checked tie case and perfect separation") {
    val s = spark
    import s.implicits._
    // scores [1,1,0], labels [T,F,F]: AUC = (1 + 0.5)/2 = 0.75, AP = 0.5
    val tied = Seq((1L, true), (1L, false), (0L, false)).toDF("sc", "y")
    val r = Classify.rocPrReport(tied, "sc", "y").head()
    assert(r.getAs[Long]("n") === 3L && r.getAs[Long]("n_pos") === 1L)
    assert(math.abs(r.getAs[Double]("auc") - 0.75) < 1e-9)
    assert(math.abs(r.getAs[Double]("avg_precision") - 0.5) < 1e-9)
    // perfect separation: AUC = AP = 1
    val sep = Seq((5L, true), (4L, true), (1L, false), (0L, false))
      .toDF("sc", "y")
    val p = Classify.rocPrReport(sep, "sc", "y").head()
    assert(math.abs(p.getAs[Double]("auc") - 1.0) < 1e-9)
    assert(math.abs(p.getAs[Double]("avg_precision") - 1.0) < 1e-9)
    // label-free scorer (all same score): AUC = 0.5 by tie correction
    val flat = Seq((2L, true), (2L, false), (2L, true), (2L, false))
      .toDF("sc", "y")
    val f = Classify.rocPrReport(flat, "sc", "y").head()
    assert(math.abs(f.getAs[Double]("auc") - 0.5) < 1e-9)
  }

  test("gainsLiftReport: perfect ranking concentrates positives in early deciles") {
    val s = spark
    import s.implicits._
    // 100 rows, 20 positives with the 20 highest scores
    val rows = (1 to 100).map(i => (100L - i, i.toLong, i <= 20))
      .toDF("sc", "id", "y")
    val rep = Classify.gainsLiftReport(rows, "sc", "y", "id", bins = 10)
      .orderBy("decile").collect()
    assert(rep.length === 10)
    assert(rep.map(_.getAs[Long]("n")).sum === 100L)
    // deciles 1-2 hold all positives: gain hits 1.0 at decile 2
    assert(math.abs(rep(0).getAs[Double]("gain") - 0.5) < 1e-9)
    assert(math.abs(rep(1).getAs[Double]("gain") - 1.0) < 1e-9)
    // decile-1 lift = precision/base = 1.0/0.2 = 5
    assert(math.abs(rep(0).getAs[Double]("lift") - 5.0) < 1e-9)
    // the final cumulative lift is 1 by construction
    assert(math.abs(rep(9).getAs[Double]("lift") - 1.0) < 1e-9)
    // gains are monotone non-decreasing
    val gains = rep.map(_.getAs[Double]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => b >= a })
  }

  test("woeIvReport: bins partition the rows; IV total non-negative and matches term sum") {
    val s = spark
    import s.implicits._
    val rows = (1 to 200)
      .map(i => (i.toLong, i.toLong, i % 3 == 0 || i > 150)).toDF("sc", "id", "y")
    val rep = Classify.woeIvReport(rows, "sc", "y", "id", bins = 5).collect()
    assert(rep.length === 5)
    assert(rep.map(_.getAs[Long]("n")).sum === 200L)
    val ivTotal = rep.head.getAs[Double]("iv_total")
    rep.foreach(r => assert(r.getAs[Double]("iv_total") === ivTotal))
    // (gs-bs)·ln(gs/bs) >= 0 term-wise, so the total is non-negative
    assert(ivTotal >= 0.0)
    assert(math.abs(rep.map(_.getAs[Double]("iv_term")).sum - ivTotal) < 1e-6)
    // the high-score bins are good-heavy here, so their WOE is positive
    assert(rep.maxBy(_.getAs[Long]("bin")).getAs[Double]("woe") > 0.0)
  }

  test("passAtK: hand-computed estimator; saturation and n>=k filtering") {
    import spark.implicits._
    // task A: n=5, c=2 -> pass@1 = c/n = 0.4; pass@5 = 1 (n-c=3 < 5);
    // k=10 filtered (n < 10). task B: n=12, c=0 -> pass@k = 0 for all k.
    val df = ((1 to 5).map(i => ("A", i <= 2)) ++
      (1 to 12).map(_ => ("B", false))).toDF("task", "ok")
    val got = Classify.passAtK(df, "task", "ok").orderBy("k", "task").collect()
    def row(k: Long, t: String) =
      got.find(r => r.getAs[Long]("k") == k && r.getAs[String]("task") == t).get
    assert(row(1, "A").getAs[Long]("pass_micro") === 400000L)
    assert(row(5, "A").getAs[Long]("pass_micro") === 1000000L)
    assert(got.count(r => r.getAs[String]("task") == "A") === 2) // no k=10
    Seq(1L, 5L, 10L).foreach { k =>
      assert(row(k, "B").getAs[Long]("pass_micro") === 0L)
    }
    // unbiasedness shape: pass@k grows with k (more draws, more chances)
    val a1 = row(1, "A").getAs[Long]("pass_micro")
    val a5 = row(5, "A").getAs[Long]("pass_micro")
    assert(a5 >= a1)
  }

  test("temperatureFit: correct logits pick the sharpest T, inverted logits the softest") {
    import spark.implicits._
    // every prediction right: NLL falls monotonically as T shrinks
    val good = ((1 to 50).map(_ => (2.0, true)) ++
      (1 to 50).map(_ => (-2.0, false))).toDF("z", "y")
    val g = Classify.temperatureFit(good, "z", "y").collect()
    assert(g.length === 8)
    assert(g.find(_.getAs[Boolean]("is_best")).get.getAs[Long]("t_milli") === 250L)
    // every prediction WRONG: softening (largest T) minimizes the damage
    val bad = ((1 to 50).map(_ => (2.0, false)) ++
      (1 to 50).map(_ => (-2.0, true))).toDF("z", "y")
    val b = Classify.temperatureFit(bad, "z", "y").collect()
    assert(b.find(_.getAs[Boolean]("is_best")).get.getAs[Long]("t_milli") === 4000L)
    // exactly one winner, and per-T NLL is monotone in T for `good`
    assert(g.count(_.getAs[Boolean]("is_best")) === 1)
    val byT = g.sortBy(_.getAs[Long]("t_milli")).map(_.getAs[Long]("mean_nll_pico"))
    assert(byT.zip(byT.tail).forall { case (a, c) => a <= c })
  }

  test("brierDecomposition: single-bin constant forecast has zero rel+res; identity holds") {
    import spark.implicits._
    // all forecasts 0.5, half the outcomes true: rel = 0 (bin mean
    // forecast equals bin outcome rate), res = 0 (one bin), unc = 0.25,
    // bs = 0.25, residual = 0
    val df = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("p", "y")
    val r = Classify.brierDecomposition(df, "p", "y").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("bins_used") === 1L)
    assert(r.getAs[Long]("bs_nano") === 250000000L)
    assert(r.getAs[Long]("reliability_nano") === 0L)
    assert(r.getAs[Long]("resolution_nano") === 0L)
    assert(r.getAs[Long]("uncertainty_nano") === 250000000L)
    assert(r.getAs[Long]("residual_nano") === 0L)
    // a perfectly sharp, perfectly calibrated scorer: bs = 0,
    // resolution = uncertainty, reliability = 0
    val sharp = Seq((0.999999, true), (0.999999, true), (0.0, false),
      (0.0, false)).toDF("p", "y")
    val s2 = Classify.brierDecomposition(sharp, "p", "y").head()
    assert(s2.getAs[Long]("bs_nano") < 1000L)
    assert(s2.getAs[Long]("reliability_nano") < 1000L)
    assert(math.abs(s2.getAs[Long]("resolution_nano") -
      s2.getAs[Long]("uncertainty_nano")) < 1000L)
  }

  test("mahalanobisOod: a planted far-off vector tops the queue") {
    import spark.implicits._
    val inliers = (0L until 20L).map { i =>
      val c = (i % 2).toInt
      (i, Seq.tabulate(4)(d => (if (d == c) 3.0f else 0.0f) +
        (i % 5).toFloat * 0.01f), c)
    }
    val ood = Seq((99L, Seq(-9f, 9f, -9f, 9f), 0))
    val vecs = (inliers ++ ood).toDF("vec_id", "embedding", "label")
    val got = Classify.mahalanobisOod(vecs, Classify.gaussianNbTrain(vecs),
      topK = 3).collect()
    assert(got.head.getAs[Long]("id") === 99L)
    // scores rank descending and the planted point dominates
    assert(got.head.getAs[Long]("m2_micro") > 10L * got(1).getAs[Long]("m2_micro"))
  }

  test("uncertaintySample: smallest margin first, entropy orders with flatness") {
    import spark.implicits._
    val post = Seq(
      (1L, 0L, 0L, 900000L), (1L, 0L, 1L, 100000L), // confident
      (2L, 1L, 0L, 550000L), (2L, 1L, 1L, 450000L), // boundary
      (3L, 0L, 0L, 500000L), (3L, 0L, 1L, 500000L)) // coin flip
      .toDF("id", "given", "cls", "p_micro")
    val got = Classify.uncertaintySample(post, k = 2).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(3L, 2L)) // margins 0 < 100000
    assert(got(0).getAs[Long]("margin_micro") === 0L)
    assert(got(1).getAs[Long]("margin_micro") === 100000L)
    // flat posterior has the max entropy (ln 2 ≈ 0.6931 nano-scaled)
    assert(math.abs(got(0).getAs[Long]("entropy_nano") - 693147181L) < 1000L)
  }

  test("raschFit: harder items get higher difficulty, b centered, ability orders") {
    import spark.implicits._
    // 6 subjects x 3 items; item "hard" passed only by the strongest,
    // "easy" by everyone, "mid" by half
    val rows = for {
      u <- 0L until 6L
      (i, pass) <- Seq(("easy", true), ("mid", u >= 3L), ("hard", u == 5L))
    } yield (u, i, 1L, if (pass) 1L else 0L)
    val got = Classify.raschFit(rows.toDF("u", "i", "n", "k"),
      "u", "i", "n", "k").orderBy("item").collect()
    val d = got.map(r => r.getString(0) -> r.getAs[Long]("difficulty_micro")).toMap
    assert(d("easy") < d("mid") && d("mid") < d("hard"))
    // centering: difficulties sum to ~0 (exact up to truncation)
    assert(math.abs(d.values.sum) <= d.size.toLong)
    spark.catalog.clearCache()
  }

  test("confidentLearning: thresholds, qualifying argmax, diagonal fallback") {
    import spark.implicits._
    // t_0 = (900000+100000)/2 = 500000; t_1 = (800000+900000)/2 = 850000
    val post = Seq(
      (1L, 0L, 0L, 900000L), (1L, 0L, 1L, 100000L),
      (2L, 0L, 0L, 100000L), (2L, 0L, 1L, 900000L), // flips to class 1
      (3L, 1L, 0L, 200000L), (3L, 1L, 1L, 800000L), // no qualifier -> diag
      (4L, 1L, 0L, 100000L), (4L, 1L, 1L, 900000L))
      .toDF("id", "given", "cls", "p_micro")
    val got = Classify.confidentLearning(post).orderBy("given", "pred")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(got((0L, 0L)) === ((1L, 0)))
    assert(got((0L, 1L)) === ((1L, 1))) // the flagged label issue
    assert(got((1L, 1L)) === ((2L, 0)))
    assert(!got.contains((1L, 0L)))
  }

  test("gaussianNbPosteriors: rows sum to ~1e6 and argmax agrees with classify") {
    import spark.implicits._
    val vecs = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      (i, Seq.tabulate(4)(d => (if (d == c) 5.0f else 0.0f) +
        (i * 7 % 5).toFloat * 0.1f), c)
    }.toDF("vec_id", "embedding", "label")
    val model = Classify.gaussianNbTrain(vecs)
    val post = Classify.gaussianNbPosteriors(vecs, model)
    val sums = post.groupBy("id")
      .agg(org.apache.spark.sql.functions.sum("p_micro").as("s"))
      .collect().map(_.getLong(1))
    sums.foreach(s => assert(math.abs(s - 1000000L) <= 3L))
    val amax = post.orderBy(org.apache.spark.sql.functions.col("p_micro").desc)
      .groupBy("id").agg(org.apache.spark.sql.functions
        .max_by(org.apache.spark.sql.functions.col("cls"),
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.col("p_micro"),
            org.apache.spark.sql.functions.col("cls"))).as("pm"))
    val pred = Classify.gaussianNbClassify(vecs, model)
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("pred"))
    assert(amax.join(pred, "id")
      .filter(org.apache.spark.sql.functions.col("pm") =!=
        org.apache.spark.sql.functions.col("pred")).count() === 0L)
  }

  test("fairnessAudit: hand-computed rates, reference = largest group") {
    import spark.implicits._
    val df = Seq(
      ("A", true, true), ("A", true, false), ("A", false, true),
      ("A", false, false),
      ("B", true, true), ("B", false, false)).toDF("g", "d", "y")
    val got = Classify.fairnessAudit(df, "g", "d", "y")
      .orderBy("grp").collect()
    val a = got(0); val b = got(1)
    assert(a.getAs[String]("ref_grp") === "A") // larger group is the reference
    assert(a.getAs[Long]("sel_micro") === 500000L)
    assert(a.getAs[Long]("tpr_micro") === 500000L)
    assert(a.getAs[Long]("fpr_micro") === 500000L)
    assert(a.getAs[Long]("di_ratio_micro") === 1000000L)
    assert(a.getAs[Long]("eo_gap_micro") === 0L)
    assert(b.getAs[Long]("sel_micro") === 500000L)
    assert(b.getAs[Long]("tpr_micro") === 1000000L)
    assert(b.getAs[Long]("fpr_micro") === 0L)
    assert(b.getAs[Long]("di_ratio_micro") === 1000000L)
    assert(b.getAs[Long]("eo_gap_micro") === 500000L)
  }
}
