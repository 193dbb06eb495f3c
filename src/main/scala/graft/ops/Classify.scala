package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained classifiers for corpus curation — the "learn a cheap model
  * ON the corpus, then score the corpus with it" family (fastText-style
  * source/quality classifiers, CCNet's LM filter, quality
  * linear-regressions). Two members:
  *
  *  - multinomial Naive Bayes over tokens (class = any label column) —
  *    the classic n-gram source/domain classifier;
  *  - Gaussian Naive Bayes over embedding vectors — the cheap
  *    generative baseline for labeled-embedding audits (is the label
  *    structure actually present in the vector space?).
  *
  * Both are closed-form (count/moment) trainers: no iterative SGD, so
  * training is a single combinable aggregation and the learned model is
  * exactly reproducible by the SQL oracle from the raw tables.
  *
  * Scale design: the NB token model is vocabulary-bounded — it rides a
  * (class, token) count shuffle (map-side combinable, ~V×C rows out)
  * and scoring joins the corpus tokens against the model by token
  * (broadcastable whenever V×C ≪ corpus, the normal case). The
  * Gaussian model is (classes × dims) scalars — collected to the
  * driver (bounded like [[Pca]]'s O(dim²) covariance) and scored as a
  * single narrow codegen pass over plan-time literal arrays: zero
  * joins, zero shuffles, in-order per-dim folds so the oracle can
  * mirror the float arithmetic exactly.
  */
object Classify {

  /** Learned multinomial-NB model, kept distributed:
    * `classStats`  — one row per class: log-prior and the Laplace
    *                 "unseen token" log-likelihood;
    * `tokenLikes`  — one row per observed (class, token): smoothed
    *                 log-likelihood.
    */
  final case class NbModel(classStats: DataFrame, tokenLikes: DataFrame)

  /** (id, cls, token) rows: lowercase whitespace tokens, empties
    * dropped — the same tokenization as [[Text]]'s corpus statistics so
    * model vocabulary and corpus vocabulary agree.
    */
  private def tokenRows(docs: DataFrame, classCol: String, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"), col(classCol).as("__cls"),
        explode(split(lower(col(textCol)), " ")).as("__tok"))
      .filter(col("__tok") =!= "")

  /** Train multinomial Naive Bayes with add-one (Laplace) smoothing:
    * P(t|c) = (count(t,c) + 1) / (tokens(c) + |V|), prior = docs(c)/N.
    * One (class, token) count shuffle + three tiny broadcast scalars.
    */
  def naiveBayesTrain(docs: DataFrame, classCol: String = "source",
                      idCol: String = "doc_id",
                      textCol: String = "text"): NbModel = {
    val tk = tokenRows(docs, classCol, idCol, textCol)
    val counts = tk.groupBy(col("__cls"), col("__tok"))
      .agg(count(lit(1)).cast("double").as("__cnt"))
    val totals = counts.groupBy(col("__cls"))
      .agg(sum(col("__cnt")).as("__total"))
    // global vocabulary size + doc totals: 1-row aggregates, broadcast
    val vocab = broadcast(counts.agg(
      countDistinct(col("__tok")).cast("double").as("__v")))
    val docTotals = broadcast(docs.agg(
      count(lit(1)).cast("double").as("__n")))
    val classDocs = docs.groupBy(col(classCol).as("__cls"))
      .agg(count(lit(1)).cast("double").as("__ndocs"))

    val classStats = totals.join(classDocs, "__cls")
      .crossJoin(vocab).crossJoin(docTotals)
      .select(col("__cls"),
        log(col("__ndocs") / col("__n")).as("__log_prior"),
        log(lit(1.0) / (col("__total") + col("__v"))).as("__log_default"))
    val tokenLikes = counts.join(totals, "__cls").crossJoin(vocab)
      .select(col("__cls"), col("__tok"),
        log((col("__cnt") + lit(1.0)) / (col("__total") + col("__v")))
          .as("__log_like"))
    NbModel(classStats, tokenLikes)
  }

  /** Score every document against every class and keep the argmax:
    * score(d,c) = log-prior(c) + Σ_{t∈d, (c,t) observed} loglike(c,t)
    *            + (|d| − matched(d,c)) · log-default(c).
    * The unseen-token closed form means the model join only has to hit
    * OBSERVED (class, token) pairs — documents never fan out by class
    * until the final (doc × class) score table, which is
    * classes-bounded. Ties (astronomically unlikely with real counts)
    * break to the lexicographically smallest class.
    *
    * Scoring needs NO label column (the production use of a source
    * classifier is labeling an unlabeled corpus), and zero-token
    * documents still receive prior-only scores — doc ids come from
    * `docs` itself, not from the token table (r9 advice).
    */
  def naiveBayesClassify(docs: DataFrame, model: NbModel,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val tk = docs.select(col(idCol).as("__id"),
        explode(split(lower(col(textCol)), " ")).as("__tok"))
      .filter(col("__tok") =!= "")
    val docLen = docs.select(col(idCol).as("__id"))
      .join(tk.groupBy(col("__id"))
          .agg(count(lit(1)).cast("double").as("__tl")),
        Seq("__id"), "left")
      .select(col("__id"), coalesce(col("__tl"), lit(0.0)).as("__n_toks"))
    // model join keys renamed so the token join + the class-stats
    // equality below stay unambiguous
    val likes = model.tokenLikes.select(col("__cls").as("__mcls"),
      col("__tok").as("__mtok"), col("__log_like"))
    val matched = tk
      .join(likes, col("__tok") === col("__mtok"))
      .groupBy(col("__id"), col("__mcls"))
      .agg(sum(col("__log_like")).as("__s_match"),
        count(lit(1)).cast("double").as("__n_match"))
    val scored = docLen
      .crossJoin(broadcast(model.classStats))
      .join(matched,
        matched("__id") === docLen("__id") && col("__mcls") === col("__cls"),
        "left")
      .select(docLen("__id").as("__id"), col("__cls"),
        (col("__log_prior") + coalesce(col("__s_match"), lit(0.0)) +
          (col("__n_toks") - coalesce(col("__n_match"), lit(0.0))) *
            col("__log_default")).as("__score"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__score").desc, col("__cls").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__cls").as("pred"),
        col("__score").as("score"))
  }

  /** Full-batch gradient-descent logistic regression with a FIXED step
    * count — the iterative trainer beside the closed-form NB pair: the
    * shape of every "fit a small quality/filter model on corpus
    * features" job. Determinism contract: fixed zero init, fixed lr,
    * fixed steps, and the per-step gradient is a plain combinable SUM —
    * the oracle unrolls the identical three steps as chained CTEs (the
    * pg1/BPE discipline), so the learned weights themselves are
    * value-checked, not just the predictions. NOTE the gradient sum is
    * a partition-order-dependent double reduction, so the weights are
    * stable to the gate's 6 decimals AT FIXED PARTITIONING (the test
    * fixtures); across partitionings/scale a value sitting exactly on
    * a rounding boundary can flip its last digit — quantize the
    * features to integers (the pico-stats discipline) if bit-exact
    * cross-cluster reproducibility is required.
    *
    * Scale: each step is ONE map-side-combinable aggregate over the
    * feature table (dims+0 scalars out) + an O(dims) driver update —
    * the classic Spark batch-GD loop. Feature tables never shuffle.
    */
  def logisticGd(feats: DataFrame, featCols: Seq[String],
                 labelCol: String, steps: Int = 3,
                 lr: Double = 1.0): Array[Double] = {
    require(featCols.nonEmpty && steps > 0, "need features and steps")
    val n = feats.count().toDouble
    var w = Array.fill(featCols.size)(0.0)
    for (_ <- 1 to steps) {
      // z in fixed feature order (the oracle mirrors the same fold)
      val z = featCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
        .reduce(_ + _)
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - col(labelCol)
      val gradAggs = featCols.map(c => sum(col(c) * err))
      val row = feats.agg(gradAggs.head, gradAggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, j) =>
        wi - lr * (row.getDouble(j) / n)
      }
    }
    w
  }

  /** Score a feature table with trained weights: per-row linear term,
    * sigmoid, and the > 0 keep decision — one codegen projection.
    */
  def logisticScore(feats: DataFrame, featCols: Seq[String],
                    weights: Array[Double]): DataFrame = {
    val z = featCols.zip(weights).map { case (c, wi) => col(c) * lit(wi) }
      .reduce(_ + _)
    feats.withColumn("z", z)
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("z"))))
      .withColumn("pred", col("z") > 0)
  }

  // ---------------------------------------------------------------- //

  /** Gaussian NB model: per class, the prior's log plus per-dimension
    * mean/variance arrays in dim order. classes × dims scalars —
    * bounded, driver-held, serialized into the scoring plan (and into
    * the DuckDB oracle) as literals.
    */
  final case class GaussianNbModel(cls: Long, logPrior: Double,
                                   mu: Array[Double], vr: Array[Double])

  /** Train Gaussian NB on a labeled vector table: population moments
    * per (class, dim) with a variance floor. One combinable
    * (class, dim) shuffle, then a bounded classes×dims collect.
    */
  def gaussianNbTrain(vecs: DataFrame, labelCol: String = "label",
                      vecCol: String = "embedding",
                      varFloor: Double = 1e-9): Seq[GaussianNbModel] = {
    val x = vecs.select(col(labelCol).cast("long").as("__c"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__d", "__x")))
    val stats = x.groupBy(col("__c"), col("__d"))
      .agg(avg(col("__x")).as("__mu"), avg(col("__x") * col("__x")).as("__ex2"))
      .select(col("__c"), col("__d"), col("__mu"),
        greatest(col("__ex2") - col("__mu") * col("__mu"), lit(varFloor))
          .as("__vr"))
      .collect()
    val nTotal = vecs.count().toDouble
    val priors = vecs.groupBy(col(labelCol).cast("long").as("__c"))
      .agg(count(lit(1)).cast("double").as("__nc")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    stats.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (c, rows) =>
      val byDim = rows.sortBy(_.getInt(1))
      GaussianNbModel(c, math.log(priors(c) / nTotal),
        byDim.map(_.getDouble(2)).toArray, byDim.map(_.getDouble(3)).toArray)
    }
  }

  /** Score + argmax as one narrow codegen pass: per class an IN-ORDER
    * per-dim fold (so the oracle's list_reduce mirrors the float
    * additions exactly):
    * score(x,c) = logPrior(c) − 0.5·Σ_d [ln(2π·σ²_cd) + (x_d−μ_cd)²/σ²_cd]
    * Argmax rides array_max over (score, cls) structs — ties to the
    * LARGER class id, mirrored in the oracle's order-by.
    */
  def gaussianNbClassify(vecs: DataFrame, model: Seq[GaussianNbModel],
                         labelCol: String = "label",
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    require(model.nonEmpty, "gaussianNbClassify: empty model")
    val twoPi = 2.0 * math.Pi
    val v = col(vecCol).cast("array<double>")
    val scoreStructs: Column = array(model.map { m =>
      // one array<struct<mu,vr>> literal per class (plan-time constant)
      val msLit = typedlit(m.mu.zip(m.vr).toIndexedSeq)
      val terms = zip_with(v, msLit,
        (x, ms) => log(lit(twoPi) * ms.getField("_2")) +
          (x - ms.getField("_1")) * (x - ms.getField("_1")) / ms.getField("_2"))
      val fold = aggregate(terms, lit(0.0), (acc, t) => acc + t)
      struct((lit(m.logPrior) - lit(0.5) * fold).as("score"),
        lit(m.cls).as("cls"))
    }: _*)
    val best = array_max(scoreStructs)
    vecs.select(col(idCol), col(labelCol).cast("long").as(labelCol),
        best.getField("cls").as("pred"))
      .withColumn("correct", col(labelCol) === col("pred"))
  }

  /** Rasch 1PL item-response fit (Rasch 1960; the one-parameter
    * logistic IRT model): subjects get an ABILITY θ_u, items a
    * DIFFICULTY b_i, and `P(success) = σ(θ_u − b_i)`; fit by a fixed
    * number of synchronous gradient rounds on binomial response counts
    * `(n_ui trials, k_ui successes)`. The eval-analysis workhorse
    * behind modern benchmark curation (IRT-subsampled leaderboards,
    * item-difficulty audits): unlike raw accuracy, difficulties are
    * comparable ACROSS subject pools and abilities across item sets.
    * Identification: item difficulties are re-centered to exact mean
    * zero every round (the standard 1PL constraint).
    *
    * Determinism: the mk1/bt1 integer discipline — θ/b are micro-unit
    * longs; each round quantizes σ once per (u, i) cell
    * (`floor(σ((θ−b)/1e6)·1e6 + 0.5)`, one fixed double op on exact
    * integer input), then every residual, gradient, mean and update is
    * exact integer arithmetic with truncating division in both
    * engines. η = 1/2 is a bit shift, not a float.
    *
    * Scale: responses aggregate once to (subject, item) cells
    * (combinable); each round is one cells-scan + a subject rollup
    * (in-plan, corpus-scale) + an ITEMS-BOUNDED gradient collect
    * (≤ `maxItems`, the markovSteady bounded-collect cap) — the
    * subject side never leaves the cluster.
    */
  /** Lazy (subject, item) response-cell aggregation of [[raschFit]],
    * exposed for the plan-shape gate. */
  private[graft] def raschCells(resp: DataFrame, subjectCol: String,
      itemCol: String, nCol: String, kCol: String): DataFrame =
    resp.select(col(subjectCol).cast("string").as("u"),
        col(itemCol).cast("string").as("i"),
        col(nCol).cast("long").as("n"), col(kCol).cast("long").as("k"))
      .groupBy("u", "i")
      .agg(sum("n").cast("long").as("n"), sum("k").cast("long").as("k"))

  /** One gradient round of [[raschFit]], lazy: returns (e, nextTh) —
    * e is `pin`ned in the real loop because the subject update and the
    * item gradients both replay the cell join otherwise. Exposed so
    * the plan-shape gate can golden-pin the round's pure plan (the
    * registered irt1 plan is a trivial localCheckpoint scan).
    */
  private[graft] def raschRound(r: DataFrame, th: DataFrame, bDf: DataFrame,
      pin: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {
    val e = pin(r.join(th, "u").join(broadcast(bDf), "i")
      .withColumn("p_micro", floor(lit(1e6) /
        (lit(1.0) + exp(-((col("t") - col("bb")).cast("double") / lit(1e6))))
        + lit(0.5)).cast("long"))
      .withColumn("e", col("k") * lit(1000000L) - col("n") * col("p_micro")))
    // subject update in-plan: θ += (Σe div Σn) div 2
    val nextTh = e.groupBy("u")
      .agg(sum("e").cast("long").as("se"), sum("n").cast("long").as("sn"),
        first("t").as("t0"))
      .select(col("u"),
        (col("t0") + expr("(se div sn) div 2L")).as("t"))
    (e, nextTh)
  }

  def raschFit(resp: DataFrame, subjectCol: String, itemCol: String,
               nCol: String, kCol: String, iters: Int = 8,
               maxItems: Int = 64): DataFrame = {
    val spark = resp.sparkSession
    def shallow(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    import org.apache.spark.storage.StorageLevel
    val r = raschCells(resp, subjectCol, itemCol, nCol, kCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val itemRows = r.groupBy("i")
      .agg(sum("n").cast("long").as("nt"), sum("k").cast("long").as("kt"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    require(itemRows.length <= maxItems,
      s"raschFit: ${itemRows.length} items exceed the bounded-collect cap " +
        s"$maxItems — bucket the item column first")
    var b: Map[String, Long] = itemRows.map(t => t._1 -> 0L).toMap
    var thCached = r.select(col("u")).distinct().withColumn("t", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var th = shallow(thCached)
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val bDf = spark.createDataFrame(
        b.toSeq.sortBy(_._1)).toDF("i", "bb")
      val (e, nextTh0) = raschRound(r, th, bDf,
        _.persist(StorageLevel.MEMORY_AND_DISK))
      val nextTh = nextTh0.persist(StorageLevel.MEMORY_AND_DISK)
      nextTh.count()
      // item gradients: items-bounded collect, exact ints
      val gi = e.groupBy("i")
        .agg(sum("e").cast("long").as("se"), sum("n").cast("long").as("sn"))
        .collect().map(x => x.getString(0) -> x.getLong(1) / x.getLong(2) / 2L)
        .toMap
      val bRaw = b.map { case (i, bi) => i -> (bi - gi.getOrElse(i, 0L)) }
      val mean = bRaw.values.sum / bRaw.size
      b = bRaw.map { case (i, bi) => i -> (bi - mean) }
      e.unpersist(false)
      if (prev != null) prev.unpersist()
      prev = thCached
      thCached = nextTh
      th = shallow(nextTh)
    }
    val mth = th.agg(sum(col("t").cast("decimal(38,0)")).as("st"),
      count(lit(1)).cast("long").as("nu"))
      .select(expr("CAST(st div nu AS BIGINT)").as("mean_theta_micro"))
    import spark.implicits._
    val out = itemRows.map { case (i, nt, kt) => (i, nt, kt, b(i)) }
      .toSeq.toDF("item", "n_trials", "n_success", "difficulty_micro")
      .crossJoin(broadcast(mth))
      .localCheckpoint()
    if (prev != null) prev.unpersist()
    thCached.unpersist(); r.unpersist()
    out
  }

  /** Per-class softmax posteriors from the Gaussian NB model — the
    * long-format (id, given label, class, p_micro) table
    * [[confidentLearning]] consumes. Scores are the same plan-time-
    * literal in-order folds as [[gaussianNbClassify]]; the softmax is
    * a fixed class-ASC fold (max-shifted for stability), so both
    * engines produce identical doubles before the micro quantization.
    * One narrow pass, classes-bounded fan-out at the end.
    */
  def gaussianNbPosteriors(vecs: DataFrame, model: Seq[GaussianNbModel],
                           labelCol: String = "label",
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    require(model.nonEmpty, "gaussianNbPosteriors: empty model")
    val sorted = model.sortBy(_.cls)
    val twoPi = 2.0 * math.Pi
    val v = col(vecCol).cast("array<double>")
    val scoreArr: Column = array(sorted.map { m =>
      val msLit = typedlit(m.mu.zip(m.vr).toIndexedSeq)
      val terms = zip_with(v, msLit,
        (x, ms) => log(lit(twoPi) * ms.getField("_2")) +
          (x - ms.getField("_1")) * (x - ms.getField("_1")) / ms.getField("_2"))
      lit(m.logPrior) - lit(0.5) * aggregate(terms, lit(0.0), (acc, t) => acc + t)
    }: _*)
    val clsIds = typedlit(sorted.map(_.cls).toIndexedSeq)
    vecs.select(col(idCol).as("id"), col(labelCol).cast("long").as("given"),
        scoreArr.as("sarr"))
      .withColumn("mx", array_max(col("sarr")))
      .withColumn("ex", expr("transform(sarr, s -> exp(s - mx))"))
      .withColumn("tot", expr(
        "aggregate(ex, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
      .select(col("id"), col("given"),
        posexplode(expr("transform(ex, x -> x / tot)")).as(Seq("ci", "p")))
      .select(col("id"), col("given"),
        element_at(clsIds, col("ci") + 1).as("cls"),
        floor(col("p") * lit(1e6) + lit(0.5)).cast("long").as("p_micro"))
  }

  /** Mahalanobis out-of-distribution scoring (Lee et al., NeurIPS'18
    * "A Simple Unified Framework for Detecting Out-of-Distribution
    * Samples" — diagonal per-class form): score every vector by its
    * minimum class-conditional Mahalanobis distance
    * `min_c Σ_d (x_d − μ_cd)²/σ²_cd` under the SAME per-class
    * diagonal Gaussians [[gaussianNbTrain]] fits; the top-scoring
    * rows are the OOD queue (mislabeled imports, corrupted rows,
    * genuinely novel domains) a pipeline quarantines before training.
    * The density-principled refinement of the centroid-cosine outlier
    * listing (eo1): variance-aware, so a wide class doesn't flag its
    * own tail.
    *
    * Determinism: per-class distances are the gnb1 in-order per-dim
    * folds over plan-time literals (no prior, no log terms); the
    * class argmin takes the raw-double min (identical folds both
    * engines, the gnb1 precedent) with ties to the LOWER class id;
    * the OOD cut ranks on the micro-QUANTIZED score with an id
    * tiebreak.
    *
    * Scale: one narrow codegen pass (classes × dims folds per row) +
    * a TakeOrdered — corpus-linear, nothing shuffles but the top-k.
    */
  def mahalanobisOod(vecs: DataFrame, model: Seq[GaussianNbModel],
                     topK: Int = 20, labelCol: String = "label",
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(model.nonEmpty, "mahalanobisOod: empty model")
    val v = col(vecCol).cast("array<double>")
    val scoreStructs: Column = array(model.sortBy(_.cls).map { m =>
      val msLit = typedlit(m.mu.zip(m.vr).toIndexedSeq)
      val terms = zip_with(v, msLit,
        (x, ms) => (x - ms.getField("_1")) * (x - ms.getField("_1")) /
          ms.getField("_2"))
      struct(aggregate(terms, lit(0.0), (acc, t) => acc + t).as("m2"),
        lit(m.cls).as("cls"))
    }: _*)
    val best = array_min(scoreStructs)
    vecs.select(col(idCol).as("id"), col(labelCol).cast("long").as("label"),
        best.getField("cls").as("nearest_class"),
        floor(best.getField("m2") * lit(1e6) + lit(0.5)).cast("long")
          .as("m2_micro"))
      .orderBy(col("m2_micro").desc, col("id").asc)
      .limit(topK)
  }

  /** Margin/entropy uncertainty sampling (Lewis & Gale, SIGIR'94;
    * Settles '09 §3.1 — the standard active-learning acquisition
    * rules): rank unlabeled examples by the TOP-TWO POSTERIOR MARGIN
    * ascending (smallest margin = the decision boundary = where a
    * label buys the most), reporting predictive entropy beside it.
    * The labeling-budget allocator: run after [[gaussianNbPosteriors]]
    * (or any posterior table) to pick the next annotation batch.
    *
    * Determinism: margins are exact integer differences of micro
    * posteriors (ordered by (p desc, cls desc) — total order);
    * entropy terms pico-quantize one fixed double op per (id, class)
    * cell before the exact sum; the acquisition cut is the
    * (margin asc, id asc) total order.
    *
    * Scale: one (id) rollup over the classes-bounded posterior
    * fan-out, then a TakeOrdered — corpus-linear.
    */
  def uncertaintySample(post: DataFrame, k: Int = 25): DataFrame =
    post
      .withColumn("term_pico", when(col("p_micro") > 0L,
        floor(-(col("p_micro").cast("double") / lit(1e6)) *
          log(col("p_micro").cast("double") / lit(1e6)) * lit(1e12) +
          lit(0.5)).cast("long")).otherwise(lit(0L)))
      .groupBy("id", "given")
      .agg(sort_array(collect_list(struct(col("p_micro"), col("cls"))),
          asc = false).as("ps"),
        sum("term_pico").cast("long").as("ent"))
      .select(col("id"), col("given"),
        (col("ps").getItem(0).getField("p_micro") -
          coalesce(col("ps").getItem(1).getField("p_micro"), lit(0L)))
          .as("margin_micro"),
        expr("ent div 1000L").as("entropy_nano"))
      .orderBy(col("margin_micro").asc, col("id").asc)
      .limit(k)

  /** Confident-learning label-error estimation (Northcutt, Jiang,
    * Chuang, JAIR'21 "Confident Learning: Estimating Uncertainty in
    * Dataset Labels" — the cleanlab algorithm): from out-of-the-box
    * posteriors and the GIVEN labels alone, estimate the joint
    * distribution of (given, latent true) labels. Per class j the
    * confidence threshold `t_j` is the mean self-confidence of
    * examples GIVEN label j; example x is counted into cell
    * (given(x), j*) where j* is the argmax class among those with
    * `p_j(x) ≥ t_j` (no qualifier → x stays on the diagonal). The
    * off-diagonal mass IS the label-error estimate, and the flagged
    * rows are the relabel queue — the labeling-QA op run before any
    * judge/classifier head is trusted.
    *
    * Determinism: thresholds are exact integer means of micro
    * posteriors; the qualifying argmax is an integer total order
    * (p_micro desc, cls asc).
    *
    * Scale: thresholds are a classes-bounded broadcast; the argmax is
    * one per-id window over a classes-bounded fan-out — corpus-linear,
    * one shuffle.
    */
  def confidentLearning(post: DataFrame): DataFrame = {
    val th = post.filter(col("given") === col("cls"))
      .groupBy("cls")
      .agg(count(lit(1)).cast("long").as("nc"),
        sum("p_micro").cast("decimal(38,0)").as("sp"))
      .select(col("cls"), expr("CAST(sp div nc AS BIGINT)").as("t_micro"))
    val w = Window.partitionBy("id")
      .orderBy(col("p_micro").desc, col("cls").asc)
    val qual = post.join(broadcast(th), "cls")
      .filter(col("p_micro") >= col("t_micro"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("cls").as("pred_q"))
    post.select("id", "given").distinct()
      .join(qual, Seq("id"), "left")
      .select(col("given"),
        coalesce(col("pred_q"), col("given")).as("pred"))
      .groupBy("given", "pred")
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("is_issue", (col("given") =!= col("pred")).cast("int"))
  }

  /** Bradley–Terry preference-strength fit (Bradley & Terry 1952) via
    * Hunter's MM iteration (Hunter 2004, "MM algorithms for generalized
    * Bradley-Terry models") — the model behind reward-model /
    * preference-data curation: given pairwise win counts between items
    * (annotator A-vs-B choices, side-by-side evals), recover a strength
    * per item such that P(i beats j) = w_i / (w_i + w_j). The curation
    * uses: rank candidate sources/policies from noisy pairwise labels,
    * and flag preference sets whose fitted strengths are near-uniform
    * (no signal) before paying for RLHF training on them.
    *
    * `pairs` must carry (winnerCol, loserCol) item ids per comparison.
    * MM update: w_i ← W_i / Σ_{j≠i} n_ij_total / (w_i + w_j), with
    * W_i = total wins of i — monotone in likelihood, no step size.
    *
    * Determinism (the cross-engine contract): strengths are carried in
    * INTEGER micro-units and every term is an integer floor-division —
    * `t_ij = n_ij·10¹² / (wm_i + wm_j)` (a micro-quantized term),
    * `wm_i' = W_i·10¹² / Σ_j t_ij` — so all `iters` rounds are exact
    * long arithmetic the oracle replays with `//`, and the only float
    * is the final round(wm/10⁶, 6) display division.
    *
    * Scale: the win matrix is a combinable (winner, loser) count
    * shuffle over the comparisons — the ONLY corpus-sized pass. The
    * matrix itself is items²-bounded (≤ `maxItems`² rows, enforced);
    * iterating on it driver-side is microseconds (the [[Pca]] /
    * IVF-codebook bounded-collect discipline) and the result returns
    * as a literal row set.
    */
  def bradleyTerry(pairs: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int = 8, maxItems: Int = 64): DataFrame = {
    val spark = pairs.sparkSession
    val m = pairs.groupBy(col(winnerCol).as("wi"), col(loserCol).as("li"))
      .agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = m.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    require(items.length <= maxItems,
      s"bradleyTerry: ${items.length} items exceed the bounded-collect cap " +
        s"$maxItems — aggregate items (e.g. to sources) before fitting")
    def und(a: String, b: String) = if (a <= b) (a, b) else (b, a)
    val wins = m.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val totals = m.groupBy(t => und(t._1, t._2))
      .map { case (k, v) => k -> v.map(_._3).sum } // n_ij + n_ji
    val S = 1000000000000L
    var wm = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      wm = items.map { i =>
        val denom = items.filter(_ != i).map { j =>
          val n = totals.getOrElse(und(i, j), 0L)
          if (n == 0) 0L else n * S / (wm(i) + wm(j))
        }.sum
        i -> (if (denom == 0) wm(i) else wins.getOrElse(i, 0L) * S / denom)
      }.toMap
    }
    import spark.implicits._
    items.toSeq.map { i =>
      // wm is exact integer micros: /1e6 is the same binary double op
      // the oracle's CAST(wm AS DOUBLE)/1000000.0 performs
      (i, wins.getOrElse(i, 0L),
        totals.collect { case ((a, b), n) if a == i || b == i => n }.sum,
        wm(i) / 1e6)
    }.toDF("item", "n_wins", "n_comparisons", "strength")
  }

  /** Per-class classifier evaluation report — the sklearn
    * `classification_report` shape: per class precision / recall / F1
    * / support from the (truth, pred) confusion cells, plus `__macro`
    * (unweighted class mean) and `__micro` (= accuracy) summary rows.
    * The standard readout before shipping any label-producing
    * pipeline (langid, quality tiers, topic tags).
    *
    * Determinism: metrics are PICO-UNIT INTEGER divisions of exact
    * cell counts (`prec_pico = tp·10¹² div (tp+fp)`; F1 composed from
    * the pico values the same way in both engines), so macro means are
    * order-free integer sums — no float accumulates across rows.
    * tp·10¹² must fit a long: per-class counts < 9·10⁶ (cohort-
    * aggregate beyond, or rescale to nano).
    *
    * Scale: one combinable (truth, pred) cell shuffle — the ONLY
    * corpus-sized pass; everything after is classes²-bounded.
    */
  def classifierReport(df: DataFrame, truthCol: String,
                       predCol: String): DataFrame = {
    val S = 1000000000000L
    val cells = df.groupBy(col(truthCol).as("truth"), col(predCol).as("pred"))
      .agg(count(lit(1)).cast("long").as("n")).persist()
    val classes = cells.select(col("truth").as("cls"))
      .unionAll(cells.select(col("pred").as("cls"))).distinct()
    val tp = cells.filter(col("truth") === col("pred"))
      .select(col("truth").as("cls"), col("n").as("tp"))
    val predTot = cells.groupBy(col("pred").as("cls"))
      .agg(sum("n").cast("long").as("n_pred"))
    val truthTot = cells.groupBy(col("truth").as("cls"))
      .agg(sum("n").cast("long").as("support"))
    val per = classes
      .join(tp, Seq("cls"), "left").join(predTot, Seq("cls"), "left")
      .join(truthTot, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"),
        coalesce(col("support"), lit(0L)).as("support"))
      .withColumn("prec_pico",
        when(col("tp") + col("fp") > 0,
          expr(s"(tp * ${S}L) div (tp + fp)")).otherwise(0L))
      .withColumn("rec_pico",
        when(col("tp") + col("fn") > 0,
          expr(s"(tp * ${S}L) div (tp + fn)")).otherwise(0L))
      // f1 from the COUNT identity 2tp/(2tp+fp+fn), not from the pico
      // precision×recall product (which would overflow a long)
      .withColumn("f1_pico",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          expr(s"(2L * tp * ${S}L) div (2L * tp + fp + fn)"))
          .otherwise(0L))
      .persist()
    val k = per.count()
    val n = cells.agg(sum("n").cast("long")).head().getLong(0)
    val sums = per.agg(sum("tp").cast("long").as("s_tp"),
      sum("fp").cast("long").as("s_fp"), sum("fn").cast("long").as("s_fn"),
      sum("prec_pico").cast("long").as("s_p"),
      sum("rec_pico").cast("long").as("s_r"),
      sum("f1_pico").cast("long").as("s_f")).head()
    val accPico = sums.getAs[Long]("s_tp") * S / n
    val spark = df.sparkSession
    import spark.implicits._
    val summary = Seq(
      ("__macro", n, sums.getAs[Long]("s_tp"), sums.getAs[Long]("s_fp"),
        sums.getAs[Long]("s_fn"), sums.getAs[Long]("s_p") / k,
        sums.getAs[Long]("s_r") / k, sums.getAs[Long]("s_f") / k),
      ("__micro", n, sums.getAs[Long]("s_tp"), sums.getAs[Long]("s_fp"),
        sums.getAs[Long]("s_fn"), accPico, accPico, accPico))
      .toDF("cls", "support", "tp", "fp", "fn", "prec_pico", "rec_pico",
        "f1_pico")
    val out = per.select("cls", "support", "tp", "fp", "fn", "prec_pico",
        "rec_pico", "f1_pico")
      .unionByName(summary)
      .select(col("cls"), col("support"), col("tp"), col("fp"), col("fn"),
        round(col("prec_pico").cast("double") / 1e12, 6).as("precision"),
        round(col("rec_pico").cast("double") / 1e12, 6).as("recall"),
        round(col("f1_pico").cast("double") / 1e12, 6).as("f1"))
      .localCheckpoint() // classes+2 rows; lets both caches drop
    cells.unpersist(false); per.unpersist(false)
    out
  }

  /** [[bradleyTerry]] without the bounded-collect cap: the SAME
    * integer-micro MM iteration (floor divisions only, so the two
    * formulations are BIT-IDENTICAL — the per-item denominator is an
    * order-free sum of exact longs), but each round is a pair of
    * equi-joins of the O(items) strength table onto the items²-bounded
    * undirected win matrix plus one combinable sum — nothing ever
    * collects, so high-cardinality item universes (domains, annotator
    * ids) fit.
    *
    * Scale: the comparison stream reduces once to the (winner, loser)
    * count matrix (the only corpus-sized pass, combinable); every
    * iteration then moves (item, long) pairs only, with the per-round
    * lineage cut + unpersist discipline of [[Graph.pageRank]].
    * `n·10¹²` must fit a long — cap per-cell counts below ~9·10⁶ or
    * pre-scale.
    */
  def bradleyTerryDistributed(pairs: DataFrame, winnerCol: String,
                              loserCol: String, iters: Int = 8): DataFrame = {
    val spark = pairs.sparkSession
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def shallow(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    val m = pairs.groupBy(col(winnerCol).as("w"), col(loserCol).as("l"))
      .agg(count(lit(1)).cast("long").as("n")).persist(disk)
    val items = m.select(col("w").as("item"))
      .unionAll(m.select(col("l").as("item"))).distinct().persist(disk)
    val tot = m.groupBy(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"))
      .agg(sum("n").cast("long").as("n"))
    val e = tot.select(col("a").as("i"), col("b").as("j"), col("n"))
      .unionAll(tot.select(col("b").as("i"), col("a").as("j"), col("n")))
      .persist(disk)
    val wins = m.groupBy(col("w").as("item"))
      .agg(sum("n").cast("long").as("w_total")).persist(disk)
    var cur = items.select(col("item"), lit(1000000L).as("wm")).persist(disk)
    cur.count()
    for (_ <- 1 to iters) {
      val wa = cur.select(col("item").as("i"), col("wm").as("wmi"))
      val wb = cur.select(col("item").as("j"), col("wm").as("wmj"))
      val denom = e.join(wa, "i").join(wb, "j")
        .select(col("i").as("item"),
          expr("n * 1000000000000L div (wmi + wmj)").as("t"))
        .groupBy("item").agg(sum("t").cast("long").as("denom"))
      val next = cur.join(denom, Seq("item"), "left")
        .join(wins, Seq("item"), "left")
        .select(col("item"),
          when(col("denom").isNull || col("denom") === 0L, col("wm"))
            .otherwise(expr("coalesce(w_total, 0L) * 1000000000000L div denom"))
            .as("wm"))
      val nxt = shallow(next).persist(disk)
      nxt.count()
      cur.unpersist(false)
      cur = nxt
    }
    val ncomp = e.groupBy(col("i").as("item"))
      .agg(sum("n").cast("long").as("n_comparisons"))
    val out = items.join(wins, Seq("item"), "left")
      .join(ncomp, Seq("item"), "left").join(cur, "item")
      .select(col("item"), coalesce(col("w_total"), lit(0L)).as("n_wins"),
        coalesce(col("n_comparisons"), lit(0L)).as("n_comparisons"),
        (col("wm").cast("double") / 1e6).as("strength"))
      .orderBy("item")
      .localCheckpoint() // O(items) rows; lets every cache drop
    m.unpersist(false); items.unpersist(false); e.unpersist(false)
    wins.unpersist(false); cur.unpersist(false)
    out
  }

  /** Threshold-free scorer evaluation: ROC-AUC (tie-corrected
    * Mann–Whitney rank form) and average precision (the PR-AUC
    * sklearn reports) of an INTEGER score column against a boolean
    * label — the standard readout for any ranking-style quality /
    * langid / relevance scorer before a threshold is picked.
    *
    * Determinism: the corpus reduces to per-distinct-score (pos, cnt)
    * cells; rank sums use the integer identity
    * `2·rank_avg = 2·cum_before + cnt + 1` (exact decimal sums — no
    * float rank), and each PR step quantizes precision to pico by
    * integer floor-division BEFORE the order-free Σ, so both engines
    * add the same longs. Final AUC/AP are single display divisions.
    * Caps: `cum_tp·10¹²` must fit a long → ≤9·10⁶ positives (rescale
    * to nano beyond).
    *
    * Scale: ONE combinable group-by-score pass over the corpus; the
    * two cumulative windows run on the distinct-score table (score-
    * cardinality–sized, documented single-partition — an integer score
    * has bounded range, not corpus-sized range).
    */
  def rocPrReport(df: DataFrame, scoreCol: String,
                  labelCol: String): DataFrame = {
    val S = 1000000000000L
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val g = df.groupBy(col(scoreCol).cast("long").as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("pos"),
        count(lit(1)).cast("long").as("cnt"))
    val wAsc = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = g
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(wAsc), lit(0L)))
      .withColumn("rank2", lit(2L) * col("cum_before") + col("cnt") + lit(1L))
      .withColumn("cum_tp", sum(col("pos")).over(wDesc).cast("long"))
      .withColumn("cum_n", sum(col("cnt")).over(wDesc).cast("long"))
      // precision at this threshold, pico-quantized BEFORE the sum
      .withColumn("prec_pico", expr(s"(cum_tp * ${S}L) div cum_n"))
    val m = cells.agg(
      sum(col("cnt")).cast("long").as("n"),
      sum(col("pos")).cast("long").as("n_pos"),
      count(lit(1)).cast("long").as("n_thresholds"),
      sum(dec(col("pos")) * dec(col("rank2"))).as("r1_2"),
      sum(dec(col("pos")) * dec(col("prec_pico"))).as("ap_sum"))
    m.select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
      col("n_thresholds"),
      round((col("r1_2").cast("double") -
          col("n_pos").cast("double") * (col("n_pos").cast("double") + 1.0)) /
        (lit(2.0) * col("n_pos").cast("double") *
          (col("n") - col("n_pos")).cast("double")), 9).as("auc"),
      round(col("ap_sum").cast("double") /
        (col("n_pos").cast("double") * 1e12), 9).as("avg_precision"))
  }

  /** Cumulative-gains / lift table (the marketing-science decile chart
    * — "contacting the top-k% of the score ranking captures what share
    * of the positives, at what multiple of random?"): deciles of the
    * DESCENDING score order, cumulative capture (gain) and lift per
    * decile. The operational companion to [[rocPrReport]] — AUC says
    * whether the scorer ranks, gains say what a top-k budget buys.
    *
    * Determinism: deciles come from `ntile` over the totally ordered
    * (score desc, id) pair; counts are exact longs, cumulatives run on
    * the bins-sized table; gain/lift are single display divisions of
    * exact integer products.
    *
    * Scale: same contract as [[woeIvReport]] — the ntile total order
    * runs on narrow (long, long) pairs; shard or pre-bin at true
    * scale; everything after the bin pass is bins-sized.
    */
  def gainsLiftReport(df: DataFrame, scoreCol: String, labelCol: String,
                      idCol: String, bins: Int = 10): DataFrame = {
    val per = df
      .select(col(scoreCol).cast("long").as("s"), col(idCol).as("id"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .withColumn("decile", ntile(bins).over(
        Window.orderBy(col("s").desc, col("id").asc)))
      .groupBy("decile")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("y").cast("long").as("n_pos"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum("n").cast("long").as("tn"),
      sum("n_pos").cast("long").as("tp"))
    per
      .withColumn("cum_n", sum("n").over(w).cast("long"))
      .withColumn("cum_pos", sum("n_pos").over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("decile").cast("long").as("decile"), col("n"),
        col("n_pos"), col("cum_n"), col("cum_pos"),
        round(col("cum_pos").cast("double") / col("tp").cast("double"), 9)
          .as("gain"),
        round(col("cum_pos").cast("double") * col("tn").cast("double") /
          (col("cum_n").cast("double") * col("tp").cast("double")), 9)
          .as("lift"))
  }

  /** Weight-of-evidence / information-value report (the credit-scoring
    * predictive-power audit, Siddiqi 2006): quantile-bin an integer
    * score, per bin `WOE = ln(smoothed good share / smoothed bad
    * share)` and its IV term; every row also carries the total IV —
    * the single number that says whether the score is worth
    * thresholding (<0.02 useless, >0.3 strong).
    *
    * Determinism: bins come from `ntile` over the TOTALLY ordered
    * (score, id) pair — bit-identical bucketing in both engines; bin
    * counts are exact longs; the +0.5 Laplace smoothing is kept as the
    * integer identity `(2g+1)/(2G+k)` so each WOE is one `ln` of a
    * ratio of exact integer products (decimal-cast — no overflow), and
    * IV terms pico-quantize before the order-free total.
    *
    * Scale: ntile needs a total order — run it per score-shard at real
    * scale or feed pre-binned scores; here the ORDER is over (long,
    * long) pairs only after a narrow projection. Everything after the
    * bin pass is bins-sized.
    */
  def woeIvReport(df: DataFrame, scoreCol: String, labelCol: String,
                  idCol: String, bins: Int = 10): DataFrame = {
    val perBin = df
      .select(col(scoreCol).cast("long").as("s"), col(idCol).as("id"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .withColumn("bin", ntile(bins).over(
        Window.orderBy(col("s").asc, col("id").asc)))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("y").cast("long").as("n_good"),
        min("s").as("s_min"), max("s").as("s_max"))
      .withColumn("n_bad", col("n") - col("n_good"))
    val tot = perBin.agg(sum("n_good").cast("long").as("g_tot"),
      sum("n_bad").cast("long").as("b_tot")).withColumn("k", lit(bins.toLong))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val terms = perBin.crossJoin(broadcast(tot))
      // woe = ln( ((2g+1)/(2G+k)) / ((2b+1)/(2B+k)) ) as ONE ln of an
      // exact-integer-product ratio
      .withColumn("woe",
        log((dec(lit(2L) * col("n_good") + 1L) * dec(lit(2L) * col("b_tot") + col("k")))
            .cast("double") /
          (dec(lit(2L) * col("n_bad") + 1L) * dec(lit(2L) * col("g_tot") + col("k")))
            .cast("double")))
      .withColumn("gs", (lit(2L) * col("n_good") + 1L).cast("double") /
        (lit(2L) * col("g_tot") + col("k")).cast("double"))
      .withColumn("bs", (lit(2L) * col("n_bad") + 1L).cast("double") /
        (lit(2L) * col("b_tot") + col("k")).cast("double"))
      .withColumn("iv_pico",
        floor((col("gs") - col("bs")) * col("woe") * lit(1e12) + lit(0.5))
          .cast("long"))
      .persist()
    val ivTot = terms.agg(sum(dec(col("iv_pico"))).as("iv_sum"))
      .select(round(col("iv_sum").cast("double") / 1e12, 9).as("iv_total"))
    val out = terms.crossJoin(broadcast(ivTot))
      .select(col("bin").cast("long").as("bin"), col("s_min"), col("s_max"),
        col("n"), col("n_good"), col("n_bad"),
        round(col("woe"), 9).as("woe"),
        round(col("iv_pico").cast("double") / 1e12, 9).as("iv_term"),
        col("iv_total"))
      .localCheckpoint() // bins rows; lets the cache drop
    terms.unpersist(false)
    out
  }

  /** Unbiased pass@k estimator (Chen et al. 2021, "Evaluating Large
    * Language Models Trained on Code", eq. 1): per task with `n`
    * sampled attempts of which `c` passed, `pass@k = 1 − C(n−c,k)/
    * C(n,k)` — the probability that at least one of k drawn samples
    * passes. The combinatorial ratio is computed as the falling-
    * factorial product `Π_{i=0}^{k−1} (n−c−i)/(n−i)` — never a raw
    * binomial (no overflow, no float factorial).
    *
    * Determinism: ONE combinable per-task count pass; the product is
    * a DETERMINISTIC INTEGER pico-fold (`acc·(n−c−i) div (n−i)` in
    * ascending i — a zero factor when c > n−k floors the fold at 0,
    * i.e. pass@k = 1, before any negative factor can appear), so both
    * engines are bit-identical with a single integer display column.
    * Each fold step truncates, so the result approximates the exact
    * rational 10¹²·C(n−c,k)/C(n,k) from below with < k pico-units of
    * accumulated error — identical in both engines (the property the
    * gate needs), not the exact rational itself. Headroom: acc ≤ 10¹²
    * so the fold needs n < 9·10⁶ attempts per task — beyond any
    * sampling budget.
    *
    * Scale: the corpus pass is the groupBy(task) count; everything
    * after lives on the tasks×|ks| table.
    */
  def passAtK(df: DataFrame, taskCol: String, correctCol: String,
              ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    val per = df.groupBy(col(taskCol).as("task"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(correctCol), 1L).otherwise(0L)).cast("long").as("c"))
    // k as an EXPLODED column, not one plan leg per k: a per-k union
    // re-scanned and re-shuffled the corpus once per k (measured 3
    // scans at |ks| = 3); exploding keeps ONE scan + ONE shuffle and
    // the fold bound is just a column
    per.withColumn("k", explode(typedlit(ks.map(_.toLong))))
      .filter(col("n") >= col("k"))
      .withColumn("p_pico", expr(
        "aggregate(sequence(0L, k - 1L), 1000000000000L, " +
          "(acc, i) -> (acc * (n - c - i)) div (n - i))"))
      .select(col("k"), col("task"), col("n").as("n_samples"),
        col("c").as("n_correct"),
        expr("(1000000000000L - p_pico) div 1000000L").as("pass_micro"))
  }

  /** Temperature scaling (Guo et al., ICML'17) — the one-parameter
    * post-hoc calibration fix: rescale the scorer's LOGITS by 1/T and
    * pick the T minimizing validation NLL over a FIXED grid (the
    * deterministic stand-in for the 1-D Newton solve; the grid is the
    * plan — both engines evaluate the same candidates). T > 1 softens
    * an overconfident scorer, T < 1 sharpens an underconfident one;
    * the chosen T feeds back into serving as a literal. The parametric
    * complement to [[graft.ops.Curate.isotonicCalibration]]'s
    * monotone fit and the FIX for what [[brierDecomposition]]'s
    * reliability term diagnoses.
    *
    * Determinism: per-row NLL terms are fixed-order doubles from the
    * shared logit expression, PICO-QUANTIZED before the order-free
    * sum (the js1 discipline); probabilities clamp to [1e−9, 1−1e−9]
    * in both engines so a saturated logit cannot produce ±∞; the
    * winner is an integer argmin with a smaller-T tiebreak.
    *
    * Scale: ONE pass over (logit, label) × |grid| in-row expansions,
    * combinable per-T sums; everything after is grid-sized.
    */
  def temperatureFit(scored: DataFrame, logitCol: String, labelCol: String,
                     grid: Seq[Double] =
                       Seq(0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 4.0)): DataFrame = {
    val rows = scored.select(col(logitCol).as("z"),
        when(col(labelCol), 1.0).otherwise(0.0).as("y"))
      .select(explode(typedlit(grid)).as("t"), col("z"), col("y"))
      .withColumn("p", lit(1.0) / (lit(1.0) + exp((lit(0.0) - col("z")) / col("t"))))
      .withColumn("pc", least(greatest(col("p"), lit(1e-9)), lit(1.0) - lit(1e-9)))
      .withColumn("nll_pico", floor((lit(0.0) -
        (col("y") * log(col("pc")) +
          (lit(1.0) - col("y")) * log(lit(1.0) - col("pc")))) * lit(1e12) +
        lit(0.5)).cast("long"))
    val per = rows.groupBy("t")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("nll_pico").cast("long").as("nll_sum_pico"))
    per
      .withColumn("is_best", row_number().over(
        Window.orderBy(col("nll_sum_pico").asc, col("t").asc)) === 1)
      .select(floor(col("t") * lit(1000.0) + lit(0.5)).cast("long").as("t_milli"),
        col("n"), expr("nll_sum_pico div n").as("mean_nll_pico"),
        col("is_best"))
  }

  /** Risk–coverage curve for selective prediction (Geifman &
    * El-Yaniv, NeurIPS'17): if the classifier may ABSTAIN on its
    * least-confident fraction, what error rate does each coverage
    * level buy? Rows are ranked by confidence (distance from 0.5,
    * descending); at coverage c the risk is the error rate among the
    * top-c fraction. Emits one row per decile of coverage plus the
    * prefix-mean AURC — the scalar that compares selective
    * classifiers.
    *
    * Determinism: confidence is an exact integer `|score_micro −
    * 500000|`; the ranking is the (confidence desc, id asc) total
    * order; per-prefix risks are exact integer micro divisions;
    * AURC = mean over ALL prefixes of risk_k, each term exact-integer
    * quantized before the order-free sum.
    *
    * Scale: one global rank (eval-sample-sized by the ly1 bounded-
    * input convention) + prefix-sum windows; deciles are a filter on
    * the ranked table.
    */
  def riskCoverage(df: DataFrame, scoreCol: String, labelCol: String,
                   idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("id"),
      floor(col(scoreCol) * lit(1e6) + lit(0.5)).cast("long").as("sm"),
      when(col(labelCol), 1L).otherwise(0L).as("y"))
      .withColumn("conf", abs(col("sm") - lit(500000L)))
      .withColumn("pred", when(col("sm") >= 500000L, 1L).otherwise(0L))
      .withColumn("err", when(col("pred") =!= col("y"), 1L).otherwise(0L))
    val w = Window.orderBy(col("conf").desc, col("id").asc)
    val ranked = base
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cum_err", sum("err").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .withColumn("risk_micro", expr("(cum_err * 1000000L) div k"))
    val tot = ranked.agg(count(lit(1)).cast("long").as("n"),
      sum(col("risk_micro").cast("decimal(38,0)")).as("aurc_sum"))
    ranked.crossJoin(broadcast(tot))
      // decile coverage rows: k = ceil(n·d/10), d = 1..10
      .filter(expr(
        "array_contains(transform(sequence(1, 10), " +
          "dd -> CAST(ceil(CAST(n AS DOUBLE) * dd / 10.0) AS BIGINT)), k)"))
      .select(
        expr("(k * 1000000L) div n").as("coverage_micro"),
        col("k").as("n_kept"), col("cum_err").as("n_errors"),
        col("risk_micro"),
        expr("CAST((aurc_sum div n) AS BIGINT)").as("aurc_micro"))
  }

  /** Youden's-J optimal threshold (Youden 1950): the score cut
    * maximizing `J = TPR − FPR` — the operating point a deployed
    * binary filter actually needs once the AUC says the scorer works.
    * Thresholds are "predict positive iff score ≥ s" over the distinct
    * observed scores.
    *
    * Determinism: TP/FP at each threshold are exact cumulative counts
    * from one score-ordered window; J maximization compares the exact
    * integer cross-product `tp·N − fp·P` (no division); ties break to
    * the HIGHEST threshold (the most conservative cut). The output
    * J/TPR/FPR are exact integer micro divisions.
    *
    * Scale: one combinable per-score count shuffle + a thresholds-
    * bounded window (the auc1 shape).
    */
  def youdenThreshold(df: DataFrame, scoreCol: String,
                      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val g = df.select(col(scoreCol).cast("long").as("s"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .groupBy("s")
      .agg(count(lit(1)).cast("long").as("n"), sum("y").cast("long").as("pos"))
    val wCum = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("tp", sum("pos").over(wCum).cast("long"))
      .withColumn("cn", sum("n").over(wCum).cast("long"))
      .withColumn("fp", col("cn") - col("tp"))
    val tot = g.agg(sum("pos").cast("long").as("p_tot"),
      (sum("n") - sum("pos")).cast("long").as("n_tot"))
    val scoredT = cum.crossJoin(broadcast(tot))
      .withColumn("j_num",
        dec(col("tp")) * dec(col("n_tot")) - dec(col("fp")) * dec(col("p_tot")))
    scoredT
      .withColumn("r", row_number().over(
        Window.orderBy(col("j_num").desc, col("s").desc)))
      .filter(col("r") === 1)
      .select(col("s").as("threshold"),
        col("tp"), col("fp"),
        (col("p_tot") - col("tp")).as("fn"),
        (col("n_tot") - col("fp")).as("tn"),
        expr("CAST((tp * 1000000) div p_tot AS BIGINT)").as("tpr_micro"),
        expr("CAST((fp * 1000000) div n_tot AS BIGINT)").as("fpr_micro"),
        expr("CAST((j_num * 1000000) div (CAST(p_tot AS DECIMAL(38,0)) * n_tot) AS BIGINT)")
          .as("j_micro"))
  }

  /** DeLong's test for two CORRELATED AUCs (DeLong, DeLong &
    * Clarke-Pearson, Biometrics '88) — the standard answer to "is
    * scorer A actually better than scorer B on this data, or is the
    * AUC gap noise?". Both scorers rank the SAME items, so the naive
    * independent-AUC z ignores the covariance that usually dominates;
    * DeLong estimates it from per-item PLACEMENT values.
    *
    * Placements come from the rank identity (no O(n₁·n₀) pair join):
    * with doubled average ranks `r2 = 2·rank + ties − 1`, a positive's
    * placement numerator is `p = r2_combined − r2_within_class`
    * (= 2·Σ_j ψ(X_i, Y_j), an exact integer even under ties), and a
    * negative's is the same p (its placement is `n₁ − p/2`, but
    * variance/covariance are shift- and sign-invariant, so the
    * moments of p suffice).
    *
    * Determinism: scores are integer columns (callers micro-quantize
    * doubles); all placement moments are exact decimal sums; AUCs are
    * exact integer divisions; z is ONE fixed-order double expression,
    * nano-quantized. Degenerate classes (< 2 members) report z = 0.
    *
    * Scale: four rank windows (two global, two class-partitioned) over
    * the scored table + one combinable moment aggregate. The global
    * windows are the one single-reducer stage — at corpus scale the
    * scored table is an eval SAMPLE by construction (the ly1
    * bounded-input convention); rr1's distributed-rank machinery is
    * the fallback when it is not.
    */
  def deLongAucTest(df: DataFrame, scoreACol: String, scoreBCol: String,
                    labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(scoreACol).cast("long").as("sa"),
      col(scoreBCol).cast("long").as("sb"),
      when(col(labelCol), 1L).otherwise(0L).as("y"))
    def r2(scoreCol: String, parts: Seq[String]): Column = {
      val wR = if (parts.isEmpty) Window.orderBy(scoreCol)
        else Window.partitionBy(parts.map(col): _*).orderBy(scoreCol)
      val wC = if (parts.isEmpty) Window.partitionBy(scoreCol)
        else Window.partitionBy((parts :+ scoreCol).map(col): _*)
      lit(2L) * rank().over(wR).cast("long") +
        count(lit(1)).over(wC).cast("long") - lit(1L)
    }
    val placed = base
      .withColumn("pa", r2("sa", Nil) - r2("sa", Seq("y")))
      .withColumn("pb", r2("sb", Nil) - r2("sb", Seq("y")))
    val m = placed.agg(
      sum(when(col("y") === 1L, 1L).otherwise(0L)).cast("long").as("n1"),
      sum(when(col("y") === 0L, 1L).otherwise(0L)).cast("long").as("n0"),
      sum(when(col("y") === 1L, dec(col("pa"))).otherwise(dec(lit(0)))).as("sa1"),
      sum(when(col("y") === 1L, dec(col("pb"))).otherwise(dec(lit(0)))).as("sb1"),
      sum(when(col("y") === 1L, dec(col("pa")) * dec(col("pa")))
        .otherwise(dec(lit(0)))).as("qaa1"),
      sum(when(col("y") === 1L, dec(col("pb")) * dec(col("pb")))
        .otherwise(dec(lit(0)))).as("qbb1"),
      sum(when(col("y") === 1L, dec(col("pa")) * dec(col("pb")))
        .otherwise(dec(lit(0)))).as("qab1"),
      sum(when(col("y") === 0L, dec(col("pa"))).otherwise(dec(lit(0)))).as("sa0"),
      sum(when(col("y") === 0L, dec(col("pb"))).otherwise(dec(lit(0)))).as("sb0"),
      sum(when(col("y") === 0L, dec(col("pa")) * dec(col("pa")))
        .otherwise(dec(lit(0)))).as("qaa0"),
      sum(when(col("y") === 0L, dec(col("pb")) * dec(col("pb")))
        .otherwise(dec(lit(0)))).as("qbb0"),
      sum(when(col("y") === 0L, dec(col("pa")) * dec(col("pb")))
        .otherwise(dec(lit(0)))).as("qab0"))
    val (n1d, n0d) = (col("n1").cast("double"), col("n0").cast("double"))
    def covTerm(q: String, sx: String, sz: String, n: Column) =
      col(q).cast("double") - col(sx).cast("double") *
        col(sz).cast("double") / n
    // Var(AUC_A − AUC_B) = S10 part over positives + S01 over negatives
    val v10 = (covTerm("qaa1", "sa1", "sa1", n1d) +
      covTerm("qbb1", "sb1", "sb1", n1d) -
      lit(2.0) * covTerm("qab1", "sa1", "sb1", n1d)) /
      ((n1d - 1.0) * lit(4.0) * n0d * n0d * n1d)
    val v01 = (covTerm("qaa0", "sa0", "sa0", n0d) +
      covTerm("qbb0", "sb0", "sb0", n0d) -
      lit(2.0) * covTerm("qab0", "sa0", "sb0", n0d)) /
      ((n0d - 1.0) * lit(4.0) * n1d * n1d * n0d)
    val aucA = col("sa1").cast("double") / (lit(2.0) * n1d * n0d)
    val aucB = col("sb1").cast("double") / (lit(2.0) * n1d * n0d)
    val vtot = v10 + v01
    m.select(col("n1").as("n_pos"), col("n0").as("n_neg"),
      expr("CAST((sa1 * 1000000) div (2 * CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)")
        .as("auc_a_micro"),
      expr("CAST((sb1 * 1000000) div (2 * CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)")
        .as("auc_b_micro"),
      when(col("n1") >= 2L && col("n0") >= 2L && vtot > 0.0,
        floor((aucA - aucB) / sqrt(vtot) * lit(1e9) + lit(0.5)).cast("long"))
        .otherwise(lit(0L)).as("z_nano"),
      when(col("n1") >= 2L && col("n0") >= 2L && vtot > 0.0,
        abs((aucA - aucB) / sqrt(vtot)) > 1.96).otherwise(lit(false))
        .as("significant"))
  }

  /** Murphy (1973) decomposition of the Brier score over probability
    * bins: `BS = uncertainty + reliability − resolution (+ within-bin
    * residual)` — splits a probabilistic scorer's squared error into
    * "how miscalibrated are the bins" (reliability, lower better) vs
    * "how much do the bins separate outcomes" (resolution, higher
    * better) vs the outcome base-rate entropy no scorer can beat
    * (uncertainty). The diagnosis layer on top of a calibration table:
    * ECE says THE BINS ARE OFF, this says how much of the total error
    * that explains. With continuous scores binned, the classical
    * identity holds up to a within-bin variance residual, emitted
    * explicitly as `residual = bs − (reliability − resolution +
    * uncertainty)` rather than silently folded in.
    *
    * Determinism: scores quantize to MICRO once; per-bin sums are
    * exact longs/decimals; each bin's reliability/resolution term is
    * a fixed-order double from exact integers, PICO-QUANTIZED before
    * the bins-sized order-free sum (the js1 discipline); the four
    * display ratios are single fixed-order double expressions.
    *
    * Scale: ONE combinable bin pass; everything after is bins-sized.
    */
  def brierDecomposition(df: DataFrame, scoreCol: String,
                         labelCol: String, bins: Int = 10): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val q = df.select(
      floor(col(scoreCol) * lit(1e6) + lit(0.5)).cast("long").as("s"),
      when(col(labelCol), 1L).otherwise(0L).as("y"))
    val per = q
      .withColumn("b", least(expr(s"(s * ${bins}L) div 1000000L"),
        lit(bins - 1L)))
      .groupBy("b")
      .agg(count(lit(1)).cast("long").as("nb"),
        sum("s").cast("long").as("sb"),
        sum("y").cast("long").as("ob"),
        sum(dec(col("s") - lit(1000000L) * col("y")) *
          dec(col("s") - lit(1000000L) * col("y"))).as("sq"))
    val tot = per.agg(sum("nb").cast("long").as("n"),
      sum("ob").cast("long").as("o"),
      sum(dec(col("sq"))).as("sq_tot"),
      count(lit(1)).cast("long").as("bins_used"))
    val nd = (c: Column) => c.cast("double")
    val terms = per.crossJoin(broadcast(tot))
      // f_b − ō_b in probability units: (sb − 1e6·ob)/(1e6·nb)
      .withColumn("rel_pico", floor(
        pow(nd(col("sb")) - lit(1e6) * nd(col("ob")), 2.0) /
          (nd(col("nb")) * lit(1e12)) * lit(1e12) + lit(0.5)).cast("long"))
      // ō_b − ō = ob/nb − o/n = (ob·n − o·nb)/(nb·n)
      .withColumn("res_pico", floor(
        pow(nd(col("ob")) * nd(col("n")) - nd(col("o")) * nd(col("nb")), 2.0) /
          (nd(col("nb")) * nd(col("n")) * nd(col("n"))) * lit(1e12) + lit(0.5))
        .cast("long"))
    terms
      .groupBy("n", "o", "sq_tot", "bins_used")
      .agg(sum("rel_pico").cast("long").as("rel_sum"),
        sum("res_pico").cast("long").as("res_sum"))
      // nano-long display of the four ratios + residual (floor(x·10⁹
      // +0.5) of identical fixed-order doubles in both engines):
      // exact integers survive any comparator precision
      .select(col("n"), col("bins_used"),
        floor(nd(col("sq_tot")) / (nd(col("n")) * lit(1e12)) * lit(1e9) +
          lit(0.5)).cast("long").as("bs_nano"),
        floor(nd(col("rel_sum")) / (nd(col("n")) * lit(1e12)) * lit(1e9) +
          lit(0.5)).cast("long").as("reliability_nano"),
        floor(nd(col("res_sum")) / (nd(col("n")) * lit(1e12)) * lit(1e9) +
          lit(0.5)).cast("long").as("resolution_nano"),
        floor(nd(col("o")) / nd(col("n")) *
          (lit(1.0) - nd(col("o")) / nd(col("n"))) * lit(1e9) + lit(0.5))
          .cast("long").as("uncertainty_nano"),
        floor((nd(col("sq_tot")) / (nd(col("n")) * lit(1e12)) -
          (nd(col("rel_sum")) / (nd(col("n")) * lit(1e12)) -
            nd(col("res_sum")) / (nd(col("n")) * lit(1e12)) +
            nd(col("o")) / nd(col("n")) *
              (lit(1.0) - nd(col("o")) / nd(col("n"))))) * lit(1e9) +
          lit(0.5)).cast("long").as("residual_nano"))
  }

  /** Group-fairness audit of a binary decision (Hardt, Price, Srebro,
    * NeurIPS'16 "Equality of Opportunity in Supervised Learning" for
    * equalized odds; Feldman et al. KDD'15 for disparate impact): per
    * protected group, the selection rate, TPR and FPR, plus the
    * cross-group gaps a release gate actually checks — the
    * disparate-impact RATIO of selection rates against the reference
    * group (the four-fifths rule compares this to 0.8) and the
    * equalized-odds gap `max(|ΔTPR|, |ΔFPR|)`. In a data pipeline this
    * audits a FILTER (quality gate, toxicity cut) against a slice
    * column: a gate that silently drops one language's documents at
    * 3× the rate of another's is a mixture bug before it is anything
    * else.
    *
    * The reference group is the largest group (ties to the
    * lexicographically smallest name) — the "majority baseline" both
    * cited papers use.
    *
    * Determinism: all rates are exact integer micro divisions of exact
    * counts; gaps are integer arithmetic on those micro rates.
    * Scale: ONE combinable (group) count shuffle; the groups-bounded
    * table then broadcast-joins the single reference row.
    */
  def fairnessAudit(df: DataFrame, groupCol: String, decisionCol: String,
                    outcomeCol: String): DataFrame = {
    val g = df.select(col(groupCol).cast("string").as("grp"),
      col(decisionCol).cast("boolean").as("d"),
      col(outcomeCol).cast("boolean").as("y"))
    val per = g.groupBy("grp").agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col("d"), 1L).otherwise(0L)).cast("long").as("n_sel"),
      sum(when(col("y"), 1L).otherwise(0L)).cast("long").as("n_pos"),
      sum(when(col("d") && col("y"), 1L).otherwise(0L)).cast("long").as("n_tp"),
      sum(when(col("d") && !col("y"), 1L).otherwise(0L)).cast("long").as("n_fp"))
      .withColumn("sel_micro", expr("(n_sel * 1000000L) div n"))
      .withColumn("tpr_micro",
        expr("CASE WHEN n_pos = 0 THEN 0 ELSE (n_tp * 1000000L) div n_pos END"))
      .withColumn("fpr_micro",
        expr("""CASE WHEN n = n_pos THEN 0
               |  ELSE (n_fp * 1000000L) div (n - n_pos) END""".stripMargin))
    val ref = per.orderBy(col("n").desc, col("grp").asc).limit(1)
      .select(col("grp").as("ref_grp"), col("sel_micro").as("ref_sel"),
        col("tpr_micro").as("ref_tpr"), col("fpr_micro").as("ref_fpr"))
    per.crossJoin(broadcast(ref))
      .select(col("grp"), col("n"), col("n_sel"),
        col("sel_micro"), col("tpr_micro"), col("fpr_micro"),
        col("ref_grp"),
        expr("""CASE WHEN ref_sel = 0 THEN 1000000L
               |  ELSE (sel_micro * 1000000L) div ref_sel END""".stripMargin)
          .as("di_ratio_micro"),
        greatest(abs(col("tpr_micro") - col("ref_tpr")),
          abs(col("fpr_micro") - col("ref_fpr"))).as("eo_gap_micro"))
  }
}
