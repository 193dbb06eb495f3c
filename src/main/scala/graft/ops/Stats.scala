package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inference-grade statistics over grouped data: the two-sample Welch
  * t-test (continuous A/B comparison, the companion of st3's chi-square
  * for categorical independence), Cohen's kappa (inter-labeler
  * agreement — the standard QA gate when two annotation pipelines
  * disagree), and column-level mutual information (corpus-composition
  * dependence audit).
  *
  * Determinism design shared by all three: every floating-point value
  * derives from EXACT integer aggregates (micro-quantized observations
  * summed as decimal(38,0); confusion/contingency cells as longs),
  * combined in a fixed scalar expression order — so results are
  * bit-reproducible across engines and across cluster repartitionings.
  * No per-row double is ever summed across rows; where a vocabulary-
  * wide sum of float terms is unavoidable (MI), each term is quantized
  * to pico-units first and the longs sum order-free (the js1 pattern).
  */
object Stats {

  /** Welch's unequal-variance two-sample t-test between the rows where
    * `armCol` = `armA` and those where it equals `armB`.
    *
    * Observations quantize to micro-units (`floor(x·1e6 + 0.5)` — one
    * IEEE multiply + add + floor on the raw double, identical in any
    * engine) and the three moments (n, Σq, Σq²) accumulate as exact
    * integers in ONE combinable aggregate pass — map-side partials,
    * ~two rows shuffled total, any corpus size. Mean/variance/t/df
    * then come from the closed forms in quantized units, cast to
    * double in a fixed order.
    *
    * Output: one row — n/mean/var per arm (means in original units,
    * round-6 for display), `t_stat`, Welch–Satterthwaite `df_welch`,
    * and the |t| > 1.96 significance indicator.
    */
  def welchTTest(df: DataFrame, valueCol: String, armCol: String,
                 armA: String, armB: String): DataFrame = {
    val q = floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("decimal(38,0)")
    val isA = col(armCol) === armA
    val isB = col(armCol) === armB
    val m = df.filter(isA || isB).agg(
      sum(when(isA, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(isB, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when(isA, q).otherwise(lit(0).cast("decimal(38,0)"))).as("s_a"),
      sum(when(isB, q).otherwise(lit(0).cast("decimal(38,0)"))).as("s_b"),
      sum(when(isA, q * q).otherwise(lit(0).cast("decimal(38,0)"))).as("ss_a"),
      sum(when(isB, q * q).otherwise(lit(0).cast("decimal(38,0)"))).as("ss_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val (sa, sb) = (col("s_a").cast("double"), col("s_b").cast("double"))
    val (ssa, ssb) = (col("ss_a").cast("double"), col("ss_b").cast("double"))
    // sample variances in micro-unit² (exact integer numerators)
    val varA = (ssa - sa * sa / na) / (na - 1.0)
    val varB = (ssb - sb * sb / nb) / (nb - 1.0)
    val se2 = varA / na + varB / nb // squared standard error
    val t = (sa / na - sb / nb) / sqrt(se2)
    val dfW = se2 * se2 /
      ((varA / na) * (varA / na) / (na - 1.0) + (varB / nb) * (varB / nb) / (nb - 1.0))
    m.select(col("n_a"), col("n_b"),
      round(sa / na / 1e6, 6).as("mean_a"),
      round(sb / nb / 1e6, 6).as("mean_b"),
      round(varA / 1e12, 6).as("var_a"),
      round(varB / 1e12, 6).as("var_b"),
      t.as("t_stat"),
      dfW.as("df_welch"),
      (abs(t) > 1.96).as("significant"))
  }

  /** Cohen's kappa between two label columns of the same rows — the
    * chance-corrected agreement `κ = (p_o − p_e) / (1 − p_e)` where
    * `p_o` is observed agreement and `p_e = Σ_c p_a(c)·p_b(c)` the
    * agreement expected if the two labelers were independent.
    *
    * Output: the full confusion matrix (one row per observed
    * (label_a, label_b) cell, exact long count) with the scalar
    * n / p_o / κ columns carried on every row, so the oracle
    * value-checks the entire matrix AND the statistic in one table.
    *
    * Scale: one combinable (label_a, label_b) count shuffle — cells,
    * not rows, move; marginals and the p_e cross-sum reduce the
    * already-tiny cell table. The label vocabulary bounds every
    * post-shuffle stage.
    */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("label_a"), col(colB).as("label_b"))
      .agg(count(lit(1)).cast("long").as("n_cell")).persist()
    val n = cells.agg(sum("n_cell").cast("long").as("n"))
    val agree = cells.filter(col("label_a") === col("label_b"))
      .agg(coalesce(sum("n_cell"), lit(0L)).cast("long").as("n_agree"))
    val ma = cells.groupBy("label_a").agg(sum("n_cell").cast("long").as("n_a"))
    val mb = cells.groupBy("label_b").agg(sum("n_cell").cast("long").as("n_b"))
    // Σ_c n_a(c)·n_b(c): exact integer (products of longs fit decimal)
    val pe = ma.join(mb, col("label_a") === col("label_b"))
      .agg(coalesce(sum(col("n_a").cast("decimal(38,0)") * col("n_b").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("pe_num"))
    val scalars = n.crossJoin(agree).crossJoin(pe)
      .withColumn("p_o", col("n_agree").cast("double") / col("n").cast("double"))
      .withColumn("p_e", col("pe_num").cast("double") /
        (col("n").cast("double") * col("n").cast("double")))
      .withColumn("kappa", (col("p_o") - col("p_e")) / (lit(1.0) - col("p_e")))
      .select("n", "p_o", "p_e", "kappa")
    cells.crossJoin(broadcast(scalars))
      .select(col("label_a"), col("label_b"), col("n_cell"),
        col("n"), round(col("p_o"), 9).as("p_o"),
        round(col("p_e"), 9).as("p_e"), round(col("kappa"), 9).as("kappa"))
  }

  /** Mutual information between two categorical columns —
    * `I(A;B) = Σ_{a,b} p(a,b)·ln(p(a,b)/(p(a)p(b)))` — plus the
    * min-entropy-normalized NMI, the composition-audit statistic that
    * answers "does `source` determine `lang`?" more directly than
    * st3's chi-square (MI is in interpretable nats and normalizes to
    * [0,1]).
    *
    * Per-cell contributions quantize to pico-units before the
    * vocabulary-wide sum (order-free longs — the js1 pattern), so the
    * total is bit-stable. Entropies H(A), H(B) quantize the same way.
    * Output: one row per observed cell (exact counts + round-9
    * contribution) with mi_total / nmi carried on every row.
    *
    * Scale: identical shape to [[cohenKappa]] — one combinable cell
    * count shuffle; everything after is vocabulary-sized.
    */
  def columnMi(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).cast("long").as("n_ab")).persist()
    val n = cells.agg(sum("n_ab").cast("long").as("n"))
    val ma = cells.groupBy("a").agg(sum("n_ab").cast("long").as("n_a"))
    val mb = cells.groupBy("b").agg(sum("n_ab").cast("long").as("n_b"))
    val nd = col("n").cast("double")
    val joint = cells.join(ma, "a").join(mb, "b").crossJoin(broadcast(n))
      .withColumn("p_ab", col("n_ab").cast("double") / nd)
      .withColumn("mi_term", col("p_ab") *
        log(col("p_ab") / (col("n_a").cast("double") / nd * (col("n_b").cast("double") / nd))))
      .withColumn("mi_pico", floor(col("mi_term") * lit(1e12) + lit(0.5)).cast("long"))
      .persist()
    val miSum = joint.agg(sum("mi_pico").cast("long").as("mi_pico_sum"))
    def entPico(marg: DataFrame, cnt: String) = marg.crossJoin(n)
      .withColumn("p", col(cnt).cast("double") / nd)
      .withColumn("h_pico", floor(-col("p") * log(col("p")) * lit(1e12) + lit(0.5)).cast("long"))
      .agg(sum("h_pico").cast("long"))
    val hA = entPico(ma, "n_a").collect()(0).getLong(0)
    val hB = entPico(mb, "n_b").collect()(0).getLong(0)
    val hMin = math.min(hA, hB)
    joint.crossJoin(broadcast(miSum))
      .withColumn("mi_total", round(col("mi_pico_sum").cast("double") / 1e12, 9))
      .withColumn("nmi", round(col("mi_pico_sum").cast("double") / lit(hMin.toDouble), 9))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("mi_term"), 9).as("mi_term"), col("mi_total"), col("nmi"))
  }

  /** Pairwise audience overlap between segments: for every segment
    * pair, the EXACT distinct-member intersection, union, and Jaccard
    * — plus an HLL-sketch inclusion–exclusion estimate of the same
    * intersection reduced to a deterministic bound-check boolean (the
    * ag1 discipline: exact columns carry the hash, sketch accuracy is
    * asserted, not emitted).
    *
    * Exact path: distinct (segment, member) — one combinable dedup
    * shuffle — then a per-member self-join. A member in `s` segments
    * yields `s·(s−1)/2` pair rows, so the join output is bounded by
    * members × segments², NOT members² — the segment vocabulary is
    * small by construction. Sketch path: one `hll_sketch_agg` per
    * segment (mergeable pre-aggregate, the 100 TB route where members
    * no longer fit a shuffle), pairwise `hll_union` for the union
    * estimate, intersection by inclusion–exclusion.
    */
  def audienceOverlap(df: DataFrame, segmentCol: String, memberCol: String,
                      tolerance: Double = 0.05): DataFrame = {
    val sm = df.select(col(segmentCol).as("seg"), col(memberCol).as("m")).distinct()
      .persist()
    val sizes = sm.groupBy("seg").agg(count(lit(1)).cast("long").as("n"))
    val inter = sm.as("x").join(sm.as("y"),
        col("x.m") === col("y.m") && col("x.seg") < col("y.seg"))
      .groupBy(col("x.seg").as("seg_a"), col("y.seg").as("seg_b"))
      .agg(count(lit(1)).cast("long").as("n_inter"))
    val sketches = sm.groupBy("seg")
      .agg(expr("hll_sketch_agg(m, 14)").as("sk"),
        count(lit(1)).cast("long").as("n_sk"))
    val skPairs = sketches.as("p").join(sketches.as("q"), col("p.seg") < col("q.seg"))
      .select(col("p.seg").as("seg_a"), col("q.seg").as("seg_b"),
        expr("hll_sketch_estimate(hll_union(p.sk, q.sk))").as("est_union"),
        expr("hll_sketch_estimate(p.sk)").as("est_a"),
        expr("hll_sketch_estimate(q.sk)").as("est_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    inter
      .join(sizes.select(col("seg").as("seg_a"), col("n").as("n_a")), "seg_a")
      .join(sizes.select(col("seg").as("seg_b"), col("n").as("n_b")), "seg_b")
      .join(skPairs, Seq("seg_a", "seg_b"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("est_inter", col("est_a") + col("est_b") - col("est_union"))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("n_union"),
        (col("n_inter").cast("double") / col("n_union").cast("double")).as("jaccard"),
        (abs(col("est_inter") - col("n_inter").cast("double")) <=
          lit(tolerance) * col("n_union").cast("double") + lit(8.0)).as("sketch_inter_ok"),
        (abs(col("est_union") - col("n_union").cast("double")) <=
          lit(tolerance) * col("n_union").cast("double") + lit(8.0)).as("sketch_union_ok"))
  }

  /** KMV/theta sketch set operations (Bar-Yossef et al. RANDOM'02;
    * Dasgupta et al.'s theta framework): per segment keep the k
    * SMALLEST 60-bit member hashes; θ = the k-th value. Unlike HLL
    * (ao1), theta sketches support INTERSECTION and A-NOT-B directly —
    * count the signature hashes below θ* = min(θ_A, θ_B) that fall in
    * the wanted region and scale by 2⁶⁰/θ* — which is what a
    * cross-corpus audit needs ("how many documents are in crawl A but
    * not crawl B?") without |A∪B|-sized exact joins.
    *
    * Determinism: signatures are exact integer hash sets (md5-60, the
    * portable-coin discipline); every estimator is ONE fixed-order
    * double expression over exact longs, round-6 display; sets smaller
    * than k are EXACT (θ = 2⁶⁰), the standard small-set rule. The
    * exact n_a/n_b/inter/union columns (cheap at gate scale) feed the
    * in-plan ±4/√(k−2) accuracy booleans — at corpus scale only the
    * signature legs run.
    *
    * Scale: ONE distinct (seg, hash) shuffle + a per-seg top-k window;
    * signatures are k longs per segment, so every pairwise op is
    * segments²·k-bounded.
    */
  def kmvThetaSetOps(df: DataFrame, segCol: String, memberCol: String,
                     k: Int = 256): DataFrame = {
    // sm/sig/pairs are lazy cache entries shared by the multiple
    // set-op legs of one returned plan (sig feeds 4 legs, pairs 3);
    // callers in long-lived sessions release them via clearCache() —
    // the calibrationReport contract.
    val TWO60 = 1152921504606846976L
    val sm = df.select(col(segCol).cast("string").as("seg"),
        Dedup.md5Hash60(col(memberCol).cast("string")).as("h"))
      .distinct().persist()
    val sig = sm.withColumn("r",
        row_number().over(Window.partitionBy("seg").orderBy("h")))
      .filter(col("r") <= k).drop("r").persist()
    val per = sig.groupBy("seg")
      .agg(count(lit(1)).cast("long").as("n_sig"), max("h").as("kth"))
      .withColumn("theta",
        when(col("n_sig") < k, lit(TWO60)).otherwise(col("kth")))
      .withColumn("est", when(col("n_sig") < k, col("n_sig").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(TWO60.toDouble) /
          col("kth").cast("double")))
    val pairs = per.as("a").join(per.as("b"), col("a.seg") < col("b.seg"))
      .select(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"),
        least(col("a.theta"), col("b.theta")).as("th"),
        col("a.est").as("est_a"), col("b.est").as("est_b"))
      .persist()
    def sigAs(side: String) = sig
      .select(col("seg").as(side), col("h"))
    // signature hashes below θ*, split by membership in the other side
    val aBelow = pairs.select("seg_a", "seg_b", "th")
      .join(sigAs("seg_a"), Seq("seg_a")).filter(col("h") < col("th"))
    val commonBelow = aBelow
      .join(sigAs("seg_b"), Seq("seg_b", "h"), "left_semi")
      .groupBy("seg_a", "seg_b").agg(count(lit(1)).cast("long").as("c_inter"))
    val aOnlyBelow = aBelow
      .join(sigAs("seg_b"), Seq("seg_b", "h"), "left_anti")
      .groupBy("seg_a", "seg_b").agg(count(lit(1)).cast("long").as("c_aonly"))
    // merged union sketch per pair
    val mergedSig = pairs.select("seg_a", "seg_b")
      .join(sigAs("seg_a"), Seq("seg_a"))
      .unionByName(pairs.select("seg_a", "seg_b")
        .join(sigAs("seg_b"), Seq("seg_b"))
        .select(col("seg_a"), col("seg_b"), col("h")))
      .distinct()
      .withColumn("r", row_number().over(
        Window.partitionBy("seg_a", "seg_b").orderBy("h")))
      .filter(col("r") <= k)
    val mergedPer = mergedSig.groupBy("seg_a", "seg_b")
      .agg(count(lit(1)).cast("long").as("mn"), max("h").as("mkth"))
      .withColumn("est_union", when(col("mn") < k, col("mn").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(TWO60.toDouble) /
          col("mkth").cast("double")))
    // exact truths (gate-scale audit legs; the production path is the
    // signatures above)
    val sizes = sm.groupBy("seg").agg(count(lit(1)).cast("long").as("n"))
    val exInter = sm.as("x").join(sm.as("y"),
        col("x.h") === col("y.h") && col("x.seg") < col("y.seg"))
      .groupBy(col("x.seg").as("seg_a"), col("y.seg").as("seg_b"))
      .agg(count(lit(1)).cast("long").as("n_inter"))
    val tol = lit(4.0 / math.sqrt((k - 2).toDouble))
    val nu = col("n_union").cast("double")
    pairs
      .join(sizes.select(col("seg").as("seg_a"), col("n").as("n_a")), "seg_a")
      .join(sizes.select(col("seg").as("seg_b"), col("n").as("n_b")), "seg_b")
      .join(exInter, Seq("seg_a", "seg_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .join(commonBelow, Seq("seg_a", "seg_b"), "left")
      .withColumn("c_inter", coalesce(col("c_inter"), lit(0L)))
      .join(aOnlyBelow, Seq("seg_a", "seg_b"), "left")
      .withColumn("c_aonly", coalesce(col("c_aonly"), lit(0L)))
      .join(mergedPer, Seq("seg_a", "seg_b"))
      .withColumn("est_inter", col("c_inter").cast("double") *
        lit(TWO60.toDouble) / col("th").cast("double"))
      .withColumn("est_anotb", col("c_aonly").cast("double") *
        lit(TWO60.toDouble) / col("th").cast("double"))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("n_union"),
        // micro-quantized display (floor(x·10⁶+0.5) of the single-
        // division doubles, bit-identical in both engines) — exact
        // long columns survive any comparator precision (the sur1
        // %.12g lesson: round(x, 6) doubles ≥ ~1e6 lose sub-unit
        // digits to significant-digit canonicalization)
        floor(col("est_a") * lit(1e6) + lit(0.5)).cast("long")
          .as("est_a_micro"),
        floor(col("est_b") * lit(1e6) + lit(0.5)).cast("long")
          .as("est_b_micro"),
        floor(col("est_union") * lit(1e6) + lit(0.5)).cast("long")
          .as("est_union_micro"),
        floor(col("est_inter") * lit(1e6) + lit(0.5)).cast("long")
          .as("est_inter_micro"),
        floor(col("est_anotb") * lit(1e6) + lit(0.5)).cast("long")
          .as("est_anotb_micro"),
        (abs(col("est_union") - nu) <= tol * nu + lit(8.0)).as("ok_union"),
        (abs(col("est_inter") - col("n_inter").cast("double")) <=
          tol * nu + lit(8.0)).as("ok_inter"),
        (abs(col("est_anotb") -
          (col("n_a") - col("n_inter")).cast("double")) <=
          tol * nu + lit(8.0)).as("ok_anotb"))
  }

  /** Per-class classification report against a ground-truth column:
    * confusion totals (tp/fp/fn), precision, recall, F1, plus overall
    * accuracy with its Wilson 95% interval and the macro-F1 — the eval
    * every heuristic classifier in the curation stack (langid, quality
    * LR) needs against labeled data.
    *
    * Determinism: every rate is a SINGLE division of exact integers
    * (`F1 = 2tp/(2tp+fp+fn)` — one exact denominator, not the p·r
    * composition); the Wilson bounds are fixed-order IEEE from the
    * exact accuracy ratio and a z = 1.96 literal; macro-F1 terms
    * pico-quantize before the order-free class sum.
    *
    * Scale: one combinable (label, pred) cell shuffle; everything
    * after is class-vocabulary-sized.
    */
  def classificationReport(df: DataFrame, predCol: String,
                           labelCol: String, z: Double = 1.96): DataFrame = {
    val cells = df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).cast("long").as("n")).persist()
    val predTot = cells.groupBy(col("pred").as("cls"))
      .agg(sum("n").cast("long").as("n_pred"))
    val labelTot = cells.groupBy(col("label").as("cls"))
      .agg(sum("n").cast("long").as("n_label"))
    val diag = cells.filter(col("label") === col("pred"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val perClass = predTot.join(labelTot, Seq("cls"), "full_outer")
      .join(diag, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_label"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("recall", when(col("tp") + col("fn") > 0,
        col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("f1", when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        (lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
        .otherwise(lit(0.0)))
      .persist()
    val scalars = perClass
      .agg(sum("tp").cast("long").as("n_correct"),
        ((sum("tp") + sum("fp"))).cast("long").as("n_total"), // Σ(tp+fp) = N
        count(lit(1)).cast("long").as("n_classes"),
        sum(floor(col("f1") * lit(1e12) + lit(0.5)).cast("long")).as("f1_pico"))
      .withColumn("accuracy",
        col("n_correct").cast("double") / col("n_total").cast("double"))
      .withColumn("macro_f1", round(
        col("f1_pico").cast("double") / col("n_classes").cast("double") / 1e12, 9))
    val nD = col("n_total").cast("double")
    val p = col("accuracy")
    val center = p + lit(z * z) / (lit(2.0) * nD)
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z * z) / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + lit(z * z) / nD
    val withCi = scalars
      .withColumn("wilson_lo", round((center - half) / denom, 9))
      .withColumn("wilson_hi", round((center + half) / denom, 9))
      .select(round(col("accuracy"), 9).as("accuracy"), col("macro_f1"),
        col("wilson_lo"), col("wilson_hi"))
    perClass.crossJoin(broadcast(withCi))
      .select(col("cls"), col("tp"), col("fp"), col("fn"),
        round(col("precision"), 9).as("precision"),
        round(col("recall"), 9).as("recall"),
        round(col("f1"), 9).as("f1"),
        col("accuracy"), col("macro_f1"), col("wilson_lo"), col("wilson_hi"))
  }

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement for ANY
    * fixed number of raters per item — the multi-labeler extension of
    * [[cohenKappa]]. `P̄` is an exact rational (Σᵢ Σ_c n_ic(n_ic−1)
    * over N·n(n−1), all integers); the chance term `P̄e = Σ_c p_c²`
    * pico-quantizes per category before the order-free sum.
    *
    * Scale: one (item, category) count shuffle over the stacked rater
    * columns, then category-vocabulary-sized reductions.
    */
  def fleissKappa(df: DataFrame, idCol: String,
                  raterCols: Seq[String]): DataFrame = {
    val n = raterCols.size
    require(n >= 2, "need at least two raters")
    val long0 = df.select(col(idCol).as("item"),
      explode(array(raterCols.map(col): _*)).as("cat"))
    val nic = long0.groupBy("item", "cat")
      .agg(count(lit(1)).cast("long").as("n_ic")).persist()
    val s = nic.agg(
      sum(col("n_ic") * (col("n_ic") - 1)).cast("long").as("s"),
      countDistinct("item").cast("long").as("n_items"))
    val catTot = nic.groupBy("cat").agg(sum("n_ic").cast("long").as("cat_n"))
    val withP = catTot.crossJoin(broadcast(s))
      .withColumn("p_c", col("cat_n").cast("double") /
        (col("n_items") * n).cast("double"))
      .withColumn("pe_pico",
        floor(col("p_c") * col("p_c") * lit(1e12) + lit(0.5)).cast("long"))
      .persist()
    val scalars = withP.agg(
        first("n_items").as("n_items"), first("s").as("s"),
        sum("pe_pico").cast("long").as("pe_pico_sum"))
      .withColumn("p_bar", col("s").cast("double") /
        (col("n_items") * (n * (n - 1))).cast("double"))
      .withColumn("p_e", col("pe_pico_sum").cast("double") / 1e12)
      .withColumn("kappa",
        (col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")))
      .select(col("n_items"), lit(n).as("n_raters"),
        round(col("p_bar"), 9).as("p_bar"), round(col("p_e"), 9).as("p_e"),
        round(col("kappa"), 9).as("kappa"))
    withP.select(col("cat"), col("cat_n"), round(col("p_c"), 9).as("p_c"))
      .crossJoin(broadcast(scalars))
      .select(col("cat"), col("cat_n"), col("p_c"),
        col("n_items"), col("n_raters"), col("p_bar"), col("p_e"), col("kappa"))
  }

  /** Distributed global ranking: the input sorted by `sortCols` (which
    * MUST include a unique tiebreaker for determinism) with a 0-based
    * dense index column `idx` attached.
    *
    * Deliberately NOT `row_number() over (ORDER BY …)` — a window with
    * no partition key funnels every row through ONE task. This is the
    * scale-right form: `orderBy` plans a range-partitioned sort (every
    * partition works), and `zipWithIndex` assigns contiguous indices
    * with one lightweight count job — no data ever converges on a
    * single reducer. One of the few justified RDD drops in the repo:
    * Spark SQL has no distributed global-rank operator.
    */
  def globalRank(df: DataFrame, sortCols: org.apache.spark.sql.Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add("idx", "long", nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Distributed global PREFIX SUM: the input sorted by `sortCols`
    * (MUST include a unique tiebreaker) with, for each long column in
    * `valueCols`, a running cumulative `cum_<name>` attached
    * (inclusive of the current row).
    *
    * The classic two-pass shape — a range-partitioned sort, one pass
    * for per-partition subtotals (collected: O(partitions) longs on
    * the driver), then a second pass adding each partition's base
    * offset — because `sum() over (ORDER BY …)` with no partition key
    * funnels every row through one reducer, which is exactly the
    * single-task funnel [[globalRank]] exists to avoid. Values must be
    * exact longs so partial order within the pass cannot change the
    * result.
    */
  def prefixSum(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
                valueCols: Seq[String]): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = valueCols.map(c => sorted.schema.fieldIndex(c))
    val partTotals: Array[Array[Long]] = sorted.rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val acc = Array.fill(idx.size)(0L)
        it.foreach(r => idx.zipWithIndex.foreach { case (fi, j) =>
          acc(j) += r.getLong(fi) })
        Iterator((pi, acc))
      }.collect().sortBy(_._1).map(_._2)
    val offsets: Array[Array[Long]] = partTotals.scanLeft(
      Array.fill(idx.size)(0L))((a, b) => a.zip(b).map { case (x, y) => x + y })
    val schema = valueCols.foldLeft(sorted.schema)((s, c) =>
      s.add(s"cum_$c", "long", nullable = false))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      val run = offsets(pi).clone()
      it.map { r =>
        idx.zipWithIndex.foreach { case (fi, j) => run(j) += r.getLong(fi) }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ run.toSeq)
      }
    }
    val out = df.sparkSession.createDataFrame(rdd, schema)
      .localCheckpoint(true)
    sorted.unpersist()
    out
  }

  /** Benford's-law audit of a positive numeric column (Newcomb 1881,
    * Benford 1938; the standard fabricated-data / fraud screen): the
    * observed first-significant-digit distribution against the
    * log10(1+1/d) expectation, with the chi-square statistic and the
    * mean absolute deviation (Nigrini's MAD) attached to every row.
    *
    * Determinism: values quantize to integer cents and the first digit
    * comes from the LONG's decimal string — no log10/float extraction
    * in either engine. The nine expected shares are DRIVER-COMPUTED
    * literals ([[benfordExpected]]), chi² / MAD cell terms
    * pico-quantize before their 9-term order-free sums.
    *
    * Scale: one combinable 9-cell count shuffle; everything after is
    * nine rows.
    */
  def benfordExpected: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val digits = df.filter(col(valueCol) > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).cast("long").as("n_d"))
    val n = digits.agg(sum("n_d").cast("long").as("n"))
    val expArr = array(benfordExpected.map(lit): _*)
    val cells = digits.crossJoin(broadcast(n))
      .withColumn("expected_p", element_at(expArr, col("digit")))
      .withColumn("share", col("n_d").cast("double") / col("n").cast("double"))
      .withColumn("chi2_pico", floor(
        (col("n_d").cast("double") - col("n").cast("double") * col("expected_p")) *
          (col("n_d").cast("double") - col("n").cast("double") * col("expected_p")) /
          (col("n").cast("double") * col("expected_p")) * lit(1e12) + lit(0.5)).cast("long"))
      .withColumn("mad_pico",
        floor(abs(col("share") - col("expected_p")) * lit(1e12) + lit(0.5)).cast("long"))
      .persist()
    val scalars = cells.agg(
      (sum(col("chi2_pico")).cast("double") / 1e12).as("chi2"),
      (sum(col("mad_pico")).cast("double") / lit(9.0) / 1e12).as("mad"))
    cells.crossJoin(broadcast(scalars))
      .select(col("digit"), col("n_d"), col("n"),
        round(col("share"), 9).as("share"),
        round(col("expected_p"), 9).as("expected_p"),
        round(col("chi2"), 6).as("chi2"), round(col("mad"), 9).as("mad"))
  }

  /** Gini coefficient of a value distribution (Gini 1912, via the
    * rank formula `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` over values
    * sorted ascending, 1-based ranks) — the concentration audit:
    * "what share of revenue/tokens does the head hold?"
    *
    * `valueCol` must already be an exact integer quantization of the
    * measure (e.g. revenue in 1e-4 units): rank products then
    * accumulate as decimal(38,0), so numerator and denominator are
    * EXACT integers (the oracle mirrors them in HUGEINT) and the one
    * final division is the only float op. Ranking is [[globalRank]] —
    * range-partitioned sort + zipWithIndex, no single-reducer window.
    */
  def gini(df: DataFrame, valueCol: String, tieCol: String): DataFrame = {
    val ranked = globalRank(
      df.select(col(valueCol).cast("long").as("x"), col(tieCol).as("tb")),
      col("x").asc, col("tb").asc)
    val m = ranked.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum((col("idx") + 1).cast("decimal(38,0)") * col("x").cast("decimal(38,0)")).as("six"))
    m.select(col("n"), col("sx").cast("long").as("total_q"),
      round((lit(2.0) * col("six").cast("double") -
        (col("n") + 1).cast("double") * col("sx").cast("double")) /
        (col("n").cast("double") * col("sx").cast("double")), 9).as("gini"))
  }

  /** Split-conformal quality gate (Vovk et al.; the distribution-free
    * coverage guarantee): on the CALIBRATION split, take the k-th
    * smallest score with `k = floor(α·(n_cal+1))` as the threshold τ —
    * then P(score_new ≥ τ) ≥ 1−α for exchangeable data. Emits τ and
    * the EVALUATION split's empirical coverage, the honest check that
    * the guarantee held.
    *
    * The order statistic comes from [[globalRank]] + one index filter
    * — distributed selection, no driver-side sort, no approximate
    * percentile standing in for the exact rank the guarantee needs.
    */
  def conformalGate(cal: DataFrame, eval: DataFrame, scoreCol: String,
                    tieCol: String, alpha: Double = 0.1,
                    minCoverage: Double = 0.85): DataFrame = {
    val nCal = cal.count()
    val k = math.max(1L, math.floor(alpha * (nCal + 1)).toLong)
    val tauRow = globalRank(cal.select(col(scoreCol).as("s"), col(tieCol).as("tb")),
        col("s").asc, col("tb").asc)
      .filter(col("idx") === k - 1).select(col("s")).collect()
    require(tauRow.nonEmpty, s"calibration split too small for alpha=$alpha")
    val tau = tauRow(0).getDouble(0)
    eval.agg(
        count(lit(1)).cast("long").as("n_eval"),
        sum(when(col(scoreCol) >= tau, 1L).otherwise(0L)).cast("long").as("n_covered"))
      .select(lit(nCal).as("n_cal"), lit(k).as("k"), lit(tau).as("tau"),
        col("n_eval"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_eval").cast("double")).as("coverage"),
        (col("n_covered").cast("double") / col("n_eval").cast("double") >=
          lit(minCoverage)).as("coverage_ok"))
  }

  /** Mondrian (group-conditional) split conformal (Vovk et al. '05
    * §4.5; Romano et al. '20 popularized the "conformal with groups"
    * form): [[conformalGate]] computed PER GROUP — each group g gets
    * its own quantile threshold `τ_g` = the k_g-th smallest
    * calibration score with `k_g = max(1, ⌊α(n_g+1)⌋)`, so the
    * (1−α) coverage guarantee holds WITHIN every group, not just
    * marginally. The fairness-aware gate: a marginal τ can silently
    * undercover a minority slice (exactly the failure fair1 audits);
    * Mondrian buys the per-group guarantee at the price of wider
    * groups-bounded thresholds.
    *
    * Determinism: scores micro-quantize BEFORE ranking (integer total
    * order with the tie column); k_g, τ_g, and every coverage rate
    * are exact integer arithmetic.
    *
    * Scale: one per-group rank window over the CALIBRATION split
    * (typically small), one broadcast of the groups-bounded τ table,
    * one combinable eval rollup.
    */
  def mondrianConformal(cal: DataFrame, eval: DataFrame, groupCol: String,
                        scoreCol: String, tieCol: String,
                        alphaMicro: Long = 100000L): DataFrame = {
    require(alphaMicro > 0L && alphaMicro < 1000000L, "alpha in (0, 1)")
    def prep(df: DataFrame) = df.select(col(groupCol).cast("string").as("g"),
      floor(col(scoreCol) * lit(1e6) + lit(0.5)).cast("long").as("s"),
      col(tieCol).cast("long").as("tb"))
    val c = prep(cal)
    val withK = c.groupBy("g").agg(count(lit(1)).cast("long").as("n_cal"))
      .withColumn("k", greatest(lit(1L),
        expr(s"((n_cal + 1L) * ${alphaMicro}L) div 1000000L")))
    val ranked = c.withColumn("idx", row_number().over(
      Window.partitionBy("g").orderBy(col("s").asc, col("tb").asc)).cast("long"))
    val tau = ranked.join(withK, "g")
      .filter(col("idx") === col("k"))
      .select(col("g"), col("n_cal"), col("k"), col("s").as("tau_micro"))
    prep(eval).join(broadcast(tau), "g")
      .groupBy("g", "n_cal", "k", "tau_micro")
      .agg(count(lit(1)).cast("long").as("n_eval"),
        sum(when(col("s") >= col("tau_micro"), 1L).otherwise(0L))
          .cast("long").as("n_covered"))
      .select(col("g").as("grp"), col("n_cal"), col("k"), col("tau_micro"),
        col("n_eval"), col("n_covered"),
        expr("(n_covered * 1000000L) div n_eval").as("coverage_micro"))
  }

  /** Two-sample Kolmogorov–Smirnov test (Smirnov 1939) between the
    * rows where `groupCol` = `groupA` and `groupB`: the supremum
    * distance D between the two empirical CDFs of the INTEGER-valued
    * `valueCol`, with the large-sample α=0.05 critical value
    * `1.358·√((n_a+n_b)/(n_a·n_b))` — the standard distribution-shift
    * gate when a mean test (ab1) can't see shape changes.
    *
    * Exactness: D's numerator is `max |cum_a·n_b − cum_b·n_a|` over
    * distinct values — pure integer arithmetic (decimal(38,0), so the
    * products can't overflow at any corpus size); the two divisions
    * and one sqrt happen once on the final scalar row.
    *
    * Scale: one combinable (value → two counts) shuffle, then the
    * cumulative window runs over the DISTINCT-VALUE table, whose
    * cardinality is the value domain, not the corpus — for unbounded
    * domains pre-bin upstream. Nothing wider than the distinct-value
    * table ever sorts.
    */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
             groupA: String, groupB: String): DataFrame = {
    val isA = col(groupCol) === groupA
    val isB = col(groupCol) === groupB
    val byV = df.filter(isA || isB)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).cast("long").as("c_a"),
           sum(when(isB, 1L).otherwise(0L)).cast("long").as("c_b"))
      .persist()
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(Long.MinValue, 0)
    val cum = byV.select(
      sum(col("c_a")).over(wCum).cast("decimal(38,0)").as("cum_a"),
      sum(col("c_b")).over(wCum).cast("decimal(38,0)").as("cum_b"))
    val tot = byV.agg(sum("c_a").cast("long").as("n_a"),
                      sum("c_b").cast("long").as("n_b"))
    val d = cum.crossJoin(broadcast(tot))
      .agg(max(abs(col("cum_a") * col("n_b").cast("decimal(38,0)") -
                   col("cum_b") * col("n_a").cast("decimal(38,0)")))
             .cast("long").as("d_num"),
           max("n_a").as("n_a"), max("n_b").as("n_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val dStat = col("d_num").cast("double") / (na * nb)
    val crit = lit(1.358) * sqrt((na + nb) / (na * nb))
    d.select(col("n_a"), col("n_b"), col("d_num"),
      round(dStat, 9).as("d_stat"),
      round(crit, 9).as("crit_005"),
      (dStat > crit).as("reject"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) between two
    * arms of a CONTINUOUS metric — the nonparametric companion of
    * [[welchTTest]] for skewed/outlier-heavy metrics where a mean
    * comparison misleads. Tie-corrected normal approximation.
    *
    * Exactness discipline: observations micro-quantize, then ties
    * group exactly by quantized value; average tie ranks live in
    * DOUBLED units (`rank2 = 2·cum_before + t + 1`, always integer),
    * so the rank sum Σ c_a·rank2 and the tie term Σ(t³−t) are exact
    * decimals — order-free across any partitioning. The z-statistic's
    * floats appear once, in one fixed expression.
    *
    * Scale: one combinable (value → counts) shuffle; the exclusive
    * cumulative runs over the distinct-value table (bounded by the
    * quantized value domain — pre-bin if unbounded), never the corpus.
    */
  def mannWhitney(df: DataFrame, valueCol: String, armCol: String,
                  armA: String, armB: String): DataFrame = {
    val isA = col(armCol) === armA
    val isB = col(armCol) === armB
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val byQ = df.filter(isA || isB)
      .select(floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long").as("q"),
              isA.as("in_a"))
      .groupBy("q")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).cast("long").as("c_a"),
           count(lit(1)).cast("long").as("c_t"))
    val wPrev = org.apache.spark.sql.expressions.Window.orderBy("q")
      .rowsBetween(Long.MinValue, -1)
    val ranked = byQ
      .withColumn("cum_before", coalesce(sum(col("c_t")).over(wPrev), lit(0L)))
      .withColumn("rank2", lit(2L) * col("cum_before") + col("c_t") + lit(1L))
    val m = ranked.agg(
      sum("c_a").cast("long").as("n_a"),
      (sum("c_t") - sum("c_a")).cast("long").as("n_b"),
      sum(dec(col("c_a")) * dec(col("rank2"))).as("r_a2"),
      sum(dec(col("c_t")) * dec(col("c_t")) * dec(col("c_t")) - dec(col("c_t")))
        .as("ties"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val nd = (col("n_a") + col("n_b")).cast("double")
    val u2 = col("r_a2").cast("double") - na * (na + lit(1.0)) // doubled U_A
    val varNum = na * nb * ((nd + lit(1.0)) * nd * (nd - lit(1.0)) -
      col("ties").cast("double"))
    val varDen = lit(12.0) * nd * (nd - lit(1.0))
    val z = (u2 - na * nb) / (lit(2.0) * sqrt(varNum / varDen))
    m.select(col("n_a"), col("n_b"),
      round(u2 / lit(2.0), 1).as("u_a"),
      col("ties").cast("long").as("tie_term"),
      round(z, 9).as("z_stat"),
      (abs(z) > lit(1.96)).as("significant"))
  }

  /** Capture–recapture population estimate (Chapman 1951, the
    * bias-corrected Lincoln–Petersen): from two independent capture
    * samples of an unseen universe, `N̂ = (n₁+1)(n₂+1)/(m+1) − 1` with
    * `m` the overlap — the ecology estimator data teams reuse to size
    * a crawl frontier, a dedup universe, or an id space that no single
    * scan can enumerate. Emits the true distinct count of the union
    * too, so the query itself audits the estimator.
    *
    * Exactness: three distinct-count aggregates and one semi-join —
    * all integers; N̂, its SE (Seber 1970 variance) and the ±1.96 CI
    * are fixed-order doubles on the single scalar row.
    *
    * Scale: two distinct-shuffles of bare ids + one semi-join — no
    * payload ever moves; this is exactly the estimator's selling
    * point at 100 TB (sample two slices, never scan the universe).
    */
  def captureRecapture(a: DataFrame, b: DataFrame): DataFrame = {
    val da = a.select(col("id")).distinct().persist()
    val db = b.select(col("id")).distinct().persist()
    val n1 = da.count(); val n2 = db.count()
    val m = da.join(db, "id").count()
    val nTrue = da.unionAll(db).distinct().count()
    da.unpersist(false); db.unpersist(false)
    val spark = a.sparkSession
    import spark.implicits._
    val nHat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    val varHat = (n1 + 1.0) * (n2 + 1.0) * (n1 - m).toDouble * (n2 - m).toDouble /
      ((m + 1.0) * (m + 1.0) * (m + 2.0))
    val se = math.sqrt(varHat)
    // floor(x·k + 0.5)/k on BOTH sides (the repo-wide quantize idiom) —
    // not rint/round, whose half-even vs half-away semantics differ
    def q3(x: Double) = math.floor(x * 1e3 + 0.5) / 1e3
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    Seq((n1, n2, m, nTrue, q3(nHat), q6(se),
        q3(nHat - 1.96 * se), q3(nHat + 1.96 * se)))
      .toDF("n1", "n2", "m", "n_true", "n_hat", "se", "ci_lo", "ci_hi")
  }

  /** Experiment-health report — the pre-readout gate every
    * experimentation platform runs before anyone trusts a lift number:
    *
    *  - SRM (sample-ratio mismatch): χ² of the observed arm split
    *    against 50/50 (Fabijan et al. 2019 — a failed SRM invalidates
    *    the experiment regardless of the metric);
    *  - Wilson score intervals (Wilson 1927) on each arm's conversion
    *    rate — the binomial CI that behaves at small n and extreme p;
    *  - the conversion odds ratio;
    *  - MDE: the minimum detectable absolute effect on the continuous
    *    metric at α=0.05 / 80% power, `(z_{α/2}+z_β)·√(s²_c/n_c +
    *    s²_t/n_t)` — "could this experiment even see the lift we
    *    care about?".
    *
    * z literals (1.96, 0.8416) and the χ² bound (3.841) are inlined
    * identically in both engines. ONE combinable aggregate pass:
    * counts and micro-quantized moments as exact integers, every
    * statistic a fixed-order double expression on the single row.
    */
  def experimentHealth(df: DataFrame, valueCol: String, armCol: String,
                       armA: String, armB: String,
                       convThreshold: Double): DataFrame = {
    val isA = col(armCol) === armA
    val isB = col(armCol) === armB
    val q = floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("decimal(38,0)")
    val zero = lit(0).cast("decimal(38,0)")
    val conv = col(valueCol) > convThreshold
    val m = df.filter(isA || isB).agg(
      sum(when(isA, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(isB, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when(isA && conv, 1L).otherwise(0L)).cast("long").as("conv_a"),
      sum(when(isB && conv, 1L).otherwise(0L)).cast("long").as("conv_b"),
      sum(when(isA, q).otherwise(zero)).as("s_a"),
      sum(when(isB, q).otherwise(zero)).as("s_b"),
      sum(when(isA, q * q).otherwise(zero)).as("ss_a"),
      sum(when(isB, q * q).otherwise(zero)).as("ss_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val e = (na + nb) / lit(2.0)
    val srm = (na - e) * (na - e) / e + (nb - e) * (nb - e) / e
    val (sa, sb) = (col("s_a").cast("double"), col("s_b").cast("double"))
    val (ssa, ssb) = (col("ss_a").cast("double"), col("ss_b").cast("double"))
    val varA = (ssa - sa * sa / na) / (na - 1.0)
    val varB = (ssb - sb * sb / nb) / (nb - 1.0)
    // 1.96 + 0.8416 inlined as the PARSED literal 2.8016 — a Scala
    // `1.96 + 0.8416` could differ from the SQL-parsed constant by an
    // ulp and break the hash match
    val mde = lit(2.8016) * sqrt(varA / na + varB / nb) / lit(1e6)
    def wilson(conv: org.apache.spark.sql.Column,
               n: org.apache.spark.sql.Column) = {
      val z2 = lit(1.96 * 1.96)
      val p = conv.cast("double") / n
      val denom = lit(1.0) + z2 / n
      val center = (p + z2 / (lit(2.0) * n)) / denom
      val half = lit(1.96) * sqrt(p * (lit(1.0) - p) / n +
        z2 / (lit(4.0) * n * n)) / denom
      (center - half, center + half)
    }
    val (wal, wah) = wilson(col("conv_a"), na)
    val (wbl, wbh) = wilson(col("conv_b"), nb)
    // degenerate cells (no conversions / universal conversion) give an
    // undefined OR: emit NaN instead of an ANSI divide-by-zero error
    val orRaw = (col("conv_b").cast("double") * (na - col("conv_a").cast("double"))) /
      (col("conv_a").cast("double") * (nb - col("conv_b").cast("double")))
    val or = when(col("conv_a") > 0 && (col("n_b") - col("conv_b")) > 0, orRaw)
      .otherwise(lit(Double.NaN))
    m.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(srm, 6).as("srm_chi2"), (srm < lit(3.841)).as("srm_ok"),
      round(col("conv_a").cast("double") / na, 6).as("rate_a"),
      round(col("conv_b").cast("double") / nb, 6).as("rate_b"),
      round(wal, 6).as("rate_a_lo"), round(wah, 6).as("rate_a_hi"),
      round(wbl, 6).as("rate_b_lo"), round(wbh, 6).as("rate_b_hi"),
      round(or, 6).as("odds_ratio"),
      round(mde, 6).as("mde_abs"))
  }

  /** Theil–Sen robust regression (Theil 1950, Sen 1968) in the
    * distributed PAIRED variant: rank all points by x, pair rank i
    * with rank i+n/2 (n/2 disjoint wide-baseline pairs — the standard
    * scale-out of the O(n²) all-pairs estimator, and still ~29%-
    * breakdown robust), take the MEDIAN pair slope, then the median
    * residual as intercept. The regression you run when OLS would be
    * dragged by the heavy tail.
    *
    * Determinism: ranking is [[globalRank]] on (x, tiebreak); the one
    * float op is the per-pair slope division (IEEE-exact, then
    * nano-quantized); medians are LOWER medians selected at exact
    * integer rank; the slope·x product divides via a sign-safe floor
    * (both engines agree on non-negative operands).
    *
    * Scale: a range-partitioned sort, one equi-join on rank (long
    * rows), two exact-rank median selections — no all-pairs blowup,
    * no driver-side sort.
    */
  def theilSen(pts: DataFrame): DataFrame = {
    val ranked = globalRank(
      pts.select(col("x_q").cast("long"), col("y_q").cast("long"),
        col("tb").cast("long")),
      col("x_q").asc, col("tb").asc).persist()
    val n = ranked.count()
    val h = n / 2
    val lo = ranked.select(col("idx"), col("x_q").as("xa"), col("y_q").as("ya"))
      .filter(col("idx") < h)
    val hi = ranked.select((col("idx") - h).as("idx"),
      col("x_q").as("xb"), col("y_q").as("yb"))
      .filter(col("idx") >= 0)
    val slopes = lo.join(hi, "idx")
      .filter(col("xb") =!= col("xa"))
      .select(col("idx").as("pid"),
        floor((col("yb") - col("ya")).cast("double") /
          (col("xb") - col("xa")).cast("double") * lit(1e9) + lit(0.5))
          .cast("long").as("s"))
      .persist()
    val m = slopes.count()
    require(m > 0, "theilSen: no pairs with distinct x")
    val kS = (m + 1) / 2
    val slope = globalRank(slopes, col("s").asc, col("pid").asc)
      .filter(col("idx") === kS - 1).select(col("s")).head().getLong(0)
    // residuals: y − slope·x/1e9 — sign-safe division (both engines
    // only ever divide NON-NEGATIVE operands, where Spark's truncating
    // `div` and DuckDB's flooring `//` agree; sign reapplied outside)
    val shifted = when(lit(slope) * col("x_q") >= 0,
        expr(s"(${slope}L * x_q) div 1000000000L"))
      .otherwise(-expr(s"(-(${slope}L * x_q)) div 1000000000L"))
    val res = ranked.select((col("y_q") - shifted).cast("long").as("r"),
      col("tb"))
    val kI = (n + 1) / 2
    val intercept = globalRank(res, col("r").asc, col("tb").asc)
      .filter(col("idx") === kI - 1).select(col("r")).head().getLong(0)
    ranked.unpersist(false); slopes.unpersist(false)
    val spark = pts.sparkSession
    import spark.implicits._
    Seq((n, m, slope / 1e9, intercept / 1e6))
      .toDF("n", "n_pairs", "slope", "intercept")
  }

  /** Kaplan–Meier survival estimator (Kaplan & Meier, JASA 1958) over
    * a labeled lifetime table `(t: integer time-to-event, cens:
    * boolean)` — right-censored rows (`cens = true`: the event was NOT
    * observed by study end) leave the risk set without a death, the
    * correction that makes the curve unbiased where "drop the
    * incomplete rows" would bias survival down. The churn-retention /
    * time-to-completion curve: `S(t) = Π_{death times ≤ t}
    * (n_i − d_i)/n_i`.
    *
    * Determinism: lifetimes are integers (bucket upstream — days,
    * weeks); risk sets come from an exclusive cumulative over the
    * distinct-lifetime table; the survival product is an INTEGER FOLD
    * — `S_pico ← S_pico·(n−d) div n` in t-order over the collected
    * death-time array (a projection ladder re-slices the array per
    * prefix, the pav1/zo2 discipline) — so both engines produce
    * bit-identical curves with one display division.
    *
    * Scale: the caller's per-subject rollup is the only corpus-sized
    * pass; everything here lives on the distinct-lifetime table
    * (bounded by the observation window over the bucket size — keep it
    * in the hundreds, the prefix ladder is O(m²) array ops on one
    * row). The fold requires `S_pico·n` to fit a long — n < 9·10⁶; at
    * larger subject counts pre-aggregate to cohorts or rescale S to
    * nano.
    */
  def kaplanMeier(lifetimes: DataFrame): DataFrame = {
    val lab = lifetimes.select(col("t").cast("long").as("t"), col("cens"))
    val per = lab.groupBy("t").agg(
      sum(when(!col("cens"), 1L).otherwise(0L)).cast("long").as("d"),
      sum(when(col("cens"), 1L).otherwise(0L)).cast("long").as("c"))
    val tot = per.agg(sum(col("d") + col("c")).cast("long").as("n_total"))
    val wPrev = org.apache.spark.sql.expressions.Window.orderBy("t")
      .rowsBetween(Long.MinValue, -1)
    val withN = per.crossJoin(broadcast(tot))
      .withColumn("n_at", col("n_total") -
        coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
    val arr = withN.filter(col("d") > 0)
      .select(struct(col("t"), col("d"), col("c"), col("n_at")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("dl"))
      .filter(size(col("dl")) > 0) // all-censored input: empty curve,
    // not a descending sequence(1,0) indexing into an empty array
    arr.select(explode(expr(
        """transform(sequence(1, size(dl)), i -> struct(
          |  dl[i-1].t AS t_day, dl[i-1].n_at AS n_risk,
          |  dl[i-1].d AS n_deaths, dl[i-1].c AS n_censored,
          |  aggregate(slice(dl, 1, i), 1000000000000L,
          |    (acc, x) -> acc * (x.n_at - x.d) div x.n_at) AS s_pico))"""
          .stripMargin)).as("r"))
      .select(col("r.t_day"), col("r.n_risk"), col("r.n_deaths"),
        col("r.n_censored"),
        // display column stays an exact integer: s_micro = round-half-up
        // of s_pico/1e6 computed with integer div (s_pico ≥ 0, so Spark
        // `div` and DuckDB `//` agree) — a `round(x/1e12, 6)` double here
        // diverged in the last bits between engines (r11 gate red)
        expr("(r.s_pico + 500000L) div 1000000L").as("survival_micro"))
  }

  /** Nelson–Aalen cumulative hazard (Nelson '72, Aalen '78) — the
    * additive companion of [[kaplanMeier]]'s product-limit curve:
    * `H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ`. Preferred over −ln(KM) for small
    * risk sets, and the quantity whose SLOPE is the hazard rate —
    * the freshness/latency survival readout where KM gives the
    * survival fraction.
    *
    * Determinism: per-event terms are exact pico integer divisions;
    * the cumulative sum is an exact integer window; display is the
    * sur1 half-up integer micro convention.
    *
    * Scale: one (t) count shuffle; the cumulative window runs over
    * the EVENT-TIME table (domain-bounded, not corpus-bounded — the
    * ks1 argument).
    */
  def nelsonAalen(lifetimes: DataFrame): DataFrame = {
    val lab = lifetimes.select(col("t").cast("long").as("t"), col("cens"))
    val per = lab.groupBy("t").agg(
      sum(when(!col("cens"), 1L).otherwise(0L)).cast("long").as("d"),
      sum(when(col("cens"), 1L).otherwise(0L)).cast("long").as("c"))
    val tot = per.agg(sum(col("d") + col("c")).cast("long").as("n_total"))
    val wPrev = Window.orderBy("t").rowsBetween(Long.MinValue, -1)
    val wCum = Window.orderBy("t").rowsBetween(Long.MinValue, 0)
    per.crossJoin(broadcast(tot))
      .withColumn("n_at", col("n_total") -
        coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("term_pico", expr("(d * 1000000000000L) div n_at"))
      .withColumn("h_pico", sum("term_pico").over(wCum).cast("long"))
      .select(col("t").as("t_day"), col("n_at").as("n_risk"),
        col("d").as("n_deaths"), col("c").as("n_censored"),
        expr("(h_pico + 500000L) div 1000000L").as("hazard_micro"))
  }

  /** Intraclass correlation ICC(2,1) (Shrout & Fleiss '79, two-way
    * random effects, absolute agreement, single rater) — the
    * labeler-agreement coefficient for CONTINUOUS scores, where the
    * categorical family (fleissKappa, krippendorffAlpha) does not
    * apply: how much of a rating's variance is the ITEM rather than
    * the rater or noise? The QA number for scalar judge/reward
    * scores before they are trusted as training signal.
    *
    * Complete-design form: items rated by every rater (incomplete
    * items are dropped and counted). With micro-quantized ratings,
    * every sum of squares is exact decimal arithmetic; the mean
    * squares and the ICC are ONE fixed-order double expression at
    * the end, nano-quantized.
    *
    * Scale: one (item, rater) cell shuffle, an items-bounded row-sum
    * table, a raters-bounded column-sum table, scalar moments.
    */
  def icc21(ratings: DataFrame, itemCol: String, raterCol: String,
            valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = ratings.select(col(itemCol).cast("string").as("it"),
      col(raterCol).cast("string").as("ra"),
      floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long").as("y"))
    val k = cells.agg(countDistinct(col("ra")).cast("long").as("k"))
    val rows = cells.groupBy("it")
      .agg(count(lit(1)).cast("long").as("nr"),
        sum(dec(col("y"))).as("ri"))
    val kept = rows.crossJoin(broadcast(k)).filter(col("nr") === col("k"))
      .select(col("it"), col("ri"))
      .persist()
    val dropped = rows.crossJoin(broadcast(k)).filter(col("nr") =!= col("k"))
      .agg(count(lit(1)).cast("long").as("n_dropped"))
    val keptCells = cells.join(kept.select("it"), Seq("it"), "left_semi")
    val cols = keptCells.groupBy("ra").agg(sum(dec(col("y"))).as("cj"))
    val moms = keptCells.agg(sum(dec(col("y"))).as("s"),
      sum(dec(col("y")) * dec(col("y"))).as("ss"))
    val rowSq = kept.agg(count(lit(1)).cast("long").as("n"),
      sum(col("ri") * col("ri")).as("sr2"))
    val colSq = cols.agg(sum(col("cj") * col("cj")).as("sc2"))
    val out = moms.crossJoin(rowSq).crossJoin(colSq).crossJoin(broadcast(k))
      .crossJoin(dropped)
      .filter(col("n") >= 2L && col("k") >= 2L)
      .select(col("n").as("n_items"), col("k").as("k_raters"),
        col("n_dropped"),
        expr(
          """CAST(floor((((CAST(sr2 AS DOUBLE) / CAST(k AS DOUBLE)
            |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            |        / CAST(n * k AS DOUBLE)) / CAST(n - 1L AS DOUBLE)
            |    - (CAST(ss AS DOUBLE)
            |      - CAST(sr2 AS DOUBLE) / CAST(k AS DOUBLE)
            |      - CAST(sc2 AS DOUBLE) / CAST(n AS DOUBLE)
            |      + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            |        / CAST(n * k AS DOUBLE))
            |      / CAST((n - 1L) * (k - 1L) AS DOUBLE))
            |  / ((CAST(sr2 AS DOUBLE) / CAST(k AS DOUBLE)
            |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            |        / CAST(n * k AS DOUBLE)) / CAST(n - 1L AS DOUBLE)
            |    + CAST(k - 1L AS DOUBLE) * ((CAST(ss AS DOUBLE)
            |      - CAST(sr2 AS DOUBLE) / CAST(k AS DOUBLE)
            |      - CAST(sc2 AS DOUBLE) / CAST(n AS DOUBLE)
            |      + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            |        / CAST(n * k AS DOUBLE))
            |      / CAST((n - 1L) * (k - 1L) AS DOUBLE))
            |    + CAST(k AS DOUBLE) * (((CAST(sc2 AS DOUBLE)
            |        / CAST(n AS DOUBLE)
            |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            |        / CAST(n * k AS DOUBLE)) / CAST(k - 1L AS DOUBLE))
            |      - ((CAST(ss AS DOUBLE)
            |        - CAST(sr2 AS DOUBLE) / CAST(k AS DOUBLE)
            |        - CAST(sc2 AS DOUBLE) / CAST(n AS DOUBLE)
            |        + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            |          / CAST(n * k AS DOUBLE))
            |        / CAST((n - 1L) * (k - 1L) AS DOUBLE)))
            |      / CAST(n AS DOUBLE)))
            |  * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("icc21_nano"))
      .localCheckpoint()
    kept.unpersist(false)
    out
  }

  /** Closed-form multiple OLS with two regressors + intercept, by
    * Cramer's rule on the 3×3 normal equations — the distributed
    * regression shape: ONE combinable moment pass (nine exact decimal
    * sums over pre-quantized longs `y_q`, `x1`, `x2`), then every
    * coefficient, SSE (via the normal-equation identity
    * `Σŷε = 0 ⇒ SSE = Syy − b·[Sy, Sx1y, Sx2y]`), and R² as
    * fixed-order double expressions on the single moment row. No
    * iteration, no gradient, no driver-side matrix library.
    *
    * Output is in QUANTIZED units — the caller applies its display
    * conversions (and mirrors them in the oracle).
    *
    * Scale: map-side partials → one row; corpus scanned once.
    */
  def olsNormal2(df: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(dec(col("y_q"))).as("sy"),
      sum(dec(col("x1"))).as("sx1"), sum(dec(col("x2"))).as("sx2"),
      sum(dec(col("x1")) * dec(col("x1"))).as("sx11"),
      sum(dec(col("x1")) * dec(col("x2"))).as("sx12"),
      sum(dec(col("x2")) * dec(col("x2"))).as("sx22"),
      sum(dec(col("x1")) * dec(col("y_q"))).as("sx1y"),
      sum(dec(col("x2")) * dec(col("y_q"))).as("sx2y"),
      sum(dec(col("y_q")) * dec(col("y_q"))).as("syy"))
    val nd = col("n").cast("double")
    val sy = col("sy").cast("double")
    val sx1 = col("sx1").cast("double"); val sx2 = col("sx2").cast("double")
    val sx11 = col("sx11").cast("double"); val sx12 = col("sx12").cast("double")
    val sx22 = col("sx22").cast("double")
    val sx1y = col("sx1y").cast("double"); val sx2y = col("sx2y").cast("double")
    val syy = col("syy").cast("double")
    val detA = nd * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val det0 = sy * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y)
    val det1 = nd * (sx1y * sx22 - sx12 * sx2y) -
      sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)
    val det2 = nd * (sx11 * sx2y - sx1y * sx12) -
      sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2)
    val b0 = det0 / detA; val b1 = det1 / detA; val b2 = det2 / detA
    val sse = syy - b0 * sy - b1 * sx1y - b2 * sx2y
    val sst = syy - sy * sy / nd
    m.select(col("n"), b0.as("b0"), b1.as("b1"), b2.as("b2"),
      (lit(1.0) - sse / sst).as("r2"))
  }

  /** Pareto skyline (Börzsönyi/Kossmann/Stocker, ICDE 2001) over
    * integer criteria, all maximized: the rows no other row dominates
    * (≥ everywhere, > somewhere) — multi-criteria selection without
    * collapsing the objectives into one weighted score.
    *
    * Two-phase distributed shape (the BNL-at-scale idiom):
    * 1. GRID PRUNE — bucket every dim into 2^gridBits levels off one
    *    broadcast min/max row; a cell dies if some other cell's
    *    per-dim MINIMA strictly exceed its per-dim MAXIMA (a real
    *    point there dominates everything here). Cell-vs-cell work is
    *    (2^gridBits)^k² — fixed, tiny, corpus-independent. Dominance
    *    is transitive and maximal points are never pruned, so
    *    filtering survivors against survivors alone stays EXACT.
    * 2. EXACT PASS — one dominance anti-join over the surviving band.
    *    Survivor count tracks the skyline band, not the corpus; for
    *    heavily-correlated dims raise gridBits.
    *
    * All comparisons are longs — quantize upstream; bit-identical in
    * any engine.
    */
  def paretoSkyline(pts: DataFrame, idCol: String, dims: Seq[String],
                    gridBits: Int = 3): DataFrame = {
    require(dims.nonEmpty, "need at least one criterion")
    val g = (1L << gridBits)
    val p0 = pts.select(col(idCol).cast("long").as("id") +:
      dims.map(c => col(c).cast("long").as(c)): _*).persist()
    val mmAggs = dims.flatMap(c =>
      Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
    val mm = p0.agg(mmAggs.head, mmAggs.tail: _*)
    val bCols = dims.map(c => least(lit(g - 1),
      expr(s"(($c - mn_$c) * ${g}L) div (mx_$c - mn_$c + 1)")).as(s"b_$c"))
    val pb = p0.crossJoin(broadcast(mm))
      .select(col("id") +: (dims.map(col(_)) ++ bCols): _*)
      .persist()
    val cellAggs = dims.flatMap(c =>
      Seq(min(col(c)).as(s"cmn_$c"), max(col(c)).as(s"cmx_$c")))
    val cells = pb.groupBy(dims.map(c => col(s"b_$c")): _*)
      .agg(cellAggs.head, cellAggs.tail: _*)
    val cellDom = dims.map(c => col(s"d.cmn_$c") > col(s"c.cmx_$c")).reduce(_ && _)
    val deadCells = cells.as("c").join(cells.as("d"), cellDom, "left_semi")
      .select(dims.map(c => col(s"b_$c")): _*)
    val surv = pb.join(deadCells, dims.map(c => s"b_$c"), "left_anti").persist()
    val geq = dims.map(c => col(s"q.$c") >= col(s"p.$c")).reduce(_ && _)
    val strict = dims.map(c => col(s"q.$c") > col(s"p.$c")).reduce(_ || _)
    val sky = surv.as("p").join(surv.as("q"), geq && strict, "left_anti")
      .select(col("id") +: dims.map(col(_)): _*)
      .localCheckpoint() // skyline band is small; lets all caches drop
    p0.unpersist(false); pb.unpersist(false); surv.unpersist(false)
    sky
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013)
    * — adjust an experiment metric by its pre-experiment covariate:
    * `Y_adj = Y − θ·(X − X̄)` with `θ = cov(X,Y)/var(X)`, shrinking
    * metric variance by exactly ρ² and leaving the treatment effect
    * unbiased. The standard sensitivity lever for A/B tests on
    * high-variance engagement metrics.
    *
    * Input: one row per experiment unit with `arm` ∈
    * {'control','treatment'} and the EXACT pre/post metric sums
    * `x_q`/`y_q` already micro-quantized to longs (build them with a
    * conditional-sum groupBy — per-unit sums of quantized longs are
    * order-free). All cross-moments then accumulate as decimal(38,0)
    * in ONE combinable pass; θ, means, variances and the adjusted
    * lift are fixed-order double expressions on the single moment row.
    *
    * Scale: after the per-unit rollup (one keyed shuffle of long
    * triples), ONE combinable aggregate — a single row moves.
    */
  def cupedAdjust(perUnit: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val isC = col("arm") === "control"
    val m = perUnit.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(isC, 1L).otherwise(0L)).cast("long").as("n_c"),
      sum(when(!isC, 1L).otherwise(0L)).cast("long").as("n_t"),
      sum(dec(col("x_q"))).as("sx"), sum(dec(col("y_q"))).as("sy"),
      sum(dec(col("x_q")) * dec(col("x_q"))).as("sxx"),
      sum(dec(col("x_q")) * dec(col("y_q"))).as("sxy"),
      sum(dec(col("y_q")) * dec(col("y_q"))).as("syy"),
      sum(when(isC, dec(col("x_q"))).otherwise(lit(0).cast("decimal(38,0)"))).as("sx_c"),
      sum(when(isC, dec(col("y_q"))).otherwise(lit(0).cast("decimal(38,0)"))).as("sy_c"),
      sum(when(!isC, dec(col("x_q"))).otherwise(lit(0).cast("decimal(38,0)"))).as("sx_t"),
      sum(when(!isC, dec(col("y_q"))).otherwise(lit(0).cast("decimal(38,0)"))).as("sy_t"))
    val nd = col("n").cast("double")
    val (nc, nt) = (col("n_c").cast("double"), col("n_t").cast("double"))
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxx, sxy, syy) = (col("sxx").cast("double"), col("sxy").cast("double"),
      col("syy").cast("double"))
    val covNum = nd * sxy - sx * sy   // n²·cov in micro² units
    val varXNum = nd * sxx - sx * sx  // n²·var(X)
    val varYNum = nd * syy - sy * sy  // n²·var(Y)
    val theta = covNum / varXNum      // unit-free
    val meanYc = col("sy_c").cast("double") / nc
    val meanYt = col("sy_t").cast("double") / nt
    val meanXc = col("sx_c").cast("double") / nc
    val meanXt = col("sx_t").cast("double") / nt
    val diffRaw = meanYt - meanYc
    val diffCuped = diffRaw - theta * (meanXt - meanXc)
    // var(Y_adj) = var(Y) − cov²/var(X); displayed in original units²
    val varY = varYNum / (nd * (nd - lit(1.0)))
    val varAdj = (varYNum - covNum * covNum / varXNum) / (nd * (nd - lit(1.0)))
    m.select(col("n_c"), col("n_t"),
      round(theta, 9).as("theta"),
      round(meanYc / 1e6, 6).as("mean_y_control"),
      round(meanYt / 1e6, 6).as("mean_y_treatment"),
      round(diffRaw / 1e6, 6).as("diff_raw"),
      round(diffCuped / 1e6, 6).as("diff_cuped"),
      round(varY / 1e12, 6).as("var_y"),
      round(varAdj / 1e12, 6).as("var_adj"),
      round(lit(1.0) - varAdj / varY, 9).as("var_reduction"))
  }

  /** Poisson(1) CDF at k = 0..8, scaled to 2⁶⁰ and floored — SHARED
    * LITERALS between the Spark plan and the DuckDB oracle (the
    * benfordExpected discipline: no engine evaluates exp/factorial).
    * P(X > 8) ≈ 1.1e-6: draws clamp to 9 there, identically in both
    * engines.
    */
  val poissonThresholds: Seq[Long] = Seq(
    424136118829305344L, 848272237658610688L, 1060340297073263360L,
    1131029650211480960L, 1148701988496035328L, 1152236456152946176L,
    1152825534095764608L, 1152909688087595776L, 1152920207336574720L)

  /** Poisson bootstrap (Chamandy et al., Google 2012 — "Estimating
    * uncertainty for massive data streams"): the distributed-scale
    * bootstrap. Row i's weight in replicate b is an independent
    * Poisson(1) draw — ≈ the multinomial resample, but needs NO global
    * n and stays embarrassingly parallel: each row computes its own
    * (replicate, weight) pairs from `md5(id:b)` against the
    * [[poissonThresholds]] literal ladder. Emits one row per replicate
    * (weighted mean, effective n) with the point estimate, bootstrap
    * SE, and the replicate-range CI attached to every row.
    *
    * Determinism: weights are pure md5 functions of (id, b); replicate
    * sums Σw, Σw·q are exact integers; each replicate mean is ONE
    * division; the SE re-quantizes replicate means to pico-units so
    * the cross-replicate moment sum is order-free.
    *
    * Scale: the corpus expands ×`reps` into (id-hash, long, long)
    * triples feeding a combinable per-replicate aggregate — `reps`
    * rows survive. No global resample, no collect, no RNG state.
    */
  def poissonBootstrap(df: DataFrame, idCol: String, valueCol: String,
                       reps: Int = 32): DataFrame = {
    require(reps >= 2, "need at least two replicates")
    val base = df.select(col(idCol).cast("string").as("id"),
      floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long").as("qv"))
    val full = base.agg(count(lit(1)).cast("long").as("n_rows"),
      sum(col("qv").cast("decimal(38,0)")).as("s_full"))
    val withB = base.select(col("id"), col("qv"),
      explode(array((0 until reps).map(lit(_)): _*)).as("b"))
    val u = conv(substring(md5(concat_ws(":", col("id"), col("b").cast("string"))),
      1, 15), 16, 10).cast("long")
    val w = poissonThresholds.zipWithIndex.foldRight(
        lit(poissonThresholds.size): org.apache.spark.sql.Column) {
      case ((t, k), acc) => when(u < lit(t), lit(k)).otherwise(acc)
    }
    val perRep = withB.withColumn("w", w.cast("long"))
      .groupBy("b")
      .agg(sum("w").cast("long").as("n_eff"),
        sum(col("w").cast("decimal(38,0)") * col("qv").cast("decimal(38,0)"))
          .as("s_wv"))
      .withColumn("mb_pico", floor(col("s_wv").cast("double") /
        col("n_eff").cast("double") * lit(1e6) + lit(0.5)).cast("long"))
      .persist()
    val r = lit(reps).cast("double")
    val scalars = perRep.agg(
      sum(col("mb_pico").cast("decimal(38,0)")).as("s1"),
      sum(col("mb_pico").cast("decimal(38,0)") * col("mb_pico").cast("decimal(38,0)")).as("s2"),
      min("mb_pico").as("lo_pico"), max("mb_pico").as("hi_pico"))
    val se = sqrt((r * col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double")) /
      (r * (r - lit(1.0)))) / lit(1e12)
    perRep.crossJoin(broadcast(scalars)).crossJoin(broadcast(full))
      .select(col("b"), col("n_eff"),
        round(col("s_wv").cast("double") / col("n_eff").cast("double") / 1e6, 6)
          .as("mean_b"),
        round(col("s_full").cast("double") / col("n_rows").cast("double") / 1e6, 6)
          .as("est_mean"),
        round(se, 9).as("se_boot"),
        round(col("lo_pico").cast("double") / 1e12, 6).as("ci_lo"),
        round(col("hi_pico").cast("double") / 1e12, 6).as("ci_hi"))
  }

  /** Pairwise Pearson correlation matrix over `cols` — the feature-
    * redundancy audit run before any model fit or mixture design:
    * which quality signals are measuring the same thing?
    *
    * ONE combinable aggregate pass computes every moment (n, k sums,
    * k(k+1)/2 cross-products) over values quantized at `scale`
    * (correlation is affine-invariant, so quantization is the only —
    * and deterministic — approximation); each of the k(k−1)/2 output
    * rows is a fixed-order double expression over that single
    * persisted moment row. The corpus is scanned exactly once
    * regardless of k.
    *
    * Scale: map-side partials reduce to ONE row of exact decimals —
    * no shuffle wider than the combiner tree, any corpus size.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 scale: Double = 1e4): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val qdf = df.select(cols.map(c =>
      floor(col(c) * lit(scale) + lit(0.5)).cast("decimal(38,0)").as(s"q_$c")): _*)
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).cast("long").as("n")) ++
      cols.map(c => sum(col(s"q_$c")).as(s"s_$c")) ++
      (for { i <- cols.indices; j <- i until cols.size } yield
        sum(col(s"q_${cols(i)}") * col(s"q_${cols(j)}")).as(s"ss_${i}_$j"))
    val m = qdf.agg(aggs.head, aggs.tail: _*).persist()
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
      val nd = col("n").cast("double")
      val si = col(s"s_${cols(i)}").cast("double")
      val sj = col(s"s_${cols(j)}").cast("double")
      val ssij = col(s"ss_${i}_$j").cast("double")
      val ssii = col(s"ss_${i}_$i").cast("double")
      val ssjj = col(s"ss_${j}_$j").cast("double")
      m.select(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"), col("n"),
        round((nd * ssij - si * sj) /
          sqrt((nd * ssii - si * si) * (nd * ssjj - sj * sj)), 9).as("corr"))
    }
    pairs.reduce(_ unionByName _)
  }

  /** Stratified treatment-effect estimate (the exact-matching /
    * subclassification form of inverse-propensity weighting —
    * Rosenbaum & Rubin 1984's subclassification on the propensity
    * proxy): within each stratum of a confounder, difference the arm
    * means; the ATE is the stratum-size-weighted sum over strata that
    * contain BOTH arms. The observational-data companion to ab1/ab2
    * (which assume randomized arms).
    *
    * Input: one row per UNIT with (stratumCol, treatedCol boolean,
    * outcome double). Output: one row per usable stratum (sizes, arm
    * means, diff, weight) with the overall `ate_micro` and the
    * confounded `naive_diff_micro` repeated on each row (exact micro-
    * unit longs), plus counts of dropped
    * single-arm strata/units in every row for audit.
    *
    * Determinism: outcomes micro-quantize and aggregate as exact
    * integers per (stratum, arm) — ONE combinable corpus pass; each
    * stratum's term `n_s · (mean₁ − mean₀)` pico-quantizes before the
    * order-free total. Strata counts are bounded (confounder
    * cardinality), so everything after the first pass is tiny.
    */
  def stratifiedAte(units: DataFrame, stratumCol: String,
                    treatedCol: String, outcomeCol: String): DataFrame = {
    val cells = units
      .select(col(stratumCol).as("stratum"),
        when(col(treatedCol), 1L).otherwise(0L).as("arm"),
        floor(col(outcomeCol) * lit(1e6) + lit(0.5)).cast("long").as("q"))
      .groupBy("stratum", "arm")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("q").cast("decimal(38,0)")).as("s"))
    val strata = cells.groupBy("stratum").agg(
        sum(when(col("arm") === 1L, col("n")).otherwise(0L)).cast("long").as("n_t"),
        sum(when(col("arm") === 1L, col("s")).otherwise(lit(0).cast("decimal(38,0)"))).as("s_t"),
        sum(when(col("arm") === 0L, col("n")).otherwise(0L)).cast("long").as("n_c"),
        sum(when(col("arm") === 0L, col("s")).otherwise(lit(0).cast("decimal(38,0)"))).as("s_c"))
      .persist()
    val usable = strata.filter(col("n_t") > 0 && col("n_c") > 0)
      .withColumn("n_s", col("n_t") + col("n_c"))
      .withColumn("mean_t_micro", col("s_t").cast("double") / col("n_t").cast("double"))
      .withColumn("mean_c_micro", col("s_c").cast("double") / col("n_c").cast("double"))
      // stratum term n_s·diff, micro → pico BEFORE the order-free sum
      .withColumn("term_pico",
        floor((col("mean_t_micro") - col("mean_c_micro")) *
          col("n_s").cast("double") * lit(1e6) + lit(0.5)).cast("long"))
      .persist()
    val dropped = strata.filter(col("n_t") === 0 || col("n_c") === 0)
      .agg(count(lit(1)).cast("long").as("n_strata_dropped"),
        coalesce(sum(col("n_t") + col("n_c")), lit(0L)).cast("long")
          .as("n_units_dropped"))
    val tot = usable.agg(
      count(lit(1)).cast("long").as("n_strata_used"),
      sum("n_s").cast("long").as("n_units_used"),
      sum(col("term_pico").cast("decimal(38,0)")).as("ate_sum"),
      sum("n_t").cast("long").as("nt_all"), sum("n_c").cast("long").as("nc_all"),
      sum("s_t").as("st_all"), sum("s_c").as("sc_all"))
    // micro-long display columns (floor(x+0.5) of values already in
    // micro units — the intermediate doubles are identical fixed-order
    // expressions in both engines): exact integers survive any
    // comparator precision (the sur1 %.12g lesson)
    val summary = tot.crossJoin(dropped).select(
      col("n_strata_used"), col("n_strata_dropped"), col("n_units_used"),
      col("n_units_dropped"),
      floor(col("ate_sum").cast("double") /
        (col("n_units_used").cast("double") * lit(1e12)) * lit(1e6) +
        lit(0.5)).cast("long").as("ate_micro"),
      floor(col("st_all").cast("double") / col("nt_all").cast("double") -
        col("sc_all").cast("double") / col("nc_all").cast("double") +
        lit(0.5)).cast("long").as("naive_diff_micro"))
    val out = usable.crossJoin(broadcast(summary))
      .select(col("stratum"), col("n_t"), col("n_c"),
        floor(col("mean_t_micro") + lit(0.5)).cast("long").as("mean_t_micro"),
        floor(col("mean_c_micro") + lit(0.5)).cast("long").as("mean_c_micro"),
        floor(col("mean_t_micro") - col("mean_c_micro") + lit(0.5))
          .cast("long").as("diff_micro"),
        col("n_strata_used"), col("n_strata_dropped"),
        col("n_units_used"), col("n_units_dropped"),
        col("ate_micro"), col("naive_diff_micro"))
      .localCheckpoint() // strata-bounded rows; lets both caches drop
    strata.unpersist(false); usable.unpersist(false)
    out
  }

  /** Jarque–Bera normality test per group (JB 1980): skewness and
    * excess kurtosis from exact central moments, `JB = n/6·(S² + K²/4)`
    * against the χ²₂ 95% cut (5.991) — the "is this metric even
    * remotely normal?" gate that decides between ab1's t-test and
    * mw1's rank test.
    *
    * Determinism: observations quantize to MILLI units; the four raw
    * power sums Σx..Σx⁴ are exact order-free decimal sums. The x⁴
    * headroom claim is VALUE-BOUNDED: at milli scale, x⁴ ≈ |v|⁴·10¹²
    * per row, so 10¹⁰ rows stay inside decimal(38,0) only for metric
    * magnitudes |v| ≲ 3·10³ (|v| ~ 10⁴ gives 1e28/row → null moments
    * at 10¹⁰ rows). Rescale larger-magnitude metrics before calling —
    * the n-SCALED deviation trick used elsewhere would overflow at
    * the 4th power regardless, so central moments come from the
    * power-sum expansion instead, computed in ONE fixed-order double
    * expression per group. The expansion's cancellation error is ~ulp·(mean/σ)⁴
    * — negligible for any metric a monitor would test, and identical
    * in both engines since the doubles and operation order match.
    *
    * Scale: ONE combinable pass, group-cardinality output.
    */
  def jarqueBera(df: DataFrame, valueCol: String,
                 groupCol: String): DataFrame = {
    val q = df.select(col(groupCol).as("g"),
      floor(col(valueCol) * lit(1e3) + lit(0.5)).cast("long").as("x"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val xd = dec(col("x"))
    val mom = q.groupBy("g")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(xd).as("s1"), sum(xd * xd).as("s2r"),
        sum(xd * xd * xd).as("s3r"), sum(xd * xd * xd * xd).as("s4r"))
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / nd
    val m2 = col("s2r").cast("double") / nd - mean * mean
    val m3 = col("s3r").cast("double") / nd -
      lit(3.0) * mean * (col("s2r").cast("double") / nd) +
      lit(2.0) * mean * mean * mean
    val m4 = col("s4r").cast("double") / nd -
      lit(4.0) * mean * (col("s3r").cast("double") / nd) +
      lit(6.0) * mean * mean * (col("s2r").cast("double") / nd) -
      lit(3.0) * mean * mean * mean * mean
    val skew = m3 / pow(m2, 1.5)
    val kurt = m4 / (m2 * m2) - lit(3.0)
    mom.select(col("g").as(groupCol), col("n"),
        round(skew, 9).as("skewness"),
        round(kurt, 9).as("ex_kurtosis"),
        round(nd / lit(6.0) * (skew * skew + kurt * kurt / lit(4.0)), 9)
          .as("jb_stat"),
        (nd / lit(6.0) * (skew * skew + kurt * kurt / lit(4.0)) > lit(5.991))
          .as("reject_normal"))
  }

  /** Group-sequential monitoring table (Pocock/O'Brien–Fleming interim
    * looks — "when could this experiment have stopped?"): one look per
    * time bucket, cumulative two-sample z against the OBF-approximate
    * boundary `z_{α/2}·√(K/k)` at look k of K. The peeking-safe
    * companion to ab1's single final test.
    *
    * Determinism: per-(bucket, arm) micro moments are exact integers;
    * looks cumulate on the buckets×2 table; z/boundary are fixed-order
    * doubles off exact sums (the ab1 contract); the crossing flag is a
    * double compare with the same ±ulp caveat as every significance
    * flag in this file.
    *
    * Scale: ONE combinable corpus pass; everything after is
    * looks-bounded.
    */
  def groupSequential(df: DataFrame, tsCol: String, armCol: String,
                      valueCol: String, armA: String, armB: String,
                      bucket: String = "week",
                      zAlpha: Double = 1.96): DataFrame = {
    val cells = df
      .filter(col(armCol).isin(armA, armB))
      .select(date_trunc(bucket, col(tsCol)).as("w"),
        when(col(armCol) === armB, 1L).otherwise(0L).as("arm"),
        floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long").as("q"))
      .groupBy("w", "arm")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("q").cast("decimal(38,0)")).as("s"),
        sum(col("q").cast("decimal(38,0)") * col("q").cast("decimal(38,0)"))
          .as("ss"))
    val wW = Window.partitionBy("arm").orderBy("w")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cn", sum("n").over(wW).cast("long"))
      .withColumn("cs", sum("s").over(wW))
      .withColumn("css", sum("ss").over(wW))
    // Join the two arms on the bucket alone, THEN rank the joined
    // buckets: a look exists where BOTH arms have data. Ranking per-arm
    // before the join (the old shape) let one sparse-arm bucket shift
    // every later rank, silently dropping all subsequent looks from the
    // (w, k) equi-join. Cumulatives still include orphan buckets' data
    // at the next shared look — correct monitoring semantics. The
    // global window is looks-bounded (weeks), not corpus-sized.
    val looks = cum.filter(col("arm") === 1L).as("t")
      .join(cum.filter(col("arm") === 0L).as("c"), Seq("w"))
      .select(col("w"),
        col("t.cn").as("n_t"), col("c.cn").as("n_c"),
        col("t.cs").as("s_t"), col("c.cs").as("s_c"),
        col("t.css").as("ss_t"), col("c.css").as("ss_c"))
      .withColumn("k", dense_rank().over(Window.orderBy("w")).cast("long"))
    val bigKRow = looks.agg(max("k").as("bigk")).head()
    val bigK = if (bigKRow.isNullAt(0)) 0L else bigKRow.getLong(0)
    val nt = col("n_t").cast("double"); val nc = col("n_c").cast("double")
    val mt = col("s_t").cast("double") / nt
    val mc = col("s_c").cast("double") / nc
    val vt = (col("ss_t").cast("double") - col("s_t").cast("double") *
      col("s_t").cast("double") / nt) / (nt - 1.0)
    val vc = (col("ss_c").cast("double") - col("s_c").cast("double") *
      col("s_c").cast("double") / nc) / (nc - 1.0)
    val se = sqrt(vt / nt + vc / nc)
    val z = (mt - mc) / se
    val bound = lit(zAlpha) *
      sqrt(lit(bigK.toDouble) / col("k").cast("double"))
    looks.select(col("k"), lit(bigK).as("n_looks"),
      col("n_t"), col("n_c"),
      // exact micro-long display (floor(x+0.5)/floor(x·10⁶+0.5) of the
      // identical fixed-order doubles): survives any comparator
      // precision; `crossed` keeps the raw-double compare
      floor(mt - mc + lit(0.5)).cast("long").as("diff_micro"),
      floor(z * lit(1e6) + lit(0.5)).cast("long").as("z_micro"),
      floor(bound * lit(1e6) + lit(0.5)).cast("long").as("boundary_micro"),
      (abs(z) > bound).as("crossed"))
  }

  /** Theil's uncertainty coefficient (Theil 1970): the ASYMMETRIC
    * categorical association `U(A|B) = (H(A) − H(A|B)) / H(A)` — what
    * fraction of A's entropy does knowing B remove? The directional
    * complement to [[cramersV]]: V says "related", U says "B predicts
    * A but A does not predict B" (e.g. source → lang is near-
    * deterministic while lang → source is not). Emits both directions
    * off one cell pass.
    *
    * Determinism: every entropy term `p·ln(p)` is a double computed
    * from exact longs in fixed order, PICO-QUANTIZED before the
    * order-free sum (the js1 discipline); U is two display-scale
    * divisions of the pico sums.
    *
    * Scale: ONE combinable (a, b) cell shuffle; everything after is
    * r×c-bounded.
    */
  def theilsU(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).cast("long").as("o")).persist()
    val ra = cells.groupBy("a").agg(sum("o").cast("long").as("na"))
    val rb = cells.groupBy("b").agg(sum("o").cast("long").as("nb"))
    val tot = cells.agg(sum("o").cast("long").as("n"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // marginal entropies: Σ -(n_x/N)·ln(n_x/N), pico per term
    def hMarg(m: DataFrame, cnt: String): DataFrame = m
      .crossJoin(broadcast(tot))
      .select(floor(-(col(cnt).cast("double") / col("n").cast("double")) *
        log(col(cnt).cast("double") / col("n").cast("double")) * lit(1e12)
        + lit(0.5)).cast("long").as("t"))
      .agg(sum(dec(col("t"))).as("h"))
    // conditional: H(A|B) = Σ_cells -(o/N)·ln(o/n_b); H(B|A) mirrored
    val cond = cells.join(ra, "a").join(rb, "b").crossJoin(broadcast(tot))
      .select(
        floor(-(col("o").cast("double") / col("n").cast("double")) *
          log(col("o").cast("double") / col("nb").cast("double")) * lit(1e12)
          + lit(0.5)).cast("long").as("tab"),
        floor(-(col("o").cast("double") / col("n").cast("double")) *
          log(col("o").cast("double") / col("na").cast("double")) * lit(1e12)
          + lit(0.5)).cast("long").as("tba"))
      .agg(sum(dec(col("tab"))).as("hab"), sum(dec(col("tba"))).as("hba"))
    val out = hMarg(ra, "na").withColumnRenamed("h", "ha")
      .crossJoin(hMarg(rb, "nb").withColumnRenamed("h", "hb"))
      .crossJoin(cond).crossJoin(tot)
      .select(col("n"),
        round(col("ha").cast("double") / 1e12, 9).as("h_a"),
        round(col("hb").cast("double") / 1e12, 9).as("h_b"),
        round(col("hab").cast("double") / 1e12, 9).as("h_a_given_b"),
        round(col("hba").cast("double") / 1e12, 9).as("h_b_given_a"),
        round((col("ha").cast("double") - col("hab").cast("double")) /
          col("ha").cast("double"), 9).as("u_a_given_b"),
        round((col("hb").cast("double") - col("hba").cast("double")) /
          col("hb").cast("double"), 9).as("u_b_given_a"))
      .localCheckpoint() // 1 row; lets the cells cache drop
    cells.unpersist(false)
    out
  }

  /** Difference-in-differences (the Card–Krueger quasi-experimental
    * workhorse): `DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)`
    * over a 2×2 (treated, post-cutoff) design, with the four-cell
    * Welch-style standard error — the estimator for "the rollout
    * happened at time t to group T; what did it cause?" when neither
    * arm is randomized. Completes the causal shelf beside ab1
    * (randomized), ab2 (variance-reduced) and ipw1 (subclassified).
    *
    * Determinism: the corpus reduces to FOUR exact micro-moment cells
    * in one combinable pass; every statistic is a fixed-order double
    * off that single row (the ab1 contract).
    */
  def diffInDiff(df: DataFrame, tsCol: String, treatCol: String,
                 valueCol: String, cutoff: String): DataFrame = {
    val q = df.select(
      when(col(treatCol), 1L).otherwise(0L).as("t"),
      when(col(tsCol) >= lit(cutoff).cast("timestamp"), 1L).otherwise(0L)
        .as("post"),
      floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long").as("q"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cellAggs = (for { t <- Seq(0, 1); p <- Seq(0, 1) } yield {
      val in = col("t") === t.toLong && col("post") === p.toLong
      Seq(sum(when(in, 1L).otherwise(0L)).cast("long").as(s"n_$t$p"),
        sum(when(in, dec(col("q"))).otherwise(dec(lit(0L)))).as(s"s_$t$p"),
        sum(when(in, dec(col("q")) * dec(col("q"))).otherwise(dec(lit(0L))))
          .as(s"ss_$t$p"))
    }).flatten
    val m = q.agg(cellAggs.head, cellAggs.tail: _*)
    def nd(c: String) = col(s"n_$c").cast("double")
    def mean(c: String) = col(s"s_$c").cast("double") / nd(c)
    def vr(c: String) = (col(s"ss_$c").cast("double") -
      col(s"s_$c").cast("double") * col(s"s_$c").cast("double") / nd(c)) /
      (nd(c) - 1.0)
    val did = (mean("11") - mean("10")) - (mean("01") - mean("00"))
    val se = sqrt(vr("11") / nd("11") + vr("10") / nd("10") +
      vr("01") / nd("01") + vr("00") / nd("00"))
    m.select(
      col("n_00").as("n_ctrl_pre"), col("n_01").as("n_ctrl_post"),
      col("n_10").as("n_treat_pre"), col("n_11").as("n_treat_post"),
      round(mean("00") / 1e6, 6).as("mean_ctrl_pre"),
      round(mean("01") / 1e6, 6).as("mean_ctrl_post"),
      round(mean("10") / 1e6, 6).as("mean_treat_pre"),
      round(mean("11") / 1e6, 6).as("mean_treat_post"),
      round(did / 1e6, 6).as("did"),
      round(se / 1e6, 6).as("se"),
      round(did / se, 6).as("z"),
      (abs(did / se) > lit(1.96)).as("significant"))
  }

  /** Entropic optimal transport between two histograms over the same
    * circular bin axis (Sinkhorn–Knopp as popularized by Cuturi,
    * NIPS'13): `iters` alternating scalings `u = a/(Kv)`, `v = b/(Kᵀu)`
    * with `K = exp(−C/ε)` and C the circular bin distance, then the
    * transport cost `Σ u_i K_ij C_ij v_j` — "how far apart are these
    * two activity profiles, as a RESHUFFLING COST in bins?" (emd1 is
    * the exact 1-D linear form; this is the regularized 2-D-capable
    * form with an explicit coupling).
    *
    * Determinism: the ONLY libm calls (exp) happen at PLAN TIME — K
    * and K∘C serialize as double literals into both engines; every
    * iteration is pure IEEE ±/×/÷ over in-order folds (zip_with +
    * left fold, the km1 discipline), so u/v are BIT-IDENTICAL across
    * engines with no quantization at all. Histogram shares divide
    * exact longs.
    *
    * Scale: ONE combinable (bin, side) count pass; the iteration is a
    * single-row expression ladder over bins²-sized literals — constant
    * work, corpus-independent.
    */
  def sinkhornOt(df: DataFrame, binCol: String, sideCol: String,
                 bins: Int = 24, eps: Double = 4.0,
                 iters: Int = 6): DataFrame = {
    val spark = df.sparkSession
    def circ(i: Int, j: Int): Double = {
      val d = math.abs(i - j); math.min(d, bins - d).toDouble
    }
    val kRow = (0 until bins).map(i =>
      typedlit((0 until bins).map(j => math.exp(-circ(i, j) / eps))))
    val kcRow = (0 until bins).map(i =>
      typedlit((0 until bins).map(j => math.exp(-circ(i, j) / eps) * circ(i, j))))
    val counts = df
      .select(col(binCol).cast("int").as("b"),
        when(col(sideCol), 1L).otherwise(0L).as("side"))
      .groupBy("b")
      .agg(sum(when(col("side") === 1L, 1L).otherwise(0L)).cast("long").as("ca"),
        sum(when(col("side") === 0L, 1L).otherwise(0L)).cast("long").as("cb"))
    val spine = spark.range(bins).select(col("id").cast("int").as("b"))
    val dense = spine.join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val one = dense.agg(
      sum("ca").cast("long").as("na"), sum("cb").cast("long").as("nb"),
      sort_array(collect_list(struct(col("b"), col("ca")))).as("la"),
      sort_array(collect_list(struct(col("b"), col("cb")))).as("lb"))
    // histogram shares as UNROLLED expressions (no lambda captures)
    val withAb = one
      .withColumn("a", array((0 until bins).map(i =>
        element_at(col("la"), i + 1).getField("ca").cast("double") /
          col("na").cast("double")): _*))
      .withColumn("bb", array((0 until bins).map(i =>
        element_at(col("lb"), i + 1).getField("cb").cast("double") /
          col("nb").cast("double")): _*))
      .withColumn("v_0", typedlit(Seq.fill(bins)(1.0)))
    val fold = (row: Column, vec: Column) =>
      aggregate(zip_with(row, vec, (x, y) => x * y), lit(0.0), (acc, t) => acc + t)
    val afterIters = (1 to iters).foldLeft(withAb) { (d, k) =>
      d.withColumn(s"u_$k", array((0 until bins).map(i =>
          element_at(col("a"), i + 1) / fold(kRow(i), col(s"v_${k - 1}"))): _*))
        .withColumn(s"v_$k", array((0 until bins).map(j =>
          element_at(col("bb"), j + 1) / fold(kRow(j), col(s"u_$k"))): _*))
    }
    val u = col(s"u_$iters"); val v = col(s"v_$iters")
    val cost = (0 until bins).map(i =>
      element_at(u, i + 1) * fold(kcRow(i), v)).reduce(_ + _)
    // row-marginal residual (column marginals are exact by the final
    // v-update): convergence witness
    val rowErr = greatest((0 until bins).map(i =>
      abs(element_at(u, i + 1) * fold(kRow(i), v) -
        element_at(col("a"), i + 1))): _*)
    afterIters.select(col("na").as("n_a"), col("nb").as("n_b"),
      lit(bins.toLong).as("n_bins"), lit(iters.toLong).as("n_iters"),
      round(cost, 9).as("ot_cost"),
      round(rowErr, 9).as("row_marginal_err"))
  }

  /** 1-D Wasserstein-1 (earth-mover) distance between two samples of
    * an integer-valued metric — `W₁ = ∫|F_A − F_B|` over the value
    * axis, the drift measure that (unlike dr1's PSI or dm1's JS) is in
    * the METRIC'S OWN UNITS and needs no binning choice: "the length
    * distribution moved by 14 characters".
    *
    * Determinism: EXACT — on the merged distinct-value grid,
    * `W₁·n_A·n_B = Σ gap·|cum_A·n_B − cum_B·n_A|` is pure integer
    * arithmetic (one display division at the end). No quantization,
    * no floats anywhere in the accumulation.
    *
    * Scale: one combinable (value, side) count, cumulative windows on
    * the distinct-value table (value-cardinality-sized, documented
    * single-partition; range-partition the value axis beyond).
    */
  def wasserstein1(df: DataFrame, valueCol: String,
                   sideCol: String): DataFrame = {
    val cells = df
      .select(col(valueCol).cast("long").as("v"),
        when(col(sideCol), 1L).otherwise(0L).as("side"))
      .groupBy("v")
      .agg(sum(when(col("side") === 1L, 1L).otherwise(0L)).cast("long").as("ca"),
        sum(when(col("side") === 0L, 1L).otherwise(0L)).cast("long").as("cb"))
    val w = Window.orderBy("v")
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cum = cells
      .withColumn("cum_a", sum("ca").over(wCum).cast("long"))
      .withColumn("cum_b", sum("cb").over(wCum).cast("long"))
      .withColumn("gap", (lead(col("v"), 1).over(w) - col("v")).cast("long"))
    val tot = cells.agg(sum("ca").cast("long").as("na"),
      sum("cb").cast("long").as("nb"))
    cum.filter(col("gap").isNotNull)
      .crossJoin(broadcast(tot))
      .select((dec(col("gap")) *
        abs(dec(col("cum_a")) * dec(col("nb")) - dec(col("cum_b")) * dec(col("na"))))
        .as("term"), col("na"), col("nb"))
      .groupBy("na", "nb")
      .agg(sum(col("term")).as("s"), count(lit(1)).cast("long").as("n_segments"))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("n_segments"),
        round(col("s").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 9)
          .as("wasserstein1"))
  }

  /** Proportion funnel (Spiegelhalter 2005 funnel-plot screening):
    * per group the pass rate with its Wilson interval, flagged when
    * the WHOLE interval sits below/above the global rate — the
    * multiple-groups answer to "which sources are significantly worse,
    * not just noisily worse?". The per-source screening companion to
    * exp1's two-arm Wilson CIs.
    *
    * Determinism: counts are exact longs; every rate/CI is one
    * fixed-order double expression; the flags compare doubles computed
    * identically in both engines (the ab1 significance-flag contract).
    *
    * Scale: ONE combinable (group, pass) pass; groups-bounded after.
    */
  def proportionFunnel(df: DataFrame, groupCol: String, passCol: String,
                       z: Double = 1.96): DataFrame = {
    val g = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(passCol), 1L).otherwise(0L)).cast("long").as("k"))
      .persist()
    val tot = g.agg(sum("n").cast("long").as("tn"),
      sum("k").cast("long").as("tk"))
    val nd = col("n").cast("double")
    val ph = col("k").cast("double") / nd
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nd
    val center = (ph + z2 / (lit(2.0) * nd)) / denom
    val half = lit(z) * sqrt(ph * (lit(1.0) - ph) / nd +
      z2 / (lit(4.0) * nd * nd)) / denom
    val pg = col("tk").cast("double") / col("tn").cast("double")
    val out = g.crossJoin(broadcast(tot))
      .select(col("g").as(groupCol), col("n"), col("k"),
        round(ph, 6).as("rate"),
        round(center - half, 6).as("wilson_lo"),
        round(center + half, 6).as("wilson_hi"),
        round(pg, 6).as("global_rate"),
        (center + half < pg).as("flag_low"),
        (center - half > pg).as("flag_high"))
      .localCheckpoint() // groups rows; lets the cache drop
    g.unpersist(false)
    out
  }

  /** Cramér's V association matrix over categorical column pairs — the
    * categorical companion of [[corrMatrix]] (corr is meaningless on
    * labels; V = √(χ²/(n·(min(r,c)−1))) ∈ [0,1] is the standard
    * effect-size for "are these two labelings redundant?"). Emits the
    * full χ² battery per pair (st3 generalized to every pair), over
    * the COMPLETE r×c grid — zero cells contribute their expectation.
    *
    * Determinism: cells/marginals are exact longs; each cell's χ² term
    * micro-quantizes (coarser than pico — terms can reach n) before
    * the order-free decimal sum; V is one fixed-order double off the
    * unrounded χ².
    *
    * Scale: per pair ONE combinable (a, b) cell shuffle over the
    * corpus; everything downstream is r×c-bounded (the crossJoin is
    * marginals × marginals, NOT data). Pairs run sequentially — k
    * categorical columns is k(k−1)/2 cheap passes, or pre-cube once
    * upstream if the corpus scan dominates.
    */
  def cramersV(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two categorical columns")
    def leg(aName: String, aCol: Column, bName: String, bCol: Column): DataFrame = {
      val cells = df.groupBy(aCol.cast("string").as("a"),
          bCol.cast("string").as("b"))
        .agg(count(lit(1)).cast("long").as("o")).persist()
      val ra = cells.groupBy("a").agg(sum("o").cast("long").as("ra"))
      val cb = cells.groupBy("b").agg(sum("o").cast("long").as("cb"))
      val tot = cells.agg(sum("o").cast("long").as("n"))
        .crossJoin(ra.agg(count(lit(1)).cast("long").as("r")))
        .crossJoin(cb.agg(count(lit(1)).cast("long").as("c")))
      val fl = ra.crossJoin(cb).join(cells, Seq("a", "b"), "left")
        .select(coalesce(col("o"), lit(0L)).as("o"), col("ra"), col("cb"))
      val ee = fl.crossJoin(broadcast(tot))
        .withColumn("e", col("ra").cast("double") * col("cb").cast("double") /
          col("n").cast("double"))
        .withColumn("t", floor((col("o").cast("double") - col("e")) *
          (col("o").cast("double") - col("e")) / col("e") * lit(1e6) + lit(0.5))
          .cast("long"))
      val ch = ee.agg(sum(col("t").cast("decimal(38,0)")).as("ts"))
        .select((col("ts").cast("double") / lit(1e6)).as("chi2"))
      val out = ch.crossJoin(tot).select(
        lit(aName).as("col_a"), lit(bName).as("col_b"),
        col("n"), col("r").as("n_rows"), col("c").as("n_cols"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round(col("chi2"), 6).as("chi2"),
        // a single-class side has no association to measure: V = 0
        when(least(col("r"), col("c")) > 1,
          round(sqrt(col("chi2") / (col("n").cast("double") *
            (least(col("r"), col("c")) - 1).cast("double"))), 9))
          .otherwise(lit(0.0)).as("cramers_v"))
        .localCheckpoint() // 1 row; lets the cells cache drop
      cells.unpersist(false)
      out
    }
    (for { i <- cols.indices; j <- i + 1 until cols.size }
      yield leg(cols(i)._1, cols(i)._2, cols(j)._1, cols(j)._2))
      .reduce(_ unionByName _)
  }

  /** Kendall's τ-b (Kendall 1945, the tie-adjusted form) between two
    * integer metrics over a BOUNDED item table — "do two rankings of
    * the same items agree?" (quality-rank vs length-rank per source,
    * human-rank vs model-rank per system). Rank-based, so it is the
    * robust companion to Pearson moments: invariant to any monotone
    * transform of either metric.
    *
    * Determinism: concordant/discordant/tie counts are exact longs
    * over the ordered item pairs (i < j by item key — each unordered
    * pair counted once); τ-b's denominator is the ONE double sqrt at
    * display time. τ-b = (C − D) / √((n₀−t_x)(n₀−t_y)) with n₀ =
    * n(n−1)/2 and t the within-metric tie-pair counts.
    *
    * Scale: input is an already-aggregated items table (sources,
    * systems — dozens); the pair self-join is items²-bounded, never
    * corpus-sized. The corpus pass producing the metrics is the
    * caller's (one combinable rollup).
    */
  def kendallTauB(items: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val base = items.select(col(keyCol).cast("string").as("k"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val pairs = base.as("a").join(base.as("b"), col("a.k") < col("b.k"))
      .select(
        (col("a.x") - col("b.x")).as("dx"),
        (col("a.y") - col("b.y")).as("dy"))
    val m = pairs.agg(
      count(lit(1)).cast("long").as("n0"),
      sum(when(col("dx") =!= 0L && col("dy") =!= 0L &&
        (col("dx") > 0L) === (col("dy") > 0L), 1L).otherwise(0L))
        .cast("long").as("concordant"),
      sum(when(col("dx") =!= 0L && col("dy") =!= 0L &&
        (col("dx") > 0L) =!= (col("dy") > 0L), 1L).otherwise(0L))
        .cast("long").as("discordant"),
      sum(when(col("dx") === 0L, 1L).otherwise(0L)).cast("long").as("ties_x"),
      sum(when(col("dy") === 0L, 1L).otherwise(0L)).cast("long").as("ties_y"))
    val cnt = base.agg(count(lit(1)).cast("long").as("n"))
    m.crossJoin(broadcast(cnt)).select(col("n"), col("n0"),
      col("concordant"), col("discordant"), col("ties_x"), col("ties_y"),
      // nano-quantized display of the one double op (sub − sqrt —
      // fixed order over exact longs, bit-identical in both engines);
      // an exact long column survives any comparator precision
      floor((col("concordant") - col("discordant")).cast("double") /
        sqrt((col("n0") - col("ties_x")).cast("double") *
          (col("n0") - col("ties_y")).cast("double")) * lit(1e9) + lit(0.5))
        .cast("long").as("tau_b_nano"))
  }

  /** Paired bootstrap system comparison (Koehn, EMNLP'04 — the MT-eval
    * standard): is system A's per-item metric actually better than
    * system B's, where BOTH scored the same items? Resampling the
    * ITEMS (the pairing) rather than each system separately is what
    * keeps the correlated per-item difficulty from swamping the
    * delta. Weights are the same md5-ladder Poisson(1) draws as
    * [[poissonBootstrap]] — replicate b's verdict is the exact
    * integer SIGN of `Σ w_i·(a_i − b_i)`.
    *
    * One summary row: the full-data delta, the bootstrap win count /
    * fraction (how often A beats B across replicates — the p-value's
    * complement in Koehn's procedure), and the replicate-range delta
    * CI (the bs1 convention).
    *
    * Determinism: metrics micro-quantize once; weights are integer
    * ladder lookups; every replicate statistic is an exact decimal
    * sum and one integer division. Fully combinable — one
    * (replicate)-keyed shuffle of narrow rows.
    */
  def pairedBootstrap(df: DataFrame, aCol: String, bCol: String,
                      idCol: String, reps: Int = 32): DataFrame = {
    require(reps >= 2, "need at least two replicates")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(idCol).cast("string").as("id"),
      (floor(col(aCol) * lit(1e6) + lit(0.5)).cast("long") -
        floor(col(bCol) * lit(1e6) + lit(0.5)).cast("long")).as("d"))
    val full = base.agg(count(lit(1)).cast("long").as("n_rows"),
      sum(dec(col("d"))).as("s_d"))
    val withB = base.select(col("id"), col("d"),
      explode(array((0 until reps).map(lit(_)): _*)).as("b"))
    val u = conv(substring(md5(concat_ws(":", col("id"), col("b").cast("string"))),
      1, 15), 16, 10).cast("long")
    val w = poissonThresholds.zipWithIndex.foldRight(
        lit(poissonThresholds.size): Column) {
      case ((t, k), acc) => when(u < lit(t), lit(k)).otherwise(acc)
    }
    val perRep = withB.withColumn("w", w.cast("long"))
      .groupBy("b")
      .agg(sum("w").cast("long").as("n_eff"),
        sum(dec(col("w")) * dec(col("d"))).as("s_wd"))
      .withColumn("delta_micro",
        expr("CAST(CASE WHEN n_eff = 0 THEN 0 ELSE s_wd div n_eff END AS BIGINT)"))
    val scalars = perRep.agg(
      sum(when(col("s_wd") > 0, 1L).otherwise(0L)).cast("long").as("n_wins"),
      min("delta_micro").as("delta_lo_micro"),
      max("delta_micro").as("delta_hi_micro"))
    scalars.crossJoin(broadcast(full))
      .select(col("n_rows"), lit(reps.toLong).as("reps"),
        expr("CAST(s_d div n_rows AS BIGINT)").as("delta_full_micro"),
        col("n_wins"),
        expr(s"(n_wins * 1000000L) div ${reps}L").as("win_micro"),
        col("delta_lo_micro"), col("delta_hi_micro"))
  }

  /** Krippendorff's α, nominal metric (Krippendorff 2004 §11; the
    * pairable-values form) — the labeler-agreement coefficient that,
    * unlike [[fleissKappa]], handles MISSING ratings natively: items
    * rated by any subset of labelers contribute exactly their pairable
    * values. The labeling-pipeline QA staple when annotation is
    * sparse (every real crowd/model-labeler matrix is).
    *
    * Each input ROW is one rating of `itemCol` with label `labelCol`
    * (rater identity cancels out of the nominal-α math — only the
    * per-item label multiset matters). Items with one rating are
    * dropped (no pairable values), counted in the audit columns. With
    * n_uc = count of label c on item u, m_u = Σ_c n_uc:
    * `D_o ∝ Σ_u Σ_c n_uc·(m_u − n_uc)/(m_u − 1)` and
    * `α = 1 − (n−1)·D_o_num / Σ_c n_c·(n − n_c)` over the pairable
    * universe of n values.
    *
    * Determinism: each item's disagreement term is an exact pico
    * integer division (`Σ_c n_uc(m_u−n_uc)·10¹² div (m_u−1)`); the
    * totals are exact decimal sums; α is ONE fixed-order double
    * expression, nano-quantized.
    *
    * Scale: one combinable (item, label) cell shuffle; items-bounded
    * tables after; the category marginal is labels-bounded.
    */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
                        labelCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = ratings.groupBy(col(itemCol).cast("string").as("u"),
        col(labelCol).cast("string").as("c"))
      .agg(count(lit(1)).cast("long").as("n_uc"))
    val items = cells.groupBy("u").agg(sum("n_uc").cast("long").as("m_u"),
      sum(col("n_uc") * col("n_uc")).cast("long").as("sq_u"))
    val kept = items.filter(col("m_u") >= 2L)
      // Σ_c n_uc(m_u − n_uc) = m_u² − Σ_c n_uc²
      .withColumn("d_u", col("m_u") * col("m_u") - col("sq_u"))
      .withColumn("term_pico", expr("(d_u * 1000000000000L) div (m_u - 1L)"))
    val dropped = items.filter(col("m_u") < 2L)
      .agg(count(lit(1)).cast("long").as("n_items_dropped"))
    val tot = kept.agg(count(lit(1)).cast("long").as("n_items_used"),
      sum("m_u").cast("long").as("n_values"),
      sum(dec(col("term_pico"))).as("do_pico"))
    val catMarg = cells.join(kept.select("u"), Seq("u"), "left_semi")
      .groupBy("c").agg(sum("n_uc").cast("long").as("n_c"))
    val de = catMarg.crossJoin(broadcast(tot))
      .agg(count(lit(1)).cast("long").as("n_categories"),
        sum(dec(col("n_c")) * dec(col("n_values") - col("n_c"))).as("de_raw"))
    tot.crossJoin(dropped).crossJoin(de)
      // no pairable items at all (every item a singleton): kept is
      // empty, so n_values/do_pico/de_raw are NULL sums and BOTH
      // when-branches would miss — while the oracle's GROUP BY over an
      // empty category marginal emits zero rows. Agree with the oracle:
      // emit the empty frame (α is undefined with nothing to pair).
      .filter(coalesce(col("n_values"), lit(0L)) >= 2L)
      .select(col("n_items_used"), col("n_items_dropped"), col("n_values"),
        col("n_categories"),
        // single-category universe: D_e = 0, α undefined — report
        // perfect agreement (there is literally nothing to disagree on)
        when(col("de_raw") === lit(0).cast("decimal(38,0)"), lit(1000000000L))
          .otherwise(floor((lit(1.0) -
            (col("n_values").cast("double") - lit(1.0)) *
              (col("do_pico").cast("double") / lit(1e12)) /
              col("de_raw").cast("double")) * lit(1e9) + lit(0.5))
            .cast("long")).as("alpha_nano"))
  }

  /** Neyman allocation (Neyman 1934, the optimal-stratified-sampling
    * design): given a total evaluation budget `n`, how many samples
    * should each stratum get? `n_h ∝ N_h·σ_h` — strata that are BIG
    * or NOISY earn more of the budget; the design that minimizes the
    * estimator's variance at fixed cost, and the principled way to
    * size a human-eval or held-out set per (source, language, …)
    * stratum instead of proportional-or-uniform guessing.
    *
    * Determinism: per-stratum moments are exact (micro-quantized
    * values, decimal sums); σ_h is one fixed-order double,
    * pico-quantized into an integer WEIGHT; integer allocations use
    * LARGEST-REMAINDER apportionment on the weight shares
    * (`floor(n·w_h/W)` + one extra to the largest remainders, ties by
    * stratum name), so Σn_h = n EXACTLY and every step is integer
    * arithmetic after the one σ quantization.
    *
    * Scale: one combinable stratum-moment shuffle; apportionment runs
    * on the strata-bounded table (two windows).
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
                       budget: Long): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(stratumCol).cast("string").as("h"),
        floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long").as("q"))
      .groupBy("h")
      .agg(count(lit(1)).cast("long").as("n_h"),
        sum(dec(col("q"))).as("s"),
        sum(dec(col("q")) * dec(col("q"))).as("ss"))
    // population σ (N in the denominator — the design-variance form);
    // single-row strata have σ = 0 and draw only remainder samples
    val nd = col("n_h").cast("double")
    val varPop = (col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / nd) / nd
    // zero-variance strata keep weight 1 (not 0): apportionment then
    // always sums to n even when EVERY stratum is degenerate, and a
    // constant stratum still gets the minimal screening presence
    val weighted = cells
      .withColumn("w_pico", greatest(
        floor(nd * sqrt(greatest(varPop, lit(0.0))) + lit(0.5)).cast("long"),
        lit(1L)))
    val tot = weighted.agg(sum(dec(col("w_pico"))).as("w_tot"))
    val shares = weighted.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"CAST((w_pico * ${budget}L) div " +
        "CASE WHEN w_tot = 0 THEN 1 ELSE w_tot END AS BIGINT)"))
      .withColumn("rem", expr(s"CAST((w_pico * ${budget}L) % " +
        "CASE WHEN w_tot = 0 THEN 1 ELSE w_tot END AS BIGINT)"))
    val short = shares.agg((lit(budget) - sum("base")).cast("long").as("k"))
    shares.crossJoin(broadcast(short))
      .withColumn("rr", row_number().over(
        Window.orderBy(col("rem").desc, col("h").asc)))
      .select(col("h").as("stratum"), col("n_h"), col("w_pico"),
        (col("base") + when(col("rr") <= col("k"), 1L).otherwise(0L))
          .as("n_alloc"))
  }

  /** Simpson's-paradox detector (the Yule–Simpson reversal audit):
    * does the pooled association between a binary treatment and a
    * binary outcome have the OPPOSITE sign of (all, or most of) the
    * within-stratum associations? The data-quality sibling of
    * [[stratifiedAte]]: where ipw1 CORRECTS for the confounder, this
    * FLAGS that a naive pooled read of the table would mislead.
    *
    * Per stratum and pooled, the association sign is the sign of
    * `p₁ − p₀` compared as exact integer cross-products
    * (`s1·n0 − s0·n1` — no division, no float). Output: one row per
    * stratum with its sign, plus the pooled sign and a `reversed`
    * flag per stratum; `n_reversed` on every row is the audit scalar.
    *
    * Scale: ONE combinable (stratum, arm) cell shuffle; everything
    * after is strata-bounded.
    */
  def simpsonAudit(df: DataFrame, stratumCol: String, treatedCol: String,
                   outcomeCol: String): DataFrame = {
    val cells = df.select(col(stratumCol).cast("string").as("h"),
        when(col(treatedCol), 1L).otherwise(0L).as("arm"),
        when(col(outcomeCol), 1L).otherwise(0L).as("y"))
      .groupBy("h", "arm")
      .agg(count(lit(1)).cast("long").as("n"), sum("y").cast("long").as("s"))
    val st = cells.groupBy("h").agg(
      sum(when(col("arm") === 1L, col("n")).otherwise(0L)).cast("long").as("n1"),
      sum(when(col("arm") === 1L, col("s")).otherwise(0L)).cast("long").as("s1"),
      sum(when(col("arm") === 0L, col("n")).otherwise(0L)).cast("long").as("n0"),
      sum(when(col("arm") === 0L, col("s")).otherwise(0L)).cast("long").as("s0"))
      .filter(col("n1") > 0L && col("n0") > 0L)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val withSign = st.withColumn("sign",
      signum((dec(col("s1")) * dec(col("n0")) -
        dec(col("s0")) * dec(col("n1"))).cast("double")).cast("int"))
    val pooled = withSign.agg(
      sum("s1").cast("long").as("ps1"), sum("n1").cast("long").as("pn1"),
      sum("s0").cast("long").as("ps0"), sum("n0").cast("long").as("pn0"))
      .select(signum((dec(col("ps1")) * dec(col("pn0")) -
        dec(col("ps0")) * dec(col("pn1"))).cast("double")).cast("int")
        .as("pooled_sign"))
    val flagged = withSign.crossJoin(broadcast(pooled))
      .withColumn("reversed",
        col("sign") =!= 0 && col("pooled_sign") =!= 0 &&
          col("sign") =!= col("pooled_sign"))
    val audit = flagged.agg(
      sum(when(col("reversed"), 1L).otherwise(0L)).cast("long")
        .as("n_reversed"))
    flagged.crossJoin(broadcast(audit))
      .select(col("h").as("stratum"), col("n1"), col("s1"), col("n0"),
        col("s0"), col("sign"), col("pooled_sign"), col("reversed"),
        col("n_reversed"))
  }

  /** Spearman's ρ between two integer metrics over a bounded item
    * table — Pearson correlation ON THE RANKS: [[kendallTauB]]'s
    * moment-based sibling (ρ weighs the SIZE of rank displacements
    * where τ counts inversions; both are monotone-transform
    * invariant). Ties take the standard AVERAGE (fractional) rank,
    * kept exact by working in DOUBLED ranks: `rank2x = 2·min_rank +
    * tie_count − 1`, an integer for any tie pattern.
    *
    * Determinism: all five moment sums are exact decimal sums of
    * integer products; ρ is ONE fixed-order double expression over
    * them, nano-quantized. A constant metric (zero rank variance)
    * reports 0.
    *
    * Scale: the items table is bounded by contract (sources, systems
    * — the kt1 precedent), so the two global rank windows are
    * items-sized, never corpus-sized; the corpus pass producing the
    * metrics is the caller's.
    */
  def spearmanRho(items: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = items.select(col(keyCol).cast("string").as("k"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val ranked = base
      .withColumn("rx0", rank().over(Window.orderBy("x")).cast("long"))
      .withColumn("cx", count(lit(1)).over(Window.partitionBy("x")).cast("long"))
      .withColumn("ry0", rank().over(Window.orderBy("y")).cast("long"))
      .withColumn("cy", count(lit(1)).over(Window.partitionBy("y")).cast("long"))
      .select(col("k"),
        (lit(2L) * col("rx0") + col("cx") - lit(1L)).as("rx"),
        (lit(2L) * col("ry0") + col("cy") - lit(1L)).as("ry"))
    val m = ranked.agg(count(lit(1)).cast("long").as("n"),
      sum(dec(col("rx"))).as("sx"), sum(dec(col("ry"))).as("sy"),
      sum(dec(col("rx")) * dec(col("ry"))).as("sxy"),
      sum(dec(col("rx")) * dec(col("rx"))).as("sxx"),
      sum(dec(col("ry")) * dec(col("ry"))).as("syy"))
    val nd = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"))
    val den = (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    m.select(col("n"),
      when(den > 0.0,
        floor((nd * sxy - sx * sy) / sqrt(den) * lit(1e9) + lit(0.5))
          .cast("long")).otherwise(lit(0L)).as("rho_nano"))
  }

  /** Unbiased Best-of-N curve (the BoN estimator of Nakano et al. '21,
    * WebGPT App. C — the standard way RLHF papers report "reward of
    * the best of n samples" WITHOUT re-sampling): with a prompt's N
    * candidate scores sorted ascending s₍₁₎…s₍N₎, the exact
    * expectation of max over a uniform n-subset is
    * `Σᵢ C(i−1, n−1)/C(N, n) · s₍ᵢ₎` — every n-subset's max is the
    * highest-ranked member it contains, and C(i−1, n−1) counts the
    * subsets whose max is exactly rank i. One pass gives the whole
    * scaling curve n = 1..maxN; the curve's shape (how fast BoN
    * saturates) is THE reward-hacking / sample-budget readout.
    *
    * Determinism: scores are micro-quantized BEFORE ranking, so the
    * order statistic is an integer total order (score, id); binomial
    * weights are exact longs via the in-order multiplicative fold
    * `Πⱼ (i−n+j)/j` (integrality holds at every step — each prefix is
    * itself a binomial); per-prompt values and the cross-prompt mean
    * are exact integer divisions of decimal sums. Exactness needs
    * C(nn, n)·nn to fit a long, so group sizes past the maxN-derived
    * cap (≈4100 at maxN = 5) raise_error instead of silently
    * overflowing the non-ANSI fold.
    *
    * Scale: one (prompt) shuffle to rank candidates, one maxN-way
    * in-row explode, one combinable (n) rollup — corpus-linear, no
    * windows wider than a prompt's candidate list.
    */
  def bestOfN(scored: DataFrame, promptCol: String, scoreCol: String,
              idCol: String, maxN: Int = 5): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // Exact-long cap: the largest fold intermediate is C(nn, n)·nn for
    // n <= maxN — beyond this group size the non-ANSI long fold would
    // overflow SILENTLY and corrupt the curve. Binary-search the
    // largest safe nn for this maxN and fail loudly past it.
    val cap: Long = {
      def comb(nn: Long, k: Int): BigInt =
        (1 to k).foldLeft(BigInt(1))((a, j) => a * BigInt(nn - k + j) / j)
      def safe(nn: Long): Boolean =
        (1 to math.min(maxN, nn.min(Int.MaxValue).toInt)).forall(k =>
          comb(nn, k) * nn <= BigInt(Long.MaxValue))
      var lo = 1L; var hi = Long.MaxValue / 2
      while (lo < hi) {
        val mid = lo + (hi - lo + 1) / 2
        if (safe(mid)) lo = mid else hi = mid - 1
      }
      lo
    }
    val base = scored.select(col(promptCol).cast("long").as("p"),
      floor(col(scoreCol) * lit(1e6) + lit(0.5)).cast("long").as("s"),
      col(idCol).cast("long").as("id"))
    val w = Window.partitionBy("p").orderBy(col("s").asc, col("id").asc)
    val ranked = base
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("p")).cast("long"))
      .withColumn("nn", when(col("nn") <= lit(cap), col("nn")).otherwise(
        expr(s"CAST(raise_error(concat('bestOfN: prompt group size ', " +
          s"CAST(nn AS STRING), ' exceeds the exact-long binomial cap " +
          s"$cap for maxN=$maxN')) AS BIGINT)")))
      .withColumn("n", explode(expr(
        s"transform(sequence(1, $maxN), x -> CAST(x AS BIGINT))")))
      .filter(col("n") <= col("nn"))
    // C(i-1, n-1) and C(N, n): exact multiplicative folds, n=1 guarded
    // (Spark sequence(1, 0) auto-reverses instead of emptying)
    val wNum = expr(
      """CASE WHEN n = 1L THEN 1L
        |  WHEN i - 1L < n - 1L THEN 0L
        |  ELSE aggregate(sequence(1L, n - 1L), 1L,
        |    (acc, j) -> (acc * (i - n + j)) div j) END""".stripMargin)
    val wDen = expr(
      "aggregate(sequence(1L, n), 1L, (acc, j) -> (acc * (nn - n + j)) div j)")
    ranked
      .withColumn("wn", wNum).withColumn("wd", wDen)
      .groupBy("p", "n")
      .agg(sum(dec(col("s")) * dec(col("wn"))).as("num"),
        first(col("wd")).as("den"))
      .select(col("p"), col("n"),
        expr("CAST(num div den AS BIGINT)").as("bon_micro"))
      .groupBy("n")
      .agg(count(lit(1)).cast("long").as("n_prompts"),
        sum(dec(col("bon_micro"))).as("sb"))
      .select(col("n"), col("n_prompts"),
        expr("CAST(sb div n_prompts AS BIGINT)").as("mean_bon_micro"))
  }
}
