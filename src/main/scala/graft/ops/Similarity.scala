package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the 100 TB scale path.
  *
  * All arithmetic is double-precision, in array order (zip_with →
  * left-to-right aggregate), so results are bit-deterministic and
  * reproducible by any engine that follows the same order — which is
  * how the DuckDB oracle checks these queries exactly.
  */
object Similarity {

  /** In-order double dot product of two float/double arrays, as a
    * native codegen'd Expression (graft.functions.VectorDot) — one
    * fused loop instead of zip_with allocation + boxed lambda folds.
    * Identical accumulation order, so values are bit-for-bit the same
    * as the higher-order formulation, to which this degrades gracefully
    * on sessions built without GraftExtensions.
    */
  def dot(a: Column, b: Column): Column =
    if (graft.GraftExtensions.available("vector_dot"))
      graft.functions.VectorDot.vector_dot(a, b)
    else dotHof(a, b)

  /** Composable-built-ins fallback of [[dot]]; same values. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for every query vector, the k
    * nearest corpus vectors. The query side is broadcast (queries are
    * small by construction); the corpus is scanned once, partitioned by
    * query for the top-k window. At 100 TB this is the correct plan for
    * small query batches; for large query sets use `lshTopK`.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are computed ONCE per side before the join (n+m sqrt-dots
    // instead of 2·n·m inside the pair loop)
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm")))
    val scored = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
        norm(col(vecCol)).as("n_norm"))
      .join(q, col("n_id") =!= col("q_id"))
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("sim"))
  }

  /** kNN label-probe accuracy — THE standard embedding-quality probe
    * (a cheap stand-in for linear-probe training): for a bounded
    * query sample, take the exact cosine top-k neighbors (self
    * excluded), majority-vote their labels (ties break to the
    * smallest label), and score against the query's own label,
    * reported per label. Separates "geometry recovers labels" from
    * "geometry is merely non-degenerate" (iso1/eo1 can't tell).
    *
    * Determinism: the neighbor rank is [[bruteForceTopK]]'s
    * established (sim desc, id asc) total order; votes are exact
    * integer counts with a deterministic tiebreak; accuracy is one
    * exact micro division.
    *
    * Scale: the query side is sample-bounded BY CONTRACT (broadcast);
    * the corpus scans once against it (the ss1 shape); everything
    * after lives on queries×k rows.
    */
  def knnProbeAccuracy(vecs: DataFrame, queryPred: Column, k: Int = 5,
                       labelCol: String = "label", idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val base = vecs.select(col(idCol), col(labelCol).cast("long").as("lbl"),
      col(vecCol))
    val nn = bruteForceTopK(base, base.filter(queryPred), k, idCol, vecCol)
    val lbls = base.select(col(idCol), col("lbl"))
    val voted = nn
      .join(lbls.select(col(idCol).as("n_id"), col("lbl").as("n_lbl")),
        "n_id")
      .join(broadcast(lbls.select(col(idCol).as("q_id"),
        col("lbl").as("q_lbl"))), "q_id")
      .groupBy("q_id", "q_lbl", "n_lbl")
      .agg(count(lit(1)).cast("long").as("c"))
      .withColumn("rn", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("c").desc, col("n_lbl").asc)))
      .filter(col("rn") === 1)
    voted.groupBy(col("q_lbl").as("label"))
      .agg(count(lit(1)).cast("long").as("n_queries"),
        sum(when(col("n_lbl") === col("q_lbl"), 1L).otherwise(0L))
          .cast("long").as("n_correct"))
      .withColumn("acc_micro", expr("(n_correct * 1000000L) div n_queries"))
  }

  /** Matryoshka truncation evaluation (Kusupati et al. 2022,
    * "Matryoshka Representation Learning"): recall@k of
    * prefix-truncated embeddings against the full-dimension exact
    * top-k — the measurement that decides how many dimensions a
    * deployment can drop before retrieval quality pays for it. For
    * each d in `prefixes`, corpus and queries truncate to their first
    * d components, the exact top-k recomputes, and recall@k is each
    * query's overlap fraction with the full-dim truth (k exactly
    * divides the count, so the ratio is one exact division).
    *
    * Scale: one [[bruteForceTopK]]-shaped pass per prefix plus the
    * full-dim pass — broadcast queries, corpus scanned once per pass,
    * overlap joined on (q_id, n_id) over k-row-per-query tables. The
    * corpus passes share nothing BY DESIGN: truncated dots are not
    * derivable from full dots, so fusing them would only widen one
    * scan without removing work.
    */
  def matryoshkaRecall(corpus: DataFrame, queries: DataFrame, k: Int,
                       prefixes: Seq[Int] = Seq(16, 32),
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && prefixes.nonEmpty, "need k > 0 and at least one prefix")
    val full = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .select(col("q_id"), col("n_id"), lit(1).as("__hit"))
    prefixes.map { d =>
      val tc = corpus.withColumn(vecCol, slice(col(vecCol), 1, d))
      val tq = queries.withColumn(vecCol, slice(col(vecCol), 1, d))
      bruteForceTopK(tc, tq, k, idCol, vecCol)
        .join(full, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(col("__hit")).cast("long").as("n_overlap"))
        .select(lit(d).as("dims"), col("q_id"), col("n_overlap"),
          round(col("n_overlap").cast("double") / k, 6).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
    * LASER/CCMatrix construction): candidate cross-lingual pairs
    * (s, t) are scored by RATIO MARGIN
    *   margin(s,t) = cos(s,t) / ((avgK(s) + avgK(t)) / 2)
    * where avgK(v) is the mean cosine of v's k nearest candidates on
    * the other side — the normalization that suppresses "hub" vectors
    * which are near everything. Emitted pairs are MUTUAL BEST matches
    * (t is s's max-margin target and vice versa, ties by id) above
    * `marginThreshold` — the precision-oriented intersection criterion.
    *
    * Engine portability (this is a gate query): avgK is computed as an
    * explicit LEFT FOLD over the top-k cosines in (cos desc, id asc)
    * order — the md5-fold discipline — so the averages, margins, and
    * therefore the mutual-best ranks are bit-identical in any engine
    * that folds the same ordered list.
    *
    * Scale: `candidates` defaults to the full cross join — correct for
    * bounded sides (a language pair's aligned shard). At corpus scale
    * pass LSH/IVF candidates ((s_id, t_id) from [[lshTopK]] /
    * [[ivfTopK]] with k' > k); everything downstream of scoring
    * shuffles (s_id, t_id, cos) triples only — the vectors never move
    * after the one scoring pass.
    */
  def bitextMine(src: DataFrame, tgt: DataFrame, k: Int = 4,
                 marginThreshold: Double = 1.05,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 candidates: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k must be positive")
    val s = src.select(col(idCol).as("s_id"), col(vecCol).as("s_vec"),
      norm(col(vecCol)).as("s_norm"))
    val t = tgt.select(col(idCol).as("t_id"), col(vecCol).as("t_vec"),
      norm(col(vecCol)).as("t_norm"))
    val paired = candidates match {
      case Some(c) => c.select("s_id", "t_id").join(s, "s_id").join(t, "t_id")
      case None    => s.crossJoin(t)
    }
    val scored = paired
      .withColumn("cos_sim",
        dot(col("s_vec"), col("t_vec")) / (col("s_norm") * col("t_norm")))
      .select("s_id", "t_id", "cos_sim")
    // top-k mean per side as an ordered left fold (portability, above)
    def avgK(key: String, other: String, as: String): DataFrame = {
      val w = Window.partitionBy(col(key))
        .orderBy(col("cos_sim").desc, col(other).asc)
      scored.withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
        .groupBy(col(key))
        .agg(sort_array(collect_list(
          struct((-col("cos_sim")).as("nc"), col(other).as("oid"),
            col("cos_sim").as("c")))).as("__l"))
        .select(col(key),
          (aggregate(transform(col("__l"), x => x.getField("c")),
            lit(0.0), (acc, v) => acc + v) / size(col("__l"))).as(as))
    }
    val m = scored
      .join(avgK("s_id", "t_id", "__avg_s"), "s_id")
      .join(avgK("t_id", "s_id", "__avg_t"), "t_id")
      .withColumn("margin",
        col("cos_sim") / ((col("__avg_s") + col("__avg_t")) / lit(2.0)))
    val bs = Window.partitionBy(col("s_id"))
      .orderBy(col("margin").desc, col("t_id").asc)
    val bt = Window.partitionBy(col("t_id"))
      .orderBy(col("margin").desc, col("s_id").asc)
    m.withColumn("__bs", row_number().over(bs))
      .withColumn("__bt", row_number().over(bt))
      .filter(col("__bs") === 1 && col("__bt") === 1
        && col("margin") > marginThreshold)
      .select(col("s_id"), col("t_id"), col("cos_sim"), col("margin"))
  }

  /** SRP-LSH candidate pairs ACROSS two tables — the scale path that
    * feeds [[bitextMine]]'s `candidates` parameter (and any other
    * cross-corpus scorer): both sides are bucketed under `nTables`
    * independent sign-random-projection tables, the source side
    * additionally probes every bucket at Hamming distance 1
    * (asymmetric, the [[lshNearDupPairs]] rationale), and pairs form
    * only inside colliding (table, bucket) cells.
    *
    * Shuffle discipline (the dd3 pattern): the explode and the
    * (tbl, bkt) equi-join carry ONLY (id, table, bucket) longs —
    * vectors never ride the candidate shuffle; the caller re-joins
    * payloads for the surviving deduplicated (s_id, t_id) pairs. At
    * 100 TB this replaces the O(n_s × n_t) cross join with
    * sum-of-bucket-products work while every downstream margin /
    * mutual-best step is unchanged.
    */
  def lshCandidatePairs(src: DataFrame, tgt: DataFrame,
                        nPlanes: Int = 8, nTables: Int = 8, dim: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        baseSeed: Long = 11L, multiProbe: Boolean = true): DataFrame = {
    def bucketed(df: DataFrame, as: String, probe: Boolean): DataFrame = {
      val bktCols = (0 until nTables).map(t =>
        srpBucket(col(vecCol), nPlanes, dim, seed = baseSeed + t).as(s"__b$t"))
      val base = df.select(col(idCol).as(as) +: bktCols: _*)
      val tb = (0 until nTables).flatMap { t =>
        val bkt = col(s"__b$t")
        val probes =
          if (probe) bkt +: (0 until nPlanes).map(p => bkt.bitwiseXOR(lit(1L << p)))
          else Seq(bkt)
        probes.map(b => struct(lit(t).as("tbl"), b.as("bkt")))
      }
      base.select(col(as), explode(array(tb: _*)).as("tb"))
        .select(col(as), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    }
    bucketed(src, "s_id", probe = multiProbe)
      .join(bucketed(tgt, "t_id", probe = false), Seq("tbl", "bkt"))
      .select(col("s_id"), col("t_id"))
      .dropDuplicates("s_id", "t_id")
  }

  /** Exact per-dimension winsorization bounds (the outlier-clamping
    * feature-scaling step beside [[standardize]]): for each dimension,
    * the RANK-BASED lower/upper clip values — lo = k-th smallest,
    * hi = (n−k+1)-th smallest with k = ceil(p·n) — plus how many
    * values each side would clamp. Rank-based (not interpolated)
    * bounds are data values, so they are exact and engine-portable;
    * the value at a rank is invariant to how ties are broken.
    *
    * Scale: one posexplode to (dim, value, id) and one per-dim window
    * — the exact-order-statistic cost (cf. card1's median note); the
    * histogram rollup (`hq1`) is the approximate path at petabyte
    * rows.
    */
  def winsorizeBounds(vectors: DataFrame, p: Double = 0.01,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val ex = vectors.select(col(idCol).as("id"),
        posexplode(transform(col(vecCol), _.cast("double"))).as(Seq("dim_idx", "v")))
    val w = Window.partitionBy(col("dim_idx"))
    val ranked = ex
      .withColumn("rn", row_number().over(w.orderBy(col("v"), col("id"))))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("k", ceil(col("n") * lit(p)).cast("long"))
    val bounds = ranked
      .filter(col("rn") === col("k") || col("rn") === col("n") - col("k") + 1)
      .groupBy(col("dim_idx"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    ex.join(bounds, "dim_idx")
      .groupBy(col("dim_idx"))
      .agg(first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_above"))
  }

  /** Hard-negative mining for metric/embedding training (the FaceNet
    * triplet-mining step, Schroff et al. CVPR'15): for every anchor,
    * the k most similar corpus vectors with a DIFFERENT label — the
    * negatives a contrastive trainer most needs — plus the anchor's
    * best same-label similarity (`pos_sim`) and the margin-violation
    * flag (`sim > pos_sim − margin`) that marks the triplets worth
    * training on.
    *
    * Same plan shape as [[bruteForceTopK]]: anchors broadcast, corpus
    * scanned once (label filter rides the join condition — an integer
    * compare), norms precomputed per side, one window per anchor for
    * the top-k. For anchor sets too large to broadcast, mine inside
    * LSH buckets ([[lshTopK]]) — the approximate-negatives tradeoff
    * the literature makes at corpus scale.
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
                    margin: Double = 0.2, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val a = broadcast(anchors.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"), col(labelCol).as("q_label")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_norm"), col(labelCol).as("n_label"))
    // best same-label similarity per anchor (the "positive" the margin
    // is measured against) — one corpus pass, combinable max
    val pos = c.join(a, col("n_id") =!= col("q_id") &&
        col("n_label") === col("q_label"))
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
      .groupBy(col("q_id").as("p_id")).agg(max(col("sim")).as("pos_sim"))
    val neg = c.join(a, col("n_id") =!= col("q_id") &&
        col("n_label") =!= col("q_label"))
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    neg.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(pos, col("q_id") === col("p_id"), "left")
      .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
        col("rank"), col("sim"), col("pos_sim"),
        (col("sim") > col("pos_sim") - lit(margin)).as("violates_margin"))
  }

  /** Deterministic random hyperplanes: nPlanes literal ±1 arrays of
    * length dim from a seeded RNG (tiny: 16×64 doubles), so bucketing
    * is pure codegen'd arithmetic. Each plane is ONE array Literal
    * (`typedlit`), not a 64-node CreateArray tree — with
    * planes × tables × dim literals the tree-shaped form made codegen
    * JIT the dominant cost of the LSH queries.
    */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Column] =
    planeSigns(nPlanes, dim, seed).map(typedlit(_))

  /** The raw ±1 plane components behind [[srpBucket]] — public so the
    * DuckDB oracle generator (graft.OracleGen) can serialize the SAME
    * literals into SQL and recompute buckets exactly. Element order is
    * the seeded-RNG call order; both consumers share one definition so
    * they cannot drift.
    */
  def planeSigns(nPlanes: Int, dim: Int, seed: Long): Seq[IndexedSeq[Double]] = {
    val r = new Random(seed)
    (0 until nPlanes).map { _ =>
      (0 until dim).map(_ => if (r.nextBoolean()) 1.0 else -1.0)
    }
  }

  /** Sign-random-projection bucket id (one long of nPlanes bits). The
    * plane count is static, so each bit is a Scala-side `1L << p`
    * literal — no Column-typed shift needed.
    */
  def srpBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 7L): Column =
    hyperplanes(nPlanes, dim, seed).zipWithIndex.map { case (plane, p) =>
      when(dot(plane, vec) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))

  /** LSH-bucketed approximate top-k with MULTI-PROBE: corpus and
    * queries are bucketed by sign-random-projection under `nTables`
    * independent tables; each QUERY additionally probes every bucket
    * within Hamming distance `probeHamming` of its own (flipped
    * hyperplane bits), so a near-neighbor split off by one or two
    * borderline planes is still found. Exact cosine runs only inside
    * matching buckets. Misses remain possible (approximate by design);
    * recall grows with nTables and probe depth.
    *
    * Scale profile: the CORPUS side stays one bucket per table (narrow
    * map — the big side never fans out); only the query side explodes,
    * ×(1 + nPlanes + C(nPlanes,2)) at depth 2 — and query batches are
    * small BY DEFINITION of this operator (large query sets pair with
    * `lshNearDupPairs`), so aggressive probing is nearly free where it
    * buys the most recall. The join is an equi-join on (table, bucket)
    * — shuffle proportional to candidates. This is the plan that
    * survives a 1000-executor corpus where broadcast brute force
    * cannot.
    *
    * Shuffle discipline (the dd3 pattern, shared with
    * [[lshNearDupPairs]]): the bucket explode and (tbl, bkt) equi-join
    * carry ONLY (id, table, bucket) tuples — three longs per row — so
    * neither the ×316 probe fan-out nor the candidate exchange ever
    * ships a 64-dim vector. Vectors re-join ONCE per surviving
    * deduplicated (q_id, n_id) candidate for the exact-cosine scoring
    * pass: corpus vectors via an ids-keyed equi-join (narrow payload ×
    * candidates, not × probes), query vectors via a small-side join
    * AQE turns into a broadcast.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 12, nTables: Int = 4, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding",
              probeHamming: Int = 2): DataFrame =
    scoreCosineTopK(corpus, queries,
      srpCandidates(corpus, queries, nPlanes, nTables, dim, idCol, vecCol,
        probeHamming),
      k, idCol, vecCol)

  /** The SRP bucket-collision candidate set of [[lshTopK]], exposed as
    * ids only — (q_id, n_id) pairs that share a bucket in any table,
    * query-side multi-probed. This is the PREFILTER stage for scorers
    * that are too expensive to run against the whole corpus (MaxSim
    * late interaction, cross-encoder shortlists): candidate generation
    * carries three longs per row, vectors join only for survivors.
    */
  def srpCandidates(corpus: DataFrame, queries: DataFrame,
                    nPlanes: Int = 12, nTables: Int = 4, dim: Int = 64,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    probeHamming: Int = 2): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 2, "probeHamming in [0, 2]")
    def bucketed(df: DataFrame, prefix: String, probe: Boolean): DataFrame = {
      // materialize each table's bucket ONCE in its own projection: the
      // probe structs reference the alias, not dozens of copies of the
      // 12-plane dot-product tree (CollapseProject keeps the stage
      // split because the alias is expensive and multi-referenced —
      // without this the probe fan-out made codegen JIT 13× the work)
      val bktCols = (0 until nTables).map(t =>
        srpBucket(col(vecCol), nPlanes, dim, seed = 7L + t).as(s"__b$t"))
      val base = df.select(col(idCol).as(s"${prefix}_id") +: bktCols: _*)
      val flips: Seq[Long] = Seq(0L) ++
        (if (probe && probeHamming >= 1)
          (0 until nPlanes).map(p => 1L << p) else Nil) ++
        (if (probe && probeHamming >= 2)
          (for (p <- 0 until nPlanes; r <- p + 1 until nPlanes)
            yield (1L << p) | (1L << r)) else Nil)
      val tb = (0 until nTables).flatMap { t =>
        val bkt = col(s"__b$t")
        flips.map(f => struct(lit(t).as("tbl"),
          (if (f == 0L) bkt else bkt.bitwiseXOR(lit(f))).as("bkt")))
      }
      base.select(col(s"${prefix}_id"), explode(array(tb: _*)).as("tb"))
        .select(col(s"${prefix}_id"),
          col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    }
    bucketed(corpus, "n", probe = false)
      .join(bucketed(queries, "q", probe = probeHamming > 0), Seq("tbl", "bkt"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"))
      .dropDuplicates("q_id", "n_id")
  }

  private def scoreCosineTopK(corpus: DataFrame, queries: DataFrame,
                              cand: DataFrame, k: Int,
                              idCol: String, vecCol: String): DataFrame = {
    val cv = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_norm"))
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    cand.join(cv, "n_id").join(qv, "q_id")
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("sim"))
  }

  /** An IVF coarse centroid: synthetic cell id, vector, L2 norm. */
  final case class Centroid(id: Long, vec: Array[Double], norm: Double)

  /** Deterministic DATA-INDEPENDENT centroids: seeded-Gaussian unit
    * vectors. Coarser cells than [[kmeansCentroids]] (they ignore the
    * corpus distribution), but every component is a fixed literal that
    * an external SQL engine can be handed verbatim — which is what lets
    * the driver's DuckDB oracle value-check the IVF query end to end.
    * The k-means index build stays quantified under the gate through
    * `ann2_recall_floor`, which uses the default (k-means) path.
    */
  def fixedCentroids(n: Int, dim: Int, seed: Long = 5L): Seq[Centroid] = {
    val r = new Random(seed)
    (0 until n).map { i =>
      val raw = Array.fill(dim)(r.nextGaussian())
      val nm = math.sqrt(raw.map(x => x * x).sum)
      val v = raw.map(_ / nm)
      Centroid(i.toLong, v, math.sqrt(v.map(x => x * x).sum).max(1e-12))
    }
  }

  /** Spherical k-means (Lloyd's) centroids for [[ivfTopK]], computed
    * driver-side over a deterministic hash-ordered sample — the same
    * plan-time-literal discipline as the probe plumbing, so the corpus
    * is never shuffled for index construction.
    *
    * Scale: the sample is a TakeOrdered over xxhash64(id) (map-side
    * top-N per partition, driver merge — no global sort), capped at
    * `sampleSize` rows ≈ 1 MB at dim 64; iterations are
    * sampleSize × k × dim flops on the driver, microseconds. Sampling
    * by id-hash is content-independent, deterministic across runs and
    * partitionings, and unbiased w.r.t. insertion order — unlike the
    * lowest-id prefix it replaces, which degenerates to one hot cell on
    * corpora where id order correlates with content (time-ordered
    * feeds). Vectors are L2-normalized first, so Lloyd's on them is
    * spherical k-means — consistent with the cosine argmax assignment.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      sampleSize: Int = 2048, iters: Int = 5): Seq[Centroid] = {
    val rows = corpus
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleSize)
      .select(col(vecCol).cast("array<double>"))
      .collect()
    require(rows.nonEmpty, "kmeansCentroids: empty corpus")
    val sample: Array[Array[Double]] = rows.map { r =>
      val v = r.getSeq[Double](0).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val dim = sample(0).length
    // init: first k sample rows (hash order = pseudo-random, seedless
    // and reproducible); pad cyclically if the corpus is tiny
    var cents: Array[Array[Double]] =
      Array.tabulate(k)(i => sample(i % sample.length).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      val cnorms = cents.map(c => math.sqrt(c.map(x => x * x).sum).max(1e-12))
      for (v <- sample) {
        var best = 0; var bestSim = Double.NegativeInfinity; var c = 0
        while (c < k) {
          var dp = 0.0; var i = 0
          val cent = cents(c)
          while (i < dim) { dp += cent(i) * v(i); i += 1 }
          val sim = dp / cnorms(c)
          if (sim > bestSim) { bestSim = sim; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        // empty cell: keep the old centroid rather than collapsing
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    cents.toIndexedSeq.zipWithIndex.map { case (v, i) =>
      Centroid(i.toLong, v, math.sqrt(v.map(x => x * x).sum).max(1e-12))
    }
  }

  /** Build the PERSISTABLE form of an IVF index: one row per corpus
    * vector with its coarse cell id co-located next to the raw vector —
    * the index-build half of the production build-once / query-many
    * split ([[ivfQueryIndex]] is the other half; `ivfTopK` fuses both
    * for one-shot use). Assignment is the same plan-time-literal argmax
    * as `ivfTopK` (ties to the larger cell id via struct ordering), so
    * a snapshot written by this function and queried by
    * [[ivfQueryIndex]] returns bit-identical results to the fused path.
    *
    * Scale: a single narrow projection over the corpus — no shuffle; a
    * writer partitioning the output BY cell turns every later probe
    * into a partition-pruned scan.
    */
  def ivfIndex(corpus: DataFrame, centroids: Seq[Centroid],
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "ivfIndex: need centroids")
    val cellStructs: Column = array(centroids.map { c =>
      val vlit = typedlit(c.vec.toIndexedSeq)
      struct((dot(vlit, col(vecCol)) / lit(c.norm)).as("c_sim"), lit(c.id).as("c_id"))
    }: _*)
    corpus.select(col(idCol), col(vecCol),
      array_max(cellStructs).getField("c_id").as("cell"))
  }

  /** Query a persisted [[ivfIndex]] snapshot: probe each query's nProbe
    * nearest cells, equi-join the stored assignment table on cell id,
    * exact cosine re-rank inside the probed cells. Norms are recomputed
    * from the stored vectors (float parquet round-trips are
    * bit-exact), so results match the fused `ivfTopK` on the same
    * centroids exactly.
    */
  def ivfQueryIndex(index: DataFrame, queries: DataFrame, k: Int,
                    nProbe: Int, centroids: Seq[Centroid],
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "ivfQueryIndex: need centroids")
    val cellStructs: Column = array(centroids.map { c =>
      val vlit = typedlit(c.vec.toIndexedSeq)
      struct((dot(vlit, col(vecCol)) / lit(c.norm)).as("c_sim"), lit(c.id).as("c_id"))
    }: _*)
    val probed = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"),
      explode(transform(slice(reverse(array_sort(cellStructs)), 1, nProbe),
        s => s.getField("c_id"))).as("cell"))
    val cells = index.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_norm"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    cells.join(probed, "cell")
      .filter(col("n_id") =!= col("q_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("sim"))
  }

  /** Incremental IVF maintenance: assign an APPENDED batch to the
    * EXISTING plan-time centroids — no retraining, no touch of the
    * stored index — and report, per cell, whether the quantizer still
    * fits the data. The lifecycle piece between a static [[ivfIndex]]
    * snapshot and a continuously-ingesting corpus (the SigStore-epochs
    * idea applied to the vector index): appends are one narrow map
    * (`ivfIndex(appended, cents)` writes the new epoch), and THIS
    * report is the retrain trigger.
    *
    * Per cell: `n_base`/`n_new` occupancy, `growth_micro`
    * (new-per-base), and the own-centroid cosine of each side's
    * members, averaged as exact integers (`sim1p_*_micro` = mean of
    * floor((cos+1)·10⁶+0.5) — the +1 shift keeps every quantity
    * non-negative so integer `div` semantics agree across engines).
    * `drift_micro` = base mean − new mean; `retrain` flags cells whose
    * appended members sit `driftMicro` or more below the resident
    * members — new data the old centroids no longer represent. Cell
    * assignment is the exact [[ivfIndex]] argmax (ties to the larger
    * cell id), so the report describes precisely what the index stores.
    *
    * Scale: two narrow assignment passes (nCentroids literals per row;
    * zero-norm rows guarded to cosine 0) + ONE combinable (cell)
    * shuffle of scalar rows; output is nCentroids-bounded. At 100 TB
    * the base side's (n, Σsim1p) pairs live as a per-cell summary in
    * the index ledger (the mv1 signed-delta discipline), so an append
    * tick aggregates only the new batch — passing the full base here
    * recomputes that summary in one pass without re-writing anything.
    */
  def ivfAppendReport(base: DataFrame, appended: DataFrame,
                      centroids: Seq[Centroid],
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      driftMicro: Long = 50000L): DataFrame = {
    require(centroids.nonEmpty, "ivfAppendReport: need centroids")
    val cellStructs: Column = array(centroids.map { c =>
      val vlit = typedlit(c.vec.toIndexedSeq)
      struct((dot(vlit, col(vecCol)) / lit(c.norm)).as("c_sim"), lit(c.id).as("c_id"))
    }: _*)
    def assigned(df: DataFrame, isNew: Int): DataFrame =
      df.select(array_max(cellStructs).as("b"), norm(col(vecCol)).as("vn"))
        .select(lit(isNew).as("is_new"), col("b.c_id").as("cell"),
          when(col("vn") === 0.0, 0L).otherwise(
            floor((col("b.c_sim") / col("vn") + lit(1.0)) * lit(1e6) + lit(0.5))
              .cast("long")).as("s1p"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    assigned(base, 0).unionByName(assigned(appended, 1))
      .groupBy("cell")
      .agg(sum(when(col("is_new") === 0, 1L).otherwise(0L)).cast("long").as("n_base"),
        sum(when(col("is_new") === 1, 1L).otherwise(0L)).cast("long").as("n_new"),
        sum(dec(when(col("is_new") === 0, col("s1p")).otherwise(0L))).as("sb"),
        sum(dec(when(col("is_new") === 1, col("s1p")).otherwise(0L))).as("sn"))
      .select(col("cell"), col("n_base"), col("n_new"),
        expr("(n_new * 1000000L) div greatest(n_base, 1L)").as("growth_micro"),
        when(col("n_base") > 0L, expr("CAST(sb div n_base AS BIGINT)"))
          .otherwise(0L).as("sim1p_base_micro"),
        when(col("n_new") > 0L, expr("CAST(sn div n_new AS BIGINT)"))
          .otherwise(0L).as("sim1p_new_micro"))
      .withColumn("drift_micro",
        when(col("n_base") > 0L && col("n_new") > 0L,
          col("sim1p_base_micro") - col("sim1p_new_micro")).otherwise(0L))
      .withColumn("retrain", col("drift_micro") > lit(driftMicro))
  }

  /** IVF (inverted-file) approximate top-k — the second scale path
    * besides SRP-LSH. The corpus is coarse-quantized into nCentroids
    * cells (spherical-k-means centroids from [[kmeansCentroids]] unless
    * an explicit centroid table is passed), each vector assigned to its
    * nearest centroid by one narrow pass over plan-time centroid
    * literals; each query probes its nProbe nearest cells and runs
    * exact cosine only inside them.
    *
    * Scale profile: assignment is pure per-row arithmetic over
    * nCentroids literals (no shuffle of the corpus); the search join is
    * an equi-join on cell id, so work is corpus/nCentroids × nProbe per
    * query — the standard IVF trade of recall for a nCentroids/nProbe
    * fraction of the scan.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 6,
              idCol: String = "vec_id", vecCol: String = "embedding",
              centroids: Seq[Centroid] = Nil): DataFrame = {
    val cents: Seq[Centroid] =
      if (centroids.nonEmpty) centroids
      else kmeansCentroids(corpus, nCentroids, idCol, vecCol)

    // struct(c_sim, c_id) per centroid; struct ordering sorts by sim
    // first. The row vector's own norm is constant across centroids, so
    // dividing by it cannot change the argmax — only centroid norms
    // matter for cell choice.
    val cellStructs: Column = array(cents.map { c =>
      val vlit = typedlit(c.vec.toIndexedSeq) // one array Literal, not dim CreateArray nodes
      struct((dot(vlit, col(vecCol)) / lit(c.norm)).as("c_sim"), lit(c.id).as("c_id"))
    }: _*)

    def assign(df: DataFrame, prefix: String, probes: Int): DataFrame = {
      val probedCells =
        if (probes == 1) array(array_max(cellStructs).getField("c_id"))
        else transform(slice(reverse(array_sort(cellStructs)), 1, probes),
          s => s.getField("c_id"))
      df.select(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}_vec"),
          norm(col(vecCol)).as(s"${prefix}_norm"),
          explode(probedCells).as("cell"))
    }

    val cells = assign(corpus, "n", probes = 1)
    val probed = assign(queries, "q", probes = nProbe)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    cells.join(probed, "cell")
      .filter(col("n_id") =!= col("q_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("sim"))
  }

  /** Embedding-space outlier report — the vector-modality member of
    * the outlier family (an1/an2 z-score scalar series; this scores
    * vectors): each embedding's cosine DISTANCE to its own nearest
    * coarse centroid, z-scored over the corpus, top `topK` emitted.
    * The data-cleaning gate that surfaces corrupt / mislabeled /
    * off-manifold vectors before they enter training or ANN indexes.
    *
    * Determinism: the per-row distance quantizes to integer
    * micro-units, corpus moments are EXACT sums over those integers
    * (the long Σd and a decimal(38,0) Σd² — order-free, no cross-row
    * float accumulation; decimal because Σd² overflows a long at
    * ~10⁹ rows), and z is a closed-form double over the two exact
    * integers. Cell choice reuses [[ivfTopK]]'s argmax (ties to the
    * larger cell id via struct ordering).
    *
    * Scale: one narrow corpus pass over plan-time centroid literals +
    * one combinable 1-row moment aggregate broadcast back + a
    * distributed TakeOrdered — no shuffle of vectors at all.
    */
  /** Distributed Lloyd k-means with a FIXED round count and
    * deterministic init — the third trainer shape beside the
    * closed-form NB pair and the GD loop: per round one narrow
    * plan-time-literal assignment pass (no shuffle of vectors) and one
    * combinable (cluster, dim) moment shuffle, then an O(k·dim)
    * driver update — the exact pattern MLlib's KMeans runs, made
    * oracle-checkable by pinning init and rounds (the oracle unrolls
    * every assignment and centroid update). Empty clusters keep their
    * previous centroid.
    *
    * Returns (cluster, n_members, dim, c_val): the final centroids
    * with the last assignment's cluster sizes.
    */
  def lloydRounds(corpus: DataFrame, initCentroids: Seq[Centroid],
                  rounds: Int = 2, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(initCentroids.nonEmpty && rounds > 0, "need centroids and rounds")
    val vd = col(vecCol).cast("array<double>")
    var cents: Seq[(Long, Array[Double])] =
      initCentroids.map(c => c.id -> c.vec)
    def assignCol(cs: Seq[(Long, Array[Double])]): Column = {
      val structs = array(cs.map { case (cid, cv) =>
        val cl = typedlit(cv.toIndexedSeq)
        // squared L2 as an IN-ORDER per-dim fold (oracle-mirrored)
        val d2 = aggregate(zip_with(vd, cl, (x, c) => (x - c) * (x - c)),
          lit(0.0), (a, t) => a + t)
        struct(d2.as("d"), lit(cid).as("cid"))
      }: _*)
      // min (dist, cid) struct: ties to the SMALLER cluster id
      array_min(structs).getField("cid")
    }
    var assigned: DataFrame = corpus.limit(0).select(col(idCol),
      lit(0L).as("cluster")) // replaced in round 1
    for (_ <- 1 to rounds) {
      assigned = corpus.select(col(idCol), vd.as("__v"),
        assignCol(cents).as("cluster"))
      val stats = assigned
        .select(col("cluster"), posexplode(col("__v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim")).agg(avg(col("x")).as("m"))
        .collect()
      val byC = stats.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byC.get(cid) match {
          case Some(rows) =>
            val m = old.clone()
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            cid -> m
          case None => cid -> old
        }
      }
    }
    val sizes = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).cast("long").as("n_members"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = cents.flatMap { case (cid, v) =>
      v.zipWithIndex.map { case (cv, d) => (cid, d, cv) }
    }.toDF("cluster", "dim", "c_val")
    centDf.join(sizes, Seq("cluster"), "left")
      .select(col("cluster"), coalesce(col("n_members"), lit(0L)).as("n_members"),
        col("dim"), col("c_val"))
  }

  /** Hubness report of the ANN top-k graph (Radovanović et al.
    * JMLR'10): the k-occurrence distribution — how often each vector
    * appears in OTHER vectors' top-k — from exact integer moments:
    * mean (≈ k by construction), variance, skewness, the max (the
    * biggest hub) and the anti-hub count (vectors never retrieved).
    * High positive skew is THE standard symptom of hub pathology that
    * silently degrades kNN-based dedup/retrieval quality.
    *
    * Scale: rides the IVF top-k (plan-time centroid literals); the
    * occurrence count is one combinable ids-only aggregate; moments
    * are a 1-row reduce. At billions of vectors the o³ sum needs
    * decimal headroom (the Pca note); long here.
    */
  def hubnessReport(corpus: DataFrame, k: Int = 5, nProbe: Int = 6,
                    centroids: Seq[Centroid] = Nil, nCentroids: Int = 16,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val knn = ivfTopK(corpus, corpus, k, nCentroids, nProbe, idCol, vecCol,
      centroids)
    val occCounts = knn.groupBy(col("n_id")).agg(count(lit(1)).as("c"))
    val occ = corpus.select(col(idCol).as("__v"))
      .join(occCounts, col("__v") === col("n_id"), "left")
      .select(coalesce(col("c"), lit(0L)).cast("long").as("o"))
    val mom = occ.agg(count(lit(1)).cast("long").as("n"),
      sum(col("o")).cast("long").as("s1"),
      sum(col("o") * col("o")).cast("long").as("s2"),
      sum(col("o") * col("o") * col("o")).cast("long").as("s3"),
      max(col("o")).cast("long").as("max_occ"),
      sum(when(col("o") === 0, lit(1L)).otherwise(lit(0L))).as("n_antihubs"))
    val nD = col("n").cast("double")
    val mean = col("s1").cast("double") / nD
    val ex2 = col("s2").cast("double") / nD
    val vr = ex2 - mean * mean
    val skew = (col("s3").cast("double") / nD - lit(3.0) * mean * vr
      - mean * mean * mean) /
      when(vr <= 0.0, lit(1.0)).otherwise(pow(vr, lit(1.5)))
    mom.select(col("n"), col("max_occ"), col("n_antihubs"),
      mean.as("mean_occ"), vr.as("var_occ"), skew.as("skew_occ"))
  }

  /** Per-label embedding isotropy report — the representation-quality
    * audit (Ethayarajh EMNLP'19's anisotropy measure): the MEAN
    * PAIRWISE COSINE inside each label, computed WITHOUT any pair join
    * via the sum-vector identity ‖Σv̂‖² = n + Σ_{i≠j} cos(vᵢ,vⱼ), so
    * avg cos = (‖Σv̂‖² − n) / (n·(n−1)). High isotropy (cos → 0) means
    * the space spreads; cos → 1 inside a label means collapsed /
    * duplicated vectors — the cheap gate before ANN indexing or
    * contrastive training.
    *
    * Scale: one narrow normalize pass, a combinable (label, dim) sum
    * shuffle (classes×dims cells), closed-form arithmetic — the n²
    * pair join the identity replaces never exists.
    */
  def isotropyReport(vecs: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    val nrm = vecs.select(col(labelCol).cast("long").as("label"),
      vd.as("v"), norm(vd).as("nn"))
    val x = nrm.select(col("label"), col("nn"),
        posexplode(col("v")).as(Seq("dim", "xv")))
      .select(col("label"), col("dim"), (col("xv") / col("nn")).as("xh"))
    val sums = x.groupBy(col("label"), col("dim"))
      .agg(sum(col("xh")).as("sv"))
    val ssum = sums.groupBy(col("label"))
      .agg(sum(col("sv") * col("sv")).as("ssum"))
    val cnt = nrm.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n"), avg(col("nn")).as("mean_norm"))
    ssum.join(cnt, "label")
      .select(col("label"), col("n"), col("mean_norm"),
        // a singleton label has no pairs: emit NULL, not 0/0 (the
        // DuckDB oracle mirrors the same CASE, so the gate holds on
        // any dataset with a one-vector label)
        when(col("n") > 1,
          (col("ssum") - col("n").cast("double")) /
            (col("n").cast("double") * (col("n").cast("double") - lit(1.0))))
          .otherwise(lit(null).cast("double"))
          .as("isotropy"))
  }

  def embeddingOutliers(corpus: DataFrame, topK: Int = 20,
                        centroids: Seq[Centroid] = Nil, nCentroids: Int = 16,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    require(topK > 0, "topK must be positive")
    val cents: Seq[Centroid] =
      if (centroids.nonEmpty) centroids
      else kmeansCentroids(corpus, nCentroids, idCol, vecCol)
    val cellStructs: Column = array(cents.map { c =>
      val vlit = typedlit(c.vec.toIndexedSeq)
      struct((dot(vlit, col(vecCol)) / lit(c.norm)).as("c_sim"), lit(c.id).as("c_id"))
    }: _*)
    val best = array_max(cellStructs)
    val base = corpus.select(col(idCol),
        best.getField("c_id").as("cell"),
        (best.getField("c_sim") / norm(col(vecCol))).as("__sim"))
      .withColumn("d_micro",
        round((lit(1.0) - col("__sim")) * 1e6).cast("long"))
    val stats = base.agg(count(lit(1)).cast("long").as("__n"),
      sum(col("d_micro")).as("__s1"),
      sum((col("d_micro") * col("d_micro")).cast("decimal(38,0)")).as("__s2"))
    base.crossJoin(broadcast(stats))
      .withColumn("__mu", col("__s1").cast("double") / col("__n").cast("double"))
      .withColumn("__sd", sqrt(col("__s2").cast("double") / col("__n").cast("double")
        - col("__mu") * col("__mu")))
      .withColumn("z", (col("d_micro").cast("double") - col("__mu")) / col("__sd"))
      .orderBy(col("d_micro").desc, col(idCol).asc).limit(topK)
      .select(col(idCol), col("cell"), col("d_micro"), col("z"))
  }

  // ---------------- product quantization (PQ / ADC) -----------------

  /** One PQ codebook: `m` subspaces × `ks` centroids each; entry
    * (j, c) is the c-th centroid of subspace j with its precomputed
    * squared norm.
    */
  final case class PqCode(sub: Int, code: Int, vec: Array[Double], cc: Double)

  /** Deterministic data-independent PQ codebooks (seeded Gaussians,
    * the [[fixedCentroids]] discipline): every component is a
    * plan-time literal an external SQL engine can be handed verbatim —
    * what lets the DuckDB oracle value-check the PQ query end to end.
    * Trained codebooks come from [[pqCodebooks]].
    */
  def fixedPqCodebooks(m: Int, ks: Int, subDim: Int, seed: Long = 23L): Seq[Seq[PqCode]] =
    (0 until m).map { j =>
      val r = new Random(seed + j)
      (0 until ks).map { c =>
        val v = Array.fill(subDim)(r.nextGaussian() * 0.5)
        PqCode(j, c, v, v.map(x => x * x).sum)
      }
    }

  /** Trained PQ codebooks: plain (non-spherical) Lloyd's k-means per
    * SUBSPACE over a deterministic hash-ordered driver-side sample —
    * the [[kmeansCentroids]] sampling discipline, minus the L2
    * normalization (PQ quantizes raw subvectors, so the objective is
    * plain squared error, not cosine).
    */
  def pqCodebooks(corpus: DataFrame, m: Int, ks: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  sampleSize: Int = 2048, iters: Int = 5): Seq[Seq[PqCode]] = {
    val rows = corpus
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleSize)
      .select(col(vecCol).cast("array<double>"))
      .collect()
    require(rows.nonEmpty, "pqCodebooks: empty corpus")
    val sample: Array[Array[Double]] = rows.map(_.getSeq[Double](0).toArray)
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sd = dim / m
    (0 until m).map { j =>
      val subs = sample.map(v => v.slice(j * sd, (j + 1) * sd))
      var cents: Array[Array[Double]] =
        Array.tabulate(ks)(i => subs(i % subs.length).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(ks)(new Array[Double](sd))
        val counts = new Array[Int](ks)
        for (v <- subs) {
          var best = 0; var bestD = Double.PositiveInfinity; var c = 0
          while (c < ks) {
            var dd = 0.0; var i = 0
            while (i < sd) { val t = v(i) - cents(c)(i); dd += t * t; i += 1 }
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          var i = 0
          while (i < sd) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ks)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents.toIndexedSeq.zipWithIndex.map { case (v, c) =>
        PqCode(j, c, v, v.map(x => x * x).sum)
      }
    }
  }

  /** PQ-encode the corpus: each vector becomes `m` sub-codes
    * (array<int>), 64 floats → m small ints — the compressed
    * representation a billion-vector index actually stores. Encoding
    * is ONE narrow codegen pass: per subspace, argmin over ks
    * plan-time centroid literals of ‖s−c‖², computed as (‖c‖² − 2·s·c)
    * since ‖s‖² is constant within a subspace's argmin; ties break to
    * the lower code via lexicographic struct ordering.
    */
  def pqEncode(vectors: DataFrame, codebooks: Seq[Seq[PqCode]],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.size
    val sd = codebooks.head.head.vec.length
    val v = col(vecCol).cast("array<double>")
    val codeCols = (0 until m).map { j =>
      val sub = slice(v, j * sd + 1, sd)
      val scored = array(codebooks(j).map { c =>
        struct((lit(c.cc) - lit(2.0) * dot(typedlit(c.vec.toIndexedSeq), sub)).as("score"),
          lit(c.code).as("code"))
      }: _*)
      array_min(scored).getField("code")
    }
    vectors.select(col(idCol).as("n_id"), array(codeCols: _*).as("codes"))
  }

  /** PQ top-k via ASYMMETRIC DISTANCE COMPUTATION with exact re-rank
    * (Jégou, Douze, Schmid, "Product quantization for nearest neighbor
    * search", TPAMI 2011). Each query precomputes its m × ks table of
    * exact subspace distances d[j][c] = ‖q_j‖² − 2·q_j·c + ‖c‖² (one
    * narrow pass over plan-time literals); a candidate's approximate
    * distance is the in-order sum of m table LOOKUPS on its stored
    * codes — the scan touches m ints per corpus row, never the
    * vectors. The top `rerank` candidates by ADC then re-rank by exact
    * cosine (only those rows ever load their true vectors), emitting
    * the final top `k`.
    *
    * Scale: the broadcast side is queries × (m·ks doubles); the scan
    * side reads the code table (m bytes/vector at ks ≤ 256 — ~32 GB
    * for a billion vectors, memory-resident where raw floats are
    * 8 TB); the re-rank join touches k·rerank ids. Compose with the
    * IVF cell filter (ss5) for IVF-PQ when even the code scan needs
    * pruning. All ranking decisions are double comparisons over
    * identical in-order folds, so an external engine reproduces every
    * rank (the ss3/ss5 discipline).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ks: Int = 16, rerank: Int = 24,
             idCol: String = "vec_id", vecCol: String = "embedding",
             codebooks: Seq[Seq[PqCode]] = Nil): DataFrame = {
    val cbs: Seq[Seq[PqCode]] =
      if (codebooks.nonEmpty) codebooks
      else pqCodebooks(corpus, m, ks, idCol, vecCol)
    val sd = cbs.head.head.vec.length
    val codes = pqEncode(corpus, cbs, idCol, vecCol)
    val qv = col(vecCol).cast("array<double>")
    val tabCols = (0 until m).map { j =>
      val sub = slice(qv, j * sd + 1, sd)
      val qq = dot(sub, sub)
      array(cbs(j).map { c =>
        (qq - lit(2.0) * dot(typedlit(c.vec.toIndexedSeq), sub)) + lit(c.cc)
      }: _*)
    }
    val q = queries.select(col(idCol).as("q_id"), qv.as("q_vec"),
      array(tabCols: _*).as("tabs"))
    // in-order fold 0.0 + d_0 + d_1 + … mirrors the oracle's
    // list_reduce exactly (same accumulation order, same doubles)
    val adc = (0 until m).map(j =>
        element_at(element_at(col("tabs"), j + 1),
          element_at(col("codes"), j + 1) + 1))
      .foldLeft(lit(0.0))(_ + _)
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_dist").asc, col("n_id").asc)
    val cand = broadcast(q).join(codes, col("n_id") =!= col("q_id"))
      .withColumn("adc_dist", adc)
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= rerank)
    val exact = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_norm"))
    val wSim = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    cand.join(exact, "n_id")
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) /
        (norm(col("q_vec")) * col("n_norm")))
      .withColumn("rank", row_number().over(wSim))
      .filter(col("rank") <= k)
      // nano-quantized integer display (the kt1 tau_b_nano template):
      // ranks are decided on the raw doubles above; the emitted columns
      // are exact longs so no rounded raw double rides the gate hash
      .select(col("q_id"), col("n_id"), col("rank"),
        floor(col("adc_dist") * lit(1e9) + lit(0.5)).cast("long").as("adc_nano"),
        floor(col("sim") * lit(1e9) + lit(0.5)).cast("long").as("sim_nano"))
  }

  /** IVF-PQ top-k: the composition the PQ scaladoc promises — the IVF
    * coarse quantizer prunes WHICH code rows each query reads
    * (equi-join on cell id, corpus/nCentroids × nProbe rows), and PQ
    * compresses WHAT a read costs (m codes, not raw floats). This is
    * the billion-vector production shape: cells bound the scan, codes
    * bound the bytes, exact re-rank bounds the error. Candidate
    * generation = one cell equi-join on (cell, m ints) rows; ADC and
    * re-rank as in [[pqTopK]].
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nCentroids: Int = 16, nProbe: Int = 6,
                m: Int = 8, ks: Int = 16, rerank: Int = 24,
                idCol: String = "vec_id", vecCol: String = "embedding",
                centroids: Seq[Centroid] = Nil,
                codebooks: Seq[Seq[PqCode]] = Nil): DataFrame = {
    val cents: Seq[Centroid] =
      if (centroids.nonEmpty) centroids
      else kmeansCentroids(corpus, nCentroids, idCol, vecCol)
    val cbs: Seq[Seq[PqCode]] =
      if (codebooks.nonEmpty) codebooks
      else pqCodebooks(corpus, m, ks, idCol, vecCol)
    val sd = cbs.head.head.vec.length
    val cellStructs: Column = array(cents.map { c =>
      val vlit = typedlit(c.vec.toIndexedSeq)
      struct((dot(vlit, col(vecCol)) / lit(c.norm)).as("c_sim"), lit(c.id).as("c_id"))
    }: _*)
    // corpus side: cell + codes, one narrow pass — the stored index row
    val codes = pqEncode(corpus, cbs, idCol, vecCol)
      .join(corpus.select(col(idCol).as("n_id"),
        array_max(cellStructs).getField("c_id").as("cell")), "n_id")
    val qv = col(vecCol).cast("array<double>")
    val tabCols = (0 until m).map { j =>
      val sub = slice(qv, j * sd + 1, sd)
      val qq = dot(sub, sub)
      array(cbs(j).map { c =>
        (qq - lit(2.0) * dot(typedlit(c.vec.toIndexedSeq), sub)) + lit(c.cc)
      }: _*)
    }
    val probedCells = transform(slice(reverse(array_sort(cellStructs)), 1, nProbe),
      s => s.getField("c_id"))
    val q = queries.select(col(idCol).as("q_id"), qv.as("q_vec"),
      array(tabCols: _*).as("tabs"), explode(probedCells).as("cell"))
    val adc = (0 until m).map(j =>
        element_at(element_at(col("tabs"), j + 1),
          element_at(col("codes"), j + 1) + 1))
      .foldLeft(lit(0.0))(_ + _)
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_dist").asc, col("n_id").asc)
    val cand = codes.join(broadcast(q), "cell")
      .filter(col("n_id") =!= col("q_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("adc_dist", adc)
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= rerank)
    val exact = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_norm"))
    val wSim = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    cand.join(exact, "n_id")
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) /
        (norm(col("q_vec")) * col("n_norm")))
      .withColumn("rank", row_number().over(wSim))
      .filter(col("rank") <= k)
      // nano-quantized integer display (the kt1 tau_b_nano template)
      .select(col("q_id"), col("n_id"), col("rank"),
        floor(col("adc_dist") * lit(1e9) + lit(0.5)).cast("long").as("adc_nano"),
        floor(col("sim") * lit(1e9) + lit(0.5)).cast("long").as("sim_nano"))
  }

  /** Embedding-cosine near-duplicate pairs (the fifth dedup modality of
    * SURVEY's north star): all pairs with cosine >= threshold.
    * Brute-force O(n²) exact baseline; the LSH candidates variant is
    * `lshNearDupPairs`.
    */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vectors.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      norm(col(vecCol)).as("nn1"))
    val b = vectors.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      norm(col(vecCol)).as("nn2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos_sim", dot(col("v1"), col("v2")) / (col("nn1") * col("nn2")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id1"), col("id2"), col("cos_sim"))
  }

  /** LSH-bucketed near-dup pairs: same SRP bucketing, pairs only form
    * inside buckets, then exact cosine verification.
    *
    * Shuffle discipline (the dd3 pattern): the bucket self-join carries
    * ONLY (id, table, bucket) tuples — vectors re-join just for the
    * surviving candidate pairs, so the wide payload never rides the
    * candidate-generation shuffle.
    *
    * `multiProbe` additionally probes, on ONE side of the self-join,
    * every bucket at Hamming distance 1 (one flipped hyperplane): a
    * pair split by a single borderline plane in table t still collides
    * there. Asymmetric on purpose — probing both sides would square the
    * fan-out for the same distance-1 coverage. Fan-out cost is
    * ×(nPlanes+1) rows of three longs on one side, nothing on the
    * other.
    */
  def lshNearDupPairs(vectors: DataFrame, threshold: Double,
                      nPlanes: Int = 10, nTables: Int = 6, dim: Int = 64,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      multiProbe: Boolean = false): DataFrame = {
    // NB: srpBucket must reference the ORIGINAL vecCol, not an alias
    // from this same select — lateral column aliases can't be resolved
    // inside a Generate (explode) in Spark 4. Buckets get their own
    // projection (bktCols aliases) so the probe fan-out references the
    // computed value, not nPlanes copies of the dot-product tree.
    val bktCols = (0 until nTables).map(t =>
      srpBucket(col(vecCol), nPlanes, dim, seed = 11L + t).as(s"__b$t"))
    val base = vectors.select(col(idCol).as("id") +: bktCols: _*)
    def exploded(probe: Boolean): DataFrame = {
      val tb = (0 until nTables).flatMap { t =>
        val bkt = col(s"__b$t")
        val probes =
          if (probe) bkt +: (0 until nPlanes).map(p => bkt.bitwiseXOR(lit(1L << p)))
          else Seq(bkt)
        probes.map(b => struct(lit(t).as("tbl"), b.as("bkt")))
      }
      base.select(col("id"), explode(array(tb: _*)).as("tb"))
        .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    }
    val cand = exploded(multiProbe).as("a").join(exploded(false).as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .dropDuplicates("id1", "id2")
    val vecs = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nn"))
    cand
      .join(vecs.toDF("id1", "v1", "nn1"), "id1")
      .join(vecs.toDF("id2", "v2", "nn2"), "id2")
      .withColumn("cos_sim", dot(col("v1"), col("v2")) / (col("nn1") * col("nn2")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id1"), col("id2"), col("cos_sim"))
  }

  /** Symmetric int8 vector quantization (per-vector absmax scaling):
    * `q_i = round(x_i / scale × 127)` with `scale = max|x_i|` — the
    * standard compression step before storing or ANN-searching a
    * 100 TB embedding corpus (4× smaller than float32, SIMD-friendly
    * int8 dot products downstream). Reconstruction error is bounded by
    * `scale/254` per element (round-to-nearest), which the output
    * carries as a checkable boolean.
    *
    * Fully NARROW: per-row HOFs over the vector, no shuffle, no UDF —
    * and every output column is plain IEEE arithmetic in a fixed
    * fold order, so an external engine reproduces it bit-for-bit
    * (unlike the xxhash64-based signature ops).
    */
  /** SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    * the embedding space and near-dup-pruning WITHIN cells only — the
    * construction that makes embedding-level dedup tractable at corpus
    * scale, because the quadratic pair search runs per cell (n/k docs
    * each) instead of globally. Returns the kept ids (drop = the higher
    * id of every within-cell pair above `threshold`, the dd6 keep-min
    * convention).
    *
    * Scale shape: assignment is a narrow codegen argmax over plan-time
    * centroid literals (corpus never shuffles for the index); the ONE
    * shuffle keys by cell id; within-cell pairing carries (id, vec,
    * norm) and its output only ids. A pathologically hot cell is the
    * known SemDeDup failure mode — raise nCentroids (k ∝ √n) or re-run
    * recursively inside oversized cells; cell sizes are one cheap
    * count-by-key to check.
    */
  def semanticDedup(vectors: DataFrame, threshold: Double, nCentroids: Int = 16,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    centroids: Seq[Centroid] = Nil): DataFrame = {
    val dropIds = semanticDedupPairs(vectors, threshold, nCentroids, idCol,
        vecCol, centroids)
      .select(col("id2").as("drop_id")).distinct()
    vectors.join(dropIds, col(idCol) === col("drop_id"), "left_anti")
      .select(col(idCol))
  }

  /** The cell-confined near-dup pairs underlying [[semanticDedup]]:
    * (id1, id2, cos_sim) for every within-cell pair at or above
    * `threshold`, id1 < id2. Exposed separately so downstream graph
    * passes (clustering, canonical selection, leakage-safe splits) can
    * consume the TRACTABLE pair source directly instead of the exact
    * all-pairs baseline — same one-shuffle-keyed-by-cell profile as the
    * dedup itself.
    */
  def semanticDedupPairs(vectors: DataFrame, threshold: Double,
                         nCentroids: Int = 16, idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         centroids: Seq[Centroid] = Nil): DataFrame = {
    val cents: Seq[Centroid] =
      if (centroids.nonEmpty) centroids
      else kmeansCentroids(vectors, nCentroids, idCol, vecCol)
    val cellStructs: Column = array(cents.map { c =>
      val vlit = typedlit(c.vec.toIndexedSeq)
      struct((dot(vlit, col(vecCol)) / lit(c.norm)).as("c_sim"), lit(c.id).as("c_id"))
    }: _*)
    val cells = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"),
      array_max(cellStructs).getField("c_id").as("cell"))
    cells.as("a")
      .join(cells.as("b"), col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cos_sim",
        dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("cos_sim"))
  }

  /** Exact sparse TF-IDF cosine similarity self-join via an inverted
    * index — the SSJoin/term-at-a-time construction (Sarawagi & Kirpal
    * 2004): the sparse-text complement of the dense-vector family above.
    * Reference-pipeline analog: the dedup/similarity stage over raw
    * text where no embedding exists yet.
    *
    * Plan shape (the part that matters at 100 TB): document text is
    * read once and immediately reduced to (id, term, weight) postings —
    * ONE shuffle keyed by term covers the tf→df join AND the postings
    * self-join, so raw text never moves again; norms are (id, double)
    * rows; the pair-accumulation shuffle carries (d1, d2, partial-sum)
    * with map-side combine. Cost is Σ_term df² — Zipfian hot terms
    * dominate, and their idf weight ~0 means they contribute nothing:
    * compose with a df-cap or the dd10 prefix filter (threshold-aware
    * pruning on idf-descending postings) when the tail must be cut;
    * this operator keeps the join exact.
    */
  def sparseCosineJoin(docs: DataFrame, threshold: Double,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val nDocs = tf.agg(countDistinct(col("id")).cast("double").as("n"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val w = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("w", col("tf") * log(col("n") / col("df")))
      .select("id", "term", "w")
    val nrm = w.groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dot = w.as("a")
      .join(w.as("b"), col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(sum(col("a.w") * col("b.w")).as("dotp"))
    dot
      .join(nrm.select(col("id").as("d1"), col("nrm").as("nrm1")), "d1")
      .join(nrm.select(col("id").as("d2"), col("nrm").as("nrm2")), "d2")
      .withColumn("cosine", col("dotp") / (col("nrm1") * col("nrm2")))
      .filter(col("cosine") >= threshold)
      .select("d1", "d2", "cosine")
  }

  def quantizeInt8(vectors: DataFrame, vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame = {
    val xd = transform(col(vecCol), v => v.cast("double"))
    vectors
      .withColumn("scale", aggregate(xd, lit(0.0), (a, b) => greatest(a, abs(b))))
      .withColumn("qvec", when(col("scale") === 0.0,
          transform(col(vecCol), _ => lit(0)))
        .otherwise(transform(col(vecCol),
          v => round(v.cast("double") / col("scale") * 127.0).cast("int"))))
      .withColumn("max_err", when(col("scale") === 0.0, lit(0.0))
        .otherwise(aggregate(
          zip_with(col("qvec"), col(vecCol),
            (q, x) => abs(q.cast("double") * col("scale") / 127.0 - x.cast("double"))),
          lit(0.0), (a, b) => greatest(a, b))))
      .withColumn("err_ok", col("max_err") <= col("scale") / 253.0)
  }

  /** The 16 NF4 levels (Dettmers et al., NeurIPS'23 "QLoRA" §3 /
    * bitsandbytes): equal-mass quantiles of N(0, 1) rescaled to
    * [−1, 1] — the information-theoretically-motivated nonuniform
    * 4-bit codebook for normally-distributed weights/activations.
    */
  val Nf4Levels: Seq[Double] = Seq(
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0)

  /** NF4 4-bit quantization QUALITY report: quantize each vector to
    * the nearest NF4 level at its absmax scale (the QLoRA storage
    * format, 16× smaller than fp32 beside [[quantizeInt8]]'s 4×),
    * dequantize, and report per label the exact reconstruction MSE
    * and mean cosine retention — the decide-before-you-ship numbers
    * for a 4-bit embedding/weight store. Nonuniform levels beat int4's
    * uniform grid exactly when values are bell-shaped; this report is
    * how you verify that on YOUR distribution.
    *
    * Determinism: the level argmin is an `array_min` over
    * (|diff|, idx) structs of plan-time level literals (ties to the
    * lower code); per-dim squared errors and per-vector cosines are
    * fixed folds pico/nano-quantized before exact integer means.
    *
    * Scale: ONE narrow in-row pass (16-way argmin per dim) + a
    * labels-bounded rollup. Nothing leaves the row until the final
    * combinable aggregate.
    */
  def nf4QuantReport(vectors: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val xd = transform(col(vecCol), v => v.cast("double"))
    val levelArr = typedlit(Nf4Levels.toIndexedSeq)
    val scaled = vectors
      .withColumn("xd", xd)
      .withColumn("scale", aggregate(col("xd"), lit(0.0),
        (a, b) => greatest(a, abs(b))))
      .withColumn("deq", when(col("scale") === 0.0,
          transform(col("xd"), _ => lit(0.0)))
        .otherwise(transform(col("xd"), v => {
          val structs = transform(sequence(lit(0), lit(Nf4Levels.size - 1)),
            i => struct(abs(v / col("scale") - element_at(levelArr, i + 1))
              .as("d"), i.as("i")))
          element_at(levelArr, array_min(structs).getField("i") + 1) *
            col("scale")
        })))
      .withColumn("se_pico", expr(
        """aggregate(zip_with(xd, deq, (x, q) -> (x - q) * (x - q)),
          |  CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)""".stripMargin))
      .withColumn("se_pico",
        floor(col("se_pico") * lit(1e12) + lit(0.5)).cast("long"))
      .withColumn("dot_xq", expr(
        """aggregate(zip_with(xd, deq, (x, q) -> x * q),
          |  CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)""".stripMargin))
      .withColumn("nx", sqrt(expr(
        """aggregate(zip_with(xd, xd, (x, q) -> x * q),
          |  CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)""".stripMargin)))
      .withColumn("nq", sqrt(expr(
        """aggregate(zip_with(deq, deq, (x, q) -> x * q),
          |  CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)""".stripMargin)))
      .withColumn("cos_nano", when(col("nx") * col("nq") === 0.0, lit(0L))
        .otherwise(floor(col("dot_xq") / (col("nx") * col("nq")) * lit(1e9) +
          lit(0.5)).cast("long")))
    scaled.groupBy(col(labelCol).cast("long").as("label"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(dec(col("se_pico"))).as("ssp"),
        sum(dec(col("cos_nano"))).as("scn"))
      .select(col("label"), col("n"),
        expr("CAST(ssp div n AS BIGINT)").as("mse_pico"),
        expr("CAST(scn div n AS BIGINT)").as("mean_cos_nano"))
  }

  /** Per-dimension standardization (z-scoring) of an embedding column —
    * the feature-scaling pass before distance-based downstream ML
    * (clustering, PQ training, linear probes). Dims with zero variance
    * standardize to 0 rather than NaN.
    *
    * Scale: stats ride ONE posexplode into a (dim)-keyed combinable
    * aggregation — dim×2 doubles out; they broadcast back and the
    * rescale is a narrow zip per row. Same two-pass, zero-wide-shuffle
    * profile as [[labelCentroids]]. Emitted per-vector checksums (sum /
    * min / max of the z-vector, in-row ordered folds) are what a value
    * oracle can hash — the full standardized array stays in-engine.
    */
  def standardize(embs: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val exploded = embs.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col(idCol), col("dim"), col("v").cast("double").as("v"))
    val stats = exploded.groupBy("dim")
      .agg(avg(col("v")).as("mu"), stddev_pop(col("v")).as("sigma"))
    val z = exploded.join(broadcast(stats), "dim")
      .withColumn("z", when(col("sigma") > 0.0,
        (col("v") - col("mu")) / col("sigma")).otherwise(lit(0.0)))
    z.groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("dim_count"),
        sum(col("z")).as("z_sum"),
        min(col("z")).as("z_min"),
        max(col("z")).as("z_max"))
  }

  /** Per-label centroids + within-cluster inertia — the evaluation
    * pass of any embedding clustering (and the E-step cost function
    * of the IVF k-means above), expressed so an external SQL engine
    * can recompute every value.
    *
    * Scale: centroid sums ride ONE posexplode → (label, dim) combinable
    * aggregation — (n_rows × dim) narrow rows into a (labels × dim)
    * result, no vector ever shuffled whole. The tiny centroid table
    * re-assembles per label (array_sort keeps dim order) and broadcasts
    * back for the inertia pass, which is a narrow zip_with per row +
    * one combinable sum. Two passes over the corpus, zero wide
    * shuffles — the same profile as a single k-means iteration.
    */
  def labelCentroids(embs: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame = {
    val dims = embs
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos"))
      .agg((sum(col("x").cast("double")) / count(lit(1))).as("cv"))
    val cents = dims.groupBy(col(labelCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s("cv")).as("cvec"))
    embs.join(broadcast(cents), labelCol)
      .withColumn("sq", aggregate(
        zip_with(col(vecCol), col("cvec"),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, v) => acc + v))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("sq")).as("inertia"),
        first(col("cvec")).as("cvec"))
  }

  /** Embedding-distribution drift between two corpus versions (e.g.
    * after an encoder swap or a re-crawl): per-DIMENSION mean shift
    * with a Welch-style z, plus the cosine between the two mean
    * vectors — the model-monitoring gate that catches "the new
    * embedding space silently moved" before any downstream ANN index
    * degrades.
    *
    * Determinism: every float element micro-quantizes to a long
    * before aggregation, so the per-dim moments (n, Σq, Σq²) are
    * exact integers in ONE combinable (dim, side) shuffle; means /
    * variances / z are fixed-order double arithmetic from those. The
    * mean-vector cosine needs a dim-wide sum of float products — each
    * dim's dot/norm contribution quantizes to pico-units first and
    * the longs sum order-free (the js1 pattern).
    *
    * Scale: posexplode carries (dim, long) pairs only — dim × 2 rows
    * survive the shuffle regardless of corpus size; the cosine reduces
    * the dim-sized table.
    */
  def embeddingDrift(oldVecs: DataFrame, newVecs: DataFrame,
                     vecCol: String = "embedding"): DataFrame = {
    def side(df: DataFrame, tag: String) = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"),
        floor(col("x").cast("double") * lit(1e6) + lit(0.5)).cast("decimal(38,0)").as("q"))
      .groupBy("dim").agg(
        count(lit(1)).cast("long").as(s"n_$tag"),
        sum(col("q")).as(s"s_$tag"),
        sum(col("q") * col("q")).as(s"ss_$tag"))
    val j = side(oldVecs, "old").join(side(newVecs, "new"), "dim")
    val (no, nn) = (col("n_old").cast("double"), col("n_new").cast("double"))
    val (so, sn) = (col("s_old").cast("double"), col("s_new").cast("double"))
    val (sso, ssn) = (col("ss_old").cast("double"), col("ss_new").cast("double"))
    val muO = so / no // micro-units
    val muN = sn / nn
    val varO = (sso - so * so / no) / (no - 1.0)
    val varN = (ssn - sn * sn / nn) / (nn - 1.0)
    val z = (muN - muO) / sqrt(varO / no + varN / nn)
    val dims = j.select(col("dim"), col("n_old"), col("n_new"),
        round(muO / 1e6, 6).as("mean_old"),
        round(muN / 1e6, 6).as("mean_new"),
        round((muN - muO) / 1e6, 6).as("delta"),
        z.as("drift_z"),
        // cosine contributions in micro²-units, pico-quantized per dim
        floor(muO * muN + lit(0.5)).cast("long").as("__dot"),
        floor(muO * muO + lit(0.5)).cast("long").as("__oo"),
        floor(muN * muN + lit(0.5)).cast("long").as("__nn"))
      .persist()
    val cos = dims.agg(
      sum(col("__dot")).cast("double").as("__d"),
      sum(col("__oo")).cast("double").as("__o"),
      sum(col("__nn")).cast("double").as("__m"))
      .select((col("__d") / (sqrt(col("__o")) * sqrt(col("__m")))).as("mean_cosine"))
    dims.crossJoin(broadcast(cos))
      .select(col("dim"), col("n_old"), col("n_new"), col("mean_old"),
        col("mean_new"), col("delta"), col("drift_z"),
        round(col("mean_cosine"), 9).as("mean_cosine"))
  }

  /** Grid-density clustering over a 2-D projection of the embedding
    * space — the scalable first pass of the DBSCAN family (grid
    * approximation: dense cells ≈ core regions, adjacent dense cells
    * merge into clusters, sparse-cell points are noise). The
    * unsupervised complement of the label-driven cl1 centroids.
    *
    * Determinism: cell assignment is one floor-divide per coordinate
    * (identical IEEE op in any engine); density and adjacency are
    * exact integers; cluster ids are min-cell-id labels from a
    * driver-side union–find over the dense-cell graph.
    *
    * Scale: points shuffle once as (id, cx, cy) triples for the cell
    * count. The cell GRID is bounded by GEOMETRY, not corpus size —
    * a 2-D projection with coordinate range R has at most (2R /
    * cellSize)² cells (≈1,600 here) no matter how many points land in
    * them — so collecting the dense cells and union–finding on the
    * driver IS the scale-right design: O(grid) driver work versus an
    * O(log cells)-round distributed fixed-point that costs seconds of
    * job overhead to label a few hundred nodes (measured 3.9 s → this
    * form ~0.4 s at sf0.1, identical output). The guard fails loudly
    * if an unexpectedly unbounded projection ever blows the grid up.
    * Output: one row per cluster (cluster_id, n_cells, n_points) plus
    * the noise row (−1).
    */
  def gridDensityClusters(vectors: DataFrame, cellSize: Double = 0.05,
                          minPts: Long = 10, dimA: Int = 0, dimB: Int = 1,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val pts = vectors.select(col(idCol).as("id"),
        floor(element_at(col(vecCol), dimA + 1).cast("double") / lit(cellSize))
          .cast("long").as("cx"),
        floor(element_at(col(vecCol), dimB + 1).cast("double") / lit(cellSize))
          .cast("long").as("cy"))
      .persist()
    val dense = pts.groupBy("cx", "cy").agg(count(lit(1)).cast("long").as("n"))
      .filter(col("n") >= minPts)
      .select("cx", "cy").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    require(dense.length <= (1 << 20),
      s"dense-cell grid unexpectedly large (${dense.length}) — raise cellSize")
    // driver union–find with min-cell-id labels (the same labeling a
    // distributed min-propagation CC would produce)
    val enc = (cx: Long, cy: Long) => (cx + 1000L) * 100000L + (cy + 1000L)
    val denseSet = dense.toSet
    val parent = scala.collection.mutable.Map(dense.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) = {
      var x = c
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: (Long, Long), b: (Long, Long)): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // min encoded id wins the root — deterministic labeling
        if (enc(ra._1, ra._2) <= enc(rb._1, rb._2)) parent(rb) = ra
        else parent(ra) = rb
      }
    }
    for { c <- dense; dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 } {
      val nb = (c._1 + dx, c._2 + dy)
      if (denseSet.contains(nb)) union(c, nb)
    }
    val spark = vectors.sparkSession
    import spark.implicits._
    val cellCluster = dense.toSeq
      .map(c => (c._1, c._2, enc(find(c)._1, find(c)._2)))
      .toDF("cx", "cy", "cluster")
    val clustered = pts.join(broadcast(cellCluster), Seq("cx", "cy"))
    val agg = clustered.groupBy(col("cluster").as("cluster_id"))
      .agg(countDistinct(col("cx"), col("cy")).cast("long").as("n_cells"),
        count(lit(1)).cast("long").as("n_points"))
    val noise = pts.join(broadcast(cellCluster.select("cx", "cy")),
        Seq("cx", "cy"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_points"))
      .select(lit(-1L).as("cluster_id"),
        lit(0L).as("n_cells"), col("n_points"))
    agg.unionByName(noise)
  }

  /** Greedy k-center coreset (Gonzalez 1985's farthest-first traversal,
    * the 2-approximation for the k-center cover — the selection rule
    * behind coreset / active-learning batch picks à la Sener & Savarese
    * 2018): seed with the smallest id, then repeatedly take the point
    * FARTHEST from the chosen set. Emits one row per pick with the
    * point's distance-to-set at pick time — a non-increasing sequence
    * whose tail IS the cover radius, the "how well do k exemplars span
    * this embedding space" curve read directly off the result.
    *
    * Determinism: squared-L2 distances are in-order per-dim folds
    * micro-quantized to longs BEFORE the min-over-centers and the
    * argmax (ties break to the smaller id), so every pick is an exact
    * integer decision the oracle replays step for step.
    *
    * Scale: each of the k−1 picks is ONE narrow scan (distances to
    * plan-time literal centers, a TakeOrdered(1) — no shuffle, no
    * all-pairs anything); k scans of the corpus is the algorithm's
    * defined cost. For k beyond tens, run the same traversal over IVF
    * cell representatives ([[ivfCentroids]]) instead of raw rows —
    * the standard composition at 100 TB.
    */
  def kCenterCoreset(vecs: DataFrame, k: Int = 8, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = vecs.sparkSession
    val vd = col(vecCol).cast("array<double>")
    val first = vecs.orderBy(col(idCol)).select(col(idCol), vd.as("__v")).head()
    var centers: Seq[(Long, Seq[Double], Long)] =
      Seq((first.getLong(0), first.getSeq[Double](1), 0L))
    for (_ <- 2 to k) {
      val dCols = centers.map { case (_, cv, _) =>
        val cl = typedlit(cv.toIndexedSeq)
        floor(aggregate(zip_with(vd, cl, (x, c) => (x - c) * (x - c)),
          lit(0.0), (a, t) => a + t) * 1e6 + lit(0.5)).cast("long")
      }
      val minD = if (dCols.size == 1) dCols.head else least(dCols: _*)
      val best = vecs.select(col(idCol), vd.as("__v"), minD.as("__d"))
        .orderBy(col("__d").desc, col(idCol).asc).limit(1).head()
      centers = centers :+ ((best.getLong(0), best.getSeq[Double](1),
        best.getLong(2)))
    }
    import spark.implicits._
    centers.zipWithIndex.map { case ((id, _, dm), i) => (i + 1, id, dm) }
      .toDF("step", idCol, "d_micro")
  }

  /** Simplified-silhouette report of a codebook assignment (Hruschka
    * et al. 2004 — the centroid form of Rousseeuw's silhouette, THE
    * internal-validity number for a clustering/quantizer): per point
    * `s = (b − a) / max(a, b)` with `a` = distance to its own (nearest)
    * centroid and `b` = distance to the second-nearest; per-cluster
    * mean — near 1 = compact & separated, near 0 = boundary mush,
    * negative = misassigned mass. Evaluates any published codebook
    * (the km1 fit, a PQ codebook, an IVF coarse quantizer).
    *
    * Determinism: distances are the same in-order per-dim folds as
    * [[lloydRounds]] (plan-time centroid literals); own/second pick is
    * an `array_sort` on (d², cid) structs — total order, no float
    * round-trip; each point's s pico-quantizes before the order-free
    * per-cluster sum.
    *
    * Scale: ONE narrow map pass over the corpus (k folds per row, no
    * shuffle) + a k-bounded aggregate. No pairwise anything — the
    * full-silhouette O(n²) is replaced by the centroid form, which is
    * the only one that exists at 100 TB.
    */
  /** IVF cell-balance audit: the occupancy histogram of a coarse
    * quantizer's assignment plus the imbalance factor
    * `max_cell / (n/k)` — THE skew diagnostic for every IVF probing
    * path (ss5/ss7/ann5): a hot cell turns nprobe-bounded scans into
    * full scans, and the fix (split the cell, raise k) is decided off
    * exactly this report.
    *
    * Determinism: same plan-time centroid literals and in-order
    * distance folds as [[silhouetteReport]]; occupancy is exact longs,
    * imbalance one fixed-order double.
    *
    * Scale: ONE narrow map pass + a k-bounded rollup.
    */
  def cellBalanceReport(corpus: DataFrame, centroids: Seq[Centroid],
                        vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "need centroids")
    val k = centroids.size
    val vd = col(vecCol).cast("array<double>")
    val structs = array(centroids.map { c =>
      val cl = typedlit(c.vec.toIndexedSeq)
      val d2 = aggregate(zip_with(vd, cl, (x, cc) => (x - cc) * (x - cc)),
        lit(0.0), (a, t) => a + t)
      struct(d2.as("d"), lit(c.id).as("cid"))
    }: _*)
    val cells = corpus
      .select(array_min(structs).getField("cid").as("cell"))
      .groupBy("cell").agg(count(lit(1)).cast("long").as("n_members"))
      .persist()
    val sm = cells.agg(sum("n_members").cast("long").as("n"),
      count(lit(1)).cast("long").as("used"),
      max("n_members").cast("long").as("max_m"))
    val out = cells.crossJoin(broadcast(sm))
      .select(col("cell"), col("n_members"),
        col("used").as("cells_used"),
        (lit(k.toLong) - col("used")).as("cells_empty"),
        round(col("max_m").cast("double") /
          (col("n").cast("double") / lit(k.toDouble)), 6).as("imbalance"))
      .localCheckpoint() // k rows; lets the cache drop
    cells.unpersist(false)
    out
  }

  def silhouetteReport(corpus: DataFrame, centroids: Seq[Centroid],
                       vecCol: String = "embedding"): DataFrame = {
    require(centroids.size >= 2, "silhouette needs >= 2 centroids")
    val vd = col(vecCol).cast("array<double>")
    val structs = array(centroids.map { c =>
      val cl = typedlit(c.vec.toIndexedSeq)
      val d2 = aggregate(zip_with(vd, cl, (x, cc) => (x - cc) * (x - cc)),
        lit(0.0), (a, t) => a + t)
      struct(d2.as("d"), lit(c.id).as("cid"))
    }: _*)
    val ab = corpus.select(array_sort(structs).as("ss"))
      .select(element_at(col("ss"), 1).getField("cid").as("cluster"),
        sqrt(element_at(col("ss"), 1).getField("d")).as("da"),
        sqrt(element_at(col("ss"), 2).getField("d")).as("db"))
    val sp = ab.select(col("cluster"),
      when(greatest(col("da"), col("db")) > 0,
        floor((col("db") - col("da")) / greatest(col("da"), col("db"))
          * lit(1e12) + lit(0.5)).cast("long"))
        .otherwise(0L).as("s_pico"))
    sp.groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("s_pico").cast("decimal(38,0)")).as("spp"))
      .select(col("cluster"), col("n"),
        round(col("spp").cast("double") / col("n").cast("double") / 1e12, 9)
          .as("mean_silhouette"))
  }

  /** Late-interaction (MaxSim) retrieval à la ColBERT (Khattab &
    * Zaharia, SIGIR'20): treat each vector as `parts` contiguous
    * sub-vectors ("token embeddings") and score a (query, doc) pair as
    * `Σ_{i∈query parts} max_{j∈doc parts} cos(q_i, d_j)` — the
    * multi-vector relevance that single-vector cosine flattens away
    * (a doc matching every query facet separately beats one matching
    * the average). Top-k per query under (score desc, n_id asc).
    *
    * Determinism: the whole score is ONE in-row fold — a fixed-order
    * `aggregate` over query parts of `array_max` over doc parts, each
    * cosine a left-to-right 16-term dot fold — so both engines
    * produce bit-identical doubles, micro-quantized for display. The
    * rank window orders by the raw double with an id tiebreak.
    *
    * Scale: queries broadcast (small by construction); the corpus is
    * scanned ONCE with a per-row constant-size expression (parts² dot
    * products of dim/parts terms = exactly the work of one full-dim
    * dot per query part). The production path for large query sets
    * LSH-prefilters candidates ([[srpCandidates]], the ss3/ss4
    * machinery) and MaxSim-scores only the survivors — pass that ids-
    * only (q_id, n_id) frame as `candidates` and the corpus is cut to
    * candidate rows by an equi-join BEFORE any score expression runs
    * (the ColBERT serving shape, registered as ci2).
    */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 parts: Int = 4, dim: Int = 64,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 candidates: Option[DataFrame] = None): DataFrame = {
    require(dim % parts == 0, "parts must divide dim")
    val sub = dim / parts
    def dotF(a: String, aOff: String, b: String, bOff: String) =
      s"""aggregate(sequence(1, $sub), CAST(0.0 AS DOUBLE), (acc2, t) ->
         |  acc2 + CAST(element_at($a, $aOff * $sub + t) AS DOUBLE)
         |       * CAST(element_at($b, $bOff * $sub + t) AS DOUBLE))""".stripMargin
    // token norms precomputed ONCE per row per side: inside the score
    // fold a norm would be re-derived per (i, j) pair — 2/3 of the
    // pair's flops for a value that never changes (measured 3.0 s →
    // ~2x at the gate). Same sqrt expression, so values are identical.
    def normsExpr(v: String) =
      s"""transform(sequence(0, ${parts - 1}), nn ->
         |  sqrt(${dotF(v, "nn", v, "nn")}))""".stripMargin
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"),
      expr(normsExpr(vecCol)).as("q_norms")))
    // zero-norm guard: an all-zero sub-vector would make the cosine
    // 0/0 = NaN and poison the whole MaxSim sum; treat it as cosine 0
    // (the quantizeInt8 scale=0 convention). Same CASE on both engines.
    val scoreExpr =
      s"""aggregate(sequence(0, ${parts - 1}), CAST(0.0 AS DOUBLE), (acc, i) ->
         |  acc + array_max(transform(sequence(0, ${parts - 1}), j ->
         |    CASE WHEN element_at(q_norms, i + 1) * element_at(n_norms, j + 1)
         |           = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
         |    ELSE ${dotF("q_vec", "i", "n_vec", "j")}
         |    / (element_at(q_norms, i + 1) * element_at(n_norms, j + 1))
         |    END)))"""
        .stripMargin
    val corpusSide = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      expr(normsExpr(vecCol)).as("n_norms"))
    val paired = candidates match {
      case Some(c) =>
        // ids-only prefilter: the candidate equi-join bounds which
        // corpus rows ever meet a query — the parts² score expression
        // runs per CANDIDATE, not per (query × corpus) pair
        corpusSide
          .join(c.select(col("q_id"), col("n_id")), Seq("n_id"))
          .join(q, Seq("q_id"))
          .filter(col("n_id") =!= col("q_id"))
      case None =>
        corpusSide.join(q, col("n_id") =!= col("q_id"))
    }
    val scored = paired.withColumn("sim", expr(scoreExpr))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"),
        floor(col("sim") * lit(1e6) + lit(0.5)).cast("long")
          .as("maxsim_micro"))
  }

  /** MAUVE-style divergence frontier (Pillutla et al., NeurIPS'21 —
    * "MAUVE: Measuring the Gap Between Neural Text and Human Text";
    * the quantized two-sided-KL construction of §2): embed both
    * corpora, QUANTIZE the embedding space into k cells (here the
    * fixed coarse centroids, cosine argmax — the paper uses k-means
    * exactly like this), and trace the frontier
    * `(KL(Q‖M_λ), KL(P‖M_λ))` over mixtures `M_λ = λP̂ + (1−λ)Q̂` for
    * λ on an interior grid. One-sided KL misses mode COLLAPSE or mode
    * INVENTION depending on direction; the frontier exposes both —
    * the standard generated-vs-human distribution-gap eval, and in a
    * data pipeline the drift check between two corpus snapshots that
    * token-level divergence ([[graft.ops.Text]] domainDivergence)
    * can't see.
    *
    * Determinism: cell histograms are exact integer counts; each KL
    * term's log argument is an exact integer ratio
    * (`g·a_c·B / (i·a_c·B + (g−i)·b_c·A)` — the λ = i/g mixture
    * cleared of denominators, decimal(38,0) so 100 TB counts never
    * overflow); terms are fixed-form doubles pico-quantized before
    * the order-free sum.
    *
    * Scale: ONE narrow assignment pass per corpus row (k in-row
    * folds), a (cell) count shuffle, then everything lives on the
    * k × grid table. The frontier costs no more than the histogram.
    */
  def divergenceFrontier(vecs: DataFrame, isP: Column,
                         centroids: Seq[Centroid], grid: Int = 8,
                         vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "need centroids")
    require(grid >= 2, "grid must be >= 2")
    val vd = col(vecCol).cast("array<double>")
    val cellStructs = array(centroids.map { c =>
      val vlit = typedlit(c.vec.toIndexedSeq)
      struct((dot(vlit, vd) / lit(c.norm)).as("c_sim"), lit(c.id).as("c_id"))
    }: _*)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = vecs
      .select(isP.cast("boolean").as("is_p"),
        array_max(cellStructs).getField("c_id").as("cell"))
      .groupBy("cell")
      .agg(sum(when(col("is_p"), 1L).otherwise(0L)).cast("long").as("a"),
        sum(when(col("is_p"), 0L).otherwise(1L)).cast("long").as("b"))
      .persist()
    val tot = cells.agg(sum("a").cast("long").as("ta"),
      sum("b").cast("long").as("tb"))
    val lam = vecs.sparkSession.range(1, grid.toLong)
      .select(col("id").as("lam"))
    val terms = cells.crossJoin(broadcast(tot)).crossJoin(broadcast(lam))
      // an empty corpus side (ta = 0 or tb = 0) zeroes dmix and the KL
      // log argument divides by zero — fail loudly, in-plan (no driver
      // action), instead of emitting null/NaN rows
      .withColumn("ta", when(col("ta") > 0L && col("tb") > 0L, col("ta"))
        .otherwise(expr("CAST(raise_error('divergenceFrontier: one " +
          "corpus side is empty (ta or tb = 0) — the KL mixture is " +
          "undefined') AS BIGINT)")))
      // mixture denominator cleared of A·B·g: D = i·a·B + (g−i)·b·A
      .withColumn("dmix",
        dec(col("lam")) * dec(col("a")) * dec(col("tb")) +
          (dec(lit(grid.toLong)) - dec(col("lam"))) * dec(col("b")) * dec(col("ta")))
      .withColumn("tp", when(col("a") > 0L,
        floor((col("a").cast("double") / col("ta").cast("double")) *
          log((dec(lit(grid.toLong)) * dec(col("a")) * dec(col("tb")))
            .cast("double") / col("dmix").cast("double")) * lit(1e12) +
          lit(0.5)).cast("long")).otherwise(lit(0L)))
      .withColumn("tq", when(col("b") > 0L,
        floor((col("b").cast("double") / col("tb").cast("double")) *
          log((dec(lit(grid.toLong)) * dec(col("b")) * dec(col("ta")))
            .cast("double") / col("dmix").cast("double")) * lit(1e12) +
          lit(0.5)).cast("long")).otherwise(lit(0L)))
    val out = terms.groupBy("lam")
      .agg(sum(dec(col("tp"))).as("sp"), sum(dec(col("tq"))).as("sq"))
      .select(col("lam"),
        expr(s"(lam * 1000000L) div ${grid}L").as("lambda_micro"),
        expr("CAST(sp div 1000L AS BIGINT)").as("klp_nano"),
        expr("CAST(sq div 1000L AS BIGINT)").as("klq_nano"))
      .orderBy("lam")
      .localCheckpoint() // grid-bounded rows; lets the cells cache drop
    cells.unpersist(false)
    out
  }
}
