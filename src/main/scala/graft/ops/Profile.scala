package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-profiling operators — the "ANALYZE TABLE"-style summaries a
  * pipeline publishes before training on a new corpus drop: per-column
  * null/distinct/range stats and fixed-width histograms.
  *
  * Scale: `profileNumeric` is ONE aggregation pass producing a single
  * row (count/min/max are map-side combinable; the exact distincts ride
  * Spark's Expand-based multi-distinct rewrite), then a constant-width
  * unpivot of that one row — no per-column scans, no shuffle of data
  * rows beyond the aggregation itself. `histogram` is one
  * map-side-combinable groupBy on a computed bucket id.
  */
object Profile {

  /** One profile row per column: total rows, nulls, exact distincts,
    * min/max (as double — numeric columns only, which keeps the values
    * engine-portable; string min/max would hinge on collation).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).cast("long").as(s"${c}__n"),
        count(when(col(c).isNull, 1)).cast("long").as(s"${c}__nulls"),
        count_distinct(col(c)).cast("long").as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__n").as("n_rows"), col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"), col(s"${c}__max").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Fixed-width histogram over `[lo, hi)` with `nBuckets` buckets;
    * values outside the range clamp into the edge buckets, so counts
    * always sum to the row count. Fixed bounds keep it one pass — a
    * data-dependent range would need a min/max pre-pass (two jobs) for
    * no profiling benefit.
    */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need nBuckets > 0 and hi > lo")
    val width = (hi - lo) / nBuckets
    val bucket = least(lit(nBuckets - 1),
      greatest(lit(0), floor((col(c) - lo) / width).cast("int")))
    df.filter(col(c).isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("lo_edge", lit(lo) + col("bucket") * width)
  }

  /** Per-group MERGEABLE histogram: one row per group with
    * `bins: array<long>` of length nBuckets over the fixed range
    * `[lo, hi)` (edge-clamped like [[histogram]]). The quantile-family
    * analog of the hl1 HLL rollup: bin-count vectors merge by
    * element-wise ADD — associative, commutative, idempotent-free but
    * exact — so any group range's distribution query becomes O(groups ×
    * nBuckets) arithmetic on the rollup table with NO rescan of raw
    * data. Build cost: one map-combinable (group, bin) count plus one
    * (group)-keyed reassembly; only (group, int, long) rows shuffle.
    */
  def histogramRollup(df: DataFrame, groupCol: String, c: String,
                      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need nBuckets > 0 and hi > lo")
    val width = (hi - lo) / nBuckets
    val bucket = least(lit(nBuckets - 1),
      greatest(lit(0), floor((col(c) - lo) / width).cast("int")))
    df.filter(col(c).isNotNull)
      .groupBy(col(groupCol), bucket.as("__b"))
      .agg(count(lit(1)).cast("long").as("__n"))
      .groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__n")))).as("__m"))
      .select(col(groupCol),
        transform(sequence(lit(0), lit(nBuckets - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L))).as("bins"))
  }

  /** Merge a set of histogram-rollup rows into ONE histogram:
    * (bin, n), bins summed element-wise. The (int, long) pair stream
    * is the only thing that shuffles — O(groups × nBuckets), never
    * raw rows.
    */
  def mergeHistogramBins(hists: DataFrame, binsCol: String = "bins"): DataFrame =
    hists.select(posexplode(col(binsCol)).as(Seq("bin", "n")))
      .groupBy(col("bin")).agg(sum(col("n")).cast("long").as("n"))

  /** Quantile estimates FROM a merged (bin, n) histogram: for each q,
    * the containing bin (first with cumulative ≥ q·N) and the
    * linear-interpolation estimate within it — the answer shape a
    * percentile dashboard reads off the rollup table. The window runs
    * over nBuckets rows (bounded by construction, never data-sized).
    * Output: (q, bin, lo_edge, bin_n, cum_before, total, est) with
    * est = lo_edge + width·(q·N − cum_before)/bin_n rounded to 6
    * (row membership is decided by integer cumulative counts only;
    * the double rides along, the ss1 precedent).
    */
  def binQuantiles(hist: DataFrame, qs: Seq[Double],
                   lo: Double, width: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must be in (0, 1]")
    val w = Window.orderBy(col("bin"))
    val cum = hist
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("cum_before", (col("cum") - col("n")).cast("long"))
    val total = hist.agg(sum(col("n")).cast("long").as("total"))
    val qdf = hist.sparkSession.range(1)
      .select(explode(array(qs.map(lit(_)): _*)).as("q"))
    val qRows = cum.crossJoin(broadcast(total)).crossJoin(qdf)
    val t = col("q") * col("total")
    qRows
      .filter(col("cum") >= t && col("cum_before") < t)
      .select(col("q"),
        col("bin").cast("int").as("bin"),
        (lit(lo) + col("bin") * lit(width)).as("lo_edge"),
        col("n").as("bin_n"),
        col("cum_before"),
        col("total"),
        round(lit(lo) + col("bin") * lit(width) +
          lit(width) * (t - col("cum_before")) / col("n"), 6).as("est"))
  }

  /** Equi-depth (quantile-bucketed) histogram: cut points are the exact
    * interpolated `k`-quantiles of `c`, buckets assigned by comparison
    * against them. The scalable shape for data-dependent binning:
    * NOT a global `ntile` window (which funnels the table through one
    * partition) but one tree-aggregated quantile pass, a broadcast of
    * the k−1 cut points, a narrow comparison map, and a combinable
    * count — the same two-job profile cost as a min/max pre-pass.
    * At 100 TB swap the exact `percentile` for `approx_percentile` and
    * the plan is unchanged.
    */
  def equiDepth(df: DataFrame, c: String, k: Int): DataFrame = {
    require(k > 1, "need at least 2 buckets")
    val ps = (1 until k).map(i => i.toDouble / k)
    val cuts = df.agg(
      expr(s"percentile($c, array(${ps.mkString(",")}))").as("__cuts"))
    val bucket = (0 until k - 1).foldRight(lit(k - 1): Column) { (i, els) =>
      when(col(c) < col("__cuts")(i), i).otherwise(els)
    }
    df.filter(col(c).isNotNull)
      .crossJoin(broadcast(cuts))
      .groupBy(bucket.cast("int").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n"),
        min(col(c)).cast("double").as("lo_val"),
        max(col(c)).cast("double").as("hi_val"))
  }

  /** Declarative data-quality expectations (the Deequ/Great-Expectations
    * pattern): each check is a NAME plus a violation-counting DataFrame,
    * and the report is one row per check — (check, n_violations, pass).
    * Library-provided check builders cover the recurring four; callers
    * union their own rows for bespoke rules.
    *
    * Scale: every builder is a single aggregation pass over its input —
    * uniqueness is a combinable (key → count>1) aggregate, completeness
    * and range are plain conditional counts, and referential integrity
    * is a left-anti join that broadcasts when the dimension allows.
    * The final report is a union of one-row frames — no data rows
    * survive past each check's own aggregate.
    */
  def expectUnique(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(when(col("__n") > 1, col("__n") - 1)), lit(0))
        .cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  def expectComplete(df: DataFrame, name: String, c: String): DataFrame =
    df.agg(count(when(col(c).isNull, 1)).cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  def expectInRange(df: DataFrame, name: String, c: String,
                    lo: Double, hi: Double): DataFrame =
    df.agg(count(when(col(c) < lo || col(c) > hi || col(c).isNull, 1))
        .cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  def expectReferential(fact: DataFrame, name: String, fk: String,
                        dim: DataFrame, pk: String): DataFrame =
    fact.join(dim.select(col(pk).as("__pk")).distinct(),
        fact(fk) === col("__pk"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Union check rows into the final report with the pass verdict. */
  def qualityReport(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)

  /** Population stability index between a reference and a current
    * slice of a numeric feature (the model-monitoring drift gate —
    * the banking-scorecard PSI, bucketized on FIXED edges so counts
    * are exact integers): per bucket, both counts, the Laplace-
    * smoothed shares `p=(c+1)/(n+B)`, and the PSI term
    * `(p−q)·ln(p/q)`; `psi_total` (the Σ, conventionally >0.1 =
    * drifting, >0.25 = drifted) rides every row.
    *
    * Scale: two combinable bucket-count aggregations (each one narrow
    * scan) + an O(buckets) join — report size O(buckets). The edges
    * are plan-time literals; nothing wide ever moves.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
               edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted, "edges must be sorted")
    val nB = edges.size + 1
    def bucketOf = edges.zipWithIndex.foldLeft(lit(0)) { case (acc, (e, _)) =>
      acc + when(col(valueCol).cast("double") >= e, 1).otherwise(0)
    }
    def counts(df: DataFrame, as: String) = df
      .select(bucketOf.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).cast("long").as(as))
    val allBuckets = ref.sparkSession.range(0, nB)
      .select(col("id").cast("int").as("bucket"))
    val joined = allBuckets
      .join(counts(ref, "ref_n"), Seq("bucket"), "left")
      .join(counts(cur, "cur_n"), Seq("bucket"), "left")
      .na.fill(0L, Seq("ref_n", "cur_n"))
    val tot = joined.agg(sum(col("ref_n")).as("__rt"), sum(col("cur_n")).as("__ct"))
    joined.crossJoin(tot)
      .withColumn("p", (col("ref_n") + lit(1)).cast("double")
        / (col("__rt") + lit(nB)).cast("double"))
      .withColumn("q", (col("cur_n") + lit(1)).cast("double")
        / (col("__ct") + lit(nB)).cast("double"))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .withColumn("psi_total",
        round(sum(col("term")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()), 6))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        round(col("term"), 6).as("term"), col("psi_total"))
  }

  /** One-row dataset card (the datasheet/model-card summary a corpus
    * release ships with — Gebru et al. CACM'21): volume (docs, words),
    * diversity (langs, sources), exact-duplicate mass and rate, the
    * exact lower-median document length, and mean quality score
    * ([[Text.withQuality]] semantics).
    *
    * Scale: three aggregation passes (base counts, md5 dup mass, mean
    * quality) are all combinable scans; the exact median rides a
    * global row_number over ONE (long) column — the known cost of an
    * exact order statistic (the hq1 histogram rollup is the
    * approximate path at petabyte row counts).
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(size(filter(split(lower(col("text")), " "), w => length(w) > 0)))
        .cast("long").as("n_words"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val dup = docs.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
        .cast("long").as("n_dup_docs"))
    val med = docs.select(col("n_chars").cast("long").as("nc"))
      .withColumn("rn", row_number().over(Window.orderBy(col("nc"))))
      .crossJoin(base.select(col("n_docs").as("__n")))
      .filter(col("rn") === ((col("__n") + 1) / 2).cast("long")) // integral: (n+1) div 2
      .select(col("nc").as("median_chars"))
    val mq = graft.ops.Text.withQuality(docs)
      .agg(round(avg(col("quality_score")), 6).as("mean_quality"))
    base.crossJoin(dup).crossJoin(med).crossJoin(mq)
      .withColumn("dup_rate",
        col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
      .select(col("n_docs"), col("n_words"), col("n_langs"), col("n_sources"),
        col("n_dup_docs"), col("dup_rate"), col("median_chars"), col("mean_quality"))
  }

  /** Schema-drift classification between a governed table and an
    * incoming batch: per column — `added` (batch only), `removed`
    * (table only), `retyped` (both, different type), `unchanged`.
    * The ingest-time contract check that decides between mergeSchema
    * evolution (added), quarantine (removed/retyped), and fast-path
    * append (all unchanged).
    *
    * Schemas are driver-side metadata (bytes, not data) — building the
    * report from them costs nothing at any table size.
    */
  /** Join-key skew report: the top-`topK` heaviest keys with their
    * share of all rows and skew factor (count over the uniform
    * per-key expectation) — the operational pre-check that decides
    * whether a join needs salting (`Skew`) or AQE's skew handling can
    * carry it, and the monitor that catches a new hot key in
    * production. Exact integer counts; the ratios are fixed-order
    * arithmetic on the two broadcast scalars.
    *
    * Scale: one combinable (key, count) shuffle, a one-row global
    * aggregate, and a TakeOrdered top-K — no global sort, nothing
    * wide. This is the diagnostic you run BEFORE the expensive join,
    * on the join keys alone.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    // Two consumers read the aggregate (top-K branch + global stats):
    // persist so the input scan and (key, count) shuffle run ONCE —
    // exchange reuse is not guaranteed across the limit/agg branches.
    // Key-cardinality-sized, DISK_ONLY (lineage kept, lazily built);
    // released by the caller's session cache discipline.
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val stats = counts.agg(count(lit(1)).cast("long").as("n_keys"),
      sum(col("cnt")).cast("long").as("n_rows"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key").asc)
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("key"), col("cnt"),
        (col("cnt").cast("double") / col("n_rows").cast("double")).as("share"),
        (col("cnt").cast("double") * col("n_keys").cast("double")
          / col("n_rows").cast("double")).as("skew_factor"),
        col("n_keys"), col("n_rows"))
  }

  def schemaDrift(table: DataFrame, batch: DataFrame): DataFrame = {
    val spark = table.sparkSession
    import spark.implicits._
    val t = table.schema.map(f => f.name -> f.dataType.sql).toMap
    val b = batch.schema.map(f => f.name -> f.dataType.sql).toMap
    val rows = (t.keySet ++ b.keySet).toSeq.sorted.map { c =>
      val status = (t.get(c), b.get(c)) match {
        case (None, Some(_))                  => "added"
        case (Some(_), None)                  => "removed"
        case (Some(x), Some(y)) if x != y     => "retyped"
        case _                                => "unchanged"
      }
      (c, t.getOrElse(c, null), b.getOrElse(c, null), status)
    }
    rows.toDF("col_name", "table_type", "batch_type", "status")
  }

  /** Vocabulary drift between two corpus versions (old crawl vs new
    * crawl): Jensen-Shannon divergence of the term distributions plus
    * the top `topK` terms by absolute probability shift — the lexical
    * companion to [[psiDrift]]'s numeric-feature drift, and the check
    * a dataset card publishes when a refresh lands ("what moved in the
    * vocabulary, and by how much").
    *
    * Determinism: probabilities are exact rationals (term count /
    * total), every per-term JS contribution quantizes to integer
    * pico-units (×10¹²) before the vocabulary-wide sum — order-free
    * long arithmetic, no cross-row float accumulation — and the shift
    * ranking orders by the ×10⁹-quantized |p_old − p_new| with a term
    * tiebreak.
    *
    * Scale: two map-side-combinable term counts + one full-outer join
    * on term (ids-and-counts only, text never shuffles past
    * tokenization), one combinable long sum for JS, TakeOrdered for
    * the report. JS is symmetric and bounded by ln 2, so the scalar is
    * comparable across refreshes of any size.
    */
  def vocabDrift(oldDocs: DataFrame, newDocs: DataFrame, topK: Int = 10,
                 textCol: String = "text"): DataFrame = {
    require(topK > 0, "topK must be positive")
    def counts(df: DataFrame, cname: String): DataFrame = df
      .select(explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).cast("long").as(cname))
    val oc = counts(oldDocs, "c_old")
    val nc = counts(newDocs, "c_new")
    val joined = oc.join(nc, Seq("term"), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
    val totals = joined.agg(sum(col("c_old")).as("__no"),
      sum(col("c_new")).as("__nn"))
    val withP = joined.crossJoin(broadcast(totals))
      .withColumn("p_old", col("c_old").cast("double") / col("__no").cast("double"))
      .withColumn("p_new", col("c_new").cast("double") / col("__nn").cast("double"))
      .withColumn("__m", (col("p_old") + col("p_new")) / 2)
      .withColumn("__js_pico", round((
          when(col("p_old") > 0,
            col("p_old") * log(col("p_old") / col("__m"))).otherwise(lit(0.0)) +
          when(col("p_new") > 0,
            col("p_new") * log(col("p_new") / col("__m"))).otherwise(lit(0.0))
        ) / 2 * 1e12).cast("long"))
      .withColumn("shift_nano",
        round(abs(col("p_old") - col("p_new")) * 1e9).cast("long"))
    // one pass over the joined vocabulary serves BOTH consumers (the
    // JS sum and the shift report): persist, run the two bounded
    // actions, return the <= topK rows as literals — the blockingQuality
    // eager discipline, avoiding a second tokenize+join of the corpus
    val p = withP.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val jsSum = p.agg(sum(col("__js_pico")).as("s")).collect()(0).getLong(0)
    val top = p.orderBy(col("shift_nano").desc, col("term").asc).limit(topK)
      .select(col("term"), col("c_old"), col("c_new"),
        round(col("p_old"), 9).as("p_old"), round(col("p_new"), 9).as("p_new"),
        col("shift_nano"))
      .collect().toSeq
    p.unpersist()
    val spark = oldDocs.sparkSession
    spark.createDataFrame(
        spark.sparkContext.parallelize(top, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("term",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("c_old",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("c_new",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("p_old",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("p_new",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("shift_nano",
            org.apache.spark.sql.types.LongType))))
      .withColumn("js_divergence", round(lit(jsSum.toDouble / 1e12), 9))
  }

  /** Referential-integrity audit for one FK relation: orphaned child
    * rows (FK value absent from the parent), null FKs, and childless
    * parents — the three counts every lakehouse DQ battery publishes
    * per edge of the schema graph (dq1's expectations check VALUES,
    * this checks RELATIONSHIPS).
    *
    * Determinism: pure integer counting; one display division.
    *
    * Scale: the orphan probe is a DISTINCT-keys anti-join (key-
    * cardinality-sized both sides, never row×row); childless parents
    * are the mirror anti-join. Counts come off the key tables.
    */
  def referentialIntegrity(child: DataFrame, childKey: String,
                           parent: DataFrame, parentKey: String,
                           relation: String): DataFrame = {
    val spark = child.sparkSession
    val ck = child.select(col(childKey).as("k"))
    val pk = parent.select(col(parentKey).as("k")).distinct()
      .persist()
    val nChild = ck.count()
    val nNull = ck.filter(col("k").isNull).count()
    val orphanKeys = ck.filter(col("k").isNotNull).groupBy("k")
      .agg(count(lit(1)).cast("long").as("c"))
      .join(pk, Seq("k"), "left_anti")
      .persist()
    val orphanRows = orphanKeys.agg(coalesce(sum("c"), lit(0L)).cast("long"))
      .head().getLong(0)
    val nOrphanKeys = orphanKeys.count()
    val childless = pk.join(ck.filter(col("k").isNotNull).distinct(),
      Seq("k"), "left_anti").count()
    val nParent = pk.count()
    pk.unpersist(false); orphanKeys.unpersist(false)
    import spark.implicits._
    Seq((relation, nChild, nNull, orphanRows, nOrphanKeys, nParent, childless))
      .toDF("relation", "n_child", "n_null_fk", "n_orphan_rows",
        "n_orphan_keys", "n_parent_keys", "n_childless_parents")
      .withColumn("orphan_rate",
        round(col("n_orphan_rows").cast("double") /
          col("n_child").cast("double"), 9))
  }

  /** Per-source token-length distribution — p50/p90/p99 plus min/max
    * and the long-tail share: the sequence-length facts that size
    * packing budgets (cur2/ctx1), truncation losses and batch shapes
    * (lb1). Exact interpolated percentiles per source (the hi2/h10
    * cross-engine convention), tree-aggregated — no per-source sort.
    *
    * Scale: one narrow in-row token count + ONE grouped percentile
    * pass + a join-free conditional rollup.
    */
  def lengthPercentiles(docs: DataFrame, longAt: Long = 256,
                        groupCol: String = "source",
                        textCol: String = "text"): DataFrame = {
    val per = docs.select(col(groupCol).as("grp"),
      size(split(col(textCol), " ")).cast("long").as("n_tok"))
    val cuts = per.groupBy("grp").agg(
      expr("percentile(n_tok, CAST(5 AS DOUBLE)/10)").as("p50"),
      expr("percentile(n_tok, CAST(9 AS DOUBLE)/10)").as("p90"),
      expr("percentile(n_tok, CAST(99 AS DOUBLE)/100)").as("p99"))
    per.groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min("n_tok").cast("long").as("min_tok"),
        max("n_tok").cast("long").as("max_tok"),
        sum(when(col("n_tok") >= longAt, 1L).otherwise(0L)).cast("long")
          .as("n_long"))
      .join(cuts, "grp")
      .select(col("grp").as("source"), col("n_docs"),
        col("min_tok"), round(col("p50"), 6).as("p50_tok"),
        round(col("p90"), 6).as("p90_tok"),
        round(col("p99"), 6).as("p99_tok"), col("max_tok"),
        col("n_long"),
        expr("(n_long * 1000000L) div n_docs").as("long_share_micro"))
  }

  /** The corpus DATA CARD — the one-page (metric, value) summary every
    * dataset release ships (Gebru et al. "Datasheets for Datasets";
    * the HF dataset-card numbers): sizes, composition cardinalities,
    * the quality mean, the exact-duplicate mass, and the
    * injection-hygiene count, as one long-typed metric table. Each
    * number is an independent one-pass aggregate; the card is their
    * union — the cheap always-on report the deep per-family audits
    * (dd*, tx*, pi1, …) drill beneath.
    *
    * Scale: four aggregation passes over the corpus (plain scan ×2, a
    * text-hash group, a marker scan) — all combinable, no windows, no
    * joins; the output is metrics-bounded.
    */
  def dataCard(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val base = docs.select(col(textCol).as("t"), col("source"), col("lang"),
      size(split(col(textCol), " ")).cast("long").as("ntok"),
      length(col(textCol)).cast("long").as("nch"))
    val sizes = base.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("ntok")).cast("long").as("n_tokens"),
      sum(col("nch")).cast("long").as("n_chars"),
      countDistinct(col("source")).cast("long").as("n_sources"),
      countDistinct(col("lang")).cast("long").as("n_langs"))
    val quality = graft.ops.Text.withQuality(docs, textCol)
      .agg(expr("CAST(sum(CAST(floor(quality_score * 1e6 + 0.5) AS " +
        "DECIMAL(38,0))) div count(1) AS BIGINT)").as("mean_quality_micro"))
    val dups = docs.select(md5(col(textCol)).as("h"))
      .groupBy("h").agg(count(lit(1)).cast("long").as("c"))
      .agg(coalesce(sum(when(col("c") > 1L, col("c")).otherwise(0L)),
        lit(0L)).cast("long").as("n_exact_dup_docs"))
    val inj = graft.ops.Text.injectionScan(docs, textCol = textCol)
      .agg(sum("n_flagged").cast("long").as("n_injection_flagged"))
    def melt(df: DataFrame, names: Seq[String]) =
      names.map(n => df.select(lit(n).as("metric"), col(n).as("value")))
        .reduce(_.unionByName(_))
    melt(sizes, Seq("n_docs", "n_tokens", "n_chars", "n_sources", "n_langs"))
      .unionByName(melt(quality, Seq("mean_quality_micro")))
      .unionByName(melt(dups, Seq("n_exact_dup_docs")))
      .unionByName(melt(inj, Seq("n_injection_flagged")))
  }
}
