package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators (north-star extensions,
  * SURVEY.md §7.7 / BASELINE.json): exact, MinHash+LSH, SimHash and
  * n-gram-Jaccard near-dup over a `documents(doc_id, text, ...)` table.
  *
  * Scale design: every operator here is expressed as hash-partitioned
  * group-bys / equi-joins so Catalyst shuffles on content hashes, never
  * on document text; candidate generation is LSH-bucketed (linear in
  * candidates), with the exact O(n²)-per-token variant kept only as the
  * small-scale verification baseline.
  */
object Dedup {

  def tokens(textCol: Column): Column = split(lower(textCol), " ")

  /** Exact dedup: group by content hash, keep the smallest id.
    * One map-side-combinable shuffle on a 128-bit hash — at 100 TB this
    * shuffles ~(n_docs × 50B), not the corpus.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Incremental (cross-corpus) exact dedup: drop every delta document
    * whose content already exists in the base corpus — the operation an
    * incremental training-data refresh runs (new crawl vs the corpus
    * already curated). Anti-join on the 128-bit content hash: the base
    * side reduces to DISTINCT hashes first (map-side combinable), so
    * only ~(n_base × 32B) of hashes cross the exchange and the delta's
    * text never shuffles at all; with a small base-hash set the
    * anti-join broadcasts.
    */
  def dedupAgainst(delta: DataFrame, base: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    delta.withColumn("__h", md5(col(textCol)))
      .join(base.select(md5(col(textCol)).as("__h")).distinct(), Seq("__h"), "left_anti")
      .drop("__h")

  /** Exact n-gram (token-set) Jaccard similarity for all pairs above a
    * threshold, via an inverted-index join on tokens. Correct but
    * O(sum over tokens of df(token)²) — the verification baseline;
    * MinHash+LSH below is the scale path.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = docs
      .select(col(idCol).as("d"), explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val sizes = tok.groupBy(col("d")).agg(count(lit(1)).as("n"))
    val common = tok.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") && col("a.d") < col("b.d"))
      .groupBy(col("a.d").as("d1"), col("b.d").as("d2"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("d", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("d", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("jaccard",
        col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** EXACT token-set Jaccard self-join at scale via frequency-ordered
    * prefix filtering (the AllPairs/PPJoin family, Bayardo et al. 2007
    * "Scaling Up All Pairs Similarity Search"). Same output contract as
    * [[ngramJaccardPairs]] — every pair with `jaccard >= threshold`,
    * NO approximation — but candidate generation only joins each
    * document's PREFIX (its `n - ceil(t*n) + 1` globally-rarest
    * tokens) against the inverted index, instead of every token.
    *
    * Why it's exact: order all tokens by ascending document frequency.
    * If two sets share NO token within both prefixes, then even if all
    * remaining tokens matched, the overlap is < the minimum required
    * for `J >= t` — so every qualifying pair shares a prefix token and
    * survives candidate generation (the standard prefix-filter lemma).
    *
    * Shuffle profile: one df-count aggregate on tokens, one window per
    * doc id for (rank, size) — ids+tokens only, never text — then an
    * equi-join on PREFIX tokens whose cost is Σ_prefix-tokens df², with
    * df small by construction (prefixes keep the rarest tokens).
    * Verification counts shared tokens only for candidate pairs (two
    * semi-bounded equi-joins), not all pairs. At 100 TB this replaces
    * [[ngramJaccardPairs]]'s full-index join as the exact path;
    * MinHash+LSH below remains the cheaper approximate alternative.
    */
  def prefixJaccardPairs(docs: DataFrame, threshold: Double,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = docs
      .select(col(idCol).as("d"), explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val dfCount = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // rank tokens inside each doc rare-first; ties broken lexically so
    // the prefix is deterministic. One exchange on d serves both the
    // rank and the set size.
    val wd = Window.partitionBy(col("d"))
    val ranked = tok.join(dfCount, "tok")
      .withColumn("rk", row_number().over(wd.orderBy(col("df").asc, col("tok").asc)))
      .withColumn("n", count(lit(1)).over(wd))
    // same 1e-9 slack as the alpha/size filters below: without it,
    // double rounding (20*0.55 = 11.000000000000002, ceil = 12) shortens
    // the prefix by one token and can silently drop qualifying pairs
    val prefix = ranked
      .filter(col("rk") <= col("n") - ceil(col("n") * lit(threshold) - lit(1e-9)) + lit(1))
      .select(col("d"), col("tok"), col("n"), col("rk"))
    // Two lossless candidate filters from the AllPairs/PPJoin papers,
    // both plain arithmetic on columns already in the join (no extra
    // shuffle). Size compatibility: J >= t forces |B| >= t·|A| and
    // vice versa. Positional: J >= t forces overlap >= ceil(t/(1+t) ·
    // (n1+n2)) = α, and for any shared token at prefix positions
    // (i, j) the overlap is at most min(i,j)-1 + 1 + min(n1-i, n2-j),
    // so occurrences whose bound is < α cannot belong to a qualifying
    // pair (every occurrence of a qualifying pair has bound >= overlap
    // >= α — pruning can't orphan one). The 1e-9 slack keeps double
    // rounding from excluding exact-boundary pairs; verify is exact.
    val alpha = ceil((col("a.n") + col("b.n")) * lit(threshold / (1.0 + threshold))
      - lit(1e-9))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.d") < col("b.d") &&
          col("b.n") >= col("a.n") * lit(threshold) - lit(1e-9) &&
          col("a.n") >= col("b.n") * lit(threshold) - lit(1e-9) &&
          least(col("a.rk"), col("b.rk")) +
            least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")) >= alpha)
      .select(col("a.d").as("d1"), col("b.d").as("d2"))
      .distinct()
    // exact verify bounded by candidates: join each side's DISTINCT
    // token array onto the pair (two id-keyed equi-joins whose row
    // count is |candidates|, not |candidates|×|tokens|) and intersect
    // IN-ROW — no per-token explode, no count shuffle after the join.
    val tokArr = docs.select(col(idCol).as("d"),
      array_distinct(tokens(col(textCol))).as("ta"))
    cand
      .join(tokArr.select(col("d").as("d1"), col("ta").as("ta1")), "d1")
      .join(tokArr.select(col("d").as("d2"), col("ta").as("ta2")), "d2")
      .withColumn("c", size(array_intersect(col("ta1"), col("ta2"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("ta1")) + size(col("ta2")) - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** EXACT asymmetric CONTAINMENT near-dup: all unordered pairs where
    * either direction of C(A,B) = |S_A ∩ S_B| / |S_A| reaches
    * `threshold` — the relationship Jaccard structurally misses (a
    * short document quoted inside a long one has tiny Jaccard but
    * containment ≈ 1 of the short side). The dedup decision for
    * quote/subset boilerplate and doc-in-doc syndication.
    *
    * Exact via the ONE-SIDED prefix filter: C(A,B) ≥ t forces overlap
    * ≥ t·|A|, so A's (|A| − ⌈t·|A|⌉ + 1) globally-rarest tokens must
    * intersect S_B — joining PREFIX(A) against the FULL index is a
    * lossless candidate generator for "A contained anywhere", with no
    * size-compatibility filter (B may be arbitrarily larger — that is
    * the point). Join cost is Σ_{prefix tokens} df(tok), small by the
    * rare-first prefix discipline even though the probed index is
    * full. Verification intersects DISTINCT token arrays in-row on
    * |candidates| rows ([[prefixJaccardPairs]]'s verify shape) — no
    * per-token explode after candidate generation, text never
    * shuffles past the token index.
    */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.8,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val tok = docs
      .select(col(idCol).as("d"), explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val dfCount = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val wd = Window.partitionBy(col("d"))
    val ranked = tok.join(dfCount, "tok")
      .withColumn("rk", row_number().over(wd.orderBy(col("df").asc, col("tok").asc)))
      .withColumn("n", count(lit(1)).over(wd))
    // the 1e-9 slack: same double-rounding guard as prefixJaccardPairs
    val prefix = ranked
      .filter(col("rk") <= col("n") - ceil(col("n") * lit(threshold) - lit(1e-9)) + lit(1))
      .select(col("d"), col("tok"))
    val cand = prefix.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") && col("a.d") =!= col("b.d"))
      .select(least(col("a.d"), col("b.d")).as("d1"),
        greatest(col("a.d"), col("b.d")).as("d2"))
      .distinct()
    val tokArr = docs.select(col(idCol).as("d"),
      array_distinct(tokens(col(textCol))).as("ta"))
    cand
      .join(tokArr.select(col("d").as("d1"), col("ta").as("ta1")), "d1")
      .join(tokArr.select(col("d").as("d2"), col("ta").as("ta2")), "d2")
      .withColumn("c", size(array_intersect(col("ta1"), col("ta2"))))
      .withColumn("cont1", col("c").cast("double") / size(col("ta1")).cast("double"))
      .withColumn("cont2", col("c").cast("double") / size(col("ta2")).cast("double"))
      .filter(greatest(col("cont1"), col("cont2")) >= threshold)
      .select(col("d1"), col("d2"), col("cont1"), col("cont2"))
  }

  /** EXACT token-set Jaccard self-join via set canonicalization plus
    * size-banded partition (pigeonhole) candidate generation — the
    * partition-based exact-similarity-join family (Deng, Li, Feng,
    * "A partition-based method for string similarity joins",
    * VLDB'15/TODS, lifted from strings to token sets). Same output
    * contract as [[ngramJaccardPairs]] / [[prefixJaccardPairs]]: every
    * pair with `jaccard >= threshold`, NO approximation — but where the
    * prefix filter blocks on SINGLE rare tokens (candidates ~
    * Σ_token df², which degrades on small-vocabulary / high-overlap
    * corpora), this blocks on WHOLE part-subset hashes, so a candidate
    * must already agree exactly on ~(1+t)/(2(1-t)) tokens — measured on
    * the sf0.1 documents table at t=0.95 that is 37 k candidates where
    * the prefix filter produces 1.86 M, for the identical 191 k-pair
    * output.
    *
    * Construction, each step lossless:
    *
    *  1. CANONICALIZE: docs with identical distinct-token sets collapse
    *     to one representative (md5 over the sorted set, U+001F-joined
    *     — an unambiguous encoding, unlike bare concatenation). Jaccard
    *     depends only on the set, so members are interchangeable; all
    *     pairwise work runs on unique sets and results expand back at
    *     the end (within-set pairs are J = 1 ≥ t by construction).
    *     High-multiplicity boilerplate (the df² worst case) never
    *     reaches the join.
    *  2. PIGEONHOLE: a qualifying pair has symmetric difference
    *     |AΔB| = n1+n2-2c ≤ (n1+n2)(1-t)/(1+t). Split the TOKEN
    *     UNIVERSE into P > |AΔB| hash-parts: some part contains no
    *     differing token, i.e. A and B agree EXACTLY on that part's
    *     subset — so hashing each doc's P part-subsets and equi-joining
    *     on (part, subset-hash) finds every qualifying pair.
    *  3. SIZE-BAND: P must bound (n1+n2) from above, but a global max
    *     would explode P for everyone (and per-doc key cost is P). So
    *     docs band geometrically by set size (band k = sizes in
    *     [t^-k, t^-(k-1))); a qualifying pair's sizes are within factor
    *     t, hence in the same or adjacent bands, so each doc emits keys
    *     only for band-pairs (k-1, k) with P derived from the UPPER
    *     band's size bound. Per-doc keys ≈ 2·P(n) ∝ (1-t)·n — the same
    *     order as the AllPairs prefix index — while expected tokens per
    *     part stay constant at ~(1+t)/(2(1-t)).
    *
    * Shuffle profile at 100 TB: canonicalization is one (set-hash, id)
    * aggregation; candidate generation joins (band-pair, part, hash,
    * id, n) rows — fixed-width, never text; verify joins the two
    * sorted-set arrays onto CANDIDATES only (37 k rows here, ~output
    * cardinality) and intersects in-row; expansion joins are keyed by
    * set hash and output-bound. The four small intermediates (sets,
    * reps, candidates) persist at MEMORY_AND_DISK because each feeds
    * 2–4 consumers — without lineage reuse the set table would
    * recompute per consumer.
    */
  def partitionJaccardPairs(docs: DataFrame, threshold: Double,
                            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    import org.apache.spark.storage.StorageLevel
    val US = "\u001f"
    val sets = docs
      .select(col(idCol).as("d"), array_sort(array_distinct(tokens(col(textCol)))).as("ta"))
      .withColumn("s", md5(concat_ws(US, col("ta"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val members = sets.select(col("s"), col("d"))
    // first(ta) is deterministic here: every row in the group carries
    // the identical sorted array (that equality IS the group key)
    val reps = sets.groupBy(col("s"))
      .agg(min(col("d")).as("d"), first(col("ta")).as("ta"))
      .withColumn("n", size(col("ta")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val within = members.as("x").join(members.as("y"),
        col("x.s") === col("y.s") && col("x.d") < col("y.d"))
      .select(col("x.d").as("d1"), col("y.d").as("d2"), lit(1.0).as("jaccard"))
    if (threshold >= 1.0) {
      // J >= 1 is exactly "identical sets" — the band formula divides
      // by ln(1/t), so short-circuit to the canonicalization result
      // (both self-join sides read the persisted set table)
      return within
    }
    // band k = floor(ln n / ln(1/t) + eps); the 1e-9 slack makes
    // boundary sizes land deterministically (mirroring the prefix
    // filter's ceil slack), so a qualifying pair's bands differ by <= 1
    val band = floor(log(col("n").cast("double")) / math.log(1.0 / threshold)
      + lit(1e-9)).cast("int")
    // parts for band-pair bp (bands bp and bp+1): pair sizes are each
    // < t^-(bp+2), so |AΔB| ≤ 2·t^-(bp+2)·(1-t)/(1+t) < P. The +1e-9
    // guards the opposite rounding direction from the prefix filter's:
    // flooring an exactly-integral bound one too LOW would yield too
    // FEW parts and break the pigeonhole.
    def parts(bp: Column): Column =
      (floor(lit(2.0 * (1.0 - threshold) / (1.0 + threshold)) *
        pow(lit(1.0 / threshold), bp.cast("double") + 2.0) + lit(1e-9)) + 1).cast("int")
    val keyed = reps
      .select(col("d"), col("n"), col("ta"),
        explode(filter(array(band - 1, band), b => b >= 0)).as("bp"))
      .withColumn("pb", parts(col("bp")))
      .select(col("d"), col("n"), col("bp"), col("pb"),
        posexplode(transform(sequence(lit(0), col("pb") - 1),
          p => xxhash64(concat_ws(US, filter(col("ta"),
            tok => pmod(xxhash64(tok), col("pb").cast("long")) === p.cast("long")))))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "ph")
    // the size filter is the same lossless |B| >= t|A| bound as the
    // prefix path; same-band pairs match under two band-pairs and the
    // distinct collapses them
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.bp") === col("b.bp") && col("a.p") === col("b.p") &&
          col("a.ph") === col("b.ph") && col("a.d") < col("b.d") &&
          col("b.n") >= col("a.n") * lit(threshold) - lit(1e-9) &&
          col("a.n") >= col("b.n") * lit(threshold) - lit(1e-9))
      .select(col("a.d").as("d1"), col("b.d").as("d2"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val setPairs = cand
      .join(reps.select(col("d").as("d1"), col("s").as("s1"), col("ta").as("ta1")), "d1")
      .join(reps.select(col("d").as("d2"), col("s").as("s2"), col("ta").as("ta2")), "d2")
      .withColumn("c", size(array_intersect(col("ta1"), col("ta2"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("ta1")) + size(col("ta2")) - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("s1"), col("s2"), col("jaccard"))
    val cross = setPairs
      .join(members.select(col("s").as("s1"), col("d").as("da")), "s1")
      .join(members.select(col("s").as("s2"), col("d").as("db")), "s2")
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"), col("jaccard"))
    cross.union(within)
  }

  /** Corpus-level exact dedup DECISION: the deduplicated corpus itself
    * (keep the min-id representative of every content-hash group) — the
    * operation a training-data pipeline actually runs, where [[exact]]
    * is its reporting side.
    *
    * Shuffle profile: [[exact]] aggregates (hash → min id) — only
    * hashes and ids cross that exchange — and the keep-list semi-joins
    * back against the corpus (broadcastable when the survivor count
    * allows; never a full-text shuffle through a window partitioned by
    * hash, which is what a row_number formulation would do).
    */
  def dedupExactCorpus(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    docs.join(exact(docs, textCol, idCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Paragraph-level dedup (the Falcon/RefinedWeb policy applied at
    * sub-document granularity): split every document into aligned
    * `p`-token paragraphs, keep only the FIRST occurrence (corpus order
    * = lowest (doc_id, paragraph index)) of every distinct paragraph,
    * and reassemble each document from its surviving paragraphs in
    * original order. Documents whose every paragraph was seen earlier
    * vanish from the output — exactly the boilerplate-removal semantics
    * training pipelines want (headers/footers/license blocks collapse
    * to their first occurrence).
    *
    * Scale design: the global keep-first decision is a window over the
    * paragraph's 128-bit md5 — ONLY (hash, doc_id, pidx) cross that
    * exchange, never text. Survivor (doc_id, pidx) pairs then semi-join
    * the re-derived paragraph relation (narrow recompute beats shipping
    * text through the wide stage), and reassembly is one groupBy on
    * doc_id — the single unavoidable text shuffle.
    */
  def paragraphDedup(docs: DataFrame, p: Int = 16,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(p > 0, "paragraph size must be positive")
    val tt = tokens(col(textCol))
    val paras = docs.select(col(idCol).as("__d"),
      posexplode(transform(sequence(lit(0),
          ceil(size(tt).cast("double") / p).cast("int") - 1),
        i => concat_ws(" ", slice(tt, i * p + 1, lit(p))))).as(Seq("pidx", "ptext")))
    val slim = paras.select(md5(col("ptext")).as("h"), col("__d"), col("pidx"))
    val keepW = Window.partitionBy(col("h")).orderBy(col("__d"), col("pidx"))
    val keep = slim.withColumn("__rk", row_number().over(keepW))
      .filter(col("__rk") === 1).select(col("__d"), col("pidx"))
    val kept = paras.join(keep, Seq("__d", "pidx"), "left_semi")
    kept.groupBy(col("__d").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_kept_paras"),
        array_join(transform(array_sort(collect_list(struct(col("pidx"), col("ptext")))),
          s => s.getField("ptext")), " ").as("dedup_text"))
  }

  /** Cross-document boilerplate-line removal (the C4/CCNet terminal-
    * lines filter of Raffel et al. 2020 / Wenzek et al. 2020): a LINE
    * that occurs in >= minDf distinct documents is template chrome
    * (nav bars, cookie banners, footers), not content — strip it from
    * every document and reassemble the survivors in original order.
    * Complements [[paragraphDedup]] (keep-FIRST within-corpus) by
    * deleting high-frequency lines EVERYWHERE.
    *
    * Scale: lines collapse to (md5, doc, idx) before anything wide; the
    * df count is a combinable aggregate over 16-byte hashes; the keep
    * decision joins back on the hash (ids only), and full line text is
    * shuffled once, at reassembly. minDf caps nothing silently — the
    * removed-count column reports per-doc losses.
    */
  def removeBoilerplateLines(docs: DataFrame, minDf: Long,
                             textCol: String = "text",
                             idCol: String = "doc_id"): DataFrame = {
    val lines = docs.select(col(idCol).as("__d"),
      posexplode(split(col(textCol), "\n")).as(Seq("lidx", "line")))
      .withColumn("h", md5(col("line")))
    val df = lines.groupBy("h")
      .agg(countDistinct(col("__d")).as("line_df"))
    val marked = lines.join(df, "h")
    val kept = marked.filter(col("line_df") < minDf)
    kept.groupBy(col("__d").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_kept_lines"),
        array_join(transform(array_sort(collect_list(struct(col("lidx"), col("line")))),
          s => s.getField("line")), "\n").as("clean_text"))
      .join(
        marked.filter(col("line_df") >= minDf)
          .groupBy(col("__d").as(idCol))
          .agg(count(lit(1)).cast("long").as("n_removed_lines")),
        Seq(idCol), "left")
      .na.fill(0L, Seq("n_removed_lines"))
  }

  /** Quality-aware canonical selection: given cluster assignments
    * (v, cluster) from [[connectedComponents]] and a per-doc score
    * table, mark as each cluster's canonical the HIGHEST-scoring member
    * (ties to the lower id) — what a production dedup keeps, rather
    * than the arbitrary min-id representative. One window over the
    * cluster key; nothing but (id, cluster, double) ever shuffles.
    */
  def qualityCanonical(cc: DataFrame, scores: DataFrame,
                       idCol: String = "doc_id",
                       scoreCol: String = "quality_score"): DataFrame = {
    val joined = cc.join(
      scores.select(col(idCol).as("v"), col(scoreCol).as("__q")), "v")
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("__q").desc, col("v").asc)
    joined.withColumn("is_canonical", row_number().over(w) === 1)
      .select(col("v").as(idCol), col("cluster"),
        col("__q").as(scoreCol), col("is_canonical"))
  }

  /** Greedy near-dup pruning: drop every doc that appears as the
    * LATER member (d2) of a pair from any pair generator (LSH, simhash,
    * cosine). Not transitive closure — the standard one-pass greedy
    * policy: a kept doc may itself shadow further docs.
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame,
                         idCol: String = "doc_id"): DataFrame =
    docs.join(pairs.select(col("d2").as(idCol)).distinct(), Seq(idCol), "left_anti")

  // ---------------- MinHash + LSH ----------------

  /** 31-bit Mersenne prime for the universal-hash family
    * h_j(x) = (a_j·(x mod p) + b_j) mod p — operands stay < 2^62, so no
    * long overflow under ANSI arithmetic. The family lives in
    * [[graft.functions.MinHashSigs]] (single source of truth shared
    * with the native expression).
    */
  private val P = graft.functions.MinHashSigs.P

  /** doc -> (id, shingles): k-word shingle strings. Documents shorter
    * than k tokens degrade to a single whole-text shingle.
    */
  def shingleCol(textCol: Column, k: Int): Column = {
    // `slice(t, …)` inside the lambda would re-run the split per
    // shingle (interpreted HOFs re-evaluate lambda-body subtrees every
    // element — O(n²·|text|) per row). Binding the token array as a
    // lambda variable via a single-element array evaluates it once.
    val t = tokens(textCol)
    flatten(transform(array(t), tt =>
      when(size(tt) < k, array(concat_ws(" ", tt)))
        .otherwise(transform(
          sequence(lit(0), size(tt) - k),
          i => concat_ws(" ", slice(tt, i + 1, lit(k)))))))
  }

  /** Default shingle hash: xxhash64 reduced into the universal-hash
    * family's domain [0, P). Fast (codegen'd native) but not
    * reproducible outside the JVM — the portable variants swap in
    * [[md5Hash60]].
    */
  def xxShingleHash(c: Column): Column = pmod(xxhash64(c), lit(P))

  /** Portable 60-bit hash: the first 15 hex chars of md5, parsed as a
    * long. ~16× slower than xxhash64 but reproducible by ANY engine
    * with md5 — the DuckDB oracle re-derives it digit by digit, which
    * is what lets the `*Portable` signature operators carry a full
    * value check at the gate while the xxhash64 natives stay the
    * production fast path.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** [[md5Hash60]] reduced into the permutation family's domain. */
  def md5ShingleHash(c: Column): Column = pmod(md5Hash60(c), lit(P))

  /** Distinct (doc, shingle-hash) pairs — the exploded inverted-index
    * form shared by signature building and candidate verification.
    */
  def shingleHashes(docs: DataFrame, shingleK: Int,
                    textCol: String, idCol: String,
                    hashFn: Column => Column = xxShingleHash): DataFrame =
    docs.select(col(idCol).as("d"),
        explode(array_distinct(shingleCol(col(textCol), shingleK))).as("sh"))
      .select(col("d"), hashFn(col("sh")).as("h"))

  /** MinHash signatures: one row per doc with `sig: array<bigint>` of
    * length numHashes.
    *
    * Implementation: fully NARROW — shingle hashes are built with the
    * codegen'd built-ins, then the native [[graft.functions.MinHashSigs]]
    * expression computes all numHashes slots in ONE fused loop. No
    * explode, no shuffle, no boxed per-slot lambdas: signing a 100 TB
    * corpus is a single codegen'd map pass.
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64, shingleK: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id",
                        seed: Long = 42L,
                        hashFn: Column => Column = xxShingleHash): DataFrame = {
    val hashes = transform(array_distinct(shingleCol(col(textCol), shingleK)),
      x => hashFn(x))
    if (graft.GraftExtensions.available("minhash_sigs"))
      docs.select(col(idCol).as("d"),
        call_function("minhash_sigs", hashes, lit(numHashes), lit(seed)).as("sig"))
    else {
      // built-ins fallback: same permutation family, same values — 64
      // boxed traversals instead of one fused loop
      val (a, b) = graft.functions.MinHashSigs.perms(numHashes, seed)
      val sigCols = (0 until numHashes).map { j =>
        array_min(transform(col("hs"), h => pmod(lit(a(j)) * h + lit(b(j)), lit(P))))
      }
      docs.select(col(idCol).as("d"), hashes.as("hs"))
        .select(col("d"), array(sigCols: _*).as("sig"))
    }
  }

  /** MinHash+LSH near-duplicate pairs: band the signature (bands ×
    * rowsPerBand = numHashes), bucket-join docs sharing any band value,
    * then verify candidates with exact Jaccard. Output: (d1, d2,
    * jaccard) with jaccard >= threshold.
    *
    * Shuffle profile at scale: the band self-join carries ONLY
    * (id, band, bandHash) — never shingle sets or text. Candidate
    * verification re-joins the candidate ids against the exploded
    * (doc, shingle-hash) relation twice: common-shingle counts come
    * from an equi-join on (d2, h), so the shuffle is O(candidate
    * shingles), rows of (id, id, long) — the plan that survives 100 TB,
    * where shipping per-doc token sets through a join would not. AQE
    * splits hot buckets (boilerplate docs) via skew-join handling.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.7,
                      numHashes: Int = 64, bands: Int = 16,
                      shingleK: Int = 3,
                      textCol: String = "text", idCol: String = "doc_id",
                      hashFn: Column => Column = xxShingleHash,
                      bandHashFn: Column => Column = c => xxhash64(c)): DataFrame = {
    val sigs = minhashSignatures(docs, numHashes, shingleK, textCol, idCol,
      hashFn = hashFn)
    val banded = bandsOfSignatures(sigs, numHashes, bands, bandHashFn)
    // candidates are SMALL (near-dup pairs, not the corpus) and are
    // consumed by three downstream branches — cache once instead of
    // re-running the band join per branch. DISK_ONLY persist, not
    // localCheckpoint: it keeps lineage, so an executor loss recomputes
    // the lost blocks instead of failing the job, and it is lazy, so no
    // eager extra pass is paid up front.
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.d") < col("b.d"))
      .select(col("a.d").as("d1"), col("b.d").as("d2"))
      .dropDuplicates("d1", "d2")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // verification only ever touches CANDIDATE docs: semi-join the
    // corpus down before exploding shingles — at scale the candidate
    // set is a sliver of the corpus. Also materialized: three consumers
    // (sizes + both sides of the common-shingle join).
    val candDocs = cand.select(col("d1").as("cd")).union(cand.select(col("d2").as("cd"))).distinct()
    val docsC = docs.join(candDocs, col(idCol) === col("cd"), "left_semi")
    val sh = shingleHashes(docsC, shingleK, textCol, idCol, hashFn)
      .dropDuplicates("d", "h")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val sizes = sh.groupBy(col("d")).agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.toDF("d1", "h"), "d1")            // one row per shingle of d1
      .join(sh.toDF("d2", "h"), Seq("d2", "h"))  // keep shingles also in d2
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    common
      .join(sizes.toDF("d1", "n1"), "d1")
      .join(sizes.toDF("d2", "n2"), "d2")
      .withColumn("jaccard",
        col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Derive the banded (d, band, bh) relation from a signature table
    * (one row per doc with `sig: array<bigint>`) — a narrow in-row map,
    * so the PERSISTED form stays one row per doc and banding costs
    * nothing to re-derive at read time.
    */
  def bandsOfSignatures(sigs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                        bandHashFn: Column => Column = c => xxhash64(c)): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rpb = numHashes / bands
    sigs.select(col("d"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => bandHashFn(concat_ws(",", slice(col("sig"), b * rpb + 1, lit(rpb)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
  }

  /** Incremental NEAR-dup pairs of a delta against a PERSISTED base
    * signature table — the dd8 incremental pattern lifted from exact
    * hashes to MinHash: the base corpus is never rescanned and never
    * re-signed; only its (doc, sig) snapshot (64 longs/doc, ~3 orders
    * smaller than text) participates.
    *
    * `baseSigs` is the signature table (d, sig) — typically
    * [[graft.ingest.VersionedDir.current]] of a store that
    * [[graft.ingest.VersionedDir.publish]] wrote at base-corpus build
    * time. The delta is signed HERE (one narrow codegen pass over delta
    * text only), band-joined against the base bands (ids-only shuffle),
    * and candidates are verified by SIGNATURE AGREEMENT — the fraction
    * of equal signature slots, the standard unbiased Jaccard estimator,
    * computed in-row from the two sig arrays (exact integer compares,
    * so any engine reproduces it bit for bit). Base text is not
    * available by design, so verification is estimator-based — at the
    * default 64 hashes the estimator's σ ≈ 0.06, and the J≥0.9 dup
    * density this targets sits far above any sane `estThreshold`.
    *
    * Output: (d1 = delta id, d2 = base id, est).
    */
  def incrementalNearDupPairs(delta: DataFrame, baseSigs: DataFrame,
                              estThreshold: Double = 0.5,
                              numHashes: Int = 64, bands: Int = 16,
                              shingleK: Int = 3,
                              textCol: String = "text", idCol: String = "doc_id",
                              hashFn: Column => Column = xxShingleHash,
                              bandHashFn: Column => Column = c => xxhash64(c)): DataFrame = {
    val dsig = minhashSignatures(delta, numHashes, shingleK, textCol, idCol,
      hashFn = hashFn)
    sigAgreementPairs(dsig, baseSigs, estThreshold, numHashes, bands, bandHashFn)
  }

  /** Near-dup pairs BETWEEN two signature tables (each `(d, sig)` with
    * `sig: array<bigint>` of length numHashes), verified by signature
    * AGREEMENT — the fraction of equal slots, the standard unbiased
    * Jaccard estimator — computed in-row from the two arrays (exact
    * integer compares, reproducible by any engine). Candidates come
    * from the banded equi-join (ids only cross the exchange); rows
    * with `d1 == d2` are excluded so a table joined against a store
    * that already contains it (a replayed epoch) never reports
    * self-pairs. `ordered = true` restricts to `d1 < d2` — the
    * SELF-join form for intra-batch pairs.
    */
  def sigAgreementPairs(sigA: DataFrame, sigB: DataFrame,
                        estThreshold: Double = 0.5,
                        numHashes: Int = 64, bands: Int = 16,
                        bandHashFn: Column => Column = c => xxhash64(c),
                        ordered: Boolean = false): DataFrame = {
    val idCond = if (ordered) col("a.d") < col("b.d") else col("a.d") =!= col("b.d")
    val cand = bandsOfSignatures(sigA, numHashes, bands, bandHashFn).as("a")
      .join(bandsOfSignatures(sigB, numHashes, bands, bandHashFn).as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && idCond)
      .select(col("a.d").as("d1"), col("b.d").as("d2"))
      .dropDuplicates("d1", "d2")
    cand
      .join(sigA.select(col("d").as("d1"), col("sig").as("s1")), "d1")
      .join(sigB.select(col("d").as("d2"), col("sig").as("s2")), "d2")
      .withColumn("est",
        aggregate(zip_with(col("s1"), col("s2"),
            (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes.toDouble))
      .filter(col("est") >= estThreshold)
      .select(col("d1"), col("d2"), col("est"))
  }

  /** The incremental dedup DECISION: delta docs that are near-dups of
    * nothing in the persisted base signature table.
    */
  def dedupDeltaAgainstSignatures(delta: DataFrame, baseSigs: DataFrame,
                                  estThreshold: Double = 0.5,
                                  numHashes: Int = 64, bands: Int = 16,
                                  shingleK: Int = 3,
                                  textCol: String = "text", idCol: String = "doc_id",
                                  hashFn: Column => Column = xxShingleHash,
                                  bandHashFn: Column => Column = c => xxhash64(c)): DataFrame = {
    val hits = incrementalNearDupPairs(delta, baseSigs, estThreshold,
      numHashes, bands, shingleK, textCol, idCol, hashFn, bandHashFn)
    delta.join(hits.select(col("d1").as(idCol)).distinct(), Seq(idCol), "left_anti")
  }

  /** [[minhashLshPairs]] with every hash md5-derived ([[md5Hash60]] for
    * shingles, md5 hex for band buckets) — identical LSH construction,
    * fully reproducible by the DuckDB oracle, so this variant carries a
    * rows+schema+hash check at the gate where the xxhash64 native is
    * rows-only. Same shuffle profile; ~16× more hash arithmetic in the
    * signature map pass, which is why it is the GATE variant rather
    * than the default.
    */
  def minhashLshPairsPortable(docs: DataFrame, threshold: Double = 0.7,
                              numHashes: Int = 64, bands: Int = 16,
                              shingleK: Int = 3,
                              textCol: String = "text",
                              idCol: String = "doc_id"): DataFrame =
    minhashLshPairs(docs, threshold, numHashes, bands, shingleK, textCol, idCol,
      hashFn = md5ShingleHash, bandHashFn = md5)

  /** b-bit MinHash evaluation (Li & König, WWW'10, b = 1): keep only
    * the LOWEST BIT of each of the 64 MinHash slots — a 64× signature-
    * storage cut (one long per doc instead of 64) — and measure what
    * that costs against both the full-signature estimator and exact
    * Jaccard on the LSH candidate pairs. The b=1 estimator is the
    * paper's sparse-regime form `J̃ = 2·collisionRate − 1` (for our
    * 2⁶⁰ hash space the density terms r₁, r₂ are ~0, which is the
    * regime the simplification needs).
    *
    * At 100 TB the storage term dominates near-dup infra: the
    * signature store ([[SigStore]]) holds one row per corpus doc
    * forever, so 512 B → 8 B per doc is the difference between a
    * broadcastable signature table and a shuffled one. This operator
    * is the measurement that justifies (or rejects) the switch at a
    * given threshold.
    *
    * Determinism: every column is an exact integer — slot agreements
    * and low-bit collisions are in-row zip folds over the portable
    * md5 signatures; estimates and errors are integer micro divisions.
    *
    * Scale: signatures are one narrow codegen pass; candidates come
    * from the banded join (ids only); the eval join ships two 64-long
    * arrays per CANDIDATE pair, not per corpus row.
    */
  def bbitMinhashEval(docs: DataFrame, threshold: Double = 0.3,
                      numHashes: Int = 64, bands: Int = 16,
                      shingleK: Int = 3,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val pairs = minhashLshPairsPortable(docs, threshold, numHashes, bands,
      shingleK, textCol, idCol)
    val sigs = minhashSignatures(docs, numHashes, shingleK, textCol, idCol,
      hashFn = md5ShingleHash)
    pairs
      .join(sigs.select(col("d").as("d1"), col("sig").as("s1")), "d1")
      .join(sigs.select(col("d").as("d2"), col("sig").as("s2")), "d2")
      .withColumn("jaccard_micro",
        floor(col("jaccard") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("slot_matches", expr(
        "aggregate(zip_with(s1, s2, (x, y) -> IF(x = y, 1L, 0L)), 0L, (acc, v) -> acc + v)"))
      .withColumn("bit_collisions", expr(
        "aggregate(zip_with(s1, s2, (x, y) -> IF(x % 2L = y % 2L, 1L, 0L)), 0L, (acc, v) -> acc + v)"))
      .withColumn("full_est_micro",
        expr(s"(slot_matches * 1000000L) div ${numHashes}L"))
      .withColumn("bbit_est_micro",
        expr(s"(bit_collisions * 2000000L) div ${numHashes}L - 1000000L"))
      .select(col("d1"), col("d2"), col("jaccard_micro"),
        col("slot_matches"), col("bit_collisions"),
        col("full_est_micro"), col("bbit_est_micro"),
        abs(col("full_est_micro") - col("jaccard_micro")).as("err_full_micro"),
        abs(col("bbit_est_micro") - col("jaccard_micro")).as("err_bbit_micro"))
  }

  /** Content-defined chunking (Rabin-fingerprint cut rule à la LBFS,
    * Muthitacharoen et al. SOSP'01, on tokens): the stream is cut
    * after any position whose trailing `window`-token context hashes
    * to 0 mod `divisor` — so chunk boundaries move WITH content, and
    * an insertion reshuffles only its own chunk instead of every
    * fixed-width block downstream. Output per doc: chunk count, chunks
    * shared with ANOTHER doc (the storage-dedup hit set), mean chunk
    * length — dd9's span dedup lifted to variable-width chunks, the
    * storage-layer view of corpus redundancy.
    *
    * Scale: boundaries, chunk hashes and lengths are all in-row
    * higher-order expressions (per doc O(tokens·window)); the only
    * shuffles carry (hash, id) pairs — the dd9 discipline. Expected
    * chunk length = divisor tokens.
    */
  def contentChunks(docs: DataFrame, window: Int = 4, divisor: Int = 16,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol).as("__d"),
        split(lower(col(textCol)), " ").as("__toks"))
      .filter(size(col("__toks")) > 0)
    val n = size(col("__toks"))
    def winStr(i: Column): Column = {
      val st = greatest(i + lit(2 - window), lit(1))
      array_join(slice(col("__toks"), st, i + lit(2) - st), " ")
    }
    val bpos = filter(sequence(lit(0), greatest(n - lit(2), lit(0))),
      i => i <= n - lit(2) &&
        pmod(md5Hash60(winStr(i)), lit(divisor.toLong)) === 0)
    val withB = base.withColumn("__bpos", bpos)
    val starts = concat(array(lit(0)), transform(col("__bpos"), b => b + 1))
    val ends = concat(col("__bpos"), array(n - lit(1)))
    val chunks = zip_with(starts, ends, (st, en) =>
      struct(md5(array_join(slice(col("__toks"), st + 1, en - st + 1), " ")).as("h"),
        (en - st + 1).cast("long").as("l")))
    val exploded = withB.select(col("__d"), explode(chunks).as("c"))
      .select(col("__d"), col("c.h").as("h"), col("c.l").as("l"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val multi = exploded.groupBy(col("h"))
      .agg(countDistinct(col("__d")).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("h"), lit(1).as("__shared"))
    val out = exploded.join(multi, Seq("h"), "left")
      .groupBy(col("__d"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("__shared").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("n_shared_chunks"),
        avg(col("l")).as("mean_chunk_len"))
      .select(col("__d").as(idCol), col("n_chunks"),
        col("n_shared_chunks"), col("mean_chunk_len"))
    // lazy DISK_ONLY persist on the chunk table only (the 546-557
    // discipline): the consumer's terminal action materializes it once
    // and both branches reuse it; the harness's per-query clearCache()
    // releases the entry. Eager localCheckpoint(true) here paid a full
    // extra computation on EVERY plan build (r10 verdict: cdc1 3.0×).
    out
  }

  /** LSH banding-quality evaluation — the audit you run on a SAMPLE
    * before committing a (numHashes, bands) scheme to the full corpus:
    * RAW band-collision candidates (pre-verification, the set whose
    * size drives the verify bill) scored against exact-Jaccard truth.
    * One summary row: truth/candidate pair counts, the confusion cells
    * and precision / recall / F1. Low precision → banding too loose
    * (verification cost explodes); recall < 1 → true near-dups leak
    * through (raise bands or hashes).
    *
    * Truth = shingle-Jaccard ≥ threshold over pairs sharing ≥ 1
    * shingle (pairs sharing none have J = 0 and cannot pass a positive
    * threshold). The truth join is O(shingle collisions) — affordable
    * on the audit sample, never run corpus-wide; the banded candidate
    * side is the production-scale path.
    */
  def lshEvalReport(docs: DataFrame, threshold: Double = 0.5,
                    numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id",
                    hashFn: Column => Column = md5ShingleHash,
                    bandHashFn: Column => Column = c => md5(c)): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val sigs = minhashSignatures(docs, numHashes, shingleK, textCol, idCol,
      hashFn = hashFn)
    val banded = bandsOfSignatures(sigs, numHashes, bands, bandHashFn)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.d") < col("b.d"))
      .select(col("a.d").as("d1"), col("b.d").as("d2"))
      .dropDuplicates("d1", "d2")
      .persist(StorageLevel.DISK_ONLY)
    val sh = shingleHashes(docs, shingleK, textCol, idCol, hashFn)
      .dropDuplicates("d", "h")
      .persist(StorageLevel.DISK_ONLY)
    val sizes = sh.groupBy(col("d")).agg(count(lit(1)).as("n"))
    val common = sh.toDF("d1", "h").join(sh.toDF("d2", "h"), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    val truth = common
      .join(sizes.toDF("d1", "n1"), "d1")
      .join(sizes.toDF("d2", "n2"), "d2")
      .filter(col("c").cast("double") /
        (col("n1") + col("n2") - col("c")).cast("double") >= threshold)
      .select(col("d1"), col("d2"))
      .persist(StorageLevel.DISK_ONLY)
    val nt = truth.agg(count(lit(1)).cast("long").as("n_truth"))
    val nc = cand.agg(count(lit(1)).cast("long").as("n_cand"))
    val tp = truth.join(cand, Seq("d1", "d2"), "left_semi")
      .agg(count(lit(1)).cast("long").as("tp"))
    val p = col("tp").cast("double") / col("n_cand").cast("double")
    val r = col("tp").cast("double") / col("n_truth").cast("double")
    val report = nt.crossJoin(nc).crossJoin(tp)
      .select(col("n_truth"), col("n_cand"), col("tp"),
        (col("n_cand") - col("tp")).as("fp"),
        (col("n_truth") - col("tp")).as("fn"),
        p.as("prec"), r.as("rec"),
        when(p + r === 0.0, lit(0.0))
          .otherwise(lit(2.0) * p * r / (p + r)).as("f1"))
    // lazy DISK_ONLY persists above; the consumer's terminal action
    // materializes each once and the harness's per-query clearCache()
    // releases them. Eager localCheckpoint(true) re-ran the whole
    // audit on every plan build (r10 verdict: dd16 6.3×).
    report
  }

  /** LSH banding PLANNER — [[lshEvalReport]] swept over candidate
    * (bands × rowsPerBand) configurations of the SAME signature table:
    * one row per config with its empirical candidate count, confusion
    * cells, precision/recall/F1 against the shared exact-Jaccard
    * truth, and the ANALYTIC S-curve collision probability at the
    * threshold (`1 − (1 − t^r)^b` — the number the textbook promises,
    * sitting next to what the corpus actually did). THE table that
    * decides a 100 TB dedup's (bands, rows) before anything expensive
    * runs: signatures are computed once, the truth join once, and only
    * the cheap band self-joins repeat per config.
    *
    * Determinism: counts exact; ratios integer micro divisions; the
    * S-curve probability is a plan-time DRIVER-computed literal (both
    * engines receive the same constant).
    *
    * Cost model (the 100 TB contract): the BAND sweep runs over the
    * FULL signature table — ids-only equi-joins, the production path.
    * The exact-Jaccard TRUTH leg is inherently an all-pairs-by-shingle
    * self-join (quadratic in hot-shingle frequency), so it is bounded
    * to a deterministic hash-ordered sample of `sampleDocs` documents
    * (ORDER BY md5(id) — replayable by any engine, the pqCodebooks
    * sampling discipline expressed in-plan). Precision/recall are
    * measured on the sampled sub-population: `tp`/`n_cand`/`fp` count
    * candidate pairs with BOTH endpoints in the sample; `n_cand_full`
    * reports each config's candidate volume over the whole corpus —
    * the cost column next to the sampled quality columns. With
    * sampleDocs >= |corpus| the audit is exact (the sf0.01 gate).
    */
  def lshPlanner(docs: DataFrame, threshold: Double = 0.5,
                 numHashes: Int = 64,
                 bandConfigs: Seq[Int] = Seq(32, 16, 8, 4),
                 shingleK: Int = 3,
                 textCol: String = "text", idCol: String = "doc_id",
                 sampleDocs: Int = 4096): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // sigs/sh/truth are lazy DISK_ONLY cache entries shared across the
    // per-config legs (the lshEvalReport/calibrationReport contract:
    // callers clearCache(); eager checkpointing re-ran the audit per
    // plan build — the r10 dd16 6.3× lesson)
    val sigs = minhashSignatures(docs, numHashes, shingleK, textCol, idCol,
        hashFn = md5ShingleHash)
      .persist(StorageLevel.DISK_ONLY)
    // hash-ordered deterministic doc sample: bounds the truth leg's
    // quadratic self-join; a TopK of (md5 hex, id) — never a shuffle
    // of the corpus
    val samp = docs
      .select(col(idCol).as("d"))
      .orderBy(md5(col("d").cast("string")), col("d"))
      .limit(sampleDocs)
      .persist(StorageLevel.DISK_ONLY)
    val sh = shingleHashes(docs, shingleK, textCol, idCol, md5ShingleHash)
      .dropDuplicates("d", "h")
      .join(samp, Seq("d"), "left_semi")
      .persist(StorageLevel.DISK_ONLY)
    val sizes = sh.groupBy(col("d")).agg(count(lit(1)).as("n"))
    val truth = sh.toDF("d1", "h").join(sh.toDF("d2", "h"), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
      .join(sizes.toDF("d1", "n1"), "d1")
      .join(sizes.toDF("d2", "n2"), "d2")
      .filter(col("c").cast("double") /
        (col("n1") + col("n2") - col("c")).cast("double") >= threshold)
      .select(col("d1"), col("d2"))
      .persist(StorageLevel.DISK_ONLY)
    val nt = truth.agg(count(lit(1)).cast("long").as("n_truth"))
    val legs = bandConfigs.map { bands =>
      val rows = numHashes / bands
      val banded = bandsOfSignatures(sigs, numHashes, bands, c => md5(c))
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.d") < col("b.d"))
        .select(col("a.d").as("d1"), col("b.d").as("d2"))
        .dropDuplicates("d1", "d2")
        .persist(StorageLevel.DISK_ONLY)
      val ncandFull = cand.agg(count(lit(1)).cast("long").as("n_cand_full"))
      // quality is scored on the sampled sub-population only: both
      // endpoints in the sample, matching the truth leg's universe
      val candS = cand
        .join(samp.toDF("d1"), Seq("d1"), "left_semi")
        .join(samp.toDF("d2"), Seq("d2"), "left_semi")
        .persist(StorageLevel.DISK_ONLY)
      val ncand = candS.agg(count(lit(1)).cast("long").as("n_cand"))
      val tp = truth.join(candS, Seq("d1", "d2"), "left_semi")
        .agg(count(lit(1)).cast("long").as("tp"))
      val sCurveNano = // driver literal: identical constant both engines
        math.floor((1.0 - math.pow(1.0 - math.pow(threshold, rows), bands))
          * 1e9 + 0.5).toLong
      nt.crossJoin(ncand).crossJoin(ncandFull).crossJoin(tp)
        .select(lit(bands.toLong).as("bands"), lit(rows.toLong).as("rows_per_band"),
          col("n_truth"), col("n_cand"), col("n_cand_full"), col("tp"),
          (col("n_cand") - col("tp")).as("fp"),
          (col("n_truth") - col("tp")).as("fn"),
          when(col("n_cand") > 0L,
            expr("(tp * 1000000L) div n_cand")).otherwise(lit(0L))
            .as("precision_micro"),
          when(col("n_truth") > 0L,
            expr("(tp * 1000000L) div n_truth")).otherwise(lit(0L))
            .as("recall_micro"),
          lit(sCurveNano).as("s_curve_nano"))
    }
    legs.reduce(_ unionByName _)
  }

  // ---------------- dedup clustering (connected components) ----------

  /** Connected components over a near-duplicate pair list: every vertex
    * is labeled with the minimum id reachable through pairs — turning
    * pairwise near-dup evidence (from ANY generator: minhash-LSH,
    * simhash, cosine) into dedup groups whose min-id member is the
    * canonical representative. `vertices` must have a single column `v`;
    * `pairs` columns `d1`/`d2`. Output: (v, cluster).
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", MLG'14) — the
    * edge set contracts toward a star forest whose centers are the
    * component minima. Unlike min-label propagation (whose round count
    * is the component DIAMETER), this converges in O(log n) rounds even
    * on adversarial chain-shaped graphs, so `maxIter = 25` covers any
    * component a 64-bit id space can hold.
    *
    * Per round: two self-join-shaped shuffles over (long, long) edges
    * plus map-side-combinable min-aggregations — vectors/text never
    * enter the loop. Convergence = the canonical (big, small) edge set
    * reaches a fixpoint, detected by an exact count + one-sided
    * exceptAll emptiness check (both over ids only). Each round's edge
    * set is persisted, the previous round's blocks released, and the
    * plan re-rooted on a LogicalRDD so the analyzer never walks an
    * exponentially-growing tree (see the lineage-cut note below).
    */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = vertices.sparkSession
    // Lineage cut, the load-bearing detail of every DataFrame-iterative
    // algorithm: round t's plan references round t-1 several times, so
    // chaining raw DataFrames multiplies the logical plan per round —
    // persist() caches execution but the ANALYZER still walks the
    // exponentially-growing tree (measured on the label-propagation
    // predecessor: 73 s for a 600-vertex graph before the cut, ~2 s
    // after). Re-wrapping each materialized round as a LogicalRDD over
    // its cached blocks keeps every round's plan O(1)-deep while the
    // RDD lineage stays intact for fault recovery.
    def shallow(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    // canonical working edges: (u, v) with u > v, deduplicated
    var cur = pairs
      .select(col("d1").cast("long").as("a"), col("d2").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var curCount = cur.count()
    var edges = shallow(cur)
    var converged = curCount == 0L
    var round = 0
    while (!converged && round < maxIter) {
      // large-star: every neighbor bigger than u attaches to
      // m(u) = min(N(u) ∪ {u}); output edges keep the big→small
      // orientation (emitted v > u >= m).
      val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = bidir.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: all of u's (strictly smaller) neighbors plus u
      // itself attach to the smallest of them.
      val m2 = large.groupBy("u").agg(min("v").as("m"))
      val next = large.join(m2, "u").filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
        .union(m2.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nextCount = next.count()
      // fixpoint: same cardinality and no edge outside the previous set
      // (exceptAll is exact on the (u, v) pairs — ids only, no hashing
      // shortcut that could false-positive)
      converged = nextCount == curCount &&
        shallow(next).exceptAll(edges).limit(1).count() == 0L
      cur.unpersist()
      cur = next
      edges = shallow(next)
      curCount = nextCount
      round += 1
    }
    if (!converged)
      // Returning a half-contracted graph as if final would silently
      // split components; fail loudly instead. With O(log n)
      // convergence this would require a component of > 2^25 vertices
      // AND pathological shape — not a configuration a dedup pair
      // generator can produce.
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    // star forest: every non-center vertex carries exactly one edge to
    // its component minimum (min() guards the impossible multi-edge
    // case rather than silently picking an arbitrary row)
    val roots = edges.groupBy("u").agg(min("v").as("cluster"))
      .withColumnRenamed("u", "v")
    vertices.select(col("v").cast("long").as("v"))
      .join(roots, Seq("v"), "left")
      .select(col("v"), coalesce(col("cluster"), col("v")).as("cluster"))
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash per doc: per-token xxhash64, each bit accumulates
    * +1/-1 per occurrence, sign of the sum sets the output bit.
    *
    * Fully NARROW: token hashes via codegen'd built-ins, then the
    * native [[graft.functions.SimHash64]] expression folds all 64 bit
    * counters in one loop — no explode, no shuffle, no per-bit
    * traversals (frequency weighting falls out of iterating raw
    * occurrences).
    */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
              tokenHash: Column => Column = c => xxhash64(c)): DataFrame = {
    val hashes = transform(tokens(col(textCol)), t => tokenHash(t))
    if (graft.GraftExtensions.available("simhash64"))
      docs.select(col(idCol).as("d"), call_function("simhash64", hashes).as("simhash"))
    else
      docs.select(col(idCol).as("d"), hashes.as("hs"))
        .select(col("d"), simhashPackedBuiltin(col("hs")).as("simhash"))
  }

  /** The built-ins-only SimHash fold over a token-hash array column —
    * the guarded fallback of [[simhash]], public so the dd4 gate query
    * can evaluate it NEXT TO the native expression and assert per-doc
    * equality in-plan: the compositional formulation (64 boxed bit
    * traversals) is slow but independently derived, so agreement
    * value-checks the fused native codegen against the definition.
    */
  def simhashPackedBuiltin(hs: Column): Column =
    (0 until 64).map { b =>
      val bitSum = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))

  /** Per-doc cross-check of the native [[graft.functions.SimHash64]]
    * expression against [[simhashPackedBuiltin]] on identical token
    * hashes: `(d, sh_native, sh_builtin)`. On sessions without the
    * extension the native column degrades to the builtin (trivially
    * equal — the guarded-fallback convention); with it, any codegen bug
    * in the fused expression surfaces as a row where the columns differ.
    */
  def simhashImplAgreement(docs: DataFrame, textCol: String = "text",
                           idCol: String = "doc_id",
                           tokenHash: Column => Column = c => xxhash64(c)): DataFrame = {
    val hashes = transform(tokens(col(textCol)), t => tokenHash(t))
    val builtin = simhashPackedBuiltin(col("hs"))
    val native =
      if (graft.GraftExtensions.available("simhash64"))
        call_function("simhash64", col("hs"))
      else builtin
    docs.select(col(idCol).as("d"), hashes.as("hs"))
      .select(col("d"), native.as("sh_native"), builtin.as("sh_builtin"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist (< 16):
    * pigeonhole over four 16-bit chunks — pairs within distance 3 must
    * agree on at least one chunk, so the join is bucketed, not n².
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id",
                   tokenHash: Column => Column = c => xxhash64(c)): DataFrame = {
    val sh = simhash(docs, textCol, idCol, tokenHash)
    // Chunk count is static (4 × 16-bit), so the array is built Scala-side
    // with the Int-typed shift overload — stays fully codegen'd.
    val chunks = array((0 until 4).map(c =>
      shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val chunked = sh.select(col("d"), col("simhash"), posexplode(chunks))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cv")
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.d") < col("b.d"))
      .select(col("a.d").as("d1"), col("b.d").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("d1", "d2")
      .filter(col("hamming") <= maxDist)
  }

  /** [[simhashPairs]] with [[md5Hash60]] token hashes — effectively a
    * 60-bit SimHash (the top 4 bits of every token hash are zero, so
    * the top 4 simhash bits are always clear, identically in both
    * engines), fully recomputable by the DuckDB oracle bit by bit.
    */
  def simhashPairsPortable(docs: DataFrame, maxDist: Int = 3,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame =
    simhashPairs(docs, maxDist, textCol, idCol, tokenHash = md5Hash60)

  /** Fuzzy decontamination — the near-duplicate contamination that
    * exact n-gram overlap ([[graft.ops.Curate]] decontaminate / dc1–
    * dc4) misses: an eval document lightly paraphrased or
    * whitespace-mangled into the train set shares few exact 8-grams
    * but sits within a few SimHash bits. Cross-corpus form of
    * [[simhashPairsPortable]]: both sides hash to the portable 60-bit
    * SimHash, pigeonhole over four 16-bit chunks (hamming ≤ 3 ⟹ at
    * least one agreeing chunk), and ONLY train×eval candidates join.
    * Emits each contaminated train doc with its match count and
    * closest hamming distance.
    *
    * Scale: the eval side is small by definition — its chunk table
    * broadcasts; the train side is one narrow signature pass + the
    * bucketed ids-only join. Never n².
    */
  def decontaminateFuzzy(train: DataFrame, evalSet: DataFrame,
                         maxDist: Int = 3, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    def chunked(sh: DataFrame) = {
      val chunks = array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)
      sh.select(col("d"), col("simhash"), posexplode(chunks))
        .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cv")
    }
    val t = chunked(simhash(train, textCol, idCol, tokenHash = md5Hash60))
    val e = chunked(simhash(evalSet, textCol, idCol, tokenHash = md5Hash60))
      .select(col("d").as("e"), col("simhash").as("esh"),
        col("chunk"), col("cv"))
    t.join(broadcast(e), Seq("chunk", "cv"))
      .select(col("d"), col("e"),
        bit_count(col("simhash").bitwiseXOR(col("esh"))).as("hamming"))
      .dropDuplicates("d", "e")
      .filter(col("hamming") <= maxDist)
      .groupBy(col("d").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_eval_matches"),
        min(col("hamming")).cast("long").as("min_hamming"))
  }

  /** Cross-document duplicated-span detection — the substring-level
    * exact dedup of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better" (arXiv:2107.06499), bounded to `k`-token
    * granularity: a span is duplicated when its `k`-token shingle hash
    * occurs in MORE THAN ONE document. Per doc: total spans, duplicated
    * spans, and the duplicated fraction (the signal that pipeline cuts
    * boilerplate/licenses/templates that whole-doc MinHash cannot see).
    *
    * Scale: shingles generate in-row and leave the row as md5 hashes —
    * the wide stages carry (hash, doc_id) pairs and the multi-doc hash
    * set, never text. The per-doc span total is computed NARROWLY —
    * `greatest(size(tokens)-k+1, 1)`, exactly the number of shingles
    * the explode emits — so the exploded stream is shuffled only for
    * the multi-doc mark, never re-aggregated just to count. Docs
    * shorter than `k` tokens contribute their single truncated
    * shingle, so every doc appears in the output.
    */
  def duplicatedSpans(docs: DataFrame, k: Int = 8,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "span length must be positive")
    val tt = tokens(col(textCol))
    val sh = docs.select(col(idCol).as("__d"),
      explode(transform(
        sequence(lit(0), greatest(size(tt) - k, lit(0))),
        i => md5(concat_ws(" ", slice(tt, i + 1, lit(k)))))).as("h"))
    val multi = sh.groupBy(col("h"))
      .agg(count_distinct(col("__d")).as("nd"))
      .filter(col("nd") > 1).select("h")
    val dup = sh.join(multi, Seq("h"))
      .groupBy(col("__d")).agg(count(lit(1)).cast("long").as("n_dup_spans"))
    docs.select(col(idCol).as("__d"),
        greatest(size(tt) - (k - 1), lit(1)).cast("long").as("n_spans"))
      .join(dup, Seq("__d"), "left")
      .select(col("__d").as(idCol), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        (coalesce(col("n_dup_spans"), lit(0L)).cast("double") /
          col("n_spans").cast("double")).as("dup_ratio"))
  }

  /** ExactSubstr-style repeated-substring profile (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" —
    * https://arxiv.org/abs/2107.06499 — whose suffix-array pass is the
    * canonical corpus-wide exact-substring dedup): for every position
    * in every document, whether its w-token window occurs ANYWHERE
    * else in the corpus, profiled at geometric window lengths — the
    * audit that tells you how much of each document is verbatim-
    * repeated material and at what span scale, before you commit to a
    * cut length.
    *
    * Algorithm — binary-lifted gram hashing, the suffix-array
    * prefix-doubling idea (Manber & Myers 1990) carried on md5 labels
    * instead of ranks: `h_1(i) = md5(tok_i)`, `h_{2w}(i) =
    * md5(h_w(i) || h_w(i+w))` via `lead(h_w, w)` inside the document,
    * so the label of a 32-token window is built in log₂ 32 = 5 window
    * passes instead of materializing 32-token strings. Two positions
    * share `h_w` iff their w-token windows are identical (md5 labels
    * are strings, so the oracle replays the doubling EXACTLY — no
    * cross-engine hash-collision asymmetry; within one engine a
    * collision is a 2⁻¹²⁸ event). Null `lead` past the doc tail
    * null-propagates through concat, so windows never span documents.
    *
    * vs [[duplicatedSpans]]: dd9 answers one fixed length by
    * materializing every k-token string; this profiles ALL the
    * geometric lengths from one lifted ladder and shuffles only
    * (hash, doc) pairs.
    *
    * Scale: ONE corpus shuffle (partition by doc) feeds every ladder
    * level — the lifts are same-window `lead`s, re-sort-free; each
    * reported length then costs one (hash, doc)-pair shuffle for the
    * corpus-wide multiplicity mark. At 100 TB, truncate the md5 labels
    * to 16 hex chars to halve those bytes — both engines truncate
    * identically, so the gate still matches.
    */
  def repeatProfile(docs: DataFrame, reportWs: Seq[Int] = Seq(8, 32),
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(reportWs.nonEmpty && reportWs.forall(w =>
      w > 0 && Integer.bitCount(w) == 1), "report lengths must be powers of 2")
    val w = Window.partitionBy(col("__d")).orderBy(col("__p"))
    val base = docs.select(col(idCol).as("__d"),
      posexplode(tokens(col(textCol))).as(Seq("__p", "__t")))
    val maxW = reportWs.max
    var lifted = base.withColumn("h1", md5(col("__t")))
    var lvl = 1
    while (lvl < maxW) {
      lifted = lifted.withColumn(s"h${lvl * 2}",
        md5(concat(col(s"h$lvl"), lead(col(s"h$lvl"), lvl).over(w))))
      lvl *= 2
    }
    val hs = lifted.select(col("__d") +: reportWs.map(rw => col(s"h$rw")): _*)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val repLegs = reportWs.map { rw =>
      val hw = Window.partitionBy(col(s"h$rw"))
      hs.filter(col(s"h$rw").isNotNull)
        .withColumn("__c", count(lit(1)).over(hw))
        .filter(col("__c") > 1)
        .groupBy(col("__d")).agg(count(lit(1)).cast("long").as(s"rep$rw"))
    }
    val lens = docs.select(col(idCol).as("__d"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    val joined = repLegs.foldLeft(lens)((acc, leg) => acc.join(leg, Seq("__d"), "left"))
    val w0 = reportWs.head
    val windows0 = greatest(col("n_tokens") - (w0 - 1), lit(0L))
    joined.select(
      col("__d").as(idCol) +: col("n_tokens") +:
        reportWs.map(rw => coalesce(col(s"rep$rw"), lit(0L)).as(s"rep$rw")) :+
        when(windows0 > 0, round(coalesce(col(s"rep$w0"), lit(0L)).cast("double")
          / windows0.cast("double"), 9)).as(s"frac$w0"): _*)
  }
}
