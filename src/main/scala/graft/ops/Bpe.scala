package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge learning (Sennrich, Haddow, Birch, ACL'16
  * — "Neural Machine Translation of Rare Words with Subword Units"):
  * the tokenizer-training loop of every modern LLM data pipeline.
  * Reference scope analog: the reference has no tokenizer stage; this
  * is part of the training-data operator family the brief asks for
  * beyond the reference's own surface.
  *
  * Construction: the corpus is first reduced to a WORD-FREQUENCY table
  * (the one corpus-sized shuffle — standard BPE practice: learn from
  * word counts, not raw text). Each word is held as a canonical symbol
  * string `" s1  s2  ...  sn "` — symbols joined by double spaces,
  * single-space padded — so that merging the winning pair (a, b) is a
  * single LITERAL string replace of `" a  b "` with `" ab "`:
  * left-to-right non-overlapping replace semantics (identical in the
  * JVM and DuckDB) are exactly BPE's greedy within-word merge order
  * ("aaa" under merge (a,a) → ("aa", "a")).
  *
  * Per round: (1) explode adjacent symbol pairs and sum word counts —
  * a (pair, long) shuffle over the VOCABULARY, not the corpus; (2)
  * take the argmax pair under the total order (count desc, pair asc) —
  * a 1-row collect, bounded by construction (the k-means-sample
  * discipline); (3) rewrite the word table with the literal replace —
  * narrow. The word table is persisted per round, re-rooted shallow,
  * and the previous round unpersisted (the pageRank lineage-cut
  * discipline); everything is unpersisted before returning, the
  * returned merge table being driver-side literals of size O(merges).
  *
  * 100 TB: the corpus pass is one explode+groupBy (map-side
  * combinable); every iteration after that touches only the word table
  * (≈ millions of rows at web scale, invariant of corpus size). This
  * is why real BPE trainers — and this operator — scale with
  * vocabulary, not tokens.
  */
object Bpe {

  /** Corpus → (word, cnt): the single corpus-sized aggregation. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** `"low"` → `" l  o  w "`: one symbol per character, double-space
    * joined, single-space padded.
    */
  private def seedSymbols(w: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(w, "(.)", "$1  ")), lit(" "))

  /** Learn `nMerges` BPE merges; returns one row per merge:
    * (step, p1, p2, pair_cnt), step 1-based in learned order.
    */
  def learnMerges(docs: DataFrame, nMerges: Int,
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def shallow(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)

    var words = wordCounts(docs, textCol)
      .select(seedSymbols(col("w")).as("s"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    words.count()
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to nMerges) {
      val withT = words.select(col("cnt"), split(trim(col("s")), "  ").as("t"))
      val best = withT.filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(t)-2), i -> struct(t[i] AS p1, t[i+1] AS p2))")).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("cnt")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("p1"), col("p2"))
        .limit(1)
        .collect() // 1 row by construction
      if (best.nonEmpty) {
        val (p1, p2, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, p1, p2, cnt))
        val next = words.select(
            replace(col("s"), lit(s" $p1  $p2 "), lit(s" $p1$p2 ")).as("s"),
            col("cnt"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        if (prev != null) prev.unpersist()
        prev = words
        words = shallow(next)
      }
    }
    if (prev != null) prev.unpersist()
    words.unpersist()
    merges.toSeq.toDF("step", "p1", "p2", "pair_cnt")
  }

  /** Apply a learned merge table to the corpus vocabulary: returns
    * (w, cnt, n_pieces, pieces_csv) — each word segmented by replaying
    * the merges in learned order. The application side of the trained
    * tokenizer: a chain of `nMerges` literal replaces, fully narrow
    * and codegen'd — zero shuffle beyond the word-count build.
    */
  def segmentVocab(docs: DataFrame, merges: Seq[(String, String)],
                   textCol: String = "text"): DataFrame = {
    val seeded = wordCounts(docs, textCol)
      .select(col("w"), col("cnt"), seedSymbols(col("w")).as("s"))
    val applied = merges.foldLeft(seeded) { case (df, (p1, p2)) =>
      df.withColumn("s", replace(col("s"), lit(s" $p1  $p2 "), lit(s" $p1$p2 ")))
    }
    applied.select(col("w"), col("cnt"),
      size(split(trim(col("s")), "  ")).as("n_pieces"),
      regexp_replace(trim(col("s")), "  ", ",").as("pieces_csv"))
  }

  /** Corpus-wide tokenization — the actual 100 TB job the learned
    * merges exist for: every document becomes its piece sequence
    * (reported as piece count + an md5 of the comma-joined sequence so
    * the full output stays hash-comparable without shipping giant
    * strings through the gate).
    *
    * Scale: the merge replay happens on the VOCABULARY (segmentVocab),
    * never per token occurrence; the corpus side is one posexplode →
    * join on the word (the vocab side is vocabulary-sized — AQE
    * broadcasts it when it fits) → one doc-keyed reassembly shuffle.
    * In-doc order is restored with `array_sort(struct(pos, …))`, the
    * engine-reproducible ordered-reassembly pattern (pd1's discipline)
    * — never bare `collect_list` order.
    */
  def tokenizeCorpus(docs: DataFrame, merges: Seq[(String, String)],
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val vocab = segmentVocab(docs, merges, textCol)
      .select(col("w"), col("n_pieces"), col("pieces_csv"))
    val toks = docs
      .select(col(idCol), posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    toks.join(vocab, "w")
      .groupBy(col(idCol))
      .agg(sum(col("n_pieces")).cast("long").as("n_pieces"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("pieces_csv")))),
            x => x.getField("pieces_csv")), ",")).as("pieces_md5"))
  }

  /** Unigram-LM tokenizer segmentation (Kudo, ACL'18 — the
    * SentencePiece unigram model's inference step): segment every
    * vocabulary word into the MINIMUM-COST piece sequence under
    * count-seeded piece costs `cost(p) = −ln(freq(p)/total)`. This is
    * the count-seeded Viterbi that initializes SentencePiece's EM —
    * each EM round re-runs exactly this op on re-estimated counts —
    * and the second real tokenization algorithm beside [[learnMerges]]
    * (BPE greedily MERGES bottom-up; unigram globally OPTIMIZES the
    * segmentation top-down).
    *
    * Vocabulary: the top `vocabSize` substrings (length ≤ maxPieceLen)
    * of corpus words by occurrence-weighted frequency, under the total
    * order (count desc, piece asc), UNION all single characters so
    * every word stays coverable.
    *
    * Determinism: piece costs are MICRO-quantized (`floor(−ln(f/T)·1e6
    * + 0.5)` — one ln per vocab piece of an exact-integer ratio, the
    * js1 quantization discipline); the Viterbi objective is the exact
    * integer `units = cost_micro·1024 + 1`, so a single long min
    * encodes the (total cost, then piece count) lexicographic
    * tie-break with no float in any decision. DP is a per-word ARRAY
    * FOLD — `maxWordLen` chained projections, each building dp' from
    * dp in one `transform` (the zo2 named-column discipline: no joins
    * in the loop, no plan-tree duplication) — with word-piece matches
    * packed into BIGINTs (`st·2⁵² + en·2⁴⁶ + units`) so both engines
    * run identical integer arithmetic.
    *
    * Scale: the corpus pass is [[wordCounts]]; candidate generation,
    * pricing, and the DP all live on the VOCABULARY (zipf-bounded).
    * Words longer than `maxWordLen` chars are excluded from the
    * report (at production scale they fall through to byte/char
    * fallback pieces, the SentencePiece behavior). `units` headroom:
    * cost_micro < 2^36 and ≤ maxWordLen pieces per word keep every dp
    * value < 2^46, far inside a long.
    */
  def unigramSegment(docs: DataFrame, vocabSize: Int = 256,
                     maxPieceLen: Int = 4, maxWordLen: Int = 16,
                     textCol: String = "text"): DataFrame =
    unigramDp(docs, vocabSize, maxPieceLen, maxWordLen, textCol)
      .select(col("w"), col("cnt"), col("len").cast("long").as("n_chars"),
        element_at(col("dp"), col("len") + 1).as("units"))
      .withColumn("cost_micro", expr("units div 1024L"))
      .withColumn("n_pieces", expr("units % 1024L"))
      .drop("units")

  /** Shared unigram scaffolding: (w, cnt, len) vocabulary words.
    *
    * Cache contract (here and in the other unigram helpers): the
    * persisted intermediates are LAZY, VOCABULARY-BOUNDED cache
    * entries shared by the v0/v1 legs of one returned plan — a fixed
    * handful per call, not the per-iteration loop growth that
    * [[Graph.pageRank]]'s eager unpersist discipline exists for.
    * Eager materialize-then-unpersist inside the op re-runs the whole
    * computation on every plan BUILD (the r10 cal1 lesson: 4.5×), and
    * unpersisting a lazy handle before return silently disables the
    * shared-leg reuse. Callers owning a long-lived session release
    * them with `spark.catalog.clearCache()` (the bench/verify
    * harnesses do so per query).
    */
  private def unigramWords(docs: DataFrame, maxWordLen: Int,
                           textCol: String): DataFrame =
    wordCounts(docs, textCol)
      .filter(length(col("w")) <= maxWordLen)
      .select(col("w"), col("cnt").cast("long").as("cnt"),
        length(col("w")).cast("int").as("len"))
      .persist()

  /** Count-seeded vocabulary with pcnt — top-N substrings ∪ singles. */
  private def unigramVocab(words: DataFrame, vocabSize: Int,
                           maxPieceLen: Int): DataFrame = {
    val subs = words
      .select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, len), i ->
           |  transform(sequence(1, least($maxPieceLen, len - i + 1)), l ->
           |    substring(w, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("cnt").cast("long").as("pcnt"))
      .persist()
    subs.orderBy(col("pcnt").desc, col("piece").asc)
      .limit(vocabSize)
      .unionByName(subs.filter(length(col("piece")) === 1))
      .dropDuplicates("piece")
  }

  /** (piece, pcnt) → (piece, punits): micro-quantized −ln(f/T) cost,
    * packed with the +1 piece-count tiebreak digit.
    */
  private def unigramPrice(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum("pcnt").cast("long").as("tot"))
    vocab.crossJoin(broadcast(tot))
      .withColumn("cost_micro",
        floor(-log(col("pcnt").cast("double") / col("tot").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("punits", col("cost_micro") * lit(1024L) + lit(1L))
      .select("piece", "punits")
  }

  /** Per-word packed match list under the given prices + the Viterbi
    * dp array after `maxWordLen` chained projection rounds. Output:
    * (w, cnt, len, marr, dp).
    */
  private def unigramDpFor(words: DataFrame, priced: DataFrame,
                           maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val matches = words
      .select(col("w"), explode(expr(
        s"""flatten(transform(sequence(1, len), i ->
           |  transform(sequence(1, least($maxPieceLen, len - i + 1)), l ->
           |    struct(i - 1 AS st, i + l - 1 AS en, substring(w, i, l) AS piece))))"""
          .stripMargin)).as("m"))
      .select(col("w"), col("m.st").as("st"), col("m.en").as("en"),
        col("m.piece").as("piece"))
      .join(broadcast(priced), "piece")
      .groupBy("w").agg(sort_array(collect_list(
        col("st").cast("long") * lit(4503599627370496L) +
          col("en").cast("long") * lit(70368744177664L) + col("punits")))
        .as("marr"))
    // Viterbi as maxWordLen chained array projections: dp[pos] = min
    // units to tile w[0, pos); dp'[en] folds the matches ending at en
    var dp = words.join(matches, "w")
      .withColumn("dp", expr(
        "transform(sequence(0, len), p -> CASE WHEN p = 0 THEN 0L ELSE 1000000000000000L END)"))
    for (_ <- 1 to maxWordLen) {
      dp = dp.withColumn("dp", expr(
        """transform(sequence(0, len), en -> CASE WHEN en = 0 THEN 0L ELSE
          |  aggregate(
          |    filter(marr, mm -> ((mm div 70368744177664L) % 64L) = en),
          |    element_at(dp, en + 1),
          |    (acc, mm) -> least(acc,
          |      element_at(dp, CAST(mm div 4503599627370496L AS INT) + 1)
          |        + (mm % 70368744177664L)))
          |END)""".stripMargin))
    }
    dp
  }

  private def unigramDp(docs: DataFrame, vocabSize: Int, maxPieceLen: Int,
                        maxWordLen: Int, textCol: String): DataFrame = {
    val words = unigramWords(docs, maxWordLen, textCol)
    val priced = unigramPrice(unigramVocab(words, vocabSize, maxPieceLen))
    unigramDpFor(words, priced, maxPieceLen, maxWordLen)
  }

  /** One HARD-EM round of the unigram trainer (Kudo, ACL'18 §3; hard
    * E-step = Viterbi, the SentencePiece initialization loop):
    *
    *  1. segment every word under count-seeded prices (v0 =
    *     [[unigramSegment]]'s DP);
    *  2. BACKTRACE the argmin tiling — per step, the predecessor is
    *     any match ending at `pos` with `dp[st] + units = dp[pos]`,
    *     tie-broken by MIN packed match (= smallest start, then
    *     cheapest piece — total order, both engines identical);
    *  3. E-step: piece usage = Σ word-count over chosen tiles;
    *  4. M-step: re-price the SAME vocabulary with add-1-smoothed
    *     usage (`−ln((use+1)/(Σuse+V))` — smoothing keeps unused
    *     pieces finitely priced so coverage never breaks);
    *  5. re-segment under the new prices.
    *
    * Output per word: v0 vs v1 cost/piece-count, so the corpus-level
    * `Σ cnt·Δcost` EM improvement is auditable in-plan. Further EM
    * rounds = re-invoking with the v1 prices (the iterate-this-op
    * contract; SentencePiece's vocabulary PRUNING step is the
    * complement, not implemented here).
    *
    * Determinism/scale: everything lives on the vocabulary tables; the
    * backtrace is ONE projection (an aggregate fold of ≤ maxWordLen
    * steps whose per-step argmin is an integer `array_min`); the
    * second DP reuses the same chained-projection machinery.
    */
  /** Shared hard-EM prefix: (words, vocab, dp0, usage) — the v0 DP,
    * its backtrace, and the word-count-weighted piece usage.
    */
  private def unigramEmPrefix(docs: DataFrame, vocabSize: Int,
                              maxPieceLen: Int, maxWordLen: Int,
                              textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val words = unigramWords(docs, maxWordLen, textCol)
    val vocab = unigramVocab(words, vocabSize, maxPieceLen).persist()
    val priced0 = unigramPrice(vocab)
    val dp0 = unigramDpFor(words, priced0, maxPieceLen, maxWordLen)
      .persist()
    // backtrace: chosen(pos) = min packed match proving dp[pos]
    val chosen =
      """array_min(filter(marr, mm ->
        |  ((mm div 70368744177664L) % 64L) = acc.pos AND
        |  element_at(dp, CAST(mm div 4503599627370496L AS INT) + 1)
        |    + (mm % 70368744177664L) = element_at(dp, acc.pos + 1)))"""
        .stripMargin
    val traced = dp0.withColumn("picks", expr(
      s"""aggregate(sequence(1, $maxWordLen),
         |  named_struct('pos', len, 'ps', CAST(array() AS ARRAY<BIGINT>)),
         |  (acc, r) -> IF(acc.pos = 0, acc, named_struct(
         |    'pos', CAST($chosen div 4503599627370496L AS INT),
         |    'ps', array_append(acc.ps, $chosen))),
         |  acc -> acc.ps)""".stripMargin))
    // E-step: piece usage over the chosen tiles (word-count weighted)
    val usage = traced
      .select(col("w"), col("cnt"), explode(col("picks")).as("mm"))
      .select(col("cnt"), expr(
        """substring(w, CAST(mm div 4503599627370496L AS INT) + 1,
          |  CAST((mm div 70368744177664L) % 64L AS INT)
          |    - CAST(mm div 4503599627370496L AS INT))""".stripMargin)
        .as("piece"))
      .groupBy("piece").agg(sum("cnt").cast("long").as("use"))
    (words, vocab, dp0, usage)
  }

  def unigramEmRound(docs: DataFrame, vocabSize: Int = 256,
                     maxPieceLen: Int = 4, maxWordLen: Int = 16,
                     textCol: String = "text"): DataFrame = {
    val (words, vocab, dp0, usage) =
      unigramEmPrefix(docs, vocabSize, maxPieceLen, maxWordLen, textCol)
    // M-step: add-1-smoothed re-pricing of the SAME vocabulary
    val used = vocab.join(usage, Seq("piece"), "left")
      .select(col("piece"),
        (coalesce(col("use"), lit(0L)) + lit(1L)).as("pcnt"))
    val priced1 = unigramPrice(used)
    val dp1 = unigramDpFor(words, priced1, maxPieceLen, maxWordLen)
    val v0 = dp0.select(col("w"), col("cnt"),
      col("len").cast("long").as("n_chars"),
      element_at(col("dp"), col("len") + 1).as("u0"))
    val v1 = dp1.select(col("w"), element_at(col("dp"), col("len") + 1).as("u1"))
    v0.join(v1, "w")
      .select(col("w"), col("cnt"), col("n_chars"),
        expr("u0 div 1024L").as("cost0_micro"),
        expr("u0 % 1024L").as("pieces0"),
        expr("u1 div 1024L").as("cost1_micro"),
        expr("u1 % 1024L").as("pieces1"))
  }

  /** SentencePiece's vocabulary PRUNE step (Kudo §3.2, the hard-EM
    * form): after one Viterbi E-step, every multi-char piece the
    * optimal tilings never used is dropped (its removal cannot
    * increase the corpus cost — nothing references it), single chars
    * are kept unconditionally (coverage), survivors re-price on
    * add-1-smoothed usage, and the corpus re-segments under the
    * pruned vocabulary. One summary row: vocabulary before/after and
    * the exact corpus cost/fertility before/after — the trainer's
    * "did pruning hurt?" audit. Iterating [[unigramEmRound]] +
    * this op alternately is the full SentencePiece loop.
    */
  def unigramPruneRound(docs: DataFrame, vocabSize: Int = 256,
                        maxPieceLen: Int = 4, maxWordLen: Int = 16,
                        textCol: String = "text"): DataFrame = {
    val (words, vocab, dp0, usage) =
      unigramEmPrefix(docs, vocabSize, maxPieceLen, maxWordLen, textCol)
    val kept = vocab.join(usage, Seq("piece"), "left")
      .withColumn("use", coalesce(col("use"), lit(0L)))
      .filter(col("use") > 0L || length(col("piece")) === 1)
      .select(col("piece"), (col("use") + lit(1L)).as("pcnt"))
      .persist()
    val priced1 = unigramPrice(kept)
    val dp1 = unigramDpFor(words, priced1, maxPieceLen, maxWordLen)
    def totals(dp: DataFrame, tag: String) = dp
      .select(col("cnt"),
        element_at(col("dp"), col("len") + 1).as("u"))
      .agg(sum(expr("cnt * (u div 1024L)")).cast("long").as(s"cost_$tag"),
        sum(expr("cnt * (u % 1024L)")).cast("long").as(s"pieces_$tag"),
        sum("cnt").cast("long").as(s"occ_$tag"))
    val sizes = vocab.agg(count(lit(1)).cast("long").as("vocab_before"))
      .crossJoin(kept.agg(count(lit(1)).cast("long").as("vocab_after")))
    sizes.crossJoin(totals(dp0, "before")).crossJoin(totals(dp1, "after"))
      .select(col("vocab_before"), col("vocab_after"),
        (col("vocab_before") - col("vocab_after")).as("n_pruned"),
        col("occ_before").as("n_occurrences"),
        expr("(cost_before * 1000L) div occ_before").as("cost_per_occ_nano"),
        expr("(cost_after * 1000L) div occ_after").as("cost_per_occ_nano_after"),
        expr("(pieces_before * 1000000L) div occ_before").as("fertility_micro"),
        expr("(pieces_after * 1000000L) div occ_after")
          .as("fertility_micro_after"))
  }

  /** WordPiece merge LEARNING (Schuster & Nakajima, ICASSP'12 §3.2;
    * the trainer behind the BERT vocab): identical loop shape to BPE's
    * [[learnMerges]], but each round merges the pair maximizing the
    * LIKELIHOOD gain `count(ab) / (count(a)·count(b))` instead of the
    * raw pair count — the unigram-LM improvement criterion that
    * prefers strongly-associated pairs over merely-frequent ones (the
    * documented difference between the two trainers, surfaced here as
    * a registered op so the bake-off is auditable).
    *
    * Determinism: the score is the FLOORED pico-scaled rational
    * `(count(ab)·10¹²) div (count(a)·count(b))` — exact integer
    * arithmetic in both engines; ties (including rationals that
    * collide only after flooring) break lexicographically on the
    * pair. decimal(38,0) intermediates keep 100 TB-scale counts
    * exact.
    *
    * Scale: as [[learnMerges]] — per round one vocabulary-sized pair
    * aggregation plus a unit-count aggregation, a 1-row bounded
    * collect, and a narrow literal-replace rewrite with per-round
    * lineage cuts.
    */
  def learnMergesWordpiece(docs: DataFrame, nMerges: Int,
                           textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def shallow(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    var words = wordCounts(docs, textCol)
      .select(seedSymbols(col("w")).as("s"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    words.count()
    var prev: DataFrame = null
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    for (step <- 1 to nMerges) {
      val withT = words.select(col("cnt"), split(trim(col("s")), "  ").as("t"))
      val units = withT
        .select(col("cnt"), explode(col("t")).as("u"))
        .groupBy("u").agg(sum(col("cnt")).cast("long").as("ucnt"))
      val best = withT.filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(t)-2), i -> struct(t[i] AS p1, t[i+1] AS p2))")).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("cnt")).cast("long").as("pair_cnt"))
        .join(units.select(col("u").as("p1"), col("ucnt").as("c1")), "p1")
        .join(units.select(col("u").as("p2"), col("ucnt").as("c2")), "p2")
        .withColumn("score_pico", expr(
          """CAST((CAST(pair_cnt AS DECIMAL(38,0)) * 1000000000000)
            |  div (CAST(c1 AS DECIMAL(38,0)) * CAST(c2 AS DECIMAL(38,0)))
            |  AS BIGINT)""".stripMargin))
        // explicit column order: the using-column joins above move the
        // join key FIRST, so a positional read would swap (p1, p2)
        .select("p1", "p2", "pair_cnt", "score_pico")
        .orderBy(col("score_pico").desc, col("p1"), col("p2"))
        .limit(1)
        .collect() // 1 row by construction
      if (best.nonEmpty) {
        val r = best(0)
        val (p1, p2) = (r.getString(0), r.getString(1))
        merges += ((step, p1, p2, r.getAs[Long]("pair_cnt"),
          r.getAs[Long]("score_pico")))
        val next = words.select(
            replace(col("s"), lit(s" $p1  $p2 "), lit(s" $p1$p2 ")).as("s"),
            col("cnt"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        if (prev != null) prev.unpersist()
        prev = words
        words = shallow(next)
      }
    }
    if (prev != null) prev.unpersist()
    words.unpersist()
    merges.toSeq.toDF("step", "p1", "p2", "pair_cnt", "score_pico")
  }

  /** WordPiece greedy segmentation (Schuster & Nakajima, ICASSP'12;
    * the BERT tokenizer's MaxMatch — Devlin et al. '19 use exactly
    * this longest-match-first walk): position-tagged vocabulary
    * (word-INITIAL pieces vs `##`-CONTINUATION pieces are distinct
    * entries, counted from their actual corpus positions), then each
    * word is segmented left-to-right by repeatedly taking the LONGEST
    * vocabulary piece valid at the cursor. Completes the tokenizer
    * trio beside BPE ([[learnMerges]], merge-rank greedy) and
    * unigram-LM ([[unigramSegment]], global-optimum Viterbi):
    * WordPiece is the one that needs NO per-word DP — a single greedy
    * fold — which is why serving-side tokenizers ship it.
    *
    * Vocabulary: all (piece, cont) substrings up to `maxPieceLen`
    * chars with summed word counts; top `vocabSize` under the total
    * order (pcnt desc, cont asc, piece asc) ∪ ALL single-character
    * entries (both position forms, with their true counts) so the
    * greedy walk can always advance — the `[UNK]` branch is
    * structurally unreachable and fertility is exact, not clipped.
    *
    * Mechanics: matches per word are an equi-join of exploded
    * (position, length) substrings against the vocabulary on
    * (piece, cont = position > 1), packed `st·1024 + en` and sorted;
    * the greedy walk is `maxWordLen` chained struct projections —
    * per step, `array_max`-style integer fold of the matches starting
    * at the cursor (longest wins because `en` is the low bits of a
    * fixed-`st` pack), emitting the piece into the running `seg`
    * string (`##`-prefixed past position 0). Both engines run the
    * same fold on the same integer pack, so segmentations are
    * bit-identical.
    *
    * Scale: ONE corpus-sized word-count shuffle; everything after
    * lives on the vocabulary-bounded word table (the [[learnMerges]]
    * scaling argument: WordPiece trainers scale with vocabulary, not
    * tokens). The greedy fold is a constant-width projection chain —
    * no shuffle, no UDF, codegen-friendly HOFs throughout.
    */
  def wordpieceSegment(docs: DataFrame, vocabSize: Int = 256,
                       maxPieceLen: Int = 4, maxWordLen: Int = 16,
                       textCol: String = "text"): DataFrame = {
    val words = wordCounts(docs, textCol)
      .filter(length(col("w")) <= maxWordLen)
      .select(col("w"), col("cnt").cast("long").as("cnt"),
        length(col("w")).cast("long").as("len"))
      .persist()
    // (piece, cont, pcnt): every substring up to maxPieceLen at its
    // actual position class — word-initial (cont=0) vs interior
    // (cont=1) counts are SEPARATE entries, the WordPiece signature
    val subs = words
      .select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, len), i ->
           |  transform(sequence(1, least($maxPieceLen, len - i + 1)), l ->
           |    struct(substring(w, CAST(i AS INT), CAST(l AS INT)) AS piece,
           |      CASE WHEN i = 1 THEN 0 ELSE 1 END AS cont))))""".stripMargin))
        .as("pc"))
      .groupBy(col("pc.piece").as("piece"), col("pc.cont").as("cont"))
      .agg(sum("cnt").cast("long").as("pcnt"))
      .persist()
    val vocab = subs
      .orderBy(col("pcnt").desc, col("cont").asc, col("piece").asc)
      .limit(vocabSize)
      .unionByName(subs.filter(length(col("piece")) === 1))
      .dropDuplicates("piece", "cont")
    val matches = words
      .select(col("w"), explode(expr(
        s"""flatten(transform(sequence(1, len), i ->
           |  transform(sequence(1, least($maxPieceLen, len - i + 1)), l ->
           |    struct(substring(w, CAST(i AS INT), CAST(l AS INT)) AS piece,
           |      CASE WHEN i = 1 THEN 0 ELSE 1 END AS cont,
           |      CAST((i - 1) * 1024 + (i + l - 1) AS BIGINT) AS mm))))"""
          .stripMargin)).as("m"))
      .select(col("w"), col("m.piece").as("piece"), col("m.cont").as("cont"),
        col("m.mm").as("mm"))
      .join(broadcast(vocab.select("piece", "cont")), Seq("piece", "cont"))
      .groupBy("w").agg(sort_array(collect_list(col("mm"))).as("marr"))
    // greedy longest-match walk: st = (cursor, pieces so far, seg text)
    val pos2 =
      """aggregate(filter(marr, mm -> mm div 1024L = st.pos),
        |  CAST(0 AS BIGINT), (a, mm) -> greatest(a, mm % 1024L))""".stripMargin
    var seg = words.join(matches, "w")
      .withColumn("st", expr(
        "named_struct('pos', CAST(0 AS BIGINT), 'np', CAST(0 AS BIGINT), 'seg', '')"))
    for (_ <- 1 to maxWordLen) {
      seg = seg.withColumn("st", expr(
        s"""CASE WHEN st.pos >= len THEN st ELSE named_struct(
           |  'pos', ($pos2),
           |  'np', st.np + 1L,
           |  'seg', concat(st.seg,
           |    CASE WHEN st.pos = 0L THEN '' ELSE ' ##' END,
           |    substring(w, CAST(st.pos AS INT) + 1,
           |      CAST(($pos2) - st.pos AS INT))))
           |END""".stripMargin))
    }
    val out = seg.select(col("w"), col("cnt"), col("len").as("n_chars"),
      col("st.np").as("n_pieces"), col("st.seg").as("seg"))
    out
  }

  /** Piece-usage report of the [[wordpieceSegment]] vocabulary: which
    * pieces actually carry the corpus (occurrence-weighted usage,
    * word-initial and continuation forms separate) — the
    * vocabulary-health readout a tokenizer owner reads before
    * shipping (dead entries = wasted embedding rows; a continuation
    * piece outworking its initial twin = a stemming artifact).
    * Top `topK` under (usage desc, cont asc, piece asc).
    */
  def wordpieceUsage(docs: DataFrame, vocabSize: Int = 256,
                     maxPieceLen: Int = 4, maxWordLen: Int = 16,
                     topK: Int = 30, textCol: String = "text"): DataFrame =
    wordpieceSegment(docs, vocabSize, maxPieceLen, maxWordLen, textCol)
      .select(col("cnt"), explode(split(col("seg"), " ")).as("p"))
      .select(col("cnt"),
        when(col("p").startsWith("##"), lit(1)).otherwise(lit(0)).as("cont"),
        when(col("p").startsWith("##"), expr("substring(p, 3)"))
          .otherwise(col("p")).as("piece"))
      .groupBy("piece", "cont")
      .agg(sum("cnt").cast("long").as("usage"))
      .orderBy(col("usage").desc, col("cont").asc, col("piece").asc)
      .limit(topK)
}
