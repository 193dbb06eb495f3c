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
}
