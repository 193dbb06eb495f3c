package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for BPE merge learning: the textbook Sennrich example, greedy
  * left-to-right within-word merge order, and the learn/apply
  * round-trip (segmenting with the learned merges rebuilds each word).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(docs: String*) = docs.toDF("text")

  test("learns the highest-count pair first; lexical tiebreak on equal counts") {
    // (e,r) = lower x2 + newer x3 + wider = 6, the unique max
    val docs = corpus("lower lower newer newer newer wider")
    val m = Bpe.learnMerges(docs, 1).collect().head
    assert((m.getString(1), m.getString(2)) === (("e", "r")))
    assert(m.getLong(3) === 6L)
    // exact tie (a,b)=2 vs (c,d)=2 -> lexically smaller pair wins
    val tie = Bpe.learnMerges(corpus("ab ab cd cd"), 1).collect().head
    assert((tie.getString(1), tie.getString(2)) === (("a", "b")))
    assert(tie.getLong(3) === 2L)
  }

  test("greedy left-to-right: 'aaa' under merge (a,a) segments as (aa, a)") {
    val docs = corpus("aaa aaa bb")
    val m = Bpe.learnMerges(docs, 1).collect().head
    assert((m.getString(1), m.getString(2)) === (("a", "a"))) // count 4 beats (b,b)=1
    val seg = Bpe.segmentVocab(docs, Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(seg("aaa") === "aa,a")
    assert(seg("bb") === "b,b")
  }

  test("merges chain into longer units and the pieces always rebuild the word") {
    val docs = corpus("abab abab abab cd")
    val merges = Bpe.learnMerges(docs, 3).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // (a,b) first (count 6), then (ab,ab) -> whole word
    assert(merges.take(2) === Seq(("a", "b"), ("ab", "ab")))
    val seg = Bpe.segmentVocab(docs, merges).collect()
    seg.foreach { r =>
      assert(r.getString(3).replace(",", "") === r.getString(0)) // lossless
    }
    val byW = seg.map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(byW("abab") === 1) // fully merged
  }

  test("tokenizeCorpus: ordered reassembly, counts summed over occurrences") {
    val docs = Seq((1L, "ab ba ab"), (2L, "ba")).toDF("doc_id", "text")
      .withColumnRenamed("doc_id", "doc_id")
    val got = Bpe.tokenizeCorpus(docs, Seq(("a", "b")), idCol = "doc_id")
      .orderBy("doc_id").collect()
    // doc 1: pieces ab | b,a | ab -> 4 pieces, joined "ab,b,a,ab"
    assert(got(0).getLong(1) === 4L)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0).getString(2) === hex("ab,b,a,ab"))
    assert(got(1).getLong(1) === 2L)
    assert(got(1).getString(2) === hex("b,a"))
  }

  test("single-char and merge-free words survive all rounds untouched") {
    val docs = corpus("x x x yz")
    val m = Bpe.learnMerges(docs, 5) // only 1 real pair exists
    assert(m.count() === 1L) // rounds with no pairs left learn nothing
    val seg = Bpe.segmentVocab(docs, Seq(("y", "z")))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(seg("x") === "x")
    assert(seg("yz") === "yz")
  }

  test("unigramSegment: Viterbi picks the globally cheaper tiling, not the longest piece") {
    // corpus "aa aa ab": piece counts a=5, aa=2, ab=1, b=1 (total 9);
    // cost_micro(a)=587787, cost(aa)=1504077, cost(ab)=cost(b)=2197225.
    // "aa" tiles as [a,a] (1175574) < [aa] (1504077) -> 2 pieces;
    // "ab" tiles as [ab] (2197225) < [a,b] (2785012) -> 1 piece.
    val got = Bpe.unigramSegment(corpus("aa aa ab")).collect()
      .map(r => r.getAs[String]("w") ->
        (r.getAs[Long]("cost_micro"), r.getAs[Long]("n_pieces"))).toMap
    assert(got("aa") === ((2L * 587787L, 2L)))
    assert(got("ab") === ((2197225L, 1L)))
    // counts and char lengths survive the DP
    val rows = Bpe.unigramSegment(corpus("aa aa ab")).collect()
    assert(rows.find(_.getAs[String]("w") == "aa").get.getAs[Long]("cnt") === 2L)
    assert(rows.find(_.getAs[String]("w") == "aa").get.getAs[Long]("n_chars") === 2L)
  }

  test("unigramSegment: words over maxWordLen drop; single chars always cover") {
    val got = Bpe.unigramSegment(corpus("abcdefghijklmnopqrstu xyz"),
      maxWordLen = 16).collect()
    assert(got.length === 1) // the 21-char word is excluded
    assert(got.head.getAs[String]("w") === "xyz")
    assert(got.head.getAs[Long]("n_pieces") >= 1L)
  }

  test("unigramPruneRound: unused multi-char pieces drop, singles stay, cost falls, fertility holds") {
    // corpus "aa aa ab": vocab {a, aa, ab, b}; Viterbi uses a (x4) and
    // ab (x1); aa is multi-char and unused -> pruned; b is a single ->
    // kept despite zero usage
    val r = Bpe.unigramPruneRound(corpus("aa aa ab")).head()
    assert(r.getAs[Long]("vocab_before") === 4L)
    assert(r.getAs[Long]("vocab_after") === 3L)
    assert(r.getAs[Long]("n_pruned") === 1L)
    assert(r.getAs[Long]("n_occurrences") === 3L)
    // tilings unchanged: 5 pieces over 3 word occurrences
    assert(r.getAs[Long]("fertility_micro") === 1666666L)
    assert(r.getAs[Long]("fertility_micro_after") === 1666666L)
    // usage-concentrated re-pricing lowers the corpus cost
    assert(r.getAs[Long]("cost_per_occ_nano_after") <
      r.getAs[Long]("cost_per_occ_nano"))
  }

  test("unigramEmRound: usage re-pricing makes the chosen tilings cheaper, never costlier overall") {
    // corpus "aa aa ab": v0 usage a=4 (2 picks x cnt 2), ab=1, aa=b=0;
    // add-1 repriced total 9 -> cost1(ab) = -ln(2/9) = 1504077 < v0's
    // 2197225; "aa" keeps [a,a] at the same cost (a's count unchanged)
    val got = Bpe.unigramEmRound(corpus("aa aa ab")).collect()
      .map(r => r.getAs[String]("w") -> r).toMap
    assert(got("aa").getAs[Long]("pieces0") === 2L)
    assert(got("aa").getAs[Long]("pieces1") === 2L)
    assert(got("aa").getAs[Long]("cost0_micro") === 2L * 587787L)
    assert(got("aa").getAs[Long]("cost1_micro") === 2L * 587787L)
    assert(got("ab").getAs[Long]("pieces0") === 1L)
    assert(got("ab").getAs[Long]("cost0_micro") === 2197225L)
    assert(got("ab").getAs[Long]("cost1_micro") === 1504077L)
    // corpus-level EM objective improves (hard-EM monotonicity here)
    val t0 = got.values.map(r => r.getAs[Long]("cnt") * r.getAs[Long]("cost0_micro")).sum
    val t1 = got.values.map(r => r.getAs[Long]("cnt") * r.getAs[Long]("cost1_micro")).sum
    assert(t1 <= t0)
  }

  test("wordpiece trainer: likelihood argmax diverges from BPE's count argmax") {
    // (a,b) is the most FREQUENT pair (3) but both units are common
    // (8 each): likelihood 3/64. (x,y) occurs twice with exclusive
    // units: likelihood 2/4. BPE merges (a,b); WordPiece merges (x,y).
    val docs = corpus((Seq.fill(3)("ab") ++ Seq.fill(2)("xy") ++
      Seq.fill(5)("a") ++ Seq.fill(5)("b")).mkString(" "))
    val bpe = Bpe.learnMerges(docs, 1).collect().head
    assert((bpe.getString(1), bpe.getString(2)) === (("a", "b")))
    val wp = Bpe.learnMergesWordpiece(docs, 1).collect().head
    assert((wp.getString(1), wp.getString(2)) === (("x", "y")))
    assert(wp.getAs[Long]("pair_cnt") === 2L)
    assert(wp.getAs[Long]("score_pico") === 500000000000L) // 2/(2*2)
  }

  test("wordpiece: greedy longest-match-first, ## continuations, lossless") {
    // 'aaaa' with pieces up to len 3: greedy takes 'aaa' then '##a' —
    // NOT the also-2-piece 'aa ##aa'; longest-first is the law
    val seg = Bpe.wordpieceSegment(corpus("aaaa aaaa bb"),
        vocabSize = 64, maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(seg("aaaa") === "aaa ##a")
    assert(seg("bb") === "bb")
    // lossless: stripping '##' markers rebuilds every word
    seg.foreach { case (w, s) =>
      assert(s.split(" ").map(_.stripPrefix("##")).mkString === w)
    }
  }

  test("wordpiece: position-tagged vocab — initial and continuation forms are distinct") {
    // tiny vocab: only singles survive ('ab' as one piece would need
    // the top slots; vocabSize=0 keeps singles only) -> every word is
    // fully exploded into chars, first raw, rest ##-prefixed
    val seg = Bpe.wordpieceSegment(corpus("ab ab cd"),
        vocabSize = 0, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(seg("ab") === ((2L, "a ##b")))
    assert(seg("cd") === ((2L, "c ##d")))
  }

  test("wordpiece usage: occurrence-weighted, cont flag split, top order") {
    val got = Bpe.wordpieceUsage(corpus("aaaa aaaa bb"),
        vocabSize = 64, maxPieceLen = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // 'aaaa' x2 -> 'aaa'(init) usage 2 and 'a'(cont) usage 2; 'bb' -> ('bb',0) 1
    assert(got(("aaa", 0)) === 2L)
    assert(got(("a", 1)) === 2L)
    assert(got(("bb", 0)) === 1L)
  }
}
