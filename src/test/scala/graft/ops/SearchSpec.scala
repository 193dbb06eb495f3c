package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the search/ranking and round-5 curation operators beyond
  * the oracle's value checks: BM25 ordering properties, heavy-hitter
  * exactness, paragraph-dedup keep-first semantics, per-source caps,
  * temperature-resample rates.
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25: more hits => higher score; zero hits excluded; dl penalty works") {
    val df = Seq(
      (1L, "spark spark spark other words here"),
      (2L, "spark other words here padding tokens"),
      (3L, "no relevant terms at all whatsoever"),
      // same tf as doc 2 but much longer -> lower score (length norm)
      (4L, "spark " + Seq.fill(40)("pad").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Search.bm25(df, Seq("spark")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(!got.contains(3L), "doc without any query term must not appear")
    assert(got(1L) > got(2L), "higher tf must outrank")
    assert(got(2L) > got(4L), "longer doc with equal tf must score lower")
  }

  test("heavy hitters: exact counts and share threshold") {
    val df = Seq(
      (1L, "aa aa aa aa bb"),
      (2L, "aa aa aa aa cc")
    ).toDF("doc_id", "text")
    // 10 tokens total: aa=8 (0.8), bb=1 (0.1), cc=1 (0.1)
    val all = Search.heavyHitters(df, minShare = 0.05).collect()
      .map(r => r.getAs[String]("tok") -> (r.getAs[Long]("cnt"), r.getAs[Double]("share"))).toMap
    assert(all("aa") === ((8L, 0.8)))
    assert(all("bb") === ((1L, 0.1)))
    val top = Search.heavyHitters(df, minShare = 0.5).collect()
    assert(top.map(_.getAs[String]("tok")).toSeq === Seq("aa"))
  }

  test("paragraph dedup keeps first occurrence and reassembles in order") {
    val p4 = Seq(
      // doc 1: two distinct 4-token paragraphs
      (1L, "a b c d e f g h"),
      // doc 2: first paragraph repeats doc 1's first -> dropped;
      // second paragraph is new -> kept
      (2L, "a b c d x y z w"),
      // doc 3: all paragraphs already seen -> vanishes entirely
      (3L, "e f g h x y z w")
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(p4, p = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept_paras"), r.getAs[String]("dedup_text")))).toMap
    assert(got(1L) === ((2L, "a b c d e f g h")))
    assert(got(2L) === ((1L, "x y z w")))
    assert(!got.contains(3L), "fully-duplicated doc must vanish")
  }

  test("paragraph dedup keep-first is corpus-order, not arbitrary") {
    val df = Seq(
      (10L, "p q r s"),
      (2L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(df, p = 4).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    // doc 2 has the lower id -> owns "p q r s"; doc 10 vanishes
    assert(got === Set(2L))
  }

  test("quality cap bounds every stratum and keeps the best-scoring docs") {
    val df = (1L to 20L).map { i =>
      val src = if (i <= 10) "s1" else "s2"
      // more stopwords -> higher stopword ratio -> higher quality score
      val nStop = (if (i <= 10) i else i - 10).toInt
      val text = (Seq.fill(nStop)("the") ++ Seq.fill(5)("zz")).mkString(" ")
      (i, src, text)
    }.toDF("doc_id", "source", "text")
    val capped = Curate.qualityCap(df, cap = 3)
    val bySrc = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.forall(_ <= 3L))
    // the kept docs of s1 must be the 3 highest-quality ones (ids 8,9,10
    // have the most stopwords among 1..10)
    val s1Kept = capped.filter(col("source") === "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1Kept === Set(8L, 9L, 10L))
  }

  test("temperature resample: balanced strata keep all; skew downsamples the big one") {
    val balanced = (1L to 40L).map(i => (i, s"s${i % 2}", s"text body $i")).toDF("doc_id", "source", "text")
    assert(Curate.temperatureResample(balanced).count() === 40L)
    val skewed = ((1L to 360L).map(i => (i, "big", s"unique text $i")) ++
      (361L to 370L).map(i => (i, "small", s"other text $i"))).toDF("doc_id", "source", "text")
    val kept = Curate.temperatureResample(skewed)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") === 10L, "smallest stratum keeps everything")
    // big keeps ~sqrt(10/360)=0.167 of 360 ≈ 60; allow generous band
    assert(bySrc("big") < 160L && bySrc("big") > 20L,
      s"big stratum should be heavily downsampled, kept ${bySrc("big")}")
    // determinism: re-running keeps the identical set
    val again = Curate.temperatureResample(skewed)
    assert(kept.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
  }

  test("rm3Expansion: co-occurring term tops the expansion; seeds and non-feedback docs excluded") {
    val df = Seq(
      (1L, "apple fruit fruit sweet"),
      (2L, "apple fruit tree"),
      (3L, "apple fruit orchard"),
      // no seed term: BM25 score 0 -> outside the feedback set, so its
      // vocabulary must contribute NOTHING
      (4L, "zebra zebra zebra zebra")
    ).toDF("doc_id", "text")
    val got = Search.rm3Expansion(df, Seq("apple"), fbDocs = 3, expandTerms = 5)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("term"),
        r.getAs[Long]("rm_micro"))).toList
    val terms = got.map(_._2)
    assert(terms.head === "fruit",
      s"the term co-occurring in every feedback doc must rank first, got $terms")
    assert(!terms.contains("apple"), "seed terms are excluded from the expansion")
    assert(!terms.contains("zebra"), "a zero-score doc's vocabulary must not leak in")
    assert(got.map(_._1) === (1 to got.size).toList, "ranks are a dense total order")
    assert(got.forall(_._3 > 0L), "every emitted weight is positive")
    // weights are deterministic across runs
    val again = Search.rm3Expansion(df, Seq("apple"), fbDocs = 3, expandTerms = 5)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("term"),
        r.getAs[Long]("rm_micro"))).toList
    assert(again === got)
  }

  test("mmrRerank: rank-1 is pure relevance; near-dup of it is demoted below a diverse hit") {
    import spark.implicits._
    // query along axis 0; candidate A = best match, A' = near-copy of A,
    // B = diverse (axis 1 lean). Pure relevance orders A, A', B; MMR
    // must pick A then B (A' is redundant with A).
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val corpus = Seq(
      (10L, v(1.0, 0.05, 0, 0)),   // A: rel ~1
      (11L, v(0.99, 0.06, 0, 0)),  // A': near-dup of A, rel just below
      (12L, v(0.5, 0.85, 0, 0))    // B: diverse, lower rel
    ).toDF("vec_id", "embedding")
    val queries = Seq((0L, v(1.0, 0, 0, 0))).toDF("vec_id", "embedding")
    val got = Search.mmrRerank(corpus, queries, topN = 3, m = 3, lambda = 0.3)
      .orderBy("sel_rank").collect()
      .map(r => (r.getAs[Int]("sel_rank"), r.getAs[Long]("n_id")))
    assert(got.map(_._2).toSeq === Seq(10L, 12L, 11L),
      s"MMR must interleave the diverse hit before the near-dup, got ${got.toSeq}")
    // selections are distinct and dense-ranked
    assert(got.map(_._1).toSeq === Seq(1, 2, 3))
  }

  test("mmrRerank: lambda=1 degenerates to pure relevance order") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
    val mmr = Search.mmrRerank(e, q, topN = 8, m = 5, lambda = 1.0)
      .orderBy("sel_rank").collect().map(_.getAs[Long]("n_id")).toSeq
    val brute = graft.ops.Similarity.bruteForceTopK(e, q, k = 5)
      .orderBy("rank").collect().map(_.getAs[Long]("n_id")).toSeq
    assert(mmr === brute, "with no diversity penalty MMR is exactly top-k")
  }

  test("rankBiasedOverlap: identity = full weight mass, disjoint = 0, hand case") {
    import spark.implicits._
    def lst(rows: (Long, Long, Int)*) = rows.toDF("q_id", "id", "rank")
    val a = lst((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    // identical lists: every item contributes its own tail weight
    val self = Search.rankBiasedOverlap(a, a, depth = 3, p = 0.9).head()
    val full = Search.rboTailWeights(3, 0.9).sum / 1e12
    assert(self.getAs[Long]("overlap3") === 3L)
    assert(self.getAs[Double]("rbo") === full)
    // disjoint lists: zero overlap, zero score, row still present
    val b = lst((1L, 20L, 1), (1L, 21L, 2), (1L, 22L, 3))
    val dis = Search.rankBiasedOverlap(a, b, depth = 3, p = 0.9).head()
    assert(dis.getAs[Long]("overlap3") === 0L && dis.getAs[Double]("rbo") === 0.0)
    // one shared item at ranks (1, 2) scores exactly the m=2 tail weight
    val c = lst((1L, 10L, 2), (1L, 21L, 1), (1L, 22L, 3))
    val one = Search.rankBiasedOverlap(a, c, depth = 3, p = 0.9).head()
    assert(one.getAs[Long]("overlap3") === 1L)
    assert(one.getAs[Double]("rbo") === Search.rboTailWeights(3, 0.9)(1) / 1e12)
  }
}
