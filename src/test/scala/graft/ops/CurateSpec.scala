package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the curation operators (sampling determinism, packing
  * conservation, scrub idempotency) beyond the oracle's value checks.
  */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("stratified sample is deterministic, capped, and a subset") {
    val s1 = Curate.stratifiedSample(docs, "source", perStratum = 3)
    val s2 = Curate.stratifiedSample(docs, "source", perStratum = 3)
    assert(s1.select("doc_id").exceptAll(s2.select("doc_id")).isEmpty)
    val counts = s1.groupBy("source").count().collect()
    assert(counts.forall(_.getAs[Long]("count") <= 3L))
    assert(s1.join(docs, Seq("doc_id"), "left_anti").isEmpty, "sample must be a subset")
    // growing the cap only ADDS documents (hash-frontier stability)
    val s3 = Curate.stratifiedSample(docs, "source", perStratum = 5)
    assert(s1.select("doc_id").exceptAll(s3.select("doc_id")).isEmpty,
      "a smaller sample must be contained in a larger one")
  }

  test("token packing conserves tokens and bins are contiguous per shard") {
    val packed = Curate.packTokenBudget(docs, budget = 100, shardCol = "source").cache()
    // conservation: offsets + counts tile the stream exactly
    val total = packed.agg(sum("n_tokens")).head().getLong(0)
    val lastPerShard = packed.groupBy("source")
      .agg(max(col("tok_offset") + col("n_tokens")).as("stream_len"))
      .agg(sum("stream_len")).head().getLong(0)
    assert(total === lastPerShard, "per-shard stream length must equal the token sum")
    // a doc's bin is exactly its first token's chunk index
    assert(packed.filter(col("bin") =!= (col("tok_offset") / 100).cast("long")).isEmpty)
    // bins start at 0 and never skip more than a whole doc can span
    assert(packed.groupBy("source").agg(min("bin").as("b0"))
      .filter(col("b0") =!= 0L).isEmpty)
  }

  test("mixToTarget: deterministic, capped, near-target, drops unlisted strata") {
    val targets = Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.25)
    val total = 60L
    val m1 = Curate.mixToTarget(docs, targets, totalDocs = total).cache()
    // deterministic: the identical multiset both runs
    val m2 = Curate.mixToTarget(docs, targets, totalDocs = total)
    assert(m1.select("doc_id", "epoch").exceptAll(m2.select("doc_id", "epoch")).isEmpty
      && m2.select("doc_id", "epoch").exceptAll(m1.select("doc_id", "epoch")).isEmpty)
    // strata outside the recipe are gone
    assert(m1.filter(!col("source").isin("src1", "src2", "src3")).isEmpty)
    // the epoch cap is a hard bound
    assert(m1.filter(col("epoch") >= 4).isEmpty)
    // per-stratum output lands within one doc of the (possibly capped)
    // target: n_src * min(cap, w*total/n_src)
    val nSrc = docs.filter(col("source").isin("src1", "src2", "src3"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = m1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((s, w) <- targets) {
      val expect = nSrc(s) * math.min(4.0, w * total / nSrc(s))
      assert(math.abs(got.getOrElse(s, 0L) - expect) <= math.max(1.0, 0.35 * expect),
        s"$s: got ${got.getOrElse(s, 0L)}, expected ~$expect")
    }
    // every emitted copy is a real doc and epochs are dense from 0
    assert(m1.join(docs, Seq("doc_id"), "left_anti").isEmpty)
    assert(m1.groupBy("doc_id").agg(min("epoch").as("e0"),
        max("epoch").as("emax"), count(lit(1)).as("n"))
      .filter(col("e0") =!= 0 || col("n") =!= col("emax") + 1).isEmpty,
      "per-doc epochs must be exactly 0..n-1")
    m1.unpersist()
  }

  test("shardManifest: order-insensitive, corruption-sensitive, conserving") {
    val sharded = docs.withColumn("shard",
      Curate.shardAssign(col("doc_id"), nShards = 4, seed = 7L))
    val m1 = Curate.shardManifest(sharded).cache()
    // the checksum must not depend on row order / partitioning
    val m2 = Curate.shardManifest(sharded.repartition(13).sortWithinPartitions("text"))
    assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty)
    // totals conserve across shards
    val nd = m1.agg(sum("n_docs")).head().getLong(0)
    assert(nd === docs.count())
    // flipping ONE row's text changes exactly that row's shard checksum
    val someId = docs.select(min("doc_id")).head().getLong(0)
    val corrupted = sharded.withColumn("text",
      when(col("doc_id") === someId, concat(col("text"), lit("!"))).otherwise(col("text")))
    val m3 = Curate.shardManifest(corrupted)
    val diff = m1.select("shard", "checksum")
      .exceptAll(m3.select("shard", "checksum")).collect()
    assert(diff.length === 1, s"exactly one shard checksum must change, got ${diff.length}")
    val hitShard = sharded.filter(col("doc_id") === someId)
      .select("shard").head().getInt(0)
    assert(diff.head.getInt(0) === hitShard)
    m1.unpersist()
  }

  test("PII scrub removes every seeded email/phone and is idempotent") {
    val seeded = docs.withColumn("text2",
      concat(col("text"), lit(" reach me at j.doe+spam@mail.example.org or 415-555-0123")))
    val scrubbed = Curate.scrubPii(seeded, "text2").cache()
    assert(scrubbed.filter(col("n_emails") =!= 1L || col("n_phones") =!= 1L).isEmpty)
    assert(scrubbed.filter(col("scrubbed").contains("@")).isEmpty)
    assert(scrubbed.filter(col("scrubbed").rlike("\\d{3}-\\d{3}-\\d{4}")).isEmpty)
    // idempotent: scrubbing the scrubbed text changes nothing
    val again = Curate.scrubPii(
      scrubbed.select(col("doc_id"), col("scrubbed").as("text2")), "text2")
    assert(again.filter(col("n_emails") =!= 0L || col("n_phones") =!= 0L).isEmpty)
    assert(again.filter(col("scrubbed") =!= col("text2")).isEmpty)
  }

  test("source composition shares sum to 1") {
    val comp = Curate.sourceComposition(docs)
    val share = comp.agg(sum("token_share")).head().getDouble(0)
    assert(math.abs(share - 1.0) < 1e-9)
    assert(comp.agg(sum("n_docs")).head().getLong(0) === docs.count())
  }

  test("chunking covers every token, respects stride, and rebuilds short docs") {
    import spark.implicits._
    val c = Curate.chunkDocs(docs, chunkSize = 64, stride = 48)
    // conservation: summing (first) chunk starts of the LAST chunk per
    // doc + its length reaches exactly the doc's token count
    val last = c.groupBy("doc_id").agg(max("chunk_id").as("last_id"))
    val byDoc = c.join(last, Seq("doc_id"))
      .filter(col("chunk_id") === col("last_id"))
      .select(col("doc_id"), (col("chunk_id") * 48 + col("n_chunk_tokens")).as("covered"))
    val truth = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    assert(byDoc.join(truth, "doc_id").filter(col("covered") =!= col("n_tok")).isEmpty,
      "last chunk must end exactly at the document's last token")
    // a doc shorter than chunkSize yields exactly one chunk == the doc
    val short = Seq((1L, "a b c")).toDF("doc_id", "text")
    val sc = Curate.chunkDocs(short).collect()
    assert(sc.length === 1 && sc(0).getAs[String]("chunk_text") === "a b c"
      && sc(0).getAs[Long]("n_chunk_tokens") === 3L)
  }

  test("decontamination flags exactly the planted benchmark overlaps") {
    import spark.implicits._
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains the full benchmark 8-shingle "alpha ... theta"
      (1L, "x alpha beta gamma delta epsilon zeta eta theta y"),
      (2L, "completely unrelated text with no overlap at all here"),
      // 7-token overlap only -> NOT an 8-shingle hit
      (3L, "alpha beta gamma delta epsilon zeta eta DIFFERENT tail tokens")
    ).toDF("doc_id", "text")
    val got = Curate.decontaminate(corpus, bench, k = 8)
      .select("doc_id", "contaminated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("epoch shuffle: total, contiguous, deterministic; seeds permute") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val e1 = Curate.epochShuffle(docs, nShards = 4, seed = 1L)
      .select("doc_id", "shard", "pos").collect()
    // every doc exactly once, shards in range
    assert(e1.length === 200)
    assert(e1.map(_.getAs[Long]("doc_id")).toSet === (0L until 200L).toSet)
    assert(e1.forall(r => (0 until 4).contains(r.getAs[Int]("shard"))))
    // positions are 1..n contiguous within every shard
    e1.groupBy(_.getAs[Int]("shard")).values.foreach { rows =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(ps === (1L to rows.length.toLong), "positions must be contiguous")
    }
    // deterministic: the same seed reproduces the identical assignment
    val e1b = Curate.epochShuffle(docs, nShards = 4, seed = 1L)
      .select("doc_id", "shard", "pos").collect()
    assert(e1.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq ===
      e1b.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq)
    // a different seed is a genuinely different permutation
    val e2 = Curate.epochShuffle(docs, nShards = 4, seed = 2L)
      .select("doc_id", "shard", "pos").collect()
    val m1 = e1.map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val m2 = e2.map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(m1 !== m2, "epoch 2 must reshuffle")
  }

  test("epoch shuffle shard-sizing rule: warns when shards outgrow one reducer") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    // the fixture is tiny, so the default 4 GiB threshold stays silent…
    assert(Curate.shardSizeWarning(docs, nShards = 4).isEmpty)
    // …and a 1-byte threshold must trip: the per-shard single-reducer
    // position sort is the documented scaling hazard, and the warning
    // names the remedy (raise nShards with the corpus)
    val warn = Curate.shardSizeWarning(docs, nShards = 4, warnBytes = 1L)
    assert(warn.nonEmpty, "plan-stat estimate should exceed 1 byte/shard")
    assert(warn.get.contains("raise nShards"))
  }

  test("contamination report: hand-computed overlap fractions and the drop cut") {
    import spark.implicits._
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // 10 tokens -> 3 distinct 8-shingles ("x..eta", "alpha..theta",
      // "beta..y"); only "alpha..theta" is a benchmark shingle -> 1/3
      (1L, "x alpha beta gamma delta epsilon zeta eta theta y"),
      (2L, "completely unrelated text with no overlap at all here"),
      // the benchmark text verbatim: every shingle shared -> frac 1.0
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val got = Curate.contaminationReport(corpus, bench, k = 8, dropThreshold = 0.5)
      .select("doc_id", "n_shared", "n_grams", "overlap_frac", "drop_doc")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Long]("n_grams") === 3L)
    assert(got(1L).getAs[Long]("n_shared") === 1L) // only "alpha..theta"
    assert(math.abs(got(1L).getAs[Double]("overlap_frac") - 1.0 / 3.0) < 1e-12)
    assert(!got(1L).getAs[Boolean]("drop_doc"))
    assert(got(2L).getAs[Long]("n_shared") === 0L)
    assert(got(2L).getAs[Double]("overlap_frac") === 0.0)
    assert(got(4L).getAs[Double]("overlap_frac") === 1.0)
    assert(got(4L).getAs[Boolean]("drop_doc"), "verbatim benchmark copy must drop")
  }

  test("bloom decontamination flags every exact hit (no false negatives)") {
    import spark.implicits._
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x alpha beta gamma delta epsilon zeta eta theta y"),
      (2L, "completely unrelated text with no overlap at all here"),
      (3L, "alpha beta gamma delta epsilon zeta eta DIFFERENT tail tokens")
    ).toDF("doc_id", "text")
    val bloom = Curate.decontaminateBloom(corpus, bench, k = 8)
      .select("doc_id", "bloom_flagged").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("bloom_flagged")).toMap
    assert(bloom(1L), "planted exact hit must be bloom-flagged (no false negatives)")
    val exact = Curate.decontaminate(corpus, bench, k = 8)
      .select("doc_id", "contaminated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    exact.foreach { case (id, c) =>
      assert(!c || bloom(id), s"doc $id: exact-contaminated but not bloom-flagged")
    }
  }

  test("repetition ratio: looping text scores high, varied text scores 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight totally distinct words appear exactly once here")
    ).toDF("doc_id", "text")
    val got = Text.withRepetition(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rep_ratio")).toMap
    assert(got(1L) > 0.8, s"looping doc should repeat, got ${got(1L)}")
    assert(got(2L) === 0.0)
  }

  test("token entropy: uniform text maxes, constant text zeroes, counts exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),                 // one distinct token -> entropy 0
      (2L, "a b c d"),                 // uniform over 4 -> ln(4)
      (3L, "a a a b")                  // H = -(3/4 ln 3/4 + 1/4 ln 1/4)
    ).toDF("doc_id", "text")
    val got = Text.withTokenEntropy(df)
      .select("doc_id", "n_tokens", "n_distinct_tokens", "entropy").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct_tokens"),
          r.getAs[Double]("entropy")))).toMap
    assert(got(1L)._1 === 4L && got(1L)._2 === 1L)
    assert(math.abs(got(1L)._3) < 1e-12)
    assert(got(2L)._2 === 4L)
    assert(math.abs(got(2L)._3 - math.log(4)) < 1e-12)
    val h3 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(got(3L)._3 - h3) < 1e-12)
  }

  test("cluster-safe split never separates near-duplicates; per-doc split does") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(40)
    // plant exact duplicates under distant ids — the per-doc md5 coin
    // is independent of content, so some dup pair WILL straddle a
    // split; the cluster coin cannot, by construction
    val dup = e.select((col("vec_id") + 5000).as("vec_id"), col("embedding"), col("label"))
    val corpus = e.unionByName(dup)
    val pairs = Similarity.cosineNearDupPairs(corpus, threshold = 0.999)
      .select(col("id1").as("d1"), col("id2").as("d2"))
    val cc = Dedup.connectedComponents(corpus.select(col("vec_id").as("v")), pairs)
    val byCluster = cc.join(
      Curate.hashSplit(cc.select("cluster").distinct(), "cluster",
        Seq(("train", 0.8), ("test", 0.2))), "cluster")
    val splitOf = byCluster.select("v", "split").as[(Long, String)].collect().toMap
    val pairRows = pairs.as[(Long, Long)].collect()
    assert(pairRows.nonEmpty)
    pairRows.foreach { case (a, b) =>
      assert(splitOf(a) === splitOf(b), s"near-dup pair ($a,$b) straddles splits")
    }
    // the contrast: the same coin flipped per doc separates >= 1 pair
    val perDoc = Curate.hashSplit(corpus.select(col("vec_id")), "vec_id",
        Seq(("train", 0.8), ("test", 0.2)))
      .as[(Long, String)].collect().toMap
    assert(pairRows.exists { case (a, b) => perDoc(a) != perDoc(b) },
      "fixture too small to show the per-doc leakage sp2 prevents")
  }

  test("lintConversations: each defect trips its counter; clean chat passes") {
    import spark.implicits._
    val convs = Seq(
      (1L, """[{"role":"user","content":"hi"},{"role":"assistant","content":"hello"}]"""),
      (2L, """[{"role":"assistant","content":"i speak first"}]"""),          // wrong opener
      (3L, """[{"role":"user","content":"a"},{"role":"user","content":"b"},
               {"role":"assistant","content":"c"}]""".replaceAll("\\s+", " ")), // double user turn
      (4L, """[{"role":"user","content":""},{"role":"assistant","content":"x"}]"""), // empty turn
      (5L, "[]")                                                             // degenerate
    ).toDF("conv_id", "conv")
    val got = Curate.lintConversations(convs, "conv").orderBy("conv_id").collect()
    assert(got(0).getAs[Boolean]("lint_pass"))
    assert(!got(1).getAs[Boolean]("first_role_ok") && !got(1).getAs[Boolean]("lint_pass"))
    assert(got(2).getAs[Long]("n_alternation_violations") === 1L)
    assert(got(3).getAs[Long]("n_empty_turns") === 1L)
    assert(got(4).getAs[Long]("n_turns") === 0L)
    assert(!got(4).getAs[Boolean]("first_role_ok"))
    assert(got(4).getAs[Long]("n_alternation_violations") === 0L)
  }

  test("lrQualityScore: hand-computed score; keep flips with the linear sign") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "the of and to" — 4 stopwords of 4 words, all-alpha, mean len 2.5:
    //   alpha_ratio = 1, stopword_ratio = 1, mean_word_len = 2.5, punct = 0
    //   linear = -2 + 3 + 2.5 + 0.375 - 0 = 3.875  -> keep
    // "!!!! ????" — no alpha, no stopwords, mean len 4, punct 8/9:
    //   linear = -2 + 0 + 0 + 0.6 - 4*8/9 = -4.955... -> drop
    val docs = Seq((1L, "the of and to"), (2L, "!!!! ????")).toDF("doc_id", "text")
    val got = Curate.lrQualityScore(docs).orderBy("doc_id")
      .select("doc_id", "lr_linear", "lr_score", "lr_keep").collect()
    assert(math.abs(got(0).getDouble(1) - 3.875) < 1e-12)
    assert(math.abs(got(0).getDouble(2) - 1.0 / (1.0 + math.exp(-3.875))) < 1e-12)
    assert(got(0).getBoolean(3))
    assert(!got(1).getBoolean(3))
    assert(got(1).getDouble(2) < 0.01, "drop doc should score near zero")
  }

  test("kAnonymityReport counts classes exactly; suppression drops exactly the small classes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // class (a,x): 3 rows 2 users; (a,y): 1 row 1 user; (b,x): 2 rows 2 users
    val rows = Seq(
      ("a", "x", 1L), ("a", "x", 1L), ("a", "x", 2L),
      ("a", "y", 3L),
      ("b", "x", 4L), ("b", "x", 5L)).toDF("q1", "q2", "uid")
    val rep = Curate.kAnonymityReport(rows, Seq("q1", "q2"), "uid", k = 2, l = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(rep(("a", "x")) === ((3L, 2L, true, true)))
    assert(rep(("a", "y")) === ((1L, 1L, false, false)))
    assert(rep(("b", "x")) === ((2L, 2L, true, true)))
    // k=2 suppression keeps only classes of size >= 2, rows intact
    val kept = Curate.suppressSmallClasses(rows, Seq("q1", "q2"), 2)
    assert(kept.count() === 5L)
    assert(kept.filter(col("q2") === "y").count() === 0L)
    // suppressed output itself satisfies k-anonymity at the same k
    val rekept = Curate.kAnonymityReport(kept, Seq("q1", "q2"), "uid", 2, 2)
    assert(rekept.filter(!col("k_ok")).count() === 0L)
  }

  test("dsirSelect scores target-like docs above off-target and draws without replacement") {
    import spark.implicits._
    // two disjoint vocabularies: the target corpus speaks 'aqua'; raw
    // holds 6 aqua docs and 6 'zeta' docs with distinct word mixes
    val tgt = (0 until 8).map(i =>
      (1000L + i, s"aqua blue sea wave tide foam aqua blue sea w$i")).toDF("doc_id", "text")
    val raw = ((0 until 6).map(i =>
        (i.toLong, s"aqua blue sea wave tide foam crest r$i")) ++
      (6 until 12).map(i =>
        (i.toLong, s"zeta gamma delta omega sigma kappa r$i"))).toDF("doc_id", "text")
    val scored = Curate.dsirSelect(raw, tgt, k = 12)
    val byId = scored.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_micro")).toMap
    assert(byId.size === 12, "k = n returns every doc exactly once")
    val aquaMin = (0 until 6).map(i => byId(i.toLong)).min
    val zetaMax = (6 until 12).map(i => byId(i.toLong)).max
    assert(aquaMin > zetaMax,
      s"every target-vocab doc must outscore every off-target doc ($aquaMin vs $zetaMax)")
    // top-3 selection is deterministic and all target-like
    val top = Curate.dsirSelect(raw, tgt, k = 3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(top === Curate.dsirSelect(raw, tgt, k = 3).select("doc_id")
      .collect().map(_.getLong(0)).toSet, "selection must be reproducible")
    assert(top.forall(_ < 6L), s"top-3 must be target-like docs, got $top")
  }

  test("weightedSample: subset without replacement, deterministic, weight-monotone") {
    import spark.implicits._
    // one heavy doc (weight 1e9) among unit-weight docs: its key
    // ln(u)/1e9 is within 1e-8 of zero while a unit key needs u >
    // exp(-1e-8) (p < 1e-8 per doc) to compete — the heavy doc wins
    // any k >= 1 sample for ANY coin values
    val rows = ((0 until 20).map(i => (i.toLong, s"doc text $i", 1.0)) :+
      (99L, "heavy doc", 1e9)).toDF("doc_id", "text", "w")
    val s5 = Curate.weightedSample(rows, k = 5, weightCol = "w")
    assert(s5.count() === 5L)
    assert(s5.select("doc_id").distinct().count() === 5L, "no replacement")
    assert(s5.filter(col("doc_id") === 99L).count() === 1L,
      "the overwhelming-weight doc must be drawn")
    assert(s5.join(rows, Seq("doc_id"), "left_anti").isEmpty, "sample is a subset")
    val again = Curate.weightedSample(rows, k = 5, weightCol = "w")
    assert(s5.select("doc_id").exceptAll(again.select("doc_id")).isEmpty,
      "sample must be reproducible")
    // k = n returns everything
    assert(Curate.weightedSample(rows, k = 21, weightCol = "w").count() === 21L)
  }

  test("isotonicCalibration: PAVA pools violating bins to the hand-computed fit") {
    val s = spark
    import s.implicits._
    // bin rates (0.8, 0.2, 0.4) violate monotonicity twice → the whole
    // prefix pools to 14/30; minimax must yield 466666 micro everywhere
    def rows(score: Double, pos: Int, neg: Int) =
      Seq.fill(pos)((score, 1L)) ++ Seq.fill(neg)((score, 0L))
    val scored = (rows(0.05, 8, 2) ++ rows(0.15, 2, 8) ++ rows(0.25, 4, 6))
      .toDF("sc", "y")
    val got = Curate.isotonicCalibration(scored, "sc", "y")
      .orderBy("bucket").collect()
    assert(got.map(_.getAs[Long]("iso_micro")).toSeq ===
      Seq(466666L, 466666L, 466666L))
    // an already-monotone score passes through unchanged
    val mono = (rows(0.05, 2, 8) ++ rows(0.15, 4, 6) ++ rows(0.25, 8, 2))
      .toDF("sc", "y")
    val gm = Curate.isotonicCalibration(mono, "sc", "y")
      .orderBy("bucket").collect().map(_.getAs[Long]("iso_micro")).toSeq
    assert(gm === Seq(200000L, 400000L, 800000L))
    // and the output is always non-decreasing
    assert(gm.zip(gm.tail).forall { case (a, b) => a <= b })
  }

  test("competenceCurriculum: thresholds are the hand-computed quantile ladder; ties admit whole groups") {
    import spark.implicits._
    // difficulties: 1 x10, 2 x10, 3 x10, 4 x10 (n = 40)
    val docs = (0 until 40).map(i => ((i / 10 + 1).toLong)).toDF("diff")
    val got = Curate.competenceCurriculum(docs, col("diff"))
      .orderBy("c_milli").collect()
    assert(got.length === 10)
    def row(c: Long) = got.find(_.getAs[Long]("c_milli") == c).get
    // c=0.2: k=8, the first difficulty group covers it (10 >= 8)
    assert(row(200L).getAs[Long]("k_target") === 8L)
    assert(row(200L).getAs[Long]("threshold_diff") === 1L)
    assert(row(200L).getAs[Long]("n_at_or_below") === 10L)
    // c=0.3: k=12 -> must admit difficulty 2's WHOLE group (20 docs)
    assert(row(300L).getAs[Long]("threshold_diff") === 2L)
    assert(row(300L).getAs[Long]("n_at_or_below") === 20L)
    // c=1.0: everything
    assert(row(1000L).getAs[Long]("threshold_diff") === 4L)
    assert(row(1000L).getAs[Long]("n_at_or_below") === 40L)
    // monotone ladder
    val ths = got.sortBy(_.getAs[Long]("c_milli")).map(_.getAs[Long]("threshold_diff"))
    assert(ths.zip(ths.tail).forall { case (a, b) => a <= b })
  }

  test("lengthBatchingAudit: length grouping never wastes more than hash-random; exact totals") {
    import spark.implicits._
    // one shard, lengths 1 and 9 alternating by id parity: batchSize 2.
    // Length order pairs equal lengths -> zero waste; hash order mixes.
    val docs = (0L until 40L)
      .map(i => (i, "s", (if (i % 2 == 0) "a" else "a " * 9).trim))
      .toDF("doc_id", "src", "text")
    val got = Curate.lengthBatchingAudit(docs, batchSize = 2, shardCol = "src")
      .collect().map(r => r.getAs[String]("strategy") -> r).toMap
    assert(got("length").getAs[Long]("total_tokens") === 20L * 1 + 20L * 9)
    assert(got("length").getAs[Long]("waste_micro") === 0L)
    assert(got("random").getAs[Long]("waste_micro") >=
      got("length").getAs[Long]("waste_micro"))
    assert(got("random").getAs[Long]("n_batches") === 20L)
    // waste accounting identity: padded = total + waste-part
    val r = got("random")
    assert(r.getAs[Long]("padded_tokens") >= r.getAs[Long]("total_tokens"))
  }

  test("preferencePairs: margin-max matching, caps, odd group, zero-margin drop") {
    import spark.implicits._
    val scored = Seq(("s", 1L, 0.9), ("s", 2L, 0.7), ("s", 3L, 0.5),
      ("s", 4L, 0.1), ("t", 5L, 0.8), ("t", 6L, 0.2), ("t", 7L, 0.4),
      ("u", 8L, 0.5), ("u", 9L, 0.5)).toDF("src", "id", "q")
    val got = Curate.preferencePairs(scored, "src", "q", "id")
      .orderBy("src", "pair_rank").collect()
    // group s (n=4): (1 vs 4, margin .8), (2 vs 3, margin .2)
    val sPairs = got.filter(_.getAs[String]("src") == "s")
    assert(sPairs.map(r => (r.getAs[Long]("chosen_id"),
      r.getAs[Long]("rejected_id"), r.getAs[Long]("margin_micro"))).toSeq ===
      Seq((1L, 4L, 800000L), (2L, 3L, 200000L)))
    // group t (n=3): only one pair, middle element unpaired
    val tPairs = got.filter(_.getAs[String]("src") == "t")
    assert(tPairs.map(r => (r.getAs[Long]("chosen_id"),
      r.getAs[Long]("rejected_id"))).toSeq === Seq((5L, 6L)))
    // group u: equal scores -> zero margin -> no preference rows
    assert(!got.exists(_.getAs[String]("src") == "u"))
  }

  test("spanCorruption: deterministic, sentinel-consistent, counts add up") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "one two"), (2L, "")).toDF("doc_id", "text")
    val a = Curate.spanCorruption(docs).orderBy("doc_id").collect()
    val b = Curate.spanCorruption(docs).orderBy("doc_id").collect()
    // md5-coin reproducibility: identical digests run-to-run
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val spans = r.getAs[Long]("n_spans")
      val masked = r.getAs[Long]("n_masked")
      // every span masks 1..3 tokens; masked tokens never exceed the doc
      assert(masked >= spans && masked <= 3 * spans)
      assert(masked <= n)
    }
    // empty doc: zero everything, digests still defined
    val empty = a.find(_.getAs[Long]("doc_id") == 2L).get
    assert(empty.getAs[Long]("n_tokens") === 0L)
    assert(empty.getAs[Long]("n_spans") === 0L)
    assert(empty.getAs[String]("input_md5").nonEmpty)
    // a corpus-sized doc set actually masks something (rate ~10%)
    val big = (0L until 50L)
      .map(i => (i, (1 to 40).map(j => s"tok$j").mkString(" ")))
      .toDF("doc_id", "text")
    val tot = Curate.spanCorruption(big)
      .agg(sum("n_masked"), sum("n_tokens")).head()
    val rate = tot.getLong(0).toDouble / tot.getLong(1)
    assert(rate > 0.03 && rate < 0.25)
  }

  test("prototypePruning: drops the floor share per cluster, easiest first") {
    import spark.implicits._
    val cents = Seq(Similarity.Centroid(0L, Array(1.0, 0.0), 1.0),
      Similarity.Centroid(1L, Array(0.0, 1.0), 1.0))
    // cluster 0: cosines to e1 descend with id; cluster 1: two points
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.8f, 0.3f)), (4L, Seq(0.7f, 0.5f)),
      (10L, Seq(0.0f, 1.0f)), (11L, Seq(0.2f, 0.9f)))
      .toDF("vec_id", "embedding")
    val got = Curate.prototypePruning(vecs, cents, dropMicro = 500000L)
      .orderBy("cell").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq((0L, 4L, 2L, 2L), (1L, 2L, 1L, 1L)))
    // the dropped (prototypical) side has the HIGHER mean cosine
    got.foreach { r =>
      assert(r.getAs[Long]("mean_drop_nano") > r.getAs[Long]("mean_kept_nano"))
    }
    // dropMicro = 0 keeps everything
    val keep = Curate.prototypePruning(vecs, cents, dropMicro = 0L)
      .agg(sum("n_dropped")).head().getLong(0)
    assert(keep === 0L)
  }
}
