package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Classify, Curate, Dedup, Graph, Multimodal, Search, Sessions, Similarity, Text}

/** Registry part 2: the LLM-training-data operators (dedup, similarity,
  * text analysis, multimodal) over `documents`/`embeddings`, plus
  * TPC-H-style relational queries over the star schema that double as
  * the shuffle/join benchmark suite.
  *
  * Oracle notes: everything whose arithmetic is engine-portable gets a
  * DuckDB oracle (md5, integer arithmetic, exact-decimal sums, in-order
  * double division). xxhash64/seeded-RNG operators (minhash, simhash,
  * SRP-LSH) are not SQL-reproducible — they get rows-only checks here
  * and property/recall tests in ScalaTest.
  */
object QueriesOps {

  private def docs(s: SparkSession, d: String) = s.read.parquet(s"$d/documents.parquet")
  private def embs(s: SparkSession, d: String) = s.read.parquet(s"$d/embeddings.parquet")
  private def li(s: SparkSession, d: String) = s.read.parquet(s"$d/lineitem.parquet")

  /** The local fixtures are single parquet files → single-task scans.
    * The hash-heavy per-row operators (minhash/simhash/SRP) are
    * compute-bound maps, so spread them across all cores first — but
    * ONLY when the scan is actually starved for parallelism: on a
    * many-file 100 TB corpus the scan already yields >= one partition
    * per core and this must not inject a gratuitous full shuffle of
    * document text ahead of a narrow signature pass.
    */
  private[graft] def par(df: org.apache.spark.sql.DataFrame) = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Mutual-kNN edges + connected components over the embeddings,
    * computed ONCE per process per data dir and materialized to
    * scratch parquet — the dd7 persist discipline lifted ACROSS
    * queries: kg1 (cluster-size audit) and gr3 (modularity) both read
    * the SAME (d1, d2) edge table and (v, cluster) assignment instead
    * of each re-deriving IVF top-k + mutual filter + fixed-round CC.
    * At 100 TB the component pass dominates the composite, and a
    * production pipeline publishes the clustering once per corpus
    * snapshot for every downstream audit — this memo is that shape at
    * test scale. Returns (edges, components) as fresh parquet reads,
    * so consumers' plans stay session-local and cache-free.
    */
  /** The kg1/gr3 composite with a caller-chosen coarse-cell count and
    * no memo — the BenchScale entry point. The registered queries pin
    * nCells=16 as plan-time literals for the oracle; at real scale the
    * operating rule is cells ∝ corpus (constant cell occupancy), else
    * the all-pairs kNN candidate work is O(n²/cells) — the 10× smoke
    * measured exactly that blowup at fixed cells (a ~79 GB shuffle
    * spill filled the disk) and measures the ∝-scaled rule holding.
    */
  private[graft] def mutualKnnEdgesCc(s: SparkSession, d: String,
                                      nCells: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val e = embs(s, d)
    val knn = Similarity.ivfTopK(par(e), e, k = 5,
        centroids = Similarity.fixedCentroids(nCells, 64))
      .select(col("q_id"), col("n_id"))
    val rev = knn.select(col("n_id").as("q2"), col("q_id").as("n2"))
    val mutual = knn
      .join(rev, col("q_id") === col("q2") && col("n_id") === col("n2"))
      .filter(col("q_id") < col("n_id"))
      .select(col("q_id").as("d1"), col("n_id").as("d2"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val cc = Dedup.connectedComponents(e.select(col("vec_id").as("v")), mutual)
    (mutual, cc)
  }

  private val mutualCcMemo =
    new scala.collection.concurrent.TrieMap[String, (String, String)]()
  private def mutualKnnCc(s: SparkSession, d: String):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val (edir, cdir) = mutualCcMemo.getOrElseUpdate(d, {
      val (mutual, cc) = mutualKnnEdgesCc(s, d, nCells = 16)
      val tag = d.replaceAll("[^A-Za-z0-9.]", "_")
      val ed = Queries.scratch(s"mutual_edges_$tag")
      val cd = Queries.scratch(s"mutual_cc_$tag")
      mutual.write.mode("overwrite").parquet(ed)
      cc.write.mode("overwrite").parquet(cd)
      mutual.unpersist()
      (ed, cd)
    })
    (s.read.parquet(edir), s.read.parquet(cdir))
  }

  /** DuckDB oracle for pg1: the 8 PageRank iterations UNROLLED as
    * chained CTEs (r0..r8) — recursive-CTE SQL cannot aggregate over
    * the recursive relation, but a fixed iteration count needs no
    * recursion at all. Float literals are written as the same
    * expressions Spark evaluates ((1.0 - 0.85), 0.85) so both engines
    * hit identical IEEE operations; the remaining sum-order ulps are
    * absorbed by the comparator (12-significant-digit float canon).
    */
  /** DuckDB oracle for bfs1: the 4 BFS relaxation rounds unrolled
    * (MATERIALIZED — each round references its predecessor twice).
    */
  private val KHopRounds = 4
  private val KHopOracle: String = {
    val base = """WITH ed AS MATERIALIZED (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
      |           user_id AS dst FROM events)
      |  WHERE src IS NOT NULL AND src != dst),
      |nodes AS (SELECT src AS v FROM ed UNION SELECT dst FROM ed),
      |d0 AS MATERIALIZED (SELECT v, CAST(0 AS BIGINT) AS h FROM nodes WHERE v % 50 = 0)""".stripMargin
    val rounds = (1 to KHopRounds).map { k =>
      s""",
         |d$k AS MATERIALIZED (SELECT v, CAST(min(h) AS BIGINT) AS h FROM (
         |  SELECT v, h FROM d${k - 1}
         |  UNION ALL
         |  SELECT ed.dst AS v, p.h + 1 AS h FROM ed JOIN d${k - 1} p ON p.v = ed.src)
         |  GROUP BY v)""".stripMargin
    }.mkString
    base + rounds +
      s"\nSELECT v AS user_id, h AS hops FROM d$KHopRounds ORDER BY user_id"
  }

  private val PageRankIters = 8
  private val PageRankOracle: String = {
    val base = """WITH ed AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
      |           user_id AS dst FROM events)
      |  WHERE src IS NOT NULL AND src != dst),
      |nodes AS (SELECT src AS v FROM ed UNION SELECT dst FROM ed),
      |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM ed GROUP BY src),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |r0 AS (SELECT v, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)""".stripMargin
    val rounds = (1 to PageRankIters).map { k =>
      s""",
         |r$k AS (
         |  SELECT n.v,
         |    ((1.0 - 0.85) / nn.n) + 0.85 * (COALESCE(c.contrib, 0) + dm.mass / nn.n) AS pr
         |  FROM nodes n
         |  CROSS JOIN nn
         |  CROSS JOIN (SELECT COALESCE(sum(p.pr), 0) AS mass FROM r${k - 1} p
         |              LEFT JOIN deg dg ON dg.src = p.v WHERE dg.src IS NULL) dm
         |  LEFT JOIN (SELECT ed.dst AS cv, sum(p.pr / dg.od) AS contrib
         |             FROM ed JOIN r${k - 1} p ON p.v = ed.src
         |             JOIN deg dg ON dg.src = ed.src GROUP BY ed.dst) c ON c.cv = n.v)""".stripMargin
    }.mkString
    base + rounds +
      s"\nSELECT v AS user_id, pr FROM r$PageRankIters ORDER BY user_id"
  }

  /** DuckDB oracle for ppr1: [[PageRankOracle]] with teleport AND
    * dangling mass restarting on the seed set (v % 50 = 0, bfs1's seed
    * rule) — same unrolled rounds, same operand order per term.
    */
  // 6 rounds (vs pg1's 8): restart mass re-concentrates every round so
  // PPR's geometric convergence is FASTER than global PageRank's, and
  // the bench cost is per-round fixed overhead (the hits1 right-sizing
  // precedent). The oracle unrolls the same constant.
  private val PprIters = 6
  private val PprOracle: String = {
    val base = """WITH ed AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
      |           user_id AS dst FROM events)
      |  WHERE src IS NOT NULL AND src != dst),
      |nodes AS (SELECT src AS v FROM ed UNION SELECT dst FROM ed),
      |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM ed GROUP BY src),
      |fl AS MATERIALIZED (SELECT n.v,
      |    CASE WHEN n.v % 50 = 0 THEN 1.0 ELSE 0.0 END AS sflag FROM nodes n),
      |ns AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM fl WHERE sflag > 0.0),
      |r0 AS (SELECT v, sflag / ns.ns AS pr FROM fl CROSS JOIN ns)""".stripMargin
    val rounds = (1 to PprIters).map { k =>
      s""",
         |r$k AS (
         |  SELECT f.v,
         |    ((1.0 - 0.85) * f.sflag / ns.ns) + 0.85 * (COALESCE(c.contrib, 0)
         |      + dm.mass * f.sflag / ns.ns) AS pr
         |  FROM fl f
         |  CROSS JOIN ns
         |  CROSS JOIN (SELECT COALESCE(sum(p.pr), 0) AS mass FROM r${k - 1} p
         |              LEFT JOIN deg dg ON dg.src = p.v WHERE dg.src IS NULL) dm
         |  LEFT JOIN (SELECT ed.dst AS cv, sum(p.pr / dg.od) AS contrib
         |             FROM ed JOIN r${k - 1} p ON p.v = ed.src
         |             JOIN deg dg ON dg.src = ed.src GROUP BY ed.dst) c ON c.cv = f.v)"""
        .stripMargin
    }.mkString
    base + rounds +
      s"\nSELECT v AS user_id, pr FROM r$PprIters ORDER BY user_id"
  }

  /** DuckDB oracle for rg1: clipped n-gram overlap per (ref, cand)
    * pair, both n legs unioned; totals come from token-list lengths,
    * all P/R/F1 divisions exact-integer micro.
    */
  private def rg1Sql(ns: Seq[Int] = Seq(1, 2)): String = {
    val base = """WITH p AS MATERIALIZED (SELECT CAST(a.doc_id // 2 AS BIGINT) AS pid,
      |    list_filter(string_split(lower(a.text), ' '), x -> length(x) > 0) AS rt,
      |    list_filter(string_split(lower(b.text), ' '), x -> length(x) > 0) AS ct
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 2 = 0)""".stripMargin
    val legs = ns.map { n =>
      s""",
         |rc$n AS (SELECT pid, array_to_string(list_slice(rt, i, i + ${n - 1}), ' ') AS g,
         |    CAST(count(*) AS BIGINT) AS rc
         |  FROM p, unnest(generate_series(1, len(rt) - ${n - 1})) AS a(i) GROUP BY 1, 2),
         |cc$n AS (SELECT pid, array_to_string(list_slice(ct, i, i + ${n - 1}), ' ') AS g,
         |    CAST(count(*) AS BIGINT) AS cc
         |  FROM p, unnest(generate_series(1, len(ct) - ${n - 1})) AS a(i) GROUP BY 1, 2),
         |ov$n AS (SELECT pid, CAST(sum(least(rc, cc)) AS BIGINT) AS ov
         |  FROM rc$n JOIN cc$n USING (pid, g) GROUP BY pid),
         |lg$n AS (SELECT CAST($n AS BIGINT) AS n, p.pid,
         |    CAST(coalesce(ov$n.ov, 0) AS BIGINT) AS overlap,
         |    CAST(greatest(0, len(rt) - ${n - 1}) AS BIGINT) AS ref_grams,
         |    CAST(greatest(0, len(ct) - ${n - 1}) AS BIGINT) AS cand_grams
         |  FROM p LEFT JOIN ov$n ON ov$n.pid = p.pid)""".stripMargin
    }.mkString
    val union = ns.map(n => s"SELECT * FROM lg$n").mkString(" UNION ALL ")
    base + legs +
      s""",
         |u AS ($union)
         |SELECT n, pid, overlap, ref_grams, cand_grams,
         |  CASE WHEN cand_grams = 0 THEN 0
         |       ELSE (overlap * 1000000) // cand_grams END AS precision_micro,
         |  CASE WHEN ref_grams = 0 THEN 0
         |       ELSE (overlap * 1000000) // ref_grams END AS recall_micro,
         |  CASE WHEN ref_grams + cand_grams = 0 THEN 0
         |       ELSE (2 * overlap * 1000000) // (ref_grams + cand_grams) END AS f1_micro
         |FROM u ORDER BY n, pid""".stripMargin
  }

  /** DuckDB oracle for bl1: per-n clipped-match legs over the rg1
    * pairing, then the single fixed-order BLEU double (mirrors
    * [[graft.ops.Text.bleu]]'s expression order exactly).
    */
  private def bl1Sql(maxN: Int = 4): String = {
    val base = """WITH p AS MATERIALIZED (SELECT CAST(a.doc_id // 2 AS BIGINT) AS pid,
      |    list_filter(string_split(lower(a.text), ' '), x -> length(x) > 0) AS rt,
      |    list_filter(string_split(lower(b.text), ' '), x -> length(x) > 0) AS ct
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 2 = 0)""".stripMargin
    val legs = (1 to maxN).map { n =>
      s""",
         |rc$n AS (SELECT pid, array_to_string(list_slice(rt, i, i + ${n - 1}), ' ') AS g,
         |    CAST(count(*) AS BIGINT) AS rc
         |  FROM p, unnest(generate_series(1, len(rt) - ${n - 1})) AS a(i) GROUP BY 1, 2),
         |cc$n AS (SELECT pid, array_to_string(list_slice(ct, i, i + ${n - 1}), ' ') AS g,
         |    CAST(count(*) AS BIGINT) AS cc
         |  FROM p, unnest(generate_series(1, len(ct) - ${n - 1})) AS a(i) GROUP BY 1, 2),
         |mm$n AS (SELECT pid, CAST(sum(least(rc, cc)) AS BIGINT) AS m
         |  FROM rc$n JOIN cc$n USING (pid, g) GROUP BY pid)""".stripMargin
    }.mkString
    val mcols = (1 to maxN).map(n =>
      s"CAST(coalesce(mm$n.m, 0) AS BIGINT) AS m_$n," +
      s" CAST(greatest(0, len(ct) - ${n - 1}) AS BIGINT) AS c_$n").mkString(",\n|  ")
    val joins = (1 to maxN).map(n => s"LEFT JOIN mm$n ON mm$n.pid = p.pid").mkString(" ")
    val allPos = (1 to maxN).map(n => s"m_$n > 0 AND c_$n > 0").mkString(" AND ")
    val logSum = (1 to maxN).map(n =>
      s"ln(CAST(m_$n AS DOUBLE) / CAST(c_$n AS DOUBLE))").mkString(" + ")
    base + legs +
      s""",
         |f AS (SELECT p.pid, CAST(len(rt) AS BIGINT) AS ref_len,
         |  CAST(len(ct) AS BIGINT) AS cand_len,
         |  $mcols
         |  FROM p $joins)
         |SELECT pid, ref_len, cand_len,
         |  ${(1 to maxN).map(n => s"m_$n, c_$n").mkString(", ")},
         |  CASE WHEN $allPos THEN
         |    CAST(floor((CASE WHEN cand_len >= ref_len THEN 1.0
         |        ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / CAST(cand_len AS DOUBLE)) END)
         |      * exp(($logSum) / ${maxN.toDouble}) * 1e9 + 0.5) AS BIGINT)
         |  ELSE 0 END AS bleu_nano
         |FROM f ORDER BY pid""".stripMargin
  }

  /** DuckDB oracle for chf1: character-n-gram legs over whitespace-
    * stripped text; with beta^2 = 4 every score column is exact
    * integer division (mirrors [[graft.ops.Text.chrF]]).
    */
  private def chf1Sql(maxN: Int = 3): String = {
    val base = """WITH p AS MATERIALIZED (SELECT CAST(a.doc_id // 2 AS BIGINT) AS pid,
      |    replace(lower(a.text), ' ', '') AS rs,
      |    replace(lower(b.text), ' ', '') AS cs
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 2 = 0)""".stripMargin
    val legs = (1 to maxN).map { n =>
      s""",
         |rc$n AS (SELECT pid, substr(rs, i, $n) AS g, CAST(count(*) AS BIGINT) AS rc
         |  FROM p, unnest(generate_series(1, length(rs) - ${n - 1})) AS a(i) GROUP BY 1, 2),
         |cc$n AS (SELECT pid, substr(cs, i, $n) AS g, CAST(count(*) AS BIGINT) AS cc
         |  FROM p, unnest(generate_series(1, length(cs) - ${n - 1})) AS a(i) GROUP BY 1, 2),
         |mm$n AS (SELECT pid, CAST(sum(least(rc, cc)) AS BIGINT) AS m
         |  FROM rc$n JOIN cc$n USING (pid, g) GROUP BY pid),
         |lg$n AS (SELECT CAST($n AS BIGINT) AS n, p.pid,
         |    CAST(coalesce(mm$n.m, 0) AS BIGINT) AS matched,
         |    CAST(greatest(0, length(rs) - ${n - 1}) AS BIGINT) AS r_grams,
         |    CAST(greatest(0, length(cs) - ${n - 1}) AS BIGINT) AS c_grams
         |  FROM p LEFT JOIN mm$n ON mm$n.pid = p.pid)""".stripMargin
    }.mkString
    val union = (1 to maxN).map(n => s"SELECT * FROM lg$n").mkString(" UNION ALL ")
    base + legs +
      s""",
         |u AS (SELECT *,
         |    CASE WHEN 4 * r_grams + c_grams = 0 THEN 0
         |         ELSE (5 * matched * 1000000) // (4 * r_grams + c_grams)
         |    END AS f_micro
         |  FROM ($union)),
         |smry AS (SELECT pid, CAST(sum(f_micro) // $maxN AS BIGINT) AS chrf_micro
         |  FROM u GROUP BY pid)
         |SELECT u.n, u.pid, u.matched, u.r_grams, u.c_grams,
         |  CAST(u.f_micro AS BIGINT) AS f_micro, smry.chrf_micro
         |FROM u JOIN smry ON smry.pid = u.pid ORDER BY u.n, u.pid""".stripMargin
  }

  /** DuckDB oracle for hits1: [[HitsIters]] HITS rounds unrolled (MATERIALIZED —
    * each normalizer subquery re-reads its round's raw table). L1
    * normalization; zero-valued nodes add exact 0.0 to every sum, so
    * both engines normalize by the same value (mod float order, which
    * the comparator's 12-significant-digit float canon absorbs — same contract as pg1).
    */
  // 5 rounds: HITS converges geometrically (second-eigenvalue ratio);
  // the bench cost is per-round FIXED overhead (2 joins + 2 in-plan
  // normalizers + persist/count each round — structural, not data), so
  // rounds are the knob. The oracle unrolls the same constant.
  private val HitsIters = 5
  private val HitsOracle: String = {
    val base = """WITH ed AS MATERIALIZED (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
      |           user_id AS dst FROM events)
      |  WHERE src IS NOT NULL AND src != dst),
      |nodes AS MATERIALIZED (SELECT src AS v FROM ed UNION SELECT dst FROM ed),
      |h0 AS (SELECT v, 1.0 AS h FROM nodes)""".stripMargin
    val rounds = (1 to HitsIters).map { k =>
      s""",
         |ra$k AS MATERIALIZED (SELECT ed.dst AS v, sum(p.h) AS r
         |  FROM ed JOIN h${k - 1} p ON p.v = ed.src GROUP BY 1),
         |a$k AS MATERIALIZED (SELECT n.v,
         |    coalesce(r.r, 0) / (SELECT sum(r) FROM ra$k) AS a
         |  FROM nodes n LEFT JOIN ra$k r ON r.v = n.v),
         |rh$k AS MATERIALIZED (SELECT ed.src AS v, sum(p.a) AS r
         |  FROM ed JOIN a$k p ON p.v = ed.dst GROUP BY 1),
         |h$k AS MATERIALIZED (SELECT n.v,
         |    coalesce(r.r, 0) / (SELECT sum(r) FROM rh$k) AS h
         |  FROM nodes n LEFT JOIN rh$k r ON r.v = n.v)""".stripMargin
    }.mkString
    base + rounds +
      s"""
         |SELECT h.v AS user_id, h.h AS hub, a.a AS authority
         |FROM h$HitsIters h JOIN a$HitsIters a ON a.v = h.v
         |ORDER BY user_id""".stripMargin
  }

  /** DuckDB oracle for as1: undirected-degree Pearson over both edge
    * orientations — exact decimal moments, one double division.
    */
  private val AssortativityOracle: String =
    """WITH ed AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
      |           user_id AS dst FROM events)
      |  WHERE src IS NOT NULL AND src != dst),
      |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM ed),
      |deg AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS deg
      |  FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
      |p AS (SELECT dx.deg AS x, dy.deg AS y
      |  FROM und JOIN deg dx ON dx.v = und.a JOIN deg dy ON dy.v = und.b),
      |bo AS (SELECT x, y FROM p UNION ALL SELECT y, x FROM p),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m,
      |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
      |    sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy
      |  FROM bo)
      |SELECT nn.n_nodes, m // 2 AS n_edges,
      |  CASE WHEN CAST(m AS DECIMAL(38,0)) * sxx - sx * sx = 0 THEN 0.0
      |  ELSE round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
      |  END AS assortativity
      |FROM m, nn""".stripMargin

  /** DuckDB oracle for bpe1/bpe2: the BPE merge loop UNROLLED as
    * chained CTEs, mirroring [[graft.ops.Bpe.learnMerges]] round for
    * round. Each round: pairs from the current word table (1-indexed
    * lateral list walk), argmax under (count desc, pair asc), literal
    * string replace — the replace's left-to-right non-overlapping
    * semantics are identical in the JVM and DuckDB, so the greedy
    * within-word merge order matches exactly. Integer counts
    * throughout; no float enters any decision.
    */
  private val BpeMergeRounds = 8
  private[graft] def bpeWordCtes(rounds: Int): String = {
    val base = """WITH w0 AS (
      |  SELECT w, ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' ' AS s, cnt
      |  FROM (SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
      |        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
      |        WHERE len(tok) > 0 GROUP BY tok))""".stripMargin
    val loop = (1 to rounds).map { k =>
      s""",
         |p$k AS (
         |  SELECT l[u.i] AS p1, l[u.i+1] AS p2, CAST(sum(cnt) AS BIGINT) AS pair_cnt
         |  FROM (SELECT string_split(trim(s), '  ') AS l, cnt FROM w${k - 1}) t,
         |       unnest(generate_series(1, len(t.l)-1)) AS u(i)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT p1, p2, pair_cnt FROM p$k
         |        ORDER BY pair_cnt DESC, p1, p2 LIMIT 1),
         |w$k AS (SELECT w,
         |  replace(s, ' ' || b.p1 || '  ' || b.p2 || ' ',
         |             ' ' || b.p1 || b.p2 || ' ') AS s, cnt
         |  FROM w${k - 1}, b$k b)""".stripMargin
    }.mkString
    base + loop
  }
  /** DuckDB oracle for wp3: the BPE word CTEs with the likelihood
    * argmax — per round, unit counts beside pair counts and the
    * floored pico-scaled score `(pair·1e12) // (c1·c2)` in HUGEINT,
    * ties lexicographic; same literal-replace rewrite.
    */
  private val WpMergesOracle: String = {
    val base = """WITH w0 AS (
      |  SELECT w, ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' ' AS s, cnt
      |  FROM (SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
      |        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
      |        WHERE len(tok) > 0 GROUP BY tok))""".stripMargin
    val loop = (1 to BpeMergeRounds).map { k =>
      s""",
         |pw$k AS MATERIALIZED (
         |  SELECT l[u.i] AS p1, l[u.i+1] AS p2, CAST(sum(cnt) AS BIGINT) AS pair_cnt
         |  FROM (SELECT string_split(trim(s), '  ') AS l, cnt FROM w${k - 1}) t,
         |       unnest(generate_series(1, len(t.l)-1)) AS u(i)
         |  GROUP BY 1, 2),
         |un$k AS MATERIALIZED (
         |  SELECT l[u.i] AS u, CAST(sum(cnt) AS BIGINT) AS ucnt
         |  FROM (SELECT string_split(trim(s), '  ') AS l, cnt FROM w${k - 1}) t,
         |       unnest(generate_series(1, len(t.l))) AS u(i)
         |  GROUP BY 1),
         |bw$k AS (SELECT p1, p2, pair_cnt,
         |    CAST((CAST(pair_cnt AS HUGEINT) * 1000000000000)
         |      // (CAST(c1.ucnt AS HUGEINT) * c2.ucnt) AS BIGINT) AS score_pico
         |  FROM pw$k JOIN un$k c1 ON c1.u = pw$k.p1
         |  JOIN un$k c2 ON c2.u = pw$k.p2
         |  ORDER BY score_pico DESC, p1, p2 LIMIT 1),
         |w$k AS MATERIALIZED (SELECT w,
         |  replace(s, ' ' || b.p1 || '  ' || b.p2 || ' ',
         |             ' ' || b.p1 || b.p2 || ' ') AS s, cnt
         |  FROM w${k - 1}, bw$k b)""".stripMargin
    }.mkString
    base + loop + "\n" +
      (1 to BpeMergeRounds).map { k =>
        s"SELECT $k AS step, p1, p2, pair_cnt, score_pico FROM bw$k"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY step")
  }

  private val BpeMergesOracle: String =
    bpeWordCtes(BpeMergeRounds) + "\n" +
      (1 to BpeMergeRounds).map { k =>
        s"SELECT $k AS step, p1, p2, pair_cnt FROM b$k"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY step")
  private val BpeSegmentOracle: String =
    bpeWordCtes(BpeMergeRounds) +
      s"""
         |SELECT w, cnt,
         |  CAST(len(string_split(trim(s), '  ')) AS INTEGER) AS n_pieces,
         |  replace(trim(s), '  ', ',') AS pieces_csv
         |FROM w$BpeMergeRounds ORDER BY w""".stripMargin
  private val BpeTokenizeOracle: String =
    bpeWordCtes(BpeMergeRounds) +
      s""",
         |pieces AS (SELECT w,
         |  CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS np,
         |  replace(trim(s), '  ', ',') AS csv FROM w$BpeMergeRounds),
         |tk AS (SELECT doc_id,
         |    string_split(lower(text), ' ')[u.i] AS tok, u.i AS i
         |  FROM documents,
         |    unnest(generate_series(1, len(string_split(lower(text), ' ')))) u(i))
         |SELECT tk.doc_id, CAST(sum(p.np) AS BIGINT) AS n_pieces,
         |  md5(string_agg(p.csv, ',' ORDER BY tk.i)) AS pieces_md5
         |FROM tk JOIN pieces p ON p.w = tk.tok
         |WHERE len(tk.tok) > 0
         |GROUP BY tk.doc_id ORDER BY tk.doc_id""".stripMargin

  /** DuckDB oracle for lp1: the synchronous label-propagation rounds
    * unrolled as CTEs over the same undirected handoff edges as pg1.
    * Every round is `argmax_(count desc, label asc)` over neighbor
    * labels — integer decisions only, bit-identical across engines.
    */
  private val LabelPropRounds = 5
  private val LabelPropOracle: String = {
    val base = """WITH ed AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
      |           user_id AS dst FROM events)
      |  WHERE src IS NOT NULL AND src != dst),
      |und AS (SELECT src AS a, dst AS b FROM ed UNION SELECT dst, src FROM ed),
      |l0 AS (SELECT DISTINCT a AS v, a AS lbl FROM und)""".stripMargin
    val rounds = (1 to LabelPropRounds).map { k =>
      s""",
         |l$k AS (SELECT a AS v, lbl FROM (
         |  SELECT u.a, l.lbl,
         |    row_number() OVER (PARTITION BY u.a
         |      ORDER BY count(*) DESC, l.lbl ASC) AS rn
         |  FROM und u JOIN l${k - 1} l ON l.v = u.b
         |  GROUP BY u.a, l.lbl) WHERE rn = 1)""".stripMargin
    }.mkString
    base + rounds +
      s"\nSELECT v AS user_id, lbl AS label FROM l$LabelPropRounds ORDER BY user_id"
  }

  /** DuckDB oracle for pca1/pca2: the quantized-covariance power
    * iteration unrolled. Integer moments are order-free; every float
    * step is an explicit ascending left fold
    * (`list_reduce(list_prepend(0.0, …))`) mirroring the Scala loops
    * in [[graft.ops.Pca]] — bit-identical, no rounding needed.
    */
  private val PcaDim = 64
  private val PcaIters = 12
  private def pcaCtePrefix: String = {
    val D = PcaDim
    val base = s"""WITH e AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd FROM embeddings),
      |g AS (SELECT max(list_reduce(list_prepend(0.0,
      |  list_transform(xd, x -> abs(x))), (a,b) -> greatest(a,b))) AS gmax FROM e),
      |q AS (SELECT vec_id, list_transform(xd,
      |  x -> CAST(round(x / g.gmax * 127.0) AS BIGINT)) AS qv FROM e, g),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
      |s1 AS (SELECT u.i AS i, sum(qv[u.i]) AS s
      |  FROM q, unnest(generate_series(1, $D)) u(i) GROUP BY u.i),
      |s2 AS (SELECT u.i AS i, w.j AS j, sum(qv[u.i]*qv[w.j]) AS s
      |  FROM q, unnest(generate_series(1, $D)) u(i),
      |       unnest(generate_series(1, $D)) w(j)
      |  GROUP BY u.i, w.j),
      |cm AS (SELECT list(cr ORDER BY i) AS m FROM (
      |  SELECT s2.i AS i,
      |    list(CAST(nn.n * s2.s - a.s * b.s AS DOUBLE) ORDER BY s2.j) AS cr
      |  FROM s2, nn, s1 a, s1 b WHERE a.i = s2.i AND b.i = s2.j
      |  GROUP BY s2.i)),
      |v0 AS (SELECT list_transform(generate_series(1, $D),
      |  x -> 1.0 / sqrt(${D}.0)) AS v)""".stripMargin
    val rounds = (1 to PcaIters).map { k =>
      s""",
         |w$k AS (SELECT list_transform(generate_series(1, $D), i ->
         |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, $D),
         |    j -> m[i][j] * v[j])), (a,b) -> a + b)) AS w
         |  FROM cm, v${k - 1}),
         |v$k AS (SELECT list_transform(w, x -> x / sqrt(
         |  list_reduce(list_prepend(0.0, list_transform(w, y -> y*y)),
         |    (a,b) -> a + b))) AS v FROM w$k)""".stripMargin
    }.mkString
    val fin = s""",
      |wf AS (SELECT list_transform(generate_series(1, $D), i ->
      |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, $D),
      |    j -> m[i][j] * v[j])), (a,b) -> a + b)) AS w
      |  FROM cm, v$PcaIters),
      |fin AS (SELECT v, list_reduce(list_prepend(0.0,
      |  list_transform(generate_series(1, $D), i -> v[i] * w[i])),
      |  (a,b) -> a + b) AS eig FROM v$PcaIters, wf)""".stripMargin
    base + rounds + fin
  }
  private val PcaComponentOracle: String = pcaCtePrefix + s"""
    |SELECT u.i - 1 AS dim_idx, v[u.i] AS loading, eig AS eigval
    |FROM fin, unnest(generate_series(1, $PcaDim)) u(i)
    |ORDER BY dim_idx""".stripMargin
  private val PcaProjectOracle: String = pcaCtePrefix + s"""
    |SELECT q.vec_id, list_reduce(list_prepend(0.0,
    |  list_transform(generate_series(1, $PcaDim),
    |    j -> CAST(qv[j] AS DOUBLE) * v[j])), (a,b) -> a + b) AS score
    |FROM q, fin WHERE q.vec_id < 100 ORDER BY q.vec_id""".stripMargin

  /** tx13's full Gopher-rule recompute — shared verbatim by fa1's
    * attribution oracle (wrapped as a subquery there).
    */
  private val GopherOracle: String = """WITH t AS (
    |  SELECT doc_id, text,
    |         string_split(text, ' ') AS w,
    |         string_split(text, chr(10)) AS l
    |  FROM documents),
    |f AS (
    |  SELECT doc_id,
    |    len(w) AS n_words,
    |    CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w) AS mean_len,
    |    CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE) / len(w) AS hash_ratio,
    |    CAST((len(text) - len(replace(text, '...', ''))) / 3 AS DOUBLE) / len(w) AS ell_ratio,
    |    CAST(len(list_filter(l, x -> regexp_matches(x, '^\s*[-*•]'))) AS DOUBLE) / len(l) AS bullet_frac,
    |    CAST(len(list_filter(l, x -> regexp_matches(x, '\.\.\.\s*$'))) AS DOUBLE) / len(l) AS ell_line_frac,
    |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(w) AS alpha_frac,
    |    len(list_distinct(list_filter(w, x ->
    |      list_contains(['the','be','to','of','and','that','have','with'], lower(x))))) AS stop_hits,
    |    1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l) AS dup_line_frac
    |  FROM t)
    |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
    |  n_words BETWEEN 50 AND 100000 AS r_word_count,
    |  mean_len BETWEEN 3.0 AND 10.0 AS r_mean_word_len,
    |  hash_ratio < 0.1 AS r_hash_ratio,
    |  ell_ratio < 0.1 AS r_ellipsis_ratio,
    |  bullet_frac < 0.9 AS r_bullet_lines,
    |  ell_line_frac < 0.3 AS r_ellipsis_lines,
    |  alpha_frac >= 0.8 AS r_alpha_words,
    |  stop_hits >= 2 AS r_stopwords,
    |  dup_line_frac < 0.3 AS r_dup_lines,
    |  (n_words BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
    |    AND hash_ratio < 0.1 AND ell_ratio < 0.1 AND bullet_frac < 0.9
    |    AND ell_line_frac < 0.3 AND alpha_frac >= 0.8 AND stop_hits >= 2
    |    AND dup_line_frac < 0.3 AS gopher_keep
    |FROM f ORDER BY doc_id""".stripMargin

  /** The nine individual Gopher rule columns (gopher_keep excluded) —
    * shared by tx13's projection and fa1's attribution melt.
    */
  private val GopherRuleCols: Seq[String] = Seq("r_word_count",
    "r_mean_word_len", "r_hash_ratio", "r_ellipsis_ratio",
    "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
    "r_dup_lines")

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private val discPrice = dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))

  /** DuckDB oracle for ev1: the retrieval-metrics harness restated in
    * SQL, with the nDCG rank discounts inlined as the SAME driver-
    * computed double literals [[graft.ops.Search.ndcgDiscounts]] feeds
    * the Spark plan (Double.toString round-trips, so both engines
    * consume bit-identical discounts — no engine evaluates a log).
    */
  private val EvalTerms = Seq("spark", "join", "stream", "query")
  private val EvalK = 10
  private val RetrievalMetricsOracle: String = {
    val tfCols = EvalTerms.zipWithIndex.map { case (t, i) =>
      s"|    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = '$t')) AS BIGINT) AS tf_$i"
    }.mkString(",\n")
    val dfCols = EvalTerms.indices.map(i =>
      s"|    CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i").mkString(",\n")
    val longArms = EvalTerms.indices.map(i =>
      s"|  SELECT id, dl, $i AS tidx, tf_$i AS tf FROM base WHERE tf_$i > 0").mkString("\n|  UNION ALL\n")
    val termList = EvalTerms.map(t => s"'$t'").mkString(", ")
    val dfList = EvalTerms.indices.map(i => s"s.df_$i").mkString(", ")
    val discRows = graft.ops.Search.ndcgDiscounts(EvalK).zipWithIndex
      .map { case (w, i) => s"(${i + 1}, ${java.lang.Double.toString(w)})" }.mkString(", ")
    s"""WITH base AS (
      |  SELECT doc_id AS id,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
      $tfCols
      |  FROM documents),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
      $dfCols
      |  FROM base),
      |long0 AS (
      $longArms),
      |scored AS (
      |  SELECT [$termList][tidx + 1] AS term, id,
      |    CAST(least(tf, 3) AS INTEGER) AS rel,
      |    ln((CAST(n_docs AS DOUBLE) - dfv + 0.5) / (dfv + 0.5) + 1.0)
      |      * (CAST(tf AS DOUBLE) * 2.2)
      |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |          (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS score
      |  FROM (SELECT l.*, s.n_docs, s.sum_dl,
      |          CAST([$dfList][l.tidx + 1] AS DOUBLE) AS dfv
      |        FROM long0 l, stats s)),
      |disc(drk, w) AS (VALUES $discRows),
      |run AS (SELECT term, id, rel,
      |    CAST(row_number() OVER (PARTITION BY term ORDER BY score DESC, id) AS INTEGER) AS rk
      |  FROM scored),
      |runagg AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS n_retrieved,
      |    CAST(sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_k,
      |    CAST(sum(CAST(floor(CAST([0.0, 1.0, 3.0, 7.0][rel + 1] AS DOUBLE) * w * 1e12 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS dcg_pico,
      |    min(CASE WHEN rel >= 2 THEN rk END) AS first_rel
      |  FROM run JOIN disc ON disc.drk = run.rk WHERE rk <= $EvalK GROUP BY 1),
      |ideal AS (SELECT term, rel,
      |    CAST(row_number() OVER (PARTITION BY term ORDER BY rel DESC, id) AS INTEGER) AS rk
      |  FROM scored),
      |idealagg AS (
      |  SELECT term,
      |    CAST(sum(CAST(floor(CAST([0.0, 1.0, 3.0, 7.0][rel + 1] AS DOUBLE) * w * 1e12 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS idcg_pico
      |  FROM ideal JOIN disc ON disc.drk = ideal.rk WHERE rk <= $EvalK GROUP BY 1),
      |totals AS (SELECT term,
      |    CAST(sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_total
      |  FROM scored GROUP BY 1)
      |SELECT r.term, r.n_retrieved, t.n_rel_total, r.n_rel_at_k,
      |  CASE WHEN i.idcg_pico > 0
      |    THEN CAST(r.dcg_pico AS DOUBLE) / CAST(i.idcg_pico AS DOUBLE) ELSE 0.0 END AS ndcg,
      |  CASE WHEN r.first_rel IS NOT NULL
      |    THEN 1.0 / CAST(r.first_rel AS DOUBLE) ELSE 0.0 END AS mrr,
      |  CAST(r.n_rel_at_k AS DOUBLE) / 10.0 AS p_at_k,
      |  CASE WHEN t.n_rel_total > 0
      |    THEN CAST(r.n_rel_at_k AS DOUBLE) / CAST(t.n_rel_total AS DOUBLE) ELSE 0.0 END AS r_at_k
      |FROM runagg r JOIN idealagg i ON i.term = r.term JOIN totals t ON t.term = r.term
      |ORDER BY r.term""".stripMargin
  }

  /** DuckDB oracle for kc1: the synchronous k-core peel UNROLLED as
    * chained CTEs (same discipline as [[PageRankOracle]] — a fixed
    * round count needs no recursion). Every decision is an integer
    * degree count, so the match is exact.
    */
  private val KCoreK = 2
  private val KCoreRounds = 8
  private val KCoreOracle: String = {
    // every e_r is referenced 3× by round r+1 — MATERIALIZED stops
    // the default CTE inlining from expanding the chain exponentially
    val base = """WITH ed AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
      |           user_id AS dst FROM events)
      |  WHERE src IS NOT NULL AND src != dst),
      |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM ed)""".stripMargin
    val rounds = (1 to KCoreRounds).map { r =>
      s""",
         |d$r AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) GROUP BY 1),
         |k$r AS MATERIALIZED (SELECT v FROM d$r WHERE deg >= $KCoreK),
         |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
         |        JOIN k$r x ON e.a = x.v JOIN k$r y ON e.b = y.v)""".stripMargin
    }.mkString
    base + rounds +
      s"""
         |SELECT v, CAST(count(*) AS BIGINT) AS core_deg FROM (
         |  SELECT a AS v FROM e$KCoreRounds UNION ALL SELECT b FROM e$KCoreRounds)
         |GROUP BY 1 ORDER BY v""".stripMargin
  }

  /** DuckDB oracle for aa1: Adamic–Adar over the same handoff graph as
    * kc1, with the pico 1/ln(deg) weights inlined as the SAME literals
    * [[graft.ops.Graph.adamicAdarWeights]] feeds the Spark plan.
    */
  private val AaMaxDeg = 64
  private val AaTopK = 20
  private val AdamicAdarOracle: String = {
    val w = graft.ops.Graph.adamicAdarWeights(AaMaxDeg).mkString("[", ", ", "]")
    s"""WITH ed AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
      |           user_id AS dst FROM events)
      |  WHERE src IS NOT NULL AND src != dst),
      |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM ed),
      |adj AS (SELECT a AS w, b AS x FROM und UNION ALL SELECT b, a FROM und),
      |dg AS (SELECT w, CAST(count(*) AS INTEGER) AS deg FROM adj GROUP BY 1),
      |md AS MATERIALIZED (SELECT adj.w, adj.x, CAST($w[deg - 1] AS BIGINT) AS wq
      |  FROM adj JOIN dg USING (w) WHERE deg BETWEEN 2 AND $AaMaxDeg),
      |pr AS (SELECT l.x AS u, r.x AS v, CAST(count(*) AS BIGINT) AS n_common,
      |    CAST(sum(l.wq) AS BIGINT) AS score_pico
      |  FROM md l JOIN md r ON l.w = r.w AND l.x < r.x GROUP BY 1, 2),
      |nv AS (SELECT pr.* FROM pr LEFT JOIN und ON pr.u = und.a AND pr.v = und.b
      |  WHERE und.a IS NULL)
      |SELECT u, v, n_common, round(CAST(score_pico AS DOUBLE) / 1e12, 6) AS score
      |FROM nv ORDER BY score_pico DESC, u, v LIMIT $AaTopK""".stripMargin
  }

  /** DuckDB oracle for bf1: the Benford audit with the nine expected
    * shares inlined as the SAME driver-computed double literals
    * [[graft.ops.Stats.benfordExpected]] feeds the Spark plan (the
    * ndcgDiscounts discipline — no engine evaluates a log10).
    */
  private val BenfordOracle: String = {
    val probs = graft.ops.Stats.benfordExpected
      .map(java.lang.Double.toString).mkString("[", ", ", "]")
    s"""WITH dg AS (SELECT CAST(substr(CAST(CAST(floor(l_extendedprice * 100.0 + 0.5)
      |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM lineitem WHERE l_extendedprice > 0),
      |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_d FROM dg GROUP BY 1),
      |nn AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM c),
      |cell AS (SELECT digit, n_d, n,
      |    CAST($probs[digit] AS DOUBLE) AS expected_p,
      |    CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE) AS share
      |  FROM c, nn),
      |q AS (SELECT *,
      |    CAST(floor((CAST(n_d AS DOUBLE) - CAST(n AS DOUBLE) * expected_p)
      |      * (CAST(n_d AS DOUBLE) - CAST(n AS DOUBLE) * expected_p)
      |      / (CAST(n AS DOUBLE) * expected_p) * 1e12 + 0.5) AS BIGINT) AS chi2_pico,
      |    CAST(floor(abs(share - expected_p) * 1e12 + 0.5) AS BIGINT) AS mad_pico
      |  FROM cell),
      |sc AS (SELECT CAST(sum(chi2_pico) AS DOUBLE) / 1e12 AS chi2,
      |    CAST(sum(mad_pico) AS DOUBLE) / 9.0 / 1e12 AS mad FROM q)
      |SELECT digit, n_d, n, round(share, 9) AS share,
      |  round(expected_p, 9) AS expected_p,
      |  round(chi2, 6) AS chi2, round(mad, 9) AS mad
      |FROM q, sc ORDER BY digit""".stripMargin
  }

  val all: Seq[(String, Q)] = Seq(

    // ---- text analysis ------------------------------------------------

    "tx1_token_stats" -> Q(
      (s, d) => Text.withTokenStats(docs(s, d))
        .withColumn("bpeish", Text.bpeishTokenCount(col("text")))
        .select("doc_id", "n_tokens", "n_chars_calc", "bpeish").orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_calc,
        |  CAST(list_sum(list_transform(regexp_split_to_array(text, '[^A-Za-z0-9]+'),
        |       p -> CAST(ceil(length(p) / 4.0) AS BIGINT))) AS BIGINT) AS bpeish
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "tx2_quality_score" -> Q(
      (s, d) => Text.withQuality(docs(s, d))
        .select("doc_id", "punct_ratio", "alpha_ratio", "stopword_ratio",
          "mean_word_len", "quality_score").orderBy("doc_id"),
      Some("""WITH q AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
        |  FROM documents)
        |SELECT doc_id, punct_ratio, alpha_ratio, stopword_ratio, mean_word_len,
        |  least(1.0, alpha_ratio * 0.5 + stopword_ratio * 0.3
        |        + least(mean_word_len / 10.0, 1.0) * 0.2) AS quality_score
        |FROM q ORDER BY doc_id""".stripMargin)),

    "tx3_langid" -> Q(
      (s, d) => Text.withLangId(docs(s, d))
        .select("doc_id", "score_en", "score_es", "score_fr", "lang_pred")
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sc AS (SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS INTEGER) AS score_en,
        |  CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))) AS INTEGER) AS score_es,
        |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et','une'], x))) AS INTEGER) AS score_fr
        |  FROM t)
        |SELECT doc_id, score_en, score_es, score_fr,
        |  CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
        |       WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
        |       WHEN score_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin)),

    "tx8_langid_ngram" -> Q(
      (s, d) => Text.withLangIdNgram(docs(s, d))
        .select("doc_id", "ng_en", "ng_es", "ng_fr", "ng_lang_pred")
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, lower(text) AS lt,
        |    greatest(CAST(length(text) AS DOUBLE), 1.0) AS n
        |  FROM documents),
        |sc AS (SELECT doc_id,
        |  (CAST((length(lt) - length(replace(lt, 'th', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'he', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'in', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'er', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'an', ''))) / 2 AS DOUBLE)) / n AS ng_en,
        |  (CAST((length(lt) - length(replace(lt, 'de', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'la', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'os', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ue', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ción', ''))) / 4 AS DOUBLE)) / n AS ng_es,
        |  (CAST((length(lt) - length(replace(lt, 'le', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ou', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'es', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ai', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'eau', ''))) / 3 AS DOUBLE)) / n AS ng_fr
        |  FROM t)
        |SELECT doc_id, ng_en, ng_es, ng_fr,
        |  CASE WHEN ng_en >= ng_es AND ng_en >= ng_fr AND ng_en > 0 THEN 'en'
        |       WHEN ng_es >= ng_fr AND ng_es > 0 THEN 'es'
        |       WHEN ng_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS ng_lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin)),

    "tx6_tfidf_topterms" -> Q(
      (s, d) => Text.topTfidfTerms(docs(s, d), k = 3).orderBy("d", "rk"),
      Some("""WITH tok AS (
        |  SELECT doc_id AS d, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |tf AS (SELECT d, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |        FROM (SELECT DISTINCT d, tok FROM tok) GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
        |sc AS (SELECT d, tf.tok AS tok, tf, df,
        |         CAST(tf AS DOUBLE) * ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) AS tfidf
        |       FROM tf JOIN dfq ON tf.tok = dfq.tok CROSS JOIN n)
        |SELECT d, tok, tf, df, tfidf, rk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY d ORDER BY tfidf DESC, tok ASC) AS INTEGER) AS rk
        |  FROM sc) WHERE rk <= 3 ORDER BY d, rk""".stripMargin)),

    // rolling_hash is a native codegen Expression, but its arithmetic
    // (polynomial fold over UTF-8 bytes mod 2^64) IS SQL-portable:
    // DuckDB folds the hex-decoded bytes in HUGEINT with an explicit
    // mod, then re-wraps to the signed 64-bit value — so the native
    // expression gets a full cross-engine oracle, not a rows-only row.
    "tx4_fingerprint" -> Q(
      (s, d) => Text.withFingerprint(docs(s, d))
        .select("doc_id", "fingerprint").orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |f AS (SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS HUGEINT),
        |        list_transform(range(1, length(hx)//2 + 1),
        |          i -> CAST(strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |                  + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17 AS HUGEINT))),
        |      (h, x) -> (h * 1000003 + x) % CAST('18446744073709551616' AS HUGEINT)) AS m
        |  FROM b)
        |SELECT doc_id, CAST(CASE WHEN m >= CAST('9223372036854775808' AS HUGEINT)
        |    THEN m - CAST('18446744073709551616' AS HUGEINT) ELSE m END AS BIGINT) AS fingerprint
        |FROM f ORDER BY doc_id""".stripMargin)),

    // Full fingerprint sets, not just their sizes: the md5 shingle hash
    // exists identically in DuckDB, so the whole winnowing pipeline
    // (shingle -> hash -> sliding min -> distinct set) is value-checked
    // cross-engine.
    // The fingerprint set is serialized to a CSV string on both sides:
    // the driver's comparator sorts rows with pandas, which cannot hash
    // array cells — an array-typed output column would crash the gate
    // (and Verify refuses to register one).
    "tx5_winnowing" -> Q(
      (s, d) => Text.withWinnowing(docs(s, d))
        .select(col("doc_id"), array_join(col("winnow_fp"), ",").as("winnow_fp"),
          size(col("winnow_fp")).cast("long").as("n_fp")).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
        |        ELSE list_transform(range(0, len(toks) - 4 + 1),
        |               i -> array_to_string(toks[i+1:i+4], ' ')) END AS grams FROM t),
        |h AS (SELECT doc_id, list_transform(grams, x -> md5(x)) AS hs FROM g),
        |w AS (SELECT doc_id, CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
        |        ELSE list_transform(range(0, len(hs) - 4 + 1),
        |               i -> list_min(hs[i+1:i+4])) END AS wins FROM h)
        |SELECT doc_id, array_to_string(list_sort(list_distinct(wins)), ',') AS winnow_fp,
        |  CAST(len(list_distinct(wins)) AS BIGINT) AS n_fp
        |FROM w ORDER BY doc_id""".stripMargin)),

    // TX11: corpus-level token co-occurrence (window ≤ 2), the counting
    // backbone of PMI / distributional-similarity features. Pair
    // generation is IN-ROW (a narrow nested-transform over the token
    // array — ~2n pairs per doc, no positional self-join), then one
    // map-side-combinable count shuffle on the pair key and a global
    // top-100 TakeOrdered. The oracle builds the same pairs by
    // positional self-join — tractable there, but the Spark plan is
    // the one that scales.
    // Bigram language-model counts: P(w2 | w1) = n12 / n1 with the
    // prefix totals from a window over the already-aggregated bigram
    // table (vocab-bounded, never the corpus). In-row adjacent-pair
    // generation — no positional self-join, no text shuffle.
    "tx12_bigram_lm" -> Q(
      (s, d) => {
        val w1win = Window.partitionBy(col("w1"))
        docs(s, d)
          .select(split(lower(col("text")), " ").as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(toks)-2), i -> " +
              "struct(toks[i] AS w1, toks[i+1] AS w2))")).as("b"))
          .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .agg(count(lit(1)).cast("long").as("n12"))
          .withColumn("n1", sum(col("n12")).over(w1win).cast("long"))
          .withColumn("p", col("n12").cast("double") / col("n1").cast("double"))
          .orderBy(col("n12").desc, col("w1"), col("w2"))
          .limit(100)
      },
      Some("""WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(toks)),
        |        i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
        |      FROM t WHERE len(toks) >= 2),
        |c AS (SELECT s.w1 AS w1, s.w2 AS w2, CAST(count(*) AS BIGINT) AS n12
        |      FROM b GROUP BY 1, 2)
        |SELECT w1, w2, n12,
        |  CAST(sum(n12) OVER (PARTITION BY w1) AS BIGINT) AS n1,
        |  CAST(n12 AS DOUBLE) / CAST(sum(n12) OVER (PARTITION BY w1) AS DOUBLE) AS p
        |FROM c ORDER BY n12 DESC, w1, w2 LIMIT 100""".stripMargin)),

    // Curation-on-ingest: documents drained as 2 file-bounded micro-
    // batches through the Gopher gate; per-epoch (keep, drop) counts
    // committed replay-safe (epoch-keyed overwrite dirs), totals summed
    // at read time. Oracle recomputes the whole battery in batch.
    "st4_stream_quality" -> Q(
      (s, d) => Queries.withStreamShuffle(s) {
        val dir = Queries.scratchOnce("st4_docs", d)(
          docs(s, d).repartition(2).write.mode("overwrite").parquet(_))
        val out = Queries.scratch("st4_counts")
        val ck = Queries.scratch("st4_ck")
        val stream = s.readStream.schema(docs(s, d).schema)
          .option("maxFilesPerTrigger", 1).parquet(dir)
        val gated = Text.gopherRules(stream).select(col("source"), col("gopher_keep"))
        graft.streaming.CdcStream.streamQualityCounts(
          gated, out, "source", "gopher_keep", ck)
        s.read.parquet(out).groupBy("source")
          .agg(sum(col("n_docs")).cast("long").as("n_docs"),
            sum(col("n_keep")).cast("long").as("n_keep"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT doc_id, source, text,
        |    string_split(text, ' ') AS w,
        |    string_split(text, chr(10)) AS l
        |  FROM documents),
        |f AS (SELECT source,
        |    len(w) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w) AS mean_len,
        |    CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE) / len(w) AS hash_ratio,
        |    CAST((len(text) - len(replace(text, '...', ''))) / 3 AS DOUBLE) / len(w) AS ell_ratio,
        |    CAST(len(list_filter(l, x -> regexp_matches(x, '^\s*[-*•]'))) AS DOUBLE) / len(l) AS bullet_frac,
        |    CAST(len(list_filter(l, x -> regexp_matches(x, '\.\.\.\s*$'))) AS DOUBLE) / len(l) AS ell_line_frac,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(w) AS alpha_frac,
        |    len(list_distinct(list_filter(w, x ->
        |      list_contains(['the','be','to','of','and','that','have','with'], lower(x))))) AS stop_hits,
        |    1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l) AS dup_line_frac
        |  FROM t),
        |k AS (SELECT source,
        |    (n_words BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
        |      AND hash_ratio < 0.1 AND ell_ratio < 0.1 AND bullet_frac < 0.9
        |      AND ell_line_frac < 0.3 AND alpha_frac >= 0.8 AND stop_hits >= 2
        |      AND dup_line_frac < 0.3 AS keep
        |  FROM f)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TX19: code-vs-prose routing battery — programming punctuation
    // density, indented-line fraction, fixed-list keyword hits, all
    // in-row; the screen that splits a pretraining mix into code and
    // NL pipelines before any learned classifier runs.
    "tx19_code_detect" -> Q(
      (s, d) => Text.codeDetect(docs(s, d))
        .select(col("doc_id"), col("n_chars"), col("n_sym"),
          col("n_indent_lines"), col("n_lines"), col("n_kw"),
          round(col("symbol_ratio"), 9).as("symbol_ratio"),
          round(col("indent_frac"), 9).as("indent_frac"),
          col("is_code"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text,
        |    CAST(len(text) AS BIGINT) AS n_chars,
        |    CAST(len(text) - len(translate(text, '{}();=<>[]', '')) AS BIGINT) AS n_sym,
        |    string_split(text, chr(10)) AS lines,
        |    string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |f AS (SELECT doc_id, n_chars, n_sym,
        |    CAST(len(list_filter(lines, l -> regexp_matches(l, '^(  |\t)'))) AS BIGINT) AS n_indent_lines,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(toks, tk -> list_contains([${Text.CodeKeywords.map(k => s"'$k'").mkString(", ")}], tk))) AS BIGINT) AS n_kw
        |  FROM t),
        |r AS (SELECT *,
        |    CASE WHEN n_chars > 0 THEN CAST(n_sym AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS symbol_ratio,
        |    CASE WHEN n_lines > 0 THEN CAST(n_indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) ELSE 0.0 END AS indent_frac
        |  FROM f)
        |SELECT doc_id, n_chars, n_sym, n_indent_lines, n_lines, n_kw,
        |  round(symbol_ratio, 9) AS symbol_ratio,
        |  round(indent_frac, 9) AS indent_frac,
        |  (symbol_ratio >= 0.03 AND (n_kw >= 2 OR indent_frac >= 0.3)) AS is_code
        |FROM r ORDER BY doc_id""".stripMargin)),

    // Cross-document n-gram novelty: the diversity telemetry of a data
    // mix — fraction of each doc's distinct trigrams unique to it.
    "tx15_novelty" -> Q(
      (s, d) => Text.withNovelty(docs(s, d))
        .select(col("doc_id"), col("n_distinct_grams"), col("n_novel"),
          round(col("novelty_ratio"), 6).as("novelty_ratio"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 2),
        |           i -> array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 3 AS INTEGER)], ' '))
        |    END)) AS gram
        |  FROM t),
        |df AS (SELECT gram, CAST(count(*) AS BIGINT) AS gdf FROM g GROUP BY 1),
        |j AS (SELECT g.doc_id, df.gdf FROM g JOIN df USING (gram))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_grams,
        |  CAST(sum(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(CAST(sum(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS novelty_ratio
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // CCNet-style LM perplexity filter: corpus-trained bigram LM with
    // add-one smoothing, mean bigram NLL per doc, keep the low-
    // perplexity head. avg() = sum/count in both engines; sum-order
    // ulps absorbed by round-6; the 3.39 cut sits ~7e-4 from the
    // nearest score.
    "tx14_perplexity_filter" -> Q(
      (s, d) => Text.perplexityFilter(docs(s, d), threshold = 3.39)
        .select(col("doc_id"), round(col("nll"), 6).as("nll"),
          col("n_bigrams"), col("lm_keep"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |        i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
        |      FROM t WHERE len(toks) >= 2),
        |c12 AS (SELECT s.w1 AS w1, s.w2 AS w2, CAST(count(*) AS DOUBLE) AS n12
        |        FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM c12),
        |lm AS (SELECT w1, w2, (n12 + 1.0) / (n1 + v.v) AS p
        |       FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
        |sc AS (SELECT b.doc_id, avg(0.0 - ln(lm.p)) AS nll,
        |         CAST(count(*) AS BIGINT) AS n_bigrams
        |       FROM b JOIN lm ON b.s.w1 = lm.w1 AND b.s.w2 = lm.w2 GROUP BY 1)
        |SELECT doc_id, round(nll, 6) AS nll, n_bigrams, nll <= 3.39 AS lm_keep
        |FROM sc ORDER BY doc_id""".stripMargin)),

    // The published Gopher rule battery (Rae et al. 2021 §A.1.1) as
    // PASS/FAIL booleans per document — integer counts and one-division
    // ratios, so every bit is reproduced by the DuckDB oracle.
    "tx13_gopher_rules" -> Q(
      (s, d) => Text.gopherRules(docs(s, d))
        .select("doc_id", "n_words", "r_word_count", "r_mean_word_len",
          "r_hash_ratio", "r_ellipsis_ratio", "r_bullet_lines",
          "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
          "r_dup_lines", "gopher_keep")
        .orderBy("doc_id"),
      Some(GopherOracle)),

    // TX17: vocabulary coverage — top-500 corpus vocab (tie-broken
    // lexicographically, a total order both engines reproduce), per-doc
    // OOV counts and rate. The vocab learns via TakeOrderedAndProject
    // and broadcasts; text never re-shuffles.
    "tx17_oov_rate" -> Q(
      (s, d) => Text.oovRate(docs(s, d), vocabSize = 500)
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          round(col("oov_rate"), 6).as("oov_rate"))
        .orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS t
        |  FROM documents),
        |c AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY t),
        |v AS (SELECT t FROM (SELECT t, row_number() OVER (ORDER BY cnt DESC, t ASC) AS rn FROM c)
        |      WHERE rn <= 500),
        |per AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |        CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |        FROM tk LEFT JOIN v ON v.t = tk.t GROUP BY tk.doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |       round(CAST(n_oov AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS oov_rate
        |FROM per ORDER BY doc_id""".stripMargin)),

    // Document-level PMI collocations (Church & Hanks CL'90): rare
    // tokens cut at df>=5 BEFORE in-row pair generation; pmi from
    // exact integer dfs, rounded for display only.
    "tx16_pmi_pairs" -> Q(
      (s, d) => Text.pmiPairs(docs(s, d), minDf = 5L, topK = 100),
      Some("""WITH dt AS (SELECT doc_id AS d,
        |    unnest(list_distinct(string_split(lower(text), ' '))) AS t
        |  FROM documents),
        |dt2 AS (SELECT * FROM dt WHERE length(t) > 0),
        |dfT AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM dt2
        |        GROUP BY t HAVING count(*) >= 5),
        |f AS (SELECT d, dt2.t FROM dt2 JOIN dfT USING (t)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |p AS (SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS df_xy
        |      FROM f a JOIN f b ON a.d = b.d AND a.t < b.t GROUP BY 1, 2)
        |SELECT t1, t2, df_xy,
        |  round(ln(CAST(df_xy AS DOUBLE) * nn.n_docs / (x.df * y.df)), 6) AS pmi
        |FROM p, nn, dfT x, dfT y WHERE x.t = p.t1 AND y.t = p.t2
        |ORDER BY df_xy DESC, t1, t2 LIMIT 100""".stripMargin)),

    "tx11_cooccurrence" -> Q(
      (s, d) => docs(s, d)
        .select(split(lower(col("text")), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(0, size(toks)-2), i -> " +
            "transform(sequence(i+1, least(i+2, size(toks)-1)), j -> " +
            "struct(least(toks[i], toks[j]) AS t1, greatest(toks[i], toks[j]) AS t2))))"))
          .as("p"))
        .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"))
        .limit(100),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, unnest(toks) AS tok,
        |        unnest(range(1, len(toks) + 1)) AS pos FROM t WHERE len(toks) >= 2),
        |pairs AS (SELECT least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2
        |  FROM p a JOIN p b ON a.doc_id = b.doc_id
        |    AND b.pos > a.pos AND b.pos <= a.pos + 2)
        |SELECT t1, t2, CAST(count(*) AS BIGINT) AS n FROM pairs
        |GROUP BY 1, 2 ORDER BY n DESC, t1, t2 LIMIT 100""".stripMargin)),

    // Gopher-style repetition filter: duplicated-trigram fraction.
    "tx9_repetition" -> Q(
      (s, d) => Text.withRepetition(docs(s, d))
        .select("doc_id", "n_grams", "n_distinct_grams", "rep_ratio")
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |        ELSE list_transform(range(0, len(toks) - 3 + 1),
        |               i -> array_to_string(toks[i+1:i+3], ' ')) END AS grams FROM t)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
        |  1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |      / CAST(greatest(len(grams), 1) AS DOUBLE) AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin)),

    // Shannon token entropy: the whole computation is in-row over the
    // SORTED token array (run-length boundaries -> counts -> ordered
    // entropy fold), so both engines add the same float terms in the
    // same sequence — bit-identical, hash-checkable.
    "tx10_token_entropy" -> Q(
      (s, d) => Text.withTokenEntropy(docs(s, d))
        .select("doc_id", "n_tokens", "n_distinct_tokens", "entropy")
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, list_sort(string_split(lower(text), ' ')) AS st
        |        FROM documents),
        |s AS (SELECT doc_id, len(st) AS n,
        |        list_filter(range(1, len(st) + 1),
        |          i -> i = 1 OR st[i] != st[i-1]) AS ss
        |      FROM t),
        |c AS (SELECT doc_id, n, ss,
        |        list_transform(range(1, len(ss) + 1),
        |          j -> coalesce(ss[j+1], n + 1) - ss[j]) AS counts
        |      FROM s)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(len(ss) AS BIGINT) AS n_distinct_tokens,
        |  CAST(0.0 AS DOUBLE) - list_reduce(
        |    list_prepend(CAST(0.0 AS DOUBLE), list_transform(counts,
        |      c -> (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |         * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))),
        |    (a, b) -> a + b) AS entropy
        |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- deduplication ------------------------------------------------

    "dd1_exact_dedup" -> Q(
      (s, d) => Dedup.exact(docs(s, d)).orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // exact all-pairs baseline: bounded to a fixed 1000-doc slice — its
    // role is verifying the LSH path, not running at corpus scale
    // Asymmetric containment near-dup (quote/subset detection): the
    // corpus is docs<150 plus planted 20-token excerpts at +13000 —
    // every excerpt's distinct-token set is a subset of its source, so
    // its containment is exactly 1.0 while Jaccard is far below any
    // dedup threshold. The oracle runs the n² list_intersect form over
    // the same union, proving the one-sided prefix filter lossless.
    "dd15_containment" -> Q(
      (s, d) => {
        val base = docs(s, d).filter(col("doc_id") < 150).select("doc_id", "text")
        val planted = base.select((col("doc_id") + 13000).as("doc_id"),
          array_join(slice(split(lower(col("text")), " "), 1, 20), " ").as("text"))
        Dedup.containmentPairs(base.unionByName(planted), threshold = 0.95)
          .select(col("d1"), col("d2"),
            round(col("cont1"), 6).as("cont1"), round(col("cont2"), 6).as("cont2"))
          .orderBy("d1", "d2")
      },
      Some("""WITH docs2 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 13000,
        |    array_to_string(string_split(lower(text), ' ')[1:20], ' ')
        |  FROM documents WHERE doc_id < 150),
        |ta AS (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS t
        |  FROM docs2),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    len(list_intersect(a.t, b.t)) AS c, len(a.t) AS n1, len(b.t) AS n2
        |  FROM ta a JOIN ta b ON a.doc_id < b.doc_id)
        |SELECT d1, d2,
        |  round(CAST(c AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS cont1,
        |  round(CAST(c AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS cont2
        |FROM p
        |WHERE greatest(CAST(c AS DOUBLE) / CAST(n1 AS DOUBLE),
        |               CAST(c AS DOUBLE) / CAST(n2 AS DOUBLE)) >= 0.95
        |ORDER BY d1, d2""".stripMargin)),

    "dd2_ngram_jaccard" -> Q(
      (s, d) => Dedup.ngramJaccardPairs(
        docs(s, d).filter(col("doc_id") < 1000), threshold = 0.5).orderBy("d1", "d2"),
      Some("""WITH tok AS (
        |  SELECT doc_id AS d, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
        |  FROM documents WHERE doc_id < 1000),
        |sizes AS (SELECT d, count(*) AS n FROM tok GROUP BY d),
        |common AS (SELECT a.d AS d1, b.d AS d2, count(*) AS c
        |           FROM tok a JOIN tok b ON a.tok = b.tok AND a.d < b.d GROUP BY 1, 2)
        |SELECT d1, d2, CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
        |FROM common JOIN sizes s1 ON s1.d = common.d1 JOIN sizes s2 ON s2.d = common.d2
        |WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5
        |ORDER BY d1, d2""".stripMargin)),

    // The EXACT-at-scale counterpart to dd2: frequency-ordered prefix
    // filtering (AllPairs/PPJoin) joins only each doc's rarest
    // `n - ceil(t*n) + 1` tokens against the inverted index, then
    // verifies candidates exactly — same answer as the n² baseline,
    // which is precisely why it gets a FULL value oracle (the oracle
    // runs the n² form; the engine runs the pruned one; identical
    // output proves the pruning-is-lossless lemma end to end). Runs
    // over the whole documents table — no doc_id cap — because pruning,
    // not a bounded fixture, is what contains the cost.
    //
    // Engine path: [[Dedup.partitionJaccardPairs]] — set
    // canonicalization + size-banded pigeonhole blocking (the
    // partition-based exact-join family), which replaced the
    // prefix-filter path ([[Dedup.prefixJaccardPairs]], kept as the
    // documented AllPairs/PPJoin baseline and equivalence-tested in
    // OpsSpec) after plan audit: this corpus is ~4% NEAR-DUP DENSE
    // (191 k true pairs at t=0.95 among 5 000 docs) with heavy
    // identical-set multiplicity, so single-token prefix blocking
    // yields 1.86 M candidates where part-subset blocking yields 37 k
    // for the identical output — 17.8 s → ~3 s at sf0.1.
    "dd10_prefix_jaccard" -> Q(
      (s, d) => Dedup.partitionJaccardPairs(docs(s, d), threshold = 0.95)
        .orderBy("d1", "d2"),
      Some("""WITH tok AS (
        |  SELECT doc_id AS d, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
        |  FROM documents),
        |sizes AS (SELECT d, count(*) AS n FROM tok GROUP BY d),
        |common AS (SELECT a.d AS d1, b.d AS d2, count(*) AS c
        |           FROM tok a JOIN tok b ON a.tok = b.tok AND a.d < b.d GROUP BY 1, 2)
        |SELECT d1, d2, CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
        |FROM common JOIN sizes s1 ON s1.d = common.d1 JOIN sizes s2 ON s2.d = common.d2
        |WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.95
        |ORDER BY d1, d2""".stripMargin)),

    // corpus-level dedup decision: the deduplicated corpus itself
    "dd5_dedup_corpus" -> Q(
      (s, d) => Dedup.dedupExactCorpus(docs(s, d)).select("doc_id").orderBy("doc_id"),
      Some("""SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // DD8: the INCREMENTAL refresh flavor — new docs (id >= 200) vs an
    // already-curated base (id < 300); the 100-doc overlap must drop.
    "dd8_incremental_dedup" -> Q(
      (s, d) => Dedup.dedupAgainst(
          docs(s, d).filter(col("doc_id") >= 200),
          docs(s, d).filter(col("doc_id") < 300))
        .select("doc_id").orderBy("doc_id"),
      Some("""SELECT d.doc_id FROM documents d
        |WHERE d.doc_id >= 200 AND NOT EXISTS (
        |  SELECT 1 FROM documents b WHERE b.doc_id < 300 AND md5(b.text) = md5(d.text))
        |ORDER BY doc_id""".stripMargin)),

    // The native xxhash64 LSH, value-checked at the gate via in-plan
    // equality with the portable twin (the ann1 composed-oracle
    // pattern): emit the full-outer union of native and portable
    // verified pair sets with membership flags, oracle = the portable
    // reconstruction expecting both flags true. Verified-jaccard values
    // are hash-family-independent, and on true pairs (J ≈ 1) the
    // 16-band/4-row banding miss probability is ~1e-7 per family, so
    // the sets coincide; if a native regression ever breaks that —
    // wrong signatures changing the candidate set either way — the row
    // set itself diverges from the oracle and the gate goes red.
    "dd3_minhash_lsh_pairs" -> Q(
      (s, d) => {
        val ds = par(docs(s, d))
        val nat = Dedup.minhashLshPairs(ds, threshold = 0.5)
          .withColumn("in_native", lit(true))
        val por = Dedup.minhashLshPairsPortable(ds, threshold = 0.5)
          .select(col("d1"), col("d2"), col("jaccard").as("__jp"),
            lit(true).as("in_portable"))
        nat.join(por, Seq("d1", "d2"), "full_outer")
          .select(col("d1"), col("d2"),
            coalesce(col("jaccard"), col("__jp")).as("jaccard"),
            coalesce(col("in_native"), lit(false)).as("in_native"),
            coalesce(col("in_portable"), lit(false)).as("in_portable"))
          .orderBy("d1", "d2")
      },
      Some(OracleGen.dd3Sql(0.5))),

    // SimHash fingerprints ARE the hash family's bit statistics, so
    // native and portable pair sets legitimately differ (no set
    // equality to assert). The gate row instead emits the portable
    // pairs — fully oracle-recomputed — guarded by two in-plan checks
    // of the native path: per-doc agreement of the fused native
    // simhash64 expression with the compositional built-in fold
    // (value-checks the custom codegen against the definition over the
    // whole corpus), and non-emptiness of the native pigeonhole
    // pipeline (keeps the production path executing). Either guard
    // flipping false reddens every row.
    "dd4_simhash_pairs" -> Q(
      (s, d) => {
        val ds = par(docs(s, d))
        val agree = Dedup.simhashImplAgreement(ds)
          .agg((count(lit(1)) === sum(when(col("sh_native") === col("sh_builtin"),
            lit(1L)).otherwise(lit(0L)))).as("native_impl_ok"))
        val nonempty = Dedup.simhashPairs(ds, maxDist = 3)
          .agg((count(lit(1)) > 0).as("native_nonempty"))
        Dedup.simhashPairsPortable(ds, maxDist = 3)
          .crossJoin(broadcast(agree))
          .crossJoin(broadcast(nonempty))
          .select(col("d1"), col("d2"), col("hamming"),
            col("native_impl_ok"), col("native_nonempty"))
          .orderBy("d1", "d2")
      },
      Some(OracleGen.dd4Sql(3))),

    // Portable-signature twins: identical MinHash-LSH / SimHash
    // constructions with every hash md5-derived, so the DuckDB oracle
    // rebuilds signatures, bands and chunks from scratch and the full
    // rows+schema+hash gate applies (the xxhash64 natives above stay
    // the production fast path; OracleGen serializes the permutation
    // constants into the SQL from the same MinHashSigs.perms source).
    "dd3p_minhash_portable" -> Q(
      (s, d) => Dedup.minhashLshPairsPortable(par(docs(s, d)), threshold = 0.5)
        .orderBy("d1", "d2"),
      Some(OracleGen.dd3pSql(0.5))),

    "dd4p_simhash_portable" -> Q(
      (s, d) => Dedup.simhashPairsPortable(par(docs(s, d)), maxDist = 3)
        .orderBy("d1", "d2"),
      Some(OracleGen.dd4pSql(3))),

    // DD19: LSH banding planner — dd16's eval swept over four
    // (bands, rows) configs of the same 64-slot signatures; empirical
    // precision/recall per config beside the analytic S-curve
    // probability. THE tuning table before a 100 TB dedup commits.
    // The exact-truth leg is bounded to a hash-ordered sampleDocs=4096
    // doc sample (>= the gate corpus, so the audit is exact here);
    // band legs sweep the FULL signature table and report n_cand_full.
    "dd19_lsh_planner" -> Q(
      (s, d) => Dedup.lshPlanner(par(docs(s, d)), threshold = 0.5)
        .orderBy(col("bands").desc),
      Some(OracleGen.dd19Sql(0.5, 64, Seq(32, 16, 8, 4)))),

    // BB1: b-bit MinHash eval (Li & König WWW'10, b=1) — lowest-bit
    // signatures (64x storage cut for the SigStore) measured against
    // full signatures and exact Jaccard on the LSH candidates; every
    // column an exact integer (in-row zip folds + micro divisions).
    "bb1_bbit_minhash" -> Q(
      (s, d) => Dedup.bbitMinhashEval(par(docs(s, d)), threshold = 0.3)
        .orderBy("d1", "d2"),
      Some(OracleGen.bb1Sql(0.3))),

    // FIM1: fill-in-the-middle transform (Bavarian et al. '22) — md5-
    // coin selected docs split into (prefix, middle, suffix) at md5-
    // derived cuts; PSM and SPM digests, AR passthrough for the rest.
    "fim1_fill_in_middle" -> Q(
      (s, d) => graft.ops.Curate.fimTransform(docs(s, d))
        .orderBy("doc_id"),
      Some(OracleGen.fim1Sql(2))),

    // Incremental NEAR-dup dedup against a PERSISTED signature table —
    // dd8's incremental pattern lifted from exact hashes to MinHash:
    // the base corpus (doc_id < 300) is signed once and published as a
    // VersionedDir snapshot (the hl2 commit pattern: v= dir + atomic
    // _LATEST pointer); the delta then dedups against the store — the
    // base is neither rescanned nor re-signed, only its ~64-long/doc
    // signature snapshot band-joins (ids-only) with the freshly-signed
    // delta, and candidates verify by in-row signature agreement (exact
    // integer compares). The oracle recomputes BOTH sides from the raw
    // documents table — value-equality proves the persisted store is
    // lossless.
    "dd12_incremental_sig_dedup" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val store = Queries.scratch("sig_store")
        graft.ingest.VersionedDir.publish(
          Dedup.minhashSignatures(all.filter(col("doc_id") < 300),
            hashFn = Dedup.md5ShingleHash),
          store, 1L)
        val baseSigs = graft.ingest.VersionedDir.current(s, store).get
        Dedup.dedupDeltaAgainstSignatures(
            all.filter(col("doc_id") >= 300), baseSigs, estThreshold = 0.5,
            hashFn = Dedup.md5ShingleHash, bandHashFn = md5)
          .select("doc_id").orderBy("doc_id")
      },
      Some(OracleGen.dd12Sql(300, 0.5))),

    // SD2: the EPOCH-LOOP signature store — dd12's one-shot incremental
    // dedup run as a maintained loop: four epochs (doc_id % 4, in
    // order) each dedup against the persisted store + themselves, and
    // survivor signatures append via crash-safe VersionedDir commits.
    // The oracle unrolls all four epochs from the raw documents table
    // (the pg1 unrolled-iteration pattern), so the hash-match proves
    // the store stayed lossless across the whole chain. The streaming
    // form of the same loop (foreachBatch -> ingestEpoch) is
    // SigStoreSpec territory.
    "sd2_sigstore_epochs" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val store = Queries.scratch("sd2_store")
        val nEpochs = 4
        (0 until nEpochs).map { k =>
          graft.ops.SigStore.ingestEpoch(
            all.filter(pmod(col("doc_id"), lit(nEpochs)) === k),
            store, k.toLong, estThreshold = 0.5,
            hashFn = Dedup.md5ShingleHash, bandHashFn = md5,
            storePartitions = 1) // MB-scale store at this SF
            .select("doc_id")
        }.reduce(_ unionByName _).orderBy("doc_id")
      },
      Some(OracleGen.sd2Sql(4, 0.5))),

    // ---- similarity search -------------------------------------------

    // SS6: product quantization + ADC + exact re-rank (Jégou 2011) —
    // the fourth ANN path beside brute force, SRP-LSH and IVF, and the
    // one that changes the STORAGE equation: the scan touches m=8
    // codes per vector instead of 64 floats. Fixed deterministic
    // codebooks here so the oracle recomputes encode/ADC/re-rank from
    // literals (the ss5 discipline); the trained-codebook path
    // (per-subspace Lloyd's) is the API default, covered in OpsSpec by
    // the rerank=corpus equivalence law against brute force.
    "ss6_pq_topk" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.pqTopK(e, e.filter(col("vec_id") < 8), k = 5,
            codebooks = Similarity.fixedPqCodebooks(8, 16, 8))
          .orderBy("q_id", "rank")
      },
      Some(OracleGen.pq1Sql())),

    // SS7: IVF-PQ — the two prunings composed: cells bound WHICH rows
    // a query reads, codes bound what a read COSTS, re-rank bounds the
    // error. Fixed centroid + codebook literals so the oracle
    // recomputes the entire composition (ss5 + ss6 CTEs chained).
    "ss7_ivfpq_topk" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 8), k = 5,
            centroids = Similarity.fixedCentroids(16, 64),
            codebooks = Similarity.fixedPqCodebooks(8, 16, 8))
          .orderBy("q_id", "rank")
      },
      Some(OracleGen.pq2Sql())),

    // Margin-based bitext mining (Artetxe & Schwenk 2019): the two
    // label-parity halves of the embedding table play the two
    // languages; mutual-best ratio-margin pairs above 1.05 are the
    // mined "translations". avgK rides the ordered-left-fold
    // discipline so margins (and therefore mutual-best ranks) are
    // bit-identical across engines; cos/margin round(6) on output.
    // TRUTH BASELINE — deliberately brute-force, never scale-swept
    // (bx2_bitext_lsh is the 100 TB plan); the vec_id < 1000 cap keeps
    // the exact-truth audit slice bounded so the bench doesn't pay
    // O(n²) as the table grows (a no-op at the sf0.01 gate's 500 rows).
    "bx1_bitext_margin" -> Q(
      (s, d) => {
        val e = embs(s, d).filter(col("vec_id") < 1000)
        graft.ops.Similarity.bitextMine(
            e.filter(pmod(col("label"), lit(2)) === 0),
            e.filter(pmod(col("label"), lit(2)) === 1),
            k = 4, marginThreshold = 1.05)
          .select(col("s_id"), col("t_id"),
            round(col("cos_sim"), 6).as("cos_sim"),
            round(col("margin"), 6).as("margin"))
          .orderBy("s_id")
      },
      Some("""WITH s AS (SELECT vec_id AS s_id, embedding AS s_vec FROM embeddings
        |       WHERE label % 2 = 0 AND vec_id < 1000),
        |t AS (SELECT vec_id AS t_id, embedding AS t_vec FROM embeddings
        |       WHERE label % 2 = 1 AND vec_id < 1000),
        |sc AS (SELECT s_id, t_id,
        |    list_sum(list_transform(range(1, len(s_vec) + 1),
        |      i -> CAST(s_vec[i] AS DOUBLE) * CAST(t_vec[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(s_vec) + 1),
        |         i -> CAST(s_vec[i] AS DOUBLE) * CAST(s_vec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(t_vec) + 1),
        |         i -> CAST(t_vec[i] AS DOUBLE) * CAST(t_vec[i] AS DOUBLE))))) AS cos_sim
        |  FROM s, t),
        |rs AS (SELECT *, row_number() OVER (PARTITION BY s_id ORDER BY cos_sim DESC, t_id ASC) AS r FROM sc),
        |rt AS (SELECT *, row_number() OVER (PARTITION BY t_id ORDER BY cos_sim DESC, s_id ASC) AS r FROM sc),
        |avs AS (SELECT s_id,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(cos_sim ORDER BY cos_sim DESC, t_id ASC)), (a, x) -> a + x)
        |    / count(*) AS avg_s
        |  FROM rs WHERE r <= 4 GROUP BY s_id),
        |avt AS (SELECT t_id,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(cos_sim ORDER BY cos_sim DESC, s_id ASC)), (a, x) -> a + x)
        |    / count(*) AS avg_t
        |  FROM rt WHERE r <= 4 GROUP BY t_id),
        |m AS (SELECT sc.s_id, sc.t_id, cos_sim,
        |    cos_sim / ((avg_s + avg_t) / 2.0) AS margin
        |  FROM sc JOIN avs ON sc.s_id = avs.s_id JOIN avt ON sc.t_id = avt.t_id),
        |b AS (SELECT *,
        |    row_number() OVER (PARTITION BY s_id ORDER BY margin DESC, t_id ASC) AS bs,
        |    row_number() OVER (PARTITION BY t_id ORDER BY margin DESC, s_id ASC) AS bt
        |  FROM m)
        |SELECT s_id, t_id, round(cos_sim, 6) AS cos_sim, round(margin, 6) AS margin
        |FROM b WHERE bs = 1 AND bt = 1 AND margin > 1.05 ORDER BY s_id""".stripMargin)),

    // bx2: the 100 TB bitext plan — the registered query feeds SRP-LSH
    // candidate pairs (ids-only shuffle, Hamming-1 probe on the source
    // side) into bitextMine's `candidates` parameter, so NO corpus ×
    // corpus cross join appears anywhere in the plan. The oracle
    // recomputes the identical candidate universe from the serialized
    // plane literals, then runs bx1's margin machinery restricted to it.
    "bx2_bitext_lsh" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val src = e.filter(pmod(col("label"), lit(2)) === 0)
        val tgt = e.filter(pmod(col("label"), lit(2)) === 1)
        Similarity.bitextMine(src, tgt, k = 4, marginThreshold = 1.05,
            candidates = Some(Similarity.lshCandidatePairs(src, tgt)))
          .select(col("s_id"), col("t_id"),
            round(col("cos_sim"), 6).as("cos_sim"),
            round(col("margin"), 6).as("margin"))
          .orderBy("s_id", "t_id")
      },
      Some(OracleGen.bx2Sql())),

    "ss1_bruteforce_topk" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), k = 5)
          .select(col("q_id"), col("n_id"), col("rank"), round(col("sim"), 6).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM e WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q_id, e.vec_id AS n_id,
        |    list_sum(list_transform(range(1, len(q_vec) + 1),
        |      i -> CAST(q_vec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1),
        |         i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS sim
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q_id),
        |ranked AS (SELECT q_id, n_id, sim,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM pairs)
        |SELECT q_id, n_id, rank, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Matryoshka truncation eval (Kusupati et al. 2022): recall@5 of
    // prefix-16/32 truncated search against the full-dim exact top-5.
    // The oracle recomputes all three rankings with range-bounded dot
    // folds (same accumulation order as VectorDot), so every rank
    // decision and overlap count is value-checked.
    "ss9_matryoshka_recall" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.matryoshkaRecall(e, e.filter(col("vec_id") < 8), k = 5,
            prefixes = Seq(16, 32))
          .orderBy("dims", "q_id")
      },
      Some {
        def pairsCte(name: String, upto: String) =
          s"""$name AS (
             |  SELECT q_id, e.vec_id AS n_id,
             |    list_sum(list_transform(range(1, $upto),
             |      i -> CAST(q_vec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             |    / (sqrt(list_sum(list_transform(range(1, $upto),
             |         i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
             |     * sqrt(list_sum(list_transform(range(1, $upto),
             |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS sim
             |  FROM e CROSS JOIN q WHERE e.vec_id <> q_id)""".stripMargin
        def rankCte(name: String, from: String) =
          s"""$name AS (SELECT q_id, n_id FROM (
             |  SELECT q_id, n_id, row_number() OVER (
             |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rk
             |  FROM $from) WHERE rk <= 5)""".stripMargin
        def overlapCte(name: String, dims: Int, from: String) =
          s"""$name AS (SELECT $dims AS dims, r.q_id,
             |    CAST(count(f.q_id) AS BIGINT) AS n_overlap
             |  FROM $from r LEFT JOIN fr f
             |    ON f.q_id = r.q_id AND f.n_id = r.n_id
             |  GROUP BY r.q_id)""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
           |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM e WHERE vec_id < 8),
           |${pairsCte("fp", "len(q_vec) + 1")},
           |${rankCte("fr", "fp")},
           |${pairsCte("p16", "17")},
           |${rankCte("r16", "p16")},
           |${pairsCte("p32", "33")},
           |${rankCte("r32", "p32")},
           |${overlapCte("o16", 16, "r16")},
           |${overlapCte("o32", 32, "r32")},
           |u AS (SELECT * FROM o16 UNION ALL SELECT * FROM o32)
           |SELECT CAST(dims AS INTEGER) AS dims, q_id, n_overlap,
           |  round(CAST(n_overlap AS DOUBLE) / 5, 6) AS recall
           |FROM u ORDER BY dims, q_id""".stripMargin
      }),

    // Hard-negative mining (FaceNet triplet mining): per anchor, top-5
    // most-similar DIFFERENT-label vectors + best same-label sim +
    // margin-violation flag. Same bounded-anchor plan as ss1.
    "hn1_hard_negatives" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.hardNegatives(e, e.filter(col("vec_id") < 8), k = 5)
          .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
            col("rank"), round(col("sim"), 6).as("sim"),
            round(col("pos_sim"), 6).as("pos_sim"), col("violates_margin"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
        |      FROM e WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q_id, q_label, e.vec_id AS n_id, e.label AS n_label,
        |    list_sum(list_transform(range(1, len(q_vec) + 1),
        |      i -> CAST(q_vec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1),
        |         i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS sim
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q_id),
        |pos AS (SELECT q_id, max(sim) AS pos_sim FROM pairs
        |        WHERE n_label = q_label GROUP BY q_id),
        |neg AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank
        |        FROM pairs WHERE n_label <> q_label)
        |SELECT n.q_id, n.q_label, n.n_id, n.n_label, n.rank,
        |  round(n.sim, 6) AS sim, round(p.pos_sim, 6) AS pos_sim,
        |  n.sim > p.pos_sim - 0.2 AS violates_margin
        |FROM neg n LEFT JOIN pos p USING (q_id)
        |WHERE n.rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // exact O(n²) baseline: bounded to a fixed 600-vector slice
    "ss2_cosine_neardup_pairs" -> Q(
      (s, d) => Similarity.cosineNearDupPairs(
          embs(s, d).filter(col("vec_id") < 600), threshold = 0.4)
        .select(col("id1"), col("id2"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("id1", "id2"),
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 600),
        |pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
        |         i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos_sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, round(cos_sim, 6) AS cos_sim
        |FROM pairs WHERE cos_sim >= 0.4 ORDER BY id1, id2""".stripMargin)),

    // Sparse TF-IDF cosine join over raw text via an inverted index —
    // term-at-a-time postings join, the sparse complement of ss2's
    // dense pairs. Same-operand divisions on both engines; sum-order
    // ulps absorbed by the 6-decimal output rounding.
    "ss8_sparse_cosine_join" -> Q(
      (s, d) => Similarity.sparseCosineJoin(
          docs(s, d).filter(col("doc_id") < 300), threshold = 0.8)
        .select(col("d1"), col("d2"), round(col("cosine"), 6).as("cosine"))
        .orderBy("d1", "d2"),
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents WHERE doc_id < 300),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |       FROM tok GROUP BY 1, 2),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |w AS (SELECT tf.doc_id, tf.term, tf.tf * ln(n.n / df.df) AS w
        |      FROM tf JOIN df USING (term) CROSS JOIN n),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
        |dot AS (SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w * b.w) AS dotp
        |        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        |        GROUP BY 1, 2),
        |cos AS (SELECT d1, d2, dotp / (x.nrm * y.nrm) AS cosine
        |        FROM dot JOIN nrm x ON x.doc_id = d1 JOIN nrm y ON y.doc_id = d2)
        |SELECT d1, d2, round(cosine, 6) AS cosine FROM cos
        |WHERE cosine >= 0.8 ORDER BY d1, d2""".stripMargin)),

    // Seeded SRP buckets are plan-time literals, so the oracle gets the
    // SAME ±1 planes serialized into its SQL (OracleGen.ss3Sql) and
    // recomputes every bucket: fully value-checked. Bucket-deciding
    // dots use list_reduce in the oracle — the same left fold as
    // VectorDot — so a sign can never flip between engines. Recall
    // quantified by ann1_recall (0.50 at 8 tables + Hamming-2 probing).
    "ss3_lsh_topk" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.lshTopK(e, e.filter(col("vec_id") < 8), k = 5, nTables = 8)
          .select(col("q_id"), col("n_id"), col("rank"), round(col("sim"), 6).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some(OracleGen.ss3Sql())),

    // 8 planes × 8 tables + Hamming-1 multi-probe on one join side:
    // this query targets moderate-similarity pairs (cos 0.4), where
    // plain bucketing recalls ~0.22 — probing recovers pairs split by a
    // single borderline plane (recall measured by ann1_recall).
    "ss4_lsh_neardup_pairs" -> Q(
      (s, d) => Similarity.lshNearDupPairs(par(embs(s, d)), threshold = 0.4,
          nPlanes = 8, nTables = 8, multiProbe = true)
        .select(col("id1"), col("id2"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("id1", "id2"),
      Some(OracleGen.ss4Sql(0.4))),

    // IVF scale path: probe-limited exact search inside coarse cells.
    // The GATE query quantizes against fixed deterministic centroids
    // (data-independent literals the oracle can be handed verbatim —
    // OracleGen.ss5Sql); the k-means index build stays the default path
    // and stays quantified under the gate via ann2_recall_floor.
    "ss5_ivf_topk" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.ivfTopK(par(e), e.filter(col("vec_id") < 8), k = 5,
            centroids = Similarity.fixedCentroids(16, 64))
          .select(col("q_id"), col("n_id"), col("rank"), round(col("sim"), 6).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some(OracleGen.ss5Sql())),

    // HN2: label-free BANDED negative mining beside hn1's label-aware
    // triplet form — per anchor, the IVF top-k widened to 20, banded
    // to sim ∈ [0.2, 0.8) (informative but not a positive/near-dup),
    // hardest 3 kept. The scale path is ss5's (cell-confined
    // candidates); the band tests the UNROUNDED sim both engines
    // compute identically.
    "hn2_band_negatives" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val knn = Similarity.ivfTopK(par(e), e.filter(col("vec_id") < 8), k = 20,
          centroids = Similarity.fixedCentroids(16, 64))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id").asc)
        knn.filter(col("sim") >= 0.2 && col("sim") < 0.8)
          .withColumn("neg_rank", row_number().over(w).cast("int"))
          .filter(col("neg_rank") <= 3)
          .select(col("q_id"), col("neg_rank"), col("n_id"),
            round(col("sim"), 6).as("sim"))
          .orderBy("q_id", "neg_rank")
      },
      Some(OracleGen.hn1Sql())),

    // EO1: embedding-space outliers — cosine distance to the own
    // (nearest) fixed centroid, micro-quantized, z-scored from exact
    // integer moments, top-20. The vector-modality outlier gate beside
    // an1/an2's scalar z-scores.
    "eo1_embedding_outliers" -> Q(
      (s, d) => Similarity.embeddingOutliers(embs(s, d), topK = 20,
          centroids = Similarity.fixedCentroids(16, 64))
        .select(col("vec_id"), col("cell"), col("d_micro"),
          round(col("z"), 6).as("z"))
        .orderBy("vec_id"),
      Some(OracleGen.eo1Sql())),

    // VQ1: int8 absmax quantization of the embedding corpus — scale,
    // quantized checksums, and the per-element reconstruction-error
    // bound all reproduce bit-for-bit in DuckDB (plain IEEE arithmetic
    // in a fixed fold order; no hashing anywhere), so the compression
    // step is fully value-checked, not rows-only.
    // PCA top component by power iteration over the GLOBALLY-quantized
    // covariance: integer moments (order-free), then 12 strictly
    // ordered-fold iterations — bit-identical to the unrolled oracle,
    // no display rounding anywhere.
    "pca1_top_component" -> Q(
      (s, d) => graft.ops.Pca.topComponentQuantized(embs(s, d))
        .orderBy("dim_idx"),
      Some(PcaComponentOracle)),

    // The projection half: per-vector score against the learned
    // loadings (int weights x plan-time literals, in-row fold).
    "pca2_project" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val comp = graft.ops.Pca.topComponentQuantized(e)
          .orderBy("dim_idx").collect()
        val loadings = comp.map(_.getDouble(1)).toSeq
        val xd = transform(col("embedding"), _.cast("double"))
        val gmax = e.select(max(aggregate(xd, lit(0.0),
          (a, b) => greatest(a, abs(b))))).head.getDouble(0)
        graft.ops.Pca.project(e.filter(col("vec_id") < 100), loadings, gmax)
          .orderBy("vec_id")
      },
      Some(PcaProjectOracle)),

    // Exact rank-based winsorization bounds per embedding dimension:
    // clip values are data values (1st/99th rank) — no interpolation,
    // fully engine-portable; clamp counts integer.
    "wz1_winsorize_bounds" -> Q(
      (s, d) => Similarity.winsorizeBounds(embs(s, d), p = 0.01)
        .orderBy("dim_idx"),
      Some("""WITH ex AS (SELECT vec_id AS id, u.i - 1 AS dim_idx,
        |    CAST(embedding[u.i] AS DOUBLE) AS v
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY dim_idx ORDER BY v, id) AS rn,
        |    count(*) OVER (PARTITION BY dim_idx) AS n FROM ex),
        |b AS (SELECT dim_idx, min(v) AS lo, max(v) AS hi FROM r
        |  WHERE rn = CAST(ceil(n * 0.01) AS BIGINT)
        |     OR rn = n - CAST(ceil(n * 0.01) AS BIGINT) + 1
        |  GROUP BY dim_idx)
        |SELECT ex.dim_idx, any_value(b.lo) AS lo, any_value(b.hi) AS hi,
        |  CAST(sum(CASE WHEN ex.v < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |  CAST(sum(CASE WHEN ex.v > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        |FROM ex JOIN b USING (dim_idx)
        |GROUP BY ex.dim_idx ORDER BY ex.dim_idx""".stripMargin)),

    "vq1_int8_quantize" -> Q(
      (s, d) => Similarity.quantizeInt8(embs(s, d))
        .select(col("vec_id"), col("scale"),
          aggregate(col("qvec"), lit(0L), (a, b) => a + b.cast("long")).as("q_sum"),
          aggregate(col("qvec"), lit(0L), (a, b) => a + abs(b.cast("long"))).as("q_l1"),
          col("err_ok"))
        .orderBy("vec_id"),
      Some("""WITH v AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd FROM embeddings),
        |s AS (SELECT vec_id, xd,
        |        list_reduce(list_prepend(0.0, list_transform(xd, x -> abs(x))),
        |          (a, b) -> greatest(a, b)) AS scale FROM v),
        |q AS (SELECT vec_id, scale, xd,
        |        CASE WHEN scale = 0 THEN list_transform(xd, x -> 0)
        |        ELSE list_transform(xd, x -> CAST(round(x / scale * 127.0) AS INTEGER))
        |        END AS qv FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(qv, q -> abs(q))) AS BIGINT) AS q_l1,
        |  CASE WHEN scale = 0 THEN TRUE ELSE
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(qv) + 1),
        |      i -> abs(CAST(qv[i] AS DOUBLE) * scale / 127.0 - xd[i]))),
        |      (a, b) -> greatest(a, b)) <= scale / 253.0 END AS err_ok
        |FROM q ORDER BY vec_id""".stripMargin)),

    // CKA1: linear CKA between the float embeddings and their int8
    // dequantization (Kornblith et al. '19) — did quantization
    // preserve the GEOMETRY (rotation/scale-invariant), where vq1's
    // per-vector error bound can't see that a global rotation is
    // harmless. Exact integer Grams, fixed-unit pico Frobenius terms.
    "cka1_quantization_cka" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val deq = Similarity.quantizeInt8(e).select(col("vec_id"),
          when(col("scale") === 0.0, transform(col("qvec"), _ => lit(0.0)))
            .otherwise(transform(col("qvec"),
              q => q.cast("double") * col("scale") / lit(127.0)))
            .as("deq"))
        graft.ops.Pca.linearCka(
          e.select(col("vec_id"), col("embedding")).join(deq, "vec_id"),
          "embedding", "deq", "vec_id")
      },
      Some("""WITH v AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd FROM embeddings),
        |s AS (SELECT vec_id, xd,
        |    list_reduce(list_prepend(0.0, list_transform(xd, x -> abs(x))),
        |      (a, b) -> greatest(a, b)) AS scale FROM v),
        |q AS (SELECT vec_id, xd,
        |    CASE WHEN scale = 0 THEN list_transform(xd, x -> 0.0)
        |    ELSE list_transform(xd, x ->
        |      CAST(round(x / scale * 127.0) AS DOUBLE) * scale / 127.0)
        |    END AS yd FROM s),
        |rng AS (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS i),
        |ex AS MATERIALIZED (SELECT vec_id AS r, rng.i - 1 AS i,
        |    CAST(floor(xd[rng.i] * 1e6 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(yd[rng.i] * 1e6 + 0.5) AS BIGINT) AS y
        |  FROM q CROSS JOIN rng),
        |me AS (SELECT i, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
        |  FROM ex GROUP BY 1),
        |ce AS MATERIALIZED (SELECT ex.r, ex.i,
        |    n * x - sx AS cx, n * y - sy AS cy FROM ex JOIN me USING (i)),
        |gr AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
        |    sum(CAST(a.cx AS DECIMAL(38,0)) * CAST(b.cy AS DECIMAL(38,0))) AS gxy,
        |    sum(CAST(a.cx AS DECIMAL(38,0)) * CAST(b.cx AS DECIMAL(38,0))) AS gxx,
        |    sum(CAST(a.cy AS DECIMAL(38,0)) * CAST(b.cy AS DECIMAL(38,0))) AS gyy
        |  FROM ce a JOIN ce b ON a.r = b.r GROUP BY 1, 2),
        |fr AS (SELECT
        |    sum(CAST(CAST(floor((CAST(gxy AS DOUBLE) / 1e18)
        |      * (CAST(gxy AS DOUBLE) / 1e18) * 1e6 + 0.5) AS BIGINT)
        |      AS DECIMAL(38,0))) AS fxy,
        |    sum(CAST(CAST(floor((CAST(gxx AS DOUBLE) / 1e18)
        |      * (CAST(gxx AS DOUBLE) / 1e18) * 1e6 + 0.5) AS BIGINT)
        |      AS DECIMAL(38,0))) AS fxx,
        |    sum(CAST(CAST(floor((CAST(gyy AS DOUBLE) / 1e18)
        |      * (CAST(gyy AS DOUBLE) / 1e18) * 1e6 + 0.5) AS BIGINT)
        |      AS DECIMAL(38,0))) AS fyy
        |  FROM gr)
        |SELECT CASE WHEN CAST(fxx AS DOUBLE) * CAST(fyy AS DOUBLE) > 0.0
        |  THEN CAST(floor(CAST(fxy AS DOUBLE)
        |    / sqrt(CAST(fxx AS DOUBLE) * CAST(fyy AS DOUBLE)) * 1e9 + 0.5)
        |    AS BIGINT)
        |  ELSE 0 END AS cka_nano FROM fr""".stripMargin)),

    // CH1: shard-rebalance audit — mod-hash vs consistent-hash ring at
    // 8→9 shards over the real key population. The 100 TB planning
    // number: mod moves ~8/9 of the corpus, the ring ~1/9; assignment
    // is one in-row integer fold over plan-time ring literals, only the
    // shard-count rollups shuffle.
    "ch1_shard_rebalance" -> Q(
      (s, d) => graft.ops.Layout.consistentHashRebalance(
          docs(s, d).select("doc_id"))
        .orderBy("scheme", "shard"),
      Some(OracleGen.ch1Sql())),

    // RBO1: rank-biased overlap (Webber et al. 2010) between the exact
    // and the int8-quantized cosine rankings — the top-weighted "what
    // did quantization do to what users actually see" eval, scored as
    // exact pico-unit weight sums (tail-weight literals shared verbatim
    // between engines). Lists are k-bounded per query; nothing
    // corpus-sized shuffles beyond the two ranking legs.
    "rbo1_quant_rank_overlap" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val deq = Similarity.quantizeInt8(e).select(col("vec_id"),
          when(col("scale") === 0.0, transform(col("qvec"), _ => lit(0.0)))
            .otherwise(transform(col("qvec"),
              q => q.cast("double") * col("scale") / lit(127.0)))
            .as("embedding"))
        val exact = Similarity.bruteForceTopK(e,
            e.filter(col("vec_id") < 4), k = 10)
          .select(col("q_id"), col("n_id").as("id"), col("rank"))
        val quant = Similarity.bruteForceTopK(deq,
            deq.filter(col("vec_id") < 4), k = 10)
          .select(col("q_id"), col("n_id").as("id"), col("rank"))
        graft.ops.Search.rankBiasedOverlap(exact, quant, depth = 10, p = 0.9)
          .orderBy("q_id")
      },
      Some(OracleGen.rbo1Sql(4, 10, 0.9, 64))),

    // The fifth dedup modality end-to-end: embedding-cosine near-dup
    // pairs drive the corpus dedup DECISION (drop the later member of
    // every pair ≥ τ). Bounded to the ss2 slice so the exact pair
    // baseline stays the oracle; at scale the pair source swaps to
    // lshNearDupPairs with the same decision join.
    "dd6_embedding_dedup" -> Q(
      (s, d) => {
        val pairs = Similarity.cosineNearDupPairs(
            embs(s, d).filter(col("vec_id") < 600), threshold = 0.4)
          .select(col("id1").as("d1"), col("id2").as("d2"))
        Dedup.dropNearDuplicates(docs(s, d).filter(col("doc_id") < 600), pairs)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 600),
        |pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
        |         i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos_sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT doc_id FROM documents
        |WHERE doc_id < 600
        |  AND doc_id NOT IN (SELECT id2 FROM pairs WHERE cos_sim >= 0.4)
        |ORDER BY doc_id""".stripMargin)),

    // Per-dimension z-scoring of the embedding table; per-vector
    // checksums under the gate (sum-order ulps absorbed by round-6).
    "vq2_standardize" -> Q(
      (s, d) => Similarity.standardize(embs(s, d))
        .select(col("vec_id"), col("dim_count"),
          round(col("z_sum"), 6).as("z_sum"),
          round(col("z_min"), 6).as("z_min"),
          round(col("z_max"), 6).as("z_max"))
        .orderBy("vec_id"),
      Some("""WITH x AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |st AS (SELECT dim, avg(v) AS mu, stddev_pop(v) AS sigma FROM x GROUP BY 1),
        |z AS (SELECT x.vec_id,
        |    CASE WHEN st.sigma > 0.0 THEN (x.v - st.mu) / st.sigma ELSE 0.0 END AS z
        |  FROM x JOIN st USING (dim))
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS dim_count,
        |  round(sum(z), 6) AS z_sum, round(min(z), 6) AS z_min,
        |  round(max(z), 6) AS z_max
        |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // SemDeDup: embedding-space dedup made tractable by confining the
    // quadratic pair search to centroid cells. The GATE path uses the
    // fixed deterministic centroids (plan-time literals the oracle is
    // handed verbatim — OracleGen.dd13Sql); production swaps in the
    // k-means index with identical plumbing (the ss5 discipline).
    "dd13_semantic_dedup" -> Q(
      (s, d) => Similarity.semanticDedup(embs(s, d), threshold = 0.4,
          centroids = Similarity.fixedCentroids(16, 64))
        .orderBy("vec_id"),
      Some(OracleGen.dd13Sql(0.4))),

    // DD7: near-dup pairs -> dedup CLUSTERS via distributed connected
    // components (iterative min-label propagation; see
    // Dedup.connectedComponents for the per-round shuffle profile).
    // Pair source here is the exact-cosine baseline so the DuckDB
    // oracle can rebuild the same graph and close it with a recursive
    // CTE; at scale the pair source swaps to lshNearDupPairs/
    // minhashLshPairs with the same clustering pass.
    "dd7_dedup_clusters" -> Q(
      (s, d) => {
        val bounded = embs(s, d).filter(col("vec_id") < 600)
        val pairs = Similarity.cosineNearDupPairs(bounded, threshold = 0.4)
          .select(col("id1").as("d1"), col("id2").as("d2"))
        val verts = bounded.select(col("vec_id").as("v"))
        val cc = Dedup.connectedComponents(verts, pairs)
        val sizes = cc.groupBy("cluster").agg(count(lit(1)).cast("long").as("csize"))
        cc.join(sizes, "cluster")
          .select(col("v"), col("cluster"), col("csize"),
            (col("v") === col("cluster")).as("is_rep"))
          .orderBy("v")
      },
      Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 600),
        |pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
        |         i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos_sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
        |edges AS (SELECT CAST(id1 AS BIGINT) AS src, CAST(id2 AS BIGINT) AS dst
        |            FROM pairs WHERE cos_sim >= 0.4
        |          UNION ALL
        |          SELECT CAST(id2 AS BIGINT), CAST(id1 AS BIGINT)
        |            FROM pairs WHERE cos_sim >= 0.4),
        |reach(v, r) AS (
        |  SELECT CAST(vec_id AS BIGINT), CAST(vec_id AS BIGINT) FROM e
        |  UNION
        |  SELECT edges.dst, reach.r FROM reach JOIN edges ON edges.src = reach.v),
        |cl AS (SELECT v, min(r) AS cluster FROM reach GROUP BY v),
        |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS csize FROM cl GROUP BY cluster)
        |SELECT cl.v, cl.cluster, sz.csize, cl.v = cl.cluster AS is_rep
        |FROM cl JOIN sz USING (cluster) ORDER BY v""".stripMargin)),

    // Quality-aware canonical selection: near-dup clusters where the
    // kept member is the HIGHEST-quality doc (tx2 score), not the min
    // id — the production keep rule. Pair source is SemDeDup's
    // CELL-CONFINED graph (semanticDedupPairs over the fixed
    // deterministic centroids — the pair generator that stays tractable
    // at corpus scale), which the oracle reproduces cell by cell
    // (OracleGen.dd14Sql); the exact all-pairs composition remains
    // dd7's disclosed baseline. Same-operand doubles order identically
    // in both engines, so the argmax and its lower-id tiebreak are
    // exact.
    "dd14_quality_canonical" -> Q(
      (s, d) => {
        val bounded = embs(s, d).filter(col("vec_id") < 600)
        val pairs = Similarity.semanticDedupPairs(bounded, threshold = 0.4,
            centroids = Similarity.fixedCentroids(16, 64))
          .select(col("id1").as("d1"), col("id2").as("d2"))
        val cc = Dedup.connectedComponents(
          bounded.select(col("vec_id").as("v")), pairs)
        val scored = Text.withQuality(docs(s, d).filter(col("doc_id") < 600))
        Dedup.qualityCanonical(cc, scored)
          .select(col("doc_id"), col("cluster"),
            round(col("quality_score"), 6).as("q"), col("is_canonical"))
          .orderBy("doc_id")
      },
      Some(OracleGen.dd14Sql(0.4, 600))),

    // SP2: LEAKAGE-SAFE train/val/test split — the sp1 hash coin
    // flipped per NEAR-DUP CLUSTER instead of per document, so two
    // near-duplicates can never land on opposite sides of a train/test
    // boundary (the classic eval-contamination failure sp1's per-doc
    // coin cannot prevent). Composition: dd7's component pass over the
    // cosine near-dup graph assigns cluster ids, the md5 coin flips on
    // the cluster id, members inherit. Oracle = dd7's recursive-CTE
    // closure + sp1's coin restated on the cluster id.
    //
    // SCALE NOTE on the pair source: the exact O(n²)
    // cosineNearDupPairs feed is the GATE shape only (bounded to 600
    // ids so the oracle's all-pairs join stays cheap). At corpus scale
    // the edge feed swaps to a banded candidate generator —
    // Dedup.minhashLshPairs (dd2/dd12's source) for text shingles or
    // Similarity.semanticDedupPairs (dd13's source) for embeddings —
    // and everything downstream (connectedComponents, the cluster
    // coin, the inherit join) is unchanged. Both banded sources are
    // themselves gate-checked; sp4 below registers that composition.
    "sp2_cluster_safe_split" -> Q(
      (s, d) => {
        val bounded = embs(s, d).filter(col("vec_id") < 600)
        val pairs = Similarity.cosineNearDupPairs(bounded, threshold = 0.4)
          .select(col("id1").as("d1"), col("id2").as("d2"))
        val cc = Dedup.connectedComponents(
          bounded.select(col("vec_id").as("v")), pairs)
        val assigned = graft.ops.Curate.hashSplit(
          cc.select(col("cluster")).distinct(), "cluster",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        cc.join(broadcast(assigned), "cluster")
          .select(col("v"), col("cluster"), col("split")).orderBy("v")
      },
      Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 600),
        |pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
        |         i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos_sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
        |edges AS (SELECT CAST(id1 AS BIGINT) AS src, CAST(id2 AS BIGINT) AS dst
        |            FROM pairs WHERE cos_sim >= 0.4
        |          UNION ALL
        |          SELECT CAST(id2 AS BIGINT), CAST(id1 AS BIGINT)
        |            FROM pairs WHERE cos_sim >= 0.4),
        |reach(v, r) AS (
        |  SELECT CAST(vec_id AS BIGINT), CAST(vec_id AS BIGINT) FROM e
        |  UNION
        |  SELECT edges.dst, reach.r FROM reach JOIN edges ON edges.src = reach.v),
        |cl AS (SELECT v, min(r) AS cluster FROM reach GROUP BY v),
        |coin AS (SELECT cluster,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5(CAST(cluster AS VARCHAR)), i, 1)) - 1 AS BIGINT))),
        |    (a, x) -> a * 16 + x) AS DOUBLE) / CAST(4294967296 AS DOUBLE) AS u
        |  FROM (SELECT DISTINCT cluster FROM cl))
        |SELECT cl.v, cl.cluster,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM cl JOIN coin USING (cluster)
        |ORDER BY v""".stripMargin)),

    // SP4: sp2's leakage-safe cluster split fed by the BANDED pair
    // source — semanticDedupPairs over the fixed centroids (dd14's
    // cell-confined generator, the one that stays tractable at corpus
    // scale) replacing sp2's exact O(n²) baseline. Same component
    // pass, same md5 cluster coin, same split law; registering the
    // composition proves the scale path end-to-end, not just its
    // parts.
    "sp4_banded_cluster_split" -> Q(
      (s, d) => {
        val bounded = embs(s, d).filter(col("vec_id") < 600)
        val pairs = Similarity.semanticDedupPairs(bounded, threshold = 0.4,
            centroids = Similarity.fixedCentroids(16, 64))
          .select(col("id1").as("d1"), col("id2").as("d2"))
        val cc = Dedup.connectedComponents(
          bounded.select(col("vec_id").as("v")), pairs)
        val assigned = graft.ops.Curate.hashSplit(
          cc.select(col("cluster")).distinct(), "cluster",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        cc.join(broadcast(assigned), "cluster")
          .select(col("v"), col("cluster"), col("split")).orderBy("v")
      },
      Some(OracleGen.sp4Sql(0.4, 600))),

    // Quantified driver-visible quality check for the approximate ANN
    // paths: recall of ss3/ss4/ss5 against their exact ground truths,
    // computed entirely in-plan (semi-join hit counting — no collect).
    // Fully oracle-checked: the serialized plane/centroid literals that
    // make ss3/ss4/ss5 individually reproducible compose into a recall
    // oracle too (OracleGen.ann1Sql) — the IVF leg therefore uses the
    // fixed deterministic centroids (the ss5 gate convention); the
    // k-means index path stays quantified via ann2_recall_floor.
    "ann1_recall" -> Q(
      (s, d) => {
        // ONE pass over each truth per method: a left join marks hits,
        // a single aggregation counts rows and hits together (the
        // semi-join + crossJoin form would re-execute the truth subplan
        // twice per method). The truths themselves are persisted — each
        // brute-force baseline is expensive and feeds two methods.
        def recallOf(name: String, truth: DataFrame, approx: DataFrame): DataFrame =
          truth.join(approx.withColumn("__hit", lit(1)), Seq("q_id", "n_id"), "left")
            .agg(count(lit(1)).cast("long").as("n_truth"),
              count(col("__hit")).cast("long").as("n_hits"))
            .select(lit(name).as("method"), col("n_hits"), col("n_truth"),
              round(col("n_hits").cast("double")
                / greatest(col("n_truth"), lit(1L)).cast("double"), 6).as("recall"))
        val e = embs(s, d)
        val q = e.filter(col("vec_id") < 8)
        val topkTruth = Similarity.bruteForceTopK(e, q, k = 5).select("q_id", "n_id")
          .persist()
        val bounded = e.filter(col("vec_id") < 600)
        val pairTruth = Similarity.cosineNearDupPairs(bounded, threshold = 0.4)
          .select(col("id1").as("q_id"), col("id2").as("n_id"))
        val pairLsh = Similarity.lshNearDupPairs(bounded, threshold = 0.4,
            nPlanes = 8, nTables = 8, multiProbe = true)
          .select(col("id1").as("q_id"), col("id2").as("n_id"))
        recallOf("ss3_lsh_topk", topkTruth,
            Similarity.lshTopK(e, q, k = 5, nTables = 8).select("q_id", "n_id"))
          .unionByName(recallOf("ss4_lsh_neardup", pairTruth, pairLsh))
          .unionByName(recallOf("ss5_ivf_topk", topkTruth,
            Similarity.ivfTopK(e, q, k = 5,
              centroids = Similarity.fixedCentroids(16, 64)).select("q_id", "n_id")))
          .orderBy("method")
      },
      Some(OracleGen.ann1Sql())),

    // ann1's gate-checkable twin (the ag1 pattern): the exact-baseline
    // sizes carry the cross-engine hash — DuckDB recomputes both truth
    // sets from scratch — and each method's recall collapses to a
    // floor-check boolean that flips the row red if LSH/IVF accuracy
    // ever regresses. Floors sit ~0.1 under the measured sf0.01
    // recalls (ss3 0.50, ss4 0.78, ss5 0.625).
    "ann2_recall_floor" -> Q(
      (s, d) => {
        def floorOf(name: String, truth: DataFrame, approx: DataFrame,
                    floor: Double): DataFrame =
          truth.join(approx.withColumn("__hit", lit(1)), Seq("q_id", "n_id"), "left")
            .agg(count(lit(1)).cast("long").as("n_truth"),
              count(col("__hit")).cast("long").as("n_hits"))
            .select(lit(name).as("method"), col("n_truth"),
              lit(floor).as("recall_floor"),
              (col("n_hits").cast("double")
                >= lit(floor) * col("n_truth").cast("double")).as("recall_ok"))
        val e = embs(s, d)
        val q = e.filter(col("vec_id") < 8)
        val topkTruth = Similarity.bruteForceTopK(e, q, k = 5).select("q_id", "n_id")
          .persist()
        val bounded = e.filter(col("vec_id") < 600)
        val pairTruth = Similarity.cosineNearDupPairs(bounded, threshold = 0.4)
          .select(col("id1").as("q_id"), col("id2").as("n_id"))
        floorOf("ss3_lsh_topk", topkTruth,
            Similarity.lshTopK(e, q, k = 5, nTables = 8).select("q_id", "n_id"), 0.4)
          .unionByName(floorOf("ss4_lsh_neardup", pairTruth,
            Similarity.lshNearDupPairs(bounded, threshold = 0.4,
              nPlanes = 8, nTables = 8, multiProbe = true)
              .select(col("id1").as("q_id"), col("id2").as("n_id")), 0.6))
          .unionByName(floorOf("ss5_ivf_topk", topkTruth,
            Similarity.ivfTopK(e, q, k = 5).select("q_id", "n_id"), 0.5))
          .orderBy("method")
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM e WHERE vec_id < 8),
        |p AS (
        |  SELECT q_id, e.vec_id AS n_id,
        |    list_sum(list_transform(range(1, len(q_vec) + 1),
        |      i -> CAST(q_vec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1),
        |         i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS sim
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q_id),
        |ranked AS (SELECT q_id, row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank FROM p),
        |topk_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked WHERE rank <= 5),
        |b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 600),
        |bp AS (
        |  SELECT list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(x.embedding) + 1),
        |         i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))) AS sim
        |  FROM b a JOIN b x ON a.vec_id < x.vec_id),
        |pair_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bp WHERE sim >= 0.4)
        |SELECT * FROM (
        |  SELECT 'ss3_lsh_topk' AS method, (SELECT n FROM topk_n) AS n_truth,
        |    CAST(0.4 AS DOUBLE) AS recall_floor, TRUE AS recall_ok
        |  UNION ALL SELECT 'ss4_lsh_neardup', (SELECT n FROM pair_n),
        |    CAST(0.6 AS DOUBLE), TRUE
        |  UNION ALL SELECT 'ss5_ivf_topk', (SELECT n FROM topk_n),
        |    CAST(0.5 AS DOUBLE), TRUE
        |) ORDER BY method""".stripMargin)),

    // ---- multimodal ---------------------------------------------------

    "mm1_extract_features" -> Q(
      (s, d) => Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs(s, d)))
        .toDF().orderBy("doc_id"),
      Some("""WITH m AS (SELECT doc_id,
        |  (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
        |  octet_length(encode(text)) AS n, md5(text) AS checksum FROM documents)
        |SELECT doc_id, media_type, CAST(n AS BIGINT) AS n_bytes, checksum,
        |  CAST((n % 512) + 16 AS INTEGER) AS width,
        |  CAST(((n // 512) % 512) + 16 AS INTEGER) AS height,
        |  CAST((n + 1023) // 1024 AS INTEGER) AS n_frames
        |FROM m ORDER BY doc_id""".stripMargin)),

    // REAL video decode: synthesize a YUV4MPEG2 stream per document
    // (C420 frames cycling the UTF-8 text bytes), genuinely walk the
    // tagged header and every FRAME marker, and emit each sampled
    // frame's PARSED data offset + luma-plane sum. The oracle rebuilds
    // offsets and sums from the synthesis rule with integer arithmetic
    // (the mm4 hex-byte trick), so a wrong header walk, frame-size
    // rule, or marker scan shifts every row — the decode itself is
    // value-checked, and no modality is stubbed anymore.
    "mm2_sample_frames" -> Q(
      (s, d) => Multimodal.sampleFramesY4m(
          Multimodal.y4mFromDocuments(docs(s, d)), stride = 2)
        .toDF().orderBy("doc_id", "frame_idx"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(16 + (doc_id % 16) * 2 AS INTEGER) AS w,
        |    CAST(16 + ((doc_id // 7) % 16) * 2 AS INTEGER) AS h,
        |    CAST(2 + doc_id % 5 AS INTEGER) AS nf,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |t AS (SELECT doc_id, w, h, nf, bytes, len(bytes) AS L,
        |    w * h * 3 // 2 AS fs,
        |    length('YUV4MPEG2 W' || CAST(w AS VARCHAR) || ' H' || CAST(h AS VARCHAR)
        |           || ' F25:1 Ip A1:1 C420jpeg') + 1 AS hl
        |  FROM d),
        |f AS (SELECT *, unnest(range(0, nf)) AS k FROM t)
        |SELECT doc_id, w AS width, h AS height, nf AS n_frames,
        |  CAST(k AS INTEGER) AS frame_idx,
        |  CAST(hl + (k + 1) * 6 + k * fs AS BIGINT) AS data_offset,
        |  CAST(fs AS INTEGER) AS frame_n_bytes,
        |  CAST(list_sum(list_transform(range(0, w * h),
        |    j -> bytes[CAST((k * fs + j) % L + 1 AS INTEGER)])) AS BIGINT) AS y_sum
        |FROM f WHERE k % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin)),

    // MM5: scene-cut detection on the decoded video — mean-luma jump
    // >= 0.25 gray levels between consecutive frames (the synthetic
    // frames cycle the same text bytes, so their means differ by
    // fractions of a level; w*h is divisible by 4, making the
    // quarter-level threshold exact in both engines). The oracle rebuilds every frame's luma sum
    // from the synthesis rule (the mm2 walk, stride 1) and applies the
    // same lag/threshold — a wrong frame walk or off-by-one in the
    // window shifts every cut.
    // Image near-dup via aHash + banded hamming join: the corpus is
    // docs<200 plus planted one-char variants at +12000 (the offset is
    // ≡0 mod both dimension generators, so the variant image keeps its
    // dims and pixel phase — a genuine near-duplicate). The oracle runs
    // the n² hamming form, proving the band pigeonhole lossless.
    "mm6_image_phash" -> Q(
      (s, d) => {
        val base = docs(s, d).filter(col("doc_id") < 200).select("doc_id", "text")
        val planted = base.select((col("doc_id") + 12000).as("doc_id"),
          concat(lit("Q"), expr("substring(text, 2)")).as("text"))
        Multimodal.imageNearDupPairs(
            Multimodal.aHashPpm(Multimodal.ppmFromDocuments(base.unionByName(planted))),
            maxDist = 3, bands = 4)
          .orderBy("d1", "d2")
      },
      Some("""WITH docs2 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL
        |  SELECT doc_id + 12000, 'Q' || substr(text, 2) FROM documents WHERE doc_id < 200),
        |b AS (SELECT doc_id, hex(encode(text)) AS hx FROM docs2),
        |d AS (SELECT doc_id,
        |    CAST(8 + doc_id % 24 AS INTEGER) AS w,
        |    CAST(8 + (doc_id // 5) % 24 AS INTEGER) AS h,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |px AS (SELECT doc_id, w, h, len(bytes) AS L, bytes,
        |       unnest(range(0, w*h)) AS p FROM d),
        |g AS (SELECT doc_id, w, h, (p % w) AS x, (p // w) AS y,
        |    (bytes[((p*3) % L) + 1] + bytes[((p*3+1) % L) + 1]
        |     + bytes[((p*3+2) % L) + 1]) // 3 AS gray
        |  FROM px),
        |cells AS (SELECT doc_id, (y*8//h)*8 + (x*8//w) AS cell,
        |       sum(gray) AS s, count(*) AS c FROM g GROUP BY 1, 2),
        |avgs AS (SELECT doc_id, list(s // c ORDER BY cell) AS av FROM cells GROUP BY 1),
        |hsh AS (SELECT doc_id,
        |    array_to_string(list_transform(av,
        |      a -> CASE WHEN a >= list_sum(av)//64 THEN '1' ELSE '0' END), '') AS bits
        |  FROM avgs),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(len(list_filter(range(1, 65),
        |      i -> substr(a.bits, i, 1) != substr(b.bits, i, 1))) AS BIGINT) AS hamming
        |  FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id)
        |SELECT d1, d2, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY d1, d2""".stripMargin)),

    // MM7: video near-dup via keyframe aHash + banded hamming join —
    // completes the near-dup family across all five modalities.
    // Planted one-char variants sit at +11200 (≡0 mod 112, preserving
    // both dimension generators so the variant keeps its frame
    // geometry and byte phase). Variants land mostly at hamming 0-3
    // (the luma is raw bytes, so a harsher change can exceed the
    // threshold and legitimately not pair); nearest non-planted pair
    // measured at 10. The oracle resynthesizes frame-0 luma and runs
    // the n² hamming form — the 4-band pigeonhole proven lossless.
    "mm7_video_neardup" -> Q(
      (s, d) => {
        val base = docs(s, d).filter(col("doc_id") < 200).select("doc_id", "text")
        val planted = base.select((col("doc_id") + 11200).as("doc_id"),
          concat(lit("Q"), expr("substring(text, 2)")).as("text"))
        Multimodal.videoNearDupPairs(
            Multimodal.videoFingerprint(
              Multimodal.y4mFromDocuments(base.unionByName(planted))),
            maxDist = 3, bands = 4)
          .orderBy("d1", "d2")
      },
      Some("""WITH docs2 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL
        |  SELECT doc_id + 11200, 'Q' || substr(text, 2) FROM documents WHERE doc_id < 200),
        |b AS (SELECT doc_id, hex(encode(text)) AS hx FROM docs2),
        |d AS (SELECT doc_id,
        |    CAST(16 + (doc_id % 16) * 2 AS INTEGER) AS w,
        |    CAST(16 + ((doc_id // 7) % 16) * 2 AS INTEGER) AS h,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |px AS (SELECT doc_id, w, h, len(bytes) AS L, bytes,
        |       unnest(range(0, w*h)) AS p FROM d),
        |g AS (SELECT doc_id, w, h, (p % w) AS x, (p // w) AS y,
        |    bytes[(p % L) + 1] AS luma
        |  FROM px),
        |cells AS (SELECT doc_id, (y*8//h)*8 + (x*8//w) AS cell,
        |       sum(luma) AS s, count(*) AS c FROM g GROUP BY 1, 2),
        |avgs AS (SELECT doc_id, list(s // c ORDER BY cell) AS av FROM cells GROUP BY 1),
        |hsh AS (SELECT doc_id,
        |    array_to_string(list_transform(av,
        |      a -> CASE WHEN a >= list_sum(av)//64 THEN '1' ELSE '0' END), '') AS bits
        |  FROM avgs),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(len(list_filter(range(1, 65),
        |      i -> substr(a.bits, i, 1) != substr(b.bits, i, 1))) AS BIGINT) AS hamming
        |  FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id)
        |SELECT d1, d2, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY d1, d2""".stripMargin)),

    "mm5_scene_cuts" -> Q(
      (s, d) => Multimodal.sceneCutsY4m(
          Multimodal.y4mFromDocuments(docs(s, d)), meanDelta = 0.25)
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(16 + (doc_id % 16) * 2 AS INTEGER) AS w,
        |    CAST(16 + ((doc_id // 7) % 16) * 2 AS INTEGER) AS h,
        |    CAST(2 + doc_id % 5 AS INTEGER) AS nf,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |t AS (SELECT doc_id, w, h, nf, bytes, len(bytes) AS L,
        |    w * h * 3 // 2 AS fs
        |  FROM d),
        |f AS (SELECT *, unnest(range(0, nf)) AS k FROM t),
        |ys AS (SELECT doc_id, w, h, CAST(k AS INTEGER) AS frame_idx,
        |    CAST(list_sum(list_transform(range(0, w * h),
        |      j -> bytes[CAST((k * fs + j) % L + 1 AS INTEGER)])) AS BIGINT) AS y_sum
        |  FROM f),
        |lagd AS (SELECT doc_id, frame_idx, w, h,
        |    lag(y_sum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_y_sum,
        |    y_sum
        |  FROM ys)
        |SELECT doc_id, frame_idx, prev_y_sum, y_sum,
        |  CAST(abs(y_sum - prev_y_sum) AS BIGINT) AS delta
        |FROM lagd
        |WHERE prev_y_sum IS NOT NULL
        |  AND abs(y_sum - prev_y_sum) >= CAST(w AS BIGINT) * h * CAST(0.25 AS DOUBLE)
        |ORDER BY doc_id, frame_idx""".stripMargin)),

    // REAL codec path: synthesize a decodable P6 image per document
    // (pixels cycle the UTF-8 text bytes), genuinely parse the binary
    // header, nearest-neighbor-resize the RGB grid to 8x8, re-encode.
    // The oracle reproduces the resample arithmetic byte-for-byte from
    // the hex-decoded text (the tx4 trick), so a wrong header parse,
    // wrong stride, or wrong channel order shifts every sum → MATCH is
    // a value proof of the decoder, not just plumbing.
    "mm3_resize_thumbnails" -> Q(
      (s, d) => Multimodal.resizePpm(Multimodal.ppmFromDocuments(docs(s, d)), side = 8)
        .toDF().select(col("doc_id"), col("src_w"), col("src_h"),
          length(col("thumb")).as("thumb_bytes"),
          col("t_r_sum"), col("t_g_sum"), col("t_b_sum"))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(8 + doc_id % 24 AS INTEGER) AS w,
        |    CAST(8 + (doc_id // 5) % 24 AS INTEGER) AS h,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |t AS (SELECT doc_id, w, h, bytes, len(bytes) AS L,
        |    list_transform(range(0, 64),
        |      t -> ((((t // 8) * h) // 8 * w + ((t % 8) * w) // 8) * 3)) AS base
        |  FROM d)
        |SELECT doc_id, w AS src_w, h AS src_h, CAST(203 AS INTEGER) AS thumb_bytes,
        |  CAST(list_sum(list_transform(base, i -> bytes[(i % L) + 1])) AS BIGINT) AS t_r_sum,
        |  CAST(list_sum(list_transform(base, i -> bytes[((i + 1) % L) + 1])) AS BIGINT) AS t_g_sum,
        |  CAST(list_sum(list_transform(base, i -> bytes[((i + 2) % L) + 1])) AS BIGINT) AS t_b_sum
        |FROM t ORDER BY doc_id""".stripMargin)),

    // MM8: exposure/contrast QA through the real P6 parse — integer
    // BT.601 luma (x1000), exact sum/square-sum/min/max and under/
    // over-exposure counts; the image-corpus screening pass.
    "mm8_image_quality" -> Q(
      (s, d) => Multimodal.imageQuality(
          Multimodal.ppmFromDocuments(docs(s, d)))
        .toDF().orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(8 + doc_id % 24 AS INTEGER) AS w,
        |    CAST(8 + (doc_id // 5) % 24 AS INTEGER) AS h,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |t AS (SELECT doc_id, w, h, len(bytes) AS L,
        |    list_transform(range(0, w * h), p ->
        |      299 * bytes[((3 * p) % L) + 1]
        |      + 587 * bytes[((3 * p + 1) % L) + 1]
        |      + 114 * bytes[((3 * p + 2) % L) + 1]) AS lumas
        |  FROM d)
        |SELECT doc_id, CAST(w * h AS INTEGER) AS n_px,
        |  CAST(list_sum(lumas) AS BIGINT) AS luma_sum,
        |  CAST(list_sum(list_transform(lumas,
        |    x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS luma_sq_sum,
        |  CAST(list_min(lumas) AS INTEGER) AS luma_min,
        |  CAST(list_max(lumas) AS INTEGER) AS luma_max,
        |  CAST(len(list_filter(lumas, x -> x < 30000)) AS BIGINT) AS n_under,
        |  CAST(len(list_filter(lumas, x -> x > 225000)) AS BIGINT) AS n_over
        |FROM t ORDER BY doc_id""".stripMargin)),

    // Full-image channel statistics through the same real parse — the
    // decode step of the codec under its own oracle row.
    "mm4_image_stats" -> Q(
      (s, d) => Multimodal.ppmStats(Multimodal.ppmFromDocuments(docs(s, d)))
        .toDF().select(col("doc_id"), col("width"), col("height"),
          col("r_sum"), col("g_sum"), col("b_sum"))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(8 + doc_id % 24 AS INTEGER) AS w,
        |    CAST(8 + (doc_id // 5) % 24 AS INTEGER) AS h,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |t AS (SELECT doc_id, w, h, bytes, len(bytes) AS L,
        |    list_transform(range(0, w * h), p -> p * 3) AS base FROM d)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(list_sum(list_transform(base, i -> bytes[(i % L) + 1])) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(base, i -> bytes[((i + 1) % L) + 1])) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(base, i -> bytes[((i + 2) % L) + 1])) AS BIGINT) AS b_sum
        |FROM t ORDER BY doc_id""".stripMargin)),

    // Real WAV (RIFF PCM s16le) decode: synthesize an 8 kHz mono wave
    // per document, chunk-walk the container, and compute all-integer
    // audio features — every value (duration, peak, Σ|s|, zero
    // crossings) reproduced by DuckDB from the synthesis rule, so a
    // header-offset or endianness bug shifts every row red.
    "au1_wav_stats" -> Q(
      (s, d) => Multimodal.wavStats(Multimodal.wavFromDocuments(docs(s, d)))
        .toDF().select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("duration_us"), col("peak"), col("abs_sum"), col("zero_crossings"))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(256 + doc_id % 512 AS INTEGER) AS n,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(0, n),
        |      i -> (bytes[(i % len(bytes)) + 1] - 128) * 256) AS smp
        |  FROM d)
        |SELECT doc_id,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  n AS n_samples,
        |  CAST(n * 125 AS BIGINT) AS duration_us,
        |  CAST(list_max(list_transform(smp, x -> abs(x))) AS INTEGER) AS peak,
        |  CAST(list_sum(list_transform(smp, x -> abs(x))) AS BIGINT) AS abs_sum,
        |  CAST(list_sum(list_transform(range(2, n + 1),
        |    i -> CASE WHEN (smp[i] < 0) != (smp[i-1] < 0) THEN 1 ELSE 0 END))
        |    AS INTEGER) AS zero_crossings
        |FROM s ORDER BY doc_id""".stripMargin)),

    // AU5: energy-gate VAD segmentation over the REAL WAV decode —
    // per-frame |s| sums at the codec boundary, integer cross-product
    // activity test, gaps-and-islands segments with exact ms bounds;
    // the keep-utterances/drop-silence cut of speech-corpus curation.
    "au5_vad_segments" -> Q(
      (s, d) => Multimodal.vadSegments(Multimodal.wavFromDocuments(docs(s, d)))
        .orderBy("doc_id", "seg"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(256 + doc_id % 512 AS INTEGER) AS n,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(0, n),
        |      i -> (bytes[(i % len(bytes)) + 1] - 128) * 256) AS smp
        |  FROM d),
        |sam AS (SELECT doc_id, u.i AS idx,
        |    abs(smp[CAST(u.i AS INTEGER) + 1]) AS ab
        |  FROM s, unnest(range(0, n)) AS u(i)),
        |fr AS (SELECT doc_id, CAST(idx // 64 AS BIGINT) AS f,
        |    CAST(count(*) AS BIGINT) AS nif, CAST(sum(ab) AS BIGINT) AS es
        |  FROM sam GROUP BY 1, 2),
        |act AS (SELECT *, CAST(row_number() OVER (
        |      PARTITION BY doc_id ORDER BY f) AS BIGINT) AS rn
        |  FROM fr WHERE es >= 8000 * nif),
        |sg AS (SELECT doc_id, f - rn AS grp, min(f) AS f0,
        |    CAST(count(*) AS BIGINT) AS n_frames,
        |    CAST(sum(es) AS BIGINT) AS tot, CAST(sum(nif) AS BIGINT) AS ns,
        |    max(f * 64 + nif) AS end_sample
        |  FROM act GROUP BY 1, 2)
        |SELECT doc_id, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY f0) AS BIGINT) AS seg,
        |  (f0 * 64 * 1000) // 8000 AS start_ms,
        |  (end_sample * 1000) // 8000 AS end_ms,
        |  n_frames, tot // ns AS mean_abs
        |FROM sg ORDER BY doc_id, seg""".stripMargin)),

    // AU6: spectral power at fixed 500 Hz-multiple analysis bins over
    // the REAL WAV decode — exact 16-periodic DFT coefficient tables
    // shared as literals by both engines (libm-free determinism); the
    // band-energy gate of speech curation (tone/noise clip detection).
    "au6_spectral_power" -> Q(
      (s, d) => Multimodal.spectralFeatures(Multimodal.wavFromDocuments(docs(s, d)))
        .toDF().orderBy("doc_id", "bin_hz"),
      Some(OracleGen.au6Sql())),

    // Decimation resample (8 kHz -> 4 kHz) over the REAL WAV decode:
    // clipped integer boxcar sums — no division, no rounding mode to
    // reconcile; the oracle rebuilds every output sample from the
    // synthesis rule and byte arithmetic.
    "au3_resample" -> Q(
      (s, d) => Multimodal.resampleStats(Multimodal.wavFromDocuments(docs(s, d)))
        .toDF().select(col("doc_id"), col("rate_in"), col("rate_out"),
          col("n_in"), col("n_out"), col("peak"), col("abs_sum"),
          col("zero_crossings"))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(256 + doc_id % 512 AS INTEGER) AS n,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(0, n),
        |      i -> (bytes[(i % len(bytes)) + 1] - 128) * 256) AS smp
        |  FROM d),
        |y AS (SELECT doc_id, n, CAST(n // 2 AS INTEGER) AS m,
        |    list_transform(range(0, n // 2),
        |      i -> greatest(-32768, least(32767, smp[2*i+1] + smp[2*i+2]))) AS ys
        |  FROM s)
        |SELECT doc_id,
        |  CAST(8000 AS INTEGER) AS rate_in,
        |  CAST(4000 AS INTEGER) AS rate_out,
        |  n AS n_in, m AS n_out,
        |  CAST(coalesce(list_max(list_transform(ys, x -> abs(x))), 0) AS INTEGER) AS peak,
        |  CAST(coalesce(list_sum(list_transform(ys, x -> abs(x))), 0) AS BIGINT) AS abs_sum,
        |  CAST(coalesce(list_sum(list_transform(range(2, m + 1),
        |    i -> CASE WHEN (ys[i] < 0) != (ys[i-1] < 0) THEN 1 ELSE 0 END)), 0)
        |    AS INTEGER) AS zero_crossings
        |FROM y ORDER BY doc_id""".stripMargin)),

    // Audio-quality gates: silence ratio, energy, clipping, and the
    // stuck-sample run detector — all-integer, value-checked; max_run
    // is reproduced in SQL by the gaps-and-islands window.
    "au2_audio_quality" -> Q(
      (s, d) => Multimodal.audioQuality(Multimodal.wavFromDocuments(docs(s, d)))
        .toDF().select(col("doc_id"), col("n_samples"), col("n_silent"),
          col("sq_sum"), col("n_clipped"), col("max_run"))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(256 + doc_id % 512 AS INTEGER) AS n,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(0, n),
        |      i -> (bytes[(i % len(bytes)) + 1] - 128) * 256) AS smp
        |  FROM d),
        |flat AS (SELECT doc_id, unnest(smp) AS v,
        |    unnest(range(0, n)) AS i FROM s),
        |runs AS (SELECT doc_id, v,
        |    i - row_number() OVER (PARTITION BY doc_id, v ORDER BY i) AS grp
        |  FROM flat),
        |mr AS (SELECT doc_id, CAST(max(rl) AS INTEGER) AS max_run FROM (
        |    SELECT doc_id, count(*) AS rl FROM runs GROUP BY doc_id, v, grp)
        |  GROUP BY doc_id)
        |SELECT s.doc_id, s.n AS n_samples,
        |  CAST(list_sum(list_transform(smp,
        |    x -> CASE WHEN abs(x) <= 2048 THEN 1 ELSE 0 END)) AS BIGINT) AS n_silent,
        |  CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT) AS sq_sum,
        |  CAST(list_sum(list_transform(smp,
        |    x -> CASE WHEN abs(x) >= 32256 THEN 1 ELSE 0 END)) AS BIGINT) AS n_clipped,
        |  mr.max_run
        |FROM s JOIN mr ON mr.doc_id = s.doc_id ORDER BY s.doc_id""".stripMargin)),

    // AU4: audio near-dup via the energy-envelope fingerprint + banded
    // hamming join — the audio member of the near-dup family (text:
    // dd3/dd4; images: mm6; embeddings: ss4). Corpus = docs<200 plus
    // planted one-char variants at +12800 (≡0 mod 512, so the variant
    // keeps its sample count and byte phase — a genuine near-duplicate;
    // measured: every planted pair lands within hamming 4, nearest
    // non-planted pair sits at 13). The oracle resynthesizes every
    // fingerprint from the WAV rule and runs the n² hamming form,
    // proving the 8-band pigeonhole lossless at maxDist 6.
    "au4_audio_neardup" -> Q(
      (s, d) => {
        val base = docs(s, d).filter(col("doc_id") < 200).select("doc_id", "text")
        val planted = base.select((col("doc_id") + 12800).as("doc_id"),
          concat(lit("Q"), expr("substring(text, 2)")).as("text"))
        Multimodal.audioNearDupPairs(
            Multimodal.audioFingerprint(
              Multimodal.wavFromDocuments(base.unionByName(planted))),
            maxDist = 6, bands = 8)
          .orderBy("d1", "d2")
      },
      Some("""WITH docs2 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL
        |  SELECT doc_id + 12800, 'Q' || substr(text, 2) FROM documents WHERE doc_id < 200),
        |b AS (SELECT doc_id, hex(encode(text)) AS hx FROM docs2),
        |d AS (SELECT doc_id,
        |    CAST(256 + doc_id % 512 AS INTEGER) AS n,
        |    list_transform(range(1, length(hx)//2 + 1),
        |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
        |  FROM b),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(0, n),
        |      i -> (bytes[(i % len(bytes)) + 1] - 128) * 256) AS smp
        |  FROM d),
        |e AS (SELECT doc_id,
        |    list_transform(range(0, 65),
        |      f -> coalesce(list_sum(list_transform(
        |        range(f*n//65, (f+1)*n//65),
        |        i -> CAST(smp[i+1] AS BIGINT) * smp[i+1])), 0)) AS en
        |  FROM s),
        |fp AS (SELECT doc_id,
        |    list_reduce(list_transform(range(1, 65),
        |      f -> CASE WHEN en[f+1] > en[f] THEN '1' ELSE '0' END),
        |      (a, x) -> a || x) AS bits
        |  FROM e),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(len(list_filter(range(1, 65),
        |      i -> substr(a.bits, i, 1) != substr(b.bits, i, 1))) AS BIGINT) AS hamming
        |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
        |SELECT d1, d2, hamming FROM pairs WHERE hamming <= 6
        |ORDER BY d1, d2""".stripMargin)),

    // the composite curation pipeline a training-data run would execute:
    // quality gate -> language gate -> exact dedup -> token budget,
    // one declarative plan, fully oracle-checkable
    "tx7_curation_pipeline" -> Q(
      (s, d) => {
        val curated = Dedup.dedupExactCorpus(
          Text.withLangId(Text.withQuality(docs(s, d)))
            .filter(col("quality_score") >= 0.3 && col("lang_pred") === "en"))
        curated
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_tokens")).cast("long").as("token_budget"),
            min(col("doc_id")).as("first_doc"))
      },
      Some("""WITH q AS (
        |  SELECT doc_id, text,
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |         x -> list_contains(['the','and','of','is','to'], x))) AS INTEGER) AS score_en,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |         x -> list_contains(['el','la','de','que','y'], x))) AS INTEGER) AS score_es,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |         x -> list_contains(['le','les','des','et','une'], x))) AS INTEGER) AS score_fr
        |  FROM documents),
        |gated AS (
        |  SELECT doc_id, text FROM q
        |  WHERE least(1.0, alpha_ratio * 0.5 + stopword_ratio * 0.3
        |          + least(mean_word_len / 10.0, 1.0) * 0.2) >= 0.3
        |    AND (CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
        |              WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
        |              WHEN score_fr > 0 THEN 'fr'
        |              ELSE 'unknown' END) = 'en'),
        |deduped AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        |    FROM gated) WHERE rn = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS token_budget,
        |       min(doc_id) AS first_doc
        |FROM deduped""".stripMargin)),

    // ---- curation: sampling / packing / scrubbing / composition ------

    // deterministic stratified downsample: hash-smallest 5 docs per
    // source — reproducible without RNG, portable to the oracle
    "cur1_stratified_sample" -> Q(
      (s, d) => Curate.stratifiedSample(docs(s, d), "source", perStratum = 5)
        .select("doc_id", "source").orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY md5(text) NULLS LAST, doc_id) AS rk
        |  FROM documents) WHERE rk <= 5 ORDER BY doc_id""".stripMargin)),

    // concat-then-chunk packing into 200-token bins, sharded by source
    "cur2_token_packing" -> Q(
      (s, d) => Curate.packTokenBudget(docs(s, d), budget = 200, shardCol = "source")
        .select("doc_id", "source", "n_tokens", "tok_offset", "bin").orderBy("doc_id"),
      Some("""WITH t AS (
        |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (SELECT doc_id, source, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM t)
        |SELECT doc_id, source, n_tokens, tok_offset, tok_offset // 200 AS bin
        |FROM o ORDER BY doc_id""".stripMargin)),

    // PII scrub over deterministically seeded emails/phones; the md5 of
    // the scrubbed text proves the exact redaction output matches
    "cur3_pii_scrub" -> Q(
      (s, d) => {
        val seeded = docs(s, d).withColumn("text2", concat(col("text"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" contact "), col("source"), lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit(" call 415-555-0123")).otherwise(lit(""))))
        Curate.scrubPii(seeded, "text2")
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
            md5(col("scrubbed")).as("scrub_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH seeded AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' contact ' || source || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' call 415-555-0123' ELSE '' END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text2, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g')) AS scrub_md5
        |FROM seeded ORDER BY doc_id""".stripMargin)),

    // Bloom semi-join reduction (hand-rolled runtime filter / LIP):
    // urgent orders' keys prune lineitem BEFORE its exchange; the real
    // join removes Bloom false positives, so the result is exactly the
    // plain join — which is what the oracle runs.
    "bj1_bloom_join" -> Q(
      (s, d) => {
        val urgent = s.read.parquet(s"$d/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderstatus"))
        graft.ops.Joins.bloomPreJoin(li(s, d), urgent, "l_orderkey", "o_orderkey")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).cast("long").as("n_items"),
            sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)")
              - dec("l_discount"))).cast("double").as("revenue"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o.o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // k-anonymity / l-diversity audit over the event table: QI =
    // (event_type, hour), sensitive = user_id. Thresholds chosen so
    // both pass and fail outcomes appear (class sizes 61-108, distinct
    // users 49-80 at sf0.01). All counts integer — exact.
    "ka1_k_anonymity" -> Q(
      (s, d) => {
        val ev = Queries.events(s, d)
          .withColumn("hr", hour(col("ts")).cast("int"))
        Curate.kAnonymityReport(ev, Seq("event_type", "hr"), "user_id",
            k = 70, l = 55)
          .orderBy("event_type", "hr")
      },
      Some("""SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive,
        |  count(*) >= 70 AS k_ok,
        |  count(DISTINCT user_id) >= 55 AS l_ok
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin)),

    // PSI drift gate between the even/odd doc_id halves on n_chars
    // with fixed literal bucket edges — counts exact, shares Laplace-
    // smoothed, terms round-6 for display.
    // JS1: vocabulary drift between two corpus "crawls" (doc_id
    // parity split): Jensen-Shannon divergence + top-10 terms by
    // probability shift. JS contributions quantize to pico-units
    // before the vocabulary sum (order-free longs); the shift ranking
    // orders by the nano-quantized |Δp|.
    "js1_vocab_drift" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        graft.ops.Profile.vocabDrift(
            dd.filter(col("doc_id") % 2 === 0),
            dd.filter(col("doc_id") % 2 === 1), topK = 10)
          .orderBy(col("shift_nano").desc, col("term").asc)
      },
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |t2 AS (SELECT doc_id, term FROM tok WHERE len(term) > 0),
        |oc AS (SELECT term, CAST(count(*) AS BIGINT) AS c_old
        |       FROM t2 WHERE doc_id % 2 = 0 GROUP BY 1),
        |nc AS (SELECT term, CAST(count(*) AS BIGINT) AS c_new
        |       FROM t2 WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT term, coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new
        |      FROM oc FULL OUTER JOIN nc USING (term)),
        |tot AS (SELECT CAST(sum(c_old) AS DOUBLE) AS no,
        |               CAST(sum(c_new) AS DOUBLE) AS nn FROM j),
        |w AS (SELECT term, c_old, c_new,
        |    c_old / no AS p_old, c_new / nn AS p_new,
        |    (c_old / no + c_new / nn) / 2 AS m
        |  FROM j, tot),
        |q AS (SELECT *,
        |    CAST(round(((CASE WHEN p_old > 0 THEN p_old * ln(p_old / m) ELSE 0 END)
        |      + (CASE WHEN p_new > 0 THEN p_new * ln(p_new / m) ELSE 0 END)) / 2 * 1e12)
        |      AS BIGINT) AS jsp,
        |    CAST(round(abs(p_old - p_new) * 1e9) AS BIGINT) AS shift_nano
        |  FROM w),
        |js AS (SELECT CAST(sum(jsp) AS BIGINT) AS s FROM q),
        |top AS (SELECT term, c_old, c_new, round(p_old, 9) AS p_old,
        |    round(p_new, 9) AS p_new, shift_nano
        |  FROM q ORDER BY shift_nano DESC, term LIMIT 10)
        |SELECT term, c_old, c_new, p_old, p_new, shift_nano,
        |  round(CAST(s AS DOUBLE) / 1e12, 9) AS js_divergence
        |FROM top, js ORDER BY shift_nano DESC, term""".stripMargin)),

    "dr1_psi_drift" -> Q(
      (s, d) => graft.ops.Profile.psiDrift(
          docs(s, d).filter(col("doc_id") % 2 === 0),
          docs(s, d).filter(col("doc_id") % 2 === 1),
          "n_chars", Seq(100.0, 200.0, 300.0, 400.0, 500.0))
        .orderBy("bucket"),
      Some("""WITH b AS (SELECT doc_id,
        |    CAST(n_chars >= 100 AS INTEGER) + CAST(n_chars >= 200 AS INTEGER)
        |  + CAST(n_chars >= 300 AS INTEGER) + CAST(n_chars >= 400 AS INTEGER)
        |  + CAST(n_chars >= 500 AS INTEGER) AS bucket FROM documents),
        |rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM b
        |       WHERE doc_id % 2 = 0 GROUP BY 1),
        |cc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM b
        |       WHERE doc_id % 2 = 1 GROUP BY 1),
        |bk AS (SELECT CAST(unnest(generate_series(0, 5)) AS INTEGER) AS bucket),
        |j AS (SELECT bk.bucket,
        |    CAST(coalesce(rc.c, 0) AS BIGINT) AS ref_n,
        |    CAST(coalesce(cc.c, 0) AS BIGINT) AS cur_n
        |  FROM bk LEFT JOIN rc USING (bucket) LEFT JOIN cc USING (bucket)),
        |t AS (SELECT sum(ref_n) AS rt, sum(cur_n) AS ct FROM j),
        |x AS (SELECT bucket, ref_n, cur_n,
        |    CAST(ref_n + 1 AS DOUBLE) / (rt + 6) AS p,
        |    CAST(cur_n + 1 AS DOUBLE) / (ct + 6) AS q
        |  FROM j, t)
        |SELECT bucket, ref_n, cur_n,
        |  round((p - q) * ln(p / q), 6) AS term,
        |  round(sum((p - q) * ln(p / q)) OVER (), 6) AS psi_total
        |FROM x ORDER BY bucket""".stripMargin)),

    // corpus composition: docs/tokens and token share per (source, lang)
    "cur4_source_composition" -> Q(
      (s, d) => Curate.sourceComposition(docs(s, d)).orderBy("source", "lang"),
      Some("""WITH a AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, lang, n_docs, n_tokens,
        |  CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE) AS token_share
        |FROM a ORDER BY source, lang""".stripMargin)),

    // Context-length chunking: overlapping 64-token windows, stride 48.
    // Bounded to doc_id < 200 purely to keep the oracle-compared output
    // volume sane — the operator itself is a shuffle-free narrow map.
    "cur5_chunking" -> Q(
      (s, d) => Curate.chunkDocs(docs(s, d).filter(col("doc_id") < 200))
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |         FROM documents WHERE doc_id < 200),
        |c AS (SELECT doc_id, toks,
        |        unnest(range(0, CAST(ceil(CAST(greatest(len(toks) - 64, 0) AS DOUBLE) / 48)
        |                          AS BIGINT) + 1)) AS chunk_id
        |      FROM t)
        |SELECT doc_id, chunk_id,
        |  array_to_string(toks[chunk_id*48 + 1 : chunk_id*48 + 64], ' ') AS chunk_text,
        |  CAST(least(64, len(toks) - chunk_id*48) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // Benchmark decontamination: every ~97th document plays the eval
    // set; any 8-token-shingle overlap marks a training doc
    // contaminated. The benchmark shingle set is broadcast — the corpus
    // side never shuffles its shingles.
    "dc1_decontaminate" -> Q(
      (s, d) => {
        val all = docs(s, d)
        Curate.decontaminate(
            all.filter(col("doc_id") % 97 =!= 0),
            all.filter(col("doc_id") % 97 === 0))
          .select("doc_id", "n_shared", "contaminated")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 8 + 1),
        |                i -> array_to_string(toks[i+1:i+8], ' ')) END)) AS sh FROM t),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
        |corp AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        |shared AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |           FROM corp JOIN bench USING (sh) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(s.n_shared, 0) AS n_shared,
        |       COALESCE(s.n_shared, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
        |LEFT JOIN shared s USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // DC3: the decontamination REPORT — overlap fraction (shared grams
    // over the doc's own distinct grams, an in-row denominator) and the
    // 5% drop decision. The threshold compare runs on the UNROUNDED
    // fraction in both engines; round-6 is display only.
    "dc3_overlap_fraction" -> Q(
      (s, d) => {
        val all = docs(s, d)
        Curate.contaminationReport(
            all.filter(col("doc_id") % 97 =!= 0),
            all.filter(col("doc_id") % 97 === 0),
            dropThreshold = 0.05)
          .select(col("doc_id"), col("n_shared"), col("n_grams"),
            round(col("overlap_frac"), 6).as("overlap_frac"), col("drop_doc"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, list_distinct(
        |         CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 8 + 1),
        |                i -> array_to_string(toks[i+1:i+8], ' ')) END) AS grams FROM t),
        |sh AS (SELECT doc_id, unnest(grams) AS sh FROM g),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
        |corp AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        |shared AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |           FROM corp JOIN bench USING (sh) GROUP BY doc_id),
        |ng AS (SELECT doc_id, CAST(greatest(len(grams), 1) AS BIGINT) AS n_grams
        |       FROM g WHERE doc_id % 97 <> 0)
        |SELECT ng.doc_id, COALESCE(s.n_shared, 0) AS n_shared, ng.n_grams,
        |       round(CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
        |             / CAST(ng.n_grams AS DOUBLE), 6) AS overlap_frac,
        |       CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
        |         / CAST(ng.n_grams AS DOUBLE) >= CAST(0.05 AS DOUBLE) AS drop_doc
        |FROM ng LEFT JOIN shared s USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // DC2: dc1's membership test through a broadcast BLOOM FILTER (the
    // corpus side stays narrow — no shingle explode, no shuffle). The
    // sketch's no-false-negative law collapses to an oracle-checked
    // boolean: exact-contaminated ⇒ bloom-flagged, per document.
    "dc2_bloom_decontaminate" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val corpus = all.filter(col("doc_id") % 97 =!= 0)
        val bench = all.filter(col("doc_id") % 97 === 0)
        Curate.decontaminateBloom(corpus, bench)
          .join(Curate.decontaminate(corpus, bench).select("doc_id", "contaminated"),
            Seq("doc_id"))
          .select(col("doc_id"), col("contaminated"),
            (!col("contaminated") || col("bloom_flagged")).as("superset_ok"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 8 + 1),
        |                i -> array_to_string(toks[i+1:i+8], ' ')) END)) AS sh FROM t),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
        |corp AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        |shared AS (SELECT doc_id, count(*) AS n_shared
        |           FROM corp JOIN bench USING (sh) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(s.n_shared, 0) > 0 AS contaminated,
        |       TRUE AS superset_ok
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
        |LEFT JOIN shared s USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Paragraph-level dedup (Falcon-style keep-first): aligned 16-token
    // paragraphs, global first-occurrence wins, docs reassembled from
    // survivors. The keep-first window carries (md5, doc_id, pidx) only.
    // C4/CCNet boilerplate-line removal: lines planted into every 3rd
    // doc cross the df cap and are stripped everywhere; every doc's
    // own content line (df=1) survives with original text intact.
    "pd2_boilerplate_lines" -> Q(
      (s, d) => {
        val corpus = docs(s, d).select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"),
              lit("\nSUBSCRIBE TO OUR NEWSLETTER\nfollow us on social media")))
            .otherwise(col("text")).as("text"))
        Dedup.removeBoilerplateLines(corpus, minDf = 10L)
          .select("doc_id", "n_kept_lines", "n_removed_lines", "clean_text")
          .orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || 'SUBSCRIBE TO OUR NEWSLETTER'
        |           || chr(10) || 'follow us on social media'
        |         ELSE text END AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS lns FROM c),
        |l AS (SELECT doc_id, unnest(lns) AS line,
        |       unnest(range(0, len(lns))) AS lidx FROM ls),
        |df AS (SELECT line, count(DISTINCT doc_id) AS line_df FROM l GROUP BY 1),
        |m AS (SELECT l.doc_id, l.line, l.lidx, df.line_df FROM l JOIN df USING (line)),
        |k AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_lines,
        |        string_agg(line, chr(10) ORDER BY lidx) AS clean_text
        |      FROM m WHERE line_df < 10 GROUP BY 1),
        |r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed_lines
        |      FROM m WHERE line_df >= 10 GROUP BY 1)
        |SELECT k.doc_id, k.n_kept_lines,
        |  COALESCE(r.n_removed_lines, 0) AS n_removed_lines, k.clean_text
        |FROM k LEFT JOIN r USING (doc_id) ORDER BY k.doc_id""".stripMargin)),

    "pd1_paragraph_dedup" -> Q(
      (s, d) => Dedup.paragraphDedup(docs(s, d), p = 16).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |ix AS (SELECT doc_id, toks,
        |         unnest(range(0, CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS pidx FROM t),
        |ch AS (SELECT doc_id, pidx,
        |         array_to_string(toks[pidx*16 + 1 : pidx*16 + 16], ' ') AS ptext FROM ix),
        |k AS (SELECT doc_id, pidx, ptext,
        |        row_number() OVER (PARTITION BY ptext ORDER BY doc_id, pidx) AS rk FROM ch)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_paras,
        |  string_agg(ptext, ' ' ORDER BY pidx) AS dedup_text
        |FROM k WHERE rk = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // RefinedWeb-style per-source document cap: top-15 docs per source
    // by quality score (ties broken by id — total order, so the cut is
    // engine-reproducible).
    // Model-scored quality filtering: fixed-weight LR over the tx2
    // feature battery. Keep decision via sign of the linear term (exact
    // same-operand doubles both engines); sigmoid attached rounded.
    "qs1_lr_quality" -> Q(
      (s, d) => Curate.lrQualityScore(docs(s, d))
        .select(col("doc_id"), round(col("lr_linear"), 6).as("lr_linear"),
          round(col("lr_score"), 6).as("lr_score"), col("lr_keep"))
        .orderBy("doc_id"),
      Some("""WITH q AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
        |  FROM documents),
        |l AS (SELECT doc_id,
        |    -2.0 + alpha_ratio * 3.0 + stopword_ratio * 2.5
        |      + mean_word_len * 0.15 - punct_ratio * 4.0 AS lr_linear
        |  FROM q)
        |SELECT doc_id, round(lr_linear, 6) AS lr_linear,
        |  round(1.0 / (1.0 + exp(0.0 - lr_linear)), 6) AS lr_score,
        |  lr_linear >= 0.0 AS lr_keep
        |FROM l ORDER BY doc_id""".stripMargin)),

    "qc1_quality_cap" -> Q(
      (s, d) => Curate.qualityCap(docs(s, d), cap = 15)
        .select("doc_id", "source", "quality_score").orderBy("doc_id"),
      Some("""WITH q AS (
        |  SELECT doc_id, source,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |           x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |           x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2)
        |      AS quality_score
        |  FROM documents),
        |r AS (SELECT doc_id, source, quality_score,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY quality_score DESC, doc_id) AS rk FROM q)
        |SELECT doc_id, source, quality_score FROM r WHERE rk <= 15
        |ORDER BY doc_id""".stripMargin)),

    // CUR7: deterministic epoch shuffle + sharding (the training-order
    // step): shard and in-shard position both drawn from the seeded md5
    // coin — no global sort anywhere, the per-shard position window
    // partitions at n/nShards. Seed 1 plays epoch 1; a new seed is a
    // fresh reproducible permutation.
    "cur7_epoch_shuffle" -> Q(
      (s, d) => Curate.epochShuffle(docs(s, d), nShards = 8, seed = 1L)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5('1:' || CAST(doc_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(9, 17),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5('1:' || CAST(doc_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS h2
        |  FROM documents)
        |SELECT doc_id, CAST(h1 % 8 AS INTEGER) AS shard,
        |       CAST(row_number() OVER (PARTITION BY h1 % 8 ORDER BY h2, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY doc_id""".stripMargin)),

    // Shard manifest: the pipeline→trainer handoff artifact — per-shard
    // doc/token/char counts plus an order-insensitive bit_xor fold of a
    // 60-bit per-row md5 slice, over the epochShuffle(seed=1) shard
    // assignment. The oracle recomputes the whole thing (assignment,
    // counts, checksum) from raw text, so a single corrupted or
    // reassigned row reddens the shard row in one engine and not the
    // other — exactly the integrity property the manifest exists for.
    "sm1_shard_manifest" -> Q(
      (s, d) => {
        val dd = docs(s, d).withColumn("shard",
          Curate.shardAssign(col("doc_id"), nShards = 8, seed = 1L))
        Curate.shardManifest(dd).orderBy("shard")
      },
      Some("""WITH h AS (SELECT doc_id, text,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5('1:' || CAST(doc_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS h1
        |  FROM documents),
        |sh AS (SELECT CAST(h1 % 8 AS INTEGER) AS shard, doc_id, text,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS rh
        |  FROM h)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  bit_xor(rh) AS checksum
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin)),

    // Explicit target-mixture resampling (the published recipe-table
    // form): five strata at exact-binary weights summing to 1.0 (no
    // normalization drift between engines), totalDocs = corpus size so
    // the rates — and therefore which paths run (cap at 4 epochs,
    // integer+fractional repeat, fractional-only, sub-1 downsample) —
    // are SF-invariant (~20·w at this corpus's ~uniform strata).
    // Up-sampling emits an epoch index per copy; the md5 content coin
    // decides both the fractional repeat and the downsample, so both
    // engines draw the identical multiset.
    "cur10_target_mixture" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        Curate.mixToTarget(dd,
            Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.125,
              "src4" -> 0.09375, "src5" -> 0.03125),
            totalDocs = dd.count())
          .select("doc_id", "source", "epoch")
          .orderBy("doc_id", "epoch")
      },
      Some("""WITH t AS (SELECT * FROM (VALUES
        |    ('src1', CAST(0.5 AS DOUBLE)), ('src2', CAST(0.25 AS DOUBLE)),
        |    ('src3', CAST(0.125 AS DOUBLE)), ('src4', CAST(0.09375 AS DOUBLE)),
        |    ('src5', CAST(0.03125 AS DOUBLE))) AS v(source, w)),
        |n AS (SELECT source, CAST(count(*) AS DOUBLE) AS ns
        |  FROM documents GROUP BY source),
        |r AS (SELECT source,
        |    least(w * CAST((SELECT count(*) FROM documents) AS DOUBLE) / ns,
        |      CAST(4 AS DOUBLE)) AS rate
        |  FROM n JOIN t USING (source)),
        |h AS (SELECT doc_id, source,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 9),
        |        i -> CAST(strpos('0123456789abcdef', substr(md5(text), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS DOUBLE)
        |    / CAST(4294967296 AS DOUBLE) AS u
        |  FROM documents),
        |reps AS (SELECT doc_id, source,
        |    CAST(floor(rate) + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS BIGINT) AS nrep
        |  FROM h JOIN r USING (source))
        |SELECT doc_id, source, CAST(unnest(range(0, nrep)) AS INTEGER) AS epoch
        |FROM reps WHERE nrep > 0 ORDER BY doc_id, epoch""".stripMargin)),

    // Temperature (T=2) source rebalancing: stratum s keeps
    // (1/sqrt(n_s)) / max_t(1/sqrt(n_t)) of its docs via a
    // content-hash coin — seedless, so both engines flip identically.
    "cur6_temperature_resample" -> Q(
      (s, d) => Curate.temperatureResample(docs(s, d), stratumCol = "lang")
        .select("doc_id", "lang", "keep_rate", "u").orderBy("doc_id"),
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |        FROM documents GROUP BY lang),
        |w AS (SELECT lang, CAST(1.0 AS DOUBLE) / sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
        |r AS (SELECT lang, wt / (SELECT max(wt) FROM w) AS keep_rate FROM w),
        |h AS (SELECT doc_id, lang,
        |        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(range(1, 9),
        |            i -> CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT))),
        |          (a, x) -> a * 16 + x) AS DOUBLE)
        |        / CAST(4294967296 AS DOUBLE) AS u
        |      FROM documents)
        |SELECT doc_id, h.lang, keep_rate, u
        |FROM h JOIN r USING (lang) WHERE u < keep_rate
        |ORDER BY doc_id""".stripMargin)),

    // DSIR data selection (Xie et al. 2023): raw docs scored by hashed
    // unigram+bigram importance vs the English-target distribution,
    // Gumbel-top-k drawn without replacement. Per-bucket log-ratios are
    // quantized to integer micro-units BEFORE the per-doc sum, so the
    // score is an order-free long sum both engines reproduce exactly;
    // only the one-per-doc Gumbel term stays float (rounded on output).
    "ds1_dsir_select" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        Curate.dsirSelect(dd, dd.filter(col("lang") === "en"), k = 100)
          .select(col("doc_id"), col("source"), col("lang"),
            col("logw_micro"), round(col("gumbel_key"), 6).as("gkey"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, lang, unnest(w ||
        |    list_transform(range(1, len(w)), i -> w[i] || '_' || w[i+1])) AS term
        |  FROM tok),
        |fb AS (
        |  SELECT doc_id, lang,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 9),
        |        i -> CAST(strpos('0123456789abcdef', substr(md5(term), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) % 256 AS b
        |  FROM feat),
        |tc AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM fb WHERE lang = 'en' GROUP BY b),
        |rc AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM fb GROUP BY b),
        |wt AS (
        |  SELECT r.b,
        |    CAST(round((ln((coalesce(tc.ct, 0) + 1) / CAST((SELECT sum(ct) FROM tc) + 256 AS DOUBLE))
        |      - ln((coalesce(rc.cr, 0) + 1) / CAST((SELECT sum(cr) FROM rc) + 256 AS DOUBLE))) * 1e6) AS BIGINT) AS lw_micro
        |  FROM (SELECT unnest(range(0, 256)) AS b) r
        |  LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)),
        |pd AS (
        |  SELECT fb.doc_id, CAST(sum(wt.lw_micro) AS BIGINT) AS logw_micro
        |  FROM fb JOIN wt USING (b) GROUP BY fb.doc_id),
        |scored AS (
        |  SELECT d.doc_id, d.source, d.lang,
        |    coalesce(pd.logw_micro, 0) AS logw_micro,
        |    coalesce(pd.logw_micro, 0) / 1e6
        |      - ln(0.0 - ln((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(range(1, 9),
        |            i -> CAST(strpos('0123456789abcdef', substr(md5(d.text), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |          (a, x) -> a * 16 + x) AS DOUBLE) + 0.5) / 4294967296.0)) AS gumbel_key
        |  FROM documents d LEFT JOIN pd USING (doc_id)),
        |sel AS (SELECT * FROM scored ORDER BY gumbel_key DESC, doc_id LIMIT 100)
        |SELECT doc_id, source, lang, logw_micro, round(gumbel_key, 6) AS gkey
        |FROM sel ORDER BY doc_id""".stripMargin)),

    // Weighted sample without replacement (Efraimidis-Spirakis A-ES):
    // 50 docs drawn proportional to n_chars via the ln(u)/w key — the
    // one-pass, RNG-free form of "sample k docs by token weight".
    "cur11_weighted_sample" -> Q(
      (s, d) => Curate.weightedSample(docs(s, d), k = 50, weightCol = "n_chars")
        .select(col("doc_id"), col("n_chars"),
          round(col("sample_key"), 9).as("skey"))
        .orderBy("doc_id"),
      Some("""WITH h AS (
        |  SELECT doc_id, n_chars,
        |    ln((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 9),
        |        i -> CAST(strpos('0123456789abcdef', substr(md5(text), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS DOUBLE) + 0.5) / 4294967296.0)
        |    / CAST(n_chars AS DOUBLE) AS skey
        |  FROM documents),
        |sel AS (SELECT * FROM h ORDER BY skey DESC, doc_id LIMIT 50)
        |SELECT doc_id, n_chars, round(skey, 9) AS skey
        |FROM sel ORDER BY doc_id""".stripMargin)),

    // MMR1: Maximal-Marginal-Relevance greedy re-rank (Carbonell &
    // Goldstein 1998) — the serving-side diversification after ANN
    // retrieval, the whole m-step greedy loop as ONE nested HOF
    // expression (aggregate over steps, explicit-comparator argmax,
    // in-order dot folds). The oracle replays the identical selection
    // with DuckDB's list_reduce (accumulator = selected list), so an
    // iterative greedy algorithm sits under the full hash gate.
    "mmr1_mmr_rerank" -> Q(
      (s, d) => {
        val e = embs(s, d)
        graft.ops.Search.mmrRerank(e, e.filter(col("vec_id") < 4),
            topN = 16, m = 6, lambda = 0.7)
          .orderBy("q_id", "sel_rank")
      },
      Some(OracleGen.mmr1Sql())),

    // RM3 pseudo-relevance-feedback expansion over the bm1 query:
    // top-10 feedback docs by BM25 (same exact-binary k1=1.0/b=0.5),
    // relevance-model term weights as order-free micro-unit sums,
    // top-8 new terms. The oracle recomputes the whole chain — BM25
    // scores, the feedback cut, per-term weights, the expansion
    // ranking — so a drift anywhere in the pipeline breaks the hash.
    "rm1_rm3_expansion" -> Q(
      (s, d) => graft.ops.Search.rm3Expansion(docs(s, d),
          Seq("spark", "join", "stream"), fbDocs = 10, expandTerms = 8,
          k1 = 1.0, b = 0.5)
        .orderBy("rank"),
      Some {
        def t(i: Int) =
          s"""ln((CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + CAST(0.5 AS DOUBLE))
             |         / (CAST(df_$i AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
             |      * (CAST(tf_$i AS DOUBLE) * CAST(2.0 AS DOUBLE))
             |      / (CAST(tf_$i AS DOUBLE) + CAST(1.0 AS DOUBLE) * (CAST(0.5 AS DOUBLE)
             |         + CAST(0.5 AS DOUBLE) * (CAST(dl AS DOUBLE)
             |             / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))""".stripMargin
        s"""WITH b AS (SELECT doc_id,
           |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
           |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'spark')) AS BIGINT) AS tf_0,
           |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'join')) AS BIGINT) AS tf_1,
           |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'stream')) AS BIGINT) AS tf_2
           |  FROM documents),
           |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
           |    CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
           |    CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
           |    CAST(sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2
           |  FROM b),
           |sc AS (SELECT doc_id, dl,
           |    ${t(0)}
           |    + ${t(1)}
           |    + ${t(2)}
           |    AS score
           |  FROM b, st),
           |fb AS (SELECT doc_id, dl, score FROM sc WHERE score > 0
           |       ORDER BY score DESC, doc_id LIMIT 10),
           |tok AS (SELECT f.doc_id, f.dl, f.score,
           |    unnest(string_split(lower(d.text), ' ')) AS term
           |  FROM fb f JOIN documents d USING (doc_id)),
           |tf AS (SELECT doc_id, dl, score, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM tok WHERE len(term) > 0 GROUP BY 1, 2, 3, 4),
           |c AS (SELECT term,
           |    CAST(round(score * CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE) * 1e6) AS BIGINT) AS c_micro
           |  FROM tf),
           |agg AS (SELECT term, CAST(sum(c_micro) AS BIGINT) AS rm_micro FROM c
           |  WHERE term NOT IN ('spark', 'join', 'stream') GROUP BY 1),
           |top AS (SELECT term, rm_micro FROM agg
           |        ORDER BY rm_micro DESC, term LIMIT 8)
           |SELECT CAST(row_number() OVER (ORDER BY rm_micro DESC, term) AS INTEGER) AS rank,
           |  term, rm_micro, rm_micro / 1e6 AS rm_weight
           |FROM top ORDER BY rank""".stripMargin
      }),

    // BM25 keyword retrieval for a fixed term list. k1=1.0, b=0.5 in
    // the registered query: exactly-representable binary constants, so
    // the plan-time-folded Scala doubles and the oracle's literals are
    // bit-identical (1.2/0.75 defaults exist on the API for real use).
    "bm1_bm25_search" -> Q(
      (s, d) => graft.ops.Search.bm25(docs(s, d),
          Seq("spark", "join", "stream"), k1 = 1.0, b = 0.5)
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'spark')) AS BIGINT) AS tf_0,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'join')) AS BIGINT) AS tf_1,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'stream')) AS BIGINT) AS tf_2
        |  FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
        |    CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
        |    CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
        |    CAST(sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2
        |  FROM b),
        |sc AS (SELECT doc_id, dl, tf_0, tf_1, tf_2,
        |    ln((CAST(n_docs AS DOUBLE) - CAST(df_0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |         / (CAST(df_0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        |      * (CAST(tf_0 AS DOUBLE) * CAST(2.0 AS DOUBLE))
        |      / (CAST(tf_0 AS DOUBLE) + CAST(1.0 AS DOUBLE) * (CAST(0.5 AS DOUBLE)
        |         + CAST(0.5 AS DOUBLE) * (CAST(dl AS DOUBLE)
        |             / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
        |    + ln((CAST(n_docs AS DOUBLE) - CAST(df_1 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |         / (CAST(df_1 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        |      * (CAST(tf_1 AS DOUBLE) * CAST(2.0 AS DOUBLE))
        |      / (CAST(tf_1 AS DOUBLE) + CAST(1.0 AS DOUBLE) * (CAST(0.5 AS DOUBLE)
        |         + CAST(0.5 AS DOUBLE) * (CAST(dl AS DOUBLE)
        |             / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
        |    + ln((CAST(n_docs AS DOUBLE) - CAST(df_2 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |         / (CAST(df_2 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        |      * (CAST(tf_2 AS DOUBLE) * CAST(2.0 AS DOUBLE))
        |      / (CAST(tf_2 AS DOUBLE) + CAST(1.0 AS DOUBLE) * (CAST(0.5 AS DOUBLE)
        |         + CAST(0.5 AS DOUBLE) * (CAST(dl AS DOUBLE)
        |             / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
        |    AS score
        |  FROM b, st)
        |SELECT doc_id, dl, tf_0, tf_1, tf_2, score FROM sc
        |WHERE score > 0 ORDER BY doc_id""".stripMargin)),

    // QL1: Dirichlet-smoothed query likelihood (Zhai & Lafferty '01) —
    // the LM retrieval baseline beside bm1; same broadcast-stats +
    // in-row-tf discipline, per-term ln partials in term order,
    // nano-quantized display.
    "ql1_query_likelihood" -> Q(
      (s, d) => graft.ops.Search.queryLikelihood(docs(s, d),
          Seq("spark", "join", "stream"), mu = 2000.0)
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'spark')) AS BIGINT) AS tf_0,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'join')) AS BIGINT) AS tf_1,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'stream')) AS BIGINT) AS tf_2
        |  FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS c_tokens,
        |    CAST(sum(tf_0) AS BIGINT) AS cf_0,
        |    CAST(sum(tf_1) AS BIGINT) AS cf_1,
        |    CAST(sum(tf_2) AS BIGINT) AS cf_2
        |  FROM b),
        |sc AS (SELECT doc_id, dl, tf_0, tf_1, tf_2,
        |    ln((CAST(tf_0 AS DOUBLE) + 2000.0 * (CAST(cf_0 AS DOUBLE) / CAST(c_tokens AS DOUBLE)))
        |       / (CAST(dl AS DOUBLE) + 2000.0))
        |    + ln((CAST(tf_1 AS DOUBLE) + 2000.0 * (CAST(cf_1 AS DOUBLE) / CAST(c_tokens AS DOUBLE)))
        |       / (CAST(dl AS DOUBLE) + 2000.0))
        |    + ln((CAST(tf_2 AS DOUBLE) + 2000.0 * (CAST(cf_2 AS DOUBLE) / CAST(c_tokens AS DOUBLE)))
        |       / (CAST(dl AS DOUBLE) + 2000.0)) AS score
        |  FROM b, st
        |  WHERE tf_0 > 0 OR tf_1 > 0 OR tf_2 > 0)
        |SELECT doc_id, dl, tf_0, tf_1, tf_2,
        |  CAST(floor(score * 1e9 + 0.5) AS BIGINT) AS score_nano
        |FROM sc ORDER BY doc_id""".stripMargin)),

    // LLR1: Dunning keyness — which terms discriminate lang='en' from
    // the rest; exact integer cells, one fixed-order G2 double per
    // term micro-quantized, top-30 total order.
    "llr1_keyness" -> Q(
      (s, d) => graft.ops.Text.keynessLlr(docs(s, d),
          col("lang") === "en", topK = 30, minCount = 5L),
      Some("""WITH tk AS (SELECT lang = 'en' AS f,
        |    unnest(list_filter(string_split(lower(text), ' '),
        |      x -> length(x) > 0)) AS t
        |  FROM documents),
        |c AS (SELECT t,
        |    CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS b
        |  FROM tk GROUP BY 1 HAVING count(*) >= 5),
        |tt AS (SELECT CAST(sum(a) AS BIGINT) AS na,
        |    CAST(sum(b) AS BIGINT) AS nb FROM c),
        |g AS (SELECT t, a, b,
        |    (CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
        |       * ln(CAST(a AS DOUBLE) / (CAST(na AS DOUBLE)
        |         * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
        |         / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))) ELSE 0.0 END)
        |    + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE)
        |       * ln(CAST(b AS DOUBLE) / (CAST(nb AS DOUBLE)
        |         * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
        |         / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))) ELSE 0.0 END)
        |      AS gg,
        |    CAST(a AS DOUBLE) * CAST(nb AS DOUBLE)
        |      > CAST(b AS DOUBLE) * CAST(na AS DOUBLE) AS overused
        |  FROM c, tt)
        |SELECT t AS term, a AS n_focus, b AS n_rest,
        |  CAST(floor(2.0 * gg * 1e6 + 0.5) AS BIGINT) AS g2_micro,
        |  overused
        |FROM g ORDER BY g2_micro DESC, term ASC LIMIT 30""".stripMargin)),

    // AT1: first/last/linear conversion attribution over user event
    // streams — purchases credit preceding non-purchase touches, no
    // touch credits '(direct)'; every model column sums to exactly
    // 1e6 * n_conversions (exact integer credits, remainder-to-first).
    "at1_attribution" -> Q(
      (s, d) => graft.ops.Sessions.attribution(
          Queries.events(s, d), "user_id", "ts", "event_id", "event_type",
          col("event_type") === "purchase")
        .orderBy("channel"),
      Some("""WITH b AS (SELECT user_id AS u, ts, event_id AS sq,
        |    event_type AS ch, event_type = 'purchase' AS conv FROM events),
        |cv AS (SELECT u, ts AS cts, sq AS csq FROM b WHERE conv),
        |tc AS (SELECT u, ts, sq, ch FROM b WHERE NOT conv),
        |j AS (SELECT cv.u, cv.cts, cv.csq, tc.ts, tc.sq, tc.ch
        |  FROM cv LEFT JOIN tc ON tc.u = cv.u
        |    AND (tc.ts < cv.cts OR (tc.ts = cv.cts AND tc.sq < cv.csq))),
        |rk AS (SELECT *,
        |    CAST(count(sq) OVER (PARTITION BY u, cts, csq) AS BIGINT) AS n_t,
        |    CAST(row_number() OVER (PARTITION BY u, cts, csq
        |      ORDER BY ts ASC NULLS FIRST, sq ASC NULLS FIRST) AS BIGINT) AS r
        |  FROM j),
        |cr AS (SELECT
        |    CASE WHEN n_t = 0 THEN '(direct)' ELSE ch END AS channel,
        |    CASE WHEN n_t = 0 THEN 1000000
        |         WHEN r = 1 THEN 1000000 ELSE 0 END AS first_micro,
        |    CASE WHEN n_t = 0 THEN 1000000
        |         WHEN r = n_t THEN 1000000 ELSE 0 END AS last_micro,
        |    CASE WHEN n_t = 0 THEN 1000000
        |         ELSE 1000000 // n_t
        |           + CASE WHEN r = 1 THEN 1000000 % n_t ELSE 0 END
        |    END AS linear_micro
        |  FROM rk)
        |SELECT channel,
        |  CAST(sum(first_micro) AS BIGINT) AS first_micro,
        |  CAST(sum(last_micro) AS BIGINT) AS last_micro,
        |  CAST(sum(linear_micro) AS BIGINT) AS linear_micro
        |FROM cr GROUP BY channel ORDER BY channel""".stripMargin)),

    // HR1: hybrid retrieval — BM25 leg + dense cosine leg, each capped
    // at top-50 (TakeOrderedAndProject, never a global sort shuffle),
    // fused by reciprocal-rank fusion (1/(60+rank), Cormack et al.).
    // Integer ranks and fixed-order reciprocal sums make the fusion
    // bit-reproducible; oracle restates both legs (OracleGen.hr1Sql).
    "hr1_hybrid_rrf" -> Q(
      (s, d) => graft.ops.Search.hybridRetrieve(docs(s, d), embs(s, d),
          Seq("spark", "join", "stream"), queryVecId = 7L, k = 10,
          candidateK = 50, rrfK = 60, k1 = 1.0, b = 0.5)
        .select(col("doc_id"), col("rank"), col("rank_sparse"),
          col("rank_dense"), round(col("rrf_score"), 6).as("rrf"))
        .orderBy("rank"),
      Some(OracleGen.hr1Sql(Seq("spark", "join", "stream"), queryVecId = 7L,
        k = 10, candidateK = 50, rrfK = 60, k1 = 1.0, b = 0.5))),

    // Exact corpus heavy hitters: tokens at >= 0.1% of all occurrences.
    "hh1_heavy_hitters" -> Q(
      (s, d) => graft.ops.Search.heavyHitters(docs(s, d), minShare = 0.001)
        .orderBy("tok"),
      Some("""WITH tk AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        |SELECT tok, cnt, CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM c, t
        |WHERE CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) >= CAST(0.001 AS DOUBLE)
        |ORDER BY tok""".stripMargin)),

    // HH2: hh1's counts through a count-min sketch — exact top-20
    // carries the cross-engine hash, the sketch's never-undercount and
    // eps·N-overcount laws ride as oracle-checked booleans (the ag1 /
    // ann2 / dc2 pattern, completing the sketch family's gate coverage:
    // HLL, approx-percentile, bloom, CMS).
    "hh2_cms_heavy_hitters" -> Q(
      (s, d) => graft.ops.Search.heavyHittersCms(docs(s, d), k = 20)
        .orderBy(col("cnt").desc, col("tok")),
      Some("""WITH tk AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok)
        |SELECT tok, cnt, TRUE AS over_ok, TRUE AS bound_ok
        |FROM c ORDER BY cnt DESC, tok LIMIT 20""".stripMargin)),

    // Declarative data-quality expectations (Deequ-style): uniqueness,
    // completeness, range, and referential integrity, each ONE
    // aggregation pass (the FK check a broadcastable anti-join), the
    // report a union of one-row frames. Checks chosen so both outcomes
    // appear: orders.o_custkey->customer and lineitem FK pass; the
    // synthetic duplicate-injected orders slice and the out-of-range
    // discount bound fail with exact violation counts.
    "dq1_expectations" -> Q(
      (s, d) => {
        val P = graft.ops.Profile
        val orders = s.read.parquet(s"$d/orders.parquet")
        val cust = s.read.parquet(s"$d/customer.parquet")
        val line = li(s, d)
        // inject known violations: re-append orders with key%97==0
        val dupOrders = orders.unionByName(orders.filter(col("o_orderkey") % 97 === 0))
        P.qualityReport(Seq(
          P.expectUnique(orders, "orders_pk_unique", Seq("o_orderkey")),
          P.expectUnique(dupOrders, "dup_slice_pk_unique", Seq("o_orderkey")),
          P.expectComplete(orders, "orders_custkey_complete", "o_custkey"),
          P.expectInRange(line, "discount_0_to_0.08", "l_discount", 0.0, 0.08),
          P.expectReferential(orders, "orders_customer_fk", "o_custkey",
            cust, "c_custkey"),
          P.expectReferential(line, "lineitem_orders_fk", "l_orderkey",
            orders, "o_orderkey"))).orderBy("check_name")
      },
      Some("""SELECT 'orders_pk_unique' AS check_name, CAST(0 AS BIGINT) AS n_violations, TRUE AS pass
        |UNION ALL
        |SELECT 'dup_slice_pk_unique',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 97 = 0),
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 97 = 0) = 0
        |UNION ALL
        |SELECT 'orders_custkey_complete',
        |  (SELECT CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT) FROM orders),
        |  (SELECT count(CASE WHEN o_custkey IS NULL THEN 1 END) FROM orders) = 0
        |UNION ALL
        |SELECT 'discount_0_to_0.08',
        |  (SELECT CAST(count(CASE WHEN l_discount < 0.0 OR l_discount > 0.08
        |     OR l_discount IS NULL THEN 1 END) AS BIGINT) FROM lineitem),
        |  (SELECT count(CASE WHEN l_discount < 0.0 OR l_discount > 0.08
        |     OR l_discount IS NULL THEN 1 END) FROM lineitem) = 0
        |UNION ALL
        |SELECT 'orders_customer_fk',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o LEFT JOIN customer c
        |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
        |  (SELECT count(*) FROM orders o LEFT JOIN customer c
        |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) = 0
        |UNION ALL
        |SELECT 'lineitem_orders_fk',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL),
        |  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) = 0
        |ORDER BY check_name""".stripMargin)),

    // Schema-drift classification at the ingest gate: an incoming
    // batch that drops o_orderpriority, retypes o_totalprice to
    // DECIMAL(12,2), and adds ingest_batch_id, diffed against the
    // governed table. Pure schema metadata (driver-side bytes, free at
    // any table size); all four statuses appear in the report.
    "dq2_schema_drift" -> Q(
      (s, d) => {
        val orders = s.read.parquet(s"$d/orders.parquet")
        val batch = orders.select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
          col("o_orderdate"),
          lit("b-2024-01-01").as("ingest_batch_id"))
        graft.ops.Profile.schemaDrift(orders, batch).orderBy("col_name")
      },
      Some("""SELECT * FROM (VALUES
        |  ('ingest_batch_id', NULL, 'STRING', 'added'),
        |  ('o_custkey', 'BIGINT', 'BIGINT', 'unchanged'),
        |  ('o_orderdate', 'TIMESTAMP_NTZ', 'TIMESTAMP_NTZ', 'unchanged'),
        |  ('o_orderkey', 'BIGINT', 'BIGINT', 'unchanged'),
        |  ('o_orderpriority', 'STRING', NULL, 'removed'),
        |  ('o_orderstatus', 'STRING', 'STRING', 'unchanged'),
        |  ('o_totalprice', 'DOUBLE', 'DECIMAL(12,2)', 'retyped')
        |) AS t(col_name, table_type, batch_type, status)
        |ORDER BY col_name""".stripMargin)),

    // Data profiling: one aggregation pass over the fact table -> one
    // row per profiled column (nulls / exact distincts / range).
    "pr1_profile" -> Q(
      (s, d) => graft.ops.Profile.profileNumeric(li(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_name"),
      Some("""SELECT 'l_quantity' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN l_quantity IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
        |  CAST(min(l_quantity) AS DOUBLE) AS min_val, CAST(max(l_quantity) AS DOUBLE) AS max_val
        |FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(DISTINCT l_extendedprice) AS BIGINT),
        |  CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE)
        |FROM lineitem
        |UNION ALL SELECT 'l_discount', CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN l_discount IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(DISTINCT l_discount) AS BIGINT),
        |  CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE)
        |FROM lineitem
        |UNION ALL SELECT 'l_tax', CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN l_tax IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(DISTINCT l_tax) AS BIGINT),
        |  CAST(min(l_tax) AS DOUBLE), CAST(max(l_tax) AS DOUBLE)
        |FROM lineitem
        |ORDER BY col_name""".stripMargin)),

    // SK2: join-key skew report — top-10 heaviest l_suppkey keys with
    // share and skew factor (count over uniform expectation). The
    // pre-join diagnostic that decides salting; one combinable count
    // shuffle + a TakeOrdered top-K, never a global sort.
    "sk2_skew_report" -> Q(
      (s, d) => graft.ops.Profile.skewReport(li(s, d), "l_suppkey", topK = 10)
        .select(col("rank"), col("key"), col("cnt"),
          round(col("share"), 6).as("share"),
          round(col("skew_factor"), 6).as("skew_factor"),
          col("n_keys"), col("n_rows"))
        .orderBy("rank"),
      Some("""WITH c AS (SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS cnt
        |           FROM lineitem GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |              CAST(sum(cnt) AS BIGINT) AS n_rows FROM c),
        |t AS (SELECT key, cnt,
        |        CAST(row_number() OVER (ORDER BY cnt DESC, key ASC) AS BIGINT) AS rank
        |      FROM c)
        |SELECT rank, key, cnt,
        |       round(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS share,
        |       round(CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |             / CAST(n_rows AS DOUBLE), 6) AS skew_factor,
        |       n_keys, n_rows
        |FROM t, st WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // Fixed-width histogram (24 × 5000 over extendedprice), edge-bucket
    // clamped so counts always sum to the row count.
    // Equi-depth histogram: exact interpolated quartile cut points
    // (tree-aggregated) broadcast onto a narrow bucket-assign map +
    // combinable counts — the scale-safe alternative to a global ntile
    // window. DuckDB's quantile_cont interpolates identically (h10).
    "hi2_equidepth" -> Q(
      (s, d) => graft.ops.Profile.equiDepth(li(s, d), "l_extendedprice", k = 4)
        .orderBy("bucket"),
      Some("""WITH c AS (
        |  SELECT quantile_cont(l_extendedprice, 0.25) AS c0,
        |         quantile_cont(l_extendedprice, 0.5)  AS c1,
        |         quantile_cont(l_extendedprice, 0.75) AS c2
        |  FROM lineitem)
        |SELECT CAST(CASE WHEN l_extendedprice < c0 THEN 0
        |            WHEN l_extendedprice < c1 THEN 1
        |            WHEN l_extendedprice < c2 THEN 2
        |            ELSE 3 END AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(l_extendedprice) AS DOUBLE) AS lo_val,
        |  CAST(max(l_extendedprice) AS DOUBLE) AS hi_val
        |FROM lineitem CROSS JOIN c
        |WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "hi1_histogram" -> Q(
      (s, d) => graft.ops.Profile.histogram(li(s, d), "l_extendedprice",
          lo = 0.0, hi = 120000.0, nBuckets = 24)
        .orderBy("bucket"),
      Some("""WITH b AS (
        |  SELECT CAST(least(23, greatest(0, CAST(floor(l_extendedprice / 5000.0) AS INTEGER))) AS INTEGER) AS bucket
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(bucket * 5000.0 AS DOUBLE) AS lo_edge
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // HQ1: mergeable QUANTILE-HISTOGRAM rollup — the hl1 pre-aggregate
    // pattern for the percentile family: per-day fixed-width bin
    // vectors (array<long>, element-wise-ADD mergeable), merged across
    // days into one histogram, quantiles answered by interpolation
    // inside the containing bin — O(days × bins) arithmetic, no raw
    // rescan. Row membership is decided by integer cumulative counts;
    // the interpolated double rides along rounded (ss1 precedent). The
    // exact_disc column recomputes the true discrete quantile from
    // value-level counts (bounded by the value domain, not data size)
    // and within_bin_width pins the estimator's error to one bin —
    // both value-checked cross-engine.
    "hq1_quantile_rollup" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val qs = Seq(0.25, 0.5, 0.9, 0.99)
        val vals = Queries.events(s, d).select(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          pmod(col("event_id"), lit(1000)).cast("int").as("v"))
        val daily = graft.ops.Profile.histogramRollup(vals, "day", "v",
          lo = 0.0, hi = 1000.0, nBuckets = 100)
        val merged = graft.ops.Profile.mergeHistogramBins(daily)
        val est = graft.ops.Profile.binQuantiles(merged, qs, lo = 0.0, width = 10.0)
        val vc = vals.groupBy(col("v")).agg(count(lit(1)).cast("long").as("n"))
          .withColumn("cumv", sum(col("n")).over(Window.orderBy(col("v"))))
        val exact = est.select(col("q"), col("total"))
          .join(vc, col("cumv") >= col("q") * col("total"))
          .groupBy(col("q")).agg(min(col("v")).cast("int").as("exact_disc"))
        est.join(exact, "q")
          .withColumn("within_bin_width",
            abs(col("est") - col("exact_disc")) <= lit(10.0))
          .orderBy("q")
      },
      Some("""WITH vals AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(event_id % 1000 AS INTEGER) AS v
        |  FROM events),
        |db AS (SELECT day, least(99, greatest(0, CAST(floor((v - CAST(0.0 AS DOUBLE)) / CAST(10.0 AS DOUBLE)) AS INTEGER))) AS bin,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM vals GROUP BY 1, 2),
        |merged AS (SELECT bin, CAST(sum(n) AS BIGINT) AS n FROM db GROUP BY 1),
        |cum AS (SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum,
        |          CAST(sum(n) OVER (ORDER BY bin) - n AS BIGINT) AS cum_before
        |        FROM merged),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM merged),
        |qs AS (SELECT CAST(unnest([0.25, 0.5, 0.9, 0.99]) AS DOUBLE) AS q),
        |est AS (SELECT q, CAST(bin AS INTEGER) AS bin,
        |          CAST(0.0 AS DOUBLE) + bin * CAST(10.0 AS DOUBLE) AS lo_edge,
        |          n AS bin_n, cum_before, total,
        |          round(CAST(0.0 AS DOUBLE) + bin * CAST(10.0 AS DOUBLE)
        |            + CAST(10.0 AS DOUBLE) * (q * total - cum_before) / n, 6) AS est
        |        FROM cum, tot, qs WHERE cum >= q * total AND cum_before < q * total),
        |vc AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY 1),
        |vcc AS (SELECT v, sum(n) OVER (ORDER BY v) AS cumv FROM vc),
        |exact AS (SELECT e.q, CAST(min(vcc.v) AS INTEGER) AS exact_disc
        |          FROM est e JOIN vcc ON vcc.cumv >= e.q * e.total GROUP BY e.q)
        |SELECT est.q, bin, lo_edge, bin_n, cum_before, total, est.est,
        |  exact.exact_disc,
        |  abs(est.est - exact.exact_disc) <= CAST(10.0 AS DOUBLE) AS within_bin_width
        |FROM est JOIN exact ON est.q = exact.q ORDER BY est.q""".stripMargin)),

    // LY1: clustering-depth advisor — simulate 32 range-clustered
    // files under each candidate sort key and report how many files a
    // point probe on l_shipdate must open. Sorting by l_shipdate gives
    // depth ~1 (skipping works); sorting by l_partkey leaves every
    // file's date range overlapping (~32) — the OPTIMIZE/zo1 rewrite
    // decision made from numbers instead of folklore.
    "ly1_clustering_depth" -> Q(
      (s, d) => graft.ops.Layout.clusteringDepthReport(
          li(s, d).filter(col("l_orderkey") < 10000), // bounded gate slice:
          // the report is file-count-sized; the two global ntile windows
          // exist only to SIMULATE the clustered write here — production
          // reads [min,max] from parquet footers (see the op's doc)
          Seq(("l_shipdate", col("l_shipdate")),
            ("l_partkey", col("l_partkey"))),
          probeCol = "l_shipdate",
          idCol = concat_ws(":", col("l_orderkey"), col("l_linenumber")))
        .orderBy("sort_key"),
      Some("""WITH base AS (SELECT l_shipdate AS p,
        |    l_orderkey || ':' || l_linenumber AS id,
        |    l_shipdate AS k1, l_partkey AS k2 FROM lineitem
        |  WHERE l_orderkey < 10000),
        |f1 AS (SELECT p, ntile(32) OVER (ORDER BY k1, id) AS f FROM base),
        |r1 AS (SELECT f, min(p) AS lo, max(p) AS hi FROM f1 GROUP BY f),
        |d1 AS (SELECT x.f, CAST(count(*) AS BIGINT) AS d
        |  FROM r1 x JOIN r1 y ON x.lo <= y.hi AND y.lo <= x.hi GROUP BY x.f),
        |a1 AS (SELECT CAST(count(*) AS BIGINT) AS n_files,
        |    CAST(sum(d) AS BIGINT) AS sd, max(d) AS max_depth, min(d) AS min_depth
        |  FROM d1),
        |f2 AS (SELECT p, ntile(32) OVER (ORDER BY k2, id) AS f FROM base),
        |r2 AS (SELECT f, min(p) AS lo, max(p) AS hi FROM f2 GROUP BY f),
        |d2 AS (SELECT x.f, CAST(count(*) AS BIGINT) AS d
        |  FROM r2 x JOIN r2 y ON x.lo <= y.hi AND y.lo <= x.hi GROUP BY x.f),
        |a2 AS (SELECT CAST(count(*) AS BIGINT) AS n_files,
        |    CAST(sum(d) AS BIGINT) AS sd, max(d) AS max_depth, min(d) AS min_depth
        |  FROM d2)
        |SELECT 'l_shipdate' AS sort_key, n_files,
        |  (sd * 1000000) // n_files AS avg_depth_micro, max_depth, min_depth
        |FROM a1
        |UNION ALL
        |SELECT 'l_partkey', n_files, (sd * 1000000) // n_files, max_depth, min_depth
        |FROM a2
        |ORDER BY sort_key""".stripMargin)),

    // Z-order (Morton) key — cross-engine value check of the layout
    // op's bit-interleave arithmetic (the clustering WRITE and its
    // row-group-skipping payoff are proven in LayoutSpec on parquet
    // footers; this row pins the key values the layout clusters by).
    "zo1_zorder_key" -> Q(
      (s, d) => li(s, d).filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          graft.ops.Layout.zorderKey2(
            pmod(col("l_partkey"), lit(256)),
            pmod(col("l_suppkey"), lit(256)), bits = 8).as("zkey"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some {
        val z = (0 until 8).map(b =>
          s"((((l_partkey % 256) >> $b) & 1) << ${2 * b}) | " +
            s"((((l_suppkey % 256) >> $b) & 1) << ${2 * b + 1})").mkString(" | ")
        s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           |  CAST($z AS BIGINT) AS zkey
           |FROM lineitem WHERE l_orderkey < 500
           |ORDER BY l_orderkey, l_linenumber""".stripMargin
      }),

    // Hilbert clustering key — zo1's sibling on the curve that never
    // takes Morton's diagonal jumps (tighter row-group boxes for the
    // same file count at 100 TB). Every round of the xy2d walk is
    // exact long arithmetic; the oracle replays the rounds as chained
    // CTEs, so the gate value-checks the full rotation/reflection
    // ladder, not just the final key.
    "zo2_hilbert_key" -> Q(
      (s, d) => graft.ops.Layout.withHilbertKey2(
          li(s, d).filter(col("l_orderkey") < 500),
          pmod(col("l_partkey"), lit(256)),
          pmod(col("l_suppkey"), lit(256)), bits = 8, out = "hkey")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "hkey")
        .orderBy("l_orderkey", "l_linenumber"),
      Some(OracleGen.zo2Sql(8))),

    // ---- relational / benchmark suite --------------------------------

    // TPC-H Q1-style pricing summary: decimal-exact sums cast to double
    // so both engines produce bit-identical results.
    "h1_pricing_summary" -> Q(
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          count(lit(1)).cast("long").as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order").cast("double"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(count(*) AS BIGINT) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Fact-fact join + aggregation: revenue per order priority.
    "h3_join_revenue" -> Q(
      (s, d) => li(s, d)
        .join(s.read.parquet(s"$d/orders.parquet"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(discPrice).cast("double").as("revenue"),
          count(lit(1)).cast("long").as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Broadcast dims + window top-k: top-3 suppliers by revenue per nation.
    "h4_top_suppliers" -> Q(
      (s, d) => {
        val rev = li(s, d)
          .join(broadcast(s.read.parquet(s"$d/supplier.parquet")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(s.read.parquet(s"$d/nation.parquet")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("s_suppkey"))
          .agg(sum(discPrice).cast("double").as("revenue"))
        val w = Window.partitionBy(col("n_name"))
          .orderBy(col("revenue").desc, col("s_suppkey").asc)
        rev.withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 3)
          .orderBy("n_name", "rk")
      },
      Some("""WITH rev AS (
        |  SELECT n_name, s_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |                JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, s_suppkey, revenue, rk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY n_name
        |    ORDER BY revenue DESC, s_suppkey ASC) AS INTEGER) AS rk FROM rev)
        |WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin)),

    // Multi-level aggregates: rollup over (returnflag, linestatus) —
    // beyond the reference's surface, but table stakes for an analytics
    // engine. NULLS FIRST pinned on both sides (engine defaults differ).
    "h7_rollup" -> Q(
      (s, d) => li(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(dec("l_quantity")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Full cube over the same pair: all four grouping sets in one pass
    // (Catalyst plans rollup/cube as a single Expand + aggregation — no
    // per-grouping-set rescan). Same NULLS FIRST discipline as h7.
    "h8_cube" -> Q(
      (s, d) => li(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(dec("l_quantity")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // GROUPING SETS proper (disjoint single-column groupings — neither
    // rollup nor cube): SQL-only surface in Spark's DataFrame-era API,
    // still one Expand + aggregate pass.
    "h9_grouping_sets" -> Q(
      (s, d) => {
        li(s, d).createOrReplaceTempView("lineitem_h9")
        s.sql("""SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem_h9
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Salted two-phase top-k (Skew.saltedTopK): must equal the plain
    // window top-k the oracle computes — salting is a physical rewrite,
    // never a semantic one. Struct ordering encodes the composite
    // (price DESC, orderkey, linenumber) tiebreak as one sort key.
    "sk1_salted_topk" -> Q(
      (s, d) => graft.ops.Skew.saltedTopK(
          li(s, d).select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
          "l_suppkey",
          struct((-col("l_extendedprice")).as("p"), col("l_orderkey").as("o"),
            col("l_linenumber").as("l")).asc,
          k = 3)
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber"),
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |  FROM lineitem) WHERE rk <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // Window-analytics breadth: lag/lead offsets, a running total, and
    // a 5-row moving average in ONE window pass per supplier. Running
    // double sums are order-sensitive (DuckDB evaluates windowed sums
    // via segment trees, Spark incrementally) — so all sums run over
    // exact decimals and only the final value casts to double. The
    // synthetic lineitem has duplicate (l_orderkey, l_linenumber) pairs,
    // so the window order also includes every column the frame consumes
    // (price, qty): any remaining ties are between rows the window
    // functions cannot distinguish, making the result tie-order-proof.
    "w2_window_analytics" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_quantity"))
        val w5 = w.rowsBetween(-4, 0)
        li(s, d).select(
            col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            col("l_extendedprice"),
            sum(dec("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double").as("run_qty"),
            lag(col("l_extendedprice"), 1).over(w).as("prev_price"),
            lead(col("l_extendedprice"), 1).over(w).as("next_price"),
            (sum(dec("l_extendedprice")).over(w5).cast("double")
              / count(lit(1)).over(w5).cast("double")).as("ma5"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty,
        |  lag(l_extendedprice, 1) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity) AS prev_price,
        |  lead(l_extendedprice, 1) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity) AS next_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(count(*) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma5
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Rank-function family over per-nation supplier revenue: rank,
    // dense_rank, percent_rank, cume_dist, ntile — the tiebreak on
    // s_suppkey makes the window order total, so every rank value is
    // engine-portable.
    "w3_rank_family" -> Q(
      (s, d) => {
        val rev = li(s, d)
          .join(broadcast(s.read.parquet(s"$d/supplier.parquet")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(s.read.parquet(s"$d/nation.parquet")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("s_suppkey"))
          .agg(sum(discPrice).cast("double").as("revenue"))
        val w = Window.partitionBy(col("n_name"))
          .orderBy(col("revenue").desc, col("s_suppkey").asc)
        rev.select(col("n_name"), col("s_suppkey"), col("revenue"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            percent_rank().over(w).as("prnk"),
            cume_dist().over(w).as("cdist"),
            ntile(4).over(w).cast("int").as("quartile"))
          .orderBy("n_name", "rnk")
      },
      Some("""WITH rev AS (
        |  SELECT n_name, s_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |                JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, s_suppkey, revenue,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM rev
        |WINDOW w AS (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey ASC)
        |ORDER BY n_name, rnk""".stripMargin)),

    // Pivot: long->wide with a PINNED value list (Seq("F","O","P")) —
    // never the value-discovery overload, which needs an extra
    // distinct-scan job and makes the output schema data-dependent
    // (nondeterministic columns at scale). One shuffle: the groupBy.
    "pv1_pivot" -> Q(
      (s, d) => s.read.parquet(s"$d/orders.parquet")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec("o_totalprice")).cast("double"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O'
        |        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Unpivot: wide->long (the Dataset.unpivot operator — melt). All
    // measures pre-cast to double so the unpivoted value column has one
    // type; avg is sum/count over exact decimals for engine portability.
    "pv2_unpivot" -> Q(
      (s, d) => {
        val aggd = li(s, d).groupBy(col("l_returnflag")).agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_price"),
          (sum(dec("l_discount")).cast("double")
            / count(lit(1)).cast("double")).as("avg_disc"))
        aggd.unpivot(
            Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
            "metric", "value")
          .orderBy("l_returnflag", "metric")
      },
      Some("""WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS avg_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |UNION ALL SELECT l_returnflag, 'avg_disc', avg_disc FROM a
        |ORDER BY l_returnflag, metric""".stripMargin)),

    // Approximate aggregates — the sketch family every analytics engine
    // carries for 100 TB interactive work: HLL++ distinct counts and
    // t-digest-style quantiles, both single-pass, map-side-combinable,
    // O(sketch) memory per group. rows-only: sketch internals are
    // engine-specific, so no cross-engine hash can exist; accuracy vs
    // the exact answers is asserted in ApproxSpec instead.
    // The MERGEABLE-sketch pattern ag1 stops short of: build one HLL
    // sketch PER DAY (the pre-aggregate a 100 TB warehouse persists
    // instead of raw ids), then answer the whole-range distinct count
    // by UNIONING the day sketches — no rescan of the raw data, which
    // is the entire point of sketches: a day's sketch is ~16 KB
    // regardless of row count, and rollups over any date range become
    // O(days) merges. Exact columns (day count, per-day distinct sum,
    // range-exact distinct) carry the cross-engine hash; sketch
    // accuracy reduces to two deterministic bound booleans, ag1-style.
    "hl1_sketch_rollup" -> Q(
      (s, d) => {
        val ev = Queries.events(s, d)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
        val daily = ev.groupBy(col("day")).agg(
          expr("hll_sketch_agg(user_id, 14)").as("sk"),
          countDistinct(col("user_id")).cast("long").as("exact_nd"))
        val rolled = daily.agg(
          count(lit(1)).cast("long").as("n_days"),
          sum(col("exact_nd")).cast("long").as("sum_daily_nd"),
          expr("every(abs(hll_sketch_estimate(sk) - exact_nd) <= 0.05 * exact_nd)")
            .as("daily_err_ok"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("__est_total"))
        val total = ev.agg(countDistinct(col("user_id")).cast("long").as("total_exact"))
        rolled.crossJoin(total) // one-row broadcast scalar
          .select(col("n_days"), col("sum_daily_nd"), col("total_exact"),
            col("daily_err_ok"),
            (abs(col("__est_total") - col("total_exact"))
              <= lit(0.05) * col("total_exact")).as("merged_err_ok"))
      },
      Some("""WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS nd
        |  FROM events GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(nd) AS BIGINT) AS sum_daily_nd,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS total_exact,
        |  TRUE AS daily_err_ok, TRUE AS merged_err_ok
        |FROM daily""".stripMargin)),

    // STREAMING form of hl1: the sketch table is MAINTAINED by the
    // stream (one O(batch) sketch-merge per micro-batch via
    // foreachBatch) instead of built in one pass; the final analytics
    // read sketches only. Exact per-day distincts carry the hash;
    // estimate accuracy is the bound boolean. Multi-tick drain
    // (maxFilesPerTrigger=1 over 2 files) proves merge associativity
    // across batches, not just within one.
    "hl2_stream_sketch" -> Q(
      (s, d) => Queries.withStreamShuffle(s) {
        val ev = Queries.events(s, d)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
        val srcDir = Queries.scratchOnce("hl2_src", d)(
          ev.repartition(2).write.mode("overwrite").parquet(_))
        val sketchDir = Queries.scratch("hl2_sketch") + "/t"
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        graft.streaming.CdcStream.sketchMaintenance(stream, sketchDir,
          "day", "user_id", Queries.scratch("hl2_ckpt"))
        val est = graft.streaming.CdcStream.currentSketches(s, sketchDir).get
          .select(col("day"), expr("hll_sketch_estimate(sk)").as("__est"))
        ev.groupBy(col("day"))
          .agg(countDistinct(col("user_id")).cast("long").as("exact_nd"))
          .join(est, "day")
          .select(col("day"), col("exact_nd"),
            (abs(col("__est") - col("exact_nd"))
              <= lit(0.05) * col("exact_nd")).as("est_err_ok"))
          .orderBy("day")
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_nd,
        |  TRUE AS est_err_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    "ag1_approx_stats" -> Q(
      (s, d) => {
        // One pass computes BOTH the sketches and the exact answers,
        // then reduces the sketch side to deterministic bound checks:
        // HLL++ within 3×rsd of the exact distinct count, and each
        // approx percentile inside the exact [q-0.01, q+0.01] value
        // band (approx_percentile guarantees rank error <= n/accuracy
        // = n/10000, far inside that band). The exact columns carry
        // the cross-engine hash; the booleans would flip if sketch
        // accuracy ever degraded — the ann1-style quantified row for
        // the approximate-aggregate family.
        val g = li(s, d).groupBy(col("l_returnflag")).agg(
          countDistinct(col("l_orderkey")).cast("long").as("exact_nd"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("nd_approx"),
          expr("percentile(l_extendedprice, array(0.49, 0.5, 0.51, 0.98, 0.99, 0.995))").as("pe"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)").as("pa"),
          count(lit(1)).cast("long").as("n"))
        g.select(col("l_returnflag"), col("exact_nd"),
            col("pe").getItem(1).as("p50_exact"),
            col("pe").getItem(4).as("p99_exact"), col("n"),
            (abs(col("nd_approx") - col("exact_nd"))
              <= lit(0.06) * col("exact_nd")).as("nd_err_ok"),
            col("pa").getItem(0).between(col("pe").getItem(0), col("pe").getItem(2))
              .as("p50_err_ok"),
            col("pa").getItem(1).between(col("pe").getItem(3), col("pe").getItem(5))
              .as("p99_err_ok"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_nd,
        |  quantile_cont(l_extendedprice, 0.5) AS p50_exact,
        |  quantile_cont(l_extendedprice, 0.99) AS p99_exact,
        |  CAST(count(*) AS BIGINT) AS n,
        |  TRUE AS nd_err_ok, TRUE AS p50_err_ok, TRUE AS p99_err_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Moment statistics (variance / correlation / regression slope)
    // from DECIMAL-EXACT accumulators: the five raw moments are exact
    // decimal sums (order-independent, partitioning-independent), cast
    // to double only for the final closed-form combination — so the
    // statistics are bit-reproducible across engines AND across
    // cluster repartitionings, unlike double-accumulated corr()/
    // var_samp() whose value shifts with partition count at 100 TB.
    "st2_moment_stats" -> Q(
      (s, d) => {
        val q = dec("l_quantity")
        val p = dec("l_extendedprice")
        val m = li(s, d).groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(q).as("sq"), sum(p).as("sp"),
            sum(q * q).as("sqq"), sum(p * p).as("spp"),
            sum(q * p).as("sqp"))
        val nD = col("n").cast("double")
        val (sq, sp, sqq, spp, sqp) = (col("sq").cast("double"),
          col("sp").cast("double"), col("sqq").cast("double"),
          col("spp").cast("double"), col("sqp").cast("double"))
        val covN = sqp - sq * sp / nD          // n * covar
        val varQN = sqq - sq * sq / nD         // n * var(q)
        val varPN = spp - sp * sp / nD
        m.select(col("l_returnflag"), col("n"),
            (sq / nD).as("mean_qty"),
            (varQN / (nD - 1.0)).as("var_qty"),
            (covN / sqrt(varQN * varPN)).as("corr_qp"),
            (covN / varQN).as("slope_p_on_q"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS spp,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp
        |  FROM lineitem GROUP BY 1)
        |, c AS (
        |  SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(sq AS DOUBLE) AS sqd, CAST(sp AS DOUBLE) AS spd,
        |    CAST(sqq AS DOUBLE) AS sqqd, CAST(spp AS DOUBLE) AS sppd,
        |    CAST(sqp AS DOUBLE) AS sqpd
        |  FROM m)
        |SELECT l_returnflag, n,
        |  sqd / nd AS mean_qty,
        |  (sqqd - sqd * sqd / nd) / (nd - 1.0) AS var_qty,
        |  (sqpd - sqd * spd / nd)
        |    / sqrt((sqqd - sqd * sqd / nd) * (sppd - spd * spd / nd)) AS corr_qp,
        |  (sqpd - sqd * spd / nd) / (sqqd - sqd * sqd / nd) AS slope_p_on_q
        |FROM c ORDER BY l_returnflag""".stripMargin)),

    // Exact interpolated percentiles (sort-based `percentile`, not the
    // approximate sketch) — both engines interpolate linearly over the
    // sorted values, so the doubles hash-match.
    "h10_percentiles" -> Q(
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"),
          count(lit(1)).cast("long").as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.95) AS p95,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Semi-join (J3 analog): BUILDING-segment customers that have orders.
    "h5_semi_join" -> Q(
      (s, d) => s.read.parquet(s"$d/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(s.read.parquet(s"$d/orders.parquet"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin)),

    // Anti-join: customers with no orders at all.
    "h6_anti_join" -> Q(
      (s, d) => s.read.parquet(s"$d/customer.parquet")
        .join(s.read.parquet(s"$d/orders.parquet"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    // ---- sessionization / event-time windows --------------------------

    // Gap-based sessionization (gaps-and-islands): per-user sessions
    // split on >12 h silence, rolled up to start/end/count/duration.
    // One hash exchange on user_id; lag + running-sum share one sort.
    "ses1_sessionize" -> Q(
      (s, d) => Sessions.sessionStats(
          Queries.events(s, d),
          keyCol = "user_id", tsCol = "ts",
          gap = lit(43200000000L), tieCol = "event_id")
        .orderBy("user_id", "session_idx"),
      Some("""WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 43200000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM g)
        |SELECT user_id, session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Spark's NATIVE session_window aggregate (the streaming-capable
    // form of ses1; merge rule: an event extends the session iff its
    // gap from the previous event is < 12 h, window end = last + 12 h).
    "ses2_session_window" -> Q(
      (s, d) => Queries.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("w_start"),
          col("session_window.end").as("w_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "w_start"),
      Some("""WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 43200000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id,
        |  min(ts) AS w_start,
        |  max(ts) + INTERVAL 12 HOUR AS w_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, w_start""".stripMargin)),

    // Trailing 24 h per-user RANGE frame on integer microseconds —
    // order-independent (peers included), decimal-exact sum.
    "ma1_trailing_window" -> Q(
      (s, d) => Sessions.trailingWindow(
          Queries.events(s, d),
          keyCol = "user_id", tsCol = "ts", valueCol = "value",
          horizonUs = 86400000000L)
        .select("event_id", "user_id", "trail_n", "trail_sum")
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS trail_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS trail_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),

    // Ordered conversion funnel view -> click -> purchase: stage
    // timestamps chain strictly (each stage's min ts must follow the
    // previous stage's), computed as three STACKED unordered windows
    // over one user_id partitioning — a single exchange, no self-joins.
    "fn1_funnel" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
        // first two days only: the full month funnels every user to
        // stage 3 (one output row) — the slice keeps all four stages
        // populated so the gate discriminates
        val ev = Queries.events(s, d)
          .filter(col("ts") < lit("2024-01-03").cast("timestamp"))
          .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("tc", min(when(col("event_type") === "click" &&
            col("ts") > col("tv"), col("ts"))).over(w))
          .withColumn("tp", min(when(col("event_type") === "purchase" &&
            col("ts") > col("tc"), col("ts"))).over(w))
        ev.select(col("user_id"), col("tv"), col("tc"), col("tp")).distinct()
          .select(when(col("tp").isNotNull, 3).when(col("tc").isNotNull, 2)
            .when(col("tv").isNotNull, 1).otherwise(0).cast("int").as("stage"))
          .groupBy("stage").agg(count(lit(1)).cast("long").as("n_users"))
          .orderBy("stage")
      },
      Some("""WITH ev AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'),
        |u AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS tv
        |  FROM ev GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS tc FROM ev e JOIN u USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > u.tv GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS tp FROM ev e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1)
        |SELECT CAST(CASE WHEN tp IS NOT NULL THEN 3 WHEN tc IS NOT NULL THEN 2
        |            WHEN tv IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS stage,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM u LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-group MODE with a deterministic tiebreak (smallest value wins
    // equal counts): count shuffle on (group, value) — map-side
    // combinable — then a WindowGroupLimit top-1 over the tiny count
    // table, never the raw rows.
    "md1_mode_per_group" -> Q(
      (s, d) => {
        val counts = Queries.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("n").desc, col("event_type").asc)
        counts.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("event_type").as("mode_event"), col("n"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |        FROM events GROUP BY 1, 2)
        |SELECT user_id, event_type AS mode_event, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY n DESC, event_type ASC) AS rk FROM c)
        |WHERE rk = 1 ORDER BY user_id""".stripMargin)),

    // Normalization-layer exact dedup: lowercase, strip sentence
    // punctuation, collapse runs of whitespace — the curation layer
    // that catches trivially-reformatted duplicates BEFORE near-dup
    // hashing spends anything on them. Same shuffle profile as dd1
    // (hash + id only); the normalization itself is a narrow codegen
    // regexp chain identical in both engines.
    "dd11_normalized_dedup" -> Q(
      (s, d) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[.,!?;:]", ""), "\\s+", " "))
        docs(s, d)
          .groupBy(md5(norm).as("norm_hash"))
          .agg(min(col("doc_id")).cast("long").as("keep_id"),
            count(lit(1)).cast("long").as("n_variants"))
          .select("keep_id", "n_variants")
          .orderBy("keep_id")
      },
      Some("""SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS n_variants
        |FROM documents
        |GROUP BY md5(trim(regexp_replace(
        |  regexp_replace(lower(text), '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')))
        |ORDER BY keep_id""".stripMargin)),

    // Cumulative distinct users by day WITHOUT a running COUNT(DISTINCT)
    // — the first-seen trick: distinct-ness collapses to min(day) per
    // user (one combinable shuffle on user_id), daily news aggregate to
    // O(days) rows, and only THAT tiny table flows through the global
    // running-sum window. A naive per-day distinct-union would rescan
    // the prefix per day; this is one pass at any scale.
    "cd1_cumulative_distinct" -> Q(
      (s, d) => {
        val ev = Queries.events(s, d)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
        val firstSeen = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        val newPerDay = firstSeen.groupBy(col("day"))
          .agg(count(lit(1)).cast("long").as("new_users"))
        val days = ev.select("day").distinct()
        days.join(newPerDay, Seq("day"), "left")
          .na.fill(0L, Seq("new_users"))
          .withColumn("cum_users",
            sum(col("new_users")).over(Window.orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("long"))
          .orderBy("day")
      },
      Some("""WITH fs AS (SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
        |        FROM events GROUP BY 1),
        |np AS (SELECT day, count(*) AS n FROM fs GROUP BY 1),
        |days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events)
        |SELECT d.day, CAST(coalesce(np.n, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(np.n, 0)) OVER (ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM days d LEFT JOIN np ON d.day = np.day
        |ORDER BY d.day""".stripMargin)),

    // Weekly retention cohorts: signup week x activity-week offset.
    // Both engines Monday-truncate weeks, so the day differences are
    // exact multiples of 7 and the offset division is exact.
    "rt1_retention" -> Q(
      (s, d) => {
        val ev = Queries.events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(date_trunc("week", min(col("ts"))).as("cw"))
        val act = ev.select(col("user_id"),
          date_trunc("week", col("ts")).as("aw")).distinct()
        su.join(act, "user_id").filter(col("aw") >= col("cw"))
          .groupBy(col("cw").as("cohort_week"),
            (datediff(col("aw"), col("cw")) / lit(7)).cast("int").as("week_offset"))
          .agg(count(lit(1)).cast("long").as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH s AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cw
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
        |SELECT CAST(cw AS TIMESTAMP) AS cohort_week,
        |  CAST(datediff('day', cw, aw) / 7 AS INTEGER) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM s JOIN a USING (user_id) WHERE aw >= cw
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Chi-squared independence test (event_type x weekend) from exact
    // long contingency counts; expected values and the statistic are
    // closed-form doubles over those exact counts. Marginals re-agg
    // from the tiny cell table and broadcast — no second corpus pass.
    "st3_chi2" -> Q(
      (s, d) => {
        val base = Queries.events(s, d).select(col("event_type"),
          dayofweek(col("ts")).isin(1, 7).cast("int").as("wknd"))
        val o = base.groupBy("event_type", "wknd")
          .agg(count(lit(1)).cast("long").as("o"))
        val rt = o.groupBy("event_type").agg(sum(col("o")).cast("long").as("rt"))
        val ct = o.groupBy("wknd").agg(sum(col("o")).cast("long").as("ctot"))
        val n = o.agg(sum(col("o")).cast("long").as("n"))
        val e = col("rt").cast("double") * col("ctot").cast("double") /
          col("n").cast("double")
        o.join(rt, "event_type").join(ct, "wknd").crossJoin(broadcast(n))
          .withColumn("cell", (col("o").cast("double") - e) *
            (col("o").cast("double") - e) / e)
          .agg(sum(col("cell")).as("chi2"),
            count(lit(1)).cast("long").as("n_cells"),
            first(col("n")).as("n_rows"))
      },
      Some("""WITH b AS (
        |  SELECT event_type,
        |    CAST(CASE WHEN isodow(ts) IN (6, 7) THEN 1 ELSE 0 END AS INTEGER) AS wknd
        |  FROM events),
        |o AS (SELECT event_type, wknd, CAST(count(*) AS BIGINT) AS o
        |      FROM b GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY 1),
        |ct AS (SELECT wknd, CAST(sum(o) AS BIGINT) AS ctot FROM o GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o)
        |SELECT sum((CAST(o.o AS DOUBLE)
        |    - CAST(rt.rt AS DOUBLE) * CAST(ct.ctot AS DOUBLE) / CAST(n.n AS DOUBLE))
        |  * (CAST(o.o AS DOUBLE)
        |    - CAST(rt.rt AS DOUBLE) * CAST(ct.ctot AS DOUBLE) / CAST(n.n AS DOUBLE))
        |  / (CAST(rt.rt AS DOUBLE) * CAST(ct.ctot AS DOUBLE) / CAST(n.n AS DOUBLE)))
        |  AS chi2,
        |  CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(any_value(n.n) AS BIGINT) AS n_rows
        |FROM o JOIN rt USING (event_type) JOIN ct USING (wknd) CROSS JOIN n""".stripMargin)),

    // Substring-level exact dedup (Lee et al. 2021, k-token spans):
    // per-doc duplicated-span fractions; text leaves the row as md5
    // hashes, all wide stages carry (hash, id) pairs only.
    "dd9_duplicated_spans" -> Q(
      (s, d) => Dedup.duplicatedSpans(docs(s, d), k = 8)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |        FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(toks) - 8, 0) + 1),
        |      i -> md5(array_to_string(list_slice(toks, i + 1, i + 8), ' ')))) AS h
        |  FROM t),
        |multi AS (SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) > 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN h IN (SELECT h FROM multi) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_spans,
        |  CAST(sum(CASE WHEN h IN (SELECT h FROM multi) THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dup_ratio
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // SA1: ExactSubstr-style repeated-substring PROFILE (Lee et al.
    // 2021) — per doc, how many positions sit inside an 8- / 32-token
    // window repeated ANYWHERE in the corpus, via binary-lifted md5
    // gram labels (prefix-doubling on hashes: log₂w window passes, one
    // corpus shuffle). The oracle replays the identical md5 doubling
    // ladder, so the gate checks every lift level, not just the rollup.
    "sa1_repeat_profile" -> Q(
      (s, d) => Dedup.repeatProfile(par(docs(s, d)), reportWs = Seq(8, 32))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |        FROM documents),
        |p AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos,
        |        unnest(toks) AS tok FROM t),
        |g1 AS (SELECT doc_id, pos, md5(tok) AS h1 FROM p),
        |g2 AS (SELECT doc_id, pos, md5(h1 || lead(h1, 1) OVER w) AS h2 FROM g1
        |       WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |g4 AS (SELECT doc_id, pos, md5(h2 || lead(h2, 2) OVER w) AS h4 FROM g2
        |       WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |g8 AS (SELECT doc_id, pos, md5(h4 || lead(h4, 4) OVER w) AS h8 FROM g4
        |       WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |g16 AS (SELECT doc_id, pos, h8, md5(h8 || lead(h8, 8) OVER w) AS h16 FROM g8
        |        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |g32 AS (SELECT doc_id, pos, md5(h16 || lead(h16, 16) OVER w) AS h32 FROM g16
        |        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |r8 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS rep8 FROM
        |         (SELECT doc_id, count(*) OVER (PARTITION BY h8) AS c
        |          FROM g8 WHERE h8 IS NOT NULL) WHERE c > 1 GROUP BY 1),
        |r32 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS rep32 FROM
        |          (SELECT doc_id, count(*) OVER (PARTITION BY h32) AS c
        |           FROM g32 WHERE h32 IS NOT NULL) WHERE c > 1 GROUP BY 1),
        |ln AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
        |SELECT ln.doc_id, ln.n_tokens,
        |  CAST(coalesce(r8.rep8, 0) AS BIGINT) AS rep8,
        |  CAST(coalesce(r32.rep32, 0) AS BIGINT) AS rep32,
        |  CASE WHEN ln.n_tokens - 7 > 0 THEN
        |    round(CAST(coalesce(r8.rep8, 0) AS DOUBLE)
        |      / CAST(ln.n_tokens - 7 AS DOUBLE), 9) END AS frac8
        |FROM ln LEFT JOIN r8 USING (doc_id) LEFT JOIN r32 USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // Z-score outlier screen per event_type: moments from decimal-exact
    // sums (st2's trick), broadcast back onto the stream for a narrow
    // per-row z — the standard drift/anomaly monitor a pipeline runs
    // over a new data drop. max() and count() are order-independent, so
    // the row hashes cross-engine despite the double division.
    // AN2: ROBUST anomaly detection — median/MAD instead of mean/std,
    // the monitor that survives the very outliers it hunts (one wild
    // value drags a mean+std z-score toward itself and masks the rest;
    // the median and MAD have 50% breakdown). Exact interpolated
    // percentile both sides (the h10 cross-engine precedent); MAD == 0
    // groups yield null z via the null-propagating guard, identically
    // in both engines. Scale: two tree-aggregated percentile passes +
    // two broadcast joins — the same shuffle profile as an1.
    // Truncated normalized EWMA drift monitor per event type: the
    // weighted sum is an in-row ordered fold over the 20-row frame, so
    // both engines add the same terms in the same order (pow ulps
    // absorbed by round-6).
    "an3_ewma_drift" -> Q(
      (s, d) => graft.ops.TimeSeries.ewmaSpikes(
          Queries.events(s, d), "value", Seq("ts", "event_id"), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("ewma"), 6).as("ewma"), round(col("dev"), 6).as("dev"),
          col("spike"))
        .orderBy("event_id"),
      Some("""WITH a AS (SELECT event_id, event_type, value,
        |    list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr
        |  FROM events),
        |s AS (SELECT event_id, event_type, value,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(arr) + 1),
        |      i -> pow(0.8, CAST(len(arr) - i AS DOUBLE)) * arr[CAST(i AS INTEGER)])),
        |      (acc, x) -> acc + x) AS num,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(arr) + 1),
        |      i -> pow(0.8, CAST(len(arr) - i AS DOUBLE)))),
        |      (acc, x) -> acc + x) AS den
        |  FROM a)
        |SELECT event_id, event_type, value, round(num / den, 6) AS ewma,
        |  round(value - num / den, 6) AS dev,
        |  abs(value - num / den) > 8.0 AS spike
        |FROM s ORDER BY event_id""".stripMargin)),

    // SFT chat-transcript linting: conversations synthesized per user
    // from the event stream (deterministic role map + ordered turns),
    // serialized to JSON, then linted through the from_json path. The
    // oracle recomputes every lint value from the events directly — a
    // broken JSON round-trip or a wrong HOF shows as a value diff.
    "cv1_chat_lint" -> Q(
      (s, d) => {
        val conv = Queries.events(s, d).filter(col("user_id") < 50)
          .withColumn("role",
            when(col("event_type").isin("click", "view"), "user")
              .otherwise("assistant"))
          .withColumn("content",
            concat(col("event_type"), lit(":"), col("event_id")))
          .groupBy("user_id")
          .agg(to_json(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("role"), col("content")))),
            t => struct(t.getField("role").as("role"),
              t.getField("content").as("content")))).as("conv"))
        Curate.lintConversations(conv, "conv")
          .select("user_id", "n_turns", "first_role_ok",
            "n_alternation_violations", "n_empty_turns", "lint_pass")
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_type IN ('click', 'view') THEN 'user'
        |         ELSE 'assistant' END AS role,
        |    event_type || ':' || event_id AS content
        |  FROM events WHERE user_id < 50),
        |c AS (SELECT user_id,
        |    list(struct_pack(role := role, content := content)
        |      ORDER BY ts, event_id) AS t
        |  FROM e GROUP BY 1),
        |l AS (SELECT user_id, len(t) AS n_turns,
        |    t[1].role = 'user' AS first_role_ok,
        |    CASE WHEN len(t) >= 2 THEN len(list_filter(range(2, len(t) + 1),
        |      i -> t[CAST(i AS INTEGER)].role = t[CAST(i - 1 AS INTEGER)].role))
        |      ELSE 0 END AS nav,
        |    len(list_filter(t, x -> len(x.content) = 0)) AS net
        |  FROM c)
        |SELECT user_id, CAST(n_turns AS BIGINT) AS n_turns, first_role_ok,
        |  CAST(nav AS BIGINT) AS n_alternation_violations,
        |  CAST(net AS BIGINT) AS n_empty_turns,
        |  first_role_ok AND nav = 0 AND net = 0 AS lint_pass
        |FROM l ORDER BY user_id""".stripMargin)),

    "an2_robust_zscore" -> Q(
      (s, d) => {
        val ev = Queries.events(s, d)
          .select(col("event_type"), col("value").cast("double").as("v"))
        val m = ev.groupBy("event_type").agg(
          count(lit(1)).cast("long").as("n"),
          expr("percentile(v, 0.5)").as("med_v"))
        val md = ev.join(broadcast(m), "event_type")
          .select(col("event_type"), abs(col("v") - col("med_v")).as("av"))
          .groupBy("event_type").agg(expr("percentile(av, 0.5)").as("mad_v"))
        val denom = lit(1.4826) * col("mad_v")
        ev.join(broadcast(m), "event_type").join(broadcast(md), "event_type")
          .withColumn("z", (col("v") - col("med_v")) /
            when(denom =!= 0.0, denom))
          .groupBy("event_type")
          .agg(first(col("n")).as("n"),
            first(col("med_v")).as("med_v"),
            first(col("mad_v")).as("mad_v"),
            sum(when(abs(col("z")) > 3.5, 1L).otherwise(0L)).as("n_outliers"),
            max(abs(col("z"))).as("max_abs_z"))
          .orderBy("event_type")
      },
      Some("""WITH s AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        quantile_cont(v, 0.5) AS med_v
        |      FROM s GROUP BY 1),
        |md AS (SELECT s.event_type, quantile_cont(abs(s.v - m.med_v), 0.5) AS mad_v
        |       FROM s JOIN m USING (event_type) GROUP BY 1),
        |j AS (SELECT s.event_type, m.n, m.med_v, md.mad_v,
        |        (s.v - m.med_v) / (CASE WHEN CAST(1.4826 AS DOUBLE) * md.mad_v <> 0.0
        |          THEN CAST(1.4826 AS DOUBLE) * md.mad_v END) AS z
        |      FROM s JOIN m USING (event_type) JOIN md USING (event_type))
        |SELECT event_type, max(n) AS n, max(med_v) AS med_v, max(mad_v) AS mad_v,
        |  CAST(sum(CASE WHEN abs(z) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  max(abs(z)) AS max_abs_z
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    "an1_zscore_outliers" -> Q(
      (s, d) => {
        val v = col("value").cast("decimal(18,6)")
        val ev = Queries.events(s, d)
        val m = ev.groupBy("event_type").agg(
          count(lit(1)).cast("long").as("n"),
          sum(v).as("sv"), sum(v * v).as("svv"))
        val nD = col("n").cast("double")
        val mean = col("sv").cast("double") / nD
        val vr = (col("svv").cast("double") -
          col("sv").cast("double") * col("sv").cast("double") / nD) / (nD - 1.0)
        val stats = m.select(col("event_type"), col("n"),
          mean.as("mean_v"), sqrt(vr).as("std_v"))
        ev.join(broadcast(stats), "event_type")
          .withColumn("z", (col("value") - col("mean_v")) / col("std_v"))
          .groupBy("event_type")
          .agg(first(col("n")).as("n"),
            first(col("mean_v")).as("mean_v"),
            first(col("std_v")).as("std_v"),
            sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_outliers"),
            max(abs(col("z"))).as("max_abs_z"))
          .orderBy("event_type")
      },
      Some("""WITH m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(value AS DECIMAL(18,6))) AS sv,
        |    sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS svv
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT event_type, n,
        |    CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
        |    sqrt((CAST(svv AS DOUBLE)
        |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0)) AS std_v
        |  FROM m)
        |SELECT e.event_type, any_value(st.n) AS n,
        |  any_value(st.mean_v) AS mean_v, any_value(st.std_v) AS std_v,
        |  CAST(sum(CASE WHEN abs((e.value - st.mean_v) / st.std_v) > 3.0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  max(abs((e.value - st.mean_v) / st.std_v)) AS max_abs_z
        |FROM events e JOIN st USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    // Schema evolution: two parquet batches with different schemas
    // (a column added mid-stream) land in one directory; a
    // mergeSchema read unifies them, old rows surfacing the new column
    // as null — the add-a-column lake migration every long-lived table
    // goes through. The oracle recomputes the expected unified rows
    // from the source table.
    "sc1_schema_evolution" -> Q(
      (s, d) => {
        val dir = Queries.scratch("sc1_lake")
        val o = s.read.parquet(s"$d/orders.parquet")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("append").parquet(dir)
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .write.mode("append").parquet(dir)
        s.read.option("mergeSchema", "true").parquet(dir)
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus ELSE NULL END
        |    AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- splits / index build ----------------------------------------

    // Deterministic md5-coin train/val/test split — narrow map, zero
    // shuffle; documents never migrate between splits as the corpus
    // grows (eval-contamination safety).
    "sp1_hash_split" -> Q(
      (s, d) => Curate.hashSplit(docs(s, d), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .select("doc_id", "split").orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT))),
        |    (a, x) -> a * 16 + x) AS DOUBLE) / CAST(4294967296 AS DOUBLE) AS u
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)),

    // Per-label embedding centroids + within-cluster inertia: the
    // clustering-evaluation math (and one k-means E-step) fully under
    // the cross-engine gate — posexplode → (label, dim) combinable
    // sums, broadcast centroid re-join, narrow zip_with inertia.
    "cl1_label_centroids" -> Q(
      (s, d) => Similarity.labelCentroids(embs(s, d))
        .select(col("label"), col("n"), col("inertia"),
          col("cvec")(0).as("c0"), col("cvec")(1).as("c1"),
          col("cvec")(2).as("c2"), col("cvec")(3).as("c3"))
        .orderBy("label"),
      Some("""WITH d AS (SELECT label,
        |    unnest(range(1, len(embedding) + 1)) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |c AS (SELECT label, pos, sum(x) / count(*) AS cv FROM d GROUP BY 1, 2),
        |cent AS (SELECT label, list(cv ORDER BY pos) AS cvec FROM c GROUP BY label),
        |i AS (SELECT e.label,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |      k -> (CAST(e.embedding[k] AS DOUBLE) - cvec[k])
        |         * (CAST(e.embedding[k] AS DOUBLE) - cvec[k])))) AS inertia
        |  FROM embeddings e JOIN cent USING (label) GROUP BY e.label)
        |SELECT i.label, n, inertia,
        |  cvec[1] AS c0, cvec[2] AS c1, cvec[3] AS c2, cvec[4] AS c3
        |FROM i JOIN cent USING (label) ORDER BY label""".stripMargin)),

    // Fixed-iteration PageRank over the event handoff graph (src user's
    // event immediately followed by dst user's in the same event_type
    // stream). Iterative (node, double) exchanges over a once-shuffled
    // static edge partitioning; the oracle unrolls all 8 iterations as
    // chained CTEs. Teleport + dangling-mass redistribution included.
    "pg1_pagerank" -> Q(
      (s, d) => Graph.pageRank(
          Graph.handoffEdges(Queries.events(s, d),
            streamCol = "event_type", keyCol = "user_id",
            tsCol = "ts", tieCol = "event_id"),
          iterations = PageRankIters)
        .select(col("v").as("user_id"), col("pr")).orderBy("user_id"),
      Some(PageRankOracle)),

    // MMD1: kernel two-sample test (Gretton '12 MMD^2_u, RBF + median
    // heuristic) between the even/odd-label embedding halves — the
    // multivariate distribution-equality test ks1/emd1 can't express;
    // md5 reassignment permutations for the p-value.
    "mmd1_kernel_two_sample" -> Q(
      (s, d) => graft.ops.Pca.mmdTest(embs(s, d),
        pmod(col("label"), lit(2)) === 0),
      Some(OracleGen.mmd1Sql())),

    // OOD1: Mahalanobis out-of-distribution queue (Lee et al. '18,
    // diagonal form) — min class-conditional Mahalanobis distance
    // under the gnb1 Gaussians; the variance-aware quarantine list
    // beside eo1's centroid-cosine outliers.
    "ood1_mahalanobis" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Classify.mahalanobisOod(e, Classify.gaussianNbTrain(e))
      },
      Some(OracleGen.ood1Sql())),

    // CONS1: near-dup label consistency — dd3p's portable MinHash
    // pairs joined to both sides' language labels; conflicting-label
    // near-dups are langID errors, translations, or annotation noise
    // (the dedup x labeling QA cross-check).
    "cons1_neardup_label_consistency" -> Q(
      (s, d) => {
        val dd0 = docs(s, d)
        val pairs = Dedup.minhashLshPairsPortable(par(dd0), threshold = 0.5)
          .select("d1", "d2")
        pairs
          .join(dd0.select(col("doc_id").as("d1"), col("lang").as("la")), "d1")
          .join(dd0.select(col("doc_id").as("d2"), col("lang").as("lb")), "d2")
          .select(least(col("la"), col("lb")).as("lang_a"),
            greatest(col("la"), col("lb")).as("lang_b"))
          .groupBy("lang_a", "lang_b")
          .agg(count(lit(1)).cast("long").as("n_pairs"))
          .withColumn("is_conflict",
            (col("lang_a") =!= col("lang_b")).cast("int"))
          .orderBy("lang_a", "lang_b")
      },
      Some(OracleGen.cons1Sql(0.5))),

    // ANN8: the recall-vs-nprobe tuning sweep — the operating curve an
    // IVF owner reads to set nprobe (recall@k vs probed cells at the
    // fixed coarse quantizer), one row per width against exact truth.
    "ann8_nprobe_sweep" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val q = e.filter(col("vec_id") < 8)
        val truth = graft.ops.Similarity.bruteForceTopK(e, q, k = 5)
          .select(col("q_id"), col("n_id"))
        Seq(1, 2, 4, 8).map { p =>
          val approx = graft.ops.Similarity.ivfTopK(e, q, k = 5,
              centroids = graft.ops.Similarity.fixedCentroids(16, 64),
              nProbe = p)
            .select(col("q_id"), col("n_id")).withColumn("__hit", lit(1))
          truth.join(approx, Seq("q_id", "n_id"), "left")
            .agg(count(lit(1)).cast("long").as("n_truth"),
              count(col("__hit")).cast("long").as("n_hits"))
            .select(lit(p.toLong).as("nprobe"), col("n_truth"), col("n_hits"),
              expr("(n_hits * 1000000L) div n_truth").as("recall_micro"))
        }.reduce(_ unionByName _).orderBy("nprobe")
      },
      Some(OracleGen.ann8Sql())),

    // CP2: Mondrian (group-conditional) conformal over language slices
    // — per-group quantile thresholds so the coverage guarantee holds
    // WITHIN every slice (the fairness-aware refinement of cp1's
    // marginal gate; a marginal tau can undercover a minority slice).
    "cp2_mondrian_conformal" -> Q(
      (s, d) => {
        val q = Text.withQuality(docs(s, d))
          .select(col("doc_id"), col("lang"), col("quality_score"))
        graft.ops.Stats.mondrianConformal(
            q.filter(col("doc_id") % 2 === 0), q.filter(col("doc_id") % 2 === 1),
            "lang", "quality_score", "doc_id")
          .orderBy("grp")
      },
      Some("""WITH q AS (SELECT doc_id, lang,
        |    CAST(floor(least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2)
        |      * 1e6 + 0.5) AS BIGINT) AS s
        |  FROM documents),
        |c AS (SELECT lang AS g, s, doc_id AS tb FROM q WHERE doc_id % 2 = 0),
        |ev AS (SELECT lang AS g, s FROM q WHERE doc_id % 2 = 1),
        |nk AS (SELECT g, CAST(count(*) AS BIGINT) AS n_cal,
        |    greatest(1, ((count(*) + 1) * 100000) // 1000000) AS k
        |  FROM c GROUP BY 1),
        |rk AS (SELECT g, s, CAST(row_number() OVER (
        |    PARTITION BY g ORDER BY s, tb) AS BIGINT) AS idx FROM c),
        |tau AS (SELECT rk.g, nk.n_cal, nk.k, rk.s AS tau_micro
        |  FROM rk JOIN nk ON nk.g = rk.g WHERE rk.idx = nk.k)
        |SELECT tau.g AS grp, tau.n_cal, CAST(tau.k AS BIGINT) AS k,
        |  tau.tau_micro,
        |  CAST(count(*) AS BIGINT) AS n_eval,
        |  CAST(sum(CASE WHEN ev.s >= tau.tau_micro THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  (CAST(sum(CASE WHEN ev.s >= tau.tau_micro THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS coverage_micro
        |FROM ev JOIN tau ON tau.g = ev.g
        |GROUP BY 1, 2, 3, 4 ORDER BY grp""".stripMargin)),

    // NF41: NF4 4-bit nonuniform quantization quality (QLoRA levels) —
    // per-label reconstruction MSE + cosine retention; the
    // decide-before-you-ship numbers for a 4-bit store beside vq1's
    // int8 and cka1's geometry check.
    "nf41_nf4_report" -> Q(
      (s, d) => graft.ops.Similarity.nf4QuantReport(embs(s, d))
        .orderBy("label"),
      Some(OracleGen.nf41Sql())),

    // WEAT1: embedding-association bias test (Caliskan '17) — targets
    // = labels 0/1, attributes = labels 2/3; exact integer association
    // sums, md5 sign-flip permutation p, effect size d. The encoder
    // bias audit before an embedding ships.
    "weat1_embedding_bias" -> Q(
      (s, d) => graft.ops.Pca.weatTest(embs(s, d), 0L, 1L, 2L, 3L),
      Some(OracleGen.weat1Sql())),

    // UNIF1: alignment & uniformity (Wang & Isola '20) — positive
    // pairs from consecutive same-label members, random pairs from
    // the md5 total order; the two-number contrastive-quality readout.
    "unif1_alignment_uniformity" -> Q(
      (s, d) => graft.ops.Pca.alignmentUniformity(embs(s, d)),
      Some(OracleGen.unif1Sql())),

    // DTW1: banded dynamic-time-warping distance between every pair
    // of per-event-type daily series (Sakoe-Chiba corridor, all-
    // integer DP) with the Euclidean L1 companion — the alignment-
    // tolerant series similarity Euclidean distance can't see.
    "dtw1_dtw_pairs" -> Q(
      (s, d) => graft.ops.TimeSeries.dtwPairs(Queries.events(s, d),
          "event_type", "ts").orderBy("ka", "kb"),
      Some(OracleGen.dtw1Sql())),

    // IRT1: Rasch 1PL item-response fit over the event log — subjects
    // = users, items = event types, success = value >= 60; integer
    // gradient rounds, difficulties centered each round. The
    // benchmark-curation readout (difficulties comparable across
    // subject pools) beside raw accuracy.
    "irt1_rasch_fit" -> Q(
      (s, d) => Classify.raschFit(
          Queries.events(s, d).select(col("user_id"), col("event_type"),
            lit(1L).as("n"), (col("value") >= 60.0).cast("long").as("k")),
          "user_id", "event_type", "n", "k")
        .orderBy("item"),
      Some(OracleGen.irt1Sql())),

    // SPEC1: spectral bipartition (Fiedler / normalized cut) of the
    // undirected handoff graph — integer power iteration with exact
    // deflation of the trivial eigenvector, sign pinned at the
    // smallest node; cut size + conductance. Clusters from
    // CONNECTIVITY beside the embedding family's geometry.
    "spec1_spectral_bipartition" -> Q(
      (s, d) => Graph.spectralBipartition(
          Graph.handoffEdges(Queries.events(s, d),
            streamCol = "event_type", keyCol = "user_id",
            tsCol = "ts", tieCol = "event_id")),
      Some(OracleGen.spec1Sql())),

    // PPR1: personalized PageRank — teleport and dangling mass restart
    // on the seed users (v % 50 = 0, bfs1's rule): random-walk-with-
    // restart proximity FROM a trusted set. Same once-shuffled edge
    // machinery and unrolled oracle as pg1.
    "ppr1_personalized_pagerank" -> Q(
      (s, d) => Graph.personalizedPageRank(
          Graph.handoffEdges(Queries.events(s, d),
            streamCol = "event_type", keyCol = "user_id",
            tsCol = "ts", tieCol = "event_id"),
          seeds = Queries.events(s, d)
            .select(col("user_id").cast("long").as("v"))
            .filter(col("v") % 50 === 0).distinct(),
          iterations = PprIters)
        .select(col("v").as("user_id"), col("pr")).orderBy("user_id"),
      Some(PprOracle)),

    // RG1: ROUGE-1/2 between adjacent doc pairs (even = reference,
    // odd = candidate) — clipped multiset n-gram overlap, exact
    // integer micro P/R/F1. The generation-eval staple beside ev1's
    // retrieval metrics and pk1's pass@k.
    "rg1_rouge_n" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        val ref = dd.filter(col("doc_id") % 2 === 0)
          .select(expr("doc_id div 2").as("pid"), col("text").as("ref_text"))
        val cand = dd.filter(col("doc_id") % 2 === 1)
          .select(expr("(doc_id - 1) div 2").as("pid"),
            col("text").as("cand_text"))
        graft.ops.Text.rougeN(ref.join(cand, "pid"),
            "ref_text", "cand_text", "pid")
          .orderBy("n", "pid")
      },
      Some(rg1Sql())),

    // BL1: sentence-level BLEU over the rg1 document pairing — clipped
    // n-gram precisions (n=1..4), brevity penalty, unsmoothed (zero
    // precision => BLEU 0, the filtering-correct choice). All counts
    // exact longs; the one BP·geomean double is fixed-order and
    // nano-quantized.
    "bl1_bleu" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        val ref = dd.filter(col("doc_id") % 2 === 0)
          .select(expr("doc_id div 2").as("pid"), col("text").as("ref_text"))
        val cand = dd.filter(col("doc_id") % 2 === 1)
          .select(expr("(doc_id - 1) div 2").as("pid"),
            col("text").as("cand_text"))
        graft.ops.Text.bleu(ref.join(cand, "pid"),
            "ref_text", "cand_text", "pid")
          .orderBy("pid")
      },
      Some(bl1Sql())),

    // CHF1: chrF (character n-gram F-2) over the same pairing — the
    // tokenization-free MT-quality score; with beta^2 = 4 every column
    // reduces to exact integer division (F = 5m/(4r + c)).
    "chf1_chrf" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        val ref = dd.filter(col("doc_id") % 2 === 0)
          .select(expr("doc_id div 2").as("pid"), col("text").as("ref_text"))
        val cand = dd.filter(col("doc_id") % 2 === 1)
          .select(expr("(doc_id - 1) div 2").as("pid"),
            col("text").as("cand_text"))
        graft.ops.Text.chrF(ref.join(cand, "pid"),
            "ref_text", "cand_text", "pid")
          .orderBy("n", "pid")
      },
      Some(chf1Sql())),

    // PB1: Koehn's paired bootstrap — is the intact candidate system
    // significantly better than a head-truncated one under character-
    // unigram F-2? Shared Poisson weights pair the items; every
    // replicate verdict is an exact integer sign.
    "pb1_paired_bootstrap" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        val ref = dd.filter(col("doc_id") % 2 === 0)
          .select(expr("doc_id div 2").as("pid"), col("text").as("ref_text"))
        val cand = dd.filter(col("doc_id") % 2 === 1)
          .select(expr("(doc_id - 1) div 2").as("pid"),
            col("text").as("cand_text"))
        val degraded = cand.select(col("pid"), expr(
          """array_join(slice(filter(split(lower(cand_text), ' '),
            |  x -> length(x) > 0), 3,
            |  greatest(size(filter(split(lower(cand_text), ' '),
            |    x2 -> length(x2) > 0)) - 2, 0)), ' ')""".stripMargin)
          .as("cand_text"))
        val fa = Text.chrF(ref.join(cand, "pid"),
            "ref_text", "cand_text", "pid", maxN = 1)
          .select(col("pid"),
            (col("chrf_micro").cast("double") / lit(1e6)).as("ma"))
        val fb = Text.chrF(ref.join(degraded, "pid"),
            "ref_text", "cand_text", "pid", maxN = 1)
          .select(col("pid"),
            (col("chrf_micro").cast("double") / lit(1e6)).as("mb"))
        graft.ops.Stats.pairedBootstrap(fa.join(fb, "pid"), "ma", "mb", "pid")
      },
      Some(OracleGen.pb1Sql(32))),

    // RE1: Renyi-2 entropy efficiency of the corpus token distribution
    // (Zouhar et al. ICML'23) — the tokenizer-quality readout; the
    // collision sum is an exact rational of count sums, Shannon rides
    // the pico-quantized term discipline.
    "re1_renyi_efficiency" -> Q(
      (s, d) => graft.ops.Text.renyiEfficiency(docs(s, d)),
      Some("""WITH tk AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |    x -> length(x) > 0)) AS t FROM documents),
        |c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t_tokens,
        |    CAST(count(*) AS BIGINT) AS vocab FROM c),
        |s AS (SELECT t_tokens, vocab,
        |    sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS s2,
        |    sum(CAST(CAST(floor(-(CAST(c AS DOUBLE) / CAST(t_tokens AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE) / CAST(t_tokens AS DOUBLE)) * 1e12 + 0.5)
        |      AS BIGINT) AS DECIMAL(38,0))) AS sh_sum
        |  FROM c, tot GROUP BY 1, 2)
        |SELECT t_tokens AS n_tokens, vocab,
        |  CAST(floor((0.0 - ln(CAST(s2 AS DOUBLE)
        |    / (CAST(t_tokens AS DOUBLE) * CAST(t_tokens AS DOUBLE))))
        |    * 1e9 + 0.5) AS BIGINT) AS h2_nano,
        |  CAST(floor(CAST(sh_sum AS DOUBLE) / 1e12 * 1e9 + 0.5) AS BIGINT)
        |    AS h_shannon_nano,
        |  CASE WHEN vocab > 1 THEN
        |    CAST(floor((0.0 - ln(CAST(s2 AS DOUBLE)
        |      / (CAST(t_tokens AS DOUBLE) * CAST(t_tokens AS DOUBLE))))
        |      / ln(CAST(vocab AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |  ELSE 0 END AS eff2_nano,
        |  CASE WHEN vocab > 1 THEN
        |    CAST(floor(CAST(sh_sum AS DOUBLE) / 1e12 / ln(CAST(vocab AS DOUBLE))
        |      * 1e9 + 0.5) AS BIGINT)
        |  ELSE 0 END AS eff_shannon_nano
        |FROM s""".stripMargin)),

    // KR1: Krippendorff's nominal alpha over each user's event-type
    // "ratings" — the missing-data-native agreement coefficient
    // (items = users, one rating per event; single-rating users drop
    // as unpairable, exercised by construction).
    "kr1_krippendorff_alpha" -> Q(
      (s, d) => graft.ops.Stats.krippendorffAlpha(
          Queries.events(s, d), "user_id", "event_type"),
      Some("""WITH cells AS (SELECT CAST(user_id AS VARCHAR) AS u, event_type AS c,
        |    CAST(count(*) AS BIGINT) AS n_uc FROM events GROUP BY 1, 2),
        |items AS (SELECT u, CAST(sum(n_uc) AS BIGINT) AS m_u,
        |    CAST(sum(n_uc * n_uc) AS BIGINT) AS sq_u FROM cells GROUP BY 1),
        |kept AS (SELECT u, m_u, (m_u * m_u - sq_u) AS d_u,
        |    ((m_u * m_u - sq_u) * 1000000000000) // (m_u - 1) AS term_pico
        |  FROM items WHERE m_u >= 2),
        |dropped AS (SELECT CAST(count(*) AS BIGINT) AS n_items_dropped
        |  FROM items WHERE m_u < 2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_items_used,
        |    CAST(sum(m_u) AS BIGINT) AS n_values,
        |    sum(CAST(term_pico AS DECIMAL(38,0))) AS do_pico FROM kept),
        |cm AS (SELECT cells.c, CAST(sum(n_uc) AS BIGINT) AS n_c FROM cells
        |  JOIN kept USING (u) GROUP BY 1),
        |de AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
        |    sum(CAST(n_c AS DECIMAL(38,0))
        |      * CAST(tot.n_values - n_c AS DECIMAL(38,0))) AS de_raw
        |  FROM cm, tot GROUP BY tot.n_values)
        |SELECT n_items_used, n_items_dropped, n_values, n_categories,
        |  CASE WHEN de_raw = 0 THEN 1000000000
        |  ELSE CAST(floor((1.0 - (CAST(n_values AS DOUBLE) - 1.0)
        |    * (CAST(do_pico AS DOUBLE) / 1e12)
        |    / CAST(de_raw AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |  END AS alpha_nano
        |FROM tot, dropped, de""".stripMargin)),

    // LD1: l-diversity + t-closeness per nation over the customer
    // market segment — the ka1/dp1 privacy family's distributional
    // refinements; entropy terms pico-quantized, TV distance exact
    // integer over the full class x value grid.
    "ld1_l_diversity" -> Q(
      (s, d) => graft.ops.Curate.lDiversityReport(
          s.read.parquet(s"$d/customer.parquet"),
          Seq("c_nationkey"), "c_mktsegment")
        .orderBy("c_nationkey"),
      Some("""WITH cells AS (SELECT c_nationkey, c_mktsegment AS s,
        |    CAST(count(*) AS BIGINT) AS n_gc FROM customer GROUP BY 1, 2),
        |g AS (SELECT c_nationkey, CAST(sum(n_gc) AS BIGINT) AS n_g,
        |    CAST(count(*) AS BIGINT) AS l_distinct FROM cells GROUP BY 1),
        |gl AS (SELECT s, CAST(sum(n_gc) AS BIGINT) AS n_c FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_c) AS BIGINT) AS n_total FROM gl),
        |grid AS (SELECT g.c_nationkey, g.n_g, g.l_distinct, gl.s, gl.n_c,
        |    tt.n_total, coalesce(cells.n_gc, 0) AS n_gc
        |  FROM g CROSS JOIN gl CROSS JOIN tt
        |  LEFT JOIN cells ON cells.c_nationkey = g.c_nationkey AND cells.s = gl.s),
        |per AS (SELECT c_nationkey, n_g, l_distinct, n_total,
        |    sum(abs(CAST(n_gc AS HUGEINT) * n_total
        |      - CAST(n_c AS HUGEINT) * n_g)) AS tv_sum,
        |    sum(CAST(CASE WHEN n_gc > 0 THEN
        |      CAST(floor(-(CAST(n_gc AS DOUBLE) / CAST(n_g AS DOUBLE))
        |        * ln(CAST(n_gc AS DOUBLE) / CAST(n_g AS DOUBLE)) * 1e12 + 0.5)
        |        AS BIGINT) ELSE 0 END AS DECIMAL(38,0))) AS h_sum
        |  FROM grid GROUP BY 1, 2, 3, 4)
        |SELECT c_nationkey, n_g, l_distinct,
        |  CAST(floor(exp(CAST(h_sum AS DOUBLE) / 1e12) * 1e6 + 0.5) AS BIGINT)
        |    AS entropy_l_micro,
        |  CAST((tv_sum * 1000000) // (CAST(2 AS HUGEINT) * n_g * n_total)
        |    AS BIGINT) AS t_tv_micro
        |FROM per ORDER BY c_nationkey""".stripMargin)),

    // CI1: ColBERT-style MaxSim late-interaction top-k — each vector
    // treated as 4 sub-vector "tokens", score = sum over query tokens
    // of max doc-token cosine; the whole score is one in-row fixed-
    // order fold (bit-identical engines), micro display.
    "ci1_maxsim_topk" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.maxSimTopK(e, e.filter(col("vec_id") < 8), k = 5)
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, embedding,
        |    list_transform(range(0, 4), nn ->
        |      sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, 17), t4 ->
        |          CAST(embedding[nn * 16 + t4] AS DOUBLE)
        |            * CAST(embedding[nn * 16 + t4] AS DOUBLE))),
        |        (a5, x5) -> a5 + x5))) AS norms
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_vec, norms AS q_norms
        |  FROM e WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q_id, e.vec_id AS n_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(0, 4), i ->
        |        list_max(list_transform(range(0, 4), j ->
        |          CASE WHEN q_norms[CAST(i + 1 AS INTEGER)]
        |              * e.norms[CAST(j + 1 AS INTEGER)] = CAST(0.0 AS DOUBLE)
        |          THEN CAST(0.0 AS DOUBLE)
        |          ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |            list_transform(range(1, 17), t ->
        |              CAST(q_vec[i * 16 + t] AS DOUBLE)
        |                * CAST(e.embedding[j * 16 + t] AS DOUBLE))),
        |            (a2, x2) -> a2 + x2)
        |          / (q_norms[CAST(i + 1 AS INTEGER)]
        |           * e.norms[CAST(j + 1 AS INTEGER)]) END)))),
        |      (acc, x) -> acc + x) AS sim
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q_id),
        |ranked AS (SELECT q_id, n_id, sim,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM pairs)
        |SELECT q_id, n_id, rank,
        |  CAST(floor(sim * 1e6 + 0.5) AS BIGINT) AS maxsim_micro
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // CI2: LSH-prefiltered MaxSim — the ColBERT serving shape the ci1
    // scaladoc promises: ss3's SRP band candidates (ids only, Hamming≤2
    // query-side multi-probe) feed maxSimTopK as the scorer, so the
    // parts² late-interaction fold runs per CANDIDATE rather than per
    // (query × corpus) pair. Each row carries in_exact_topk — its
    // membership in ci1's full-scan exact top-k — so the gate hash
    // pins the prefilter's recall row by row (the ann1 discipline).
    "ci2_lsh_maxsim" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val q = e.filter(col("vec_id") < 8)
        val cand = Similarity.srpCandidates(e, q, nPlanes = 12, nTables = 8)
        val approx = Similarity.maxSimTopK(e, q, k = 5,
          candidates = Some(cand))
        val truth = Similarity.maxSimTopK(e, q, k = 5)
          .select(col("q_id"), col("n_id")).withColumn("__t", lit(1))
        approx.join(truth, Seq("q_id", "n_id"), "left")
          .select(col("q_id"), col("n_id"), col("rank"), col("maxsim_micro"),
            col("__t").isNotNull.as("in_exact_topk"))
          .orderBy("q_id", "rank")
      },
      Some(OracleGen.ci2Sql())),

    // ANN6: IVF cell-balance audit at the kg1/ss5 production cell
    // count — occupancy histogram + imbalance factor, the skew
    // diagnostic behind every nprobe bound.
    "ann6_cell_balance" -> Q(
      (s, d) => Similarity.cellBalanceReport(embs(s, d),
          Similarity.fixedCentroids(16, 64))
        .orderBy("cell"),
      Some(OracleGen.ann6Sql(16, 64))),

    // ANN7: incremental IVF maintenance — every fifth vector plays the
    // appended batch, assigned to the EXISTING fixed centroids (no
    // retrain, no index rewrite); the report is the retrain trigger:
    // per-cell occupancy growth + own-centroid cosine drift between
    // resident and appended members, exact-integer means. The missing
    // lifecycle piece between ss5's static index and continuous ingest
    // (ann5 streams epochs; this decides when re-training is due).
    "ann7_ivf_append" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Similarity.ivfAppendReport(
            e.filter(pmod(col("vec_id"), lit(5)) =!= 0),
            e.filter(pmod(col("vec_id"), lit(5)) === 0),
            Similarity.fixedCentroids(16, 64))
          .orderBy("cell")
      },
      Some(OracleGen.ann7Sql(16, 64, 5))),

    // SIL1: simplified silhouette of the fixed-codebook assignment —
    // the internal-validity readout for km1/IVF-style quantizers; one
    // narrow map pass, k-bounded output.
    "sil1_silhouette" -> Q(
      (s, d) => Similarity.silhouetteReport(embs(s, d),
          Similarity.fixedCentroids(8, 64))
        .orderBy("cluster"),
      Some(OracleGen.sil1Sql(8, 64))),

    // CV2: Cramér's V association matrix over (lang, length-bucket,
    // source) — the categorical companion of cr1; full-grid χ² with
    // micro-quantized terms.
    "cv2_cramers_v" -> Q(
      (s, d) => graft.ops.Stats.cramersV(
          docs(s, d).withColumn("len_bucket", expr("n_chars div 200")),
          Seq(("lang", col("lang")), ("len_bucket", col("len_bucket")),
            ("source", col("source"))))
        .orderBy("col_a", "col_b"),
      Some(OracleGen.cv2Sql(Seq(
        (("lang", "lang"), ("len_bucket", "n_chars // 200")),
        (("lang", "lang"), ("source", "source")),
        (("len_bucket", "n_chars // 200"), ("source", "source")))))),

    // PER1: DFT periodogram at 12 h / 24 h / 168 h candidate periods —
    // plan-time twiddle literals, n-scaled integer deviations per
    // residue class, exact-integer dominance pick.
    "per1_periodogram" -> Q(
      (s, d) => graft.ops.TimeSeries.periodogram(
          graft.ops.TimeSeries.denseCountSeries(
            Queries.events(s, d), "ts", "hour"),
          periods = Seq(12, 24, 168))
        .orderBy("period"),
      Some(OracleGen.per1Sql(Seq(12, 24, 168)))),

    // SAX1: SAX motif discovery over the hourly event series —
    // z-normalized {a,b,c} symbols at the Gaussian tercile breakpoints,
    // 4-symbol sliding words, top-10 recurring shapes.
    "sax1_motifs" -> Q(
      (s, d) => graft.ops.TimeSeries.saxMotifs(
          graft.ops.TimeSeries.denseCountSeries(
            Queries.events(s, d), "ts", "hour"),
          wordLen = 4, topK = 10)
        .orderBy("rank"),
      Some("""WITH c AS (SELECT date_trunc('hour', ts) AS b,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
        |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS b FROM bounds),
        |s AS MATERIALIZED (SELECT sp.b, coalesce(c.x, 0) AS x FROM sp LEFT JOIN c USING (b)),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(CAST(x AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx FROM s),
        |zz AS MATERIALIZED (SELECT b, CASE
        |    WHEN (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
        |        - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |      < -0.4307272992954576 THEN 'a'
        |    WHEN (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
        |        - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |      < 0.4307272992954576 THEN 'b' ELSE 'c' END AS s0
        |  FROM s, m),
        |ld AS MATERIALIZED (SELECT s0,
        |    lead(s0, 1) OVER (ORDER BY b) AS s1,
        |    lead(s0, 2) OVER (ORDER BY b) AS s2,
        |    lead(s0, 3) OVER (ORDER BY b) AS s3 FROM zz),
        |wd AS MATERIALIZED (SELECT s0 || s1 || s2 || s3 AS word,
        |    CAST(count(*) AS BIGINT) AS cnt FROM ld
        |  WHERE s1 IS NOT NULL AND s2 IS NOT NULL AND s3 IS NOT NULL GROUP BY 1),
        |nw AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_windows FROM wd),
        |tp AS (SELECT word, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) AS BIGINT) AS rank FROM wd)
        |SELECT rank, word, cnt, nw.n_windows FROM tp, nw
        |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // HILL1: Hill tail-index of the token frequency distribution —
    // top-100 order statistics, pico-floored ln terms, one display
    // division; the ML companion of zl1's regression slope.
    "hill1_tail_index" -> Q(
      (s, d) => Text.hillTailIndex(docs(s, d), k = 100),
      Some("""WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |f AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks WHERE len(tok) > 0 GROUP BY 1),
        |r AS MATERIALIZED (SELECT cnt,
        |    row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rn FROM f),
        |tl AS (SELECT cnt AS x_tail FROM r WHERE rn = 101),
        |t AS MATERIALIZED (SELECT
        |    CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(x_tail AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS l_pico,
        |    x_tail
        |  FROM r, tl WHERE rn <= 100)
        |SELECT CAST(count(*) AS BIGINT) AS k, x_tail,
        |  round(CAST(sum(CAST(l_pico AS DECIMAL(38,0))) AS DOUBLE) / 1e12, 9) AS sum_log,
        |  round(CAST(count(*) AS DOUBLE)
        |    / (CAST(sum(CAST(l_pico AS DECIMAL(38,0))) AS DOUBLE) / 1e12), 6) AS alpha
        |FROM t GROUP BY x_tail""".stripMargin)),

    // FNR1: in-batch false-negative rate of the near-dup partition —
    // the contrastive-training collision audit, off the SAME shared
    // mutual-kNN CC memo as kg1/gr3 (no recompute).
    "fnr1_inbatch_negatives" -> Q(
      (s, d) => {
        val (_, cc) = mutualKnnCc(s, d)
        val sz = cc.groupBy("cluster").agg(count(lit(1)).cast("long").as("c"))
        sz.agg(sum("c").cast("long").as("n"),
            count(lit(1)).cast("long").as("n_clusters"),
            sum(expr("c * (c - 1L)")).cast("long").as("dp2"))
          .select(col("n").as("n_vectors"), col("n_clusters"),
            expr("dp2 div 2").as("n_dup_pairs"),
            round(col("dp2").cast("double") /
              (col("n").cast("double") * (col("n") - 1L).cast("double")), 9)
              .as("p_collision"),
            round(lit(1023.0) * (col("dp2").cast("double") /
              (col("n").cast("double") * (col("n") - 1L).cast("double"))), 6)
              .as("exp_fn_batch1024"))
      },
      Some(OracleGen.fnr1Sql(1024))),

    // FH1: feature-hashing collision audit — md5-prefix bucket mod 2^14
    // over the vocabulary; term- and mass-level collision shares.
    "fh1_feature_hashing" -> Q(
      (s, d) => Text.featureHashReport(docs(s, d), buckets = 16384),
      Some("""WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |terms AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks WHERE len(tok) > 0 GROUP BY 1),
        |tb AS MATERIALIZED (SELECT cnt,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS BIGINT) % 16384 AS bucket
        |  FROM terms),
        |pb AS MATERIALIZED (SELECT bucket, CAST(count(*) AS BIGINT) AS n_terms,
        |    CAST(sum(cnt) AS BIGINT) AS mass FROM tb GROUP BY 1),
        |m AS (SELECT CAST(sum(n_terms) AS BIGINT) AS n_terms,
        |    CAST(count(*) AS BIGINT) AS buckets_used,
        |    CAST(sum(CASE WHEN n_terms > 1 THEN n_terms ELSE 0 END) AS BIGINT) AS colliding_terms,
        |    CAST(sum(CASE WHEN n_terms > 1 THEN mass ELSE 0 END) AS BIGINT) AS colliding_mass,
        |    CAST(sum(mass) AS BIGINT) AS total_mass,
        |    CAST(max(n_terms) AS BIGINT) AS max_bucket_terms FROM pb)
        |SELECT n_terms, CAST(16384 AS BIGINT) AS n_buckets, buckets_used,
        |  colliding_terms, max_bucket_terms,
        |  round(CAST(colliding_terms AS DOUBLE) / CAST(n_terms AS DOUBLE), 9) AS term_collision_rate,
        |  round(CAST(colliding_mass AS DOUBLE) / CAST(total_mass AS DOUBLE), 9) AS mass_collision_share
        |FROM m""".stripMargin)),

    // JC1: AGMS tug-of-war join-size estimate (click ⋈ purchase on
    // user) — two one-pass ±1 sketches, exact-integer products,
    // frequency-vector truth + relative error as the audit.
    "jc1_join_cardinality" -> Q(
      (s, d) => {
        val ev = Queries.events(s, d)
        graft.ops.Joins.agmsJoinCardinality(
          ev.filter(col("event_type") === "click"), "user_id",
          ev.filter(col("event_type") === "purchase"), "user_id",
          counters = 32)
      },
      Some(OracleGen.jc1Sql(32))),

    // LIFT1: cumulative-gains / lift deciles of the en-stopword scorer
    // — the top-k-budget readout beside auc1's threshold-free AUC.
    "lift1_gains" -> Q(
      (s, d) => Classify.gainsLiftReport(
          Text.withLangId(docs(s, d))
            .select(col("score_en"), col("doc_id"),
              (col("lang") === "en").as("is_en")),
          "score_en", "is_en", "doc_id", bins = 10)
        .orderBy("decile"),
      Some("""WITH t AS (SELECT
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> list_contains(['the','and','of','is','to'], x))) AS BIGINT) AS s,
        |    doc_id AS id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS MATERIALIZED (SELECT y,
        |    ntile(10) OVER (ORDER BY s DESC, id ASC) AS decile FROM t),
        |p AS MATERIALIZED (SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY 1),
        |c AS (SELECT decile, n, n_pos,
        |    CAST(sum(n) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |    CAST(sum(n_pos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
        |  FROM p),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(n_pos) AS BIGINT) AS tp FROM p)
        |SELECT CAST(decile AS BIGINT) AS decile, n, n_pos, cum_n, cum_pos,
        |  round(CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE), 9) AS gain,
        |  round(CAST(cum_pos AS DOUBLE) * CAST(tn AS DOUBLE)
        |    / (CAST(cum_n AS DOUBLE) * CAST(tp AS DOUBLE)), 9) AS lift
        |FROM c, tt ORDER BY decile""".stripMargin)),

    // LCC1: local-clustering-coefficient histogram of the handoff
    // graph — per-node triangle charge off gr2's oriented closure,
    // integer pico lcc, 10-bucket rollup + mean.
    "lcc1_clustering_histogram" -> Q(
      (s, d) => Graph.localClusteringHistogram(
          Graph.handoffEdges(Queries.events(s, d),
            streamCol = "event_type", keyCol = "user_id",
            tsCol = "ts", tieCol = "event_id"))
        .orderBy("bucket"),
      Some("""WITH ed AS (SELECT DISTINCT src, dst FROM (
        |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
        |           user_id AS dst FROM events)
        |  WHERE src IS NOT NULL AND src != dst),
        |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM ed),
        |deg AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |ori AS MATERIALIZED (SELECT
        |    CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND und.a < und.b)
        |      THEN und.a ELSE und.b END AS t,
        |    CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND und.a < und.b)
        |      THEN und.b ELSE und.a END AS h,
        |    CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND und.a < und.b)
        |      THEN dy.deg ELSE dx.deg END AS dh
        |  FROM und JOIN deg dx ON dx.v = und.a JOIN deg dy ON dy.v = und.b),
        |w AS (SELECT x.t AS c, x.h AS t, y.h AS h FROM ori x JOIN ori y
        |  ON x.t = y.t AND (x.dh < y.dh OR (x.dh = y.dh AND x.h < y.h))),
        |tr AS MATERIALIZED (SELECT w.c, w.t, w.h FROM w
        |  JOIN ori ON ori.t = w.t AND ori.h = w.h),
        |pn AS (SELECT v, CAST(count(*) AS BIGINT) AS tri FROM (
        |    SELECT c AS v FROM tr UNION ALL SELECT t FROM tr
        |    UNION ALL SELECT h FROM tr) GROUP BY 1),
        |l AS MATERIALIZED (SELECT deg.v, deg.deg, coalesce(pn.tri, 0) AS tri,
        |    (2 * coalesce(pn.tri, 0) * 1000000000000) // (deg.deg * (deg.deg - 1)) AS lcc_pico
        |  FROM deg LEFT JOIN pn ON pn.v = deg.v WHERE deg.deg >= 2),
        |l2 AS MATERIALIZED (SELECT *, least(lcc_pico // 100000000000, 9) AS bucket FROM l),
        |sm AS (SELECT CAST(count(*) AS BIGINT) AS n_defined,
        |    round(CAST(sum(CAST(lcc_pico AS DECIMAL(38,0))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) / 1e12, 9) AS mean_lcc FROM l2)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_nodes,
        |  sm.n_defined, sm.mean_lcc
        |FROM l2, sm GROUP BY 1, 3, 4 ORDER BY bucket""".stripMargin)),

    // UTF1: UTF-8 byte-budget census per language — bytes/char and
    // multibyte share decide tokenizer byte-level budgets and storage
    // planning for multilingual corpora. Pure integer counting.
    "utf1_byte_census" -> Q(
      (s, d) => docs(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(length(col("text")).cast("long")).cast("long").as("n_chars"),
          sum(octet_length(col("text")).cast("long")).cast("long").as("n_bytes"))
        .select(col("lang"), col("n_docs"), col("n_chars"), col("n_bytes"),
          round(col("n_bytes").cast("double") / col("n_chars").cast("double"), 9)
            .as("bytes_per_char"),
          round((col("n_bytes") - col("n_chars")).cast("double") /
            col("n_bytes").cast("double"), 9).as("multibyte_share"))
        .orderBy("lang"),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
        |  round(CAST(sum(strlen(text)) AS DOUBLE) / CAST(sum(length(text)) AS DOUBLE), 9) AS bytes_per_char,
        |  round(CAST(sum(strlen(text)) - sum(length(text)) AS DOUBLE)
        |    / CAST(sum(strlen(text)) AS DOUBLE), 9) AS multibyte_share
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // RI1: referential-integrity audit over the star schema's three FK
    // edges — orphaned children, null FKs, childless parents; dq1
    // checks values, this checks relationships.
    "ri1_referential_integrity" -> Q(
      (s, d) => {
        val li2 = li(s, d); val ord = s.read.parquet(s"$d/orders.parquet")
        val cust = s.read.parquet(s"$d/customer.parquet")
        val supp = s.read.parquet(s"$d/supplier.parquet")
        Seq(
          graft.ops.Profile.referentialIntegrity(
            li2, "l_orderkey", ord, "o_orderkey", "lineitem->orders"),
          graft.ops.Profile.referentialIntegrity(
            ord, "o_custkey", cust, "c_custkey", "orders->customer"),
          graft.ops.Profile.referentialIntegrity(
            li2, "l_suppkey", supp, "s_suppkey", "lineitem->supplier"))
          .reduce(_ unionByName _).orderBy("relation")
      },
      Some(Seq(
        ("lineitem->orders", "l_orderkey", "lineitem", "o_orderkey", "orders"),
        ("orders->customer", "o_custkey", "orders", "c_custkey", "customer"),
        ("lineitem->supplier", "l_suppkey", "lineitem", "s_suppkey", "supplier"))
        .map { case (rel, ckc, ct, pkc, pt) =>
          s"""(WITH ck AS (SELECT $ckc AS k FROM $ct),
             |pk AS (SELECT DISTINCT $pkc AS k FROM $pt),
             |ok AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM ck
             |  WHERE k IS NOT NULL GROUP BY 1),
             |orph AS (SELECT ok.k, ok.c FROM ok LEFT JOIN pk ON pk.k = ok.k
             |  WHERE pk.k IS NULL)
             |SELECT '$rel' AS relation,
             |  CAST((SELECT count(*) FROM ck) AS BIGINT) AS n_child,
             |  CAST((SELECT count(*) FROM ck WHERE k IS NULL) AS BIGINT) AS n_null_fk,
             |  CAST((SELECT coalesce(sum(c), 0) FROM orph) AS BIGINT) AS n_orphan_rows,
             |  CAST((SELECT count(*) FROM orph) AS BIGINT) AS n_orphan_keys,
             |  CAST((SELECT count(*) FROM pk) AS BIGINT) AS n_parent_keys,
             |  CAST((SELECT count(*) FROM pk LEFT JOIN
             |      (SELECT DISTINCT k FROM ck WHERE k IS NOT NULL) c2 ON c2.k = pk.k
             |    WHERE c2.k IS NULL) AS BIGINT) AS n_childless_parents,
             |  round(CAST((SELECT coalesce(sum(c), 0) FROM orph) AS DOUBLE)
             |    / CAST((SELECT count(*) FROM ck) AS DOUBLE), 9) AS orphan_rate)""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY relation"))),

    // TU1: Theil's uncertainty coefficient between lang and source —
    // the DIRECTIONAL association readout beside cv2's symmetric V.
    "tu1_theils_u" -> Q(
      (s, d) => graft.ops.Stats.theilsU(docs(s, d), "lang", "source"),
      Some("""WITH cells AS MATERIALIZED (SELECT CAST(lang AS VARCHAR) AS a,
        |    CAST(source AS VARCHAR) AS b, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |ra AS MATERIALIZED (SELECT a, CAST(sum(o) AS BIGINT) AS na FROM cells GROUP BY 1),
        |rb AS MATERIALIZED (SELECT b, CAST(sum(o) AS BIGINT) AS nb FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |hat AS (SELECT sum(CAST(CAST(floor(-(CAST(na AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(na AS DOUBLE) / CAST(n AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS ha
        |  FROM ra, tot),
        |hbt AS (SELECT sum(CAST(CAST(floor(-(CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(nb AS DOUBLE) / CAST(n AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS hb
        |  FROM rb, tot),
        |cond AS (SELECT
        |    sum(CAST(CAST(floor(-(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(o AS DOUBLE) / CAST(nb AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS hab,
        |    sum(CAST(CAST(floor(-(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(o AS DOUBLE) / CAST(na AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS hba
        |  FROM cells JOIN ra USING (a) JOIN rb USING (b), tot)
        |SELECT tot.n,
        |  round(CAST(ha AS DOUBLE) / 1e12, 9) AS h_a,
        |  round(CAST(hb AS DOUBLE) / 1e12, 9) AS h_b,
        |  round(CAST(hab AS DOUBLE) / 1e12, 9) AS h_a_given_b,
        |  round(CAST(hba AS DOUBLE) / 1e12, 9) AS h_b_given_a,
        |  round((CAST(ha AS DOUBLE) - CAST(hab AS DOUBLE)) / CAST(ha AS DOUBLE), 9) AS u_a_given_b,
        |  round((CAST(hb AS DOUBLE) - CAST(hba AS DOUBLE)) / CAST(hb AS DOUBLE), 9) AS u_b_given_a
        |FROM hat, hbt, cond, tot""".stripMargin)),

    // DID1: difference-in-differences on the events panel — odd users
    // "rolled out" at Jan 16; the quasi-experimental causal estimator
    // beside ab1/ab2/ipw1. One 4-cell moment pass.
    "did1_diff_in_diff" -> Q(
      (s, d) => graft.ops.Stats.diffInDiff(
          Queries.events(s, d)
            .withColumn("treated", col("user_id") % 2 === 1),
          "ts", "treated", "value", cutoff = "2024-01-16 00:00:00"),
      Some("""WITH q AS (SELECT
        |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS post,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q FROM events),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN t = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_00,
        |    CAST(sum(CASE WHEN t = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_01,
        |    CAST(sum(CASE WHEN t = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_10,
        |    CAST(sum(CASE WHEN t = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_11,
        |    sum(CASE WHEN t = 0 AND post = 0 THEN CAST(q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_00,
        |    sum(CASE WHEN t = 0 AND post = 1 THEN CAST(q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_01,
        |    sum(CASE WHEN t = 1 AND post = 0 THEN CAST(q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_10,
        |    sum(CASE WHEN t = 1 AND post = 1 THEN CAST(q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_11,
        |    sum(CASE WHEN t = 0 AND post = 0 THEN CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_00,
        |    sum(CASE WHEN t = 0 AND post = 1 THEN CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_01,
        |    sum(CASE WHEN t = 1 AND post = 0 THEN CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_10,
        |    sum(CASE WHEN t = 1 AND post = 1 THEN CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_11
        |  FROM q),
        |e AS (SELECT *,
        |    CAST(s_00 AS DOUBLE) / CAST(n_00 AS DOUBLE) AS m00,
        |    CAST(s_01 AS DOUBLE) / CAST(n_01 AS DOUBLE) AS m01,
        |    CAST(s_10 AS DOUBLE) / CAST(n_10 AS DOUBLE) AS m10,
        |    CAST(s_11 AS DOUBLE) / CAST(n_11 AS DOUBLE) AS m11,
        |    (CAST(ss_00 AS DOUBLE) - CAST(s_00 AS DOUBLE) * CAST(s_00 AS DOUBLE) / CAST(n_00 AS DOUBLE)) / (CAST(n_00 AS DOUBLE) - 1.0) AS v00,
        |    (CAST(ss_01 AS DOUBLE) - CAST(s_01 AS DOUBLE) * CAST(s_01 AS DOUBLE) / CAST(n_01 AS DOUBLE)) / (CAST(n_01 AS DOUBLE) - 1.0) AS v01,
        |    (CAST(ss_10 AS DOUBLE) - CAST(s_10 AS DOUBLE) * CAST(s_10 AS DOUBLE) / CAST(n_10 AS DOUBLE)) / (CAST(n_10 AS DOUBLE) - 1.0) AS v10,
        |    (CAST(ss_11 AS DOUBLE) - CAST(s_11 AS DOUBLE) * CAST(s_11 AS DOUBLE) / CAST(n_11 AS DOUBLE)) / (CAST(n_11 AS DOUBLE) - 1.0) AS v11
        |  FROM m),
        |f AS (SELECT *, (m11 - m10) - (m01 - m00) AS did,
        |    sqrt(v11 / CAST(n_11 AS DOUBLE) + v10 / CAST(n_10 AS DOUBLE)
        |      + v01 / CAST(n_01 AS DOUBLE) + v00 / CAST(n_00 AS DOUBLE)) AS se
        |  FROM e)
        |SELECT n_00 AS n_ctrl_pre, n_01 AS n_ctrl_post,
        |  n_10 AS n_treat_pre, n_11 AS n_treat_post,
        |  round(m00 / 1e6, 6) AS mean_ctrl_pre, round(m01 / 1e6, 6) AS mean_ctrl_post,
        |  round(m10 / 1e6, 6) AS mean_treat_pre, round(m11 / 1e6, 6) AS mean_treat_post,
        |  round(did / 1e6, 6) AS did, round(se / 1e6, 6) AS se,
        |  round(did / se, 6) AS z, abs(did / se) > 1.96 AS significant
        |FROM f""".stripMargin)),

    // AAT1: A/A validity check — an md5-parity split of users that is
    // orthogonal to every real attribute must come out non-significant;
    // the metric-pipeline neutrality gate experimentation platforms run
    // before trusting any real readout.
    "aat1_aa_validity" -> Q(
      (s, d) => graft.ops.Stats.welchTTest(
          Queries.events(s, d).withColumn("arm",
            when(pmod(conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long"), lit(2L)) === 0L, "a").otherwise("b")),
          "value", "arm", "a", "b"),
      Some("""WITH b AS (SELECT
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, 9),
        |          i -> CAST(strpos('0123456789abcdef',
        |            substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1 AS BIGINT))),
        |        (a, x) -> a * 16 + x) % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
        |    CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)) AS q
        |  FROM events),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN arm = 'a' THEN q ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_a,
        |    sum(CASE WHEN arm = 'b' THEN q ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_b,
        |    sum(CASE WHEN arm = 'a' THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_a,
        |    sum(CASE WHEN arm = 'b' THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_b
        |  FROM b),
        |c AS (SELECT n_a, n_b,
        |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        |    CAST(s_a AS DOUBLE) AS sa, CAST(s_b AS DOUBLE) AS sb,
        |    CAST(ss_a AS DOUBLE) AS ssa, CAST(ss_b AS DOUBLE) AS ssb
        |  FROM m),
        |v AS (SELECT *,
        |    (ssa - sa * sa / na) / (na - 1.0) AS var_qa,
        |    (ssb - sb * sb / nb) / (nb - 1.0) AS var_qb
        |  FROM c),
        |w AS (SELECT *, var_qa / na + var_qb / nb AS se2 FROM v)
        |SELECT n_a, n_b,
        |  round(sa / na / 1e6, 6) AS mean_a,
        |  round(sb / nb / 1e6, 6) AS mean_b,
        |  round(var_qa / 1e12, 6) AS var_a,
        |  round(var_qb / 1e12, 6) AS var_b,
        |  (sa / na - sb / nb) / sqrt(se2) AS t_stat,
        |  se2 * se2 / ((var_qa / na) * (var_qa / na) / (na - 1.0)
        |             + (var_qb / nb) * (var_qb / nb) / (nb - 1.0)) AS df_welch,
        |  abs((sa / na - sb / nb) / sqrt(se2)) > 1.96 AS significant
        |FROM w""".stripMargin)),

    // OT1: Sinkhorn entropic optimal transport between the click and
    // purchase hour-of-day profiles — plan-time exp literals, pure
    // IEEE iterations, bit-identical across engines with NO
    // quantization; emd1's regularized 2-D-capable sibling.
    "ot1_sinkhorn" -> Q(
      (s, d) => graft.ops.Stats.sinkhornOt(
          Queries.events(s, d)
            .filter(col("event_type").isin("click", "purchase"))
            .withColumn("hod", hour(col("ts")))
            .withColumn("is_click", col("event_type") === "click"),
          "hod", "is_click", bins = 24, eps = 4.0, iters = 6),
      Some(OracleGen.ot1Sql(24, 4.0, 6))),

    // EMD1: exact 1-D Wasserstein distance between the even/odd
    // doc_id halves' length distributions — drift in the metric's own
    // units, zero floats in the accumulation.
    "emd1_wasserstein_drift" -> Q(
      (s, d) => graft.ops.Stats.wasserstein1(
          docs(s, d).withColumn("half_a", col("doc_id") % 2 === 0),
          "n_chars", "half_a"),
      Some("""WITH cells AS MATERIALIZED (SELECT n_chars AS v,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM documents GROUP BY 1),
        |cum AS MATERIALIZED (SELECT v,
        |    CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
        |    CAST(sum(cb) OVER w AS BIGINT) AS cum_b,
        |    CAST(lead(v, 1) OVER (ORDER BY v) - v AS BIGINT) AS gap
        |  FROM cells WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM cells),
        |t AS (SELECT CAST(gap AS DECIMAL(38,0))
        |      * abs(CAST(cum_a AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))
        |            - CAST(cum_b AS DECIMAL(38,0)) * CAST(na AS DECIMAL(38,0))) AS term,
        |    na, nb FROM cum, tot WHERE gap IS NOT NULL)
        |SELECT na AS n_a, nb AS n_b, CAST(count(*) AS BIGINT) AS n_segments,
        |  round(CAST(sum(term) AS DOUBLE)
        |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 9) AS wasserstein1
        |FROM t GROUP BY na, nb""".stripMargin)),

    // WIL1: Wilson funnel screening of per-source long-doc rates —
    // which sources are SIGNIFICANTLY below the corpus rate, not just
    // noisily below.
    "wil1_source_funnel" -> Q(
      (s, d) => graft.ops.Stats.proportionFunnel(
          docs(s, d).withColumn("is_long", col("n_chars") >= 300),
          "source", "is_long")
        .orderBy("source"),
      Some("""WITH g AS MATERIALIZED (SELECT source AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(k) AS BIGINT) AS tk FROM g),
        |e AS (SELECT g.g, g.n, g.k, tot.tn, tot.tk,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
        |    1.0 + 3.8415999999999997 / CAST(n AS DOUBLE) AS dn,
        |    CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE) AS pg
        |  FROM g, tot),
        |w AS (SELECT g, n, k, ph, pg,
        |    (ph + 3.8415999999999997 / (2.0 * CAST(n AS DOUBLE))) / dn AS center,
        |    1.96 * sqrt(ph * (1.0 - ph) / CAST(n AS DOUBLE)
        |      + 3.8415999999999997 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / dn AS half
        |  FROM e)
        |SELECT g AS source, n, k, round(ph, 6) AS rate,
        |  round(center - half, 6) AS wilson_lo,
        |  round(center + half, 6) AS wilson_hi,
        |  round(pg, 6) AS global_rate,
        |  center + half < pg AS flag_low,
        |  center - half > pg AS flag_high
        |FROM w ORDER BY source""".stripMargin)),

    // SEQ1: group-sequential monitoring of the ab1 experiment — one
    // look per week, cumulative Welch z vs the O'Brien–Fleming
    // boundary z·√(K/k); the peeking-safe companion to ab1.
    "seq1_group_sequential" -> Q(
      (s, d) => graft.ops.Stats.groupSequential(
          Queries.events(s, d).withColumn("arm",
            when(col("user_id") % 2 === 0, "control").otherwise("treatment")),
          "ts", "arm", "value", "control", "treatment")
        .orderBy("k"),
      Some("""WITH b AS (SELECT date_trunc('week', ts) AS w,
        |    CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS arm,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q FROM events),
        |cells AS MATERIALIZED (SELECT w, arm, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(q AS DECIMAL(38,0))) AS s,
        |    sum(CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))) AS ss
        |  FROM b GROUP BY 1, 2),
        |cum AS MATERIALIZED (SELECT w, arm,
        |    CAST(sum(n) OVER win AS BIGINT) AS cn,
        |    sum(s) OVER win AS cs, sum(ss) OVER win AS css
        |  FROM cells WINDOW win AS (PARTITION BY arm ORDER BY w
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |lk AS MATERIALIZED (SELECT w,
        |    CAST(dense_rank() OVER (ORDER BY w) AS BIGINT) AS k,
        |    t.cn AS n_t, c.cn AS n_c,
        |    t.cs AS s_t, c.cs AS s_c, t.css AS ss_t, c.css AS ss_c
        |  FROM (SELECT * FROM cum WHERE arm = 1) t
        |  JOIN (SELECT * FROM cum WHERE arm = 0) c USING (w)),
        |kk AS (SELECT CAST(max(k) AS BIGINT) AS bigk FROM lk),
        |e AS (SELECT lk.*, kk.bigk,
        |    CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mt,
        |    CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mc,
        |    (CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))
        |      / (CAST(n_t AS DOUBLE) - 1.0) AS vt,
        |    (CAST(ss_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
        |      / (CAST(n_c AS DOUBLE) - 1.0) AS vc
        |  FROM lk, kk)
        |SELECT k, bigk AS n_looks, n_t, n_c,
        |  CAST(floor(mt - mc + 0.5) AS BIGINT) AS diff_micro,
        |  CAST(floor((mt - mc) / sqrt(vt / CAST(n_t AS DOUBLE)
        |    + vc / CAST(n_c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS z_micro,
        |  CAST(floor(1.96 * sqrt(CAST(bigk AS DOUBLE) / CAST(k AS DOUBLE))
        |    * 1e6 + 0.5) AS BIGINT) AS boundary_micro,
        |  abs((mt - mc) / sqrt(vt / CAST(n_t AS DOUBLE) + vc / CAST(n_c AS DOUBLE)))
        |    > 1.96 * sqrt(CAST(bigk AS DOUBLE) / CAST(k AS DOUBLE)) AS crossed
        |FROM e ORDER BY k""".stripMargin)),

    // IPW1: stratified treatment-effect estimate — heavy-signup users
    // (treated) vs the rest on total purchase value, subclassified on
    // engagement (event-count decade buckets): the confounder both
    // drives signups and purchases, so ate != naive_diff.
    "ipw1_stratified_ate" -> Q(
      (s, d) => {
        val units = Queries.events(s, d).groupBy("user_id").agg(
            (sum(when(col("event_type") === "signup", 1L).otherwise(0L)) > 13L)
              .as("treated"),
            (sum(when(col("event_type") === "purchase",
              floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
              .otherwise(0L)).cast("double") / lit(1e6)).as("outcome"),
            count(lit(1)).cast("long").as("n_ev"))
          .withColumn("stratum", expr("n_ev div 10"))
        graft.ops.Stats.stratifiedAte(units, "stratum", "treated", "outcome")
          .orderBy("stratum")
      },
      Some("""WITH u AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) > 13 AS treated,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS out_micro,
        |    CAST(count(*) AS BIGINT) AS n_ev
        |  FROM events GROUP BY 1),
        |un AS MATERIALIZED (SELECT n_ev // 10 AS stratum,
        |    CASE WHEN treated THEN 1 ELSE 0 END AS arm,
        |    CAST(floor(CAST(out_micro AS DOUBLE) / 1e6 * 1e6 + 0.5) AS BIGINT) AS q
        |  FROM u),
        |cells AS (SELECT stratum, arm, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(q AS DECIMAL(38,0))) AS s FROM un GROUP BY 1, 2),
        |st AS MATERIALIZED (SELECT stratum,
        |    CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n_t,
        |    sum(CASE WHEN arm = 1 THEN s ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_t,
        |    CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n_c,
        |    sum(CASE WHEN arm = 0 THEN s ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_c
        |  FROM cells GROUP BY 1),
        |us AS (SELECT *, n_t + n_c AS n_s,
        |    CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mtm,
        |    CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mcm
        |  FROM st WHERE n_t > 0 AND n_c > 0),
        |us2 AS MATERIALIZED (SELECT *,
        |    CAST(floor((mtm - mcm) * CAST(n_s AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS term_pico
        |  FROM us),
        |dr AS (SELECT CAST(count(*) AS BIGINT) AS n_strata_dropped,
        |    CAST(coalesce(sum(n_t + n_c), 0) AS BIGINT) AS n_units_dropped
        |  FROM st WHERE n_t = 0 OR n_c = 0),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
        |    CAST(sum(n_s) AS BIGINT) AS n_units_used,
        |    sum(CAST(term_pico AS DECIMAL(38,0))) AS ate_sum,
        |    CAST(sum(n_t) AS BIGINT) AS nt_all, CAST(sum(n_c) AS BIGINT) AS nc_all,
        |    sum(s_t) AS st_all, sum(s_c) AS sc_all FROM us2),
        |summ AS (SELECT n_strata_used, n_strata_dropped, n_units_used, n_units_dropped,
        |    CAST(floor(CAST(ate_sum AS DOUBLE)
        |      / (CAST(n_units_used AS DOUBLE) * 1e12) * 1e6 + 0.5) AS BIGINT) AS ate_micro,
        |    CAST(floor(CAST(st_all AS DOUBLE) / CAST(nt_all AS DOUBLE)
        |      - CAST(sc_all AS DOUBLE) / CAST(nc_all AS DOUBLE) + 0.5) AS BIGINT) AS naive_diff_micro
        |  FROM tt, dr)
        |SELECT us2.stratum, us2.n_t, us2.n_c,
        |  CAST(floor(mtm + 0.5) AS BIGINT) AS mean_t_micro,
        |  CAST(floor(mcm + 0.5) AS BIGINT) AS mean_c_micro,
        |  CAST(floor(mtm - mcm + 0.5) AS BIGINT) AS diff_micro,
        |  summ.* FROM us2, summ ORDER BY stratum""".stripMargin)),

    // JB1: Jarque–Bera normality gate per event type — raw power sums
    // (exact decimals), fixed-order central-moment expansion, χ²₂ cut.
    "jb1_jarque_bera" -> Q(
      (s, d) => graft.ops.Stats.jarqueBera(Queries.events(s, d),
          "value", "event_type")
        .orderBy("event_type"),
      Some("""WITH q AS (SELECT event_type AS g,
        |    CAST(floor(value * 1e3 + 0.5) AS BIGINT) AS x FROM events),
        |m AS MATERIALIZED (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS DECIMAL(38,0))) AS s1,
        |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS s2r,
        |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS s3r,
        |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS s4r
        |  FROM q GROUP BY 1),
        |e AS MATERIALIZED (SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    CAST(s2r AS DOUBLE) / CAST(n AS DOUBLE) AS p2,
        |    CAST(s3r AS DOUBLE) / CAST(n AS DOUBLE) AS p3,
        |    CAST(s4r AS DOUBLE) / CAST(n AS DOUBLE) AS p4
        |  FROM m),
        |c AS MATERIALIZED (SELECT g, n, nd,
        |    p2 - mean * mean AS m2,
        |    p3 - 3.0 * mean * p2 + 2.0 * mean * mean * mean AS m3,
        |    p4 - 4.0 * mean * p3 + 6.0 * mean * mean * p2
        |      - 3.0 * mean * mean * mean * mean AS m4
        |  FROM e),
        |sk AS MATERIALIZED (SELECT g, n, nd,
        |    m3 / pow(m2, 1.5) AS skew, m4 / (m2 * m2) - 3.0 AS kurt FROM c)
        |SELECT g AS event_type, n,
        |  round(skew, 9) AS skewness, round(kurt, 9) AS ex_kurtosis,
        |  round(nd / 6.0 * (skew * skew + kurt * kurt / 4.0), 9) AS jb_stat,
        |  nd / 6.0 * (skew * skew + kurt * kurt / 4.0) > 5.991 AS reject_normal
        |FROM sk ORDER BY event_type""".stripMargin)),

    // HITS1: hubs & authorities over the handoff graph — HitsIters
    // L1-normalized rounds on pg1's static edge partitioning; the
    // oracle unrolls the same constant.
    "hits1_hubs_authorities" -> Q(
      (s, d) => Graph.hits(
          Graph.handoffEdges(Queries.events(s, d),
            streamCol = "event_type", keyCol = "user_id",
            tsCol = "ts", tieCol = "event_id"),
          iterations = HitsIters)
        .select(col("v").as("user_id"), col("hub"), col("authority"))
        .orderBy("user_id"),
      Some(HitsOracle)),

    // AS1: degree assortativity of the (undirected) handoff graph —
    // exact decimal moments over both edge orientations, one division.
    "as1_assortativity" -> Q(
      (s, d) => Graph.degreeAssortativity(
          Graph.handoffEdges(Queries.events(s, d),
            streamCol = "event_type", keyCol = "user_id",
            tsCol = "ts", tieCol = "event_id")),
      Some(AssortativityOracle)),

    // MK1: Markov steady-state event mix — per-user event-type
    // transition counts power-iterated to the distribution the stream
    // converges to (absorbing states surface as mass leak). Exact
    // pico-long integer rounds (the bt1 contract), matrix bounded by
    // the event-type vocabulary; only the transition count shuffles.
    "mk1_markov_steady" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val tr = Queries.events(s, d)
          .withColumn("__p", lag(col("event_type"), 1).over(w))
          .filter(col("__p").isNotNull)
          .select(col("__p"), col("event_type"))
        Graph.markovSteady(tr, "__p", "event_type", iters = 12)
          .select(col("state"), col("n_out"),
            round(col("p_steady"), 9).as("p_steady"))
          .orderBy("state")
      },
      Some(OracleGen.mk1Sql(12))),

    // BFS1: bounded-hop reachability from a seed set (user_id % 50 = 0)
    // over the same handoff graph — exact ≤4-hop distances, every round
    // an order-free integer min the oracle unrolls as CTEs.
    "bfs1_khop_reach" -> Q(
      (s, d) => {
        val ed = Graph.handoffEdges(Queries.events(s, d),
          streamCol = "event_type", keyCol = "user_id",
          tsCol = "ts", tieCol = "event_id")
        val nodes = ed.select(col("src").as("v"))
          .unionByName(ed.select(col("dst").as("v"))).distinct()
        Graph.kHopDistances(ed, nodes.filter(pmod(col("v"), lit(50)) === 0),
            rounds = KHopRounds)
          .select(col("v").as("user_id"), col("h").as("hops"))
          .orderBy("user_id")
      },
      Some(KHopOracle)),

    // Synchronous label-propagation communities (Raghavan '07): 5
    // fixed rounds, most-frequent-neighbor label, ties to the SMALLEST
    // label — every decision an integer compare, so the oracle (the
    // same rounds unrolled as CTEs) reproduces the labeling exactly.
    "lp1_label_prop" -> Q(
      (s, d) => Graph.labelPropagation(
          Graph.handoffEdges(Queries.events(s, d),
            streamCol = "event_type", keyCol = "user_id",
            tsCol = "ts", tieCol = "event_id"),
          iterations = LabelPropRounds)
        .select(col("v").as("user_id"), col("lbl").as("label"))
        .orderBy("user_id"),
      Some(LabelPropOracle)),

    // Exact triangle count / clustering coefficient via the
    // degree-oriented wedge join: orientation bounds out-neighborhoods
    // by O(sqrt(E)), collapsing hub-node wedge blow-up from sum(d^2)
    // to E^{3/2} — counting is exact, only (long,long) pairs shuffle.
    // Oracle closes triangles with the naive three-way self-join on
    // the canonical a<b edge set (each triangle x<y<z found once).
    "gr2_triangles" -> Q(
      (s, d) => Graph.triangleStats(
        Graph.handoffEdges(Queries.events(s, d),
          streamCol = "event_type", keyCol = "user_id",
          tsCol = "ts", tieCol = "event_id")),
      Some("""WITH ed AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
        |           user_id AS dst FROM events)
        |  WHERE src IS NOT NULL AND src != dst),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM ed),
        |deg AS (SELECT v, count(*) AS deg FROM (
        |    SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |tri AS (SELECT count(*) AS triangles
        |        FROM und e1 JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        |                    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
        |  CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
        |  CAST(tri.triangles AS BIGINT) AS triangles,
        |  3.0 * tri.triangles / CAST(sum(deg * (deg - 1) // 2) AS DOUBLE) AS clustering
        |FROM deg CROSS JOIN tri GROUP BY tri.triangles""".stripMargin)),

    // Inverted-index build: (term, df, posting-list head) for df >= 2.
    // The wide stage carries (term, doc_id) pairs only — never text.
    "ix1_inverted_index" -> Q(
      (s, d) => Search.invertedIndex(docs(s, d), minDf = 2L, postingCap = 20)
        .orderBy("term"),
      Some("""WITH pairs AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split(lower(text), ' '))) AS term
        |  FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |  array_to_string(list_slice(list_sort(list(doc_id)), 1, 20), ',') AS postings_head
        |FROM pairs WHERE length(term) > 0
        |GROUP BY term HAVING count(*) >= 2
        |ORDER BY term""".stripMargin)),

    // BPE merge learning (Sennrich ACL'16): 8 rounds of the greedy
    // pair-merge loop over the word-frequency table. Oracle = the same
    // loop UNROLLED as chained CTEs (the pg1 pattern); both engines'
    // within-word merges ride literal left-to-right string replace, so
    // the greedy order is bit-identical. All counts integer.
    "bpe1_bpe_merges" -> Q(
      (s, d) => graft.ops.Bpe.learnMerges(docs(s, d), BpeMergeRounds)
        .orderBy("step"),
      Some(BpeMergesOracle)),

    // The trained tokenizer APPLIED: replay the 8 learned merges over
    // the vocabulary (a chain of literal replaces — narrow, codegen).
    "bpe2_segment_vocab" -> Q(
      (s, d) => {
        val m = graft.ops.Bpe.learnMerges(docs(s, d), BpeMergeRounds)
          .orderBy("step").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.ops.Bpe.segmentVocab(docs(s, d), m).orderBy("w")
      },
      Some(BpeSegmentOracle)),

    // TC1: tokenizer bake-off — BPE (8 merges) vs unigram-LM on the
    // SAME vocabulary slice (words ≤ 16 chars, unigram's domain):
    // occurrence-weighted fertility (pieces per word) and compression
    // (chars per piece), the two numbers a tokenizer choice is made
    // on. Both sides exact integers; oracle nests both unrolled
    // tokenizers as subqueries.
    "tc1_tokenizer_bakeoff" -> Q(
      (s, d) => {
        val m = graft.ops.Bpe.learnMerges(docs(s, d), BpeMergeRounds)
          .orderBy("step").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val bpe = graft.ops.Bpe.segmentVocab(docs(s, d), m)
          .filter(length(col("w")) <= 16)
          .select(col("w"), col("cnt").cast("long").as("cnt"),
            length(col("w")).cast("long").as("n_chars"),
            col("n_pieces").cast("long").as("n_pieces"))
        val uni = graft.ops.Bpe.unigramSegment(docs(s, d))
          .select(col("w"), col("cnt"), col("n_chars"), col("n_pieces"))
        def leg(name: String, seg: org.apache.spark.sql.DataFrame) =
          seg.agg(count(lit(1)).cast("long").as("n_words"),
              sum("cnt").cast("long").as("n_occ"),
              sum(col("cnt") * col("n_pieces")).cast("long").as("total_pieces"),
              sum(col("cnt") * col("n_chars")).cast("long").as("total_chars"))
            .select(lit(name).as("tokenizer"), col("n_words"), col("n_occ"),
              col("total_pieces"),
              expr("(total_pieces * 1000000L) div n_occ").as("fertility_micro"),
              expr("(total_chars * 1000000L) div total_pieces")
                .as("chars_per_piece_micro"))
        leg("bpe8", bpe).unionByName(leg("unigram", uni)).orderBy("tokenizer")
      },
      Some {
        def wrap(name: String, sub: String) =
          s"""SELECT '$name' AS tokenizer, CAST(count(*) AS BIGINT) AS n_words,
             |  CAST(sum(cnt) AS BIGINT) AS n_occ,
             |  CAST(sum(cnt * n_pieces) AS BIGINT) AS total_pieces,
             |  (CAST(sum(cnt * n_pieces) AS BIGINT) * 1000000)
             |    // CAST(sum(cnt) AS BIGINT) AS fertility_micro,
             |  (CAST(sum(cnt * n_chars) AS BIGINT) * 1000000)
             |    // CAST(sum(cnt * n_pieces) AS BIGINT) AS chars_per_piece_micro
             |FROM ($sub) ${name.take(3)}""".stripMargin
        wrap("bpe8",
          s"""SELECT w, cnt, CAST(length(w) AS BIGINT) AS n_chars,
             |  CAST(n_pieces AS BIGINT) AS n_pieces
             |FROM (${BpeSegmentOracle.replace("ORDER BY w", "")})
             |WHERE length(w) <= 16""".stripMargin) +
          "\nUNION ALL\n" +
          wrap("unigram",
            OracleGen.ul1Sql().replace("ORDER BY w", "")) +
          "\nORDER BY tokenizer"
      }),

    // UL1: unigram-LM tokenizer segmentation (Kudo '18, SentencePiece's
    // model family) — the global-optimum counterpoint to BPE's greedy
    // merges: count-seeded piece costs, exact integer Viterbi over the
    // vocabulary with a (cost, piece-count) lexicographic tie-break in
    // ONE long min. The oracle unrolls the same 16 DP rounds.
    "ul1_unigram_segment" -> Q(
      (s, d) => graft.ops.Bpe.unigramSegment(docs(s, d)).orderBy("w"),
      Some(OracleGen.ul1Sql())),

    // UL2: one hard-EM round of the unigram trainer — Viterbi
    // backtrace (argmin tiling, min-packed-match tiebreak), usage-
    // count E-step, add-1 re-pricing M-step, re-segmentation; per-word
    // v0 vs v1 cost/pieces so the EM improvement is auditable in-plan.
    // The oracle unrolls segmentation + backtrace + re-segmentation.
    "ul2_unigram_em" -> Q(
      (s, d) => graft.ops.Bpe.unigramEmRound(docs(s, d)).orderBy("w"),
      Some(OracleGen.ul2Sql())),

    // UL3: the vocabulary PRUNE round — unused multi-char pieces drop
    // after the Viterbi E-step (their removal cannot raise corpus
    // cost), singles stay for coverage, survivors re-price, corpus
    // re-segments. ul1 (init) + ul2 (EM) + ul3 (prune) = the full
    // SentencePiece training loop, each round gate-checked.
    "ul3_unigram_prune" -> Q(
      (s, d) => graft.ops.Bpe.unigramPruneRound(docs(s, d)),
      Some(OracleGen.ul3Sql())),

    // WP3: WordPiece merge LEARNING — the likelihood-gain argmax
    // (pair/(c1*c2), floored pico rational, lexicographic ties)
    // instead of BPE's raw-count argmax: the documented trainer
    // difference, registered so the bake-off is auditable.
    "wp3_wordpiece_merges" -> Q(
      (s, d) => graft.ops.Bpe.learnMergesWordpiece(docs(s, d), BpeMergeRounds)
        .orderBy("step"),
      Some(WpMergesOracle)),

    // TOK1: WordPiece-vs-BPE segmentation agreement — per-word
    // boundary identity, occurrence-weighted, both fertilities; the
    // side-by-side a tokenizer migration reads before switching (two
    // tokenizers with 90% boundary agreement retrain cheaply; 40%
    // means the embedding table restarts from scratch).
    "tok1_segmentation_agreement" -> Q(
      (s, d) => {
        val dd0 = docs(s, d)
        val wp = graft.ops.Bpe.wordpieceSegment(dd0)
          .select(col("w"), col("cnt"), col("n_pieces").as("np_wp"),
            regexp_replace(col("seg"), " ##", ",").as("wp_csv"))
        val merges = graft.ops.Bpe.learnMerges(dd0, BpeMergeRounds)
          .orderBy("step").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val bp = graft.ops.Bpe.segmentVocab(dd0, merges)
          .select(col("w"), col("n_pieces").cast("long").as("np_bpe"),
            col("pieces_csv"))
        wp.join(bp, "w")
          .agg(count(lit(1)).cast("long").as("n_words"),
            sum("cnt").cast("long").as("n_occurrences"),
            sum(when(col("wp_csv") === col("pieces_csv"), 1L).otherwise(0L))
              .cast("long").as("n_agree_words"),
            sum(when(col("wp_csv") === col("pieces_csv"), col("cnt"))
              .otherwise(0L)).cast("long").as("ao"),
            sum(col("cnt") * col("np_wp")).cast("long").as("fw"),
            sum(col("cnt") * col("np_bpe")).cast("long").as("fb"))
          .select(col("n_words"), col("n_occurrences"), col("n_agree_words"),
            expr("(ao * 1000000L) div n_occurrences").as("agree_occ_micro"),
            expr("(fw * 1000000L) div n_occurrences").as("fert_wp_micro"),
            expr("(fb * 1000000L) div n_occurrences").as("fert_bpe_micro"))
      },
      Some(OracleGen.tok1Sql(
        bpeWordCtes(BpeMergeRounds).stripPrefix("WITH "), BpeMergeRounds))),

    // WP1: WordPiece greedy longest-match segmentation (Schuster &
    // Nakajima '12; BERT's MaxMatch) — the third tokenizer beside BPE
    // (merge-rank greedy) and unigram-LM (Viterbi): position-tagged
    // vocabulary, single greedy fold, no DP. The emitted `seg` string
    // ("un ##ab ##le") makes the gate verify the full segmentation,
    // not just piece counts.
    "wp1_wordpiece_segment" -> Q(
      (s, d) => graft.ops.Bpe.wordpieceSegment(docs(s, d)).orderBy("w"),
      Some(OracleGen.wp1Sql())),

    // WP2: occurrence-weighted piece usage of the WordPiece vocabulary
    // (initial vs ## continuation forms separate) — the vocab-health
    // readout before shipping a tokenizer.
    "wp2_wordpiece_usage" -> Q(
      (s, d) => graft.ops.Bpe.wordpieceUsage(docs(s, d)),
      Some(OracleGen.wp2Sql())),

    // KWIC1: keyword-in-context concordance for 'spark' — every
    // occurrence with its ±3-token window; the human-triage surface
    // behind "how does the corpus actually use X".
    "kwic1_concordance" -> Q(
      (s, d) => graft.ops.Text.kwic(docs(s, d), "spark")
        .orderBy("doc_id", "pos"),
      Some("""WITH w AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '),
        |      x -> length(x) > 0) AS ws FROM documents),
        |m AS (SELECT doc_id, ws, CAST(u.p AS BIGINT) AS pos
        |  FROM w, unnest(range(1, len(ws) + 1)) AS u(p)
        |  WHERE ws[CAST(u.p AS INTEGER)] = 'spark')
        |SELECT doc_id, pos,
        |  array_to_string(list_slice(ws,
        |    CAST(greatest(pos - 3, 1) AS INTEGER),
        |    CAST(least(pos + 3, len(ws)) AS INTEGER)), ' ') AS context
        |FROM m ORDER BY doc_id, pos""".stripMargin)),

    // TT1: TextTiling topic segmentation (Hearst '97, block form) —
    // w-word blocks, exact Jaccard gap cohesion, boundaries at
    // interior local minima below the doc mean (integer cross-product
    // test). The chunk-at-topic-shifts prep beside fixed-window cur5.
    "tt1_texttiling" -> Q(
      (s, d) => graft.ops.Text.textTiling(docs(s, d)).orderBy("doc_id"),
      Some("""WITH base AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '),
        |      x -> length(x) > 0) AS ws FROM documents),
        |b2 AS (SELECT doc_id, ws,
        |    CAST((len(ws) + 9) // 10 AS INTEGER) AS nb FROM base),
        |bl AS (SELECT doc_id, ws, nb,
        |    list_transform(range(0, greatest(nb, 1)), bi ->
        |      list_distinct(list_slice(ws, bi * 10 + 1, bi * 10 + 10)))
        |      AS blocks
        |  FROM b2),
        |ch AS (SELECT doc_id, len(ws) AS nw, nb,
        |    CASE WHEN nb < 2 THEN CAST([] AS BIGINT[])
        |    ELSE list_transform(range(0, nb - 1), g ->
        |      CAST(CASE WHEN len(list_distinct(list_concat(
        |          blocks[CAST(g AS INTEGER) + 1],
        |          blocks[CAST(g AS INTEGER) + 2]))) = 0 THEN 0
        |        ELSE (len(list_intersect(blocks[CAST(g AS INTEGER) + 1],
        |            blocks[CAST(g AS INTEGER) + 2])) * 1000000)
        |          // len(list_distinct(list_concat(
        |            blocks[CAST(g AS INTEGER) + 1],
        |            blocks[CAST(g AS INTEGER) + 2]))) END AS BIGINT))
        |    END AS coh
        |  FROM bl),
        |sc AS (SELECT doc_id, nw, nb, coh,
        |    CAST(coalesce(list_sum(coh), 0) AS BIGINT) AS scoh FROM ch),
        |bd AS (SELECT *, CASE WHEN len(coh) < 3 THEN CAST([] AS INTEGER[])
        |    ELSE CAST(list_filter(range(1, len(coh) - 1), g ->
        |      coh[CAST(g AS INTEGER) + 1] < coh[CAST(g AS INTEGER)] AND
        |      coh[CAST(g AS INTEGER) + 1] <= coh[CAST(g AS INTEGER) + 2] AND
        |      coh[CAST(g AS INTEGER) + 1] * len(coh) < scoh)
        |      AS INTEGER[]) END AS bnds
        |  FROM sc)
        |SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
        |  CAST(nb AS BIGINT) AS n_blocks,
        |  CASE WHEN len(coh) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE scoh // len(coh) END AS mean_coh_micro,
        |  CAST(len(bnds) AS BIGINT) AS n_boundaries,
        |  coalesce(array_to_string(
        |    list_transform(bnds, x -> CAST(x AS VARCHAR)), ','), '')
        |    AS boundaries
        |FROM bd ORDER BY doc_id""".stripMargin)),

    // CZ1: compression-ratio quality gate (Gopher A1.1 / FineWeb) via
    // the native deflate_len expression. DEFLATE values themselves are
    // not SQL-expressible (laws live in OpsSpec), so the gate row is
    // Text.compressionGate: SQL-checkable per-source counts/bytes plus
    // n_in_envelope, which forces deflate_len to execute and asserts
    // every output lies in zlib's expansion envelope — the oracle pins
    // it to n_docs, so a broken native expression turns the row red.
    "cz1_compression_ratio" -> Q(
      (s, d) => graft.ops.Text.compressionGate(docs(s, d))
        .orderBy("source"),
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
        |  CAST(count(*) AS BIGINT) AS n_in_envelope
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // BON1: unbiased Best-of-N curve (Nakano et al. '21) — prompts =
    // doc_id div 5 (5 candidates each), reward = the shared quality
    // score; order statistics on micro-quantized scores, exact
    // binomial-weight folds in both engines.
    "bon1_best_of_n" -> Q(
      (s, d) => {
        val q = graft.ops.Text.withQuality(docs(s, d))
          .select(expr("doc_id div 5").as("prompt"),
            col("quality_score"), col("doc_id"))
        graft.ops.Stats.bestOfN(q, "prompt", "quality_score", "doc_id",
          maxN = 5).orderBy("n")
      },
      Some("""WITH q AS (SELECT doc_id, CAST(doc_id // 5 AS BIGINT) AS p,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2) AS qs
        |  FROM documents),
        |b AS (SELECT p, CAST(floor(qs * 1e6 + 0.5) AS BIGINT) AS s,
        |    CAST(doc_id AS BIGINT) AS id FROM q),
        |r AS (SELECT p, s,
        |    CAST(row_number() OVER (PARTITION BY p ORDER BY s, id) AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY p) AS BIGINT) AS nn FROM b),
        |e AS (SELECT r.p, r.s, r.i, r.nn, CAST(u.n AS BIGINT) AS n
        |  FROM r, unnest(generate_series(1, 5)) AS u(n) WHERE u.n <= r.nn),
        |w AS (SELECT p, n, s,
        |    CASE WHEN n = 1 THEN CAST(1 AS BIGINT)
        |         WHEN i - 1 < n - 1 THEN CAST(0 AS BIGINT)
        |         ELSE list_reduce(list_prepend(CAST(1 AS BIGINT),
        |             generate_series(1, n - 1)),
        |           (acc, j) -> (acc * (i - n + j)) // j) END AS wn,
        |    list_reduce(list_prepend(CAST(1 AS BIGINT), generate_series(1, n)),
        |      (acc, j) -> (acc * (nn - n + j)) // j) AS wd
        |  FROM e),
        |pp AS (SELECT p, n,
        |    CAST(sum(s * wn) AS BIGINT) // min(wd) AS bon FROM w GROUP BY 1, 2)
        |SELECT n, CAST(count(*) AS BIGINT) AS n_prompts,
        |  CAST(sum(bon) // count(*) AS BIGINT) AS mean_bon_micro
        |FROM pp GROUP BY 1 ORDER BY n""".stripMargin)),

    // CNL1: confident-learning label-error estimation (Northcutt et
    // al. '21, the cleanlab algorithm) over the Gaussian-NB posteriors
    // on the embedding table — per-class self-confidence thresholds,
    // qualifying-argmax joint (given, latent) distribution; the
    // off-diagonal mass is the estimated label-error rate.
    "cnl1_confident_learning" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Classify.confidentLearning(
            Classify.gaussianNbPosteriors(e, Classify.gaussianNbTrain(e)))
          .orderBy("given", "pred")
      },
      Some(OracleGen.cnl1Sql(64))),

    // AL1: margin/entropy uncertainty sampling over the same NB
    // posteriors — the active-learning acquisition batch (smallest
    // top-two margin first); the labeling-budget allocator beside
    // cnl1's relabel queue.
    "al1_uncertainty_sampling" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Classify.uncertaintySample(
            Classify.gaussianNbPosteriors(e, Classify.gaussianNbTrain(e)))
          .orderBy("margin_micro", "id")
      },
      Some(OracleGen.al1Sql())),

    // MAUVE1: divergence frontier (Pillutla et al. '21) between the
    // even- and odd-label halves of the embedding table — quantized
    // two-sided KL over the fixed coarse cells, λ on the interior
    // i/8 grid; the two-corpus distribution-gap eval.
    "mauve1_divergence_frontier" -> Q(
      (s, d) => graft.ops.Similarity.divergenceFrontier(embs(s, d),
          pmod(col("label"), lit(2)) === 0,
          graft.ops.Similarity.fixedCentroids(16, 64)),
      Some(OracleGen.mauve1Sql())),

    // PRUNE1: SSL-prototype data pruning (Sorscher et al. '22) — drop
    // the EASIEST (most prototypical) 25% per cluster; the
    // embedding-only pruning rule that beats random subsetting in the
    // data-abundant regime. Fixed coarse centroids (the ss5/ann7
    // literals) so the oracle recomputes the full assignment.
    "prune1_prototype_pruning" -> Q(
      (s, d) => graft.ops.Curate.prototypePruning(embs(s, d),
          graft.ops.Similarity.fixedCentroids(16, 64)).orderBy("cell"),
      Some(OracleGen.prune1Sql())),

    // FAIR1: group-fairness audit of a quality gate over language
    // slices — selection rate, TPR/FPR vs the n_chars>=300 proxy
    // outcome, disparate-impact ratio vs the largest group, and the
    // equalized-odds gap. The mixture-bug detector for any corpus cut.
    "fair1_parity_audit" -> Q(
      (s, d) => {
        val base = graft.ops.Text.withQuality(docs(s, d))
          .select(col("lang"),
            (floor(col("quality_score") * lit(1e6) + lit(0.5)) >= 610000L)
              .as("dec"),
            (col("n_chars") >= 300L).as("outc"))
        graft.ops.Classify.fairnessAudit(base, "lang", "dec", "outc")
          .orderBy("grp")
      },
      Some("""WITH q AS (SELECT lang, n_chars,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2) AS qs
        |  FROM documents),
        |g AS (SELECT lang AS grp,
        |    CASE WHEN CAST(floor(qs * 1e6 + 0.5) AS BIGINT) >= 610000
        |      THEN 1 ELSE 0 END AS d,
        |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM q),
        |per AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(d) AS BIGINT) AS n_sel, CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(d * y) AS BIGINT) AS n_tp,
        |    CAST(sum(d * (1 - y)) AS BIGINT) AS n_fp
        |  FROM g GROUP BY 1),
        |pr AS (SELECT *, (n_sel * 1000000) // n AS sel_micro,
        |    CASE WHEN n_pos = 0 THEN 0
        |      ELSE (n_tp * 1000000) // n_pos END AS tpr_micro,
        |    CASE WHEN n = n_pos THEN 0
        |      ELSE (n_fp * 1000000) // (n - n_pos) END AS fpr_micro FROM per),
        |ref AS (SELECT grp AS ref_grp, sel_micro AS ref_sel,
        |    tpr_micro AS ref_tpr, fpr_micro AS ref_fpr
        |  FROM pr ORDER BY n DESC, grp LIMIT 1)
        |SELECT grp, n, n_sel, sel_micro, tpr_micro, fpr_micro, ref_grp,
        |  CASE WHEN ref_sel = 0 THEN CAST(1000000 AS BIGINT)
        |    ELSE (sel_micro * 1000000) // ref_sel END AS di_ratio_micro,
        |  greatest(abs(tpr_micro - ref_tpr), abs(fpr_micro - ref_fpr))
        |    AS eo_gap_micro
        |FROM pr, ref ORDER BY grp""".stripMargin)),

    // Corpus-wide tokenization with the learned merges — the job the
    // tokenizer exists for. Per-doc piece count + md5 of the ordered
    // piece sequence (ordered reassembly via array_sort(struct(pos,…)),
    // never bare collect_list order).
    "bpe3_tokenize_corpus" -> Q(
      (s, d) => {
        val m = graft.ops.Bpe.learnMerges(docs(s, d), BpeMergeRounds)
          .orderBy("step").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.ops.Bpe.tokenizeCorpus(docs(s, d), m).orderBy("doc_id")
      },
      Some(BpeTokenizeOracle)),

    // BPE4: tokenizer FERTILITY report per language — pieces/word and
    // chars/piece under the learned merges, the standard "is this
    // tokenizer fair to language X" audit (a high-fertility language
    // pays more sequence length per character of content). Reuses
    // bpe1's learned merges and bpe2's vocabulary segmentation: the
    // corpus side is one token explode + a vocab-sized join — the
    // merge replay never touches token occurrences.
    "bpe4_fertility" -> Q(
      (s, d) => {
        val m = graft.ops.Bpe.learnMerges(docs(s, d), BpeMergeRounds)
          .orderBy("step").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val dd = docs(s, d)
        val vocab = graft.ops.Bpe.segmentVocab(dd, m)
          .select(col("w"), col("n_pieces"))
        val toks = dd.select(col("doc_id"), col("lang"),
            explode(Dedup.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
        toks.join(vocab, "w")
          .withColumn("wc", length(col("w")).cast("long"))
          .groupBy(col("lang"))
          .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
            count(lit(1)).cast("long").as("n_words"),
            sum(col("n_pieces").cast("long")).cast("long").as("n_pieces"),
            sum(col("wc")).cast("long").as("n_chars"))
          .select(col("lang"), col("n_docs"), col("n_words"),
            col("n_pieces"), col("n_chars"),
            round(col("n_pieces").cast("double") / col("n_words").cast("double"), 9)
              .as("fertility"),
            round(col("n_chars").cast("double") / col("n_pieces").cast("double"), 9)
              .as("chars_per_piece"))
          .orderBy("lang")
      },
      Some(bpeWordCtes(BpeMergeRounds) +
        s""",
           |pieces AS (SELECT w,
           |  CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS np FROM w$BpeMergeRounds),
           |tk AS (SELECT doc_id, lang,
           |    string_split(lower(text), ' ')[u.i] AS tok
           |  FROM documents,
           |    unnest(generate_series(1, len(string_split(lower(text), ' ')))) u(i)),
           |j AS (SELECT tk.lang, tk.doc_id, p.np, CAST(len(tk.tok) AS BIGINT) AS wc
           |  FROM tk JOIN pieces p ON p.w = tk.tok WHERE len(tk.tok) > 0)
           |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(np) AS BIGINT) AS n_pieces,
           |  CAST(sum(wc) AS BIGINT) AS n_chars,
           |  round(CAST(sum(np) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9) AS fertility,
           |  round(CAST(sum(wc) AS DOUBLE) / CAST(sum(np) AS DOUBLE), 9) AS chars_per_piece
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DD17: dedup SAVINGS report — what exact dedup actually buys, in
    // the unit the training bill is written in (tokens), per source.
    // One hash-group pass decides keepers (min doc id per content
    // hash, the dd1 rule); token counts are in-row sizes — no text
    // ever shuffles, only (hash, id, n_tokens) triples.
    "dd17_dedup_savings" -> Q(
      (s, d) => {
        val dd = docs(s, d)
          .withColumn("__h", md5(col("text")))
          .withColumn("__nt",
            size(filter(Dedup.tokens(col("text")), t => length(t) > 0)).cast("long"))
        val keep = dd.groupBy(col("__h")).agg(min(col("doc_id")).as("__keep"))
        dd.join(keep, "__h")
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("doc_id") === col("__keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(col("__nt")).cast("long").as("tokens_total"),
            sum(when(col("doc_id") === col("__keep"), col("__nt")).otherwise(lit(0L)))
              .cast("long").as("tokens_kept"))
          .select(col("source"), col("n_docs"), col("n_kept"),
            col("tokens_total"), col("tokens_kept"),
            // a source whose docs all tokenize empty yields 0/0: Spark
            // NaN vs DuckDB NULL would split the gate — emit NULL.
            when(col("tokens_total") > 0,
              round(lit(1.0) - col("tokens_kept").cast("double")
                / col("tokens_total").cast("double"), 9)).as("savings"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS BIGINT) AS nt
        |  FROM documents),
        |k AS (SELECT h, min(doc_id) AS keep FROM t GROUP BY 1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id = keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(nt) AS BIGINT) AS tokens_total,
        |  CAST(sum(CASE WHEN doc_id = keep THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept,
        |  CASE WHEN sum(nt) > 0 THEN
        |    round(1.0 - CAST(sum(CASE WHEN doc_id = keep THEN nt ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(nt) AS DOUBLE), 9) END AS savings
        |FROM t JOIN k USING (h) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // One-row dataset card: volume / diversity / dup mass / exact
    // median length / mean quality — the release datasheet.
    "card1_dataset_card" -> Q(
      (s, d) => graft.ops.Profile.datasetCard(docs(s, d)),
      Some("""WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(lower(text), ' '),
        |    w -> length(w) > 0))) AS BIGINT) AS n_words,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |  FROM documents),
        |dup AS (SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
        |    AS n_dup_docs
        |  FROM (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY 1)),
        |med AS (SELECT CAST(nc AS BIGINT) AS median_chars FROM
        |  (SELECT n_chars AS nc, row_number() OVER (ORDER BY n_chars) AS rn
        |   FROM documents), base
        |  WHERE rn = (base.n_docs + 1) // 2),
        |q AS (SELECT
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
        |  FROM documents),
        |mq AS (SELECT round(avg(least(1.0, alpha_ratio * 0.5 + stopword_ratio * 0.3
        |        + least(mean_word_len / 10.0, 1.0) * 0.2)), 6) AS mean_quality FROM q)
        |SELECT base.n_docs, base.n_words, base.n_langs, base.n_sources,
        |  dup.n_dup_docs,
        |  CAST(dup.n_dup_docs AS DOUBLE) / CAST(base.n_docs AS DOUBLE) AS dup_rate,
        |  med.median_chars, mq.mean_quality
        |FROM base, dup, med, mq""".stripMargin)),

    // ---- inference statistics + eval harnesses (round 9) --------------

    // EV1: retrieval eval — nDCG@10 / MRR / P@10 / R@10 per query over
    // the self-labeling single-term-BM25 benchmark. All ranks are
    // total-order integers, all DCG terms pico-quantized longs, the
    // rank discounts shared driver-computed literals — see
    // Search.retrievalMetrics.
    "ev1_retrieval_metrics" -> Q(
      (s, d) => graft.ops.Search.retrievalMetrics(docs(s, d), EvalTerms, k = EvalK)
        .orderBy("term"),
      Some(RetrievalMetricsOracle)),

    // KP1: inter-labeler agreement — Cohen's kappa between the
    // stopword langid (tx3) and the n-gram langid (tx8) over the same
    // corpus: the annotation-QA gate. Full confusion matrix + the
    // scalar kappa on every row, all from exact integer counts.
    "kp1_labeler_agreement" -> Q(
      (s, d) => graft.ops.Stats.cohenKappa(
          Text.withLangIdNgram(Text.withLangId(docs(s, d))),
          "lang_pred", "ng_lang_pred")
        .orderBy("label_a", "label_b"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks,
        |    lower(text) AS lt, greatest(CAST(length(text) AS DOUBLE), 1.0) AS n
        |  FROM documents),
        |sc AS (SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS INTEGER) AS score_en,
        |  CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))) AS INTEGER) AS score_es,
        |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et','une'], x))) AS INTEGER) AS score_fr
        |  FROM t),
        |p1 AS (SELECT doc_id,
        |  CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
        |       WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
        |       WHEN score_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS label_a
        |  FROM sc),
        |ng AS (SELECT doc_id,
        |  (CAST((length(lt) - length(replace(lt, 'th', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'he', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'in', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'er', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'an', ''))) / 2 AS DOUBLE)) / n AS ng_en,
        |  (CAST((length(lt) - length(replace(lt, 'de', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'la', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'os', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ue', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ción', ''))) / 4 AS DOUBLE)) / n AS ng_es,
        |  (CAST((length(lt) - length(replace(lt, 'le', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ou', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'es', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ai', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'eau', ''))) / 3 AS DOUBLE)) / n AS ng_fr
        |  FROM t),
        |p2 AS (SELECT doc_id,
        |  CASE WHEN ng_en >= ng_es AND ng_en >= ng_fr AND ng_en > 0 THEN 'en'
        |       WHEN ng_es >= ng_fr AND ng_es > 0 THEN 'es'
        |       WHEN ng_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS label_b
        |  FROM ng),
        |cells AS (SELECT label_a, label_b, CAST(count(*) AS BIGINT) AS n_cell
        |  FROM p1 JOIN p2 USING (doc_id) GROUP BY 1, 2),
        |nn AS (SELECT CAST(sum(n_cell) AS BIGINT) AS n FROM cells),
        |agr AS (SELECT CAST(coalesce(sum(CASE WHEN label_a = label_b THEN n_cell END), 0)
        |    AS BIGINT) AS n_agree FROM cells),
        |ma AS (SELECT label_a AS lab, CAST(sum(n_cell) AS BIGINT) AS n_a FROM cells GROUP BY 1),
        |mb AS (SELECT label_b AS lab, CAST(sum(n_cell) AS BIGINT) AS n_b FROM cells GROUP BY 1),
        |pe AS (SELECT CAST(coalesce(sum(CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))), 0)
        |    AS DECIMAL(38,0)) AS pe_num FROM ma JOIN mb USING (lab)),
        |sca AS (SELECT n,
        |    CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS p_o,
        |    CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS p_e
        |  FROM nn, agr, pe)
        |SELECT label_a, label_b, n_cell, n, round(p_o, 9) AS p_o, round(p_e, 9) AS p_e,
        |  round((p_o - p_e) / (1.0 - p_e), 9) AS kappa
        |FROM cells, sca ORDER BY label_a, label_b""".stripMargin)),

    // MI1: source↔language dependence — mutual information + NMI over
    // the (source, lang) contingency table; the composition audit
    // companion of st3's chi-square. Per-cell terms pico-quantized
    // before the order-free vocabulary sum (the js1 pattern).
    "mi1_source_lang_mi" -> Q(
      (s, d) => graft.ops.Stats.columnMi(docs(s, d), "source", "lang")
        .orderBy("a", "b"),
      Some("""WITH cells AS (SELECT source AS a, lang AS b,
        |    CAST(count(*) AS BIGINT) AS n_ab FROM documents GROUP BY 1, 2),
        |nn AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM cells),
        |ma AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS n_b FROM cells GROUP BY 1),
        |joint AS (SELECT c.a, c.b, c.n_ab, ma.n_a, mb.n_b,
        |    CAST(c.n_ab AS DOUBLE) / CAST(nn.n AS DOUBLE) AS p_ab,
        |    CAST(c.n_ab AS DOUBLE) / CAST(nn.n AS DOUBLE) *
        |      ln((CAST(c.n_ab AS DOUBLE) / CAST(nn.n AS DOUBLE)) /
        |          (CAST(ma.n_a AS DOUBLE) / CAST(nn.n AS DOUBLE)
        |           * (CAST(mb.n_b AS DOUBLE) / CAST(nn.n AS DOUBLE)))) AS mi_term
        |  FROM cells c JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn),
        |q AS (SELECT *, CAST(floor(mi_term * 1e12 + 0.5) AS BIGINT) AS mi_pico FROM joint),
        |ms AS (SELECT CAST(sum(mi_pico) AS BIGINT) AS mi_pico_sum FROM q),
        |ha AS (SELECT CAST(sum(CAST(floor(-(CAST(n_a AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |    * ln(CAST(n_a AS DOUBLE) / CAST(nn.n AS DOUBLE)) * 1e12 + 0.5) AS BIGINT))
        |    AS BIGINT) AS h FROM ma CROSS JOIN nn),
        |hb AS (SELECT CAST(sum(CAST(floor(-(CAST(n_b AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |    * ln(CAST(n_b AS DOUBLE) / CAST(nn.n AS DOUBLE)) * 1e12 + 0.5) AS BIGINT))
        |    AS BIGINT) AS h FROM mb CROSS JOIN nn)
        |SELECT q.a, q.b, q.n_ab, q.n_a, q.n_b, round(q.mi_term, 9) AS mi_term,
        |  round(CAST(ms.mi_pico_sum AS DOUBLE) / 1e12, 9) AS mi_total,
        |  round(CAST(ms.mi_pico_sum AS DOUBLE) /
        |    CAST(least(ha.h, hb.h) AS DOUBLE), 9) AS nmi
        |FROM q, ms, ha, hb ORDER BY q.a, q.b""".stripMargin)),

    // AB1: Welch's unequal-variance t-test between the even/odd user
    // arms of the event stream — the continuous A/B gate beside st3's
    // categorical chi-square. Micro-quantized moments, one combinable
    // aggregate pass.
    "ab1_welch_ttest" -> Q(
      (s, d) => graft.ops.Stats.welchTTest(
        Queries.events(s, d).withColumn("arm",
          when(col("user_id") % 2 === 0, "control").otherwise("treatment")),
        "value", "arm", "control", "treatment"),
      Some("""WITH b AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
        |    CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)) AS q
        |  FROM events),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN arm = 'control' THEN q ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_a,
        |    sum(CASE WHEN arm = 'treatment' THEN q ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_b,
        |    sum(CASE WHEN arm = 'control' THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_a,
        |    sum(CASE WHEN arm = 'treatment' THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_b
        |  FROM b),
        |c AS (SELECT n_a, n_b,
        |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        |    CAST(s_a AS DOUBLE) AS sa, CAST(s_b AS DOUBLE) AS sb,
        |    CAST(ss_a AS DOUBLE) AS ssa, CAST(ss_b AS DOUBLE) AS ssb
        |  FROM m),
        |v AS (SELECT *,
        |    (ssa - sa * sa / na) / (na - 1.0) AS var_qa,
        |    (ssb - sb * sb / nb) / (nb - 1.0) AS var_qb
        |  FROM c),
        |w AS (SELECT *, var_qa / na + var_qb / nb AS se2 FROM v)
        |SELECT n_a, n_b,
        |  round(sa / na / 1e6, 6) AS mean_a,
        |  round(sb / nb / 1e6, 6) AS mean_b,
        |  round(var_qa / 1e12, 6) AS var_a,
        |  round(var_qb / 1e12, 6) AS var_b,
        |  (sa / na - sb / nb) / sqrt(se2) AS t_stat,
        |  se2 * se2 / ((var_qa / na) * (var_qa / na) / (na - 1.0)
        |             + (var_qb / nb) * (var_qb / nb) / (nb - 1.0)) AS df_welch,
        |  abs((sa / na - sb / nb) / sqrt(se2)) > 1.96 AS significant
        |FROM w""".stripMargin)),

    // FI1: A-Priori frequent item pairs over order baskets — exact
    // support counts after frequent-item pruning, ratios from single
    // divisions of exact longs. See Itemsets.frequentPairs for the
    // 100 TB pruning argument.
    // SQ2: sequential patterns over per-user event streams — contiguous
    // event-type 2/3-grams supported by USER presence (the GSP
    // definition), top-20 under a total order. The ordered complement
    // to fi1's unordered baskets.
    "sq2_sequential_patterns" -> Q(
      (s, d) => graft.ops.Itemsets.sequentialPatterns(
          Queries.events(s, d), "user_id", "ts", "event_id", "event_type")
        .orderBy(col("n_support").desc, col("pattern").asc),
      Some("""WITH seqs AS MATERIALIZED (SELECT user_id AS e,
        |    list(event_type ORDER BY ts, event_id) AS arr FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_entities FROM seqs),
        |g2 AS (SELECT DISTINCT e,
        |    array_to_string(list_slice(arr, i, i + 1), '>') AS pattern
        |  FROM seqs, unnest(generate_series(1, len(arr) - 1)) AS a(i)),
        |g3 AS (SELECT DISTINCT e,
        |    array_to_string(list_slice(arr, i, i + 2), '>') AS pattern
        |  FROM seqs, unnest(generate_series(1, len(arr) - 2)) AS a(i)),
        |u AS (SELECT CAST(2 AS BIGINT) AS n, pattern,
        |    CAST(count(*) AS BIGINT) AS n_support FROM g2 GROUP BY 2
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), pattern, CAST(count(*) AS BIGINT)
        |  FROM g3 GROUP BY 2),
        |f AS (SELECT n, pattern, n_support, tot.n_entities,
        |    (n_support * 1000000) // tot.n_entities AS support_micro
        |  FROM u, tot WHERE n_support >= 2
        |  ORDER BY n_support DESC, pattern ASC LIMIT 20)
        |SELECT * FROM f ORDER BY n_support DESC, pattern ASC"""
        .stripMargin)),

    "fi1_itemset_lift" -> Q(
      (s, d) => graft.ops.Itemsets.frequentPairs(
          li(s, d), "l_orderkey", "l_partkey", minSupport = 2L)
        .filter(col("n_ab") >= 3)
        .orderBy("item_a", "item_b"),
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        |  FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM bi),
        |f AS (SELECT item, CAST(count(*) AS BIGINT) AS item_n FROM bi
        |  GROUP BY 1 HAVING count(*) >= 2),
        |pr AS (SELECT bi.basket, bi.item, f.item_n FROM bi JOIN f USING (item)),
        |pc AS (SELECT x.item AS item_a, y.item AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_ab,
        |    CAST(min(x.item_n) AS BIGINT) AS n_a, CAST(min(y.item_n) AS BIGINT) AS n_b
        |  FROM pr x JOIN pr y ON x.basket = y.basket AND x.item < y.item
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT item_a, item_b, n_ab, n_a, n_b,
        |  CAST(n_ab AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE) AS support,
        |  CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS confidence,
        |  CAST(n_ab AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS lift
        |FROM pc, nb ORDER BY item_a, item_b""".stripMargin)),

    // FI2: fi1's RELATIVE-support scale path — threshold = max(2,
    // ceil(n_baskets · 250/10⁶)), so the a-priori item prune keeps
    // cutting as the corpus grows instead of saturating at a fixed
    // absolute 2 (the r12 scale-smoke's worst entry). Same exact-count
    // semantics; the threshold is a broadcast 1-row scalar in-plan.
    "fi2_itemset_lift_rel" -> Q(
      (s, d) => graft.ops.Itemsets.frequentPairs(
          li(s, d), "l_orderkey", "l_partkey",
          minSupport = 2L, minSupportMicro = 250L)
        .orderBy("item_a", "item_b"),
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        |  FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM bi),
        |th AS (SELECT n_baskets,
        |    greatest(2, (n_baskets * 250 + 999999) // 1000000) AS thr FROM nb),
        |f AS (SELECT item, CAST(count(*) AS BIGINT) AS item_n FROM bi GROUP BY 1),
        |ff AS (SELECT f.item, f.item_n FROM f, th WHERE f.item_n >= th.thr),
        |pr AS (SELECT bi.basket, bi.item, ff.item_n FROM bi JOIN ff USING (item)),
        |pc AS (SELECT x.item AS item_a, y.item AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_ab,
        |    CAST(min(x.item_n) AS BIGINT) AS n_a, CAST(min(y.item_n) AS BIGINT) AS n_b
        |  FROM pr x JOIN pr y ON x.basket = y.basket AND x.item < y.item
        |  GROUP BY 1, 2),
        |pp AS (SELECT pc.* FROM pc, th WHERE pc.n_ab >= th.thr)
        |SELECT item_a, item_b, n_ab, n_a, n_b,
        |  CAST(n_ab AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE) AS support,
        |  CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS confidence,
        |  CAST(n_ab AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS lift
        |FROM pp, nb ORDER BY item_a, item_b""".stripMargin)),

    // KC1: k-core of the user-handoff graph — 8 synchronous peel
    // rounds at k=2, every decision an integer degree count. Oracle =
    // the peel unrolled as chained CTEs (the pg1 discipline).
    "kc1_kcore" -> Q(
      (s, d) => graft.ops.Graph.kCore(
          graft.ops.Graph.handoffEdges(
            Queries.events(s, d), "event_type", "user_id", "ts", "event_id"),
          k = KCoreK, rounds = KCoreRounds)
        .orderBy("v"),
      Some(KCoreOracle)),

    // ZL1: Zipf-law fit — OLS slope of ln(freq) on ln(rank) over the
    // top-100 terms, moments from nano-quantized logs (exact integer
    // sums), top-10 terms emitted with the fit scalars.
    // HP1: Heaps'-law vocabulary-growth fit — β from least squares in
    // log-log over one cumulative (tokens, vocab) point per doc in
    // doc-id order. Cumulatives ride Stats.prefixSum (range-partitioned
    // two-pass, exact longs — no single-reducer ORDER BY window);
    // quantize-then-decimal-sum regression is the zl1 discipline.
    "hp1_heaps_fit" -> Q(
      (s, d) => Text.heapsFit(docs(s, d))
        .select(col("n_points"), col("total_tokens"), col("vocab"),
          round(col("beta"), 9).as("beta"),
          round(col("log_k"), 9).as("log_k")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |tk AS (SELECT doc_id, t FROM tok WHERE len(t) > 0),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks FROM tk GROUP BY 1),
        |fn AS (SELECT min_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_new FROM
        |       (SELECT t, min(doc_id) AS min_doc FROM tk GROUP BY 1) GROUP BY 1),
        |base AS (SELECT d.doc_id, coalesce(pd.n_toks, 0) AS n_toks,
        |         coalesce(fn.n_new, 0) AS n_new
        |         FROM documents d LEFT JOIN pd USING (doc_id) LEFT JOIN fn USING (doc_id)),
        |cum AS (SELECT doc_id,
        |    sum(n_toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
        |    sum(n_new) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
        |  FROM base),
        |p AS (SELECT ct, cv FROM cum WHERE ct > 0 AND cv > 0),
        |qq AS (SELECT ct, cv,
        |    CAST(floor(ln(CAST(ct AS DOUBLE)) * 1e9 + 0.5) AS DECIMAL(38,0)) AS qx,
        |    CAST(floor(ln(CAST(cv AS DOUBLE)) * 1e9 + 0.5) AS DECIMAL(38,0)) AS qy
        |  FROM p),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(max(ct) AS BIGINT) AS total_tokens, CAST(max(cv) AS BIGINT) AS vocab,
        |    sum(qx) AS sx, sum(qy) AS sy, sum(qx * qy) AS sxy, sum(qx * qx) AS sxx
        |  FROM qq),
        |c AS (SELECT n_points, total_tokens, vocab, CAST(n_points AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd FROM m)
        |SELECT n_points, total_tokens, vocab,
        |  round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 9) AS beta,
        |  round(((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd) / nd) / 1e9, 9)
        |    AS log_k
        |FROM c""".stripMargin)),

    "zl1_zipf_slope" -> Q(
      (s, d) => Text.zipfFit(docs(s, d), fitN = 100, topK = 10).orderBy("rank"),
      Some("""WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok
        |  WHERE len(term) > 0 GROUP BY 1),
        |topn AS (SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 100),
        |rk AS (SELECT term, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank
        |  FROM topn),
        |qq AS (SELECT *,
        |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e9 + 0.5) AS DECIMAL(38,0)) AS qx,
        |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e9 + 0.5) AS DECIMAL(38,0)) AS qy
        |  FROM rk),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(qx) AS sx, sum(qy) AS sy,
        |    sum(qx * qy) AS sxy, sum(qx * qx) AS sxx FROM qq),
        |c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd FROM m),
        |f AS (SELECT n,
        |    (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope,
        |    (syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd) / nd / 1e9
        |      AS intercept
        |  FROM c)
        |SELECT rank, term, cnt, n, round(slope, 9) AS slope,
        |  round(intercept, 9) AS intercept
        |FROM rk, f WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // ED1: embedding drift between the even/odd vec_id halves —
    // per-dim Welch z on micro-quantized exact moments + the mean-
    // vector cosine from pico-quantized per-dim contributions. The
    // model-monitoring gate for "the embedding space silently moved".
    "ed1_embedding_drift" -> Q(
      (s, d) => graft.ops.Similarity.embeddingDrift(
          embs(s, d).filter(col("vec_id") % 2 === 0),
          embs(s, d).filter(col("vec_id") % 2 === 1))
        .orderBy("dim"),
      Some("""WITH ex AS (SELECT vec_id, CAST(g.i - 1 AS INTEGER) AS dim,
        |    CAST(embedding[g.i] AS DOUBLE) AS x
        |  FROM embeddings, unnest(generate_series(1, 64)) AS g(i)),
        |qq AS (SELECT vec_id % 2 AS side, dim,
        |    CAST(floor(x * 1e6 + 0.5) AS DECIMAL(38,0)) AS q FROM ex),
        |o AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_old,
        |    sum(q) AS s_old, sum(q * q) AS ss_old FROM qq WHERE side = 0 GROUP BY 1),
        |nw AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_new,
        |    sum(q) AS s_new, sum(q * q) AS ss_new FROM qq WHERE side = 1 GROUP BY 1),
        |j AS (SELECT o.dim, n_old, n_new,
        |    CAST(n_old AS DOUBLE) AS no, CAST(n_new AS DOUBLE) AS nn,
        |    CAST(s_old AS DOUBLE) AS so, CAST(s_new AS DOUBLE) AS sn,
        |    CAST(ss_old AS DOUBLE) AS sso, CAST(ss_new AS DOUBLE) AS ssn
        |  FROM o JOIN nw ON nw.dim = o.dim),
        |dims AS (SELECT dim, n_old, n_new,
        |    round(so / no / 1e6, 6) AS mean_old,
        |    round(sn / nn / 1e6, 6) AS mean_new,
        |    round((sn / nn - so / no) / 1e6, 6) AS delta,
        |    (sn / nn - so / no) / sqrt(((sso - so * so / no) / (no - 1.0)) / no
        |      + ((ssn - sn * sn / nn) / (nn - 1.0)) / nn) AS drift_z,
        |    CAST(floor((so / no) * (sn / nn) + 0.5) AS BIGINT) AS dotq,
        |    CAST(floor((so / no) * (so / no) + 0.5) AS BIGINT) AS ooq,
        |    CAST(floor((sn / nn) * (sn / nn) + 0.5) AS BIGINT) AS nnq
        |  FROM j),
        |cosagg AS (SELECT CAST(sum(dotq) AS DOUBLE) AS dd,
        |    CAST(sum(ooq) AS DOUBLE) AS oo, CAST(sum(nnq) AS DOUBLE) AS mm
        |  FROM dims)
        |SELECT dim, n_old, n_new, mean_old, mean_new, delta, drift_z,
        |  round(dd / (sqrt(oo) * sqrt(mm)), 9) AS mean_cosine
        |FROM dims, cosagg ORDER BY dim""".stripMargin)),

    // AO1: pairwise audience overlap between event-type segments —
    // exact intersection / union / Jaccard carry the hash; the HLL
    // inclusion–exclusion estimates reduce to bound-check booleans
    // (the ag1 discipline for approximate aggregates).
    "ao1_audience_overlap" -> Q(
      (s, d) => graft.ops.Stats.audienceOverlap(
          Queries.events(s, d), "event_type", "user_id")
        .orderBy("seg_a", "seg_b"),
      Some("""WITH sm AS (SELECT DISTINCT event_type AS seg, user_id AS m FROM events),
        |sizes AS (SELECT seg, CAST(count(*) AS BIGINT) AS n FROM sm GROUP BY 1),
        |inter AS (SELECT x.seg AS seg_a, y.seg AS seg_b,
        |    CAST(count(*) AS BIGINT) AS n_inter
        |  FROM sm x JOIN sm y ON x.m = y.m AND x.seg < y.seg GROUP BY 1, 2)
        |SELECT seg_a, seg_b, sa.n AS n_a, sb.n AS n_b, n_inter,
        |  sa.n + sb.n - n_inter AS n_union,
        |  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard,
        |  TRUE AS sketch_inter_ok, TRUE AS sketch_union_ok
        |FROM inter
        |JOIN sizes sa ON sa.seg = inter.seg_a
        |JOIN sizes sb ON sb.seg = inter.seg_b
        |ORDER BY seg_a, seg_b""".stripMargin)),

    // TK1: KMV/theta sketch set ops over per-day audiences (30 daily
    // buckets at ~2 events/user/day — partially-overlapping user sets,
    // so intersection AND A-not-B are non-degenerate; to bound the
    // pair table the query keeps the first 8 days = 28 pairs) — the
    // sketch family's SUBTRACTION
    // story (estimates HLL cannot produce), with exact truths feeding
    // in-plan ±4/sqrt(k-2) accuracy booleans. k = 64 so the estimators
    // actually engage at sf0.01 (audiences > k) instead of the exact
    // small-set path.
    "tk1_theta_setops" -> Q(
      (s, d) => graft.ops.Stats.kmvThetaSetOps(
          Queries.events(s, d)
            .filter(dayofmonth(col("ts")) <= 8)
            .withColumn("day", expr("CAST(day(ts) AS STRING)")),
          "day", "user_id", k = 64)
        .orderBy("seg_a", "seg_b"),
      Some {
        val k = 64
        val hash = """list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(range(1, 16), j -> CAST(strpos('0123456789abcdef',
          |        substr(md5(CAST(user_id AS VARCHAR)), CAST(j AS INTEGER), 1)) - 1
          |        AS BIGINT))), (acc, x) -> acc * 16 + x)""".stripMargin
        s"""WITH sm AS MATERIALIZED (
           |  SELECT DISTINCT CAST(day(ts) AS VARCHAR) AS seg, $hash AS h
           |  FROM events WHERE day(ts) <= 8),
           |sig AS MATERIALIZED (SELECT seg, h FROM (SELECT seg, h,
           |    row_number() OVER (PARTITION BY seg ORDER BY h) AS r FROM sm)
           |  WHERE r <= $k),
           |per AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_sig,
           |    CASE WHEN count(*) < $k THEN 1152921504606846976
           |         ELSE CAST(max(h) AS BIGINT) END AS theta,
           |    CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
           |         ELSE ${(k - 1).toDouble} * 1.152921504606846976e18
           |           / CAST(max(h) AS DOUBLE) END AS est
           |  FROM sig GROUP BY seg),
           |pr AS MATERIALIZED (SELECT a.seg AS seg_a, b.seg AS seg_b,
           |    least(a.theta, b.theta) AS th, a.est AS est_a, b.est AS est_b
           |  FROM per a JOIN per b ON a.seg < b.seg),
           |ab AS MATERIALIZED (SELECT pr.seg_a, pr.seg_b, pr.th, sa.h,
           |    EXISTS (SELECT 1 FROM sig sb
           |            WHERE sb.seg = pr.seg_b AND sb.h = sa.h) AS in_b
           |  FROM pr JOIN sig sa ON sa.seg = pr.seg_a WHERE sa.h < pr.th),
           |ci AS (SELECT seg_a, seg_b, CAST(count(*) AS BIGINT) AS c_inter
           |  FROM ab WHERE in_b GROUP BY 1, 2),
           |ca AS (SELECT seg_a, seg_b, CAST(count(*) AS BIGINT) AS c_aonly
           |  FROM ab WHERE NOT in_b GROUP BY 1, 2),
           |mg AS (SELECT seg_a, seg_b, h FROM (
           |    SELECT pr.seg_a, pr.seg_b, s2.h,
           |      row_number() OVER (PARTITION BY pr.seg_a, pr.seg_b ORDER BY s2.h) AS r
           |    FROM pr JOIN (SELECT DISTINCT x.seg_a, x.seg_b, x.h FROM (
           |        SELECT p2.seg_a, p2.seg_b, sa2.h FROM pr p2
           |          JOIN sig sa2 ON sa2.seg = p2.seg_a
           |        UNION ALL
           |        SELECT p3.seg_a, p3.seg_b, sb2.h FROM pr p3
           |          JOIN sig sb2 ON sb2.seg = p3.seg_b) x) s2
           |      ON s2.seg_a = pr.seg_a AND s2.seg_b = pr.seg_b)
           |  WHERE r <= $k),
           |mp AS (SELECT seg_a, seg_b,
           |    CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
           |         ELSE ${(k - 1).toDouble} * 1.152921504606846976e18
           |           / CAST(max(h) AS DOUBLE) END AS est_union
           |  FROM mg GROUP BY 1, 2),
           |sizes AS (SELECT seg, CAST(count(*) AS BIGINT) AS n FROM sm GROUP BY 1),
           |ex AS (SELECT x.seg AS seg_a, y.seg AS seg_b,
           |    CAST(count(*) AS BIGINT) AS n_inter
           |  FROM sm x JOIN sm y ON x.h = y.h AND x.seg < y.seg GROUP BY 1, 2),
           |f AS (SELECT pr.seg_a, pr.seg_b, sa.n AS n_a, sb.n AS n_b,
           |    coalesce(ex.n_inter, 0) AS n_inter,
           |    sa.n + sb.n - coalesce(ex.n_inter, 0) AS n_union,
           |    pr.est_a, pr.est_b, mp.est_union,
           |    coalesce(ci.c_inter, 0) * 1.152921504606846976e18
           |      / CAST(pr.th AS DOUBLE) AS est_inter,
           |    coalesce(ca.c_aonly, 0) * 1.152921504606846976e18
           |      / CAST(pr.th AS DOUBLE) AS est_anotb
           |  FROM pr
           |  JOIN sizes sa ON sa.seg = pr.seg_a
           |  JOIN sizes sb ON sb.seg = pr.seg_b
           |  LEFT JOIN ex ON ex.seg_a = pr.seg_a AND ex.seg_b = pr.seg_b
           |  LEFT JOIN ci ON ci.seg_a = pr.seg_a AND ci.seg_b = pr.seg_b
           |  LEFT JOIN ca ON ca.seg_a = pr.seg_a AND ca.seg_b = pr.seg_b
           |  JOIN mp ON mp.seg_a = pr.seg_a AND mp.seg_b = pr.seg_b)
           |SELECT seg_a, seg_b, n_a, n_b, n_inter, n_union,
           |  CAST(floor(est_a * 1e6 + 0.5) AS BIGINT) AS est_a_micro,
           |  CAST(floor(est_b * 1e6 + 0.5) AS BIGINT) AS est_b_micro,
           |  CAST(floor(est_union * 1e6 + 0.5) AS BIGINT) AS est_union_micro,
           |  CAST(floor(est_inter * 1e6 + 0.5) AS BIGINT) AS est_inter_micro,
           |  CAST(floor(est_anotb * 1e6 + 0.5) AS BIGINT) AS est_anotb_micro,
           |  abs(est_union - CAST(n_union AS DOUBLE))
           |    <= ${4.0 / math.sqrt((k - 2).toDouble)} * CAST(n_union AS DOUBLE) + 8.0 AS ok_union,
           |  abs(est_inter - CAST(n_inter AS DOUBLE))
           |    <= ${4.0 / math.sqrt((k - 2).toDouble)} * CAST(n_union AS DOUBLE) + 8.0 AS ok_inter,
           |  abs(est_anotb - CAST(n_a - n_inter AS DOUBLE))
           |    <= ${4.0 / math.sqrt((k - 2).toDouble)} * CAST(n_union AS DOUBLE) + 8.0 AS ok_anotb
           |FROM f ORDER BY seg_a, seg_b""".stripMargin
      }),

    // BF1: Benford first-digit audit of extended prices — digit from
    // the integer cents' decimal string (no float extraction), chi²
    // and Nigrini MAD from pico-quantized cell terms, expected shares
    // as driver-computed literals.
    "bf1_benford" -> Q(
      (s, d) => graft.ops.Stats.benfordAudit(li(s, d), "l_extendedprice")
        .orderBy("digit"),
      Some(BenfordOracle)),

    // GN1: Gini concentration of per-customer revenue — exact decimal
    // revenue quantized to 1e-4 units, rank moments as exact integers
    // (HUGEINT on the oracle side), distributed ranking via
    // range-sort + zipWithIndex (no single-reducer window).
    "gn1_gini" -> Q(
      (s, d) => {
        val rev = li(s, d)
          .join(s.read.parquet(s"$d/orders.parquet"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg((sum(discPrice) * 10000).cast("long").as("rev_q"))
        graft.ops.Stats.gini(rev, "rev_q", "o_custkey")
      },
      Some("""WITH rev AS (SELECT o_custkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |      * 10000 AS BIGINT) AS x
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS rnk
        |  FROM rev),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx,
        |    sum(CAST(rnk AS HUGEINT) * CAST(x AS HUGEINT)) AS six
        |  FROM r)
        |SELECT n, CAST(sx AS BIGINT) AS total_q,
        |  round((2.0 * CAST(six AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS gini
        |FROM m""".stripMargin)),

    // FC1: seasonal-naive forecast backtest — hourly buckets, 24 h
    // season via an equi-join on (key, bucket − season); MAE from
    // exact micro-unit errors, MAPE from pico-quantized terms. The
    // forecasting baseline every model must beat.
    "fc1_seasonal_naive" -> Q(
      (s, d) => graft.ops.TimeSeries.seasonalNaiveBacktest(
          Queries.events(s, d), "event_type", "ts", "value")
        .orderBy("event_type"),
      Some("""WITH qq AS (SELECT event_type AS k, date_trunc('hour', ts) AS b,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q FROM events),
        |bk AS (SELECT k, b, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(q) AS BIGINT) AS sq FROM qq GROUP BY 1, 2),
        |v AS (SELECT k, b,
        |    CAST(floor(CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE) + 0.5) AS BIGINT) AS v_micro
        |  FROM bk),
        |j AS (SELECT c.k, c.v_micro, p.v_micro AS pred
        |  FROM v c LEFT JOIN v p ON p.k = c.k AND p.b + INTERVAL 24 HOURS = c.b)
        |SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_forecast,
        |  round(CAST(sum(CASE WHEN pred IS NOT NULL THEN abs(v_micro - pred) ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / 1e6, 6) AS mae,
        |  round(CAST(sum(CASE WHEN pred IS NOT NULL AND v_micro != 0
        |      THEN CAST(floor(CAST(abs(v_micro - pred) AS DOUBLE)
        |        / CAST(abs(v_micro) AS DOUBLE) * 1e12 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / 1e12, 9) AS mape
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CP1: split-conformal quality gate — τ is the exact k-th order
    // statistic of the calibration half's tx2 quality scores
    // (k = floor(α(n+1)), α = 0.1), coverage checked on the held-out
    // half. The distribution-free guarantee, then its honest audit.
    "cp1_conformal_quality" -> Q(
      (s, d) => {
        val q = Text.withQuality(docs(s, d)).select(col("doc_id"), col("quality_score"))
        graft.ops.Stats.conformalGate(
          q.filter(col("doc_id") % 2 === 0), q.filter(col("doc_id") % 2 === 1),
          "quality_score", "doc_id", alpha = 0.1)
      },
      Some("""WITH q AS (
        |  SELECT doc_id,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |            x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2)
        |      AS score
        |  FROM documents),
        |cal AS (SELECT score, doc_id FROM q WHERE doc_id % 2 = 0),
        |ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |kk AS (SELECT n_cal,
        |    greatest(1, CAST(floor(0.1 * CAST(n_cal + 1 AS DOUBLE)) AS BIGINT)) AS k
        |  FROM ncal),
        |r AS (SELECT score,
        |    CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT) AS rnk FROM cal),
        |tau AS (SELECT score AS tau FROM r, kk WHERE rnk = kk.k),
        |ev AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
        |    CAST(sum(CASE WHEN score >= tau THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        |  FROM q, tau WHERE doc_id % 2 = 1)
        |SELECT kk.n_cal, kk.k, tau.tau, ev.n_eval, ev.n_covered,
        |  CAST(n_covered AS DOUBLE) / CAST(n_eval AS DOUBLE) AS coverage,
        |  CAST(n_covered AS DOUBLE) / CAST(n_eval AS DOUBLE) >= 0.85 AS coverage_ok
        |FROM kk, tau, ev""".stripMargin)),

    // SN1: sorted-neighborhood blocking over customer names — the
    // third blocker family (SIGMOD'95), ranked by range-sort +
    // zipWithIndex, neighbors paired by an exploded equi-join index,
    // levenshtein-verified.
    "sn1_sorted_neighborhood" -> Q(
      (s, d) => graft.ops.Fuzzy.sortedNeighborhoodPairs(
          s.read.parquet(s"$d/customer.parquet"), "c_name", "c_custkey",
          window = 4, maxDist = 2)
        .orderBy("id1", "id2"),
      Some("""WITH r AS (SELECT c_name AS s, c_custkey AS id,
        |    CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT) - 1 AS idx
        |  FROM customer),
        |p AS (SELECT a.id AS id1, b.id AS id2, a.s AS s1, b.s AS s2,
        |    CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |  FROM r a JOIN r b ON b.idx BETWEEN a.idx + 1 AND a.idx + 3)
        |SELECT id1, id2, s1, s2, dist FROM p WHERE dist <= 2
        |ORDER BY id1, id2""".stripMargin)),

    // PH1: exact phrase search over a positional inverted index —
    // postings filtered to the phrase's terms before any join, then
    // one (id, pos−offset) equi-join per extra term. The capability a
    // bag-of-words index cannot express.
    "ph1_phrase_search" -> Q(
      (s, d) => graft.ops.Search.phraseSearch(docs(s, d), Seq("table", "hash"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, CAST(g.i - 1 AS INTEGER) AS pos, toks[g.i] AS tok
        |  FROM t, unnest(generate_series(1, len(toks))) AS g(i)
        |  WHERE toks[g.i] IN ('table', 'hash')),
        |f AS (SELECT doc_id, pos FROM p WHERE tok = 'table'),
        |m AS (SELECT f.doc_id, f.pos FROM f
        |  JOIN p x ON x.doc_id = f.doc_id AND x.tok = 'hash' AND x.pos - 1 = f.pos)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(min(pos) AS BIGINT) AS first_pos
        |FROM m GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // DH1: time-decayed top-k users — per-event 2^(−age/24h) terms
    // pico-quantized before the per-key sum; anchor = max(ts) in-plan,
    // decay constant a driver literal (no wall clock).
    "dh1_decayed_topk" -> Q(
      (s, d) => graft.ops.Search.decayedTopK(
          Queries.events(s, d), "user_id", "ts", halfLifeHours = 24.0, k = 20)
        .orderBy(col("decayed_pico").desc, col("key").asc),
      Some(s"""WITH a AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS now_us FROM events),
        |e AS (SELECT user_id AS key, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
        |t AS (SELECT key, CAST(floor(exp(CAST(now_us - ts_us AS DOUBLE)
        |    * ${java.lang.Double.toString(-math.log(2.0) / (24.0 * 3600e6))})
        |    * 1e12 + 0.5) AS BIGINT) AS term_pico
        |  FROM e, a),
        |g AS (SELECT key, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(term_pico) AS BIGINT) AS decayed_pico FROM t GROUP BY 1)
        |SELECT key, n_events, decayed_pico,
        |  round(CAST(decayed_pico AS DOUBLE) / 1e12, 9) AS decayed
        |FROM g ORDER BY decayed_pico DESC, key LIMIT 20""".stripMargin)),

    // FS1: Fellegi–Sunter probabilistic linkage scoring over the
    // sorted-neighborhood candidates — u rates from exact counts, m a
    // literal, per-pair weight a fixed-order 3-term log sum.
    "fs1_fellegi_sunter" -> Q(
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
          .withColumn("bal_band", floor(col("c_acctbal") / 1000.0).cast("long"))
        val cands = graft.ops.Fuzzy.sortedNeighborhoodPairs(
          cust, "c_name", "c_custkey", window = 4, maxDist = 2)
        graft.ops.Fuzzy.fellegiSunterScores(cust, "c_custkey",
            Seq("c_nationkey", "c_mktsegment", "bal_band"), cands, m = 0.9)
          .orderBy("id1", "id2")
      },
      Some("""WITH c AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band FROM customer),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |u1 AS (SELECT CAST(coalesce(sum(CAST(cv AS HUGEINT) * CAST(cv - 1 AS HUGEINT)), 0)
        |    AS DOUBLE) AS num FROM (SELECT count(*) AS cv FROM c GROUP BY c_nationkey)),
        |u2 AS (SELECT CAST(coalesce(sum(CAST(cv AS HUGEINT) * CAST(cv - 1 AS HUGEINT)), 0)
        |    AS DOUBLE) AS num FROM (SELECT count(*) AS cv FROM c GROUP BY c_mktsegment)),
        |u3 AS (SELECT CAST(coalesce(sum(CAST(cv AS HUGEINT) * CAST(cv - 1 AS HUGEINT)), 0)
        |    AS DOUBLE) AS num FROM (SELECT count(*) AS cv FROM c GROUP BY bal_band)),
        |uu AS (SELECT
        |    u1.num / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS ua,
        |    u2.num / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS ub,
        |    u3.num / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS uc
        |  FROM u1, u2, u3, nn),
        |r AS (SELECT c_name AS s, c_custkey AS id,
        |    CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT) - 1 AS idx
        |  FROM c),
        |p AS (SELECT a.id AS id1, b.id AS id2 FROM r a
        |  JOIN r b ON b.idx BETWEEN a.idx + 1 AND a.idx + 3
        |  WHERE levenshtein(a.s, b.s) <= 2),
        |j AS (SELECT p.id1, p.id2,
        |    x.c_nationkey = y.c_nationkey AS agree_c_nationkey,
        |    x.c_mktsegment = y.c_mktsegment AS agree_c_mktsegment,
        |    x.bal_band = y.bal_band AS agree_bal_band
        |  FROM p JOIN c x ON x.c_custkey = p.id1 JOIN c y ON y.c_custkey = p.id2),
        |w AS (SELECT *,
        |    (CASE WHEN agree_c_nationkey THEN ln(0.9 / ua)
        |          ELSE ln((1.0 - 0.9) / (1.0 - ua)) END
        |   + CASE WHEN agree_c_mktsegment THEN ln(0.9 / ub)
        |          ELSE ln((1.0 - 0.9) / (1.0 - ub)) END
        |   + CASE WHEN agree_bal_band THEN ln(0.9 / uc)
        |          ELSE ln((1.0 - 0.9) / (1.0 - uc)) END) AS wt
        |  FROM j, uu)
        |SELECT id1, id2, agree_c_nationkey, agree_c_mktsegment, agree_bal_band,
        |  round(wt, 6) AS weight, wt > 0 AS is_match
        |FROM w ORDER BY id1, id2""".stripMargin)),

    // AC1: classification report of the stopword langid against the
    // lang ground truth — per-class tp/fp/fn, single-division P/R/F1,
    // overall accuracy with its Wilson 95% interval, macro-F1.
    "ac1_langid_eval" -> Q(
      (s, d) => graft.ops.Stats.classificationReport(
          Text.withLangId(docs(s, d)), "lang_pred", "lang")
        .orderBy("cls"),
      Some("""WITH t AS (SELECT doc_id, lang,
        |    string_split(lower(text), ' ') AS toks FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS INTEGER) AS score_en,
        |  CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))) AS INTEGER) AS score_es,
        |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et','une'], x))) AS INTEGER) AS score_fr
        |  FROM t),
        |p AS (SELECT lang AS label,
        |  CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
        |       WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
        |       WHEN score_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS pred
        |  FROM sc),
        |cells AS (SELECT label, pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
        |pt AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS n_pred FROM cells GROUP BY 1),
        |lt AS (SELECT label AS cls, CAST(sum(n) AS BIGINT) AS n_label FROM cells GROUP BY 1),
        |dg AS (SELECT label AS cls, n AS tp FROM cells WHERE label = pred),
        |pc AS (SELECT cls,
        |    CAST(coalesce(tp, 0) AS BIGINT) AS tp,
        |    CAST(coalesce(n_pred, 0) - coalesce(tp, 0) AS BIGINT) AS fp,
        |    CAST(coalesce(n_label, 0) - coalesce(tp, 0) AS BIGINT) AS fn
        |  FROM pt FULL OUTER JOIN lt USING (cls) LEFT JOIN dg USING (cls)),
        |pr AS (SELECT *,
        |    CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
        |         ELSE 0.0 END AS precision,
        |    CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
        |         ELSE 0.0 END AS recall,
        |    CASE WHEN 2 * tp + fp + fn > 0
        |         THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
        |         ELSE 0.0 END AS f1
        |  FROM pc),
        |sm AS (SELECT CAST(sum(tp) AS BIGINT) AS n_correct,
        |    CAST(sum(tp) + sum(fp) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(sum(CAST(floor(f1 * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS f1_pico
        |  FROM pr),
        |sc2 AS (SELECT
        |    CAST(n_correct AS DOUBLE) / CAST(n_total AS DOUBLE) AS accuracy,
        |    CAST(f1_pico AS DOUBLE) / CAST(n_classes AS DOUBLE) / 1e12 AS macro_f1,
        |    CAST(n_total AS DOUBLE) AS nd
        |  FROM sm),
        |zz AS (SELECT CAST(1.96 AS DOUBLE) AS z,
        |    CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2),
        |ci AS (SELECT round(accuracy, 9) AS accuracy, round(macro_f1, 9) AS macro_f1,
        |    round((accuracy + z2 / (2.0 * nd)
        |      - z * sqrt(accuracy * (1.0 - accuracy) / nd + z2 / (4.0 * nd * nd)))
        |      / (1.0 + z2 / nd), 9) AS wilson_lo,
        |    round((accuracy + z2 / (2.0 * nd)
        |      + z * sqrt(accuracy * (1.0 - accuracy) / nd + z2 / (4.0 * nd * nd)))
        |      / (1.0 + z2 / nd), 9) AS wilson_hi
        |  FROM sc2, zz)
        |SELECT cls, tp, fp, fn, round(precision, 9) AS precision,
        |  round(recall, 9) AS recall, round(f1, 9) AS f1,
        |  accuracy, macro_f1, wilson_lo, wilson_hi
        |FROM pr, ci ORDER BY cls""".stripMargin)),

    // PAV1: isotonic calibration of the qs1 quality score via the
    // closed minimax PAVA form (max-min of micro-quantized segment
    // means over the bin prefix sums) — the monotone corrected score
    // cal1's diagnosis feeds; the lattice is nBuckets³-bounded so the
    // fit is constant-cost at any corpus size.
    "pav1_isotonic_fit" -> Q(
      (s, d) => {
        val scored = Curate.lrQualityScore(docs(s, d))
          .withColumn("is_unique",
            (count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text")))) === 1).cast("long"))
        Curate.isotonicCalibration(scored, "lr_score", "is_unique")
          .orderBy("bucket")
      },
      Some("""WITH q AS (
        |  SELECT doc_id, text,
        |    CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
        |  FROM documents),
        |sc AS (SELECT doc_id, text,
        |    1.0 / (1.0 + exp(0.0 - (-2.0 + alpha_ratio * 3.0 + stopword_ratio * 2.5
        |      + mean_word_len * 0.15 - punct_ratio * 4.0))) AS s
        |  FROM q),
        |lab AS (SELECT doc_id, s,
        |    CAST(count(*) OVER (PARTITION BY md5(text)) = 1 AS BIGINT) AS y
        |  FROM sc),
        |bins AS (SELECT CAST(least(floor(s * 10), 9) AS INTEGER) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM lab GROUP BY 1),
        |c AS (SELECT bucket, n, n_pos,
        |    sum(n_pos) OVER w AS cp, sum(n) OVER w AS cn FROM bins
        |  WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)),
        |cj AS (SELECT bucket AS j, cp - n_pos AS cpj, cn - n AS cnj FROM c),
        |ck AS (SELECT bucket AS k, cp AS cpk, cn AS cnk FROM c),
        |r AS (SELECT j, k, (cpk - cpj) * 1000000 // (cnk - cnj) AS rm
        |  FROM cj JOIN ck ON j <= k),
        |t1 AS (SELECT b.bucket AS b, r.j, min(r.rm) AS mn
        |  FROM bins b JOIN r ON r.j <= b.bucket AND r.k >= b.bucket
        |  GROUP BY 1, 2),
        |iso AS (SELECT b, CAST(max(mn) AS BIGINT) AS iso_micro FROM t1 GROUP BY 1)
        |SELECT bins.bucket, bins.n, bins.n_pos, iso.iso_micro,
        |  round(CAST(iso.iso_micro AS DOUBLE) / 1e6, 6) AS iso_rate
        |FROM bins JOIN iso ON iso.b = bins.bucket ORDER BY bucket""".stripMargin)),

    // FK1: Fleiss' kappa across THREE raters — the two langid
    // pipelines plus the lang ground truth — the multi-labeler
    // agreement gate beside kp1's two-rater Cohen form.
    "fk1_fleiss_kappa" -> Q(
      (s, d) => graft.ops.Stats.fleissKappa(
          Text.withLangIdNgram(Text.withLangId(docs(s, d))),
          "doc_id", Seq("lang_pred", "ng_lang_pred", "lang"))
        .orderBy("cat"),
      Some("""WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks,
        |    lower(text) AS lt, greatest(CAST(length(text) AS DOUBLE), 1.0) AS nn
        |  FROM documents),
        |sc AS (SELECT doc_id, lang, lt, nn,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS INTEGER) AS score_en,
        |  CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))) AS INTEGER) AS score_es,
        |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et','une'], x))) AS INTEGER) AS score_fr
        |  FROM t),
        |r1 AS (SELECT doc_id, lang,
        |  CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
        |       WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
        |       WHEN score_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS p1, lt, nn
        |  FROM sc),
        |ng AS (SELECT doc_id, lang, p1,
        |  (CAST((length(lt) - length(replace(lt, 'th', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'he', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'in', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'er', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'an', ''))) / 2 AS DOUBLE)) / nn AS ng_en,
        |  (CAST((length(lt) - length(replace(lt, 'de', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'la', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'os', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ue', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ción', ''))) / 4 AS DOUBLE)) / nn AS ng_es,
        |  (CAST((length(lt) - length(replace(lt, 'le', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ou', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'es', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'ai', ''))) / 2
        |      + (length(lt) - length(replace(lt, 'eau', ''))) / 3 AS DOUBLE)) / nn AS ng_fr
        |  FROM r1),
        |r2 AS (SELECT doc_id, lang, p1,
        |  CASE WHEN ng_en >= ng_es AND ng_en >= ng_fr AND ng_en > 0 THEN 'en'
        |       WHEN ng_es >= ng_fr AND ng_es > 0 THEN 'es'
        |       WHEN ng_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS p2
        |  FROM ng),
        |lng AS (SELECT doc_id, p1 AS cat FROM r2
        |  UNION ALL SELECT doc_id, p2 FROM r2
        |  UNION ALL SELECT doc_id, lang FROM r2),
        |nic AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS n_ic
        |  FROM lng GROUP BY 1, 2),
        |sm AS (SELECT CAST(sum(n_ic * (n_ic - 1)) AS BIGINT) AS s,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_items FROM nic),
        |ct AS (SELECT cat, CAST(sum(n_ic) AS BIGINT) AS cat_n FROM nic GROUP BY 1),
        |wp AS (SELECT cat, cat_n,
        |    CAST(cat_n AS DOUBLE) / CAST(n_items * 3 AS DOUBLE) AS p_c,
        |    CAST(floor(CAST(cat_n AS DOUBLE) / CAST(n_items * 3 AS DOUBLE)
        |      * (CAST(cat_n AS DOUBLE) / CAST(n_items * 3 AS DOUBLE))
        |      * 1e12 + 0.5) AS BIGINT) AS pe_pico,
        |    n_items, s
        |  FROM ct, sm),
        |sc3 AS (SELECT min(n_items) AS n_items, min(s) AS s,
        |    CAST(sum(pe_pico) AS BIGINT) AS pe_pico_sum FROM wp),
        |fin AS (SELECT n_items,
        |    CAST(s AS DOUBLE) / CAST(n_items * 6 AS DOUBLE) AS p_bar,
        |    CAST(pe_pico_sum AS DOUBLE) / 1e12 AS p_e
        |  FROM sc3)
        |SELECT wp.cat, wp.cat_n, round(wp.p_c, 9) AS p_c,
        |  fin.n_items, CAST(3 AS INTEGER) AS n_raters,
        |  round(fin.p_bar, 9) AS p_bar, round(fin.p_e, 9) AS p_e,
        |  round((fin.p_bar - fin.p_e) / (1.0 - fin.p_e), 9) AS kappa
        |FROM wp, fin ORDER BY wp.cat""".stripMargin)),

    // CAL1: reliability diagram + ECE for the qs1 quality classifier
    // against the "document is exact-unique" label — the calibration
    // audit a thresholded keep rule needs.
    "cal1_calibration" -> Q(
      (s, d) => {
        val scored = Curate.lrQualityScore(docs(s, d))
          .withColumn("is_unique",
            (count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text")))) === 1).cast("long"))
        graft.ops.Curate.calibrationReport(scored, "lr_score", "is_unique")
          .orderBy("bucket")
      },
      Some("""WITH q AS (
        |  SELECT doc_id, text,
        |    CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
        |  FROM documents),
        |sc AS (SELECT doc_id, text,
        |    1.0 / (1.0 + exp(0.0 - (-2.0 + alpha_ratio * 3.0 + stopword_ratio * 2.5
        |      + mean_word_len * 0.15 - punct_ratio * 4.0))) AS s
        |  FROM q),
        |lab AS (SELECT doc_id, s,
        |    CAST(count(*) OVER (PARTITION BY md5(text)) = 1 AS BIGINT) AS y
        |  FROM sc),
        |bn AS (SELECT CAST(least(floor(s * 10), 9) AS INTEGER) AS bucket,
        |    s, y, CAST(floor(s * 1e6 + 0.5) AS BIGINT) AS sq
        |  FROM lab),
        |bins AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(sq) AS BIGINT) AS pred_micro
        |  FROM bn GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM bins),
        |rr AS (SELECT bucket, n, n_pos,
        |    CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |    CAST(pred_micro AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 AS mean_pred,
        |    CAST(floor(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)
        |      * abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |            - CAST(pred_micro AS DOUBLE) / CAST(n AS DOUBLE) / 1e6)
        |      * 1e12 + 0.5) AS BIGINT) AS ece_pico
        |  FROM bins, tot),
        |e AS (SELECT CAST(sum(ece_pico) AS DOUBLE) / 1e12 AS ece FROM rr)
        |SELECT bucket, n, n_pos, round(rate, 9) AS rate,
        |  round(mean_pred, 9) AS mean_pred, round(e.ece, 9) AS ece
        |FROM rr, e ORDER BY bucket""".stripMargin)),

    // QN1: quantile normalization of per-source quality scores onto
    // the pooled distribution — the batch-effect correction that stops
    // a hot-running scorer from dominating a thresholded keep rule.
    "qn1_quantile_norm" -> Q(
      (s, d) => graft.ops.Curate.quantileNormalize(
          Text.withQuality(docs(s, d))
            .select(col("doc_id"), col("source"), col("quality_score")),
          "quality_score", "source", "doc_id")
        .orderBy("doc_id"),
      Some("""WITH q AS (
        |  SELECT doc_id, source,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |            x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2)
        |      AS quality_score
        |  FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |r AS (SELECT doc_id, source, quality_score,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY quality_score, doc_id) AS BIGINT) - 1 AS rr,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
        |  FROM q),
        |x AS (SELECT doc_id, source, quality_score,
        |    CASE WHEN ns > 1 THEN CAST(rr AS DOUBLE) / CAST(ns - 1 AS DOUBLE)
        |         ELSE 0.5 END AS qq
        |  FROM r),
        |ix AS (SELECT x.*, CAST(floor(qq * CAST(nn.n - 1 AS DOUBLE) + 0.5) AS BIGINT)
        |    AS pidx FROM x, nn),
        |pooled AS (SELECT quality_score AS norm_value,
        |    CAST(row_number() OVER (ORDER BY quality_score, doc_id) AS BIGINT) - 1 AS pidx
        |  FROM q)
        |SELECT ix.doc_id, ix.source, ix.quality_score, pooled.norm_value
        |FROM ix JOIN pooled USING (pidx) ORDER BY ix.doc_id""".stripMargin)),

    // DP1: ε-differentially-private count release — Laplace(1/ε) via
    // the inverse CDF over the repo's portable md5 uniform; true_n is
    // emitted for the gate only (a real release ships noisy_n alone).
    "dp1_dp_release" -> Q(
      (s, d) => graft.ops.Curate.dpCountRelease(
          Queries.events(s, d), "event_type", epsilon = 1.0)
        .orderBy("key"),
      Some("""WITH c AS (SELECT event_type AS key, CAST(count(*) AS BIGINT) AS true_n
        |  FROM events GROUP BY 1),
        |uu AS (SELECT key, true_n,
        |    (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 9),
        |        i -> CAST(strpos('0123456789abcdef',
        |               substr(md5(key || ':dp1'), i, 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS DOUBLE) + 0.5) / 4294967296.0 AS u
        |  FROM c),
        |n AS (SELECT key, true_n, u - 0.5 AS cen FROM uu)
        |SELECT key, true_n,
        |  round(CAST(true_n AS DOUBLE)
        |    + -(CASE WHEN cen > 0 THEN 1.0 WHEN cen < 0 THEN -1.0 ELSE 0.0 END)
        |      * ln(1.0 - 2.0 * abs(cen)) / 1.0, 6) AS noisy_n,
        |  CAST(1.0 AS DOUBLE) AS epsilon
        |FROM n ORDER BY key""".stripMargin)),

    // GC1: grid-density clustering of the embedding projection — the
    // DBSCAN-family first pass: dense cells merge through the
    // 8-neighborhood (connected components on the CELL graph), sparse
    // cells are noise. Oracle = recursive-CTE closure over the same
    // integer cell graph.
    "gc1_grid_density" -> Q(
      (s, d) => graft.ops.Similarity.gridDensityClusters(embs(s, d))
        .orderBy("cluster_id"),
      Some("""WITH RECURSIVE p AS (SELECT vec_id AS id,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05) AS BIGINT) AS cx,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05) AS BIGINT) AS cy
        |  FROM embeddings),
        |cells AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
        |dense AS (SELECT cx, cy, n,
        |    (cx + 1000) * 100000 + (cy + 1000) AS cell_id
        |  FROM cells WHERE n >= 10),
        |ed AS (SELECT a.cell_id AS src, b.cell_id AS dst
        |  FROM dense a JOIN dense b
        |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
        |   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
        |   AND NOT (b.cx = a.cx AND b.cy = a.cy)),
        |reach(v, r) AS (
        |  SELECT cell_id, cell_id FROM dense
        |  UNION
        |  SELECT ed.dst, reach.r FROM reach JOIN ed ON ed.src = reach.v),
        |cl AS (SELECT v, min(r) AS cluster FROM reach GROUP BY v),
        |dp AS (SELECT p.id, p.cx, p.cy, cl.cluster
        |  FROM p JOIN dense dd ON dd.cx = p.cx AND dd.cy = p.cy
        |  JOIN cl ON cl.v = dd.cell_id),
        |agg AS (SELECT cluster AS cluster_id,
        |    CAST(count(DISTINCT (cx + 1000) * 100000 + (cy + 1000)) AS BIGINT) AS n_cells,
        |    CAST(count(*) AS BIGINT) AS n_points
        |  FROM dp GROUP BY 1),
        |noise AS (SELECT CAST(-1 AS BIGINT) AS cluster_id, CAST(0 AS BIGINT) AS n_cells,
        |    CAST(count(*) AS BIGINT) AS n_points
        |  FROM p WHERE NOT EXISTS (SELECT 1 FROM dense dd
        |    WHERE dd.cx = p.cx AND dd.cy = p.cy))
        |SELECT * FROM agg UNION ALL SELECT * FROM noise ORDER BY cluster_id""".stripMargin)),

    // NP1: nucleus (top-p) successor sets of the corpus bigram LM —
    // membership decided entirely in integers ((cum−c)·10 < 9·total),
    // one window per context.
    "np1_nucleus_vocab" -> Q(
      (s, d) => graft.ops.Text.nucleusVocab(docs(s, d)).orderBy("t1"),
      Some("""WITH tk AS (SELECT doc_id, g.i AS pos, toks[g.i] AS tok
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |    unnest(generate_series(1, len(toks))) AS g(i)
        |  WHERE length(toks[g.i]) > 0),
        |big AS (SELECT x.tok AS t1, y.tok AS t2, CAST(count(*) AS BIGINT) AS c
        |  FROM tk x JOIN tk y ON x.doc_id = y.doc_id AND y.pos = x.pos + 1
        |  GROUP BY 1, 2),
        |tot AS (SELECT t1, CAST(sum(c) AS BIGINT) AS total FROM big
        |  GROUP BY 1 HAVING sum(c) >= 50),
        |r AS (SELECT big.t1, t2, c, total,
        |    CAST(sum(c) OVER (PARTITION BY big.t1 ORDER BY c DESC, t2
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM big JOIN tot USING (t1))
        |SELECT t1, CAST(min(total) AS BIGINT) AS total,
        |  CAST(count(*) AS BIGINT) AS nucleus_n,
        |  CAST(max(cum) AS BIGINT) AS nucleus_c,
        |  round(CAST(max(cum) AS DOUBLE) / CAST(min(total) AS DOUBLE), 9) AS nucleus_mass
        |FROM r WHERE (cum - c) * 10 < 9 * total
        |GROUP BY t1 ORDER BY t1""".stripMargin)),

    // JW1: Jaro–Winkler scoring of sorted-neighborhood candidate
    // pairs via the native codegen expression — semantics pinned to
    // DuckDB's jaro_winkler_similarity, so the native kernel gets a
    // direct cross-engine value check (the tx4 discipline for native
    // expressions).
    "jw1_jaro_winkler" -> Q(
      (s, d) => {
        val pairs = graft.ops.Fuzzy.sortedNeighborhoodPairs(
          s.read.parquet(s"$d/customer.parquet"), "c_name", "c_custkey",
          window = 3, maxDist = 1000)
        pairs.withColumn("jw",
            round(graft.ops.Fuzzy.jaroWinklerCol(col("s1"), col("s2")), 6))
          .orderBy("id1", "id2")
      },
      Some("""WITH r AS (SELECT c_name AS s, c_custkey AS id,
        |    CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT) - 1 AS idx
        |  FROM customer),
        |p AS (SELECT a.id AS id1, b.id AS id2, a.s AS s1, b.s AS s2,
        |    CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |  FROM r a JOIN r b ON b.idx BETWEEN a.idx + 1 AND a.idx + 2)
        |SELECT id1, id2, s1, s2, dist,
        |  round(jaro_winkler_similarity(s1, s2), 6) AS jw
        |FROM p ORDER BY id1, id2""".stripMargin)),

    // RD1: Flesch reading ease + Flesch–Kincaid grade — vowel-group
    // syllables and terminal-punctuation sentences as exact integer
    // counts, scores in fixed-order double arithmetic.
    "rd1_readability" -> Q(
      (s, d) => Text.withReadability(docs(s, d))
        .select(col("doc_id"), col("rd_words"), col("rd_sentences"),
          col("rd_syllables"), round(col("flesch_ease"), 6).as("flesch_ease"),
          round(col("fk_grade"), 6).as("fk_grade"))
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT doc_id,
        |    greatest(1, CAST(len(list_filter(string_split(text, ' '),
        |      w -> length(w) > 0)) AS BIGINT)) AS rd_words,
        |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
        |      AS rd_sentences,
        |    greatest(1, CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT))
        |      AS rd_syllables
        |  FROM documents)
        |SELECT doc_id, rd_words, rd_sentences, rd_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(rd_words AS DOUBLE) / CAST(rd_sentences AS DOUBLE))
        |    - 84.6 * (CAST(rd_syllables AS DOUBLE) / CAST(rd_words AS DOUBLE)), 6)
        |    AS flesch_ease,
        |  round(0.39 * (CAST(rd_words AS DOUBLE) / CAST(rd_sentences AS DOUBLE))
        |    + 11.8 * (CAST(rd_syllables AS DOUBLE) / CAST(rd_words AS DOUBLE))
        |    - 15.59, 6) AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin)),

    // NB1: the TRAINED-classifier family opener — multinomial Naive
    // Bayes learned ON the corpus (class = source) and applied back to
    // every document, the fastText-style source/domain classifier of a
    // curation pipeline. Closed-form counts train in one combinable
    // (class, token) shuffle; the oracle retrains AND rescores from
    // scratch, so the hash match value-checks the whole model, not just
    // the argmax.
    "nb1_nb_source_classify" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        val model = Classify.naiveBayesTrain(dd)
        Classify.naiveBayesClassify(dd, model)
          .join(dd.select(col("doc_id"), col("source").as("actual")), "doc_id")
          .select(col("doc_id"), col("actual"), col("pred"),
            round(col("score"), 6).as("score"),
            (col("pred") === col("actual")).as("correct"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
        |  SELECT doc_id, source, t AS tok
        |  FROM (SELECT doc_id, source,
        |          unnest(string_split(lower(text), ' ')) AS t FROM documents)
        |  WHERE t <> ''),
        |cnts AS (SELECT source AS cls, tok, CAST(count(*) AS DOUBLE) AS cnt
        |         FROM tk GROUP BY 1, 2),
        |tot AS (SELECT cls, sum(cnt) AS total FROM cnts GROUP BY 1),
        |voc AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM tk),
        |nd AS (SELECT source AS cls, CAST(count(*) AS DOUBLE) AS ndocs
        |       FROM documents GROUP BY 1),
        |ntot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |cstat AS (SELECT tot.cls, ln(nd.ndocs / ntot.n) AS log_prior,
        |            ln(1.0 / (tot.total + voc.v)) AS log_default
        |          FROM tot JOIN nd ON nd.cls = tot.cls CROSS JOIN voc CROSS JOIN ntot),
        |likes AS (SELECT c.cls, c.tok,
        |            ln((c.cnt + 1.0) / (t.total + voc.v)) AS log_like
        |          FROM cnts c JOIN tot t ON t.cls = c.cls CROSS JOIN voc),
        |dl AS (SELECT d.doc_id, COALESCE(t.n_toks, CAST(0 AS DOUBLE)) AS n_toks
        |       FROM documents d LEFT JOIN
        |         (SELECT doc_id, CAST(count(*) AS DOUBLE) AS n_toks
        |          FROM tk GROUP BY 1) t ON t.doc_id = d.doc_id),
        |m AS (SELECT tk.doc_id, l.cls, sum(l.log_like) AS s_match,
        |        CAST(count(*) AS DOUBLE) AS n_match
        |      FROM tk JOIN likes l ON l.tok = tk.tok GROUP BY 1, 2),
        |sc AS (SELECT dl.doc_id, cstat.cls,
        |         cstat.log_prior + COALESCE(m.s_match, 0) +
        |         (dl.n_toks - COALESCE(m.n_match, 0)) * cstat.log_default AS score
        |       FROM dl CROSS JOIN cstat
        |       LEFT JOIN m ON m.doc_id = dl.doc_id AND m.cls = cstat.cls),
        |best AS (SELECT doc_id, cls AS pred, score,
        |           row_number() OVER (PARTITION BY doc_id
        |             ORDER BY score DESC, cls ASC) AS rn FROM sc)
        |SELECT b.doc_id, d.source AS actual, b.pred,
        |  round(b.score, 6) AS score, b.pred = d.source AS correct
        |FROM best b JOIN documents d ON d.doc_id = b.doc_id
        |WHERE b.rn = 1 ORDER BY b.doc_id""".stripMargin)),

    // GNB1: Gaussian NB on the labeled embeddings — the cheap
    // generative audit of whether the label structure is present in the
    // vector space. Training collects a bounded classes×dims moment
    // table (the PCA collect discipline) and scoring is ONE narrow
    // codegen pass over plan-time literal arrays: zero joins, zero
    // shuffles, in-order per-dim folds mirrored by the oracle.
    "gnb1_gaussian_nb" -> Q(
      (s, d) => {
        val e = embs(s, d)
        Classify.gaussianNbClassify(e, Classify.gaussianNbTrain(e))
          .orderBy("vec_id")
      },
      Some(OracleGen.gnb1Sql(64))),

    // CS1: Gonzalez farthest-first k-center coreset over the embedding
    // table — the 2-approx cover-selection behind coreset/active-
    // learning batch picks; each pick one narrow scan, the emitted
    // distance-at-pick sequence is the cover-radius curve. The oracle
    // replays all 8 integer argmax picks as unrolled CTEs.
    "cs1_kcenter_coreset" -> Q(
      (s, d) => graft.ops.Similarity.kCenterCoreset(embs(s, d), k = 8)
        .orderBy("step"),
      Some(OracleGen.cs1Sql(8, 64))),

    // BT1: Bradley–Terry strengths over sources from deterministic
    // doc-pair preferences (longer doc wins its pair; same-source pairs
    // excluded) — the preference-data fit behind reward-model curation.
    // 8 MM iterations in exact integer micro-unit arithmetic, unrolled
    // by the oracle; the one corpus-sized pass is the pair aggregation.
    "bt1_bradley_terry" -> Q(
      (s, d) => {
        val dd = docs(s, d).select(col("doc_id"), col("source"),
          size(Dedup.tokens(col("text"))).cast("long").as("__nt"))
        val pr = dd.withColumn("__pair", expr("doc_id div 2"))
          .groupBy("__pair")
          .agg(count(lit(1)).as("__c"),
            expr("max_by(source, struct(__nt, -doc_id))").as("w"),
            expr("min_by(source, struct(__nt, -doc_id))").as("l"))
          .filter(col("__c") === 2 && col("w") =!= col("l"))
        Classify.bradleyTerry(pr, "w", "l", iters = 8).orderBy("item")
      },
      Some(OracleGen.bt1Sql(8))),

    // BT2: the UNCAPPED distributed Bradley–Terry (join-iterative MM,
    // closing the bt1 >64-item advisory) gated as a j5-style
    // equivalence row: both formulations run on the SAME pairs and the
    // oracle expects the distributed strengths to equal bt1's exactly
    // (strength_diff ≡ 0 — integer floor-division state makes the two
    // bit-identical, not merely close).
    "bt2_bt_distributed" -> Q(
      (s, d) => {
        val dd = docs(s, d).select(col("doc_id"), col("source"),
          size(Dedup.tokens(col("text"))).cast("long").as("__nt"))
        val pr = dd.withColumn("__pair", expr("doc_id div 2"))
          .groupBy("__pair")
          .agg(count(lit(1)).as("__c"),
            expr("max_by(source, struct(__nt, -doc_id))").as("w"),
            expr("min_by(source, struct(__nt, -doc_id))").as("l"))
          .filter(col("__c") === 2 && col("w") =!= col("l"))
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        // 4 MM rounds: the bit-identity law is per-round (ClassifySpec
        // proves it at 8 on toy data); the gate needs the distributed
        // path exercised, not convergence — half the rounds, half the
        // bench cost
        val dist = Classify.bradleyTerryDistributed(pr, "w", "l", iters = 4)
        val ref = Classify.bradleyTerry(pr, "w", "l", iters = 4)
          .select(col("item"), col("strength").as("strength_ref"))
        dist.join(ref, "item")
          .select(col("item"), col("n_wins"), col("n_comparisons"),
            col("strength"),
            (col("strength") - col("strength_ref")).as("strength_diff"))
          .orderBy("item")
      },
      Some("SELECT item, n_wins, n_comparisons, strength, CAST(0.0 AS DOUBLE) AS strength_diff\n" +
        s"FROM (${OracleGen.bt1Sql(4)}) ORDER BY item")),

    // SQ1: shuffle-quality audit over cur7's epoch shuffle — per shard
    // the source-mix entropy, max single-source share and KL to the
    // global mix; the trainer-side acceptance gate that catches a
    // degenerate shard assignment before GPU time is spent.
    "sq1_shuffle_quality" -> Q(
      (s, d) => Curate.shuffleQualityReport(
          Curate.epochShuffle(docs(s, d), nShards = 8, seed = 1L))
        .select(col("shard"), col("n_docs"), col("n_sources"),
          round(col("entropy"), 6).as("entropy"),
          round(col("max_share"), 6).as("max_share"),
          round(col("kl"), 6).as("kl"))
        .orderBy("shard"),
      Some("""WITH h AS (SELECT doc_id, source,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5('1:' || CAST(doc_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) % 8 AS INTEGER) AS shard
        |  FROM documents),
        |cell AS (SELECT shard, source, CAST(count(*) AS DOUBLE) AS c FROM h GROUP BY 1, 2),
        |st AS (SELECT shard, sum(c) AS stot FROM cell GROUP BY 1),
        |g AS (SELECT source, CAST(count(*) AS DOUBLE) AS gc FROM documents GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents),
        |m AS (SELECT cell.shard,
        |        CAST(max(st.stot) AS BIGINT) AS n_docs,
        |        CAST(count(*) AS BIGINT) AS n_sources,
        |        round(sum(-(c / stot) * ln(c / stot)), 6) AS entropy,
        |        round(max(c / stot), 6) AS max_share,
        |        round(sum((c / stot) * ln((c / stot) / (gc / nn))), 6) AS kl
        |      FROM cell JOIN st USING (shard) JOIN g USING (source) CROSS JOIN n
        |      GROUP BY 1)
        |SELECT shard, n_docs, n_sources, entropy, max_share, kl
        |FROM m ORDER BY shard""".stripMargin)),

    // KG1: mutual-kNN graph communities over the embeddings — IVF
    // candidate generation (the ss5 scale path, NOT the n² brute
    // force), a mutual top-k filter that prunes hub vectors, and the
    // dd7 connected-components machinery. The embedding-space analog of
    // near-dup clustering, used for topic/near-domain discovery.
    // The edges + components come from mutualKnnCc — materialized ONCE
    // per corpus and shared with gr3 (modularity), the production shape
    // for a clustering every downstream audit reads.
    "kg1_mutual_knn_clusters" -> Q(
      (s, d) => {
        val (_, cc) = mutualKnnCc(s, d)
        val sizes = cc.groupBy("cluster").agg(count(lit(1)).cast("long").as("csize"))
        cc.join(sizes, "cluster").select(col("v"), col("cluster"), col("csize"))
          .orderBy("v")
      },
      Some(OracleGen.kg1Sql())),

    // ANN3: the BUILD-ONCE / QUERY-MANY index lifecycle — the IVF cell
    // assignment is computed once, published as a crash-safe
    // VersionedDir snapshot (the dd12 sig-store pattern applied to ANN
    // indexes), reloaded, and queried. Oracle = ss5's from-scratch
    // recompute, so a hash match proves the persisted index is lossless
    // and the split build/query path is bit-identical to the fused one.
    "ann3_persisted_ivf" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val cents = Similarity.fixedCentroids(16, 64)
        val store = Queries.scratch("ivf_index")
        graft.ingest.VersionedDir.publish(
          Similarity.ivfIndex(par(e), cents), store, 1L)
        val idx = graft.ingest.VersionedDir.current(s, store).get
        Similarity.ivfQueryIndex(idx, e.filter(col("vec_id") < 8),
            k = 5, nProbe = 6, centroids = cents)
          .select(col("q_id"), col("n_id"), col("rank"),
            round(col("sim"), 6).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some(OracleGen.ss5Sql())),

    // ANN5: STREAMING IVF index maintenance — embedding batches drain
    // through an AvailableNow stream; each micro-batch assigns its rows
    // to cells (one narrow pass over plan-time centroid literals) and
    // commits an epoch-keyed index fragment (overwrite-per-epoch = the
    // SigStore replay-idempotent contract; cell assignment is per-row,
    // so fragments union losslessly — the property that makes IVF
    // ingest streamable at all). Queries read the fragment union.
    // Oracle = ss5's from-scratch recompute: a hash match proves the
    // stream-built index ≡ the batch-built index ≡ the fused path.
    "ann5_stream_ivf" -> Q(
      (s, d) => Queries.withStreamShuffle(s) {
        import org.apache.spark.sql.streaming.Trigger
        val e = embs(s, d)
        val cents = Similarity.fixedCentroids(16, 64)
        val srcDir = Queries.scratchOnce("ann5_src", d)(
          e.repartition(2).write.mode("overwrite").parquet(_))
        val store = Queries.scratch("ann5_index")
        s.readStream.schema(e.schema).option("maxFilesPerTrigger", 1)
          .parquet(srcDir)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", Queries.scratch("ann5_ckpt"))
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            if (!batch.isEmpty)
              Similarity.ivfIndex(batch, cents)
                .write.mode("overwrite").parquet(s"$store/epoch=$batchId"): Unit
          }
          .start().awaitTermination()
        val idx = s.read.parquet(store)
        Similarity.ivfQueryIndex(idx, e.filter(col("vec_id") < 8),
            k = 5, nProbe = 6, centroids = cents)
          .select(col("q_id"), col("n_id"), col("rank"),
            round(col("sim"), 6).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some(OracleGen.ss5Sql())),

    // DD16: the dedup-CONFIG audit — raw band-collision candidates
    // (what the verify bill scales with) scored against exact-Jaccard
    // truth on the sample: confusion cells + precision/recall/F1 in one
    // row. The number you look at before committing a (hashes, bands)
    // scheme to the full corpus.
    // DD18: cross-source near-dup MATRIX — where the duplication
    // actually lives: MinHash-LSH pairs (the dd3 portable path) rolled
    // up into an unordered (source_a, source_b) count table. Off-
    // diagonal mass = cross-source contamination (mirrors, scrapes of
    // scrapes); diagonal mass = within-source redundancy. Pairs carry
    // ids only; sources join per surviving pair.
    "dd18_crossdup_matrix" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        val pairs = Dedup.minhashLshPairsPortable(par(dd), threshold = 0.5)
          .select("d1", "d2")
        val src = dd.select(col("doc_id"), col("source"))
        pairs.join(src.toDF("d1", "src1"), "d1")
          .join(src.toDF("d2", "src2"), "d2")
          .select(least(col("src1"), col("src2")).as("source_a"),
            greatest(col("src1"), col("src2")).as("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).cast("long").as("n_pairs"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH p AS (${OracleGen.dd3pSql(0.5)}),
        |sa AS (SELECT doc_id, source FROM documents)
        |SELECT least(s1.source, s2.source) AS source_a,
        |  greatest(s1.source, s2.source) AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p JOIN sa s1 ON s1.doc_id = p.d1 JOIN sa s2 ON s2.doc_id = p.d2
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    "dd16_lsh_eval" -> Q(
      (s, d) => Dedup.lshEvalReport(par(docs(s, d)), threshold = 0.5)
        .select(col("n_truth"), col("n_cand"), col("tp"), col("fp"), col("fn"),
          round(col("prec"), 6).as("prec"), round(col("rec"), 6).as("rec"),
          round(col("f1"), 6).as("f1")),
      Some(OracleGen.dd16Sql(0.5))),

    // TX18: interpolated Kneser–Ney bigram LM — the smoothing upgrade
    // over tx12's MLE; discounted evidence mass is reassigned by
    // CONTINUATION counts (how many contexts a word follows), the
    // closed-form that beats add-k for LM quality filters. Top-100 by
    // raw bigram count (integer-deterministic order).
    "tx18_kneser_ney" -> Q(
      (s, d) => Text.knBigramLm(docs(s, d))
        .select(col("w1"), col("w2"), col("n12"), col("n1"),
          col("npost"), col("npre"), round(col("p_kn"), 6).as("p_kn"))
        .orderBy(col("n12").desc, col("w1"), col("w2"))
        .limit(100),
      Some("""WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(toks)),
        |        i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
        |      FROM t WHERE len(toks) >= 2),
        |c AS (SELECT s.w1 AS w1, s.w2 AS w2, CAST(count(*) AS BIGINT) AS n12
        |      FROM b GROUP BY 1, 2),
        |n1t AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1,
        |          CAST(count(*) AS BIGINT) AS npost FROM c GROUP BY 1),
        |npret AS (SELECT w2, CAST(count(*) AS BIGINT) AS npre FROM c GROUP BY 1),
        |nbt AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM c)
        |SELECT w1, w2, n12, n1, npost, npre,
        |  round(greatest(CAST(n12 AS DOUBLE) - 0.75, 0.0) / CAST(n1 AS DOUBLE)
        |    + (0.75 * CAST(npost AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      * (CAST(npre AS DOUBLE) / nb), 6) AS p_kn
        |FROM c JOIN n1t USING (w1) JOIN npret USING (w2) CROSS JOIN nbt
        |ORDER BY n12 DESC, w1, w2 LIMIT 100""".stripMargin)),

    // PCA3: INCREMENTAL covariance maintenance — the moment table
    // (exact integer sums on a pinned quantization scale) is published
    // as a VersionedDir snapshot for the base corpus, the delta's
    // moments are added cell-wise (exact, order-free), the merged store
    // is re-published, and the top component is computed FROM THE
    // STORE. Oracle = pca1's full-corpus recompute: the hash match
    // proves sign-delta-merge-reload is bit-identical to rescanning
    // everything — the 100 TB shape where the base is never touched
    // again.
    "pca3_incremental_moments" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val dim = 64
        val xd = transform(col("embedding"), _.cast("double"))
        // pinned quantization scale (production fixes this at store
        // creation; pinned to the corpus max here so the merged store
        // must equal pca1's one-shot recompute exactly)
        val gmax = e.select(max(aggregate(xd, lit(0.0),
          (a, b) => greatest(a, abs(b))))).head.getDouble(0)
        val store = Queries.scratch("pca_moments")
        graft.ingest.VersionedDir.publish(
          graft.ops.Pca.momentTable(e.filter(col("vec_id") < 300), gmax, dim),
          store, 1L)
        val base = graft.ingest.VersionedDir.current(s, store).get
        val delta = graft.ops.Pca.momentTable(
          e.filter(col("vec_id") >= 300), gmax, dim)
        graft.ingest.VersionedDir.publish(
          graft.ops.Pca.mergeMoments(base, delta), store, 2L)
        graft.ops.Pca.topComponentFromMoments(
            graft.ingest.VersionedDir.current(s, store).get, dim)
          .orderBy("dim_idx")
      },
      Some(PcaComponentOracle)),

    // FA1: filter ATTRIBUTION over the tx13 Gopher battery — per rule
    // the total drop count, the UNIQUE drop count (docs only this rule
    // catches — the rule's marginal value), and the corpus drop total.
    // The report that decides whether a filter earns its compute at
    // 100 TB; n_unique = 0 means the rule is subsumed.
    "fa1_filter_attribution" -> Q(
      (s, d) => {
        val g = Text.gopherRules(docs(s, d))
        val nFails = GopherRuleCols.map(r =>
          when(col(r), lit(0)).otherwise(lit(1))).reduce(_ + _)
        val base = g.withColumn("__nf", nFails)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val stackExpr = s"stack(${GopherRuleCols.size}, " +
          GopherRuleCols.map(r => s"'$r', $r").mkString(", ") +
          ") AS (rule, pass)"
        val dropped = broadcast(base.agg(
          sum(when(col("__nf") > 0, lit(1L)).otherwise(lit(0L))).as("n_dropped")))
        base.select(col("doc_id"), col("__nf"), expr(stackExpr))
          .groupBy(col("rule"))
          .agg(count(lit(1)).cast("long").as("__n"),
            sum(when(!col("pass"), lit(1L)).otherwise(lit(0L))).as("n_fail"),
            sum(when(!col("pass") && col("__nf") === 1, lit(1L))
              .otherwise(lit(0L))).as("n_unique"))
          .crossJoin(dropped)
          .select(col("rule"), col("n_fail"), col("n_unique"), col("n_dropped"),
            round(col("n_fail").cast("double") / col("__n").cast("double"), 6)
              .as("fail_share"))
          .orderBy("rule")
      },
      Some {
        val union = GopherRuleCols.map(r =>
          s"SELECT doc_id, '$r' AS rule, $r AS pass FROM g").mkString("\n|  UNION ALL ")
        s"""WITH g AS (SELECT * FROM ($GopherOracle)),
           |u AS (
           |  $union),
           |nf AS (SELECT doc_id, CAST(sum(CASE WHEN pass THEN 0 ELSE 1 END) AS BIGINT)
           |         AS nfails FROM u GROUP BY 1),
           |dr AS (SELECT CAST(count(*) FILTER (WHERE nfails > 0) AS BIGINT) AS n_dropped FROM nf),
           |per AS (SELECT rule, CAST(count(*) AS BIGINT) AS n_docs,
           |         CAST(sum(CASE WHEN pass THEN 0 ELSE 1 END) AS BIGINT) AS n_fail,
           |         CAST(sum(CASE WHEN NOT pass AND nf.nfails = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
           |        FROM u JOIN nf USING (doc_id) GROUP BY rule)
           |SELECT rule, n_fail, n_unique, n_dropped,
           |  round(CAST(n_fail AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS fail_share
           |FROM per CROSS JOIN dr ORDER BY rule""".stripMargin
      }),

    // ISO1: per-label embedding isotropy — mean pairwise cosine WITHOUT
    // a pair join (the ‖Σv̂‖² identity), plus mean vector norm. The
    // representation-collapse gate before ANN indexing / contrastive
    // training.
    "iso1_isotropy_report" -> Q(
      (s, d) => Similarity.isotropyReport(embs(s, d))
        .select(col("label"), col("n"),
          round(col("mean_norm"), 6).as("mean_norm"),
          round(col("isotropy"), 6).as("isotropy"))
        .orderBy("label"),
      Some("""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |nrm AS (SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |      i -> v[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (a, b) -> a + b)) AS nn
        |  FROM e),
        |rng AS (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS i),
        |x AS (SELECT label, rng.i, v[rng.i] / nn AS xh FROM nrm CROSS JOIN rng),
        |sv AS (SELECT label, i, sum(xh) AS s FROM x GROUP BY 1, 2),
        |ag AS (SELECT label, sum(s * s) AS ssum FROM sv GROUP BY 1),
        |cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n, avg(nn) AS mean_norm
        |        FROM nrm GROUP BY 1)
        |SELECT label, n, round(mean_norm, 6) AS mean_norm,
        |  CASE WHEN n > 1 THEN
        |    round((ssum - CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)
        |  ELSE NULL END AS isotropy
        |FROM ag JOIN cnt USING (label) ORDER BY label""".stripMargin)),

    // DC4: contamination TRACE — pair-level (train doc, benchmark doc,
    // shared 8-gram count) evidence behind dc1's boolean; the artifact
    // a leak review actually reads. Same broadcast profile as dc1.
    // The benchmark slice takes its TEXT from the preceding train doc
    // (a planted leak), so the trace is guaranteed non-empty on every
    // test corpus and the oracle hash actually exercises the
    // pair-join/count path — the r9 advice found the former disjoint
    // slices shared zero shingles at sf0.001, making the gate vacuous.
    "dc4_contamination_trace" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val train = all.filter(col("doc_id") % 97 =!= 0)
        val bench = all.filter(col("doc_id") % 97 === 0 && col("doc_id") > 0)
          .select(col("doc_id"), (col("doc_id") - 1).as("src_id"))
          .join(all.select(col("doc_id").as("src_id"), col("text")), "src_id")
          .select("doc_id", "text")
        Curate.contaminationTrace(train, bench)
          .orderBy("doc_id", "bench_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 8 + 1),
        |           i -> array_to_string(list_slice(toks, CAST(i + 1 AS INTEGER), CAST(i + 8 AS INTEGER)), ' '))
        |         END)) AS s
        |       FROM t),
        |trn AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        |bch AS (SELECT b.doc_id AS doc_id, sh.s
        |        FROM documents b JOIN sh ON sh.doc_id = b.doc_id - 1
        |        WHERE b.doc_id % 97 = 0 AND b.doc_id > 0)
        |SELECT trn.doc_id AS doc_id, bch.doc_id AS bench_id,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM trn JOIN bch ON bch.s = trn.s
        |GROUP BY 1, 2 ORDER BY doc_id, bench_id""".stripMargin)),

    // CUR12: packing-efficiency report over cur2's token packing — the
    // padding-waste accounting a trainer bills by: per shard the bin
    // count, stream length, capacity and utilization.
    // CUR14: length-profile rejection sampling — thin each source to
    // the POOLED power-of-two length distribution (integer threshold
    // ladder, no float log2) so a long-doc-heavy source can't dominate
    // token mass when the recipe counts documents; acceptance by the
    // seedless md5 content coin, rates = exact count ratios.
    "cur14_length_match" -> Q(
      (s, d) => Curate.lengthMatchSample(docs(s, d))
        .select(col("source"), col("bucket"), col("n_docs"),
          col("n_accept"), round(col("rate"), 9).as("rate"))
        .orderBy("source", "bucket"),
      Some(s"""WITH t AS (SELECT doc_id, source, text, CAST(len(text) AS BIGINT) AS n FROM documents),
        |b AS (SELECT *, CAST(len(bin(n)) AS INTEGER) AS bk FROM t),
        |nb AS (SELECT bk, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY 1),
        |nsb AS (SELECT source, bk, CAST(count(*) AS BIGINT) AS csb FROM b GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS cs FROM b GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM b),
        |r AS (SELECT nsb.source, nsb.bk, csb,
        |    least(1.0, CAST(cb AS DOUBLE) * CAST(cs AS DOUBLE)
        |      / (CAST(ct AS DOUBLE) * CAST(csb AS DOUBLE))) AS rate
        |  FROM nsb JOIN nb USING (bk) JOIN ns USING (source) CROSS JOIN nn),
        |u AS (SELECT doc_id, source, bk,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 9),
        |        i -> CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT))),
        |      (a, x) -> a * 16 + x) AS DOUBLE) / CAST(4294967296 AS DOUBLE) AS u
        |  FROM b)
        |SELECT u.source, u.bk AS bucket, r.csb AS n_docs,
        |  CAST(sum(CASE WHEN u.u < r.rate THEN 1 ELSE 0 END) AS BIGINT) AS n_accept,
        |  round(r.rate, 9) AS rate
        |FROM u JOIN r ON r.source = u.source AND r.bk = u.bk
        |GROUP BY 1, 2, 3, 5 ORDER BY 1, 2""".stripMargin)),

    "cur12_pack_efficiency" -> Q(
      (s, d) => Curate.packTokenBudget(docs(s, d), budget = 200, shardCol = "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          (max(col("bin")) + 1).cast("long").as("n_bins"),
          sum(col("n_tokens")).cast("long").as("stream_len"))
        .withColumn("capacity", col("n_bins") * lit(200L))
        .select(col("source"), col("n_docs"), col("n_bins"), col("stream_len"),
          col("capacity"),
          round(col("stream_len").cast("double") / col("capacity").cast("double"), 6)
            .as("utilization"))
        .orderBy("source"),
      Some("""WITH t AS (
        |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (SELECT doc_id, source, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM t),
        |p AS (SELECT doc_id, source, n_tokens, tok_offset // 200 AS bin FROM o)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(max(bin) + 1 AS BIGINT) AS n_bins,
        |  CAST(sum(n_tokens) AS BIGINT) AS stream_len,
        |  CAST((max(bin) + 1) * 200 AS BIGINT) AS capacity,
        |  round(CAST(sum(n_tokens) AS DOUBLE) / CAST((max(bin) + 1) * 200 AS DOUBLE), 6)
        |    AS utilization
        |FROM p GROUP BY source ORDER BY source""".stripMargin)),

    // DM1: pairwise source divergence (KL both ways + Jensen–Shannon)
    // over a shared top-500 + OOV-bucket unigram distribution — the
    // corpus-similarity matrix behind mixing-weight decisions: near-zero
    // JS pairs can share a weight, a high-JS-everywhere source is the
    // re-curation candidate. Vocab-bounded after one tokenize pass.
    "dm1_domain_divergence" -> Q(
      (s, d) => Text.domainDivergence(docs(s, d), vocabSize = 500)
        .select(col("ga"), col("gb"),
          round(col("kl_ab"), 6).as("kl_ab"),
          round(col("kl_ba"), 6).as("kl_ba"),
          round(col("js"), 6).as("js"))
        .orderBy("ga", "gb"),
      Some("""WITH tk AS (SELECT g, t FROM (
        |    SELECT source AS g, unnest(string_split(lower(text), ' ')) AS t
        |    FROM documents) WHERE len(t) > 0),
        |c AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY t),
        |v AS (SELECT t FROM (SELECT t, row_number() OVER (ORDER BY cnt DESC, t ASC) AS rn
        |      FROM c) WHERE rn <= 500),
        |bk AS (SELECT g, CASE WHEN v.t IS NULL THEN 'oov' ELSE tk.t END AS b
        |       FROM tk LEFT JOIN v ON v.t = tk.t),
        |cnts AS (SELECT g, b, CAST(count(*) AS DOUBLE) AS c FROM bk GROUP BY 1, 2),
        |tot AS (SELECT g, sum(c) AS tot FROM cnts GROUP BY 1),
        |bu AS (SELECT t AS b FROM v UNION ALL SELECT 'oov'),
        |dense AS (SELECT tot.g, bu.b,
        |    (COALESCE(cnts.c, 0.0) + 1.0) / (tot.tot + 501.0) AS p
        |  FROM tot CROSS JOIN bu
        |  LEFT JOIN cnts ON cnts.g = tot.g AND cnts.b = bu.b),
        |pr AS (SELECT a.g AS ga, b2.g AS gb, a.p AS pa, b2.p AS pb
        |       FROM dense a JOIN dense b2 ON b2.b = a.b AND a.g < b2.g)
        |SELECT ga, gb,
        |  round(sum(pa * ln(pa / pb)), 6) AS kl_ab,
        |  round(sum(pb * ln(pb / pa)), 6) AS kl_ba,
        |  round(0.5 * sum(pa * ln(pa / ((pa + pb) / 2.0)))
        |    + 0.5 * sum(pb * ln(pb / ((pa + pb) / 2.0))), 6) AS js
        |FROM pr GROUP BY 1, 2 ORDER BY ga, gb""".stripMargin)),

    // CDC1: content-defined chunking (Rabin cut rule on tokens) — chunk
    // boundaries move WITH content, so an insertion perturbs one chunk,
    // not every downstream block; per-doc chunk counts + cross-doc
    // shared chunks = the storage-layer dedup view beside dd9's spans.
    "cdc1_content_chunks" -> Q(
      (s, d) => Dedup.contentChunks(par(docs(s, d)), window = 4, divisor = 16)
        .select(col("doc_id"), col("n_chunks"), col("n_shared_chunks"),
          round(col("mean_chunk_len"), 6).as("mean_chunk_len"))
        .orderBy("doc_id"),
      Some(OracleGen.cdc1Sql(4, 16))),

    // AUG1: deterministic token-dropout augmentation — md5-coin drops
    // (reproducible across runs, engines, retries); the oracle
    // regenerates the augmented text byte-for-byte (aug_md5 match).
    "aug1_token_dropout" -> Q(
      (s, d) => Curate.tokenDropout(docs(s, d), dropDenom = 10)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |k AS (SELECT doc_id, toks,
        |    list_transform(list_filter(range(1, len(toks) + 1), i ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),
        |        j -> CAST(strpos('0123456789abcdef', substr(md5(
        |               CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR) || ':'
        |               || toks[CAST(i AS INTEGER)]), CAST(j AS INTEGER), 1)) - 1 AS BIGINT))),
        |        (acc, x) -> acc * 16 + x) % 10 <> 0),
        |      i -> toks[CAST(i AS INTEGER)]) AS kept
        |  FROM t)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_orig,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  md5(array_to_string(kept, ' ')) AS aug_md5
        |FROM k ORDER BY doc_id""".stripMargin)),

    // CC1: competence-paced curriculum table — per competence step the
    // target count, difficulty (token-length) threshold, and admitted
    // count; quantile ladder on the DISTINCT-difficulty table, never a
    // corpus rank.
    "cc1_competence_curriculum" -> Q(
      (s, d) => Curate.competenceCurriculum(docs(s, d),
          size(filter(split(lower(col("text")), " "),
            t => length(t) > lit(0))))
        .orderBy("c_milli"),
      Some("""WITH dd AS (SELECT CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> length(x) > 0)) AS BIGINT) AS diff FROM documents),
        |per AS (SELECT diff, CAST(count(*) AS BIGINT) AS cnt FROM dd GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM per),
        |cum AS MATERIALIZED (SELECT diff,
        |    CAST(sum(cnt) OVER (ORDER BY diff
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    tot.n FROM per CROSS JOIN tot),
        |g AS (SELECT CAST(unnest([100, 200, 300, 400, 500, 600, 700, 800, 900, 1000])
        |    AS BIGINT) AS c_milli),
        |st AS (SELECT g.c_milli, (g.c_milli * cum.n) // 1000 AS k_target,
        |    cum.diff, cum.cum, cum.n
        |  FROM g CROSS JOIN cum
        |  WHERE cum.cum >= (g.c_milli * cum.n) // 1000),
        |th AS (SELECT c_milli, k_target, n, min(diff) AS threshold_diff
        |  FROM st GROUP BY 1, 2, 3)
        |SELECT th.c_milli, th.n AS n_docs, th.k_target, th.threshold_diff,
        |  cum.cum AS n_at_or_below
        |FROM th JOIN cum ON cum.diff = th.threshold_diff
        |ORDER BY c_milli""".stripMargin)),

    // LB1: length-grouped batching audit — exact padding waste under
    // hash-random vs length-sorted batch formation, per-shard (cur2
    // discipline). The number that decides the loader change.
    "lb1_length_batching" -> Q(
      (s, d) => Curate.lengthBatchingAudit(docs(s, d), batchSize = 16,
          shardCol = "source")
        .orderBy("strategy"),
      Some {
        def leg(name: String, order: String) =
          s"""r_$name AS (SELECT sh, len,
             |    (row_number() OVER (PARTITION BY sh ORDER BY $order) - 1) // 16 AS b
             |  FROM base),
             |g_$name AS (SELECT sh, b, CAST(count(*) AS BIGINT) AS bn,
             |    CAST(sum(len) AS BIGINT) AS bl, max(len) AS bm
             |  FROM r_$name GROUP BY 1, 2),
             |a_$name AS (SELECT CAST(count(*) AS BIGINT) AS n_batches,
             |    CAST(sum(bl) AS BIGINT) AS total_tokens,
             |    CAST(sum(bn * bm) AS BIGINT) AS padded_tokens FROM g_$name)"""
            .stripMargin
        s"""WITH base AS MATERIALIZED (SELECT source AS sh, doc_id AS id,
           |    CAST(len(list_filter(string_split(lower(text), ' '),
           |      x -> length(x) > 0)) AS BIGINT) AS len,
           |    md5(CAST(doc_id AS VARCHAR)) AS h
           |  FROM documents),
           |${leg("rnd", "h ASC, id ASC")},
           |${leg("len", "len DESC, h ASC, id ASC")}
           |SELECT 'random' AS strategy, n_batches, total_tokens, padded_tokens,
           |  ((padded_tokens - total_tokens) * 1000000) // padded_tokens AS waste_micro
           |FROM a_rnd
           |UNION ALL
           |SELECT 'length', n_batches, total_tokens, padded_tokens,
           |  ((padded_tokens - total_tokens) * 1000000) // padded_tokens
           |FROM a_len
           |ORDER BY strategy""".stripMargin
      }),

    // DPO1: preference-pair construction for DPO/RLHF data — within
    // each source, the i-th best-quality doc pairs with the i-th worst
    // (margin-maximizing matching), capped pairs, positive margin only.
    "dpo1_preference_pairs" -> Q(
      (s, d) => Curate.preferencePairs(
          graft.ops.Text.withQuality(docs(s, d)),
          "source", "quality_score", "doc_id")
        .orderBy("source", "pair_rank"),
      Some("""WITH q AS (SELECT source, doc_id,
        |    CAST(floor(least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2)
        |      * 1e6 + 0.5) AS BIGINT) AS sm
        |  FROM documents),
        |r AS (SELECT source, doc_id, sm,
        |    row_number() OVER (PARTITION BY source ORDER BY sm DESC, doc_id ASC) AS rb,
        |    row_number() OVER (PARTITION BY source ORDER BY sm ASC, doc_id DESC) AS rw,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM q),
        |best AS (SELECT source, rb AS i, doc_id AS chosen_id, sm AS chosen_micro
        |  FROM r WHERE rb <= 3 AND rb * 2 <= n),
        |worst AS (SELECT source, rw AS i, doc_id AS rejected_id, sm AS rejected_micro
        |  FROM r WHERE rw <= 3 AND rw * 2 <= n)
        |SELECT b.source, CAST(b.i AS BIGINT) AS pair_rank,
        |  b.chosen_id, w.rejected_id, b.chosen_micro, w.rejected_micro,
        |  b.chosen_micro - w.rejected_micro AS margin_micro
        |FROM best b JOIN worst w ON w.source = b.source AND w.i = b.i
        |WHERE b.chosen_micro - w.rejected_micro >= 1
        |ORDER BY b.source, pair_rank""".stripMargin)),

    // LG1: hash-chained commit ledger over three growing snapshot
    // commits — the lakehouse integrity record: content fingerprint is
    // an ORDER-FREE combinable row-hash sum (one aggregate per
    // snapshot at any scale), the chain is md5(prev || ':' || fp), so
    // rewriting ANY historical snapshot changes every later link. The
    // oracle recomputes fingerprints and the whole chain from the raw
    // table.
    "lg1_commit_ledger" -> Q(
      (s, d) => {
        val dir = Queries.scratch("lg1_ledger")
        val base = docs(s, d).select(col("doc_id"), col("text"))
        (0 to 2).foreach { k =>
          graft.ingest.VersionedDir.publish(
            base.filter(col("doc_id") % 3 <= k).coalesce(1), dir, k.toLong)
        }
        graft.ingest.VersionedDir.commitLedger(s, dir,
          df => concat(df("doc_id").cast("string"), lit(":"), md5(df("text"))))
          .orderBy("version")
      },
      Some {
        def fp(k: Int) =
          s"""f$k AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |  coalesce(CAST(sum(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(range(1, 16), j -> CAST(strpos('0123456789abcdef',
             |      substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)),
             |        CAST(j AS INTEGER), 1)) - 1 AS BIGINT))),
             |    (acc, x) -> acc * 16 + x) AS DECIMAL(38,0)))
             |    % CAST(1152921504606846976 AS DECIMAL(38,0)) AS BIGINT), 0) AS fp
             |  FROM documents WHERE doc_id % 3 <= $k)""".stripMargin
        s"""WITH ${fp(0)}, ${fp(1)}, ${fp(2)},
           |c0 AS (SELECT md5('genesis:' || CAST(f0.fp AS VARCHAR)) AS h FROM f0),
           |c1 AS (SELECT md5(c0.h || ':' || CAST(f1.fp AS VARCHAR)) AS h FROM c0, f1),
           |c2 AS (SELECT md5(c1.h || ':' || CAST(f2.fp AS VARCHAR)) AS h FROM c1, f2)
           |SELECT CAST(0 AS BIGINT) AS version, f0.n AS n_rows,
           |  f0.fp AS content_fp, c0.h AS chain_md5 FROM f0, c0
           |UNION ALL SELECT 1, f1.n, f1.fp, c1.h FROM f1, c1
           |UNION ALL SELECT 2, f2.n, f2.fp, c2.h FROM f2, c2
           |ORDER BY version""".stripMargin
      }),

    // AUG2: T5-style span corruption — block-local md5-coin spans,
    // ordered <extra_id_k> sentinels, (input, targets) digests. The
    // denoising-objective data prep beside aug1's token dropout; the
    // block confinement removes the sequential overlap fold so the
    // whole construction is closed-form per position.
    "aug2_span_corruption" -> Q(
      (s, d) => Curate.spanCorruption(docs(s, d)).orderBy("doc_id"),
      Some {
        def coin(tag: String) =
          s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),
             |      j -> CAST(strpos('0123456789abcdef', substr(md5(
             |             CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR) || '$tag'),
             |           CAST(j AS INTEGER), 1)) - 1 AS BIGINT))),
             |      (acc, x) -> acc * 16 + x)""".stripMargin
        val st = s"(b - 1) * 5 + 1 + (${coin(":o")} % 3)"
        s"""WITH t AS (SELECT doc_id,
           |    list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS toks
           |  FROM documents),
           |nn AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t),
           |sp AS MATERIALIZED (SELECT doc_id, toks, n,
           |    list_filter(list_transform(
           |      range(1, greatest(CAST(ceil(CAST(n AS DOUBLE) / 5.0) AS BIGINT), 1) + 1),
           |      b -> CASE WHEN (${coin(":s")}) % 4 = 0 AND ($st) <= n
           |        THEN ($st) * 64
           |          + least(1 + (${coin(":l")} % 3), n - ($st) + 1)
           |        ELSE -1 END),
           |      s2 -> s2 > 0) AS spans
           |  FROM nn),
           |built AS (SELECT doc_id, n, spans,
           |    array_to_string(flatten(list_transform(range(1, greatest(n, 1) + 1), i ->
           |      CASE WHEN i > n THEN CAST([] AS VARCHAR[])
           |      WHEN len(list_filter(spans, s2 -> (s2 // 64) = i)) > 0 THEN
           |        ['<extra_id_' ||
           |          CAST(len(list_filter(spans, s2 -> (s2 // 64) < i)) AS VARCHAR) || '>']
           |      WHEN len(list_filter(spans, s2 ->
           |          (s2 // 64) <= i AND i < (s2 // 64) + (s2 % 64))) > 0 THEN
           |        CAST([] AS VARCHAR[])
           |      ELSE [toks[CAST(i AS INTEGER)]]
           |      END)), ' ') AS input_txt,
           |    CASE WHEN len(spans) = 0 THEN '' ELSE
           |      array_to_string(flatten(list_transform(range(1, len(spans) + 1), kk ->
           |        list_concat(['<extra_id_' || CAST(kk - 1 AS VARCHAR) || '>'],
           |          list_slice(toks, CAST(spans[kk] // 64 AS INTEGER),
           |            CAST(spans[kk] // 64 + spans[kk] % 64 - 1 AS INTEGER))))), ' ')
           |    END AS targets_txt
           |  FROM sp)
           |SELECT doc_id, n AS n_tokens,
           |  CAST(len(spans) AS BIGINT) AS n_spans,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(spans, s2 -> s2 % 64)), (a, x2) -> a + x2) AS n_masked,
           |  md5(input_txt) AS input_md5,
           |  md5(targets_txt) AS targets_md5
           |FROM built ORDER BY doc_id""".stripMargin
      }),

    // GR3: Newman modularity of kg1's mutual-kNN partition — the
    // clustering-quality number (random wiring ⇒ Q ≈ 0) that decides
    // whether embedding communities are real before they drive
    // dedup-canonical or mixing decisions.
    "gr3_modularity" -> Q(
      (s, d) => {
        val (mutual, cc) = mutualKnnCc(s, d)
        graft.ops.Graph.modularity(mutual, cc)
          .select(col("n_edges"), col("n_clusters"),
            round(col("modularity"), 6).as("modularity"))
      },
      Some(OracleGen.gr3Sql())),

    // ANN4: hubness report of the IVF top-k graph — k-occurrence
    // moments (mean/var/skew), the biggest hub, the never-retrieved
    // anti-hub count. The standard ANN pathology gate.
    "ann4_hubness" -> Q(
      (s, d) => Similarity.hubnessReport(par(embs(s, d)), k = 5, nProbe = 6,
          centroids = Similarity.fixedCentroids(16, 64))
        .select(col("n"), col("max_occ"), col("n_antihubs"),
          round(col("mean_occ"), 6).as("mean_occ"),
          round(col("var_occ"), 6).as("var_occ"),
          round(col("skew_occ"), 6).as("skew_occ")),
      Some(OracleGen.ann4Sql())),

    // SP3: temporal split with EMBARGO (train < t₁, embargo gap,
    // test ≥ t₂ — the leakage-hygiene split for time-series eval), plus
    // the cross-split user-overlap count the reviewer asks about first.
    "sp3_embargo_split" -> Q(
      (s, d) => {
        val ev = Queries.events(s, d)
        val split = when(col("ts") < lit("2024-01-15").cast("timestamp"), "train")
          .when(col("ts") < lit("2024-01-18").cast("timestamp"), "embargo")
          .otherwise("test")
        val sdf = ev.select(split.as("split"), col("user_id"))
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val per = sdf.groupBy(col("split"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            countDistinct(col("user_id")).cast("long").as("n_users"))
        val leak = broadcast(
          sdf.filter(col("split") === "train").select("user_id").distinct()
            .join(sdf.filter(col("split") === "test").select("user_id").distinct(),
              "user_id")
            .agg(count(lit(1)).cast("long").as("n_leak_users")))
        per.crossJoin(leak).orderBy("split")
      },
      Some("""WITH s AS (SELECT CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 'train'
        |         WHEN ts < TIMESTAMP '2024-01-18' THEN 'embargo'
        |         ELSE 'test' END AS split, user_id FROM events),
        |per AS (SELECT split, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |        FROM s GROUP BY 1),
        |lk AS (SELECT CAST(count(*) AS BIGINT) AS n_leak_users FROM
        |   (SELECT DISTINCT user_id FROM s WHERE split = 'train') a
        |   JOIN (SELECT DISTINCT user_id FROM s WHERE split = 'test') b USING (user_id))
        |SELECT split, n_events, n_users, n_leak_users
        |FROM per CROSS JOIN lk ORDER BY split""".stripMargin)),

    // KS1: two-sample Kolmogorov–Smirnov on document length between
    // the English and German slices — the distribution-SHAPE shift
    // gate beside ab1's mean test. D's numerator is exact integer
    // cross-multiplied CDF counts; window over distinct lengths only.
    "ks1_ks_test" -> Q(
      (s, d) => graft.ops.Stats.ksTest(docs(s, d), "n_chars", "lang", "en", "de"),
      Some("""WITH f AS (SELECT CAST(n_chars AS BIGINT) AS v, lang FROM documents
        |  WHERE lang IN ('en', 'de')),
        |g AS (SELECT v,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
        |  FROM f GROUP BY 1),
        |c AS (SELECT
        |    CAST(sum(c_a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cum_a,
        |    CAST(sum(c_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cum_b
        |  FROM g),
        |t AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b FROM g),
        |dm AS (SELECT
        |    CAST(max(abs(cum_a * CAST(t.n_b AS DECIMAL(38,0))
        |               - cum_b * CAST(t.n_a AS DECIMAL(38,0)))) AS BIGINT) AS d_num,
        |    max(t.n_a) AS n_a, max(t.n_b) AS n_b
        |  FROM c CROSS JOIN t)
        |SELECT n_a, n_b, d_num,
        |  round(CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 9) AS d_stat,
        |  round(1.358 * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 9) AS crit_005,
        |  CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |    > 1.358 * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS reject
        |FROM dm""".stripMargin)),

    // MW1: Mann–Whitney rank-sum between the even/odd user arms — the
    // nonparametric A/B gate beside ab1 (Welch) and st3 (chi-square).
    // Doubled-unit tie ranks keep every rank sum an exact integer.
    "mw1_mann_whitney" -> Q(
      (s, d) => graft.ops.Stats.mannWhitney(
        Queries.events(s, d).withColumn("arm",
          when(col("user_id") % 2 === 0, "control").otherwise("treatment")),
        "value", "arm", "control", "treatment"),
      Some("""WITH b AS (SELECT
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
        |  FROM events),
        |g AS (SELECT q, CAST(sum(in_a) AS BIGINT) AS c_a,
        |    CAST(count(*) AS BIGINT) AS c_t
        |  FROM b GROUP BY 1),
        |r AS (SELECT c_a, c_t,
        |    coalesce(sum(c_t) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM g),
        |r2 AS (SELECT c_a, c_t, 2 * cum_before + c_t + 1 AS rank2 FROM r),
        |m AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
        |    CAST(sum(c_t) - sum(c_a) AS BIGINT) AS n_b,
        |    sum(CAST(c_a AS DECIMAL(38,0)) * CAST(rank2 AS DECIMAL(38,0))) AS r_a2,
        |    sum(CAST(c_t AS DECIMAL(38,0)) * CAST(c_t AS DECIMAL(38,0)) * CAST(c_t AS DECIMAL(38,0))
        |        - CAST(c_t AS DECIMAL(38,0))) AS ties
        |  FROM r2),
        |c AS (SELECT n_a, n_b, ties,
        |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        |    CAST(n_a + n_b AS DOUBLE) AS nd,
        |    CAST(r_a2 AS DOUBLE) AS r_a2d, CAST(ties AS DOUBLE) AS tiesd
        |  FROM m),
        |z AS (SELECT *, r_a2d - na * (na + 1.0) AS u2,
        |    na * nb * ((nd + 1.0) * nd * (nd - 1.0) - tiesd) AS var_num,
        |    12.0 * nd * (nd - 1.0) AS var_den
        |  FROM c)
        |SELECT n_a, n_b,
        |  round(u2 / 2.0, 1) AS u_a,
        |  CAST(ties AS BIGINT) AS tie_term,
        |  round((u2 - na * nb) / (2.0 * sqrt(var_num / var_den)), 9) AS z_stat,
        |  abs((u2 - na * nb) / (2.0 * sqrt(var_num / var_den))) > 1.96 AS significant
        |FROM z""".stripMargin)),

    // CR1: Pearson correlation matrix over the four lineitem measures
    // — ONE moment pass (exact decimal sums at 1e4 quantization), six
    // fixed-order double expressions off the persisted moment row.
    "cr1_corr_matrix" -> Q(
      (s, d) => graft.ops.Stats.corrMatrix(li(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b"),
      Some("""WITH q AS (SELECT
        |    CAST(floor(l_quantity * 1e4 + 0.5) AS DECIMAL(38,0)) AS q0,
        |    CAST(floor(l_extendedprice * 1e4 + 0.5) AS DECIMAL(38,0)) AS q1,
        |    CAST(floor(l_discount * 1e4 + 0.5) AS DECIMAL(38,0)) AS q2,
        |    CAST(floor(l_tax * 1e4 + 0.5) AS DECIMAL(38,0)) AS q3
        |  FROM lineitem),
        |m AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q0) AS DOUBLE) AS s0, CAST(sum(q1) AS DOUBLE) AS s1,
        |    CAST(sum(q2) AS DOUBLE) AS s2, CAST(sum(q3) AS DOUBLE) AS s3,
        |    CAST(sum(q0 * q0) AS DOUBLE) AS ss00, CAST(sum(q0 * q1) AS DOUBLE) AS ss01,
        |    CAST(sum(q0 * q2) AS DOUBLE) AS ss02, CAST(sum(q0 * q3) AS DOUBLE) AS ss03,
        |    CAST(sum(q1 * q1) AS DOUBLE) AS ss11, CAST(sum(q1 * q2) AS DOUBLE) AS ss12,
        |    CAST(sum(q1 * q3) AS DOUBLE) AS ss13, CAST(sum(q2 * q2) AS DOUBLE) AS ss22,
        |    CAST(sum(q2 * q3) AS DOUBLE) AS ss23, CAST(sum(q3 * q3) AS DOUBLE) AS ss33,
        |    CAST(count(*) AS DOUBLE) AS nd
        |  FROM q)
        |SELECT col_a, col_b, n, corr FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
        |    round((nd * ss01 - s0 * s1) / sqrt((nd * ss00 - s0 * s0) * (nd * ss11 - s1 * s1)), 9) AS corr FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_discount', n,
        |    round((nd * ss02 - s0 * s2) / sqrt((nd * ss00 - s0 * s0) * (nd * ss22 - s2 * s2)), 9) FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax', n,
        |    round((nd * ss03 - s0 * s3) / sqrt((nd * ss00 - s0 * s0) * (nd * ss33 - s3 * s3)), 9) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
        |    round((nd * ss12 - s1 * s2) / sqrt((nd * ss11 - s1 * s1) * (nd * ss22 - s2 * s2)), 9) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', n,
        |    round((nd * ss13 - s1 * s3) / sqrt((nd * ss11 - s1 * s1) * (nd * ss33 - s3 * s3)), 9) FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax', n,
        |    round((nd * ss23 - s2 * s3) / sqrt((nd * ss22 - s2 * s2) * (nd * ss33 - s3 * s3)), 9) FROM m
        |) ORDER BY col_a, col_b""".stripMargin)),

    // CLF1: per-class classifier report (sklearn shape: precision /
    // recall / F1 / support + __macro / __micro rows) of the stopword
    // langid against the true lang label — pico-integer metrics, one
    // cell shuffle; de/zh are classes the classifier can't emit, so
    // the report shows real zero-recall rows.
    "clf1_classifier_report" -> Q(
      (s, d) => Classify.classifierReport(
          Text.withLangId(docs(s, d)).select(col("lang"), col("lang_pred")),
          "lang", "lang_pred")
        .orderBy("cls"),
      Some("""WITH t AS (SELECT lang, string_split(lower(text), ' ') AS toks FROM documents),
        |sc AS (SELECT lang,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS INTEGER) AS score_en,
        |  CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x))) AS INTEGER) AS score_es,
        |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et','une'], x))) AS INTEGER) AS score_fr
        |  FROM t),
        |pr AS (SELECT lang AS truth,
        |  CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
        |       WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
        |       WHEN score_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS pred
        |  FROM sc),
        |cells AS MATERIALIZED (SELECT truth, pred, CAST(count(*) AS BIGINT) AS n
        |  FROM pr GROUP BY 1, 2),
        |cl AS (SELECT DISTINCT cls FROM
        |  (SELECT truth AS cls FROM cells UNION ALL SELECT pred FROM cells)),
        |tpx AS (SELECT truth AS cls, n AS tp FROM cells WHERE truth = pred),
        |pt AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS n_pred FROM cells GROUP BY 1),
        |tt AS (SELECT truth AS cls, CAST(sum(n) AS BIGINT) AS support FROM cells GROUP BY 1),
        |per0 AS (SELECT cl.cls, coalesce(tpx.tp, 0) AS tp,
        |    coalesce(pt.n_pred, 0) - coalesce(tpx.tp, 0) AS fp,
        |    coalesce(tt.support, 0) - coalesce(tpx.tp, 0) AS fn,
        |    coalesce(tt.support, 0) AS support
        |  FROM cl LEFT JOIN tpx USING (cls) LEFT JOIN pt USING (cls)
        |  LEFT JOIN tt USING (cls)),
        |perf AS MATERIALIZED (SELECT *,
        |    CASE WHEN tp + fp > 0 THEN (tp * 1000000000000) // (tp + fp) ELSE 0 END AS prec_pico,
        |    CASE WHEN tp + fn > 0 THEN (tp * 1000000000000) // (tp + fn) ELSE 0 END AS rec_pico,
        |    CASE WHEN 2 * tp + fp + fn > 0 THEN (2 * tp * 1000000000000) // (2 * tp + fp + fn) ELSE 0 END AS f1_pico
        |  FROM per0),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM perf),
        |nn AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cells),
        |sm AS (SELECT CAST(sum(tp) AS BIGINT) AS s_tp, CAST(sum(fp) AS BIGINT) AS s_fp,
        |    CAST(sum(fn) AS BIGINT) AS s_fn, CAST(sum(prec_pico) AS BIGINT) AS s_p,
        |    CAST(sum(rec_pico) AS BIGINT) AS s_r, CAST(sum(f1_pico) AS BIGINT) AS s_f
        |  FROM perf),
        |summ AS (SELECT '__macro' AS cls, nn.n AS support, sm.s_tp AS tp,
        |    sm.s_fp AS fp, sm.s_fn AS fn, sm.s_p // kk.k AS prec_pico,
        |    sm.s_r // kk.k AS rec_pico, sm.s_f // kk.k AS f1_pico
        |  FROM nn, sm, kk
        |  UNION ALL SELECT '__micro', nn.n, sm.s_tp, sm.s_fp, sm.s_fn,
        |    (sm.s_tp * 1000000000000) // nn.n, (sm.s_tp * 1000000000000) // nn.n,
        |    (sm.s_tp * 1000000000000) // nn.n
        |  FROM nn, sm, kk)
        |SELECT cls, support, tp, fp, fn,
        |  round(CAST(prec_pico AS DOUBLE) / 1e12, 6) AS precision,
        |  round(CAST(rec_pico AS DOUBLE) / 1e12, 6) AS recall,
        |  round(CAST(f1_pico AS DOUBLE) / 1e12, 6) AS f1
        |FROM (SELECT cls, support, tp, fp, fn, prec_pico, rec_pico, f1_pico FROM perf
        |  UNION ALL SELECT * FROM summ)
        |ORDER BY cls""".stripMargin)),

    // AUC1: threshold-free eval of the en-stopword-count scorer
    // against the true `lang = en` label — tie-corrected ROC-AUC by
    // integer rank sums, average precision by pico-quantized PR steps.
    "auc1_score_auc" -> Q(
      (s, d) => Classify.rocPrReport(
          Text.withLangId(docs(s, d))
            .select(col("score_en"), (col("lang") === "en").as("is_en")),
          "score_en", "is_en"),
      Some("""WITH t AS (SELECT
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> list_contains(['the','and','of','is','to'], x))) AS BIGINT) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS MATERIALIZED (SELECT s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
        |c AS MATERIALIZED (SELECT s, pos, cnt,
        |    coalesce(CAST(sum(cnt) OVER (ORDER BY s ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before,
        |    CAST(sum(pos) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tp,
        |    CAST(sum(cnt) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        |  FROM g),
        |c2 AS (SELECT *, 2 * cum_before + cnt + 1 AS rank2,
        |    (cum_tp * 1000000000000) // cum_n AS prec_pico FROM c),
        |m AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |    CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(count(*) AS BIGINT) AS n_thresholds,
        |    sum(CAST(pos AS DECIMAL(38,0)) * CAST(rank2 AS DECIMAL(38,0))) AS r1_2,
        |    sum(CAST(pos AS DECIMAL(38,0)) * CAST(prec_pico AS DECIMAL(38,0))) AS ap_sum
        |  FROM c2)
        |SELECT n, n_pos, n - n_pos AS n_neg, n_thresholds,
        |  round((CAST(r1_2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0))
        |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE)), 9) AS auc,
        |  round(CAST(ap_sum AS DOUBLE) / (CAST(n_pos AS DOUBLE) * 1e12), 9) AS avg_precision
        |FROM m""".stripMargin)),

    // DL1: DeLong's correlated-AUC test — does the stopword scorer
    // beat raw length at predicting English, beyond noise? Placements
    // from the doubled-rank identity (no pair join), exact decimal
    // moments, one fixed-order z double nano-quantized.
    "dl1_delong_auc" -> Q(
      (s, d) => Classify.deLongAucTest(
          Text.withLangId(docs(s, d))
            .select(col("score_en").cast("long").as("sa"),
              col("n_chars").cast("long").as("sb"),
              (col("lang") === "en").as("is_en")),
          "sa", "sb", "is_en"),
      Some("""WITH t AS (SELECT
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> list_contains(['the','and','of','is','to'], x))) AS BIGINT) AS sa,
        |    CAST(n_chars AS BIGINT) AS sb,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |p AS (SELECT y,
        |    (2 * rank() OVER (ORDER BY sa) + count(*) OVER (PARTITION BY sa) - 1)
        |      - (2 * rank() OVER (PARTITION BY y ORDER BY sa)
        |        + count(*) OVER (PARTITION BY y, sa) - 1) AS pa,
        |    (2 * rank() OVER (ORDER BY sb) + count(*) OVER (PARTITION BY sb) - 1)
        |      - (2 * rank() OVER (PARTITION BY y ORDER BY sb)
        |        + count(*) OVER (PARTITION BY y, sb) - 1) AS pb
        |  FROM t),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    sum(CASE WHEN y = 1 THEN CAST(pa AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sa1,
        |    sum(CASE WHEN y = 1 THEN CAST(pb AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sb1,
        |    sum(CASE WHEN y = 1 THEN CAST(pa AS DECIMAL(38,0)) * CAST(pa AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS qaa1,
        |    sum(CASE WHEN y = 1 THEN CAST(pb AS DECIMAL(38,0)) * CAST(pb AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS qbb1,
        |    sum(CASE WHEN y = 1 THEN CAST(pa AS DECIMAL(38,0)) * CAST(pb AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS qab1,
        |    sum(CASE WHEN y = 0 THEN CAST(pa AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sa0,
        |    sum(CASE WHEN y = 0 THEN CAST(pb AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sb0,
        |    sum(CASE WHEN y = 0 THEN CAST(pa AS DECIMAL(38,0)) * CAST(pa AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS qaa0,
        |    sum(CASE WHEN y = 0 THEN CAST(pb AS DECIMAL(38,0)) * CAST(pb AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS qbb0,
        |    sum(CASE WHEN y = 0 THEN CAST(pa AS DECIMAL(38,0)) * CAST(pb AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS qab0
        |  FROM p),
        |f AS (SELECT *,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n0 AS DOUBLE) AS n0d,
        |    ((CAST(qaa1 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      + (CAST(qbb1 AS DOUBLE) - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      - 2.0 * (CAST(qab1 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
        |      / ((CAST(n1 AS DOUBLE) - 1.0) * 4.0 * CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
        |    + ((CAST(qaa0 AS DOUBLE) - CAST(sa0 AS DOUBLE) * CAST(sa0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      + (CAST(qbb0 AS DOUBLE) - CAST(sb0 AS DOUBLE) * CAST(sb0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      - 2.0 * (CAST(qab0 AS DOUBLE) - CAST(sa0 AS DOUBLE) * CAST(sb0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
        |      / ((CAST(n0 AS DOUBLE) - 1.0) * 4.0 * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))
        |      AS vtot,
        |    CAST(sa1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS auca,
        |    CAST(sb1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS aucb
        |  FROM m)
        |SELECT n1 AS n_pos, n0 AS n_neg,
        |  CAST((CAST(sa1 AS HUGEINT) * 1000000)
        |    // (2 * CAST(n1 AS HUGEINT) * n0) AS BIGINT) AS auc_a_micro,
        |  CAST((CAST(sb1 AS HUGEINT) * 1000000)
        |    // (2 * CAST(n1 AS HUGEINT) * n0) AS BIGINT) AS auc_b_micro,
        |  CASE WHEN n1 >= 2 AND n0 >= 2 AND vtot > 0.0
        |    THEN CAST(floor((auca - aucb) / sqrt(vtot) * 1e9 + 0.5) AS BIGINT)
        |    ELSE 0 END AS z_nano,
        |  CASE WHEN n1 >= 2 AND n0 >= 2 AND vtot > 0.0
        |    THEN abs((auca - aucb) / sqrt(vtot)) > 1.96
        |    ELSE false END AS significant
        |FROM f""".stripMargin)),

    // YJ1: Youden's-J optimal threshold for the stopword scorer — the
    // deployable operating point once auc1 says the scorer works;
    // exact cumulative counts, integer cross-product argmax, highest-
    // threshold tiebreak.
    "yj1_youden_threshold" -> Q(
      (s, d) => Classify.youdenThreshold(
          Text.withLangId(docs(s, d))
            .select(col("score_en").cast("long").as("sc"),
              (col("lang") === "en").as("is_en")),
          "sc", "is_en"),
      Some("""WITH t AS (SELECT
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> list_contains(['the','and','of','is','to'], x))) AS BIGINT) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos FROM t GROUP BY 1),
        |c AS (SELECT s,
        |    CAST(sum(pos) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |    CAST(sum(n) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn
        |  FROM g),
        |tt AS (SELECT CAST(sum(pos) AS BIGINT) AS p_tot,
        |    CAST(sum(n) - sum(pos) AS BIGINT) AS n_tot FROM g),
        |jj AS (SELECT s, tp, cn - tp AS fp, p_tot, n_tot,
        |    CAST(tp AS HUGEINT) * n_tot - CAST(cn - tp AS HUGEINT) * p_tot AS j_num
        |  FROM c, tt),
        |rk AS (SELECT *, row_number() OVER (ORDER BY j_num DESC, s DESC) AS r
        |  FROM jj)
        |SELECT s AS threshold, tp, fp,
        |  p_tot - tp AS fn, n_tot - fp AS tn,
        |  CAST((tp * 1000000) // p_tot AS BIGINT) AS tpr_micro,
        |  CAST((fp * 1000000) // n_tot AS BIGINT) AS fpr_micro,
        |  CAST((j_num * 1000000) // (CAST(p_tot AS HUGEINT) * n_tot) AS BIGINT)
        |    AS j_micro
        |FROM rk WHERE r = 1""".stripMargin)),

    // TSCV1: forward-chaining time-series CV folds over event weeks —
    // the no-future-leakage split audit; boundary invariant checked
    // from the data, not the construction.
    "tscv1_forward_chaining" -> Q(
      (s, d) => graft.ops.Curate.forwardChainingFolds(
          Queries.events(s, d), "ts", "week")
        .orderBy("fold"),
      Some("""WITH b AS (SELECT date_trunc('week', ts) AS w,
        |    CAST(count(*) AS BIGINT) AS n,
        |    max(ts) AS w_max, min(ts) AS w_min
        |  FROM events GROUP BY 1),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS k,
        |    CAST(sum(n) OVER (ORDER BY w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |    max(w_max) OVER (ORDER BY w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_max_ts
        |  FROM b)
        |SELECT tr.k AS fold, tr.cum_n AS n_train, va.n AS n_val,
        |  tr.cum_max_ts < va.w_min AS boundary_ok
        |FROM r tr JOIN r va ON va.k = tr.k + 1
        |ORDER BY fold""".stripMargin)),

    // WOE1: weight-of-evidence / information-value of doc length as a
    // predictor of `lang = en` — decile bins by deterministic
    // (n_chars, doc_id) ntile, Laplace-smoothed WOE as one ln of an
    // exact-integer ratio, IV from pico-quantized terms.
    "woe1_woe_iv" -> Q(
      (s, d) => Classify.woeIvReport(
          docs(s, d).select(col("n_chars"), col("doc_id"),
            (col("lang") === "en").as("is_en")),
          "n_chars", "is_en", "doc_id", bins = 10)
        .orderBy("bin"),
      Some("""WITH t AS (SELECT n_chars AS s, doc_id AS id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
        |b AS MATERIALIZED (SELECT s, y,
        |    ntile(10) OVER (ORDER BY s ASC, id ASC) AS bin FROM t),
        |pb AS MATERIALIZED (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_good,
        |    CAST(min(s) AS BIGINT) AS s_min, CAST(max(s) AS BIGINT) AS s_max
        |  FROM b GROUP BY 1),
        |pb2 AS (SELECT *, n - n_good AS n_bad FROM pb),
        |tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS g_tot,
        |    CAST(sum(n_bad) AS BIGINT) AS b_tot, CAST(10 AS BIGINT) AS k FROM pb2),
        |terms AS MATERIALIZED (SELECT bin, s_min, s_max, n, n_good, n_bad,
        |    ln(CAST(CAST(2 * n_good + 1 AS DECIMAL(38,0)) * CAST(2 * b_tot + k AS DECIMAL(38,0)) AS DOUBLE)
        |      / CAST(CAST(2 * n_bad + 1 AS DECIMAL(38,0)) * CAST(2 * g_tot + k AS DECIMAL(38,0)) AS DOUBLE)) AS woe,
        |    CAST(2 * n_good + 1 AS DOUBLE) / CAST(2 * g_tot + k AS DOUBLE) AS gs,
        |    CAST(2 * n_bad + 1 AS DOUBLE) / CAST(2 * b_tot + k AS DOUBLE) AS bs
        |  FROM pb2, tot),
        |t2 AS MATERIALIZED (SELECT *,
        |    CAST(floor((gs - bs) * woe * 1e12 + 0.5) AS BIGINT) AS iv_pico FROM terms),
        |iv AS (SELECT round(CAST(sum(CAST(iv_pico AS DECIMAL(38,0))) AS DOUBLE) / 1e12, 9) AS iv_total FROM t2)
        |SELECT CAST(bin AS BIGINT) AS bin, s_min, s_max, n, n_good, n_bad,
        |  round(woe, 9) AS woe,
        |  round(CAST(iv_pico AS DOUBLE) / 1e12, 9) AS iv_term, iv_total
        |FROM t2, iv ORDER BY bin""".stripMargin)),

    // GT1: Good–Turing unseen mass + Chao1 richness per language —
    // exact freq-of-freq counting, two display divisions.
    "gt1_good_turing" -> Q(
      (s, d) => Text.goodTuringReport(docs(s, d)).orderBy("lang"),
      Some("""WITH toks AS (SELECT lang AS g,
        |    unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |f AS MATERIALIZED (SELECT g, tok, CAST(count(*) AS BIGINT) AS r
        |  FROM toks WHERE len(tok) > 0 GROUP BY 1, 2),
        |ff AS MATERIALIZED (SELECT g, r, CAST(count(*) AS BIGINT) AS n_r
        |  FROM f GROUP BY 1, 2),
        |rep AS (SELECT g, CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_r) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN r = 2 THEN n_r ELSE 0 END) AS BIGINT) AS n2
        |  FROM ff GROUP BY 1)
        |SELECT g AS lang, n_tokens, vocab, n1, n2,
        |  round(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS p_unseen,
        |  round(CAST(vocab AS DOUBLE) + CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
        |    / (2.0 * CAST(greatest(n2, 1) AS DOUBLE)), 6) AS chao1,
        |  round(2.0 * CAST(n2 AS DOUBLE) / CAST(greatest(n1, 1) AS DOUBLE), 9) AS r_star_1
        |FROM rep ORDER BY lang""".stripMargin)),

    // RFM1: recency/frequency/monetary quintile segmentation of the
    // order book — exact micro spend, deterministic (metric, entity)
    // ntile scores, q³-bounded segment rollup.
    "rfm1_rfm_segments" -> Q(
      (s, d) => graft.ops.Sessions.rfmSegments(
          s.read.parquet(s"$d/orders.parquet"),
          "o_custkey", "o_orderdate", "o_totalprice", q = 5)
        .orderBy("r", "f", "m"),
      Some("""WITH per AS MATERIALIZED (SELECT o_custkey AS e,
        |    max(o_orderdate) AS last_t, CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS mon_micro
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(last_t) AS anchor FROM per),
        |sc AS MATERIALIZED (SELECT e, freq, mon_micro,
        |    CAST(date_diff('day', last_t, a.anchor) AS BIGINT) AS rec_days
        |  FROM per, a),
        |sc2 AS MATERIALIZED (SELECT e, mon_micro, rec_days,
        |    CAST(ntile(5) OVER (ORDER BY rec_days DESC, e ASC) AS BIGINT) AS r,
        |    CAST(ntile(5) OVER (ORDER BY freq ASC, e ASC) AS BIGINT) AS f,
        |    CAST(ntile(5) OVER (ORDER BY mon_micro ASC, e ASC) AS BIGINT) AS m
        |  FROM sc)
        |SELECT r, f, m, CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(min(rec_days) AS BIGINT) AS rec_min,
        |  CAST(max(rec_days) AS BIGINT) AS rec_max,
        |  round(CAST(sum(CAST(mon_micro AS DECIMAL(38,0))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) / 1e6, 6) AS avg_monetary
        |FROM sc2 GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin)),

    // WL1: Weisfeiler–Lehman refinement fingerprint of the handoff
    // graph — distinct-label trajectory per round + an order-free
    // 60-bit final-labeling hash; the graph-shape drift signature.
    "wl1_wl_fingerprint" -> Q(
      (s, d) => graft.ops.Graph.wlRefinement(
          graft.ops.Graph.handoffEdges(
            Queries.events(s, d), "event_type", "user_id", "ts", "event_id"),
          rounds = 3)
        .orderBy("round"),
      Some(OracleGen.wl1Sql(3))),

    // CAP1: Chapman capture–recapture — estimate the distinct-user
    // universe from the week-1 / week-3 capture overlap, with the true
    // union count emitted beside it as the in-query estimator audit.
    "cap1_capture_recapture" -> Q(
      (s, d) => {
        val ev = Queries.events(s, d)
        val a = ev.filter(col("ts") < lit("2024-01-08").cast("timestamp"))
          .select(col("user_id").as("id"))
        val b = ev.filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
            col("ts") < lit("2024-01-22").cast("timestamp"))
          .select(col("user_id").as("id"))
        graft.ops.Stats.captureRecapture(a, b)
      },
      Some("""WITH a AS (SELECT DISTINCT user_id AS id FROM events
        |  WHERE ts < TIMESTAMP '2024-01-08'),
        |b AS (SELECT DISTINCT user_id AS id FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-22'),
        |c AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM a) AS n1,
        |    (SELECT CAST(count(*) AS BIGINT) FROM b) AS n2,
        |    (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b USING (id)) AS m,
        |    (SELECT CAST(count(*) AS BIGINT) FROM (SELECT id FROM a UNION SELECT id FROM b)) AS n_true),
        |e AS (SELECT *,
        |    (CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
        |      / (CAST(m AS DOUBLE) + 1.0) - 1.0 AS n_hat,
        |    sqrt((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
        |      * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
        |      / ((CAST(m AS DOUBLE) + 1.0) * (CAST(m AS DOUBLE) + 1.0)
        |        * (CAST(m AS DOUBLE) + 2.0))) AS se
        |  FROM c)
        |SELECT n1, n2, m, n_true,
        |  floor(n_hat * 1e3 + 0.5) / 1e3 AS n_hat,
        |  floor(se * 1e6 + 0.5) / 1e6 AS se,
        |  floor((n_hat - 1.96 * se) * 1e3 + 0.5) / 1e3 AS ci_lo,
        |  floor((n_hat + 1.96 * se) * 1e3 + 0.5) / 1e3 AS ci_hi
        |FROM e""".stripMargin)),

    // EXP1: experiment-health gate — SRM chi-square vs 50/50, Wilson
    // CIs on conversion (value > 100), odds ratio, and the continuous-
    // metric MDE at alpha=.05/80% power; one aggregate pass, literal z's.
    "exp1_experiment_health" -> Q(
      (s, d) => graft.ops.Stats.experimentHealth(
        Queries.events(s, d).withColumn("arm",
          when(col("user_id") % 2 === 0, "control").otherwise("treatment")),
        "value", "arm", "control", "treatment", convThreshold = 100.0),
      Some("""WITH b AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
        |    CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)) AS q,
        |    value > 100.0 AS conv
        |  FROM events),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 'control' AND conv THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN arm = 'treatment' AND conv THEN 1 ELSE 0 END) AS BIGINT) AS conv_b,
        |    sum(CASE WHEN arm = 'control' THEN q ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_a,
        |    sum(CASE WHEN arm = 'treatment' THEN q ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_b,
        |    sum(CASE WHEN arm = 'control' THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_a,
        |    sum(CASE WHEN arm = 'treatment' THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_b
        |  FROM b),
        |c AS (SELECT n_a, n_b, conv_a, conv_b,
        |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        |    CAST(conv_a AS DOUBLE) AS ca, CAST(conv_b AS DOUBLE) AS cb,
        |    CAST(s_a AS DOUBLE) AS sa, CAST(s_b AS DOUBLE) AS sb,
        |    CAST(ss_a AS DOUBLE) AS ssa, CAST(ss_b AS DOUBLE) AS ssb
        |  FROM m),
        |e AS (SELECT *, (na + nb) / 2.0 AS ee FROM c),
        |f AS (SELECT *,
        |    (na - ee) * (na - ee) / ee + (nb - ee) * (nb - ee) / ee AS srm,
        |    (ssa - sa * sa / na) / (na - 1.0) AS var_a,
        |    (ssb - sb * sb / nb) / (nb - 1.0) AS var_b,
        |    ca / na AS pa, cb / nb AS pb,
        |    1.0 + (1.96 * 1.96) / na AS dena,
        |    1.0 + (1.96 * 1.96) / nb AS denb
        |  FROM e),
        |g AS (SELECT *,
        |    (pa + (1.96 * 1.96) / (2.0 * na)) / dena AS cen_a,
        |    1.96 * sqrt(pa * (1.0 - pa) / na + (1.96 * 1.96) / (4.0 * na * na)) / dena AS hw_a,
        |    (pb + (1.96 * 1.96) / (2.0 * nb)) / denb AS cen_b,
        |    1.96 * sqrt(pb * (1.0 - pb) / nb + (1.96 * 1.96) / (4.0 * nb * nb)) / denb AS hw_b
        |  FROM f)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  round(srm, 6) AS srm_chi2, srm < 3.841 AS srm_ok,
        |  round(ca / na, 6) AS rate_a, round(cb / nb, 6) AS rate_b,
        |  round(cen_a - hw_a, 6) AS rate_a_lo, round(cen_a + hw_a, 6) AS rate_a_hi,
        |  round(cen_b - hw_b, 6) AS rate_b_lo, round(cen_b + hw_b, 6) AS rate_b_hi,
        |  CASE WHEN conv_a > 0 AND (nb - cb) > 0
        |    THEN round((cb * (na - ca)) / (ca * (nb - cb)), 6)
        |    ELSE CAST('NaN' AS DOUBLE) END AS odds_ratio,
        |  round(2.8016 * sqrt(var_a / na + var_b / nb) / 1e6, 6) AS mde_abs
        |FROM g""".stripMargin)),

    // TH1: Theil–Sen robust regression (price ~ quantity) in the
    // paired variant — rank by x, pair i with i+n/2, median slope then
    // median residual; exact-rank selections, no all-pairs blowup.
    "th1_theil_sen" -> Q(
      (s, d) => graft.ops.Stats.theilSen(
          li(s, d).select(
            floor(col("l_quantity") * lit(1e6) + lit(0.5)).cast("long").as("x_q"),
            floor(col("l_extendedprice") * lit(1e6) + lit(0.5)).cast("long").as("y_q"),
            (col("l_orderkey") * 100 + col("l_linenumber")).cast("long").as("tb")))
        .select(col("n"), col("n_pairs"), round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept")),
      Some("""WITH pts AS (SELECT CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT) AS x_q,
        |    CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT) AS y_q,
        |    CAST(l_orderkey * 100 + l_linenumber AS BIGINT) AS tb FROM lineitem),
        |rk AS MATERIALIZED (SELECT x_q, y_q, tb,
        |    CAST(row_number() OVER (ORDER BY x_q, tb) - 1 AS BIGINT) AS idx FROM pts),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) // 2 AS BIGINT) AS h FROM rk),
        |pr AS (SELECT a.idx AS pid, a.x_q AS xa, a.y_q AS ya, b.x_q AS xb, b.y_q AS yb
        |  FROM rk a JOIN nn ON a.idx < nn.h
        |  JOIN rk b ON b.idx = a.idx + nn.h
        |  WHERE b.x_q != a.x_q),
        |sl AS MATERIALIZED (SELECT pid,
        |    CAST(floor(CAST(yb - ya AS DOUBLE) / CAST(xb - xa AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS s
        |  FROM pr),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST((count(*) + 1) // 2 AS BIGINT) AS ks FROM sl),
        |srk AS (SELECT s, row_number() OVER (ORDER BY s, pid) AS rr FROM sl),
        |sv AS (SELECT s AS slope_nano FROM srk JOIN mm ON srk.rr = mm.ks),
        |res AS (SELECT y_q - (CASE WHEN sv.slope_nano * x_q >= 0
        |      THEN (sv.slope_nano * x_q) // 1000000000
        |      ELSE -((-(sv.slope_nano * x_q)) // 1000000000) END) AS r, tb
        |  FROM pts CROSS JOIN sv),
        |ir AS (SELECT r, row_number() OVER (ORDER BY r, tb) AS rr FROM res),
        |ni AS (SELECT CAST((count(*) + 1) // 2 AS BIGINT) AS ki FROM res),
        |iv AS (SELECT r AS icept FROM ir JOIN ni ON ir.rr = ni.ki)
        |SELECT nn.n, mm.m AS n_pairs,
        |  round(CAST(sv.slope_nano AS DOUBLE) / 1e9, 6) AS slope,
        |  round(CAST(iv.icept AS DOUBLE) / 1e6, 6) AS intercept
        |FROM nn CROSS JOIN mm CROSS JOIN sv CROSS JOIN iv""".stripMargin)),

    // SUR1: Kaplan–Meier time-to-ship survival (weeks from order to
    // shipment) with ADMINISTRATIVE right-censoring at study end =
    // max order date — items not yet shipped by then leave the risk
    // set without a death; integer fold keeps both engines bit-equal.
    // SUR2: Nelson-Aalen cumulative hazard — the additive companion of
    // sur1's product-limit curve over the same ship-latency lifetimes;
    // exact pico term divisions, integer cumulative window.
    "sur2_nelson_aalen" -> Q(
      (s, d) => {
        val ords = s.read.parquet(s"$d/orders.parquet")
        val se = ords.agg(max("o_orderdate").as("se"))
        val j = li(s, d)
          .join(ords.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .crossJoin(broadcast(se))
        val lab = j.select(
          when(col("l_shipdate") <= col("se"),
              greatest(lit(0L), datediff(col("l_shipdate"), col("o_orderdate")).cast("long")))
            .otherwise(greatest(lit(0L), datediff(col("se"), col("o_orderdate")).cast("long")))
            .as("t_raw"),
          (col("l_shipdate") > col("se")).as("cens"))
          .select(expr("t_raw div 7").as("t"), col("cens"))
        graft.ops.Stats.nelsonAalen(lab).orderBy("t_day")
      },
      Some("""WITH se AS (SELECT max(o_orderdate) AS se FROM orders),
        |j AS (SELECT l.l_shipdate, o.o_orderdate, s.se FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey CROSS JOIN se s),
        |lab AS (SELECT (CASE WHEN l_shipdate <= se
        |      THEN greatest(0, date_diff('day', o_orderdate, l_shipdate))
        |      ELSE greatest(0, date_diff('day', o_orderdate, se)) END) // 7 AS t,
        |    l_shipdate > se AS cens FROM j),
        |per AS (SELECT t,
        |    CAST(sum(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN cens THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM lab GROUP BY 1),
        |tt AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_total FROM per),
        |wn AS (SELECT t, d, c, CAST(n_total - coalesce(sum(d + c)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS n_at
        |  FROM per CROSS JOIN tt),
        |ev AS (SELECT t, d, c, n_at,
        |    (d * 1000000000000) // n_at AS term_pico FROM wn WHERE d > 0),
        |cm AS (SELECT t, d, c, n_at, CAST(sum(term_pico)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS h_pico FROM ev)
        |SELECT t AS t_day, n_at AS n_risk, d AS n_deaths, c AS n_censored,
        |  (h_pico + 500000) // 1000000 AS hazard_micro
        |FROM cm ORDER BY t_day""".stripMargin)),

    // ICC1: intraclass correlation ICC(2,1) — labeler agreement for
    // CONTINUOUS scores (items = users, raters = event types, rating
    // = exact integer cents-mean of value): how much of a score's
    // variance is the item rather than the rater or noise. The
    // scalar-judge QA beside the categorical kappa family.
    "icc1_intraclass" -> Q(
      (s, d) => {
        val r = Queries.events(s, d)
          .groupBy(col("user_id").as("it"), col("event_type").as("ra"))
          .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .cast("long").as("sv"), count(lit(1)).cast("long").as("cnt"))
          .select(col("it"), col("ra"), expr("sv div cnt").as("rating"))
        graft.ops.Stats.icc21(r, "it", "ra", "rating")
      },
      Some("""WITH cells0 AS (SELECT CAST(user_id AS VARCHAR) AS it,
        |    event_type AS ra,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // count(*) AS rating
        |  FROM events GROUP BY 1, 2),
        |cells AS (SELECT it, ra,
        |    CAST(floor(rating * 1e6 + 0.5) AS BIGINT) AS y FROM cells0),
        |kk AS (SELECT CAST(count(DISTINCT ra) AS BIGINT) AS k FROM cells),
        |rws AS (SELECT it, CAST(count(*) AS BIGINT) AS nr,
        |    CAST(sum(y) AS BIGINT) AS ri FROM cells GROUP BY 1),
        |kept AS (SELECT it, ri FROM rws, kk WHERE nr = kk.k),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        |  FROM rws, kk WHERE nr != kk.k),
        |kc AS (SELECT c.it, c.ra, c.y FROM cells c
        |  JOIN kept ON kept.it = c.it),
        |cls AS (SELECT ra, CAST(sum(y) AS BIGINT) AS cj FROM kc GROUP BY 1),
        |mm AS (SELECT CAST(sum(y) AS BIGINT) AS s,
        |    sum(CAST(y AS HUGEINT) * y) AS ss FROM kc),
        |rs AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ri AS HUGEINT) * ri) AS sr2 FROM kept),
        |cs2 AS (SELECT sum(CAST(cj AS HUGEINT) * cj) AS sc2 FROM cls)
        |SELECT n AS n_items, kk.k AS k_raters, n_dropped,
        |  CAST(floor((((CAST(sr2 AS DOUBLE) / CAST(kk.k AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / CAST(n * kk.k AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
        |    - (CAST(ss AS DOUBLE)
        |      - CAST(sr2 AS DOUBLE) / CAST(kk.k AS DOUBLE)
        |      - CAST(sc2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / CAST(n * kk.k AS DOUBLE))
        |      / CAST((n - 1) * (kk.k - 1) AS DOUBLE))
        |  / ((CAST(sr2 AS DOUBLE) / CAST(kk.k AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / CAST(n * kk.k AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
        |    + CAST(kk.k - 1 AS DOUBLE) * ((CAST(ss AS DOUBLE)
        |      - CAST(sr2 AS DOUBLE) / CAST(kk.k AS DOUBLE)
        |      - CAST(sc2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / CAST(n * kk.k AS DOUBLE))
        |      / CAST((n - 1) * (kk.k - 1) AS DOUBLE))
        |    + CAST(kk.k AS DOUBLE) * (((CAST(sc2 AS DOUBLE)
        |        / CAST(n AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / CAST(n * kk.k AS DOUBLE)) / CAST(kk.k - 1 AS DOUBLE))
        |      - ((CAST(ss AS DOUBLE)
        |        - CAST(sr2 AS DOUBLE) / CAST(kk.k AS DOUBLE)
        |        - CAST(sc2 AS DOUBLE) / CAST(n AS DOUBLE)
        |        + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |          / CAST(n * kk.k AS DOUBLE))
        |        / CAST((n - 1) * (kk.k - 1) AS DOUBLE)))
        |      / CAST(n AS DOUBLE)))
        |  * 1e9 + 0.5) AS BIGINT) AS icc21_nano
        |FROM mm, rs, cs2, kk, drp WHERE n >= 2 AND kk.k >= 2""".stripMargin)),

    "sur1_kaplan_meier" -> Q(
      (s, d) => {
        val ords = s.read.parquet(s"$d/orders.parquet")
        val se = ords.agg(max("o_orderdate").as("se"))
        val j = li(s, d)
          .join(ords.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .crossJoin(broadcast(se))
        val lab = j.select(
          when(col("l_shipdate") <= col("se"),
              greatest(lit(0L), datediff(col("l_shipdate"), col("o_orderdate")).cast("long")))
            .otherwise(greatest(lit(0L), datediff(col("se"), col("o_orderdate")).cast("long")))
            .as("t_raw"),
          (col("l_shipdate") > col("se")).as("cens"))
          .select(expr("t_raw div 7").as("t"), col("cens"))
        graft.ops.Stats.kaplanMeier(lab).orderBy("t_day")
      },
      Some("""WITH se AS (SELECT max(o_orderdate) AS se FROM orders),
        |j AS (SELECT l.l_shipdate, o.o_orderdate, s.se FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey CROSS JOIN se s),
        |lab AS (SELECT (CASE WHEN l_shipdate <= se
        |      THEN greatest(0, date_diff('day', o_orderdate, l_shipdate))
        |      ELSE greatest(0, date_diff('day', o_orderdate, se)) END) // 7 AS t,
        |    l_shipdate > se AS cens FROM j),
        |per AS (SELECT t,
        |    CAST(sum(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN cens THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM lab GROUP BY 1),
        |tt AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_total FROM per),
        |wn AS (SELECT t, d, c, CAST(n_total - coalesce(sum(d + c)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS n_at
        |  FROM per CROSS JOIN tt),
        |de AS (SELECT t, d, c, n_at FROM wn WHERE d > 0),
        |dl AS (SELECT list(d * 4294967296 + n_at ORDER BY t) AS ds,
        |    list(t ORDER BY t) AS ts, list(n_at ORDER BY t) AS ns,
        |    list(d ORDER BY t) AS dd, list(c ORDER BY t) AS cs FROM de),
        |pf AS (SELECT unnest(range(1, len(ds) + 1)) AS i,
        |    ds, ts, ns, dd, cs FROM dl),
        |rw AS (SELECT ts[i] AS t_day, ns[i] AS n_risk, dd[i] AS n_deaths,
        |    cs[i] AS n_censored,
        |    list_reduce(list_prepend(CAST(1000000000000 AS BIGINT),
        |        list_slice(ds, 1, i)),
        |      (acc, x) -> acc * ((x % 4294967296) - (x // 4294967296))
        |        // (x % 4294967296)) AS s_pico
        |  FROM pf)
        |SELECT t_day, CAST(n_risk AS BIGINT) AS n_risk, n_deaths, n_censored,
        |  CAST((s_pico + 500000) // 1000000 AS BIGINT) AS survival_micro
        |FROM rw ORDER BY t_day""".stripMargin)),

    // PK1: unbiased pass@k (Chen et al. 2021) — each user plays a
    // task, their events the sampled attempts, a high-value purchase a
    // "pass"; per (k, task) the falling-factorial pico-fold
    // 1 − Π (n−c−i)/(n−i). The LLM-eval staple computed as ONE
    // combinable count pass + a tasks×|ks|-bounded exact integer fold.
    "pk1_pass_at_k" -> Q(
      (s, d) => graft.ops.Classify.passAtK(
          Queries.events(s, d).withColumn("correct",
            col("event_type") === "purchase" && col("value") > 90.0),
          "user_id", "correct")
        .withColumn("task", col("task").cast("long"))
        .orderBy("k", "task"),
      Some("""WITH per AS (SELECT CAST(user_id AS BIGINT) AS task,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' AND value > 90.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
        |j AS (SELECT k, task, n, c,
        |    list_reduce(list_prepend(CAST(1000000000000 AS BIGINT),
        |      list_transform(range(0, k), i -> CAST(i AS BIGINT))),
        |      (acc, i) -> (acc * (n - c - i)) // (n - i)) AS p_pico
        |  FROM per CROSS JOIN ks WHERE n >= k)
        |SELECT k, task, n AS n_samples, c AS n_correct,
        |  (1000000000000 - p_pico) // 1000000 AS pass_micro
        |FROM j ORDER BY k, task""".stripMargin)),

    // BR1: Murphy decomposition of the Brier score for cal1's quality
    // scorer — BS = reliability − resolution + uncertainty (+ explicit
    // within-bin residual). Same scored table as cal1; one bin pass,
    // bins-sized terms pico-quantized before the order-free sum.
    "br1_brier_decomposition" -> Q(
      (s, d) => {
        val scored = Curate.lrQualityScore(docs(s, d))
          .withColumn("is_unique",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text")))) === 1)
        graft.ops.Classify.brierDecomposition(scored, "lr_score", "is_unique")
      },
      Some("""WITH q AS (
        |  SELECT doc_id, text,
        |    CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
        |  FROM documents),
        |sc AS (SELECT doc_id, text,
        |    1.0 / (1.0 + exp(0.0 - (-2.0 + alpha_ratio * 3.0 + stopword_ratio * 2.5
        |      + mean_word_len * 0.15 - punct_ratio * 4.0))) AS s
        |  FROM q),
        |lab AS (SELECT doc_id, s,
        |    CAST(count(*) OVER (PARTITION BY md5(text)) = 1 AS BIGINT) AS y
        |  FROM sc),
        |qz AS (SELECT CAST(floor(s * 1e6 + 0.5) AS BIGINT) AS sm, y FROM lab),
        |per AS (SELECT least((sm * 10) // 1000000, 9) AS b,
        |    CAST(count(*) AS BIGINT) AS nb, CAST(sum(sm) AS BIGINT) AS sb,
        |    CAST(sum(y) AS BIGINT) AS ob,
        |    sum(CAST(sm - 1000000 * y AS DECIMAL(38,0))
        |      * CAST(sm - 1000000 * y AS DECIMAL(38,0))) AS sq
        |  FROM qz GROUP BY 1),
        |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(ob) AS BIGINT) AS o,
        |    sum(sq) AS sq_tot, CAST(count(*) AS BIGINT) AS bins_used FROM per),
        |terms AS (SELECT per.nb, per.sb, per.ob, tot.n, tot.o,
        |    CAST(floor(pow(CAST(sb AS DOUBLE) - 1e6 * CAST(ob AS DOUBLE), 2.0)
        |      / (CAST(nb AS DOUBLE) * 1e12) * 1e12 + 0.5) AS BIGINT) AS rel_pico,
        |    CAST(floor(pow(CAST(ob AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(o AS DOUBLE) * CAST(nb AS DOUBLE), 2.0)
        |      / (CAST(nb AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |      * 1e12 + 0.5) AS BIGINT) AS res_pico
        |  FROM per, tot),
        |agg AS (SELECT tot.n, tot.o, tot.sq_tot, tot.bins_used,
        |    CAST(sum(rel_pico) AS BIGINT) AS rel_sum,
        |    CAST(sum(res_pico) AS BIGINT) AS res_sum
        |  FROM terms, tot GROUP BY 1, 2, 3, 4)
        |SELECT n, bins_used,
        |  CAST(floor(CAST(sq_tot AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12)
        |    * 1e9 + 0.5) AS BIGINT) AS bs_nano,
        |  CAST(floor(CAST(rel_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12)
        |    * 1e9 + 0.5) AS BIGINT) AS reliability_nano,
        |  CAST(floor(CAST(res_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12)
        |    * 1e9 + 0.5) AS BIGINT) AS resolution_nano,
        |  CAST(floor(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
        |    * (1.0 - CAST(o AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |    AS uncertainty_nano,
        |  CAST(floor((CAST(sq_tot AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12)
        |    - (CAST(rel_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12)
        |      - CAST(res_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12)
        |      + CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
        |        * (1.0 - CAST(o AS DOUBLE) / CAST(n AS DOUBLE)))) * 1e9 + 0.5)
        |    AS BIGINT) AS residual_nano
        |FROM agg""".stripMargin)),

    // RC1: risk-coverage curve / AURC (Geifman & El-Yaniv '17) — what
    // error rate does each abstention level buy from cal1's scorer;
    // exact integer confidences, prefix risks, and AURC.
    "rc1_risk_coverage" -> Q(
      (s, d) => {
        val scored = Curate.lrQualityScore(docs(s, d))
          .withColumn("is_unique",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text")))) === 1)
        Classify.riskCoverage(scored, "lr_score", "is_unique", "doc_id")
          .orderBy("coverage_micro")
      },
      Some("""WITH q AS (
        |  SELECT doc_id, text,
        |    CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
        |  FROM documents),
        |sc AS (SELECT doc_id, text,
        |    1.0 / (1.0 + exp(0.0 - (-2.0 + alpha_ratio * 3.0 + stopword_ratio * 2.5
        |      + mean_word_len * 0.15 - punct_ratio * 4.0))) AS s
        |  FROM q),
        |lab AS (SELECT doc_id AS id,
        |    CAST(floor(s * 1e6 + 0.5) AS BIGINT) AS sm,
        |    CAST(count(*) OVER (PARTITION BY md5(text)) = 1 AS BIGINT) AS y
        |  FROM sc),
        |b2 AS (SELECT id, sm, y, abs(sm - 500000) AS conf,
        |    CASE WHEN sm >= 500000 THEN 1 ELSE 0 END AS pred FROM lab),
        |b3 AS (SELECT *, CASE WHEN pred <> y THEN 1 ELSE 0 END AS err FROM b2),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY conf DESC, id ASC) AS BIGINT) AS k,
        |    CAST(sum(err) OVER (ORDER BY conf DESC, id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_err
        |  FROM b3),
        |r2 AS (SELECT *, (cum_err * 1000000) // k AS risk_micro FROM r),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(risk_micro AS DECIMAL(38,0))) AS aurc_sum FROM r2)
        |SELECT (k * 1000000) // n AS coverage_micro, k AS n_kept,
        |  cum_err AS n_errors, CAST(risk_micro AS BIGINT) AS risk_micro,
        |  CAST(CAST(aurc_sum AS HUGEINT) // n AS BIGINT) AS aurc_micro
        |FROM r2, tt
        |WHERE list_contains(list_transform(range(1, 11),
        |  dd -> CAST(ceil(CAST(n AS DOUBLE) * dd / 10.0) AS BIGINT)), k)
        |ORDER BY coverage_micro""".stripMargin)),

    // CAL2: temperature scaling of cal1's quality scorer — grid-search
    // the logit temperature minimizing NLL against the is_unique
    // label; the parametric fix for the miscalibration br1's
    // reliability term measures. Grid is the plan; argmin is integer.
    "cal2_temperature_fit" -> Q(
      (s, d) => {
        val scored = Curate.lrQualityScore(docs(s, d))
          .withColumn("is_unique",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text")))) === 1)
        graft.ops.Classify.temperatureFit(scored, "lr_linear", "is_unique")
          .orderBy("t_milli")
      },
      Some("""WITH q AS (
        |  SELECT doc_id, text,
        |    CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
        |  FROM documents),
        |sc AS (SELECT doc_id, text,
        |    -2.0 + alpha_ratio * 3.0 + stopword_ratio * 2.5
        |      + mean_word_len * 0.15 - punct_ratio * 4.0 AS z
        |  FROM q),
        |lab AS (SELECT z,
        |    CASE WHEN count(*) OVER (PARTITION BY md5(text)) = 1
        |      THEN 1.0 ELSE 0.0 END AS y
        |  FROM sc),
        |tg AS (SELECT unnest([0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 4.0]) AS t),
        |rws AS (SELECT t,
        |    least(greatest(1.0 / (1.0 + exp((0.0 - z) / t)), 1e-9), 1.0 - 1e-9) AS pc,
        |    y
        |  FROM lab CROSS JOIN tg),
        |per AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor((0.0 - (y * ln(pc) + (1.0 - y) * ln(1.0 - pc)))
        |      * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS nll_sum_pico
        |  FROM rws GROUP BY t),
        |rk AS (SELECT *, row_number() OVER (ORDER BY nll_sum_pico ASC, t ASC) AS rn
        |  FROM per)
        |SELECT CAST(floor(t * 1000.0 + 0.5) AS BIGINT) AS t_milli, n,
        |  nll_sum_pico // n AS mean_nll_pico, rn = 1 AS is_best
        |FROM rk ORDER BY t_milli""".stripMargin)),

    // KT1: Kendall τ-b between the per-source QUALITY ranking and the
    // per-source LENGTH ranking — "does longer mean better here?" The
    // per-source means are exact integer divs; the pair table is
    // sources²-bounded.
    "kt1_kendall_tau" -> Q(
      (s, d) => {
        val perSrc = graft.ops.Text.withQuality(docs(s, d))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("nd"),
            sum(floor(col("quality_score") * lit(1e6) + lit(0.5))
              .cast("long")).cast("long").as("qs"),
            sum(col("n_chars").cast("long")).cast("long").as("cs"))
          .select(col("source"), expr("qs div nd").as("x"),
            expr("cs div nd").as("y"))
        graft.ops.Stats.kendallTauB(perSrc, "source", "x", "y")
      },
      Some("""WITH q AS (SELECT source, n_chars,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2) AS qs
        |  FROM documents),
        |per AS (SELECT source,
        |    CAST(sum(CAST(floor(qs * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      // CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT)
        |      // CAST(count(*) AS BIGINT) AS y
        |  FROM q GROUP BY 1),
        |pr AS (SELECT a.x - b.x AS dx, a.y - b.y AS dy
        |  FROM per a JOIN per b ON a.source < b.source),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN dx <> 0 AND dy <> 0
        |      AND (dx > 0) = (dy > 0) THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |    CAST(sum(CASE WHEN dx <> 0 AND dy <> 0
        |      AND (dx > 0) <> (dy > 0) THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |    CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
        |    CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
        |  FROM pr),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per)
        |SELECT n, n0, concordant, discordant, ties_x, ties_y,
        |  CAST(floor(CAST(concordant - discordant AS DOUBLE)
        |    / sqrt(CAST(n0 - ties_x AS DOUBLE) * CAST(n0 - ties_y AS DOUBLE))
        |    * 1e9 + 0.5) AS BIGINT) AS tau_b_nano
        |FROM m, c""".stripMargin)),

    // NY1: Neyman allocation of a 10k eval budget across event types
    // by N_h*sigma_h — exact moments, pico weights, largest-remainder
    // apportionment so the allocations sum to the budget exactly.
    "ny1_neyman_allocation" -> Q(
      (s, d) => graft.ops.Stats.neymanAllocation(
          Queries.events(s, d), "event_type", "value", budget = 10000L)
        .orderBy("stratum"),
      Some("""WITH cells AS (SELECT event_type AS h,
        |    CAST(count(*) AS BIGINT) AS n_h,
        |    sum(CAST(CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS s,
        |    sum(CAST(CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS DECIMAL(38,0))
        |      * CAST(CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS ss
        |  FROM events GROUP BY 1),
        |wgt AS (SELECT h, n_h,
        |    greatest(CAST(floor(CAST(n_h AS DOUBLE)
        |      * sqrt(greatest((CAST(ss AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n_h AS DOUBLE))
        |        / CAST(n_h AS DOUBLE), 0.0)) + 0.5) AS BIGINT), 1) AS w_pico
        |  FROM cells),
        |tt AS (SELECT CAST(sum(w_pico) AS HUGEINT) AS w_tot FROM wgt),
        |sh AS (SELECT h, n_h, w_pico,
        |    CAST((CAST(w_pico AS HUGEINT) * 10000)
        |      // (CASE WHEN w_tot = 0 THEN 1 ELSE w_tot END) AS BIGINT) AS base,
        |    CAST((CAST(w_pico AS HUGEINT) * 10000)
        |      % (CASE WHEN w_tot = 0 THEN 1 ELSE w_tot END) AS BIGINT) AS rem
        |  FROM wgt, tt),
        |k AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS k FROM sh),
        |rr AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, h ASC)
        |    AS BIGINT) AS rr FROM sh)
        |SELECT h AS stratum, n_h, w_pico,
        |  base + CASE WHEN rr <= k.k THEN 1 ELSE 0 END AS n_alloc
        |FROM rr, k ORDER BY stratum""".stripMargin)),

    // SX1: Simpson's-paradox audit — per engagement-bucket association
    // sign (exact cross-products, no division) vs the pooled sign,
    // reversal flags + audit scalar; the naive-read warning beside
    // ipw1's correction.
    "sx1_simpson_audit" -> Q(
      (s, d) => {
        val units = Queries.events(s, d).groupBy("user_id").agg(
            (sum(when(col("event_type") === "signup", 1L).otherwise(0L)) > 13L)
              .as("treated"),
            (sum(when(col("event_type") === "purchase",
              floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
              .otherwise(0L)) > 500000000L).as("converted"),
            count(lit(1)).cast("long").as("n_ev"))
          .withColumn("stratum", expr("n_ev div 10"))
        graft.ops.Stats.simpsonAudit(units, "stratum", "treated", "converted")
          .orderBy("stratum")
      },
      Some("""WITH u AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) > 13 AS treated,
        |    sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
        |      > 500000000 AS converted,
        |    CAST(count(*) AS BIGINT) AS n_ev
        |  FROM events GROUP BY 1),
        |un AS (SELECT CAST(n_ev // 10 AS VARCHAR) AS h,
        |    CASE WHEN treated THEN 1 ELSE 0 END AS arm,
        |    CASE WHEN converted THEN 1 ELSE 0 END AS y FROM u),
        |cells AS (SELECT h, arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s FROM un GROUP BY 1, 2),
        |st AS (SELECT h,
        |    CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN s ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT) AS s0
        |  FROM cells GROUP BY 1 HAVING n1 > 0 AND n0 > 0),
        |sg AS (SELECT *, CAST(sign(CAST(CAST(s1 AS HUGEINT) * n0
        |      - CAST(s0 AS HUGEINT) * n1 AS DOUBLE)) AS INTEGER) AS sign
        |  FROM st),
        |pl AS (SELECT CAST(sign(CAST(
        |      CAST(sum(s1) AS HUGEINT) * CAST(sum(n0) AS HUGEINT)
        |      - CAST(sum(s0) AS HUGEINT) * CAST(sum(n1) AS HUGEINT)
        |    AS DOUBLE)) AS INTEGER) AS pooled_sign FROM sg),
        |fl AS (SELECT sg.*, pl.pooled_sign,
        |    sg.sign <> 0 AND pl.pooled_sign <> 0
        |      AND sg.sign <> pl.pooled_sign AS reversed
        |  FROM sg, pl),
        |ad AS (SELECT CAST(sum(CASE WHEN reversed THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_reversed FROM fl)
        |SELECT h AS stratum, n1, s1, n0, s0, sign, pooled_sign, reversed,
        |  ad.n_reversed
        |FROM fl, ad ORDER BY stratum""".stripMargin)),

    // NS1: word2vec negative-sampling table — count^0.75 as
    // exp(0.75 ln c) (identical composition both engines, never
    // pow()), pico weights, exact integer probabilities and 2^60
    // roulette boundaries in a total order.
    "ns1_negative_sampling" -> Q(
      (s, d) => graft.ops.Text.negativeSamplingTable(docs(s, d), topK = 30)
        .orderBy("rank"),
      Some("""WITH tk AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |    x -> length(x) > 0)) AS t FROM documents),
        |c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
        |w AS (SELECT t, c,
        |    CAST(floor(exp(0.75 * ln(CAST(c AS DOUBLE))) * 1e12 + 0.5)
        |      AS BIGINT) AS w_pico FROM c),
        |tt AS (SELECT sum(CAST(w_pico AS DECIMAL(38,0))) AS w_tot FROM w),
        |rk AS (SELECT t, c, w_pico,
        |    CAST(row_number() OVER (ORDER BY w_pico DESC, t ASC) AS BIGINT) AS r,
        |    sum(CAST(w_pico AS DECIMAL(38,0))) OVER (ORDER BY w_pico DESC, t ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
        |  FROM w)
        |SELECT r AS rank, t AS token, c,
        |  CAST((CAST(w_pico AS HUGEINT) * 1000000) // CAST(w_tot AS HUGEINT)
        |    AS BIGINT) AS p_micro,
        |  CAST((CAST(cum_w AS HUGEINT) * 1152921504606846976)
        |    // CAST(w_tot AS HUGEINT) AS BIGINT) AS wheel_hi
        |FROM rk, tt WHERE r <= 30 ORDER BY rank""".stripMargin)),

    // SR1: Spearman's rho over the same per-source (quality, length)
    // ranks as kt1 — the moment-based rank correlation; doubled
    // average ranks keep ties exact-integer, one sqrt at display.
    "sr1_spearman_rho" -> Q(
      (s, d) => {
        val perSrc = graft.ops.Text.withQuality(docs(s, d))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("nd"),
            sum(floor(col("quality_score") * lit(1e6) + lit(0.5))
              .cast("long")).cast("long").as("qs"),
            sum(col("n_chars").cast("long")).cast("long").as("cs"))
          .select(col("source"), expr("qs div nd").as("x"),
            expr("cs div nd").as("y"))
        graft.ops.Stats.spearmanRho(perSrc, "source", "x", "y")
      },
      Some("""WITH q AS (SELECT source, n_chars,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2) AS qs
        |  FROM documents),
        |per AS (SELECT source,
        |    CAST(sum(CAST(floor(qs * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      // CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT)
        |      // CAST(count(*) AS BIGINT) AS y
        |  FROM q GROUP BY 1),
        |rk AS (SELECT
        |    2 * rank() OVER (ORDER BY x) + count(*) OVER (PARTITION BY x) - 1 AS rx,
        |    2 * rank() OVER (ORDER BY y) + count(*) OVER (PARTITION BY y) - 1 AS ry
        |  FROM per),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(rx AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(ry AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(rx AS DECIMAL(38,0)) * CAST(ry AS DECIMAL(38,0))) AS sxy,
        |    sum(CAST(rx AS DECIMAL(38,0)) * CAST(rx AS DECIMAL(38,0))) AS sxx,
        |    sum(CAST(ry AS DECIMAL(38,0)) * CAST(ry AS DECIMAL(38,0))) AS syy
        |  FROM rk)
        |SELECT n,
        |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
        |  THEN CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1e9 + 0.5) AS BIGINT)
        |  ELSE 0 END AS rho_nano
        |FROM m""".stripMargin)),

    // VAC1: vacuum dry-run over a scripted versioned table — one
    // snapshot per retention class (prunable / retained / pointed /
    // staged_unpointed crash leftover) plus a stray tmp file; the
    // oracle recomputes every class and count from the raw table.
    "vac1_vacuum_report" -> Q(
      (s, d) => {
        import graft.ingest.VersionedDir
        val dir = Queries.scratch("vac1_tbl")
        val orders = s.read.parquet(s"$d/orders.parquet")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        def slice(mods: Seq[Int]) =
          orders.filter(pmod(col("o_orderkey"), lit(8)).isin(mods.map(Integer.valueOf): _*))
        VersionedDir.publish(slice(Seq(0)), dir, 1L)
        VersionedDir.publish(slice(Seq(0, 1)), dir, 2L)
        VersionedDir.publish(slice(Seq(0, 1, 2)), dir, 3L)
        // crash artifact: staged but never pointed
        VersionedDir.stage(slice(Seq(0, 1, 2, 3)), dir, 4L)
        // interrupted writer's tmp junk
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_tmp_junk"))
        out.write("junk".getBytes("UTF-8")); out.close()
        // keep = 3 so every retention class appears: v1 prunable,
        // v2 retained, v3 pointed, v4 staged_unpointed
        VersionedDir.vacuumReport(s, dir, keep = 3).orderBy("version")
      },
      Some("""WITH c AS (SELECT
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 8 = 0) AS n0,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 8 IN (0, 1)) AS n01,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 8 IN (0, 1, 2)) AS n012,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 8 IN (0, 1, 2, 3)) AS n0123)
        |SELECT CAST(1 AS BIGINT) AS version, 'prunable' AS status,
        |  CAST(n0 AS BIGINT) AS n_rows, CAST(1 AS BIGINT) AS n_stray_files FROM c
        |UNION ALL SELECT CAST(2 AS BIGINT), 'retained', CAST(n01 AS BIGINT),
        |  CAST(1 AS BIGINT) FROM c
        |UNION ALL SELECT CAST(3 AS BIGINT), 'pointed', CAST(n012 AS BIGINT),
        |  CAST(1 AS BIGINT) FROM c
        |UNION ALL SELECT CAST(4 AS BIGINT), 'staged_unpointed', CAST(n0123 AS BIGINT),
        |  CAST(1 AS BIGINT) FROM c
        |ORDER BY version""".stripMargin)),

    // ACF1: autocorrelation of the dense hourly event-count series at
    // lags 1..12 — periodicity audit; n-scaled integer deviations, all
    // 12 numerators in ONE aggregate pass over the spine-sized series.
    "acf1_autocorr" -> Q(
      (s, d) => graft.ops.TimeSeries.acf(
          graft.ops.TimeSeries.denseCountSeries(
            Queries.events(s, d), "ts", "hour"), maxLag = 12)
        .orderBy("lag"),
      Some(OracleGen.acf1Sql(12))),

    // DEC1: classical seasonal decomposition of the hourly series —
    // centered 25 h MA trend (kept as an exact integer SUM), hour-of-
    // day seasonal via pico floor-divisions, Wang/Smith/Hyndman
    // strength of seasonality. 24 rows + scalar strength.
    "dec1_seasonal_decompose" -> Q(
      (s, d) => graft.ops.TimeSeries.seasonalDecompose(
          graft.ops.TimeSeries.denseCountSeries(
            Queries.events(s, d), "ts", "hour"))
        .orderBy("hod"),
      Some("""WITH c AS (SELECT date_trunc('hour', ts) AS b,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
        |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS b FROM bounds),
        |s AS MATERIALIZED (SELECT sp.b, coalesce(c.x, 0) AS x FROM sp LEFT JOIN c USING (b)),
        |tr AS (SELECT b, x,
        |    CAST(sum(x) OVER w25 AS BIGINT) AS t_sum,
        |    CAST(count(*) OVER w25 AS BIGINT) AS t_cnt
        |  FROM s WINDOW w25 AS (ORDER BY b ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |tf AS (SELECT 25 * x - t_sum AS d, CAST(hour(b) AS BIGINT) AS hod
        |  FROM tr WHERE t_cnt = 25),
        |dp AS MATERIALIZED (SELECT hod, CASE WHEN d >= 0
        |    THEN (d * 1000000000000) // 25
        |    ELSE -(((-d) * 1000000000000) // 25) END AS d_pico FROM tf),
        |bh AS (SELECT hod, CAST(count(*) AS BIGINT) AS cnt,
        |    sum(CAST(d_pico AS DECIMAL(38,0))) AS sd FROM dp GROUP BY 1),
        |bh2 AS MATERIALIZED (SELECT hod, cnt, CASE WHEN sd >= 0
        |    THEN CAST(CAST(sd AS HUGEINT) // cnt AS BIGINT)
        |    ELSE CAST(-((-CAST(sd AS HUGEINT)) // cnt) AS BIGINT) END AS s_pico
        |  FROM bh),
        |rm AS (SELECT dp.d_pico, dp.d_pico - b2.s_pico AS r_pico
        |  FROM dp JOIN bh2 b2 USING (hod)),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(d_pico AS DECIMAL(38,0))) AS sdd,
        |    sum(CAST(d_pico AS DECIMAL(38,0)) * CAST(d_pico AS DECIMAL(38,0))) AS sdd2,
        |    sum(CAST(r_pico AS DECIMAL(38,0))) AS srr,
        |    sum(CAST(r_pico AS DECIMAL(38,0)) * CAST(r_pico AS DECIMAL(38,0))) AS srr2
        |  FROM rm),
        |sc AS (SELECT n AS n_windows,
        |    round(greatest(0.0, 1.0 -
        |      ((CAST(srr2 AS DOUBLE) - CAST(srr AS DOUBLE) * CAST(srr AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
        |      / ((CAST(sdd2 AS DOUBLE) - CAST(sdd AS DOUBLE) * CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))), 9) AS seasonal_strength
        |  FROM mom)
        |SELECT hod, cnt, round(CAST(s_pico AS DOUBLE) / 1e12, 6) AS seasonal,
        |  n_windows, seasonal_strength
        |FROM bh2 CROSS JOIN sc ORDER BY hod""".stripMargin)),

    // CPD1: CUSUM changepoint on the same hourly series — argmax |C_t|
    // with earliest tiebreak, all boundary decisions exact integers.
    "cpd1_cusum_changepoint" -> Q(
      (s, d) => graft.ops.TimeSeries.cusumChangepoint(
        graft.ops.TimeSeries.denseCountSeries(
          Queries.events(s, d), "ts", "hour")),
      Some("""WITH c AS (SELECT date_trunc('hour', ts) AS b,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
        |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS b FROM bounds),
        |s AS MATERIALIZED (SELECT sp.b, coalesce(c.x, 0) AS x FROM sp LEFT JOIN c USING (b)),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS DECIMAL(38,0))) AS sx FROM s),
        |cu AS (SELECT b, x,
        |    sum(x) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    CAST(row_number() OVER (ORDER BY b) AS BIGINT) AS tt FROM s),
        |j AS (SELECT cu.b, cu.cum, cu.tt, t.n, t.sx,
        |    CAST(n AS DECIMAL(38,0)) * CAST(cum AS DECIMAL(38,0))
        |      - CAST(tt AS DECIMAL(38,0)) * sx AS c_t
        |  FROM cu CROSS JOIN t),
        |top AS (SELECT * FROM j ORDER BY abs(c_t) DESC, tt ASC LIMIT 1)
        |SELECT b AS change_b, tt AS t_star, n,
        |  round(CAST(abs(c_t) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS c_max,
        |  round(CAST(cum AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS mean_before,
        |  CASE WHEN n > tt THEN round(CAST(sx - CAST(cum AS DECIMAL(38,0)) AS DOUBLE)
        |      / CAST(n - tt AS DOUBLE), 6) ELSE 0.0 END AS mean_after,
        |  CASE WHEN n > tt THEN round(CAST(sx - CAST(cum AS DECIMAL(38,0)) AS DOUBLE)
        |      / CAST(n - tt AS DOUBLE)
        |      - CAST(cum AS DOUBLE) / CAST(tt AS DOUBLE), 6) ELSE 0.0 END AS delta
        |FROM top""".stripMargin)),

    // OLS1: closed-form two-regressor OLS (order total ~ item count +
    // total quantity) via Cramer on the normal equations — one moment
    // pass, no iteration; R² from the normal-equation SSE identity.
    "ols1_price_model" -> Q(
      (s, d) => {
        val items = li(s, d).groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).cast("long").as("x1"),
            sum(floor(col("l_quantity") * lit(1e6) + lit(0.5)).cast("long"))
              .cast("long").as("x2"))
        val y = s.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey"),
            floor(col("o_totalprice") * lit(1e6) + lit(0.5)).cast("long").as("y_q"))
        graft.ops.Stats.olsNormal2(y.join(items, "o_orderkey"))
          .select(col("n"), round(col("b0") / 1e6, 6).as("b0"),
            round(col("b1") / 1e6, 6).as("b1"),
            round(col("b2"), 6).as("b2"), round(col("r2"), 9).as("r2"))
      },
      Some("""WITH it AS (SELECT l_orderkey AS o_orderkey,
        |    CAST(count(*) AS BIGINT) AS x1,
        |    CAST(sum(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS x2
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT CAST(floor(o.o_totalprice * 1e6 + 0.5) AS BIGINT) AS y_q,
        |    it.x1, it.x2
        |  FROM orders o JOIN it USING (o_orderkey)),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(y_q AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(x1 AS DECIMAL(38,0))) AS sx1,
        |    sum(CAST(x2 AS DECIMAL(38,0))) AS sx2,
        |    sum(CAST(x1 AS DECIMAL(38,0)) * CAST(x1 AS DECIMAL(38,0))) AS sx11,
        |    sum(CAST(x1 AS DECIMAL(38,0)) * CAST(x2 AS DECIMAL(38,0))) AS sx12,
        |    sum(CAST(x2 AS DECIMAL(38,0)) * CAST(x2 AS DECIMAL(38,0))) AS sx22,
        |    sum(CAST(x1 AS DECIMAL(38,0)) * CAST(y_q AS DECIMAL(38,0))) AS sx1y,
        |    sum(CAST(x2 AS DECIMAL(38,0)) * CAST(y_q AS DECIMAL(38,0))) AS sx2y,
        |    sum(CAST(y_q AS DECIMAL(38,0)) * CAST(y_q AS DECIMAL(38,0))) AS syy
        |  FROM p),
        |c AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sy AS DOUBLE) AS sy,
        |    CAST(sx1 AS DOUBLE) AS sx1, CAST(sx2 AS DOUBLE) AS sx2,
        |    CAST(sx11 AS DOUBLE) AS sx11, CAST(sx12 AS DOUBLE) AS sx12,
        |    CAST(sx22 AS DOUBLE) AS sx22, CAST(sx1y AS DOUBLE) AS sx1y,
        |    CAST(sx2y AS DOUBLE) AS sx2y, CAST(syy AS DOUBLE) AS syy
        |  FROM m),
        |dets AS (SELECT *,
        |    nd * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2)
        |      + sx2 * (sx1 * sx12 - sx11 * sx2) AS det_a,
        |    sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y)
        |      + sx2 * (sx1y * sx12 - sx11 * sx2y) AS det0,
        |    nd * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2)
        |      + sx2 * (sx1 * sx2y - sx1y * sx2) AS det1,
        |    nd * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2)
        |      + sy * (sx1 * sx12 - sx11 * sx2) AS det2
        |  FROM c),
        |bb AS (SELECT *, det0 / det_a AS b0, det1 / det_a AS b1,
        |    det2 / det_a AS b2 FROM dets),
        |fit AS (SELECT *, syy - b0 * sy - b1 * sx1y - b2 * sx2y AS sse,
        |    syy - sy * sy / nd AS sst FROM bb)
        |SELECT n, round(b0 / 1e6, 6) AS b0, round(b1 / 1e6, 6) AS b1,
        |  round(b2, 6) AS b2, round(1.0 - sse / sst, 9) AS r2
        |FROM fit""".stripMargin)),

    // AA1: Adamic–Adar link prediction over the same user-handoff
    // graph as kc1/pg1 — rare-shared-neighbor scoring of NON-edges,
    // hub-capped wedges, literal 1/ln(deg) weights, integer top-k.
    "aa1_adamic_adar" -> Q(
      (s, d) => graft.ops.Graph.adamicAdar(
          graft.ops.Graph.handoffEdges(
            Queries.events(s, d), "event_type", "user_id", "ts", "event_id"),
          maxDegree = AaMaxDeg, topK = AaTopK)
        .orderBy(col("score").desc, col("u"), col("v")),
      Some(AdamicAdarOracle)),

    // SKY1: Pareto skyline of users over (spend, activity, breadth) —
    // grid-prune then exact dominance anti-join; every comparison an
    // exact long. The oracle runs the brute NOT EXISTS dominance form.
    "sky1_pareto_skyline" -> Q(
      (s, d) => {
        val per = Queries.events(s, d).groupBy(col("user_id").as("id"))
          .agg(sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
              .cast("long").as("value_q"),
            count(lit(1)).cast("long").as("n_events"),
            countDistinct(col("event_type")).cast("long").as("n_types"))
        graft.ops.Stats.paretoSkyline(per, "id",
            Seq("value_q", "n_events", "n_types"))
          .orderBy("id")
      },
      Some("""WITH p AS MATERIALIZED (SELECT user_id AS id,
        |    CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS value_q,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |  FROM events GROUP BY 1)
        |SELECT id, value_q, n_events, n_types FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE q.value_q >= p.value_q AND q.n_events >= p.n_events
        |    AND q.n_types >= p.n_types
        |    AND (q.value_q > p.value_q OR q.n_events > p.n_events
        |      OR q.n_types > p.n_types))
        |ORDER BY id""".stripMargin)),

    // AB2: CUPED variance reduction beside ab1's raw Welch test — the
    // pre-2024-01-15 per-user value sum is the covariate; θ, adjusted
    // lift, and the ρ² variance reduction from one exact moment row.
    "ab2_cuped" -> Q(
      (s, d) => {
        val qv = floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
        val split = lit("2024-01-15").cast("timestamp")
        val per = Queries.events(s, d).groupBy("user_id")
          .agg(sum(when(col("ts") < split, qv).otherwise(0L)).cast("long").as("x_q"),
               sum(when(col("ts") >= split, qv).otherwise(0L)).cast("long").as("y_q"))
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "control").otherwise("treatment"))
        graft.ops.Stats.cupedAdjust(per)
      },
      Some("""WITH q AS (SELECT user_id, ts,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv FROM events),
        |p AS (SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN qv ELSE 0 END) AS BIGINT) AS x_q,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN qv ELSE 0 END) AS BIGINT) AS y_q,
        |    CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
        |  FROM q GROUP BY 1, 4),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    sum(CAST(x_q AS DECIMAL(38,0))) AS sx, sum(CAST(y_q AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(x_q AS DECIMAL(38,0)) * CAST(x_q AS DECIMAL(38,0))) AS sxx,
        |    sum(CAST(x_q AS DECIMAL(38,0)) * CAST(y_q AS DECIMAL(38,0))) AS sxy,
        |    sum(CAST(y_q AS DECIMAL(38,0)) * CAST(y_q AS DECIMAL(38,0))) AS syy,
        |    sum(CASE WHEN arm = 'control' THEN CAST(x_q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sx_c,
        |    sum(CASE WHEN arm = 'control' THEN CAST(y_q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sy_c,
        |    sum(CASE WHEN arm = 'treatment' THEN CAST(x_q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sx_t,
        |    sum(CASE WHEN arm = 'treatment' THEN CAST(y_q AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sy_t
        |  FROM p),
        |c AS (SELECT n_c, n_t, CAST(n AS DOUBLE) AS nd,
        |    CAST(n_c AS DOUBLE) AS ncd, CAST(n_t AS DOUBLE) AS ntd,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(syy AS DOUBLE) AS syyd,
        |    CAST(sx_c AS DOUBLE) AS sxcd, CAST(sy_c AS DOUBLE) AS sycd,
        |    CAST(sx_t AS DOUBLE) AS sxtd, CAST(sy_t AS DOUBLE) AS sytd
        |  FROM m),
        |e AS (SELECT *, nd * sxyd - sxd * syd AS cov_num,
        |    nd * sxxd - sxd * sxd AS varx_num,
        |    nd * syyd - syd * syd AS vary_num FROM c),
        |f AS (SELECT *, cov_num / varx_num AS theta,
        |    sycd / ncd AS mean_yc, sytd / ntd AS mean_yt,
        |    sxcd / ncd AS mean_xc, sxtd / ntd AS mean_xt,
        |    vary_num / (nd * (nd - 1.0)) AS var_y,
        |    (vary_num - cov_num * cov_num / varx_num) / (nd * (nd - 1.0)) AS var_adj
        |  FROM e)
        |SELECT n_c, n_t, round(theta, 9) AS theta,
        |  round(mean_yc / 1e6, 6) AS mean_y_control,
        |  round(mean_yt / 1e6, 6) AS mean_y_treatment,
        |  round((mean_yt - mean_yc) / 1e6, 6) AS diff_raw,
        |  round(((mean_yt - mean_yc) - theta * (mean_xt - mean_xc)) / 1e6, 6) AS diff_cuped,
        |  round(var_y / 1e12, 6) AS var_y,
        |  round(var_adj / 1e12, 6) AS var_adj,
        |  round(1.0 - var_adj / var_y, 9) AS var_reduction
        |FROM f""".stripMargin)),

    // BS1: Poisson-bootstrap uncertainty for the event-value mean —
    // the Google "massive data streams" bootstrap: per-row Poisson(1)
    // weights from md5(id:b) against the shared literal CDF ladder, 32
    // replicates, exact integer replicate sums; SE from pico-quantized
    // replicate means. No global resample, no RNG state, no collect.
    "bs1_poisson_bootstrap" -> Q(
      (s, d) => graft.ops.Stats.poissonBootstrap(
          Queries.events(s, d), "event_id", "value", reps = 32)
        .orderBy("b"),
      Some(OracleGen.bs1Sql(32))),

    // LR1: the ITERATIVE trainer beside nb1/gnb1's closed forms —
    // full-batch GD logistic regression on the tx2 feature battery
    // (label = n_chars > 300), 3 steps unrolled in the oracle, so the
    // WEIGHTS are value-checked, not just predictions. Each step is one
    // combinable gradient aggregate + an O(dims) driver update — the
    // canonical Spark batch-GD loop.
    "lr1_logistic_gd" -> Q(
      (s, d) => {
        val feats = Text.withQuality(docs(s, d))
          .select(col("doc_id"), lit(1.0).as("f0"),
            col("punct_ratio").as("f1"), col("alpha_ratio").as("f2"),
            col("stopword_ratio").as("f3"),
            (col("mean_word_len") / lit(10.0)).as("f4"),
            when(col("n_chars") > 300, lit(1.0)).otherwise(lit(0.0)).as("y"))
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val fc = Seq("f0", "f1", "f2", "f3", "f4")
        val w = Classify.logisticGd(feats, fc, "y", steps = 3, lr = 1.0)
        val scored = Classify.logisticScore(feats, fc, w)
        val acc = broadcast(scored.agg(
          avg(when((col("z") > 0) === (col("y") === 1.0), lit(1.0))
            .otherwise(lit(0.0))).as("accuracy"),
          count(lit(1)).cast("long").as("n_docs")))
        import s.implicits._
        w.toSeq.zipWithIndex.map { case (wi, j) => (j, wi) }
          .toDF("j", "weight")
          .crossJoin(acc)
          .select(col("j"), round(col("weight"), 6).as("weight"),
            round(col("accuracy"), 6).as("accuracy"), col("n_docs"))
          .orderBy("j")
      },
      Some(OracleGen.lr1Sql(3))),

    // KM1: distributed Lloyd k-means, the third trainer shape (fixed
    // init + fixed rounds → the oracle unrolls every assignment and
    // centroid update). Per round: one plan-time-literal assignment
    // pass + one combinable (cluster, dim) moment shuffle + an
    // O(k·dim) driver update — MLlib's KMeans pattern, value-checked.
    "km1_lloyd_kmeans" -> Q(
      (s, d) => Similarity.lloydRounds(par(embs(s, d)),
          Similarity.fixedCentroids(8, 64), rounds = 2)
        .select(col("cluster"), col("n_members"), col("dim"),
          round(col("c_val"), 6).as("c_val"))
        .orderBy("cluster", "dim"),
      Some(OracleGen.km1Sql(8, 2))),

    // WM1: decoding-watermark detection (Kirchenbauer '23) — per-doc
    // green-bigram z-test, greenness = md5 15th hex digit mod 4 of
    // (w1, w2). The synthetic-text countermeasure: flag machine-
    // generated (watermarked) text before it enters the corpus.
    // Entirely in-row; z is one fixed-form sqrt on exact integers.
    "wm1_watermark_detect" -> Q(
      (s, d) => graft.ops.Text.watermarkDetect(docs(s, d))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |    FROM documents WHERE len(string_split(lower(text), ' ')) >= 2),
        |g AS (SELECT doc_id, CAST(len(toks) - 1 AS BIGINT) AS n_scored,
        |    CAST(len(list_filter(range(1, len(toks)), j ->
        |      (strpos('0123456789abcdef', substr(md5(
        |        toks[CAST(j AS INTEGER)] || chr(31) ||
        |        toks[CAST(j AS INTEGER) + 1]), 15, 1)) - 1) % 4 = 0))
        |      AS BIGINT) AS n_green
        |  FROM t),
        |z AS (SELECT doc_id, n_scored, n_green,
        |    CAST(floor(CAST(4 * n_green - n_scored AS DOUBLE) /
        |      sqrt(3.0 * CAST(n_scored AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |      AS z_nano
        |  FROM g)
        |SELECT doc_id, n_scored, n_green, z_nano,
        |  z_nano > 4000000000 AS wm_flag
        |FROM z ORDER BY doc_id""".stripMargin)),

    // MINK1: Min-K% prob membership audit (Shi '24) — mean NLL of the
    // 20% most-surprising bigrams per doc under the tx14 corpus LM; a
    // LOW score = even the rarest transitions are high-probability =
    // the duplicate/contamination signal mean perplexity dilutes.
    "mink1_min_k_prob" -> Q(
      (s, d) => graft.ops.Text.minKProb(docs(s, d))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |      i -> struct_pack(p := i, w1 := toks[i], w2 := toks[i + 1]))) AS s
        |    FROM t WHERE len(toks) >= 2),
        |bb AS (SELECT doc_id, CAST(s.p AS BIGINT) AS p, s.w1 AS w1, s.w2 AS w2 FROM b),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM bb GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c12),
        |lm AS (SELECT w1, w2, CAST(floor(-ln(CAST(n12 + 1 AS DOUBLE) /
        |      CAST(n1 + v AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS nll_nano
        |  FROM c12 JOIN c1 USING (w1), v),
        |r AS (SELECT bb.doc_id, bb.p, lm.nll_nano,
        |    CAST(row_number() OVER (PARTITION BY bb.doc_id
        |      ORDER BY lm.nll_nano DESC, bb.p ASC) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY bb.doc_id) AS BIGINT) AS n
        |  FROM bb JOIN lm USING (w1, w2)),
        |f AS (SELECT doc_id, n, greatest((n * 20) // 100, 1) AS kc, nll_nano
        |  FROM r WHERE rk <= greatest((n * 20) // 100, 1))
        |SELECT doc_id, any_value(n) AS n_scored,
        |  CAST(any_value(kc) AS BIGINT) AS k_cnt,
        |  CAST(sum(nll_nano) // any_value(kc) AS BIGINT) AS mink_nll_nano
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // MJ1: mojibake / encoding-damage audit (the ftfy problem class) —
    // replace-based exact counts of the classic double-encoding
    // signatures, per-source damage rates. Runs BEFORE text filters:
    // mojibake corrupts every downstream token statistic.
    "mj1_mojibake_audit" -> Q(
      (s, d) => graft.ops.Text.mojibakeAudit(docs(s, d))
        .orderBy("source"),
      Some("""WITH per AS (SELECT source,
        |    CAST(length(text) - length(replace(text, chr(65533), ''))
        |      AS BIGINT) AS c_repl,
        |    CAST(length(text) - length(replace(text, chr(195), ''))
        |      AS BIGINT) AS c_a_tilde,
        |    CAST((length(text) - length(replace(text,
        |      chr(226) || chr(8364), ''))) // 2 AS BIGINT) AS c_a_circ,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{0080}-\x{009F}]', '', 'g')) AS BIGINT) AS c_c1
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN c_repl + c_a_tilde + c_a_circ + c_c1 > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_damaged,
        |  CAST((sum(CASE WHEN c_repl + c_a_tilde + c_a_circ + c_c1 > 0
        |    THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT)
        |    AS damage_rate_micro,
        |  CAST(sum(c_repl) AS BIGINT) AS n_replacement,
        |  CAST(sum(c_a_tilde) AS BIGINT) AS n_latin1_utf8,
        |  CAST(sum(c_a_circ) AS BIGINT) AS n_punct_mojibake,
        |  CAST(sum(c_c1) AS BIGINT) AS n_c1_controls
        |FROM per GROUP BY source ORDER BY source""".stripMargin)),

    // ARI1: clustering agreement — ARI + mean-normalized MI between
    // the label column and the deterministic 2-plane SRP geometry
    // cell; the external validation the dd13/cl1 cluster family was
    // missing. One contingency shuffle, bounded-table exact rationals.
    "ari1_clustering_agreement" -> Q(
      (s, d) => graft.ops.Pca.clusteringAgreement(embs(s, d)),
      Some(OracleGen.ari1Sql())),

    // DRM1: exponential-tilt domain reweighting (DoReMi-lite, Xie '23
    // static-loss case) — w_i ∝ token_share_i · exp(η · excess_loss_i)
    // with the quality deficit as the loss proxy. One combinable
    // (source) shuffle; the tilt is one exp per domain.
    "drm1_domain_reweight" -> Q(
      (s, d) => graft.ops.Curate.domainReweight(docs(s, d))
        .orderBy("source"),
      Some("""WITH q AS (SELECT source, doc_id,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2) AS qs,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |    1000000 - CAST(sum(CAST(floor(qs * 1e6 + 0.5) AS BIGINT))
        |      // count(*) AS BIGINT) AS loss_micro
        |  FROM q GROUP BY source),
        |ref AS (SELECT min(loss_micro) AS min_loss,
        |    CAST(sum(n_tokens) AS HUGEINT) AS tt FROM per),
        |tl AS (SELECT source, n_docs, n_tokens,
        |    CAST((CAST(n_tokens AS HUGEINT) * 1000000) // tt AS BIGINT)
        |      AS share_micro,
        |    loss_micro, loss_micro - min_loss AS excess_micro,
        |    CAST(floor(exp(CAST(loss_micro - min_loss AS DOUBLE) / 1e6 * 2.0)
        |      * 1e12 + 0.5) AS BIGINT) AS tilt_pico
        |  FROM per, ref),
        |w AS (SELECT *, CAST(share_micro AS HUGEINT) *
        |    CAST(tilt_pico AS HUGEINT) AS w_raw FROM tl),
        |z AS (SELECT sum(w_raw) AS zz FROM w)
        |SELECT source, n_docs, n_tokens, share_micro, loss_micro,
        |  CAST(excess_micro AS BIGINT) AS excess_micro,
        |  CAST((w_raw * 1000000) // zz AS BIGINT) AS weight_micro
        |FROM w, z ORDER BY source""".stripMargin)),

    // LOO1: leave-one-out source valuation — for an ADDITIVE metric
    // the Shapley value equals leave-one-out exactly, so "which
    // sources help?" is one pass of exact integer arithmetic, not a
    // retraining study. Negative delta = the source is valuable.
    "loo1_source_ablation" -> Q(
      (s, d) => graft.ops.Curate.sourceAblation(docs(s, d))
        .orderBy("source"),
      Some("""WITH q AS (SELECT source,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2) AS qs
        |  FROM documents),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CAST(floor(qs * 1e6 + 0.5) AS BIGINT)) AS HUGEINT) AS sq
        |  FROM q GROUP BY source),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn, sum(sq) AS ss
        |  FROM per)
        |SELECT source, n_docs,
        |  CAST(sq // n_docs AS BIGINT) AS mean_q_micro,
        |  CAST(ss // nn AS BIGINT) AS corpus_mean_micro,
        |  CASE WHEN nn = n_docs THEN CAST(0 AS BIGINT)
        |    ELSE CAST((ss - sq) // (nn - n_docs) AS BIGINT)
        |  END AS mean_without_micro,
        |  CASE WHEN nn = n_docs THEN CAST(0 AS BIGINT)
        |    ELSE CAST((ss - sq) // (nn - n_docs) AS BIGINT)
        |      - CAST(ss // nn AS BIGINT)
        |  END AS loo_delta_micro
        |FROM per, tot ORDER BY source""".stripMargin)),

    // CTX1: cross-document attention waste of the cur12 packing — the
    // fraction of causal attention pairs crossing doc boundaries when
    // bins concatenate without block-diagonal masks. Pure integer
    // pair counts on the packTokenBudget assignment.
    "ctx1_pack_attention_waste" -> Q(
      (s, d) => graft.ops.Curate.packAttentionWaste(docs(s, d),
          budget = 200, shardCol = "source")
        .orderBy("shard"),
      Some {
        def c2(cn: String) =
          s"(CASE WHEN $cn % 2 = 0 THEN CAST($cn // 2 AS HUGEINT) * " +
            s"CAST($cn - 1 AS HUGEINT) ELSE CAST($cn AS HUGEINT) * " +
            s"CAST(($cn - 1) // 2 AS HUGEINT) END)"
        s"""WITH t AS (
           |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           |  FROM documents),
           |o AS (SELECT doc_id, source, n_tokens,
           |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
           |  FROM t),
           |p AS (SELECT doc_id, source, n_tokens, tok_offset // 200 AS bin FROM o),
           |b AS (SELECT source AS shard, bin, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_tokens) AS BIGINT) AS ll,
           |    sum(${c2("n_tokens")}) AS within
           |  FROM p GROUP BY 1, 2)
           |SELECT shard, CAST(count(*) AS BIGINT) AS n_bins,
           |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
           |  CAST(sum(${c2("ll")}) AS BIGINT) AS total_pairs,
           |  CAST(sum(${c2("ll")}) - sum(within) AS BIGINT) AS cross_pairs,
           |  CASE WHEN sum(${c2("ll")}) = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(((sum(${c2("ll")}) - sum(within)) * 1000000)
           |      // sum(${c2("ll")}) AS BIGINT)
           |  END AS waste_micro
           |FROM b GROUP BY shard ORDER BY shard""".stripMargin
      }),

    // FID1: diagonal Fréchet distance between even- and odd-label
    // embedding populations — mean drift (ed1) plus the VARIANCE gap
    // it misses; the generated-vs-real population metric beside
    // mauve1's frontier. One (side, dim) moment shuffle.
    "fid1_frechet_diag" -> Q(
      (s, d) => graft.ops.Pca.frechetDiagonal(embs(s, d),
        pmod(col("label"), lit(2)) === 0),
      Some("""WITH ex AS (SELECT label % 2 = 0 AS is_p,
        |    CAST(g.i - 1 AS BIGINT) AS dim,
        |    CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(generate_series(1, 64)) AS g(i)),
        |m AS (SELECT is_p, dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
        |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS s2
        |  FROM ex GROUP BY 1, 2),
        |mm AS (SELECT is_p, dim, n,
        |    CAST(CASE WHEN s1 >= 0 THEN s1 // n
        |      ELSE -((-s1) // n) END AS BIGINT) AS mean_nano,
        |    CAST((n * s2 - s1 * s1) // (CAST(n AS HUGEINT) * n) AS BIGINT)
        |      AS var_nano2
        |  FROM m),
        |j AS (SELECT p.dim, p.n AS n_p, q.n AS n_q,
        |    CAST(p.mean_nano - q.mean_nano AS HUGEINT) *
        |      CAST(p.mean_nano - q.mean_nano AS HUGEINT) AS dm2,
        |    p.var_nano2 AS vp, q.var_nano2 AS vq,
        |    CAST(floor(sqrt(CAST(p.var_nano2 AS DOUBLE) *
        |      CAST(q.var_nano2 AS DOUBLE)) + 0.5) AS BIGINT) AS crs
        |  FROM mm p JOIN mm q USING (dim)
        |  WHERE p.is_p AND NOT q.is_p),
        |agg AS (SELECT any_value(n_p) AS n_p, any_value(n_q) AS n_q,
        |    CAST(count(*) AS BIGINT) AS n_dims,
        |    sum(dm2) AS mean_term,
        |    sum(CAST(vp AS HUGEINT) + vq - 2 * crs) AS var_term
        |  FROM j)
        |SELECT n_p, n_q, n_dims,
        |  CAST(mean_term // 1000000 AS BIGINT) AS mean_term_pico,
        |  CAST((CASE WHEN var_term >= 0 THEN var_term // 1000000
        |    ELSE -((-var_term) // 1000000) END) AS BIGINT) AS var_term_pico,
        |  CAST((CASE WHEN mean_term + var_term >= 0
        |    THEN (mean_term + var_term) // 1000000
        |    ELSE -((-(mean_term + var_term)) // 1000000)
        |  END) AS BIGINT) AS fid_pico
        |FROM agg""".stripMargin)),

    // UG1: unicode-hygiene audit — BIDI controls (Trojan Source,
    // CVE-2021-42574), zero-width characters (the stego/watermark
    // channel), and mixed-script homoglyph suspects, per source.
    // Replace-based exact counts on RE2-compatible classes.
    "ug1_unicode_hygiene" -> Q(
      (s, d) => graft.ops.Text.unicodeHygiene(docs(s, d))
        .orderBy("source"),
      Some("""WITH per AS (SELECT source,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{202A}-\x{202E}\x{2066}-\x{2069}]', '', 'g')) AS BIGINT) AS c_bidi,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g')) AS BIGINT) AS c_zw,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS c_cyr,
        |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) > 0 AS has_latin
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN c_bidi > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bidi_docs,
        |  CAST(sum(c_bidi) AS BIGINT) AS n_bidi_chars,
        |  CAST(sum(CASE WHEN c_zw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_width_docs,
        |  CAST(sum(c_zw) AS BIGINT) AS n_zero_width_chars,
        |  CAST(sum(CASE WHEN c_cyr > 0 AND has_latin THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mixed_script_docs,
        |  CAST(sum(CASE WHEN c_bidi > 0 OR c_zw > 0
        |    OR (c_cyr > 0 AND has_latin) THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST((sum(CASE WHEN c_bidi > 0 OR c_zw > 0
        |    OR (c_cyr > 0 AND has_latin) THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS BIGINT) AS flag_rate_micro
        |FROM per GROUP BY source ORDER BY source""".stripMargin)),

    // KNN1: kNN label-probe accuracy — the cheap stand-in for a
    // linear probe: exact cosine top-5 over a bounded query sample
    // (vec_id % 50 = 0, the bfs1 sampling rule), majority-vote label,
    // per-label accuracy. Separates 'geometry recovers labels' from
    // 'geometry is non-degenerate'.
    "knn1_probe_accuracy" -> Q(
      (s, d) => graft.ops.Similarity.knnProbeAccuracy(embs(s, d),
          pmod(col("vec_id"), lit(50)) === 0)
        .orderBy("label"),
      Some(OracleGen.knn1Sql())),

    // LEN1: per-source token-length percentiles — the sequence-length
    // facts that size packing budgets and truncation losses; grouped
    // exact interpolated percentiles (hi2 convention).
    "len1_length_percentiles" -> Q(
      (s, d) => graft.ops.Profile.lengthPercentiles(docs(s, d))
        .orderBy("source"),
      Some("""WITH per AS (SELECT source AS grp,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |cuts AS (SELECT grp,
        |    quantile_cont(n_tok, CAST(5 AS DOUBLE)/10) AS p50,
        |    quantile_cont(n_tok, CAST(9 AS DOUBLE)/10) AS p90,
        |    quantile_cont(n_tok, CAST(99 AS DOUBLE)/100) AS p99
        |  FROM per GROUP BY grp),
        |st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(min(n_tok) AS BIGINT) AS min_tok,
        |    CAST(max(n_tok) AS BIGINT) AS max_tok,
        |    CAST(sum(CASE WHEN n_tok >= 256 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_long
        |  FROM per GROUP BY grp)
        |SELECT st.grp AS source, n_docs, min_tok,
        |  round(p50, 6) AS p50_tok, round(p90, 6) AS p90_tok,
        |  round(p99, 6) AS p99_tok, max_tok, n_long,
        |  CAST((n_long * 1000000) // n_docs AS BIGINT) AS long_share_micro
        |FROM st JOIN cuts USING (grp) ORDER BY source""".stripMargin)),

    // CARD1: the corpus data card — the one-page (metric, value)
    // release summary (Datasheets for Datasets): sizes, composition
    // cardinalities, quality mean, exact-dup mass, injection count.
    "card1_data_card" -> Q(
      (s, d) => graft.ops.Profile.dataCard(docs(s, d))
        .orderBy("metric"),
      Some {
        val hits = graft.ops.Text.InjectionMarkers.map(m =>
          s"CASE WHEN strpos(lower(text), '$m') > 0 THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH s AS (SELECT
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
           |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
           |  FROM documents),
           |q AS (SELECT CAST(sum(CAST(floor(least(1.0,
           |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
           |        / CAST(length(text) AS DOUBLE) * 0.5
           |      + CAST(len(list_filter(string_split(text, ' '),
           |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
           |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
           |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
           |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
           |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2)
           |      * 1e6 + 0.5) AS BIGINT)) // count(*) AS BIGINT)
           |    AS mean_quality_micro FROM documents),
           |dd AS (SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0)
           |    AS BIGINT) AS n_exact_dup_docs
           |  FROM (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY 1)),
           |pi AS (SELECT CAST(sum(CASE WHEN ($hits) > 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_injection_flagged FROM documents)
           |SELECT metric, value FROM (
           |  SELECT 'n_docs' AS metric, n_docs AS value FROM s
           |  UNION ALL SELECT 'n_tokens', n_tokens FROM s
           |  UNION ALL SELECT 'n_chars', n_chars FROM s
           |  UNION ALL SELECT 'n_sources', n_sources FROM s
           |  UNION ALL SELECT 'n_langs', n_langs FROM s
           |  UNION ALL SELECT 'mean_quality_micro', mean_quality_micro FROM q
           |  UNION ALL SELECT 'n_exact_dup_docs', n_exact_dup_docs FROM dd
           |  UNION ALL SELECT 'n_injection_flagged', n_injection_flagged FROM pi)
           |ORDER BY metric""".stripMargin
      }),

    // DC5: fuzzy decontamination — the near-dup contamination exact
    // n-gram overlap (dc1-dc4) misses; cross-corpus simhash pigeonhole
    // (train = doc_id % 37 != 0, eval = % 37 = 0), hamming <= 3.
    "dc5_fuzzy_decontaminate" -> Q(
      (s, d) => graft.ops.Dedup.decontaminateFuzzy(
          docs(s, d).filter(pmod(col("doc_id"), lit(37)) =!= 0),
          docs(s, d).filter(pmod(col("doc_id"), lit(37)) === 0))
        .orderBy("doc_id"),
      Some(OracleGen.dc5Sql())),

    // PI1: prompt-injection marker scan — the adversarial-instruction
    // hygiene pass (generic public phrasings), per-source flag rates.
    // Substring containment on lowercased text, exact both engines.
    "pi1_injection_scan" -> Q(
      (s, d) => graft.ops.Text.injectionScan(docs(s, d))
        .orderBy("source"),
      Some {
        val hits = graft.ops.Text.InjectionMarkers.map(m =>
          s"CASE WHEN strpos(lower(text), '$m') > 0 THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH per AS (SELECT source, CAST($hits AS BIGINT) AS n_markers
           |  FROM documents)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN n_markers > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_flagged,
           |  CAST(sum(n_markers) AS BIGINT) AS n_marker_hits,
           |  CAST((sum(CASE WHEN n_markers > 0 THEN 1 ELSE 0 END) * 1000000)
           |    // count(*) AS BIGINT) AS flag_rate_micro
           |FROM per GROUP BY source ORDER BY source""".stripMargin
      }),

    // MAD1: robust per-source outlier share — |x − median| > 3.5·MAD
    // over quality micro scores; grouped exact interpolated
    // percentiles (the hi2 convention), no per-source sort.
    "mad1_robust_outliers" -> Q(
      (s, d) => graft.ops.Text.madOutliers(docs(s, d))
        .orderBy("source"),
      Some("""WITH q0 AS (SELECT source,
        |    least(1.0,
        |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE) * 0.5
        |      + CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
        |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
        |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2) AS qs
        |  FROM documents),
        |per AS (SELECT source AS grp,
        |    CAST(floor(qs * 1e6 + 0.5) AS BIGINT) AS q FROM q0),
        |med AS (SELECT grp, quantile_cont(q, CAST(5 AS DOUBLE)/10) AS med
        |  FROM per GROUP BY grp),
        |dev AS (SELECT per.grp, abs(CAST(q AS DOUBLE) - med) AS dv, med
        |  FROM per JOIN med USING (grp)),
        |mad AS (SELECT grp, quantile_cont(dv, CAST(5 AS DOUBLE)/10) AS mad
        |  FROM dev GROUP BY grp)
        |SELECT dev.grp AS source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(any_value(med), 6) AS median_q_micro,
        |  round(any_value(mad), 6) AS mad_micro,
        |  CAST(sum(CASE WHEN dv > 3.5 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST((sum(CASE WHEN dv > 3.5 * mad THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS BIGINT) AS outlier_rate_micro
        |FROM dev JOIN mad USING (grp)
        |GROUP BY dev.grp ORDER BY source""".stripMargin)),

    // LOOP1: decode-loop detection — max consecutive stride-3
    // repetition of any trigram; the contiguous "model got stuck"
    // artifact the Gopher coverage ratios can't isolate. Synthetic-
    // text defense beside wm1.
    "loop1_decode_loops" -> Q(
      (s, d) => graft.ops.Text.decodeLoops(docs(s, d))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS ws
        |  FROM documents),
        |tt AS (SELECT doc_id, CAST(len(ws) - 2 AS BIGINT) AS ng,
        |    list_transform(range(1, len(ws) - 1), i ->
        |      ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1]
        |        || ' ' || ws[CAST(i AS INTEGER) + 2]) AS gs
        |  FROM t WHERE len(ws) >= 3),
        |m AS (SELECT doc_id, u.i AS i FROM tt, unnest(
        |    CASE WHEN len(gs) <= 3 THEN CAST([] AS BIGINT[])
        |    ELSE list_filter(range(4, len(gs) + 1), i ->
        |      gs[CAST(i AS INTEGER)] = gs[CAST(i AS INTEGER) - 3]) END)
        |  AS u(i)),
        |r AS (SELECT doc_id, i, i % 3 AS ph,
        |    (i // 3) - row_number() OVER (PARTITION BY doc_id, i % 3
        |      ORDER BY i) AS isl FROM m),
        |st AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS best FROM (
        |    SELECT doc_id, ph, isl, count(*) AS c FROM r GROUP BY 1, 2, 3)
        |  GROUP BY 1)
        |SELECT tt.doc_id, ng AS n_trigrams,
        |  CAST(coalesce(best, 0) + 1 AS BIGINT) AS max_repeats,
        |  coalesce(best, 0) + 1 >= 4 AS loop_flag
        |FROM tt LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // CCN1: CCNet perplexity bucketing — per-doc exact-integer mean
    // bigram NLL, global tercile cuts (tree-aggregated percentile,
    // broadcast — no global ntile window), per-source head/middle/tail
    // composition. The 'keep the head, down-sample the tail' report.
    "ccn1_perplexity_buckets" -> Q(
      (s, d) => graft.ops.Text.perplexityBuckets(docs(s, d))
        .orderBy("source", "bucket"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |      i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS s
        |    FROM t WHERE len(toks) >= 2),
        |bb AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM b),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM bb GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c12),
        |lm AS (SELECT w1, w2, CAST(floor(-ln(CAST(n12 + 1 AS DOUBLE) /
        |      CAST(n1 + v AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS nll_nano
        |  FROM c12 JOIN c1 USING (w1), v),
        |pd AS (SELECT doc_id,
        |    CAST(sum(CAST(nll_nano AS HUGEINT)) // count(*) AS BIGINT) AS nll_nano
        |  FROM bb JOIN lm USING (w1, w2) GROUP BY doc_id),
        |pds AS (SELECT pd.doc_id, pd.nll_nano, d.source
        |  FROM pd JOIN documents d USING (doc_id)),
        |cuts AS (SELECT quantile_cont(nll_nano, CAST(1 AS DOUBLE)/3) AS c0,
        |    quantile_cont(nll_nano, CAST(2 AS DOUBLE)/3) AS c1 FROM pds),
        |bk AS (SELECT source, CAST(CASE WHEN nll_nano < c0 THEN 0
        |    WHEN nll_nano < c1 THEN 1 ELSE 2 END AS INTEGER) AS bucket,
        |    nll_nano FROM pds, cuts),
        |cn AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CAST(nll_nano AS HUGEINT)) // count(*) AS BIGINT)
        |      AS mean_nll_nano
        |  FROM bk GROUP BY 1, 2),
        |tt AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS nt
        |  FROM cn GROUP BY 1)
        |SELECT cn.source, bucket, n_docs,
        |  CAST((n_docs * 1000000) // nt AS BIGINT) AS share_micro,
        |  mean_nll_nano
        |FROM cn JOIN tt USING (source) ORDER BY source, bucket""".stripMargin)))
}
