package graft

import graft.functions.MinHashSigs
import graft.ops.Similarity

/** Programmatic DuckDB oracle SQL for the signature/LSH operators whose
  * randomness is plan-time-deterministic: the seeded hyperplanes,
  * fixed centroids, and universal-hash permutation constants are
  * serialized INTO the SQL, so the oracle recomputes buckets, cells and
  * signatures from scratch and the driver's rows+schema+hash gate
  * applies to queries that were previously rows-only.
  *
  * Exactness discipline: any floating-point value that decides ROW
  * MEMBERSHIP (an SRP sign, an IVF argmax) is computed with
  * `list_reduce` — an explicit left fold in index order, the same
  * operation sequence as [[graft.functions.VectorDot]] — so the double
  * is bit-identical across engines and the decision cannot flip.
  * Values that only ride along (the reported cosine) use `list_sum` +
  * round(·, 6), the ss1/ss2 precedent.
  */
object OracleGen {

  /** DuckDB: parse the first 15 hex chars of the md5 column `m` into a
    * 60-bit BIGINT — the SQL twin of [[graft.ops.Dedup.md5Hash60]].
    */
  private def hex60(m: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16), " +
      s"i -> CAST(strpos('0123456789abcdef', substr($m, CAST(i AS INTEGER), 1)) - 1 AS BIGINT))), " +
      "(acc, x) -> acc * 16 + x)"

  private val P = MinHashSigs.P

  /** dd3p: md5-backed MinHash+LSH pairs (numHashes=64, bands=16, k=3,
    * seed=42) — mirrors minhashLshPairsPortable step for step.
    */
  def dd3pSql(threshold: Double): String = {
    val (a, b) = MinHashSigs.perms(64, 42L)
    val minExprs = (0 until 64)
      .map(j => s"min((${a(j)} * h + ${b(j)}) % $P)").mkString(", ")
    s"""WITH tok AS (SELECT doc_id AS d, string_split(lower(text), ' ') AS t FROM documents),
       |shg AS (SELECT d, unnest(list_distinct(
       |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |  ELSE list_transform(range(0, len(t) - 2),
       |    i -> array_to_string(list_slice(t, CAST(i + 1 AS INTEGER), CAST(i + 3 AS INTEGER)), ' '))
       |  END)) AS s FROM tok),
       |shm AS (SELECT d, md5(s) AS m FROM shg),
       |sh AS (SELECT DISTINCT d, ${hex60("m")} % $P AS h FROM shm),
       |sigs AS (SELECT d, [$minExprs] AS sig FROM sh GROUP BY d),
       |bands AS (SELECT d, bb.b AS band,
       |    md5(array_to_string(list_slice(sig, CAST(bb.b * 4 + 1 AS INTEGER), CAST(bb.b * 4 + 4 AS INTEGER)), ',')) AS bh
       |  FROM sigs, range(16) bb(b)),
       |cand AS (SELECT DISTINCT x.d AS d1, y.d AS d2 FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.d < y.d),
       |sizes AS (SELECT d, count(*) AS n FROM sh GROUP BY d),
       |common AS (SELECT cand.d1, cand.d2, count(*) AS c FROM cand
       |  JOIN sh x ON x.d = cand.d1
       |  JOIN sh y ON y.d = cand.d2 AND y.h = x.h
       |  GROUP BY cand.d1, cand.d2)
       |SELECT d1, d2, CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
       |FROM common JOIN sizes s1 ON s1.d = common.d1 JOIN sizes s2 ON s2.d = common.d2
       |WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= $threshold
       |ORDER BY d1, d2""".stripMargin
  }

  /** bb1: b-bit MinHash eval — rebuilds the dd3p portable signature
    * chain (same [[MinHashSigs.perms]] source, so no constant drift),
    * keeps the sig arrays through the candidate join, and mirrors the
    * exact-integer slot/low-bit agreement folds of
    * [[graft.ops.Dedup.bbitMinhashEval]].
    */
  def bb1Sql(threshold: Double): String = {
    val (a, b) = MinHashSigs.perms(64, 42L)
    val minExprs = (0 until 64)
      .map(j => s"min((${a(j)} * h + ${b(j)}) % $P)").mkString(", ")
    s"""WITH tok AS (SELECT doc_id AS d, string_split(lower(text), ' ') AS t FROM documents),
       |shg AS (SELECT d, unnest(list_distinct(
       |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |  ELSE list_transform(range(0, len(t) - 2),
       |    i -> array_to_string(list_slice(t, CAST(i + 1 AS INTEGER), CAST(i + 3 AS INTEGER)), ' '))
       |  END)) AS s FROM tok),
       |shm AS (SELECT d, md5(s) AS m FROM shg),
       |sh AS (SELECT DISTINCT d, ${hex60("m")} % $P AS h FROM shm),
       |sigs AS MATERIALIZED (SELECT d, [$minExprs] AS sig FROM sh GROUP BY d),
       |bands AS (SELECT d, bb.b AS band,
       |    md5(array_to_string(list_slice(sig, CAST(bb.b * 4 + 1 AS INTEGER), CAST(bb.b * 4 + 4 AS INTEGER)), ',')) AS bh
       |  FROM sigs, range(16) bb(b)),
       |cand AS (SELECT DISTINCT x.d AS d1, y.d AS d2 FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.d < y.d),
       |sizes AS (SELECT d, count(*) AS n FROM sh GROUP BY d),
       |common AS (SELECT cand.d1, cand.d2, count(*) AS c FROM cand
       |  JOIN sh x ON x.d = cand.d1
       |  JOIN sh y ON y.d = cand.d2 AND y.h = x.h
       |  GROUP BY cand.d1, cand.d2),
       |jj AS (SELECT d1, d2,
       |    CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
       |  FROM common JOIN sizes s1 ON s1.d = common.d1
       |  JOIN sizes s2 ON s2.d = common.d2
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= $threshold),
       |f AS (SELECT jj.d1, jj.d2,
       |    CAST(floor(jaccard * 1e6 + 0.5) AS BIGINT) AS jaccard_micro,
       |    CAST(list_sum(list_transform(range(1, 65), zi ->
       |      CASE WHEN g1.sig[zi] = g2.sig[zi] THEN 1 ELSE 0 END)) AS BIGINT)
       |      AS slot_matches,
       |    CAST(list_sum(list_transform(range(1, 65), zb ->
       |      CASE WHEN g1.sig[zb] % 2 = g2.sig[zb] % 2 THEN 1 ELSE 0 END)) AS BIGINT)
       |      AS bit_collisions
       |  FROM jj JOIN sigs g1 ON g1.d = jj.d1 JOIN sigs g2 ON g2.d = jj.d2)
       |SELECT d1, d2, jaccard_micro, slot_matches, bit_collisions,
       |  (slot_matches * 1000000) // 64 AS full_est_micro,
       |  (bit_collisions * 2000000) // 64 - 1000000 AS bbit_est_micro,
       |  abs((slot_matches * 1000000) // 64 - jaccard_micro) AS err_full_micro,
       |  abs((bit_collisions * 2000000) // 64 - 1000000 - jaccard_micro)
       |    AS err_bbit_micro
       |FROM f ORDER BY d1, d2""".stripMargin
  }

  /** pb1: Koehn's paired bootstrap replayed — character-unigram F-2
    * for both systems (chf1's n=1 leg), integer per-pair deltas, the
    * bs1Sql md5-ladder Poisson weights, exact per-replicate signs.
    */
  def pb1Sql(reps: Int): String = {
    val ts = graft.ops.Stats.poissonThresholds
    val ladder = ts.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
    def leg(tag: String, csExpr: String) =
      s"""rc$tag AS (SELECT pid, substr(rs, i, 1) AS g, CAST(count(*) AS BIGINT) AS rc
         |  FROM p, unnest(generate_series(1, length(rs))) AS a(i) GROUP BY 1, 2),
         |cc$tag AS (SELECT pid, substr($csExpr, i, 1) AS g, CAST(count(*) AS BIGINT) AS cc
         |  FROM p, unnest(generate_series(1, length($csExpr))) AS a(i) GROUP BY 1, 2),
         |mm$tag AS (SELECT pid, CAST(sum(least(rc, cc)) AS BIGINT) AS m
         |  FROM rc$tag JOIN cc$tag USING (pid, g) GROUP BY pid),
         |f$tag AS (SELECT p.pid,
         |    CASE WHEN 4 * length(rs) + length($csExpr) = 0 THEN 0
         |         ELSE (5 * CAST(coalesce(mm$tag.m, 0) AS BIGINT) * 1000000)
         |           // (4 * length(rs) + length($csExpr)) END AS f
         |  FROM p LEFT JOIN mm$tag ON mm$tag.pid = p.pid)""".stripMargin
    s"""WITH p AS MATERIALIZED (SELECT CAST(a.doc_id // 2 AS BIGINT) AS pid,
       |    replace(lower(a.text), ' ', '') AS rs,
       |    replace(lower(b.text), ' ', '') AS cs,
       |    coalesce(array_to_string(list_slice(
       |      list_filter(string_split(lower(b.text), ' '), x -> length(x) > 0),
       |      3, len(list_filter(string_split(lower(b.text), ' '),
       |        x2 -> length(x2) > 0))), ''), '') AS cs2
       |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
       |  WHERE a.doc_id % 2 = 0),
       |${leg("a", "cs")},
       |${leg("b", "cs2")},
       |dd AS MATERIALIZED (SELECT fa.pid, fa.f - fb.f AS d
       |  FROM fa JOIN fb ON fb.pid = fa.pid),
       |full_m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |    sum(CAST(d AS DECIMAL(38,0))) AS s_d FROM dd),
       |wb AS (SELECT pid, d, CAST(r.b AS BIGINT) AS b FROM dd
       |  CROSS JOIN (SELECT unnest(range(0, $reps)) AS b) r),
       |uu AS (SELECT b, d,
       |    ${hex60(s"md5(CAST(pid AS VARCHAR) || ':' || CAST(b AS VARCHAR))")} AS u
       |  FROM wb),
       |ww AS (SELECT b, d, CASE $ladder ELSE ${ts.size} END AS w FROM uu),
       |pr AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
       |    sum(CAST(w AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS s_wd
       |  FROM ww GROUP BY 1),
       |pp AS (SELECT b, n_eff, s_wd,
       |    CASE WHEN n_eff = 0 THEN 0
       |         ELSE CAST(CAST(s_wd AS HUGEINT) // n_eff AS BIGINT)
       |    END AS delta_micro
       |  FROM pr),
       |sc AS (SELECT
       |    CAST(sum(CASE WHEN s_wd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wins,
       |    CAST(min(delta_micro) AS BIGINT) AS delta_lo_micro,
       |    CAST(max(delta_micro) AS BIGINT) AS delta_hi_micro
       |  FROM pp)
       |SELECT f.n_rows, CAST($reps AS BIGINT) AS reps,
       |  CAST(CAST(f.s_d AS HUGEINT) // f.n_rows AS BIGINT) AS delta_full_micro,
       |  sc.n_wins, (sc.n_wins * 1000000) // $reps AS win_micro,
       |  sc.delta_lo_micro, sc.delta_hi_micro
       |FROM sc, full_m f""".stripMargin
  }

  /** dd19: the LSH banding planner replayed — one sig chain (bb1Sql's
    * construction), a hash-ordered doc sample bounding the truth leg,
    * one truth join over the sample, a band-join leg per configuration
    * (full-corpus candidate volume + sample-scored quality), S-curve
    * literals baked from the same driver math.
    */
  def dd19Sql(threshold: Double, numHashes: Int,
              bandConfigs: Seq[Int], sampleDocs: Int = 4096): String = {
    val (a, b) = MinHashSigs.perms(numHashes, 42L)
    val minExprs = (0 until numHashes)
      .map(j => s"min((${a(j)} * h + ${b(j)}) % $P)").mkString(", ")
    val base = s"""WITH tok AS (SELECT doc_id AS d, string_split(lower(text), ' ') AS t FROM documents),
       |samp AS MATERIALIZED (SELECT doc_id AS d FROM documents
       |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT $sampleDocs),
       |shg AS (SELECT d, unnest(list_distinct(
       |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |  ELSE list_transform(range(0, len(t) - 2),
       |    i -> array_to_string(list_slice(t, CAST(i + 1 AS INTEGER), CAST(i + 3 AS INTEGER)), ' '))
       |  END)) AS s FROM tok),
       |shm AS (SELECT d, md5(s) AS m FROM shg),
       |shf AS (SELECT DISTINCT d, ${hex60("m")} % $P AS h FROM shm),
       |sh AS MATERIALIZED (SELECT shf.d, shf.h FROM shf
       |  WHERE EXISTS (SELECT 1 FROM samp WHERE samp.d = shf.d)),
       |sigs AS MATERIALIZED (SELECT d, [$minExprs] AS sig FROM shf GROUP BY d),
       |sizes AS (SELECT d, count(*) AS n FROM sh GROUP BY d),
       |truth AS MATERIALIZED (SELECT x.d1, x.d2 FROM (
       |    SELECT a2.d AS d1, b2.d AS d2, count(*) AS c
       |    FROM sh a2 JOIN sh b2 ON a2.h = b2.h AND a2.d < b2.d
       |    GROUP BY 1, 2) x
       |  JOIN sizes s1 ON s1.d = x.d1 JOIN sizes s2 ON s2.d = x.d2
       |  WHERE CAST(x.c AS DOUBLE) / CAST(s1.n + s2.n - x.c AS DOUBLE)
       |    >= $threshold),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)""".stripMargin
    val legs = bandConfigs.map { bands =>
      val rows = numHashes / bands
      s""",
         |bands$bands AS (SELECT d, bb.b AS band,
         |    md5(array_to_string(list_slice(sig,
         |      CAST(bb.b * $rows + 1 AS INTEGER),
         |      CAST(bb.b * $rows + $rows AS INTEGER)), ',')) AS bh
         |  FROM sigs, range($bands) bb(b)),
         |cand$bands AS (SELECT DISTINCT x.d AS d1, y.d AS d2 FROM bands$bands x
         |  JOIN bands$bands y ON x.band = y.band AND x.bh = y.bh AND x.d < y.d),
         |cands$bands AS (SELECT d1, d2 FROM cand$bands c
         |  WHERE EXISTS (SELECT 1 FROM samp WHERE samp.d = c.d1)
         |    AND EXISTS (SELECT 1 FROM samp WHERE samp.d = c.d2)),
         |ncf$bands AS (SELECT CAST(count(*) AS BIGINT) AS n_cand_full FROM cand$bands),
         |nc$bands AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cands$bands),
         |tp$bands AS (SELECT CAST(count(*) AS BIGINT) AS tp FROM truth
         |  WHERE EXISTS (SELECT 1 FROM cands$bands c
         |    WHERE c.d1 = truth.d1 AND c.d2 = truth.d2))""".stripMargin
    }.mkString
    val selects = bandConfigs.map { bands =>
      val rows = numHashes / bands
      val sCurveNano = math.floor(
        (1.0 - math.pow(1.0 - math.pow(threshold, rows), bands)) * 1e9 + 0.5)
        .toLong
      s"""SELECT CAST($bands AS BIGINT) AS bands,
         |  CAST($rows AS BIGINT) AS rows_per_band,
         |  nt.n_truth, nc$bands.n_cand, ncf$bands.n_cand_full, tp$bands.tp,
         |  nc$bands.n_cand - tp$bands.tp AS fp,
         |  nt.n_truth - tp$bands.tp AS fn,
         |  CASE WHEN nc$bands.n_cand > 0
         |    THEN (tp$bands.tp * 1000000) // nc$bands.n_cand ELSE 0 END
         |    AS precision_micro,
         |  CASE WHEN nt.n_truth > 0
         |    THEN (tp$bands.tp * 1000000) // nt.n_truth ELSE 0 END
         |    AS recall_micro,
         |  CAST($sCurveNano AS BIGINT) AS s_curve_nano
         |FROM nt, nc$bands, ncf$bands, tp$bands""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$base$legs\n$selects\nORDER BY bands DESC"
  }

  /** fim1: the md5-coin FIM transform replayed — the apply-coin and
    * both cut points are hex60 folds of md5(doc_id ‖ tag), mirroring
    * [[graft.ops.Curate.fimTransform]] cut for cut.
    */
  def fim1Sql(applyDenom: Int): String = {
    def coin(tag: String) =
      hex60(s"md5(concat(CAST(doc_id AS VARCHAR), '$tag'))")
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS toks
       |  FROM documents),
       |b AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
       |    ${coin(":a")} AS ca, ${coin(":p")} AS cp, ${coin(":m")} AS cm
       |  FROM t),
       |c AS (SELECT doc_id, toks, n, cp, cm,
       |    (ca % $applyDenom = 0 AND n >= 3) AS fim_applied FROM b),
       |d AS (SELECT *, CASE WHEN fim_applied THEN cp % n ELSE n END AS p
       |  FROM c),
       |e AS (SELECT *, CASE WHEN fim_applied THEN 1 + cm % (n - p)
       |    ELSE 0 END AS m
       |  FROM d),
       |g AS (SELECT doc_id, n, fim_applied, p, m,
       |    coalesce(array_to_string(list_slice(toks, 1, CAST(p AS INTEGER)),
       |      ' '), '') AS pre,
       |    coalesce(array_to_string(list_slice(toks, CAST(p + 1 AS INTEGER),
       |      CAST(p + m AS INTEGER)), ' '), '') AS mid,
       |    coalesce(array_to_string(list_slice(toks, CAST(p + m + 1 AS INTEGER),
       |      CAST(n AS INTEGER)), ' '), '') AS suf,
       |    coalesce(array_to_string(toks, ' '), '') AS orig
       |  FROM e)
       |SELECT doc_id, n AS n_tokens, fim_applied,
       |  p AS prefix_len, m AS middle_len, (n - p - m) AS suffix_len,
       |  md5(CASE WHEN fim_applied THEN
       |      '<|fim_pre|> ' || pre || ' <|fim_suf|> ' || suf || ' <|fim_mid|> ' || mid
       |    ELSE orig END) AS psm_md5,
       |  md5(CASE WHEN fim_applied THEN
       |      '<|fim_suf|> ' || suf || ' <|fim_pre|> ' || pre || ' <|fim_mid|> ' || mid
       |    ELSE orig END) AS spm_md5
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** km1: Lloyd k-means with fixed init and `rounds` UNROLLED rounds —
    * every assignment (min squared-L2, ties to smaller cid) and every
    * centroid update (per-(cluster, dim) mean, empty clusters keep the
    * previous centroid) recomputed in SQL from the same literals.
    */
  def km1Sql(k: Int = 8, rounds: Int = 2, dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(k, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}])"
    }.mkString(", ")
    def dist(cent: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
        s"i -> (v[CAST(i AS INTEGER)] - cv[CAST(i AS INTEGER)]) " +
        s"* (v[CAST(i AS INTEGER)] - cv[CAST(i AS INTEGER)]))), (a, b) -> a + b)"
    val base = s"""WITH cent0(cid, cv) AS (VALUES $rows),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |rng AS (SELECT CAST(unnest(range(1, ${dim + 1})) AS INTEGER) AS i)""".stripMargin
    val roundsSql = (1 to rounds).map { t =>
      val p = t - 1
      s""",
         |d$t AS (SELECT e.vec_id, cent$p.cid, ${dist(s"cent$p")} AS d
         |  FROM e CROSS JOIN cent$p),
         |a$t AS (SELECT vec_id, cid AS cluster FROM (SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn FROM d$t)
         |  WHERE rn = 1),
         |m$t AS (SELECT a$t.cluster, rng.i, avg(e.v[rng.i]) AS m
         |  FROM a$t JOIN e USING (vec_id) CROSS JOIN rng GROUP BY 1, 2),
         |g$t AS (SELECT cent$p.cid, rng.i, COALESCE(m$t.m, cent$p.cv[rng.i]) AS cval
         |  FROM cent$p CROSS JOIN rng
         |  LEFT JOIN m$t ON m$t.cluster = cent$p.cid AND m$t.i = rng.i),
         |cent$t AS (SELECT cid, list(cval ORDER BY i) AS cv FROM g$t GROUP BY cid)""".stripMargin
    }.mkString
    s"""$base$roundsSql,
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
       |       FROM a$rounds GROUP BY 1)
       |SELECT CAST(g$rounds.cid AS BIGINT) AS cluster,
       |  COALESCE(sz.n_members, 0) AS n_members,
       |  CAST(g$rounds.i - 1 AS INTEGER) AS dim, round(g$rounds.cval, 6) AS c_val
       |FROM g$rounds LEFT JOIN sz ON sz.cluster = g$rounds.cid
       |ORDER BY cluster, dim""".stripMargin
  }

  /** sil1: simplified silhouette of the fixed-codebook assignment —
    * same distance fold and (d², cid) tie order as km1Sql; per-point s
    * pico-quantized before the per-cluster sum.
    */
  def sil1Sql(k: Int = 8, dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(k, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}])"
    }.mkString(", ")
    val dist =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
        s"i -> (v[CAST(i AS INTEGER)] - cv[CAST(i AS INTEGER)]) " +
        s"* (v[CAST(i AS INTEGER)] - cv[CAST(i AS INTEGER)]))), (a, b) -> a + b)"
    s"""WITH cent(cid, cv) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |d AS MATERIALIZED (SELECT e.vec_id, cent.cid, $dist AS d2
       |  FROM e CROSS JOIN cent),
       |r AS MATERIALIZED (SELECT vec_id, cid, d2,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
       |  FROM d),
       |ab AS (SELECT a.vec_id, a.cid AS cluster, sqrt(a.d2) AS da, sqrt(b.d2) AS db
       |  FROM r a JOIN r b ON b.vec_id = a.vec_id AND b.rn = 2 WHERE a.rn = 1),
       |sp AS MATERIALIZED (SELECT cluster,
       |    CASE WHEN greatest(da, db) > 0
       |      THEN CAST(floor((db - da) / greatest(da, db) * 1e12 + 0.5) AS BIGINT)
       |      ELSE 0 END AS s_pico
       |  FROM ab)
       |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n,
       |  round(CAST(sum(CAST(s_pico AS DECIMAL(38,0))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) / 1e12, 9) AS mean_silhouette
       |FROM sp GROUP BY 1 ORDER BY cluster""".stripMargin
  }

  /** per1: single-bin DFT periodogram at candidate periods — the
    * twiddle factors cos/sin(2πr/p) serialize as double literals (the
    * km1Sql centroid discipline), per-residue n-scaled integer
    * deviations, micro-floored products, exact-integer dominance.
    */
  def per1Sql(periods: Seq[Int] = Seq(12, 24, 168)): String = {
    def lits(f: Int => Double, p: Int): String =
      (0 until p).map(r => f(r).toString).mkString("[", ", ", "]")
    val legs = periods.map { p =>
      val cosL = lits(r => math.cos(2.0 * math.Pi * r / p), p)
      val sinL = lits(r => math.sin(2.0 * math.Pi * r / p), p)
      s"""(SELECT CAST($p AS BIGINT) AS period, n, sc, ss, sc * sc + ss * ss AS p_int
         |  FROM (SELECT max(n) AS n, sum(CAST(tc AS DECIMAL(38,0))) AS sc,
         |      sum(CAST(ts AS DECIMAL(38,0))) AS ss
         |    FROM (SELECT n,
         |        CAST(floor(CAST(dev AS DOUBLE) * ($cosL)[r + 1] * 1000000.0 + 0.5) AS BIGINT) AS tc,
         |        CAST(floor(CAST(dev AS DOUBLE) * ($sinL)[r + 1] * 1000000.0 + 0.5) AS BIGINT) AS ts
         |      FROM (SELECT res.r, CAST(tot.n AS DECIMAL(38,0)) * res.sr
         |            - CAST(res.cnt AS DECIMAL(38,0)) * tot.sx AS dev, tot.n
         |        FROM (SELECT CAST(t % $p AS INTEGER) AS r, CAST(count(*) AS BIGINT) AS cnt,
         |            sum(CAST(x AS DECIMAL(38,0))) AS sr FROM ix GROUP BY 1) res, tot))))""".stripMargin
    }
    s"""WITH c AS (SELECT date_trunc('hour', ts) AS b,
       |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
       |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
       |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS b FROM bounds),
       |s AS MATERIALIZED (SELECT sp.b, coalesce(c.x, 0) AS x FROM sp LEFT JOIN c USING (b)),
       |tot AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(x AS DECIMAL(38,0))) AS sx FROM s),
       |ix AS MATERIALIZED (SELECT x, CAST(row_number() OVER (ORDER BY b) - 1 AS BIGINT) AS t FROM s),
       |al AS MATERIALIZED (${legs.mkString("\n  UNION ALL\n")}),
       |mx AS (SELECT max(p_int) AS pm FROM al)
       |SELECT period, n AS n_buckets,
       |  round(CAST(sc AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9) AS s_cos,
       |  round(CAST(ss AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9) AS s_sin,
       |  round((CAST(sc AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |      * (CAST(sc AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |    + (CAST(ss AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |      * (CAST(ss AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 9) AS power,
       |  p_int = mx.pm AS dominant
       |FROM al, mx ORDER BY period""".stripMargin
  }

  /** ot1: Sinkhorn entropic OT between the click/purchase hour-of-day
    * profiles — K = exp(−C/ε) and K∘C serialized as double literals
    * (the ONLY libm is plan-time), alternating scalings as chained
    * MATERIALIZED CTEs with in-order folds, bit-identical to the
    * engine's unrolled expression ladder.
    */
  def ot1Sql(bins: Int = 24, eps: Double = 4.0, iters: Int = 6): String = {
    def circ(i: Int, j: Int): Double = {
      val d = math.abs(i - j); math.min(d, bins - d).toDouble
    }
    def mat(f: (Int, Int) => Double): String =
      (0 until bins).map(i => (0 until bins).map(j => f(i, j).toString)
        .mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val kLit = mat((i, j) => math.exp(-circ(i, j) / eps))
    val kcLit = mat((i, j) => math.exp(-circ(i, j) / eps) * circ(i, j))
    val n1 = bins + 1
    def dot(m: String, vec: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, $n1), " +
        s"j -> ($m)[i][j] * ($vec)[j])), (x, y) -> x + y)"
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "ab" else s"vk${k - 1}"
      s""",
         |uk$k AS MATERIALIZED (SELECT p.*, list_transform(range(1, $n1),
         |    i -> a[i] / ${dot("kk.km", s"v_${k - 1}")}) AS u_$k
         |  FROM $prev p, kk),
         |vk$k AS MATERIALIZED (SELECT p.*, list_transform(range(1, $n1),
         |    i -> bb[i] / ${dot("kk.km", s"u_$k")}) AS v_$k
         |  FROM uk$k p, kk)""".stripMargin
    }.mkString
    val costTerm = s"u_$iters[i] * " +
      s"list_reduce(list_prepend(0.0, list_transform(range(1, $n1), " +
      s"j -> kk.kcm[i][j] * v_$iters[j])), (x, y) -> x + y)"
    val errTerm = s"abs(u_$iters[i] * " +
      s"list_reduce(list_prepend(0.0, list_transform(range(1, $n1), " +
      s"j -> kk.km[i][j] * v_$iters[j])), (x, y) -> x + y) - a[i])"
    s"""WITH kk AS (SELECT $kLit AS km, $kcLit AS kcm),
       |c AS (SELECT CAST(hour(ts) AS INTEGER) AS b,
       |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS side
       |  FROM events WHERE event_type IN ('click', 'purchase')),
       |counts AS (SELECT b, CAST(sum(side) AS BIGINT) AS ca,
       |    CAST(count(*) - sum(side) AS BIGINT) AS cb FROM c GROUP BY 1),
       |sp AS (SELECT CAST(unnest(range(0, $bins)) AS INTEGER) AS b),
       |dense AS (SELECT sp.b, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
       |  FROM sp LEFT JOIN counts USING (b)),
       |one AS MATERIALIZED (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |    CAST(sum(cb) AS BIGINT) AS nb,
       |    list(CAST(ca AS DOUBLE) ORDER BY b) AS lca,
       |    list(CAST(cb AS DOUBLE) ORDER BY b) AS lcb FROM dense),
       |ab AS MATERIALIZED (SELECT na, nb,
       |    list_transform(lca, x -> x / CAST(na AS DOUBLE)) AS a,
       |    list_transform(lcb, x -> x / CAST(nb AS DOUBLE)) AS bb,
       |    ${Seq.fill(bins)("1.0").mkString("[", ", ", "]")} AS v_0
       |  FROM one)$rounds
       |SELECT na AS n_a, nb AS n_b, CAST($bins AS BIGINT) AS n_bins,
       |  CAST($iters AS BIGINT) AS n_iters,
       |  round(list_reduce(list_prepend(0.0, list_transform(range(1, $n1),
       |    i -> $costTerm)), (x, y) -> x + y), 9) AS ot_cost,
       |  round(list_reduce(list_prepend(0.0, list_transform(range(1, $n1),
       |    i -> $errTerm)), (x, y) -> greatest(x, y)), 9) AS row_marginal_err
       |FROM vk$iters, kk""".stripMargin
  }

  /** jc1: AGMS join-size estimate — J md5-parity ±1 counters per side,
    * exact integer products, frequency-vector truth; mirrors
    * [[graft.ops.Joins.agmsJoinCardinality]] coin for coin.
    */
  def jc1Sql(counters: Int = 32): String = {
    val odd = "('1','3','5','7','9','b','d','f')"
    def sums(pfx: String) = (1 to counters).map { j =>
      s"CAST(sum(CASE WHEN substr(md5(k), $j, 1) IN $odd THEN -1 ELSE 1 END) AS BIGINT) AS $pfx$j"
    }.mkString(",\n    ") + s",\n    CAST(count(*) AS BIGINT) AS ${pfx}n"
    val prod = (1 to counters)
      .map(j => s"CAST(sa_$j AS DECIMAL(38,0)) * CAST(sb_$j AS DECIMAL(38,0))")
      .mkString(" + ")
    s"""WITH a AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE event_type = 'click'),
       |b AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE event_type = 'purchase'),
       |sa AS (SELECT ${sums("sa_")} FROM a),
       |sb AS (SELECT ${sums("sb_")} FROM b),
       |fa AS (SELECT k, CAST(count(*) AS BIGINT) AS fa FROM a GROUP BY 1),
       |fb AS (SELECT k, CAST(count(*) AS BIGINT) AS fb FROM b GROUP BY 1),
       |tr AS (SELECT CAST(coalesce(sum(CAST(fa AS DECIMAL(38,0)) * CAST(fb AS DECIMAL(38,0))), 0) AS BIGINT) AS truth
       |  FROM fa JOIN fb USING (k)),
       |est AS (SELECT ($prod) AS p FROM sa, sb)
       |SELECT sa.sa_n AS n_a, sb.sb_n AS n_b,
       |  CAST($counters AS BIGINT) AS n_counters, tr.truth,
       |  round(CAST(p AS DOUBLE) / $counters.0, 6) AS estimate,
       |  round((CAST(p AS DOUBLE) / $counters.0 - CAST(truth AS DOUBLE))
       |    / CAST(truth AS DOUBLE), 6) AS rel_err
       |FROM sa, sb, tr, est""".stripMargin
  }

  /** ann6: IVF cell-balance audit — same centroid literals / distance
    * fold / (d², cid) assignment order as sil1Sql, occupancy rollup +
    * imbalance factor.
    */
  def ann6Sql(k: Int = 16, dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(k, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}])"
    }.mkString(", ")
    val dist =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
        s"i -> (v[CAST(i AS INTEGER)] - cv[CAST(i AS INTEGER)]) " +
        s"* (v[CAST(i AS INTEGER)] - cv[CAST(i AS INTEGER)]))), (a, b) -> a + b)"
    s"""WITH cent(cid, cv) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |d AS MATERIALIZED (SELECT e.vec_id, cent.cid, $dist AS d2
       |  FROM e CROSS JOIN cent),
       |r AS (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn FROM d),
       |cells AS MATERIALIZED (SELECT cid AS cell, CAST(count(*) AS BIGINT) AS n_members
       |  FROM r WHERE rn = 1 GROUP BY 1),
       |sm AS (SELECT CAST(sum(n_members) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS used, CAST(max(n_members) AS BIGINT) AS max_m
       |  FROM cells)
       |SELECT CAST(cell AS BIGINT) AS cell, n_members, sm.used AS cells_used,
       |  CAST($k AS BIGINT) - sm.used AS cells_empty,
       |  round(CAST(sm.max_m AS DOUBLE) / (CAST(sm.n AS DOUBLE) / $k.0), 6) AS imbalance
       |FROM cells, sm ORDER BY cell""".stripMargin
  }

  /** ann7: incremental IVF append report — base/appended split by
    * vec_id mod, cosine argmax assignment from the SAME fixed-centroid
    * literals (ties to the larger cell id, the ss5/ss7 cell CTE), per-
    * cell occupancy + shifted-cosine means as exact integers, drift
    * and retrain flag per [[graft.ops.Similarity.ivfAppendReport]].
    */
  def ann7Sql(k: Int = 16, dim: Int = 64, splitMod: Int = 5,
              driftMicro: Long = 50000L): String = {
    val cents = Similarity.fixedCentroids(k, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cent(cid, cv, cn) AS (VALUES $cents),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    CASE WHEN vec_id % $splitMod = 0 THEN 1 ELSE 0 END AS is_new
       |  FROM embeddings),
       |cs AS (SELECT e.vec_id, e.is_new, cent.cid, $centDot / cn AS c_sim
       |  FROM e CROSS JOIN cent),
       |best AS (SELECT vec_id, is_new, cid AS cell, c_sim FROM (
       |    SELECT vec_id, is_new, cid, c_sim, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |vn AS (SELECT vec_id, sqrt(list_sum(list_transform(v, x -> x * x))) AS vnorm
       |  FROM e),
       |s1 AS (SELECT best.cell, best.is_new,
       |    CASE WHEN vn.vnorm = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(floor((best.c_sim / vn.vnorm + 1.0) * 1e6 + 0.5) AS BIGINT)
       |    END AS s1p
       |  FROM best JOIN vn ON vn.vec_id = best.vec_id),
       |g AS (SELECT cell,
       |    CAST(sum(CASE WHEN is_new = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
       |    CAST(sum(CASE WHEN is_new = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |    sum(CASE WHEN is_new = 0 THEN s1p ELSE 0 END) AS sb,
       |    sum(CASE WHEN is_new = 1 THEN s1p ELSE 0 END) AS sn
       |  FROM s1 GROUP BY 1),
       |m AS (SELECT CAST(cell AS BIGINT) AS cell, n_base, n_new,
       |    CAST((n_new * 1000000) // greatest(n_base, 1) AS BIGINT) AS growth_micro,
       |    CASE WHEN n_base > 0 THEN CAST(sb // n_base AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS sim1p_base_micro,
       |    CASE WHEN n_new > 0 THEN CAST(sn // n_new AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS sim1p_new_micro
       |  FROM g),
       |f AS (SELECT *, CASE WHEN n_base > 0 AND n_new > 0
       |    THEN sim1p_base_micro - sim1p_new_micro
       |    ELSE CAST(0 AS BIGINT) END AS drift_micro FROM m)
       |SELECT cell, n_base, n_new, growth_micro, sim1p_base_micro,
       |  sim1p_new_micro, drift_micro, drift_micro > $driftMicro AS retrain
       |FROM f ORDER BY cell""".stripMargin
  }

  /** cv2: Cramér's V association for each categorical column pair —
    * full r×c grid (zero cells contribute e), per-cell χ² term
    * micro-quantized before the order-free sum, V from the single
    * closed form. `pairs` carries (name, SQL expression) per side.
    */
  def cv2Sql(pairs: Seq[((String, String), (String, String))],
             table: String = "documents"): String = {
    val legs = pairs.map { case ((na, ea), (nb, eb)) =>
      s"""(WITH cells AS (SELECT CAST($ea AS VARCHAR) AS a, CAST($eb AS VARCHAR) AS b,
         |    CAST(count(*) AS BIGINT) AS o FROM $table GROUP BY 1, 2),
         |ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
         |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
         |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
         |    (SELECT CAST(count(*) AS BIGINT) FROM ra) AS r,
         |    (SELECT CAST(count(*) AS BIGINT) FROM cb) AS c FROM cells),
         |fl AS (SELECT ra.a, cb.b, coalesce(c2.o, 0) AS o, ra.ra, cb.cb
         |  FROM ra CROSS JOIN cb LEFT JOIN cells c2 ON c2.a = ra.a AND c2.b = cb.b),
         |ee AS (SELECT o, CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE) AS e
         |  FROM fl, tot),
         |tm AS (SELECT CAST(floor((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
         |    * 1e6 + 0.5) AS BIGINT) AS t FROM ee),
         |ch AS (SELECT CAST(sum(CAST(t AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS chi2 FROM tm)
         |SELECT '$na' AS col_a, '$nb' AS col_b, tot.n, tot.r AS n_rows, tot.c AS n_cols,
         |  (tot.r - 1) * (tot.c - 1) AS dof, round(ch.chi2, 6) AS chi2,
         |  CASE WHEN least(tot.r, tot.c) > 1
         |    THEN round(sqrt(ch.chi2 / (CAST(tot.n AS DOUBLE)
         |      * CAST(least(tot.r, tot.c) - 1 AS DOUBLE))), 9)
         |    ELSE 0.0 END AS cramers_v
         |FROM ch, tot)""".stripMargin
    }
    legs.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
  }

  /** lr1: full-batch GD logistic regression UNROLLED as chained CTEs
    * (the pg1/BPE discipline): the tx2 feature battery + bias, label =
    * n_chars > 300, zero init, `steps` gradient steps at lr = 1.0;
    * emits the learned weights (value-checking the whole optimization
    * path) plus train accuracy.
    */
  /** wl1: Weisfeiler–Lehman refinement on the kc1 handoff graph —
    * degree seed labels, per-round md5 of (own ‖ sorted neighbors),
    * distinct-label trajectory + order-free Σ-mod-2⁶⁰ fingerprint.
    */
  def wl1Sql(rounds: Int = 3): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"l${r - 1}"
      val sig = s"md5(CAST(o.lbl AS VARCHAR) || '|' || " +
        s"array_to_string(list_transform(n$r.ns, x -> CAST(x AS VARCHAR)), ','))"
      s""",
         |n$r AS (SELECT adj.v, list(l.lbl ORDER BY l.lbl) AS ns
         |  FROM adj JOIN $prev l ON l.v = adj.nb GROUP BY adj.v),
         |l$r AS MATERIALIZED (SELECT n$r.v, ${hex60(sig)} AS lbl
         |  FROM n$r JOIN $prev o ON o.v = n$r.v)""".stripMargin
    }.mkString
    val arms = (0 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, " +
        s"CAST(count(DISTINCT lbl) AS BIGINT) AS n_labels FROM l$r")
      .mkString("\n  UNION ALL ")
    s"""WITH ed AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS src,
       |           user_id AS dst FROM events)
       |  WHERE src IS NOT NULL AND src != dst),
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM ed),
       |adj AS MATERIALIZED (SELECT a AS v, b AS nb FROM und
       |  UNION ALL SELECT b, a FROM und),
       |l0 AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS lbl
       |  FROM adj GROUP BY 1)$roundCtes,
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM l0),
       |fp AS (SELECT CAST(sum(CAST(lbl AS HUGEINT)) % 1152921504606846976 AS BIGINT) AS graph_fp
       |  FROM l$rounds),
       |tr AS (
       |  $arms
       |)
       |SELECT tr.round, tr.n_labels, nn.n_nodes, fp.graph_fp
       |FROM tr CROSS JOIN nn CROSS JOIN fp ORDER BY tr.round""".stripMargin
  }

  /** acf1: autocorrelation at lags 1..maxLag of the dense hourly
    * event-count series — mirrors [[graft.ops.TimeSeries.acf]]:
    * n-scaled integer deviations, one moment row, one UNION arm per
    * lag.
    */
  def acf1Sql(maxLag: Int = 12): String = {
    def dev(c: String) =
      s"(CAST(n AS DECIMAL(38,0)) * CAST($c AS DECIMAL(38,0)) - sx)"
    val leads = (1 to maxLag)
      .map(k => s"lead(x, $k) OVER (ORDER BY b) AS x_$k").mkString(", ")
    val nums = (1 to maxLag).map(k =>
      s"""sum(CASE WHEN x_$k IS NOT NULL THEN ${dev("x")} * ${dev(s"x_$k")}
         |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS num_$k,
         |    CAST(sum(CASE WHEN x_$k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nt_$k""".stripMargin)
      .mkString(",\n    ")
    val arms = (1 to maxLag).map(k =>
      s"SELECT $k AS lag, nt_$k AS n_terms, " +
        s"round(CAST(num_$k AS DOUBLE) / CAST(den AS DOUBLE), 9) AS acf FROM m")
      .mkString("\n  UNION ALL ")
    s"""WITH c AS (SELECT date_trunc('hour', ts) AS b,
       |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
       |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
       |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS b FROM bounds),
       |s AS MATERIALIZED (SELECT sp.b, coalesce(c.x, 0) AS x FROM sp LEFT JOIN c USING (b)),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(x AS DECIMAL(38,0))) AS sx FROM s),
       |l AS (SELECT b, x, $leads FROM s),
       |d AS (SELECT l.*, t.n, t.sx FROM l CROSS JOIN t),
       |m AS MATERIALIZED (SELECT
       |    sum(${dev("x")} * ${dev("x")}) AS den,
       |    $nums
       |  FROM d)
       |SELECT lag, n_terms, acf FROM (
       |  $arms
       |) ORDER BY lag""".stripMargin
  }

  /** bs1: Poisson-bootstrap replicates over events.value — the weight
    * ladder inlines [[graft.ops.Stats.poissonThresholds]] verbatim, so
    * both engines compare the same 60-bit md5 draw against the same
    * nine literals.
    */
  def bs1Sql(reps: Int = 32): String = {
    val ts = graft.ops.Stats.poissonThresholds
    val ladder = ts.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
    s"""WITH base AS (SELECT CAST(event_id AS VARCHAR) AS id,
       |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv FROM events),
       |full_m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |    sum(CAST(qv AS DECIMAL(38,0))) AS s_full FROM base),
       |wb AS (SELECT id, qv, CAST(r.b AS BIGINT) AS b FROM base
       |  CROSS JOIN (SELECT unnest(range(0, $reps)) AS b) r),
       |uu AS (SELECT b, qv,
       |    ${hex60(s"md5(id || ':' || CAST(b AS VARCHAR))")} AS u FROM wb),
       |ww AS (SELECT b, qv, CASE $ladder ELSE ${ts.size} END AS w FROM uu),
       |pr AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
       |    sum(CAST(w AS DECIMAL(38,0)) * CAST(qv AS DECIMAL(38,0))) AS s_wv
       |  FROM ww GROUP BY 1),
       |pp AS MATERIALIZED (SELECT b, n_eff, s_wv,
       |    CAST(floor(CAST(s_wv AS DOUBLE) / CAST(n_eff AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS mb_pico
       |  FROM pr),
       |sc AS (SELECT sum(CAST(mb_pico AS DECIMAL(38,0))) AS s1,
       |    sum(CAST(mb_pico AS DECIMAL(38,0)) * CAST(mb_pico AS DECIMAL(38,0))) AS s2,
       |    CAST(min(mb_pico) AS BIGINT) AS lo_pico, CAST(max(mb_pico) AS BIGINT) AS hi_pico
       |  FROM pp)
       |SELECT pp.b, pp.n_eff,
       |  round(CAST(pp.s_wv AS DOUBLE) / CAST(pp.n_eff AS DOUBLE) / 1e6, 6) AS mean_b,
       |  round(CAST(f.s_full AS DOUBLE) / CAST(f.n_rows AS DOUBLE) / 1e6, 6) AS est_mean,
       |  round(sqrt(($reps.0 * CAST(sc.s2 AS DOUBLE) - CAST(sc.s1 AS DOUBLE) * CAST(sc.s1 AS DOUBLE))
       |    / ($reps.0 * ($reps.0 - 1.0))) / 1e12, 9) AS se_boot,
       |  round(CAST(sc.lo_pico AS DOUBLE) / 1e12, 6) AS ci_lo,
       |  round(CAST(sc.hi_pico AS DOUBLE) / 1e12, 6) AS ci_hi
       |FROM pp CROSS JOIN sc CROSS JOIN full_m f ORDER BY pp.b""".stripMargin
  }

  def lr1Sql(steps: Int = 3): String = {
    val nf = 5
    def zExpr(wt: String): String =
      (0 until nf).map(j => s"f$j * $wt.w$j").mkString(" + ")
    val base = """WITH q AS (
      |  SELECT doc_id, n_chars,
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
      |x AS (SELECT doc_id, 1.0 AS f0, punct_ratio AS f1, alpha_ratio AS f2,
      |        stopword_ratio AS f3, mean_word_len / 10.0 AS f4,
      |        CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END AS y FROM q),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM x),
      |wt0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)""".stripMargin
    val stepsSql = (1 to steps).map { t =>
      val g = (0 until nf).map(j =>
        s"sum(f$j * (1.0 / (1.0 + exp(-(${zExpr(s"wt${t - 1}")}))) - y)) AS g$j")
        .mkString(",\n|    ")
      val w = (0 until nf).map(j =>
        s"wt${t - 1}.w$j - 1.0 * (g$t.g$j / nn.n) AS w$j").mkString(", ")
      s""",
         |g$t AS (SELECT $g
         |  FROM x CROSS JOIN wt${t - 1}),
         |wt$t AS (SELECT $w FROM g$t CROSS JOIN wt${t - 1} CROSS JOIN nn)""".stripMargin
    }.mkString
    val accuracy =
      s""",
         |zf AS (SELECT x.y, ${zExpr(s"wt$steps")} AS z FROM x CROSS JOIN wt$steps),
         |acc AS (SELECT avg(CASE WHEN (z > 0) = (y = 1.0) THEN 1.0 ELSE 0.0 END) AS a,
         |    CAST(count(*) AS BIGINT) AS n_docs FROM zf)
         |SELECT j, round(weight, 6) AS weight, round(acc.a, 6) AS accuracy, acc.n_docs
         |FROM (
         |  ${(0 until nf).map(j => s"SELECT $j AS j, wt$steps.w$j AS weight FROM wt$steps")
             .mkString("\n|  UNION ALL ")}
         |) w CROSS JOIN acc ORDER BY j""".stripMargin
    base + stepsSql + accuracy
  }

  /** cdc1: content-defined chunking — the full cut-rule, chunk-hash and
    * shared-chunk recompute; every index arithmetic mirrors the
    * engine's 0-based boundary positions.
    */
  def cdc1Sql(window: Int = 4, divisor: Int = 16): String = {
    val win = s"array_to_string(list_slice(toks, " +
      s"CAST(greatest(i + ${2 - window}, 1) AS INTEGER), CAST(i + 1 AS INTEGER)), ' ')"
    // NB: hex60 is not usable here — its internal lambda variable is
    // also `i` and would SHADOW the boundary position; inline the
    // 60-bit fold with `j` instead.
    val h60 = s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16), " +
      s"j -> CAST(strpos('0123456789abcdef', substr(md5($win), CAST(j AS INTEGER), 1)) - 1 AS BIGINT))), " +
      "(acc, x) -> acc * 16 + x)"
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |p AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |bp AS (SELECT doc_id, toks, n,
       |    list_filter(range(0, greatest(n - 1, 1)), i -> i <= n - 2 AND
       |      $h60 % $divisor = 0) AS bpos
       |  FROM p),
       |se AS (SELECT doc_id, toks,
       |    list_prepend(CAST(0 AS BIGINT), list_transform(bpos, b -> b + 1)) AS starts,
       |    list_append(bpos, CAST(n - 1 AS BIGINT)) AS ends FROM bp),
       |chs AS (SELECT doc_id, unnest(list_transform(range(1, len(starts) + 1),
       |    k -> struct_pack(
       |      h := md5(array_to_string(list_slice(toks,
       |             CAST(starts[CAST(k AS INTEGER)] + 1 AS INTEGER),
       |             CAST(ends[CAST(k AS INTEGER)] + 1 AS INTEGER)), ' ')),
       |      l := CAST(ends[CAST(k AS INTEGER)] - starts[CAST(k AS INTEGER)] + 1 AS BIGINT)))) AS s
       |  FROM se),
       |ch AS (SELECT doc_id, s.h AS h, s.l AS l FROM chs),
       |multi AS (SELECT h FROM ch GROUP BY h HAVING count(DISTINCT doc_id) > 1)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN h IN (SELECT h FROM multi) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_shared_chunks,
       |  round(avg(l), 6) AS mean_chunk_len
       |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** dd16: LSH banding-quality audit — rebuild the portable md5
    * signatures, bands and RAW candidate pairs (pre-verification) plus
    * the exact-Jaccard truth set, and reduce both to one confusion
    * row. Shares every construction rule with [[dd3pSql]].
    */
  def dd16Sql(threshold: Double): String = {
    val (a, b) = MinHashSigs.perms(64, 42L)
    val minExprs = (0 until 64)
      .map(j => s"min((${a(j)} * h + ${b(j)}) % $P)").mkString(", ")
    s"""WITH tok AS (SELECT doc_id AS d, string_split(lower(text), ' ') AS t FROM documents),
       |shg AS (SELECT d, unnest(list_distinct(
       |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |  ELSE list_transform(range(0, len(t) - 2),
       |    i -> array_to_string(list_slice(t, CAST(i + 1 AS INTEGER), CAST(i + 3 AS INTEGER)), ' '))
       |  END)) AS s FROM tok),
       |shm AS (SELECT d, md5(s) AS m FROM shg),
       |sh AS (SELECT DISTINCT d, ${hex60("m")} % $P AS h FROM shm),
       |sigs AS (SELECT d, [$minExprs] AS sig FROM sh GROUP BY d),
       |bands AS (SELECT d, bb.b AS band,
       |    md5(array_to_string(list_slice(sig, CAST(bb.b * 4 + 1 AS INTEGER), CAST(bb.b * 4 + 4 AS INTEGER)), ',')) AS bh
       |  FROM sigs, range(16) bb(b)),
       |cand AS (SELECT DISTINCT x.d AS d1, y.d AS d2 FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.d < y.d),
       |sizes AS (SELECT d, count(*) AS n FROM sh GROUP BY d),
       |common AS (SELECT x.d AS d1, y.d AS d2, count(*) AS c FROM sh x
       |  JOIN sh y ON y.h = x.h AND x.d < y.d GROUP BY 1, 2),
       |truth AS (SELECT d1, d2 FROM common
       |  JOIN sizes s1 ON s1.d = common.d1 JOIN sizes s2 ON s2.d = common.d2
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= $threshold),
       |ntc AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
       |ncc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
       |tpc AS (SELECT CAST(count(*) AS BIGINT) AS tp FROM truth t
       |  JOIN cand c ON c.d1 = t.d1 AND c.d2 = t.d2)
       |SELECT n_truth, n_cand, tp, n_cand - tp AS fp, n_truth - tp AS fn,
       |  round(CAST(tp AS DOUBLE) / CAST(n_cand AS DOUBLE), 6) AS prec,
       |  round(CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE), 6) AS rec,
       |  round(CASE WHEN CAST(tp AS DOUBLE) / CAST(n_cand AS DOUBLE)
       |               + CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE) = 0 THEN 0.0
       |    ELSE 2.0 * (CAST(tp AS DOUBLE) / CAST(n_cand AS DOUBLE))
       |         * (CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE))
       |         / (CAST(tp AS DOUBLE) / CAST(n_cand AS DOUBLE)
       |            + CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE)) END, 6) AS f1
       |FROM ntc CROSS JOIN ncc CROSS JOIN tpc""".stripMargin
  }

  /** dd3: the native xxhash64 MinHash-LSH pair set asserted equal to
    * the portable md5 one IN-PLAN — the engine emits the full-outer
    * union of both verified pair sets with membership flags, and the
    * oracle is the portable reconstruction with both flags expected
    * `true`. The jaccard verification values are hash-family-independent
    * (exact set overlap of per-doc shingle hashes, injective in
    * practice), so when banding recall is 1 on the corpus's true pairs
    * — they sit at J ≈ 1, where 16-band/4-row miss probability is
    * ~1e-7 — the sets coincide exactly. Any native divergence (a
    * missed pair → `in_native=false` row, a spurious verified pair the
    * portable banding lacks → extra row) breaks rows/hash and flips
    * the gate red.
    */
  def dd3Sql(threshold: Double): String =
    s"""SELECT d1, d2, jaccard, true AS in_native, true AS in_portable
       |FROM (${dd3pSql(threshold)}) ORDER BY d1, d2""".stripMargin

  /** dd4: SimHash pair sets are genuinely hash-family-dependent (the
    * fingerprint IS the xxhash64 bit statistics — no engine-independent
    * ground truth exists for the native pairs), so the gate row emits
    * the portable pair set (fully recomputed here) plus two in-plan
    * guards on the native path: `native_impl_ok` — every doc's fused
    * native `simhash64` equals the compositional built-in fold — and
    * `native_nonempty` — the native pigeonhole pipeline ran and found
    * pairs. Both expected `true`; a native codegen regression or a
    * broken native pipeline flips the whole row set red.
    */
  def dd4Sql(maxDist: Int): String =
    s"""SELECT d1, d2, hamming, true AS native_impl_ok, true AS native_nonempty
       |FROM (${dd4pSql(maxDist)}) ORDER BY d1, d2""".stripMargin

  /** dd12: incremental near-dup dedup — delta docs (doc_id >= split)
    * surviving a signature-agreement dedup against the base corpus's
    * (doc_id < split) persisted MinHash signature table. The oracle
    * rebuilds BOTH sides' signatures from the documents table with the
    * same md5-backed family (the engine only ever re-signs the delta;
    * proving value-equality against a from-scratch recomputation is
    * exactly what shows the persisted store is lossless).
    */
  def dd12Sql(split: Long, estThreshold: Double): String = {
    val (a, b) = MinHashSigs.perms(64, 42L)
    val minExprs = (0 until 64)
      .map(j => s"min((${a(j)} * h + ${b(j)}) % $P)").mkString(", ")
    val agree = "list_sum(list_transform(range(1, 65), " +
      "i -> CASE WHEN sa.sig[CAST(i AS INTEGER)] = sb.sig[CAST(i AS INTEGER)] THEN 1 ELSE 0 END))"
    s"""WITH tok AS (SELECT doc_id AS d, string_split(lower(text), ' ') AS t FROM documents),
       |shg AS (SELECT d, unnest(list_distinct(
       |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |  ELSE list_transform(range(0, len(t) - 2),
       |    i -> array_to_string(list_slice(t, CAST(i + 1 AS INTEGER), CAST(i + 3 AS INTEGER)), ' '))
       |  END)) AS s FROM tok),
       |shm AS (SELECT d, md5(s) AS m FROM shg),
       |sh AS (SELECT DISTINCT d, ${hex60("m")} % $P AS h FROM shm),
       |sigs AS (SELECT d, [$minExprs] AS sig FROM sh GROUP BY d),
       |bands AS (SELECT d, bb.b AS band,
       |    md5(array_to_string(list_slice(sig, CAST(bb.b * 4 + 1 AS INTEGER), CAST(bb.b * 4 + 4 AS INTEGER)), ',')) AS bh
       |  FROM sigs, range(16) bb(b)),
       |cand AS (SELECT DISTINCT x.d AS d1, y.d AS d2 FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |  WHERE x.d >= $split AND y.d < $split),
       |hits AS (SELECT DISTINCT cand.d1 FROM cand
       |  JOIN sigs sa ON sa.d = cand.d1 JOIN sigs sb ON sb.d = cand.d2
       |  WHERE CAST($agree AS DOUBLE) / 64.0 >= $estThreshold)
       |SELECT doc_id FROM documents
       |WHERE doc_id >= $split AND doc_id NOT IN (SELECT d1 FROM hits)
       |ORDER BY doc_id""".stripMargin
  }

  /** sd2: the epoch-loop signature store ([[graft.ops.SigStore]]) —
    * epochs are `doc_id % nEpochs`, processed in order against an
    * initially-empty store. The oracle unrolls the loop: per epoch, a
    * doc drops on a signature-agreement hit against any PRIOR
    * survivor (cross) or as the larger id of an intra-epoch pair
    * (greedy drop-d2, regardless of d1's own fate); only survivors
    * join the store. Recomputing every epoch's store from the raw
    * documents table and matching the engine — which only ever reads
    * the persisted snapshot — proves the versioned store is lossless
    * across the whole epoch chain, not just one delta (the dd12
    * check's closure).
    */
  def sd2Sql(nEpochs: Int, estThreshold: Double): String = {
    val (a, b) = MinHashSigs.perms(64, 42L)
    val minExprs = (0 until 64)
      .map(j => s"min((${a(j)} * h + ${b(j)}) % $P)").mkString(", ")
    val agree = "list_sum(list_transform(range(1, 65), " +
      "i -> CASE WHEN sa.sig[CAST(i AS INTEGER)] = sb.sig[CAST(i AS INTEGER)] THEN 1 ELSE 0 END))"
    def intraSql(k: Int): String =
      s"""SELECT y.d FROM bands x
         |    JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.d < y.d
         |    JOIN sigs sa ON sa.d = x.d JOIN sigs sb ON sb.d = y.d
         |    WHERE x.d % $nEpochs = $k AND y.d % $nEpochs = $k
         |      AND CAST($agree AS DOUBLE) / 64.0 >= $estThreshold""".stripMargin
    val epochCtes = (0 until nEpochs).map { k =>
      val drop =
        if (k == 0) intraSql(0)
        else
          s"""SELECT x.d FROM bands x
             |    JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.d <> y.d
             |    JOIN sigs sa ON sa.d = x.d JOIN sigs sb ON sb.d = y.d
             |    WHERE x.d % $nEpochs = $k AND y.d IN (SELECT d FROM store${k - 1})
             |      AND CAST($agree AS DOUBLE) / 64.0 >= $estThreshold
             |  UNION
             |  ${intraSql(k)}""".stripMargin
      val store =
        if (k == 0) s"store0 AS (SELECT d FROM surv0)"
        else s"store$k AS (SELECT d FROM store${k - 1} UNION SELECT d FROM surv$k)"
      s"""surv$k AS (SELECT d FROM sigs WHERE d % $nEpochs = $k AND d NOT IN (
         |  $drop)),
         |$store""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (SELECT doc_id AS d, string_split(lower(text), ' ') AS t FROM documents),
       |shg AS (SELECT d, unnest(list_distinct(
       |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |  ELSE list_transform(range(0, len(t) - 2),
       |    i -> array_to_string(list_slice(t, CAST(i + 1 AS INTEGER), CAST(i + 3 AS INTEGER)), ' '))
       |  END)) AS s FROM tok),
       |shm AS (SELECT d, md5(s) AS m FROM shg),
       |sh AS (SELECT DISTINCT d, ${hex60("m")} % $P AS h FROM shm),
       |sigs AS (SELECT d, [$minExprs] AS sig FROM sh GROUP BY d),
       |bands AS (SELECT d, bb.b AS band,
       |    md5(array_to_string(list_slice(sig, CAST(bb.b * 4 + 1 AS INTEGER), CAST(bb.b * 4 + 4 AS INTEGER)), ',')) AS bh
       |  FROM sigs, range(16) bb(b)),
       |$epochCtes
       |SELECT doc_id FROM documents
       |WHERE doc_id IN (SELECT d FROM store${nEpochs - 1})
       |ORDER BY doc_id""".stripMargin
  }

  /** dd4p: md5-backed SimHash pairs (60-bit hashes, 16-bit pigeonhole
    * chunks, Hamming <= maxDist) — mirrors simhashPairsPortable.
    */
  def dd4pSql(maxDist: Int): String = {
    val bitTerms = (0 until 60).map(bb =>
      s"(CASE WHEN sum(((h >> $bb) & 1) * 2 - 1) > 0 THEN CAST(1 AS BIGINT) << $bb ELSE CAST(0 AS BIGINT) END)"
    ).mkString(" + ")
    s"""WITH tok AS (SELECT doc_id AS d, unnest(string_split(lower(text), ' ')) AS tk FROM documents),
       |tm AS (SELECT d, md5(tk) AS m FROM tok),
       |th AS (SELECT d, ${hex60("m")} AS h FROM tm),
       |sh AS (SELECT d, $bitTerms AS simhash FROM th GROUP BY d),
       |ch AS (SELECT d, simhash, cc.c AS chunk,
       |    (simhash >> CAST(cc.c * 16 AS INTEGER)) & 65535 AS cv
       |  FROM sh, range(4) cc(c)),
       |cand AS (SELECT DISTINCT x.d AS d1, y.d AS d2,
       |    CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
       |  FROM ch x JOIN ch y ON x.chunk = y.chunk AND x.cv = y.cv AND x.d < y.d)
       |SELECT d1, d2, hamming FROM cand WHERE hamming <= $maxDist ORDER BY d1, d2""".stripMargin
  }

  /** dc5: fuzzy decontamination — dd4p's portable 60-bit SimHash +
    * pigeonhole, cross-corpus (train = doc_id % split != 0, eval =
    * % split = 0); per contaminated train doc: match count + closest
    * hamming.
    */
  def dc5Sql(maxDist: Int = 3, split: Long = 37): String = {
    val bitTerms = (0 until 60).map(bb =>
      s"(CASE WHEN sum(((h >> $bb) & 1) * 2 - 1) > 0 THEN CAST(1 AS BIGINT) << $bb ELSE CAST(0 AS BIGINT) END)"
    ).mkString(" + ")
    s"""WITH tok AS (SELECT doc_id AS d, unnest(string_split(lower(text), ' ')) AS tk FROM documents),
       |tm AS (SELECT d, md5(tk) AS m FROM tok),
       |th AS (SELECT d, ${hex60("m")} AS h FROM tm),
       |sh AS (SELECT d, $bitTerms AS simhash FROM th GROUP BY d),
       |ch AS (SELECT d, simhash, cc.c AS chunk,
       |    (simhash >> CAST(cc.c * 16 AS INTEGER)) & 65535 AS cv
       |  FROM sh, range(4) cc(c)),
       |cand AS (SELECT DISTINCT x.d AS d, y.d AS e,
       |    CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
       |  FROM ch x JOIN ch y ON x.chunk = y.chunk AND x.cv = y.cv
       |  WHERE x.d % $split != 0 AND y.d % $split = 0)
       |SELECT d AS doc_id, CAST(count(*) AS BIGINT) AS n_eval_matches,
       |  CAST(min(hamming) AS BIGINT) AS min_hamming
       |FROM cand WHERE hamming <= $maxDist GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** One VALUES row per (table, plane): the ±1 components encoded as a
    * '1'/'0' sign string, decoded positionally inside the dot fold.
    */
  private def planeRows(nPlanes: Int, dim: Int, seeds: Seq[Long]): String =
    seeds.zipWithIndex.flatMap { case (seed, t) =>
      Similarity.planeSigns(nPlanes, dim, seed).zipWithIndex.map { case (signs, p) =>
        val s = signs.map(x => if (x > 0) '1' else '0').mkString
        s"($t, $p, '$s')"
      }
    }.mkString(", ")

  /** ari1: ARI + NMI between the label column and the 2-plane SRP
    * cell — the SAME plane literals as the engine
    * (Similarity.planeSigns(nPlanes, dim, seed)), exact HUGEINT pair
    * counts (C(x,2) halves the even factor first), fixed-form ln
    * terms nano-quantized then integer-weighted, sign-safe magnitude
    * division at display.
    */
  def ari1Sql(nPlanes: Int = 2, dim: Int = 64, seed: Long = 7L): String = {
    def c2(cn: String) =
      s"(CASE WHEN $cn % 2 = 0 THEN CAST($cn // 2 AS HUGEINT) * " +
        s"CAST($cn - 1 AS HUGEINT) ELSE CAST($cn AS HUGEINT) * " +
        s"CAST(($cn - 1) // 2 AS HUGEINT) END)"
    s"""WITH pl(tbl, p, s) AS (VALUES ${planeRows(nPlanes, dim, Seq(seed))}),
       |e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |dots AS (SELECT e.vec_id, e.label, pl.p, ${planeDot(dim)} AS dp FROM e CROSS JOIN pl),
       |bkt AS (SELECT vec_id, any_value(label) AS la0,
       |    CAST(sum(CASE WHEN dp >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS lb
       |  FROM dots GROUP BY vec_id),
       |cells AS (SELECT CAST(la0 AS BIGINT) AS la, lb,
       |    CAST(count(*) AS BIGINT) AS nij FROM bkt GROUP BY 1, 2),
       |ra AS (SELECT la, CAST(sum(nij) AS BIGINT) AS ai FROM cells GROUP BY 1),
       |cb AS (SELECT lb, CAST(sum(nij) AS BIGINT) AS bj FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS n_cells,
       |    CAST(count(DISTINCT la) AS BIGINT) AS n_labels,
       |    CAST(count(DISTINCT lb) AS BIGINT) AS n_geo_cells,
       |    sum(${c2("nij")}) AS sij FROM cells),
       |mi AS (SELECT sum(CAST(nij AS HUGEINT) * CAST(floor(ln(
       |      (CAST(n AS DOUBLE) * CAST(nij AS DOUBLE)) /
       |      (CAST(ai AS DOUBLE) * CAST(bj AS DOUBLE))) * 1e9 + 0.5)
       |    AS HUGEINT)) AS i_num
       |  FROM cells JOIN ra USING (la) JOIN cb USING (lb), tot),
       |ha AS (SELECT sum(CAST(ai AS HUGEINT) * CAST(floor(ln(
       |      CAST(n AS DOUBLE) / CAST(ai AS DOUBLE)) * 1e9 + 0.5)
       |    AS HUGEINT)) AS h_ai FROM ra, tot),
       |hb AS (SELECT sum(CAST(bj AS HUGEINT) * CAST(floor(ln(
       |      CAST(n AS DOUBLE) / CAST(bj AS DOUBLE)) * 1e9 + 0.5)
       |    AS HUGEINT)) AS h_bj FROM cb, tot),
       |sab AS (SELECT (SELECT sum(${c2("ai")}) FROM ra) AS sa,
       |    (SELECT sum(${c2("bj")}) FROM cb) AS sb),
       |fin AS (SELECT n, n_labels, n_geo_cells, n_cells, sij, sa, sb,
       |    i_num, h_ai, h_bj, ${c2("n")} AS cc FROM tot, sab, mi, ha, hb),
       |fin2 AS (SELECT *, 2 * (cc * sij - sa * sb) AS num2,
       |    cc * (sa + sb) - 2 * sa * sb AS den2 FROM fin)
       |SELECT n, n_labels, n_geo_cells, n_cells,
       |  CASE WHEN den2 = 0 THEN CAST(0 AS BIGINT)
       |    WHEN num2 >= 0 THEN CAST((num2 * 1000000) // den2 AS BIGINT)
       |    ELSE -CAST(((-num2) * 1000000) // den2 AS BIGINT) END AS ari_micro,
       |  CASE WHEN h_ai + h_bj = 0 THEN CAST(0 AS BIGINT)
       |    WHEN i_num >= 0 THEN
       |      CAST((2 * i_num * 1000000) // (h_ai + h_bj) AS BIGINT)
       |    ELSE -CAST((2 * (-i_num) * 1000000) // (h_ai + h_bj) AS BIGINT)
       |  END AS nmi_micro
       |FROM fin2""".stripMargin
  }

  /** knn1: kNN label-probe accuracy — exact cosine top-k for the
    * bounded query sample (vec_id % mod = 0), majority vote with the
    * (count desc, label asc) tiebreak, per-label exact accuracy.
    */
  def knn1Sql(k: Int = 5, mod: Long = 50, dim: Int = 64): String =
    s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |tp AS (SELECT qe.vec_id AS q_id, qe.label AS q_lbl, ne.vec_id AS n_id,
       |    ne.label AS n_lbl, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM e qe CROSS JOIN e ne
       |  WHERE qe.vec_id % $mod = 0 AND ne.vec_id <> qe.vec_id),
       |nn AS (SELECT q_id, q_lbl, n_lbl FROM (SELECT q_id, q_lbl, n_lbl,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rn FROM tp)
       |  WHERE rn <= $k),
       |vote AS (SELECT q_id, q_lbl, n_lbl, CAST(count(*) AS BIGINT) AS c
       |  FROM nn GROUP BY 1, 2, 3),
       |win AS (SELECT q_id, q_lbl, n_lbl FROM (SELECT q_id, q_lbl, n_lbl,
       |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_lbl ASC) AS rn FROM vote)
       |  WHERE rn = 1)
       |SELECT CAST(q_lbl AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(sum(CASE WHEN n_lbl = q_lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST((sum(CASE WHEN n_lbl = q_lbl THEN 1 ELSE 0 END) * 1000000)
       |    // count(*) AS BIGINT) AS acc_micro
       |FROM win GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact in-order signed dot of plane string `s` against vector col
    * `v` — bit-identical to VectorDot's left fold.
    */
  private def planeDot(dim: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> (CASE WHEN substr(pl.s, CAST(i AS INTEGER), 1) = '1' THEN 1.0 ELSE -1.0 END) " +
      "* v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"

  /** Cosine between e-aliased rows `$qa.v` and `$na.v` (list_sum +
    * round-6 downstream, the ss1 precedent).
    */
  private def cosSql(dim: Int, qa: String, na: String): String = {
    def d(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $x.v[CAST(i AS INTEGER)] * $y.v[CAST(i AS INTEGER)]))"
    s"${d(qa, na)} / (sqrt(${d(qa, qa)}) * sqrt(${d(na, na)}))"
  }

  /** ss6: PQ/ADC top-k with exact re-rank over the FIXED deterministic
    * codebooks ([[Similarity.fixedPqCodebooks]]). Every ranking
    * decision mirrors the engine's arithmetic: subspace dots and the
    * ADC sum are in-order list_reduce folds (the VectorDot discipline),
    * encode ties break to the lower code, and the re-rank cosine uses
    * the ss1 list_sum + round-6 convention.
    */
  def pq1Sql(k: Int = 5, m: Int = 8, ks: Int = 16, rerank: Int = 24,
             dim: Int = 64, seed: Long = 23L): String = {
    val sd = dim / m
    val cbs = Similarity.fixedPqCodebooks(m, ks, sd, seed)
    val rows = cbs.flatten.map(c =>
      s"(${c.sub}, ${c.code}, [${c.vec.mkString(", ")}], ${c.cc})").mkString(", ")
    def subDot(va: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${sd + 1}), " +
        s"i -> cb.cv[CAST(i AS INTEGER)] * $va[CAST(cb.j * $sd + i AS INTEGER)])), (acc, x) -> acc + x)"
    def qq(va: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${sd + 1}), " +
        s"i -> $va[CAST(cb.j * $sd + i AS INTEGER)] * $va[CAST(cb.j * $sd + i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cb(j, c, cv, cc) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |sc AS (SELECT e.vec_id, cb.j, cb.c,
       |    cb.cc - CAST(2.0 AS DOUBLE) * ${subDot("e.v")} AS score
       |  FROM e CROSS JOIN cb),
       |enc AS (SELECT vec_id, j, c AS code FROM (
       |    SELECT vec_id, j, c,
       |      row_number() OVER (PARTITION BY vec_id, j ORDER BY score ASC, c ASC) AS rn
       |    FROM sc) WHERE rn = 1),
       |qd AS (SELECT e.vec_id AS q_id, cb.j, cb.c,
       |    (${qq("e.v")} - CAST(2.0 AS DOUBLE) * ${subDot("e.v")}) + cb.cc AS d
       |  FROM e CROSS JOIN cb WHERE e.vec_id < 8),
       |adcl AS (SELECT qd.q_id, enc.vec_id AS n_id, list(qd.d ORDER BY qd.j) AS ds
       |  FROM qd JOIN enc ON enc.j = qd.j AND enc.code = qd.c
       |  WHERE enc.vec_id <> qd.q_id GROUP BY 1, 2),
       |adc AS (SELECT q_id, n_id,
       |    list_reduce(list_prepend(0.0, ds), (acc, x) -> acc + x) AS adc_dist FROM adcl),
       |cand AS (SELECT q_id, n_id, adc_dist FROM (
       |    SELECT q_id, n_id, adc_dist,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc_dist ASC, n_id ASC) AS adc_rank
       |    FROM adc) WHERE adc_rank <= $rerank),
       |sims AS (SELECT cand.q_id, cand.n_id, cand.adc_dist, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ne ON ne.vec_id = cand.n_id),
       |ranked AS (SELECT q_id, n_id, adc_dist, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank FROM sims)
       |SELECT q_id, n_id, rank,
       |  CAST(floor(adc_dist * 1e9 + 0.5) AS BIGINT) AS adc_nano,
       |  CAST(floor(sim * 1e9 + 0.5) AS BIGINT) AS sim_nano
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** ss7: IVF-PQ top-k — ss5's fixed-centroid cell pruning composed
    * with ss6's PQ encode/ADC/re-rank, all from serialized literals.
    */
  def pq2Sql(k: Int = 5, nCentroids: Int = 16, nProbe: Int = 6,
             m: Int = 8, ks: Int = 16, rerank: Int = 24,
             dim: Int = 64, pqSeed: Long = 23L): String = {
    val sd = dim / m
    val cbs = Similarity.fixedPqCodebooks(m, ks, sd, pqSeed)
    val cbRows = cbs.flatten.map(c =>
      s"(${c.sub}, ${c.code}, [${c.vec.mkString(", ")}], ${c.cc})").mkString(", ")
    val centRows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cent.cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    def subDot(va: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${sd + 1}), " +
        s"i -> cb.cv[CAST(i AS INTEGER)] * $va[CAST(cb.j * $sd + i AS INTEGER)])), (acc, x) -> acc + x)"
    def qq(va: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${sd + 1}), " +
        s"i -> $va[CAST(cb.j * $sd + i AS INTEGER)] * $va[CAST(cb.j * $sd + i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cent(cid, cv, cn) AS (VALUES $centRows),
       |cb(j, c, cv, cc) AS (VALUES $cbRows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |probe AS (SELECT vec_id AS q_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn
       |    FROM cs WHERE vec_id < 8)
       |  WHERE rn <= $nProbe),
       |candc AS (SELECT DISTINCT p.q_id, c.vec_id AS n_id
       |  FROM probe p JOIN cell c ON c.cell = p.cell WHERE c.vec_id <> p.q_id),
       |sc AS (SELECT e.vec_id, cb.j, cb.c,
       |    cb.cc - CAST(2.0 AS DOUBLE) * ${subDot("e.v")} AS score
       |  FROM e CROSS JOIN cb),
       |enc AS (SELECT vec_id, j, c AS code FROM (
       |    SELECT vec_id, j, c,
       |      row_number() OVER (PARTITION BY vec_id, j ORDER BY score ASC, c ASC) AS rn
       |    FROM sc) WHERE rn = 1),
       |qd AS (SELECT e.vec_id AS q_id, cb.j, cb.c,
       |    (${qq("e.v")} - CAST(2.0 AS DOUBLE) * ${subDot("e.v")}) + cb.cc AS d
       |  FROM e CROSS JOIN cb WHERE e.vec_id < 8),
       |adcl AS (SELECT candc.q_id, candc.n_id, list(qd.d ORDER BY qd.j) AS ds
       |  FROM candc
       |  JOIN qd ON qd.q_id = candc.q_id
       |  JOIN enc ON enc.vec_id = candc.n_id AND enc.j = qd.j AND enc.code = qd.c
       |  GROUP BY 1, 2),
       |adc AS (SELECT q_id, n_id,
       |    list_reduce(list_prepend(0.0, ds), (acc, x) -> acc + x) AS adc_dist FROM adcl),
       |cand AS (SELECT q_id, n_id, adc_dist FROM (
       |    SELECT q_id, n_id, adc_dist,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc_dist ASC, n_id ASC) AS adc_rank
       |    FROM adc) WHERE adc_rank <= $rerank),
       |sims AS (SELECT cand.q_id, cand.n_id, cand.adc_dist, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ne ON ne.vec_id = cand.n_id),
       |ranked AS (SELECT q_id, n_id, adc_dist, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank FROM sims)
       |SELECT q_id, n_id, rank,
       |  CAST(floor(adc_dist * 1e9 + 0.5) AS BIGINT) AS adc_nano,
       |  CAST(floor(sim * 1e9 + 0.5) AS BIGINT) AS sim_nano
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** ss3: SRP-LSH top-k with Hamming<=2 multi-probe on the query side
    * (nPlanes=12, nTables=8, seeds 7..14, queries vec_id < 8, k=5).
    */
  def ss3Sql(k: Int = 5, nPlanes: Int = 12, nTables: Int = 8,
             dim: Int = 64, baseSeed: Long = 7L): String = {
    val flips: Seq[Long] = Seq(0L) ++ (0 until nPlanes).map(p => 1L << p) ++
      (for (p <- 0 until nPlanes; r <- p + 1 until nPlanes) yield (1L << p) | (1L << r))
    s"""WITH pl(tbl, p, s) AS (VALUES ${planeRows(nPlanes, dim, (0 until nTables).map(baseSeed + _))}),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |dots AS (SELECT e.vec_id, pl.tbl, pl.p, ${planeDot(dim)} AS dp FROM e CROSS JOIN pl),
       |bkt AS (SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bkt
       |  FROM dots GROUP BY vec_id, tbl),
       |qb AS (SELECT b.vec_id AS q_id, b.tbl, xor(b.bkt, CAST(f.f AS BIGINT)) AS bkt
       |  FROM bkt b, (SELECT unnest([${flips.mkString(", ")}]) AS f) f WHERE b.vec_id < 8),
       |cand AS (SELECT DISTINCT q.q_id, c.vec_id AS n_id
       |  FROM qb q JOIN bkt c ON c.tbl = q.tbl AND c.bkt = q.bkt WHERE c.vec_id <> q.q_id),
       |sims AS (SELECT cand.q_id, cand.n_id, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ne ON ne.vec_id = cand.n_id),
       |ranked AS (SELECT q_id, n_id, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank FROM sims)
       |SELECT q_id, n_id, rank, round(sim, 6) AS sim
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** ss4: SRP-LSH near-dup pairs, Hamming-1 multi-probe on ONE side
    * (nPlanes=8, nTables=8, seeds 11..18, cosine >= threshold).
    */
  def ss4Sql(threshold: Double, nPlanes: Int = 8, nTables: Int = 8,
             dim: Int = 64, baseSeed: Long = 11L): String = {
    val flips: Seq[Long] = Seq(0L) ++ (0 until nPlanes).map(p => 1L << p)
    s"""WITH pl(tbl, p, s) AS (VALUES ${planeRows(nPlanes, dim, (0 until nTables).map(baseSeed + _))}),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |dots AS (SELECT e.vec_id, pl.tbl, pl.p, ${planeDot(dim)} AS dp FROM e CROSS JOIN pl),
       |bkt AS (SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bkt
       |  FROM dots GROUP BY vec_id, tbl),
       |pa AS (SELECT b.vec_id AS id, b.tbl, xor(b.bkt, CAST(f.f AS BIGINT)) AS bkt
       |  FROM bkt b, (SELECT unnest([${flips.mkString(", ")}]) AS f) f),
       |cand AS (SELECT DISTINCT a.id AS id1, c.vec_id AS id2
       |  FROM pa a JOIN bkt c ON c.tbl = a.tbl AND c.bkt = a.bkt AND a.id < c.vec_id),
       |sims AS (SELECT cand.id1, cand.id2, ${cosSql(dim, "ae", "be")} AS cos_sim
       |  FROM cand JOIN e ae ON ae.vec_id = cand.id1 JOIN e be ON be.vec_id = cand.id2)
       |SELECT id1, id2, round(cos_sim, 6) AS cos_sim
       |FROM sims WHERE cos_sim >= $threshold ORDER BY id1, id2""".stripMargin
  }

  /** bx2: margin-based bitext mining over SRP-LSH candidate pairs —
    * the scale-path twin of bx1's brute-force leg. Buckets mirror
    * [[Similarity.lshCandidatePairs]] (same planeSigns literals,
    * Hamming-1 probe on the SOURCE side only), and the margin /
    * mutual-best machinery is bx1's verbatim, restricted to the
    * candidate set — so the oracle recomputes the identical candidate
    * universe and the identical ordered-fold avgK arithmetic.
    */
  def bx2Sql(k: Int = 4, marginThreshold: Double = 1.05,
             nPlanes: Int = 8, nTables: Int = 8,
             dim: Int = 64, baseSeed: Long = 11L): String = {
    val flips: Seq[Long] = Seq(0L) ++ (0 until nPlanes).map(p => 1L << p)
    s"""WITH pl(tbl, p, s) AS (VALUES ${planeRows(nPlanes, dim, (0 until nTables).map(baseSeed + _))}),
       |e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |dots AS (SELECT e.vec_id, pl.tbl, pl.p, ${planeDot(dim)} AS dp FROM e CROSS JOIN pl),
       |bkt AS (SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bkt
       |  FROM dots GROUP BY vec_id, tbl),
       |sb AS (SELECT b.vec_id AS s_id, b.tbl, xor(b.bkt, CAST(f.f AS BIGINT)) AS bkt
       |  FROM bkt b JOIN e ON e.vec_id = b.vec_id,
       |       (SELECT unnest([${flips.mkString(", ")}]) AS f) f
       |  WHERE e.label % 2 = 0),
       |tb AS (SELECT b.vec_id AS t_id, b.tbl, b.bkt
       |  FROM bkt b JOIN e ON e.vec_id = b.vec_id WHERE e.label % 2 = 1),
       |cand AS (SELECT DISTINCT sb.s_id, tb.t_id
       |  FROM sb JOIN tb ON tb.tbl = sb.tbl AND tb.bkt = sb.bkt),
       |sc AS (SELECT cand.s_id, cand.t_id, ${cosSql(dim, "se", "te")} AS cos_sim
       |  FROM cand JOIN e se ON se.vec_id = cand.s_id JOIN e te ON te.vec_id = cand.t_id),
       |rs AS (SELECT *, row_number() OVER (PARTITION BY s_id ORDER BY cos_sim DESC, t_id ASC) AS r FROM sc),
       |rt AS (SELECT *, row_number() OVER (PARTITION BY t_id ORDER BY cos_sim DESC, s_id ASC) AS r FROM sc),
       |avs AS (SELECT s_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(cos_sim ORDER BY cos_sim DESC, t_id ASC)), (a, x) -> a + x)
       |    / count(*) AS avg_s
       |  FROM rs WHERE r <= $k GROUP BY s_id),
       |avt AS (SELECT t_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(cos_sim ORDER BY cos_sim DESC, s_id ASC)), (a, x) -> a + x)
       |    / count(*) AS avg_t
       |  FROM rt WHERE r <= $k GROUP BY t_id),
       |m AS (SELECT sc.s_id, sc.t_id, cos_sim,
       |    cos_sim / ((avg_s + avg_t) / 2.0) AS margin
       |  FROM sc JOIN avs ON sc.s_id = avs.s_id JOIN avt ON sc.t_id = avt.t_id),
       |b AS (SELECT *,
       |    row_number() OVER (PARTITION BY s_id ORDER BY margin DESC, t_id ASC) AS bs,
       |    row_number() OVER (PARTITION BY t_id ORDER BY margin DESC, s_id ASC) AS bt
       |  FROM m)
       |SELECT s_id, t_id, round(cos_sim, 6) AS cos_sim, round(margin, 6) AS margin
       |FROM b WHERE bs = 1 AND bt = 1 AND margin > $marginThreshold ORDER BY s_id, t_id""".stripMargin
  }

  /** mmr1: Maximal-Marginal-Relevance greedy re-rank — the m-step
    * selection loop UNROLLED as chained CTEs (the pg1/BPE discipline),
    * one step per CTE appending that step's argmax to the selected
    * list. NOT a single list_reduce with a list accumulator: DuckDB
    * 1.0.0's list_reduce mis-evaluates nested-lambda reduces when more
    * than one row is in the batch (row-at-a-time evaluation matches
    * Spark exactly; batched drifts — found while gating this query),
    * so the oracle avoids the construct entirely. The per-step argmax
    * is a list_sort on (-score, id) structs — same winner as Spark's
    * explicit comparator fold because the score doubles are
    * bit-identical. Candidate top-N uses the ss1 cosine form on raw
    * vectors; relevance/diversity dots are in-order folds over the
    * UNIT-NORMALIZED vectors — the Spark op's exact float sequence.
    */
  def mmr1Sql(topN: Int = 16, m: Int = 6, lambda: Double = 0.7,
              dim: Int = 64, nQueries: Int = 4): String = {
    val lam = java.lang.Double.toString(lambda)
    val oml = java.lang.Double.toString(1.0 - lambda)
    def dotf(a: String, b: String, iv: String, sv: String, vv: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
        s"$iv -> $a[CAST($iv AS INTEGER)] * $b[CAST($iv AS INTEGER)])), ($sv, $vv) -> $sv + $vv)"
    val sumsq = dotf("v", "v", "j2", "t2", "u2")
    val relQC = dotf("q.qvh", "h.vh", "i2", "s2", "v2")
    val maxSim = "CASE WHEN len(sel) = 0 THEN 0.0 ELSE " +
      s"list_max(list_transform(sel, a2 -> ${dotf("a2.vh", "c.vh", "i3", "s3", "v3")})) END"
    val scoredSorted = "list_sort(list_transform(" +
      "list_filter(cands, c -> NOT list_contains(list_transform(sel, a -> a.id), c.id)), " +
      s"c -> struct_pack(nscore := -($lam * c.rel - $oml * ($maxSim)), " +
      "id := c.id, rel := c.rel, vh := c.vh)))"
    val stepCtes = (1 to m).map { i =>
      s"""s$i AS (SELECT q_id, cands,
         |  CASE WHEN len($scoredSorted) = 0 THEN sel
         |    ELSE list_append(sel, struct_pack(
         |      id := $scoredSorted[1].id, vh := $scoredSorted[1].vh,
         |      rel := $scoredSorted[1].rel, score := -($scoredSorted[1].nscore)))
         |  END AS sel
         |  FROM s${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |h AS (SELECT vec_id, list_transform(v, xx -> xx / sqrt($sumsq)) AS vh FROM e),
       |q AS (SELECT vec_id AS q_id, vh AS qvh FROM h WHERE vec_id < $nQueries),
       |sims AS (SELECT q.q_id, e2.vec_id AS n_id, ${cosSql(dim, "qe", "e2")} AS sim
       |  FROM e e2 CROSS JOIN q JOIN e qe ON qe.vec_id = q.q_id WHERE e2.vec_id <> q.q_id),
       |topn AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rk FROM sims)
       |  WHERE rk <= $topN),
       |rels AS (SELECT topn.q_id, topn.n_id, h.vh AS nvh, $relQC AS rel
       |  FROM topn JOIN h ON h.vec_id = topn.n_id JOIN q ON q.q_id = topn.q_id),
       |cl AS (SELECT q_id, list(struct_pack(id := n_id, vh := nvh, rel := rel)
       |    ORDER BY rel DESC, n_id ASC) AS cands FROM rels GROUP BY q_id),
       |s0 AS (SELECT q_id, cands,
       |  CAST([] AS STRUCT(id BIGINT, vh DOUBLE[], rel DOUBLE, score DOUBLE)[]) AS sel
       |  FROM cl),
       |$stepCtes,
       |ex AS (SELECT q_id, unnest(sel) AS el,
       |    CAST(generate_subscripts(sel, 1) AS INTEGER) AS sel_rank FROM s$m)
       |SELECT q_id, sel_rank, el.id AS n_id,
       |  round(el.rel, 6) AS rel, round(el.score, 6) AS mmr_score
       |FROM ex ORDER BY q_id, sel_rank""".stripMargin
  }

  /** dd13: SemDeDup over the FIXED deterministic centroids — cell
    * assignment via the same in-order list_reduce fold as VectorDot
    * (ties to the higher cid, matching array_max on (c_sim, c_id)),
    * then within-cell cosine pairs and the keep-min-id rule.
    */
  def dd13Sql(threshold: Double, nCentroids: Int = 16, dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cent(cid, cv, cn) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |drops AS (SELECT DISTINCT cb.vec_id AS drop_id
       |  FROM cell ca JOIN cell cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
       |  JOIN e ae ON ae.vec_id = ca.vec_id JOIN e be ON be.vec_id = cb.vec_id
       |  WHERE ${cosSql(dim, "ae", "be")} >= $threshold)
       |SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT drop_id FROM drops)
       |ORDER BY vec_id""".stripMargin
  }

  /** hr1: hybrid retrieval with reciprocal-rank fusion — the BM25 leg
    * restated exactly as bm1's score expression (same literal order),
    * the dense leg as the ss1 cosine, each ranked and capped at
    * `candidateK`, fused as `1/(rrfK+rank)` sums in sparse-then-dense
    * order. k1/b must be exactly-representable binary doubles.
    */
  def hr1Sql(terms: Seq[String], queryVecId: Long, k: Int, candidateK: Int,
             rrfK: Int, k1: Double, b: Double, dim: Int = 64): String = {
    def d(x: Double) = s"CAST($x AS DOUBLE)"
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"    CAST(len(list_filter(string_split(lower(text), ' '), x -> x = '$t')) AS BIGINT) AS tf_$i"
    }.mkString(",\n|")
    val dfCols = terms.indices.map { i =>
      s"    CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i"
    }.mkString(",\n|")
    val avgdl = s"(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val score = terms.indices.map { i =>
      s"""ln((CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + ${d(0.5)})
         |         / (CAST(df_$i AS DOUBLE) + ${d(0.5)}) + ${d(1.0)})
         |      * (CAST(tf_$i AS DOUBLE) * ${d(k1 + 1.0)})
         |      / (CAST(tf_$i AS DOUBLE) + ${d(k1)} * (${d(1.0 - b)}
         |         + ${d(b)} * (CAST(dl AS DOUBLE) / $avgdl)))""".stripMargin
    }.mkString("\n|    + ")
    s"""WITH bb AS (SELECT doc_id,
       |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
       |$tfCols
       |  FROM documents),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |$dfCols
       |  FROM bb),
       |sc AS (SELECT doc_id, $score
       |    AS score
       |  FROM bb, st),
       |sp AS (SELECT doc_id AS id, CAST(rn AS BIGINT) AS rank_sparse
       |  FROM (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
       |        FROM sc WHERE score > 0)
       |  WHERE rn <= $candidateK),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |qv AS (SELECT v FROM e WHERE vec_id = $queryVecId),
       |ds AS (SELECT e.vec_id AS id, ${cosSql(dim, "e", "qv")} AS sim
       |  FROM e CROSS JOIN qv qv WHERE e.vec_id <> $queryVecId),
       |dn AS (SELECT id, CAST(rn AS BIGINT) AS rank_dense
       |  FROM (SELECT id, row_number() OVER (ORDER BY sim DESC, id ASC) AS rn FROM ds)
       |  WHERE rn <= $candidateK),
       |fu AS (SELECT coalesce(sp.id, dn.id) AS doc_id, sp.rank_sparse, dn.rank_dense,
       |    coalesce(${d(1.0)} / (${d(rrfK.toDouble)} + CAST(rank_sparse AS DOUBLE)), ${d(0.0)})
       |    + coalesce(${d(1.0)} / (${d(rrfK.toDouble)} + CAST(rank_dense AS DOUBLE)), ${d(0.0)}) AS rrf_score
       |  FROM sp FULL OUTER JOIN dn ON sp.id = dn.id)
       |SELECT doc_id, rank, rank_sparse, rank_dense, round(rrf_score, 6) AS rrf
       |FROM (SELECT doc_id, rank_sparse, rank_dense, rrf_score,
       |    CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) AS rank
       |  FROM fu)
       |WHERE rank <= $k ORDER BY rank""".stripMargin
  }

  /** ann1: full recall oracle for the approximate ANN paths — the
    * exact top-k / near-dup truths AND all three approximate
    * constructions (ss3 SRP-LSH top-k, ss4 SRP-LSH pairs, ss5 IVF
    * top-k) rebuilt from the same serialized plane/centroid literals
    * the engine uses, so the recall fractions themselves carry the
    * cross-engine hash. Upgrades ann1 from rows-only to fully
    * value-checked (the dd3p precedent applied to ANN).
    */
  def ann1Sql(k: Int = 5, pairThreshold: Double = 0.4, bound: Int = 600,
              dim: Int = 64): String = {
    val flips3: Seq[Long] = Seq(0L) ++ (0 until 12).map(p => 1L << p) ++
      (for (p <- 0 until 12; r <- p + 1 until 12) yield (1L << p) | (1L << r))
    val flips4: Seq[Long] = Seq(0L) ++ (0 until 8).map(p => 1L << p)
    val cents = Similarity.fixedCentroids(16, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |tp AS (SELECT qe.vec_id AS q_id, ne.vec_id AS n_id, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM e qe CROSS JOIN e ne WHERE qe.vec_id < 8 AND ne.vec_id <> qe.vec_id),
       |tk AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rn FROM tp)
       |  WHERE rn <= $k),
       |pl3(tbl, p, s) AS (VALUES ${planeRows(12, dim, (0 until 8).map(7L + _))}),
       |d3 AS (SELECT e.vec_id, pl.tbl, pl.p, ${planeDot(dim)} AS dp FROM e CROSS JOIN pl3 pl),
       |b3 AS (SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bkt
       |  FROM d3 GROUP BY vec_id, tbl),
       |qb3 AS (SELECT b.vec_id AS q_id, b.tbl, xor(b.bkt, CAST(f.f AS BIGINT)) AS bkt
       |  FROM b3 b, (SELECT unnest([${flips3.mkString(", ")}]) AS f) f WHERE b.vec_id < 8),
       |c3 AS (SELECT DISTINCT q.q_id, c.vec_id AS n_id
       |  FROM qb3 q JOIN b3 c ON c.tbl = q.tbl AND c.bkt = q.bkt WHERE c.vec_id <> q.q_id),
       |s3 AS (SELECT c3.q_id, c3.n_id, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM c3 JOIN e qe ON qe.vec_id = c3.q_id JOIN e ne ON ne.vec_id = c3.n_id),
       |a3 AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rn FROM s3)
       |  WHERE rn <= $k),
       |cent(cid, cv, cn) AS (VALUES $cents),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |probe AS (SELECT vec_id AS q_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn
       |    FROM cs WHERE vec_id < 8)
       |  WHERE rn <= 6),
       |c5 AS (SELECT DISTINCT p.q_id, c.vec_id AS n_id
       |  FROM probe p JOIN cell c ON c.cell = p.cell WHERE c.vec_id <> p.q_id),
       |s5 AS (SELECT c5.q_id, c5.n_id, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM c5 JOIN e qe ON qe.vec_id = c5.q_id JOIN e ne ON ne.vec_id = c5.n_id),
       |a5 AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rn FROM s5)
       |  WHERE rn <= $k),
       |pt AS (SELECT ae.vec_id AS q_id, be.vec_id AS n_id
       |  FROM e ae JOIN e be ON ae.vec_id < be.vec_id
       |  WHERE ae.vec_id < $bound AND be.vec_id < $bound
       |    AND ${cosSql(dim, "ae", "be")} >= $pairThreshold),
       |pl4(tbl, p, s) AS (VALUES ${planeRows(8, dim, (0 until 8).map(11L + _))}),
       |d4 AS (SELECT e.vec_id, pl.tbl, pl.p, ${planeDot(dim)} AS dp
       |  FROM e CROSS JOIN pl4 pl WHERE e.vec_id < $bound),
       |b4 AS (SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bkt
       |  FROM d4 GROUP BY vec_id, tbl),
       |pa4 AS (SELECT b.vec_id AS id, b.tbl, xor(b.bkt, CAST(f.f AS BIGINT)) AS bkt
       |  FROM b4 b, (SELECT unnest([${flips4.mkString(", ")}]) AS f) f),
       |c4 AS (SELECT DISTINCT a.id AS q_id, c.vec_id AS n_id
       |  FROM pa4 a JOIN b4 c ON c.tbl = a.tbl AND c.bkt = a.bkt AND a.id < c.vec_id),
       |a4 AS (SELECT c4.q_id, c4.n_id
       |  FROM c4 JOIN e ae ON ae.vec_id = c4.q_id JOIN e be ON be.vec_id = c4.n_id
       |  WHERE ${cosSql(dim, "ae", "be")} >= $pairThreshold),
       |u AS (
       |  SELECT 'ss3_lsh_topk' AS method,
       |    CAST((SELECT count(*) FROM tk JOIN a3 USING (q_id, n_id)) AS BIGINT) AS n_hits,
       |    CAST((SELECT count(*) FROM tk) AS BIGINT) AS n_truth
       |  UNION ALL
       |  SELECT 'ss4_lsh_neardup',
       |    CAST((SELECT count(*) FROM pt JOIN a4 USING (q_id, n_id)) AS BIGINT),
       |    CAST((SELECT count(*) FROM pt) AS BIGINT)
       |  UNION ALL
       |  SELECT 'ss5_ivf_topk',
       |    CAST((SELECT count(*) FROM tk JOIN a5 USING (q_id, n_id)) AS BIGINT),
       |    CAST((SELECT count(*) FROM tk) AS BIGINT))
       |SELECT method, n_hits, n_truth,
       |  round(CAST(n_hits AS DOUBLE) / greatest(CAST(n_truth AS DOUBLE), 1.0), 6) AS recall
       |FROM u ORDER BY method""".stripMargin
  }

  /** The MaxSim late-interaction score between e-aliased rows `$qa`
    * and `$na` (each carrying `v` = double vector and `norms` = the
    * per-part token norms) — the SAME fixed-order fold as
    * [[graft.ops.Similarity.maxSimTopK]]'s score expression, zero-norm
    * guard included.
    */
  private def maxSimSql(parts: Int, sub: Int, qa: String, na: String): String = {
    def dotSub(a: String, aOff: String, b: String, bOff: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(1, ${sub + 1}), t -> " +
        s"$a.v[CAST($aOff * $sub + t AS INTEGER)] * $b.v[CAST($bOff * $sub + t AS INTEGER)])), " +
        "(a2, x2) -> a2 + x2)"
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(0, $parts), i ->
       |        list_max(list_transform(range(0, $parts), j ->
       |          CASE WHEN $qa.norms[CAST(i + 1 AS INTEGER)]
       |              * $na.norms[CAST(j + 1 AS INTEGER)] = CAST(0.0 AS DOUBLE)
       |          THEN CAST(0.0 AS DOUBLE)
       |          ELSE ${dotSub(qa, "i", na, "j")}
       |          / ($qa.norms[CAST(i + 1 AS INTEGER)]
       |           * $na.norms[CAST(j + 1 AS INTEGER)]) END)))),
       |      (acc, x) -> acc + x)""".stripMargin
  }

  /** ci2: LSH-prefiltered MaxSim — the ColBERT serving composition.
    * ss3Sql's SRP candidate CTEs (serialized hyperplane literals,
    * Hamming≤2 query-side multi-probe) feed the ci1 MaxSim fold as the
    * scorer; each emitted row carries `in_exact_topk`, its membership
    * in the full-scan exact MaxSim top-k (the ann1 recall discipline,
    * row-level so the gate hash pins it).
    */
  def ci2Sql(k: Int = 5, parts: Int = 4, nPlanes: Int = 12,
             nTables: Int = 8, dim: Int = 64, baseSeed: Long = 7L): String = {
    val sub = dim / parts
    val flips: Seq[Long] = Seq(0L) ++ (0 until nPlanes).map(p => 1L << p) ++
      (for (p <- 0 until nPlanes; r <- p + 1 until nPlanes) yield (1L << p) | (1L << r))
    s"""WITH pl(tbl, p, s) AS (VALUES ${planeRows(nPlanes, dim, (0 until nTables).map(baseSeed + _))}),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |en AS MATERIALIZED (SELECT vec_id, v,
       |    list_transform(range(0, $parts), nn ->
       |      sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(range(1, ${sub + 1}), t4 ->
       |          v[CAST(nn * $sub + t4 AS INTEGER)]
       |            * v[CAST(nn * $sub + t4 AS INTEGER)])),
       |        (a5, x5) -> a5 + x5))) AS norms
       |  FROM e),
       |dots AS (SELECT e.vec_id, pl.tbl, pl.p, ${planeDot(dim)} AS dp FROM e CROSS JOIN pl),
       |bkt AS (SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bkt
       |  FROM dots GROUP BY vec_id, tbl),
       |qb AS (SELECT b.vec_id AS q_id, b.tbl, xor(b.bkt, CAST(f.f AS BIGINT)) AS bkt
       |  FROM bkt b, (SELECT unnest([${flips.mkString(", ")}]) AS f) f WHERE b.vec_id < 8),
       |cand AS (SELECT DISTINCT q.q_id, c.vec_id AS n_id
       |  FROM qb q JOIN bkt c ON c.tbl = q.tbl AND c.bkt = q.bkt WHERE c.vec_id <> q.q_id),
       |pairs AS (SELECT cand.q_id, cand.n_id,
       |    ${maxSimSql(parts, sub, "qe", "ne")} AS sim
       |  FROM cand JOIN en qe ON qe.vec_id = cand.q_id
       |  JOIN en ne ON ne.vec_id = cand.n_id),
       |approx AS (SELECT q_id, n_id, sim, rank FROM (SELECT q_id, n_id, sim,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank FROM pairs)
       |  WHERE rank <= $k),
       |tpairs AS (SELECT qe.vec_id AS q_id, ne.vec_id AS n_id,
       |    ${maxSimSql(parts, sub, "qe", "ne")} AS sim
       |  FROM en qe CROSS JOIN en ne
       |  WHERE qe.vec_id < 8 AND ne.vec_id <> qe.vec_id),
       |truth AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, n_id ASC) AS rn FROM tpairs)
       |  WHERE rn <= $k)
       |SELECT a.q_id, a.n_id, a.rank,
       |  CAST(floor(a.sim * 1e6 + 0.5) AS BIGINT) AS maxsim_micro,
       |  EXISTS (SELECT 1 FROM truth t
       |    WHERE t.q_id = a.q_id AND t.n_id = a.n_id) AS in_exact_topk
       |FROM approx a ORDER BY q_id, rank""".stripMargin
  }

  /** dd14: quality-aware canonical selection over SemDeDup's
    * CELL-CONFINED pair graph (the tractable pair source —
    * [[graft.ops.Similarity.semanticDedupPairs]] with the fixed
    * deterministic centroids), closed with a recursive CTE and ranked
    * by the tx2 quality score with the lower-id tiebreak. The exact
    * all-pairs composition stays available as dd7's disclosed baseline.
    */
  def dd14Sql(threshold: Double, bound: Int, nCentroids: Int = 16,
              dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH RECURSIVE cent(cid, cv, cn) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id < $bound),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |pairs AS (SELECT ca.vec_id AS id1, cb.vec_id AS id2
       |  FROM cell ca JOIN cell cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
       |  JOIN e ae ON ae.vec_id = ca.vec_id JOIN e be ON be.vec_id = cb.vec_id
       |  WHERE ${cosSql(dim, "ae", "be")} >= $threshold),
       |edges AS (SELECT CAST(id1 AS BIGINT) AS src, CAST(id2 AS BIGINT) AS dst FROM pairs
       |          UNION ALL
       |          SELECT CAST(id2 AS BIGINT), CAST(id1 AS BIGINT) FROM pairs),
       |reach(v, r) AS (
       |  SELECT CAST(vec_id AS BIGINT), CAST(vec_id AS BIGINT) FROM e
       |  UNION
       |  SELECT edges.dst, reach.r FROM reach JOIN edges ON edges.src = reach.v),
       |cl AS (SELECT v, min(r) AS cluster FROM reach GROUP BY v),
       |q AS (SELECT doc_id,
       |    least(1.0,
       |      CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
       |        / CAST(length(text) AS DOUBLE) * 0.5
       |      + CAST(len(list_filter(string_split(text, ' '),
       |          x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE)
       |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
       |      + least(CAST(list_sum(list_transform(string_split(text, ' '),
       |          x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
       |          / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.2) AS qs
       |  FROM documents WHERE doc_id < $bound),
       |j AS (SELECT cl.v AS doc_id, cl.cluster, q.qs,
       |    row_number() OVER (PARTITION BY cl.cluster
       |      ORDER BY q.qs DESC, cl.v ASC) AS rn
       |  FROM cl JOIN q ON q.doc_id = cl.v)
       |SELECT doc_id, cluster, round(qs, 6) AS q, rn = 1 AS is_canonical
       |FROM j ORDER BY doc_id""".stripMargin
  }

  /** ul1: unigram-LM Viterbi segmentation ([[graft.ops.Bpe.unigramSegment]])
    * mirrored round for round: same count-seeded micro costs (one ln of
    * an exact integer ratio per vocab piece), same packed-BIGINT match
    * encoding, same `maxWordLen` unrolled DP rounds as MATERIALIZED
    * CTEs (each round references its predecessor's dp array many
    * times). All decisions are single-long mins — no float enters the
    * argmin.
    */
  /** Pricing CTE pair: `<name>` from `<srcName>(piece, pcnt)` with the
    * micro-quantized −ln cost packed with the +1 tiebreak digit.
    */
  private def unigramPriceCtes(name: String, srcName: String): String =
    s""",
       |${name}_tot AS (SELECT CAST(sum(pcnt) AS BIGINT) AS tot FROM $srcName),
       |$name AS MATERIALIZED (SELECT piece,
       |    CAST(floor((0.0 - ln(CAST(pcnt AS DOUBLE) / CAST(tot AS DOUBLE))) * 1e6 + 0.5)
       |      AS BIGINT) * 1024 + 1 AS punits
       |  FROM $srcName, ${name}_tot)""".stripMargin

  /** Match-pack + DP chain CTEs under prices `pricedName`: emits
    * `<prefix>mt`, `<prefix>0` … `<prefix>maxWordLen` (w, cnt, len,
    * marr, dp).
    */
  private def unigramDpCtes(prefix: String, pricedName: String,
                            maxPieceLen: Int, maxWordLen: Int): String = {
    val base = s""",
       |${prefix}mt AS MATERIALIZED (SELECT t.w,
       |    (a.i - 1) * 4503599627370496 + (a.i + b.l - 1) * 70368744177664 + p.punits AS menc
       |  FROM w t, unnest(generate_series(1, t.len)) AS a(i),
       |       unnest(generate_series(1, $maxPieceLen)) AS b(l), $pricedName p
       |  WHERE a.i + b.l - 1 <= t.len
       |    AND p.piece = substr(t.w, CAST(a.i AS INTEGER), CAST(b.l AS INTEGER))),
       |${prefix}0 AS MATERIALIZED (SELECT t.w, t.cnt, t.len, ma.marr,
       |    list_transform(generate_series(0, t.len),
       |      p -> CASE WHEN p = 0 THEN CAST(0 AS BIGINT)
       |           ELSE CAST(1000000000000000 AS BIGINT) END) AS dp
       |  FROM w t JOIN (SELECT w, list_sort(list(menc)) AS marr
       |                 FROM ${prefix}mt GROUP BY w) ma ON ma.w = t.w)""".stripMargin
    val rounds = (1 to maxWordLen).map { k =>
      s""",
         |$prefix$k AS MATERIALIZED (SELECT w, cnt, len, marr,
         |  list_transform(generate_series(0, len),
         |    en -> CASE WHEN en = 0 THEN CAST(0 AS BIGINT) ELSE
         |      list_reduce(list_prepend(dp[en + 1],
         |          list_filter(marr, mm -> ((mm // 70368744177664) % 64) = en)),
         |        (acc, mm) -> least(acc,
         |          dp[(mm // 4503599627370496) + 1] + (mm % 70368744177664)))
         |    END) AS dp
         |  FROM $prefix${k - 1})""".stripMargin
    }.mkString
    base + rounds
  }

  /** Words + count-seeded vocabulary + v0 prices + v0 DP chain —
    * shared by ul1Sql and ul2Sql.
    */
  private def unigramBase(vocabSize: Int, maxPieceLen: Int,
                          maxWordLen: Int): String =
    s"""WITH w AS MATERIALIZED (
       |  SELECT w, cnt, CAST(length(w) AS BIGINT) AS len FROM (
       |    SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
       |    FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
       |    WHERE len(tok) > 0 GROUP BY tok)
       |  WHERE length(w) <= $maxWordLen),
       |subs AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS pcnt FROM (
       |    SELECT substr(t.w, CAST(a.i AS INTEGER), CAST(b.l AS INTEGER)) AS piece, t.cnt
       |    FROM w t, unnest(generate_series(1, t.len)) AS a(i),
       |         unnest(generate_series(1, $maxPieceLen)) AS b(l)
       |    WHERE a.i + b.l - 1 <= t.len)
       |  GROUP BY 1),
       |top AS (SELECT piece, pcnt FROM subs ORDER BY pcnt DESC, piece LIMIT $vocabSize),
       |vocab AS MATERIALIZED (SELECT DISTINCT piece, pcnt FROM (
       |  SELECT * FROM top UNION ALL
       |  SELECT piece, pcnt FROM subs WHERE length(piece) = 1))""".stripMargin +
      unigramPriceCtes("priced", "vocab") +
      unigramDpCtes("d", "priced", maxPieceLen, maxWordLen)

  def ul1Sql(vocabSize: Int = 256, maxPieceLen: Int = 4,
             maxWordLen: Int = 16): String =
    unigramBase(vocabSize, maxPieceLen, maxWordLen) +
      s"""
         |SELECT w, cnt, len AS n_chars,
         |  dp[len + 1] // 1024 AS cost_micro,
         |  dp[len + 1] % 1024 AS n_pieces
         |FROM d$maxWordLen ORDER BY w""".stripMargin

  /** ul2: one hard-EM round ([[graft.ops.Bpe.unigramEmRound]]) — the
    * v0 DP chain, an unrolled BACKTRACE (per step the argmin
    * predecessor is the MIN packed match proving dp[pos]; the reduce
    * is seeded with a sentinel so the pos=0 fixed-point rows never
    * evaluate an empty fold), word-count-weighted piece usage, add-1
    * re-pricing of the same vocabulary, and the v1 DP chain — all as
    * chained MATERIALIZED CTEs.
    */
  /** Shared hard-EM prefix SQL: v0 chain + unrolled backtrace + usage
    * CTE (`us`). */
  private def unigramEmPrefixSql(vocabSize: Int, maxPieceLen: Int,
                                 maxWordLen: Int): String = {
    val chosen =
      """list_reduce(list_prepend(CAST(4611686018427387904 AS BIGINT),
        |      list_filter(marr, mm -> ((mm // 70368744177664) % 64) = pos AND
        |        dp[(mm // 4503599627370496) + 1] + (mm % 70368744177664) = dp[pos + 1])),
        |      (a, b) -> least(a, b))""".stripMargin
    val bt0 = s""",
       |bt0 AS MATERIALIZED (SELECT w, marr, dp, len AS pos,
       |    CAST([] AS BIGINT[]) AS picks
       |  FROM d$maxWordLen)""".stripMargin
    val btRounds = (1 to maxWordLen).map { k =>
      s""",
         |bt$k AS MATERIALIZED (SELECT w, marr, dp,
         |  CASE WHEN pos = 0 THEN pos ELSE ($chosen) // 4503599627370496 END AS pos,
         |  CASE WHEN pos = 0 THEN picks ELSE list_append(picks, $chosen) END AS picks
         |  FROM bt${k - 1})""".stripMargin
    }.mkString
    val us = s""",
       |us AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS use_cnt FROM (
       |    SELECT substr(t.w, CAST(p.mm // 4503599627370496 AS INTEGER) + 1,
       |        CAST((p.mm // 70368744177664) % 64 AS INTEGER)
       |          - CAST(p.mm // 4503599627370496 AS INTEGER)) AS piece, t.cnt
       |    FROM (SELECT b.w, unnest(b.picks) AS mm FROM bt$maxWordLen b) p
       |    JOIN w t ON t.w = p.w)
       |  GROUP BY 1)""".stripMargin
    unigramBase(vocabSize, maxPieceLen, maxWordLen) + bt0 + btRounds + us
  }

  def ul2Sql(vocabSize: Int = 256, maxPieceLen: Int = 4,
             maxWordLen: Int = 16): String =
    unigramEmPrefixSql(vocabSize, maxPieceLen, maxWordLen) +
      s""",
         |used AS MATERIALIZED (SELECT v.piece,
         |    coalesce(us.use_cnt, 0) + 1 AS pcnt
         |  FROM vocab v LEFT JOIN us ON us.piece = v.piece)""".stripMargin +
      unigramPriceCtes("priced1", "used") +
      unigramDpCtes("e", "priced1", maxPieceLen, maxWordLen) +
      s"""
         |SELECT d.w, d.cnt, d.len AS n_chars,
         |  d.dp[d.len + 1] // 1024 AS cost0_micro,
         |  d.dp[d.len + 1] % 1024 AS pieces0,
         |  e.dp[e.len + 1] // 1024 AS cost1_micro,
         |  e.dp[e.len + 1] % 1024 AS pieces1
         |FROM d$maxWordLen d JOIN e$maxWordLen e ON e.w = d.w
         |ORDER BY d.w""".stripMargin

  /** ul3: the vocabulary PRUNE round — unused multi-char pieces drop,
    * singles stay, survivors re-price on add-1 usage, corpus
    * re-segments; one summary row of vocab/cost/fertility
    * before/after.
    */
  def ul3Sql(vocabSize: Int = 256, maxPieceLen: Int = 4,
             maxWordLen: Int = 16): String =
    unigramEmPrefixSql(vocabSize, maxPieceLen, maxWordLen) +
      s""",
         |kept AS MATERIALIZED (SELECT v.piece,
         |    coalesce(us.use_cnt, 0) + 1 AS pcnt
         |  FROM vocab v LEFT JOIN us ON us.piece = v.piece
         |  WHERE coalesce(us.use_cnt, 0) > 0 OR length(v.piece) = 1)"""
        .stripMargin +
      unigramPriceCtes("priced1", "kept") +
      unigramDpCtes("e", "priced1", maxPieceLen, maxWordLen) +
      s"""
         |SELECT vb.vocab_before, va.vocab_after,
         |  vb.vocab_before - va.vocab_after AS n_pruned,
         |  tb.occ_before AS n_occurrences,
         |  (tb.cost_before * 1000) // tb.occ_before AS cost_per_occ_nano,
         |  (ta.cost_after * 1000) // ta.occ_after AS cost_per_occ_nano_after,
         |  (tb.pieces_before * 1000000) // tb.occ_before AS fertility_micro,
         |  (ta.pieces_after * 1000000) // ta.occ_after AS fertility_micro_after
         |FROM (SELECT CAST(count(*) AS BIGINT) AS vocab_before FROM vocab) vb,
         |     (SELECT CAST(count(*) AS BIGINT) AS vocab_after FROM kept) va,
         |     (SELECT CAST(sum(cnt * (dp[len + 1] // 1024)) AS BIGINT) AS cost_before,
         |             CAST(sum(cnt * (dp[len + 1] % 1024)) AS BIGINT) AS pieces_before,
         |             CAST(sum(cnt) AS BIGINT) AS occ_before FROM d$maxWordLen) tb,
         |     (SELECT CAST(sum(cnt * (dp[len + 1] // 1024)) AS BIGINT) AS cost_after,
         |             CAST(sum(cnt * (dp[len + 1] % 1024)) AS BIGINT) AS pieces_after,
         |             CAST(sum(cnt) AS BIGINT) AS occ_after FROM e$maxWordLen) ta"""
        .stripMargin

  /** sp4: the leakage-safe cluster split (sp2's law) fed by the BANDED
    * pair source — SemDeDup's cell-confined candidate generator over
    * the fixed deterministic centroids (dd14's gate-checked machinery)
    * instead of sp2's exact O(n²) baseline. Same recursive closure,
    * same md5 cluster coin; this is the composition that runs at
    * corpus scale.
    */
  def sp4Sql(threshold: Double, bound: Int, nCentroids: Int = 16,
             dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH RECURSIVE cent(cid, cv, cn) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id < $bound),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |pairs AS (SELECT ca.vec_id AS id1, cb.vec_id AS id2
       |  FROM cell ca JOIN cell cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
       |  JOIN e ae ON ae.vec_id = ca.vec_id JOIN e be ON be.vec_id = cb.vec_id
       |  WHERE ${cosSql(dim, "ae", "be")} >= $threshold),
       |edges AS (SELECT CAST(id1 AS BIGINT) AS src, CAST(id2 AS BIGINT) AS dst FROM pairs
       |          UNION ALL
       |          SELECT CAST(id2 AS BIGINT), CAST(id1 AS BIGINT) FROM pairs),
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
       |ORDER BY v""".stripMargin
  }

  /** ss5: IVF top-k over the FIXED deterministic centroids
    * ([[Similarity.fixedCentroids]]), nProbe cells per query. Doubles
    * are serialized via Double.toString (shortest round-trip form), so
    * the SQL literal parses back to the identical IEEE value.
    */
  def ss5Sql(k: Int = 5, nCentroids: Int = 16, nProbe: Int = 6,
             dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cent(cid, cv, cn) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |probe AS (SELECT vec_id AS q_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn
       |    FROM cs WHERE vec_id < 8)
       |  WHERE rn <= $nProbe),
       |cand AS (SELECT DISTINCT p.q_id, c.vec_id AS n_id
       |  FROM probe p JOIN cell c ON c.cell = p.cell WHERE c.vec_id <> p.q_id),
       |sims AS (SELECT cand.q_id, cand.n_id, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ne ON ne.vec_id = cand.n_id),
       |ranked AS (SELECT q_id, n_id, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank FROM sims)
       |SELECT q_id, n_id, rank, round(sim, 6) AS sim
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** ann8: the recall-vs-nprobe tuning sweep — shared cell/probe CTEs
    * (ss5's fixed-centroid machinery), one recall row per probed
    * width against the exact brute-force top-k.
    */
  def ann8Sql(k: Int = 5, probes: Seq[Int] = Seq(1, 2, 4, 8),
              nCentroids: Int = 16, dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    val legs = probes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS nprobe,
         |  CAST(count(*) AS BIGINT) AS n_truth,
         |  CAST(count(h.n_id) AS BIGINT) AS n_hits,
         |  (CAST(count(h.n_id) AS BIGINT) * 1000000)
         |    // CAST(count(*) AS BIGINT) AS recall_micro
         |FROM truth t LEFT JOIN (
         |  SELECT q_id, n_id FROM (
         |    SELECT s.q_id, s.n_id, row_number() OVER (
         |      PARTITION BY s.q_id ORDER BY s.sim DESC, s.n_id ASC) AS rk
         |    FROM sims s JOIN (SELECT DISTINCT p2.q_id AS pq, c.vec_id AS pn
         |      FROM probe p2 JOIN cell c ON c.cell = p2.cell
         |      WHERE p2.rn <= $p AND c.vec_id <> p2.q_id) cd
         |      ON cd.pq = s.q_id AND cd.pn = s.n_id)
         |  WHERE rk <= $k) h
         |  ON h.q_id = t.q_id AND h.n_id = t.n_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH cent(cid, cv, cn) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS MATERIALIZED (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |probe AS MATERIALIZED (SELECT vec_id AS q_id, cid AS cell, rn FROM (
       |    SELECT vec_id, cid, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn
       |    FROM cs WHERE vec_id < 8)
       |  WHERE rn <= ${probes.max}),
       |sims AS MATERIALIZED (SELECT qe.vec_id AS q_id, ne.vec_id AS n_id,
       |    ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM e qe CROSS JOIN e ne
       |  WHERE qe.vec_id < 8 AND ne.vec_id <> qe.vec_id),
       |truth AS MATERIALIZED (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rk FROM sims)
       |  WHERE rk <= $k)
       |SELECT * FROM ($legs) ORDER BY nprobe""".stripMargin
  }

  /** hn1: hard-negative mining for contrastive training — ss5's IVF
    * top-k widened to `k`, then banded to sim ∈ [lo, hi) (similar
    * enough to be informative, far enough to not be a positive) and
    * re-ranked to the `keep` hardest per query. Band membership tests
    * the UNROUNDED sim — both engines compute the identical double, so
    * the boundary cannot disagree.
    */
  def hn1Sql(k: Int = 20, lo: Double = 0.2, hi: Double = 0.8,
             keep: Int = 3, nCentroids: Int = 16, nProbe: Int = 6,
             dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cent(cid, cv, cn) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |probe AS (SELECT vec_id AS q_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn
       |    FROM cs WHERE vec_id < 8)
       |  WHERE rn <= $nProbe),
       |cand AS (SELECT DISTINCT p.q_id, c.vec_id AS n_id
       |  FROM probe p JOIN cell c ON c.cell = p.cell WHERE c.vec_id <> p.q_id),
       |sims AS (SELECT cand.q_id, cand.n_id, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ne ON ne.vec_id = cand.n_id),
       |ranked AS (SELECT q_id, n_id, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rank FROM sims),
       |band AS (SELECT q_id, n_id, sim FROM ranked
       |  WHERE rank <= $k AND sim >= $lo AND sim < $hi),
       |nr AS (SELECT q_id, n_id, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS neg_rank FROM band)
       |SELECT q_id, neg_rank, n_id, round(sim, 6) AS sim
       |FROM nr WHERE neg_rank <= $keep ORDER BY q_id, neg_rank""".stripMargin
  }

  /** kg1: mutual-kNN clusters — ss5's fixed-centroid IVF top-k with
    * EVERY vector as a query, kept only where both directions appear in
    * each other's top-k (the mutual filter that prunes hub vectors),
    * then dd7's recursive min-reach connected components over the
    * mutual edges.
    */
  /** The shared all-queries IVF-kNN CTE chain (cent…knn) used by kg1,
    * gr3 and ann4 — identical construction rules to [[ss5Sql]].
    */
  private def ivfKnnCte(k: Int, nCentroids: Int, nProbe: Int,
                        dim: Int): String = {
    val rows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""cent(cid, cv, cn) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |cell AS (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |probe AS (SELECT vec_id AS q_id, cid AS cell FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn <= $nProbe),
       |cand AS (SELECT DISTINCT p.q_id, c.vec_id AS n_id
       |  FROM probe p JOIN cell c ON c.cell = p.cell WHERE c.vec_id <> p.q_id),
       |sims AS (SELECT cand.q_id, cand.n_id, ${cosSql(dim, "qe", "ne")} AS sim
       |  FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ne ON ne.vec_id = cand.n_id),
       |knn AS (SELECT q_id, n_id FROM (SELECT q_id, n_id, row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank FROM sims)
       |  WHERE rank <= $k)""".stripMargin
  }

  /** The mutual-edge + min-reach connected-components continuation of
    * [[ivfKnnCte]] (needs WITH RECURSIVE at the head).
    */
  private val mutualCcCte: String =
    s"""mut AS (SELECT a.q_id AS d1, a.n_id AS d2 FROM knn a
       |  JOIN knn b ON b.q_id = a.n_id AND b.n_id = a.q_id WHERE a.q_id < a.n_id),
       |edges AS (SELECT CAST(d1 AS BIGINT) AS src, CAST(d2 AS BIGINT) AS dst FROM mut
       |          UNION ALL SELECT CAST(d2 AS BIGINT), CAST(d1 AS BIGINT) FROM mut),
       |reach(v, r) AS (
       |  SELECT CAST(vec_id AS BIGINT), CAST(vec_id AS BIGINT) FROM e
       |  UNION
       |  SELECT edges.dst, reach.r FROM reach JOIN edges ON edges.src = reach.v),
       |cl AS (SELECT v, min(r) AS cluster FROM reach GROUP BY v)""".stripMargin

  def kg1Sql(k: Int = 5, nCentroids: Int = 16, nProbe: Int = 6,
             dim: Int = 64): String =
    s"""WITH RECURSIVE ${ivfKnnCte(k, nCentroids, nProbe, dim)},
       |$mutualCcCte,
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS csize FROM cl GROUP BY cluster)
       |SELECT cl.v, cl.cluster, sz.csize
       |FROM cl JOIN sz USING (cluster) ORDER BY v""".stripMargin

  /** fnr1: in-batch false-negative rate of the kg1 near-dup partition —
    * collision probability Σ n_c(n_c−1)/(N(N−1)) and the expected
    * false negatives in a contrastive batch, off the same cluster
    * table as kg1Sql.
    */
  def fnr1Sql(batch: Int = 1024, k: Int = 5, nCentroids: Int = 16,
              nProbe: Int = 6, dim: Int = 64): String =
    s"""WITH RECURSIVE ${ivfKnnCte(k, nCentroids, nProbe, dim)},
       |$mutualCcCte,
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS c FROM cl GROUP BY 1),
       |m AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_clusters,
       |    CAST(sum(c * (c - 1)) AS BIGINT) AS dp2 FROM sz)
       |SELECT n AS n_vectors, n_clusters, dp2 // 2 AS n_dup_pairs,
       |  round(CAST(dp2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 9) AS p_collision,
       |  round(${batch - 1}.0 * (CAST(dp2 AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6) AS exp_fn_batch$batch
       |FROM m""".stripMargin

  /** gr3: Newman modularity of the kg1 partition over the mutual-kNN
    * graph — per-cluster internal-edge and degree sums as exact
    * integers, Q assembled in fixed-order double arithmetic.
    */
  def gr3Sql(k: Int = 5, nCentroids: Int = 16, nProbe: Int = 6,
             dim: Int = 64): String =
    s"""WITH RECURSIVE ${ivfKnnCte(k, nCentroids, nProbe, dim)},
       |$mutualCcCte,
       |mtot AS (SELECT CAST(count(*) AS BIGINT) AS m FROM mut),
       |deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
       |ein AS (SELECT ca.cluster, CAST(count(*) AS BIGINT) AS ec
       |  FROM mut JOIN cl ca ON ca.v = mut.d1 JOIN cl cb ON cb.v = mut.d2
       |  WHERE ca.cluster = cb.cluster GROUP BY 1),
       |dsum AS (SELECT cl.cluster, CAST(sum(COALESCE(deg.d, 0)) AS BIGINT) AS dc
       |  FROM cl LEFT JOIN deg ON deg.v = cl.v GROUP BY 1),
       |q AS (SELECT sum(CAST(COALESCE(ein.ec, 0) AS DOUBLE) / CAST(mtot.m AS DOUBLE)
       |    - (CAST(dsum.dc AS DOUBLE) / (2.0 * CAST(mtot.m AS DOUBLE)))
       |      * (CAST(dsum.dc AS DOUBLE) / (2.0 * CAST(mtot.m AS DOUBLE)))) AS q,
       |    CAST(count(*) AS BIGINT) AS n_clusters
       |  FROM dsum LEFT JOIN ein USING (cluster) CROSS JOIN mtot)
       |SELECT mtot.m AS n_edges, q.n_clusters, round(q.q, 6) AS modularity
       |FROM q CROSS JOIN mtot""".stripMargin

  /** ann4: hubness report — the k-occurrence distribution of the IVF
    * top-k graph from exact integer moments (hub skew is the standard
    * ANN pathology diagnostic).
    */
  def ann4Sql(k: Int = 5, nCentroids: Int = 16, nProbe: Int = 6,
              dim: Int = 64): String =
    s"""WITH ${ivfKnnCte(k, nCentroids, nProbe, dim)},
       |occ AS (SELECT e.vec_id, CAST(COALESCE(o.c, 0) AS BIGINT) AS o FROM e
       |  LEFT JOIN (SELECT n_id, count(*) AS c FROM knn GROUP BY 1) o
       |    ON o.n_id = e.vec_id),
       |mom AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(o) AS BIGINT) AS s1,
       |    CAST(sum(o * o) AS BIGINT) AS s2, CAST(sum(o * o * o) AS BIGINT) AS s3,
       |    CAST(max(o) AS BIGINT) AS max_occ,
       |    CAST(sum(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_antihubs
       |  FROM occ)
       |SELECT n, max_occ, n_antihubs,
       |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_occ,
       |  round((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS var_occ,
       |  round(((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
       |    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |         - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
       |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
       |    / CASE WHEN (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |        - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) <= 0 THEN 1.0
       |      ELSE pow((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |        - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 1.5) END, 6) AS skew_occ
       |FROM mom""".stripMargin

  /** gnb1: Gaussian Naive Bayes on the labeled embeddings — the oracle
    * retrains the whole model in SQL (per-class/dim population moments
    * with the same variance floor) and rescores every vector with the
    * same in-order per-dim fold the engine runs, so a divergence in
    * either training or scoring flips a pred and reddens the row.
    */
  def gnb1Sql(dim: Int = 64, varFloor: Double = 1e-9): String = {
    s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |rng AS (SELECT CAST(unnest(range(1, ${dim + 1})) AS INTEGER) AS i),
       |x AS (SELECT e.vec_id, e.label, rng.i, e.v[rng.i] AS xv FROM e CROSS JOIN rng),
       |st AS (SELECT label, i, avg(xv) AS mu,
       |    greatest(avg(xv * xv) - avg(xv) * avg(xv), $varFloor) AS vr
       |  FROM x GROUP BY 1, 2),
       |sl AS (SELECT label AS cls, list(mu ORDER BY i) AS mus,
       |    list(vr ORDER BY i) AS vrs FROM st GROUP BY 1),
       |pr AS (SELECT label AS cls, CAST(count(*) AS DOUBLE) AS nc FROM e GROUP BY 1),
       |nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
       |sc AS (SELECT e.vec_id, e.label, sl.cls,
       |    ln(pr.nc / nt.n) - 0.5 * list_reduce(list_prepend(0.0,
       |      list_transform(range(1, ${dim + 1}), i ->
       |        ln(2 * pi() * vrs[CAST(i AS INTEGER)]) +
       |        (v[CAST(i AS INTEGER)] - mus[CAST(i AS INTEGER)]) *
       |        (v[CAST(i AS INTEGER)] - mus[CAST(i AS INTEGER)]) /
       |        vrs[CAST(i AS INTEGER)])),
       |      (acc, t) -> acc + t) AS score
       |  FROM e CROSS JOIN sl JOIN pr ON pr.cls = sl.cls CROSS JOIN nt),
       |best AS (SELECT vec_id, label, cls AS pred,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cls DESC) AS rn
       |  FROM sc)
       |SELECT vec_id, label, pred, label = pred AS correct
       |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** eo1: embedding outliers vs the FIXED deterministic centroids —
    * cell argmax (sim desc, cid desc), micro-quantized distance, exact
    * integer moments (HUGEINT Σd² mirrors the engine's decimal(38,0)),
    * closed-form z. Same VectorDot-order folds as ss5.
    */
  def eo1Sql(topK: Int = 20, nCentroids: Int = 16, dim: Int = 64): String = {
    val rows = Similarity.fixedCentroids(nCentroids, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    val selfDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> v[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cent(cid, cv, cn) AS (VALUES $rows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim FROM e CROSS JOIN cent),
       |best AS (SELECT vec_id, cid AS cell, c_sim FROM (SELECT vec_id, cid, c_sim,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |vn AS (SELECT vec_id, sqrt($selfDot) AS nrm FROM e),
       |d AS (SELECT b.vec_id, b.cell,
       |    CAST(round((1.0 - b.c_sim / vn.nrm) * 1e6) AS BIGINT) AS d_micro
       |  FROM best b JOIN vn USING (vec_id)),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(d_micro) AS BIGINT) AS s1,
       |    sum(CAST(d_micro AS HUGEINT) * d_micro) AS s2 FROM d),
       |z AS (SELECT d.vec_id, d.cell, d.d_micro,
       |    (CAST(d_micro AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      / sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |        - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS z
       |  FROM d, st),
       |top AS (SELECT * FROM z ORDER BY d_micro DESC, vec_id LIMIT $topK)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, d_micro, round(z, 6) AS z
       |FROM top ORDER BY vec_id""".stripMargin
  }

  /** cs1: Gonzalez farthest-first k-center traversal, each pick an
    * unrolled CTE replaying the exact integer argmax (micro-quantized
    * in-order L2 folds, ties to the smaller id).
    */
  def cs1Sql(k: Int = 8, dim: Int = 64): String = {
    def qd(a: String, b: String) =
      s"CAST(floor(list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
        s"i -> ($a[CAST(i AS INTEGER)] - $b[CAST(i AS INTEGER)]) * " +
        s"($a[CAST(i AS INTEGER)] - $b[CAST(i AS INTEGER)]))), (acc, x) -> acc + x) " +
        "* 1000000 + 0.5) AS BIGINT)"
    val steps = (2 to k).map { m =>
      val dists = (1 until m).map(j => qd("e.v", s"c$j.v"))
      val minD = if (dists.size == 1) dists.head
                 else s"least(${dists.mkString(", ")})"
      val froms = (1 until m).map(j => s"c$j").mkString(", ")
      s"""p$m AS (SELECT e.vec_id, e.v, $minD AS dm FROM e, $froms),
         |c$m AS MATERIALIZED (SELECT vec_id, v, dm FROM p$m
         |  ORDER BY dm DESC, vec_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to k).map(m =>
      s"SELECT $m AS step, vec_id, dm AS d_micro FROM c$m")
      .mkString("\nUNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |c1 AS MATERIALIZED (SELECT vec_id, v, CAST(0 AS BIGINT) AS dm FROM e
       |  ORDER BY vec_id LIMIT 1),
       |$steps
       |SELECT step, vec_id, d_micro FROM ($sel) ORDER BY step""".stripMargin
  }

  /** mk1: substochastic power iteration in exact pico-long arithmetic,
    * one MATERIALIZED CTE per round (the bt1 integer contract).
    */
  def mk1Sql(iters: Int = 12): String = {
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "it0" else s"it${k - 1}"
      s"""it$k AS MATERIALIZED (SELECT st.s, COALESCE(agg.x, 0) AS x
         |  FROM states st LEFT JOIN (
         |    SELECT m.t AS s, SUM(p.x * m.n // tot.nt) AS x
         |    FROM m JOIN $prev p ON p.s = m.p JOIN tot ON tot.p = m.p
         |    GROUP BY 1) agg ON agg.s = st.s)""".stripMargin
    }.mkString(",\n")
    s"""WITH tr0 AS (SELECT lag(event_type) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS p,
       |    event_type AS t FROM events),
       |m AS MATERIALIZED (SELECT p, t, CAST(count(*) AS BIGINT) AS n
       |  FROM tr0 WHERE p IS NOT NULL GROUP BY 1, 2),
       |states AS MATERIALIZED (SELECT DISTINCT s FROM
       |  (SELECT p AS s FROM m UNION ALL SELECT t FROM m)),
       |tot AS MATERIALIZED (SELECT p, CAST(sum(n) AS BIGINT) AS nt
       |  FROM m GROUP BY 1),
       |ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
       |it0 AS MATERIALIZED (SELECT s, 1000000000000 // ns.k AS x
       |  FROM states, ns),
       |$rounds
       |SELECT st.s AS state, CAST(COALESCE(tot.nt, 0) AS BIGINT) AS n_out,
       |  round(CAST(f.x AS DOUBLE) / 1e12, 9) AS p_steady
       |FROM states st LEFT JOIN tot ON tot.p = st.s
       |JOIN it$iters f ON f.s = st.s
       |ORDER BY st.s""".stripMargin
  }

  /** zo2: the Hilbert xy2d walk unrolled as chained CTEs — one round
    * per bit (quadrant, rotation, reflection), all long arithmetic.
    */
  def zo2Sql(bits: Int = 8): String = {
    val keys = "l_orderkey, l_linenumber, l_partkey, l_suppkey"
    val rounds = ((bits - 1) to 0 by -1).map { i =>
      val s = 1L << i
      s"""r$i AS (SELECT $keys,
         |  CASE WHEN (hy & $s) > 0 THEN hx
         |       WHEN (hx & $s) > 0 THEN $s - 1 - hy ELSE hy END AS hx,
         |  CASE WHEN (hy & $s) > 0 THEN hy
         |       WHEN (hx & $s) > 0 THEN $s - 1 - hx ELSE hx END AS hy,
         |  hd + ${s * s} * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
         |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END) AS hd
         |  FROM r${i + 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH r$bits AS (SELECT $keys,
       |    CAST(l_partkey % 256 AS BIGINT) AS hx,
       |    CAST(l_suppkey % 256 AS BIGINT) AS hy,
       |    CAST(0 AS BIGINT) AS hd
       |  FROM lineitem WHERE l_orderkey < 500),
       |$rounds
       |SELECT $keys, hd AS hkey FROM r0
       |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** ch1: mod-hash vs consistent-hash rebalance audit. Ring literals
    * come from the same driver computation the Spark plan serializes
    * (Layout.hashRing), key hashes from the shared md5Hash60 fold.
    */
  def ch1Sql(fromShards: Int = 8, toShards: Int = 9, vnodes: Int = 16): String = {
    def ringRows(n: Int) = graft.ops.Layout.hashRing(n, vnodes)
      .map { case (p, s) => s"($p, $s)" }.mkString(", ")
    val M = 1L << 60
    val h60 = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, 16), i -> CAST(strpos('0123456789abcdef', " +
      "substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))), " +
      "(acc, x) -> acc * 16 + x)"
    s"""WITH k AS MATERIALIZED (SELECT doc_id, $h60 AS h FROM documents),
       |rf(pos, shard) AS (VALUES ${ringRows(fromShards)}),
       |rt(pos, shard) AS (VALUES ${ringRows(toShards)}),
       |af AS (SELECT k.doc_id, arg_min(rf.shard, (rf.pos - k.h + $M) % $M)
       |    AS ring_from FROM k CROSS JOIN rf GROUP BY k.doc_id),
       |at AS (SELECT k.doc_id, arg_min(rt.shard, (rt.pos - k.h + $M) % $M)
       |    AS ring_to FROM k CROSS JOIN rt GROUP BY k.doc_id),
       |a AS MATERIALIZED (SELECT k.doc_id,
       |    CAST(k.h % $fromShards AS INTEGER) AS mod_from,
       |    CAST(k.h % $toShards AS INTEGER) AS mod_to,
       |    af.ring_from, at.ring_to
       |  FROM k JOIN af USING (doc_id) JOIN at USING (doc_id)),
       |c AS (SELECT 'mod_from' AS scheme, mod_from AS shard,
       |        CAST(count(*) AS BIGINT) AS n_docs FROM a GROUP BY 2
       |  UNION ALL SELECT 'mod_to', mod_to, CAST(count(*) AS BIGINT)
       |    FROM a GROUP BY 2
       |  UNION ALL SELECT 'ring_from', ring_from, CAST(count(*) AS BIGINT)
       |    FROM a GROUP BY 2
       |  UNION ALL SELECT 'ring_to', ring_to, CAST(count(*) AS BIGINT)
       |    FROM a GROUP BY 2),
       |m AS (SELECT 'moved_mod' AS scheme, -1 AS shard,
       |    CAST(sum(CASE WHEN mod_from <> mod_to THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_docs FROM a
       |  UNION ALL SELECT 'moved_ring', -1,
       |    CAST(sum(CASE WHEN ring_from <> ring_to THEN 1 ELSE 0 END) AS BIGINT)
       |    FROM a)
       |SELECT scheme, shard, n_docs FROM (SELECT * FROM c UNION ALL SELECT * FROM m)
       |ORDER BY scheme, shard""".stripMargin
  }

  /** rbo1: truncated rank-biased overlap between the exact and the
    * int8-quantized cosine rankings. Tail weights come from the SAME
    * Scala computation the Spark side uses (Search.rboTailWeights), so
    * both engines share identical pico-long literals.
    */
  def rbo1Sql(nQueries: Int = 4, depth: Int = 10, p: Double = 0.9,
              dim: Int = 64): String = {
    val wRows = graft.ops.Search.rboTailWeights(depth, p).zipWithIndex
      .map { case (pico, i) => s"(${i + 1}, ${pico})" }.mkString(", ")
    def dotf(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
        s"i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    def rankCtes(tag: String, src: String) =
      s"""${tag}p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         |    ${dotf("a.yd", "b.yd")}
         |      / (sqrt(${dotf("a.yd", "a.yd")}) * sqrt(${dotf("b.yd", "b.yd")})) AS sim
         |  FROM $src a JOIN $src b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < $nQueries),
         |${tag}r AS (SELECT q_id, n_id, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
         |  FROM ${tag}p),
         |${tag}a AS MATERIALIZED (SELECT q_id, n_id, rank FROM ${tag}r
         |  WHERE rank <= $depth)""".stripMargin
    s"""WITH v AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS yd FROM embeddings),
       |sq AS (SELECT vec_id, yd,
       |    list_reduce(list_prepend(0.0, list_transform(yd, x -> abs(x))),
       |      (a, b) -> greatest(a, b)) AS scale FROM v),
       |dq AS MATERIALIZED (SELECT vec_id,
       |    CASE WHEN scale = 0 THEN list_transform(yd, x -> 0.0)
       |    ELSE list_transform(yd, x ->
       |      CAST(round(x / scale * 127.0) AS INTEGER) * scale / 127.0)
       |    END AS yd FROM sq),
       |${rankCtes("e", "v")},
       |${rankCtes("q", "dq")},
       |j AS (SELECT ea.q_id, greatest(ea.rank, qa.rank) AS m
       |  FROM ea JOIN qa ON qa.q_id = ea.q_id AND qa.n_id = ea.n_id),
       |w(m, pico) AS (VALUES $wRows),
       |agg AS (SELECT j.q_id, CAST(count(*) AS BIGINT) AS o,
       |    CAST(sum(w.pico) AS BIGINT) AS pico
       |  FROM j JOIN w ON w.m = j.m GROUP BY 1)
       |SELECT q.q_id, CAST(COALESCE(agg.o, 0) AS BIGINT) AS overlap$depth,
       |  CAST(COALESCE(agg.pico, 0) AS DOUBLE) / 1e12 AS rbo
       |FROM (SELECT vec_id AS q_id FROM v WHERE vec_id < $nQueries) q
       |LEFT JOIN agg ON agg.q_id = q.q_id ORDER BY q.q_id""".stripMargin
  }

  /** bt1: Bradley–Terry MM fit with `iters` unrolled iteration CTEs.
    * All state is integer micro-units and every step a floor `//`
    * division, mirroring Classify.bradleyTerry's exact long arithmetic
    * (SUM promotes to HUGEINT in DuckDB — still exact integers).
    */
  def bt1Sql(iters: Int = 8): String = {
    val iterCtes = (1 to iters).map { k =>
      val prev = if (k == 1) "it0" else s"it${k - 1}"
      s"""it$k AS MATERIALIZED (SELECT i.item,
         |    CASE WHEN d.denom IS NULL OR d.denom = 0 THEN i.wm
         |         ELSE COALESCE(w.W, 0) * 1000000000000 // d.denom END AS wm
         |  FROM $prev i
         |  LEFT JOIN (SELECT e.i AS item,
         |        SUM(e.n * 1000000000000 // (wa.wm + wb.wm)) AS denom
         |      FROM e JOIN $prev wa ON wa.item = e.i
         |        JOIN $prev wb ON wb.item = e.j
         |      GROUP BY 1) d ON d.item = i.item
         |  LEFT JOIN wins w ON w.item = i.item)""".stripMargin
    }.mkString(",\n")
    s"""WITH dd AS (SELECT doc_id, source,
       |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt
       |  FROM documents),
       |pr0 AS (SELECT doc_id // 2 AS pair, doc_id, source, nt FROM dd),
       |r AS (SELECT pair, source,
       |    row_number() OVER (PARTITION BY pair ORDER BY nt DESC, doc_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY pair) AS c FROM pr0),
       |pw AS (SELECT a.pair, a.source AS w, b.source AS l
       |  FROM r a JOIN r b ON a.pair = b.pair AND a.rn = 1 AND b.rn = 2
       |  WHERE a.c = 2 AND a.source <> b.source),
       |m AS MATERIALIZED (SELECT w, l, CAST(count(*) AS BIGINT) AS n
       |  FROM pw GROUP BY 1, 2),
       |items AS MATERIALIZED (SELECT DISTINCT item FROM
       |  (SELECT w AS item FROM m UNION ALL SELECT l FROM m)),
       |tot AS (SELECT least(w, l) AS a, greatest(w, l) AS b,
       |    CAST(sum(n) AS BIGINT) AS n FROM m GROUP BY 1, 2),
       |e AS MATERIALIZED (SELECT a AS i, b AS j, n FROM tot
       |  UNION ALL SELECT b, a, n FROM tot),
       |wins AS MATERIALIZED (SELECT w AS item, CAST(sum(n) AS BIGINT) AS W
       |  FROM m GROUP BY 1),
       |it0 AS MATERIALIZED (SELECT item, CAST(1000000 AS BIGINT) AS wm FROM items),
       |$iterCtes
       |SELECT i.item, CAST(COALESCE(w.W, 0) AS BIGINT) AS n_wins,
       |  CAST(COALESCE(t.nc, 0) AS BIGINT) AS n_comparisons,
       |  CAST(f.wm AS DOUBLE) / 1000000.0 AS strength
       |FROM items i
       |LEFT JOIN wins w ON w.item = i.item
       |LEFT JOIN (SELECT e.i AS item, CAST(sum(n) AS BIGINT) AS nc
       |           FROM e GROUP BY 1) t ON t.item = i.item
       |JOIN it$iters f ON f.item = i.item
       |ORDER BY i.item""".stripMargin
  }

  /** wp1: WordPiece greedy longest-match segmentation
    * ([[graft.ops.Bpe.wordpieceSegment]]) — position-tagged vocabulary
    * (top-N (piece, cont) by count ∪ all singles), packed match lists,
    * and the greedy walk unrolled as maxWordLen chained CTEs (per step
    * the cursor jumps to the max `en` among matches starting at it —
    * the same `st*1024+en` integer pack as the Spark side, so
    * segmentations are bit-identical).
    */
  private def wordpieceBase(vocabSize: Int, maxPieceLen: Int,
                            maxWordLen: Int): String = {
    val pos2 =
      """list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_filter(marr, mm -> mm // 1024 = pos)),
        |      (a, b) -> greatest(a, b))""".stripMargin
    val rounds = (1 to maxWordLen).map { k =>
      s""",
         |g$k AS MATERIALIZED (SELECT w, cnt, len, marr,
         |  CASE WHEN pos >= len THEN pos ELSE ($pos2) END AS pos,
         |  CASE WHEN pos >= len THEN np ELSE np + 1 END AS np,
         |  CASE WHEN pos >= len THEN seg ELSE seg ||
         |    (CASE WHEN pos = 0 THEN '' ELSE ' ##' END) ||
         |    substr(w, CAST(pos AS INTEGER) + 1,
         |      CAST(($pos2) - pos AS INTEGER)) END AS seg
         |  FROM g${k - 1})""".stripMargin
    }.mkString
    s"""WITH w AS MATERIALIZED (
       |  SELECT w, cnt, CAST(length(w) AS BIGINT) AS len FROM (
       |    SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
       |    FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
       |    WHERE len(tok) > 0 GROUP BY tok)
       |  WHERE length(w) <= $maxWordLen),
       |subs AS MATERIALIZED (SELECT piece, cont, CAST(sum(cnt) AS BIGINT) AS pcnt FROM (
       |    SELECT substr(t.w, CAST(a.i AS INTEGER), CAST(b.l AS INTEGER)) AS piece,
       |      CASE WHEN a.i = 1 THEN 0 ELSE 1 END AS cont, t.cnt
       |    FROM w t, unnest(generate_series(1, t.len)) AS a(i),
       |         unnest(generate_series(1, $maxPieceLen)) AS b(l)
       |    WHERE a.i + b.l - 1 <= t.len)
       |  GROUP BY 1, 2),
       |top AS (SELECT piece, cont FROM subs
       |  ORDER BY pcnt DESC, cont, piece LIMIT $vocabSize),
       |vocab AS MATERIALIZED (SELECT DISTINCT piece, cont FROM (
       |  SELECT piece, cont FROM top UNION ALL
       |  SELECT piece, cont FROM subs WHERE length(piece) = 1)),
       |m AS MATERIALIZED (SELECT s.w, list_sort(list(s.mm)) AS marr FROM (
       |    SELECT t.w,
       |      CAST((a.i - 1) * 1024 + (a.i + b.l - 1) AS BIGINT) AS mm,
       |      substr(t.w, CAST(a.i AS INTEGER), CAST(b.l AS INTEGER)) AS piece,
       |      CASE WHEN a.i = 1 THEN 0 ELSE 1 END AS cont
       |    FROM w t, unnest(generate_series(1, t.len)) AS a(i),
       |         unnest(generate_series(1, $maxPieceLen)) AS b(l)
       |    WHERE a.i + b.l - 1 <= t.len) s
       |  JOIN vocab v ON v.piece = s.piece AND v.cont = s.cont
       |  GROUP BY s.w),
       |g0 AS MATERIALIZED (SELECT t.w, t.cnt, t.len, m.marr,
       |    CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np, '' AS seg
       |  FROM w t JOIN m ON m.w = t.w)""".stripMargin + rounds
  }

  def wp1Sql(vocabSize: Int = 256, maxPieceLen: Int = 4,
             maxWordLen: Int = 16): String =
    wordpieceBase(vocabSize, maxPieceLen, maxWordLen) +
      s"""
         |SELECT w, cnt, len AS n_chars, np AS n_pieces, seg
         |FROM g$maxWordLen ORDER BY w""".stripMargin

  /** nf41: NF4 quantization quality — the 16 QLoRA level literals,
    * absmax scale fold, first-position argmin (ties to the lower
    * code, mirroring the engine's (d, i) struct min), fixed in-order
    * error/cosine folds, exact integer label means.
    */
  def nf41Sql(): String = {
    val lv = Similarity.Nf4Levels.mkString("[", ", ", "]")
    val dl = "list_transform(range(1, 17), l -> " +
      "abs(x / scale - lv[CAST(l AS INTEGER)]))"
    def fold(body: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> $body)), " +
        "(acc, t) -> acc + t)"
    s"""WITH lvt AS (SELECT $lv AS lv),
       |e AS (SELECT CAST(label AS BIGINT) AS label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
       |  FROM embeddings),
       |s AS (SELECT label, xd,
       |    list_reduce(list_prepend(0.0, xd),
       |      (a, b) -> greatest(a, abs(b))) AS scale FROM e),
       |d AS MATERIALIZED (SELECT label, xd,
       |    CASE WHEN scale = 0 THEN list_transform(xd, x -> 0.0)
       |    ELSE list_transform(xd, x ->
       |      lv[list_position($dl, list_min($dl))] * scale) END AS deq
       |  FROM s, lvt),
       |m AS (SELECT label,
       |    CAST(floor(${fold("(xd[CAST(i AS INTEGER)] - deq[CAST(i AS INTEGER)]) * (xd[CAST(i AS INTEGER)] - deq[CAST(i AS INTEGER)])")}
       |      * 1e12 + 0.5) AS BIGINT) AS se_pico,
       |    ${fold("xd[CAST(i AS INTEGER)] * deq[CAST(i AS INTEGER)]")} AS dot_xq,
       |    sqrt(${fold("xd[CAST(i AS INTEGER)] * xd[CAST(i AS INTEGER)]")}) AS nx,
       |    sqrt(${fold("deq[CAST(i AS INTEGER)] * deq[CAST(i AS INTEGER)]")}) AS nq
       |  FROM d),
       |c AS (SELECT label, se_pico,
       |    CASE WHEN nx * nq = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(floor(dot_xq / (nx * nq) * 1e9 + 0.5) AS BIGINT)
       |    END AS cos_nano
       |  FROM m)
       |SELECT label, CAST(count(*) AS BIGINT) AS n,
       |  CAST(CAST(sum(se_pico) AS BIGINT) // count(*) AS BIGINT) AS mse_pico,
       |  CAST(CAST(sum(cos_nano) AS BIGINT) // count(*) AS BIGINT)
       |    AS mean_cos_nano
       |FROM c GROUP BY 1 ORDER BY label""".stripMargin
  }

  /** weat1: WEAT embedding-bias test — nano cosines, exact integer
    * association sums, md5 sign-flip permutations, add-one p; the
    * effect-size double mirrors the engine's operand order.
    */
  def weat1Sql(xL: Int = 0, yL: Int = 1, aL: Int = 2, bL: Int = 3,
               reps: Int = 64, dim: Int = 64): String = {
    val dot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> wv[CAST(i AS INTEGER)] * tv[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS lbl,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |nv AS (SELECT id, lbl, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS vn FROM e),
       |tgt AS (SELECT id AS w, lbl = $xL AS is_x, v AS wv, vn AS wn
       |  FROM nv WHERE lbl IN ($xL, $yL)),
       |att AS (SELECT id AS t, lbl = $aL AS is_a, v AS tv, vn AS tn
       |  FROM nv WHERE lbl IN ($aL, $bL)),
       |nab AS (SELECT
       |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
       |  FROM att),
       |cs AS (SELECT w, is_x, is_a,
       |    CASE WHEN wn * tn = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(floor($dot / (wn * tn) * 1e9 + 0.5) AS BIGINT) END AS c
       |  FROM tgt CROSS JOIN att),
       |sw AS MATERIALIZED (SELECT w, is_x,
       |    CAST(sum(CASE WHEN is_a THEN c ELSE 0 END) AS BIGINT) // n_a
       |    - CAST(sum(CASE WHEN is_a THEN 0 ELSE c END) AS BIGINT) // n_b AS s
       |  FROM cs, nab GROUP BY w, is_x, n_a, n_b),
       |base AS (SELECT
       |    CAST(sum(CASE WHEN is_x THEN 1 ELSE 0 END) AS BIGINT) AS n_x,
       |    CAST(sum(CASE WHEN is_x THEN 0 ELSE 1 END) AS BIGINT) AS n_y,
       |    CAST(sum(CASE WHEN is_x THEN s ELSE -s END) AS BIGINT) AS s_stat,
       |    CAST(sum(s) AS BIGINT) AS s1,
       |    CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS s2,
       |    CAST(sum(CASE WHEN is_x THEN s ELSE 0 END) AS BIGINT) AS sx,
       |    CAST(sum(CASE WHEN is_x THEN 0 ELSE s END) AS BIGINT) AS sy
       |  FROM sw),
       |pr AS (SELECT r.r,
       |    CAST(sum((CASE WHEN is_x THEN 1 ELSE -1 END) *
       |      (CASE WHEN ${hex60("md5(CAST(w AS VARCHAR) || ':' || CAST(r.r AS VARCHAR))")}
       |        % 2 = 0 THEN 1 ELSE -1 END) * s) AS BIGINT) AS sr
       |  FROM sw, (SELECT unnest(generate_series(1, $reps)) AS r) r
       |  GROUP BY 1)
       |SELECT b.n_x, b.n_y, nab.n_a, nab.n_b,
       |  b.s_stat AS s_stat_nano,
       |  CASE WHEN (b.s2 * (b.n_x + b.n_y) - CAST(b.s1 AS HUGEINT) * b.s1) > 0
       |  THEN CAST(floor((CAST(b.sx AS DOUBLE) / CAST(b.n_x AS DOUBLE)
       |      - CAST(b.sy AS DOUBLE) / CAST(b.n_y AS DOUBLE)) /
       |    sqrt((CAST(b.s2 AS DOUBLE) * CAST(b.n_x + b.n_y AS DOUBLE)
       |        - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE)) /
       |      (CAST(b.n_x + b.n_y AS DOUBLE) * CAST(b.n_x + b.n_y AS DOUBLE)))
       |    * 1e9 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS effect_nano,
       |  ((CAST(sum(CASE WHEN abs(pr.sr) >= abs(b.s_stat) THEN 1 ELSE 0 END)
       |    AS BIGINT) + 1) * 1000000) // ${reps + 1} AS p_micro
       |FROM pr, base b, nab
       |GROUP BY 1, 2, 3, 4, 5, b.s2, b.s1, b.sx, b.sy""".stripMargin
  }

  /** unif1: alignment & uniformity — consecutive same-label positive
    * pairs, md5-ordered random pairs, nano 2−2cos distances, pico exp
    * terms, exact means, one ln at display.
    */
  def unif1Sql(dim: Int = 64): String = {
    val dot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> va[CAST(i AS INTEGER)] * vb[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    def d2(tbl: String, keys: String) =
      s"""SELECT CASE WHEN na * nb = 0 THEN CAST(2000000000 AS BIGINT)
         |    ELSE 2000000000 - CAST(floor($dot / (na * nb) * 2e9 + 0.5) AS BIGINT)
         |    END AS d2_nano
         |  FROM (SELECT $keys, v AS va, vn AS na FROM $tbl WHERE side = 0) l
         |  JOIN (SELECT $keys, v AS vb, vn AS nb FROM $tbl WHERE side = 1) r
         |  USING ($keys)""".stripMargin
    s"""WITH e AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS lbl,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |nv AS (SELECT id, lbl, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS vn FROM e),
       |posr AS (SELECT *, (rk - 1) // 2 AS g, (rk - 1) % 2 AS side FROM (
       |    SELECT id, lbl, v, vn, CAST(row_number() OVER (
       |      PARTITION BY lbl ORDER BY id) AS BIGINT) AS rk FROM nv)),
       |rndr AS (SELECT *, (rk - 1) // 2 AS g, (rk - 1) % 2 AS side FROM (
       |    SELECT id, lbl, v, vn, CAST(row_number() OVER (ORDER BY
       |      ${hex60("md5(CAST(id AS VARCHAR))")}, id) AS BIGINT) AS rk
       |    FROM nv)),
       |pos AS (SELECT CAST(count(*) AS BIGINT) AS n_pos_pairs,
       |    CAST(sum(d2_nano) AS BIGINT) AS sp FROM (${d2("posr", "lbl, g")})),
       |rnd AS (SELECT CAST(count(*) AS BIGINT) AS n_rand_pairs,
       |    CAST(sum(CAST(floor(exp(d2_nano / -5e8) * 1e12 + 0.5) AS BIGINT))
       |      AS BIGINT) AS st
       |  FROM (${d2("rndr", "g")}))
       |SELECT n_pos_pairs, n_rand_pairs,
       |  sp // n_pos_pairs AS alignment_nano,
       |  CAST(floor(ln(CAST(st // n_rand_pairs AS DOUBLE) / 1e12) * 1e9 + 0.5)
       |    AS BIGINT) AS uniformity_nano
       |FROM pos, rnd""".stripMargin
  }

  /** dtw1: banded DTW — per-pair integer DP unrolled as one CTE per
    * row. DuckDB's list-accumulator `list_reduce` is broken in
    * vectorized batches (the mmr1 lesson), so the within-row
    * left-dependency is resolved by 2·band RELAXATION passes
    * (lateral column aliases), which converge exactly because the
    * corridor bounds the dependency chain.
    */
  def dtw1Sql(band: Int = 3, maxLen: Int = 40): String = {
    val INF = "4611686018427387904"
    def cost(i: String) =
      s"abs(sa[CAST($i AS INTEGER)] - sb[CAST(j AS INTEGER)])"
    val rows = (1 to maxLen).map { i =>
      val t0 =
        s"""list_prepend(CAST($INF AS BIGINT), list_transform(range(1, len + 1), j ->
           |      CASE WHEN abs(j - $i) > $band OR $i > len THEN CAST($INF AS BIGINT)
           |      ELSE ${cost(i.toString)} + least(dp[CAST(j AS INTEGER) + 1],
           |        dp[CAST(j AS INTEGER)]) END))""".stripMargin
      def relax(prev: String) =
        s"""list_prepend(CAST($INF AS BIGINT), list_transform(range(1, len + 1), j ->
           |      CASE WHEN abs(j - $i) > $band OR $i > len THEN CAST($INF AS BIGINT)
           |      ELSE least($prev[CAST(j AS INTEGER) + 1],
           |        ${cost(i.toString)} + $prev[CAST(j AS INTEGER)]) END))""".stripMargin
      // nested subquery LEVELS, not lateral aliases: aliases inline
      // textually at bind time (each relax references its predecessor
      // twice -> 2^passes expression blowup that stalls the binder);
      // a projection per level evaluates each pass once per row. The
      // t column is projected away before the next round.
      val inner = s"SELECT ka, kb, len, sa, sb, nf, dp, $t0 AS t FROM d${i - 1}"
      val levels = (1 to 2 * band).foldLeft(inner) { (acc, _) =>
        s"SELECT ka, kb, len, sa, sb, nf, dp, ${relax("t")} AS t FROM (\n$acc)"
      }
      s""",
         |d$i AS MATERIALIZED (SELECT ka, kb, len, sa, sb, nf,
         |  CASE WHEN $i > len THEN dp ELSE t END AS dp FROM (
         |$levels))""".stripMargin
    }.mkString
    s"""WITH c AS (SELECT event_type AS k, date_trunc('day', ts) AS b,
       |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
       |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
       |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 day')) AS b
       |  FROM bounds),
       |ks AS (SELECT DISTINCT k FROM c),
       |dense AS MATERIALIZED (SELECT ks.k,
       |    list_slice(list(coalesce(c.x, 0) ORDER BY sp.b), 1, $maxLen) AS s,
       |    CAST(count(*) AS BIGINT) AS nf
       |  FROM ks CROSS JOIN sp LEFT JOIN c ON c.k = ks.k AND c.b = sp.b
       |  GROUP BY ks.k),
       |p0 AS (SELECT a.k AS ka, b.k AS kb, a.s AS sa, b.s AS sb,
       |    CAST(len(a.s) AS INTEGER) AS len, a.nf AS nf
       |  FROM dense a JOIN dense b ON a.k < b.k),
       |d0 AS MATERIALIZED (SELECT ka, kb, len, sa, sb, nf,
       |    list_prepend(CAST(0 AS BIGINT), list_transform(range(1, len + 1),
       |      j -> CAST($INF AS BIGINT))) AS dp
       |  FROM p0)""".stripMargin + rows +
      s"""
         |SELECT ka, kb, CAST(len AS BIGINT) AS n_buckets,
         |  nf AS n_buckets_full,
         |  dp[CAST(len AS INTEGER) + 1] AS dtw_dist,
         |  CAST(list_sum(list_transform(range(1, len + 1), i ->
         |    abs(sa[CAST(i AS INTEGER)] - sb[CAST(i AS INTEGER)])))
         |    AS BIGINT) AS euclid_l1
         |FROM d$maxLen ORDER BY ka, kb""".stripMargin
  }

  /** irt1: Rasch 1PL fit — binomial response cells from events,
    * synchronous integer gradient rounds unrolled as MATERIALIZED
    * CTEs: one σ quantization per cell per round, then exact integer
    * residuals/gradients/centering with truncating division.
    */
  def irt1Sql(iters: Int = 8, thr: Int = 60): String = {
    val rounds = (1 to iters).map { k =>
      s""",
         |e$k AS MATERIALIZED (SELECT r.u, r.i, r.n, r.k, t.t, bb.b,
         |    CAST(r.k * 1000000 - r.n * CAST(floor(1e6 /
         |      (1 + exp(-(CAST(t.t - bb.b AS DOUBLE) / 1e6))) + 0.5)
         |      AS BIGINT) AS BIGINT) AS e
         |  FROM resp r JOIN t${k - 1} t ON t.u = r.u
         |  JOIN b${k - 1} bb ON bb.i = r.i),
         |t$k AS MATERIALIZED (SELECT u, CAST(any_value(t)
         |    + (CAST(sum(e) AS BIGINT) // CAST(sum(n) AS BIGINT)) // 2
         |    AS BIGINT) AS t
         |  FROM e$k GROUP BY 1),
         |braw$k AS MATERIALIZED (SELECT i, CAST(any_value(b)
         |    - (CAST(sum(e) AS BIGINT) // CAST(sum(n) AS BIGINT)) // 2
         |    AS BIGINT) AS br
         |  FROM e$k GROUP BY 1),
         |b$k AS MATERIALIZED (SELECT i, CAST(br - (SELECT
         |    CAST(sum(br) AS BIGINT) // count(*) FROM braw$k) AS BIGINT) AS b
         |  FROM braw$k)""".stripMargin
    }.mkString
    s"""WITH resp AS MATERIALIZED (SELECT CAST(user_id AS VARCHAR) AS u,
       |    event_type AS i, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN value >= $thr THEN 1 ELSE 0 END) AS BIGINT) AS k
       |  FROM events GROUP BY 1, 2),
       |it AS MATERIALIZED (SELECT i, CAST(sum(n) AS BIGINT) AS nt,
       |    CAST(sum(k) AS BIGINT) AS kt FROM resp GROUP BY 1),
       |t0 AS MATERIALIZED (SELECT DISTINCT u, CAST(0 AS BIGINT) AS t FROM resp),
       |b0 AS MATERIALIZED (SELECT i, CAST(0 AS BIGINT) AS b FROM it)"""
      .stripMargin + rounds +
      s"""
         |SELECT it.i AS item, it.nt AS n_trials, it.kt AS n_success,
         |  bf.b AS difficulty_micro,
         |  (SELECT CAST(sum(t) AS BIGINT) // count(*) FROM t$iters)
         |    AS mean_theta_micro
         |FROM it JOIN b$iters bf ON bf.i = it.i
         |ORDER BY item""".stripMargin
  }

  /** spec1: spectral bipartition — undirected handoff graph, integer
    * power iteration for the deflated second eigenvector of D⁻¹A as
    * unrolled MATERIALIZED CTEs (exact neighbor sums, truncating
    * divisions — both engines truncate toward zero), sign pinned at
    * the smallest node, cut/conductance rollup.
    */
  def spec1Sql(iters: Int = 12): String = {
    // early-exit freeze, mirrored from the engine: once a round's
    // nonnegative-sign set has the same (count, Σv, Σv²) fingerprint
    // as the previous round's — or its exact complement (the
    // negative-eigenvalue ±v oscillation the s0 pin absorbs) — x
    // carries forward unchanged (f$k latches true), so both engines
    // land on the first ±-stable round's values no matter the unroll
    // depth, and rounds_used is the first latched k. Join-free: each
    // fingerprint is one aggregate, exactly the engine's rule.
    def fpSel(src: String) =
      s"""SELECT CAST(coalesce(sum(CASE WHEN x >= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS cp,
         |    coalesce(sum(CASE WHEN x >= 0 THEN CAST(v AS HUGEINT) ELSE 0 END), 0) AS sv,
         |    coalesce(sum(CASE WHEN x >= 0 THEN CAST(v AS HUGEINT) * v ELSE 0 END), 0) AS sq
         |  FROM $src""".stripMargin
    val rounds = (1 to iters).map { k =>
      s""",
         |y$k AS MATERIALIZED (SELECT und.dst AS v, any_value(deg.d) AS d,
         |    CAST(CAST(sum(p.x) AS BIGINT) // any_value(deg.d) AS BIGINT) AS y
         |  FROM und JOIN x${k - 1} p ON p.v = und.src
         |  JOIN deg ON deg.v = und.dst
         |  GROUP BY 1),
         |m$k AS (SELECT CAST(CAST(sum(d * y) AS BIGINT) // any_value(volt)
         |    AS BIGINT) AS m FROM y$k, vol),
         |mx$k AS (SELECT greatest(max(abs(y - m)), 1) AS mx FROM y$k, m$k),
         |c$k AS MATERIALIZED (SELECT v,
         |    CAST(((y - m) * 1000000000) // mx AS BIGINT) AS x
         |  FROM y$k, m$k, mx$k),
         |fpc$k AS (${fpSel(s"c$k")}),
         |f$k AS (SELECT ((SELECT f FROM f${k - 1}) OR (
         |    SELECT (c.cp = p.cp AND c.sv = p.sv AND c.sq = p.sq)
         |      OR (c.cp = t.n - p.cp AND c.sv = t.svall - p.sv
         |          AND c.sq = t.sqall - p.sq)
         |    FROM fpc$k c, fpx${k - 1} p, fptot t)) AS f),
         |x$k AS MATERIALIZED (SELECT p.v,
         |    CASE WHEN (SELECT f FROM f${k - 1}) THEN p.x ELSE c.x END AS x
         |  FROM x${k - 1} p JOIN c$k c USING (v)),
         |fpx$k AS (${fpSel(s"x$k")})""".stripMargin
    }.mkString
    val ruLegs = (1 to iters)
      .map(k => s"SELECT $k AS k, (SELECT f FROM f$k) AS f")
      .mkString(" UNION ALL ")
    s"""WITH dir AS (SELECT DISTINCT src, dst FROM (
       |    SELECT lag(user_id) OVER (PARTITION BY event_type
       |      ORDER BY ts, event_id) AS src, user_id AS dst FROM events)
       |  WHERE src IS NOT NULL AND src != dst),
       |und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM dir UNION ALL SELECT dst, src FROM dir)),
       |deg AS MATERIALIZED (SELECT dst AS v, CAST(count(*) AS BIGINT) AS d
       |  FROM und GROUP BY 1),
       |vol AS (SELECT CAST(sum(d) AS BIGINT) AS volt FROM deg),
       |x0 AS MATERIALIZED (SELECT v, CAST(CASE WHEN v % 2 = 0
       |    THEN 1000000000 ELSE -1000000000 END AS BIGINT) AS x FROM deg),
       |f0 AS (SELECT false AS f),
       |fptot AS (SELECT count(*) AS n, coalesce(sum(CAST(v AS HUGEINT)), 0) AS svall,
       |    coalesce(sum(CAST(v AS HUGEINT) * v), 0) AS sqall FROM x0),
       |fpx0 AS (${fpSel("x0")})"""
      .stripMargin + rounds +
      s""",
         |ru AS (SELECT coalesce(min(k), $iters) AS r
         |  FROM ($ruLegs) t WHERE f),
         |s0 AS (SELECT CASE WHEN x < 0 THEN -1 ELSE 1 END AS flip
         |  FROM x$iters ORDER BY v LIMIT 1),
         |sided AS MATERIALIZED (SELECT v, (x * flip) >= 0 AS pos
         |  FROM x$iters, s0),
         |sides AS (SELECT
         |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
         |    CAST(sum(CASE WHEN pos THEN d ELSE 0 END) AS BIGINT) AS vol_pos,
         |    CAST(sum(CASE WHEN pos THEN 0 ELSE d END) AS BIGINT) AS vol_neg
         |  FROM sided JOIN deg USING (v)),
         |cut AS (SELECT CAST(sum(CASE WHEN a.pos != b.pos THEN 1 ELSE 0 END)
         |    AS BIGINT) AS cut_edges
         |  FROM und JOIN sided a ON a.v = und.src
         |  JOIN sided b ON b.v = und.dst WHERE und.src < und.dst)
         |SELECT n_pos, n_neg, vol_pos, vol_neg, cut_edges,
         |  CASE WHEN least(vol_pos, vol_neg) = 0 THEN CAST(0 AS BIGINT)
         |    ELSE (cut_edges * 1000000000) // least(vol_pos, vol_neg)
         |  END AS conductance_nano,
         |  CAST((SELECT r FROM ru) AS BIGINT) AS rounds_used
         |FROM sides, cut""".stripMargin
  }

  /** cnl1: confident learning — the gnb1 model CTEs, a class-ASC
    * softmax (max-shifted, in-order fold, micro-quantized), exact
    * integer per-class thresholds, and the qualifying-argmax joint.
    */
  def cnl1Sql(dim: Int = 64, varFloor: Double = 1e-9): String =
    gnbPosteriorCtes(dim, varFloor) +
      s""",
         |th AS (SELECT cls, CAST(sum(p_micro) AS BIGINT) // count(*) AS t_micro
         |  FROM post WHERE given = cls GROUP BY 1),
         |qual AS (SELECT id, cls AS pred_q,
         |    row_number() OVER (PARTITION BY id ORDER BY p_micro DESC, cls) AS rn
         |  FROM post JOIN th USING (cls) WHERE p_micro >= t_micro),
         |base AS (SELECT DISTINCT id, given FROM post),
         |j AS (SELECT b.given, coalesce(q.pred_q, b.given) AS pred
         |  FROM base b LEFT JOIN (SELECT id, pred_q FROM qual WHERE rn = 1) q
         |    USING (id))
         |SELECT given, pred, CAST(count(*) AS BIGINT) AS n,
         |  CASE WHEN given != pred THEN 1 ELSE 0 END AS is_issue
         |FROM j GROUP BY 1, 2 ORDER BY given, pred""".stripMargin

  /** au6: spectral power — the au1 sample reconstruction plus per-bin
    * in-order coefficient folds over the SAME 16 JVM-computed table
    * literals the engine uses (libm never consulted on either side).
    */
  def au6Sql(bins: Seq[Int] = graft.ops.Multimodal.SpectralBins): String = {
    val legs = bins.map { f =>
      val ct = graft.ops.Multimodal.spectralCosTable(f).mkString("[", ", ", "]")
      val st = graft.ops.Multimodal.spectralSinTable(f).mkString("[", ", ", "]")
      s"""SELECT doc_id, $f AS bin_hz, n AS n_samples,
         |  CAST(floor(log10(sc * sc + ss * ss + 1.0) * 1e9 + 0.5) AS BIGINT)
         |    AS log_power_nano
         |FROM (SELECT doc_id, n,
         |    list_reduce(list_prepend(0.0, list_transform(range(0, n), i ->
         |      smp[CAST(i AS INTEGER) + 1] * ($ct)[CAST(i % 16 AS INTEGER) + 1])),
         |      (acc, x) -> acc + x) AS sc,
         |    list_reduce(list_prepend(0.0, list_transform(range(0, n), i ->
         |      smp[CAST(i AS INTEGER) + 1] * ($st)[CAST(i % 16 AS INTEGER) + 1])),
         |      (acc, x) -> acc + x) AS ss
         |  FROM s)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
       |d AS (SELECT doc_id,
       |    CAST(256 + doc_id % 512 AS INTEGER) AS n,
       |    list_transform(range(1, length(hx)//2 + 1),
       |      i -> strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) * 16
       |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17) AS bytes
       |  FROM b),
       |s AS MATERIALIZED (SELECT doc_id, n,
       |    list_transform(range(0, n),
       |      i -> CAST((bytes[(i % len(bytes)) + 1] - 128) * 256 AS DOUBLE)) AS smp
       |  FROM d)
       |SELECT * FROM ($legs) ORDER BY doc_id, bin_hz""".stripMargin
  }

  /** mmd1: kernel two-sample MMD²_u — md5-ordered bounded samples,
    * nano pair distances, exact median-rank σ², pico RBF terms, exact
    * class means, md5 reassignment permutations with per-rep
    * renormalization; mirrors [[graft.ops.Pca.mmdTest]] step for step.
    */
  def mmd1Sql(m: Int = 128, reps: Int = 32, dim: Int = 64): String = {
    val d2 = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> (a.v[CAST(i AS INTEGER)] - b.v[CAST(i AS INTEGER)]) * " +
      "(a.v[CAST(i AS INTEGER)] - b.v[CAST(i AS INTEGER)]))), (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id AS id,
       |    CASE WHEN label % 2 = 0 THEN true ELSE false END AS is_p,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |base AS MATERIALIZED (SELECT id, is_p, v FROM (
       |    SELECT id, is_p, v, row_number() OVER (PARTITION BY is_p
       |      ORDER BY ${hex60("md5(CAST(id AS VARCHAR))")}, id) AS rk FROM e)
       |  WHERE rk <= $m),
       |pairs AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib,
       |    a.is_p AS pa, b.is_p AS pb,
       |    CAST(floor($d2 * 1e9 + 0.5) AS BIGINT) AS d2_nano
       |  FROM base a JOIN base b ON a.id < b.id),
       |np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pairs),
       |sigma AS (SELECT greatest(d2_nano, 1) AS sigma2_nano FROM (
       |    SELECT d2_nano, row_number() OVER (
       |      ORDER BY d2_nano, ia, ib) AS r FROM pairs), np
       |  WHERE r = (np.n + 1) // 2),
       |k AS MATERIALIZED (SELECT ia, ib, pa, pb,
       |    CAST(floor(exp(-(CAST(d2_nano AS DOUBLE)
       |      / CAST(sigma2_nano AS DOUBLE))) * 1e12 + 0.5) AS BIGINT) AS k_pico
       |  FROM pairs, sigma),
       |obs AS (SELECT
       |    CAST(CAST(sum(CASE WHEN pa AND pb THEN k_pico ELSE 0 END) AS BIGINT)
       |      // sum(CASE WHEN pa AND pb THEN 1 ELSE 0 END) AS BIGINT)
       |    + CAST(CAST(sum(CASE WHEN NOT pa AND NOT pb THEN k_pico ELSE 0 END) AS BIGINT)
       |      // sum(CASE WHEN NOT pa AND NOT pb THEN 1 ELSE 0 END) AS BIGINT)
       |    - 2 * CAST(CAST(sum(CASE WHEN pa != pb THEN k_pico ELSE 0 END) AS BIGINT)
       |      // sum(CASE WHEN pa != pb THEN 1 ELSE 0 END) AS BIGINT) AS mmd2_pico
       |  FROM k),
       |flips AS MATERIALIZED (SELECT base.id, r.r,
       |    ${hex60("md5(CAST(base.id AS VARCHAR) || ':' || CAST(r.r AS VARCHAR))")}
       |      % 2 = 0 AS f
       |  FROM base, (SELECT unnest(generate_series(1, $reps)) AS r) r),
       |wf AS (SELECT fa.r, fa.f AS fa, fb.f AS fb, k.k_pico
       |  FROM k JOIN flips fa ON fa.id = k.ia
       |  JOIN flips fb ON fb.id = k.ib AND fb.r = fa.r),
       |pr AS (SELECT r,
       |    CAST(sum(CASE WHEN fa AND fb THEN k_pico ELSE 0 END) AS BIGINT) AS sxx,
       |    CAST(sum(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT) AS nxx,
       |    CAST(sum(CASE WHEN NOT fa AND NOT fb THEN k_pico ELSE 0 END) AS BIGINT) AS syy,
       |    CAST(sum(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT) AS nyy,
       |    CAST(sum(CASE WHEN fa != fb THEN k_pico ELSE 0 END) AS BIGINT) AS sxy,
       |    CAST(sum(CASE WHEN fa != fb THEN 1 ELSE 0 END) AS BIGINT) AS nxy
       |  FROM wf GROUP BY 1),
       |pv AS (SELECT (sxx // nxx) + (syy // nyy) - 2 * (sxy // nxy) AS mmd_r
       |  FROM pr WHERE nxx > 0 AND nyy > 0 AND nxy > 0),
       |cnt AS (SELECT
       |    CAST(sum(CASE WHEN is_p THEN 1 ELSE 0 END) AS BIGINT) AS m_x,
       |    CAST(sum(CASE WHEN is_p THEN 0 ELSE 1 END) AS BIGINT) AS m_y
       |  FROM base)
       |SELECT cnt.m_x, cnt.m_y, sigma.sigma2_nano, obs.mmd2_pico,
       |  ((CAST(sum(CASE WHEN pv.mmd_r >= obs.mmd2_pico THEN 1 ELSE 0 END)
       |    AS BIGINT) + 1) * 1000000)
       |    // (CAST(count(*) AS BIGINT) + 1) AS p_micro
       |FROM pv, obs, cnt, sigma
       |GROUP BY 1, 2, 3, 4""".stripMargin
  }

  /** ood1: Mahalanobis OOD scores — the gnb1 model CTEs without
    * prior/log terms, raw-double class argmin (ties lower class),
    * micro-quantized top-k cut.
    */
  def ood1Sql(topK: Int = 20, dim: Int = 64, varFloor: Double = 1e-9): String =
    s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |rng AS (SELECT CAST(unnest(range(1, ${dim + 1})) AS INTEGER) AS i),
       |x AS (SELECT e.vec_id, e.label, rng.i, e.v[rng.i] AS xv FROM e CROSS JOIN rng),
       |st AS (SELECT label, i, avg(xv) AS mu,
       |    greatest(avg(xv * xv) - avg(xv) * avg(xv), $varFloor) AS vr
       |  FROM x GROUP BY 1, 2),
       |sl AS (SELECT label AS cls, list(mu ORDER BY i) AS mus,
       |    list(vr ORDER BY i) AS vrs FROM st GROUP BY 1),
       |sc AS (SELECT e.vec_id AS id, e.label, sl.cls,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, ${dim + 1}), i ->
       |        (v[CAST(i AS INTEGER)] - mus[CAST(i AS INTEGER)]) *
       |        (v[CAST(i AS INTEGER)] - mus[CAST(i AS INTEGER)]) /
       |        vrs[CAST(i AS INTEGER)])),
       |      (acc, t) -> acc + t) AS m2
       |  FROM e CROSS JOIN sl),
       |best AS (SELECT id, label, cls AS nearest_class, m2,
       |    row_number() OVER (PARTITION BY id ORDER BY m2 ASC, cls ASC) AS rn
       |  FROM sc)
       |SELECT id, label, nearest_class,
       |  CAST(floor(m2 * 1e6 + 0.5) AS BIGINT) AS m2_micro
       |FROM best WHERE rn = 1
       |ORDER BY m2_micro DESC, id LIMIT $topK""".stripMargin

  /** cons1: near-dup label consistency — the dd3p portable pair chain
    * joined to both sides' labels; unordered language-pair counts.
    */
  def cons1Sql(threshold: Double): String =
    s"""SELECT least(a.lang, b.lang) AS lang_a,
       |  greatest(a.lang, b.lang) AS lang_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CASE WHEN least(a.lang, b.lang) != greatest(a.lang, b.lang)
       |    THEN 1 ELSE 0 END AS is_conflict
       |FROM (${dd3pSql(threshold)}) p
       |JOIN documents a ON a.doc_id = p.d1
       |JOIN documents b ON b.doc_id = p.d2
       |GROUP BY 1, 2 ORDER BY lang_a, lang_b""".stripMargin

  /** al1: margin/entropy uncertainty sampling over the same posterior
    * table — smallest top-two margin first (the acquisition rule),
    * exact integer margins, pico entropy terms, total-order cut.
    */
  def al1Sql(k: Int = 25, dim: Int = 64, varFloor: Double = 1e-9): String =
    gnbPosteriorCtes(dim, varFloor) +
      s""",
         |acq AS (SELECT id, given,
         |    list(p_micro ORDER BY p_micro DESC, cls DESC) AS ps,
         |    CAST(sum(CASE WHEN p_micro > 0 THEN CAST(floor(
         |      -(p_micro / 1e6) * ln(p_micro / 1e6) * 1e12 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS ent
         |  FROM post GROUP BY 1, 2)
         |SELECT id, given,
         |  CAST(ps[1] - coalesce(ps[2], 0) AS BIGINT) AS margin_micro,
         |  ent // 1000 AS entropy_nano
         |FROM acq ORDER BY margin_micro, id LIMIT $k""".stripMargin

  private def gnbPosteriorCtes(dim: Int, varFloor: Double): String =
    s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |rng AS (SELECT CAST(unnest(range(1, ${dim + 1})) AS INTEGER) AS i),
       |x AS (SELECT e.vec_id, e.label, rng.i, e.v[rng.i] AS xv FROM e CROSS JOIN rng),
       |st AS (SELECT label, i, avg(xv) AS mu,
       |    greatest(avg(xv * xv) - avg(xv) * avg(xv), $varFloor) AS vr
       |  FROM x GROUP BY 1, 2),
       |sl AS (SELECT label AS cls, list(mu ORDER BY i) AS mus,
       |    list(vr ORDER BY i) AS vrs FROM st GROUP BY 1),
       |pr AS (SELECT label AS cls, CAST(count(*) AS DOUBLE) AS nc FROM e GROUP BY 1),
       |nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
       |sc AS (SELECT e.vec_id AS id, e.label AS given, sl.cls,
       |    ln(pr.nc / nt.n) - 0.5 * list_reduce(list_prepend(0.0,
       |      list_transform(range(1, ${dim + 1}), i ->
       |        ln(2 * pi() * vrs[CAST(i AS INTEGER)]) +
       |        (v[CAST(i AS INTEGER)] - mus[CAST(i AS INTEGER)]) *
       |        (v[CAST(i AS INTEGER)] - mus[CAST(i AS INTEGER)]) /
       |        vrs[CAST(i AS INTEGER)])),
       |      (acc, t) -> acc + t) AS score
       |  FROM e CROSS JOIN sl JOIN pr ON pr.cls = sl.cls CROSS JOIN nt),
       |ag AS MATERIALIZED (SELECT id, given, list(score ORDER BY cls) AS sarr,
       |    list(cls ORDER BY cls) AS carr FROM sc GROUP BY 1, 2),
       |ex AS (SELECT id, given, carr,
       |    list_transform(sarr, s -> exp(s - list_max(sarr))) AS exs FROM ag),
       |pt AS (SELECT id, given, carr, exs,
       |    list_reduce(list_prepend(0.0, exs), (a, b) -> a + b) AS tot FROM ex),
       |post AS MATERIALIZED (SELECT id, given, carr[CAST(u.i AS INTEGER)] AS cls,
       |    CAST(floor(exs[CAST(u.i AS INTEGER)] / tot * 1e6 + 0.5) AS BIGINT)
       |      AS p_micro
       |  FROM pt, unnest(generate_series(1, len(exs))) AS u(i))""".stripMargin

  /** mauve1: divergence frontier — the ann7/prune1 cosine-argmax cell
    * assignment, exact count histograms, and per-λ KL terms whose log
    * arguments are exact integer ratios; pico terms, nano display.
    */
  def mauve1Sql(k: Int = 16, dim: Int = 64, grid: Int = 8): String = {
    val cents = Similarity.fixedCentroids(k, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cent(cid, cv, cn) AS (VALUES $cents),
       |e AS (SELECT vec_id, CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS is_p,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, e.is_p, cent.cid, $centDot / cn AS c_sim
       |  FROM e CROSS JOIN cent),
       |best AS (SELECT vec_id, is_p, cid AS cell FROM (
       |    SELECT vec_id, is_p, cid, c_sim, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |cells AS (SELECT cell, CAST(sum(is_p) AS BIGINT) AS a,
       |    CAST(sum(1 - is_p) AS BIGINT) AS b FROM best GROUP BY 1),
       |tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
       |    CAST(sum(b) AS BIGINT) AS tb FROM cells),
       |lam AS (SELECT CAST(unnest(generate_series(1, ${grid - 1})) AS BIGINT) AS lam),
       |t AS (SELECT lam,
       |    CASE WHEN a > 0 THEN CAST(floor(
       |      (CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)) *
       |      ln(CAST($grid * a * tb AS DOUBLE) /
       |         CAST(lam * a * tb + ($grid - lam) * b * ta AS DOUBLE))
       |      * 1e12 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS tp,
       |    CASE WHEN b > 0 THEN CAST(floor(
       |      (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) *
       |      ln(CAST($grid * b * ta AS DOUBLE) /
       |         CAST(lam * a * tb + ($grid - lam) * b * ta AS DOUBLE))
       |      * 1e12 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS tq
       |  FROM cells, tot, lam)
       |SELECT lam, (lam * 1000000) // $grid AS lambda_micro,
       |  CAST(CAST(sum(tp) AS BIGINT) // 1000 AS BIGINT) AS klp_nano,
       |  CAST(CAST(sum(tq) AS BIGINT) // 1000 AS BIGINT) AS klq_nano
       |FROM t GROUP BY 1 ORDER BY lam""".stripMargin
  }

  /** prune1: SSL-prototype pruning — the ann7 cosine-argmax assignment
    * (ties to the larger cell id), per-row prototypicality
    * nano-quantized BEFORE ranking, per-cell floor drop shares, exact
    * integer means.
    */
  def prune1Sql(k: Int = 16, dim: Int = 64,
                dropMicro: Long = 250000L): String = {
    val cents = Similarity.fixedCentroids(k, dim).map { c =>
      s"(${c.id}, [${c.vec.mkString(", ")}], ${c.norm})"
    }.mkString(", ")
    val centDot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      "i -> cv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
    s"""WITH cent(cid, cv, cn) AS (VALUES $cents),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cs AS (SELECT e.vec_id, cent.cid, $centDot / cn AS c_sim
       |  FROM e CROSS JOIN cent),
       |best AS (SELECT vec_id, cid AS cell, c_sim FROM (
       |    SELECT vec_id, cid, c_sim, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY c_sim DESC, cid DESC) AS rn FROM cs)
       |  WHERE rn = 1),
       |vn AS (SELECT vec_id, sqrt(list_sum(list_transform(v, x -> x * x))) AS vnorm
       |  FROM e),
       |sn AS (SELECT b.vec_id AS id, b.cell,
       |    CASE WHEN vn.vnorm = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(floor(b.c_sim / vn.vnorm * 1e9 + 0.5) AS BIGINT) END AS s_nano
       |  FROM best b JOIN vn ON vn.vec_id = b.vec_id),
       |m AS (SELECT cell, s_nano,
       |    CAST(row_number() OVER (PARTITION BY cell ORDER BY s_nano DESC, id) AS BIGINT) AS r,
       |    CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n
       |  FROM sn),
       |mk AS (SELECT cell, s_nano, n,
       |    CASE WHEN r <= (n * $dropMicro) // 1000000 THEN 1 ELSE 0 END AS dropped
       |  FROM m)
       |SELECT CAST(cell AS BIGINT) AS cell,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(sum(dropped) AS BIGINT) AS n_dropped,
       |  CAST(count(*) - sum(dropped) AS BIGINT) AS n_kept,
       |  CAST(CASE WHEN sum(dropped) = 0 THEN 0
       |    ELSE sum(CASE WHEN dropped = 1 THEN s_nano ELSE 0 END) // sum(dropped)
       |    END AS BIGINT) AS mean_drop_nano,
       |  CAST(CASE WHEN count(*) = sum(dropped) THEN 0
       |    ELSE sum(CASE WHEN dropped = 0 THEN s_nano ELSE 0 END)
       |      // (count(*) - sum(dropped)) END AS BIGINT) AS mean_kept_nano
       |FROM mk GROUP BY cell ORDER BY cell""".stripMargin
  }

  /** tok1: WordPiece-vs-BPE segmentation agreement — the wp1 greedy
    * chain and the bpe merge chain side by side (CTE namespaces are
    * disjoint), joined on the word; occurrence-weighted agreement and
    * both fertilities as exact integer micro rates.
    */
  def tok1Sql(bpeCtesWithoutWith: String, bpeRounds: Int,
              vocabSize: Int = 256, maxPieceLen: Int = 4,
              maxWordLen: Int = 16): String =
    wordpieceBase(vocabSize, maxPieceLen, maxWordLen) +
      ",\n" + bpeCtesWithoutWith +
      s""",
         |wpv AS (SELECT w, cnt, np AS np_wp,
         |    replace(seg, ' ##', ',') AS wp_csv FROM g$maxWordLen),
         |bpv AS (SELECT w,
         |    CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS np_bpe,
         |    replace(trim(s), '  ', ',') AS pieces_csv FROM w$bpeRounds)
         |SELECT CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(cnt) AS BIGINT) AS n_occurrences,
         |  CAST(sum(CASE WHEN wp_csv = pieces_csv THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_agree_words,
         |  (CAST(sum(CASE WHEN wp_csv = pieces_csv THEN cnt ELSE 0 END)
         |    AS BIGINT) * 1000000) // CAST(sum(cnt) AS BIGINT)
         |    AS agree_occ_micro,
         |  (CAST(sum(cnt * np_wp) AS BIGINT) * 1000000)
         |    // CAST(sum(cnt) AS BIGINT) AS fert_wp_micro,
         |  (CAST(sum(cnt * np_bpe) AS BIGINT) * 1000000)
         |    // CAST(sum(cnt) AS BIGINT) AS fert_bpe_micro
         |FROM wpv JOIN bpv USING (w)""".stripMargin

  def wp2Sql(vocabSize: Int = 256, maxPieceLen: Int = 4,
             maxWordLen: Int = 16, topK: Int = 30): String =
    wordpieceBase(vocabSize, maxPieceLen, maxWordLen) +
      s""",
         |u AS (SELECT
         |    CASE WHEN p LIKE '##%' THEN substr(p, 3) ELSE p END AS piece,
         |    CASE WHEN p LIKE '##%' THEN 1 ELSE 0 END AS cont,
         |    CAST(sum(cnt) AS BIGINT) AS usage FROM (
         |    SELECT cnt, unnest(string_split(seg, ' ')) AS p
         |    FROM g$maxWordLen)
         |  GROUP BY 1, 2)
         |SELECT piece, cont, usage FROM u
         |ORDER BY usage DESC, cont, piece LIMIT $topK""".stripMargin
}
