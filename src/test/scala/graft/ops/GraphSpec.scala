package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PageRank laws: hand-computed single-iteration values with dangling
  * mass, symmetry fixpoints, probability conservation, and the handoff
  * edge derivation.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("uniform ring is a fixpoint: every node keeps pr = 1/3") {
    val pr = ranks(Graph.pageRank(edges((1L, 2L), (2L, 3L), (3L, 1L)), iterations = 10))
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("one iteration with a dangling node matches hand-computed values") {
    // A(1) -> B(2); B dangles. pr0 = (.5, .5); dangling mass = .5
    // prA = .15/2 + .85*(0 + .25) = 0.2875
    // prB = .15/2 + .85*(.5 + .25) = 0.7125
    val pr = ranks(Graph.pageRank(edges((1L, 2L)), iterations = 1))
    assert(math.abs(pr(1L) - 0.2875) < 1e-12)
    assert(math.abs(pr(2L) - 0.7125) < 1e-12)
  }

  test("personalizedPageRank: mass conserved, concentrates at the seed, seeds-only teleport") {
    import spark.implicits._
    // ring 1->2->3->1, seed = {1}: rank sums to 1, node 1 (the restart
    // target) holds the most mass, and with all-seeds it equals pageRank
    val ring = edges((1L, 2L), (2L, 3L), (3L, 1L))
    val seeds = Seq(1L).toDF("v")
    val df = Graph.personalizedPageRank(ring, seeds, iterations = 12)
    assert(math.abs(df.agg(sum("pr")).head.getDouble(0) - 1.0) < 1e-9)
    val pr = ranks(df)
    assert(pr(1L) > pr(2L) && pr(1L) > pr(3L))
    // one hand iteration: A(1)->B(2), seed {1}: pr0 = (1, 0); B dangles
    // but holds 0 mass. prA = .15*1 + .85*(0 + 0*1) = 0.15
    // prB = .15*0 + .85*(1 + 0) = 0.85
    val one = ranks(Graph.personalizedPageRank(edges((1L, 2L)),
      Seq(1L).toDF("v"), iterations = 1))
    assert(math.abs(one(1L) - 0.15) < 1e-12)
    assert(math.abs(one(2L) - 0.85) < 1e-12)
    // all nodes seeded == classic pageRank
    val all = Seq(1L, 2L, 3L).toDF("v")
    val classic = ranks(Graph.pageRank(ring, iterations = 6))
    val pprAll = ranks(Graph.personalizedPageRank(ring, all, iterations = 6))
    classic.foreach { case (v, p) => assert(math.abs(pprAll(v) - p) < 1e-12) }
    // seeds absent from the graph are ignored; none present -> error
    val withGhost = Seq(1L, 99L).toDF("v")
    assert(ranks(Graph.personalizedPageRank(ring, withGhost,
      iterations = 2)).values.sum > 0.99)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(ring, Seq(42L).toDF("v"), iterations = 1)
    }
  }

  test("rank is conserved (sums to 1) and favors the sink hub") {
    // star: everyone points at 9, which points back at 0
    val star = (0L to 8L).map(i => (i, 9L)) :+ (9L, 0L)
    val df = Graph.pageRank(edges(star: _*), iterations = 12)
    val total = df.agg(sum("pr")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
    val pr = ranks(df)
    // the 9<->0 two-cycle oscillates at finite iteration counts, so only
    // the order-free laws are asserted: both cycle members dominate the
    // teleport-only leaves, and the leaves stay exactly symmetric
    assert(pr(9L) > pr(1L) * 5 && pr(0L) > pr(1L) * 5)
    assert((1L to 8L).forall(i => math.abs(pr(i) - pr(1L)) < 1e-12)) // leaf symmetry
  }

  test("handoffEdges links consecutive distinct users per stream, deduplicated") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "a", 10L, ts("2024-01-01 10:00:00")),
      (2L, "a", 20L, ts("2024-01-01 10:01:00")),
      (3L, "a", 20L, ts("2024-01-01 10:02:00")), // same user twice: no self-loop
      (4L, "a", 10L, ts("2024-01-01 10:03:00")),
      (5L, "b", 30L, ts("2024-01-01 10:00:30")),
      (6L, "b", 10L, ts("2024-01-01 10:01:30")),
      (7L, "a", 20L, ts("2024-01-01 10:04:00")) // repeat 10->20: deduped
    ).toDF("event_id", "event_type", "user_id", "ts")
    val got = Graph.handoffEdges(ev, "event_type", "user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 20L), (20L, 10L), (30L, 10L)))
  }

  test("triangleStats: K4 has 4 triangles and clustering 1; a path has none") {
    import spark.implicits._
    // K4 given with duplicates and both directions — canonicalization
    // must collapse them before counting
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (4L, 3L)).toDF("src", "dst")
    val r = Graph.triangleStats(k4).collect().head
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_wedges") === 12L) // 4 nodes x C(3,2)
    assert(r.getAs[Long]("triangles") === 4L)
    assert(r.getAs[Double]("clustering") === 1.0)

    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val p = Graph.triangleStats(path).collect().head
    assert(p.getAs[Long]("triangles") === 0L)
    assert(p.getAs[Double]("clustering") === 0.0)
  }

  test("triangleStats matches the naive three-way join on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (round <- 1 to 3) {
      val edges = (for {
        a <- 0L until 25L; b <- (a + 1) until 25L
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toDF("src", "dst")
      val got = Graph.triangleStats(edges).collect().head.getAs[Long]("triangles")
      val und = edges.select(col("src").as("a"), col("dst").as("b"))
      val want = und.as("e1")
        .join(und.as("e2"), col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
        .join(und.as("e3"), col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
        .count()
      assert(got === want, s"round $round: oriented wedge count diverged from naive")
    }
  }

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("label propagation: disjoint triangles converge to their min ids, never mixing") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L))
    val got = labels(Graph.labelPropagation(e, iterations = 5))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("label propagation round 1: neighbors' majority with min-label tiebreak, synchronous") {
    // star center 5, leaves 1 and 2: leaves see only {5}; center ties {1,2} -> 1
    val got = labels(Graph.labelPropagation(edges((5L, 1L), (5L, 2L)), iterations = 1))
    assert(got === Map(1L -> 5L, 2L -> 5L, 5L -> 1L))
    // direction of the input edge must not matter (undirected adjacency)
    val rev = labels(Graph.labelPropagation(edges((1L, 5L), (2L, 5L)), iterations = 1))
    assert(rev === got)
  }

  test("label propagation is deterministic across runs") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 6L))
    val a = labels(Graph.labelPropagation(e, iterations = 4))
    val b = labels(Graph.labelPropagation(e, iterations = 4))
    assert(a === b)
  }

  test("kCore: a path dissolves under k=2 peeling, a triangle survives with degree 2") {
    // path 1-2-3-4 loses an endpoint per round until empty;
    // triangle 5-6-7 is its own 2-core
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
    val got = Graph.kCore(e, k = 2, rounds = 8).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("core_deg")).toMap
    assert(got === Map(5L -> 2L, 6L -> 2L, 7L -> 2L))
  }

  test("kCore: peeling is iterative, not a one-shot degree filter") {
    // star center 9 with leaves 1..3 plus a triangle hanging off leaf 1:
    // one-shot deg>=2 keeps the center (deg 3), but peeling removes
    // leaves 2,3 first and then the center (deg 1 after) — only the
    // triangle remains
    val e = edges((9L, 1L), (9L, 2L), (9L, 3L), (1L, 10L), (10L, 11L), (1L, 11L))
    val got = Graph.kCore(e, k = 2, rounds = 8).collect()
      .map(r => r.getAs[Long]("v")).toSet
    assert(got === Set(1L, 10L, 11L))
  }

  test("modularity: two disjoint triangles score exactly 0.5") {
    import spark.implicits._
    // textbook case: perfect 2-community partition of two triangles
    // Q = 2 * (3/6 - (6/12)^2) = 0.5
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("d1", "d2")
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("v", "cluster")
    val r = Graph.modularity(tri, cl).head()
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
    // the same graph under ONE cluster scores exactly 0 (the null model)
    val one = cl.select(col("v"), lit(1L).as("cluster"))
    val r0 = Graph.modularity(tri, one).head()
    assert(math.abs(r0.getDouble(2)) < 1e-12, "single-cluster Q must be 0")
  }

  test("markovSteady: two-state chain converges to the analytic stationary mix") {
    val s = spark
    import s.implicits._
    // P(a->b) = 1, P(b->a) = 1/2, P(b->b) = 1/2 → stationary (1/3, 2/3)
    val tr = (Seq.fill(4)(("a", "b")) ++ Seq.fill(2)(("b", "a")) ++
      Seq.fill(2)(("b", "b"))).toDF("p", "t")
    val got = Graph.markovSteady(tr, "p", "t", iters = 40).orderBy("state")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p_steady")).toMap
    assert(math.abs(got("a") - 1.0 / 3.0) < 1e-6, s"a: ${got("a")}")
    assert(math.abs(got("b") - 2.0 / 3.0) < 1e-6, s"b: ${got("b")}")
    // an absorbing sink leaks nothing INTO other states: all surviving
    // mass ends on the sink
    val abs = (Seq(("x", "y"), ("y", "y"), ("y", "y"))).toDF("p", "t")
    val g2 = Graph.markovSteady(abs, "p", "t", iters = 30).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p_steady")).toMap
    assert(g2("x") === 0.0 && g2("y") > 0.99)
    // determinism: exact integer rounds reproduce bit-for-bit
    val again = Graph.markovSteady(tr, "p", "t", iters = 40).orderBy("state")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p_steady")).toMap
    assert(again === got)
  }

  test("kHopDistances: exact hops on a directed path, bounded by rounds") {
    import spark.implicits._
    // 1 → 2 → 3 → 4 → 5 → 6, plus a shortcut 1 → 4
    val ed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("v")
    val got = Graph.kHopDistances(ed, seeds, rounds = 3).orderBy("v").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // shortcut wins for 4 (1 hop, not 3) and pulls 5/6 to 2/3 hops;
    // without it 6 would be 5 hops away and absent at rounds = 3
    assert(got === Array((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L),
      (5L, 2L), (6L, 3L)))
    // a seed inside a cycle keeps h=0 (min with its own relaxations)
    val cyc = Seq((7L, 8L), (8L, 7L)).toDF("src", "dst")
    val g2 = Graph.kHopDistances(cyc, Seq(7L).toDF("v"), rounds = 4)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(g2 === Array((7L, 0L), (8L, 1L)))
  }

  test("wlRefinement: regular graphs never individualize; isomorphic graphs share the fingerprint") {
    // two disjoint triangles: 2-regular → one label at every round
    val tris = edges((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L))
    val t = Graph.wlRefinement(tris, rounds = 2).orderBy("round").collect()
    assert(t.map(_.getAs[Long]("n_labels")).toSeq === Seq(1L, 1L, 1L))
    assert(t.forall(_.getAs[Long]("n_nodes") === 6L))
    // a path individualizes ends vs middle and stabilizes at 2 labels
    val p1 = Graph.wlRefinement(edges((1L, 2L), (2L, 3L)), rounds = 2)
      .orderBy("round").collect()
    assert(p1.map(_.getAs[Long]("n_labels")).toSeq === Seq(2L, 2L, 2L))
    // isomorphism invariance: a relabeled path has the SAME fingerprint
    val p2 = Graph.wlRefinement(edges((30L, 10L), (10L, 20L)), rounds = 2)
      .orderBy("round").collect()
    assert(p1.head.getAs[Long]("graph_fp") === p2.head.getAs[Long]("graph_fp"))
    // a triangle (different shape, same node count) does not
    val tri = Graph.wlRefinement(edges((1L, 2L), (2L, 3L), (3L, 1L)), rounds = 2)
      .collect().head.getAs[Long]("graph_fp")
    assert(tri !== p1.head.getAs[Long]("graph_fp"))
    spark.catalog.clearCache()
  }

  test("adamicAdar: 4-cycle scores both diagonals 2/ln2; edges never scored") {
    val ed = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = Graph.adamicAdar(ed, maxDegree = 64, topK = 10)
      .orderBy("u", "v").collect()
    assert(got.length === 2) // only the two non-edges (1,3), (2,4)
    got.foreach { r =>
      assert(r.getAs[Long]("n_common") === 2L)
      // 2·floor(1e12/ln 2 + .5)/1e12 rounded to 6
      assert(r.getAs[Double]("score") === 2.88539)
    }
    assert(got.map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSeq ===
      Seq((1L, 3L), (2L, 4L)))
  }

  test("adamicAdar: hub cap drops wedges through high-degree centers") {
    // star: center 0 connected to 1..5 (deg 5) — with maxDegree=4 the
    // only possible common neighbor is capped out, so no pairs emerge
    val ed = edges((1L to 5L).map(i => (0L, i)): _*)
    assert(Graph.adamicAdar(ed, maxDegree = 4, topK = 10).count() === 0L)
    // raising the cap re-admits the center: C(5,2)=10 pairs at 1/ln5
    val up = Graph.adamicAdar(ed, maxDegree = 8, topK = 100).collect()
    assert(up.length === 10)
    val w = math.floor(1e12 / math.log(5.0) + 0.5) / 1e12
    up.foreach(r => assert(math.abs(r.getAs[Double]("score") - w) < 1e-6))
  }

  test("hits: star center is the sole authority of an in-star, sole hub of an out-star") {
    // out-star 0 -> 1..4: node 0 is the only hub, 1..4 equal authorities
    val outStar = Graph.hits(edges((1L to 4L).map(i => (0L, i)): _*), iterations = 4)
      .collect().map(r => r.getAs[Long]("v") ->
        (r.getAs[Double]("hub"), r.getAs[Double]("authority"))).toMap
    assert(math.abs(outStar(0L)._1 - 1.0) < 1e-12)
    assert(math.abs(outStar(0L)._2 - 0.0) < 1e-12)
    (1L to 4L).foreach { i =>
      assert(math.abs(outStar(i)._2 - 0.25) < 1e-12)
      assert(math.abs(outStar(i)._1 - 0.0) < 1e-12)
    }
    // L1 invariants on a less regular graph: both scores sum to 1
    val g = Graph.hits(edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L)),
      iterations = 6).collect()
    assert(math.abs(g.map(_.getAs[Double]("hub")).sum - 1.0) < 1e-9)
    assert(math.abs(g.map(_.getAs[Double]("authority")).sum - 1.0) < 1e-9)
    spark.catalog.clearCache()
  }

  test("localClusteringHistogram: triangle = all 1.0, path = all 0.0") {
    val tri = Graph.localClusteringHistogram(
      edges((1L, 2L), (2L, 3L), (3L, 1L))).collect()
    assert(tri.length === 1)
    assert(tri.head.getAs[Long]("bucket") === 9L) // lcc=1 clamps to top bucket
    assert(tri.head.getAs[Long]("n_nodes") === 3L)
    assert(math.abs(tri.head.getAs[Double]("mean_lcc") - 1.0) < 1e-9)
    // path 1-2-3: only node 2 has deg >= 2; no triangle -> lcc 0
    val path = Graph.localClusteringHistogram(edges((1L, 2L), (2L, 3L)))
      .collect()
    assert(path.length === 1)
    assert(path.head.getAs[Long]("bucket") === 0L)
    assert(path.head.getAs[Long]("n_defined") === 1L)
    assert(path.head.getAs[Double]("mean_lcc") === 0.0)
    // kite: triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, tri 1
    // -> lcc = 1/3 (bucket 3); nodes 1,2 have lcc 1
    val kite = Graph.localClusteringHistogram(
      edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))).collect()
    val byB = kite.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_nodes")).toMap
    assert(byB === Map(9L -> 2L, 3L -> 1L))
    spark.catalog.clearCache()
  }

  test("degreeAssortativity: star graph is maximally disassortative (r = -1)") {
    val star = Graph.degreeAssortativity(edges((1L to 5L).map(i => (0L, i)): _*))
      .head()
    assert(star.getAs[Long]("n_nodes") === 6L)
    assert(star.getAs[Long]("n_edges") === 5L)
    assert(math.abs(star.getAs[Double]("assortativity") - (-1.0)) < 1e-9)
    // direction and duplicate orientation must not matter
    val dup = Graph.degreeAssortativity(
      edges((1L to 5L).flatMap(i => Seq((0L, i), (i, 0L))): _*)).head()
    assert(math.abs(dup.getAs[Double]("assortativity") - (-1.0)) < 1e-9)
    spark.catalog.clearCache()
  }

  test("spectralBipartition: barbell graph cuts at the bridge") {
    // two triangles {0,1,2} and {3,4,5} joined by the single edge 2-3:
    // the normalized cut is the bridge, conductance = 1/7
    val e = edges((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val r = Graph.spectralBipartition(e).head()
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_neg") === 3L)
    assert(r.getAs[Long]("cut_edges") === 1L)
    assert(r.getAs[Long]("vol_pos") === 7L)
    assert(r.getAs[Long]("vol_neg") === 7L)
    assert(r.getAs[Long]("conductance_nano") === 1000000000L / 7L)
    // sign pattern stabilizes well before the 12-round cap: the
    // early-exit must fire and report the round it latched on
    val ru = r.getAs[Long]("rounds_used")
    assert(ru >= 1L && ru < 12L, s"expected early exit, used $ru rounds")
    spark.catalog.clearCache()
  }
}
