package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the quantized power-iteration PCA: the result is a unit
  * eigenvector of the quantized covariance (residual law), it aligns
  * with a planted dominant direction, and projection reproduces the
  * hand fold.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 vectors along (3,4,0...)/5 with small deterministic jitter in dim 2
  private def planted(dim: Int = 8): org.apache.spark.sql.DataFrame =
    Seq.tabulate(40) { k =>
      val t = (k - 20).toFloat / 4f
      val v = Array.fill(dim)(0f)
      v(0) = 0.6f * t; v(1) = 0.8f * t; v(2) = (k % 3 - 1) * 0.05f
      (k.toLong, v)
    }.toDF("vec_id", "embedding")

  test("returns a unit vector; C·v = λ·v within power-iteration tolerance") {
    val e = planted()
    val rows = Pca.topComponentQuantized(e, iters = 30).orderBy("dim_idx").collect()
    val v = rows.map(_.getDouble(1))
    val eig = rows.head.getDouble(2)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    // rebuild the quantized covariance independently and check the residual
    val xd = transform(col("embedding"), _.cast("double"))
    val gmax = e.select(max(aggregate(xd, lit(0.0),
      (a, b) => greatest(a, abs(b))))).head.getDouble(0)
    val q = e.select(transform(xd,
        x => round(x / lit(gmax) * lit(127.0)).cast("long")).as("q"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = q.length.toLong
    val dim = v.length
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val s2 = q.map(r => r(i) * r(j)).sum
      val s1i = q.map(_(i)).sum
      val s1j = q.map(_(j)).sum
      (n * s2 - s1i * s1j).toDouble
    }
    val cv = Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * v(j)).sum)
    val resid = math.sqrt(cv.zip(v).map { case (a, b) => (a - eig * b) * (a - eig * b) }.sum)
    assert(resid < 1e-6 * math.abs(eig), s"residual $resid vs eig $eig")
  }

  test("aligns with the planted dominant direction (3,4)/5") {
    val rows = Pca.topComponentQuantized(planted(), iters = 30)
      .orderBy("dim_idx").collect().map(_.getDouble(1))
    val cosine = math.abs(rows(0) * 0.6 + rows(1) * 0.8)
    assert(cosine > 0.999, s"|cos| with planted axis = $cosine")
  }

  test("project reproduces the explicit quantized fold") {
    val e = planted()
    val loadings = Seq.tabulate(8)(i => if (i == 0) 1.0 else 0.0)
    val got = Pca.project(e, loadings, gmax = 4.0)
      .orderBy("vec_id").collect()
    // score = round(x0 / 4 * 127) * 1.0
    val want = e.orderBy("vec_id").collect().map { r =>
      math.round(r.getSeq[Float](1).head.toDouble / 4.0 * 127.0).toDouble
    }
    got.map(_.getDouble(1)).zip(want).foreach { case (g, w) =>
      assert(g === w)
    }
  }

  test("moment tables: split + merge is bit-identical to one-shot") {
    val e = planted().cache()
    val dim = 8
    val xd = org.apache.spark.sql.functions.transform(
      col("embedding"), _.cast("double"))
    val gmax = e.select(max(aggregate(xd, lit(0.0),
      (a, b) => greatest(a, abs(b))))).head.getDouble(0)
    val m1 = Pca.momentTable(e.filter(col("vec_id") < 15), gmax, dim)
    val m2 = Pca.momentTable(e.filter(col("vec_id") >= 15), gmax, dim)
    val merged = Pca.topComponentFromMoments(
      Pca.mergeMoments(m1, m2), dim).orderBy("dim_idx").collect()
    val oneShot = Pca.topComponentQuantized(e).orderBy("dim_idx").collect()
    merged.zip(oneShot).foreach { case (a, b) =>
      assert(a.getInt(0) === b.getInt(0))
      assert(a.getDouble(1) === b.getDouble(1), "loading must be bit-equal")
      assert(a.getDouble(2) === b.getDouble(2), "eigval must be bit-equal")
    }
  }

  test("weatTest: aligned targets/attributes give d = 2, tiny p; swap negates S") {
    // X (label 0) and A (label 2) on e1; Y (1) and B (3) on e2:
    // s(x) = +1e9, s(y) = -1e9 -> S = 8e9, sd = 1e9, d = 2 (the max)
    val mk = (lbl: Int, base: Int, v: Seq[Float]) =>
      (0 until 4).map(i => ((base + i).toLong, v, lbl))
    val vecs = (mk(0, 0, Seq(1f, 0f)) ++ mk(1, 100, Seq(0f, 1f)) ++
      mk(2, 200, Seq(1f, 0f)) ++ mk(3, 300, Seq(0f, 1f)))
      .toDF("vec_id", "embedding", "label")
    val r = Pca.weatTest(vecs, 0L, 1L, 2L, 3L).head()
    assert(r.getAs[Long]("s_stat_nano") === 8000000000L)
    assert(r.getAs[Long]("effect_nano") === 2000000000L)
    assert(r.getAs[Long]("p_micro") <= 200000L) // sign-flips rarely reach |S|
    // swapping the attribute sets negates the association
    val sw = Pca.weatTest(vecs, 0L, 1L, 3L, 2L).head()
    assert(sw.getAs[Long]("s_stat_nano") === -8000000000L)
  }

  test("mmdTest: separated clusters give a large MMD with the minimal p") {
    import spark.implicits._
    // P tight around e1, Q tight around e2: every cross-pair is far,
    // every within-pair near -> MMD^2 near its 1e12-pico maximum and
    // no permutation can reach it
    val vecs = (0L until 40L).map { i =>
      val p = i < 20L
      (i, Seq.tabulate(4)(d =>
        (if (p == (d == 0)) 5.0f else 0.0f) + (i % 3).toFloat * 0.05f), 0)
    }.toDF("vec_id", "embedding", "label")
    val r = Pca.mmdTest(vecs,
      org.apache.spark.sql.functions.col("vec_id") < 20, m = 20).head()
    assert(r.getAs[Long]("m_x") === 20L && r.getAs[Long]("m_y") === 20L)
    assert(r.getAs[Long]("mmd2_pico") > 500000000000L) // > 0.5 of the max 1.0
    assert(r.getAs[Long]("p_micro") === 1000000L / 33L) // (0+1)/(32+1), add-one
  }

  test("alignmentUniformity: identical-within-label clusters align at 0") {
    val vecs = (0 until 8).map { i =>
      (i.toLong, if (i % 2 == 0) Seq(1f, 0f) else Seq(0f, 1f), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val r = Pca.alignmentUniformity(vecs).head()
    assert(r.getAs[Long]("n_pos_pairs") === 4L)
    assert(r.getAs[Long]("n_rand_pairs") === 4L)
    assert(r.getAs[Long]("alignment_nano") === 0L) // same-label pairs identical
    // random pairs are same (term 1) or orthogonal (term e^-4):
    // uniformity lies in [-4, 0]
    val u = r.getAs[Long]("uniformity_nano")
    assert(u <= 0L && u >= -4000000000L)
  }
}
