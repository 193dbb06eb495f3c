package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Laws of the real P6 codec: synthesis round-trips through the
  * parser, the parser rejects malformed payloads, and nearest-neighbor
  * resize preserves constant images exactly.
  */
class PpmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("makePpm round-trips through parsePpm with the synthesized dimensions") {
    val payload = Multimodal.makePpm(37L, "hello world, bytes cycle".getBytes("UTF-8"))
    val p = Multimodal.parsePpm(payload).get
    assert(p.width === (8 + 37 % 24) && p.height === (8 + (37 / 5) % 24))
    assert(payload.length === p.dataOffset + p.width * p.height * 3)
  }

  test("parsePpm rejects wrong magic, truncated data, and non-255 maxval") {
    assert(Multimodal.parsePpm("JFIF....".getBytes("US-ASCII")).isEmpty)
    val good = Multimodal.makePpm(5L, "abcdef".getBytes("UTF-8"))
    assert(Multimodal.parsePpm(good.dropRight(1)).isEmpty)
    assert(Multimodal.parsePpm("P6\n4 4\n127\n".getBytes("US-ASCII") ++
      Array.fill[Byte](48)(1)).isEmpty)
  }

  test("resize of a constant-color image is the same color; stats sum exactly") {
    import spark.implicits._
    // 12x9 solid (10, 20, 30) image
    val rgb = Array[Byte](10.toByte, 20.toByte, 30.toByte)
    val data = Array.tabulate[Byte](12 * 9 * 3)(i => rgb(i % 3))
    val payload = "P6\n12 9\n255\n".getBytes("US-ASCII") ++ data
    val ds = Seq(Multimodal.MediaRow(1L, "image", payload)).toDS()
    val t = Multimodal.resizePpm(ds, side = 4).collect().head
    assert(t.src_w === 12 && t.src_h === 9)
    assert((t.t_r_sum, t.t_g_sum, t.t_b_sum) === (16L * 10, 16L * 20, 16L * 30))
    // re-encoded thumbnail is itself a valid, decodable P6
    val tp = Multimodal.parsePpm(t.thumb).get
    assert(tp.width === 4 && tp.height === 4)
    val stats = Multimodal.ppmStats(Seq(Multimodal.MediaRow(2L, "image", payload)).toDS())
      .collect().head
    assert((stats.r_sum, stats.g_sum, stats.b_sum) ===
      (108L * 10, 108L * 20, 108L * 30))
  }

  test("imageQuality: constant image has zero contrast; exposure counts exact") {
    import spark.implicits._
    // solid mid-gray (100,100,100): luma = 1000*100 = 100000 per px
    val gray = "P6\n6 4\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](6 * 4 * 3)(100.toByte)
    val g = Multimodal.imageQuality(
      Seq(Multimodal.MediaRow(1L, "image", gray)).toDS()).collect().head
    assert(g.n_px === 24)
    assert(g.luma_sum === 24L * 100000)
    // zero contrast: n*sq_sum == sum^2 exactly
    assert(g.luma_sq_sum * 24 === g.luma_sum * g.luma_sum)
    assert(g.luma_min === 100000 && g.luma_max === 100000)
    assert(g.n_under === 0L && g.n_over === 0L)
    // black + white halves: all pixels flagged, full dynamic range
    val bw = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte)
    val b = Multimodal.imageQuality(
      Seq(Multimodal.MediaRow(2L, "image", bw)).toDS()).collect().head
    assert(b.luma_min === 0 && b.luma_max === 255000)
    assert(b.n_under === 1L && b.n_over === 1L)
  }

  test("aHash: constant image hashes all-ones; banded join equals brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // constant image: every cell average equals the mean -> all bits 1
    val const = Multimodal.MediaRow(1L, "image",
      "P6\n12 9\n255\n".getBytes("US-ASCII") ++
        Array.tabulate[Byte](12 * 9 * 3)(_ => 50.toByte))
    val constBits = Multimodal.aHashPpm(spark.createDataset(Seq(const))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
      .collect().head.ahash_bits
    assert(constBits === "1" * 64)

    // pigeonhole losslessness: banded candidates reproduce the n²
    // hamming join exactly on a corpus with planted one-char variants
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(40)
    val planted = base.select((col("doc_id") + 12000).as("doc_id"),
      concat(lit("Q"), expr("substring(text, 2)")).as("text"))
    val hashes = Multimodal.aHashPpm(
      Multimodal.ppmFromDocuments(base.unionByName(planted)))
    val banded = Multimodal.imageNearDupPairs(hashes, maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = hashes.toDF().as("a")
      .join(hashes.toDF().as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("cast(size(filter(sequence(1, 64), i -> " +
          "substring(a.ahash_bits, i, 1) != substring(b.ahash_bits, i, 1))) as bigint)")
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute, "band join lost or invented a pair")
    assert(banded.nonEmpty, "degenerate fixture: no near-dup image pairs")
    // planted variants dominate: every found pair is (i, i+12000)
    assert(banded.forall { case (d1, d2, _) => d2 == d1 + 12000 })
  }
}
