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
}
