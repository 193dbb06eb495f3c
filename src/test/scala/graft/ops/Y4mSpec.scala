package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Laws of the real Y4M codec: synthesis round-trips through the
  * header/frame-marker walk, the parser tolerates per-frame params and
  * rejects malformed streams, and the luma sums match hand-computed
  * values on a crafted stream.
  */
class Y4mSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("makeY4m round-trips through parseY4m with the synthesized format") {
    val payload = Multimodal.makeY4m(23L, "cycle these bytes".getBytes("UTF-8"))
    val v = Multimodal.parseY4m(payload).get
    assert(v.width === 16 + (23 % 16) * 2)
    assert(v.height === 16 + ((23 / 7) % 16) * 2)
    assert(v.nFrames === (2 + 23 % 5))
    assert(v.fpsNum === 25 && v.fpsDen === 1)
    // every parsed offset lands exactly after its FRAME\n marker and
    // the stream is fully consumed
    val header = s"YUV4MPEG2 W${v.width} H${v.height} F25:1 Ip A1:1 C420jpeg\n".length
    v.frameOffsets.zipWithIndex.foreach { case (off, k) =>
      assert(off === header + (k + 1) * 6 + k * v.frameSize)
    }
    assert(payload.length === v.frameOffsets.last + v.frameSize)
  }

  test("parser tolerates per-frame params and interlacing/aspect tags") {
    val w = 4; val h = 2; val fs = w * h * 3 / 2
    val data = Array.tabulate[Byte](fs)(i => (i + 1).toByte)
    val s = s"YUV4MPEG2 W$w H$h F30000:1001 It A4:3 Xcustom\n".getBytes("US-ASCII") ++
      "FRAME Ixyz\n".getBytes("US-ASCII") ++ data ++
      "FRAME\n".getBytes("US-ASCII") ++ data
    val v = Multimodal.parseY4m(s).get
    assert(v.width === 4 && v.height === 2 && v.nFrames === 2)
    assert(v.fpsNum === 30000 && v.fpsDen === 1001)
  }

  test("parser rejects wrong magic, odd dims, truncated frames, non-420 chroma") {
    assert(Multimodal.parseY4m("RIFF....".getBytes("US-ASCII")).isEmpty)
    val good = Multimodal.makeY4m(5L, "abc".getBytes("UTF-8"))
    assert(Multimodal.parseY4m(good.dropRight(1)).isEmpty, "truncated last frame")
    val odd = "YUV4MPEG2 W3 H2 F25:1\nFRAME\n123456789".getBytes("US-ASCII")
    assert(Multimodal.parseY4m(odd).isEmpty, "odd width breaks the 4:2:0 rule")
    val c444 = ("YUV4MPEG2 W2 H2 F25:1 C444\nFRAME\n" + "x" * 12).getBytes("US-ASCII")
    assert(Multimodal.parseY4m(c444).isEmpty, "non-420 chroma uses another size rule")
  }

  test("sampleFramesY4m luma sums and offsets match hand-computed values") {
    import spark.implicits._
    // text = two bytes 'a','b' (97, 98): the continuous cycle makes
    // frame k's luma sum depend on (k*frameSize) % 2 parity
    val payload = Multimodal.makeY4m(0L, "ab".getBytes("UTF-8"))
    val v = Multimodal.parseY4m(payload).get // 16x16, 2 frames at doc 0
    val out = Multimodal.sampleFramesY4m(
      Seq(Multimodal.MediaRow(0L, "video", payload)).toDS(), stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(out.length === v.nFrames)
    out.foreach { f =>
      val n = v.width * v.height
      val start = f.frame_idx * v.frameSize
      val expected = (0 until n).map(j => if ((start + j) % 2 == 0) 97L else 98L).sum
      assert(f.y_sum === expected, s"frame ${f.frame_idx}")
      assert(f.data_offset === v.frameOffsets(f.frame_idx).toLong)
      assert(f.frame_n_bytes === v.frameSize)
    }
  }

  test("sceneCutsY4m flags exactly the frame transitions above the mean-delta threshold") {
    import spark.implicits._
    // three docs' synthetic videos; recompute every frame-pair delta
    // from the decoded sums and check the cut set equals the
    // above-threshold set (and that a huge threshold yields none)
    val media = Seq(1L, 3L, 7L).map(id =>
      Multimodal.MediaRow(id, "video",
        Multimodal.makeY4m(id, s"text for doc $id".getBytes("UTF-8")))).toDS()
    val frames = Multimodal.sampleFramesY4m(media, stride = 1).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    val thr = 0.05
    val expected = frames.toSeq.flatMap { case (id, fs) =>
      fs.sliding(2).collect {
        case Array(a, b)
          if math.abs(b.y_sum - a.y_sum).toDouble >= a.width * a.height * thr =>
            (id, b.frame_idx)
      }
    }.toSet
    val got = Multimodal.sceneCutsY4m(media, meanDelta = thr).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"))).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "degenerate fixture: no cuts at the test threshold")
    assert(Multimodal.sceneCutsY4m(media, meanDelta = 256.0).count() === 0)
  }

  test("videoFingerprint: 64 bits from frame-0 luma; banded near-dup equals brute force") {
    import spark.implicits._
    // ids differing by 112 share both dimension generators, so the
    // one-byte text change perturbs a few grid cells only; id 5 has
    // different dims and unrelated content
    val tA = "the quick brown fox jumps over the lazy dog again and again".getBytes("UTF-8")
    val tB = tA.clone(); tB(4) = 'Q'.toByte
    val tC = "completely different video payload bytes here".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRow(3L, "video", Multimodal.makeY4m(3L, tA)),
      Multimodal.MediaRow(115L, "video", Multimodal.makeY4m(115L, tB)),
      Multimodal.MediaRow(5L, "video", Multimodal.makeY4m(5L, tC))).toDS()
    val fps = Multimodal.videoFingerprint(media)
    val all = fps.collect().map(f => f.doc_id -> f.vhash_bits).toMap
    assert(all.values.forall(b => b.length == 64 && b.forall(c => c == '0' || c == '1')))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val banded = Multimodal.videoNearDupPairs(fps, maxDist = 5, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      x <- all.keys; y <- all.keys if x < y
      d = ham(all(x), all(y)) if d <= 5
    } yield (x, y, d.toLong)).toSet
    assert(banded === brute, "banded pigeonhole must equal the n² form")
    assert(banded.exists { case (a, b, _) => a == 3L && b == 115L },
      "the one-byte variant with preserved dims must pair")
    assert(!banded.exists { case (a, b, _) => a == 5L || b == 5L },
      "the unrelated clip must not pair")
  }
}
