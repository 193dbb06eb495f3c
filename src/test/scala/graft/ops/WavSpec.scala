package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Laws of the real WAV codec: synthesis round-trips through the
  * chunk-walking parser, the parser survives extra chunks and rejects
  * malformed containers, and the integer features match hand-computed
  * values on a crafted wave.
  */
class WavSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("makeWav round-trips through parseWav with the synthesized format") {
    val payload = Multimodal.makeWav(300L, "cycle these bytes".getBytes("UTF-8"))
    val w = Multimodal.parseWav(payload).get
    assert(w.sampleRate === 8000 && w.nChannels === 1 && w.bitsPerSample === 16)
    assert(w.nSamples === 256 + 300 % 512)
    assert(payload.length === w.dataOffset + w.nSamples * 2)
  }

  test("parser walks unknown chunks instead of assuming the 44-byte layout") {
    val base = Multimodal.makeWav(5L, "abc".getBytes("UTF-8"))
    // splice a LIST chunk between fmt and data
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++
      "INFOab".getBytes("US-ASCII")
    val spliced = base.slice(0, 36) ++ junk ++ base.drop(36)
    // fix the RIFF size field
    val fixed = spliced.clone()
    val riffSize = spliced.length - 8
    fixed(4) = (riffSize & 0xff).toByte
    fixed(5) = ((riffSize >> 8) & 0xff).toByte
    fixed(6) = ((riffSize >> 16) & 0xff).toByte
    fixed(7) = ((riffSize >> 24) & 0xff).toByte
    val w = Multimodal.parseWav(fixed).get
    assert(w.nSamples === 256 + 5)
    assert(w.dataOffset === 44 + junk.length)
  }

  test("parser rejects wrong magic, truncated data, and non-PCM format") {
    assert(Multimodal.parseWav("OggS....".getBytes("US-ASCII")).isEmpty)
    val good = Multimodal.makeWav(5L, "abc".getBytes("UTF-8"))
    assert(Multimodal.parseWav(good.dropRight(1)).isEmpty)
    val float = good.clone() // audio format 3 = IEEE float
    float(20) = 3
    assert(Multimodal.parseWav(float).isEmpty)
  }

  test("wavStats integer features match hand-computed values") {
    import spark.implicits._
    // bytes 0x00 and 0xFF alternate: samples (0-128)*256 = -32768 and
    // (255-128)*256 = 32512, so every step is a zero crossing
    val payload = Multimodal.makeWav(0L, Array[Byte](0, 0xff.toByte))
    val st = Multimodal.wavStats(
      Seq(Multimodal.MediaRow(1L, "audio", payload)).toDS()).collect().head
    assert(st.n_samples === 256)
    assert(st.duration_us === 256L * 1000000 / 8000)
    assert(st.peak === 32768)
    assert(st.abs_sum === 128L * 32768 + 128L * 32512)
    assert(st.zero_crossings === 255)
  }

  test("resampleStats: clipped boxcar sums, hand-computed on the alternating fixture") {
    import spark.implicits._
    // samples alternate -32768, +32512: each pair sums to -256 -> all
    // 128 outputs are -256; no clipping triggers, zc = 0
    val payload = Multimodal.makeWav(0L, Array[Byte](0, 0xff.toByte))
    val r = Multimodal.resampleStats(
      Seq(Multimodal.MediaRow(1L, "audio", payload)).toDS()).collect().head
    assert(r.rate_in === 8000 && r.rate_out === 4000)
    assert(r.n_in === 256 && r.n_out === 128)
    assert(r.peak === 256 && r.abs_sum === 128L * 256 && r.zero_crossings === 0)
    // clip law: constant 0xFF bytes give +32512 samples; pair sum 65024
    // saturates to 32767
    val loud = Multimodal.makeWav(0L, Array[Byte](0xff.toByte))
    val r2 = Multimodal.resampleStats(
      Seq(Multimodal.MediaRow(2L, "audio", loud)).toDS()).collect().head
    assert(r2.peak === 32767 && r2.abs_sum === 128L * 32767)
  }

  test("audioQuality: hand-computed silence/energy/clip/run on a 5-byte cycle") {
    import spark.implicits._
    // bytes cycle (130,130,130,254,128) -> samples 512,512,512,32256,0
    // over 256 samples (docId 0): 154×512 + 51×32256 + 51×0
    val payload = Multimodal.makeWav(0L,
      Array[Byte](130.toByte, 130.toByte, 130.toByte, 254.toByte, 128.toByte))
    val q = Multimodal.audioQuality(
      Seq(Multimodal.MediaRow(0L, "audio", payload)).toDS()).collect().head
    assert(q.n_samples === 256)
    assert(q.n_silent === 205L)            // 154 at 512 + 51 at 0
    assert(q.n_clipped === 51L)            // the 32256 samples saturate
    assert(q.sq_sum === 154L * 512 * 512 + 51L * 32256 * 32256)
    assert(q.max_run === 3)                // the 512,512,512 prefix of each cycle
  }

  test("audioFingerprint: hand-computed delta signs; near-identical audio lands close") {
    import spark.implicits._
    // docId 0 -> 256 samples; a single-byte cycle (200) gives constant
    // samples, so every frame energy is proportional to its LENGTH:
    // frame sizes under 256/65 alternate 3 and 4, and the delta sign
    // bit is exactly "this frame is longer than the previous one"
    val const = Multimodal.makeWav(0L, Array[Byte](200.toByte))
    val fp0 = Multimodal.audioFingerprint(
      Seq(Multimodal.MediaRow(0L, "audio", const)).toDS()).collect().head
    val expected = (1 until 65).map { f =>
      def len(k: Int) = (k + 1) * 256 / 65 - k * 256 / 65
      if (len(f) > len(f - 1)) '1' else '0'
    }.mkString
    assert(fp0.fp_bits === expected)
    assert(fp0.fp_bits.length === 64)

    // one perturbed byte out of 64 => close fingerprint; a different
    // text => far; the banded join must find exactly the close pair
    val bytesA = Array.tabulate[Byte](64)(i => ((i * 37) % 200 + 20).toByte)
    val bytesB = bytesA.clone(); bytesB(10) = (bytesB(10) + 90).toByte
    val bytesC = Array.tabulate[Byte](64)(i => ((i * 91) % 251).toByte)
    val media = Seq(
      Multimodal.MediaRow(0L, "audio", Multimodal.makeWav(0L, bytesA)),
      Multimodal.MediaRow(512L, "audio", Multimodal.makeWav(512L, bytesB)),
      Multimodal.MediaRow(1024L, "audio", Multimodal.makeWav(1024L, bytesC))).toDS()
    val fps = Multimodal.audioFingerprint(media)
    val banded = Multimodal.audioNearDupPairs(fps, maxDist = 6, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force hamming over the same fingerprints
    val all = fps.collect().map(f => f.doc_id -> f.fp_bits).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val brute = (for {
      x <- all.keys; y <- all.keys if x < y
      d = ham(all(x), all(y)) if d <= 6
    } yield (x, y, d.toLong)).toSet
    assert(banded === brute, "banded pigeonhole must equal the n² form")
    assert(banded.exists { case (a, b, _) => a == 0L && b == 512L },
      "the one-byte perturbation must be found as a near-dup")
    assert(!banded.exists { case (a, b, _) => b == 1024L || a == 1024L },
      "the unrelated clip must not pair")
  }

  test("spectralFeatures: a pure 16-periodic tone concentrates in its own bin") {
    import spark.implicits._
    // synthesize a 500 Hz square-ish wave: bytes alternate every 8
    // samples (period 16 @ 8 kHz = 500 Hz) -> bin 500 dominates
    val bytes = Array.tabulate(256)(i =>
      (if ((i / 8) % 2 == 0) 0 else 0xff).toByte)
    val media = Seq(Multimodal.MediaRow(1L, "audio",
      Multimodal.makeWav(0L, bytes))).toDS()
    val got = Multimodal.spectralFeatures(media).collect()
      .map(r => r.bin_hz -> r.log_power_nano).toMap
    assert(got.size === 4)
    assert(got(500) > got(1000) + 1000000000L) // >=10x the power (1 decade)
    assert(got(500) > got(2000) + 1000000000L)
    assert(got(500) > got(3500) + 1000000000L)
  }

  test("vadSegments: loud clip = one full-span segment, quiet clip = none") {
    import spark.implicits._
    // ' ' -> |(32-128)*256| = 24576 >= 8000: active everywhere;
    // 'a' -> |(97-128)*256| = 7936 < 8000: silent everywhere
    val loud = Multimodal.makeWav(0L, " ".getBytes("UTF-8"))   // n = 256
    val quiet = Multimodal.makeWav(0L, "a".getBytes("UTF-8"))
    val media = Seq(Multimodal.MediaRow(1L, "audio", loud),
      Multimodal.MediaRow(2L, "audio", quiet)).toDS()
    val got = Multimodal.vadSegments(media).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("doc_id") === 1L)
    assert(r.getAs[Long]("seg") === 1L)
    assert(r.getAs[Long]("start_ms") === 0L)
    assert(r.getAs[Long]("end_ms") === 32L) // 256 samples @ 8 kHz
    assert(r.getAs[Long]("n_frames") === 4L)
    assert(r.getAs[Long]("mean_abs") === 24576L)
  }

  test("vadSegments: an interior silent gap splits the clip in two") {
    import spark.implicits._
    // 256 samples cycle over 4 bytes: frames of 64 samples each see 16
    // cycles of the same mix, so craft per-frame activity by byte
    // position instead: use a 256-byte pattern = 64 loud, 128 quiet,
    // 64 loud -> frames 1 and 4 active, 2 and 3 silent
    val bytes = (Array.fill(64)(' '.toByte) ++ Array.fill(128)('a'.toByte)
      ++ Array.fill(64)(' '.toByte))
    val media = Seq(Multimodal.MediaRow(7L, "audio",
      Multimodal.makeWav(0L, bytes))).toDS()
    val got = Multimodal.vadSegments(media).orderBy("seg").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("start_ms") === 0L)
    assert(got(0).getAs[Long]("end_ms") === 8L)   // first 64 samples
    assert(got(1).getAs[Long]("start_ms") === 24L) // last 64 samples
    assert(got(1).getAs[Long]("end_ms") === 32L)
  }
}
