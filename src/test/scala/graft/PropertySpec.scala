package graft

import java.time.{Duration, Instant}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.orchestrate.CdcTracker

/** Generator-based laws for the pure (non-Spark) components: media
  * codec round-trips over arbitrary inputs and the CDC tracker state
  * machine's range/cap/advance invariants — hundreds of generated
  * cases each, no SparkSession needed. Raw ScalaCheck (the scalatest
  * bridge artifact is not on the offline classpath): each law is a
  * `Prop`, executed with Test.check and a fixed seed-independent
  * 200-case budget.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genBytes: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  // ---- media codecs -------------------------------------------------

  test("WAV synthesis round-trips through the parser for arbitrary ids and payloads") {
    check(Prop.forAll(Gen.choose(0L, 1000000L), genBytes) { (docId, bytes) =>
      val wav = Multimodal.makeWav(docId, bytes)
      Multimodal.parseWav(wav).exists { w =>
        w.nSamples == (256 + docId % 512).toInt &&
          w.sampleRate == 8000 && w.nChannels == 1 && w.bitsPerSample == 16 &&
          wav.length == w.dataOffset + w.nSamples * 2
      }
    })
  }

  test("WAV parser never accepts truncated synthesis output") {
    check(Prop.forAll(Gen.choose(0L, 5000L), genBytes, Gen.choose(1, 64)) {
      (docId, bytes, cut) =>
        Multimodal.parseWav(Multimodal.makeWav(docId, bytes).dropRight(cut)).isEmpty
    })
  }

  test("PPM synthesis round-trips with synthesized dimensions for arbitrary inputs") {
    check(Prop.forAll(Gen.choose(0L, 1000000L), genBytes) { (docId, bytes) =>
      val ppm = Multimodal.makePpm(docId, bytes)
      Multimodal.parsePpm(ppm).exists { p =>
        p.width == (8 + docId % 24).toInt &&
          p.height == (8 + (docId / 5) % 24).toInt &&
          ppm.length == p.dataOffset + p.width * p.height * 3
      }
    })
  }

  // ---- CDC tracker state machine ------------------------------------

  private val genInstant: Gen[Instant] =
    Gen.choose(0L, 4102444800L).map(Instant.ofEpochSecond) // 1970..2100

  private val genMinutePath: Gen[String] = genInstant.map(CdcTracker.partitionOf)

  test("partitionOf/parsePartition round-trip on minute boundaries") {
    check(Prop.forAll(genInstant) { t =>
      val p = CdcTracker.partitionOf(t)
      CdcTracker.partitionOf(CdcTracker.parsePartition(p)) == p
    })
  }

  test("partition paths order lexicographically iff instants order temporally") {
    check(Prop.forAll(genInstant, genInstant) { (a, b) =>
      val (am, bm) = (a.truncatedTo(java.time.temporal.ChronoUnit.MINUTES),
        b.truncatedTo(java.time.temporal.ChronoUnit.MINUTES))
      (CdcTracker.partitionOf(a) < CdcTracker.partitionOf(b)) == am.isBefore(bm)
    })
  }

  test("plan: selection stays in [lo, hi), respects the cap, takes the earliest files") {
    val genFiles = Gen.listOf(genMinutePath.map(p => s"$p/cdc-0001.json"))
    check(Prop.forAll(genMinutePath, genInstant, genFiles, Gen.choose(1, 20)) {
      (lastPart, now, files, cap) =>
        val st = CdcTracker.State(lastPart, None, None, readyToRunNext = true)
        CdcTracker.plan(st, now, files, maxFiles = cap).forall { pl =>
          val inRange = files.sorted.filter(f =>
            f >= pl.startAfterPartition && f < pl.endBeforePartition)
          pl.files.forall(f => f >= pl.startAfterPartition && f < pl.endBeforePartition) &&
            pl.files.length <= cap &&
            pl.files == pl.files.sorted &&
            pl.files == inRange.take(cap) // bounded catch-up keeps the EARLIEST (T4)
        }
    })
  }

  test("launched->completed advances the cursor and never re-selects the processed range") {
    check(Prop.forAll(genMinutePath, genInstant) { (lastPart, now) =>
      val st = CdcTracker.State(lastPart, None, None, readyToRunNext = true)
      CdcTracker.plan(st, now, Nil, maxFiles = 5).forall { pl =>
        val done = CdcTracker.completed(CdcTracker.launched(st, pl, "run-1"))
        done.readyToRunNext &&
          CdcTracker.parsePartition(done.lastProcessedPartition) ==
            CdcTracker.parsePartition(pl.endBeforePartition)
              .minus(Duration.ofMinutes(1)) &&
          CdcTracker.nextRange(done, now).forall { case (lo2, _) =>
            lo2 >= pl.endBeforePartition
          }
      }
    })
  }
}
