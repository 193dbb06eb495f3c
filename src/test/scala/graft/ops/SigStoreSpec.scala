package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ingest.VersionedDir

/** Epoch-loop / streaming maintenance of the MinHash signature store:
  * the dedup policy (cross-store, intra-batch greedy, survivors-only
  * append), replay idempotency, and the streaming wrapper agreeing
  * with the explicit epoch loop.
  */
class SigStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  private val loremA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val loremB =
    "one two three four five six seven eight nine ten eleven twelve"
  private val loremC =
    "red orange yellow green blue indigo violet crimson amber teal navy plum"

  test("epoch loop: intra-batch greedy drop, cross-epoch store hits, survivors-only append") {
    val root = Files.createTempDirectory("graft_sigstore").toString
    val store = s"$root/store"
    // epoch 0: A and its exact dup (intra pair -> larger id drops), B unique
    val e0 = Seq(doc(1, loremA), doc(5, loremA), doc(2, loremB)).toDF("doc_id", "text")
    val s0 = SigStore.ingestEpoch(e0, store, 0L)
    assert(s0.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
    // only survivor signatures entered the store
    assert(VersionedDir.current(spark, store).get.count() === 2)

    // epoch 1: another dup of A (hits the store), C unique
    val e1 = Seq(doc(9, loremA), doc(3, loremC)).toDF("doc_id", "text")
    val s1 = SigStore.ingestEpoch(e1, store, 1L)
    assert(s1.select("doc_id").as[Long].collect().sorted === Array(3L))
    assert(VersionedDir.current(spark, store).get.count() === 3)
    assert(VersionedDir.currentVersion(spark, store) === Some(1L))
  }

  test("replaying an epoch is a no-op: same survivors, same store") {
    val root = Files.createTempDirectory("graft_sigstore").toString
    val store = s"$root/store"
    val e0 = Seq(doc(1, loremA), doc(2, loremB)).toDF("doc_id", "text")
    SigStore.ingestEpoch(e0, store, 0L)
    val e1 = Seq(doc(7, loremA), doc(8, loremC)).toDF("doc_id", "text")
    val first = SigStore.ingestEpoch(e1, store, 1L)
      .select("doc_id").as[Long].collect().sorted
    val storeAfterFirst = VersionedDir.current(spark, store).get
      .select("d").as[Long].collect().sorted
    // crash-after-commit scenario: the pointer already names v=1 and
    // the store already holds epoch 1's survivors; the replayed epoch
    // must not drop its own survivors (self-id hits excluded) nor
    // duplicate their signatures
    val replay = SigStore.ingestEpoch(e1, store, 1L)
      .select("doc_id").as[Long].collect().sorted
    val storeAfterReplay = VersionedDir.current(spark, store).get
      .select("d").as[Long].collect().sorted
    assert(replay === first)
    assert(storeAfterReplay === storeAfterFirst)
    assert(VersionedDir.currentVersion(spark, store) === Some(1L))
  }

  test("streaming maintenance drains in file-bounded epochs and matches the explicit loop") {
    val root = Files.createTempDirectory("graft_sigstore").toString
    // three landed files, processed one per micro-batch in path order
    val landing = s"$root/landing"
    Files.createDirectories(java.nio.file.Paths.get(landing))
    def land(name: String, mtimeSec: Long, rows: Seq[(Long, String)]): Unit = {
      val p = java.nio.file.Paths.get(landing, name)
      Files.write(p,
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("", "\n", "\n").getBytes("UTF-8"))
      // distinct mtimes pin the file-source processing order (it
      // drains oldest-first), making the 3-epoch split deterministic
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + mtimeSec * 1000))
    }
    land("b0.json", 0, Seq((1L, loremA), (4L, loremA), (2L, loremB)))
    land("b1.json", 10, Seq((9L, loremA), (3L, loremC)))
    land("b2.json", 20, Seq((11L, loremC), (12L, loremB)))

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .json(landing)
    SigStore.maintain(stream, s"$root/store", s"$root/out", s"$root/ckpt")

    val emitted = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().sorted
    // sequential reference run over the same three batches
    val refStore = s"$root/refstore"
    val r0 = SigStore.ingestEpoch(
      Seq(doc(1, loremA), doc(4, loremA), doc(2, loremB)).toDF("doc_id", "text"), refStore, 0L)
    val r1 = SigStore.ingestEpoch(
      Seq(doc(9, loremA), doc(3, loremC)).toDF("doc_id", "text"), refStore, 1L)
    val r2 = SigStore.ingestEpoch(
      Seq(doc(11, loremC), doc(12, loremB)).toDF("doc_id", "text"), refStore, 2L)
    val expected = (r0.unionByName(r1).unionByName(r2))
      .select("doc_id").as[Long].collect().sorted
    assert(emitted === expected)
    assert(VersionedDir.current(spark, s"$root/store").get.count() ===
      VersionedDir.current(spark, refStore).get.count())
  }
}
