package graft.codec

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.TestSpark
import graft.model.Transaction

class CodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** F1 fixture line verbatim from FIXTURES.md / README.rst:162-167. */
  private val f1 =
    """{"Item":{"account":{"S":"651-232-2439"},"create_at":{"S":"2023-07-27T22:14:26.066612+0000"},"entity":{"S":"Brown, Christian and Becker"},"note":{"S":"Three way peace sing town."},"update_at":{"S":"2023-07-27T22:14:26.066612+0000"},"amount":{"N":"592"},"is_credit":{"N":"0"}}}"""

  test("decodeExportLines decodes the F1 fixture exactly") {
    import spark.implicits._
    val row = DynamoDbJson.decodeExportLines(Seq(f1).toDF("value")).as[Transaction].head()
    assert(row === Transaction("651-232-2439", "2023-07-27T22:14:26.066612+0000",
      "2023-07-27T22:14:26.066612+0000", "Brown, Christian and Becker", 592, 0,
      "Three way peace sing town."))
  }

  private def genTx(r: Random): Transaction = Transaction(
    account = f"${r.nextInt(1000)}%03d-${r.nextInt(1000)}%03d-${r.nextInt(10000)}%04d",
    create_at = f"2024-01-${1 + r.nextInt(28)}%02dT${r.nextInt(24)}%02d:${r.nextInt(60)}%02d:${r.nextInt(60)}%02d.${r.nextInt(1000000)}%06d+0000",
    update_at = f"2024-02-${1 + r.nextInt(28)}%02dT${r.nextInt(24)}%02d:${r.nextInt(60)}%02d:${r.nextInt(60)}%02d.${r.nextInt(1000000)}%06d+0000",
    entity = Seq("Brown, \"Quoted\" & Co", "Ünïcøde GmbH", "Plain Inc", "a\\b")(r.nextInt(4)),
    amount = r.nextInt(100000),
    is_credit = r.nextInt(2),
    note = if (r.nextBoolean()) s"note ${r.nextLong()}" else null)

  test("encode ∘ decode = id (property, 300 seeded transactions)") {
    import spark.implicits._
    val r = new Random(42)
    val txs = Seq.fill(300)(genTx(r))
    val decoded = DynamoDbJson
      .decodeExportLines(DynamoDbJson.encodeExportLines(txs.toDF()))
      .as[Transaction].collect().toSeq
    assert(decoded.sortBy(t => (t.account, t.create_at)) ===
      txs.sortBy(t => (t.account, t.create_at)))
  }

  test("decodeStreamEvents unwraps the F2 shape and keeps REMOVE rows visible") {
    import spark.implicits._
    val insert =
      """{"eventName":"INSERT","dynamodb":{"Keys":{"account":{"S":"111-222-3333"},"create_at":{"S":"2024-01-01T00:00:00.000001+0000"}},"NewImage":{"update_at":{"S":"2024-01-01T00:00:00.000001+0000"},"entity":{"S":"E"},"amount":{"N":"5"},"is_credit":{"N":"1"},"note":{"S":"n"}}}}"""
    val remove =
      """{"eventName":"REMOVE","dynamodb":{"Keys":{"account":{"S":"111-222-3333"},"create_at":{"S":"2024-01-01T00:00:00.000001+0000"}}}}"""
    val out = DynamoDbJson.decodeStreamEvents(Seq(insert, remove).toDF("value"))
      .orderBy("eventName").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("eventName") === "INSERT")
    assert(out(0).getAs[Int]("amount") === 5)
    assert(out(1).getAs[String]("eventName") === "REMOVE")
    assert(out(1).getAs[String]("account") === "111-222-3333")
    assert(out(1).isNullAt(out(1).fieldIndex("update_at"))) // no NewImage
  }
}
