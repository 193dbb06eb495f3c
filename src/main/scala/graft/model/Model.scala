package graft.model

import org.apache.spark.sql.types._

/** Domain model of the reference pipeline.
  *
  * The reference's single domain type is the `Transaction` record
  * (reference: dynamodb_to_datalake/dynamodb_table.py:13-29). Timestamps
  * travel as strings end-to-end in format `%Y-%m-%dT%H:%M:%S.%f%z`
  * (µs precision, `+0000` offset — dynamodb_table.py:11); we keep that
  * invariant and parse only for partition derivation / windows.
  */
final case class Transaction(
    account: String,   // hash key, "ddd-ddd-dddd"
    create_at: String, // range key, immutable ISO string
    update_at: String, // precombine field — latest wins
    entity: String,    // immutable
    amount: Int,       // immutable
    is_credit: Int,    // immutable, 0/1
    note: String       // the ONLY mutable field
)

/** Lake row = Transaction + synthetic record key + partition columns
  * (reference: glue_jobs/initial_load.py:124-153). 13 columns in the
  * reference (incl. 5 Hudi meta cols); ours carries the 8 user-visible +
  * 5 derived = 13 too.
  */
final case class LakeRow(
    id: String,
    account: String,
    create_at: String,
    update_at: String,
    entity: String,
    amount: Int,
    is_credit: Int,
    note: String,
    create_year: String,
    create_month: String,
    create_day: String,
    create_hour: String,
    create_minute: String
)

/** CDC change event as emitted by the stream
  * (reference: lambda_functions/dynamodb_stream_consumer.py:37-49).
  */
final case class CdcEvent(
    eventName: String, // INSERT | MODIFY | REMOVE
    account: String,
    create_at: String,
    update_at: String,
    entity: String,
    amount: Int,
    is_credit: Int,
    note: String
)

object Schemas {
  /** The timestamp wire format: `2023-07-27T22:14:26.066612+0000`. */
  val TsPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ"

  private def s(name: String) =
    StructField(name, StructType(Seq(StructField("S", StringType))))
  private def n(name: String) =
    StructField(name, StructType(Seq(StructField("N", StringType))))

  /** DynamoDB-JSON attribute wrappers for one item: only S and N occur
    * (reference: …post_processor_worker.py:40-46). `N` values are
    * string-encoded numbers.
    */
  val ddbItem: StructType = StructType(Seq(
    s("account"), s("create_at"), s("update_at"), s("entity"),
    n("amount"), n("is_credit"), s("note")))

  /** One export data line: `{"Item": {...}}` (README.rst:162-167). */
  val exportLine: StructType =
    StructType(Seq(StructField("Item", ddbItem)))

  /** Stream event: Keys + NewImage wrappers + eventName
    * (dynamodb_stream_consumer.py:37-49).
    */
  val streamEvent: StructType = StructType(Seq(
    StructField("eventName", StringType),
    StructField("dynamodb", StructType(Seq(
      StructField("Keys", StructType(Seq(s("account"), s("create_at")))),
      StructField("NewImage", ddbItem))))))

  /** A lake row without its partition columns: synthetic id + the flat
    * CDC payload. The shape of an EMPTY lake (nothing merged yet).
    */
  lazy val lakeFlat: StructType =
    StructType(StructField("id", StringType) +: flatCdcRow.fields)

  /** Flat CDC row landed as JSON-lines (README.rst:198-205). */
  val flatCdcRow: StructType = StructType(Seq(
    StructField("account", StringType),
    StructField("create_at", StringType),
    StructField("update_at", StringType),
    StructField("entity", StringType),
    StructField("amount", IntegerType),
    StructField("is_credit", IntegerType),
    StructField("note", StringType)))
}
