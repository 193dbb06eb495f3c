package graft.codec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** DynamoDB-JSON codec as pure DataFrame transforms.
  *
  * The reference decodes the `{"S": v}` / `{"N": "123"}` attribute
  * wrappers in two Lambdas (…post_processor_worker.py:39-58 for the
  * export path, dynamodb_stream_consumer.py:42-59 for the stream path);
  * here both are declarative column projections so Catalyst can prune
  * and push down around them, and they run distributed instead of in a
  * Lambda fan-out.
  */
object DynamoDbJson {

  /** Decode a DataFrame of raw export lines (column `value`: one
    * `{"Item": {...}}` JSON string per row) into flat transaction rows.
    * Spark-first replacement for …post_processor_worker.py:33-58.
    */
  def decodeExportLines(raw: DataFrame): DataFrame =
    unwrapItem(
      raw.select(from_json(col("value"), Schemas.exportLine).as("j"))
        .select(col("j.Item").as("item")))

  /** Decode stream events (column `value`: one event JSON per row) into
    * flat rows + `eventName`. REMOVE events carry no NewImage.
    * Replaces dynamodb_stream_consumer.py:37-59.
    */
  def decodeStreamEvents(raw: DataFrame): DataFrame = {
    val j = raw.select(from_json(col("value"), Schemas.streamEvent).as("e"))
    j.select(
      col("e.eventName").as("eventName"),
      col("e.dynamodb.Keys.account.S").as("account"),
      col("e.dynamodb.Keys.create_at.S").as("create_at"),
      col("e.dynamodb.NewImage.update_at.S").as("update_at"),
      col("e.dynamodb.NewImage.entity.S").as("entity"),
      col("e.dynamodb.NewImage.amount.N").cast("int").as("amount"),
      col("e.dynamodb.NewImage.is_credit.N").cast("int").as("is_credit"),
      col("e.dynamodb.NewImage.note.S").as("note"))
  }

  /** Unwrap an already-parsed `item` struct column of DynamoDB-JSON
    * wrappers into the flat 7-column transaction schema.
    */
  def unwrapItem(parsed: DataFrame): DataFrame =
    parsed.select(
      col("item.account.S").as("account"),
      col("item.create_at.S").as("create_at"),
      col("item.update_at.S").as("update_at"),
      col("item.entity.S").as("entity"),
      col("item.amount.N").cast("int").as("amount"),
      col("item.is_credit.N").cast("int").as("is_credit"),
      col("item.note.S").as("note"))

  /** Encode flat rows + `eventName` as stream-event JSON lines (inverse
    * of decodeStreamEvents). REMOVE events carry Keys but NO NewImage —
    * exactly the wire shape the stream consumer must survive
    * (dynamodb_stream_consumer.py:42-59): `to_json` omits null fields,
    * so the NewImage key is absent, not null.
    */
  def encodeStreamEvents(flat: DataFrame, eventNameCol: String = "eventName"): DataFrame = {
    val newImage = struct(
      struct(col("update_at").as("S")).as("update_at"),
      struct(col("entity").as("S")).as("entity"),
      struct(col("amount").cast("string").as("N")).as("amount"),
      struct(col("is_credit").cast("string").as("N")).as("is_credit"),
      struct(col("note").as("S")).as("note"))
    flat.select(to_json(struct(
      col(eventNameCol).as("eventName"),
      struct(
        struct(
          struct(col("account").as("S")).as("account"),
          struct(col("create_at").as("S")).as("create_at")).as("Keys"),
        when(col(eventNameCol) === "REMOVE", lit(null)).otherwise(newImage).as("NewImage")
      ).as("dynamodb"))).as("value"))
  }

  /** Encode flat transaction rows back to DynamoDB-JSON export lines
    * (inverse of decodeExportLines; used by the faker to produce
    * F1-shaped fixtures and by round-trip property tests).
    */
  def encodeExportLines(flat: DataFrame): DataFrame =
    flat.select(to_json(struct(struct(
      struct(col("account").as("S")).as("account"),
      struct(col("create_at").as("S")).as("create_at"),
      struct(col("update_at").as("S")).as("update_at"),
      struct(col("entity").as("S")).as("entity"),
      struct(col("amount").cast("string").as("N")).as("amount"),
      struct(col("is_credit").cast("string").as("N")).as("is_credit"),
      struct(col("note").as("S")).as("note")).as("Item"))).as("value"))
}
