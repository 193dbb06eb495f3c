package graft

import java.nio.file.Files
import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.scalatest.funsuite.AnyFunSuite

/** The events table has shipped in multiple physical encodings across
  * testdata regenerations (nanos-as-long, then TIMESTAMP_NTZ micros).
  * [[Queries.events]] branches on the actual dtype; these laws pin that
  * every encoding of the SAME instants reads identically — including
  * the derived `tx` wire strings, which the DuckDB oracle re-derives
  * byte-for-byte. Without this, the legacy long branch is dead code on
  * current testdata and a future regeneration could silently break it.
  */
class EventsReaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nanos-long, NTZ, and LTZ encodings of the same instants read identically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_dtype").toString
    // µs-aligned instants (the fixture contract the nanos branch divides on)
    val micros = Seq(1704067200123456L, 1706572800987654L, 1705000000000001L)
    def row(i: Int) = (i.toLong, micros(i), i.toLong, s"type$i", 0.5 + i, s"p$i")

    micros.indices.map { i =>
      val r = row(i); (r._1, r._2 * 1000L, r._3, r._4, r._5, r._6)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/long/events.parquet")

    micros.indices.map { i =>
      val r = row(i)
      val ldt = LocalDateTime.ofEpochSecond(r._2 / 1000000L,
        ((r._2 % 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      (r._1, ldt, r._3, r._4, r._5, r._6)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")

    micros.indices.map { i =>
      val r = row(i)
      val inst = Instant.ofEpochSecond(r._2 / 1000000L, (r._2 % 1000000L) * 1000L)
      (r._1, inst, r._3, r._4, r._5, r._6)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/ltz/events.parquet")

    def read(sub: String): Seq[(Long, java.sql.Timestamp, String)] =
      Queries.tx(spark, s"$dir/$sub")
        .select("event_id", "ts", "create_at")
        .as[(Long, java.sql.Timestamp, String)]
        .collect().toSeq.sortBy(_._1)

    val fromLong = read("long")
    val fromNtz = read("ntz")
    val fromLtz = read("ltz")
    assert(fromLong === fromNtz, "legacy nanos-long read diverged from NTZ")
    assert(fromNtz === fromLtz, "NTZ read diverged from native LTZ")
    // and the wire strings carry the full µs precision + offset suffix
    assert(fromLong.head._3 === "2024-01-01T00:00:00.123456+0000")
    assert(fromLong(2)._3 === "2024-01-11T19:06:40.000001+0000")
  }
}
