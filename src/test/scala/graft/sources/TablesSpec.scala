package graft.sources

import java.nio.file.Files
import java.time.{Instant, LocalDateTime, ZoneOffset}

import graft.{SparkTest, Tables}
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** The loader contract behind the round-8 regression (VERDICT r9): the
  * corpus generator has shipped the events `ts` column in three parquet
  * encodings across corpus regenerations — INT64 TIMESTAMP(NANOS) (read
  * as LongType under `nanosAsLong=true`), timestamp[us] with
  * isAdjustedToUTC=false (inferred TIMESTAMP_NTZ), and UTC-adjusted
  * timestamp[us] (TimestampType). `Tables.events` must normalize all
  * three to the SAME TimestampType instants so a regeneration that flips
  * encodings changes nothing downstream — and a FOURTH encoding fails
  * loudly at the loader, not at nine scattered queries.
  */
class TablesSpec extends AnyFunSuite with SparkTest {

  test("all three shipped ts encodings normalize to identical TimestampType instants") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("tables-ts").toString
    val instants = Seq(
      Instant.parse("2025-01-01T00:00:00Z"),
      Instant.parse("2025-06-15T12:34:56.789Z"),
      Instant.parse("2025-12-31T23:59:59.999999Z"))

    // encoding 1: INT64 nanos — exactly what nanosAsLong=true hands the
    // loader for a TIMESTAMP(NANOS) file (LongType column named ts)
    instants.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t.getEpochSecond * 1000000000L + t.getNano) }
      .toDF("event_id", "ts")
      .write.parquet(s"$root/enc_nanos/events.parquet")
    // encoding 2: timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ;
    // wall-clock written in UTC (the harness session timezone)
    instants.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, LocalDateTime.ofInstant(t, ZoneOffset.UTC)) }
      .toDF("event_id", "ts")
      .write.parquet(s"$root/enc_ntz/events.parquet")
    // encoding 3: UTC-adjusted timestamp[us] → TimestampType passthrough
    instants.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("event_id", "ts")
      .write.parquet(s"$root/enc_utc/events.parquet")

    val decoded = Seq("enc_nanos", "enc_ntz", "enc_utc").map { enc =>
      val df = Tables.events(s, s"$root/$enc")
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc must normalize to TimestampType")
      enc -> df.orderBy("event_id")
        .select($"ts".cast("long"), $"ts")
        .as[(Long, java.sql.Timestamp)].collect().toSeq
    }.toMap

    // identical instants across encodings — and equal to the source of
    // truth, so the equality is not three-way-wrong
    val expected = instants.map(t =>
      (t.getEpochSecond, java.sql.Timestamp.from(
        // µs precision: the nanos encoding truncates to the microsecond
        t.minusNanos(t.getNano % 1000L))))
    decoded.foreach { case (enc, rows) =>
      assert(rows == expected, s"$enc decoded to $rows, expected $expected")
    }
  }
}
