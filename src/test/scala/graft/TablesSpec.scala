package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

/** The events.ts loader must dispatch on the PHYSICAL parquet type, not
  * the fixture name (round-7 sf1 lesson): the driver fixture carries
  * TIMESTAMP(NANOS) (read as ns-long under `nanosAsLong`), but any
  * re-materialized copy of the table — derive_scale.py's sf1, or a user
  * re-write through a µs engine like DuckDB — arrives as TIMESTAMP_NTZ,
  * and `ts div 1000` on that is an AnalysisException at first query.
  * Both physical shapes must load to identical TimestampType values.
  */
class TablesSpec extends SparkSuite {

  test("events.ts loads identically from ns-long and TIMESTAMP_NTZ parquet") {
    import spark.implicits._
    val dirNanos = Files.createTempDirectory("graft-ev-ns").toString
    val dirNtz = Files.createTempDirectory("graft-ev-ntz").toString

    // 2021-03-04 05:06:07.123456789 UTC — sub-µs tail exercises the
    // ns→µs truncation; second row checks ordering survives.
    val baseNs = 1614834367123456789L
    val rows = Seq((1L, baseNs), (2L, baseNs + 999L), (3L, baseNs + 2_000_000L))

    // Shape 1: ns-since-epoch long named ts (what nanosAsLong yields for
    // the driver's TIMESTAMP(NANOS) fixture).
    rows.toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"$dirNanos/events.parquet")

    // Shape 2: the same instants truncated to µs as TIMESTAMP_NTZ (what
    // a DuckDB COPY of the fixture produces).
    rows.map { case (id, ns) =>
        (id, LocalDateTime.ofEpochSecond(ns / 1_000_000_000L,
          ((ns / 1000L) % 1_000_000L).toInt * 1000, java.time.ZoneOffset.UTC))
      }.toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"$dirNtz/events.parquet")

    // Physical shapes really differ before loading...
    assert(spark.read.parquet(s"$dirNanos/events.parquet")
      .schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$dirNtz/events.parquet")
      .schema("ts").dataType == TimestampNTZType)

    // ...and converge after: same logical type, same µs instants.
    val fromNanos = Tables(spark, dirNanos, "events")
    val fromNtz = Tables(spark, dirNtz, "events")
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNtz.schema("ts").dataType == TimestampType)

    def instants(df: org.apache.spark.sql.DataFrame): Seq[(Long, Timestamp)] =
      df.orderBy("event_id").select($"event_id", $"ts")
        .as[(Long, Timestamp)].collect().toSeq
    val a = instants(fromNanos)
    val b = instants(fromNtz)
    assert(a == b, s"ns-long and NTZ loads diverge: $a vs $b")
    // Truncation, not rounding: the .123456789 tail lands on .123456.
    assert(a.head._2.getNanos == 123456000)
  }
}
