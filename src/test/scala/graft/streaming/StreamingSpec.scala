package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

import java.nio.file.Files

class StreamingSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("S1 batch-stream equivalence: tumbling window over replay == batch groupBy") {
    val streamed = Streams.specs.find(_.name == "s_tumbling_window").get
      .run(spark, sf).collect().toSeq
    val batch = graft.Tables(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("S3: duplicated replay + dropDuplicatesWithinWatermark == exact distinct") {
    val streamed = Streams.specs.find(_.name == "s_dedup_watermark").get
      .run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.Tables(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct("event_id").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("custom flatMapGroupsWithState sessionizer == built-in session_window") {
    val custom = StatefulSessions.run(spark, sf).collect().toSeq
    val builtin = Streams.specs.find(_.name == "s_session_window").get
      .run(spark, sf).collect().toSeq
    assert(custom.size == builtin.size, s"${custom.size} vs ${builtin.size}")
    assert(custom == builtin)
  }

  test("watermark evicts: late rows beyond the watermark are dropped (append mode)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-late").toString
    val base = (0 until 6).flatMap(h =>
      (0 until 4).map(i => (java.sql.Timestamp.valueOf(f"2024-01-01 0$h%d:10:0$i%d"), "click")))
    base.toDF("ts", "event_type").coalesce(1).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING").parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val name = "late_sink"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    q.processAllAvailable()
    // Second delivery: one LATE row (hour 0, far behind watermark = 05:10
    // - 1h) and one on-time row (hour 6).
    Seq((java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 06:10:00"), "click"))
      .toDF("ts", "event_type").coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val out = spark.table(name)
      .select(date_format(col("window.start"), "HH").as("h"), col("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Hour 0 was finalized at count 4 before the late row arrived; the
    // late row must NOT re-open or re-emit it.
    assert(out.get("00").contains(4L), s"late row leaked into hour 0: $out")
    assert(spark.table(name).filter(col("window.start") === "2024-01-01 00:00:00")
      .count() == 1)
  }
}
