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

  test("s_windowed_topk oracle precondition: distinct event_type count <= sketch k") {
    // The exact-match oracle is only valid because approx_top_k(_, k=10,
    // capacity=100) DEGENERATES to an exact per-window count when the
    // type cardinality fits inside k — a wider fixture would silently
    // truncate the streamed side to its top 10 while the oracle keeps
    // every type. Pin the assumption at every SF the gates run so a
    // fixture change fails here, not as an opaque hash mismatch.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
         if new java.io.File(dir, "events.parquet").exists()) {
      val n = graft.Tables(spark, dir, "events")
        .select("event_type").distinct().count()
      assert(n <= 10, s"$dir has $n distinct event types > sketch k=10 — " +
        "s_windowed_topk's exact oracle no longer holds")
    }
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

  test("stateful sessionizer handles out-of-order events across batches") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-ooo").toString
    try {
      // Batch 1: user 1 session at 12:00-12:02; user 9 pins max ts so the
      // watermark lands at 11:40 after the batch.
      Seq((1L, t("12:00")), (1L, t("12:02")), (9L, t("12:40")))
        .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(dir)
      val stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(dir)
      val name = "ooo_sessions"
      val q = StatefulSessions.sessionize(stream).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      q.processAllAvailable()
      // Batch 2: a LATE event (11:45 < the 12:00 open session, but above
      // the 11:40 watermark). Gap to the open session is 15 min -> it is
      // its own earlier session, NOT merged, and must not crash the
      // timeout registration. Push the watermark so everything closes.
      Seq((1L, t("11:45")), (9L, t("14:00")))
        .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.stop()

      val sessions = spark.table(name).filter(col("user_id") === 1)
        .select("session_start", "n_events").collect()
        .map(r => (new java.sql.Timestamp(r.getLong(0) / 1000L).toString, r.getInt(1))) // µs → ms
        .sorted.toSeq
      assert(sessions == Seq(("2024-01-01 11:45:00.0", 1), ("2024-01-01 12:00:00.0", 2)),
        s"got $sessions")
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  test("bridging late event merges two open sessions into one") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    // Single batch, watermark 0: 12:00 and 12:15 are separate (15-min
    // gap) until 12:08 bridges them into one session of 3 events.
    val dir = java.nio.file.Files.createTempDirectory("graft-bridge").toString
    try {
      Seq((1L, t("12:00")), (1L, t("12:15")), (1L, t("12:08")), (9L, t("23:00")))
        .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(dir)
      val stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(dir)
      val name = "bridge_sessions"
      val q = StatefulSessions.sessionize(stream).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val sessions = spark.table(name).filter(col("user_id") === 1)
        .select("n_events").collect().map(_.getInt(0)).toSeq
      assert(sessions == Seq(3), s"got $sessions")
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  test("out-of-order chunk replay e2e: custom sessionizer == built-in session_window") {
    import spark.implicits._
    // Deliver time-ordered quarters of the real events table in the order
    // 2,1,4,3 — each swap makes a whole chunk LATE relative to the
    // watermark set by its successor. Both the custom state machine and
    // the built-in session_window must drop/merge identically under this
    // real multi-batch watermark progression (append mode both sides, a
    // far-future sentinel flushes the final open sessions).
    val dir = Files.createTempDirectory("graft-ooo-e2e").toString
    try {
      val ev = graft.Tables(spark, sf, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
      val chunked = ev.withColumn("chunk", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id"))).cache()
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0).getTime

      val custom = StatefulSessions.sessionize(
        spark.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(dir)).toDF()
      val q1 = custom.writeStream.format("memory").queryName("ooo_custom")
        .outputMode("append").start()
      val builtin = spark.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(dir)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val q2 = builtin.writeStream.format("memory").queryName("ooo_builtin")
        .outputMode("append").start()
      // transformWithState variant on the same replay: registered-timer
      // semantics across REAL multi-batch watermark progression (the
      // oracle gate drains its replay in one pass, which exercises at
      // most one timer round). RocksDB provider is query-scoped.
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = spark.conf.getOption(provKey)
      spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val q3 = try TransformSessions.sessionize(
        spark.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(dir)).toDF()
        .writeStream.format("memory").queryName("ooo_tws")
        .outputMode("append").start()
      finally prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }

      for (i <- Seq(2, 1, 4, 3)) {
        chunked.filter(col("chunk") === i).select("user_id", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()
      }
      Seq((-1L, new java.sql.Timestamp(maxTs + 24 * 3600 * 1000L)))
        .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(dir)
      q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()
      q1.stop(); q2.stop(); q3.stop()

      val customRows = spark.table("ooo_custom").filter(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"), col("n_events").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val builtinRows = spark.table("ooo_builtin").filter(col("user_id") >= 0)
        .select(col("user_id"), unix_micros(col("session_window.start")), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val twsRows = spark.table("ooo_tws").filter(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"), col("n_events").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(customRows.nonEmpty)
      assert(customRows == builtinRows,
        s"custom-only: ${customRows -- builtinRows}; builtin-only: ${builtinRows -- customRows}")
      assert(twsRows == builtinRows,
        s"tws-only: ${twsRows -- builtinRows}; builtin-only: ${builtinRows -- twsRows}")
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  test("checkpoint recovery: a restarted query resumes state exactly-once") {
    import spark.implicits._
    // The fault-tolerance contract a 1000-executor job leans on: stop a
    // stateful query mid-stream, land more data while it is down, start a
    // NEW query instance from the same checkpoint + file sink. The commit
    // log must skip the already-processed batches (no duplicated output)
    // and the recovered window state must absorb the new chunks — the
    // final landed table equals the one-shot batch aggregate exactly.
    val root = Files.createTempDirectory("graft-ckpt").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    try {
      val ev = graft.Tables(spark, sf, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val chunked = ev.withColumn("chunk", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id"))).cache()
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0).getTime
      def writeChunk(i: Int): Unit =
        chunked.filter(col("chunk") === i)
          .select("user_id", "ts", "event_id", "event_type")
          .coalesce(1).write.mode("append").parquet(src)
      def startQuery() = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("wstart"), col("event_type"), col("n"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

      writeChunk(1) // the source dir must exist before the stream starts
      val q1 = startQuery()
      q1.processAllAvailable()
      writeChunk(2); q1.processAllAvailable()
      q1.stop()
      Seq(3, 4).foreach(writeChunk) // lands while the query is DOWN
      val q2 = startQuery()
      q2.processAllAvailable()
      // Far-future sentinel pushes the watermark past every real window.
      Seq((-1L, new java.sql.Timestamp(maxTs + 24 * 3600 * 1000L), -1L, "sentinel"))
        .toDF("user_id", "ts", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(src)
      q2.processAllAvailable(); q2.stop()

      val got = spark.read.parquet(out)
        .filter(col("event_type") =!= "sentinel")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val want = ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want,
        s"missing: ${want -- got}; duplicated/extra: ${got -- want}")
    } finally graft.TmpFiles.deleteRecursively(root)
  }

  test("incremental CDC snapshot survives a restart (pointer recovered from disk)") {
    import spark.implicits._
    // Same contract as the checkpoint-recovery test, but for the
    // foreachBatch merge: run the first half of the log, kill the query,
    // land the second half, run a FRESH invocation against the same
    // checkpoint + snapshot root (driver memory gone — the version
    // pointer must be recovered from landed v-dirs). The final snapshot
    // must equal the batch latest-per-key over the whole log.
    val root = Files.createTempDirectory("graft-cdc-restart").toString
    val src = s"$root/src"; val snap = s"$root/snap"; val ckpt = s"$root/ckpt"
    try {
      val ev = graft.Tables(spark, sf, "events")
      val chunked = ev.withColumn("chunk", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id"))).cache()
      def writeChunk(i: Int): Unit =
        chunked.filter(col("chunk") === i).drop("chunk")
          .coalesce(1).write.mode("append").parquet(src)
      Seq(1, 2).foreach(writeChunk)
      Streams.runIncrementalSnapshot(spark, sf, src, snap, ckpt)
      Seq(3, 4).foreach(writeChunk) // lands while the pipeline is DOWN
      val cur = Streams.runIncrementalSnapshot(spark, sf, src, snap, ckpt)

      val got = spark.read.parquet(cur)
        .select("user_id", "event_type", "sec", "event_id")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2).getTime, r.getLong(3))).toSet
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        .orderBy(expr("date_trunc('second', ts)").desc, col("event_id").desc)
      val want = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          expr("date_trunc('second', ts)").as("sec"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2).getTime, r.getLong(3))).toSet
      assert(got == want,
        s"missing: ${want -- got}; stale/extra: ${got -- want}")
    } finally graft.TmpFiles.deleteRecursively(root)
  }

  test("sliding windows: late rows beyond the watermark are dropped (update mode)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-late-slide").toString
    try {
      val base = (0 until 6).flatMap(h =>
        (0 until 4).map(i => (java.sql.Timestamp.valueOf(f"2024-01-01 0$h%d:10:0$i%d"), "click")))
      base.toDF("ts", "event_type").coalesce(1).write.mode("append").parquet(dir)
      val stream = spark.readStream
        .schema("ts TIMESTAMP, event_type STRING").parquet(dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val name = "late_slide_sink"
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      q.processAllAvailable()
      // Second delivery: one LATE row (00:20, behind watermark 04:10 —
      // every sliding window containing it has closed) and one on-time
      // row (06:10).
      Seq((java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), "click"),
        (java.sql.Timestamp.valueOf("2024-01-01 06:10:00"), "click"))
        .toDF("ts", "event_type").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.stop()

      // Update-mode memory sink accumulates one row per (window, batch)
      // CHANGE, so a leaked late row would show as a second emission with
      // a bumped count for an already-final window.
      val rows = spark.table(name)
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // Windows containing 00:20: 23:30/23:45/00:00 hold only the four
      // 00:10 events; 00:15 holds the four 01:10 events. A leak would
      // re-emit any of them with count 5.
      for (w <- Seq("23:30", "23:45", "00:00", "00:15"))
        assert(rows.filter(_._1 == w) == Seq((w, 4L)),
          s"late row re-emitted window $w: $rows")
      // The on-time row lands normally in its four overlapping windows.
      for (w <- Seq("05:15", "05:30", "05:45", "06:00"))
        assert(rows.filter(_._1 == w) == Seq((w, 1L)), s"$w missing: $rows")
    } finally graft.TmpFiles.deleteRecursively(dir)
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

  test("Trigger.AvailableNow actually rate-limits: 8 files drain in multiple batches") {
    // The point of AvailableNow over Trigger.Once is BOUNDED micro-batches;
    // if maxFilesPerTrigger were ignored the replay would drain in one
    // giant batch. The checkpoint's commit log records one entry per
    // micro-batch — require several.
    val ckpt = Files.createTempDirectory("graft-an-ckpt").toString
    val dir = Streams.replayDir(spark, sf, chunks = 8)
    try {
      val schema = graft.Tables(spark, sf, "events").schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(dir)
        .groupBy("event_type").agg(count(lit(1)).as("c"))
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .count(_.getName.forall(_.isDigit))
      assert(commits >= 4, s"expected >= 4 rate-limited micro-batches, got $commits")
    } finally {
      graft.TmpFiles.deleteRecursively(dir)
      graft.TmpFiles.deleteRecursively(ckpt)
    }
  }
}
