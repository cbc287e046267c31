package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state operator (SURVEY §2.2 row 39's stronger flavour):
  * per-user session assembly with an explicit state machine instead of
  * the built-in `session_window`.
  *
  * Semantics match `session_window(ts, gap)`: a session extends while the
  * next event starts < gap after the previous one; sessions are emitted
  * when the event-time watermark passes their close (event-time timeout),
  * so late events inside the watermark still merge correctly.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(openStart: Long, openLast: Long, n: Int)
  final case class Session(user_id: Long, session_start: Long, n_events: Int)

  private val GapMs = 10 * 60 * 1000L

  /** Fold a batch of events (any order) into the open session, emitting
    * every session that closed. */
  def step(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // Watermark passed openLast + gap: the open session is final.
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.openStart, s.n))
    }
    val sorted = events.map(_.ts.getTime).toArray.sorted
    var out = List.empty[Session]
    var st = state.getOption.orNull
    sorted.foreach { t =>
      st match {
        case null => st = SessionState(t, t, 1)
        case SessionState(start, last, n) =>
          if (t - last < GapMs) st = SessionState(start, math.max(last, t), n + 1)
          else {
            out ::= Session(userId, start, n)
            st = SessionState(t, t, 1)
          }
      }
    }
    if (st != null) {
      state.update(st)
      state.setTimeoutTimestamp(st.openLast + GapMs)
    }
    out.reverseIterator
  }

  /** Streaming sessionize: (user_id, session_start TIMESTAMP, n_events). */
  def sessionize(events: DataFrame): Dataset[Session] = {
    import events.sparkSession.implicits._
    // The watermark column itself must survive into the typed Dataset —
    // event-time timeout is rejected if the projection drops it.
    events
      .select("user_id", "ts")
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }

  /** Replay `events` through the stateful sessionizer with a final
    * far-future flush event (advances the watermark so every open session
    * times out and emits) and return the closed sessions. */
  def run(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sessions").toString
    try {
      val ev = graft.Tables(s, sfDir, "events").select("user_id", "ts")
      ev.coalesce(1).write.mode("append").parquet(dir)
      // Flush chunk: one sentinel event far past max(ts) + gap + watermark,
      // on a key that is filtered back out of the results.
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0).getTime
      Seq((-1L, new java.sql.Timestamp(maxTs + 24 * 3600 * 1000L)))
        .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(dir)

      val stream = s.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(dir)
      val name = "mem_sessions_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = sessionize(stream).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      s.table(name)
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          date_format(timestamp_millis(col("session_start")), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events").cast("bigint").as("n_events"))
        .orderBy("user_id", "session_start")
    } finally {
      val root = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
