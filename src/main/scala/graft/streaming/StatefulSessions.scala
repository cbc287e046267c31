package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state operator (SURVEY §2.2 row 39's stronger flavour):
  * per-user session assembly with an explicit state machine instead of
  * the built-in `session_window`.
  *
  * Semantics match `session_window(ts, gap)` including out-of-order
  * arrivals: state holds ALL open sessions (every session whose close is
  * not yet past the watermark), a late event inside the watermark starts
  * or extends whichever session its interval touches (sessions bridge and
  * merge when an event closes the gap between them), and events behind
  * the watermark are dropped exactly like the built-in. Sessions emit
  * once the watermark passes `last + gap` — after that no surviving event
  * can merge into them (it would need ts < last + gap ≤ watermark).
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Int) // micros
  final case class UserSessions(open: List[OpenSession])
  final case class Session(user_id: Long, session_start: Long, n_events: Int) // micros

  // All session arithmetic runs in MICROSECONDS: the built-in
  // session_window (and the DuckDB oracle) compare gaps at µs precision,
  // so an event pair straddling the gap boundary within 1 ms must not
  // merge here while splitting there.
  private[streaming] val GapUs = 10 * 60 * 1000000L

  /** Microseconds since epoch of a Timestamp (getTime alone truncates to
    * ms; the sub-ms part lives in getNanos, which also repeats the ms). */
  private[streaming] def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Insert one event, then re-normalize: sort by start and merge every
    * pair of neighbours whose gap closed. */
  private[streaming] def insert(open: List[OpenSession], t: Long): List[OpenSession] = {
    val sorted = (OpenSession(t, t, 1) :: open).sortBy(_.start)
    sorted.foldLeft(List.empty[OpenSession]) {
      case (acc @ (prev :: rest), cur) if cur.start < prev.last + GapUs =>
        OpenSession(prev.start, math.max(prev.last, cur.last), prev.n + cur.n) :: rest
      case (acc, cur) => cur :: acc
    }.reverse
  }

  def step(userId: Long, events: Iterator[Event],
      state: GroupState[UserSessions]): Iterator[Session] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    var open = state.getOption.map(_.open).getOrElse(Nil)
    if (!state.hasTimedOut) {
      // Drop events behind the watermark (the built-in does the same),
      // fold the rest into the open-session set.
      events.map(e => micros(e.ts)).filter(_ >= wmUs).toArray.sorted
        .foreach(t => open = insert(open, t))
    }
    val (closed, stillOpen) = open.partition(_.last + GapUs <= wmUs)
    if (stillOpen.nonEmpty) {
      state.update(UserSessions(stillOpen))
      // Timeout API is ms-granular: round the µs close time UP so the
      // close predicate above is already true when the timeout fires.
      // Clamp: a timeout at or below the watermark is rejected by Spark.
      val closeMs = (stillOpen.map(_.last).min + GapUs + 999L) / 1000L
      state.setTimeoutTimestamp(
        math.max(closeMs, state.getCurrentWatermarkMs() + 1))
    } else {
      state.remove()
    }
    closed.sortBy(_.start)
      .map(s => Session(userId, s.start, s.n)).iterator
  }

  /** Streaming sessionize: (user_id, session_start TIMESTAMP, n_events).
    * The watermark column itself must survive into the typed Dataset —
    * event-time timeout is rejected if the projection drops it. */
  def sessionize(events: DataFrame): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .select("user_id", "ts")
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }

  /** Replay `events` through a stateful sessionizer with a final
    * far-future flush event (advances the watermark so every open session
    * times out and emits) and return the closed sessions. Shared by the
    * flatMapGroupsWithState and transformWithState implementations. */
  private[streaming] def runWith(s: SparkSession, sfDir: String)(
      sessionizeFn: DataFrame => Dataset[Session]): DataFrame = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sessions").toString
    try {
      val ev = graft.Tables(s, sfDir, "events").select("user_id", "ts")
      // Multi-task replay write: range-partitioned time-ordered chunks
      // (same shape as Streams.replayDir), not a single-task coalesce(1)
      // funnel of the whole table.
      ev.repartitionByRange(8, col("ts"), col("user_id"))
        .sortWithinPartitions("ts", "user_id")
        .write.mode("append").parquet(dir)
      // Flush chunk: one sentinel event far past max(ts) + gap + watermark,
      // on a key that is filtered back out of the results.
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0).getTime
      Seq((-1L, new java.sql.Timestamp(maxTs + 24 * 3600 * 1000L)))
        .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(dir)

      val stream = s.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(dir)
      Streams.runToMemory(s, sessionizeFn(stream).toDF(), "append")
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          date_format(timestamp_micros(col("session_start")), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events").cast("bigint").as("n_events"))
        .orderBy("user_id", "session_start")
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  def run(s: SparkSession, sfDir: String): DataFrame =
    runWith(s, sfDir)(sessionize)
}
