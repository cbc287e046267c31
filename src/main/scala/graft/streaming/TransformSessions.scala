package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** The same µs-precision sessionization semantics as [[StatefulSessions]]
  * through `transformWithState` — Spark 4's successor of the
  * soft-deprecated `flatMapGroupsWithState` (SPARK-46815). The state
  * machine is shared ([[StatefulSessions.insert]]); what changes is the
  * operator contract:
  *  - state is an explicit named [[ValueState]] from the processor handle
  *    instead of the single implicit `GroupState` value;
  *  - event-time timeouts become explicit registered timers
  *    (`handleExpiredTimer`), which may be multiple per key — this
  *    processor keeps exactly one armed (earliest pending close);
  *  - the operator requires the RocksDB state store provider, which
  *    [[run]] scopes to the query instead of setting session-wide.
  *
  * Correctness gate: the `s_tws_sessions` entry runs against the same
  * gaps-and-islands DuckDB oracle as `s_stateful_sessions` — both
  * implementations must match the batch semantics exactly, including
  * out-of-order merge and µs gap comparison.
  */
object TransformSessions {
  import StatefulSessions.{Event, Session, UserSessions, GapUs, insert, micros}

  class SessionProcessor extends StatefulProcessor[Long, Event, Session] {
    @transient private var open: ValueState[UserSessions] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open", Encoders.product[UserSessions], TTLConfig.NONE)

    /** Emit every session whose close (`last + gap`) is at or behind the
      * watermark, persist the rest, and re-arm ONE timer at the earliest
      * remaining close (ms-granular API: round µs UP, clamp above the
      * watermark so the close predicate holds when the timer fires). */
    private def sweep(key: Long, wmMs: Long): Iterator[Session] = {
      val cur = if (open.exists()) open.get().open else Nil
      val wmUs = wmMs * 1000L
      val (closed, stillOpen) = cur.partition(_.last + GapUs <= wmUs)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (stillOpen.nonEmpty) {
        open.update(UserSessions(stillOpen))
        val closeMs = (stillOpen.map(_.last).min + GapUs + 999L) / 1000L
        getHandle.registerTimer(math.max(closeMs, wmMs + 1))
      } else open.clear()
      closed.sortBy(_.start)
        .map(s => Session(key, s.start, s.n)).iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Session] = {
      val wmUs = tv.getCurrentWatermarkInMs() * 1000L
      var cur = if (open.exists()) open.get().open else Nil
      // The operator already drops rows behind the watermark; the filter
      // stays as belt-and-braces so the state machine never regresses if
      // the operator-level late-record filter semantics shift.
      rows.map(e => micros(e.ts)).filter(_ >= wmUs).toArray.sorted
        .foreach(t => cur = insert(cur, t))
      open.update(UserSessions(cur))
      sweep(key, tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] =
      sweep(key, tv.getCurrentWatermarkInMs())
  }

  /** Streaming sessionize through transformWithState; same output shape
    * as [[StatefulSessions.sessionize]]. */
  def sessionize(events: DataFrame): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .select("user_id", "ts")
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** Replay + flush like [[StatefulSessions.run]], with the RocksDB state
    * store provider (required by transformWithState) scoped to this query
    * and the previous provider restored afterwards. */
  def run(s: SparkSession, sfDir: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try StatefulSessions.runWith(s, sfDir)(sessionize)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
