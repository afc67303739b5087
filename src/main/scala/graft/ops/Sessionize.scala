package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed-state sessionization over the events stream — the engine's
  * `flatMapGroupsWithState` surface (custom state machine per key), plus the
  * equivalent batch formulation (gap → cumulative session index) used as its
  * oracle. Sessions close after `gapMinutes` of inactivity per user.
  */
object Sessionize {

  case class Ev(user_id: Long, ts_ms: Long, value: Double)
  case class SessionAgg(open: Boolean, start: Long, last: Long, n: Int, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long, total_value: Double)

  /** Batch sessionization: lag-gap flags → running session index → groupBy.
    * Two shuffles (window + agg), both keyed by user. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapMs = gapMinutes * 60000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    events
      .withColumn("__prev", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("__new", (col("__prev").isNull || col("ts_ms") - col("__prev") > gapMs).cast("int"))
      .withColumn("__sess", sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__sess"))
      .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .drop("__sess")
  }

  case class UserStats(user_id: Long, n_events: Long, total_value: Double,
                       first_ms: Long, last_ms: Long)

  /** Per-user LIFETIME stats with `mapGroupsWithState` — the one-output-per-
    * key variant of the keyed-state surface ([[sessionsStream]] is the
    * flat/multi-output one): state carries the running (count, sum, first,
    * last) and every trigger emits the key's updated totals. Update output
    * mode; works identically on a batch frame (spec-pinned against the
    * groupBy oracle). */
  def userStatsStream(events: Dataset[Ev]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[UserStats]) =>
          var s = state.getOption.getOrElse(
            UserStats(user, 0L, 0.0, Long.MaxValue, Long.MinValue))
          rows.foreach { e =>
            s = s.copy(n_events = s.n_events + 1, total_value = s.total_value + e.value,
              first_ms = math.min(s.first_ms, e.ts_ms), last_ms = math.max(s.last_ms, e.ts_ms))
          }
          state.update(s)
          s
      }
  }

  /** Streaming sessionization with explicit keyed state: events are sorted
    * inside the handler (order-robust per trigger), state carries the open
    * session, closed sessions emit. With `idleTimeout` set, a
    * ProcessingTimeTimeout flushes idle users; with None (default) open
    * sessions stay in state until a later event or sentinel closes them —
    * the cheap mode for this sandbox, where Hadoop's no-native-IO shell
    * fallback makes every extra state commit cost process forks.
    */
  def sessionsStream(events: Dataset[Ev], gapMinutes: Int,
      idleTimeout: Option[String] = None): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs   = gapMinutes * 60000L
    val timeout = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, Session](
        OutputMode.Append, timeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.filter(_.open)
              .map(s => Session(user, s.start, s.last, s.n, s.sum)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toArray.sortBy(_.ts_ms)
            var cur    = state.getOption.filter(_.open).orNull
            val closed = List.newBuilder[Session]
            sorted.foreach { e =>
              if (cur == null) cur = SessionAgg(open = true, e.ts_ms, e.ts_ms, 1, e.value)
              else if (e.ts_ms - cur.last > gapMs) {
                closed += Session(user, cur.start, cur.last, cur.n, cur.sum)
                cur = SessionAgg(open = true, e.ts_ms, e.ts_ms, 1, e.value)
              } else cur = cur.copy(last = e.ts_ms, n = cur.n + 1, sum = cur.sum + e.value)
            }
            if (cur != null) {
              state.update(cur)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            closed.result().iterator
          }
      }
  }
}
