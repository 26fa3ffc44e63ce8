package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event consumed by the typed sessionizer (ts in epoch microseconds). */
final case class SessionEvent(user_id: Long, event_id: Long, ts: Long, value: Double)

/** One gap-delimited user session. */
final case class UserSession(
    user_id: Long,
    session_start: Long,
    session_end: Long,
    n_events: Int,
    session_value: Double)

/**
 * Custom stateful sessionization via `flatMapGroupsWithState` — the typed
 * escape hatch for session semantics the built-in `session_window` can't
 * express (per-session custom accumulators, mid-session triggers, etc.).
 *
 * Works in batch mode as-is (state starts empty, each key visited once, the
 * trailing session is emitted because the group's input ends). In a
 * streaming query the same function holds the open trailing session in
 * `GroupState` across micro-batches and would emit it on event-time
 * timeout; that refinement only changes the final-emit branch.
 *
 * A new session starts when the gap is >= `gapMicros`, matching
 * `session_window`'s boundary semantics (see queries.Streaming).
 */
object StatefulSessionize {

  def sessionize(events: Dataset[SessionEvent], gapMicros: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionEvent], UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[List[SessionEvent]]) =>
          val pending = state.getOption.getOrElse(Nil)
          val evs = (pending.iterator ++ it).toArray.sortBy(e => (e.ts, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            val sessions = Array.newBuilder[UserSession]
            var start = evs(0).ts
            var end = evs(0).ts
            var n = 0
            var sum = 0.0
            evs.foreach { e =>
              if (n > 0 && e.ts - end >= gapMicros) {
                sessions += UserSession(uid, start, end, n, sum)
                start = e.ts; n = 0; sum = 0.0
              }
              end = e.ts; n += 1; sum += e.value
            }
            // batch: group input is complete, so the trailing session closes
            // here; a streaming build would state.update() it instead.
            sessions += UserSession(uid, start, end, n, sum)
            state.remove()
            sessions.result().iterator
          }
      }
  }
}
