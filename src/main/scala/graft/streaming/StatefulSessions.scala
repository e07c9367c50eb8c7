package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ListBuffer

/** Streaming gap-sessionization with explicit keyed state — the
  * `flatMapGroupsWithState` counterpart of the batch window
  * sessionizer in operators/Sessions.scala, and the exact-parity
  * replacement for the reference's `updateStateByKey`
  * (AdClickRealTimeSpark.java:453-485) when per-key custom state is
  * genuinely needed. Unlike the reference (state grows forever),
  * sessions time out on the event-time watermark: state is bounded
  * by the number of OPEN sessions.
  *
  * Works on batch Datasets too (Spark runs the same function per
  * group, no timeouts), which the spec uses as a cross-check against
  * the window-based batch sessionizer.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts_sec: Long, event_type: String)
  case class SessionState(start_sec: Long, last_sec: Long, steps: Long,
                          purchases: Long)
  case class SessionOut(user_id: Long, start_sec: Long, visit_length: Long,
                        step_length: Long, purchases: Long)

  val DefaultGapSeconds = 1800L

  private def fresh(e: SessionEvent): SessionState =
    SessionState(e.ts_sec, e.ts_sec, 1L,
      if (e.event_type == "purchase") 1L else 0L)

  private def extended(s: SessionState, e: SessionEvent): SessionState =
    s.copy(last_sec = e.ts_sec, steps = s.steps + 1,
      purchases = s.purchases + (if (e.event_type == "purchase") 1L else 0L))

  private def closed(user: Long, s: SessionState): SessionOut =
    SessionOut(user, s.start_sec, s.last_sec - s.start_sec, s.steps, s.purchases)

  /** The state function: merge the batch's events (sorted by time)
    * into the open session, emit sessions closed by a gap inside the
    * batch, and arm an event-time timeout at last_sec + gap so the
    * watermark closes idle sessions. */
  def stateFn(gapSeconds: Long)(
      user: Long, evs: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val out = ListBuffer[SessionOut]()
    if (state.hasTimedOut) {
      out += closed(user, state.get)
      state.remove()
    } else {
      // Drop events STRICTLY behind the watermark before touching
      // state (boundary events exactly at the watermark are kept —
      // the filter below is >=), matching Spark's own late-data
      // semantics for aggregations: a late straggler must not
      // resurrect or re-arm a session whose timeout the watermark
      // already passed. (Batch runs have no watermark;
      // getCurrentWatermarkMs is unsupported there.)
      val wmMs =
        try state.getCurrentWatermarkMs
        catch { case _: UnsupportedOperationException => Long.MinValue }
      val sorted = evs.toSeq
        .filter(e => e.ts_sec * 1000L >= wmMs)
        .sortBy(e => (e.ts_sec, e.event_type))
      var cur = state.getOption
      sorted.foreach { e =>
        cur = cur match {
          case Some(s) if e.ts_sec - s.last_sec <= gapSeconds =>
            Some(extended(s, e))
          case Some(s) =>
            out += closed(user, s)
            Some(fresh(e))
          case None => Some(fresh(e))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // event-time timeouts only exist under a watermark (i.e. a
        // streaming Dataset); batch runs skip them. The timeout must be
        // strictly ahead of the current watermark (Spark raises
        // IllegalArgumentException and kills the query). With late
        // events dropped above, target can still equal the watermark
        // exactly (event at the watermark boundary, gap ~ 0), so the
        // clamp stays as defense in depth.
        try {
          val target = (s.last_sec + gapSeconds) * 1000L
          state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs + 1L, target))
        } catch { case _: UnsupportedOperationException => }
      }
    }
    out.iterator
  }

  /** Streaming entry: expects `events` with an event-time watermark
    * already applied upstream. Closed sessions are appended. */
  def sessionize(events: Dataset[SessionEvent],
                 gapSeconds: Long = DefaultGapSeconds): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn(gapSeconds))
  }
}
