package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{SessionEvent, SessionOut}

/** ScalaCheck properties for gap sessionization (SURVEY §5 test
  * strategy: property tests for the sessionization fold). Runs the
  * batch-mode state function logic as a pure fold — no Spark —
  * checking the invariants any sessionizer must satisfy.
  */
object SessionPropertiesSpec extends Properties("sessionize") {

  private val Gap = 1800L

  /** Pure reference fold: sort by time, split on gap. */
  private def sessionsOf(events: List[SessionEvent]): List[SessionOut] = {
    if (events.isEmpty) return Nil
    val sorted = events.sortBy(e => (e.ts_sec, e.event_type))
    val out = scala.collection.mutable.ListBuffer[SessionOut]()
    var start = sorted.head.ts_sec
    var last = start
    var steps = 0L
    var purchases = 0L
    sorted.foreach { e =>
      if (e.ts_sec - last > Gap) {
        out += SessionOut(e.user_id, start, last - start, steps, purchases)
        start = e.ts_sec; steps = 0; purchases = 0
      }
      last = e.ts_sec
      steps += 1
      if (e.event_type == "purchase") purchases += 1
    }
    out += SessionOut(sorted.head.user_id, start, last - start, steps, purchases)
    out.toList
  }

  private val genEvents: Gen[List[SessionEvent]] = for {
    n <- Gen.choose(1, 60)
    ts <- Gen.listOfN(n, Gen.choose(0L, 100000L))
    kinds <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase", "error"))
  } yield ts.zip(kinds).map { case (t, k) => SessionEvent(7L, t, k) }

  property("sessions partition the events: step counts sum to n") =
    Prop.forAll(genEvents) { evs =>
      sessionsOf(evs).map(_.step_length).sum == evs.length
    }

  property("within a session, span <= (steps-1) * gap") =
    Prop.forAll(genEvents) { evs =>
      sessionsOf(evs).forall(s => s.visit_length <= (s.step_length - 1) * Gap)
    }

  property("consecutive sessions are separated by more than the gap") =
    Prop.forAll(genEvents) { evs =>
      val ss = sessionsOf(evs)
      ss.zip(ss.drop(1)).forall { case (a, b) =>
        b.start_sec - (a.start_sec + a.visit_length) > Gap
      }
    }

  property("purchase counts sum to total purchases") =
    Prop.forAll(genEvents) { evs =>
      sessionsOf(evs).map(_.purchases).sum ==
        evs.count(_.event_type == "purchase")
    }

  property("matches the GroupState fold run in batch mode") =
    Prop.forAll(genEvents) { evs =>
      // drive the production state function with a no-op GroupState
      val state = new org.apache.spark.sql.streaming.GroupState[StatefulSessions.SessionState] {
        private var v: Option[StatefulSessions.SessionState] = None
        def exists: Boolean = v.isDefined
        def get: StatefulSessions.SessionState = v.get
        def getOption: Option[StatefulSessions.SessionState] = v
        def update(s: StatefulSessions.SessionState): Unit = v = Some(s)
        def remove(): Unit = v = None
        def hasTimedOut: Boolean = false
        def setTimeoutDuration(d: Long): Unit =
          throw new UnsupportedOperationException
        def setTimeoutDuration(d: String): Unit =
          throw new UnsupportedOperationException
        def setTimeoutTimestamp(t: Long): Unit =
          throw new UnsupportedOperationException
        def setTimeoutTimestamp(t: Long, add: String): Unit =
          throw new UnsupportedOperationException
        def setTimeoutTimestamp(t: java.sql.Date): Unit =
          throw new UnsupportedOperationException
        def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit =
          throw new UnsupportedOperationException
        def getCurrentWatermarkMs(): Long = 0L
        def getCurrentProcessingTimeMs(): Long = 0L
      }
      val emitted = StatefulSessions.stateFn(Gap)(7L, evs.iterator, state).toList
      val open = state.getOption.map(s =>
        SessionOut(7L, s.start_sec, s.last_sec - s.start_sec, s.steps, s.purchases))
      (emitted ++ open).sortBy(_.start_sec) == sessionsOf(evs).sortBy(_.start_sec)
    }
}
