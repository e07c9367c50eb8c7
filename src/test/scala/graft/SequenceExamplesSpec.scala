package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessions

/** Next-event sequence examples (q_sequence_examples): the oracle
  * gate pins the rows; this spec pins the constructor's contract —
  * example count = Σ_u max(0, n_u − 3) (drop-don't-pad), and the
  * context is exactly the previous three event types in timeline
  * order for a hand-reconstructed user.
  */
class SequenceExamplesSpec extends SparkSpec {

  private lazy val out = Sessions.qSequenceExamples(spark, sf).collect()

  test("example count is sum over users of max(0, n - 3)") {
    val perUser = Tables.eventsNorm(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => math.max(0L, r.getLong(1) - 3)).sum
    assert(out.length.toLong == perUser)
  }

  test("context reconstructs the user's timeline, sliding by one") {
    val events = Tables.eventsNorm(spark, sf)
      .orderBy("ts", "event_id")
      .select("user_id", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = events.groupBy(_._1)
    val got = out.groupBy(_.getLong(0))
    byUser.foreach { case (u, evs) =>
      val types = evs.map(_._3)
      val expected = types.sliding(4).filter(_.length == 4)
        .map(w => (w.take(3).mkString(" "), w(3))).toSeq
      val actual = got.getOrElse(u, Array.empty)
        .sortBy(_.getLong(1)) // event_id rises with the timeline feed
        .map(r => (r.getString(3), r.getString(4))).toSeq
      // compare as multisets: event_id order within a user may differ
      // from timeline order only if ids aren't monotone; the gate's
      // oracle already pins exact rows, so set-equality suffices here
      assert(actual.sorted == expected.sorted, s"user $u")
    }
  }
}
