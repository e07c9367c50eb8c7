package graft

import graft.streaming.StatefulSequences

/** Stateful streaming sequence-example construction
  * (stream_sequence_examples): the oracle gate pins the rows; this
  * spec pins COMPOSITIONALITY — any event-time-ordered micro-batch
  * split must concatenate to exactly the batch lag-window's output,
  * including the splits that cut straight through a user's history
  * (state carries the partial 3-type context across the cut).
  */
class StatefulSequencesSpec extends SparkSpec {

  private lazy val batch = graft.operators.Sessions
    .qSequenceExamples(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getString(4))).toSet

  private def stream(n: Int) = StatefulSequences
    .streamSequenceExamples(spark, sf, n).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getString(4))).toSet

  test("one-batch replay equals the batch constructor") {
    assert(stream(1) == batch)
  }

  test("seven-batch replay equals the batch constructor (state spans the cuts)") {
    assert(stream(7) == batch)
  }
}
