package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AdStream

/** Pins the Kafka DataStreamReader configuration — the only lines of
  * the streaming surface that cannot EXECUTE in this offline
  * container (no broker, no spark-sql-kafka connector jar; see
  * COVERAGE.md). Everything downstream of `.load()` runs for real in
  * StreamFanoutE2ESpec from a replayable file source; this spec
  * asserts the exact format + options map handed to the reader so
  * the unexecutable lines are at least contract-checked against the
  * reference's consumer params (AdClickRealTimeSpark.java:69-92).
  * No SparkSession needed: the config is plain data by design. */
class KafkaSourceSpec extends AnyFunSuite {

  test("kafka source config pins format and required options") {
    val (fmt, opts) = AdStream.kafkaSourceConfig("broker1:9092,broker2:9092", "ad_real_time_log")
    assert(fmt == "kafka")
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "ad_real_time_log",
      "startingOffsets" -> "latest"))
  }

  test("broker list and topic pass through verbatim") {
    val (_, opts) = AdStream.kafkaSourceConfig("k:1234", "t")
    assert(opts("kafka.bootstrap.servers") == "k:1234")
    assert(opts("subscribe") == "t")
  }
}
