package graft

/** Smoke coverage of the driver contract: every declared query runs
  * at sf0.001 and every query has either an oracle or a documented
  * reason not to. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns a non-degenerate result") {
    val allowedEmpty = Set.empty[String] // every query must produce rows
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0 || allowedEmpty(name), s"$name returned $n rows")
    }
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("oracle keys all refer to real queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }
}
