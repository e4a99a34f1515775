package graft

/** The driver smoke-checks SparkEntry.entry rows>0 at sf0.001 — keep a
  * spec on the same contract so a refactor can't silently break it. */
class EntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every queries key has either an oracle or a spec-validated marker") {
    val specOnly = Set("d4_simhash", "d6_winnowing", "t6_recursive_chunk")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- specOnly
    assert(missing.isEmpty, s"queries without oracle or spec: $missing")
  }
}
