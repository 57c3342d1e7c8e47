package graft

/** The driver's flagship smoke check: SparkEntry.entry must return rows on
  * sf0.001, and every queries key must have matching oracle aliases when an
  * oracle exists (the driver hashes columns sorted by name). */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
  }

  test("inventory size matches SURVEY accounting") {
    // round-2: +8 correlated-subquery, +3 streaming-drain, +2 skew-safe,
    // +1 tombstone-delete, +4 pipeline (sampling/repetition/packing),
    // +1 range-join, +1 counter oracles (72 oracle-checked + 7 rows-only)
    assert(SparkEntry.queries.size == 84, s"got ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == 77, s"got ${SparkEntry.oracleSql.size}")
  }
}
