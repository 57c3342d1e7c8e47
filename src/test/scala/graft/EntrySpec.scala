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
    // round-2 end: 59 r1 entries + 29 new (subquery wave 8, streaming
    // drains 5, skew 2, pipeline 5 incl. capstone, tombstone/counter/MV 3,
    // range join, resize, retention, sliding window, daily pivot, int8
    // quantization) = 88 total, of which 81 carry DuckDB oracles and 7 are
    // rows-only (minhash/simhash/clusters/rp-lsh/ivf/approx-distinct/
    // decode-stub).
    assert(SparkEntry.queries.size == 88, s"got ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == 81, s"got ${SparkEntry.oracleSql.size}")
  }
}
