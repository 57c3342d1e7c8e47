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
    // round-3: 88 r2 entries + ev_value_percentiles_approx (rows-only
    // sketch twin) + wc_compaction_incremental + ann_ivf_int8_topk = 91; oracles 81 +
    // mm_decode_batch (real header parse replaced the stub) +
    // wc_compaction_incremental = 83; rows-only = 8
    // (minhash/simhash/clusters/rp-lsh/ivf/approx-distinct/approx-pct).
    assert(SparkEntry.queries.size == 91, s"got ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == 83, s"got ${SparkEntry.oracleSql.size}")
  }
}
