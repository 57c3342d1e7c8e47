package graft

import org.scalatest.funsuite.AnyFunSuite

/** The history-aware requeue reference (Bench.historyRef) parses the two
  * committed artifacts it feeds on — BENCH_SOLO.json (solo_sec map) and
  * the newest same-sf BENCH_FULL_r*.json (queries minute map). Runs
  * against the REAL repo artifacts (tests run with cwd = the repo root),
  * so a format drift in either writer breaks here instead of silently
  * disabling the gate. */
class BenchHistorySpec extends AnyFunSuite {

  test("historyRef parses solo + round archives for the archived sf") {
    val ref = Bench.historyRef("/root/testdata/sf0.1")
    assert(ref.nonEmpty, "sf0.1 history must parse from the committed artifacts")
    // a known heavy entry present in both artifacts: the reference is the
    // MIN of the two, so it is bounded by the solo appendix's minute
    val w = ref.get("dedup_winnow_pairs")
    assert(w.isDefined, s"dedup_winnow_pairs missing from ${ref.size}-entry ref")
    assert(w.get > 0.5 && w.get < 10.0, s"implausible reference minute: $w")
    // entries absent from history simply have no reference (the criterion
    // never fires for them)
    assert(!ref.contains("entry_that_never_existed"))
  }

  test("historyRef is empty for a foreign sf dir") {
    assert(Bench.historyRef("/no/such/sf").isEmpty)
  }
}
