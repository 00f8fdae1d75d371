package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication rules (r19 task 1): a published number
  * must either be trustworthy (min of ≥2 read reps) or visibly flagged
  * (plan_hot, against a persisted per-query plan_ms floor).
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  test("planHotRule flags only genuine floor blowouts") {
    // r18's real contention cases flag
    assert(Bench.planHotRule(14086, Some(963)))
    assert(Bench.planHotRule(10713, Some(827)))
    // clean steady state does not (within 3x of floor)
    assert(!Bench.planHotRule(1100, Some(963)))
    assert(!Bench.planHotRule(2800, Some(963)))
    // millisecond-scale plans never flag on JIT noise: 12 ms over a 3 ms
    // floor is 4x but under the 500 ms absolute slack
    assert(!Bench.planHotRule(12, Some(3)))
    assert(Bench.planHotRule(520, Some(3)))
    // no stored floor (first run on this machine) -> never flags
    assert(!Bench.planHotRule(14086, None))
    // failed query (sentinel -1) -> never flags
    assert(!Bench.planHotRule(-1, Some(963)))
  }

  test("median is the true middle for odd and even rep counts") {
    assert(Bench.median(Seq(3.0)) == 3.0)
    assert(Bench.median(Seq(1.0, 9.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(1.0, 2.0, 8.0, 9.0)) == 5.0)
  }
}
