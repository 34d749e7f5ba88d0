package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's timing estimator: round 6 shipped with a
  * broken call site of `best`, which blinded every driver signal for a
  * round — the helper and its sentinel contract now fail loudly here
  * instead. */
class BenchSpec extends AnyFunSuite {
  test("best returns the minimum of successful runs, ignoring -1 failures") {
    assert(Bench.best(Seq(2.5, 1.25, 3.0)) == 1.25)
    assert(Bench.best(Seq(-1.0, 4.0, 2.0)) == 2.0)
    assert(Bench.best(Seq(7.5)) == 7.5)
  }

  test("best returns the -1 sentinel only when every run failed") {
    assert(Bench.best(Seq(-1.0, -1.0)) == -1.0)
    assert(Bench.best(Seq.empty) == -1.0)
    // a zero-second success is a timing, not a failure
    assert(Bench.best(Seq(-1.0, 0.0)) == 0.0)
  }
}
