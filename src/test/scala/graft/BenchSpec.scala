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

  // --- noise-defense retries (BENCH_r10 carried 3 false budget overruns
  // from ambient machine load; the loop now re-samples before recording) ---

  test("a slow-first-run query over budget is retried and the retry wins") {
    // Injected noise: first two runs 10x the true cost, third run clean.
    val timings = Iterator(2.0, 2.0, 0.2)
    val (runs, retries) =
      Bench.runsWithRetry(() => Bench.Run(timings.next(), 0L, 0L), repeat = 2, budget = Some(0.2))
    assert(retries == 1)
    assert(runs.size == 3)
    assert(Bench.best(runs.map(_.sec)) == 0.2)
  }

  test("retries stop at maxRetries even if still over budget (genuine regression)") {
    val (runs, retries) =
      Bench.runsWithRetry(() => Bench.Run(9.0, 0L, 0L), repeat = 2, budget = Some(0.1), maxRetries = 2)
    assert(retries == 2)
    assert(runs.size == 4)
    assert(Bench.best(runs.map(_.sec)) == 9.0) // still over — surfaces as real
  }

  test("no budget or within budget means no retries") {
    var calls = 0
    val run = () => { calls += 1; Bench.Run(0.5, 0L, 0L) }
    assert(Bench.runsWithRetry(run, repeat = 2, budget = None)._2 == 0)
    assert(calls == 2)
    assert(Bench.runsWithRetry(run, repeat = 2, budget = Some(0.4))._2 == 0)
    assert(calls == 4) // 0.5 <= 5 * 0.4 — inside the 5x band
  }

  test("all-failed runs never trigger retries (failure is not an overrun)") {
    val (_, retries) =
      Bench.runsWithRetry(() => Bench.Run(-1.0, 0L, 0L), repeat = 2, budget = Some(0.1))
    assert(retries == 0)
  }

  test("byte minimums ignore failed runs and are None when all failed") {
    // failed run carried a partial 5-byte delta — must not win the min
    val rs = Seq(Bench.Run(-1.0, 5L, 3L), Bench.Run(1.0, 100L, 60L), Bench.Run(0.9, 120L, 50L))
    assert(Bench.bestBytes(rs, _.shuffle) == Some(100L))
    assert(Bench.bestBytes(rs, _.scan) == Some(50L))
    assert(Bench.bestBytes(Seq(Bench.Run(-1.0, 5L, 3L)), _.shuffle).isEmpty)
  }

  // --- structured budgets + the deterministic gate (r15: the sub-second
  // wall gate was noise-dominated; bytes only move when the plan does) ---

  test("parseBudgets accepts flat, structured, and mixed entries") {
    val b = Bench.parseBudgets(
      """{"a": 1.5, "b": {"sec": 2.0, "shuffle_mb": 10.5, "scan_mb": 30},
         |"c": {"shuffle_mb": 4}}""".stripMargin)
    assert(b("a") == Bench.QBudget(Some(1.5), None, None))
    assert(b("b") == Bench.QBudget(Some(2.0), Some(10.5), Some(30.0)))
    assert(b("c") == Bench.QBudget(None, Some(4.0), None))
  }

  test("wall-clock breach only fires for queries budgeted >=1 s") {
    val small = Bench.QBudget(Some(0.3), None, None)
    // 10x over a 0.3 s budget: ambient territory — no breach
    assert(Bench.breaches(3.0, None, None, small).isEmpty)
    val big = Bench.QBudget(Some(2.0), None, None)
    assert(Bench.breaches(11.0, None, None, big).nonEmpty)
    assert(Bench.breaches(9.9, None, None, big).isEmpty) // inside 5x
    assert(Bench.breaches(-1.0, None, None, big).isEmpty) // failure != overrun
  }

  test("byte gauges breach at 1.5x + 1 MB regardless of query size") {
    val b = Bench.QBudget(Some(0.2), Some(10.0), Some(20.0))
    // 10 MB budget -> limit 16 MB; 20 MB budget -> limit 31 MB
    assert(Bench.breaches(0.2, Some(15_000_000L), Some(30_000_000L), b).isEmpty)
    assert(Bench.breaches(0.2, Some(17_000_000L), Some(30_000_000L), b).size == 1)
    assert(Bench.breaches(0.2, Some(17_000_000L), Some(32_000_000L), b).size == 2)
    // missing budget or missing measurement -> no breach
    assert(Bench.breaches(0.2, Some(999_000_000L), None,
      Bench.QBudget(None, None, Some(1.0))).isEmpty)
  }
}
