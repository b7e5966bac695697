package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.sampleTimes — the per-query contention self-diagnosis. Pure
  * logic, no Spark: a fake clock drives deterministic "wall times". */
class BenchSpec extends AnyFunSuite {

  /** a clock that advances by the next duration in `durations` (ns) each
    * start→stop bracket; `run` consumes one duration per invocation. */
  private def runWith(durationsSec: Double*): (() => Boolean, () => Long) = {
    val it = durationsSec.iterator
    var now = 0L
    var pending = 0L
    val run = () => { pending = (it.next() * 1e9).toLong; true }
    val clock = () => { now += pending; pending = 0L; now }
    (run, clock)
  }

  test("a stalled sample (>3x the other run) fires exactly one extra sample") {
    // run 1 fast, run 2 stalled 10x — the contention signature
    val (run, clock) = runWith(1.0, 10.0, 1.1)
    val (good, allOk, rerun) = Bench.sampleTimes(run, qRuns = 2, clock = clock)
    assert(rerun, "outlier re-run must fire on a >3x spread")
    assert(allOk)
    assert(good.length == 3, s"expected 2 base + 1 extra sample, got $good")
    assert(math.abs(good.min - 1.0) < 1e-9)
    // the published run list keeps the stalled sample visible
    assert(good.contains(10.0))
  }

  test("flat samples do not re-run") {
    val (run, clock) = runWith(1.0, 1.2)
    val (good, allOk, rerun) = Bench.sampleTimes(run, qRuns = 2, clock = clock)
    assert(!rerun)
    assert(allOk)
    assert(good.length == 2)
  }

  test("a ratio just under the threshold does not re-run; just over does") {
    val (r1, c1) = runWith(1.0, 2.9)
    assert(!Bench.sampleTimes(r1, 2, clock = c1)._3)
    val (r2, c2) = runWith(1.0, 3.1, 1.0)
    assert(Bench.sampleTimes(r2, 2, clock = c2)._3)
  }

  test("failed runs contribute no time and cannot trigger the re-run") {
    val it = Iterator(1.0, 50.0)
    var now = 0L; var pending = 0L; var calls = 0
    val run = () => { calls += 1; pending = (it.next() * 1e9).toLong; calls != 2 }
    val clock = () => { now += pending; pending = 0L; now }
    val (good, allOk, rerun) = Bench.sampleTimes(run, qRuns = 2, clock = clock)
    assert(!allOk)
    assert(!rerun, "a single good sample has no spread to diagnose")
    assert(good == Vector(1.0))
  }

  test("single-run mode never re-runs") {
    val (run, clock) = runWith(5.0)
    val (good, allOk, rerun) = Bench.sampleTimes(run, qRuns = 1, clock = clock)
    assert(!rerun && allOk && good == Vector(5.0))
  }
}
