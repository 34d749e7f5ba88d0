package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.StreamBench

/** Pins the state-partition sizing rule StreamBench applies to the
  * stateful shapes (r15 SCALE datum, landed r16): partitions track
  * per-batch row volume (~3.2k rows per state partition, the measured
  * sf0.1 knee: p50 699/430/437 ms at 8/4/2 partitions), clamped to
  * [1, cpus]. */
class StreamTuningSpec extends AnyFunSuite {

  test("sf0.1 calibration point: 12.5k rows/batch on 32 cpus -> 4 state partitions") {
    assert(StreamBench.tunedStatePartitions(12500, 32) == 4)
  }

  test("tiny batches floor at one partition") {
    assert(StreamBench.tunedStatePartitions(0, 32) == 1)
    assert(StreamBench.tunedStatePartitions(100, 32) == 1)
  }

  test("large batches clamp to the core count (full parallelism at scale)") {
    assert(StreamBench.tunedStatePartitions(1000000, 32) == 32)
    assert(StreamBench.tunedStatePartitions(1000000000L, 64) == 64)
  }

  test("monotone in volume below the clamp") {
    val vals = Seq(1000L, 5000L, 12500L, 25000L, 50000L)
      .map(StreamBench.tunedStatePartitions(_, 32))
    assert(vals == vals.sorted && vals.distinct.size > 2, vals)
  }
}
