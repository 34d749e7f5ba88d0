package graft.nn

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import scala.util.Random

class BatchingSpec extends AnyFunSuite {

  test("batch > n clamps to n-1 (ml_util.py:105-106 parity)") {
    val idx = Batching.batchIndices(10, 50, -1, new Random(1))
    assert(idx.length == 9)
  }

  test("batch <= 0 returns the full set in order") {
    assert(Batching.batchIndices(5, 0, -1, new Random(1)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(Batching.batchIndices(5, -1, -1, new Random(1)).toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("sequential idx slices [idx*b, idx*b+b) and truncates at n") {
    assert(Batching.batchIndices(10, 4, 0, new Random(1)).toSeq == Seq(0, 1, 2, 3))
    assert(Batching.batchIndices(10, 4, 1, new Random(1)).toSeq == Seq(4, 5, 6, 7))
    assert(Batching.batchIndices(10, 4, 2, new Random(1)).toSeq == Seq(8, 9))
    assert(Batching.batchIndices(10, 4, 5, new Random(1)).isEmpty)
  }

  test("random mode samples without replacement (property)") {
    val prop = Prop.forAll(Gen.choose(2, 100), Gen.choose(1, 99), Gen.choose(0L, 1000L)) {
      (n: Int, bRaw: Int, seed: Long) =>
        val b = math.min(bRaw, n - 1)
        val idx = Batching.batchIndices(n, b, -1, new Random(seed))
        idx.length == b && idx.distinct.length == idx.length &&
          idx.forall(i => i >= 0 && i < n)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("shuffle is a permutation applied to x and y identically") {
    val x = DenseMatrix.tabulate[Double](6, 2)((r, c) => r * 10.0 + c)
    val y = DenseMatrix.tabulate[Double](6, 1)((r, _) => r.toDouble)
    val (xs, ys) = Batching.shuffle(x, y, new Random(3))
    assert((0 until 6).map(r => xs(r, 0) / 10.0).sorted == (0 until 6).map(_.toDouble))
    (0 until 6).foreach { r => assert(xs(r, 0) / 10.0 == ys(r, 0)) }
  }

  test("sweepCount covers all rows") {
    assert(Batching.sweepCount(10, 4) == 3)
    assert(Batching.sweepCount(10, 0) == 1)
    assert(Batching.sweepCount(10, 100) == 2) // clamped to 9 → ceil(10/9)
  }
}
