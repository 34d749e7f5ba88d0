package graft.nn

import breeze.linalg.DenseMatrix
import scala.util.Random

/** Batch-slicing + in-partition shuffle semantics, a faithful port of the
  * reference's `handle_feed_dict` (lifeomic/sparkflow `ml_util.py:104-127`)
  * and `handle_shuffle` (`ml_util.py:130-134`):
  *
  *  - batch >= n          → clamp to n-1 (`ml_util.py:105-106`)
  *  - batch <= 0          → full set
  *  - idx provided        → sequential slice [idx*batch, idx*batch+batch)
  *  - otherwise           → uniform sample WITHOUT replacement
  */
object Batching {

  /** Returns row indices for the batch. `idx = -1` means "no sequential
    * index" (random sampling mode). */
  def batchIndices(n: Int, batchSize: Int, idx: Int, rng: Random): Array[Int] = {
    var b = batchSize
    if (b >= n) b = n - 1
    if (b <= 0) return Array.range(0, n)
    if (idx >= 0) {
      val start = math.min(idx * b, n)
      val end = math.min(start + b, n)
      Array.range(start, end)
    } else {
      sampleWithoutReplacement(n, b, rng)
    }
  }

  def sampleWithoutReplacement(n: Int, k: Int, rng: Random): Array[Int] = {
    // partial Fisher-Yates over an index array
    val idx = Array.range(0, n)
    var i = 0
    while (i < k) {
      val j = i + rng.nextInt(n - i)
      val tmp = idx(i); idx(i) = idx(j); idx(j) = tmp
      i += 1
    }
    java.util.Arrays.copyOfRange(idx, 0, k)
  }

  /** Random permutation applied identically to features and labels. */
  def shuffle(
      x: DenseMatrix[Double],
      y: DenseMatrix[Double],
      rng: Random): (DenseMatrix[Double], DenseMatrix[Double]) = {
    val perm = rng.shuffle((0 until x.rows).toVector).toArray
    (selectRows(x, perm), if (y == null) null else selectRows(y, perm))
  }

  def selectRows(m: DenseMatrix[Double], rows: Array[Int]): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](rows.length, m.cols)
    var i = 0
    while (i < rows.length) { out(i, ::) := m(rows(i), ::); i += 1 }
    out
  }

  /** Number of sequential sweeps covering n rows at batch b (ceil). */
  def sweepCount(n: Int, batchSize: Int): Int = {
    var b = batchSize
    if (b >= n) b = n - 1
    if (b <= 0) 1 else (n + b - 1) / b
  }
}
