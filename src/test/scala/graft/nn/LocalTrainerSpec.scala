package graft.nn

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite

class LocalTrainerSpec extends AnyFunSuite {
  private val xorX = DenseMatrix((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
  private val xorY = DenseMatrix(0.0, 1.0, 1.0, 0.0)
  // reference net shape: 2 → 12 → 7 → 1 sigmoid, MSE (tests/dl_runner.py:45-53)
  private val spec = NetSpec.input(2).dense(12, "tanh").dense(7, "tanh")
    .dense(1, "sigmoid").loss("mse")

  private def xorAccuracy(w: Tensors.Tensors): Int = {
    val net = new Network(spec)
    val p = net.forward(xorX, w)
    (0 until 4).count(r => (if (p(r, 0) > 0.5) 1.0 else 0.0) == xorY(r, 0))
  }

  test("full-batch adam converges on XOR") {
    val w = LocalTrainer.fit(spec, xorX, xorY, Optimizer.build("adam", 0.05),
      LocalTrainer.Config(iters = 500, shufflePerIter = true, seed = 42L))
    assert(xorAccuracy(w) == 4)
  }

  test("sequential mini-batch mode converges on XOR") {
    val w = LocalTrainer.fit(spec, xorX, xorY, Optimizer.build("adam", 0.05),
      LocalTrainer.Config(iters = 500, miniBatchSize = 2, seed = 7L))
    assert(xorAccuracy(w) >= 3)
  }

  test("random mini-batch (stochastic) mode converges on XOR") {
    val w = LocalTrainer.fit(spec, xorX, xorY, Optimizer.build("adam", 0.05),
      LocalTrainer.Config(iters = 500, miniBatchSize = 2, miniStochasticIters = 2, seed = 7L))
    assert(xorAccuracy(w) >= 3)
  }

  test("loss decreases over training (gaussian blobs)") {
    val rng = new scala.util.Random(12345)
    val n = 200
    val x = DenseMatrix.tabulate[Double](2 * n, 10) { (r, _) =>
      if (r < n) rng.nextGaussian() else rng.nextGaussian() + 2.0
    }
    val y = DenseMatrix.tabulate[Double](2 * n, 1)((r, _) => if (r < n) 1.0 else 0.0)
    val gspec = NetSpec.input(10).dense(12, "tanh").dense(7, "tanh")
      .dense(1, "sigmoid").loss("mse")
    val net = new Network(gspec)
    val w = net.initWeights(1L)
    val before = net.loss(x, y, w)
    val opt = Optimizer.build("adam", 0.01)
    LocalTrainer.trainLoop(net, x, y,
      LocalTrainer.Config(iters = 50, miniBatchSize = 64), () => w, g => opt.step(w, g))
    val after = net.loss(x, y, w)
    assert(after < before * 0.5, s"loss $before → $after")
    // classification accuracy style assert, like the reference's
    // calculate_errors (tests/dl_runner.py:75-88)
    val p = net.forward(x, w)
    val errors = (0 until 2 * n).count(r => (if (p(r, 0) > 0.5) 1.0 else 0.0) != y(r, 0))
    assert(errors < n / 2, s"$errors errors")
  }
}
