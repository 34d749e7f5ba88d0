package graft.nn

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ConvSpec extends AnyFunSuite {

  /** Central finite-difference check (same harness as NetworkSpec). */
  private def gradCheck(spec: NetSpec, nRows: Int, tol: Double): Unit = {
    val rng = new Random(17)
    val net = new Network(spec)
    val ts = net.initWeights(23L)
    val x = DenseMatrix.fill[Double](nRows, spec.inputDim)(rng.nextGaussian())
    val y =
      if (spec.loss == "softmax_xent") {
        val m = DenseMatrix.zeros[Double](nRows, spec.outputDim)
        (0 until nRows).foreach(r => m(r, rng.nextInt(spec.outputDim)) = 1.0)
        m
      } else DenseMatrix.fill[Double](nRows, spec.outputDim)(rng.nextGaussian())
    val (_, grads) = net.forwardBackward(x, y, ts)
    val h = 1e-6
    var maxRel = 0.0
    for (t <- ts.indices; r <- 0 until ts(t).rows; c <- 0 until ts(t).cols) {
      val orig = ts(t)(r, c)
      ts(t)(r, c) = orig + h
      val lp = net.loss(x, y, ts)
      ts(t)(r, c) = orig - h
      val lm = net.loss(x, y, ts)
      ts(t)(r, c) = orig
      val numeric = (lp - lm) / (2 * h)
      val analytic = grads(t)(r, c)
      val rel = math.abs(numeric - analytic) /
        math.max(1e-8, math.abs(numeric) + math.abs(analytic))
      if (rel > maxRel) maxRel = rel
    }
    assert(maxRel < tol, s"max relative gradient error $maxRel")
  }

  test("gradient check: conv2d + dense (tanh, mse)") {
    // 5x5x1 image → conv 3x3x2 → 3x3x2=18 → dense 4 → 2
    gradCheck(NetSpec.image(5, 5).conv2d(2, 3, activation = "tanh")
      .dense(4, "tanh").dense(2, "linear").loss("mse"), nRows = 3, tol = 1e-5)
  }

  test("gradient check: conv2d stride 2 + softmax_xent") {
    gradCheck(NetSpec.image(6, 6).conv2d(3, 2, stride = 2, activation = "relu")
      .dense(3, "softmax").loss("softmax_xent"), nRows = 4, tol = 1e-4)
  }

  test("gradient check: conv → maxpool → dense chain") {
    // 6x6x1 → conv 3x3 (4x4x2) → pool 2 (2x2x2=8) → dense 2
    gradCheck(NetSpec.image(6, 6).conv2d(2, 3, activation = "tanh").maxpool(2)
      .dense(2, "linear").loss("mse"), nRows = 3, tol = 1e-5)
  }

  test("gradient check: multi-channel conv (c=2)") {
    gradCheck(NetSpec.image(4, 4, 2).conv2d(3, 2, activation = "tanh")
      .dense(2, "linear").loss("mse"), nRows = 3, tol = 1e-5)
  }

  test("maxpool forward picks window maxima (hand example)") {
    val spec = NetSpec.image(2, 2).maxpool(2).dense(1, "linear").loss("mse")
    val net = new Network(spec)
    val ts = net.initWeights(1L)
    // identity-ish check by setting the dense weight to 1
    ts(2)(0, 0) = 1.0; ts(3)(0, 0) = 0.0
    val x = DenseMatrix((0.1, 0.9, -0.5, 0.3)) // 2x2 image row-major
    assert(net.forward(x, ts)(0, 0) == 0.9)
  }

  test("conv spec JSON round-trip preserves all geometry") {
    val spec = NetSpec.image(28, 28).conv2d(8, 3).maxpool(2)
      .conv2d(16, 3, stride = 1, activation = "tanh")
      .dense(10, "softmax").loss("softmax_xent")
    val back = NetSpec.fromJson(spec.toJson)
    assert(back == spec)
  }

  test("conv net trains: vertical vs horizontal edge classification") {
    // 6x6 images: class 0 = vertical stripe, class 1 = horizontal stripe
    val rng = new Random(5)
    val n = 60
    val x = DenseMatrix.zeros[Double](n, 36)
    val y = DenseMatrix.zeros[Double](n, 1)
    (0 until n).foreach { i =>
      val horizontal = i % 2 == 1
      val pos = 1 + rng.nextInt(4)
      (0 until 6).foreach { j =>
        val idx = if (horizontal) pos * 6 + j else j * 6 + pos
        x(i, idx) = 1.0
      }
      (0 until 36).foreach(k => x(i, k) += rng.nextGaussian() * 0.05)
      y(i, 0) = if (horizontal) 1.0 else 0.0
    }
    val spec = NetSpec.image(6, 6).conv2d(4, 3, activation = "tanh").maxpool(2)
      .dense(1, "sigmoid").loss("mse")
    val w = LocalTrainer.fit(spec, x, y, Optimizer.build("adam", 0.02),
      LocalTrainer.Config(iters = 150, seed = 3L))
    val p = new Network(spec).forward(x, w)
    val errs = (0 until n).count(i => (if (p(i, 0) > 0.5) 1.0 else 0.0) != y(i, 0))
    assert(errs <= n / 10, s"$errs/$n errors")
  }

  test("distributed hogwild training works with a conv net") {
    val spark = graft.SparkFixture.spark
    val rng = new Random(9)
    val data = (0 until 40).map { i =>
      val horizontal = i % 2 == 1
      val img = new Array[Double](36)
      val pos = 1 + rng.nextInt(4)
      (0 until 6).foreach { j =>
        img(if (horizontal) pos * 6 + j else j * 6 + pos) = 1.0
      }
      (img, Array(if (horizontal) 1.0 else 0.0))
    }
    val spec = NetSpec.image(6, 6).conv2d(2, 3, activation = "tanh").maxpool(2)
      .dense(1, "sigmoid").loss("mse")
    val w = graft.train.HogwildTrainer.fit(
      spark.sparkContext.parallelize(data, 2), spec,
      graft.train.HogwildTrainer.Config(iters = 30, learningRate = 0.05, port = 5311))
    assert(w.length == 6) // 2 tensors per layer incl. 0x0 pool placeholders
    val net = new Network(spec)
    assert(!net.predictRow(data.head._1, w)(0).isNaN)
  }
}
