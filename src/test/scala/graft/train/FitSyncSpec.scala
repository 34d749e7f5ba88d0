package graft.train

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.nn.{NetSpec, Network}

class FitSyncSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val xorSpec = NetSpec.input(2).dense(12, "tanh").dense(7, "tanh")
    .dense(1, "sigmoid").loss("mse")

  test("fitSync converges on XOR deterministically") {
    val data = Seq(
      (Array(0.0, 0.0), Array(0.0)), (Array(0.0, 1.0), Array(1.0)),
      (Array(1.0, 0.0), Array(1.0)), (Array(1.0, 1.0), Array(0.0)))
    def run() = HogwildTrainer.fitSync(
      spark.sparkContext.parallelize(data, 2), xorSpec,
      HogwildTrainer.Config(optimizerName = "adam", learningRate = 0.1, iters = 200))
    val w1 = run()
    val w2 = run()
    // deterministic: identical weights across runs
    w1.zip(w2).foreach { case (a, b) => assert(a == b) }
    val net = new Network(xorSpec)
    val errs = data.count { case (f, l) =>
      (if (net.predictRow(f, w1)(0) > 0.5) 1.0 else 0.0) != l(0)
    }
    assert(errs == 0, s"$errs XOR errors")
  }

  test("fitSync on an empty RDD returns initial weights instead of throwing") {
    val empty = spark.sparkContext
      .parallelize(Seq.empty[(Array[Double], Array[Double])], 2)
    val w = HogwildTrainer.fitSync(empty, xorSpec, HogwildTrainer.Config(iters = 3))
    assert(w.length == 6)
  }

  test("mismatched label width fails with a clear message, not zero-padding") {
    val spec = NetSpec.input(2).dense(4, "tanh").dense(3, "softmax").loss("softmax_xent")
    val bad = Seq((Array(0.0, 1.0), Array(1.0))) // scalar label, 3-wide output
    val e = intercept[org.apache.spark.SparkException] {
      HogwildTrainer.fitSync(spark.sparkContext.parallelize(bad, 1), spec,
        HogwildTrainer.Config(iters = 1))
    }
    assert(e.getMessage.contains("label dim") || e.getCause.getMessage.contains("label dim"))
  }

  test("loss/activation mispairing rejected at spec construction") {
    intercept[IllegalArgumentException](
      NetSpec.input(4).dense(3, "linear").loss("softmax_xent"))
    intercept[IllegalArgumentException](
      NetSpec.input(4).dense(3, "softmax").loss("mse"))
    intercept[IllegalArgumentException](
      NetSpec.input(4).dense(3, "softmax").dense(2, "linear").loss("mse"))
  }
}
