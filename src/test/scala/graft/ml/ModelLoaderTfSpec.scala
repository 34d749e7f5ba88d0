package graft.ml

import java.nio.file.{Files, Paths}

import graft.SparkFixture
import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite

/** The TF-checkpoint migration path (the last reference-surface gap —
  * lifeomic/sparkflow `tensorflow_model_loader.py:8-32` reads a real
  * TensorFlow `.meta` + checkpoint bundle, which needs TF on the JVM to
  * ingest directly): `tools/tf_to_graft.py` converts a TF1 V2-format
  * dense-net checkpoint OFFLINE (pure-python SSTable + protobuf wire
  * reader, no tensorflow install) into the spec+weights directory
  * [[ModelLoader.loadModel]] reads. The golden fixture under
  * `src/test/resources/tf_checkpoint/` is a real V2 bundle (written by
  * `tools/make_tf_fixture.py`) whose float32 weights are exact
  * multiples of 1/64, so the converted forward pass is bit-comparable
  * against a hand computation. */
class ModelLoaderTfSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def haveTool: Boolean =
    new java.io.File("tools/tf_to_graft.py").isFile &&
      (try {
        new ProcessBuilder("python3", "-c", "import numpy").start().waitFor() == 0
      } catch { case _: Exception => false })

  private def convert(ckpt: String, extra: String*): String = {
    val out = Files.createTempDirectory("tfconv").toString
    val cmd = Seq("python3", "tools/tf_to_graft.py", ckpt, out) ++ extra
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"converter failed:\n$log")
    out
  }

  test("golden fixture converts and predicts the hand-computed forward pass") {
    assume(haveTool, "python3+numpy unavailable — converter is offline tooling")
    val out = convert("src/test/resources/tf_checkpoint")
    val spec = Files.readString(Paths.get(out, "spec.json"))
    // topology + activations recovered from the bundle shapes + the
    // .meta op walk (gradient-scope MatMul decoys must be skipped)
    assert(spec.contains(""""in": 2, "out": 3, "activation": "sigmoid""""), spec)
    assert(spec.contains(""""in": 3, "out": 1, "activation": "linear""""), spec)

    val model = ModelLoader.loadModel(out, inputCol = "features")
    import spark.implicits._
    val df = Seq(Tuple1(Vectors.dense(1.0, -1.0)), Tuple1(Vectors.dense(0.5, 2.0)))
      .toDF("features")
    val preds = model.transform(df).select("predicted").collect()
      .map(_.getDouble(0))

    // the fixture generator's weights, fanIn x fanOut (exact in float32)
    val w1 = Array(Array(0.125, -0.25, 0.375), Array(0.0625, 0.1875, -0.3125))
    val b1 = Array(0.03125, -0.09375, 0.15625)
    val w2 = Array(0.5, -0.375, 0.25)
    val b2 = -0.0625
    def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def forward(x: Array[Double]): Double = {
      val h = (0 until 3).map(j =>
        sigmoid(x(0) * w1(0)(j) + x(1) * w1(1)(j) + b1(j)))
      (0 until 3).map(j => h(j) * w2(j)).sum + b2
    }
    val expected = Seq(forward(Array(1.0, -1.0)), forward(Array(0.5, 2.0)))
    preds.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"got $got want $want")
    }
  }

  test("converted checkpoint attaches to a pipeline (T23 composition)") {
    assume(haveTool, "python3+numpy unavailable")
    val out = convert("src/test/resources/tf_checkpoint")
    val model = ModelLoader.loadModel(out, inputCol = "features")
    import spark.implicits._
    val raw = Seq(Tuple1(Vectors.dense(1.0, 0.0))).toDF("rawfeat")
    val pre = new org.apache.spark.ml.Pipeline().setStages(Array(
      new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("rawfeat")).setOutputCol("features"))).fit(raw)
    val combined = ModelLoader.attachToPipeline(model, pre)
    assert(combined.transform(raw).columns.contains("predicted"))
  }

  test("converts the reference's own TF1 checkpoint when present (interop proof)") {
    assume(haveTool, "python3+numpy unavailable")
    val refCkpt = "/root/reference/tests/test_model"
    assume(new java.io.File(refCkpt, "to_load.index").isFile,
      "reference fixture not on this machine")
    val out = convert(refCkpt)
    val spec = Files.readString(Paths.get(out, "spec.json"))
    // dl_runner's create_model shape as trained by the reference:
    // 2 -> 10 -> 10 -> 1, tanh/tanh/sigmoid, Adam slots dropped
    assert(spec.contains(""""in": 2, "out": 10, "activation": "tanh""""), spec)
    assert(spec.contains(""""in": 10, "out": 1, "activation": "sigmoid""""), spec)
    val model = ModelLoader.loadModel(out, inputCol = "features")
    import spark.implicits._
    val df = Seq(Tuple1(Vectors.dense(0.0, 1.0)), Tuple1(Vectors.dense(1.0, 1.0)))
      .toDF("features")
    val preds = model.transform(df).select("predicted").collect().map(_.getDouble(0))
    // sigmoid output head: predictions must be proper probabilities
    assert(preds.forall(p => p > 0.0 && p < 1.0), preds.toSeq.toString)
  }
}
