package graft.examples

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.SparkAsyncDL
import graft.nn.NetSpec

/** Runnable convolutional example — the graft counterpart of the
  * reference's `examples/cnn_example.py:10-56`: a label-first pixel CSV
  * → VectorAssembler over the pixel columns + OneHotEncoder over the
  * label → a conv/pool/conv/pool/dense softmax net trained with
  * `SparkAsyncDL` inside a `Pipeline` → save → load → evaluate.
  *
  * The reference trains 28×28 MNIST (`conv(32,5)+pool2 →
  * conv(64,3)+pool2 → flatten → dense(10)`, softmax cross-entropy,
  * Adam). This container has no MNIST, so the example first
  * materializes an equivalent label-first CSV from the `embeddings`
  * table — its 64-float vectors are 8×8 single-channel images with a
  * 10-class label, the same task shape at 1/12 the resolution — then
  * ingests it through the same `spark.read.csv` path a user would
  * point at their own pixel dump. The net keeps the reference's
  * two conv+pool stages, scaled to the 8×8 canvas.
  *
  * Run:
  * {{{
  *   sbt "runMain graft.examples.Cnn [sfDir] [workDir]"
  * }}}
  * Defaults: sfDir=/root/testdata/sf0.001, workDir=java.io.tmpdir.
  */
object Cnn {

  /** Write a label-first CSV (the mnist_train.csv shape: _c0 = class,
    * _c1.._c64 = pixels) from the embeddings table. Returns the CSV
    * directory. */
  def materializeCsv(spark: SparkSession, sfDir: String, workDir: String): String = {
    val csvDir = s"$workDir/cnn_train_csv"
    val pixelCols = (0 until 64).map(i => col("embedding").getItem(i).as(s"p$i"))
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("label") +: pixelCols: _*)
      .write.mode("overwrite").option("header", "false").csv(csvDir)
    csvDir
  }

  /** The full example as a function returning (accuracy, predictions)
    * so the smoke spec can assert on it; `main` prints the readout. */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      port: Int = 5403): (Double, DataFrame) = {
    val csvDir = materializeCsv(spark, sfDir, workDir)

    // cnn_example.py:32 reads the pixel CSV the same way; _c0 is the
    // label, _c1.._c64 the 8×8 image row-major
    val df = spark.read.option("inferSchema", "true").csv(csvDir)
      .orderBy(rand(7))

    // Two conv+pool stages, then the softmax head — the reference's
    // cnn_model() (cnn_example.py:13-18) scaled from 28×28 to 8×8:
    // 8×8×1 → conv(8 filters, 3×3) → 6×6×8 → maxpool(2) → 3×3×8
    //       → conv(16 filters, 2×2) → 2×2×16 → maxpool(2) → 1×1×16
    //       → dense(10, softmax), softmax cross-entropy loss
    val net = NetSpec.image(8, 8)
      .conv2d(8, 3).maxpool(2)
      .conv2d(16, 2).maxpool(2)
      .dense(10, "softmax")
      .loss("softmax_xent")

    // Feature pipeline: assemble the pixel columns, one-hot the label —
    // the embeddings are already zero-centered in [-0.5, 0.5], so no
    // scaler is needed (MNIST's 0-255 pixels would want one)
    val vectorAssembler = new VectorAssembler()
      .setInputCols((1 to 64).map(i => s"_c$i").toArray)
      .setOutputCol("features")
    val encoder = new OneHotEncoder()
      .setInputCol("_c0").setOutputCol("labels").setDropLast(false)

    // Demonstration of options, mirroring cnn_example.py:36-50
    val sparkModel = new SparkAsyncDL()
      .setInputCol("features")
      .setNetSpec(net)
      .setTfOptimizer("adam")
      .setTfLearningRate(0.005)
      .setMiniBatchSize(100)
      .setMiniStochasticIters(-1)
      .setShufflePerIter(true)
      .setIters(150)
      .setPartitions(4)
      .setPredictionCol("predicted")
      .setLabelCol("labels")
      .setVerbose(0)
      .setPort(port)

    // Fit and save the whole Pipeline (cnn_example.py:55-56 p.save("cnn"))
    val pipelineDir = s"$workDir/cnn_pipeline"
    val fitted = new Pipeline()
      .setStages(Array(vectorAssembler, encoder, sparkModel)).fit(df)
    fitted.write.overwrite().save(pipelineDir)
    val loaded = PipelineModel.load(pipelineDir)

    // Argmax the softmax head to the predicted class for the evaluator
    val predictions = loaded.transform(df)
      .withColumn("p", vector_to_array(col("predicted")))
      .withColumn("predicted_class",
        array_position(col("p"), array_max(col("p"))).cast("double") - 1)

    val evaluator = new MulticlassClassificationEvaluator()
      .setLabelCol("_c0").setPredictionCol("predicted_class")
      .setMetricName("accuracy")
    (evaluator.evaluate(predictions), predictions)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir = args.lift(1).getOrElse(
      System.getProperty("java.io.tmpdir") + "/graft_examples")
    val spark = SparkSession.builder()
      .appName("examples").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (accuracy, _) = run(spark, sfDir, workDir)
      println(f"Test Error = ${1.0 - accuracy}%g")
    } finally spark.stop()
  }
}
