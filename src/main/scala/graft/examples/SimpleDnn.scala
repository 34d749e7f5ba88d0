package graft.examples

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.SparkAsyncDL
import graft.nn.{NetSpec, OptimizerConfigs}

/** Runnable end-to-end example — the graft counterpart of the
  * reference's `examples/simple_dnn.py:27-73`: CSV read →
  * VectorAssembler + OneHotEncoder feature pipeline → asynchronous
  * hogwild training (`SparkAsyncDL`) inside a `Pipeline` → save →
  * load → predict → `MulticlassClassificationEvaluator`.
  *
  * The reference trains on `mnist_train.csv` (label first, then the
  * feature columns). This container ships parquet test tables instead
  * of MNIST, so the example first materializes an equivalent
  * label-first CSV from the `lineitem` table — a 3-class quantity-band
  * task the net can actually learn — then ingests it through the same
  * `spark.read.csv` path a user would point at their own file.
  *
  * Run:
  * {{{
  *   sbt "runMain graft.examples.SimpleDnn [sfDir] [workDir]"
  * }}}
  * Defaults: sfDir=/root/testdata/sf0.001, workDir=java.io.tmpdir.
  */
object SimpleDnn {

  /** Write a label-first CSV (the mnist_train.csv shape) derived from
    * lineitem: label = quantity band {0,1,2}, features = quantity,
    * extendedprice, discount, tax. Returns the CSV directory. */
  def materializeCsv(spark: SparkSession, sfDir: String, workDir: String): String = {
    val csvDir = s"$workDir/simple_dnn_train_csv"
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        when(col("l_quantity") <= 16, 0)
          .when(col("l_quantity") <= 33, 1).otherwise(2).as("label"),
        col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .write.mode("overwrite").option("header", "false").csv(csvDir)
    csvDir
  }

  /** The full example as a function returning (accuracy, predictions)
    * so the smoke spec can assert on it; `main` prints the readout. */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      port: Int = 5401): (Double, DataFrame) = {
    val csvDir = materializeCsv(spark, sfDir, workDir)

    // Read the CSV dataset — _c0 is the label, _c1.._c4 the features
    // (examples/simple_dnn.py:31 reads mnist_train.csv the same way)
    val df = spark.read.option("inferSchema", "true").csv(csvDir)
      .orderBy(rand(7))

    // 3-class net: 4 inputs → tanh hidden → softmax over the classes,
    // trained with softmax cross-entropy (the reference's
    // tf.losses.softmax_cross_entropy)
    val net = NetSpec.input(4).dense(16, "tanh").dense(3, "softmax")
      .loss("softmax_xent")

    // Adam options via the config builder (graph_utils.build_adam_config)
    val adamConfig = OptimizerConfigs.adam(beta1 = 0.9, beta2 = 0.999)

    // Feature pipeline: assemble the numeric columns, standardize
    // (extendedprice is O(10^4) — unscaled it saturates the tanh layer
    // instantly; MNIST's 0-255 pixels let the reference skip this),
    // one-hot the label
    val vectorAssembler = new VectorAssembler()
      .setInputCols(Array("_c1", "_c2", "_c3", "_c4")).setOutputCol("features_raw")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val encoder = new OneHotEncoder()
      .setInputCol("_c0").setOutputCol("labels").setDropLast(false)

    // Demonstration of options. Not all are required.
    val sparkModel = new SparkAsyncDL()
      .setInputCol("features")
      .setNetSpec(net)
      .setTfOptimizer("adam")
      .setTfLearningRate(0.01)
      .setMiniBatchSize(300)
      .setMiniStochasticIters(1)
      .setShufflePerIter(true)
      .setIters(30)
      .setPredictionCol("predicted")
      .setLabelCol("labels")
      .setPartitions(4)
      .setVerbose(0)
      .setOptimizerOptions(adamConfig)
      .setPort(port)

    // Create and save the Pipeline — SparkAsyncDLModel is natively
    // DefaultParamsWritable, so no wrapper is needed where the
    // reference required PysparkPipelineWrapper.unwrap
    val pipelineDir = s"$workDir/simple_dnn_pipeline"
    val fitted = new Pipeline()
      .setStages(Array(vectorAssembler, scaler, encoder, sparkModel)).fit(df)
    fitted.write.overwrite().save(pipelineDir)

    // Example of loading the pipeline back
    val loaded = PipelineModel.load(pipelineDir)

    // Run predictions: the softmax head yields a probability vector;
    // argmax it to the predicted class for the evaluator
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
