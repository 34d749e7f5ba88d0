package graft.examples

import org.apache.spark.ml.feature.{Normalizer, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.SparkAsyncDL
import graft.nn.NetSpec

/** Runnable unsupervised example — the graft counterpart of the
  * reference's `examples/autoencoder_example.py`: CSV read →
  * VectorAssembler → Normalizer → label-less `SparkAsyncDL` (an
  * autoencoder reconstructing its own input, the reference's
  * `tfLabel=None` switch) → transform → inspect one encoding.
  *
  * The reference's encoder head is its bottleneck layer
  * (`tfOutput='out/Sigmoid:0'`); graft's NetSpec predicts through the
  * full net, so this example trains the 4 → 8 → 2 → 8 → 4 hourglass
  * and reads the reconstruction. The 2-wide bottleneck forces the same
  * compression; reconstruction error is the quality readout.
  *
  * Run:
  * {{{
  *   sbt "runMain graft.examples.Autoencoder [sfDir] [workDir]"
  * }}}
  */
object Autoencoder {

  /** Returns (mean reconstruction MSE, transformed frame) so the smoke
    * spec can assert on it. */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      port: Int = 5402): (Double, DataFrame) = {
    val csvDir = SimpleDnn.materializeCsv(spark, sfDir, workDir)
    val df = spark.read.option("inferSchema", "true").csv(csvDir)
      .orderBy(rand(7))

    // assemble then L1-normalize, like autoencoder_example.py:28-29
    val va = new VectorAssembler()
      .setInputCols(Array("_c1", "_c2", "_c3", "_c4")).setOutputCol("feats")
      .transform(df).select("feats")
    val na = new Normalizer().setInputCol("feats").setOutputCol("features")
      .setP(1.0).transform(va).select("features")

    val net = NetSpec.input(4).dense(8, "tanh").dense(2, "tanh")
      .dense(8, "tanh").dense(4, "linear").loss("mse")

    // no labelCol / tfLabel → unsupervised: the trainer feeds y = x
    val model = new SparkAsyncDL()
      .setInputCol("features")
      .setNetSpec(net)
      .setTfOptimizer("adam")
      .setTfLearningRate(0.01)
      .setIters(10)
      .setPredictionCol("predicted")
      .setPartitions(4)
      .setMiniBatchSize(256)
      .setVerbose(0)
      .setPort(port)
      .fit(na)

    val out = model.transform(na)
    // mean per-row reconstruction MSE between features and predicted
    val withErr = out
      .withColumn("x", org.apache.spark.ml.functions.vector_to_array(col("features")))
      .withColumn("xhat", org.apache.spark.ml.functions.vector_to_array(col("predicted")))
      .withColumn("mse", aggregate(
        zip_with(col("x"), col("xhat"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v) / size(col("x")))
    val meanMse = withErr.agg(avg(col("mse"))).head().getDouble(0)
    (meanMse, out)
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
      val (meanMse, out) = run(spark, sfDir, workDir)
      println(out.select("predicted").head().get(0))
      println(f"Mean reconstruction MSE = $meanMse%g")
    } finally spark.stop()
  }
}
