package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.linalg.{Vector, Vectors, SQLDataTypes}
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.{HasInputCol, HasLabelCol, HasPredictionCol}
import org.apache.spark.ml.util._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.nn.{NetSpec, Network, Tensors}
import graft.train.HogwildTrainer

/** Shared params — the 21 parameters of the reference's `SparkAsyncDL`
  * (lifeomic/sparkflow `tensorflow_async.py:104-121`), same names and
  * defaults (`:176-182`). `tensorflowGraph` carries a [[graft.nn.NetSpec]]
  * JSON instead of a TF MetaGraphDef; `tfInput`/`tfLabel`/`tfOutput`/
  * `tfDropout` are tensor-name params kept for drop-in API parity (our
  * declarative spec doesn't need them to locate tensors; `tfLabel` unset
  * still switches autoencoder mode, see fit()).
  */
private[ml] trait AsyncDLParams extends Params
    with HasInputCol with HasLabelCol with HasPredictionCol {
  final val tensorflowGraph = new Param[String](this, "tensorflowGraph", "NetSpec topology JSON")
  final val tfInput = new Param[String](this, "tfInput", "input tensor name (API parity)")
  final val tfLabel = new Param[String](this, "tfLabel", "label tensor name; unset = unsupervised")
  final val tfOutput = new Param[String](this, "tfOutput", "output tensor name (API parity)")
  final val tfOptimizer = new Param[String](this, "tfOptimizer", "optimizer name")
  final val tfLearningRate = new DoubleParam(this, "tfLearningRate", "learning rate")
  final val iters = new IntParam(this, "iters", "training iterations per partition")
  final val partitions = new IntParam(this, "partitions", "max training partitions (coalesce guard)")
  final val miniBatchSize = new IntParam(this, "miniBatchSize", "sequential mini-batch size; <=0 full batch")
  final val miniStochasticIters = new IntParam(this, "miniStochasticIters", "random mini-batches per iter; <=0 off")
  final val acquireLock = new BooleanParam(this, "acquireLock", "RW-lock the server (vs hogwild)")
  final val shufflePerIter = new BooleanParam(this, "shufflePerIter", "shuffle partition data each iter")
  final val tfDropout = new Param[String](this, "tfDropout", "dropout placeholder name (API parity)")
  final val toKeepDropout = new BooleanParam(this, "toKeepDropout", "dropout value is keep-probability")
  final val verbose = new IntParam(this, "verbose", "log training loss")
  final val partitionShuffles = new IntParam(this, "partitionShuffles", "full-shuffle training rounds")
  final val optimizerOptions = new Param[String](this, "optimizerOptions", "optimizer options JSON")
  final val port = new IntParam(this, "port", "parameter-server port")
  /** Extension beyond the reference's 21 params: >0 sends only the k
    * largest-magnitude gradient entries per push with error-feedback
    * residuals (graft.nn.GradientCompression); 0 = dense parity. */
  final val gradientTopK = new IntParam(this, "gradientTopK",
    "top-k sparse gradient pushes; 0 = dense")
  /** Extension beyond the reference: parameter-server shard count.
    * 0 = auto — shard once the model outgrows
    * [[SparkAsyncDL.AutoShardElems]] elements (one shard per threshold's
    * worth of weights, capped at [[SparkAsyncDL.AutoShardMax]] and the
    * tensor count); 1 = always the single driver-hosted server; N ≥ 2 =
    * exactly N shards. The single server serializes whole models
    * through one endpoint per pull/push — the measured ceiling once
    * workers × model size grows (PsShardingThroughputSpec); sharding
    * splits every transfer into concurrent per-slice exchanges. */
  final val psShards = new IntParam(this, "psShards",
    "parameter-server shards; 0 = auto by model size")

  setDefault(tfOptimizer -> "adam", tfLearningRate -> 0.01, iters -> 1000,
    predictionCol -> "predicted", partitions -> 5, miniBatchSize -> 128,
    miniStochasticIters -> -1, acquireLock -> false, shufflePerIter -> true,
    toKeepDropout -> false, verbose -> 0, partitionShuffles -> 1, port -> 5000,
    optimizerOptions -> "{}", gradientTopK -> 0, psShards -> 0)

  private[ml] def parsedOptions: Map[String, Double] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parseOpt($(optimizerOptions)).collect { case JObject(fields) =>
      fields.collect {
        case (k, JDouble(v))  => k -> v
        case (k, JInt(v))     => k -> v.toDouble
        case (k, JBool(v))    => k -> (if (v) 1.0 else 0.0)
        case (k, JDecimal(v)) => k -> v.toDouble
      }.toMap
    }.getOrElse(Map.empty)
  }

  /** Row value → dense feature array. Accepts ml Vectors (dense AND sparse,
    * `tests/dl_runner.py:164-185`) plus Seq[Float/Double] so array<float>
    * embedding columns train without a VectorAssembler hop. */
  private[ml] def toFeatureArray(v: Any): Array[Double] = v match {
    case vec: Vector => vec.toArray
    // collection.Seq, not the immutable default alias: Spark row values
    // arrive as mutable.ArraySeq
    case s: scala.collection.Seq[_] =>
      s.map(x => x.asInstanceOf[Number].doubleValue()).toArray
    case a: Array[_] => a.map(x => x.asInstanceOf[Number].doubleValue())
    case other       => throw new IllegalArgumentException(
      s"unsupported feature type ${if (other == null) "null" else other.getClass.getName}")
  }

  /** Label → vector; scalars wrap to [y] (`ml_util.py:90-95`). */
  private[ml] def toLabelArray(v: Any): Array[Double] = v match {
    case vec: Vector => vec.toArray
    case s: scala.collection.Seq[_] =>
      s.map(x => x.asInstanceOf[Number].doubleValue()).toArray
    case n: Number   => Array(n.doubleValue())
    case other       => throw new IllegalArgumentException(
      s"unsupported label type ${if (other == null) "null" else other.getClass.getName}")
  }
}

/** Asynchronous distributed deep-learning Estimator — drop-in parity with
  * the reference's `SparkAsyncDL` (`tensorflow_async.py:102-321`), backed
  * by the graft dense-net engine + driver-hosted parameter server instead
  * of TensorFlow + Flask. */
class SparkAsyncDL(override val uid: String) extends Estimator[SparkAsyncDLModel]
    with AsyncDLParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("sparkAsyncDL"))

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setTensorflowGraph(v: String): this.type = set(tensorflowGraph, v)
  def setNetSpec(spec: NetSpec): this.type = set(tensorflowGraph, spec.toJson)
  def setTfInput(v: String): this.type = set(tfInput, v)
  def setTfLabel(v: String): this.type = set(tfLabel, v)
  def setTfOutput(v: String): this.type = set(tfOutput, v)
  def setTfOptimizer(v: String): this.type = set(tfOptimizer, v)
  def setTfLearningRate(v: Double): this.type = set(tfLearningRate, v)
  def setIters(v: Int): this.type = set(iters, v)
  def setPartitions(v: Int): this.type = set(partitions, v)
  def setMiniBatchSize(v: Int): this.type = set(miniBatchSize, v)
  def setMiniStochasticIters(v: Int): this.type = set(miniStochasticIters, v)
  def setAcquireLock(v: Boolean): this.type = set(acquireLock, v)
  def setShufflePerIter(v: Boolean): this.type = set(shufflePerIter, v)
  def setTfDropout(v: String): this.type = set(tfDropout, v)
  def setToKeepDropout(v: Boolean): this.type = set(toKeepDropout, v)
  def setVerbose(v: Int): this.type = set(verbose, v)
  def setPartitionShuffles(v: Int): this.type = set(partitionShuffles, v)
  def setGradientTopK(v: Int): this.type = set(gradientTopK, v)
  def setOptimizerOptions(v: String): this.type = set(optimizerOptions, v)
  def setPort(v: Int): this.type = set(port, v)
  def setPsShards(v: Int): this.type = set(psShards, v)

  override def fit(dataset: Dataset[_]): SparkAsyncDLModel = {
    transformSchema(dataset.schema, logging = true)
    val spec = NetSpec.fromJson($(tensorflowGraph))
    val inCol = $(inputCol)
    // unsupervised (autoencoder) mode = tfLabel unset and no explicit
    // labelCol, mirroring the reference's `tfLabel=None` switch
    // (`tests/dl_runner.py:274-292`)
    val supervised = (isSet(tfLabel) && $(tfLabel).nonEmpty) || isSet(labelCol)
    val lblCol = if (supervised) $(labelCol) else null
    val fArr = toFeatureArray _
    val lArr = toLabelArray _

    // project → (features, label) tuples, like handle_data
    // (`tensorflow_async.py:45-48,290`); unsupervised (autoencoder) mode
    // reconstructs the input: y = x.
    val base =
      if (supervised) dataset.select(col(inCol), col(lblCol)).rdd.map { r =>
        (fArr(r.get(0)), lArr(r.get(1)))
      }
      else dataset.select(col(inCol)).rdd.map { r =>
        val f = fArr(r.get(0)); (f, f)
      }
    // coalesce only when it reduces partition count (`tensorflow_async.py:290-291`)
    val rdd =
      if (base.getNumPartitions > $(partitions)) base.coalesce($(partitions)) else base

    val cfg = HogwildTrainer.Config(
      optimizerName = $(tfOptimizer),
      learningRate = $(tfLearningRate),
      optimizerOptions = parsedOptions,
      iters = $(iters),
      miniBatchSize = $(miniBatchSize),
      miniStochasticIters = $(miniStochasticIters),
      acquireLock = $(acquireLock),
      shufflePerIter = $(shufflePerIter),
      partitionShuffles = $(partitionShuffles),
      verbose = $(verbose),
      port = $(port),
      gradientTopK = $(gradientTopK))
    val shards = SparkAsyncDL.resolveShards($(psShards), spec)
    val weights =
      if (shards > 1) HogwildTrainer.fitSharded(rdd, spec, cfg, shards)
      else HogwildTrainer.fit(rdd, spec, cfg)

    val model = new SparkAsyncDLModel(uid + "_model")
      .setModelJson($(tensorflowGraph))
      .setModelWeights(Tensors.toJson(weights))
      .setInputCol(inCol)
      .setPredictionCol($(predictionCol))
    copyValues(model).setParent(this)
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)), s"missing input column ${$(inputCol)}")
    val outDim = NetSpec.fromJson($(tensorflowGraph)).outputDim
    val outType = if (outDim == 1) DoubleType else SQLDataTypes.VectorType
    StructType(schema.fields :+ StructField($(predictionCol), outType, nullable = false))
  }

  override def copy(extra: ParamMap): SparkAsyncDL = defaultCopy(extra)
}

object SparkAsyncDL extends DefaultParamsReadable[SparkAsyncDL] {
  /** Auto-sharding threshold: one parameter-server shard per this many
    * weight elements. 2^17 doubles = 1 MiB of model per shard — below
    * it a single server's serialization keeps up with 16 concurrent
    * workers and the extra endpoints are pure overhead; above it the
    * per-pull serialization dominates and sharding's concurrent
    * per-slice transfers win (measured in PsShardingThroughputSpec). */
  private[graft] val AutoShardElems: Long = 1L << 17
  /** Auto-sharding cap: matches the in-process endpoint count past
    * which added shards stop helping on one host. */
  private[graft] val AutoShardMax: Int = 8

  /** psShards resolution: explicit N wins; 0 = one shard per
    * [[AutoShardElems]] of model, capped by [[AutoShardMax]] and the
    * tensor count (tensors are the atomic sharding unit). */
  private[graft] def resolveShards(requested: Int, spec: NetSpec): Int = {
    val shapes = new graft.nn.Network(spec).initWeights(spec.seed)
    val tensors = shapes.length
    if (requested >= 1) math.min(requested, tensors)
    else {
      val elems = shapes.map(t => t.rows.toLong * t.cols).sum
      val auto = math.min(AutoShardMax.toLong, elems / AutoShardElems + 1).toInt
      math.min(auto, tensors)
    }
  }
}

/** Fitted model — parity with `SparkAsyncDLModel` (`tensorflow_async.py:
  * 51-99`). transform() is an appended projection (`withColumn` + UDF over
  * broadcast weights) so Catalyst keeps pruning/pushdown working around it
  * — the reference instead rebuilt every row via `mapPartitions(...).toDF()`
  * re-inferring the schema (a bug class we drop, SURVEY.md §1). Weights
  * deserialize ONCE on the driver and ship via broadcast, not once per
  * partition per query (`ml_util.py:57-58` cost eliminated). */
class SparkAsyncDLModel(override val uid: String) extends Model[SparkAsyncDLModel]
    with AsyncDLParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("sparkAsyncDLModel"))

  final val modelJson = new Param[String](this, "modelJson", "NetSpec topology JSON")
  final val modelWeights = new Param[String](this, "modelWeights", "trained weights JSON")

  def setModelJson(v: String): this.type = set(modelJson, v)
  def setModelWeights(v: String): this.type = set(modelWeights, v)
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  def spec: NetSpec = NetSpec.fromJson($(modelJson))
  def weights: Tensors.Tensors = Tensors.fromJson($(modelWeights))

  /** One broadcast per (context, weights) — repeated transform() calls on
    * a long-lived model must not accumulate broadcast blocks on the
    * executors. Keyed by identity: the weights Param value is the same
    * String instance until someone sets a new one. */
  @transient private var cachedBc
      : (org.apache.spark.SparkContext, String, org.apache.spark.broadcast.Broadcast[Tensors.Tensors]) = _
  private def weightsBroadcast(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.broadcast.Broadcast[Tensors.Tensors] = synchronized {
    val sc = spark.sparkContext
    val wj = $(modelWeights)
    if (cachedBc == null || (cachedBc._1 ne sc) || (cachedBc._2 ne wj))
      cachedBc = (sc, wj, sc.broadcast(weights))
    cachedBc._3
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema, logging = true)
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val spark = dataset.sparkSession
    val net = new Network(spec) // built once on the driver, serializes with the closure
    val bcWeights = weightsBroadcast(spark)
    val scalar = spec.outputDim == 1 // scalar-vs-vector output rule (`ml_util.py:76-81`)
    val inType = dataset.schema($(inputCol)).dataType
    // typed UDFs per input column type: ml Vector (dense/sparse) or raw arrays
    val predictCol = inType match {
      case dt if dt == SQLDataTypes.VectorType =>
        if (scalar) udf((v: Vector) => net.predictRow(v.toArray, bcWeights.value)(0))
          .apply(col($(inputCol)))
        else udf((v: Vector) => Vectors.dense(net.predictRow(v.toArray, bcWeights.value)))
          .apply(col($(inputCol)))
      case ArrayType(FloatType, _) =>
        if (scalar) udf((s: Seq[Float]) =>
            net.predictRow(s.map(_.toDouble).toArray, bcWeights.value)(0))
          .apply(col($(inputCol)))
        else udf((s: Seq[Float]) =>
            Vectors.dense(net.predictRow(s.map(_.toDouble).toArray, bcWeights.value)))
          .apply(col($(inputCol)))
      case _ => // array<double> and friends
        if (scalar) udf((s: Seq[Double]) => net.predictRow(s.toArray, bcWeights.value)(0))
          .apply(col($(inputCol)))
        else udf((s: Seq[Double]) => Vectors.dense(net.predictRow(s.toArray, bcWeights.value)))
          .apply(col($(inputCol)))
    }
    dataset.withColumn($(predictionCol), predictCol)
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)), s"missing input column ${$(inputCol)}")
    val outType = if (spec.outputDim == 1) DoubleType else SQLDataTypes.VectorType
    StructType(schema.fields :+ StructField($(predictionCol), outType, nullable = false))
  }

  override def copy(extra: ParamMap): SparkAsyncDLModel =
    defaultCopy[SparkAsyncDLModel](extra).setParent(parent)
}

object SparkAsyncDLModel extends DefaultParamsReadable[SparkAsyncDLModel]
