package graft.ml

import java.nio.file.{Files, Paths}
import org.apache.spark.ml.{PipelineModel, Transformer}
import org.apache.spark.ml.util.Identifiable
import graft.nn.NetSpec

/** Checkpoint → transformer loaders, parity with
  * lifeomic/sparkflow `tensorflow_model_loader.py:8-45` (T22/T23) — our
  * checkpoint format is a directory with `spec.json` (NetSpec) and
  * `weights.json` (nested-list tensors) instead of a TF `.meta` +
  * `latest_checkpoint` pair. */
object ModelLoader {

  /** `load_tensorflow_model` equivalent: read a spec+weights checkpoint
    * directory into a ready [[SparkAsyncDLModel]]. */
  def loadModel(
      path: String,
      inputCol: String,
      predictionCol: String = "predicted"): SparkAsyncDLModel = {
    val specJson = Files.readString(Paths.get(path, "spec.json"))
    val weightsJson = Files.readString(Paths.get(path, "weights.json"))
    NetSpec.fromJson(specJson) // validate early
    new SparkAsyncDLModel(Identifiable.randomUID("sparkAsyncDLModel"))
      .setModelJson(specJson)
      .setModelWeights(weightsJson)
      .setInputCol(inputCol)
      .setPredictionCol(predictionCol)
  }

  /** Write the checkpoint format `loadModel` reads. */
  def saveCheckpoint(model: SparkAsyncDLModel, path: String): Unit = {
    Files.createDirectories(Paths.get(path))
    Files.writeString(Paths.get(path, "spec.json"), model.getOrDefault(model.modelJson))
    Files.writeString(Paths.get(path, "weights.json"), model.getOrDefault(model.modelWeights))
  }

  /** `attach_tensorflow_model_to_pipeline` equivalent
    * (`tensorflow_model_loader.py:35-45`): append a loaded model to an
    * existing fitted pipeline as a new terminal stage. */
  def attachToPipeline(model: Transformer, pipeline: PipelineModel): PipelineModel =
    org.apache.spark.ml.GraftPipelineFactory.create(
      Identifiable.randomUID("pipeline"), Array[Transformer](pipeline, model))
}

/** API-parity shim for the reference's `PysparkPipelineWrapper.unwrap`
  * (`pipeline_util.py:48-74`). The dill-in-StopWordsRemover persistence
  * hack (T24) is obsolete on the JVM — `DefaultParamsWritable` persists
  * graft stages natively and `PipelineModel.load` restores them — so
  * unwrap is the identity, kept so reference call sites port 1:1. */
object GraftPipelineWrapper {
  def unwrap(pipeline: PipelineModel): PipelineModel = pipeline
  def unwrap[T <: Transformer](stage: T): T = stage
}
