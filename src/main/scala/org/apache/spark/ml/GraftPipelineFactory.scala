package org.apache.spark.ml

/** `PipelineModel`'s constructor is `private[ml]`; this factory lives in
  * that package solely so graft's ModelLoader can append a loaded model to
  * an existing fitted pipeline (parity with the reference's
  * `attach_tensorflow_model_to_pipeline`,
  * lifeomic/sparkflow `tensorflow_model_loader.py:35-45`). */
object GraftPipelineFactory {
  def create(uid: String, stages: Array[Transformer]): PipelineModel =
    new PipelineModel(uid, stages)
}
