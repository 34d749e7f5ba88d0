package graft.nn

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum, *}
import graft.nn.Tensors.Tensors
import scala.util.Random

/** Dense feed-forward net: forward pass + backprop over Breeze matrices.
  *
  * Replaces the reference's per-partition TensorFlow session
  * (lifeomic/sparkflow `HogwildSparkModel.py:38-100` computes
  * `tf.gradients(loss, trainables)`); here the math is explicit so it runs
  * on the JVM with netlib BLAS and no native deps.
  */
final class Network(val spec: NetSpec) extends Serializable {
  private val acts: Array[Activation] = spec.layers.map(_.act).toArray
  private val lossFn: Loss = spec.lossFn
  private val nLayers = spec.layers.length

  /** Glorot-uniform init, seeded for reproducibility. */
  def initWeights(seed: Long = spec.seed): Tensors = {
    val rng = new Random(seed)
    spec.layers.flatMap { l =>
      val limit = math.sqrt(6.0 / (l.in + l.out))
      val w = DenseMatrix.fill[Double](l.in, l.out)((rng.nextDouble() * 2 - 1) * limit)
      val b = DenseMatrix.zeros[Double](1, l.out)
      Seq(w, b)
    }.toArray
  }

  /** Forward pass (inference: dropout = identity). x rows = samples. */
  def forward(x: DenseMatrix[Double], ts: Tensors): DenseMatrix[Double] = {
    var a = x
    var i = 0
    while (i < nLayers) {
      val z = a * ts(2 * i)
      z(*, ::) :+= ts(2 * i + 1).toDenseVector
      a = acts(i).f(z)
      i += 1
    }
    a
  }

  /** Forward + backward. Returns (loss, gradients) with gradients shaped
    * exactly like the weight tensors. Inverted dropout on hidden-layer
    * outputs when a layer declares a rate and an RNG is provided
    * (training); identity at inference — preserving the reference's
    * keep/drop placeholder contract (`ml_util.py:70-71`). */
  def forwardBackward(
      x: DenseMatrix[Double],
      y: DenseMatrix[Double],
      ts: Tensors,
      dropoutRng: Random = null): (Double, Tensors) = {
    // aPre(i)  = activation output of layer i before dropout
    // aPost(i) = after dropout (== aPre(i) when no dropout); input to layer i+1
    val aPre = new Array[DenseMatrix[Double]](nLayers)
    val aPost = new Array[DenseMatrix[Double]](nLayers + 1)
    val masks = new Array[DenseMatrix[Double]](nLayers)
    aPost(0) = x
    var i = 0
    while (i < nLayers) {
      val z = aPost(i) * ts(2 * i)
      z(*, ::) :+= ts(2 * i + 1).toDenseVector
      val a = acts(i).f(z)
      aPre(i) = a
      val rate = spec.layers(i).dropout
      aPost(i + 1) =
        if (rate > 0.0 && dropoutRng != null && i < nLayers - 1) {
          val keep = 1.0 - rate
          val mask = DenseMatrix.fill[Double](a.rows, a.cols)(
            if (dropoutRng.nextDouble() < keep) 1.0 / keep else 0.0)
          masks(i) = mask
          a *:* mask
        } else a
      i += 1
    }
    val pred = aPost(nLayers)
    val lossVal = lossFn.loss(pred, y)

    val grads = new Array[DenseMatrix[Double]](2 * nLayers)
    var delta = lossFn.dZ(pred, y, acts(nLayers - 1)) // dL/dZ of last layer
    i = nLayers - 1
    while (i >= 0) {
      grads(2 * i) = aPost(i).t * delta
      val colSums: DenseVector[Double] = bsum(delta(::, *)).t
      grads(2 * i + 1) = colSums.toDenseMatrix // 1 x out
      if (i > 0) {
        var dA = delta * ts(2 * i).t // dL/dA_post of layer i-1
        if (masks(i - 1) != null) dA = dA *:* masks(i - 1) // through dropout
        delta = dA *:* acts(i - 1).dAdZ(aPre(i - 1)) // pre-dropout activation
      }
      i -= 1
    }
    (lossVal, grads)
  }

  def loss(x: DenseMatrix[Double], y: DenseMatrix[Double], ts: Tensors): Double =
    lossFn.loss(forward(x, ts), y)

  /** Predict a single example; used by the inference UDF. */
  def predictRow(features: Array[Double], ts: Tensors): Array[Double] = {
    val x = new DenseMatrix(1, features.length, features)
    forward(x, ts).toDenseVector.toArray
  }
}
