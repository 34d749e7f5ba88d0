package graft.nn

import breeze.linalg.{DenseMatrix, sum => bsum, max => bmax, *}
import breeze.numerics.{exp, log => blog, sigmoid => bsigmoid, tanh => btanh}

/** Activation functions over row-batched matrices (rows = samples).
  *
  * The reference delegates these to TensorFlow graphs authored by user
  * model-builder functions (lifeomic/sparkflow `graph_utils.py:6-15`); the
  * surface its tests/examples exercise is relu / sigmoid / tanh /
  * softmax / linear (`tests/dl_runner.py:45-73`, `examples/simple_dnn.py:44-60`).
  */
sealed trait Activation extends Serializable {
  def name: String
  def f(z: DenseMatrix[Double]): DenseMatrix[Double]
  /** dA/dZ expressed in terms of the activated output a = f(z).
    * Softmax is excluded (combined with cross-entropy in the loss). */
  def dAdZ(a: DenseMatrix[Double]): DenseMatrix[Double]
}

object Activation {
  case object Linear extends Activation {
    val name = "linear"
    def f(z: DenseMatrix[Double]) = z
    def dAdZ(a: DenseMatrix[Double]) = DenseMatrix.ones[Double](a.rows, a.cols)
  }
  case object Relu extends Activation {
    val name = "relu"
    def f(z: DenseMatrix[Double]) = z.map(v => if (v > 0) v else 0.0)
    def dAdZ(a: DenseMatrix[Double]) = a.map(v => if (v > 0) 1.0 else 0.0)
  }
  case object Sigmoid extends Activation {
    val name = "sigmoid"
    def f(z: DenseMatrix[Double]) = bsigmoid(z)
    def dAdZ(a: DenseMatrix[Double]) = a *:* (1.0 - a)
  }
  case object Tanh extends Activation {
    val name = "tanh"
    def f(z: DenseMatrix[Double]) = btanh(z)
    def dAdZ(a: DenseMatrix[Double]) = 1.0 - (a *:* a)
  }
  /** Row-wise softmax; only legal as the final activation, paired with
    * [[Loss.SoftmaxXent]] (which supplies the combined gradient). */
  case object Softmax extends Activation {
    val name = "softmax"
    def f(z: DenseMatrix[Double]) = {
      val out = DenseMatrix.zeros[Double](z.rows, z.cols)
      var r = 0
      while (r < z.rows) {
        val row = z(r, ::).t
        val m = bmax(row)
        val e = exp(row - m)
        val s = bsum(e)
        out(r, ::) := (e / s).t
        r += 1
      }
      out
    }
    def dAdZ(a: DenseMatrix[Double]) =
      sys.error("softmax gradient is combined into SoftmaxXent loss")
  }

  val all: Seq[Activation] = Seq(Linear, Relu, Sigmoid, Tanh, Softmax)
  def byName(n: String): Activation =
    all.find(_.name == n.toLowerCase).getOrElse(
      sys.error(s"unknown activation '$n' (expected one of ${all.map(_.name).mkString(",")})"))
}

/** Loss functions. Gradient is returned w.r.t. the final layer's
  * pre-activation z (so softmax+xent and sigmoid+bce collapse to p-y). */
sealed trait Loss extends Serializable {
  def name: String
  def loss(p: DenseMatrix[Double], y: DenseMatrix[Double]): Double
  def dZ(p: DenseMatrix[Double], y: DenseMatrix[Double], outAct: Activation): DenseMatrix[Double]
}

object Loss {
  private def n(p: DenseMatrix[Double]) = p.rows.toDouble

  /** Mean squared error, mean over all elements' squared diff / 2-free
    * (TF `reduce_mean(square(out-y))` style, `tests/dl_runner.py:50-52`). */
  case object Mse extends Loss {
    val name = "mse"
    def loss(p: DenseMatrix[Double], y: DenseMatrix[Double]) = {
      val d = p - y
      bsum(d *:* d) / (p.rows.toDouble * p.cols.toDouble)
    }
    def dZ(p: DenseMatrix[Double], y: DenseMatrix[Double], outAct: Activation) = {
      val dA = (p - y) * (2.0 / (p.rows.toDouble * p.cols.toDouble))
      outAct match {
        case Activation.Softmax => sys.error("mse+softmax unsupported; use softmax_xent")
        case a                  => dA *:* a.dAdZ(p)
      }
    }
  }

  /** Softmax cross-entropy (expects outAct == Softmax; grad = (p-y)/n). */
  case object SoftmaxXent extends Loss {
    val name = "softmax_xent"
    def loss(p: DenseMatrix[Double], y: DenseMatrix[Double]) = {
      val eps = 1e-12
      -bsum(y *:* blog(p + eps)) / n(p)
    }
    def dZ(p: DenseMatrix[Double], y: DenseMatrix[Double], outAct: Activation) =
      (p - y) / n(p)
  }

  /** Binary cross-entropy; with a sigmoid output the z-gradient is (p-y)/n. */
  case object Bce extends Loss {
    val name = "bce"
    def loss(p: DenseMatrix[Double], y: DenseMatrix[Double]) = {
      val eps = 1e-12
      -bsum((y *:* blog(p + eps)) + ((1.0 - y) *:* blog((1.0 - p) + eps))) /
        (p.rows.toDouble * p.cols.toDouble)
    }
    def dZ(p: DenseMatrix[Double], y: DenseMatrix[Double], outAct: Activation) = outAct match {
      case Activation.Sigmoid => (p - y) / (p.rows.toDouble * p.cols.toDouble)
      case a =>
        val eps = 1e-12
        val dA = ((p - y) /:/ ((p *:* (1.0 - p)) + eps)) / (p.rows.toDouble * p.cols.toDouble)
        dA *:* a.dAdZ(p)
    }
  }

  val all: Seq[Loss] = Seq(Mse, SoftmaxXent, Bce)
  def byName(n: String): Loss =
    all.find(_.name == n.toLowerCase).getOrElse(
      sys.error(s"unknown loss '$n' (expected one of ${all.map(_.name).mkString(",")})"))
}

/** One dense layer: fanIn x fanOut + activation + optional dropout rate
  * applied to this layer's OUTPUT during training (inverted dropout —
  * identity at inference, mirroring the keep/drop placeholder contract of
  * the reference, `ml_util.py:70-71`). */
case class LayerSpec(in: Int, out: Int, activation: String, dropout: Double = 0.0) {
  def act: Activation = Activation.byName(activation)
}

/** Serializable network topology — our replacement for the reference's
  * TF MetaGraphDef-as-JSON model graph (`graph_utils.py:6-15`,
  * re-parsed on workers at `HogwildSparkModel.py:45-49`). A declarative
  * layer list is all the dense-net surface the reference exercises needs.
  */
case class NetSpec(layers: Seq[LayerSpec], loss: String, seed: Long = 42L) {
  require(layers.nonEmpty, "empty net")
  layers.sliding(2).foreach {
    case Seq(a, b) => require(a.out == b.in, s"layer mismatch: ${a.out} -> ${b.in}")
    case _         =>
  }
  def lossFn: Loss = Loss.byName(loss)
  def inputDim: Int = layers.head.in
  def outputDim: Int = layers.last.out

  def toJson: String = {
    val ls = layers.map(l =>
      s"""{"in":${l.in},"out":${l.out},"activation":"${l.activation}","dropout":${l.dropout}}""")
      .mkString("[", ",", "]")
    s"""{"layers":$ls,"loss":"$loss","seed":$seed}"""
  }
}

object NetSpec {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def fromJson(json: String): NetSpec = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val layers = (j \ "layers").asInstanceOf[JArray].arr.map { lj =>
      LayerSpec(
        in = (lj \ "in").extract[Int],
        out = (lj \ "out").extract[Int],
        activation = (lj \ "activation").extract[String],
        dropout = (lj \ "dropout").extractOrElse[Double](0.0))
    }
    NetSpec(layers, (j \ "loss").extract[String], (j \ "seed").extractOrElse[Long](42L))
  }

  /** Builder DSL: `NetSpec.input(784).dense(256, "relu").dense(10, "softmax").loss("softmax_xent")` */
  def input(dim: Int): Builder = new Builder(dim, Vector.empty)
  final class Builder(last: Int, layers: Vector[LayerSpec]) {
    def dense(out: Int, activation: String, dropout: Double = 0.0): Builder =
      new Builder(out, layers :+ LayerSpec(last, out, activation, dropout))
    def loss(l: String, seed: Long = 42L): NetSpec = NetSpec(layers, l, seed)
  }
}
