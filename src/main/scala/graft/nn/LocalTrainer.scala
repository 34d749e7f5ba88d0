package graft.nn

import breeze.linalg.DenseMatrix
import graft.nn.Tensors.Tensors
import scala.util.Random

/** Single-process trainer over in-memory matrices. The three batch modes
  * replicate the per-partition worker loop of the reference
  * (lifeomic/sparkflow `HogwildSparkModel.py:62-92`):
  *
  *  (a) miniStochasticIters >= 1 → that many random mini-batches per iter
  *  (b) miniBatchSize >= 1       → sequential sweep in idx steps
  *  (c) otherwise                → one full-batch step per iter
  *
  * In the distributed trainer the same loop runs against the parameter
  * server (weights re-pulled per batch in mode (b), matching
  * `HogwildSparkModel.py:74-84`); here `pull`/`push` are local closures so
  * the identical code is unit-testable without HTTP.
  */
object LocalTrainer {

  final case class Config(
      iters: Int = 1000,
      miniBatchSize: Int = -1,
      miniStochasticIters: Int = -1,
      shufflePerIter: Boolean = true,
      verbose: Int = 0,
      seed: Long = 42L)

  /** Train with explicit pull/push hooks (the distributed worker wires
    * these to HTTP GET /parameters and POST /update). */
  def trainLoop(
      net: Network,
      x0: DenseMatrix[Double],
      y0: DenseMatrix[Double],
      cfg: Config,
      pull: () => Tensors,
      push: Tensors => Unit,
      lossCallback: Double => Unit = null): Unit = {
    val rng = new Random(cfg.seed)
    var x = x0
    var y = y0
    val n = x.rows
    var it = 0
    var lastTs: Tensors = null // reused for loss reporting — no extra pull
    while (it < cfg.iters) {
      if (cfg.shufflePerIter) {
        val (xs, ys) = Batching.shuffle(x, y, rng)
        x = xs; y = ys
      }
      if (cfg.miniStochasticIters >= 1) {
        var k = 0
        val ts = pull()
        lastTs = ts
        while (k < cfg.miniStochasticIters) {
          val idx = Batching.batchIndices(n, cfg.miniBatchSize, -1, rng)
          val (_, g) = net.forwardBackward(
            Batching.selectRows(x, idx), Batching.selectRows(y, idx), ts, rng)
          push(g)
          k += 1
        }
      } else if (cfg.miniBatchSize >= 1) {
        val sweeps = Batching.sweepCount(n, cfg.miniBatchSize)
        var s = 0
        while (s < sweeps) {
          val ts = pull() // weights re-pulled per batch, like the reference
          lastTs = ts
          val idx = Batching.batchIndices(n, cfg.miniBatchSize, s, rng)
          if (idx.nonEmpty) {
            val (_, g) = net.forwardBackward(
              Batching.selectRows(x, idx), Batching.selectRows(y, idx), ts, rng)
            push(g)
          }
          s += 1
        }
      } else {
        val ts = pull()
        lastTs = ts
        val (_, g) = net.forwardBackward(x, y, ts, rng)
        push(g)
      }
      if (cfg.verbose > 0 || lossCallback != null) {
        // report with the weights already pulled this iteration instead
        // of a second full-model GET per iteration
        val l = net.loss(x, y, lastTs)
        if (cfg.verbose > 0 && it % math.max(1, cfg.iters / 20) == 0)
          System.err.println(s"[graft] iter=$it loss=$l")
        if (lossCallback != null) lossCallback(l)
      }
      it += 1
    }
  }

  /** Convenience: fully local fit (pull/push close over one weight set). */
  def fit(
      spec: NetSpec,
      x: DenseMatrix[Double],
      y: DenseMatrix[Double],
      optimizer: Optimizer,
      cfg: Config = Config()): Tensors = {
    val net = new Network(spec)
    val w = net.initWeights(cfg.seed)
    trainLoop(net, x, y, cfg, () => w, g => optimizer.step(w, g))
    w
  }
}
