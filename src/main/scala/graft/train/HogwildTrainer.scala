package graft.train

import breeze.linalg.DenseMatrix
import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import graft.nn.{Batching, LocalTrainer, NetSpec, Network, Optimizer}
import graft.nn.Tensors.Tensors
import graft.server.{ParameterServer, ParamsClient, ShardedParameterServer, ShardedParamsClient}

/** Distributed data-parallel trainer — the reference's `HogwildSparkModel`
  * (lifeomic/sparkflow `HogwildSparkModel.py:103-272`) re-expressed for the
  * JVM.
  *
  * Shape is identical: start a driver-hosted parameter server, run
  * `rdd.foreachPartition` workers that pull weights / push gradients over
  * HTTP, `repartition` between `partitionShuffles` rounds (a deliberate
  * full shuffle — documented as costly in the reference README:167-169),
  * finally read the weights and stop the server. Training is deliberately
  * an RDD action OUTSIDE Catalyst: it is imperative per-partition compute,
  * not a relational operator, so a DataFrame plan would buy nothing
  * (SURVEY.md §2C).
  *
  * Scale note (100 TB): the server exchanges whole weight tensors per
  * batch, so wire cost = O(model size x batches), independent of data
  * size; data never moves to the driver. Partition count should track
  * executor count (`coalesce` guard in [[graft.ml.SparkAsyncDL]]) so each
  * worker streams its shard once per round.
  */
object HogwildTrainer {

  final case class Config(
      optimizerName: String = "adam",
      learningRate: Double = 0.01,
      optimizerOptions: Map[String, Double] = Map.empty,
      iters: Int = 1000,
      miniBatchSize: Int = -1,
      miniStochasticIters: Int = -1,
      acquireLock: Boolean = false,
      shufflePerIter: Boolean = true,
      partitionShuffles: Int = 1,
      verbose: Int = 0,
      port: Int = 5000,
      seed: Long = 42L,
      /** >0 ⇒ each push sends only the k largest-magnitude gradient
        * entries, with a worker-local error-feedback residual carrying
        * the rest to later pushes ([[graft.nn.GradientCompression]]) —
        * the bandwidth lever once partitions × model size outgrows the
        * driver NIC. 0 = dense pushes (reference parity). */
      gradientTopK: Int = 0)

  /** Train on an RDD of (features, label-vector) pairs; returns final weights. */
  def fit(rdd: RDD[(Array[Double], Array[Double])], spec: NetSpec, cfg: Config): Tensors = {
    val net = new Network(spec)
    val weights = net.initWeights(cfg.seed)
    val optimizer = Optimizer.build(cfg.optimizerName, cfg.learningRate, cfg.optimizerOptions)
    val server = new ParameterServer(weights, optimizer, cfg.port, cfg.acquireLock,
      maxErrors = math.max(cfg.iters, 1))
    server.start()
    try {
      server.awaitReady()
      val masterUrl = determineMaster(server.boundPort)
      val specJson = spec.toJson // ship the spec, not the Network object
      val workerCfg = cfg
      var current = rdd
      var round = 0
      val rounds = math.max(cfg.partitionShuffles, 1)
      while (round < rounds) {
        current.foreachPartition { it =>
          workerPartition(it, specJson, masterUrl, workerCfg)
        }
        // surface persistent update failures instead of returning the
        // initial weights as if training succeeded
        if (server.isAborted) throw new IllegalStateException(
          s"parameter server aborted after ${server.errorCount} failed updates")
        round += 1
        if (round < rounds) current = current.repartition(current.getNumPartitions)
      }
      server.currentWeights
    } finally {
      server.stop() // always, like the reference's try/except (`:270-272`)
    }
  }

  /** Per-partition worker — parity with `handle_model`
    * (`HogwildSparkModel.py:38-100`): materialize the partition, then run
    * the three-batch-mode loop against the server. Empty partitions no-op. */
  /** Rows → (features, labels) matrices, validating BOTH widths: a short
    * label would silently zero-pad (training on garbage targets), a long
    * one would crash deep in breeze — fail with a message instead. */
  private[graft] def toMatrices(
      rows: Array[(Array[Double], Array[Double])],
      spec: NetSpec): (DenseMatrix[Double], DenseMatrix[Double]) = {
    val n = rows.length
    val x = DenseMatrix.zeros[Double](n, spec.inputDim)
    val y = DenseMatrix.zeros[Double](n, spec.outputDim)
    var r = 0
    while (r < n) {
      val (f, l) = rows(r)
      require(f.length == spec.inputDim,
        s"feature dim ${f.length} != net input ${spec.inputDim}")
      require(l.length == spec.outputDim,
        s"label dim ${l.length} != net output ${spec.outputDim} " +
          "(one-hot encode class indices for multi-class nets)")
      var c = 0
      while (c < f.length) { x(r, c) = f(c); c += 1 }
      c = 0
      while (c < l.length) { y(r, c) = l(c); c += 1 }
      r += 1
    }
    (x, y)
  }

  /** At-least-once gradient contract: Spark may re-run a partition
    * (speculative execution, task retry after a lost executor), and this
    * worker has no dedup handshake with the server — a re-run re-POSTs
    * every gradient of its training loop. That is SAFE under hogwild
    * semantics: asynchronous SGD tolerates duplicated/stale updates
    * statistically (the same tolerance that lets workers race without
    * locks), so a duplicated partition perturbs the trajectory, not
    * convergence — pinned by StragglerRetrySpec. The trade is
    * deliberate: an exactly-once handshake would serialize every push
    * through a dedup log at the server, which is the bottleneck sharding
    * exists to remove. Consequence for operators: gradient counts are
    * not exact under retries, so convergence criteria must be
    * loss-based, never update-count-based. */
  private[graft] def workerPartition(
      it: Iterator[(Array[Double], Array[Double])],
      specJson: String,
      masterUrl: String,
      cfg: Config): Unit = {
    val rows = it.toArray
    if (rows.isEmpty) return
    val spec = NetSpec.fromJson(specJson)
    val net = new Network(spec)
    val pid = org.apache.spark.TaskContext.getPartitionId()
    val (x, y) = toMatrices(rows, spec)
    LocalTrainer.trainLoop(
      net, x, y,
      LocalTrainer.Config(cfg.iters, cfg.miniBatchSize, cfg.miniStochasticIters,
        cfg.shufflePerIter, cfg.verbose, cfg.seed + pid),
      pull = () => ParamsClient.getWeights(masterUrl),
      push =
        if (cfg.gradientTopK > 0) {
          // residual persists across this worker's pushes for the whole
          // partition run — that persistence IS the error feedback
          var residual: Tensors = null
          g => {
            if (residual == null) residual = graft.nn.Tensors.zerosLike(g)
            ParamsClient.postSparseGradients(masterUrl,
              graft.nn.GradientCompression.sparsifyTopK(g, residual, cfg.gradientTopK), pid)
          }
        } else { g => ParamsClient.postGradients(masterUrl, g, pid) })
  }

  /** [[fit]] with the parameter server sharded `shards` ways
    * ([[ShardedParameterServer]]): same hogwild semantics, but weight
    * pulls and gradient pushes split into per-slice transfers that
    * overlap — the scale path past the single-server NIC/serialization
    * ceiling. Worker loop, batch modes, shuffle rounds, abort policy,
    * and `gradientTopK` sparse pushes are identical to [[fit]] — the
    * global top-k selection runs once per push and the sparse payload
    * slices along the same whole-tensor shard bounds as dense. */
  def fitSharded(
      rdd: RDD[(Array[Double], Array[Double])],
      spec: NetSpec,
      cfg: Config,
      shards: Int): Tensors = {
    val net = new Network(spec)
    val weights = net.initWeights(cfg.seed)
    val server = new ShardedParameterServer(
      weights, () => Optimizer.build(cfg.optimizerName, cfg.learningRate, cfg.optimizerOptions),
      cfg.port, shards, cfg.acquireLock, maxErrors = math.max(cfg.iters, 1))
    server.start()
    try {
      server.awaitReady()
      val host = determineMaster(0).split(':')(0)
      val urls = server.boundPorts.map(p => s"$host:$p").toSeq
      val bounds = server.sliceBounds.toSeq
      val specJson = spec.toJson
      val workerCfg = cfg
      var current = rdd
      var round = 0
      val rounds = math.max(cfg.partitionShuffles, 1)
      while (round < rounds) {
        current.foreachPartition { it =>
          val rows = it.toArray
          if (rows.nonEmpty) {
            val s = NetSpec.fromJson(specJson)
            val n2 = new Network(s)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val (x, y) = toMatrices(rows, s)
            LocalTrainer.trainLoop(
              n2, x, y,
              LocalTrainer.Config(workerCfg.iters, workerCfg.miniBatchSize,
                workerCfg.miniStochasticIters, workerCfg.shufflePerIter,
                workerCfg.verbose, workerCfg.seed + pid),
              pull = () => ShardedParamsClient.getWeights(urls),
              push =
                if (workerCfg.gradientTopK > 0) {
                  var residual: Tensors = null
                  g => {
                    if (residual == null) residual = graft.nn.Tensors.zerosLike(g)
                    ShardedParamsClient.postSparseGradients(urls, bounds,
                      graft.nn.GradientCompression.sparsifyTopK(
                        g, residual, workerCfg.gradientTopK), pid)
                  }
                } else { g => ShardedParamsClient.postGradients(urls, bounds, g, pid) })
          }
        }
        if (server.isAborted) throw new IllegalStateException(
          s"sharded parameter server aborted after ${server.errorCount} failed updates")
        round += 1
        if (round < rounds) current = current.repartition(current.getNumPartitions)
      }
      server.currentWeights
    } finally {
      server.stop()
    }
  }

  /** Driver URL for executors — `determine_master`
    * (`HogwildSparkModel.py:145-154`): `spark.driver.host` when set, else
    * local hostname. */
  def determineMaster(port: Int): String = {
    val host =
      try SparkEnv.get.conf.get("spark.driver.host", java.net.InetAddress.getLocalHost.getHostAddress)
      catch { case _: Exception => java.net.InetAddress.getLocalHost.getHostAddress }
    s"$host:$port"
  }

  /** Deterministic alternative trainer: one synchronous round of
    * tree-aggregated gradient averaging per iteration. This productionizes
    * the reference's dead `calculate_weights` averaging path
    * (`ml_util.py:43-51`) as a testable, reproducible mode — and at scale
    * `treeAggregate` is the shape that survives 1000 executors (gradients
    * combine on the tree, never funneling raw partitions to the driver). */
  def fitSync(
      rdd: RDD[(Array[Double], Array[Double])],
      spec: NetSpec,
      cfg: Config): Tensors = {
    val net = new Network(spec)
    val weights = net.initWeights(cfg.seed)
    val optimizer = Optimizer.build(cfg.optimizerName, cfg.learningRate, cfg.optimizerOptions)
    val specJson = spec.toJson
    val sc = rdd.sparkContext
    val cached = rdd.cache()
    if (cached.isEmpty()) { // treeReduce on no elements throws; match fit()
      cached.unpersist(false)
      return weights
    }
    var it = 0
    while (it < cfg.iters) {
      val bc = sc.broadcast(weights)
      val iter = it
      val (gradSum, cnt) = cached.mapPartitions { pit =>
        val rows = pit.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val s = NetSpec.fromJson(specJson)
          val n2 = new Network(s)
          val (x, y) = toMatrices(rows, s)
          // deterministic dropout: seeded per (iteration, partition), so
          // dropout-declaring specs train the same objective as fit()
          // while the trainer stays reproducible
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val rng =
            if (s.layers.exists(_.dropout > 0.0))
              new scala.util.Random(cfg.seed + iter.toLong * 1000003L + pid)
            else null
          val (_, g) = n2.forwardBackward(x, y, bc.value, rng)
          // scale to a weighted contribution so the tree-sum is the
          // full-batch gradient regardless of partition skew
          g.foreach(_ :*= rows.length.toDouble)
          Iterator((g, rows.length.toLong))
        }
      }.treeReduce({ case ((g1, c1), (g2, c2)) =>
        var i = 0
        while (i < g1.length) { g1(i) :+= g2(i); i += 1 }
        (g1, c1 + c2)
      }, depth = 2)
      gradSum.foreach(_ :/= cnt.toDouble)
      optimizer.step(weights, gradSum)
      bc.destroy()
      it += 1
    }
    cached.unpersist(false)
    weights
  }
}
