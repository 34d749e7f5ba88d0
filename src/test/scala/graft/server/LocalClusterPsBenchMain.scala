package graft.server

import breeze.linalg.DenseMatrix

import graft.nn.{Optimizer, Tensors}
import graft.nn.Tensors.Tensors

/** Forked-JVM benchmark main (VERDICT r15 #4): time parameter-server
  * pull+push rounds ACROSS REAL EXECUTOR PROCESSES — the half of the
  * sharding story `PsShardingThroughputSpec` (in-JVM threads over
  * loopback sockets) cannot see. `local-cluster[2,1,1024]` launches a
  * standalone master + worker in this JVM and two single-core executor
  * JVM processes; each task runs rounds of (pull full model, push dense
  * gradients) through `ShardedParamsClient` against the driver-hosted
  * server, so every byte crosses a process boundary, a real TCP socket
  * and the HTTP codec — the executor→driver path production training
  * takes. (The driver-NIC saturation of a 1000-worker cluster still has
  * no single-host analogue; this measures the per-round protocol cost
  * of that path, sharded vs not.)
  *
  * Prints one `LC_PS row model=<m> shards=<s> rps=<r>` line per combo
  * and `LC_PS_OK` on success; [[PsLocalClusterBenchSpec]] forks this
  * main, asserts the contract, and records the table. */
object LocalClusterPsBenchMain {

  private def model(tensors: Int, dim: Int): Tensors =
    Array.tabulate(tensors)(i => DenseMatrix.fill(dim, dim)(0.01 * (i + 1)))

  def main(args: Array[String]): Unit = {
    val cp = System.getProperty("java.class.path")
    val opensStr = {
      import scala.jdk.CollectionConverters._
      val raw = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toList
      val pairs = raw.sliding(2).collect {
        case List("--add-opens", v) => s"--add-opens=$v"
      }.toList
      (raw.filter(_.startsWith("--add-opens=")) ++ pairs).distinct.mkString(" ")
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-lc-ps-bench")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", opensStr)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      /** rounds/sec of (pull, push) across the two executor processes. */
      def bench(weights: Tensors, shards: Int, rounds: Int): Double = {
        val server = new ShardedParameterServer(Tensors.copy(weights),
          () => Optimizer.build("gradient_descent", 1e-6, Map.empty),
          basePort = 0, shards = shards, acquireLock = false,
          maxErrors = 2 * rounds + 10)
        server.start()
        try {
          server.awaitReady()
          val urls = server.boundPorts.map(p => s"127.0.0.1:$p").toSeq
          val bounds = server.sliceBounds.toSeq
          val r = rounds
          val t0 = System.nanoTime()
          val done = spark.sparkContext.parallelize(0 until 2, 2).map { pid =>
            // shapes come off the first pull; gradients built once
            val first = ShardedParamsClient.getWeights(urls)
            val grads = first.map(t => DenseMatrix.fill(t.rows, t.cols)(1e-9))
            var i = 0
            while (i < r) {
              val pulled = ShardedParamsClient.getWeights(urls)
              require(pulled.length == grads.length)
              ShardedParamsClient.postGradients(urls, bounds, grads, pid)
              i += 1
            }
            r
          }.collect().sum
          require(server.errorCount == 0, s"server errors: ${server.errorCount}")
          done / ((System.nanoTime() - t0) / 1e9)
        } finally server.stop()
      }

      // warm the executor JVMs + HTTP stack once (both topologies)
      bench(model(4, 16), 1, 3)
      bench(model(4, 16), 4, 3)

      val combos = Seq(
        ("small", model(4, 32), 200),  // 4 KB of weights
        ("large", model(4, 256), 40))  // ~2 MiB of weights
      combos.foreach { case (name, w, rounds) =>
        Seq(1, 4).foreach { shards =>
          val rps = bench(w, shards, rounds)
          println(f"LC_PS row model=$name shards=$shards rps=$rps%.1f")
        }
      }
      println("LC_PS_OK")
    } finally spark.stop()
    sys.exit(0) // standalone master/worker threads are non-daemon
  }
}
