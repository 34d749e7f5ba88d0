package graft.train

import graft.nn.{NetSpec, Network}

/** Forked-JVM body of [[DistributedTrainerSpec]]: the raw-RDD Hogwild
  * XOR e2e (mirror of the reference's `test_spark_hogwild`,
  * `tests/dl_runner.py:187-214`) on `local-cluster[2,1,1024]` — two
  * executors as REAL SEPARATE JVM PROCESSES, so the worker→parameter-
  * server HTTP path (`ParameterServer` GET /parameters, POST /update)
  * crosses an actual process/socket boundary instead of the in-process
  * loopback every `local[n]` test exercises. Runs as its own main
  * because a JVM holds ONE SparkContext: the suite's shared `local[32]`
  * fixture cannot coexist with a local-cluster context.
  *
  * Exit 0 + `LC_XOR_OK` line ⇔ the distributed fit converged
  * (≤1 of 4 XOR rows misclassified, the reference's own threshold). */
object LocalClusterXorMain {
  def main(args: Array[String]): Unit = {
    // executors are launched by the in-process standalone Worker with a
    // fresh command line: they need our classes and the JDK17 opens the
    // driver JVM itself was started with
    val cp = System.getProperty("java.class.path")
    val opensStr = {
      // inherit this JVM's --add-opens flags (either the one-token
      // "--add-opens=pkg=ALL-UNNAMED" or the two-token form)
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
      .appName("graft-lc-xor")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", opensStr)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      val data = Seq(
        (Array(0.0, 0.0), Array(0.0)), (Array(0.0, 1.0), Array(1.0)),
        (Array(1.0, 0.0), Array(1.0)), (Array(1.0, 1.0), Array(0.0)))
      // 2 partitions over 2 single-core executor processes: both workers
      // pull/push against the driver's HTTP server concurrently
      val rdd = spark.sparkContext.parallelize(data ++ data, 2)
      val xorSpec = NetSpec.input(2).dense(12, "tanh").dense(7, "tanh")
        .dense(1, "sigmoid").loss("mse")
      // port 0 = OS-assigned ephemeral — collision-proof under
      // concurrent test runs on one host (workers read the BOUND port
      // off the server via determineMaster, so no coordination needed)
      val w = HogwildTrainer.fit(rdd, xorSpec, HogwildTrainer.Config(
        optimizerName = "adam", learningRate = 0.1, iters = 300,
        shufflePerIter = false, port = 0))
      val net = new Network(xorSpec)
      val preds = data.map { case (f, _) => net.predictRow(f, w)(0) }
      val errs = preds.zip(Seq(0.0, 1.0, 1.0, 0.0))
        .count { case (p, y) => (if (p > 0.5) 1.0 else 0.0) != y }
      if (errs <= 1) println(s"LC_XOR_OK errs=$errs preds=${preds.mkString(",")}")
      else {
        println(s"LC_XOR_FAIL errs=$errs preds=${preds.mkString(",")}")
        spark.stop(); sys.exit(1)
      }
    } finally spark.stop()
    sys.exit(0) // standalone master/worker threads are non-daemon
  }
}
