package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS parameter-server measurement (VERDICT r15 #4): forks
  * [[LocalClusterPsBenchMain]] — `local-cluster[2,1,1024]`, two real
  * executor JVMs — and records pull+push rounds/sec, sharded (4) vs
  * single, at a 4 KB and a ~2 MiB model. Same fork/retry policy as
  * DistributedTrainerSpec: generous timeout, one retry on infra flake,
  * hard fail only on the benchmark's own contract.
  *
  * Assertions are deliberately soft (shared CI box): every combo must
  * complete with throughput > 0 and the large-model sharded/single
  * ratio must not collapse below 0.3× (sharding must never cost 3× on
  * the path it exists to speed up). The printed table is the record —
  * the r16 measured numbers live in SCALE.md. */
class PsLocalClusterBenchSpec extends AnyFunSuite {

  private def runForked(): (Int, String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    import scala.jdk.CollectionConverters._
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList.sliding(2).collect {
        case List("--add-opens", v) => List("--add-opens", v)
      }.toList.flatten ++
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.filter(_.startsWith("--add-opens="))
    val cmd = Seq(javaBin) ++ opens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.server.LocalClusterPsBenchMain")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.environment().put("SPARK_LOCAL_IP", "127.0.0.1")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val p = pb.start()
    val out = new java.lang.StringBuilder
    val gobbler = new Thread(() => {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      try {
        var line = reader.readLine()
        while (line != null) {
          out.synchronized { out.append(line).append('\n') }
          line = reader.readLine()
        }
      } catch { case _: java.io.IOException => () }
    }, "lc-ps-gobbler")
    gobbler.setDaemon(true)
    gobbler.start()
    val finished = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      p.destroyForcibly()
      return (-2, out.synchronized(out.toString))
    }
    gobbler.join(5000)
    (p.exitValue(), out.synchronized(out.toString))
  }

  private val Row = """LC_PS row model=(\w+) shards=(\d+) rps=([\d.]+)""".r

  private def parse(log: String): Map[(String, Int), Double] =
    Row.findAllMatchIn(log).map(m =>
      (m.group(1), m.group(2).toInt) -> m.group(3).toDouble).toMap

  test("pull+push rounds across real executor processes, sharded vs single, two model sizes") {
    val (exit1, log1) = runForked()
    val (exit, log) =
      if (exit1 == 0 && log1.contains("LC_PS_OK")) (exit1, log1)
      else runForked() // one retry: launch/bind/timeout infra flakes
    assert(exit == 0 && log.contains("LC_PS_OK"), log.takeRight(4000))
    val rps = parse(log)
    assert(rps.keySet == Set(("small", 1), ("small", 4), ("large", 1), ("large", 4)),
      s"missing combos: $rps")
    rps.foreach { case (k, v) => assert(v > 0, s"$k produced rps=$v") }
    info(rps.toSeq.sortBy(_._1.toString)
      .map { case ((m, s), v) => f"$m/shards=$s: $v%.1f rounds/s" }.mkString("; "))
    val largeRatio = rps(("large", 4)) / rps(("large", 1))
    assert(largeRatio > 0.3,
      f"sharding collapsed on the large model: ratio $largeRatio%.2f")
  }
}
