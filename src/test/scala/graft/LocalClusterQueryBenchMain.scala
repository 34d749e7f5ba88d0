package graft

import org.apache.spark.sql.functions._

/** One-shot local-cluster smoke of the shuffle-heavy query tail
  * (VERDICT r16 #8): all 343 queries are benchmarked on `local[32]`,
  * where every "shuffle" is an in-JVM array handoff — this main runs
  * the top-10 shuffle-byte queries (per `bench_out_r16_full.json`)
  * under `local-cluster[2,8,4096]`, i.e. two REAL executor JVM
  * processes, so shuffle blocks serialize, cross a socket, and
  * deserialize, and `localCheckpoint` blocks live on executors — the
  * failure modes `local[*]` cannot surface (non-serializable closures,
  * driver-only state, block-fetch paths).
  *
  * Per query it prints `LC_Q row name=<q> rows=<n> sum=<checksum>
  * sec=<s>` where the checksum is `bit_xor(xxhash64(to_json(row)))`
  * — partitioning-independent (and overflow-free under ANSI, unlike
  * a sum), so the SAME line must appear when the
  * main is re-run with SPARK_GRAFT_LC_MASTER=local[8]; diffing the two
  * outputs adjudicates divergence. Ends with `LC_Q_OK`. Run (needs the
  * executor launcher to resolve the scala dir):
  * {{{
  *   SPARK_SCALA_VERSION=2.13 sbt "Test/runMain graft.LocalClusterQueryBenchMain"
  * }}}
  * Results are recorded in SCALE.md ("local-cluster smoke"), not a
  * standing spec: two executor JVMs per run is minutes of suite cost
  * for a property that changes only when a query's plan does — the
  * plan gates (PlanShapeSpec, BnljBuildSideGateSpec) stand guard
  * per-commit; this main re-runs when the tail's membership changes. */
object LocalClusterQueryBenchMain {

  /** Top-10 by shuffle bytes in bench_out_r16_full.json. */
  val TailQueries: Seq[String] = Seq(
    "dedup_substring_cut", "dedup_substring", "graph_label_prop",
    "graph_spectral_cut", "graph_modularity", "graph_communities",
    "graph_link_predict", "graph_hits", "graph_assortativity",
    "graph_bfs")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val master = sys.env.getOrElse("SPARK_GRAFT_LC_MASTER",
      "local-cluster[2,8,4096]")
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
      .master(master)
      .appName("graft-lc-query-smoke")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", opensStr)
      .config("spark.sql.shuffle.partitions", "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      TailQueries.foreach { q =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val agg = df
          .select(xxhash64(to_json(struct(df.columns.map(col): _*))).as("h"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("s")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"LC_Q row name=$q rows=${agg.getLong(0)} " +
          f"sum=${Option(agg.get(1)).getOrElse(0L)} sec=$sec%.2f")
      }
      println("LC_Q_OK")
    } finally spark.stop()
  }
}
