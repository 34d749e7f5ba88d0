package graft

import org.apache.spark.sql.SparkSession

/** Steady-state profiler for individual queries — the measurement tool
  * the bench can't be: `Bench` runs each query best-of-2 in a cold-ish
  * JVM position, which over-reports heavy queries by up to ~2× vs their
  * warm cost (JIT + codegen cache). Prof runs the named queries N times
  * each in one JVM and prints every rep, so regressions/optimizations
  * can be judged on the warm tail instead of the cold head.
  *
  * Usage: runMain graft.Prof <sfDir> <reps> <query> [query...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Prof <sfDir> <reps> <query> [query...]")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        // drop leftover localCheckpoint blocks between reps, as Bench does
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        sec
      }
      println(f"PROF $name reps=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
