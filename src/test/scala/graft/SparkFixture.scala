package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (the reference creates one
  * local[2] session per class, `tests/dl_runner.py:26-40`). */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      // exercises the SparkSessionExtensions injection path: graft SQL
      // functions resolve with no per-session register() call
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
