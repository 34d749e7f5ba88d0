package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards for the driver interface: every oracle key has a query,
  * every query runs on the smoke-scale data with a sane schema, and the
  * flagship returns rows. Catches query/oracle drift before the driver's
  * round evaluation does. */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query runs at sf0.001 with distinct, nonempty column names") {
    // the training query is exercised by the flagship test below; skip the
    // 3-second fit here
    val names = SparkEntry.queries.keySet - "ml_train_predict"
    val failures = names.toSeq.sorted.flatMap { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val cols = df.columns
        val bad =
          if (cols.isEmpty) Some(s"$name: no columns")
          else if (cols.distinct.length != cols.length) Some(s"$name: duplicate columns ${cols.mkString(",")}")
          else { df.count(); None } // must execute
        bad
      } catch { case e: Exception => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
