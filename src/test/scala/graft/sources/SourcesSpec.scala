package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import java.nio.file.Files

/** Format round-trips over a real testdata table: parquet → {csv, json,
  * orc} → read-back must be value-identical (same rows, same types). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val nation =
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
  }

  test("csv round-trip preserves rows under an explicit schema") {
    val dir = Files.createTempDirectory("src_csv").toString + "/n"
    Sources.stage(nation, dir, "csv")
    val back = Sources.readCsv(spark, dir, nation.schema)
    assert(back.schema == nation.schema)
    assert(rows(back) == rows(nation))
  }

  test("json round-trip preserves rows under an explicit schema") {
    val dir = Files.createTempDirectory("src_json").toString + "/n"
    Sources.stage(nation, dir, "json")
    val back = Sources.readJson(spark, dir, nation.schema)
    assert(rows(back) == rows(nation))
  }

  test("orc round-trip preserves rows and supports pushdown") {
    val dir = Files.createTempDirectory("src_orc").toString + "/n"
    Sources.stage(nation, dir, "orc")
    val back = Sources.readOrc(spark, dir)
    assert(rows(back) == rows(nation))
    // columnar pushdown: the filter must reach the ORC scan
    val filtered = Sources.readOrc(spark, dir).filter("n_nationkey = 3")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]")
      || "PushedFilters: \\[[^\\]]*n_nationkey".r.findFirstIn(scan).isDefined,
      s"filter not pushed to ORC scan:\n$scan")
    assert(filtered.count() == 1)
  }
}
