package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Equivalence checks for relational window shapes (exact values are
  * DuckDB-checked at sf0.01; these prove the declarative plan equals a
  * naive reformulation on a second dataset). */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_rolling_revenue_30d: RANGE frame equals the naive self-join") {
    val rolled = Relational.queries("q_rolling_revenue_30d")(spark, sf)
      .collect().map(r => ((r.getLong(1)), (r.getLong(0), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rolled.nonEmpty)
    // naive: for each order, sum prices of same-customer orders with
    // day in [d-29, d] — the quadratic definition the window replaces
    val o = Tables.orders(spark, sf)
      .filter(col("o_custkey") <= 150)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"),
        col("o_totalprice"))
    val b = o.select(col("o_custkey").as("ck"), col("day").as("d2"),
      col("o_totalprice").as("p2"))
    val naive = o.join(b, o("o_custkey") === b("ck") &&
        b("d2") >= o("day") - 29 && b("d2") <= o("day"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("p2").cast("decimal(18,4)")).cast("double").as("roll"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(naive.keySet == rolled.keySet)
    naive.foreach { case (ok, expect) =>
      assert(math.abs(rolled(ok)._3 - expect) < 1e-6,
        s"order $ok: ${rolled(ok)._3} != $expect")
    }
  }
}
