package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeability of the sketch aggregates — the property that makes them
  * usable at 100 TB: per-partition/per-group sketches union to exactly
  * the sketch of the whole, so distinct counts compose across shards,
  * days, or datacenters without ever re-scanning raw data. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("HLL: union of per-nation sketches == one global sketch, near exact count") {
    val c = spark.read.parquet(s"$dir/customer.parquet")
    c.createOrReplaceTempView("cust")
    val global = spark.sql(
      "SELECT hll_sketch_estimate(hll_sketch_agg(c_custkey)) AS est FROM cust")
      .head().getLong(0)
    val merged = spark.sql(
      """SELECT hll_sketch_estimate(hll_union_agg(s)) AS est FROM (
        |  SELECT c_nationkey, hll_sketch_agg(c_custkey) AS s
        |  FROM cust GROUP BY c_nationkey)""".stripMargin)
      .head().getLong(0)
    // union of partial sketches must be EXACTLY the global sketch's
    // estimate (same deterministic register merge), not merely close
    assert(merged == global, s"merged=$merged global=$global")
    val exact = c.select(countDistinct(col("c_custkey"))).head().getLong(0)
    assert(math.abs(global - exact).toDouble / exact < 0.05,
      s"hll=$global exact=$exact (>5% off)")
  }

  test("approx quantile sketches merge across groups within accuracy bounds") {
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = l.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approx = l.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01).head
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }
}
