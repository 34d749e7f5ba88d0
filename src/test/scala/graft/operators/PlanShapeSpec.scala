package graft.operators

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the scale claims the docs make: these
  * fail loudly if a future edit quietly degrades a query's plan. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("events_top_per_user: rank filter becomes WindowGroupLimit (per-partition top-k)") {
    // Spark 3.5+ rewrites rank<=k over a window into WindowGroupLimit,
    // which prunes to k rows per key BEFORE the full window sort — the
    // difference between shuffling k rows per user and all of them
    assert(plan("events_top_per_user").contains("WindowGroupLimit"))
  }

  test("text_bm25: top-k is TakeOrderedAndProject, not a global window sort") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_customers_no_orders: price filter pushes into the orders scan") {
    val p = plan("q_customers_no_orders")
    assert(p.contains("GreaterThan(o_totalprice"), p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q3_shipping_priority: dimension side broadcasts") {
    assert(plan("q3_shipping_priority").contains("BroadcastHashJoin"))
  }

  test("dedup_minhash_lsh: projection prunes the documents scan to two columns") {
    val p = plan("dedup_minhash_lsh")
    val scanLine = p.linesIterator.find(l => l.contains("ReadSchema") && l.contains("documents"))
      .orElse(p.linesIterator.find(_.contains("ReadSchema"))).getOrElse("")
    assert(scanLine.contains("doc_id") && scanLine.contains("text") && !scanLine.contains("lang"),
      scanLine)
  }
}
