package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** events_active_users_hll is contractually no-oracle (DataSketches HLL
  * vs DuckDB HLL differ) — this spec is its gate instead: the sketch
  * estimates must track the exact twin. At fixture cardinalities the
  * DataSketches sketch runs in exact sparse mode, so DAU estimates are
  * typically bit-equal; the assert allows the documented 2% relative
  * error so the pin survives a fixture regeneration that pushes a day
  * past sparse-mode promotion. */
class EventsHllSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("HLL DAU/WAU estimates track the exact twin within sketch tolerance") {
    val exact = EventOps.queries("events_active_users")(spark, dir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    val est = EventOps.queries("events_active_users_hll")(spark, dir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(est.keySet == exact.keySet)
    assert(est.nonEmpty)
    est.foreach { case (d, (dau, wau)) =>
      val (edau, ewau) = exact(d)
      assert(math.abs(dau - edau) <= math.max(1L, (0.02 * edau).toLong),
        s"$d dau est $dau vs exact $edau")
      assert(math.abs(wau - ewau) <= math.max(1L, (0.02 * ewau).toLong),
        s"$d wau est $wau vs exact $ewau")
    }
  }

  test("HLL DAU/MAU stickiness tracks the exact twin within sketch tolerance") {
    val exact = EventOps.queries("events_dau_stickiness")(spark, dir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val est = EventOps.queries("events_dau_stickiness_hll")(spark, dir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(est.keySet == exact.keySet)
    assert(est.nonEmpty)
    est.foreach { case (d, (dau, mau, st)) =>
      val (edau, emau, est0) = exact(d)
      assert(math.abs(dau - edau) <= math.max(1L, (0.02 * edau).toLong),
        s"$d dau est $dau vs exact $edau")
      assert(math.abs(mau - emau) <= math.max(1L, (0.02 * emau).toLong),
        s"$d mau28 est $mau vs exact $emau")
      // the ratio compounds both errors: allow ~4% relative
      assert(math.abs(st - est0) <= math.max(0.04 * est0, 1e-6),
        s"$d stickiness est $st vs exact $est0")
    }
  }
}
