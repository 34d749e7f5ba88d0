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

  test("q_set_ops_all: multiset counts match a brute-force bag computation") {
    val o = Tables.orders(spark, sf)
    def keys(y: Int) = o
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSeq
    val (k96, k97) = (keys(1996), keys(1997))
    val c96 = k96.groupBy(identity).view.mapValues(_.size).toMap
    val c97 = k97.groupBy(identity).view.mapValues(_.size).toMap
    val interRows = c96.map { case (k, n) => math.min(n, c97.getOrElse(k, 0)) }.sum
    val exceptRows = c96.map { case (k, n) => math.max(0, n - c97.getOrElse(k, 0)) }.sum
    val out = Relational.queries("q_set_ops_all")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("intersect_all") == interRows.toLong, out.toString)
    assert(out("except_all") == exceptRows.toLong, out.toString)
    // the ALL variants must actually see multiplicity on this corpus
    assert(interRows > c96.keySet.count(c97.contains), "no duplicate survived — weak fixture")
  }

  test("events_gap_fill: the hour grid is dense and zeros mark real gaps") {
    val rows = EventOps.queries("events_gap_fill")(spark, sf)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
    val hour = 3600000L
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array((a, _), (b, _)) =>
      assert(b - a == hour, s"grid gap between $a and $b")
    }
    assert(rows.exists(_._2 == 0L), "expected at least one silent hour as a zero row")
    assert(rows.map(_._2).sum ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }

  test("events_anomaly_zscore: flags are |z|>=2 rows of the densified series") {
    val flagged = EventOps.queries("events_anomaly_zscore")(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(3)))
    val gridHours = EventOps.queries("events_gap_fill")(spark, sf)
      .collect().map(_.getTimestamp(0)).toSet
    flagged.foreach { case (h, _, z) =>
      assert(math.abs(z) >= 2.0, s"$h flagged with |z|=$z < 2")
      assert(gridHours.contains(h), s"$h not on the densified grid")
    }
  }

  test("dedup_minhash_est: estimates are valid probabilities with bounded mean error") {
    val rows = DedupOps.queries("dedup_minhash_est")(spark, sf)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (est, tru, err) =>
      assert(est >= 0 && est <= 1 && tru >= 0 && tru <= 1)
      assert(math.abs(err - math.abs(est - tru)) < 1e-9)
    }
    // K=8 gives stderr ~ sqrt(j(1-j)/8) <= 0.18; candidates skew to
    // high-j pairs, so the mean error should sit well under 0.35
    val mean = rows.map(_._3).sum / rows.length
    assert(mean < 0.35, s"mean |est-true| = $mean — estimator broken?")
  }
}
