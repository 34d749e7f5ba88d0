package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** q_skyline / emb_covariance / ml_chi2 vs independent driver-side
  * reference computations on the real sf0.001 fixture — each query's
  * streaming/one-pass formulation is checked against the quadratic or
  * naive textbook definition it replaces.
  */
class StatsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_skyline equals the quadratic dominance reference") {
    val parts = Tables.part(spark, dir)
      .selectExpr("p_partkey", "cast(p_size as long) p_size", "p_retailprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ref = parts.filter { case (_, sz, pr) =>
      !parts.exists { case (_, sz2, pr2) =>
        sz2 >= sz && pr2 <= pr && (sz2 > sz || pr2 < pr)
      }
    }.map(_._1).toSet
    val got = Relational.queries("q_skyline")(spark, dir)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("emb_covariance matches a naive two-pass covariance on rounded components") {
    val d = 6
    val vecs = Tables.embeddings(spark, dir)
      .selectExpr(s"slice(cast(embedding as array<double>), 1, $d) v")
      .collect().map(_.getSeq[Double](0).map(r6).toArray)
    val n = vecs.length
    val ref = (for { i <- 0 until d; j <- i until d } yield {
      val mi = vecs.map(_(i)).sum / n
      val mj = vecs.map(_(j)).sum / n
      val cov = vecs.map(v => (v(i) - mi) * (v(j) - mj)).sum / (n - 1)
      (i + 1L, j + 1L) -> cov
    }).toMap
    val got = SimilarityOps.queries("emb_covariance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (cov, nn)) =>
      assert(nn == n)
      // the query computes E[xy]-E[x]E[y] on exact decimal sums; the
      // naive centered two-pass form agrees to well inside the 6dp round
      assert(math.abs(cov - ref(k)) < 1e-4, s"cov$k: $cov vs ${ref(k)}")
    }
    // variance diagonal must be non-negative
    (1 to d).foreach(i => assert(got((i.toLong, i.toLong))._1 >= 0.0))
  }

  test("emb_pca_power returns a unit vector that the covariance nearly fixes") {
    val rows = SimilarityOps.queries("emb_pca_power")(spark, dir)
      .orderBy("pos").collect()
    val v = rows.map(_.getDouble(1))
    val lambda = rows.head.getDouble(2)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6, "unit norm")
    assert(lambda > 0)
    // driver-side covariance of the same rounded components
    val d = v.length
    val vecs = Tables.embeddings(spark, dir)
      .selectExpr(s"slice(cast(embedding as array<double>), 1, $d) x")
      .collect().map(_.getSeq[Double](0).map(r6).toArray)
    val n = vecs.length
    val mean = (0 until d).map(i => vecs.map(_(i)).sum / n)
    def cov(i: Int, j: Int) =
      vecs.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1)
    val cv = (0 until d).map(i => (0 until d).map(j => cov(i, j) * v(j)).sum)
    // after 4 power rounds C·v ≈ λ·v — residual well under the spectrum
    val resid = math.sqrt((0 until d).map(i => {
      val e = cv(i) - lambda * v(i); e * e
    }).sum)
    assert(resid < 0.05 * lambda, s"residual $resid vs lambda $lambda")
  }

  test("events_interval_union equals a driver-side interval merge") {
    val iv = Tables.events(spark, dir)
      .selectExpr("user_id",
        "unix_micros(ts) st",
        "unix_micros(ts) + cast(round(value, 0) as long) * 1000000L en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = iv.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(identity)
      // classic merge of sorted intervals
      var islands = List.empty[(Long, Long)]
      sorted.foreach { case (st, en) =>
        islands match {
          case (s0, e0) :: rest if st <= e0 =>
            islands = (s0, math.max(e0, en)) :: rest
          case _ => islands = (st, en) :: islands
        }
      }
      u -> ((rows.length.toLong, islands.size.toLong,
        islands.map { case (s0, e0) => e0 - s0 }.sum))
    }
    val got = EventOps.queries("events_interval_union")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (u, v) => assert(got(u) == v, s"user $u") }
  }

  test("events_attribution credit models total correctly") {
    val rows = EventOps.queries("events_attribution")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // driver-side reference over the raw events
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val convs = ev.filter(_._3 == "purchase")
    val touches = ev.filter(e => e._3 == "click" || e._3 == "view")
    val attributed = convs.map { c =>
      touches.filter(t => t._1 == c._1 && t._4 < c._4 &&
        t._4 >= c._4 - 86400000000L)
    }.filter(_.nonEmpty)
    // every attributed conversion hands out exactly one first, one last,
    // and 1.0 of linear credit (up to the 10dp per-touch round)
    assert(rows.map(_._4).sum == attributed.size, "first-touch total")
    assert(rows.map(_._5).sum == attributed.size, "last-touch total")
    assert(math.abs(rows.map(_._6).sum - attributed.size) < 1e-4, "linear total")
    assert(rows.map(_._2).sum == attributed.map(_.size).sum, "touch volume")
  }

  test("ml_chi2 matches a driver-side full-grid chi-squared") {
    val rows = Tables.documents(spark, dir)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val langs = rows.map(_._1).distinct.sorted
    val srcs = rows.map(_._2).distinct.sorted
    val nn = rows.length.toDouble
    val counts = rows.groupBy(identity).map { case (k, v) => k -> v.length }
    var terms = List.empty[BigDecimal]
    for (l <- langs; s <- srcs) {
      val o = counts.getOrElse((l, s), 0).toDouble
      val nl = rows.count(_._1 == l).toDouble
      val ns = rows.count(_._2 == s).toDouble
      val exp = nl * ns / nn
      terms ::= BigDecimal((o - exp) * (o - exp) / exp)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }
    val chi2 = terms.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dof = (langs.size - 1L) * (srcs.size - 1L)
    val v = r6(math.sqrt(chi2 / (nn * math.min(langs.size - 1, srcs.size - 1))))
    val got = MlOps.queries("ml_chi2")(spark, dir).collect().head
    assert(got.getDouble(0) == chi2)
    assert(got.getLong(1) == dof)
    assert(math.abs(got.getDouble(2) - v) < 1e-9)
    assert(got.getLong(3) == langs.size.toLong * srcs.size)
  }
}
