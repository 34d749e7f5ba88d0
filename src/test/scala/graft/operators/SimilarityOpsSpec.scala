package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** emb_kmeans / emb_pq_error vs driver-side reference computations on the
  * real sf0.001 embeddings (both queries are deterministic: literal seed
  * codebooks + 6dp rounding discipline). */
class SimilarityOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def sq(a: Seq[Double], b: Seq[Double]) =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def argmin(cb: Seq[(Long, Seq[Double])], v: Seq[Double]): (Long, Double) =
    cb.map { case (c, cv) => (r6(sq(v, cv)), c) }.min match {
      case (d, c) => (c, d)
    }

  private lazy val vecs: Seq[(Long, Seq[Double])] =
    Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq

  test("emb_kmeans matches a driver-side two-iteration Lloyd reference") {
    val seeds = vecs.filter(_._1 < 8).sortBy(_._1)
    val a0 = vecs.map { case (id, v) => (id, v, argmin(seeds, v)._1) }
    val cent1 = a0.groupBy(_._3).map { case (c, g) =>
      val dim = g.head._2.size
      c -> (0 until dim).map(i => r6(g.map(_._2(i)).sum / g.size))
    }.toSeq.sortBy(_._1)
    val a1 = a0.map { case (id, v, c0) =>
      val (c1, d) = argmin(cent1, v); (c1, c0 != c1, d)
    }
    val ref = a1.groupBy(_._1).map { case (c, g) =>
      // mirror the query's DetMean discipline: 10dp-rounded distances,
      // exact decimal sum, one division, 6dp — the double-mean form can
      // land one micro away at a rounding boundary
      val s10 = g.map(x => BigDecimal(x._3)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
      c -> (g.size.toLong, g.count(_._2).toLong,
        r6(s10.toDouble / g.size))
    }
    val got = SimilarityOps.queries("emb_kmeans")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (c, (n, moved, inertia)) =>
      val (gn, gm, gi) = got(c)
      assert(gn == n && gm == moved, s"cluster $c counts")
      assert(math.abs(gi - inertia) < 1e-6, s"cluster $c inertia")
    }
    assert(got.values.map(_._1).sum == vecs.size, "every vector clustered once")
  }

  test("emb_pq_error matches a driver-side subspace-quantization reference") {
    val seeds = vecs.filter(_._1 < 4).sortBy(_._1)
    val ref = (for {
      (id, v) <- vecs
      m <- 1 to 8
      sub = v.slice((m - 1) * 8, m * 8)
      cb = seeds.map { case (c, sv) => (c, sv.slice((m - 1) * 8, m * 8)) }
      (code, d) = argmin(cb, sub)
    } yield ((m.toLong, code), d))
      .groupBy(_._1).map { case (k, g) =>
        k -> ((g.size.toLong, r6(g.map(_._2).sum / g.size)))
      }
    val got = SimilarityOps.queries("emb_pq_error")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (k, (n, mse)) =>
      assert(got(k)._1 == n, s"subspace/code $k count")
      assert(math.abs(got(k)._2 - mse) < 1e-6, s"subspace/code $k mse")
    }
    assert(got.values.map(_._1).sum == vecs.size * 8L,
      "every subvector coded exactly once")
  }
}
