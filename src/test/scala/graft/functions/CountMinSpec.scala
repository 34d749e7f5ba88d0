package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Count-Min aggregate: the three properties that make it a legal
  * shuffle summary — never under-counts, merges are EXACT element-wise
  * sums (bit-identical sketch under any partitioning, unlike
  * SpaceSaving's floor-charged merge), and the ε-N over-count envelope.
  * Plus the gate contract `text_cms_gate` rides on: estimate ≥ true
  * means a threshold scan over the sketch keeps every true heavy
  * hitter.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def sketch(items: Seq[String], depth: Int, width: Int, parts: Int): Array[Long] =
    items.toDF("w").repartition(parts)
      .agg(CountMin.column(col("w"), depth, width).as("cm"))
      .head.getSeq[Long](0).toArray

  // zipf-ish skew: item i appears 2^(9-i) times, i = 0..9
  private val skewed: Seq[String] =
    (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"t$i"))
  private val truth: Map[String, Long] =
    skewed.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("estimates never under-count, any partitioning") {
    for (parts <- Seq(1, 2, 7)) {
      val sk = sketch(skewed, depth = 4, width = 64, parts = parts)
      truth.foreach { case (t, c) =>
        assert(CountMin.estimate(sk, 4, 64, t) >= c,
          s"parts=$parts $t under-counted")
      }
    }
  }

  test("merge is exact: sketch is bit-identical under any partitioning") {
    val single = sketch(skewed, depth = 4, width = 64, parts = 1)
    for (parts <- Seq(2, 5, 7)) {
      assert(sketch(skewed, depth = 4, width = 64, parts = parts)
        .sameElements(single), s"parts=$parts sketch diverged")
    }
  }

  test("row sums recover the stream length") {
    val sk = sketch(skewed, depth = 4, width = 64, parts = 3)
    assert(CountMin.total(sk, 64) == skewed.size)
    // every row sums to N, not just row 0
    (0 until 4).foreach { r =>
      assert(sk.slice(r * 64, (r + 1) * 64).sum == skewed.size.toLong)
    }
  }

  test("wide-sketch regime is exact; narrow sketch stays within the additive envelope") {
    // width 64 >= 10 distinct with double hashing: expect exact here
    val wide = sketch(skewed, depth = 4, width = 64, parts = 2)
    truth.foreach { case (t, c) =>
      assert(CountMin.estimate(wide, 4, 64, t) == c, s"$t inexact in wide sketch")
    }
    // width 4 forces collisions: over-count only, bounded by N
    val narrow = sketch(skewed, depth = 3, width = 4, parts = 2)
    val n = skewed.size.toLong
    truth.foreach { case (t, c) =>
      val e = CountMin.estimate(narrow, 3, 4, t)
      assert(e >= c && e <= n, s"$t estimate $e outside [$c, $n]")
    }
  }

  test("threshold gate keeps every true heavy hitter (the text_cms_gate contract)") {
    val sk = sketch(skewed, depth = 3, width = 4, parts = 3) // worst case: heavy collisions
    val thresholdN = 16L // true heavy hitters: count >= 16 (t0..t5)
    val trueHeavy = truth.filter(_._2 >= thresholdN).keySet
    val gated = truth.keySet.filter(t => CountMin.estimate(sk, 3, 4, t) >= thresholdN)
    assert(trueHeavy.subsetOf(gated),
      s"gate dropped ${trueHeavy -- gated} — overestimate guarantee broken")
  }

  test("q_joinsize_cm: both inner-product estimates overestimate within bound (sf0.001)") {
    // the CM inner product is ≥ the true join size ALWAYS (collisions
    // only add mass), and at fixture scale the collision term
    // |A|·|B|/width is tiny relative to the true size, so the q-error
    // pins near 1. The width-scaling law (error ∝ |A|·|B|/width) is
    // the documented knob — this test is the fixed-point evidence.
    val r = graft.SparkEntry.queries("q_joinsize_cm")(
      spark, "/root/testdata/sf0.001").head
    val fkExact = r.getAs[Long]("fk_exact"); val fkEst = r.getAs[Long]("fk_est")
    val sjExact = r.getAs[Long]("sj_exact"); val sjEst = r.getAs[Long]("sj_est")
    assert(fkEst >= fkExact, s"FK arm under-counted: $fkEst < $fkExact")
    assert(sjEst >= sjExact, s"self-join arm under-counted: $sjEst < $sjExact")
    assert(fkEst <= fkExact * 1.05, s"FK q-error ${fkEst.toDouble / fkExact}")
    assert(sjEst <= sjExact * 1.05, s"F2 q-error ${sjEst.toDouble / sjExact}")
    // PK-FK ground truth: every order matches exactly one customer
    assert(fkExact == r.getAs[Long]("n_orders"))
  }

  test("nulls are skipped; SQL registration resolves via extensions") {
    val sk = spark.sql(
      """SELECT count_min(w, 2, 8) AS cm FROM (
        |  SELECT CASE WHEN id % 3 = 0 THEN NULL ELSE 'x' END AS w
        |  FROM range(9))""".stripMargin)
      .head.getSeq[Long](0).toArray
    assert(CountMin.total(sk, 8) == 6) // 3 nulls of 9 skipped
    assert(CountMin.estimate(sk, 2, 8, "x") == 6)
  }
}
