package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r12 cross-engine rounding-tie class, pinned by construction: a
  * product of two 6dp values has EXACTLY 12 fractional digits, so
  * `round(x*y, 6)` faces systematic digit-7 ties of exactly 5 — which
  * Spark (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB
  * (float-domain) resolve differently. That mechanism produced the only
  * driver-vs-local correctness split in 12 rounds (text_heaps_law,
  * VERDICT r12 "What's wrong #1"). The fix — ×10⁶ BIGINT moments with
  * exact integer products, one closed-form double division — is probed
  * here on a DELIBERATE half-ulp corpus: every x·y lands exactly on a
  * .xxxxxx5 tie, the worst case the fixture would only hit by luck.
  */
class RoundingTieSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Tie corpus: x·y = k + 0.0000005 exactly (digit-7 tie), plus benign
    * pairs so the OLS is well-conditioned. All values are exact 6dp. */
  private val tiePairs = Seq(
    (0.5, 1.000001), // 0.5000005
    (1.5, 3.000001), // 4.5000015
    (2.5, 5.000001), // 12.5000025
    (3.5, 7.000001), // 24.5000035
    (4.5, 9.000001), // 40.5000045
    (0.5, 9.000001), // 4.5000005
    (1.230005, 2.5), // 3.0750125
    (7.5, 11.000001)) // 82.5000075
  private val benign = Seq((1.1, 2.2), (3.3, 4.4), (5.5, 6.6))

  private def exactScaled(v: Double): Long =
    (BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      * BigDecimal(1000000)).toLongExact

  test("every tie pair really is a digit-7 tie of the 12-digit product") {
    tiePairs.foreach { case (x, y) =>
      val p = BigDecimal(exactScaled(x)) * BigDecimal(exactScaled(y)) // 1e-12 units
      assert(p % BigDecimal(1000000) == BigDecimal(500000) ||
        p % BigDecimal(10000000) % BigDecimal(1000000) == BigDecimal(500000),
        s"($x,$y) product ${p}e-12 is not a crafted tie")
    }
  }

  test("integer-moment OLS beta is exact on the half-ulp probe corpus") {
    import spark.implicits._
    val df = (tiePairs ++ benign).toDF("x", "y")
    // the text_heaps_law / text_zipf_slope fit, expression for expression
    def i6(c: org.apache.spark.sql.Column) =
      (round(c, 6).cast("decimal(18,6)") * lit(1000000)).cast("long")
    val got = df.select(i6(col("x")).as("x6"), i6(col("y")).as("y6"))
      .agg(count(lit(1)).as("n"),
        sum(col("x6")).as("sx6"), sum(col("y6")).as("sy6"),
        sum(col("x6") * col("y6")).as("sxy12"),
        sum(col("x6") * col("x6")).as("sx212"))
      .select(round(
        (col("n") * col("sxy12") - col("sx6") * col("sy6")).cast("double") /
        (col("n") * col("sx212") - col("sx6") * col("sx6")).cast("double"), 6)
        .as("beta"))
      .head().getDouble(0)
    // independent exact-rational reference
    val pts = (tiePairs ++ benign).map { case (x, y) =>
      (BigInt(exactScaled(x)), BigInt(exactScaled(y))) }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sx2 = pts.map(p => p._1 * p._1).sum
    val ref = BigDecimal((n * sxy - sx * sy).toDouble / (n * sx2 - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ref, s"beta $got != exact-rational $ref")
  }

  test("the probe corpus would have broken the old round(x*y,6) discipline") {
    // under HALF_UP every tie rounds UP; a float-domain engine rounds at
    // least one of them DOWN — so the old sxy would differ cross-engine.
    // Here: show the rounded-product sum differs from the exact-product
    // sum by a nonzero multiple of the tie quantum, i.e. the ties are
    // genuinely load-bearing in sxy (not absorbed).
    val exact = tiePairs.map { case (x, y) =>
      BigDecimal(exactScaled(x)) * BigDecimal(exactScaled(y)) }.sum // 1e-12
    val halfUp = tiePairs.map { case (x, y) =>
      (BigDecimal(exactScaled(x)) * BigDecimal(exactScaled(y)) / BigDecimal(1000000))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000) }.sum
    val floorTies = tiePairs.map { case (x, y) =>
      (BigDecimal(exactScaled(x)) * BigDecimal(exactScaled(y)) / BigDecimal(1000000))
        .setScale(0, BigDecimal.RoundingMode.FLOOR) * BigDecimal(1000000) }.sum
    assert(halfUp - floorTies == BigDecimal(500000) * 2 * tiePairs.size,
      "each tie pair must contribute a full half-quantum disagreement")
    assert(halfUp != exact && floorTies != exact)
  }

  test("DetMean.prod12 carries the exact 12-digit product (no rounding)") {
    import spark.implicits._
    val df = tiePairs.toDF("x", "y")
    val got = df.select(sum(DetMean.prod12(col("x"), col("y"))).as("s"))
      .head().getDecimal(0)
    val ref = tiePairs.map { case (x, y) =>
      (BigDecimal(exactScaled(x)) * BigDecimal(exactScaled(y))) }.sum /
      BigDecimal("1e12")
    assert(BigDecimal(got) == ref, s"prod12 sum $got != exact $ref")
  }
}
