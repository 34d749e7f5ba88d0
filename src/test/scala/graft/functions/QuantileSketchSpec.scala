package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** SketchQuantiles aggregate: exact-regime determinism (what the DuckDB
  * oracle pins corpus-wide via q_quantile_sketch) plus the APPROXIMATE
  * regime's invariants, which no oracle can hash-gate: weight/envelope
  * preservation and bounded rank error under compaction and under merges
  * of differently-partitioned streams.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  private def run(xs: Seq[Double], cap: Int, parts: Int): Seq[(Double, Double)] =
    xs.toDF("x").repartition(parts)
      .agg(SketchQuantiles.column(col("x"), cap, probs).as("qs"))
      .select(explode(col("qs")).as("r"))
      .select(col("r.prob"), col("r.q"))
      .as[(Double, Double)].collect().toSeq

  /** quantile_cont semantics: rank p*(n-1), linear interpolation. */
  private def exactQ(sorted: IndexedSeq[Double], p: Double): Double = {
    val r = p * (sorted.size - 1)
    val k = math.floor(r).toInt
    val frac = r - k
    if (frac == 0.0) sorted(k)
    else sorted(k) + (sorted(k + 1) - sorted(k)) * frac
  }

  test("exact regime: capacity >= distinct reproduces quantile_cont under any partitioning") {
    // 50 distinct values with skewed multiplicities
    val xs = (1 to 50).flatMap(i => Seq.fill(1 + i % 7)(i.toDouble))
    val sorted = xs.sorted.toIndexedSeq
    val want = probs.map(p => p -> exactQ(sorted, p))
    for (parts <- Seq(1, 3, 8)) {
      val got = run(new scala.util.Random(7).shuffle(xs), cap = 64, parts = parts)
      got.zip(want).foreach { case ((gp, gq), (wp, wq)) =>
        assert(gp == wp)
        assert(math.abs(gq - wq) < 1e-12, s"parts=$parts p=$wp: $gq vs $wq")
      }
    }
  }

  test("approximate regime: weight and envelope preserved, rank error bounded") {
    val n = 2000
    val xs = new scala.util.Random(11).shuffle((1 to n).map(_.toDouble))
    val sorted = xs.sorted.toIndexedSeq
    for (parts <- Seq(1, 4)) {
      val got = run(xs, cap = 32, parts = parts)
      got.foreach { case (p, q) =>
        // estimate stays inside the data envelope
        assert(q >= sorted.head && q <= sorted.last, s"p=$p q=$q out of range")
        // rank error: the estimate's true rank is within 10% of target
        // (empirical bound for the closest-pair-merge histogram at
        // cap=32 on uniform data; the sketch has no adversarial worst-
        // case guarantee — this pins the practical regime)
        val trueRank = sorted.count(_ <= q).toDouble / n
        assert(math.abs(trueRank - p) < 0.10,
          s"parts=$parts p=$p: estimate $q has true rank $trueRank")
      }
    }
  }

  test("sql registration: sketch_quantiles resolves via extensions") {
    (1 to 100).map(_.toDouble).toDF("x").createOrReplaceTempView("qs_in")
    val out = spark.sql(
      """SELECT r.q FROM (
        |  SELECT explode(sketch_quantiles(x, 128, 0.5)) AS r FROM qs_in)""".stripMargin)
      .as[Double].collect()
    assert(out.toSeq == Seq(50.5))
  }

  test("sql registration: non-double columns coerce at analysis (int/float/decimal)") {
    // ImplicitCastInputTypes: these used to ClassCastException per-row
    // mid-job; now a Cast lands during resolution
    (1 to 100).toDF("x").createOrReplaceTempView("qs_int")
    (1 to 100).map(_.toFloat).toDF("x").createOrReplaceTempView("qs_float")
    (1 to 100).map(i => BigDecimal(i)).toDF("x").createOrReplaceTempView("qs_dec")
    for (v <- Seq("qs_int", "qs_float", "qs_dec")) {
      val out = spark.sql(
        s"""SELECT r.q FROM (
           |  SELECT explode(sketch_quantiles(x, 128, 0.5)) AS r FROM $v)""".stripMargin)
        .as[Double].collect()
      assert(out.toSeq == Seq(50.5), v)
    }
  }

  test("q-error vs exact at sf0.1: deep-approximate regime stays within 1% on a real column") {
    // l_extendedprice at sf0.1: ~hundreds of thousands of distinct
    // doubles into a 64-bin histogram — capacity/distinct < 0.1%, the
    // regime the oracle can't replay (compaction order is partition-
    // dependent), so quality is pinned HERE: multiplicative q-error
    // per quantile against Spark's exact percentile
    val li = graft.operators.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_extendedprice").cast("double").as("x"))
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    val sk = li.agg(SketchQuantiles.column(col("x"), 64, probs).as("qs"))
      .select(explode(col("qs")).as("r"))
      .select(col("r.prob"), col("r.q")).as[(Double, Double)].collect().toMap
    val exact = li.agg(expr(
        s"percentile(x, array(${probs.mkString(", ")}))").as("e"))
      .select(posexplode(col("e"))).as[(Int, Double)].collect()
      .map { case (i, v) => probs(i) -> v }.toMap
    probs.foreach { p =>
      val (a, e) = (sk(p), exact(p))
      val qerr = math.max(a / e, e / a)
      info(f"p=$p%.2f exact=$e%.2f sketch=$a%.2f q-error=$qerr%.5f")
      assert(qerr < 1.01, f"q-error $qerr%.5f at p=$p (exact $e, sketch $a)")
    }
  }

  test("empty and null inputs") {
    val out = Seq.empty[Double].toDF("x")
      .agg(SketchQuantiles.column(col("x"), 8, Seq(0.5)).as("qs"))
      .select(size(col("qs"))).as[Int].collect()
    assert(out.toSeq == Seq(0))
    val withNulls = Seq(Some(1.0), None, Some(3.0)).toDF("x")
      .agg(SketchQuantiles.column(col("x"), 8, Seq(0.5)).as("qs"))
      .select(explode(col("qs")).as("r")).select(col("r.q"))
      .as[Double].collect()
    assert(withNulls.toSeq == Seq(2.0))
  }
}
