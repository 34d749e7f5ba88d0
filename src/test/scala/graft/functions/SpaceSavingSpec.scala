package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** SpaceSaving aggregate: exact-regime determinism (what the DuckDB
  * oracle pins corpus-wide via text_topk_spacesaving) plus the
  * APPROXIMATE regime's guarantees, which no oracle can hash-gate:
  * per-item count bounds and heavy-hitter containment under eviction
  * and under merges of differently-partitioned streams.
  */
class SpaceSavingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Run spacesaving over `items` with the given partitioning. */
  private def run(items: Seq[String], cap: Int, k: Int, parts: Int) =
    items.toDF("w").repartition(parts)
      .agg(GraftAggregates.spacesavingTopK(col("w"), cap, k).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.token"), col("e.cnt"), col("e.err"))
      .as[(String, Long, Long)].collect().toSeq

  // zipf-ish skew: item i appears 2^(9-i) times, i = 0..9
  private val skewed: Seq[String] =
    (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"t$i"))
  private val truth: Map[String, Long] =
    skewed.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact regime: capacity >= distinct is identical to exact counts, any partitioning") {
    val exact = truth.toSeq.sortBy { case (t, c) => (-c, t) }.map { case (t, c) => (t, c, 0L) }
    for (parts <- Seq(1, 2, 7)) {
      assert(run(skewed, cap = 16, k = 16, parts = parts) == exact,
        s"parts=$parts diverged from exact counts")
    }
  }

  test("single-partition approximate regime: classic SpaceSaving bounds") {
    val out = run(new scala.util.Random(42).shuffle(skewed), cap = 4, k = 4, parts = 1)
    assert(out.size == 4)
    // total counted mass of a full single-stream summary == stream length
    assert(out.map(_._2).sum == skewed.size)
    out.foreach { case (t, cnt, err) =>
      val tru = truth.getOrElse(t, 0L)
      assert(cnt >= tru, s"$t undercounted: $cnt < $tru")
      assert(cnt - err <= tru, s"$t lower bound broken: $cnt - $err > $tru")
    }
    // t0 holds half the stream — it MUST be tracked, at full true mass
    assert(out.exists { case (t, cnt, _) => t == "t0" && cnt >= truth("t0") })
  }

  test("merged approximate regime keeps overestimate + containment invariants") {
    for (parts <- Seq(2, 5)) {
      val out = run(skewed, cap = 4, k = 4, parts = parts)
      out.foreach { case (t, cnt, err) =>
        val tru = truth.getOrElse(t, 0L)
        assert(cnt >= tru, s"parts=$parts $t undercounted")
        assert(cnt - err <= tru, s"parts=$parts $t guaranteed-mass above truth")
      }
      // the majority item survives any merge order
      assert(out.exists(_._1 == "t0"), s"parts=$parts lost the majority item")
    }
  }

  test("nulls are skipped; SQL registration resolves via extensions") {
    val out = spark.sql(
      """SELECT e.token, e.cnt FROM (
        |  SELECT explode(spacesaving_topk(w, 8, 2)) AS e
        |  FROM VALUES ('a'),('a'),(CAST(NULL AS STRING)),('b') AS t(w))
        |ORDER BY e.cnt DESC, e.token""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 2L), ("b", 1L)))
  }

  test("serialize/deserialize round-trips a partial summary") {
    val agg = SpaceSavingTopK(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4, 4)
    val b = agg.createAggregationBuffer()
    b.update("a", (5L, 1L)); b.update("b", (2L, 0L))
    val back = agg.deserialize(agg.serialize(b))
    assert(back == b)
  }
}
