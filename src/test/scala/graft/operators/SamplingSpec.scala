package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSample is deterministic and roughly proportional") {
    val n = docs.count()
    val s1 = Sampling.hashSample(docs, "text", 0.3)
    val s2 = Sampling.hashSample(docs, "text", 0.3)
    assert(s1.count() == s2.count())
    val frac = s1.count().toDouble / n
    assert(frac > 0.15 && frac < 0.45, s"fraction $frac far from 0.3")
    // monotone: a larger fraction is a superset
    val small = Sampling.hashSample(docs, "text", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(docs, "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("quotaPerGroup caps each group deterministically") {
    val q = Sampling.quotaPerGroup(docs, "lang", "text", 5, tieCol = "doc_id")
    val counts = q.groupBy("lang").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 5))
    val again = Sampling.quotaPerGroup(docs.repartition(7), "lang", "text", 5, tieCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(q.select("doc_id").collect().map(_.getLong(0)).sorted.sameElements(again))
  }

  test("quotaPerGroup is deterministic even with duplicate key values") {
    import spark.implicits._
    // duplicate text across distinct ids: the tie column must decide
    val dup = (1 to 20).map(i => (i.toLong, "g", "same text")).toDF("id", "grp", "txt")
    val a = Sampling.quotaPerGroup(dup.repartition(3), "grp", "txt", 4, tieCol = "id")
      .select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.quotaPerGroup(dup.repartition(9), "grp", "txt", 4, tieCol = "id")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("HeavyHitters honors the MG guarantee on a skewed stream") {
    import spark.implicits._
    // zipf-ish: "hot0" 500x, "hot1" 300x, "hot2" 200x, 500 singletons
    val items = (Seq.fill(500)("hot0") ++ Seq.fill(300)("hot1") ++
      Seq.fill(200)("hot2") ++ (1 to 500).map(i => s"cold$i"))
    val n = items.size.toLong // 1500
    val k = 10
    def run(parts: Int): Map[String, Long] = {
      val hh = new Sampling.HeavyHitters(k)
      items.toDF("v").repartition(parts).as[String]
        .select(hh.toColumn.name("hh")).collect()(0).toMap
    }
    Seq(2, 7).foreach { parts =>
      val est = run(parts)
      assert(est.size <= k)
      // every item with true count > n/(k+1) ≈ 136 must be present
      assert(Set("hot0", "hot1", "hot2").subsetOf(est.keySet), s"missing hitter: $est")
      // estimates are lower bounds within n/(k+1)
      val truth = Map("hot0" -> 500L, "hot1" -> 300L, "hot2" -> 200L)
      truth.foreach { case (i, t) =>
        assert(est(i) <= t && t - est(i) <= n / (k + 1), s"$i est=${est(i)} true=$t")
      }
    }
  }

  test("ReservoirSampler aggregates k values, merge-order independent") {
    import spark.implicits._
    val sampler = new Sampling.ReservoirSampler(3)
    val data = (1 to 100).map(i => ("g" + (i % 2), s"val$i")).toDF("g", "v")
    def run(parts: Int) = data.repartition(parts).as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(sampler.toColumn.name("sample"))
      .collect().map { case (g, s) => g -> s.sorted.toList }.toMap
    val a = run(2)
    val b = run(7) // different partitioning → different merge order
    assert(a == b, "reservoir result depends on merge order")
    assert(a.values.forall(_.size == 3))
  }

  test("ReservoirSampler survives colliding priorities (value tiebreak)") {
    import spark.implicits._
    // equal 31-base string hashes ("Aa" vs "BB") → equal scrambled
    // priorities; the value tiebreak must keep the result total-ordered
    val sampler = new Sampling.ReservoirSampler(1)
    val data = Seq(("g", "Aa"), ("g", "BB"))
    def run(order: Seq[(String, String)], parts: Int) =
      order.toDF("g", "v").repartition(parts).as[(String, String)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(sampler.toColumn.name("sample"))
        .collect().head._2.toList
    assert(run(data, 1) == run(data.reverse, 2))
  }
}
