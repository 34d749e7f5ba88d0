package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The NGrams generator vs the composable explode(transform(...)) form
  * it replaces — identical output contract, plus SQL registration and
  * the explode-style null/short-input semantics. */
class GeneratorsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docs = {
    import spark.implicits._
    Seq("a b c d", "x y", "one", "", "a b c").toDF("text")
  }

  test("ngrams matches the composable split-based formulation") {
    val viaGen = docs
      .select(TextGenerators.ngrams(col("text"), 2).as("gram"))
      .collect().map(_.getString(0)).sorted
    val viaSplit = docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))).as("gram"))
      .collect().map(_.getString(0)).sorted
    assert(viaGen.sameElements(viaSplit), s"${viaGen.toSeq} vs ${viaSplit.toSeq}")
    assert(viaGen.contains("a b") && viaGen.length == 6)
  }

  test("short and null inputs yield zero rows; n=1 yields the words") {
    import spark.implicits._
    val withNull = Seq(Some("a b"), None).toDF("text")
    assert(withNull.select(TextGenerators.ngrams(col("text"), 3).as("g")).count() == 0)
    assert(docs.filter(col("text") === "one")
      .select(TextGenerators.ngrams(col("text"), 1).as("g"))
      .collect().map(_.getString(0)).toSeq == Seq("one"))
  }

  test("property: gram count and content match the slice contract for any input") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""))
    val prop = Prop.forAll(Gen.nonEmptyListOf(word), Gen.choose(1, 5)) {
      (words: List[String], k: Int) =>
        val text = words.mkString(" ")
        val out = NGrams(Literal(text), Literal(k)).eval(null)
          .iterator.map(_.getString(0)).toList
        val expected =
          if (words.length < k) Nil
          else (0 to words.length - k).map(i => words.slice(i, i + k).mkString(" ")).toList
        out == expected
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("SQL registration: SELECT ngrams(text, 2) works; plan shows the custom generator") {
    TextGenerators.register(spark)
    docs.createOrReplaceTempView("gen_docs")
    val out = spark.sql("SELECT ngrams(text, 2) AS gram FROM gen_docs")
    assert(out.count() == 6)
    assert(out.queryExecution.executedPlan.toString.contains("ngrams"),
      out.queryExecution.executedPlan.toString)
  }
}
