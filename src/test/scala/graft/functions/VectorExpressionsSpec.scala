package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.operators.VectorOps

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.0, 0.0), Seq(0.0, 0.0)), // zero norm
      (3L, Seq(-1.0, 1.0), Seq(1.0, -1.0)))
      .toDF("id", "a", "b")
  }

  test("cosine_sim / vec_dot bit-match the higher-order-function fold") {
    val df = vecs
      .withColumn("dot_hof", VectorOps.dot(col("a"), col("b")))
      .withColumn("dot_native", VectorFunctions.vec_dot(col("a"), col("b")))
      .withColumn("cos_native", VectorFunctions.cosine_sim(col("a"), col("b")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("dot_hof")) == r.getDouble(r.fieldIndex("dot_native")))
    }
    val cos1 = rows.find(_.getLong(0) == 1L).get.getDouble(5)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(cos1 == expected) // same left-to-right accumulation
    assert(rows.find(_.getLong(0) == 2L).get.getDouble(5) == 0.0) // zero-norm guard
    // -2/(sqrt(2)*sqrt(2)): fp denominator is 2.0000000000000004
    assert(rows.find(_.getLong(0) == 3L).get.getDouble(5) ==
      -2.0 / (math.sqrt(2.0) * math.sqrt(2.0)))
  }

  test("null inputs yield null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(VectorFunctions.cosine_sim(col("a"), col("b")).as("c"))
    assert(df.head().isNullAt(0))
  }

  test("SparkSessionExtensions injection: functions resolve with no register() call") {
    // the fixture session is built with spark.sql.extensions=GraftExtensions
    vecs.createOrReplaceTempView("vecs_ext")
    val r = spark.sql("SELECT vec_dot(a, b) FROM vecs_ext WHERE id = 1").head()
    assert(r.getDouble(0) == 32.0)
  }

  test("SQL registration: SELECT cosine_sim(...) works after register()") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_t")
    val out = spark.sql(
      "SELECT id, cosine_sim(a, b) AS c, vec_dot(a, b) AS d FROM vecs_t ORDER BY id")
      .collect()
    assert(out(0).getDouble(2) == 32.0)
    assert(out(2).getDouble(1) == -2.0 / (math.sqrt(2.0) * math.sqrt(2.0)))
  }

  test("expression participates in whole-stage codegen") {
    // a parquet scan forces real execution (local relations constant-fold)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
    val df = e.select(VectorFunctions.cosine_sim(col("v"), col("v")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen stage:\n$plan") // WholeStageCodegen marker
    // and the generated code actually compiles + runs (no interpreted fallback)
    assert(df.filter(col("c") > 0.999999).count() == df.count())
  }

  test("matches oracle-grade rounded cosine on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
    val both = e.limit(50)
      .withColumn("hof", round(VectorOps.dot(col("v"), col("v")) /
        (sqrt(VectorOps.dot(col("v"), col("v"))) * sqrt(VectorOps.dot(col("v"), col("v")))), 6))
      .withColumn("native", round(VectorFunctions.cosine_sim(col("v"), col("v")), 6))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
  }
}
