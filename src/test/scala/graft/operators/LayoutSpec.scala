package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("saltedJoin equals plain join on a skewed key") {
    import spark.implicits._
    // hot key: 9000 of 10000 rows share key 1
    val big = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (9500L, "cold"), (9999L, "cold2"))
      .toDF("k", "label")
    val plain = big.join(small, "k")
    val salted = Layout.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "payload", "label").collect().map(_.toSeq).toSet
    val b = salted.select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("skewReport surfaces the hot key first") {
    val big = spark.range(1000)
      .select(when(col("id") < 900, 1L).otherwise(col("id")).as("k"))
    val top = Layout.skewReport(big, "k", topN = 1).head()
    assert(top.getLong(0) == 1L && top.getLong(1) == 900L)
  }

  test("bucketed write round-trips and joins without exchange on the bucket key") {
    val df = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    Layout.writeBucketed(df, "graft_bucketed_t", "k", buckets = 4)
    try {
      val t = spark.table("graft_bucketed_t")
      assert(t.count() == 100)
      // self-join on the bucket key: both sides read pre-bucketed data;
      // plan shows no shuffle Exchange feeding the join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = t.as("x").join(t.as("y"), "k")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_t")
  }
}
