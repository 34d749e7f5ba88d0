package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan, StringStartsWith}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class DocGenSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def gen(rows: Long = 1000, parts: Int = 7, seed: Long = 42) =
    spark.read.format("graft-docgen")
      .option("rows", rows).option("numPartitions", parts).option("seed", seed)
      .load()

  test("generates the requested row count with unique ids across partitions") {
    val df = gen()
    assert(df.count() == 1000)
    assert(df.select("doc_id").distinct().count() == 1000)
    assert(df.rdd.getNumPartitions == 7)
  }

  test("deterministic across partition counts and re-reads") {
    val a = gen(rows = 200, parts = 3).orderBy("doc_id").collect()
    val b = gen(rows = 200, parts = 11).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    // different seed -> different corpus
    val c = gen(rows = 200, parts = 3, seed = 7).orderBy("doc_id").collect()
    assert(a.toSeq != c.toSeq)
  }

  test("n_chars matches text length and lang/source stay in domain") {
    val rows = gen(rows = 100).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chars") == r.getAs[String]("text").length)
      assert(Set("de", "en", "es", "fr", "zh")(r.getAs[String]("lang")))
      assert(r.getAs[String]("source").startsWith("src"))
    }
  }

  test("doc_id range predicates are pushed and narrow the generated range") {
    val b = new DocGenScanBuilder(1000000L, 4, 42L)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("doc_id", 100L), LessThan("doc_id", 200L),
      EqualTo("lang", "en")))
    // lang predicate is NOT absorbed — returned to Spark as residual
    assert(residual.toSeq == Seq(EqualTo("lang", "en")))
    assert(b.pushedFilters().length == 2)
    assert(b.lo == 100L && b.hi == 200L)
    // a contradictory range collapses to empty, not negative
    val b2 = new DocGenScanBuilder(1000L, 4, 42L)
    b2.pushFilters(Array(GreaterThanOrEqual("doc_id", 500L), LessThan("doc_id", 10L)))
    assert(b2.build().asInstanceOf[DocGenScan].planInputPartitions()
      .map(_.asInstanceOf[DocGenPartition]).forall(p => p.start >= p.end))
    // unknown filter types are rejected wholesale
    val b3 = new DocGenScanBuilder(1000L, 4, 42L)
    val res3 = b3.pushFilters(Array(StringStartsWith("text", "key")))
    assert(res3.length == 1 && b3.pushedFilters().isEmpty)
  }

  test("end-to-end: pushed range filter returns exactly the slice") {
    val df = gen(rows = 100000, parts = 8)
      .filter(col("doc_id") >= 1000 && col("doc_id") < 1100)
    assert(df.count() == 100)
    assert(df.agg(min("doc_id"), max("doc_id")).collect()(0).toSeq == Seq(1000L, 1099L))
    // the scan itself carries the pushed range (visible in explain)
    val scan = df.queryExecution.executedPlan.collectFirst { case s: BatchScanExec => s }
    assert(scan.isDefined)
    assert(scan.get.scan.description().contains("range=[1000,1100)"),
      scan.get.scan.description())
  }

  test("column pruning reaches the scan: metadata-only read skips text") {
    val df = gen(rows = 500).select("lang")
    val scan = df.queryExecution.executedPlan.collectFirst { case s: BatchScanExec => s }
    assert(scan.get.scan.readSchema().fieldNames.toSeq == Seq("lang"))
    assert(df.groupBy("lang").count().count() == 5)
    // n_chars still forces text generation (derived column) and agrees
    // with a full-width read
    val n1 = gen(rows = 300).select(sum("n_chars")).collect()(0).getLong(0)
    val n2 = gen(rows = 300).select(sum(length(col("text")))).collect()(0).getLong(0)
    assert(n1 == n2)
  }

  test("limit pushdown truncates generation; statistics reflect pushdown") {
    // pushLimit is fully absorbed: a LIMIT over a trillion-row generator
    // plans only `limit` ids
    val b = new DocGenScanBuilder(1000000000000L, 4, 42L)
    assert(b.pushLimit(100))
    val scan = b.build().asInstanceOf[DocGenScan]
    assert(scan.estimateStatistics().numRows().getAsLong == 100L)
    val parts = scan.planInputPartitions().map(_.asInstanceOf[DocGenPartition])
    assert(parts.map(p => p.end - p.start).sum == 100L)
    // e2e: limit over the format runs without generating the full range
    val ltd = spark.read.format("graft-docgen")
      .option("rows", 100000000L).option("numPartitions", 4).load()
      .limit(50)
    assert(ltd.count() == 50)
    // stats shrink when text is pruned (planner sees pruned width)
    val b2 = new DocGenScanBuilder(1000L, 4, 42L)
    b2.pruneColumns(org.apache.spark.sql.types.StructType(
      DocGen.schema.filter(_.name == "lang")))
    val slim = b2.build().asInstanceOf[DocGenScan].estimateStatistics().sizeInBytes().getAsLong
    val full = new DocGenScanBuilder(1000L, 4, 42L).build()
      .asInstanceOf[DocGenScan].estimateStatistics().sizeInBytes().getAsLong
    assert(slim < full / 10, s"pruned stats $slim not smaller than full $full")
  }

  test("generated corpus feeds the dedup/text pipeline") {
    val docs = gen(rows = 300, parts = 5)
    val cands = graft.operators.DedupLib.minhashCandidates(docs, "doc_id", "text")
    cands.count() // shape-compatible: runs end to end
    val q = docs.select(avg(graft.operators.TextOps.qualityScore(col("text"))))
      .collect()(0).getDouble(0)
    assert(q > 0.0 && q <= 1.0)
  }
}
