package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkFixture}

/** Structural guarantees of the ExactSubstr pass (`dedup_substring` /
  * `dedup_substring_cut`) beyond the DuckDB hash gates: planted-offset
  * exactness on a crafted corpus, and char conservation on the fixture
  * (every cut doc's kept + covered chars must equal its original
  * length — the invariant the interval complement algebra promises). */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val fixtureDir = "/root/testdata/sf0.001"

  /** Land a crafted documents table in a temp dir the black-box query
    * API can read (same columns as the fixture). */
  private def landDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("substrdocs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted shared block is found at its exact offsets and cut cleanly") {
    // 60 shared chars inside otherwise-unique docs: every 40-gram of the
    // block is cross-doc duplicated, nothing else is. Doc A carries it
    // at offset 20 (1-based 21), doc B at offset 0; doc C has no dup.
    val block = "THE-QUICK-BROWN-FOX-JUMPS-OVER-THE-LAZY-DOG-0123456789-ABCDE" // 60 chars
    assert(block.length == 60)
    val a = "aaaaaaaaaabbbbbbbbbb" + block + "cccccccccceeeeeeeeee"
    val b = block + "zzzzzzzzzzyyyyyyyyyyxxxxxxxxxxwwwwwwwwww"
    val c = "unique text with no repeated forty-char gram anywhere at all in it"
    val dir = landDocs(Seq((1L, a, "s1"), (2L, b, "s2"), (3L, c, "s3")))

    val rep = SparkEntry.queries("dedup_substring")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one merged span per affected doc, covering exactly the 60 block chars
    assert(rep.toSet == Set(("s1", 1L, 1L, 60L), ("s2", 1L, 1L, 60L)))

    val cut = SparkEntry.queries("dedup_substring_cut")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expectA = "aaaaaaaaaabbbbbbbbbb" + "cccccccccceeeeeeeeee"
    val expectB = "zzzzzzzzzzyyyyyyyyyyxxxxxxxxxxwwwwwwwwww"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(cut.toSet == Set(
      (1L, expectA.length.toLong, md5hex(expectA)),
      (2L, expectB.length.toLong, md5hex(expectB))))
  }

  test("fixture conservation: kept chars + span coverage = original length, per doc") {
    val spans = DedupOps.dupSpans(Tables.documents(spark, fixtureDir))
      .groupBy(col("doc_id")).agg(sum(col("en") - col("st")).as("covered"))
    val cut = SparkEntry.queries("dedup_substring_cut")(spark, fixtureDir)
      .select(col("doc_id"), col("kept_chars"))
    val bad = cut.join(spans, Seq("doc_id"))
      .join(Tables.documents(spark, fixtureDir).select(col("doc_id"),
        length(col("text")).cast("long").as("len")), Seq("doc_id"))
      .filter(col("kept_chars") + col("covered") =!= col("len"))
    assert(bad.count() == 0)
    // and the cut table is exactly the affected-doc set
    assert(cut.count() == spans.count() && cut.count() > 0)
  }
}
