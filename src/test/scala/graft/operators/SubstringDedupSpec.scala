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

  test("winnowed spans: containment in stride-1 truth on the fixture") {
    // winnowed hits are a subset of stride-1 hits (a gram selected by ≥2
    // docs occurs in ≥2 docs), so every winnowed span must sit inside a
    // stride-1 span of the same doc — the exactness boundary the seeded
    // variant promises
    def spansOf(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("doc_id", "cast(st as long) st", "cast(en as long) en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = spansOf(DedupOps.dupSpans(Tables.documents(spark, fixtureDir)))
      .groupBy(_._1)
    val seeded = spansOf(DedupOps.dupSpansWinnowed(Tables.documents(spark, fixtureDir)))
    assert(seeded.nonEmpty)
    seeded.foreach { case (d, st, en) =>
      val ts = truth.getOrElse(d, Array.empty)
      assert(ts.exists { case (_, s1, e1) => s1 <= st && en <= e1 },
        s"winnowed span ($d, [$st,$en)) escapes stride-1 spans ${ts.toSeq}")
    }
  }

  test("winnowed cut: conservation per doc, and never cuts more than the exact cut") {
    // same conservation invariant as the stride-1 cut, against the
    // winnowed spans; and since winnowed coverage ⊆ stride-1 coverage
    // (containment, proven above), every affected doc keeps at least as
    // many chars under the winnowed cut as under the exact cut
    val docs = Tables.documents(spark, fixtureDir)
    val spansW = DedupOps.dupSpansWinnowed(docs)
      .groupBy(col("doc_id")).agg(sum(col("en") - col("st")).as("covered"))
    val cutW = SparkEntry.queries("dedup_substring_cut_winnowed")(spark, fixtureDir)
      .select(col("doc_id"), col("kept_chars").as("kept_w"))
    val bad = cutW.join(spansW, Seq("doc_id"))
      .join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("len")), Seq("doc_id"))
      .filter(col("kept_w") + col("covered") =!= col("len"))
    assert(bad.count() == 0)
    assert(cutW.count() == spansW.count() && cutW.count() > 0)
    val cutX = SparkEntry.queries("dedup_substring_cut")(spark, fixtureDir)
      .select(col("doc_id"), col("kept_chars").as("kept_x"))
    val under = cutW.join(cutX, Seq("doc_id"))
      .filter(col("kept_w") < col("kept_x"))
    assert(under.count() == 0)
  }

  test("winnowed spans: planted block >= k+W-1 is always detected, boundaries within W-1") {
    // the coverage guarantee: a shared span of length >= 40 + SubWinnowW - 1
    // must select at least one common gram in every trailing window, so
    // detection cannot be missed and the reported span starts at most
    // W-1 chars into the true block
    val w = DedupOps.SubWinnowW
    val block = "THE-QUICK-BROWN-FOX-JUMPS-OVER-THE-LAZY-DOG-0123456789-ABCDE" // 60 >= 40+w-1
    val a = "aaaaaaaaaabbbbbbbbbb" + block + "cccccccccceeeeeeeeee" // block at 1-based 21
    val b = block + "zzzzzzzzzzyyyyyyyyyyxxxxxxxxxxwwwwwwwwww"      // block at 1-based 1
    val dir = landDocs(Seq((1L, a, "s1"), (2L, b, "s2"),
      (3L, "unique text with no repeated forty-char gram anywhere at all in it", "s3")))
    val spans = DedupOps.dupSpansWinnowed(Tables.documents(spark, dir))
      .selectExpr("doc_id", "cast(st as long) st", "cast(en as long) en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.map(_._1).toSeq == Seq(1L, 2L), spans.toSeq)
    // doc 1: true block grams at positions 21..41; first selection within
    // w-1 of the block start, last selection within w-1 of the last gram
    val (_, st1, en1) = spans(0)
    assert(st1 >= 21 && st1 <= 21 + (w - 1) && en1 >= 81 - (w - 1) && en1 <= 81,
      spans.toSeq)
    val (_, st2, en2) = spans(1)
    assert(st2 >= 1 && st2 <= w && en2 >= 61 - (w - 1) && en2 <= 61, spans.toSeq)
  }
}
