package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Properties of the winnowing fingerprint selection (exact pair values
  * are DuckDB-checked at sf0.01 via the `dedup_winnowing` oracle; these
  * pin the scheme's structural guarantees on crafted inputs). */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def fingerprints(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    DedupOps.winnowFingerprints(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  test("identical documents produce identical fingerprint sets") {
    val text = "spark window merge sort filter join scan batch stream " +
      "table key order group agg row line data value part column"
    val fps = fingerprints(Seq(1L -> text, 2L -> text))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(f => (f._2, f._3)).toSet)
    assert(byDoc(1L).nonEmpty)
    assert(byDoc(1L) == byDoc(2L))
  }

  test("disjoint-vocabulary documents share no fingerprints") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven"
    val fps = fingerprints(Seq(1L -> a, 2L -> b))
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert(h1.nonEmpty && h2.nonEmpty)
    assert((h1 & h2).isEmpty)
  }

  test("coverage guarantee: consecutive selected positions gap <= W") {
    // every sliding window of W grams selects its argmin, so two adjacent
    // selections can never be more than W positions apart — the property
    // that makes winnowing localize shared passages (a naive
    // current-row-is-min rule fails this on increasing hash runs)
    val fps = fingerprints(
      Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("text"))
        .limit(200).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq)
    assert(fps.nonEmpty)
    fps.groupBy(_._1).foreach { case (doc, sel) =>
      val ps = sel.map(_._2).sorted
      // first selection must cover the first full window
      assert(ps.head <= DedupOps.WinnowW, s"doc $doc: first selection ${ps.head}")
      ps.sliding(2).foreach {
        case Array(a, b) =>
          assert(b - a <= DedupOps.WinnowW, s"doc $doc: gap $a -> $b")
        case _ =>
      }
    }
  }

  test("fingerprint extraction is stateless: stream == batch") {
    // the row-local formulation has no window/aggregate, so the same
    // code runs unchanged on an unbounded stream (the scaladoc's
    // streaming-legality claim); fingerprints must match batch exactly
    import java.nio.file.Files
    import org.apache.spark.sql.types.StructType
    import spark.implicits._
    val docs = Seq(
      1L -> "spark window merge sort filter join scan batch stream table key",
      2L -> "one two three four five six seven eight nine ten eleven twelve",
      3L -> "al be ga")  // too short to fingerprint: must vanish, not fail
    val dir = Files.createTempDirectory("winnow_stream").toString
    docs.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(dir)
    val sdf = DedupOps.winnowFingerprints(
      spark.readStream.schema(StructType.fromDDL("doc_id LONG, text STRING"))
        .parquet(dir))
    val q = sdf.writeStream.format("memory").queryName("winnow_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("winnow_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(streamed == fingerprints(docs).toSet)
      assert(!streamed.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("a shared passage inside otherwise-different documents is detected") {
    val passage = "merge sort filter join scan batch stream table key order"
    val a = s"alpha beta gamma delta $passage epsilon zeta eta theta"
    val b = s"one two three four five $passage six seven eight nine"
    val fps = fingerprints(Seq(1L -> a, 2L -> b))
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty, "shared 10-word passage must share a fingerprint")
  }

  test("winnowSpans localizes a planted copied paragraph to its actual offsets") {
    import spark.implicits._
    // 16-word passage planted at word 4 (1-based) of doc 1 and word 8 of
    // doc 2: shared grams sit at positions 4..17 and 8..21, offset -4
    val passage = "merge sort filter join scan batch stream table key " +
      "order alpha more words follow here now"
    val docs = Seq(
      1L -> s"pre1 pre2 pre3 $passage sufa suga",
      2L -> s"x1 x2 x3 x4 x5 x6 x7 $passage tail1",
      3L -> "totally unrelated vocabulary nothing shared with anybody today friend")
      .toDF("doc_id", "text")
    val spans = DedupOps.winnowSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.forall(s => s._1 == 1L && s._2 == 2L), s"stranger in spans: ${spans.toSeq}")
    assert(spans.length == 1, s"one passage → one span, got ${spans.toSeq}")
    val (_, _, startA, startB, len) = spans.head
    // the run must lie inside the shared-gram ranges and keep the copy's
    // constant alignment shift
    assert(startB - startA == 4, s"offset drifted: $startA → $startB")
    assert(startA >= 4 && startA <= 4 + DedupOps.WinnowW, s"start_a=$startA")
    assert(startA + len - 3 <= 17, s"span end past shared grams: start=$startA len=$len")
    // coverage guarantee bounds how late the first and how early the last
    // selection can fall: the span covers most of the 16-word passage
    assert(len >= 16 - 2 * DedupOps.WinnowW + 3, s"span too short: len=$len")
  }

  test("xxhash64 twin surfaces the planted passage pair and skips strangers") {
    import spark.implicits._
    val passage = "merge sort filter join scan batch stream table key order more words here"
    val docs = Seq(
      1L -> s"alpha beta gamma delta $passage epsilon zeta eta theta",
      2L -> s"one two three four five $passage six seven eight nine",
      3L -> "totally unrelated vocabulary nothing shared with anyone else at all today")
      .toDF("doc_id", "text")
    val pairs = DedupLib.winnowPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}
