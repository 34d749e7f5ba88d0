package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Pins `WinnowSelect` (native monotonic-deque selection) EXACTLY equal
  * to the SQL winnowing rule it replaced in `DedupOps.dupSpansWinnowed`
  * — the rule the DuckDB oracle still replays: per trailing window of w
  * gram positions, the lexicographically smallest 8-codepoint prefix
  * wins, ties to the rightmost position, distinct positions out. Any
  * divergence here silently breaks the tri-scale hash gate of the
  * dedup_substring_*winnowed queries, so the equality is spec-law. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val K = 40
  private val W = 8
  private val PosBase = 1000000000

  /** The pre-native SQL selection rule, verbatim shape: 8-char-prefix ||
    * lpad(PosBase - pos) keys, least() over w clamped element_at shifts,
    * array_distinct, keys mapped back to positions. */
  private def sqlRule(df: DataFrame): DataFrame = {
    val leastArgs = (0 until W)
      .map(d => s"element_at(ks, greatest(1, p - $d))").mkString(", ")
    df.filter(length(col("text")) >= K)
      .withColumn("ks", expr(
        s"transform(sequence(1, length(text) - ${K - 1}), " +
          s"p -> concat(substring(text, p, 8), " +
          s"lpad(cast($PosBase - p as string), 10, '0')))"))
      // CollapseProject would otherwise inline the whole `ks` transform
      // into every element_at reference below — recomputing the n-element
      // array per (position, shift) pair, O(n²·w) interpreted string work
      // (~16 min on the sf0.001 corpus). The checkpoint pins ks to one
      // evaluation per document.
      .localCheckpoint()
      .withColumn("sel", expr(
        s"array_sort(transform(array_distinct(transform(sequence(1, size(ks)), " +
          s"p -> least($leastArgs))), mk -> $PosBase - cast(substring(mk, 9, 10) as int)))"))
      .select(col("id"), col("sel"))
  }

  private def nativeRule(df: DataFrame): DataFrame =
    df.filter(length(col("text")) >= K)
      .select(col("id"), array_sort(Winnow.column(col("text"), K, W)).as("sel"))

  private def assertEqualSelections(df: DataFrame): Unit = {
    val bad = sqlRule(df).as("a")
      .join(nativeRule(df).as("b"), Seq("id"))
      .filter(expr("a.sel <> b.sel"))
    assert(bad.isEmpty, bad.collect().take(3).mkString("\n"))
  }

  test("equals the SQL rule on the sf0.001 documents corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    assertEqualSelections(docs)
  }

  test("edge cases: boundary lengths, all-equal tie runs, periodic text, multibyte") {
    val docs = Seq(
      1L -> "x" * 39,                       // below gram width: no positions
      2L -> "y" * 40,                       // exactly one position
      3L -> "a" * 120,                      // every prefix ties -> rightmost each window
      4L -> ("ab" * 100),                   // period-2 text
      5L -> ("café über straße 😀 " * 8), // multibyte incl. astral
      6L -> (0 until 90).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    ).toDF("id", "text")
    assertEqualSelections(docs)
    // below-width doc yields NO row from either path (filtered), and the
    // native expression alone returns an empty array, not null
    val empty = docs.filter(col("id") === 1L)
      .select(Winnow.column(col("text"), K, W).as("sel")).head.getSeq[Int](0)
    assert(empty.isEmpty)
  }

  test("all-ties text selects every position (the documented worst case)") {
    val sel = Seq(7L -> ("z" * 50)).toDF("id", "text")
      .select(Winnow.column(col("text"), K, W).as("sel")).head.getSeq[Int](0)
    assert(sel == (1 to 11).toSeq)
  }

  test("a non-string child is rejected at analysis time, not with a runtime CCE") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L -> 42L).toDF("id", "n")
        .select(Winnow.column(col("n"), K, W)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("winnow_select"), e.getMessage)
  }
}
