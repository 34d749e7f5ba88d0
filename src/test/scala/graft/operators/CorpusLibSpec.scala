package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class CorpusLibSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("bpeTrain learns the hand-computed merges on a golden corpus") {
    import spark.implicits._
    // "abab" x3 + "abc" x2: pair counts round 1 -> ab:8 (3*2+2), ba:3, bc:2
    val docs = Seq("abab abab abab abc abc").toDF("text")
    val m = CorpusLib.bpeTrain(docs, "text", k = 3)
    // round 1 merges (a,b) n=8; vocab becomes [ab,ab]x3, [ab,c]x2
    assert(m.head == CorpusLib.BpeMerge("a", "b", 8), m.toString)
    // round 2: (ab,ab):3 vs (ab,c):2 -> merge (ab,ab) n=3
    assert(m(1) == CorpusLib.BpeMerge("ab", "ab", 3), m.toString)
    // round 3: only (ab,c):2 remains
    assert(m(2) == CorpusLib.BpeMerge("ab", "c", 2), m.toString)
  }

  test("re-segmentation is left-to-right non-overlapping (aaa merges once)") {
    import spark.implicits._
    val docs = Seq("aaa aaa").toDF("text")
    val m = CorpusLib.bpeTrain(docs, "text", k = 2)
    // round 1: (a,a) counted twice per word (positions 0-1, 1-2), n=4
    assert(m.head == CorpusLib.BpeMerge("a", "a", 4), m.toString)
    // after merging, each 'aaa' -> [aa, a]: round 2 sees (aa,a) n=2
    assert(m(1) == CorpusLib.BpeMerge("aa", "a", 2), m.toString)
  }

  test("round-1 merge agrees with the text_bpe_merges query's top candidate") {
    val sf = "/root/testdata/sf0.001"
    val top = TextOps.queries("text_bpe_merges")(spark, sf)
      .collect().head
    val m = CorpusLib.bpeTrain(Tables.documents(spark, sf), "text", k = 1).head
    assert(m.left + m.right == top.getString(1), s"$m vs ${top.getString(1)}")
    assert(m.count == top.getLong(2), s"$m vs ${top.getLong(2)}")
  }

  test("stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq("ab ab").toDF("text")
    val m = CorpusLib.bpeTrain(docs, "text", k = 10)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b")), m.toString)
  }
}
