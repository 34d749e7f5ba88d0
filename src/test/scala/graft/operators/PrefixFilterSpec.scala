package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The PPJoin guarantee is a PROOF (any J≥t pair shares a prefix token;
  * the first shared token passes the positional bound) — this spec pins
  * it empirically: on randomized corpora, the prefix-filtered join must
  * return EXACTLY the brute-force all-pairs answer, for two different
  * thresholds. A false negative here means one of the three filters
  * (prefix length, symmetric length, positional) over-pruned — the only
  * failure mode that silently loses duplicates in production. */
class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def bruteForce(docs: Map[Long, Set[String]], tNum: Int, tDen: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val ids = docs.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (docs(a) & docs(b)).size.toLong
      sza = docs(a).size.toLong; szb = docs(b).size.toLong
      if tDen * inter >= tNum * (sza + szb - inter)
    } yield (a, b, inter, sza, szb)).toSet
  }

  private def run(docs: Map[Long, Set[String]], tNum: Int, tDen: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val rows = docs.toSeq.flatMap { case (id, toks) => toks.map(t => (id, t)) }
    DedupLib.prefixFilterPairs(rows.toDF("doc_id", "tok"), "doc_id", "tok",
        tNum, tDen)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("prefix-filtered join equals brute force on randomized corpora (no false negatives)") {
    val vocab = ('a' to 'y').map(_.toString)
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      // clustered corpus: base docs plus near-copies with small edits,
      // so qualifying pairs actually exist at high thresholds
      val base = (0 until 10).map { i =>
        i.toLong * 3 -> rnd.shuffle(vocab).take(5 + rnd.nextInt(15)).toSet
      }
      val variants = base.flatMap { case (id, toks) =>
        Seq(
          (id + 1) -> (toks - toks.head + vocab(rnd.nextInt(vocab.size))),
          (id + 2) -> (if (rnd.nextBoolean()) toks else toks - toks.last))
      }
      val docs = (base ++ variants).toMap
      for ((tNum, tDen) <- Seq((4, 5), (1, 2))) {
        val expected = bruteForce(docs, tNum, tDen)
        val got = run(docs, tNum, tDen)
        assert(got == expected,
          s"seed=$seed t=$tNum/$tDen missing=${expected -- got} extra=${got -- expected}")
      }
    }
  }

  test("duplicate token rows and exact-duplicate docs are handled (set semantics, J=1 pairs)") {
    import spark.implicits._
    val rows = Seq((1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (3L, "z"))
    val got = DedupLib.prefixFilterPairs(rows.toDF("doc_id", "tok"),
        "doc_id", "tok", 4, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L, 2L, 2L)))
  }
}
