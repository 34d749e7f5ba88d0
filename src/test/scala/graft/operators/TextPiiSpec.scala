package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** text_pii_redact: the planted PII is fully derived from doc_id, so the
  * per-language audit is exactly predictable from the doc_id list alone —
  * the spec recomputes it and also proves the redaction masks exactly the
  * planted strings (no over- or under-matching on the corpus text). */
class TextPiiSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, dir).selectExpr("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq

  test("per-language counts and redacted-char totals match doc_id arithmetic") {
    val ref = docs.groupBy(_._2).map { case (lang, g) =>
      val ids = g.map(_._1)
      val phones = ids.count(_ % 3 == 0)
      val emails = ids.count(_ % 4 == 0)
      val ips = ids.count(_ % 5 == 0)
      val clean = ids.count(id => id % 3 != 0 && id % 4 != 0 && id % 5 != 0)
      val delta = ids.map { id =>
        val p = if (id % 3 == 0) 15 - 7 else 0
        val e = if (id % 4 == 0) (4 + id.toString.length + 13) - 7 else 0
        val ip = if (id % 5 == 0)
          (3 + Seq(id % 256, id * 3 % 256, id * 7 % 256)
            .map(_.toString.length).sum + 2) - 4
        else 0
        p + e + ip
      }.sum
      lang -> ((ids.size.toLong, phones.toLong, emails.toLong, ips.toLong,
        clean.toLong, delta.toLong))
    }
    val got = TextOps.queries("text_pii_redact")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (lang, exp) =>
      assert(got(lang) == exp, s"lang $lang: got ${got(lang)}, want $exp")
    }
  }

  test("corpus text itself never matches a PII pattern (no digits in docs)") {
    // the planted strings are the ONLY matches — so a doc_id that plants
    // nothing contributes to n_clean; verified corpus-wide via the audit
    val total = docs.size
    val got = TextOps.queries("text_pii_redact")(spark, dir).collect()
    val (nd, np, ne, ni, nc) = got.map(r => (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3,
        a._4 + b._4, a._5 + b._5))
    assert(nd == total)
    assert(np == docs.count(_._1 % 3 == 0))
    assert(ne == docs.count(_._1 % 4 == 0))
    assert(ni == docs.count(_._1 % 5 == 0))
    assert(nc == docs.count(d => d._1 % 3 != 0 && d._1 % 4 != 0 && d._1 % 5 != 0))
  }
}
