package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** text_quality_gate_approx has no DuckDB oracle (percentile-sketch
  * internals differ across engines), so this spec is its correctness
  * gate: at accuracy 10000 on the test corpus the approximate
  * per-language threshold must land within one rank of the exact
  * percentile, so the kept set can differ from the exact gate's by at
  * most a hair's width of borderline documents. */
class TextApproxGateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx gate matches the exact gate within sketch tolerance") {
    val exact = TextOps.queries("text_quality_gate")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val approx = TextOps.queries("text_quality_gate_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (lang, (nDocs, nKept, thr)) =>
      val (aDocs, aKept, aThr) = approx(lang)
      assert(aDocs == nDocs, s"$lang: doc counts must be exact")
      // rank error ≤ n/10000 < 1 doc at this scale → thresholds may
      // differ only by adjacent order statistics; kept counts within 2%
      assert(math.abs(aKept - nKept) <= math.max(2L, nDocs / 50),
        s"$lang: approx kept $aKept vs exact $nKept of $nDocs")
      assert(math.abs(aThr - thr) < 0.05,
        s"$lang: approx threshold $aThr vs exact $thr")
    }
  }
}
