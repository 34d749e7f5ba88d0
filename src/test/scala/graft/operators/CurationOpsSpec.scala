package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Invariants for the curation queries (exact values are DuckDB-checked;
  * these pin the distributional properties that must hold at any scale). */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("sample_temperature_mix: probabilities normalize, temperature flattens") {
    val rows = CurationOps.queries("sample_temperature_mix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val pRaw = rows.map(_._4)
    val pTemp = rows.map(_._5)
    assert(math.abs(pRaw.sum - 1.0) < 1e-4, s"p_raw sums to ${pRaw.sum}")
    assert(math.abs(pTemp.sum - 1.0) < 1e-4, s"p_temp sums to ${pTemp.sum}")
    // α=0.5 compresses the spread: the tempered max/min ratio must be
    // strictly inside the raw ratio (they'd be equal only if all sources
    // had identical token counts)
    val rawRatio = pRaw.max / pRaw.min
    val tempRatio = pTemp.max / pTemp.min
    assert(tempRatio < rawRatio,
      s"temperature did not flatten: $tempRatio !< $rawRatio")
    assert(math.abs(tempRatio - math.sqrt(rawRatio)) < 0.05 * rawRatio,
      s"α=0.5 ratio should be ≈ sqrt of raw: $tempRatio vs sqrt($rawRatio)")
    // quotas draw from the 10k budget (± one rounding unit per source)
    val quotaSum = rows.map(_._6).sum
    assert(math.abs(quotaSum - 10000L) <= rows.length,
      s"quota sum $quotaSum strays from budget")
  }
}
