package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Invariants of the materialized dedup decision (`dedup_keep_best`):
  * the DuckDB oracle pins exact values at sf0.01; these pin the
  * properties that must hold at ANY scale — exactly one survivor per
  * cluster, and the survivor is the cluster's quality argmax. */
class KeepBestSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = DedupOps.queries("dedup_keep_best")(spark, sf)
    .select("doc_id", "cluster_id", "quality_score", "keep")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("every document is labeled exactly once") {
    val total = Tables.documents(spark, sf).count()
    assert(rows.length == total)
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("exactly one survivor per cluster") {
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.count(_._4 == 1) == 1, s"cluster $c survivor count != 1")
    }
  }

  test("the survivor is the quality argmax (ties -> smallest doc_id)") {
    rows.groupBy(_._2).foreach { case (c, members) =>
      val best = members.minBy(m => (-m._3, m._1))
      val kept = members.find(_._4 == 1).get
      assert(kept == best, s"cluster $c kept $kept, argmax is $best")
    }
    // and dedup actually bites on this corpus: some cluster drops a doc
    assert(rows.exists(_._4 == 0), "no document was ever dropped")
  }
}
