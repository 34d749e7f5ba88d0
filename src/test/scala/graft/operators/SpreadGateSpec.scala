package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale gate for `Tables.spread` (r17 verdict item 8): the extraction
  * spreader must FIRE on an under-split input — a single-file corpus
  * plans the whole ~40× gram explosion as ONE task (measured at the
  * sf0.8 twin: dedup_substring_cut's extraction serialized 440 s on a
  * single core) — and must NO-OP on an input that already carries at
  * least the session's parallelism, the 100 TB case where re-shuffling
  * raw text would cost a corpus-sized exchange for nothing. Both halves
  * are cheap plan/partition-count checks at sf0.001; the sf0.8 wall
  * numbers in SCALE.md are builder-measured, this pins the MECHANISM. */
class SpreadGateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("spread fires on a single-file (under-split) scan") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val target = spark.sessionState.conf.numShufflePartitions
    assume(docs.rdd.getNumPartitions < target,
      "fixture unexpectedly pre-split — the firing half needs an under-split scan")
    val out = Tables.spread(docs, col("doc_id"))
    assert(out.rdd.getNumPartitions == target,
      s"spread should lift the scan to the session parallelism ($target)")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(doc_id"),
      s"spread must hash-spread by the given key, not round-robin:\n$plan")
  }

  test("spread no-ops on a pre-split input (returns the input unchanged)") {
    val target = spark.sessionState.conf.numShufflePartitions
    val wide = spark.range(0, 1000).toDF("doc_id").repartition(target)
    assert(wide.rdd.getNumPartitions >= target)
    val out = Tables.spread(wide, col("doc_id"))
    assert(out eq wide,
      "spread must return the input AS-IS when the scan already carries " +
        "the target parallelism — no exchange, no new plan node")
  }
}
