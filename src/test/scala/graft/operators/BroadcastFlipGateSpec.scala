package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkFixture}

/** Intended-plan-per-scale gates for the broadcast→shuffle flip class
  * (VERDICT r16 #2). The r16 sf0.8 sweep surfaced the expected flip at
  * the 10 MB `autoBroadcastJoinThreshold`: the fact-fact joins of
  * q3/q4/q17/q21 leave the broadcast regime once the build side's file
  * stats exceed the threshold, while their dimension joins (customer,
  * part, the per-key aggregates) stay broadcast at every scale. Both
  * regimes are INTENDED — a broadcast of a corpus-sized side would OOM
  * a real executor, and a shuffle of a dimension side pays two
  * exchanges for nothing — so this spec pins the exact
  * (broadcast, shuffle) join census per query at BOTH scales:
  *
  *   query            sf0.001          sf0.8 (>threshold)
  *   q3               BHJ=2  SMJ=0     BHJ=1  SMJ=1  (orders⋈lineitem flips)
  *   q4               BHJ=1  SMJ=0     BHJ=0  SMJ=1  (the semi-join flips)
  *   q17              BHJ=2  SMJ=0     BHJ=1  SMJ=1  (lineitem⋈avg-agg flips)
  *   q21              BHJ=4  SMJ=1     BHJ=3  SMJ=2  (one self-join flips)
  *   ml_gbdt_split    BHJ=1  SMJ=0     BHJ=1  SMJ=0  (split-candidate agg
  *                                     stays K-row → broadcast at every
  *                                     scale; its r16 scan growth was the
  *                                     fact scan, not a join regression)
  *
  * A regression in EITHER direction is caught: a query quietly
  * broadcasting a corpus-sized side at sf0.8 fails the shuffle count;
  * one quietly shuffling a dimension at sf0.001 fails the broadcast
  * count. Real-cluster guidance lives in SCALE.md ("broadcast-flip
  * class"): the threshold is a per-cluster dial — raise it if your
  * executors have the memory to keep these joins broadcast at your SF.
  *
  * Plans are built on an AQE-off sibling session (like
  * BnljBuildSideGateSpec): the census is a STATIC planning property —
  * AQE may re-promote a sub-threshold shuffle join to broadcast at
  * runtime using exact stats, which is a bonus, not the contract.
  * The sf0.8 half runs only when the /tmp twin fixture exists
  * (assume-canceled otherwise), so the suite stays green on a fresh
  * checkout; the sf0.001 half always runs. */
class BroadcastFlipGateSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }
  private val small = "/root/testdata/sf0.001"
  private val big = "/tmp/sf0.8"

  /** (broadcast-hash, sort-merge, shuffled-hash) join census. */
  private def census(name: String, dir: String): (Int, Int, Int) = {
    val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
    var bhj = 0; var smj = 0; var shj = 0
    plan.foreach {
      case _: BroadcastHashJoinExec => bhj += 1
      case _: SortMergeJoinExec => smj += 1
      case _: ShuffledHashJoinExec => shj += 1
      case _ => ()
    }
    (bhj, smj, shj)
  }

  /** query -> (expected at sf0.001, expected at sf0.8), as (bhj, smj, shj). */
  private val expected: Seq[(String, (Int, Int, Int), (Int, Int, Int))] = Seq(
    ("q3_shipping_priority", (2, 0, 0), (1, 1, 0)),
    ("q4_order_priority", (1, 0, 0), (0, 1, 0)),
    ("q17_small_qty_revenue", (2, 0, 0), (1, 1, 0)),
    ("q21_waiting_suppliers", (4, 1, 0), (3, 2, 0)),
    ("ml_gbdt_split", (1, 0, 0), (1, 0, 0)))

  test("flip class pins the broadcast regime at sf0.001") {
    val off = expected.flatMap { case (q, want, _) =>
      val got = census(q, small)
      if (got != want) Some(s"$q: want $want got $got") else None
    }
    assert(off.isEmpty, off.mkString("; "))
  }

  test("flip class pins the mixed broadcast/shuffle regime at sf0.8") {
    assume(new java.io.File(big, "lineitem.parquet").exists,
      s"twin fixture $big not present on this machine")
    val off = expected.flatMap { case (q, _, want) =>
      val got = census(q, big)
      if (got != want) Some(s"$q: want $want got $got") else None
    }
    assert(off.isEmpty, off.mkString("; "))
  }
}
