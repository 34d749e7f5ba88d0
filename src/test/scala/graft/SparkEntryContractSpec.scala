package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract's shape: every oracle belongs to a real
  * query, and the no-oracle set stays EXACTLY the documented six —
  * adding a query without a DuckDB oracle must be a deliberate,
  * test-visible decision, not an accident (the driver records a weaker
  * rows-only check for those). */
class SparkEntryContractSpec extends AnyFunSuite {
  test("every oracle key has a matching query") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }

  test("the no-oracle set is exactly the ten contractual exceptions") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val contractual = Set(
      "ml_train_predict",    // hogwild: nondeterministic by reference semantics
      "q_sketches",          // HLL/quantile sketch internals differ by engine
      "text_vocab_mg",       // Misra-Gries tail is partition-order dependent
      "dedup_minhash_fast",  // xxhash64 has no DuckDB counterpart
      "dedup_simhash_fast",  // xxhash64 has no DuckDB counterpart
      "dedup_winnowing_fast", // xxhash64 has no DuckDB counterpart
      "text_quality_gate_approx", // percentile sketch internals differ by engine
      "events_active_users_hll", // DataSketches HLL differs from DuckDB's HLL
      "events_dau_stickiness_hll", // DataSketches HLL differs from DuckDB's HLL
      "q_joinsize_cm")       // Murmur3 CM buckets have no DuckDB counterpart
    assert(noOracle == contractual,
      s"unexpected no-oracle queries: ${noOracle -- contractual}; " +
        s"missing expected: ${contractual -- noOracle}")
  }

  test("no query name collisions across operator modules") {
    import graft.operators._
    val maps = Seq(
      Relational.queries, TextOps.queries, DedupOps.queries,
      SimilarityOps.queries, EventOps.queries, MlOps.queries,
      MultimodalOps.queries, CurationOps.queries, CorpusOps.queries,
      SourceOps.queries)
    val all = maps.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"query defined in more than one module: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("every query has a committed plan dump (plans/<name>.txt)") {
    // plans/ is the plan-audit artifact behind the docs' scale claims;
    // a query landing without a regenerated dump means the audit set
    // silently lags the code (round 10 shipped ann_hard_negatives with
    // no dump). Regenerate with:
    //   SPARK_GRAFT_EXPLAIN=plans SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
    //     sbt "runMain graft.Bench"
    // ml_train_predict is legitimately plan-less (an ML training loop,
    // not a single query plan).
    val plansDir = new java.io.File("plans")
    assert(plansDir.isDirectory, "plans/ directory missing — regenerate dumps")
    val dumped = plansDir.listFiles.map(_.getName)
      .filter(_.endsWith(".txt")).map(_.stripSuffix(".txt")).toSet
    val expected = SparkEntry.queries.keySet - "ml_train_predict"
    val missing = expected -- dumped
    val stale = dumped -- expected
    assert(missing.isEmpty, s"queries without a plan dump: $missing")
    assert(stale.isEmpty, s"plan dumps for queries that no longer exist: $stale")
  }
}
