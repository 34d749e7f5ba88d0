package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The incremental ingest gate (`dedup_incremental`) classifies a new
  * batch against the existing corpus. The DuckDB oracle pins exact
  * values on the real tables — but the synthetic corpus has no exact
  * duplicates crossing the batch split below sf0.1, so the exact tier
  * is pinned here on a planted corpus where every tier must fire. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("planted corpus: every tier fires and tiers take precedence in order") {
    import spark.implicits._
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated existing content about spark query planning internals"),
      (3L, "some shared paragraph that will be lightly edited in the new batch soon"))
    val batch = Seq(
      // exact copy of doc 1 -> exact_dup (even though it is ALSO near)
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      // one-word edit of doc 3 -> near_dup (shares LSH bands, not the hash)
      (15L, "some shared paragraph that will be lightly edited in the new batch now"),
      // nothing in common -> new
      (20L, "entirely fresh material mentioning neither foxes nor paragraphs at all whatsoever"))
    val docs = (existing ++ batch).toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_incr_test")
    // replicate the query's tiers against the planted frame via the
    // same split predicate (batch ids are multiples of 5)
    val out = {
      val parq = java.nio.file.Files.createTempDirectory("graft-incr").toString
      docs.write.mode("overwrite").parquet(s"$parq/documents.parquet")
      DedupOps.queries("dedup_incremental")(spark, parq)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    }
    assert(out == Map(10L -> "exact_dup", 15L -> "near_dup", 20L -> "new"), out.toString)
  }

  test("real corpus: statuses cover the batch exactly once, near_dups really share a band") {
    val out = DedupOps.queries("dedup_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batchIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.map(_._1).sorted.toSeq == batchIds.toSeq, "classification must cover the batch exactly")
    // a near_dup must appear in the full-corpus LSH pair list with an
    // existing (non-batch) counterpart — the incremental gate can only
    // see what the batch-blind pair generator also sees
    val pairs = DedupOps.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nearWithExisting = pairs.flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }.filter { case (x, other) => x % 5 == 0 && other % 5 != 0 }
      .map(_._1).toSet
    out.filter(_._2 == "near_dup").foreach { case (id, _) =>
      assert(nearWithExisting.contains(id), s"doc $id marked near_dup without an existing LSH partner")
    }
  }
}
