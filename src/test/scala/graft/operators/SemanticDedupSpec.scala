package graft.operators

import graft.{SparkEntry, SparkFixture}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the SemDeDup-style embedding dedup and the logistic
  * quality scorer (the oracle harness checks exact values; these pin the
  * invariants that make the operators well-defined). */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("dedup_semantic: total assignment, valid cells, centroids own their cell and never drop") {
    val out = SparkEntry.queries("dedup_semantic")(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.length == n) // every vector assigned exactly once
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    assert(out.forall(r => r.getInt(2) == 0 || r.getInt(2) == 1))
    // a centroid has cosine 1.0 with itself, so it lands in its own cell,
    // where no smaller id exists -> keep-min-id can never drop it
    out.filter(_.getLong(0) < 8).foreach { r =>
      assert(r.getLong(1) == r.getLong(0) && r.getInt(2) == 0, r)
    }
    // the threshold is neither vacuous nor total
    val dups = out.count(_.getInt(2) == 1)
    assert(dups > 0 && dups < n, s"dups=$dups")
  }

  test("dedup_semantic: every dropped vector has a kept same-cell representative with smaller id") {
    val out = SparkEntry.queries("dedup_semantic")(spark, dir)
    val byCell = out.collect().groupBy(_.getLong(1))
    byCell.values.foreach { rows =>
      val minId = rows.map(_.getLong(0)).min
      // the smallest id in a cell can have no smaller neighbor
      assert(rows.find(_.getLong(0) == minId).get.getInt(2) == 0)
    }
  }

  test("DedupLib.semanticDedup composes with SimilarityLib-trained IVF centroids") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val (_, centers) = SimilarityLib.buildIvf(e, "vec_id", "v", cells = 4)
    val codebook = centers.zipWithIndex.map { case (c, i) => (i.toLong, c.toArray) }.toSeq
    val out = DedupLib.semanticDedup(e, "vec_id", "v", codebook, 0.25).collect()
    assert(out.length == e.count())
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 4))
    // keep-min-id invariant holds under ANY codebook: the smallest id in
    // a cell has no smaller neighbor, so it can never be dropped
    out.groupBy(_.getLong(1)).values.foreach { rows =>
      val minId = rows.map(_.getLong(0)).min
      assert(rows.find(_.getLong(0) == minId).get.getInt(2) == 0)
    }
  }

  test("production swap: trained codebook yields a byte-identical plan shape to literal seeds") {
    // the advertised swap (deterministic seed centroids → buildIvf-trained
    // centroids, the SPARK_GRAFT_SEM_TRAINED path in dedup_semantic) must
    // change the plan's DATA, not its SHAPE: same broadcast K-row
    // codebook-as-literals projection, same per-cell pair join. Compared
    // on the pre-AQE physical plan's full node sequence.
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val seeded = e.filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val trained = DedupOps.trainedSemCentroids(e)
    assert(trained.size == seeded.size)
    assert(trained.map(_._2.toSeq) != seeded.map(_._2.toSeq)) // genuinely different geometry
    def shape(cb: Seq[(Long, Array[Double])]): Seq[String] =
      DedupLib.semanticDedup(e, "vec_id", "v", cb, 0.25)
        .queryExecution.sparkPlan.collect { case p => p.nodeName }
    assert(shape(trained) == shape(seeded),
      s"trained=${shape(trained)}\nseeded=${shape(seeded)}")
  }

  test("semanticDedup: an exact copy with larger id always drops (seeded random inputs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(8)(rnd.nextGaussian())
    val originals = (0L until 40L).map(i => (i, vec()))
    // 5 exact copies under fresh larger ids — cosine(v, v) rounds to 1.0,
    // so every copy must be marked duplicate regardless of codebook
    val copies = (0 until 5).map(i => (100L + i, originals(i * 7)._2.clone()))
    val df = (originals ++ copies).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v")
    val codebook = (0 until 3).map(c => (c.toLong, vec()))
    val out = DedupLib.semanticDedup(df, "vec_id", "v", codebook, tau = 0.9999).collect()
    assert(out.length == 45)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    copies.zipWithIndex.foreach { case ((id, _), i) =>
      assert(byId(id).getInt(2) == 1, s"exact copy $id not dropped")
      // and the copy landed in the same cell as its original
      assert(byId(id).getLong(1) == byId(originals(i * 7)._1).getLong(1))
    }
  }

  test("text_quality_score: sigmoid range, keep-gate consistency, one row per doc") {
    val out = SparkEntry.queries("text_quality_score")(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length == n)
    out.foreach { r =>
      val score = r.getDouble(1); val keep = r.getInt(2)
      assert(score > 0.0 && score < 1.0, r)
      assert(keep == (if (score >= 0.5) 1 else 0), r)
    }
    // the gate is a real split on this corpus, not a constant
    val kept = out.count(_.getInt(2) == 1)
    assert(kept > 0 && kept < n, s"kept=$kept")
  }

  test("text_quality_score: score is monotone in the stopword feature, all else equal") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "the beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    // same token count, word lengths differ slightly, but the stopword
    // component dominates: adding "the" must not lower the score. Run the
    // public query against a scratch table dir to reuse the exact
    // production expression.
    val q = SparkEntry.queries("text_quality_score")
    val tmp = java.nio.file.Files.createTempDirectory("qsdocs").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = q(spark, tmp).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) >= out(1L), out.toString)
  }
}
