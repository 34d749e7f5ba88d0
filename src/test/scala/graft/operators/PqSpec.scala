package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: code shape, exactness when data lies on the
  * codebook, ADC recall on clustered corpora, reconstruction error. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(7)

  /** 8 tight clusters in R^16 — the regime ANN indexes are built for. */
  private lazy val clustered: Seq[(Long, Seq[Double])] = {
    val centers = Array.fill(8, dim)(rnd.nextGaussian())
    (0L until 200L).map { id =>
      val c = centers((id % 8).toInt)
      (id, c.toSeq.map(_ + rnd.nextGaussian() * 0.01))
    }
  }

  private def l2sq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("codes are m bytes; every code id is a valid codebook entry") {
    val df = clustered.toDF("id", "v")
    val model = SimilarityLib.trainPq(df, "v", m = 4, ksub = 16)
    assert(model.m == 4 && model.subDim == 4 && model.dim == dim)
    val codes = SimilarityLib.encodePq(df, "v", model)
      .select("pq_code").as[Array[Byte]].collect()
    assert(codes.forall(_.length == 4))
    assert(codes.flatten.forall(b => (b & 0xFF) < model.ksub))
  }

  test("data on the codebook ⇒ ADC distance is exact and top-k matches brute force") {
    // corpus = exactly ksub distinct points per subspace ⇒ zero
    // quantization error ⇒ ADC == true squared L2
    val pts = (0L until 64L).map(i => (i, Seq.fill(dim)((i % 4).toDouble)))
    val df = pts.toDF("id", "v")
    val model = SimilarityLib.trainPq(df, "v", m = 4, ksub = 4)
    val encoded = SimilarityLib.encodePq(df, "v", model)
    val probe = Array.fill(dim)(1.7)
    val got = SimilarityLib.adcTopK(encoded, "id", model, probe, 10)
      .select($"id", $"adc_dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = pts.map { case (id, v) => (id, l2sq(v, probe.toSeq)) }
      .sortBy { case (id, d) => (d, id) }.take(10)
    got.zip(want).foreach { case ((gi, gd), (wi, wd)) =>
      assert(gi == wi, s"got $gi want $wi")
      assert(math.abs(gd - wd) < 1e-9, s"adc $gd true $wd")
    }
  }

  test("ADC top-10 lands in the probe's cluster (coarse ranking is right)") {
    // within a tight cluster all members share a code, so ADC ties and
    // cannot rank below quantization resolution — the correct property
    // is cluster precision, not within-cluster order
    val df = clustered.toDF("id", "v")
    val model = SimilarityLib.trainPq(df, "v", m = 4, ksub = 16)
    val encoded = SimilarityLib.encodePq(df, "v", model).cache()
    (0 until 5).foreach { q =>
      val probeId = q * 37L
      val approx = SimilarityLib.adcTopK(encoded, "id", model,
        clustered(probeId.toInt)._2.toArray, 10).select("id").as[Long].collect()
      assert(approx.forall(_ % 8 == probeId % 8),
        s"probe $probeId got out-of-cluster ids ${approx.filter(_ % 8 != probeId % 8).mkString(",")}")
    }
  }

  test("ADC shortlist + exact re-rank recovers the true top-10 exactly") {
    val df = clustered.toDF("id", "v")
    val model = SimilarityLib.trainPq(df, "v", m = 4, ksub = 16)
    val encoded = SimilarityLib.encodePq(df, "v", model).cache()
    val recalls = (0 until 5).map { q =>
      val probe = clustered(q * 37)._2.toArray
      val approx = SimilarityLib.pqTopKRerank(encoded, "id", "v", model, probe, 10, 40)
        .select("id").as[Long].collect().toSet
      val exact = clustered.map { case (id, v) => (id, l2sq(v, probe.toSeq)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      approx.intersect(exact).size / 10.0
    }
    assert(recalls.forall(_ == 1.0), s"re-ranked recall@10 per query: $recalls")
  }

  test("IVF-PQ: cell pruning + ADC + re-rank finds the true neighbors") {
    val df = clustered.toDF("id", "v")
    val (encoded, centroids, model) =
      SimilarityLib.encodeIvfPq(df, "id", "v", cells = 8, m = 4, ksub = 16)
    val enc = encoded.cache()
    (0 until 3).foreach { q =>
      val probe = clustered(q * 53)._2.toArray
      val got = SimilarityLib.queryIvfPq(enc, "id", centroids, model, probe,
        k = 10, nprobe = 2, shortlist = 40).select("id").as[Long].collect().toSet
      val exact = clustered.map { case (id, v) => (id, l2sq(v, probe.toSeq)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      // tight clusters: the probe's whole cluster lives in one IVF cell,
      // so nprobe=2 must recover the exact top-10
      assert(got == exact, s"probe ${q * 53}: got $got want $exact")
    }
    // pruning is real: nprobe=2 of 8 cells scans a strict subset
    val cellCounts = enc.groupBy("cell").count().collect()
    assert(cellCounts.length > 2, "kmeans degenerated to <3 cells")
  }

  test("reconstruction error is small on clustered data and bounds ADC error") {
    val df = clustered.toDF("id", "v")
    val model = SimilarityLib.trainPq(df, "v", m = 4, ksub = 16)
    val encoded = SimilarityLib.encodePq(df, "v", model)
      .select($"id", $"v", $"pq_code").as[(Long, Seq[Double], Array[Byte])].collect()
    val errs = encoded.map { case (_, v, code) =>
      math.sqrt(l2sq(v, SimilarityLib.pqReconstruct(code, model).toSeq))
    }
    // noise is 0.01/dim-axis; centroids sit on cluster means, so
    // reconstruction error stays near the noise floor
    assert(errs.max < 0.5, s"max reconstruction err ${errs.max}")
  }

  test("trainPq is deterministic: same seed, same codebooks, across partitionings") {
    val df4 = clustered.toDF("id", "v").repartition(4)
    val a = SimilarityLib.trainPq(df4, "v", m = 4, ksub = 8, seed = 11L)
    val b = SimilarityLib.trainPq(df4, "v", m = 4, ksub = 8, seed = 11L)
    (0 until a.m).foreach { j =>
      assert(a.codebooks(j).map(_.toSeq).toSeq == b.codebooks(j).map(_.toSeq).toSeq,
        s"subspace $j codebooks differ across identical-seed fits")
    }
  }

  test("trainPq rejects non-divisible dims and oversize codebooks") {
    val df = clustered.toDF("id", "v")
    intercept[IllegalArgumentException] { SimilarityLib.trainPq(df, "v", m = 5, ksub = 4) }
    intercept[IllegalArgumentException] { SimilarityLib.trainPq(df, "v", m = 4, ksub = 300) }
  }
}
