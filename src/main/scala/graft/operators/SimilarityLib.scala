package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim

/** Reusable approximate-nearest-neighbor operators over embedding tables
  * — the scale path beyond the oracle-checked brute-force/sign-bucket
  * queries in [[SimilarityOps]].
  *
  *  - IVF (inverted-file) index: k-means centroids partition the corpus;
  *    a query scans only the `nprobe` closest cells. At 100 TB the
  *    assignment column becomes the table's partition key, so a probe
  *    prunes partitions at the parquet-scan level instead of filtering
  *    rows.
  *  - Random-hyperplane LSH: seeded Gaussian planes → deterministic
  *    sign-bit signature; Hamming-close signatures ⇒ high cosine. The
  *    general-direction complement of the axis-aligned sign buckets used
  *    by the SQL-replayable queries.
  */
object SimilarityLib {

  /** Fit an IVF index: returns (assignments df with `cell`, centroids).
    * Input df needs (`idCol`, `vecCol: array<float|double>`). */
  def buildIvf(df: DataFrame, idCol: String, vecCol: String, cells: Int, seed: Long = 42L)
      : (DataFrame, Array[Vector]) = {
    val prepared = df
      .withColumn("_v", col(vecCol).cast("array<double>"))
      .withColumn("_features", org.apache.spark.ml.functions.array_to_vector(col("_v")))
    val model = new KMeans().setK(cells).setSeed(seed)
      .setFeaturesCol("_features").setPredictionCol("cell")
      .fit(prepared)
    val assigned = model.transform(prepared)
      .select(col(idCol), col("_v").as("v"), col("cell"))
    (assigned, model.clusterCenters)
  }

  /** Persist an IVF index partitioned BY CELL: at scale the `cell`
    * column is the physical partition key, so a probe query's
    * `cell IN (...)` filter prunes at the directory level — the scan
    * never opens the other cells' files at all (see
    * [[queryIvfPartitioned]], which asserts this in its plan test). */
  def writeIvfPartitioned(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Top-k cosine probe over a [[writeIvfPartitioned]] index dir. Same
    * math as [[queryIvf]], but reading only the `nprobe` pruned
    * partitions of the on-disk index. */
  def queryIvfPartitioned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Array[Vector], probe: Array[Double],
      k: Int, nprobe: Int): DataFrame =
    queryIvf(spark.read.parquet(path), centroids, probe, k, nprobe)

  /** Top-k cosine neighbors of `probe`, scanning only the `nprobe`
    * nearest IVF cells. */
  def queryIvf(
      assigned: DataFrame, centroids: Array[Vector], probe: Array[Double],
      k: Int, nprobe: Int): DataFrame = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }
    val probeCells = centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(c.toArray, probe) }
      .take(nprobe).map(_._2)
    val probeCol = lit(probe).cast("array<double>")
    val idCol = assigned.columns.head // buildIvf puts the id first
    assigned
      .filter(col("cell").isin(probeCells.map(Integer.valueOf): _*))
      .withColumn("cos_sim", cosine_sim(col("v"), probeCol))
      .orderBy(col("cos_sim").desc, col(idCol)) // id tiebreak: ties (e.g.
      .limit(k)                                 // duplicate embeddings) must
      .drop("v")                                // not flip the top-k per run
  }

  /** Symmetric per-vector int8 quantization: `q_codes[i] =
    * round(v[i] / q_scale)` with `q_scale = maxAbs/127`. 8× smaller than
    * the float64 arrays it replaces — at corpus scale the ANN index's
    * working set is usually THE memory bound, and cosine is invariant
    * under per-vector positive scaling, so ranking by int8 codes needs
    * no dequantization at all (see [[dequantize]] when raw values are
    * needed). Pure codegen'd array builtins, no UDF. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val scale = greatest(array_max(transform(v, x => abs(x))), lit(1e-12)) / 127.0
    df.withColumn("q_scale", scale)
      .withColumn("q_codes",
        transform(v, x => round(x / col("q_scale")).cast("tinyint")))
  }

  /** Reconstruct approximate doubles from [[quantizeInt8]] output;
    * max abs error is `q_scale / 2` per element. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Deterministic random-hyperplane signature: `bits` sign bits from
    * seeded Gaussian planes, packed into a long. */
  def hyperplaneSignature(df: DataFrame, vecCol: String, dim: Int, bits: Int,
      seed: Long = 42L): DataFrame = {
    require(bits <= 63, "signature packs into a long")
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rng.nextGaussian())
    val sig = udf { (v: Seq[Double]) =>
      var s = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        val p = planes(b)
        while (i < math.min(dim, v.length)) { dot += p(i) * v(i); i += 1 }
        if (dot > 0) s |= (1L << b)
        b += 1
      }
      s
    }
    df.withColumn("signature", sig(col(vecCol).cast("array<double>")))
  }

  /** Candidate pairs whose signatures are within `maxHamming` bits, via
    * band-exact match first (bucketed join), then Hamming filter. */
  def hyperplaneCandidates(
      sigs: DataFrame, idCol: String, bits: Int, bands: Int, maxHamming: Int): DataFrame = {
    require(bits % bands == 0)
    val width = bits / bands
    val mask = (1L << width) - 1
    val banded = sigs.select(col(idCol).as("doc_id"), col("signature"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("signature"), b * width).bitwiseAND(lit(mask))): _*)))
      .toDF("doc_id", "signature", "band", "bh")
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        DedupLib.hammingDistance(col("a.signature"), col("b.signature")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
