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
      .filter(col("cell").isin(probeCells.toIndexedSeq.map(Integer.valueOf): _*))
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

  /** Product-quantization codebooks: the embedding dimension is split
    * into `m` subspaces and each subspace gets its own `ksub`-centroid
    * k-means codebook. A vector encodes to `m` BYTES (one centroid id
    * per subspace) — dim=128 float64 vectors compress 1024→m bytes, the
    * compression regime (64–256×) that lets a 100 TB corpus's ANN index
    * live in executor memory, which int8 scalar quantization (8×,
    * [[quantizeInt8]]) cannot reach.
    *
    * Codebooks train on a driver-side sample (`sampleRows` rows — PQ
    * codebooks are classically trained on ~10⁵ samples regardless of
    * corpus size; the FULL corpus is never collected), then ride to
    * executors as a broadcast inside the encode/query closures. */
  case class PqModel(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def dim: Int = m * subDim
  }

  def trainPq(df: DataFrame, vecCol: String, m: Int, ksub: Int,
      seed: Long = 42L, sampleRows: Int = 10000): PqModel = {
    require(ksub <= 256, "one byte per subspace code")
    // collect the sample ONCE: an unordered limit() re-executes per
    // job with whatever rows arrive first, so re-scanning it for each
    // subspace fit would train the m codebooks on m different
    // nondeterministic samples. The sample is bounded by design
    // (classical PQ trains on ~10^5 rows), so one driver copy is the
    // deterministic AND cheaper shape (m+1 scans → 1).
    val sample: Array[Seq[Double]] = df
      .select(col(vecCol).cast("array<double>").as("_v"))
      .limit(sampleRows)
      .collect().map(_.getSeq[Double](0))
    require(sample.nonEmpty, "trainPq: empty input")
    val dim = sample.head.length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val subDim = dim / m
    val spark = df.sparkSession
    val codebooks = (0 until m).map { j =>
      val sub = spark.createDataFrame(sample.toSeq.map(v =>
        Tuple1(org.apache.spark.ml.linalg.Vectors.dense(
          v.slice(j * subDim, (j + 1) * subDim).toArray))))
        .toDF("_features")
      new KMeans().setK(ksub).setSeed(seed + j)
        .setFeaturesCol("_features").setPredictionCol("_cell")
        .fit(sub).clusterCenters.map(_.toArray)
    }.toArray
    PqModel(subDim, codebooks)
  }

  /** Encode vectors to `m`-byte PQ codes (column `pq_code`, binary).
    * A typed UDF is the right tool here: per-row argmin over a
    * broadcast codebook is a tight numeric loop with no builtin
    * equivalent, and the 100-TB shape is one embarrassingly-parallel
    * scan — no shuffle, no driver involvement. */
  def encodePq(df: DataFrame, vecCol: String, model: PqModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf { (v: Seq[Double]) =>
      val mdl = bc.value
      val out = new Array[Byte](mdl.m)
      var j = 0
      while (j < mdl.m) {
        val cb = mdl.codebooks(j)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var d = 0.0; var i = 0
          val cent = cb(c)
          while (i < mdl.subDim) {
            val diff = v(j * mdl.subDim + i) - cent(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(j) = best.toByte // raw 0..255, decode with & 0xFF
        j += 1
      }
      out
    }
    df.withColumn("pq_code", enc(col(vecCol).cast("array<double>")))
  }

  /** Asymmetric-distance top-k: the probe stays EXACT and only corpus
    * vectors are quantized — per subspace, squared distances from the
    * probe's sub-vector to all `ksub` centroids form an m×ksub lookup
    * table built once on the driver; each row's approximate squared L2
    * distance is then m table lookups over its code bytes. For
    * L2-normalized embeddings min-L2 == max-cosine, so this ranks
    * cosine too. Ends in orderBy+limit (distributed top-k). */
  def adcTopK(encoded: DataFrame, idCol: String, model: PqModel,
      probe: Array[Double], k: Int): DataFrame = {
    require(probe.length == model.dim, s"probe dim ${probe.length} != ${model.dim}")
    val lut: Array[Array[Double]] = Array.tabulate(model.m) { j =>
      model.codebooks(j).map { cent =>
        var d = 0.0; var i = 0
        while (i < model.subDim) {
          val diff = probe(j * model.subDim + i) - cent(i); d += diff * diff; i += 1
        }
        d
      }
    }
    val bc = encoded.sparkSession.sparkContext.broadcast(lut)
    val score = udf { (code: Array[Byte]) =>
      val t = bc.value
      var d = 0.0; var j = 0
      while (j < code.length) { d += t(j)(code(j) & 0xFF); j += 1 }
      d
    }
    encoded.withColumn("adc_dist", score(col("pq_code")))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }

  /** The standard PQ serving pipeline: ADC shortlist (cheap, code-only)
    * → EXACT re-rank of the shortlist against the raw vectors. ADC
    * cannot rank below its quantization resolution — co-located points
    * share a code and tie — so production ANN always re-ranks a
    * `shortlist`-sized ADC cut (typically 5–20×k) with true distances.
    * Only `shortlist` rows ever touch their raw vectors; the corpus
    * scan stays code-only. */
  def pqTopKRerank(encoded: DataFrame, idCol: String, vecCol: String,
      model: PqModel, probe: Array[Double], k: Int, shortlist: Int = 0): DataFrame = {
    val sl = if (shortlist > 0) shortlist else 10 * k
    val probeCol = lit(probe).cast("array<double>")
    val exact = aggregate(
      zip_with(col(vecCol).cast("array<double>"), probeCol, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    adcTopK(encoded, idCol, model, probe, sl)
      .withColumn("dist", exact)
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .drop("adc_dist")
  }

  /** IVF-PQ composition — the standard billion-scale ANN index layout:
    * the IVF cell prunes WHICH rows are scanned (partition/file level
    * when the table is written partitioned by cell), PQ codes shrink
    * WHAT is scanned to m bytes/row, and the exact re-rank touches raw
    * vectors for only the shortlist. Encode once with both; query cost
    * becomes (corpus/cells)×nprobe code lookups + shortlist exact math. */
  def encodeIvfPq(df: DataFrame, idCol: String, vecCol: String,
      cells: Int, m: Int, ksub: Int, seed: Long = 42L): (DataFrame, Array[Vector], PqModel) = {
    val (assigned, centroids) = buildIvf(df, idCol, vecCol, cells, seed)
    val model = trainPq(assigned, "v", m, ksub, seed)
    (encodePq(assigned, "v", model), centroids, model)
  }

  /** Top-k over an [[encodeIvfPq]] index: prune to the `nprobe` nearest
    * cells, ADC-score their codes, exact-re-rank a `shortlist`. Cell
    * ranking uses L2 distance — the SAME metric k-means used to assign
    * rows and ADC uses to score — so the cells scanned are the ones the
    * true L2 neighbors actually live in (a cosine ranking here would
    * probe the wrong cells for non-normalized embeddings). */
  def queryIvfPq(encoded: DataFrame, idCol: String,
      centroids: Array[Vector], model: PqModel, probe: Array[Double],
      k: Int, nprobe: Int, shortlist: Int = 0): DataFrame = {
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i) - b(i); d += x * x; i += 1
      }
      d
    }
    val probeCells = centroids.zipWithIndex
      .sortBy { case (c, i) => (l2sq(c.toArray, probe), i) }
      .take(nprobe).map(_._2)
    pqTopKRerank(
      encoded.filter(col("cell").isin(probeCells.toIndexedSeq.map(Integer.valueOf): _*)),
      idCol, "v", model, probe, k, shortlist)
  }

  /** Reconstruct the quantized approximation of a coded vector
    * (codebook centroids concatenated) — the reconstruction error IS
    * the quantization error ADC pays. */
  def pqReconstruct(code: Array[Byte], model: PqModel): Array[Double] = {
    val out = new Array[Double](model.dim)
    var j = 0
    while (j < model.m) {
      System.arraycopy(model.codebooks(j)(code(j) & 0xFF), 0, out, j * model.subDim, model.subDim)
      j += 1
    }
    out
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
