package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming dedup/quality twins cross-checked against their batch
  * equivalents, including state carried across micro-batches. */
class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val schema = StructType.fromDDL(
    "doc_id LONG, ingest_ts TIMESTAMP, text STRING")

  private def docsDf(rows: Seq[(Long, Timestamp, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "ingest_ts", "text")
  }

  test("streaming exact dedup drops duplicates across micro-batches") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dir = Files.createTempDirectory("doc_stream").toString
    // micro-batch 1: A, B, and an immediate dup of A
    docsDf(Seq(
      (1L, new Timestamp(base), "alpha beta gamma delta"),
      (2L, new Timestamp(base + 60000), "epsilon zeta eta theta"),
      (3L, new Timestamp(base + 120000), "alpha beta gamma delta")))
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = DocStream.dedupExact(
      spark.readStream.schema(schema).parquet(dir), "ingest_ts", "text")
    val q = stream.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // micro-batch 2: another dup of A (state must persist across
      // batches) + genuinely new C
      docsDf(Seq(
        (4L, new Timestamp(base + 300000), "alpha beta gamma delta"),
        (5L, new Timestamp(base + 360000), "iota kappa lambda mu")))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()

      val out = spark.sql("SELECT doc_id, text FROM dedup_stream").collect()
      val ids = out.map(_.getLong(0)).toSet
      assert(out.length == 3, s"expected 3 survivors, got ${out.toSeq}")
      assert(ids.intersect(Set(3L, 4L)).isEmpty, s"duplicate survived: $ids")
      // batch oracle: same distinct content-hash set
      val batchHashes = docsDf(Seq(
        (1L, new Timestamp(base), "alpha beta gamma delta"),
        (2L, new Timestamp(base + 60000), "epsilon zeta eta theta"),
        (3L, new Timestamp(base + 120000), "alpha beta gamma delta"),
        (4L, new Timestamp(base + 300000), "alpha beta gamma delta"),
        (5L, new Timestamp(base + 360000), "iota kappa lambda mu")))
        .select(md5(col("text"))).distinct().collect().map(_.getString(0)).toSet
      val streamHashes = out.map(r => java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(1).getBytes("UTF-8")).map("%02x".format(_)).mkString).toSet
      assert(streamHashes == batchHashes)
    } finally q.stop()
  }

  test("null-text documents pass through dedup instead of collapsing") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dir = Files.createTempDirectory("doc_stream_nulls").toString
    docsDf(Seq(
      (1L, new Timestamp(base), "alpha beta gamma delta"),
      (2L, new Timestamp(base + 60000), null),
      (3L, new Timestamp(base + 120000), null),
      (4L, new Timestamp(base + 180000), "alpha beta gamma delta")))
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val q = DocStream.dedupExact(
      spark.readStream.schema(schema).parquet(dir), "ingest_ts", "text")
      .writeStream.format("memory").queryName("dedup_null_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_null_stream")
        .collect().map(_.getLong(0)).toSet
      // both null-text docs survive (not duplicates of each other);
      // the real duplicate is still dropped
      assert(ids == Set(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("streaming near-dup dedup matches batch signature-distinct semantics") {
    import org.apache.spark.sql.functions.{col => c}
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val txtA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = Seq(
      (1L, new Timestamp(base), txtA),
      (2L, new Timestamp(base + 60000), txtA), // exact dup → must drop
      (3L, new Timestamp(base + 120000), txtA + " omega"), // trailing edit
      (4L, new Timestamp(base + 180000), "lambda mu nu xi omicron pi rho sigma tau"),
      (5L, new Timestamp(base + 240000), "xy"), // too short to shingle → passes
      (6L, new Timestamp(base + 300000), "zz")) // also short → passes (no collapse)
    val dir = Files.createTempDirectory("doc_neardup").toString
    docsDf(rows).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = DocStream.dedupNear(
      spark.readStream.schema(schema).parquet(dir), "ingest_ts", "text")
      .writeStream.format("memory").queryName("near_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val survivors = spark.sql("SELECT doc_id FROM near_stream")
        .collect().map(_.getLong(0)).toSet
      // batch oracle: keep first doc per distinct signature, all short docs
      val batch = docsDf(rows)
        .withColumn("sig", graft.operators.DedupLib.rowMinhashSig(c("text")))
      val firstPerSig = batch.filter(c("sig").isNotNull)
        .groupBy(c("sig")).agg(org.apache.spark.sql.functions.min(c("doc_id")).as("doc_id"))
        .collect().map(_.getLong(1)).toSet
      val shortDocs = batch.filter(c("sig").isNull)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(survivors == firstPerSig ++ shortDocs,
        s"stream=$survivors batch=${firstPerSig ++ shortDocs}")
      assert(!survivors.contains(2L), "exact dup survived near-dedup")
      assert(Set(5L, 6L).subsetOf(survivors), "short docs must pass through")
    } finally q.stop()
  }

  test("streaming perplexity filter scores against a static LM, stateless") {
    import org.apache.spark.sql.functions.{col => c}
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // reference model from a tiny trusted corpus
    val ref = Seq("the cat sat", "the cat ran", "the dog sat")
    val refGrams = ref.flatMap(_.split(" ").sliding(2).map(_.toSeq))
    val bigrams = refGrams.groupBy(g => s"${g(0)} ${g(1)}").map { case (k, v) => k -> v.size.toLong }
    val unigrams = refGrams.groupBy(_.head).map { case (k, v) => k -> v.size.toLong }
    val rows = Seq(
      (1L, new Timestamp(base), "the cat sat"),       // in-model: low ce
      (2L, new Timestamp(base), "zz qq ww ee rr tt"), // all unseen: ce = unseenCe
      (3L, new Timestamp(base), "the dog ran"))       // "dog ran" unseen: mixed
    val dir = Files.createTempDirectory("doc_ppx").toString
    docsDf(rows).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = DocStream.perplexityFilter(
      spark.readStream.schema(schema).parquet(dir), "text",
      bigrams, unigrams, maxCe = 5.0)
      .writeStream.format("memory").queryName("ppx_stream")
      .outputMode("append").start() // append legal: zero streaming state
    try {
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id, ce FROM ppx_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(kept.contains(1L) && !kept.contains(2L), s"kept=$kept")
      // doc 1: P(cat|the)=2/3? no — ce = avg(ln c1 - ln c12):
      // "the cat": ln(3)-ln(2); "cat sat": ln(2)-ln(1)
      val expect1 = (math.log(3) - math.log(2) + math.log(2) - math.log(1)) / 2
      assert(math.abs(kept(1L) - expect1) < 1e-5, s"ce(1)=${kept(1L)} want $expect1")
      // batch parity: same function on a batch frame gives identical ce
      val batchCe = DocStream.perplexityFilter(docsDf(rows), "text",
        bigrams, unigrams, maxCe = 5.0)
        .select(c("doc_id"), c("ce")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(batchCe == kept, s"stream=$kept batch=$batchCe")
    } finally q.stop()
  }

  test("streaming quality filter matches batch formula") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq(
      (1L, new Timestamp(base), ("token " * 120).trim), // long doc, high score
      (2L, new Timestamp(base), "tiny"),                // short doc, low score
      (3L, new Timestamp(base), ("plump words here " * 40).trim))
    val dir = Files.createTempDirectory("doc_quality").toString
    docsDf(rows).coalesce(1).write.mode("overwrite").parquet(dir)

    val q = DocStream.qualityFilter(
      spark.readStream.schema(schema).parquet(dir), "text", 0.5)
      .writeStream.format("memory").queryName("quality_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, quality FROM quality_stream ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val batch = DocStream.qualityFilter(docsDf(rows), "text", 0.5)
        .select("doc_id", "quality").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(streamed.toSeq == batch.toSeq)
      assert(!streamed.map(_._1).contains(2L), "short doc must be filtered")
    } finally q.stop()
  }

  test("streaming PII scrub masks every class and matches the batch definition") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq(
      (1L, new Timestamp(base), "call me at 12-345-678-9012 today"),
      (2L, new Timestamp(base), "mail bob42@corp.example or ping 10.0.12.7 twice"),
      (3L, new Timestamp(base), "nothing sensitive here at all"))
    val dir = Files.createTempDirectory("doc_pii").toString
    docsDf(rows).coalesce(1).write.mode("overwrite").parquet(dir)

    val q = DocStream.piiScrub(
      spark.readStream.schema(schema).parquet(dir), "text")
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, text, n_pii FROM pii_stream ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val batch = DocStream.piiScrub(docsDf(rows), "text")
        .select("doc_id", "text", "n_pii").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(streamed.toSeq == batch.toSeq)
      assert(streamed(0)._2 == "call me at [PHONE] today" && streamed(0)._3 == 1L)
      assert(streamed(1)._2 == "mail [EMAIL] or ping [IP] twice" && streamed(1)._3 == 2L)
      assert(streamed(2)._2 == "nothing sensitive here at all" && streamed(2)._3 == 0L)
    } finally q.stop()
  }

  test("streaming normalization matches the batch definition byte-for-byte") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq(
      (1L, new Timestamp(base), "  MIXED Case   spacing  "),
      (2L, new Timestamp(base), "tab\there bell\u0007gone"),
      (3L, new Timestamp(base), "already clean text"))
    val dir = Files.createTempDirectory("doc_norm").toString
    docsDf(rows).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = DocStream.normalizeDocs(
      spark.readStream.schema(schema).parquet(dir), "text")
      .writeStream.format("memory").queryName("norm_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, text, norm_md5 FROM norm_stream ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val batch = DocStream.normalizeDocs(docsDf(rows), "text")
        .select("doc_id", "text", "norm_md5").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(streamed.toSeq == batch.toSeq)
      assert(streamed(0)._2 == "mixed case spacing")
      // tab and bell are both non-printable: stripped, never spaced
      assert(streamed(1)._2 == "tabhere bellgone")
      assert(streamed(2)._2 == "already clean text")
    } finally q.stop()
  }

  test("streaming semantic dedup drops same-cell same-sign-bucket vectors, null vecs pass") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val centroids = Seq(
      0L -> Array(1.0, 0.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0, 0.0))
    val rows = Seq(
      (1L, new Timestamp(base), Seq(1.0, 0.1, 0.2, 0.3)),   // cell 0, bucket 1111
      (2L, new Timestamp(base + 60000), Seq(1.0, 0.1, 0.2, 0.3)),  // exact dup → drop
      (3L, new Timestamp(base + 120000), Seq(2.0, 0.2, 0.4, 0.6)), // scaled copy: same cosine, same signs → drop
      (4L, new Timestamp(base + 180000), Seq(0.1, 1.0, -0.5, 0.2)), // cell 1, different bucket → survives
      (5L, new Timestamp(base + 240000), null: Seq[Double]),        // null vec → passes
      (6L, new Timestamp(base + 300000), Seq(-1.0, -0.1, -0.2, -0.3))) // bucket 0000 → survives
    val vecsDf = rows.toDF("vec_id", "ingest_ts", "embedding")
    val dir = Files.createTempDirectory("vec_semdedup").toString
    vecsDf.coalesce(1).write.mode("overwrite").parquet(dir)
    val vschema = StructType.fromDDL(
      "vec_id LONG, ingest_ts TIMESTAMP, embedding ARRAY<DOUBLE>")
    val q = DocStream.dedupSemantic(
      spark.readStream.schema(vschema).parquet(dir), "ingest_ts", "embedding",
      centroids, bits = 4)
      .writeStream.format("memory").queryName("sem_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val survivors = spark.sql("SELECT vec_id FROM sem_stream")
        .collect().map(_.getLong(0)).toSet
      assert(survivors == Set(1L, 4L, 5L, 6L), survivors.toString)
      // batch cross-check: survivors = min id per (cell, bucket) + null vecs
      val v = col("embedding")
      val keyed = vecsDf.filter(v.isNotNull)
        .withColumn("key", concat(
          graft.operators.DedupLib.nearestCell(v, centroids).cast("string"),
          lit(":"), graft.operators.VectorOps.signBucket(v, 4)))
        .groupBy(col("key")).agg(min(col("vec_id")).as("vec_id"))
        .collect().map(_.getLong(1)).toSet
      val nullVecs = vecsDf.filter(v.isNull)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(survivors == keyed ++ nullVecs, s"stream=$survivors batch=${keyed ++ nullVecs}")
    } finally q.stop()
  }

  test("classifyIncremental matches the batch dedup_incremental tiers on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.operators.Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    // fpp tiny enough that a bloom false positive is effectively
    // impossible at 400 keys — the parity assert is exact
    val out = DocStream.classifyIncremental(
        batch, "text", existing, "text", expectedItems = 1000, fpp = 1e-9)
      .select("doc_id", "status")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val oracle = graft.operators.DedupOps.queries("dedup_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == oracle, {
      val diff = (out.keySet ++ oracle.keySet)
        .filter(k => out.get(k) != oracle.get(k))
      s"mismatch at $diff: stream ${diff.map(out.get)}, batch ${diff.map(oracle.get)}"
    })
    assert(oracle.values.exists(_ == "near_dup"), "corpus should exercise the near tier")
  }

  test("classifyIncremental is streaming-legal and classifies across micro-batches") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dir = Files.createTempDirectory("doc_stream_incr").toString
    val existing = docsDf(Seq(
      (1L, new Timestamp(base), "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, new Timestamp(base), "some shared paragraph that will be lightly edited in the new batch soon")))
    docsDf(Seq(
      (10L, new Timestamp(base + 60000), "the quick brown fox jumps over the lazy dog again and again today")))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = DocStream.classifyIncremental(
      spark.readStream.schema(schema).parquet(dir), "text",
      existing, "text", expectedItems = 100, fpp = 1e-9)
    val q = stream.writeStream.format("memory").queryName("incr_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      docsDf(Seq(
        (15L, new Timestamp(base + 120000), "some shared paragraph that will be lightly edited in the new batch now"),
        (20L, new Timestamp(base + 180000), "entirely fresh material mentioning neither foxes nor paragraphs at all whatsoever")))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, status FROM incr_stream")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(out == Map(10L -> "exact_dup", 15L -> "near_dup", 20L -> "new"), out.toString)
    } finally q.stop()
  }

  /** Builds the hashed-bigram LM-ratio table exactly as the batch
    * `sample_importance` query does (target = quality ≥ 0.62, add-1
    * smoothing, 4096 md5 buckets, terms rounded to 6dp HALF_UP). */
  private def buildLmTerms(sf: String): Map[String, Double] = {
    import graft.operators.{Tables, TextOps}
    val bg = Tables.documents(spark, sf)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 2)
      .select(
        (round(TextOps.qualityScore(col("text")), 4) >= 0.62).as("tgt"),
        explode(transform(
          sequence(lit(1), size(col("w")) - 1),
          i => concat(element_at(col("w"), i), lit(" "),
            element_at(col("w"), i + 1)))).as("bgram"))
      .select(col("tgt"), substring(md5(col("bgram")), 1, 3).as("bucket"))
    val lm = bg.groupBy(col("bucket"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("tc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tr = lm.map(_._2).sum.toDouble
    val tt = lm.map(_._3).sum.toDouble
    lm.map { case (bucket, rc, tc) =>
      val term = math.log((tc + 1.0) / (tt + 4096.0)) -
        math.log((rc + 1.0) / (tr + 4096.0))
      bucket -> BigDecimal(term)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("importanceScore matches the batch sample_importance top-20 bit-for-bit") {
    val sf = "/root/testdata/sf0.001"
    val lmTerms = buildLmTerms(sf)
    // stateless function applied to the batch frame: same code path the
    // stream runs, minus the micro-batch plumbing (covered below)
    val scored = DocStream.importanceScore(
        graft.operators.Tables.documents(spark, sf), "text", lmTerms,
        defaultTerm = 0.0)
      .filter(col("logw").isNotNull)
      .select(col("doc_id"), col("logw"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val top20 = scored.sortBy { case (id, w) => (-w, id) }.take(20)
      .zipWithIndex.map { case ((id, w), i) => (i + 1L, id, w) }.toSeq
    val batch = graft.operators.CurationOps.queries("sample_importance")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(top20 == batch,
      s"stream-vs-batch divergence:\n stream=$top20\n batch=$batch")
  }

  test("importanceScore is streaming-legal and scores across micro-batches") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dir = Files.createTempDirectory("doc_stream_dsir").toString
    // one bucket table entry per planted bigram; unseen buckets take the default
    def bucket(bg: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(3)
    val lm = Map(bucket("alpha beta") -> 2.5, bucket("beta gamma") -> -1.25)
    docsDf(Seq((1L, new Timestamp(base), "alpha beta gamma")))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = DocStream.importanceScore(
      spark.readStream.schema(schema).parquet(dir), "text", lm,
      defaultTerm = -0.5)
    val q = stream.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      docsDf(Seq(
        (2L, new Timestamp(base + 60000), "alpha beta unknown"),
        (3L, new Timestamp(base + 120000), "word")))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, logw FROM dsir_stream")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      // doc 1: 2.5 + (-1.25); doc 2: 2.5 + default(-0.5); doc 3: < 2 words
      assert(out == Map(1L -> Some(1.25), 2L -> Some(2.0), 3L -> None), out.toString)
    } finally q.stop()
  }

  test("streaming SpaceSaving top-k equals the batch query after state-store round-trips") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("doc_topk").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    // two micro-batches so the summary buffer must round-trip the
    // streaming state store between them (serialize/merge/deserialize
    // in anger, not just across one job's shuffle)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val stream = DocStream.topkTokens(
      spark.readStream.schema(StructType.fromDDL(
        "doc_id LONG, lang STRING, text STRING")).parquet(dir),
      "text", "lang")
    val q = stream.select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("col.token").as("word"), col("col.cnt").as("n"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT lang, rk, word, n FROM topk_stream")
        .as[(String, Long, String, Long)].collect().toSet
      val batch = graft.operators.CorpusOps.queries("text_topk_spacesaving")(spark, sf)
        .select(col("lang"), col("rk"), col("word"), col("n"))
        .as[(String, Long, String, Long)].collect().toSet
      assert(streamed == batch,
        s"stream-batch diff: ${(streamed -- batch) ++ (batch -- streamed)}")
      assert(streamed.size == 50)
    } finally q.stop()
  }
}
