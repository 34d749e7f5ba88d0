package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `documents` table shape — the
  * unbounded twin of [[graft.operators.DedupOps]]/[[graft.operators.TextOps]]
  * for continuous corpus ingestion.
  *
  * Scale notes: exact dedup keys its state by the 16-byte content hash
  * only (never the document payload), and
  * `dropDuplicatesWithinWatermark` expires that state once the watermark
  * passes — bounded state on an unbounded stream, the only shape that
  * survives a firehose of training documents. Quality filtering is
  * stateless and stays inside WholeStageCodegen.
  */
object DocStream {

  /** Streaming exact dedup: drops payload-identical documents arriving
    * within the watermark horizon of each other. State = one 16-byte
    * binary dedup key per distinct doc seen inside the horizon
    * (`unhex(md5)` — full 128-bit collision resistance at half the
    * bytes of the hex string); late duplicates beyond the horizon are a
    * deliberate recall/state tradeoff (tune `watermark` to the re-post
    * window that matters).
    *
    * Null policy: null-text documents PASS THROUGH (their emitted
    * `content_hash` stays NULL) — nulls are not duplicates of each
    * other, so each gets a surrogate dedup key derived from `idCol`
    * instead of collapsing under `md5(NULL)`. Single-pass design: one
    * source scan, one stateful operator (an earlier null-branch +
    * union variant read the source twice per micro-batch). The
    * surrogate keys do occupy dedup state until the watermark expires
    * them — 16 bytes per null doc, the price of one scan instead of
    * two. A row with BOTH `textCol` and `idCol` null gets a null key
    * and will collapse with other such rows; filter those upstream. */
  def dedupExact(
      docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "2 hours", idCol: String = "doc_id"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .withColumn("content_hash", unhex(md5(col(textCol))))
      .withColumn("graft_dedup_key",
        coalesce(col("content_hash"),
          unhex(md5(concat(lit("graft:null-text:"), col(idCol).cast("string"))))))
      .dropDuplicatesWithinWatermark("graft_dedup_key")
      .drop("graft_dedup_key")

  /** Streaming NEAR-dup dedup: drops documents whose full per-row
    * MinHash signature ([[graft.operators.DedupLib.rowMinhashSig]] —
    * one codegen'd projection, no explode/groupBy, so the plan stays a
    * single stateful operator) matches a document seen within the
    * watermark horizon. State = one 8-byte long per distinct signature
    * — even smaller than exact dedup's 16-byte hash.
    *
    * Semantics: all-k-minhashes equality ⇒ catches near-IDENTICAL docs
    * (boilerplate reposts, trailing-edit copies) at very high
    * precision; moderately-similar pairs intentionally pass (see
    * rowMinhashSig scaladoc — banded matching would raise recall but
    * multiply state k-fold and admit band-collision false drops).
    * Docs too short to shingle (and null text) pass through via a
    * surrogate id key, like [[dedupExact]]. */
  def dedupNear(
      docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "2 hours", k: Int = 8, shingleWords: Int = 3,
      idCol: String = "doc_id"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .withColumn("near_sig",
        graft.operators.DedupLib.rowMinhashSig(col(textCol), k, shingleWords))
      .withColumn("graft_near_key",
        coalesce(col("near_sig"),
          xxhash64(lit("graft:short-doc:"), col(idCol).cast("string"))))
      .dropDuplicatesWithinWatermark("graft_near_key")
      .drop("graft_near_key")

  /** Streaming twin of the batch `dedup_incremental` gate: classify
    * each arriving document against a STATIC existing corpus as
    * `exact_dup` (content hash present), `near_dup` (shares an md5-
    * family LSH band key — [[graft.operators.DedupLib.rowLshBands]],
    * the same banding as the batch path), or `new`, with the same
    * exact > near precedence.
    *
    * The existing-side indexes ride as two BROADCAST BLOOM FILTERS
    * (content hashes; band keys) built once at composition time from
    * the static frame — at 100 TB that frame is the hash/band-key table
    * a graft-store persists between ingests, and the blooms are MBs
    * regardless of corpus size. Classification itself is a pure
    * stateless projection (hash probe + `exists` over the row-local
    * band array): append-mode legal, no join, no state, composes with
    * the stateful dedup gates downstream. Bloom semantics: no false
    * negatives — a true duplicate is never classified `new`; false
    * positives at ≈`fpp` can upgrade a genuinely-new doc to dup status
    * (the safe direction for an ingest gate; exact-or-nothing callers
    * run the batch query's semi joins instead). Appends `status`. */
  def classifyIncremental(docs: DataFrame, textCol: String,
      existing: DataFrame, existingTextCol: String,
      expectedItems: Long, fpp: Double = 1e-4): DataFrame = {
    import graft.operators.DedupLib
    val sc = existing.sparkSession.sparkContext
    val hashBf = existing
      .select(md5(col(existingTextCol)).as("k")).na.drop()
      .stat.bloomFilter("k", math.max(expectedItems, 1), fpp)
    val bandBf = existing
      .select(explode(DedupLib.rowLshBands(col(existingTextCol))).as("k"))
      .stat.bloomFilter("k", math.max(expectedItems, 1) * 4, fpp)
    val hB = sc.broadcast(hashBf)
    val bB = sc.broadcast(bandBf)
    val hasHash = udf((k: String) => k != null && hB.value.mightContainString(k))
    val hasBand = udf((k: String) => k != null && bB.value.mightContainString(k))
    docs.withColumn("status",
      when(hasHash(md5(col(textCol))), "exact_dup")
        .when(exists(DedupLib.rowLshBands(col(textCol)), b => hasBand(b)),
          "near_dup")
        .otherwise("new"))
  }

  /** Perplexity filtering at INGEST: score each streaming document's
    * average bigram cross-entropy against a static language model
    * (reference counts from a trusted corpus, e.g. the batch
    * `text_perplexity` machinery) and keep docs at or below `maxCe`.
    *
    * The model rides as vocabulary-bounded MAP LITERALS evaluated
    * per-row (`element_at` lookups inside one projection) — no join, no
    * aggregation, NO STATE: a per-doc groupBy would turn this into an
    * unbounded streaming aggregation, while a pure projection stays
    * append-mode legal and composes freely with the stateful dedup
    * gates. Unseen bigrams score `unseenCe` (fixed penalty — an ingest
    * filter cannot consult corpus-global smoothing it hasn't seen);
    * docs shorter than 2 words score `unseenCe` too. Appends `ce`. */
  def perplexityFilter(docs: DataFrame, textCol: String,
      bigramCounts: Map[String, Long], unigramCounts: Map[String, Long],
      maxCe: Double, unseenCe: Double = 10.0): DataFrame = {
    val bm = typedlit(bigramCounts)
    val um = typedlit(unigramCounts)
    val w = col("__w") // attribute reference: cheap inside lambdas
    val terms = transform(sequence(lit(1), size(w) - 1), i => {
      val c1 = element_at(um, element_at(w, i))
      val c12 = element_at(bm,
        concat_ws(" ", element_at(w, i), element_at(w, i + 1)))
      when(c1.isNull || c12.isNull, lit(unseenCe))
        .otherwise(round(log(c1) - log(c12), 6))
    })
    val ce = when(size(w) >= 2,
      aggregate(terms, lit(0.0), (a, x) => a + x) / size(terms))
      .otherwise(lit(unseenCe))
    docs.withColumn("__w", split(col(textCol), " "))
      .withColumn("ce", ce)
      .filter(col("ce") <= maxCe)
      .drop("__w")
  }

  /** Stateless DSIR importance scoring against a STATIC hashed-bigram
    * LM-ratio table — the streaming twin of the batch
    * `sample_importance` query: per document,
    * logw = Σ over bigrams of term(bucket), where each term is the
    * batch job's round(ln p_target − ln p_raw, 6) for that md5 bucket.
    * The 4096-entry table rides as a MAP LITERAL (`element_at` lookups
    * in one projection — no join, no aggregation, NO STATE, same
    * discipline as [[perplexityFilter]]), and terms accumulate as exact
    * DECIMAL, so a document's stream score is bit-identical to what the
    * batch query would assign it. Buckets absent from the table
    * (corpus drift after the LM snapshot) score `defaultTerm`; docs
    * shorter than 2 words get NULL. Appends `logw`. */
  def importanceScore(docs: DataFrame, textCol: String,
      lmTerms: Map[String, Double], defaultTerm: Double): DataFrame = {
    val lm = typedlit(lmTerms)
    val w = col("__w") // attribute reference: cheap inside lambdas
    val terms = transform(sequence(lit(1), size(w) - 1), i =>
      coalesce(
        element_at(lm, substring(md5(
          concat(element_at(w, i), lit(" "), element_at(w, i + 1))), 1, 3)),
        lit(defaultTerm)).cast("decimal(18,6)"))
    docs.withColumn("__w", split(col(textCol), " "))
      .withColumn("logw",
        when(size(w) >= 2,
          round(aggregate(terms, lit(BigDecimal(0)).cast("decimal(28,6)"),
            (a, x) => (a + x).cast("decimal(28,6)")).cast("double"), 6)))
      .drop("__w")
  }

  /** Stateless normalization-on-ingest: the batch `text_normalize`
    * cleaning pass ([[graft.operators.TextOps.normalizeText]] — one
    * shared definition, so the stored bytes are identical whichever
    * path a document arrived by) applied per micro-batch, annotating
    * the normalized md5 for the downstream exact-dup gate. Pure
    * row-local projection → append-mode legal, no state, no
    * watermark. */
  def normalizeDocs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn(textCol,
        graft.operators.TextOps.normalizeText(col(textCol)))
      .withColumn("norm_md5", md5(col(textCol)))

  /** Stateless PII scrub: masks every class in
    * [[graft.operators.TextOps.PiiPatterns]] (the SAME definition the
    * batch `text_pii_redact` audit and its oracle use) and annotates the
    * count of masked spans — the streaming half of the scrub-on-ingest
    * discipline: PII never reaches the store, and `n_pii` feeds the
    * same per-language audit the batch query reports. Pure row-local
    * projection → append-mode legal, no state, no watermark. */
  def piiScrub(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("n_pii",
        graft.operators.TextOps.PiiPatterns
          .map { case (p, _) =>
            size(regexp_extract_all(col(textCol), lit(p), lit(0)))
          }
          .reduce(_ + _).cast("long"))
      .withColumn(textCol,
        graft.operators.TextOps.piiRedact(col(textCol)))

  /** Stateless quality gate: literally the batch `text_quality` formula
    * ([[graft.operators.TextOps.qualityScore]] — one shared definition,
    * so a gate value means the same thing in both engines), applied per
    * document as it streams in. */
  def qualityFilter(docs: DataFrame, textCol: String, minScore: Double): DataFrame =
    docs.withColumn("quality",
        round(graft.operators.TextOps.qualityScore(col(textCol)), 4))
      .filter(col("quality") >= minScore)

  /** Streaming SEMANTIC dedup over an embedding column: drops vectors
    * whose quantized semantic key — nearest codebook cell
    * ([[graft.operators.DedupLib.nearestCell]], a stateless literal-
    * codebook projection) concatenated with the sign pattern of the
    * first `bits` dimensions — matches one seen within the watermark.
    *
    * The batch SemDeDup ([[graft.operators.DedupLib.semanticDedup]])
    * verifies exact in-cell pairwise cosines; a stream cannot look
    * across rows, so this is the quantized-key relaxation — the same
    * design trade as [[dedupNear]] vs the banded batch minhash:
    * near-identical embeddings collide on the key at high precision,
    * moderately-similar pairs intentionally pass. State = one compact
    * string key per distinct (cell, sign-bucket) inside the horizon.
    * Null/empty vectors pass through via a surrogate id key. */
  def dedupSemantic(vecs: DataFrame, tsCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Double])], bits: Int = 8,
      watermark: String = "2 hours", idCol: String = "vec_id"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val key = concat(
      graft.operators.DedupLib.nearestCell(v, centroids).cast("string"),
      lit(":"), graft.operators.VectorOps.signBucket(v, bits))
    vecs.withWatermark(tsCol, watermark)
      .withColumn("graft_sem_key",
        when(v.isNull || size(v) === 0,
          concat(lit("graft:null-vec:"), col(idCol).cast("string")))
          .otherwise(key))
      .dropDuplicatesWithinWatermark("graft_sem_key")
      .drop("graft_sem_key")
  }

  /** Streaming heavy hitters: the [[graft.functions.SpaceSavingTopK]]
    * aggregate applied DIRECTLY to an unbounded token stream — a
    * mergeable fixed-capacity summary is streaming-legal by
    * construction, so the same UDAF that answers the batch
    * `text_topk_spacesaving` query becomes the per-group stream state
    * with no reformulation: each micro-batch's partials merge into the
    * state-store buffer through the aggregate's own
    * serialize/merge/deserialize path (which this exercises in anger —
    * the buffer round-trips the state store BETWEEN micro-batches, not
    * just across one job's shuffle). Complete/update output modes;
    * state per group is the capacity-bounded summary, never the
    * vocabulary. In the sized-to-domain exact regime the running
    * output equals the batch query over everything ingested so far
    * (DocStreamSpec pins final state == batch on the real corpus). */
  def topkTokens(docs: DataFrame, textCol: String, langCol: String,
      capacity: Int = 64, k: Int = 10): DataFrame =
    docs
      .select(col(langCol).as("lang"),
        explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("lang"))
      .agg(graft.functions.GraftAggregates
        .spacesavingTopK(col("word"), capacity, k).as("top"))
}
