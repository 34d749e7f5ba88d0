package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-assembly operators over `documents`: vocabulary construction
  * and deterministic sequence packing — the steps between "curated
  * documents" and "training batches" in an LLM data pipeline.
  *
  * Scale notes (100 TB): vocabulary counting is explode → partial
  * (map-side) aggregate → final aggregate, so the shuffle carries one
  * row per distinct (lang, word) per map partition, not one per token;
  * hot words (Zipf head) are safe because the groupBy key spreads them
  * across reducers and AQE re-splits any residual skew. The top-k
  * window then runs over the already-aggregated vocab table — orders of
  * magnitude smaller than the corpus. Packing partitions by
  * (lang, source) so window state per task is one shard's documents,
  * never a whole language; at real scale the same shape runs per
  * (source, shard-id) with range-partitioned doc ids.
  */
object CorpusOps {
  import Tables._

  /** Tokens-per-packed-sequence budget for `text_pack_sequences` —
    * small enough that sf0.01 groups still split into multiple bins. */
  val PackBudget = 256

  /** `text_chunk_overlap` window geometry: 32-token chunks every 24
    * tokens (8-token overlap) — small enough that ~60-word synthetic
    * docs still produce several chunks each. */
  val ChunkSize = 32
  val ChunkStride = 24

  /** corpus_tokenize_bpe merge rounds — the declarative end-to-end twin
    * of [[CorpusLib.bpeTrain]]'s driver loop. */
  val BpeRounds = 6

  /** Sentinel char for merge round i (control range, absent from the
    * corpus); the merged symbol becomes ONE char so later rounds' pair
    * windows stay 2 chars wide. */
  private def bpeSentinel(i: Int): String = ("" + i.toChar)

  /** Decode sentinels back to <i> markers for a readable, engine-
    * portable pair column. */
  private def bpeDecode(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (1 to BpeRounds).foldLeft(c)((acc, j) =>
      replace(acc, lit(bpeSentinel(j)), lit(s"<$j>")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // End-to-end BPE tokenization under the oracle: BpeRounds merge
    // rounds run as ONE declarative plan — per round, count adjacent
    // symbol pairs over the (vocab-sized, never corpus-sized) word
    // table, broadcast the 1-row argmax winner, greedily re-symbolize
    // via replace (left-to-right non-overlap = string replace
    // semantics, the text_bpe_merges2 argument), and emit the round's
    // (pair, weighted merge count, corpus tokens after) — the
    // compression curve a tokenizer owner reads, with the merge TABLE
    // itself in training order. Each round's re-symbolized vocab is
    // lazily checkpointed (it feeds the next round's counts AND its
    // own token total). This is [[CorpusLib.bpeTrain]]'s algorithm with
    // zero driver-side segmentation state; the DuckDB oracle replays
    // all rounds as a generated CTE chain.
    "corpus_tokenize_bpe" -> { (s, dir) =>
      def pairsOf(vdf: DataFrame): DataFrame = vdf
        .filter(length(col("w")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      var vocab = documents(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
        .localCheckpoint(eager = false)
      var out: DataFrame = null
      for (i <- 1 to BpeRounds) {
        val top = pairsOf(vocab).orderBy(col("n").desc, col("pair")).limit(1)
          .select(col("pair").as("m"), col("n").as("mn"))
        val re = vocab.crossJoin(broadcast(top))
          .select(replace(col("w"), col("m"), lit(bpeSentinel(i))).as("w"),
            col("wc"), col("m"), col("mn"))
          .localCheckpoint(eager = false)
        val stat = re
          .agg(sum(col("wc") * length(col("w"))).cast("long").as("tokens_after"),
            max(col("m")).as("m"), max(col("mn")).as("mn"))
          .select(lit(i.toLong).as("round"), bpeDecode(col("m")).as("pair"),
            col("mn").cast("long").as("n_merged"), col("tokens_after"))
        out = if (out == null) stat else out.unionAll(stat)
        vocab = re.select(col("w"), col("wc"))
      }
      out.orderBy(col("round"))
    },
    // Curriculum schedule: docs bucket by quality (0.1-wide bands), and
    // the schedule reads highest-quality-first with a running token
    // budget — "train on the cleanest N billion tokens first", the
    // data-ordering knob curriculum-learning pipelines expose. Scale
    // shape: the corpus collapses to ≤11 bucket rows via one
    // partial-aggregated pass (bucketing is an absolute-score
    // projection, NOT an NTILE — a global rank window would serialize
    // the corpus through one task); the cumulative sum runs on the
    // 11-row schedule. Ordering is quality DESC, so cum_tokens at row
    // k = the budget consumed after the k best bands.
    "corpus_curriculum" -> { (s, dir) =>
      import TextOps.{qualityScore => qs}
      val b = documents(s, dir)
        .select(floor(round(qs(col("text")), 6) * 10).cast("long").as("band"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
      b.withColumn("cum_tokens", sum(col("tokens")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("band").desc)
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .orderBy(col("band").desc)
    },
    // vocabulary with counts, top-10 words per language (count desc,
    // word asc tiebreak — fully deterministic)
    "text_vocab_topk" -> { (s, dir) =>
      val vocab = documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("word"))
      vocab.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("lang"), col("rk"), col("word"), col("n"))
        .orderBy(col("lang"), col("rk"))
    },
    // Vocabulary coverage curve — the tokenizer-sizing number: what
    // fraction of all corpus tokens do the top-10 / top-100 / top-1000
    // vocabulary entries cover? (The curve's knee is where growing the
    // vocab stops paying — the Zipf-side complement of text_zipf_slope,
    // and the decision input for BPE vocab size.) The corpus collapses
    // to Heaps-law-bounded word counts in one partial-aggregated pass;
    // the global rank window runs over that VOCAB table, not the
    // corpus (same scale posture as text_vocab_topk — sublinear but
    // growing; the Misra–Gries twin is the fixed-state variant).
    // Coverage sums are exact integer counts divided once at the end.
    "corpus_coverage_curve" -> { (s, dir) =>
      val wc = documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
      val ranked = wc.withColumn("rk",
        row_number().over(Window.orderBy(col("n").desc, col("word"))).cast("long"))
      val tot = wc.agg(sum(col("n")).as("tot"))
      ranked.crossJoin(broadcast(tot))
        .select(col("rk"), col("n"), col("tot"),
          explode(array(lit(10L), lit(100L), lit(1000L))).as("cap"))
        .filter(col("rk") <= col("cap"))
        .groupBy(col("cap"), col("tot"))
        .agg(count(lit(1)).as("n_words"), sum(col("n")).as("covered"))
        .select(col("cap"), col("n_words"),
          round(col("covered").cast("double") / col("tot"), 6).as("coverage"))
        .orderBy(col("cap"))
    },
    // text_vocab_topk's bounded-state production twin: per-lang top
    // tokens via the custom [[graft.functions.SpaceSavingTopK]]
    // TypedImperativeAggregate. The exact form above shuffles one row
    // per distinct (lang, word) — Heaps-bounded for words, corpus-sized
    // for URLs/ids/raw n-grams; SpaceSaving's partials are FIXED
    // 64-entry summaries regardless of how many distinct keys stream
    // through a partition, so the shuffle per map task is capacity-
    // bounded. Capacity 64 ≥ the fixture's vocabulary, i.e. the
    // sized-to-domain EXACT regime: no partial ever evicts, the
    // mergeable-summaries combine is a plain multiset union, err ≡ 0,
    // and the result is deterministic under any partitioning — which is
    // what lets the DuckDB hash gate pin the UDAF's update/merge/eval
    // path against plain exact counting (the err column asserted 0 by
    // the oracle itself). The approximate regime's guarantees
    // (overestimate bound, guaranteed-heavy-hitter containment) are
    // property-tested in SpaceSavingSpec.
    "text_topk_spacesaving" -> { (s, dir) =>
      val agg = documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("lang"))
        .agg(graft.functions.GraftAggregates
          .spacesavingTopK(col("word"), 64, 10).as("top"))
      agg.select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
          col("col.token").as("word"), col("col.cnt").as("n"),
          col("col.err").as("err"))
        .orderBy(col("lang"), col("rk"))
    },
    // Heavy-hitter gate through the Count-Min sketch
    // ([[graft.functions.CountMinAgg]]): build ONE fixed 4×4096 counter
    // grid over the whole word stream (bounded partials, exact
    // element-wise merge — bit-identical under any partitioning), read
    // the stream length off the sketch itself (each row sums to N, so
    // no second corpus pass), gate the DISTINCT vocabulary by
    // estimate·30 ≥ N, and exact-count ONLY the gated candidates via a
    // broadcast semi-join. Count-Min estimates never under-count, so
    // the gate can't drop a true heavy hitter — the final exact
    // `n·30 ≥ N` filter makes the result EXACTLY the true heavy
    // hitters, independent of sketch collisions; the oracle replays it
    // as plain HAVING. Scale: the exact-count shuffle carries only
    // candidate-matching rows instead of the full vocabulary — the
    // sketch does the corpus-sized work in fixed memory. The estimate
    // probe is a driver-broadcast UDF over the VOCABULARY-sized
    // distinct table, never the corpus stream.
    "text_cms_gate" -> { (s, dir) =>
      import graft.functions.CountMin
      val depth = 4; val width = 4096
      val words = documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
      val sk = words.agg(CountMin.column(col("word"), depth, width).as("cm"))
        .head.getSeq[Long](0).toArray
      val total = CountMin.total(sk, width)
      val bc = s.sparkContext.broadcast(sk)
      val est = udf((w: String) => CountMin.estimate(bc.value, depth, width, w))
      val cand = words.distinct().filter(est(col("word")) * 30 >= lit(total))
      words.join(broadcast(cand), Seq("word"), "left_semi")
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .filter(col("n") * 30 >= lit(total))
        .orderBy(col("n").desc, col("word"))
    },
    // deterministic sequence packing: concatenate each (lang, source)
    // shard's documents in doc_id order and chop into PackBudget-token
    // bins — a document's bin is the budget-chunk its first token lands
    // in (the standard chunked-concatenation approximation; no
    // RNG, no driver loop, bit-identical on re-runs). Output = per-bin
    // occupancy stats, the packing manifest a trainer would consume.
    "text_pack_sequences" -> { (s, dir) =>
      val toks = size(split(col("text"), " ")).cast("long")
      val before = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      documents(s, dir)
        .select(col("lang"), col("source"), col("doc_id"), toks.as("toks"))
        .withColumn("cum_before", coalesce(sum(col("toks")).over(before), lit(0L)))
        .withColumn("bin", floor(col("cum_before") / lit(PackBudget.toDouble)).cast("long"))
        .groupBy(col("lang"), col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast("long").as("bin_tokens"))
        .orderBy(col("lang"), col("source"), col("bin"))
    },
    // corpus-level duplicated n-gram spans (the substring-dedup signal of
    // Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    // Better": verbatim spans repeated across documents are memorization
    // hot-spots): explode word 4-grams, count distinct docs and total
    // occurrences per gram, surface the grams shared by ≥2 documents.
    // Scale shape: explode → partial (map-side) aggregate → final
    // aggregate, so the shuffle carries distinct grams per partition,
    // not one row per token; top-k is orderBy+limit →
    // TakeOrderedAndProject, never a global sort of the gram table.
    "text_dup_ngrams" -> { (s, dir) =>
      val w = col("w")
      // spread the under-split single-file scan before the 4-gram
      // explode (no-op on properly split inputs — Tables.spread)
      val grams = Tables.spread(documents(s, dir), col("doc_id"))
        .withColumn("w", split(col("text"), " "))
        .filter(size(w) >= 4)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(w) - 3),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
            element_at(w, i + 2), element_at(w, i + 3)))).as("gram"))
      grams.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram"))
        .limit(15)
    },
    // Shingle-size sensitivity sweep: gram-duplication statistics at
    // k = 2..5 in one report — the hyperparameter audit behind every
    // shingle-based dedup choice (small k ⇒ everything collides, large
    // k ⇒ near-dups stop sharing grams; this table shows where the
    // corpus's knee is before anyone commits a MinHash/LSH config).
    // Each k-arm is the standard explode → partial-aggregated gram
    // count; the arms union AFTER collapsing to one row each, so the
    // plan is four independent scan+agg pipelines, no cross-k shuffle.
    "corpus_shingle_sweep" -> { (s, dir) =>
      val arms = Seq(2, 3, 4, 5).map { k =>
        val w = col("w")
        val gram = concat_ws(" ",
          (0 until k).map(o => element_at(w, col("i") + lit(o))): _*)
        documents(s, dir)
          .withColumn("w", split(col("text"), " "))
          .filter(size(w) >= k)
          .select(col("doc_id"),
            explode(sequence(lit(1), size(w) - (k - 1))).as("i"), w)
          .select(col("doc_id"), gram.as("gram"))
          .groupBy(col("gram"))
          .agg(count(lit(1)).as("occ"), countDistinct(col("doc_id")).as("nd"))
          .agg(sum(col("occ")).cast("long").as("n_grams"),
            count(lit(1)).as("n_distinct"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L)).cast("long")
              .as("n_shared"))
          .select(lit(k.toLong).as("k"), col("n_grams"), col("n_distinct"),
            col("n_shared"),
            round(lit(1.0) - col("n_distinct").cast("double") /
              col("n_grams"), 6).as("dup_rate"))
      }
      arms.reduce(_.unionByName(_)).orderBy(col("k"))
    },
    // N-gram novelty curve — how much genuinely NEW text each slice of
    // the corpus contributes: per doc-id decile cohort, the fraction
    // of 3-gram occurrences whose global first appearance (min doc_id
    // owning the gram) is in that very document. The declining curve
    // is the data-acquisition signal ("the next crawl tranche is 80%
    // already-seen phrases") that sits between exact dedup (whole-doc)
    // and dup-ngram mining (top offenders): it quantifies marginal
    // novelty for ALL grams. Scale shape: one gram-keyed aggregation
    // for first-seen + one gram-keyed join back — no driver state, no
    // all-pairs anything; cohort boundaries are pure integer
    // arithmetic off a broadcast max-id row.
    "corpus_ngram_novelty" -> { (s, dir) =>
      val w = col("w")
      val grams = Tables.spread(documents(s, dir), col("doc_id"))
        .withColumn("w", split(col("text"), " "))
        .filter(size(w) >= 3)
        // explode the POSITION, concat in codegen (the r13 shingle lesson)
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(1), size(w) - 2)).as("i"))
        .select(col("doc_id"), concat_ws(" ", element_at(w, col("i")),
          element_at(w, col("i") + 1), element_at(w, col("i") + 2)).as("gram"))
        // 2 consumers (first-seen table + the scoring join) — one
        // materialized gram stream beats re-running the corpus explode
        .localCheckpoint(eager = false)
      val first = grams.groupBy(col("gram"))
        .agg(min(col("doc_id")).as("first_doc"))
      val mx = documents(s, dir).agg(max(col("doc_id")).as("mx"))
      grams.join(first, "gram")
        .crossJoin(broadcast(mx))
        .select(least(lit(9L), expr("doc_id * 10 div (mx + 1)")).as("cohort"),
          when(col("first_doc") === col("doc_id"), 1L).otherwise(0L).as("novel"))
        .groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_grams"), sum(col("novel")).as("n_novel"))
        .select(col("cohort"), col("n_grams"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
        .orderBy(col("cohort"))
    },
    // Jensen–Shannon divergence of each source's unigram distribution
    // from the corpus-wide one — the "which feed drifted" scorecard of
    // a multi-source ingest (JS, not KL: symmetric, finite even where
    // a source misses words, bounded by ln 2). The grid is
    // vocab × sources (Heaps-bounded × 20), built by broadcasting the
    // tiny per-source totals across the global word table; each term
    // is two single divisions and one ln, rounded to 10dp and summed
    // in exact decimal per source (the ml_psi_drift discipline). The
    // corpus itself is touched exactly twice (per-source and global
    // word counts), both partial-aggregated.
    "text_source_divergence" -> { (s, dir) =>
      val words = documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
      val sw = words.groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("n_sw"))
      val gw = words.groupBy(col("word")).agg(count(lit(1)).as("n_w"))
      val stot = sw.groupBy(col("source")).agg(sum(col("n_sw")).as("n_s"))
      val tot = gw.agg(sum(col("n_w")).as("n"))
      gw.crossJoin(broadcast(stot))
        .join(sw, Seq("source", "word"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("p",
          coalesce(col("n_sw"), lit(0L)).cast("double") / col("n_s"))
        .withColumn("q", col("n_w").cast("double") / col("n"))
        .withColumn("term", round(
          when(col("p") > 0,
            lit(0.5) * col("p") *
              log(lit(2.0) * col("p") / (col("p") + col("q")))).otherwise(0.0)
            + lit(0.5) * col("q") *
              log(lit(2.0) * col("q") / (col("p") + col("q"))), 10)
          .cast("decimal(20,10)"))
        .groupBy(col("source"))
        .agg(round(sum(col("term")), 6).cast("double").as("js"),
          sum(when(col("n_sw").isNotNull, 1L).otherwise(0L)).as("n_words"))
        .orderBy(col("source"))
    },
    // overlapping retrieval chunking (the RAG indexing shape): fixed
    // ChunkSize-token windows every ChunkStride tokens, one output row
    // per (doc, chunk) with its token count and content hash. Pure
    // per-doc projection + explode — no shuffle at all except the
    // presentation sort; at corpus scale the chunk stream feeds the
    // embedding/ANN stages downstream without ever leaving its input
    // partition.
    "text_chunk_overlap" -> { (s, dir) =>
      val w = col("w")
      documents(s, dir)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), col("w"),
          posexplode(sequence(lit(1), size(w), lit(ChunkStride))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
          slice(w, col("col"), lit(ChunkSize)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    // bounded-memory twin of text_vocab_topk riding the Misra–Gries
    // aggregate: one ≤4k-entry summary per partition crosses the wire
    // instead of one row per distinct (lang, word). No oracle (summary
    // contents are partition-order dependent in the tail by design —
    // see Sampling.HeavyHitters); the spec pins the MG bounds, and this
    // entry exercises the operator at bench scale. Summary size is 4096
    // (≫ the 10 reported) so Zipf-head estimates are near-exact.
    "text_vocab_mg" -> { (s, dir) =>
      import s.implicits._
      val hh = new graft.operators.Sampling.HeavyHitters(4096)
      documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .as[(String, String)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(hh.toColumn.name("hh"))
        .flatMap { case (lang, items) =>
          items.take(10).zipWithIndex.map { case ((wrd, n), i) =>
            (lang, (i + 1).toLong, wrd, n)
          }
        }
        .toDF("lang", "rk", "word", "n_lower")
        .orderBy(col("lang"), col("rk"))
    },
    // vocabulary token-id encoding: the tokenize step between curated
    // text and trainer input. Ids are frequency ranks over the corpus's
    // own top-VocabSize vocabulary (count desc, word asc — fully
    // deterministic); out-of-vocabulary words map to UNK id 0. Output is
    // a per-doc encoding manifest: token/UNK counts plus an md5 over the
    // position-ordered id sequence, so the oracle pins the EXACT id
    // stream without shipping it. Scale: the vocab table is bounded by
    // VocabSize after a distributed top-k (TakeOrderedAndProject), so it
    // broadcasts; the corpus-sized token stream joins map-side and
    // re-aggregates per doc — explode → broadcast join → partial agg,
    // no corpus-wide shuffle beyond the per-doc aggregate.
    "text_encode_ids" -> { (s, dir) =>
      val toks = documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("word"))
      val topV = toks.groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(VocabSize)
      // rank the ≤VocabSize survivors (bounded window, same shape as
      // text_bm25's post-limit rank)
      val vocab = topV.withColumn("id", row_number().over(
        Window.orderBy(col("n").desc, col("word"))).cast("long"))
        .select(col("word"), col("id"))
      toks.join(broadcast(vocab), Seq("word"), "left")
        .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(0L)).as("id"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("id") === 0L, 1L).otherwise(0L)).as("n_unk"),
          md5(concat_ws(",", transform(
            array_sort(collect_list(struct(col("pos"), col("id")))),
            p => p.getField("id")))).as("ids_md5"))
        .orderBy(col("doc_id"))
    },
    // content-addressed shard plan: every document lands in one of 256
    // shards by the first md5 byte of its doc_id — a pure projection, so
    // assignment is STABLE as the corpus grows (new docs never move old
    // ones between shards, unlike round-robin or rank-based splits whose
    // assignments all shift on every ingest) and reproducible from the
    // id alone on any engine. Output is the shard manifest a distributed
    // trainer consumes: per-shard doc/token/byte totals to verify
    // balance before launching readers. Scale: projection → partial agg
    // → 256-row final agg; the write side is `repartition(shard)` +
    // partitionBy using the same expression, so the manifest and the
    // physical layout derive from one definition.
    "corpus_shard_plan" -> { (s, dir) =>
      documents(s, dir)
        .select(
          substring(md5(col("doc_id").cast("string")), 1, 2).as("shard"),
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          col("n_chars"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("shard_tokens"),
          sum(col("n_chars")).as("shard_bytes"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("shard"))
    },
    // One DoReMi-style domain-reweighting step (Xie et al. 2023,
    // NeurIPS: Domain Reweighting with Minimax Optimization) — the
    // exponentiated-gradient update a data-mixing pipeline runs between
    // proxy-model rounds. Domains are `source`; the baseline mix u_i is
    // each domain's token share; the per-domain "excess loss" stands in
    // for the proxy/reference loss gap with a deterministic compression
    // proxy (avg chars-per-token above the corpus mean — long-word
    // domains are harder). Update: w̃_i = u_i·exp(η·ℓ_i), normalized,
    // then smoothed toward uniform with mass c (η = 1, c = 0.1) — the
    // paper's eq. (2) shape with the loss oracle swapped out. Output:
    // per domain the baseline share, the excess signal, and the updated
    // weight (columns a mixing run feeds straight into
    // sample_temperature_mix-style rate tables).
    //
    // Scale shape: one partial-aggregated pass collapses the corpus to
    // k domain rows (exact BIGINT token/char sums — order-independent);
    // the totals row is an agg OVER that k-row table, broadcast back.
    // Everything after the first groupBy is domain-cardinality work.
    // Determinism: integer sums → one double division each, exp rounded
    // to 10dp (the events_decay_features discipline), products rounded
    // to 10dp and normalized via an exact decimal sum, final weights at
    // 6dp.
    "corpus_doremi_step" -> { (s, dir) =>
      val eta = 1.0; val smooth = 0.1
      val perSource = documents(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          col("n_chars"))
        .groupBy(col("source"))
        .agg(sum(col("toks")).as("toks"), sum(col("n_chars")).as("chars"))
      val totals = perSource.agg(
        sum(col("toks")).as("tot_toks"), sum(col("chars")).as("tot_chars"),
        count(lit(1)).as("k"))
      val stepped = perSource.crossJoin(broadcast(totals))
        .withColumn("u", round(col("toks").cast("double") / col("tot_toks"), 10))
        .withColumn("excess", round(
          col("chars").cast("double") / col("toks") -
            col("tot_chars").cast("double") / col("tot_toks"), 6))
        .withColumn("wtilde",
          round(col("u") * round(exp(lit(eta) * col("excess")), 10), 10))
      val z = stepped.agg(
        sum(col("wtilde").cast("decimal(28,10)")).cast("double").as("z"))
      stepped.crossJoin(broadcast(z))
        .select(col("source"),
          round(col("u"), 6).as("base_share"),
          col("excess"),
          round(lit(1.0 - smooth) * (col("wtilde") / col("z")) +
            lit(smooth) / col("k"), 6).as("weight"))
        .orderBy(col("source"))
    })

  /** text_encode_ids vocabulary budget — deliberately smaller than the
    * synthetic corpus's ~31 distinct words so the UNK path is real. */
  val VocabSize = 16

  /** Generated CTE chain replaying all [[BpeRounds]] merge rounds. */
  private def bpeOracle: String = {
    val rounds = (1 to BpeRounds).map { i =>
      val prev = s"v${i - 1}"
      s"""m$i AS (
         |  SELECT pair, n FROM (
         |    SELECT pair, CAST(SUM(wc) AS BIGINT) AS n FROM (
         |      SELECT wc, unnest(list_transform(range(1, length(w)),
         |        j -> substring(w, CAST(j AS BIGINT), 2))) AS pair
         |      FROM $prev WHERE length(w) >= 2)
         |    GROUP BY pair)
         |  ORDER BY n DESC, pair LIMIT 1),
         |v$i AS (SELECT replace(w, m$i.pair, chr($i)) AS w, wc FROM $prev, m$i),
         |s$i AS (
         |  SELECT CAST($i AS BIGINT) AS round, m$i.pair AS pair, m$i.n AS n_merged,
         |    (SELECT CAST(SUM(wc * length(w)) AS BIGINT) FROM v$i) AS tokens_after
         |  FROM m$i)""".stripMargin
    }.mkString(",\n")
    val decoded = (1 to BpeRounds).foldLeft("pair")((acc, j) =>
      s"replace($acc, chr($j), '<$j>')")
    val union = (1 to BpeRounds).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH v0 AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w),
       |$rounds
       |SELECT round, $decoded AS pair, n_merged, tokens_after
       |FROM ($union)
       |ORDER BY round""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "corpus_tokenize_bpe" -> bpeOracle,
    "corpus_doremi_step" ->
      """WITH ps AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(SUM(toks) AS BIGINT) AS tot_toks,
        |    CAST(SUM(chars) AS BIGINT) AS tot_chars,
        |    COUNT(*) AS k
        |  FROM ps),
        |st AS (
        |  SELECT source,
        |    ROUND(CAST(toks AS DOUBLE) / tot_toks, 10) AS u,
        |    ROUND(CAST(chars AS DOUBLE) / toks
        |      - CAST(tot_chars AS DOUBLE) / tot_toks, 6) AS excess
        |  FROM ps, tot),
        |wt AS (
        |  SELECT source, u, excess,
        |    ROUND(u * ROUND(exp(CAST(1.0 AS DOUBLE) * excess), 10), 10)
        |      AS wtilde
        |  FROM st),
        |z AS (
        |  SELECT CAST(SUM(CAST(wtilde AS DECIMAL(28,10))) AS DOUBLE) AS z
        |  FROM wt)
        |SELECT source, ROUND(u, 6) AS base_share, excess,
        |  ROUND(CAST(0.9 AS DOUBLE) * (wtilde / z.z)
        |    + CAST(0.1 AS DOUBLE) / tot.k, 6) AS weight
        |FROM wt, z, tot
        |ORDER BY source""".stripMargin,
    "corpus_ngram_novelty" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram),
        |mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        |x AS (
        |  SELECT LEAST(9, g.doc_id * 10 // (mx + 1)) AS cohort,
        |    CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END AS novel
        |  FROM g JOIN f USING (gram), mx)
        |SELECT CAST(cohort AS BIGINT) AS cohort, COUNT(*) AS n_grams,
        |  CAST(SUM(novel) AS BIGINT) AS n_novel,
        |  ROUND(CAST(SUM(novel) AS DOUBLE) / COUNT(*), 6) AS novelty
        |FROM x GROUP BY cohort ORDER BY cohort""".stripMargin,
    "text_source_divergence" ->
      """WITH words AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
        |sw AS (SELECT source, word, COUNT(*) AS n_sw FROM words GROUP BY 1, 2),
        |gw AS (SELECT word, COUNT(*) AS n_w FROM words GROUP BY 1),
        |stot AS (SELECT source, SUM(n_sw) AS n_s FROM sw GROUP BY 1),
        |tot AS (SELECT SUM(n_w) AS n FROM gw),
        |grid AS (
        |  SELECT stot.source, gw.word, gw.n_w, stot.n_s, sw.n_sw
        |  FROM gw CROSS JOIN stot
        |  LEFT JOIN sw ON sw.source = stot.source AND sw.word = gw.word),
        |t AS (
        |  SELECT source, n_sw,
        |    CAST(COALESCE(n_sw, 0) AS DOUBLE) / n_s AS p,
        |    CAST(n_w AS DOUBLE) / (SELECT n FROM tot) AS q
        |  FROM grid),
        |terms AS (
        |  SELECT source, n_sw,
        |    CAST(ROUND(
        |      CASE WHEN p > 0 THEN 0.5 * p * LN(2.0 * p / (p + q)) ELSE 0.0 END
        |      + 0.5 * q * LN(2.0 * q / (p + q)), 10) AS DECIMAL(20,10)) AS term
        |  FROM t)
        |SELECT source, CAST(ROUND(SUM(term), 6) AS DOUBLE) AS js,
        |  CAST(SUM(CASE WHEN n_sw IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_words
        |FROM terms
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "corpus_coverage_curve" ->
      """WITH wc AS (
        |  SELECT word, COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word),
        |r AS (
        |  SELECT word, n,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rk
        |  FROM wc),
        |tot AS (SELECT SUM(n) AS tot FROM wc)
        |SELECT CAST(cap AS BIGINT) AS cap, COUNT(*) AS n_words,
        |  ROUND(CAST(SUM(n) AS DOUBLE) / (SELECT tot FROM tot), 6) AS coverage
        |FROM r, (VALUES (10), (100), (1000)) c(cap)
        |WHERE rk <= cap
        |GROUP BY cap
        |ORDER BY cap""".stripMargin,
    "text_cms_gate" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |t AS (SELECT COUNT(*) AS total FROM w)
        |SELECT word, COUNT(*) AS n
        |FROM w, t
        |GROUP BY word, t.total
        |HAVING COUNT(*) * 30 >= t.total
        |ORDER BY n DESC, word""".stripMargin,
    "corpus_curriculum" ->
      s"""WITH b AS (
         |  SELECT CAST(FLOOR(ROUND(${TextOps.qualityScoreSql}, 6) * 10) AS BIGINT) AS band,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
         |  FROM documents
         |  GROUP BY band)
         |SELECT band, n_docs, tokens,
         |  CAST(SUM(tokens) OVER (ORDER BY band DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |FROM b
         |ORDER BY band DESC""".stripMargin,
    "corpus_shard_plan" ->
      """SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS shard_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,
    "text_encode_ids" ->
      s"""WITH toks AS (
         |  SELECT doc_id, i AS pos, w[i] AS word
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
         |       unnest(range(1, len(w) + 1)) AS t(i)),
         |vocab AS (
         |  SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS BIGINT) AS id
         |  FROM (SELECT word, COUNT(*) AS n FROM toks GROUP BY word
         |        ORDER BY n DESC, word LIMIT $VocabSize) v),
         |ids AS (
         |  SELECT doc_id, pos, COALESCE(vocab.id, 0) AS id
         |  FROM toks LEFT JOIN vocab USING (word))
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
         |  md5(string_agg(id, ',' ORDER BY pos)) AS ids_md5
         |FROM ids
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "corpus_shingle_sweep" -> {
      def arm(k: Int): String = {
        val concat = (0 until k).map(o => s"w[i+$o]").mkString(" || ' ' || ")
        s"""SELECT CAST($k AS BIGINT) AS k,
           |  CAST(SUM(occ) AS BIGINT) AS n_grams,
           |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
           |  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           |  ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(occ) AS DOUBLE), 6) AS dup_rate
           |FROM (
           |  SELECT gram, COUNT(*) AS occ, COUNT(DISTINCT doc_id) AS nd
           |  FROM (
           |    SELECT doc_id,
           |      unnest(list_transform(range(1, len(w) - ${k - 2}),
           |        i -> $concat)) AS gram
           |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           |    WHERE len(w) >= $k)
           |  GROUP BY gram)""".stripMargin
      }
      Seq(2, 3, 4, 5).map(arm).mkString("", "\nUNION ALL\n", "\nORDER BY k")
    },
    "text_dup_ngrams" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 2),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 4)
        |SELECT gram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
        |FROM g
        |GROUP BY gram
        |HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, n_occ DESC, gram
        |LIMIT 15""".stripMargin,
    "text_chunk_overlap" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, $ChunkStride)) AS start
        |      FROM d),
        |c AS (SELECT doc_id,
        |        CAST((start - 1) // $ChunkStride AS BIGINT) AS chunk_id,
        |        w[start : least(start + ${ChunkSize - 1}, len(w))] AS chunk
        |      FROM s)
        |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_hash
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "text_vocab_topk" ->
      """SELECT lang, rk, word, n FROM (
        |  SELECT lang, word, n,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk
        |  FROM (SELECT lang, word, COUNT(*) AS n
        |        FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
        |              FROM documents) w
        |        GROUP BY lang, word) c) t
        |WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin,
    "text_topk_spacesaving" ->
      """SELECT lang, rk, word, n, CAST(0 AS BIGINT) AS err FROM (
        |  SELECT lang, word, n,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk
        |  FROM (SELECT lang, word, COUNT(*) AS n
        |        FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
        |              FROM documents) w
        |        GROUP BY lang, word) c) t
        |WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin,
    "text_pack_sequences" ->
      s"""WITH t AS (
        |  SELECT lang, source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, source, toks,
        |    COALESCE(SUM(toks) OVER (PARTITION BY lang, source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t)
        |SELECT lang, source,
        |  CAST(floor(cum_before / $PackBudget.0) AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
        |FROM c
        |GROUP BY lang, source, bin
        |ORDER BY lang, source, bin""".stripMargin)
}
