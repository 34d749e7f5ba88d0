package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Invariant checks for the corpus-assembly queries and the banded range
  * join (the DuckDB oracle checks exact values; these pin the algebraic
  * properties that must hold at any scale). */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  test("text_vocab_topk: at most 10 ranks per lang, counts non-increasing") {
    val rows = CorpusOps.queries("text_vocab_topk")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.size).toSeq, s"$lang ranks not dense")
      assert(sorted.size <= 10)
      val counts = sorted.map(_._3).toSeq
      assert(counts == counts.sorted.reverse, s"$lang counts not non-increasing: $counts")
    }
  }

  test("text_pack_sequences: bin tokens reconcile with the corpus total") {
    val packed = CorpusOps.queries("text_pack_sequences")(spark, sf)
    val binTotal = packed.agg(sum("bin_tokens")).collect()(0).getLong(0)
    val docTotal = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    assert(binTotal == docTotal, s"packing lost tokens: $binTotal != $docTotal")
    // every non-final bin of a group holds at least one doc and bins are dense
    val bins = packed.select("lang", "source", "bin").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    bins.foreach { case (grp, bs) =>
      assert(bs == (bs.head to bs.last).toSeq, s"$grp bins not dense: $bs")
      assert(bs.head == 0L, s"$grp first bin not 0")
    }
  }

  test("text_chunk_overlap: chunk geometry reconstructs from token counts") {
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = CorpusOps.queries("text_chunk_overlap")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == lens.keySet, "every doc must chunk")
    byDoc.foreach { case (doc, cs) =>
      val len = lens(doc)
      val ids = cs.map(_._2).sorted.toSeq
      // dense ids; one chunk per stride-start ≤ len
      val expectChunks = (len - 1) / CorpusOps.ChunkStride + 1
      assert(ids == (0L until expectChunks.toLong), s"doc $doc ids $ids")
      cs.foreach { case (_, id, n) =>
        val start = id * CorpusOps.ChunkStride + 1
        val expect = math.min(CorpusOps.ChunkSize.toLong, len - start + 1)
        assert(n == expect, s"doc $doc chunk $id tokens $n != $expect")
      }
    }
  }

  test("text_dup_ngrams: grams are 4-word, doc counts ≥ 2, occ ≥ docs") {
    val rows = CorpusOps.queries("text_dup_ngrams")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.size <= 15)
    rows.foreach { case (gram, nDocs, nOcc) =>
      assert(gram.split(" ").length == 4, s"not a 4-gram: '$gram'")
      assert(nDocs >= 2 && nOcc >= nDocs, s"$gram counts: $nDocs/$nOcc")
    }
    // ordering is (n_docs desc, n_occ desc, gram asc) — deterministic top-k
    val key = rows.map { case (g, d, o) => (-d, -o, g) }
    assert(key.sameElements(key.sorted), "rows not in deterministic order")
  }

  test("events_range_join: banded join equals the naive inequality join") {
    val banded = EventOps.queries("events_range_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"))
    val naive = c.join(p, c("user_id") === p("p_user") &&
        p("p_us") > c("c_us") && p("p_us") <= c("c_us") + 3600000000L)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("click_id")).as("n_converting_clicks"),
        count(lit(1)).as("n_pairs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == naive, s"banded != naive: ${banded.diff(naive)} / ${naive.diff(banded)}")
    assert(banded.nonEmpty, "expected at least one click→purchase conversion")
  }

  test("corpus_shard_plan: shards partition the corpus and assignment is id-stable") {
    val shards = CorpusOps.queries("corpus_shard_plan")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf)
    assert(shards.map(_._2).sum == docs.count(), "shard doc counts don't total the corpus")
    val tokTotal = docs.agg(sum(size(split(col("text"), " ")).cast("long")))
      .collect()(0).getLong(0)
    assert(shards.map(_._3).sum == tokTotal, "shard token counts don't total the corpus")
    assert(shards.forall(_._1.matches("[0-9a-f]{2}")), "shard labels must be 2 hex chars")
    // stability: a doc's shard is a pure function of doc_id — growing the
    // corpus (here: dropping half of it) never reassigns surviving docs
    val half = docs.filter(col("doc_id") % 2 === 0)
    val assign = (d: org.apache.spark.sql.DataFrame) => d
      .select(col("doc_id"), substring(md5(col("doc_id").cast("string")), 1, 2).as("shard"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val full = assign(docs)
    assign(half).foreach { case (id, sh) => assert(full(id) == sh, s"doc $id moved") }
  }

  test("events_active_users: wau7 brackets dau and matches brute-force recomputation") {
    val out = EventOps.queries("events_active_users")(spark, sf)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val userDays = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).distinct
    out.foreach { case (d, dau, wau7) =>
      assert(wau7 >= dau, s"$d: wau7 $wau7 < dau $dau")
      val brute = userDays.filter { case (ud, _) =>
        !ud.isAfter(d) && !ud.isBefore(d.minusDays(6)) }.map(_._2).distinct.length
      assert(wau7 == brute, s"$d: wau7 $wau7 != brute $brute")
    }
  }

  test("text_bpe_merges: ranks dense, counts non-increasing, top pair matches brute force") {
    val out = TextOps.queries("text_bpe_merges")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == (1L to out.size).toSeq, "ranks not dense")
    val ns = out.map(_._3).toSeq
    assert(ns == ns.sorted.reverse, "counts not non-increasing")
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .collect().map(_.getString(0))
    val brute = words.flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (rk1, pair1, n1) = out.head
    assert(rk1 == 1L && brute(pair1) == n1,
      s"top merge $pair1=$n1 disagrees with brute ${brute.get(pair1)}")
    assert(brute.values.max == n1, "top pair is not the global max")
  }
}
