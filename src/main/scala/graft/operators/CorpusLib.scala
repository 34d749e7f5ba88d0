package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-assembly library functions that pair a distributed
  * corpus-scale stage with a bounded driver-local stage — the split
  * every production tokenizer trainer makes.
  */
object CorpusLib {

  /** One learned BPE merge: the pair joined, in order. */
  final case class BpeMerge(left: String, right: String, count: Long)

  /** Train `k` BPE merges over the corpus behind `textCol`.
    *
    * Architecture is the standard two-tier split (the same one
    * `text_bpe_merges` pins as a per-round plan): the CORPUS-sized work
    * — reducing the token stream to the word-count dictionary — runs
    * distributed as one explode → partial-aggregated count, and the
    * DICTIONARY-sized work — the iterative merge loop — runs on the
    * driver over that bounded table, exactly like mainstream BPE
    * trainers, which all train on the word-frequency dict, not the raw
    * corpus. The collect is bounded by VOCABULARY (Heaps' law:
    * sublinear in corpus size) and further capped by `maxVocab`
    * (count-desc, word-asc survivors — deterministic), so the driver
    * never holds corpus-scale state; a 100 TB corpus changes the
    * distributed stage's cost only.
    *
    * The local loop is the classical algorithm: count adjacent symbol
    * pairs weighted by word frequency, merge the argmax (ties → lexical
    * smallest pair, deterministic), re-segment, repeat. Returns the
    * merge table in training order — the artifact a tokenizer ships.
    */
  def bpeTrain(df: DataFrame, textCol: String, k: Int,
      maxVocab: Int = 100000): Seq[BpeMerge] = {
    val vocab = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .orderBy(col("wc").desc, col("word")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Vector[String], Long)] =
      vocab.map { case (w, c) => (w.split("").toVector, c) }
    val merges = Vector.newBuilder[BpeMerge]
    var round = 0
    while (round < k) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, wc) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + wc
          i += 1
        }
      }
      if (counts.isEmpty) return merges.result()
      val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      merges += BpeMerge(a, b, n)
      words = words.map { case (syms, wc) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2 // left-to-right, non-overlapping
          } else { out += syms(i); i += 1 }
        }
        (out.result(), wc)
      }
      round += 1
    }
    merges.result()
  }
}
