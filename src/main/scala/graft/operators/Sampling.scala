package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sampling operators for training-data curation.
  *
  * `hashSample` / `quotaPerGroup` are declarative (window / filter over a
  * content hash) so they push into codegen and scale like any projection.
  * [[ReservoirSampler]] is the custom-aggregate route — an
  * `Aggregator[IN, BUF, OUT]` (the typed-aggregate path) for when the
  * quota must be collected as one array per group in a single aggregation
  * pass. Determinism comes from keying the reservoir priority on a hash
  * of the value with the value itself as tiebreaker, not an RNG, so
  * re-runs and the merge order of partial buffers cannot change the
  * result.
  */
object Sampling {

  /** Deterministic Bernoulli-style sample: keep rows whose content hash
    * lands under `fraction` of the (unsigned-halved) hash space. Stable
    * across runs and partitionings; no RNG, no seed bookkeeping. NULL
    * keys are excluded (they would otherwise share one hash value and be
    * kept all-or-nothing). */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val threshold = (fraction * Long.MaxValue).toLong
    // shiftrightunsigned, not abs: abs(Long.MinValue) overflows (a crash
    // under Spark 4's default ANSI mode)
    df.filter(col(keyCol).isNotNull &&
      shiftrightunsigned(xxhash64(col(keyCol)), 1) <= threshold)
  }

  /** At most `n` rows per group, chosen by smallest content hash —
    * reproducible per-group quota sampling. `tieCol` must be unique per
    * row (an id column); without it, rows with duplicate `keyCol` values
    * tie completely and the choice among them is partition-order
    * dependent. */
  def quotaPerGroup(
      df: DataFrame, groupCol: String, keyCol: String, n: Int,
      tieCol: String): DataFrame = {
    val rk = "__graft_rk" // collision-proof temp name
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(xxhash64(col(keyCol)), col(keyCol), col(tieCol))
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= n)
      .drop(rk)
  }

  /** Deterministic "reservoir": keeps the `k` values with the smallest
    * (hash-derived priority, value) pairs. The value tiebreaker makes the
    * order total, so hash collisions cannot introduce merge-order
    * dependence and this is a lawful distributed aggregate.
    *
    * The output encoder is taken implicitly — pass
    * `spark.implicits.newSequenceEncoder` (in scope via
    * `import spark.implicits._`) to stay on public API. */
  class ReservoirSampler(k: Int)(implicit outEnc: Encoder[Seq[String]])
      extends Aggregator[String, Vector[(Long, String)], Seq[String]] {
    require(k > 0)
    private def priority(v: String): Long = {
      // splitmix-style scramble over the full string content
      var h = 0L
      var i = 0
      while (i < v.length) { h = h * 31 + v.charAt(i); i += 1 }
      h *= 0x9E3779B97F4A7C15L
      h ^= (h >>> 32); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 29)
      h
    }
    private val ord = Ordering.Tuple2[Long, String]
    /** Sorted ascending; last = current max. Bounded insert: once full,
      * most rows reject by comparing against the max — Vector makes
      * length/last cheap (List would re-walk k elements per row). */
    private def insert(b: Vector[(Long, String)], e: (Long, String)): Vector[(Long, String)] =
      if (b.length >= k && ord.gteq(e, b.last)) b
      else {
        val merged = (b :+ e).sorted(ord)
        if (merged.length > k) merged.take(k) else merged
      }
    def zero: Vector[(Long, String)] = Vector.empty
    def reduce(b: Vector[(Long, String)], v: String): Vector[(Long, String)] =
      insert(b, (priority(v), v))
    def merge(a: Vector[(Long, String)], b: Vector[(Long, String)]): Vector[(Long, String)] =
      (a ++ b).sorted(ord).take(k)
    def finish(b: Vector[(Long, String)]): Seq[String] = b.map(_._2)
    def bufferEncoder: Encoder[Vector[(Long, String)]] =
      Encoders.kryo[Vector[(Long, String)]]
    def outputEncoder: Encoder[Seq[String]] = outEnc
  }

  /** Misra–Gries heavy hitters: the bounded-memory alternative to an
    * exact `groupBy(word).count()` + top-k when the key cardinality
    * itself is the problem (open-vocabulary tokens at 100 TB: the exact
    * plan shuffles one row per distinct key; this shuffles one
    * ≤k-entry summary per partition, full stop).
    *
    * Guarantees (classic MG bounds, preserved under merge per
    * Agarwal et al., "Mergeable Summaries", PODS 2012): with summary
    * size k over n items, every item with true count > n/(k+1) is
    * present, and each reported estimate undercounts by at most
    * n/(k+1). Estimates are a LOWER bound on the true count. The
    * GUARANTEE is merge-order independent; which near-threshold tail
    * items happen to survive can vary with partitioning (inherent to
    * MG), so consume this for its heavy hitters, not its tail. Output
    * order is stabilized by sorting (count desc, item).
    *
    * Output: up to k (item, lower-bound count) pairs, count desc. */
  class HeavyHitters(k: Int)(implicit outEnc: Encoder[Seq[(String, Long)]])
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k > 0)
    /** Keep ≤ k counters: decrement all by the (k+1)-largest count and
      * drop non-positive — one batched MG decrement step. */
    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.collect { case (i, c) if c > cut => (i, c - cut) }
      }
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      shrink(b.updated(v, b.getOrElse(v, 0L) + 1L))
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      shrink(b.foldLeft(a) { case (m, (i, c)) => m.updated(i, m.getOrElse(i, 0L) + c) })
    def finish(b: Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (i, c) => (-c, i) }
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Seq[(String, Long)]] = outEnc
  }
}
