package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout and skew utilities — the knobs that decide whether a
  * plan survives a 100× scale-up:
  *
  *  - salted joins: a hot key (one customer with millions of rows) turns a
  *    shuffle join into a single straggler task. Salting splits the hot
  *    side into `salts` subkeys and replicates the small side per salt, so
  *    the hot key spreads over `salts` tasks. (AQE's skew-join handles
  *    sort-merge cases at runtime; explicit salting is the declarative
  *    fallback for when the small side can't broadcast.)
  *  - bucketed tables: pre-shuffling both join sides into the same
  *    bucketing removes the per-query shuffle entirely — bucket joins read
  *    co-located buckets. Worth it for dimensions joined every query.
  */
object Layout {

  /** Join `big` to `small` on `key`, salting the big side into `salts`
    * subkeys and exploding the small side to match. Result equals a plain
    * inner join on `key`; the shuffle distributes each key over `salts`
    * partitions. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salt = "__graft_salt" // collision-proof temp name
    val b = big.withColumn(salt, pmod(hash(monotonically_increasing_id()), lit(salts)))
    val s = small.withColumn(salt, explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, salt)).drop(salt)
  }

  /** Write a bucketed + sorted copy of `df` as a managed table so repeated
    * joins/aggregations on `key` skip their shuffle (bucket pruning +
    * co-located join). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Top-N most frequent values of `key` with counts — the skew report
    * you run before deciding to salt. One pass, partial-aggregated. */
  def skewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)

  /** Z-order (Morton) key over two numeric dimensions: each value is
    * equal-width-bucketed to `bits` bits between its [lo, hi] bounds,
    * then the bucket bits interleave (a₃b₃a₂b₂a₁b₁a₀b₀). Sorting a
    * table by this key clusters BOTH dimensions at once, so parquet
    * row-group/file min-max stats stay tight on each dimension
    * separately — a box predicate prunes files on either dim, where a
    * linear sort only ever prunes its leading column. Pure codegen'd
    * builtins (width_bucket + shifts + bitwise or): no UDF in the
    * write path. Bounds come from the caller (one cheap agg, or known
    * domain) — equal-width is the right trade for layout: rank-based
    * (ntile) normalization would cost a global sort per dimension
    * before the layout sort itself. */
  def zorderKey(a: Column, aLo: Double, aHi: Double,
      b: Column, bLo: Double, bHi: Double, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 16, s"bits=$bits out of [1,16]")
    val n = 1 << bits
    // width_bucket returns 1..n+1 (n+1 for the hi edge); clamp to 0..n-1
    def bucket(c: Column, lo: Double, hi: Double): Column =
      least(greatest(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(n)) - 1,
        lit(0L)), lit((n - 1).toLong))
    val ab = bucket(a, aLo, aHi)
    val bb = bucket(b, bLo, bHi)
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(ab, i).bitwiseAND(1L), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftrightunsigned(bb, i).bitwiseAND(1L), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` clustered by the z-order of (`colA`, `colB`):
    * range-partition on the z-key (so files own contiguous z-ranges),
    * sort within partitions, drop the key. `files` controls output file
    * count. Read-side pruning then works through the ordinary min-max
    * stats of the data columns themselves — no reader cooperation
    * needed, which is what makes z-ordering a pure layout decision. */
  def writeZordered(df: DataFrame, path: String,
      colA: String, aLo: Double, aHi: Double,
      colB: String, bLo: Double, bHi: Double,
      files: Int, bits: Int = 8): Unit = {
    val zk = "__graft_zkey"
    df.withColumn(zk, zorderKey(col(colA), aLo, aHi, col(colB), bLo, bHi, bits))
      .repartitionByRange(files, col(zk))
      .sortWithinPartitions(col(zk))
      .drop(zk)
      .write.mode("overwrite").parquet(path)
  }
}
