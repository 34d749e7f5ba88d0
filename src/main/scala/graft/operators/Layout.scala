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
}
