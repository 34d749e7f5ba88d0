package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join gate (round-9 verdict ask #7): `events_salted_join`
  * proves MANUAL salting semantics; this proves the runtime path — Spark's
  * adaptive OptimizeSkewedJoin must actually split a skewed partition in
  * this build, because at 100 TB that rule (plus salting for the cases it
  * can't see) is the difference between a straggler task holding a stage
  * hostage and N parallel splits. Thresholds are lowered to make a
  * test-sized skew visible; the assertion reads the FINAL adaptive plan
  * after execution, where the split is recorded on the join node. */
class SkewJoinGateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("AQE splits the skewed partition of a deliberately skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the fixture session runs 2 shuffle partitions — with 2, the
      // skewed partition IS the median's neighbor and the factor test
      // can't fire; 16 gives a realistic median for skew detection
      conf.set("spark.sql.shuffle.partitions", "16")

      // 80% of left rows share key 0 with a fat payload — one shuffle
      // partition dwarfs the median
      val left = spark.range(0, 60000)
        .select(when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("x" * 120), col("id").cast("string")).as("payload"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS queryExecution runs to its final
      // adaptive plan — count() executes a derived plan and leaves this
      // one un-finalized
      val n = joined.collect().length
      // key 0 matches right's k=0 (12000 heavy rows survive); non-0
      // left keys are multiples of 5 in [5, 60000) matched while < 2000
      assert(n > 12000, n)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "no skew-split recorded in the final adaptive plan:\n" +
          p.linesIterator.filter(_.contains("SortMergeJoin")).mkString("\n"))
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
