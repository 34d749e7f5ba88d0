package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("saltedJoin equals plain join on a skewed key") {
    import spark.implicits._
    // hot key: 9000 of 10000 rows share key 1
    val big = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (9500L, "cold"), (9999L, "cold2"))
      .toDF("k", "label")
    val plain = big.join(small, "k")
    val salted = Layout.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "payload", "label").collect().map(_.toSeq).toSet
    val b = salted.select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("skewReport surfaces the hot key first") {
    val big = spark.range(1000)
      .select(when(col("id") < 900, 1L).otherwise(col("id")).as("k"))
    val top = Layout.skewReport(big, "k", topN = 1).head()
    assert(top.getLong(0) == 1L && top.getLong(1) == 900L)
  }

  test("zorderKey interleaves bucket bits correctly") {
    import spark.implicits._
    // 2-bit toy: a=(0..3), b=(0..3) over [0,4) — bucket == value
    val rows = (for { a <- 0 to 3; b <- 0 to 3 } yield (a.toDouble, b.toDouble))
      .toDF("a", "b")
    val z = rows.withColumn("z",
        Layout.zorderKey(col("a"), 0, 4, col("b"), 0, 4, bits = 2))
      .collect().map(r => ((r.getDouble(0).toInt, r.getDouble(1).toInt), r.getLong(2))).toMap
    def morton(a: Int, b: Int) =
      (0 until 2).map(i => (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i))).reduce(_ | _)
    z.foreach { case ((a, b), zv) => assert(zv == morton(a, b), s"z($a,$b)=$zv") }
    // distinct inputs -> distinct keys at full resolution
    assert(z.values.toSet.size == 16)
  }

  test("z-ordered layout prunes files on BOTH dims; linear sort only on its leading dim") {
    import spark.implicits._
    // uniform 2-d grid, 10k points in [0,100)²
    val pts = spark.range(10000).select(
      (col("id") % 100).cast("double").as("x"),
      ((col("id") / 100) % 100).cast("double").as("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZordered(pts, s"$base/z", "x", 0, 100, "y", 0, 100, files = 16)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$base/linear")
    def filesTouched(path: String, filter: org.apache.spark.sql.Column): Int =
      spark.read.parquet(path).filter(filter)
        .select(input_file_name()).distinct().count().toInt
    val box = col("x") >= 10 && col("x") < 20 && col("y") >= 10 && col("y") < 20
    val yOnly = col("y") >= 10 && col("y") < 20
    // the box predicate: z-order confines it to a few z-ranges; the
    // x-sorted layout can still prune on its leading dim, so the box is
    // a no-worse (<=) check — range-partition boundaries are sampled, and
    // a lucky alignment can tie. The y-only case below is the strict
    // discriminator (linear-by-x cannot prune there at all).
    val zBox = filesTouched(s"$base/z", box)
    val lBox = filesTouched(s"$base/linear", box)
    assert(zBox <= lBox, s"zorder box touched $zBox files vs linear $lBox")
    // y-only predicate: linear-by-x cannot prune at all (reads all 16)
    val zY = filesTouched(s"$base/z", yOnly)
    val lY = filesTouched(s"$base/linear", yOnly)
    assert(lY == 16 && zY < lY, s"y-only: zorder $zY vs linear $lY")
    // layout must not change content
    assert(spark.read.parquet(s"$base/z").count() == 10000)
  }

  test("hilbert walk is continuous: consecutive keys are Manhattan-adjacent cells") {
    val n = 16 // bits=4
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield (Layout.hilbertD(n, x, y), (x, y))).sortBy(_._1)
    assert(byD.map(_._1) == (0L until (n.toLong * n)), "keys must be a permutation of 0..n²-1")
    byD.map(_._2).sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d-consecutive cells ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbert layout prunes a box at least as well as z-order") {
    import spark.implicits._
    val pts = spark.range(10000).select(
      (col("id") % 100).cast("double").as("x"),
      ((col("id") / 100) % 100).cast("double").as("y"))
    val base = java.nio.file.Files.createTempDirectory("hilb").toString
    Layout.writeHilbertOrdered(pts, s"$base/h", "x", 0, 100, "y", 0, 100, files = 16)
    Layout.writeZordered(pts, s"$base/z", "x", 0, 100, "y", 0, 100, files = 16)
    def filesTouched(path: String, filter: org.apache.spark.sql.Column): Int =
      spark.read.parquet(path).filter(filter)
        .select(input_file_name()).distinct().count().toInt
    val box = col("x") >= 10 && col("x") < 20 && col("y") >= 10 && col("y") < 20
    val h = filesTouched(s"$base/h", box)
    val z = filesTouched(s"$base/z", box)
    assert(h <= z, s"hilbert touched $h files vs zorder $z")
    assert(h < 16, "box must prune at least some files")
    // rows are identical regardless of layout
    assert(spark.read.parquet(s"$base/h").count() == 10000)
  }

  test("bucketed write round-trips and joins without exchange on the bucket key") {
    val df = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    Layout.writeBucketed(df, "graft_bucketed_t", "k", buckets = 4)
    try {
      val t = spark.table("graft_bucketed_t")
      assert(t.count() == 100)
      // self-join on the bucket key: both sides read pre-bucketed data;
      // plan shows no shuffle Exchange feeding the join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = t.as("x").join(t.as("y"), "k")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_t")
  }
}
