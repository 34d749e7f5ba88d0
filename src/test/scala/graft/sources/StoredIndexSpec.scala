package graft.sources

import java.nio.file.Files

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tombstone-aware stored-index maintenance: delete detection through
  * file-level CDC (readRemoved / netDeletedKeys), O(delta) tombstone
  * appends, the live view, and physical compaction + vacuum. */
class StoredIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("gsidx").toString + "/store"

  private def ids(df: DataFrame, c: String = "k"): Set[Long] =
    df.select(c).collect().map(_.getLong(0)).toSet

  test("readRemoved surfaces exactly the rows a DELETE's rewrite dropped") {
    val dir = tmp()
    val base = (1L to 100L).toDF("k").withColumn("p", col("k") * 10)
    GraftStore.write(base.repartition(4), dir, overwrite = true)
    GraftStore.delete(dir, Array(
      org.apache.spark.sql.sources.LessThan("k", 20L)))
    // removed side = full old content of every rewritten file
    // (deleted rows + survivors that were re-added)
    val removed = ids(GraftStore.readRemoved(spark, dir, sinceVersion = 1L))
    assert((1L until 20L).toSet.subsetOf(removed), s"removed=$removed")
    // added side = the rewritten survivors
    val added = ids(GraftStore.readChanges(spark, dir, sinceVersion = 1L))
    assert(added.forall(_ >= 20L))
    // net = exactly the delete batch
    val net = ids(GraftStore.netDeletedKeys(spark, dir, 1L, Seq("k")))
    assert(net == (1L until 20L).toSet, s"net=$net")
  }

  test("netDeletedKeys is empty for a pure append") {
    val dir = tmp()
    GraftStore.write((1L to 10L).toDF("k"), dir, overwrite = true)
    GraftStore.write((11L to 20L).toDF("k"), dir)
    assert(GraftStore.netDeletedKeys(spark, dir, 1L, Seq("k")).count() == 0L)
    assert(ids(GraftStore.readChanges(spark, dir, 1L)) == (11L to 20L).toSet)
  }

  test("tombstone append + live view + compaction lifecycle") {
    val dir = tmp()
    val idx = (1L to 50L).toDF("k").withColumn("cell", col("k") % 5)
    GraftStore.write(idx, dir, overwrite = true)
    // logical delete of 10 keys: one O(delta) append, no file rewritten
    val filesBefore = GraftStore.latestManifest(dir, GraftStore.driverConf())
      .get.files.map(_.relPath).toSet
    StoredIndex.appendTombstones(spark, dir, (1L to 10L).toDF("k"))
    val after = GraftStore.latestManifest(dir, GraftStore.driverConf()).get
    assert(filesBefore.subsetOf(after.files.map(_.relPath).toSet),
      "tombstone append must carry every index data file forward untouched")
    assert(after.schema.fieldNames.contains(StoredIndex.TombstoneCol))
    // live view masks the dead keys and hides the marker column
    val live = StoredIndex.readLive(spark, dir, Seq("k"))
    assert(ids(live) == (11L to 50L).toSet)
    assert(!live.columns.contains(StoredIndex.TombstoneCol))
    // duplicate tombstones are idempotent at read time
    StoredIndex.appendTombstones(spark, dir, Seq(5L, 6L).toDF("k"))
    assert(ids(StoredIndex.readLive(spark, dir, Seq("k"))) == (11L to 50L).toSet)
    // a delta INSERT between deletes still lands (schema aligned)
    StoredIndex.appendRows(spark, dir,
      Seq((51L, 1L)).toDF("k", "cell"))
    assert(ids(StoredIndex.readLive(spark, dir, Seq("k"))) ==
      (11L to 51L).toSet)
    // compaction folds tombstones physically and vacuums dead files
    val removed = StoredIndex.compactTombstones(spark, dir, Seq("k"))
    assert(removed > 0, "compaction should vacuum superseded files")
    val folded = GraftStore.read(spark, dir)
    assert(!folded.columns.contains(StoredIndex.TombstoneCol),
      "overwrite must retire the marker column")
    assert(ids(folded) == (11L to 51L).toSet)
    // post-compaction the live view is a plain scan again
    assert(ids(StoredIndex.readLive(spark, dir, Seq("k"))) ==
      (11L to 51L).toSet)
  }

  test("upsert recipe: a re-inserted key outranks its own batch's tombstone") {
    val dir = tmp()
    val idx = (1L to 20L).toDF("k").withColumn("cell", col("k") % 4)
    GraftStore.write(idx, dir, overwrite = true)
    // upsert batch: keys 5..8 change cell; 15..20 are deleted
    StoredIndex.appendTombstones(spark, dir,
      ((5L to 8L) ++ (15L to 20L)).toDF("k"))
    StoredIndex.appendRows(spark, dir,
      (5L to 8L).toDF("k").withColumn("cell", lit(99L)))
    val live = StoredIndex.readLive(spark, dir, Seq("k"))
    assert(ids(live) == (1L to 14L).toSet, "deletes applied, upserts kept")
    val cells = live.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (5L to 8L).foreach(k => assert(cells(k) == 99L, s"key $k must carry the NEW cell"))
    (1L to 4L).foreach(k => assert(cells(k) == k % 4, s"key $k unchanged"))
    // a LATER tombstone still kills the re-inserted row (gen ordering)
    StoredIndex.appendTombstones(spark, dir, Seq(5L).toDF("k"))
    assert(ids(StoredIndex.readLive(spark, dir, Seq("k"))) ==
      ((1L to 14L).toSet - 5L))
    // compaction folds everything; marker columns gone
    StoredIndex.compactTombstones(spark, dir, Seq("k"))
    val folded = GraftStore.read(spark, dir)
    assert(folded.columns.toSet == Set("k", "cell"))
    assert(ids(folded) == ((1L to 14L).toSet - 5L))
  }

  test("appendTombstones rejects keys absent from the index schema") {
    val dir = tmp()
    GraftStore.write((1L to 5L).toDF("k"), dir, overwrite = true)
    val e = intercept[IllegalArgumentException] {
      StoredIndex.appendTombstones(spark, dir, Seq(1L).toDF("wrong_key"))
    }
    assert(e.getMessage.contains("wrong_key"))
  }

  test("deletes flow base-CDC -> tombstones -> live index, end to end") {
    val baseDir = tmp(); val idxDir = tmp()
    val base = (1L to 60L).toDF("k").withColumn("payload", col("k") * 7)
    GraftStore.write(base.repartition(3), baseDir, overwrite = true)
    // derived index: k -> bucket
    GraftStore.write(base.select(col("k"), (col("k") % 4).as("bucket")),
      idxDir, overwrite = true)
    GraftStore.delete(baseDir, Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 50L)))
    val dead = GraftStore.netDeletedKeys(spark, baseDir, 1L, Seq("k"))
    StoredIndex.appendTombstones(spark, idxDir, dead)
    assert(ids(StoredIndex.readLive(spark, idxDir, Seq("k"))) ==
      (1L until 50L).toSet)
    StoredIndex.compactTombstones(spark, idxDir, Seq("k"))
    assert(ids(GraftStore.read(spark, idxDir)) == (1L until 50L).toSet)
  }
}
