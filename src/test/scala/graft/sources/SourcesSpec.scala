package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import java.nio.file.Files

/** Format round-trips over a real testdata table: parquet → {csv, json,
  * orc} → read-back must be value-identical (same rows, same types). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val nation =
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
  }

  test("csv round-trip preserves rows under an explicit schema") {
    val dir = Files.createTempDirectory("src_csv").toString + "/n"
    Sources.stage(nation, dir, "csv")
    val back = Sources.readCsv(spark, dir, nation.schema)
    assert(back.schema == nation.schema)
    assert(rows(back) == rows(nation))
  }

  test("csv round-trip survives embedded newlines and quotes in text fields") {
    import org.apache.spark.sql.functions._
    val docs = spark.createDataFrame(Seq(
      (1L, "plain text"),
      (2L, "line one\nline two\nline three"),
      (3L, "she said \"hello, world\" and left"),
      (4L, "tabs\tand,commas, and\r\nwindows newlines")))
      .toDF("id", "text")
    val dir = Files.createTempDirectory("src_csv_nl").toString + "/d"
    Sources.stage(docs, dir, "csv")
    val back = Sources.readCsv(spark, dir, docs.schema, multiLine = true)
    assert(back.count() == 4, "quoted newlines split records")
    val got = back.orderBy("id").select("text").collect().map(_.getString(0)).toSeq
    val exp = docs.orderBy("id").select("text").collect().map(_.getString(0)).toSeq
    assert(got == exp)
  }

  test("json round-trip preserves rows under an explicit schema") {
    val dir = Files.createTempDirectory("src_json").toString + "/n"
    Sources.stage(nation, dir, "json")
    val back = Sources.readJson(spark, dir, nation.schema)
    assert(rows(back) == rows(nation))
  }

  test("orc round-trip preserves rows and supports pushdown") {
    val dir = Files.createTempDirectory("src_orc").toString + "/n"
    Sources.stage(nation, dir, "orc")
    val back = Sources.readOrc(spark, dir)
    assert(rows(back) == rows(nation))
    // columnar pushdown: the filter must reach the ORC scan
    val filtered = Sources.readOrc(spark, dir).filter("n_nationkey = 3")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]")
      || "PushedFilters: \\[[^\\]]*n_nationkey".r.findFirstIn(scan).isDefined,
      s"filter not pushed to ORC scan:\n$scan")
    assert(filtered.count() == 1)
  }

  test("binaryFile ingestion: glob prunes at listing, size guard on metadata, media contract") {
    val dir = java.nio.file.Files.createTempDirectory("src_bin")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    put("a.img", Array.fill[Byte](64)(1))
    put("b.img", Array.fill[Byte](32)(2))
    put("skip.txt", Array.fill[Byte](8)(3))    // wrong extension: never listed
    put("huge.img", Array.fill[Byte](4096)(4)) // over maxBytes: skipped unread

    val raw = Sources.readBinaryDir(spark, dir.toString, pathGlob = "*.img", maxBytes = 1024)
    val names = raw.collect().map(_.getAs[String]("path").split('/').last).toSet
    assert(names == Set("a.img", "b.img"), names)

    val media = Sources.binaryDirAsMedia(spark, dir.toString, "image/test", pathGlob = "*.img")
      .filter(org.apache.spark.sql.functions.col("meta.n_bytes") <= 1024)
    val got = media.collect()
    assert(got.length == 2)
    assert(got.forall(_.getAs[String]("media_type") == "image/test"))
    // stable ids: re-ingest yields the same media_id set
    val again = Sources.binaryDirAsMedia(spark, dir.toString, "image/test", pathGlob = "*.img")
      .filter(org.apache.spark.sql.functions.col("meta.n_bytes") <= 1024)
    assert(got.map(_.getAs[Long]("media_id")).toSet ==
      again.collect().map(_.getAs[Long]("media_id")).toSet)
    // composes with the multimodal frame sampler (payloads stay distributed)
    val frames = graft.multimodal.Multimodal.sampleFrames(media, n = 4)
    assert(frames.count() == 8) // 4 frames per 2 payloads
  }
}
