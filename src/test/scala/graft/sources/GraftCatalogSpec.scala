package graft.sources

import java.nio.file.Files

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL front door: CREATE/INSERT/CTAS/SELECT/DROP over
  * graft.<ns>.<table> identifiers, interoperating with the path-based
  * store surface (tags, time travel) on the SAME roots. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("gcat").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", w)
    w
  }

  test("CREATE TABLE + INSERT INTO + SELECT round-trips through SQL only") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds")
    spark.sql("CREATE TABLE graft.ds.docs (doc_id BIGINT, txt STRING)")
    spark.sql("INSERT INTO graft.ds.docs VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("INSERT INTO graft.ds.docs VALUES (4, 'd')")
    val got = spark.sql(
      "SELECT count(*) AS n, max(doc_id) AS mx FROM graft.ds.docs").head
    assert(got.getLong(0) == 4 && got.getLong(1) == 4L)
    // two INSERTs = two appended snapshots on the shared protocol
    assert(GraftStore.latestManifest(s"$warehouse/ds/docs",
      GraftStore.driverConf()).get.version == 3L) // v1 CREATE + 2 appends
  }

  test("CTAS materializes a store readable through BOTH surfaces") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_src")
    spark.sql(
      """CREATE TABLE graft.ds.gold AS
        |SELECT doc_id, source FROM docs_src WHERE doc_id < 50""".stripMargin)
    val viaSql = spark.sql("SELECT count(*) FROM graft.ds.gold").head.getLong(0)
    val viaPath = GraftStore.read(spark, s"$warehouse/ds/gold").count()
    assert(viaSql == viaPath && viaSql == 50)
    // path-based tagging works on the catalog-created table
    GraftStore.tag(s"$warehouse/ds/gold", "release")
    assert(spark.read.format("graft-store").option("ref", "release")
      .load(s"$warehouse/ds/gold").count() == 50)
  }

  test("DROP TABLE, SHOW TABLES, and missing-table errors behave") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds2")
    spark.sql("CREATE TABLE graft.ds2.t1 (k BIGINT)")
    spark.sql("CREATE TABLE graft.ds2.t2 (k BIGINT)")
    val names = spark.sql("SHOW TABLES IN graft.ds2")
      .collect().map(_.getString(1)).toSet
    assert(names == Set("t1", "t2"))
    spark.sql("DROP TABLE graft.ds2.t1")
    assert(spark.sql("SHOW TABLES IN graft.ds2")
      .collect().map(_.getString(1)).toSet == Set("t2"))
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft.ds2.t1").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("t1"), ex.getMessage)
  }

  test("racing CREATEs: the v1 manifest slot claim makes exactly one winner") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds3")
    spark.sql("CREATE TABLE graft.ds3.once (k BIGINT)")
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE graft.ds3.once (k BIGINT)")
    }
    assert(ex.getMessage.toLowerCase.contains("already exists"), ex.getMessage)
  }

  test("SQL time travel: VERSION AS OF takes a snapshot number or a tag name") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds6")
    spark.sql("CREATE TABLE graft.ds6.tt (k BIGINT)")
    spark.sql("INSERT INTO graft.ds6.tt VALUES (1), (2)")        // v2
    GraftStore.tag(s"$warehouse/ds6/tt", "first-load")
    spark.sql("INSERT INTO graft.ds6.tt VALUES (3), (4), (5)")   // v3
    assert(spark.sql("SELECT count(*) FROM graft.ds6.tt").head.getLong(0) == 5)
    assert(spark.sql(
      "SELECT count(*) FROM graft.ds6.tt VERSION AS OF 2").head.getLong(0) == 2)
    assert(spark.sql(
      "SELECT count(*) FROM graft.ds6.tt VERSION AS OF 'first-load'")
      .head.getLong(0) == 2)
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft.ds6.tt VERSION AS OF 99").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("tt"), ex.getMessage)
  }

  test("DESCRIBE EXTENDED surfaces current version and refs as table properties") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds7")
    spark.sql("CREATE TABLE graft.ds7.meta (k BIGINT)")
    spark.sql("INSERT INTO graft.ds7.meta VALUES (1)")
    GraftStore.tag(s"$warehouse/ds7/meta", "v-one")
    val props = spark.sql("DESCRIBE TABLE EXTENDED graft.ds7.meta")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val info = props.getOrElse("Table Properties", "")
    assert(info.contains("current_version=2"), info)
    assert(info.contains("ref.v-one=2"), info)
  }

  test("writeStream.toTable lands micro-batches in a catalog table") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds5")
    spark.sql("CREATE TABLE graft.ds5.sink (doc_id BIGINT, source STRING)")
    val staging = Files.createTempDirectory("gcat_stream").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source").filter("doc_id < 40")
    src.coalesce(2).write.mode("overwrite").parquet(staging)
    val q = spark.readStream.schema(src.schema).parquet(staging)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("gcat_ckpt").toString)
      .toTable("graft.ds5.sink")
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT count(*) FROM graft.ds5.sink").head.getLong(0) == 40)
    // the streamed table is an ordinary store: path surface sees it too
    assert(GraftStore.read(spark, s"$warehouse/ds5/sink").count() == 40)
  }

  test("two concurrent CREATEs of the same table: exactly one winner (real threads)") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val wh = Files.createTempDirectory("gcat_race").toString
    val cat = new GraftCatalog
    cat.initialize("g", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("warehouse" -> wh).asJava))
    cat.createNamespace(Array("ns"), Map.empty[String, String].asJava)
    val ident = Identifier.of(Array("ns"), "raced")
    val schema = StructType(Seq(StructField("k", LongType)))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        gate.await()
        try { cat.createTable(ident, schema, Array.empty, Map.empty[String, String].asJava)
          outcomes.add("ok") }
        catch {
          case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException =>
            outcomes.add("exists")
        }
      }, s"create-race-$i")
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(outcomes.asScala.toSeq.sorted == Seq("exists", "ok"),
      outcomes.asScala.toSeq.toString)
    // the surviving table is the single v1 snapshot
    assert(GraftStore.latestManifest(s"$wh/ns/raced",
      GraftStore.driverConf()).get.version == 1L)
  }

  test("INSERT onto a catalog table honors the widening-append evolution rule") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds4")
    spark.sql("CREATE TABLE graft.ds4.ev (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ds4.ev VALUES (1, 1.5)")
    // incompatible write (missing column) must fail loudly, not corrupt
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO graft.ds4.ev VALUES (2)")
    }
    assert(ex != null)
    assert(spark.sql("SELECT count(*) FROM graft.ds4.ev").head.getLong(0) == 1)
  }
}
