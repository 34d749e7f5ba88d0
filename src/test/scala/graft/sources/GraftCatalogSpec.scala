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
    // the CatalogManager pins the instance (and its warehouse) at FIRST
    // use in the session — if another suite already touched graft.*,
    // the conf above is ignored. Resolve the LIVE warehouse so every
    // path-based assertion below targets the same roots SQL does,
    // regardless of suite order.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.warmup")
    spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog].warehousePath
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

  test("$snapshots / $refs metadata tables are SQL-queryable commit history") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds9")
    spark.sql("DROP TABLE IF EXISTS graft.ds9.hist")
    spark.sql("CREATE TABLE graft.ds9.hist (k BIGINT)")
    spark.sql("INSERT INTO graft.ds9.hist VALUES (1), (2)")
    spark.sql("INSERT INTO graft.ds9.hist VALUES (3)")
    GraftStore.tag(s"$warehouse/ds9/hist", "rel")
    val snaps = spark.sql(
      "SELECT version, n_files, n_rows, n_bytes FROM graft.ds9.`hist$snapshots` ORDER BY version")
      .collect()
    assert(snaps.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(snaps.map(_.getLong(2)).toSeq == Seq(0L, 2L, 3L), "exact row history")
    assert(snaps.drop(1).forall(_.getLong(3) > 0), "bytes recorded once data lands")
    val refs = spark.sql("SELECT name, version FROM graft.ds9.`hist$refs`").collect()
    assert(refs.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("rel", 3L)))
    // unknown metadata suffix and missing base table both fail loudly
    assert(intercept[Exception](
      spark.sql("SELECT * FROM graft.ds9.`hist$bogus`").collect())
      .getMessage.nonEmpty)
    assert(intercept[Exception](
      spark.sql("SELECT * FROM graft.ds9.`nope$snapshots`").collect())
      .getMessage.nonEmpty)
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

  test("DELETE FROM ... WHERE is a file-pruned copy-on-write rewrite") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.t (k BIGINT, v STRING)")
    // two appends with DISJOINT key ranges → two files whose min/max
    // stats separate cleanly
    spark.sql("INSERT INTO graft.dml.t SELECT id AS k, 'lo' AS v FROM range(1, 101)")
    spark.sql("INSERT INTO graft.dml.t SELECT id AS k, 'hi' AS v FROM range(1000, 1101)")
    val root = s"$warehouse/dml/t"
    val before = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    val loFiles = before.files.filter(_.stats.get("k").exists(_._2.nonEmpty))
      .filterNot(f => GsbStats.mayMatch(
        org.apache.spark.sql.sources.GreaterThanOrEqual("k", 1000L),
        before.schema, f.stats)).map(_.relPath).toSet
    assert(loFiles.nonEmpty, "stats must prove the lo files untouched")
    spark.sql("DELETE FROM graft.dml.t WHERE k >= 1000 AND k < 1050")
    val after = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    // rows: all 100 lo survive, hi loses [1000,1050)
    assert(spark.sql("SELECT count(*) FROM graft.dml.t").head.getLong(0) == 151)
    assert(spark.sql(
      "SELECT count(*) FROM graft.dml.t WHERE k >= 1000 AND k < 1050")
      .head.getLong(0) == 0)
    // file pruning: every provably-unmatched file is carried forward
    // BYTE-IDENTICALLY (same relPath in the new manifest — no rewrite)
    val afterPaths = after.files.map(_.relPath).toSet
    assert(loFiles.subsetOf(afterPaths), s"$loFiles not in $afterPaths")
    // the pre-delete snapshot stays time-travelable (COW never deletes)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.dml.t VERSION AS OF ${before.version}")
      .head.getLong(0) == 201)
  }

  test("bare DELETE FROM truncates via one metadata-only commit") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml2")
    spark.sql("CREATE TABLE graft.dml2.t (k BIGINT)")
    spark.sql("INSERT INTO graft.dml2.t SELECT id FROM range(0, 50)")
    val root = s"$warehouse/dml2/t"
    val v = GraftStore.latestManifest(root, GraftStore.driverConf()).get.version
    spark.sql("DELETE FROM graft.dml2.t")
    val m = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    assert(m.version == v + 1 && m.files.isEmpty) // O(1): no data written
    assert(spark.sql("SELECT count(*) FROM graft.dml2.t").head.getLong(0) == 0)
    // truncate is a snapshot like any other: the data survives behind it
    assert(spark.sql(s"SELECT count(*) FROM graft.dml2.t VERSION AS OF $v")
      .head.getLong(0) == 50)
  }

  test("DELETE with an untranslatable predicate falls back to the row-level rewrite") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml3")
    spark.sql("CREATE TABLE graft.dml3.t (k BIGINT)")
    spark.sql("INSERT INTO graft.dml3.t SELECT id FROM range(0, 10)")
    // k % 2 = 0 has no v1 Filter form → canDeleteWhere=false → Spark
    // routes through SupportsRowLevelOperations (group-based COW
    // rewrite) instead of the metadata-assisted fast path
    spark.sql("DELETE FROM graft.dml3.t WHERE k % 2 = 0")
    assert(spark.sql("SELECT count(*) FROM graft.dml3.t").head.getLong(0) == 5)
    assert(spark.sql("SELECT count(*) FROM graft.dml3.t WHERE k % 2 = 0")
      .head.getLong(0) == 0)
  }

  test("SQL UPDATE rewrites matched rows and keeps the rest byte-stable") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml4")
    spark.sql("CREATE TABLE graft.dml4.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.dml4.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 20)")
    spark.sql("UPDATE graft.dml4.t SET v = v * 10 WHERE k >= 15")
    val rows = spark.sql("SELECT k, v FROM graft.dml4.t ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.size == 20)
    assert((0L until 15L).forall(k => rows(k) == k.toDouble))
    assert((15L until 20L).forall(k => rows(k) == k * 10.0))
    // pre-update snapshot stays readable (COW never deletes inline)
    val root = s"$warehouse/dml4/t"
    val v = GraftStore.latestManifest(root, GraftStore.driverConf()).get.version
    assert(spark.sql(
      s"SELECT max(v) FROM graft.dml4.t VERSION AS OF ${v - 1}")
      .head.getDouble(0) == 19.0)
  }

  test("MERGE INTO upserts through the row-level rewrite") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml5")
    spark.sql("CREATE TABLE graft.dml5.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml5.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("""
      MERGE INTO graft.dml5.t AS t
      USING (SELECT * FROM VALUES (2, 'B'), (4, 'D') AS s(k, v)) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val got = spark.sql("SELECT k, v FROM graft.dml5.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
  }

  test("VERSION AS OF resolves an all-digit TAG when no such snapshot exists") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dig")
    spark.sql("CREATE TABLE graft.dig.t (k BIGINT)")
    spark.sql("INSERT INTO graft.dig.t VALUES (1)") // v2
    val root = s"$warehouse/dig/t"
    GraftStore.tag(root, "2024", 2L) // legal all-digit tag name
    spark.sql("INSERT INTO graft.dig.t VALUES (2)") // v3 advances past it
    // '2024' is no snapshot number here → must fall back to the tag
    assert(spark.sql("SELECT count(*) FROM graft.dig.t VERSION AS OF '2024'")
      .head.getLong(0) == 1)
    // a REAL snapshot number still wins over ref resolution
    assert(spark.sql("SELECT count(*) FROM graft.dig.t VERSION AS OF 3")
      .head.getLong(0) == 2)
  }

  test("INSERT INTO ... REPLACE WHERE swaps a key range atomically, file-pruned") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rw")
    spark.sql("CREATE TABLE graft.rw.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.rw.t SELECT id, 'old-lo' FROM range(0, 50)")
    spark.sql("INSERT INTO graft.rw.t SELECT id, 'old-hi' FROM range(1000, 1050)")
    val root = s"$warehouse/rw/t"
    val before = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    // replace the hi range with a fresh (smaller) batch
    spark.sql("""INSERT INTO graft.rw.t REPLACE WHERE k >= 1000
                |SELECT id, 'new-hi' FROM range(1000, 1010)""".stripMargin)
    val after = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    assert(after.version == before.version + 1) // ONE atomic publish
    val counts = spark.sql(
      "SELECT v, count(*) AS n FROM graft.rw.t GROUP BY v ORDER BY v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("old-lo" -> 50L, "new-hi" -> 10L), counts.toString)
    // the lo files provably unmatched by k >= 1000 carry forward as-is
    val loFiles = before.files.filterNot(f => GsbStats.mayMatch(
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 1000L),
      before.schema, f.stats)).map(_.relPath).toSet
    assert(loFiles.nonEmpty &&
      loFiles.subsetOf(after.files.map(_.relPath).toSet))
  }

  test("ALTER TABLE ADD COLUMNS is metadata-only; old rows null-fill") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.alt")
    spark.sql("CREATE TABLE graft.alt.t (k BIGINT)")
    spark.sql("INSERT INTO graft.alt.t SELECT id FROM range(0, 5)")
    val root = s"$warehouse/alt/t"
    val before = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    spark.sql("ALTER TABLE graft.alt.t ADD COLUMNS (score DOUBLE)")
    val after = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    // one metadata commit, identical file set, widened schema
    assert(after.version == before.version + 1)
    assert(after.files == before.files)
    assert(after.schema.fieldNames.toSeq == Seq("k", "score"))
    // old rows read back null-filled; new writes can use the column
    assert(spark.sql(
      "SELECT count(*) FROM graft.alt.t WHERE score IS NULL")
      .head.getLong(0) == 5)
    spark.sql("INSERT INTO graft.alt.t VALUES (100, 0.5)")
    assert(spark.sql(
      "SELECT count(*) FROM graft.alt.t WHERE score IS NOT NULL")
      .head.getLong(0) == 1)
    // type changes stay refused (they would invalidate committed bytes)
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.alt.t ALTER COLUMN k TYPE STRING")
    }
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

  test("DELETE/REPLACE WHERE keep rows whose predicate is NULL (three-valued logic)") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.nulldml")
    spark.sql("CREATE TABLE graft.nulldml.t (k BIGINT, v BIGINT)")
    // v NULL on even k — a DELETE on v must not silently drop those rows
    spark.sql("INSERT INTO graft.nulldml.t " +
      "SELECT id AS k, IF(id % 2 = 0, CAST(NULL AS BIGINT), id * 10) AS v " +
      "FROM range(0, 20)")
    spark.sql("DELETE FROM graft.nulldml.t WHERE v >= 100")
    // deleted: odd k with v >= 100 (k = 11,13,15,17,19); NULL-v rows
    // (even k) and odd k < 10 all SURVIVE — the SQL standard / Delta /
    // Iceberg COW contract ("condition not TRUE" keeps the row)
    assert(spark.sql("SELECT count(*) FROM graft.nulldml.t").head.getLong(0) == 15)
    assert(spark.sql(
      "SELECT count(*) FROM graft.nulldml.t WHERE v IS NULL").head.getLong(0) == 10)
    // same contract through REPLACE WHERE's survivor half
    spark.sql("INSERT INTO graft.nulldml.t REPLACE WHERE v < 100 " +
      "SELECT CAST(777 AS BIGINT) AS k, CAST(7 AS BIGINT) AS v")
    val rows = spark.sql("SELECT k, v FROM graft.nulldml.t ORDER BY k")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // NULL-v rows survive the v<100 replacement; odd v<100 rows replaced
    assert(rows.count(_._2 == -1L) == 10, rows.mkString(","))
    assert(rows.contains((777L, 7L)))
    assert(!rows.exists(p => p._2 >= 0 && p._2 < 100 && p._1 != 777L), rows.mkString(","))
  }

  test("REPLACE WHERE does NOT validate the incoming batch (documented divergence)") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rwv")
    spark.sql("CREATE TABLE graft.rwv.t (k BIGINT)")
    spark.sql("INSERT INTO graft.rwv.t SELECT id FROM range(0, 10)")
    // the inserted row VIOLATES the replace predicate — it lands anyway
    // (GsbReplaceWhereWrite scaladoc pins this as the Delta-divergent
    // contract; callers needing enforcement filter the batch themselves)
    spark.sql("INSERT INTO graft.rwv.t REPLACE WHERE k < 5 SELECT CAST(999 AS BIGINT)")
    val ks = spark.sql("SELECT k FROM graft.rwv.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(ks == Seq(5L, 6L, 7L, 8L, 9L, 999L), ks)
  }

  test("ALTER TABLE DROP COLUMN is metadata-only; old snapshots keep the column") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.evo")
    spark.sql("CREATE TABLE graft.evo.d (k BIGINT, junk STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.evo.d SELECT id, concat('j', id), id * 2 FROM range(0, 10)")
    val root = s"$warehouse/evo/d"
    val preDrop = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    spark.sql("ALTER TABLE graft.evo.d DROP COLUMN junk")
    // the current snapshot no longer presents the column...
    assert(spark.table("graft.evo.d").schema.fieldNames.toSeq == Seq("k", "v"))
    assert(spark.sql("SELECT sum(v) FROM graft.evo.d").head.getLong(0) == 90)
    // ...the files were NOT rewritten (metadata-only)...
    val after = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    assert(after.files.map(_.relPath) == preDrop.files.map(_.relPath))
    // ...and the pre-drop snapshot still reads the column (immutable history)
    assert(spark.sql(
      s"SELECT count(junk) FROM graft.evo.d VERSION AS OF ${preDrop.version}")
      .head.getLong(0) == 10)
    // re-adding the dropped name is rejected (files still carry its data)
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE graft.evo.d ADD COLUMNS (junk STRING)")
    }
    assert(ex.getMessage.contains("reserved"), ex.getMessage)
    // dropping the last column is rejected
    spark.sql("ALTER TABLE graft.evo.d DROP COLUMN v")
    val ex2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.evo.d DROP COLUMN k")
    }
    assert(ex2.getMessage.contains("last column"), ex2.getMessage)
  }

  test("ALTER TABLE RENAME COLUMN chains resolve old files; appends use the new name") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.evo")
    spark.sql("CREATE TABLE graft.evo.r (k BIGINT, a BIGINT)")
    spark.sql("INSERT INTO graft.evo.r SELECT id, id * 10 FROM range(0, 5)")
    spark.sql("ALTER TABLE graft.evo.r RENAME COLUMN a TO b")
    // data written under 'a' reads back under 'b'
    assert(spark.sql("SELECT sum(b) FROM graft.evo.r").head.getLong(0) == 100)
    // an append under the new name lands; both generations read together
    spark.sql("INSERT INTO graft.evo.r SELECT id, id * 10 FROM range(5, 10)")
    assert(spark.sql("SELECT sum(b) FROM graft.evo.r").head.getLong(0) == 450)
    // a second rename composes the chain across BOTH file generations
    spark.sql("ALTER TABLE graft.evo.r RENAME COLUMN b TO c")
    assert(spark.sql("SELECT sum(c) FROM graft.evo.r").head.getLong(0) == 450)
    // stats survive the rename: a filter on the new name still skips
    assert(spark.sql("SELECT count(*) FROM graft.evo.r WHERE c >= 50")
      .head.getLong(0) == 5)
    // the vacated names are reserved
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE graft.evo.r ADD COLUMNS (a BIGINT)")
    }
    assert(ex.getMessage.contains("reserved"), ex.getMessage)
    // DML over the renamed view keeps working (delete on the new name)
    spark.sql("DELETE FROM graft.evo.r WHERE c < 30")
    assert(spark.sql("SELECT count(*), sum(c) FROM graft.evo.r").head.toSeq
      == Seq(7L, 420L))
  }

  test("TIMESTAMP AS OF resolves the latest snapshot at or before the instant") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    spark.sql("CREATE TABLE graft.tt.t (k BIGINT)")
    spark.sql("INSERT INTO graft.tt.t SELECT id FROM range(0, 5)")
    val t1 = System.currentTimeMillis()
    // make the next commit's ts STRICTLY greater than t1
    while (System.currentTimeMillis() <= t1) Thread.sleep(1)
    spark.sql("INSERT INTO graft.tt.t SELECT id FROM range(5, 10)")
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneId.systemDefault())
    val lit = fmt.format(java.time.Instant.ofEpochMilli(t1))
    assert(spark.sql(
      s"SELECT count(*) FROM graft.tt.t TIMESTAMP AS OF '$lit'")
      .head.getLong(0) == 5)
    // an instant before table creation has no snapshot
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft.tt.t TIMESTAMP AS OF '1999-01-01 00:00:00'")
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("table"), ex.getMessage)
  }

  test("a table whose name contains '$' stays loadable (only $snapshots/$refs are metadata)") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dollar")
    spark.sql("CREATE TABLE graft.dollar.`a$b` (k BIGINT)")
    spark.sql("INSERT INTO graft.dollar.`a$b` SELECT id FROM range(0, 7)")
    assert(spark.sql("SELECT count(*) FROM graft.dollar.`a$b`").head.getLong(0) == 7)
    // its metadata tables still resolve through the known suffixes
    assert(spark.sql("SELECT count(*) FROM graft.dollar.`a$b$snapshots`")
      .head.getLong(0) == 2) // v1 CREATE + 1 append
  }

  test("PARTITIONED BY clusters writes: per-file ranges disjoint, metadata survives appends") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("DROP TABLE IF EXISTS graft.cl.ev")
    spark.sql(
      "CREATE TABLE graft.cl.ev (k BIGINT, v STRING) PARTITIONED BY (k) " +
        "TBLPROPERTIES ('write.partitions'='6')")
    val root = s"$warehouse/cl/ev"
    val conf = GraftStore.driverConf()
    assert(GraftStore.latestManifest(root, conf).get.cluster == Seq("k"),
      "CREATE must record the clustering column in the manifest")
    spark.sql(
      "INSERT INTO graft.cl.ev SELECT id, CAST(id AS STRING) FROM range(0, 10000)")
    // the write was REQUIRED to arrive range-distributed+sorted on k:
    // several files, each covering a contiguous slice — pairwise
    // disjoint [min,max] ranges (boundaries may touch, never overlap)
    val m = GraftStore.latestManifest(root, conf).get
    assert(m.cluster == Seq("k"), "clustering metadata must survive the append")
    val ranges = m.files.flatMap { f =>
      f.stats.get("k").map(s => (s._1.toString.toLong, s._2.toString.toLong))
    }.sortBy(_._1)
    assert(ranges.size > 1, s"expected a multi-file clustered layout: $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges overlap: $ranges")
      case _ => ()
    }
    // planning-time pruning through SQL: a point predicate keeps 1 file
    val q = spark.sql("SELECT count(*) FROM graft.cl.ev WHERE k = 4321")
    val leaf = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    val kept = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(leaf).get
    assert(kept.group(1).toInt < kept.group(2).toInt, leaf)
    assert(q.head.getLong(0) == 1L)
    // appends keep clustering too (second INSERT goes through commitLoop)
    spark.sql("INSERT INTO graft.cl.ev VALUES (20000, 'x')")
    assert(GraftStore.latestManifest(root, conf).get.cluster == Seq("k"))
  }

  test("compact re-clusters: overlapping appended ranges come out contiguous again") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("DROP TABLE IF EXISTS graft.cl.recl")
    spark.sql("CREATE TABLE graft.cl.recl (k BIGINT, v STRING) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.partitions'='4')")
    val root = s"$warehouse/cl/recl"
    val conf = GraftStore.driverConf()
    // two appends over the SAME key domain: each append is internally
    // range-clustered, but across the two commits every range overlaps
    spark.sql("INSERT INTO graft.cl.recl SELECT id, 'a' FROM range(0, 4000)")
    spark.sql("INSERT INTO graft.cl.recl SELECT id, 'b' FROM range(0, 4000)")
    def ranges(): Seq[(Long, Long)] =
      GraftStore.latestManifest(root, conf).get.files.flatMap(
        _.stats.get("k").map(s => (s._1.toLong, s._2.toLong))).sortBy(_._1)
    val before = ranges()
    assert(before.sliding(2).exists {
      case Seq((_, hi), (lo2, _)) => hi > lo2
      case _ => false
    }, s"appends over one domain should overlap across commits: $before")
    GraftStore.compact(spark, root, targetFiles = 2)
    val m = GraftStore.latestManifest(root, conf).get
    assert(m.cluster == Seq("k"), "clustering metadata must survive compaction")
    val after = ranges()
    assert(after.nonEmpty)
    after.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"post-compact ranges must be disjoint: $after")
      case _ => ()
    }
    assert(spark.sql("SELECT count(*) FROM graft.cl.recl").head.getLong(0) == 8000L)
  }

  test("streaming appends to a clustered table arrive range-clustered too") {
    // RequiresDistributionAndOrdering rides the shared Write, and Spark
    // applies it to micro-batch writes as well — so a streaming ingest
    // lands each epoch as contiguous range slices and date-bounded
    // readers prune streamed data exactly like batch-written data
    warehouse
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("DROP TABLE IF EXISTS graft.cl.sev")
    spark.sql("CREATE TABLE graft.cl.sev (k BIGINT, v STRING) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.partitions'='4')")
    val root = s"$warehouse/cl/sev"
    val src = Files.createTempDirectory("sclu_in").toString
    (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(2)
      .write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema("k BIGINT, v STRING").parquet(src)
      .writeStream.format("graft-store").option("path", root)
      .option("checkpointLocation", Files.createTempDirectory("sclu_ck").toString)
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val m = GraftStore.latestManifest(root, GraftStore.driverConf()).get
    assert(m.cluster == Seq("k"))
    val ranges = m.files.flatMap(_.stats.get("k")
      .map(s => (s._1.toLong, s._2.toLong))).sortBy(_._1)
    assert(ranges.size > 1, s"expected multi-file epoch: $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"streamed file ranges overlap: $ranges")
      case _ => ()
    }
    assert(spark.sql("SELECT count(*) FROM graft.cl.sev").head.getLong(0) == 4000L)
  }

  test("compact honors targetFiles on an AQE-sized clustered table (clusterParts=0)") {
    // without write.partitions, AQE sizes clustered writes — a table
    // below one advisory partition would compact to ONE unprunable
    // file; compact's per-write override keeps its file-count contract
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("DROP TABLE IF EXISTS graft.cl.aqe")
    spark.sql("CREATE TABLE graft.cl.aqe (k BIGINT, v STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.cl.aqe SELECT id, 'a' FROM range(0, 3000)")
    spark.sql("INSERT INTO graft.cl.aqe SELECT id, 'b' FROM range(3000, 6000)")
    val root = s"$warehouse/cl/aqe"
    val conf = GraftStore.driverConf()
    GraftStore.compact(spark, root, targetFiles = 4)
    val m = GraftStore.latestManifest(root, conf).get
    assert(m.cluster == Seq("k") && m.clusterParts == 0)
    val ranges = m.files.flatMap(_.stats.get("k")
      .map(s => (s._1.toLong, s._2.toLong))).sortBy(_._1)
    assert(ranges.size == 4, s"targetFiles must win over AQE collapse: $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, ranges.toString)
      case _ => ()
    }
    assert(spark.sql("SELECT count(*) FROM graft.cl.aqe").head.getLong(0) == 6000L)
  }

  test("ALTER TABLE SET TBLPROPERTIES retunes the clustered write fan-out") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("DROP TABLE IF EXISTS graft.cl.tune")
    spark.sql("CREATE TABLE graft.cl.tune (k BIGINT, v STRING) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.partitions'='2')")
    val root = s"$warehouse/cl/tune"
    val conf = GraftStore.driverConf()
    spark.sql("ALTER TABLE graft.cl.tune SET TBLPROPERTIES ('write.partitions'='6')")
    assert(GraftStore.latestManifest(root, conf).get.clusterParts == 6)
    // the next write uses the retuned fan-out
    spark.sql("INSERT INTO graft.cl.tune SELECT id, 'a' FROM range(0, 6000)")
    val m = GraftStore.latestManifest(root, conf).get
    assert(m.files.size == 6, m.files.map(_.relPath).toString)
    // UNSET clears back to AQE-sized (0)
    spark.sql("ALTER TABLE graft.cl.tune UNSET TBLPROPERTIES ('write.partitions')")
    assert(GraftStore.latestManifest(root, conf).get.clusterParts == 0)
    // knob rejected on an unclustered table and for unknown properties
    spark.sql("DROP TABLE IF EXISTS graft.cl.plain")
    spark.sql("CREATE TABLE graft.cl.plain (k BIGINT)")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cl.plain SET TBLPROPERTIES ('write.partitions'='4')")
    }
    assert(e1.getMessage.contains("PARTITIONED BY"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cl.tune SET TBLPROPERTIES ('whatever'='1')")
    }
    assert(e2.getMessage.contains("unsupported table property"), e2.getMessage)
  }

  test("row-level DML re-clusters rewritten rows; schema-replacing overwrite clears the spec") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("DROP TABLE IF EXISTS graft.cl.dml")
    spark.sql("CREATE TABLE graft.cl.dml (k BIGINT, v STRING) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.partitions'='4')")
    val root = s"$warehouse/cl/dml"
    val conf = GraftStore.driverConf()
    spark.sql("INSERT INTO graft.cl.dml SELECT id, 'a' FROM range(0, 4000)")
    // an UPDATE takes the group-based rewrite path — its replacement
    // files must come out range-clustered like the append path's
    spark.sql("UPDATE graft.cl.dml SET v = 'b' WHERE k % 7 = 0")
    val m = GraftStore.latestManifest(root, conf).get
    assert(m.cluster == Seq("k"))
    val ranges = m.files.flatMap(_.stats.get("k")
      .map(s => (s._1.toLong, s._2.toLong))).sortBy(_._1)
    assert(ranges.size > 1, ranges.toString)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"post-UPDATE file ranges overlap: $ranges")
      case _ => ()
    }
    assert(spark.sql("SELECT count(*) FROM graft.cl.dml WHERE v = 'b'")
      .head.getLong(0) == spark.sql(
      "SELECT count(*) FROM graft.cl.dml WHERE k % 7 = 0").head.getLong(0))
    // an overwrite that REPLACES the schema without the cluster column
    // must clear the clustering spec rather than advertise a layout on
    // a column the table no longer has
    Seq((1L, 2.0)).toDF("id", "score").write.format("graft-store")
      .mode("overwrite").save(root)
    val m2 = GraftStore.latestManifest(root, conf).get
    assert(m2.cluster.isEmpty && m2.clusterParts == 0,
      s"stale clustering spec survived a schema replace: ${m2.cluster}")
  }

  test("mid-stream RENAME COLUMN: later micro-batches stream the renamed column's values") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.st")
    spark.sql("DROP TABLE IF EXISTS graft.st.ren")
    spark.sql("CREATE TABLE graft.st.ren (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.st.ren VALUES (1, 'a')")
    val root = s"$warehouse/st/ren"
    val q = spark.readStream.format("graft-store").load(root)
      .writeStream.format("memory").queryName("ren_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // the analyzed stream schema speaks the stream-start names (v);
      // rename the column and append under the NEW name — the values
      // must keep flowing (a pinned rename chain would null-fill them)
      spark.sql("ALTER TABLE graft.st.ren RENAME COLUMN v TO w")
      spark.sql("INSERT INTO graft.st.ren VALUES (2, 'b')")
      q.processAllAvailable()
      val got = spark.sql("SELECT k, v FROM ren_stream ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "a"), (2L, "b")),
        s"post-rename append must stream its values, got $got")
    } finally q.stop()
  }

  test("PARTITIONED BY guards: non-identity transforms and cluster-column DDL rejected") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    val bucketErr = intercept[Exception] {
      spark.sql("CREATE TABLE graft.cl.bad (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (bucket(4, k))")
    }
    assert(bucketErr.getMessage.contains("identity") ||
      bucketErr.getMessage.contains("unsupported"), bucketErr.getMessage)
    spark.sql("DROP TABLE IF EXISTS graft.cl.guard")
    spark.sql("CREATE TABLE graft.cl.guard (k BIGINT, v STRING) PARTITIONED BY (k)")
    val dropErr = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cl.guard DROP COLUMN k")
    }
    assert(dropErr.getMessage.contains("clustering"), dropErr.getMessage)
    val renErr = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cl.guard RENAME COLUMN k TO kk")
    }
    assert(renErr.getMessage.contains("clustering"), renErr.getMessage)
    // non-cluster columns still evolve freely
    spark.sql("ALTER TABLE graft.cl.guard ADD COLUMNS (extra STRING)")
    assert(spark.table("graft.cl.guard").columns.contains("extra"))
  }
}
