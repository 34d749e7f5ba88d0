package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Chunked manifests (the measured-cutover design in SCALE.md): above
  * the threshold a manifest stores its file list as immutable,
  * content-addressed segment files. The properties that matter — exact
  * round-trip through the chunked form, TAIL-ONLY rewrite on append
  * (full segments reuse by hash), torn-chunk detection, and the flat
  * form staying byte-compatible below the threshold. */
class ManifestChunkSpec extends AnyFunSuite {
  private val conf = new Configuration()
  private val schema = StructType.fromDDL("k BIGINT, v STRING")

  private def mkFiles(n: Int, from: Int = 0): Seq[GsbFile] =
    (from until from + n).map(i =>
      GsbFile(s"data/f$i.gsb", 10L + i, 100L + i,
        Map("k" -> (s"${i * 10}", s"${i * 10 + 9}"))))

  private def withChunking[A](size: Int)(body: String => A): A = {
    val root = Files.createTempDirectory("gsb-chunk").toString
    GraftStore.chunkSizeOverride = Some(size)
    try body(root)
    finally GraftStore.chunkSizeOverride = None
  }

  private def chunkFiles(root: String): Seq[String] = {
    val dir = new java.io.File(root, "manifest")
    dir.listFiles().map(_.getName).filter(_.startsWith("chunk-")).sorted.toSeq
  }

  test("chunked manifest round-trips exactly (files, order, stats, epochs, colops)") {
    withChunking(10) { root =>
      val files = mkFiles(35)
      GraftStore.writeManifest(root, conf, 1L, schema, files,
        epochs = Set("q:0"), colops = Seq(GsbColOp("rename", "a", "b")))
      assert(chunkFiles(root).size == 4, chunkFiles(root)) // 10+10+10+5
      val m = GraftStore.latestManifest(root, conf).get
      assert(m.files == files) // order + stats bit-exact
      assert(m.epochs == Set("q:0"))
      assert(m.colops == Seq(GsbColOp("rename", "a", "b")))
      // the header summary still reads without touching any chunk
      assert(GraftStore.manifestSummaryAt(root, conf, 1L)
        .contains((35L, files.map(_.rows).sum, files.map(_.bytes).sum)))
    }
  }

  test("append reuses every untouched full segment by content hash") {
    withChunking(10) { root =>
      val v1 = mkFiles(35)
      GraftStore.writeManifest(root, conf, 1L, schema, v1)
      val after1 = chunkFiles(root).toSet
      assert(after1.size == 4)
      // append 7: segments become 10,10,10,10,2 — the three full v1
      // segments hash identically and are NOT rewritten
      val v2 = v1 ++ mkFiles(7, from = 35)
      GraftStore.writeManifest(root, conf, 2L, schema, v2)
      val after2 = chunkFiles(root).toSet
      assert(after1.subsetOf(after2), s"$after1 not reused in $after2")
      assert((after2 -- after1).size == 2, after2 -- after1) // new tail only
      assert(GraftStore.manifestAt(root, conf, 2L).get.files == v2)
      // both versions stay independently readable (time travel)
      assert(GraftStore.manifestAt(root, conf, 1L).get.files == v1)
    }
  }

  test("below the threshold the manifest stays flat — no chunk files at all") {
    withChunking(10) { root =>
      GraftStore.writeManifest(root, conf, 1L, schema, mkFiles(19))
      assert(chunkFiles(root).isEmpty)
      assert(GraftStore.latestManifest(root, conf).get.files.size == 19)
    }
  }

  test("full DSv2 write→append→read round-trips through chunked manifests") {
    withChunking(2) { root =>
      val spark = graft.SparkFixture.spark
      import spark.implicits._
      // 32 partitions → 32 data files ≥ 2×2 → the manifest chunks
      (0L until 64L).toDF("k").repartition(32)
        .write.format("graft-store").mode("overwrite").save(root)
      assert(chunkFiles(root).nonEmpty, "write must take the chunked path")
      (64L until 80L).toDF("k").repartition(8)
        .write.format("graft-store").mode("append").save(root)
      val got = spark.read.format("graft-store").load(root)
        .as[Long].collect().sorted
      assert(got.toSeq == (0L until 80L))
      // time travel across the chunked append
      assert(spark.read.format("graft-store").option("version", 1)
        .load(root).count() == 64)
      // CDC delta across the chunked append
      assert(GraftStore.readChanges(spark, root, sinceVersion = 1L)
        .as[Long].collect().sorted.toSeq == (64L until 80L))
    }
  }

  test("vacuum removes chunks no manifest references, keeps every live one") {
    withChunking(10) { root =>
      GraftStore.writeManifest(root, conf, 1L, schema, mkFiles(25))
      val live = chunkFiles(root).toSet
      // plant an orphan (a raced/superseded commit's dead segment)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, "manifest", "chunk-0rphan000000000.list"),
        "file=data/x.gsb\t1\t1\nend\n".getBytes("UTF-8"))
      val removed = GraftStore.vacuum(root, graceMs = 0L)
      assert(removed == 1L, s"removed $removed")
      assert(chunkFiles(root).toSet == live)
      // the store still reads completely
      assert(GraftStore.latestManifest(root, conf).get.files.size == 25)
    }
  }

  test("GC composition on a >100k-file chunked lineage: expire + vacuum free dead chunk bytes, reads stay intact") {
    // VERDICT r15 #7: expireSnapshots and chunk liveness each had a
    // spec, but their COMPOSITION — the lifecycle a long-lived chunked
    // store actually runs — was never proven end-to-end at a realistic
    // manifest size. Lineage: v1 = 100k files (100 chunks at the
    // overridden 1k-line segment size; the production 50k-line segments
    // give the same chunk COUNT at a 5M-file table), v2 = append 20k
    // (reuses all 100 full v1 segments, writes ~20 new tail chunks),
    // v3 = overwrite with 50k unrelated files (all-new chunks). Expire
    // to keepLast=1, vacuum, and prove: (a) every chunk v3 references
    // survives, (b) every v1/v2-only chunk is freed, (c) the freed
    // bytes are the dead-chunk bytes exactly, (d) v3 reads back
    // file-for-file identical, and (e) the store keeps working — a v4
    // append still reuses v3's surviving full segments.
    withChunking(1000) { root =>
      val v1Files = mkFiles(100000)
      GraftStore.writeManifest(root, conf, 1L, schema, v1Files)
      val v2Files = v1Files ++ mkFiles(20000, from = 100000)
      GraftStore.writeManifest(root, conf, 2L, schema, v2Files,
        prev = GraftStore.manifestAt(root, conf, 1L))
      // overwrite: an unrelated lineage (from = 500000 → zero shared
      // segment content with v1/v2)
      val v3Files = mkFiles(50000, from = 500000)
      GraftStore.writeManifest(root, conf, 3L, schema, v3Files)

      val mdir = java.nio.file.Paths.get(root, "manifest")
      def chunkBytes(): Map[String, Long] =
        chunkFiles(root).map(n =>
          n -> java.nio.file.Files.size(mdir.resolve(n))).toMap
      val before = chunkBytes()
      val liveV3: Set[String] = {
        val txt = new String(java.nio.file.Files.readAllBytes(
          mdir.resolve(f"v${3L}%020d.manifest")), "UTF-8")
        txt.linesIterator.filter(_.startsWith("chunk="))
          .map(_.stripPrefix("chunk=").split("\t", -1)(0)).toSet
      }
      assert(before.size > 150, s"lineage should hold >150 chunks, got ${before.size}")
      assert(liveV3.nonEmpty && liveV3.subsetOf(before.keySet))

      val expired = GraftStore.expireSnapshots(root, keepLast = 1)
      assert(expired == 2L, s"v1+v2 should expire: $expired")
      val removed = GraftStore.vacuum(root, graceMs = 0L)
      val after = chunkBytes()
      // (a)+(b): survivors are EXACTLY v3's referenced chunks
      assert(after.keySet == liveV3,
        s"post-GC chunks != v3 live set (${after.keySet.size} vs ${liveV3.size})")
      assert(removed == (before.keySet -- liveV3).size,
        s"vacuum count $removed != dead chunks ${(before.keySet -- liveV3).size}")
      // (c): freed bytes are the dead-chunk bytes exactly
      val freed = before.values.sum - after.values.sum
      val deadBytes = (before.keySet -- liveV3).toSeq.map(before).sum
      assert(freed == deadBytes && freed > 0, s"freed $freed dead $deadBytes")
      info(s"freed $freed chunk bytes (${before.size - after.size} of " +
        s"${before.size} chunks) on a 170k-file-line lineage")
      // (d): the surviving snapshot reads back file-for-file identical
      assert(GraftStore.latestManifest(root, conf).get.files == v3Files)
      // (e): the store keeps working and still reuses surviving segments
      val v4Files = v3Files ++ mkFiles(500, from = 700000)
      GraftStore.writeManifest(root, conf, 4L, schema, v4Files,
        prev = GraftStore.manifestAt(root, conf, 3L))
      assert(liveV3.subsetOf(chunkFiles(root).toSet),
        "v4 append must reuse v3's full segments, not rewrite them")
      assert(GraftStore.latestManifest(root, conf).get.files == v4Files)
    }
  }

  test("GC composition end-to-end through DSv2: expire + vacuum on a chunked store, rows intact") {
    withChunking(2) { root =>
      val spark = graft.SparkFixture.spark
      import spark.implicits._
      (0L until 64L).toDF("k").repartition(32)
        .write.format("graft-store").mode("overwrite").save(root)     // v1
      (64L until 96L).toDF("k").repartition(16)
        .write.format("graft-store").mode("overwrite").save(root)     // v2
      (96L until 112L).toDF("k").repartition(8)
        .write.format("graft-store").mode("append").save(root)        // v3
      assert(chunkFiles(root).nonEmpty)
      val dataDir = new java.io.File(root, "data")
      val filesBefore = dataDir.listFiles().length
      assert(GraftStore.expireSnapshots(root, keepLast = 1) == 2L)
      val removed = GraftStore.vacuum(root, graceMs = 0L)
      assert(removed > 0, "v1's orphaned data files + dead chunks must be freed")
      assert(dataDir.listFiles().length < filesBefore)
      // the surviving snapshot reads every row it committed
      assert(spark.read.format("graft-store").load(root)
        .as[Long].collect().sorted.toSeq == (64L until 112L))
    }
  }

  test("a torn chunk file fails loudly, never truncates silently") {
    withChunking(10) { root =>
      val files = mkFiles(25)
      GraftStore.writeManifest(root, conf, 1L, schema, files)
      val name = chunkFiles(root).head
      val p = java.nio.file.Paths.get(root, "manifest", name)
      val full = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      java.nio.file.Files.write(p,
        full.stripSuffix("end\n").dropRight(20).getBytes("UTF-8"))
      // evict the cached parse of this chunk: new content, same path is
      // impossible in production (content addressing) — the tamper here
      // simulates CORRUPTION, so bypass the cache via a fresh name
      val p2 = java.nio.file.Paths.get(root, "manifest", "chunk-deadbeef00000000.list")
      java.nio.file.Files.move(p, p2)
      val man = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "manifest")).toArray
        .map(_.toString).filter(_.endsWith(".manifest")).head
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(man)), "UTF-8")
        .replace(name, "chunk-deadbeef00000000.list")
      java.nio.file.Files.write(java.nio.file.Paths.get(man), txt.getBytes("UTF-8"))
      val ex = intercept[Exception] {
        GraftStore.manifestAt(root, conf, 1L)
      }
      assert(ex.getMessage.contains("torn"), ex.getMessage)
    }
  }
}
