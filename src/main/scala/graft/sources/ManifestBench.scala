package graft.sources

import org.apache.spark.sql.types.StructType

/** Manifest-scalability measurement (VERDICT r12 "What's missing #1"):
  * how long the driver-side metadata operations take as the per-
  * snapshot FILE COUNT grows to lakehouse scale — 10⁴ / 10⁵ / 10⁶
  * entries, i.e. the 100 TB regime where one line per data file makes
  * the manifest itself tens-to-hundreds of MB. No Spark session and no
  * data files are needed: every operation measured here is pure
  * manifest metadata, which is exactly the point — these are the costs
  * every scan PLANNING, commit, and history walk pays before any task
  * launches. Run:
  *
  *   sbt -batch "runMain graft.sources.ManifestBench"
  *
  * Prints one line per (N, operation): cold parse (first read of an
  * immutable complete manifest), warm parse (the driver cache —
  * validity-checked by mtime+length, so repeated plans of the same
  * snapshot pay one getFileStatus), header summary (the `summary=` +
  * tail-terminator path behind `$snapshots`), and stats-prune planning
  * (the GsbScan file-skipping pass over all N entries). Results feed
  * the SCALE.md manifest-scalability table.
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val schema = StructType.fromDDL("k BIGINT, v STRING")
    def timeMs[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e6)
    }
    println(f"${"n_files"}%9s ${"write_ms"}%9s ${"cold_ms"}%9s " +
      f"${"warm_ms"}%9s ${"summary_ms"}%10s ${"prune_ms"}%9s ${"bytes"}%12s")
    for (n <- Seq(10000, 100000, 1000000)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"gsb-manifest-bench-$n").toString
      val files = (0 until n).map { i =>
        GsbFile(s"data/q-p$i-t$i.gsb", 1000L, 1L << 20,
          Map("k" -> (s"${i * 1000L}", s"${i * 1000L + 999}")))
      }
      // force the FLAT form for the baseline rows (production now chunks
      // at ≥2×ChunkSize; the flat numbers are the before picture)
      GraftStore.chunkSizeOverride = Some(Int.MaxValue / 4)
      val (_, wMs) = timeMs(
        GraftStore.writeManifest(root, conf, 1L, schema, files))
      val f = GraftStore.fs(root, conf)
      val path = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, "manifest"),
        f"v${1L}%020d.manifest")
      val bytes = f.getFileStatus(path).getLen
      val (m1, coldMs) = timeMs(GraftStore.manifestAt(root, conf, 1L))
      require(m1.exists(_.files.size == n))
      val (_, warmMs) = timeMs(GraftStore.manifestAt(root, conf, 1L))
      val (s1, sumMs) = timeMs(GraftStore.manifestSummaryAt(root, conf, 1L))
      require(s1.contains((n.toLong, n * 1000L, n.toLong << 20)))
      // the planning-time skip pass: one pushed range predicate over all
      // N per-file stats — what a point query pays before pruning to
      // its one file
      val filt = org.apache.spark.sql.sources.And(
        org.apache.spark.sql.sources.GreaterThanOrEqual("k", (n / 2) * 1000L),
        org.apache.spark.sql.sources.LessThan("k", (n / 2) * 1000L + 500L))
      val (keptN, pruneMs) = timeMs(
        m1.get.files.count(e => GsbStats.mayMatch(filt, schema, e.stats)))
      require(keptN == 1, s"expected 1 file kept, got $keptN")
      println(f"$n%9d $wMs%9.1f $coldMs%9.1f $warmMs%9.3f " +
        f"$sumMs%10.2f $pruneMs%9.1f $bytes%12d")
      // chunked-commit scenario: the SAME snapshot committed through the
      // content-addressed chunk path (files ≥ 2×ChunkSize), then an
      // APPEND of 1000 files — full segments reuse by hash, so the
      // append commit is O(delta + ChunkSize) instead of O(table)
      if (n >= 2 * GraftStore.ChunkSize) {
        val (_, flatAppendMs) = timeMs(GraftStore.writeManifest(
          root, conf, 2L, schema,
          files ++ files.take(1000).map(e => e.copy(relPath = e.relPath + ".a"))))
        GraftStore.chunkSizeOverride = None // production chunked path
        val root2 = java.nio.file.Files
          .createTempDirectory(s"gsb-manifest-bench-chunked-$n").toString
        val (_, cWriteMs) = timeMs(
          GraftStore.writeManifest(root2, conf, 1L, schema, files))
        val (cm1, cColdMs) = timeMs(GraftStore.manifestAt(root2, conf, 1L))
        // the append shape every commit path uses: prev.files ++ delta,
        // with prev passed through for structural chunk reuse
        val (_, cAppendMs) = timeMs(GraftStore.writeManifest(
          root2, conf, 2L, schema,
          cm1.get.files ++ files.take(1000).map(e => e.copy(relPath = e.relPath + ".a")),
          prev = cm1))
        val (m2, cReadAfterMs) = timeMs(GraftStore.manifestAt(root2, conf, 2L))
        require(m2.exists(_.files.size == n + 1000))
        println(f"$n%9d chunked: write=$cWriteMs%.1f cold=$cColdMs%.1f " +
          f"append(+1000)=$cAppendMs%.1f (flat append=$flatAppendMs%.1f) " +
          f"read-after-append=$cReadAfterMs%.1f ms")
        def rm2(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm2)); x.delete(); ()
        }
        rm2(new java.io.File(root2))
      }
      GraftStore.chunkSizeOverride = None
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }
}
