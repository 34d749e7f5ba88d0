package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Tombstone-aware maintenance for DERIVED-index stores (IVF cell
  * assignments, minhash signatures, any table keyed by the base
  * table's row key).
  *
  * The problem (VERDICT r13 task #5): the delta path
  * (`ann_ivf_delta_stored`, `dedup_minhash_delta_stored`) maintains an
  * index under APPENDS, but a MERGE/DELETE on the base table leaves
  * orphaned index entries — a probe would keep returning vectors whose
  * documents are gone. The fix is the shape every lakehouse uses:
  *
  *  1. **Detect**: [[GraftStore.netDeletedKeys]] recovers the delete
  *     batch from the base store's file-level CDC (removed \ added by
  *     key) — DML-delta-sized, no row-level change log needed; the
  *     added side ([[GraftStore.readChanges]]) carries the upserted /
  *     rewritten rows.
  *  2. **Tombstone** ([[appendTombstones]]): append one row per dead
  *     key with `_tombstone = true` and every other index column null.
  *     ONE O(delta) manifest commit; the index's data files are not
  *     touched — at 100 TB this is the only affordable write shape for
  *     a daily delete batch.
  *  3. **Read live** ([[readLive]]): drop tombstone rows and mask live
  *     rows against the tombstoned keys via a broadcast join (the
  *     tombstone side is delta-sized — compaction keeps it bounded),
  *     so the read tax is one broadcast probe per row, zero shuffle.
  *  4. **Compact** ([[compactTombstones]]): periodically fold
  *     tombstones physically — overwrite the store with the live rows
  *     (the marker columns disappear) and vacuum the dead files.
  *
  * **Generations (upsert support).** A MERGE both deletes and
  * re-inserts the same key, so a bare key-match mask would kill the
  * fresh row its own maintenance batch just appended. Every
  * maintenance append therefore stamps a `_gen` SEQUENCE NUMBER (the
  * store's next commit version — monotonic by construction), and a
  * tombstone masks only rows of OLDER generations: rows written by
  * [[GraftStore.write]] directly (the v1 bootstrap) have no `_gen` and
  * read as generation 0, so delete-only flows behave exactly as
  * before. This is the same ordering trick Iceberg sequence numbers /
  * Delta deletion vectors rely on. The upsert recipe is then:
  * {{{
  *   val dead    = GraftStore.netDeletedKeys(spark, base, v, keys)
  *   val changed = GraftStore.readChanges(spark, base, v)   // upserts + rewritten survivors
  *   StoredIndex.appendTombstones(spark, idx, changed.select(keys) union dead)
  *   StoredIndex.appendRows(spark, idx, derive(changed))    // fresh entries, newer gen
  * }}}
  * — two O(delta) commits, no index rescan.
  */
object StoredIndex {
  /** Marker column a tombstone append introduces (nullable boolean:
    * null/absent = live row, true = tombstone). Underscore-prefixed
    * like Spark's own metadata columns; the store's evolution rules
    * treat it as a legal nullable widening. */
  val TombstoneCol = "_tombstone"

  /** Maintenance-batch sequence number (nullable long; absent/null =
    * generation 0, the bootstrap write). A tombstone of generation g
    * masks only rows with generation < g. */
  val GenCol = "_gen"

  /** `df` aligned to `schema`: stored columns in stored order (missing
    * ones null-filled with the stored type), extra `df` columns
    * appended after (a legal widening). */
  private def alignTo(schema: StructType, df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    val aligned = schema.fields.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ df.columns.filterNot(schema.fieldNames.contains).map(col)
    df.select(aligned.toIndexedSeq: _*)
  }

  private def storedSchema(root: String): Option[StructType] =
    GraftStore.latestManifest(root, GraftStore.driverConf()).map(_.schema)

  /** The sequence number the NEXT maintenance commit will carry — the
    * store's commit version is already a monotonic counter, so batches
    * order themselves for free (single-writer maintenance window). */
  private def nextGen(root: String): Long =
    GraftStore.currentVersion(root).getOrElse(0L) + 1

  /** Write `df` with the marker columns' nullability forced ON at the
    * schema level: lit(true)/lit(gen) are non-nullable, and the store's
    * evolution rule rightly insists a widening column be nullable
    * (existing files cannot supply a value). Expression tricks
    * (when/coalesce) constant-fold back to non-nullable literals by
    * write time, so pin it on the frame — maintenance batches are
    * delta-sized, the rdd hop is cheap. */
  private def writeRelaxed(spark: SparkSession, root: String, df: DataFrame): Unit = {
    val markers = Set(TombstoneCol, GenCol)
    val relaxed = spark.createDataFrame(df.rdd,
      StructType(df.schema.map(f =>
        if (markers.contains(f.name)) f.copy(nullable = true) else f)))
    GraftStore.write(relaxed, root)
  }

  /** Append a delta batch of index rows, aligned to the store's
    * current schema and stamped with the next generation — a store
    * that has already seen tombstone commits still accepts plain
    * `(key, payload)` batches, and the fresh rows outrank any
    * same-batch tombstone. */
  def appendRows(spark: SparkSession, root: String, rows: DataFrame): Unit = {
    require(!rows.columns.contains(TombstoneCol) && !rows.columns.contains(GenCol),
      s"appendRows stamps $TombstoneCol/$GenCol itself — don't pre-set them")
    val stamped = rows.withColumn(GenCol, lit(nextGen(root)))
    writeRelaxed(spark, root,
      storedSchema(root).map(alignTo(_, stamped)).getOrElse(stamped))
  }

  /** Logically delete every index row of an OLDER generation whose key
    * appears in `keys` (one column per key col): ONE O(delta) append of
    * marker rows, no data file rewritten. Idempotent at read time —
    * duplicate tombstones for a key change nothing. */
  def appendTombstones(spark: SparkSession, root: String, keys: DataFrame): Unit = {
    val schema = storedSchema(root).getOrElse(throw new IllegalArgumentException(
      s"graft-store: no index snapshot under $root — nothing to tombstone"))
    require(keys.columns.forall(schema.fieldNames.contains),
      s"tombstone key column(s) ${keys.columns.mkString(", ")} must exist " +
        s"in the index schema ${schema.fieldNames.mkString(", ")}")
    val marked = keys
      .withColumn(TombstoneCol, lit(true))
      .withColumn(GenCol, lit(nextGen(root)))
    writeRelaxed(spark, root, alignTo(schema, marked))
  }

  /** The index's LIVE rows: tombstone markers removed, and every live
    * row masked by a tombstone of a NEWER generation on its key
    * dropped via a broadcast join (the tombstone side is
    * delete-delta-sized by construction). A store that has never seen
    * a tombstone reads back untouched; marker columns never leak to
    * the caller. */
  def readLive(spark: SparkSession, root: String, keyCols: Seq[String]): DataFrame = {
    val all = GraftStore.read(spark, root)
    if (!all.columns.contains(TombstoneCol))
      return if (all.columns.contains(GenCol)) all.drop(GenCol) else all
    val hasGen = all.columns.contains(GenCol)
    def gen(df: DataFrame) =
      if (hasGen) coalesce(col(GenCol), lit(0L)) else lit(0L)
    val tomb = all.filter(col(TombstoneCol) === true)
      .groupBy(keyCols.map(col): _*)
      .agg(max(gen(all)).as("_tgen"))
    val live = all.filter(col(TombstoneCol).isNull)
      .withColumn("_rgen", gen(all))
    live.join(broadcast(tomb), keyCols, "left_outer")
      .filter(col("_tgen").isNull || col("_rgen") >= col("_tgen"))
      .drop(TombstoneCol, "_tgen", "_rgen")
      .drop((if (hasGen) Seq(GenCol) else Nil): _*)
  }

  /** Fold tombstones physically: overwrite the store with the live
    * rows (the marker columns disappear — overwrite resets column
    * history) and vacuum the files the dead rows lived in. Returns the
    * number of files vacuumed. After this, [[readLive]] is a plain
    * snapshot scan again. Single-writer maintenance window assumed
    * (pass a positive `graceMs` when concurrent writers may be
    * mid-commit). */
  def compactTombstones(spark: SparkSession, root: String,
      keyCols: Seq[String], graceMs: Long = 0L): Long = {
    // safe against itself for the same reason GraftStore.compact is:
    // the live view's scan pins the PRE-overwrite manifest at planning
    // time, and overwrite never deletes data files inline — the swap is
    // one atomic manifest publish, old files become vacuum fodder
    GraftStore.write(readLive(spark, root, keyCols), root, overwrite = true)
    GraftStore.vacuum(root, graceMs)
  }
}
