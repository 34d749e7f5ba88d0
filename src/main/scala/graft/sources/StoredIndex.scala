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
  *     key) — DML-delta-sized, no row-level change log needed.
  *  2. **Tombstone** ([[appendTombstones]]): append one row per dead
  *     key with `_tombstone = true` and every other index column null.
  *     ONE O(delta) manifest commit; the index's data files are not
  *     touched — at 100 TB this is the only affordable write shape for
  *     a daily delete batch.
  *  3. **Read live** ([[readLive]]): drop tombstone rows and anti-join
  *     live rows against the tombstoned keys. The tombstone side is
  *     delta-sized (bounded by deletes since the last compaction), so
  *     the anti-join broadcasts — the read tax is one broadcast probe
  *     per row, zero shuffle.
  *  4. **Compact** ([[compactTombstones]]): periodically fold
  *     tombstones physically — overwrite the store with the live rows
  *     (dropping the `_tombstone` column) and vacuum the dead files.
  *     After compaction the read tax returns to zero.
  *
  * Appends between deletes keep working: [[appendRows]] aligns a plain
  * delta batch to the store's current schema (null-filling
  * `_tombstone` once it exists), so insert and delete maintenance
  * interleave freely.
  */
object StoredIndex {
  /** Marker column a tombstone append introduces (nullable boolean:
    * null/absent = live row, true = tombstone). Underscore-prefixed
    * like Spark's own metadata columns; the store's evolution rules
    * treat it as a legal nullable widening. */
  val TombstoneCol = "_tombstone"

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

  /** Append a delta batch of index rows, aligned to the store's
    * current schema (so a store that has already seen a tombstone
    * commit still accepts plain `(key, payload)` batches — their
    * `_tombstone` is null = live). */
  def appendRows(spark: SparkSession, root: String, rows: DataFrame): Unit =
    GraftStore.write(
      storedSchema(root).map(alignTo(_, rows)).getOrElse(rows), root)

  /** Logically delete every index row whose key appears in `keys`
    * (one column per key col): ONE O(delta) append of marker rows,
    * no data file rewritten. Idempotent at read time — duplicate
    * tombstones for a key change nothing. */
  def appendTombstones(spark: SparkSession, root: String, keys: DataFrame): Unit = {
    val schema = storedSchema(root).getOrElse(throw new IllegalArgumentException(
      s"graft-store: no index snapshot under $root — nothing to tombstone"))
    require(keys.columns.forall(schema.fieldNames.contains),
      s"tombstone key column(s) ${keys.columns.mkString(", ")} must exist " +
        s"in the index schema ${schema.fieldNames.mkString(", ")}")
    // the marker must be NULLABLE (the store's evolution rule: existing
    // files can't supply a value). lit(true) is non-nullable and every
    // expression trick (when/coalesce) risks constant-folding back to a
    // non-nullable literal, so pin nullability at the schema level —
    // the round-trip is delta-sized by construction.
    val aligned = alignTo(schema, keys.withColumn(TombstoneCol, lit(true)))
    val relaxed = spark.createDataFrame(aligned.rdd,
      StructType(aligned.schema.map(f =>
        if (f.name == TombstoneCol) f.copy(nullable = true) else f)))
    GraftStore.write(relaxed, root)
  }

  /** The index's LIVE rows: tombstone markers removed, and every live
    * row whose key matches a tombstoned key dropped via a broadcast
    * anti-join (the tombstone side is delete-delta-sized by
    * construction — compaction keeps it bounded). A store that has
    * never seen a tombstone reads back untouched. */
  def readLive(spark: SparkSession, root: String, keyCols: Seq[String]): DataFrame = {
    val all = GraftStore.read(spark, root)
    if (!all.columns.contains(TombstoneCol)) return all
    val dead = all.filter(col(TombstoneCol) === true)
      .select(keyCols.map(col): _*).distinct()
    all.filter(col(TombstoneCol).isNull)
      .join(broadcast(dead), keyCols, "left_anti")
      .drop(TombstoneCol)
  }

  /** Fold tombstones physically: overwrite the store with the live
    * rows (the `_tombstone` column disappears — overwrite resets
    * column history) and vacuum the files the dead rows lived in.
    * Returns the number of files vacuumed. After this, [[readLive]]
    * is a plain snapshot scan again. Single-writer maintenance window
    * assumed (pass a positive `graceMs` when concurrent writers may
    * be mid-commit). */
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
