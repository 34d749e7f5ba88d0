package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink utilities.
  *
  * Two rules enforced by construction, both of which matter at corpus
  * scale and neither of which the casual `spark.read.option("inferSchema",
  * true)` path (the reference's examples, e.g.
  * lifeomic/sparkflow `examples/simple_dnn.py:36-38`) respects:
  *
  *  1. **Explicit schemas only.** Inference reads the data once to guess
  *     types and again to load — a full extra pass over 100 TB — and can
  *     silently flip types between runs when the sampled head changes.
  *  2. **Format-preserving round-trips.** Staging between formats (CSV
  *     for interchange, JSON for logs, ORC/Parquet for columnar reads)
  *     must not change row content; `SourcesSpec` pins this with a
  *     value-level equality check per format.
  *
  * Columnar notes: Parquet and ORC both support predicate pushdown and
  * column pruning in Spark's vectorized readers — prefer them for
  * anything queried repeatedly; CSV/JSON scans always read whole rows
  * (column pruning only saves parsing, not IO).
  */
object Sources {

  /** CSV with explicit schema; header on, RFC-4180 quote escaping.
    * `multiLine=true` is required for tables whose string fields can
    * contain newlines (document text!) — quoted newlines otherwise split
    * records mid-row — but it makes files NON-SPLITTABLE (one task per
    * file), so it is opt-in: plain tabular data keeps parallel reads. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("multiLine", multiLine.toString)
      .option("escape", "\"")
      .csv(path)

  /** Newline-delimited JSON with explicit schema (no sampling pass). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — columnar with pushdown, like Parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Stage a DataFrame to `path` as `format` (csv/json/orc/parquet/text).
    * CSV writes a header so [[readCsv]] round-trips. */
  def stage(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.mode("overwrite")
    format match {
      // RFC-4180 double-quote escaping, matching readCsv — the default
      // backslash escape would desync the write and read sides on
      // fields containing quotes
      case "csv" => w.option("header", "true").option("escape", "\"").csv(path)
      case other => w.format(other).save(path)
    }
  }

  /** Raw media ingestion via Spark's built-in `binaryFile` source: one
    * row per file — (path, modificationTime, length, content) — the
    * entry point that turns a directory of image/audio/video blobs into
    * a [[graft.multimodal.Multimodal]]-shaped table. `pathGlob` prunes
    * AT THE LISTING (pathGlobFilter), so non-matching files are never
    * opened; `maxBytes` guards against a stray multi-GB asset poisoning
    * task memory (the filter is on the `length` METADATA column —
    * pushed to the file index, oversized files are skipped unread).
    * Scale: each file is one task input; pack small assets into larger
    * archives upstream, because a 100 TB corpus of 10 KB files is a
    * listing problem before it is a read problem. */
  def readBinaryDir(spark: SparkSession, dir: String,
      pathGlob: String = "*", maxBytes: Long = 64L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)
      .filter(col("length") <= maxBytes)
  }

  /** [[readBinaryDir]] shaped into the multimodal table contract:
    * (media_id, media_type, payload, meta) with a stable content-derived
    * id (xxhash64 of the path — deterministic across re-ingests of the
    * same layout, unlike monotonically_increasing_id). */
  def binaryDirAsMedia(spark: SparkSession, dir: String,
      mediaType: String, pathGlob: String = "*"): DataFrame = {
    import org.apache.spark.sql.functions._
    readBinaryDir(spark, dir, pathGlob)
      .select(
        xxhash64(col("path")).as("media_id"),
        lit(mediaType).as("media_type"),
        col("content").as("payload"),
        struct(
          col("length").as("n_bytes"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
  }
}
