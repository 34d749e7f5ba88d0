package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-docgen` — a DataSource V2 deterministic synthetic-corpus
  * generator: `spark.read.format("graft-docgen").option("rows", n)
  * .option("numPartitions", p).option("seed", s).load()` yields the
  * `documents` table shape with zero input files.
  *
  * Why a generator source instead of a driver-side `spark.range().map`:
  * at 100 TB-scale load testing you want the WHOLE pipeline exercised —
  * scan planning, pushdown, pruning — not a DataFrame bolted on after
  * the fact, and you want generation to parallelize as a real scan
  * (`p` input partitions, one contiguous doc_id range each, no driver
  * materialization, no shuffle).
  *
  * Catalyst integration, the point of the exercise:
  *  - **Filter pushdown** (`SupportsPushDownFilters`): range predicates
  *    on `doc_id` narrow the generated id range itself — a
  *    `doc_id < 1000` over a trillion-row table generates 1000 rows,
  *    not a trillion followed by a filter. Non-range predicates are
  *    returned to Spark as residuals (never silently dropped).
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): `text` is
  *    ~two orders of magnitude more expensive to produce than the
  *    metadata columns, so a `select(count/lang)` scan skips text
  *    generation entirely — the same economics as parquet column
  *    skipping, applied to compute instead of IO.
  *
  * Determinism: every cell is a pure function of (seed, doc_id) via
  * splitmix64 finalizers, so results are identical across partition
  * counts, re-runs, and task retries — the property that makes
  * generated corpora usable as reproducible benchmark inputs.
  */
class DocGenSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-docgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = new DocGenTable
}

object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val langs = Array("de", "en", "es", "fr", "zh")
  private val vocab = Array(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "order",
    "data", "column", "join", "small", "customer", "query", "big", "the",
    "a", "group", "stream", "filter", "vector")

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def h(seed: Long, docId: Long, salt: Long): Long =
    mix(mix(seed ^ salt) ^ docId)
  private def pos(x: Long, m: Int): Int = (((x % m) + m) % m).toInt

  def lang(seed: Long, docId: Long): String = langs(pos(h(seed, docId, 1), langs.length))
  def source(seed: Long, docId: Long): String = "src" + pos(h(seed, docId, 2), 20)
  def text(seed: Long, docId: Long): String = {
    val n = 20 + pos(h(seed, docId, 3), 81) // 20..100 words
    val sb = new java.lang.StringBuilder(n * 6)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(pos(h(seed, docId, 100L + i), vocab.length)))
      i += 1
    }
    sb.toString
  }
}

private[sources] class DocGenTable extends Table with SupportsRead {
  override def name(): String = "graft_docgen"
  override def schema(): StructType = DocGen.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("numPartitions", 4),
      options.getLong("seed", 42L))
}

private[sources] class DocGenScanBuilder(rows: Long, numPartitions: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  // generated id range [lo, hi), narrowed by pushed doc_id predicates
  private[sources] var lo: Long = 0L
  private[sources] var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = DocGen.schema

  /** LIMIT n over a generator = generate only the first n ids — fully
    * absorbed (return true), so Spark drops its own Limit over the scan. */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("doc_id", _: Long) | GreaterThanOrEqual("doc_id", _: Long) |
           LessThan("doc_id", _: Long) | LessThanOrEqual("doc_id", _: Long) |
           EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _                                     => ()
    }
    pushed = accepted
    residual // Spark re-applies anything we didn't absorb
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    new DocGenScan(math.max(lo, 0L), math.max(hi, math.max(lo, 0L)), numPartitions, seed,
      required, pushed)
}

private[sources] class DocGenScan(lo: Long, hi: Long, numPartitions: Int, seed: Long,
    required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docgen range=[$lo,$hi) PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  /** Exact statistics AFTER pushdown (the planner sees the narrowed
    * range, so a heavily-filtered generator correctly broadcasts):
    * row count is known exactly; bytes estimate ~360/row full-width
    * (avg 60 words x ~5.3 chars + metadata), scaled to the pruned
    * schema since skipped text dominates the width. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(hi - lo, 0L)
    private val width =
      required.fieldNames.map {
        case "text" => 330L
        case "n_chars" | "doc_id" => 8L
        case _ => 8L
      }.sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * math.max(width, 1L))
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val total = math.max(hi - lo, 0L)
    val p = math.max(1, math.min(numPartitions.toLong, math.max(total, 1L)).toInt)
    (0 until p).map { i =>
      DocGenPartition(lo + total * i / p, lo + total * (i + 1) / p, seed)
    }.toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required)
}

private[sources] case class DocGenPartition(start: Long, end: Long, seed: Long)
    extends InputPartition

private[sources] class DocGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocGenPartition]
    new DocGenReader(p.start, p.end, p.seed, required)
  }
}

private[sources] class DocGenReader(start: Long, end: Long, seed: Long,
    required: StructType) extends PartitionReader[InternalRow] {
  private var id = start - 1
  // text is the expensive cell — generate it only when the pruned schema
  // still needs text or its derived n_chars
  private val needsText = required.fieldNames.exists(n => n == "text" || n == "n_chars")
  private val fields = required.fieldNames

  override def next(): Boolean = { id += 1; id < end }
  override def get(): InternalRow = {
    val txt = if (needsText) DocGen.text(seed, id) else null
    val values = fields.map {
      case "doc_id"  => id
      case "text"    => UTF8String.fromString(txt)
      case "lang"    => UTF8String.fromString(DocGen.lang(seed, id))
      case "source"  => UTF8String.fromString(DocGen.source(seed, id))
      case "n_chars" => txt.length.toLong
      case other     => throw new IllegalArgumentException(s"unknown column $other")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = ()
}
