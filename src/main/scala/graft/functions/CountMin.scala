package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode/Muthukrishnan, J. Algorithms 2005) as a
  * native `TypedImperativeAggregate` — the second mergeable frequency
  * summary next to [[SpaceSavingTopK]], with the complementary
  * guarantee: SpaceSaving tracks WHICH items are frequent under a fixed
  * entry budget; Count-Min answers "how often did THIS item occur" for
  * any queried item, from a fixed `depth × width` counter grid that
  * never grows with the key domain.
  *
  * Update: for each input, one counter per row increments — row i's
  * bucket comes from Kirsch–Mitzenmacher double hashing (two Murmur3
  * base hashes combine as h1 + i·h2, ESA 2006), so update cost is
  * `depth` increments and no per-row independent hash families are
  * needed. Estimate: min over rows of the item's counter — ALWAYS ≥ the
  * true count (counters only ever over-count, never under), ≤ true +
  * εN with probability 1−δ for ε = e/width, δ = e^−depth.
  *
  * Why it matters at 100 TB: the partials are FIXED 8·depth·width-byte
  * arrays regardless of how many distinct keys stream through a
  * partition, and merge is element-wise addition — associative,
  * commutative, and EXACT, so unlike SpaceSaving's floor-charged merge
  * the combined sketch is bit-identical to single-pass construction
  * under ANY partitioning or merge order (pinned by CountMinSpec).
  * That makes it the right shuffle-safe pre-filter for heavy-hitter
  * gating: estimate ≥ true means a threshold scan over the sketch can
  * never drop a true heavy hitter (`text_cms_gate` builds exactly that
  * candidate gate, then exact-counts only the survivors).
  *
  * `eval` returns the flattened counter grid as array<long> (row-major,
  * row i at offset i·width) — callers collect the single merged row and
  * query it with [[CountMin.estimate]]. Nulls are skipped on update.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2, got depth=$depth width=$width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return b
    CountMin.add(b, depth, width, v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * b.length)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < b.length) { out.writeLong(b(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Array[Long](depth * width)
    var i = 0
    while (i < b.length) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def prettyName: String = "count_min"
}

/** Driver-side sketch arithmetic shared by the aggregate, the gate
  * queries, and the spec — one definition of the hash layout so a
  * sketch built distributed is queryable anywhere. */
object CountMin {
  /** Row-i bucket for an item: Kirsch–Mitzenmacher h1 + i·h2 over two
    * seeded Murmur3 string hashes, folded to [0, width). */
  def bucket(item: String, row: Int, width: Int): Int = {
    val h1 = MurmurHash3.stringHash(item, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(item, 0x85ebca6b) | 1 // odd => full-period
    val h = h1 + row * h2
    ((h % width) + width) % width
  }

  def add(counts: Array[Long], depth: Int, width: Int, item: String): Unit = {
    var r = 0
    while (r < depth) {
      counts(r * width + bucket(item, r, width)) += 1L
      r += 1
    }
  }

  /** Point estimate: min over rows — ≥ true count, always. */
  def estimate(counts: Array[Long], depth: Int, width: Int, item: String): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + bucket(item, r, width))
      if (c < est) est = c
      r += 1
    }
    est
  }

  /** Total stream length: every update increments exactly one counter
    * per row, so any single row sums to N — read row 0. */
  def total(counts: Array[Long], width: Int): Long = {
    var n = 0L
    var i = 0
    while (i < width) { n += counts(i); i += 1 }
    n
  }

  def column(col: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinAgg(GraftColumnBridge.expression(col), depth, width)
        .toAggregateExpression())

  private[functions] def litInt(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"count_min needs literal int depth/width, got $other")
  }

  /** SQL registration: count_min(col, depth, width). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min",
      exprs => CountMinAgg(exprs(0), litInt(exprs(1)), litInt(exprs(2))),
      "built-in")
}
