package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy hitters (Metwally/Agrawal/El Abbadi, ICDT 2005) as a
  * native `TypedImperativeAggregate` — the custom-UDAF tier of the
  * extension surface (scalar tier: the codegen'd vector expressions;
  * UDTF tier: [[NGrams]]; whole-operator tier: the as-of join plan).
  *
  * Why this exists at 100 TB: exact top-k token counting shuffles one
  * row per DISTINCT key — fine for Heaps-law-bounded word vocabularies,
  * corpus-sized for URLs, user-ids, or raw n-grams. SpaceSaving keeps a
  * FIXED `capacity`-entry summary per partial (update: tracked item →
  * count+1; untracked with room → insert (1,0); untracked and full →
  * evict the min-count entry m, insert at (m.count+1, err=m.count)), so
  * the shuffle carries `capacity` rows per map partition no matter how
  * many distinct keys stream through. Invariant: for every tracked item,
  * true_count ≤ count ≤ true_count + err, and ANY item with true count >
  * min tracked count is guaranteed tracked — the classic frequent-items
  * guarantee with ε = 1/capacity.
  *
  * Partials combine by the mergeable-summaries rule (Agarwal et al.,
  * PODS 2012): an item absent from a summary is charged that summary's
  * floor (its min count if full, else 0) to both count and err, then the
  * union keeps the top `capacity` by count. When no partial ever
  * overflowed — capacity ≥ distinct keys, the sized-to-vocabulary
  * regime — every floor is 0, counts are exact sums, err is exactly 0,
  * and the result is deterministic under ANY partitioning / merge order:
  * that is the regime the DuckDB oracle pins (`text_topk_spacesaving`);
  * the approximate regime's invariants are property-tested in
  * SpaceSavingSpec.
  *
  * `eval` returns array<struct<token,cnt,err>> sorted (cnt DESC, err
  * ASC, token ASC), truncated to `k` — callers explode it. Nulls are
  * skipped on update (aggregate-input convention).
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  require(capacity >= 1 && k >= 1 && k <= capacity,
    s"need 1 <= k <= capacity, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  private def floorOf(b: mutable.LinkedHashMap[String, (Long, Long)]): Long =
    if (b.size < capacity) 0L else b.valuesIterator.map(_._1).min

  override def update(
      b: mutable.LinkedHashMap[String, (Long, Long)],
      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v == null) return b
    val item = v.asInstanceOf[UTF8String].toString
    b.get(item) match {
      case Some((c, e)) => b.update(item, (c + 1, e))
      case None if b.size < capacity => b.update(item, (1L, 0L))
      case None =>
        // evict the min-count entry (ties: lexicographically smallest
        // token, so single-partition runs are reproducible)
        val (mk, (mc, _)) = b.minBy { case (t, (c, _)) => (c, t) }
        b.remove(mk)
        b.update(item, (mc + 1, mc))
    }
    b
  }

  override def merge(
      b: mutable.LinkedHashMap[String, (Long, Long)],
      o: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    if (o.isEmpty) return b
    if (b.isEmpty) { b ++= o; return b }
    val fb = floorOf(b); val fo = floorOf(o)
    val union = mutable.LinkedHashMap.empty[String, (Long, Long)]
    b.foreach { case (t, (c, e)) =>
      o.get(t) match {
        case Some((c2, e2)) => union.update(t, (c + c2, e + e2))
        case None => union.update(t, (c + fo, e + fo))
      }
    }
    o.foreach { case (t, (c, e)) =>
      if (!b.contains(t)) union.update(t, (c + fb, e + fb))
    }
    if (union.size <= capacity) union
    else {
      val kept = union.toSeq
        .sortBy { case (t, (c, e)) => (-c, e, t) }
        .take(capacity)
      mutable.LinkedHashMap(kept: _*)
    }
  }

  override def eval(b: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val rows = b.toSeq
      .sortBy { case (t, (c, e)) => (-c, e, t) }
      .take(k)
      .map { case (t, (c, e)) =>
        InternalRow(UTF8String.fromString(t), c, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(b: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (t, (c, e)) =>
      out.writeUTF(t); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) { b.update(in.readUTF(), (in.readLong(), in.readLong())); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def prettyName: String = "spacesaving_topk"
}

/** Column API + SQL registration for the graft aggregates. */
object GraftAggregates {
  def spacesavingTopK(col: Column, capacity: Int, k: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingTopK(GraftColumnBridge.expression(col), capacity, k)
        .toAggregateExpression())

  private def lit(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"spacesaving_topk needs literal int capacity/k, got $other")
  }

  /** SQL builder: spacesaving_topk(col, capacity, k). */
  def fromSql(exprs: Seq[Expression]): Expression =
    SpaceSavingTopK(exprs(0), lit(exprs(1)), lit(exprs(2)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "spacesaving_topk",
      // return the bare AggregateFunction — the analyzer wraps it in an
      // AggregateExpression (and owns DISTINCT/FILTER handling)
      exprs => SpaceSavingTopK(exprs(0), lit(exprs(1)), lit(exprs(2))),
      "built-in")
}
