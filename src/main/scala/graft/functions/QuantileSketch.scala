package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch: a fixed-capacity streaming histogram
  * (Ben-Haim & Tom-Yov, JMLR 11 (2010), "A Streaming Parallel Decision
  * Tree Algorithm", §2.1) as a native `TypedImperativeAggregate` — the
  * quantile member of the sketch family next to [[CountMinAgg]]
  * (frequencies) and [[SpaceSavingTopK]] (heavy hitters).
  *
  * Why this exists at 100 TB: exact quantiles need either a global sort
  * or a shuffle of one row per DISTINCT value per map partition
  * (`percentile`'s internal buffer is value→count and OOMs on
  * high-cardinality doubles). This summary is a FIXED `capacity`-bin
  * value→weight histogram per partial: update inserts the value as its
  * own bin then, only when over capacity, merges the two CLOSEST bins
  * into their weighted mean (deterministic tie-break: lower value), so
  * the shuffle carries ≤ capacity bins per partial no matter the input
  * cardinality. Partials combine by bin-wise union + the same closest-
  * pair compaction (the mergeable-summaries shape: commutative up to
  * compaction order).
  *
  * Exact-when-sized regime (what the DuckDB oracle pins, same discipline
  * as `text_topk_spacesaving`): when capacity ≥ distinct input values, no
  * compaction ever fires, bins are exact value counts, the union is a
  * plain multiset sum — deterministic under ANY partitioning — and
  * `eval` reproduces `quantile_cont` exactly: rank r = p·(n−1) over the
  * sorted multiset, linear interpolation q = lo + (hi−lo)·frac (the
  * formula both DuckDB and Spark's `percentile` use). The approximate
  * regime's invariants — total weight exact, min/max preserved, rank
  * error bounded — are property-tested in QuantileSketchSpec.
  *
  * `eval` returns array<struct<prob,q>> in the probs order given;
  * callers explode it. Nulls/NaNs are skipped on update.
  */
case class SketchQuantiles(
    child: Expression,
    capacity: Int,
    probs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeMap[Double, Long]]
    with ImplicitCastInputTypes {

  require(capacity >= 2, s"need capacity >= 2, got $capacity")

  // analysis-time coercion (the pattern Spark's Percentile uses): an
  // INT/FLOAT/DECIMAL column gets a Cast inserted during resolution,
  // instead of update()'s Double cast failing per-row mid-job for
  // SQL-registered calls over non-double columns
  // no Seq[AbstractDataType] ascription: that type is private[sql]
  override def inputTypes = Seq(DoubleType)
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    s"probs must be in [0,1], got $probs")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("prob", DoubleType, nullable = false),
    StructField("q", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.TreeMap[Double, Long] =
    mutable.TreeMap.empty

  /** Merge the two closest adjacent bins (tie: lower value) into their
    * weighted mean until the histogram fits. O(capacity) per call via
    * one pass over the sorted bins — only runs when over capacity. */
  private def compact(b: mutable.TreeMap[Double, Long]): Unit = {
    while (b.size > capacity) {
      val bins = b.toArray // sorted by value (TreeMap)
      var bi = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < bins.length - 1) {
        val gap = bins(i + 1)._1 - bins(i)._1
        if (gap < bestGap) { bestGap = gap; bi = i }
        i += 1
      }
      val (v1, c1) = bins(bi); val (v2, c2) = bins(bi + 1)
      b.remove(v1); b.remove(v2)
      val c = c1 + c2
      val v = (v1 * c1 + v2 * c2) / c
      b.update(v, b.getOrElse(v, 0L) + c)
    }
  }

  override def update(
      b: mutable.TreeMap[Double, Long],
      input: InternalRow): mutable.TreeMap[Double, Long] = {
    val v = child.eval(input)
    if (v == null) return b
    val d = v.asInstanceOf[Double]
    if (d.isNaN) return b
    b.update(d, b.getOrElse(d, 0L) + 1L)
    if (b.size > capacity) compact(b)
    b
  }

  override def merge(
      b: mutable.TreeMap[Double, Long],
      o: mutable.TreeMap[Double, Long]): mutable.TreeMap[Double, Long] = {
    o.foreach { case (v, c) => b.update(v, b.getOrElse(v, 0L) + c) }
    if (b.size > capacity) compact(b)
    b
  }

  override def eval(b: mutable.TreeMap[Double, Long]): Any = {
    if (b.isEmpty) return new GenericArrayData(Array.empty[Any])
    val bins = b.toArray
    val n = bins.iterator.map(_._2).sum
    // value at 0-based multiset index k, by cumulative bin weights
    def valueAt(k: Long): Double = {
      var cum = 0L; var i = 0
      while (i < bins.length) {
        cum += bins(i)._2
        if (k < cum) return bins(i)._1
        i += 1
      }
      bins(bins.length - 1)._1
    }
    val rows = probs.map { p =>
      val r = p * (n - 1)
      val k = math.floor(r).toLong
      val frac = r - k
      val lo = valueAt(k)
      val q = if (frac == 0.0) lo else lo + (valueAt(k + 1) - lo) * frac
      InternalRow(p, q)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(b: mutable.TreeMap[Double, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (v, c) => out.writeDouble(v); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Double, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.TreeMap.empty[Double, Long]
    var i = 0
    while (i < n) { b.update(in.readDouble(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SketchQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SketchQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def prettyName: String = "sketch_quantiles"
}

object SketchQuantiles {
  def column(col: Column, capacity: Int, probs: Seq[Double]): Column =
    GraftColumnBridge.column(
      SketchQuantiles(GraftColumnBridge.expression(col), capacity, probs)
        .toAggregateExpression())

  private def litDouble(e: Expression): Double = e match {
    case Literal(v: Double, DoubleType) => v
    case Literal(v: Decimal, _: DecimalType) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"sketch_quantiles needs literal numeric probs, got $other")
  }

  /** SQL builder: sketch_quantiles(col, capacity, p1, p2, ...). */
  def fromSql(exprs: Seq[Expression]): Expression = {
    require(exprs.length >= 3,
      "usage: sketch_quantiles(col, capacity, p1[, p2 ...])")
    val cap = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"sketch_quantiles needs a literal int capacity, got $other")
    }
    SketchQuantiles(exprs(0), cap, exprs.drop(2).map(litDouble))
  }
}
