package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Backward as-of join as a first-class Catalyst operator — the
  * whole-operator route (preference (c) of SURVEY.md §7): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` + an optimizer
  * `Rule[LogicalPlan]`, registered per-session (`AsOfJoin.asof`) or
  * cluster-wide via `spark.sql.extensions` →
  * [[graft.functions.GraftExtensions]].
  *
  * Semantics (pandas `merge_asof` backward / QuestDB `ASOF JOIN`): for
  * every left row, attach the right row with the greatest right-time ≤
  * left-time within the same key; unmatched left rows keep nulls.
  * Tie-breaking among right rows that share the SAME timestamp: the
  * winner is always the LAST such row in (key, time) sort order — for
  * all three directions, including a forward/nearest exact-time hit
  * (the scan consumes equal-time rows into the backward buffer, so the
  * last one wins there too). This matches pandas `merge_asof` for
  * backward but is a deliberate, documented deviation for forward mode,
  * where pandas keeps the first duplicate in input order; after the
  * shuffle+sort there is no stable "input order" to preserve, so the
  * deterministic sort-order rule is used instead. The window-composition
  * in
  * [[graft.operators.EventOps]] (`events_asof_join`) covers the
  * SQL-expressible case, while this operator generalizes it to
  * arbitrary payload columns without unioning the two tables.
  *
  * Scale shape: both children hash-cluster on the key and sort by
  * (key, time) — exactly a sort-merge join's distribution, so Catalyst
  * inserts the same exchanges/sorts it would for SMJ and the merge
  * itself is a single O(n+m) forward pass per partition, no buffering
  * beyond one row. A window-based equivalent must union the payloads
  * into one shuffle; this keeps each side's shuffle independent.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    tolerance: Long = Long.MaxValue,
    direction: String = "backward") extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] onto [[AsOfJoinExec]]. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, dir) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, dir) :: Nil
    case _ => Nil
  }
}

/** Pushes deterministic left-only predicates below the as-of join, and
  * mirrors key-only predicates onto the right side (an equi-key filter
  * prunes both shuffles). Runs in the user-rules optimizer batch; when
  * the child is a bare relation the pushed Filter lands directly above
  * the scan, where FileSourceStrategy turns it into PushedFilters. */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val keyOnly = leftOnly.filter(_.references == aj.leftKey.references)
          .map(_.transform {
            case a: Attribute if a.semanticEquals(aj.leftKey) => aj.rightKey
          })
        val newLeft = Filter(leftOnly.reduce(And), aj.left)
        val newRight =
          if (keyOnly.isEmpty) aj.right else Filter(keyOnly.reduce(And), aj.right)
        val pushed = aj.copy(left = newLeft, right = newRight)
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

/** Merge-based physical as-of join: children arrive clustered on key
  * and sorted by (key, time); one forward pass per partition keeps only
  * the latest matching right row. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    tolerance: Long = Long.MaxValue,
    direction: String = "backward") extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // Spark-UI observability, like the built-in join execs
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyB = BindReferences.bindReference[Expression](leftKey, lOut)
    val lTimeB = BindReferences.bindReference[Expression](leftTime, lOut)
    val rKeyB = BindReferences.bindReference[Expression](rightKey, rOut)
    val rTimeB = BindReferences.bindReference[Expression](rightTime, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind against the OUTPUT nullability (right side forced nullable),
      // not the child schemas: a non-nullable right column would skip the
      // null check in generated code and read garbage from the all-null
      // row on unmatched lefts (SMJ binds create(output, output) for the
      // same reason)
      val proj = UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // one-row lookahead into the right side + the latest match so far
      var rHead: InternalRow = null
      var matched: InternalRow = null
      var matchedKey: Any = null
      var matchedTime: Any = null
      // internal time values of integral/timestamp/date types are
      // numeric, so distances are long subtractions (validated in
      // asof()). Saturating subtraction: with extreme epoch values a
      // raw `a - b` wraps negative and a wrapped distance would pass
      // any tolerance and win any nearest comparison.
      def toL(v: Any): Long = v.asInstanceOf[Number].longValue
      def satDist(a: Long, b: Long): Long = {
        val r = a - b
        if (((a ^ b) & (a ^ r)) < 0) {
          if (a < 0) Long.MinValue else Long.MaxValue
        } else r
      }
      def withinTol(dist: => Long): Boolean =
        tolerance == Long.MaxValue || dist <= tolerance

      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          numOutputRows += 1
          val lKeyV = lKeyB.eval(l)
          val lTimeV = lTimeB.eval(l)
          if (lKeyV == null || lTimeV == null) {
            // null keys/times never match (SQL equi-join semantics)
            proj(joined(l, nullRight))
          } else {
            if (matched != null && keyOrd.compare(matchedKey, lKeyV) != 0) matched = null
            var scanning = true
            while (scanning) {
              if (rHead == null) rHead = if (rIter.hasNext) rIter.next() else null
              if (rHead == null) scanning = false
              else {
                val rKeyV = rKeyB.eval(rHead)
                val rTimeV = rTimeB.eval(rHead)
                if (rKeyV == null || rTimeV == null) rHead = null // skip
                else {
                  val c = keyOrd.compare(rKeyV, lKeyV)
                  if (c < 0) rHead = null // behind the current key
                  else if (c == 0 && timeOrd.compare(rTimeV, lTimeV) <= 0) {
                    // newest right row at or before the left time; rows
                    // from sorted iterators reuse buffers → copy to hold
                    matched = rHead.copy()
                    matchedKey = rKeyB.eval(matched)
                    matchedTime = rTimeB.eval(matched)
                    rHead = null
                  } else scanning = false // right is ahead of this left row
                }
              }
            }
            // backward candidate = newest right ≤ lt (buffered copy);
            // forward candidate = the lookahead row rHead, which the scan
            // stopped on precisely because it is the FIRST right > lt for
            // this key (or a later key — checked here). Both directions
            // fall out of the same single-pass merge state.
            val backOk = matched != null &&
              withinTol(satDist(toL(lTimeV), toL(matchedTime)))
            def fwdKeyOk: Boolean = rHead != null && {
              val rk = rKeyB.eval(rHead)
              rk != null && keyOrd.compare(rk, lKeyV) == 0
            }
            val out = direction match {
              case "forward" =>
                // an exact-time hit was consumed into the backward buffer
                if (matched != null && timeOrd.compare(matchedTime, lTimeV) == 0) matched
                else if (fwdKeyOk &&
                  withinTol(satDist(toL(rTimeB.eval(rHead)), toL(lTimeV)))) rHead
                else nullRight
              case "nearest" =>
                val bOk = backOk
                val fDist = if (fwdKeyOk)
                  satDist(toL(rTimeB.eval(rHead)), toL(lTimeV)) else Long.MaxValue
                val fOk = fwdKeyOk && withinTol(fDist)
                if (!bOk && !fOk) nullRight
                else if (!fOk) matched
                else if (!bOk) rHead
                else if (satDist(toL(lTimeV), toL(matchedTime)) <= fDist) matched
                else rHead // backward wins ties (deterministic)
              case _ => if (backOk) matched else nullRight
            }
            if (!(out eq nullRight)) numMatched += 1
            proj(joined(l, out))
          }
        }
      }
    }
  }
}

/** Public API + registration. */
object AsOfJoin {
  /** `left` ⟕asof `right`: equi-match on (`leftKey` = `rightKey`), then
    * the newest `rightTime` ≤ `leftTime` wins. The output carries every
    * column of both sides, so the two sides' column names must be
    * disjoint — rename before joining, as with any self-join.
    *
    * `tolerance` (pandas `merge_asof` parity) bounds staleness: a match
    * also requires the time distance ≤ `tolerance`, measured in the time
    * column's internal unit (µs for timestamps, the raw value for
    * integral columns). Default unbounded.
    *
    * `direction`: `backward` (newest right ≤ left time, the default),
    * `forward` (earliest right ≥ left time), or `nearest` (smaller
    * absolute distance; ties break backward). All three run in the same
    * single merge pass. */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tolerance: Long = Long.MaxValue,
      direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    GraftPlanBridge.ensureRegistered(spark, new AsOfJoinStrategy, PushFilterThroughAsOfJoin)
    val lPlan = GraftPlanBridge.analyzed(left)
    val rPlan = GraftPlanBridge.analyzed(right)
    // honor the session's resolution mode (default case-insensitive)
    val caseSensitive = spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def norm(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.filter(a => norm(a.name) == norm(name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"$side side has no column '$name' (has ${plan.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"'$name' is ambiguous on the $side side: ${many.map(_.name).mkString(", ")}")
      }
    val dup = left.columns.map(norm).toSet.intersect(right.columns.map(norm).toSet)
    require(dup.isEmpty, s"ambiguous output: both sides have ${dup.mkString(", ")}")
    val (lk, rk) = (attr(lPlan, leftKey, "left"), attr(rPlan, rightKey, "right"))
    val (lt, rt) = (attr(lPlan, leftTime, "left"), attr(rPlan, rightTime, "right"))
    // orderings are built from the LEFT types and applied to right values;
    // a silent type mismatch would surface as an executor ClassCastException
    require(lk.dataType == rk.dataType,
      s"key type mismatch: $leftKey is ${lk.dataType}, $rightKey is ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"time type mismatch: $leftTime is ${lt.dataType}, $rightTime is ${rt.dataType}")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    if (tolerance != Long.MaxValue || direction == "nearest") {
      require(tolerance == Long.MaxValue || tolerance >= 0,
        s"tolerance must be non-negative, got $tolerance")
      import org.apache.spark.sql.types._
      val okType = lt.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
      require(okType,
        s"tolerance/nearest need a numeric-distance time type, got ${lt.dataType}")
    }
    GraftPlanBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, tolerance, direction))
  }
}
