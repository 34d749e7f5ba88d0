package graft.operators

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, In, InSet, Literal}
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkFixture}

/** Standing gate (VERDICT r15 #6): every BroadcastNestedLoopJoin in any
  * query's physical plan must build a BOUNDED side. The r15 plan audit
  * found 67 BNLJs, all one-row-stat or K-row-probe broadcasts by
  * construction — but nothing FAILED if a future query shipped a
  * corpus-sized build side, the difference between a harmless scalar
  * broadcast and an O(n²) cross at 100 TB. This spec walks every
  * query's plan tree (typed nodes, not strings) and proves each BNLJ
  * build side bounded under one of two regimes:
  *
  * STRUCTURAL (default) — row count independent of corpus size by plan
  * shape alone:
  *  - a grouping-key-free aggregate is 1 row whatever feeds it;
  *  - limits / TakeOrderedAndProject are ≤ k rows;
  *  - LocalTableScan is literal data; small Range is constant;
  *  - a Filter probing an attribute against a literal IN-list /
  *    equality keeps ≤ |list| keys (the ANN probe pattern);
  *  - ReusedExchange is as bounded as the exchange it reuses;
  *  - any other LEAF is a real scan → unbounded;
  *  - every other node is bounded iff ALL its children are (joins of
  *    bounded inputs stay bounded; projections/exchanges/generates
  *    over a K-row input stay O(K)).
  *
  * DOMAIN (named whitelist) — a grouped aggregate whose grouping key is
  * a LOW-CARDINALITY domain (distinct days of the event window, the 4
  * corpus sources, languages, ≤K cluster cells): output = one row per
  * distinct key, bounded by the domain, not the corpus. A structural
  * walk cannot see cardinality, so these queries are whitelisted BY
  * NAME and still must satisfy `domainBounded` — every path from the
  * build root must reach a grouped aggregate before any scan. A
  * whitelisted query regressing to broadcasting a raw relation fails.
  *
  * Plans are built on an AQE-off sibling session so the walk sees plain
  * exec nodes rather than adaptive wrappers; boundedness is a static
  * property of the plan shape, which AQE does not change. */
class BnljBuildSideGateSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  /** Grouped-agg-on-low-card-domain build sides, audited r16:
    * events_*: one row per distinct event DAY (bounded by the time
    * window — years of history is still thousands of rows);
    * ml_chi2 / text_source_divergence: one row per corpus SOURCE (4);
    * text_js_divergence: one row per LANGUAGE (and a cross of two such);
    * emb_silhouette: one centroid per cluster CELL (≤ K by
    * construction of the clustering). */
  private val domainWhitelist = Set(
    "emb_silhouette", "events_active_users", "events_active_users_hll",
    "events_dau_stickiness", "events_dau_stickiness_hll", "ml_chi2",
    "text_js_divergence", "text_source_divergence")

  /** A filter condition counts as a K-row probe only when a WHOLE
    * top-level conjunct is the probe shape. The r16 formulation used
    * `cond.exists(probe)`, which also matched a probe NESTED under
    * OR/NOT — `lang = 'en' OR length > 5` would classify a corpus-sized
    * filter output as bounded, a false negative on exactly the build
    * sides this gate exists to catch. Equality probes are further
    * restricted to key-ish columns (`*id*` / `*key*` names): equality on
    * a non-selective domain column (lang = 'en') selects a corpus-sized
    * slice, not K rows. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def probePredicate(cond: Expression): Boolean = {
    def keyish(a: Attribute): Boolean = {
      val n = a.name.toLowerCase
      n.contains("id") || n.contains("key")
    }
    def probe(e: Expression): Boolean = e match {
      case In(_: Attribute, list)
        if list.forall(_.isInstanceOf[Literal]) && list.size <= 1000 => true
      case InSet(_: Attribute, set) if set.size <= 1000 => true
      case EqualTo(a: Attribute, _: Literal) => keyish(a)
      case EqualTo(_: Literal, a: Attribute) => keyish(a)
      case _ => false
    }
    conjuncts(cond).exists(probe)
  }

  /** Attributes pinned to a literal (or a ≤1000-literal IN-list) by a
    * top-level Filter conjunct anywhere in the subtree. Unlike the
    * keyish probe above — which bounds a filter's OUTPUT rows and so
    * needs the column to be selective — a pinned attribute bounds a
    * grouped aggregate's output (≤ one row per pinned value) regardless
    * of how many corpus rows carry the value, so no keyish restriction
    * applies here. */
  private def pinnedAttrs(p: SparkPlan): Set[org.apache.spark.sql.catalyst.expressions.ExprId] = {
    def pins(e: Expression): Seq[Attribute] = e match {
      case EqualTo(a: Attribute, _: Literal) => Seq(a)
      case EqualTo(_: Literal, a: Attribute) => Seq(a)
      case In(a: Attribute, list)
        if list.forall(_.isInstanceOf[Literal]) && list.size <= 1000 => Seq(a)
      case InSet(a: Attribute, set) if set.size <= 1000 => Seq(a)
      case _ => Seq.empty
    }
    val acc = scala.collection.mutable.Set[org.apache.spark.sql.catalyst.expressions.ExprId]()
    p.foreach {
      case f: FilterExec =>
        conjuncts(f.condition).flatMap(pins).foreach(a => acc += a.exprId)
      case _ => ()
    }
    acc.toSet
  }

  /** A grouped aggregate is bounded when every grouping expression is a
    * bare attribute pinned by an equality/IN-literal conjunct below:
    * the output is at most one row per combination of pinned values —
    * corpus-size independent even if the aggregate's INPUT is the whole
    * corpus (the ml_permutation_importance AUC shape: group by an
    * `ablated` tag that a descendant filter fixes to one literal). */
  private def groupingPinned(a: BaseAggregateExec): Boolean = {
    val keys = a.groupingExpressions.collect { case attr: Attribute => attr.exprId }
    keys.size == a.groupingExpressions.size && keys.nonEmpty && {
      val pinned = pinnedAttrs(a.child)
      keys.forall(pinned.contains)
    }
  }

  private def bounded(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty || groupingPinned(a) || bounded(a.child)
    case _: LocalTableScanExec => true
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
    case r: RangeExec => r.numElements <= 100000
    case r: ReusedExchangeExec => bounded(r.child)
    case f: FilterExec => probePredicate(f.condition) || bounded(f.child)
    case leaf if leaf.children.isEmpty => false // a real source scan
    case other => other.children.forall(bounded)
  }

  /** Every path from `p` to a leaf passes a grouped aggregate (whose
    * output is one row per distinct domain key) before any scan. */
  private def domainBounded(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => true
    case r: ReusedExchangeExec => domainBounded(r.child)
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(domainBounded)
  }

  test("every BroadcastNestedLoopJoin build side is bounded (structural or whitelisted domain)") {
    // ml_train_predict is a training loop, not a single query plan
    val names = (SparkEntry.queries.keySet - "ml_train_predict").toSeq.sorted
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val unusedWhitelist = scala.collection.mutable.Set(domainWhitelist.toSeq: _*)
    var nBnlj = 0
    names.foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        catch { case e: Throwable =>
          fail(s"$name: plan construction failed: ${e.getMessage}")
        }
      plan.foreach {
        case b: BroadcastNestedLoopJoinExec =>
          nBnlj += 1
          val build = b.buildSide match {
            case BuildLeft => b.left
            case BuildRight => b.right
          }
          val ok =
            if (bounded(build)) true
            else if (domainWhitelist(name)) {
              unusedWhitelist -= name
              domainBounded(build)
            } else false
          if (!ok) offenders +=
            s"$name: unbounded BNLJ build side:\n${build.treeString}"
        case _ => ()
      }
    }
    assert(nBnlj > 0, "gate self-check: the surface is known to contain BNLJs")
    assert(offenders.isEmpty, offenders.mkString("\n\n"))
    // a whitelist entry no longer exercising the domain regime is stale
    // (the query's plan became structurally bounded or lost its BNLJ) —
    // prune it so the whitelist can only shrink
    assert(unusedWhitelist.isEmpty,
      s"stale domain-whitelist entries (no longer needed): $unusedWhitelist")
  }
}
