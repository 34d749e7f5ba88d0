package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkStrategy

/** Spark 4 bridge for custom logical plans: `Dataset.ofRows` and the
  * analyzed-plan accessor live on the `classic` implementations, and the
  * per-session strategy/rule registration point (`experimental`) is
  * likewise classic-only. Same pattern as [[GraftColumnBridge]]. */
object GraftPlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Idempotently add a planner strategy + optimizer rule to this
    * session (the session-local route; cluster-wide injection goes via
    * `spark.sql.extensions` → [[graft.functions.GraftExtensions]]). */
  def ensureRegistered(
      spark: SparkSession, strategy: SparkStrategy, rule: Rule[LogicalPlan]): Unit = {
    val s = spark.asInstanceOf[classic.SparkSession]
    // check-then-append on shared session state: synchronize so two
    // threads' first calls can't clobber each other's registration
    s.experimental.synchronized {
      if (!s.experimental.extraStrategies.exists(_.getClass == strategy.getClass))
        s.experimental.extraStrategies = s.experimental.extraStrategies :+ strategy
      if (!s.experimental.extraOptimizations.exists(_.getClass == rule.getClass))
        s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ rule
    }
  }
}
