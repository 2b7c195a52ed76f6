package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Two `private[sql]` classic-API bridges the graft SQL DML layer needs
  * (`graft.engine.GraftDml`): wrapping a Catalyst `Expression` back into
  * a public `Column`, and materializing an analyzed `LogicalPlan` as a
  * `DataFrame`. Spark exposes both internally (`classic.ExpressionUtils`,
  * `classic.Dataset.ofRows`) but scopes them to the sql package — this
  * file lives in that package solely to re-export them; no Spark
  * behavior is modified or overridden. The same technique every
  * extension library uses for the Expression↔Column boundary. */
object GraftSqlBridge {

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
