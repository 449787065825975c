package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` surface, needed to build a
  * DataFrame from graft's custom logical nodes (plans/TopKPerGroup.scala)
  * and to extract expressions/plans from the public Column/Dataset API.
  * Kept to three one-liners so the internal-API exposure is auditable.
  */
object GraftShim {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node) // eager: no lazy ColumnNode wrappers survive into physical plans

  def logicalPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
}
