package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Minimal bridge into Spark 4's `private[sql]` Column↔Expression
  * conversion (the Spark Connect refactor hid `new Column(expr)` /
  * `col.expr`). Lives in the org.apache.spark.sql package solely to
  * cross that access boundary — the public-snippet-documented pattern
  * for extending classic Spark with custom Catalyst expressions.
  */
package object graftshim {
  def toCol(e: Expression): Column = new Column(ExpressionColumnNode(e))
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def analyzed(df: Dataset[Row]): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
