package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Spark 4 moved `Dataset.ofRows` behind `private[sql]` on the classic
  * implementation — custom logical operators need it to hand a plan back
  * to the public Dataset API. Compiled inside the spark.sql namespace like
  * [[ColumnBridge]].
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Fully convert a public Column to a catalyst Expression via the
    * session's ColumnNode converter. Unlike [[ColumnBridge.expression]]
    * (which may return a lazy, unevaluable `ColumnNodeExpression`
    * wrapper), this yields real catalyst nodes — `UnresolvedAttribute`,
    * `SortOrder`, … — that the analyzer can resolve inside a custom
    * logical operator. */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
