package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. `ExpressionUtils` is `private[sql]`, so
  * this one-file shim lives under `org.apache.spark.sql` — the standard
  * pattern for Spark extension libraries that register native Catalyst
  * expressions (no Spark internals are modified). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Analyzed logical plan of a DataFrame — `queryExecution` is public
    * but classic-API-typed; needed to embed a frame as a subquery
    * expression (e.g. a Bloom filter delivered via ScalarSubquery). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame].queryExecution.analyzed
  /** `AbstractDataType` is `private[sql]`; expressions outside the Spark
    * package need it to declare `inputTypes` (ImplicitCastInputTypes). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
