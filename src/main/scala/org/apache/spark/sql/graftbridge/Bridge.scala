package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's package-private Column↔Expression
  * conversion (`org.apache.spark.sql.classic.ExpressionUtils` is
  * `private[sql]` in Spark 4). Living under `org.apache.spark.sql` is
  * the established pattern for libraries that expose native Catalyst
  * expressions through the public Column API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
