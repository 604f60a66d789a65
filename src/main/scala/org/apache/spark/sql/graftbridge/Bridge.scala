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

  /** Rebuild a plain BATCH DataFrame over an already-planned RDD of
    * internal rows — what a V1 streaming Sink needs to hand its
    * micro-batch to batch-write machinery (the `Dataset.ofRows`/
    * `internalCreateDataFrame` pattern Spark's own sinks use; both are
    * `private[sql]` in Spark 4).
    */
  def batchDf(spark: org.apache.spark.sql.SparkSession,
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)
}
