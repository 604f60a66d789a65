package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` doorway a v1 streaming `Source` needs: the
  * micro-batch engine asserts `getBatch` returns a DataFrame with
  * `isStreaming = true`, and the only constructor for such a frame is
  * `SparkSession.internalCreateDataFrame`. Delta Lake opens the same
  * door the same way (its sources live under `org.apache.spark.sql.
  * delta`); this shim keeps the access surface to a single function so
  * everything else stays in the `graft` namespace on public API.
  */
object StreamShim {

  /** Wrap an InternalRow RDD as a STREAMING DataFrame of `schema`. The
    * RDD is lazy — typically `df.queryExecution.toRdd` of a batch scan
    * planned on the driver, executed when the micro-batch runs.
    */
  def streamingDF(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
