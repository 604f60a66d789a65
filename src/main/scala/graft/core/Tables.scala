package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's synthetic corpus (TESTDATA.md): one parquet
  * file per table under a scale-factor directory.
  *
  * At 100 TB these would be partitioned parquet/iceberg tables; the
  * loader keeps the access path identical (`spark.read.parquet` prunes
  * partitions + pushes filters regardless of file count).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`:
    * Spark 4 has no TimestampType for parquet TIMESTAMP(NANOS) (the
    * `events.ts` column), so nanos arrive as Long and are truncated here
    * to microsecond timestamps (truncation matches the oracle's floor
    * semantics; sub-microsecond precision is below every operator's
    * resolution).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
