package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
