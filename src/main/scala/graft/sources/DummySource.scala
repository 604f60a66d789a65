package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dummy dataset: the first real sample repeated n times — the
  * pipeline-smoke-testing source (reference sdata/dummy.py:9-34
  * `DummyIterator`/`create_dummy_dataset`, which repeats one sample
  * forever; finite n here, since unbounded repetition is the training
  * loop's concern).
  *
  * For a streaming smoke source use `spark.readStream.format("rate")`
  * and map the tick onto the sample columns.
  */
object DummySource {

  def createDummyDataset(sample: DataFrame, n: Long): DataFrame = {
    val one = sample.limit(1)
    val spark = sample.sparkSession
    spark.range(n).select(col("id").as("__dummy_idx__"))
      .crossJoin(broadcast(one))
  }
}
