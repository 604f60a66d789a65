package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Contiguous global row ids WITHOUT a single-task global sort.
  *
  * `row_number() OVER (ORDER BY k)` funnels every row through ONE task —
  * fine at spec scale, a guaranteed bottleneck on a billion-row corpus.
  * The scalable shape (Spark's own zipWithIndex discipline, lifted to
  * DataFrames): range-exchange on the key, sort within partitions, count
  * rows per partition (numPartitions-sized driver state), prefix-sum the
  * counts into per-partition offsets, and add each partition's offset to
  * a partition-local running counter. The resulting id is the global
  * 0-based rank by the key — independent of the sampled range boundaries
  * — so for a UNIQUE key the operator is deterministic and replayable.
  *
  * The counter pass is `mapPartitions`: genuinely per-partition
  * imperative logic (a running index over an iterator), the one shape
  * the declarative API cannot express. It sits at the END of the
  * pipeline segment (rank assignment), so nothing downstream loses
  * codegen that had it.
  *
  * The partitioned input is persisted across the two passes (counts,
  * then ids) — REQUIRED for correctness, not a cache hint: range
  * boundaries are sampled, so an unpersisted recompute between the
  * passes could repartition differently and pair offsets with the wrong
  * partitions. The result's lineage keeps reading the cached frame, so
  * it stays pinned; rank an ids-only projection (and join payloads back
  * by id) rather than a payload-heavy frame — which is also the right
  * call at 100 TB, where the exchange should move keys, not documents.
  */
object GlobalIndex {

  def rankIds(df: DataFrame, orderCol: String, idName: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist()
    val counts = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("c"))
      .collect() // bounded by partition count — metadata, not data
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2)).toMap
    val pidIdx = parted.schema.fieldIndex("__pid")
    val outSchema = StructType(
      parted.schema.fields :+ StructField(idName, LongType, nullable = false))
    parted.mapPartitions { it =>
      var base = -1L
      var k = -1L
      it.map { r =>
        if (base < 0) base = offsets(r.getInt(pidIdx))
        k += 1
        Row.fromSeq(r.toSeq :+ (base + k))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .drop("__pid")
  }
}
