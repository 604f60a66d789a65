package graft.sources.wdstar

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.sources.ShardListing

/** Micro-batch streaming over a growing directory of tar shards —
  * continuous ingestion (SURVEY.md §4.4: "shards-as-offsets").
  *
  * The offset is simply the count of shards already processed from the
  * lexicographically-sorted listing; each trigger re-lists the
  * directory and emits any new shards as one partition each. Shards
  * must be append-only and named monotonically (the webdataset
  * convention, `shard-000123.tar`) — a new shard sorting *before* a
  * processed one is detected and rejected rather than silently skipped.
  * The batch reader is reused verbatim: same assembly, pruning and
  * error-policy semantics in both execution modes.
  */
class WdsTarMicroBatchStream(schema: StructType,
    options: CaseInsensitiveStringMap, checkpointLocation: String)
    extends MicroBatchStream {

  private val dir = {
    val d = options.get("path")
    require(d != null, "wds-tar streaming requires the 'path' option")
    d
  }

  private def listSorted(): Seq[String] =
    ShardListing.listShards(SparkSession.active, Seq(dir)).sorted

  @volatile private var lastSeen: Seq[String] = Nil

  override def initialOffset(): Offset = WdsTarOffset(0)

  override def latestOffset(): Offset = {
    lastSeen = listSorted()
    WdsTarOffset(lastSeen.length)
  }

  override def deserializeOffset(json: String): Offset =
    WdsTarOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WdsTarOffset].shardCount
    val e = end.asInstanceOf[WdsTarOffset].shardCount
    val shards = if (lastSeen.length >= e) lastSeen else listSorted()
    require(shards.length >= e,
      s"wds-tar stream: directory shrank below committed offset ($e > ${shards.length})")
    shards.slice(s, e).map(WdsTarInputPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    WdsTarReaderFactory(schema, conf,
      skipErrors = "skip".equalsIgnoreCase(options.getOrDefault("errorPolicy", "fail")))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class WdsTarOffset(shardCount: Int) extends Offset {
  override def json(): String = shardCount.toString
}
