package graft.sources.wdstar

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

/** Batch write path for the wds-tar source: each partition writes one
  * `shard-<partition>-<task>.tar` under the `path` option; members are
  * named `<__key__>.<ext>` per non-null extension column. The reference
  * has no sink at all (SURVEY.md §2.1 S9) — this closes the loop so a
  * pipeline can be tar→transform→tar.
  *
  * Commit protocol: writers emit `.inprogress` files and rename on task
  * commit, so a failed/speculative task never leaves a partial shard
  * visible; job commit is a no-op, abort best-effort deletes.
  *
  * Scale: shard sizing follows upstream partitioning — repartition to
  * control shard count/size; writes are embarrassingly parallel, no
  * shuffle, no driver involvement beyond listing.
  *
  * Usage note: like all DataSource V2 tables, writes require an
  * explicit `mode("append")` or `mode("overwrite")` — Spark rejects the
  * default ErrorIfExists mode for V2 sources.
  */
class WdsTarWriteBuilder(schema: StructType, options: java.util.Map[String, String])
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val dir = options.get("path")
      require(dir != null, "wds-tar write requires the 'path' option")
      val conf = new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf())
      if (doTruncate) {
        val p = new Path(dir)
        val fs = p.getFileSystem(conf.value)
        if (fs.exists(p)) {
          fs.listStatus(p).filter(_.getPath.getName.endsWith(".tar"))
            .foreach(st => fs.delete(st.getPath, false))
        }
      }
      new WdsTarBatchWrite(dir, schema, conf)
    }
  }
}

class WdsTarBatchWrite(dir: String, schema: StructType,
    conf: SerializableConfiguration) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    WdsTarWriterFactory(dir, schema, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class WdsTarWriterFactory(dir: String, schema: StructType,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WdsTarDataWriter(dir, schema, conf, partitionId, taskId)
}

case class WdsTarCommit(path: String) extends WriterCommitMessage

class WdsTarDataWriter(dir: String, schema: StructType,
    conf: SerializableConfiguration, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val keyIdx = schema.fieldIndex(WdsTarSource.KeyCol)
  private val payloadFields = schema.fields.zipWithIndex.filter { case (f, _) =>
    f.name != WdsTarSource.KeyCol && f.name != WdsTarSource.UrlCol &&
      (f.dataType == BinaryType || f.dataType == StringType)
  }

  private val finalPath = new Path(dir, f"shard-$partitionId%05d-$taskId.tar")
  private val tmpPath = new Path(dir, f".shard-$partitionId%05d-$taskId.tar.inprogress")
  private val fs = finalPath.getFileSystem(conf.value)
  fs.mkdirs(new Path(dir))
  private val out = new TarArchiveOutputStream(fs.create(tmpPath, true))
  out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)

  override def write(row: InternalRow): Unit = {
    val key = row.getUTF8String(keyIdx).toString
    payloadFields.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val bytes = f.dataType match {
          case BinaryType => row.getBinary(i)
          case StringType => row.getUTF8String(i).getBytes
        }
        val e = new TarArchiveEntry(s"$key.${f.name}")
        e.setSize(bytes.length.toLong)
        out.putArchiveEntry(e)
        out.write(bytes)
        out.closeArchiveEntry()
      }
    }
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    fs.rename(tmpPath, finalPath)
    WdsTarCommit(finalPath.toString)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}
