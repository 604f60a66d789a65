package graft.sources.wdstar

import org.apache.hadoop.conf.Configuration
import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._

/** Zero-shuffle sample-level meta join: advances the main shard and its
  * aligned meta shard(s) in LOCKSTEP, one sample from each per row —
  * the reference's co-iterating zip (`merge_them`,
  * sdata/datapipeline.py:225-245, which asserts key equality per pair)
  * re-expressed as a composite `PartitionReader`.
  *
  * Scale rationale: the default shuffle meta join moves the full main
  * table (payload bytes included) through an exchange to meet its
  * metadata. At 100 TB that exchange IS the job. But webdataset meta
  * shards are derived from their main shard — same sample set, same
  * order — so the join key is the STREAM POSITION: zip mode reads both
  * tars side by side and never shuffles a byte. Alignment is verified,
  * not assumed: every pair's stems must match (after stripping the
  * sink-layout `_suffix`), and both streams must exhaust together —
  * mismatch fails loudly under `errorPolicy=fail` (drops the rest of
  * the shard pair under `skip`), because a silent positional join on
  * misaligned shards would attach the wrong metadata everywhere.
  *
  * Pushed `__key__` predicates are evaluated HERE, not inside the inner
  * readers — both streams must consume a skipped sample to stay
  * aligned. Column pruning still applies: a meta suffix none of whose
  * columns survive pruning never opens its tar.
  */
class WdsTarZipReader(mainPath: String, metaPaths: Map[String, String],
    readSchema: StructType, declaredExts: Set[String], conf: Configuration,
    skipErrors: Boolean,
    keyFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
    extends PartitionReader[InternalRow] with Logging {

  private val suffixes = metaPaths.keys.toSeq.sorted
  private def suffixOf(name: String): Option[String] =
    suffixes.find(sfx => name.endsWith(s"_$sfx"))

  // -- inner main reader: outer main fields + __key__ (always, for the
  //    alignment check), in outer field order
  private val mainOuterFields =
    readSchema.fields.filter(f => suffixOf(f.name).isEmpty)
  private val mainSchema =
    if (mainOuterFields.exists(_.name == WdsTarSource.KeyCol))
      StructType(mainOuterFields)
    else StructType(
      StructField(WdsTarSource.KeyCol, StringType, nullable = false) +:
        mainOuterFields)
  private val mainKeyIdx = mainSchema.fieldIndex(WdsTarSource.KeyCol)
  private val main = new WdsTarPartitionReader(mainPath, mainSchema,
    declaredExts, conf, skipErrors)

  // -- inner meta readers: one per suffix with surviving columns; each
  //    reads __key__ + the plain-ext columns of its surviving fields
  private case class MetaStream(suffix: String, exts: Seq[String],
      reader: WdsTarPartitionReader)
  private val metaStreams: Seq[MetaStream] = suffixes.flatMap { sfx =>
    val exts = readSchema.fields.collect {
      case f if f.name.endsWith(s"_$sfx") => f.name.dropRight(sfx.length + 1)
    }.toSeq
    if (exts.isEmpty) None
    else Some(MetaStream(sfx, exts,
      new WdsTarPartitionReader(metaPaths(sfx),
        StructType(
          StructField(WdsTarSource.KeyCol, StringType, nullable = false) +:
            exts.map(e => StructField(e, BinaryType, nullable = true))),
        declaredExts, conf, skipErrors)))
  }

  // -- outer row assembly: outer index → (stream, inner index)
  private val mapping: Array[(Int, Int)] = readSchema.fields.map { f =>
    suffixOf(f.name) match {
      case None => (-1, mainSchema.fieldIndex(f.name))
      case Some(sfx) =>
        val si = metaStreams.indexWhere(_.suffix == sfx)
        val ext = f.name.dropRight(sfx.length + 1)
        (si, metaStreams(si).exts.indexOf(ext) + 1) // +1: __key__ leads
    }
  }

  private var currentRow: InternalRow = _
  private var dead = false

  private def stemWanted(stem: String): Boolean =
    keyFilters.forall(ShardFilters.eval(_, stem))

  private def misaligned(msg: String): Boolean = {
    if (skipErrors) {
      logWarning(s"wds-tar zip: $msg — dropping rest of shard pair " +
        s"($mainPath ↯ ${metaPaths.values.mkString(", ")})")
      dead = true
      false
    } else throw new RuntimeException(s"wds-tar zip: $msg ($mainPath)")
  }

  override def next(): Boolean = {
    currentRow = null
    while (currentRow == null && !dead) {
      if (!main.next()) {
        // both sides must exhaust together
        metaStreams.foreach { ms =>
          if (ms.reader.next())
            misaligned(s"meta shard for '${ms.suffix}' has more samples than main")
        }
        return false
      }
      val mainRow = main.get()
      val stem = mainRow.getUTF8String(mainKeyIdx).toString
      val metaRows = new Array[InternalRow](metaStreams.length)
      var i = 0
      var ok = true
      while (ok && i < metaStreams.length) {
        val ms = metaStreams(i)
        if (!ms.reader.next())
          ok = misaligned(s"meta shard for '${ms.suffix}' exhausted before main at sample '$stem'")
        else {
          val metaStem = ms.reader.get().getUTF8String(0).toString
          val stripped =
            if (metaStem.endsWith(s"_${ms.suffix}"))
              metaStem.dropRight(ms.suffix.length + 1)
            else metaStem
          if (stripped != stem)
            ok = misaligned(s"key mismatch at zip position: main '$stem' vs " +
              s"meta '$metaStem' (suffix '${ms.suffix}')")
          else metaRows(i) = ms.reader.get()
        }
        i += 1
      }
      if (ok && stemWanted(stem)) {
        val values = new Array[Any](readSchema.length)
        var j = 0
        while (j < mapping.length) {
          val (si, idx) = mapping(j)
          val row = if (si < 0) mainRow else metaRows(si)
          values(j) = row.get(idx, readSchema.fields(j).dataType)
          j += 1
        }
        currentRow = new GenericInternalRow(values)
      }
      // !stemWanted: aligned skip — both sides consumed, nothing emitted
    }
    currentRow != null
  }

  override def get(): InternalRow = currentRow

  override def close(): Unit = {
    main.close()
    metaStreams.foreach(_.reader.close())
  }
}
