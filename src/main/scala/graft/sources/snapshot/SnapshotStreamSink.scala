package graft.sources.snapshot

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink

/** "graft-snapshot" streaming SINK — the write half of the table-as-a-
  * stream capability:
  *
  * {{{
  * df.writeStream.format("graft-snapshot")
  *   .option("table", path).option("statsCols", "id,ds")
  *   .option("checkpointLocation", cp).start()
  * }}}
  *
  * Each micro-batch lands as ONE manifest commit through
  * [[SnapshotLog.appendStreamBatch]], which stamps the epoch into the
  * manifest chain's replay ledger: a restart re-delivering an already-
  * committed batch id is detected there and skipped, so the table sees
  * each micro-batch EXACTLY once even though the sink contract is
  * at-least-once. Everything the batch write path enforces binds here
  * too — schema alignment to the table (missing nullable columns fill
  * NULL, extras refuse), CHECK constraints, declared clustering
  * layouts, column-mapping physical names, commit-time stats/bloom
  * collection on `statsCols` — because it IS the batch write path.
  *
  * Scale: a micro-batch's cost is the batch itself (files written +
  * one manifest publish); nothing reads or rewrites existing data, and
  * the append rebases over any disjoint concurrent commit (compaction,
  * retention deletes, CDC appliers running beside the stream).
  *
  * The first micro-batch may CREATE the table (schema from the batch);
  * thereafter the manifest schema is the contract. Append-only by
  * construction — update/complete output modes refuse at `start()`;
  * keyed sinks belong to `foreachBatch` +
  * [[SnapshotLog.upsertMORBatch]]/[[SnapshotLog.replicateChangeFeed]].
  *
  * Reference: the wds-tar sink (`WdsTarWrite`) is the V2 streaming
  * face for shard output; this is its manifest-table sibling
  * (sdata/datapipeline.py writes shards only — a transactional table
  * sink has no reference analogue).
  */
class SnapshotSink(table: String, statsCols: Seq[String]) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame carries the micro-batch's INCREMENTAL plan —
    // rebuild a plain batch frame over the same already-planned rows
    // before handing it to the batch-write machinery (the standard V1
    // sink pattern; no driver-side materialization)
    val batch = org.apache.spark.sql.graftbridge.Bridge.batchDf(
      data.sparkSession, data.queryExecution.toRdd, data.schema)
    SnapshotLog.appendStreamBatch(batch, table, batchId, statsCols): Unit
  }

  override def name(): String = s"graft-snapshot-sink($table)"
}
