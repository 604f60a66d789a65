package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins CDC merge: resolve a changelog of
  * `(doc_id, text, version, op)` rows — base snapshot rows, updates,
  * deletes ('D'), inserts — to the current surviving corpus.
  *
  * Scale discipline (qaj's scaladoc): one per-key `max_by(version)`
  * AGGREGATION, map-side combinable and AQE skew-splittable, never a
  * global window. Deletes survive to the aggregate and are dropped
  * after, so a delete beats any earlier version of its key while a
  * later re-insert beats the delete.
  *
  * [[graft.streaming.StreamOps.streamingCdcUpsert]] is the keyed-state
  * streaming twin: same resolution rule, state = one (version, op,
  * text) per key, convergent under out-of-order delivery.
  */
object CdcMerge {

  /** `changeLog`: columns `doc_id, text, version, op` → surviving
    * `(doc_id, text)` rows.
    */
  def latestWins(changeLog: DataFrame): DataFrame =
    changeLog
      .groupBy("doc_id")
      .agg(max_by(struct(col("op"), col("text")), col("version")).as("last"))
      .where(col("last.op") =!= "D")
      .select(col("doc_id"), col("last.text").as("text"))
}
