package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the classic lag/cumsum encoding: a row
  * opens a new session when it is the user's first event or follows its
  * predecessor by more than `gapSec`; the running sum of those
  * boundary flags is the per-user session ordinal (1-based). One hash
  * exchange on the user key, two window passes over the same sort —
  * Catalyst evaluates both in a single Window stage, so the cost at
  * 100 TB is exactly one shuffle plus a per-partition sort, the same
  * budget as `session_window` (q55) without losing the per-EVENT
  * session label that downstream joins want.
  *
  * Ordering ties break on `tieCol` so the assignment is deterministic
  * under any partitioning (the oracle-hash requirement); semantics are
  * pinned against a sequential per-user fold by
  * SessionizePropertySpec.
  */
object Sessionize {

  /** Adds a `session_id` column (1-based per-user ordinal). `tsCol`
    * must be a timestamp column; `tieCol` any unique-per-user column.
    */
  def assignSessions(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }
}
