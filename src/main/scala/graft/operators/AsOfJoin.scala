package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** As-of (time-travel) join: for each left row, the nearest right row
  * of the same key — the latest with `rightTs <= leftTs` (backward,
  * default) or the earliest with `rightTs >= leftTs` (forward) —
  * optionally only within a time tolerance (the pandas `merge_asof`
  * surface: direction + tolerance).
  *
  * Not in the reference's surface (SURVEY.md §2.3 lists it as a
  * north-star join type); implemented by *composing built-ins* — the
  * preference-ladder option (a) — instead of a custom physical
  * operator:
  *
  *   union(tagged left, tagged right)
  *     → window per key ordered by (ts, side) carrying the last
  *       non-null right (ts, payload) forward (time-reversed for
  *       direction=forward)
  *     → keep left rows, unpack the carried payload, null out
  *       matches outside the tolerance.
  *
  * One hash exchange on the key + one within-partition sort — the same
  * cost as a sort-merge join, with none of the range-predicate blowup a
  * naive `leftTs >= rightTs` theta-join would cause (that plan is
  * O(|L|·|R|) per key; this is O((|L|+|R|) log)). Right rows at exactly
  * leftTs match in both directions (inclusive, like DuckDB/kdb asof).
  * Tolerance compares the MATCHED right timestamp, so it is a
  * post-window column predicate — no extra join, no plan change.
  */
object AsOfJoin {

  private def asMs(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_millis(c)
    // NTZ casts through TimestampType (session-tz reinterpretation) —
    // the tolerance only ever uses DIFFERENCES of these values, so any
    // fixed zone offset cancels and the gap is wall-clock exact
    case TimestampNTZType => unix_millis(c.cast(TimestampType))
    case _ => c.cast("long")
  }

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String],
      direction: String = "backward",
      toleranceMs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val leftCols = left.columns
    val lp = struct(leftCols.toIndexedSeq.map(col): _*).as("__lp__")
    val rpInner = struct(rightPayload.map(col): _*)
    val rp = struct(col(rightTs).as("__rts__"), rpInner.as("__p__")).as("__rp__")

    val rpType = right.select(col(rightTs).as("__rts__"), rpInner.as("__p__")).schema
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts__"), lit(1).as("__side__"),
        lp, lit(null).cast(rpType).as("__rp__")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts__"), lit(0).as("__side__"),
        lit(null).cast(left.schema).as("__lp__"), rp): _*)

    // right rows order before left rows at equal ts (inclusive
    // semantics in both directions: the scan runs toward the left row,
    // so the nearest right row is the last one seen); the (rts,
    // payload) struct is a deterministic tiebreak among equal-ts
    // right rows
    val tsOrd =
      if (direction == "backward") col("__ts__").asc else col("__ts__").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("__side__").asc, col("__rp__").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val tsType = left.schema(leftTs).dataType
    val matched = col("__asof__")
    val gap =
      if (direction == "backward")
        asMs(col("__ts__"), tsType) - asMs(matched.getField("__rts__"), tsType)
      else
        asMs(matched.getField("__rts__"), tsType) - asMs(col("__ts__"), tsType)
    val gated = toleranceMs match {
      case Some(tol) =>
        when(matched.isNotNull && gap <= tol, matched).otherwise(lit(null).cast(rpType))
      case None => matched
    }

    l.unionByName(r)
      .withColumn("__asof__", last(col("__rp__"), ignoreNulls = true).over(w))
      .filter(col("__side__") === 1)
      .withColumn("__gated__", gated)
      .select(col("__lp__.*") +: rightPayload.map(p =>
        col(s"__gated__.__p__.$p").as(s"asof_$p")): _*)
  }
}
