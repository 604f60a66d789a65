package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: for each left row, the latest right row of
  * the same key with `rightTs <= leftTs`.
  *
  * Not in the reference's surface (SURVEY.md §2.3 lists it as a
  * north-star join type); implemented by *composing built-ins* — the
  * preference-ladder option (a) — instead of a custom physical
  * operator:
  *
  *   union(tagged left, tagged right)
  *     → window per key ordered by (ts, side) carrying the last
  *       non-null right payload forward
  *     → keep left rows, unpack the carried payload.
  *
  * One hash exchange on the key + one within-partition sort — the same
  * cost as a sort-merge join, with none of the range-predicate blowup a
  * naive `leftTs >= rightTs` theta-join would cause (that plan is
  * O(|L|·|R|) per key; this is O((|L|+|R|) log)). Right rows at exactly
  * leftTs match (<= semantics, like DuckDB/kdb asof).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val lp = struct(leftCols.toIndexedSeq.map(col): _*).as("__lp__")
    val rp = struct(rightPayload.map(col): _*).as("__rp__")

    val rpType = right.select(rightPayload.map(col): _*).schema
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts__"), lit(1).as("__side__"),
        lp, lit(null).cast(rpType).as("__rp__")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts__"), lit(0).as("__side__"),
        lit(null).cast(left.schema).as("__lp__"), rp): _*)

    // right rows order before left rows at equal ts (<= semantics);
    // the payload struct is a deterministic tiebreak among equal-ts
    // right rows
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts__"), col("__side__"), col("__rp__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof__", last(col("__rp__"), ignoreNulls = true).over(w))
      .filter(col("__side__") === 1)
      .select(col("__lp__.*") +: rightPayload.map(p =>
        col(s"__asof__.$p").as(s"asof_$p")): _*)
  }
}
