package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) joins: pre-bucketing both sides on the join
  * key removes the shuffle entirely — the 100 TB answer for repeated
  * fact-fact joins (SURVEY.md "partitioning & shuffle" design note).
  * Asserts the physical plan contains no shuffle exchange.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("bucketed tables join without a shuffle exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (only the final
      // single-column aggregate exchanges)
      assert(plan.contains("SortMergeJoin"))
      val shufflesBeforeAgg = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(plan).length
      assert(shufflesBeforeAgg == 0, s"join sides shuffled:\n$plan")
      // and the result is correct
      val n = joined.agg(sum(col("n"))).collect().head.getLong(0)
      assert(n == li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
