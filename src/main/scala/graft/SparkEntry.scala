package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into [[graft.queries.QueryPack]]s, one per
  * capability area; this object is just the aggregation point the driver
  * reads.
  */
object SparkEntry {

  private[graft] val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    EventsQueries,
    PipelineQueries,
    MultimodalQueries,
    SourceQueries,
    TrainPrepQueries,
    CurationQueries,
    SqlSurfaceQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A multi-operator slice: scan → filter → broadcast join → agg → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_shipping_priority")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
