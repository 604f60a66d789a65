package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each entry in [[queries]] is an operator demonstration from SURVEY.md §2
  * (or a north-star extension) over the driver's parquet corpus; each entry
  * in [[oracles]] is the DuckDB-SQL equivalent the driver hash-compares
  * against. Queries with no SQL-expressible oracle are omitted from
  * [[oracles]] (driver then records a rows-only check).
  *
  * Contract notes (driver compare semantics):
  *  - column names must match exactly between Spark result and oracle;
  *  - all results are given a deterministic ORDER BY on both sides;
  *  - double aggregates are rounded on both sides to dodge
  *    summation-order ulps.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
