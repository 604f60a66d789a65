package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.TextFunctions.{tokenCountSql, qualityScoreSql, langIdSql, fingerprintSql}
import graft.functions.Portable.proundSql
import graft.sql.GraftSql

/** The engine's SQL surface ([[GraftSql]]) exercised end-to-end: the
  * gate query is written as `spark.sql` text over the registered views
  * and kernel functions — proving a SQL-only user gets the same
  * hash-verified results as a DataFrame user. The plan Catalyst builds
  * from the SQL text is the same one the DataFrame form produces (UDF
  * kernels for computed columns, hash aggregation, sort), so the 100 TB
  * properties carry over unchanged.
  */
object SqlSurfaceQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-language curation dashboard, pure SQL: volume, token budget,
    // mean quality, distinct canonical fingerprints, and how many docs'
    // predicted language agrees with their label.
    "q9b_sql_surface" -> ((s, dir) =>
      GraftSql.sql(s, dir,
        """SELECT lang, count(*) AS n_docs,
          | sum(graft_token_count(text)) AS n_tokens,
          | graft_pround(avg(graft_quality_score(text)), 5) AS mean_quality,
          | count(DISTINCT graft_fingerprint(text)) AS n_fingerprints,
          | count(CASE WHEN graft_lang_id(text) = lang THEN 1 END) AS n_lang_match
          |FROM documents
          |GROUP BY lang ORDER BY lang""".stripMargin))
  )

  override def oracles: Map[String, String] = Map(
    "q9b_sql_surface" ->
      s"""SELECT lang, count(*) AS n_docs,
         | sum(${tokenCountSql("text")})::BIGINT AS n_tokens,
         | ${proundSql(s"avg(${qualityScoreSql("text")})", 5)} AS mean_quality,
         | count(DISTINCT ${fingerprintSql("text")}) AS n_fingerprints,
         | count(CASE WHEN ${langIdSql("text")} = lang THEN 1 END) AS n_lang_match
         |FROM documents
         |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
