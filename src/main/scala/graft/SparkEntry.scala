package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsSuite, Pipeline, RdfSuite, Relational, TemporalSuite}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-domain query suites; each query name appears in both
  * `queries` (Spark implementation) and, when SQL-expressible, `oracleSql`
  * (DuckDB oracle over the same parquet tables).
  */
object SparkEntry {

  private val suites: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (RdfSuite.queries, RdfSuite.oracles),
      (AnalyticsSuite.queries, AnalyticsSuite.oracles),
      (TemporalSuite.queries, TemporalSuite.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("join_star_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.iterator.map(_._2).reduce(_ ++ _)
}
