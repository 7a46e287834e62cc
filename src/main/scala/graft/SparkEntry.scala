package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{AnalyticsQueries, ParityQueries, PipelineQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator: the reference's
  * full 18-op parity surface ([[ParityQueries]]) plus the large-scale
  * data-pipeline operators ([[PipelineQueries]]: dedup, similarity search,
  * text analysis, multimodal). `oracleSql` holds the DuckDB twin of each
  * query; non-SQL-expressible ops (LSH internals) are omitted there and
  * get the driver's rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's canonical join-aggregate (BASELINE.md) re-expressed
    * over lineitem x orders.
    */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ PipelineQueries.queries ++
      AnalyticsQueries.queries ++ StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ PipelineQueries.oracles ++
      AnalyticsQueries.oracles ++ StreamQueries.oracles
}
