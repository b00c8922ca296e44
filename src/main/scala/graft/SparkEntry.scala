package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full feature-store loop's defining operator: registry
    * resolve → point-in-time join (SURVEY §2.8 M4).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.pitJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data-pipeline extensions (dedup/similarity/text/multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.relational ++ OpsQueries.ops

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.relationalOracles ++ OpsQueries.opsOracles
}
