package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.registry.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real logic lives in graft.registry.Registry / graft.hta / graft.pipeline. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 end-to-end slice: gap-lift (A2) → boundary split (A3) →
    * level build (A4) → rollup (A5) → retrieveFlex routing (Q2) with
    * positional smoothing (A9) over the events table. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q21_flex_route")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + LLM-pipeline ops. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
