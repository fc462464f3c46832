package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.registry.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real logic lives in graft.registry.Registry / graft.hta / graft.pipeline. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end HTA slice: gap-lift (A2) → boundary split (A3) → tumbling
    * level build (A4) → hierarchical rollup (A5) on the events table. */
  def entry(spark: SparkSession): DataFrame = {
    val ev = registry.Tables.events(spark, "/root/testdata/sf0.001")
    Registry.rollupExact(Registry.levelExact(ev, Registry.I1), Registry.I1, Registry.I2)
  }

  /** One entry per implemented operator from SURVEY.md §2 + LLM-pipeline ops. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
