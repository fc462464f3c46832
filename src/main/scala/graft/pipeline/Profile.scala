package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: the per-column summary every ingestion pipeline runs
  * before trusting a new drop — row/null/distinct counts and min/max —
  * for MANY columns in ONE corpus scan.
  *
  * The naive form (one aggregate job per column, or count(distinct c1),
  * count(distinct c2), … in one SELECT) either rescans the table per
  * column or plans one Expand row per distinct-aggregate — at 100 TB both
  * are the difference between one pass and ten. Here the table is melted
  * once with `stack` (a narrow projection: one output row per
  * column×input-row, no shuffle), grouped on (column, value) — the only
  * corpus-sized exchange, partial-aggregated map-side to the per-column
  * value histograms — and rolled up to one row per column.
  */
object Profile {

  /** Profile exact-integer columns and string columns of `df` in one
    * pass. Integer columns must cast to BIGINT losslessly (ids, flags,
    * small ints — doubles are out of scope: their min/max would need a
    * cross-engine float rendering). Distinct counts and null counts are
    * exact; min/max are typed (long columns numeric, string columns
    * binary-collation lexicographic).
    *
    * @return one row per profiled column: (column, n, n_null,
    *         n_distinct, min_long, max_long, min_str, max_str) —
    *         the non-applicable class's min/max are null */
  def profile(df: DataFrame, longCols: Seq[String],
              stringCols: Seq[String]): DataFrame = {
    require(longCols.nonEmpty || stringCols.nonEmpty, "nothing to profile")
    val arms =
      longCols.map(c =>
        s"'$c', named_struct('lv', CAST(`$c` AS BIGINT), 'sv', CAST(NULL AS STRING))") ++
      stringCols.map(c =>
        s"'$c', named_struct('lv', CAST(NULL AS BIGINT), 'sv', CAST(`$c` AS STRING))")
    val melted = df
      .selectExpr(s"stack(${arms.size}, ${arms.mkString(", ")}) AS (col_name, v)")
      .select(col("col_name"), col("v.lv").as("lv"), col("v.sv").as("sv"))
      .withColumn("vk", coalesce(col("sv"), col("lv").cast("string")))
    melted
      .groupBy("col_name", "lv", "sv", "vk")
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("col_name").as("column"))
      .agg(
        sum("cnt").as("n"),
        sum(when(col("vk").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        count(col("vk")).as("n_distinct"),
        min("lv").as("min_long"), max("lv").as("max_long"),
        min("sv").as("min_str"), max("sv").as("max_str"))
  }
}
