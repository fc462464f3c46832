package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive rows of one key belong to the same
  * session while the time gap between them is <= `gapNs`; a strictly larger
  * gap starts a new session.
  *
  * One shuffle (by key): a lag-based new-session flag, a running sum to
  * assign session ids, then the per-session aggregate — the classic
  * gaps-and-islands plan. The windows partition by the session key (user,
  * device, …), whose cardinality scales with the data, so no partition
  * grows with total volume — this is NOT the whole-metric window pattern
  * banned in the HTA hot paths.
  */
object Sessionize {

  /** Tag each row with its session ordinal per key (1-based within key,
    * ordered by time — the first row always opens session 1). */
  def withSessionId(df: DataFrame, key: String, time: String, gapNs: Long,
                    idCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(time)
    df.withColumn("_new",
        when(coalesce(lag(col(time), 1).over(w), lit(Long.MinValue))
          < col(time) - gapNs, 1L).otherwise(0L))
      .withColumn(idCol, sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }

  /** One row per session: (key, session_start, session_end, n_events,
    * custom aggregates…). */
  def sessionize(df: DataFrame, key: String, time: String, gapNs: Long,
                 aggs: Seq[Column] = Nil): DataFrame = {
    val all = Seq(
      min(col(time)).as("session_start"),
      max(col(time)).as("session_end"),
      count(lit(1)).as("n_events")) ++ aggs
    withSessionId(df, key, time, gapNs, "_sid")
      .groupBy(col(key), col("_sid"))
      .agg(all.head, all.tail: _*)
      .drop("_sid")
  }
}
