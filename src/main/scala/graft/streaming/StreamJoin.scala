package graft.streaming

import graft.streaming.StreamIngest.Sample
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream event-time join — the live form of
  * [[graft.hta.Queries.intervalJoin]]: every left sample paired with the
  * right-stream samples of the same metric inside
  * `[l.time − before, l.time + after]`.
  *
  * This tier deliberately rides Spark's NATIVE stream-stream inner join
  * (state store + watermark eviction built in) instead of another
  * flatMapGroupsWithState: the engine buffers each side keyed by (metric,
  * event-time), and the watermark delay bounds state to the join horizon —
  * the exact machinery the brief's "Structured Streaming for streams"
  * tier exists for.
  *
  * Times are ns longs; Spark's state cleanup needs the range condition on
  * WATERMARKED TIMESTAMP columns, so each side derives a µs-grid
  * `timestamp_micros(time div 1000)` event-time column. The coarse
  * timestamp window is widened by 1 µs on each side (truncation-safe
  * superset) and the EXACT ns predicate on the long columns decides
  * membership — µs-unaligned times cannot lose or gain a pair.
  *
  * Output (append mode): (metric, l_time, l_value, r_time, r_value), one
  * row per qualifying pair, emitted once both sides have passed the
  * watermark gate. Watermark delay also sets the reordering tolerance.
  */
object StreamJoin {

  def intervalJoin(left: Dataset[Sample], right: Dataset[Sample],
                   beforeNs: Long, afterNs: Long,
                   watermarkDelayNs: Long = 0L): DataFrame = {
    require(beforeNs >= 0 && afterNs >= 0,
      s"need before/after >= 0, got $beforeNs/$afterNs")
    val delayUs = watermarkDelayNs / 1000
    val befUs = beforeNs / 1000 + 1
    val aftUs = afterNs / 1000 + 1
    val l = left.toDF()
      .select(col("metric"), col("time").as("l_time"),
        col("value").as("l_value"))
      .withColumn("l_ts", timestamp_micros(expr("l_time div 1000")))
      .withWatermark("l_ts", s"$delayUs microseconds")
    val r = right.toDF()
      .select(col("metric").as("r_metric"), col("time").as("r_time"),
        col("value").as("r_value"))
      .withColumn("r_ts", timestamp_micros(expr("r_time div 1000")))
      .withWatermark("r_ts", s"$delayUs microseconds")
    l.join(r,
        col("metric") === col("r_metric") &&
          // coarse µs bounds drive state eviction (superset of the exact
          // window); the ns predicate is the real membership test
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL '$befUs' MICROSECOND") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL '$aftUs' MICROSECOND") &&
          col("r_time") >= col("l_time") - beforeNs &&
          col("r_time") <= col("l_time") + afterNs)
      .select(col("metric"), col("l_time"), col("l_value"),
        col("r_time"), col("r_value"))
  }
}
