package graft.hta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F4 — throttle/cooldown filter (reference src/tools/throttle.cpp:57-92):
  * keep a sample only if `last_kept_time + cooldown < time`. The predicate
  * depends on the previously *kept* row, so it is not a window function —
  * it's a per-metric sequential fold.
  *
  * Batch implementation: repartition by metric, secondary-sort by time
  * within partitions, then one imperative pass per partition (the classic
  * Spark secondary-sort pattern). Parallelism = #metrics spread over
  * partitions; each metric's pass is O(n) streaming with O(1) state —
  * exactly the reference's cost, but over all metrics at once.
  */
object Throttle {

  def throttle(points: DataFrame, cooldown: Long): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val cd = cooldown
    points.select(col("metric"), col("time"), col("value"))
      .as[(String, Long, Double)]
      .repartition(col("metric"))
      .sortWithinPartitions(col("metric"), col("time"))
      .mapPartitions { it =>
        var curMetric: String = null
        var lastKept: Long = Long.MinValue
        it.flatMap { case (m, t, v) =>
          if (m != curMetric) { curMetric = m; lastKept = Long.MinValue }
          // keep iff first of its metric or beyond the cooldown window
          if (lastKept == Long.MinValue || lastKept + cd < t) {
            lastKept = t
            Some((m, t, v))
          } else None
        }
      }
      .toDF("metric", "time", "value")
  }
}
