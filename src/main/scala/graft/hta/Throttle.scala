package graft.hta

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

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

  private val outSchema = StructType(Seq(
    StructField("metric", StringType, nullable = true),
    StructField("time", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  // Row/RDD form rather than Dataset[(String, Long, Double)]: tuple encoders
  // need runtime reflection that breaks under REPL/notebook classloaders,
  // and a library entry point can't assume an application one.
  def throttle(points: DataFrame, cooldown: Long): DataFrame = {
    val spark = points.sparkSession
    val cd = cooldown
    val rdd = points.select(col("metric"), col("time"), col("value"))
      .repartition(col("metric"))
      .sortWithinPartitions(col("metric"), col("time"))
      .rdd.mapPartitions { it =>
        var curMetric: String = null
        var lastKept: Long = Long.MinValue
        it.flatMap { r =>
          val m = r.getString(0); val t = r.getLong(1)
          if (m != curMetric) { curMetric = m; lastKept = Long.MinValue }
          // keep iff first of its metric or beyond the cooldown window
          if (lastKept == Long.MinValue || lastKept + cd < t) {
            lastKept = t
            Some(Row(m, t, r.getDouble(2)))
          } else None
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}
