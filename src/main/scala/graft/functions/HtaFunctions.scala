package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SQL-surface extensions (SURVEY §4 custom-code shortlist, option (a)):
  * the Aggregate monoid as a typed `Aggregator` registered as the UDAF
  * `hta_merge`, so SQL users can fold level rows / Row results with one
  * expression:
  *
  *   SELECT metric, hta_merge(minimum, maximum, sum, count,
  *                            integral, active_time)
  *   FROM levels WHERE interval = … GROUP BY metric
  *
  * Spark runs Aggregator with full partial aggregation (map-side combine →
  * merge), exactly matching the monoid contract (src/aggregate.cpp:50-59).
  * The column-expression forms in AggOps remain the preferred hot path
  * (whole-stage codegen); this is the drop-in for dynamic SQL.
  */
object HtaFunctions {

  final case class Agg(minimum: Double, maximum: Double, sum: Double,
                       count: Long, integral: Double, active_time: Long)

  object MergeAggregator extends Aggregator[Agg, Agg, Agg] {
    override def zero: Agg =
      Agg(Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0L, 0.0, 0L)
    override def reduce(b: Agg, a: Agg): Agg = merge(b, a)
    override def merge(a: Agg, b: Agg): Agg = Agg(
      math.min(a.minimum, b.minimum), math.max(a.maximum, b.maximum),
      a.sum + b.sum, a.count + b.count, a.integral + b.integral,
      a.active_time + b.active_time)
    override def finish(r: Agg): Agg = r
    override def bufferEncoder: Encoder[Agg] = Encoders.product[Agg]
    override def outputEncoder: Encoder[Agg] = Encoders.product[Agg]
  }

  /** Register the UDAF (and the epoch-alignment helpers) on a session. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("hta_merge", udaf(MergeAggregator))
    spark.udf.register("interval_begin",
      (t: Long, d: Long) => t - Math.floorMod(t, d))
    spark.udf.register("interval_end",
      (t: Long, d: Long) => t - Math.floorMod(t, d) + d)
  }
}
