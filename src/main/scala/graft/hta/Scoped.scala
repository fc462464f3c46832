package graft.hta

import graft.model.{IntervalScope, Scope}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F1 — the 4-mode interval-scope predicate of the reference
  * (include/hta/types.hpp:129-142, index resolution
  * src/storage/file/metric.cpp:255-327 raw / :389-459 levels).
  *
  * Predicate form (equivalent to the reference's index arithmetic; verified
  * against the ±1 ns probe matrices of tests/scope.cpp:140-238):
  *   begin closed    t >= b
  *   begin open      t >  b
  *   begin extended  t >  b  OR  t == (max t' <= b)   — one lookaside row
  *   begin infinity  true
  *   end   closed    t <= e
  *   end   open      t <  e
  *   end   extended  t <  e  OR  t == (min t' >= e)   — one lookaside row
  *   end   infinity  true
  *
  * The same predicates serve level rows (`t` = interval start time): e.g.
  * extended-begin selects the row whose interval contains `b`, which is
  * exactly the last row with time <= b — identical to the reference's
  * `offset/interval` floor arithmetic.
  *
  * Scale: the extended lookasides are per-metric scalar aggregates joined
  * back via broadcast — two metadata-sized jobs, not a window over the full
  * data. The main predicate is pushdown-friendly (plain range on `time`), so
  * parquet partition pruning and row-group skipping still apply.
  */
object Scoped {

  def scopedRange(df: DataFrame, begin: Long, end: Long, scope: IntervalScope,
                  metric: String = "metric", time: String = "time"): DataFrame = {
    val t = col(time)

    var out = df
    val beginPred = scope.begin match {
      case Scope.Closed => t >= begin
      case Scope.Open => t > begin
      case Scope.Infinity => lit(true)
      case Scope.Extended =>
        val look = df.where(t <= begin).groupBy(col(metric))
          .agg(max(t).as("_ext_begin"))
        out = out.join(broadcast(look), Seq(metric), "left")
        t > begin || t === col("_ext_begin")
    }
    val endPred = scope.end match {
      case Scope.Closed => t <= end
      case Scope.Open => t < end
      case Scope.Infinity => lit(true)
      case Scope.Extended =>
        val look = df.where(t >= end).groupBy(col(metric))
          .agg(min(t).as("_ext_end"))
        out = out.join(broadcast(look), Seq(metric), "left")
        t < end || t === col("_ext_end")
    }
    out.where(beginPred && endPred)
      .drop("_ext_begin", "_ext_end")
  }
}
