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

  /** `bucket = Some((col, width))` names a time-bucket partition column
    * (`bucketCol = time - time mod width`, e.g. Warehouse raw's `tb`). When
    * present, derived bucket bounds are added so the parquet source PRUNES
    * PARTITION DIRECTORIES, not just row groups: `time >= B` implies
    * `bucketCol >= interval_begin(B, width)` (floor is monotone), and the
    * extended lookasides get one-sided bucket bounds (`<= B` / aligned
    * `>= E`). At 100 TB this is the difference between touching two
    * directories and listing the whole table. */
  def scopedRange(df: DataFrame, begin: Long, end: Long, scope: IntervalScope,
                  metric: String = "metric", time: String = "time",
                  bucket: Option[(String, Long)] = None): DataFrame = {
    val t = col(time)
    def bAlign(x: Long): Long = bucket.fold(0L) { case (_, w) => x - Math.floorMod(x, w) }
    def bCol = col(bucket.get._1)

    var out = df
    val beginPred = scope.begin match {
      case Scope.Closed =>
        if (bucket.isDefined) t >= begin && bCol >= bAlign(begin) else t >= begin
      case Scope.Open =>
        if (bucket.isDefined) t > begin && bCol >= bAlign(begin) else t > begin
      case Scope.Infinity => lit(true)
      case Scope.Extended =>
        val pre = if (bucket.isDefined) df.where(bCol <= begin) else df
        val look = pre.where(t <= begin).groupBy(col(metric))
          .agg(max(t).as("_ext_begin"))
        out = out.join(broadcast(look), Seq(metric), "left")
        t > begin || t === col("_ext_begin")
    }
    val endPred = scope.end match {
      case Scope.Closed =>
        if (bucket.isDefined) t <= end && bCol <= end else t <= end
      case Scope.Open =>
        if (bucket.isDefined) t < end && bCol <= end else t < end
      case Scope.Infinity => lit(true)
      case Scope.Extended =>
        val pre = if (bucket.isDefined) df.where(bCol >= bAlign(end)) else df
        val look = pre.where(t >= end).groupBy(col(metric))
          .agg(min(t).as("_ext_end"))
        out = out.join(broadcast(look), Seq(metric), "left")
        t < end || t === col("_ext_end")
    }
    out.where(beginPred && endPred)
      .drop("_ext_begin", "_ext_end")
  }
}
