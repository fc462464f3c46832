package graft.hta

import graft.store.Hta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A6 performance tier — the reference's telescoping range-aggregate plan
  * (src/metric.cpp:160-231): instead of folding every raw point in [b, e),
  * read raw only at the two unaligned edges and cover the middle with
  * aligned runs of successively coarser pre-aggregated levels
  * (O(2·factor·#levels) level rows + O(ε) raw points).
  *
  * The decomposition is pure driver-side arithmetic on (b, e, ladder); the
  * resulting plan is a union of per-slice pruned scans merged by one final
  * monoid aggregation — a single Spark action. Each level slice hits exactly
  * one `interval=` partition with a pushed-down time range; the raw edges
  * prune to their time buckets. At 100 TB this reads megabytes, not
  * terabytes — the same asymptotic win the reference gets from positional
  * file offsets, obtained via partition pruning + row-group skipping.
  *
  * The reference clamps [b, e] into each metric's data range before
  * decomposing; a shared global decomposition is only valid for metrics
  * whose range covers [b, e]. Those take the telescoped plan; the remainder
  * (a broadcast-sized exception set) falls back to the exact raw fold
  * (Queries.aggregateRange). Results are identical either way.
  */
object Telescope {

  private def intervalBeginL(t: Long, d: Long): Long = t - Math.floorMod(t, d)
  private def intervalEndL(t: Long, d: Long): Long = intervalBeginL(t, d) + d

  sealed trait Slice
  final case class RawEdge(b: Long, e: Long) extends Slice
  final case class LevelRun(interval: Long, b: Long, e: Long) extends Slice

  /** The reference's loop at src/metric.cpp:184-227, verbatim arithmetic. */
  def decompose(b: Long, e: Long, ladder: Seq[Long], factor: Long): Seq[Slice] = {
    val imin = ladder.head
    val imax = ladder.last
    var begin = b
    var end = e
    val nb = intervalEndL(begin - 1, imin)
    val ne = intervalBeginL(end, imin)
    if (nb >= ne) return Seq(RawEdge(b, e))
    val out = Seq.newBuilder[Slice]
    out += RawEdge(begin, nb)
    out += RawEdge(ne, end)
    begin = nb; end = ne
    var interval = imin
    var done = false
    while (!done) {
      val next = Math.multiplyExact(interval, factor)
      val nb2 = intervalEndL(begin - 1, next)
      val ne2 = intervalBeginL(end, next)
      if (next > imax || nb2 >= ne2) {
        out += LevelRun(interval, begin, end)
        done = true
      } else {
        if (begin < nb2) out += LevelRun(interval, begin, nb2)
        if (ne2 < end) out += LevelRun(interval, ne2, end)
        begin = nb2; end = ne2; interval = next
      }
    }
    out.result().filter {
      case LevelRun(_, rb, re) => rb < re
      case RawEdge(rb, re) => rb <= re
    }
  }

  /** One exact Aggregate row per metric over [b, e) — same semantics as
    * Queries.aggregateRange, telescoped. */
  def aggregateRange(hta: Hta, b: Long, e: Long): DataFrame = {
    require(b < e, s"invalid request: begin $b >= end $e")
    val meta = hta.meta
    val slices = decompose(b, e, meta.levelIntervals, meta.intervalFactor)

    val bounds = hta.raw.groupBy("metric")
      .agg(min("time").as("_first"), max("time").as("_last"))
    val coveredPred = col("_first") <= b && col("_last") >= e
    val covered = broadcast(bounds.where(coveredPred).select("metric"))

    val pieces: Seq[DataFrame] = slices.map {
      case LevelRun(i, rb, re) =>
        hta.levels
          .where(col("interval") === i && col("time") >= rb && col("time") < re)
          .join(covered, Seq("metric"), "left_semi")
          .select(col("metric"), col("minimum"), col("maximum"), col("sum"),
            col("count"), col("integral"), col("active_time"))
      case RawEdge(rb, re) =>
        rawEdge(hta.raw.join(covered, Seq("metric"), "left_semi"), rb, re,
          meta.intervalMax)
    }

    val telescoped = pieces.reduce(_ unionByName _).groupBy("metric").agg(
      min("minimum").as("minimum"), max("maximum").as("maximum"),
      sum("sum").as("sum"), sum("count").as("count"),
      sum("integral").as("integral"), sum("active_time").as("active_time"))

    // exception set: metrics whose data range does not cover [b, e)
    val rest = broadcast(bounds.where(!coveredPred).select("metric"))
    val restAgg = Queries.aggregateRange(
      hta.raw.join(rest, Seq("metric"), "left_semi"), b, e,
      chunkWidth = Some(meta.intervalMax))

    telescoped.unionByName(restAgg)
  }

  /** aggregate_raw over one edge (src/metric.cpp:112-137): scope
    * (closed, extended) on [rb, re), gap seed at rb — exact for metrics
    * covering the global range (no clamping binds). */
  private def rawEdge(raw: DataFrame, rb: Long, re: Long,
                      bucketWidth: Long): DataFrame = {
    // derived time-bucket bound → parquet directory pruning on the edge scan
    val pruned =
      if (raw.columns.contains("tb"))
        raw.where(col("tb") >= (rb - Math.floorMod(rb, bucketWidth)))
      else raw
    val inRange = pruned.where(col("time") >= rb)
    // per-metric edge point via scalar agg + broadcast join, NOT an unordered
    // window (which would buffer a whole metric on one task)
    val edge = inRange.groupBy("metric")
      .agg(min(when(col("time") >= re, col("time"))).as("_min_ge_e"))
    val scoped = inRange.join(broadcast(edge), Seq("metric"))
      .where(col("time") < re || col("time") === col("_min_ge_e"))
    AggOps.gapLiftChunked(scoped, bucketWidth, firstDefault = Some(lit(rb)))
      .withColumnRenamed("prev_time", "_prev")
      .withColumn("_gap",
        when(col("time") < re, col("time") - col("_prev"))
          .otherwise(lit(re) - col("_prev")))
      .withColumn("_in", col("time") < re)
      .groupBy("metric").agg(
        min("value").as("minimum"), max("value").as("maximum"),
        sum(when(col("_in"), col("value")).otherwise(0.0)).as("sum"),
        sum(when(col("_in"), 1L).otherwise(0L)).as("count"),
        sum(col("value") * col("_gap").cast("double")).as("integral"),
        sum("_gap").as("active_time"))
  }
}
