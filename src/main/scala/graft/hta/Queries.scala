package graft.hta

import graft.model.{IntervalScope, Meta, Scope}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The HTA query surface: raw retrieval (Q1), exact range aggregate (A6),
  * count/last/range (A7/O2/O3) and smoothing (A9). Multi-metric by design —
  * every operator processes all metrics in one distributed plan, where the
  * reference runs per-metric method calls.
  */
object Queries {
  import AggOps._

  /** Driver-side floorMod-based align-down (Math.floorMod handles x<anchor). */
  private def alignDownL(x: Long, anchor: Long, interval: Long): Long =
    x - Math.floorMod(x - anchor, interval)

  /** Q1 — scoped raw retrieval (src/metric.cpp:101-110). */
  def retrieveRaw(points: DataFrame, begin: Long, end: Long,
                  scope: IntervalScope = IntervalScope.rawDefault): DataFrame =
    Scoped.scopedRange(points, begin, end, scope)

  /** A7 — scoped count per metric (src/metric.cpp:233-243). Row-count of the
    * scoped range; at scale this answers from parquet row-group metadata for
    * closed/open scopes since the predicate is pushdown-only. */
  def countRange(points: DataFrame, begin: Long, end: Long,
                 scope: IntervalScope = IntervalScope.rawDefault): DataFrame =
    Scoped.scopedRange(points, begin, end, scope)
      .groupBy("metric").agg(count(lit(1)).as("n"))

  /** O2 — last sample per metric (src/storage/file/metric.cpp:497-505).
    * Tie-break on (time, value): duplicate timestamps (possible in µs-
    * truncated inputs) would otherwise make max_by nondeterministic across
    * partitionings — and flake hash-compared oracle checks. */
  def last(points: DataFrame): DataFrame =
    points.groupBy("metric")
      .agg(max("time").as("time"),
        max_by(col("value"), struct(col("time"), col("value"))).as("value"))

  /** O2 (level form) — `last(interval)`: the most recent closed row of a
    * level. The reference reads the level file's final record positionally
    * (src/storage/file/metric.cpp:497-505); here it is a per-metric max-time
    * row over ONE pruned `interval=` partition (parquet footer max stats make
    * this a metadata-mostly scan). (metric, interval, time) is unique by
    * construction, so max_by is deterministic. */
  def lastInterval(levels: DataFrame, interval: Long): DataFrame = {
    val v = struct(col("minimum"), col("maximum"), col("sum"),
      col("count"), col("integral"), col("active_time"))
    levels.where(col("interval") === interval)
      .groupBy("metric")
      .agg(max("time").as("time"), max_by(v, col("time")).as("_v"))
      .select(col("metric"), lit(interval).as("interval"), col("time"),
        col("_v.minimum").as("minimum"), col("_v.maximum").as("maximum"),
        col("_v.sum").as("sum"), col("_v.count").as("count"),
        col("_v.integral").as("integral"), col("_v.active_time").as("active_time"))
  }

  /** O3 — (first, last) timestamp per metric (src/storage/file/metric.cpp:507-515). */
  def rangeBounds(points: DataFrame): DataFrame =
    points.groupBy("metric")
      .agg(min("time").as("first_time"), max("time").as("last_time"))

  /** A6 — exact range aggregate, correctness tier (src/metric.cpp:160-231):
    * clamp [begin,end] to each metric's data range, fold raw points under
    * last semantics with both partial edges; disjoint metrics yield the
    * monoid identity (±inf min/max). One distributed plan for all metrics.
    *
    * Postcondition (asserted by the reference and by our tests):
    * active_time == clamped end - clamped begin.
    */
  def aggregateRange(points: DataFrame, begin: Long, end: Long,
                     chunkWidth: Option[Long] = None): DataFrame = {
    require(begin < end, s"invalid request: begin $begin >= end $end")
    // Per-metric scalars in ONE pass: data range + first point at/after the
    // query end. All downstream per-metric facts broadcast-join from here —
    // no unordered Window.partitionBy(metric) (which would buffer a whole
    // metric on one task: the skew-killer at 100 TB).
    val bounds = points.groupBy("metric")
      .agg(min("time").as("_first"), max("time").as("_last"),
        min(when(col("time") >= end, col("time"))).as("_min_ge_end"))

    // Clamp per metric (src/metric.cpp:179-181); overlap test :169-175.
    val joined = points.join(broadcast(bounds), Seq("metric"))
      .where(lit(end) > col("_first") && lit(begin) <= col("_last"))
      .withColumn("_b", greatest(lit(begin), col("_first")))
      .withColumn("_e", least(lit(end), col("_last")))

    // aggregate_raw with scope (closed, extended) on the clamped range
    // (src/metric.cpp:112-137): points in [_b, _e) plus the first point >= _e.
    // _e = min(end, _last), so that edge point is _min_ge_end when the data
    // runs past `end` and the last point itself otherwise.
    val scoped = joined
      .withColumn("_min_ge_e",
        when(col("_last") >= end, col("_min_ge_end")).otherwise(col("_last")))
      .where(col("time") >= col("_b") &&
        (col("time") < col("_e") || col("time") === col("_min_ge_e")))

    // Skew-safe gap lift: lag windows keyed by (metric, time-chunk), chunk
    // boundaries stitched via a broadcast-sized table (AggOps.gapLiftChunked).
    val cw = chunkWidth.getOrElse(math.max(1L, (end - begin) / 64))
    val contrib = gapLiftChunked(scoped, cw, firstDefault = Some(col("_b")))
      .withColumnRenamed("prev_time", "_prev")
      .withColumn("_gap",
        when(col("time") < col("_e"), col("time") - col("_prev"))
          .otherwise(col("_e") - col("_prev"))) // partial edge :121-129
      .withColumn("_in", col("time") < col("_e"))

    val agg = contrib.groupBy("metric").agg(
      min("value").as("minimum"),
      max("value").as("maximum"),
      sum(when(col("_in"), col("value")).otherwise(0.0)).as("sum"),
      sum(when(col("_in"), 1L).otherwise(0L)).as("count"),
      sum(col("value") * col("_gap").cast("double")).as("integral"),
      sum("_gap").as("active_time"))

    // Metrics with no overlap return the identity aggregate (:169-175).
    bounds.select("metric").join(agg, Seq("metric"), "left").select(
      col("metric"),
      coalesce(col("minimum"), lit(Double.PositiveInfinity)).as("minimum"),
      coalesce(col("maximum"), lit(Double.NegativeInfinity)).as("maximum"),
      coalesce(col("sum"), lit(0.0)).as("sum"),
      coalesce(col("count"), lit(0L)).as("count"),
      coalesce(col("integral"), lit(0.0)).as("integral"),
      coalesce(col("active_time"), lit(0L)).as("active_time"))
  }

  /** A9 (level form) — positional smoothing: compact each run of
    * `factor` consecutive level rows into one, keyed by position in the
    * result, NOT by epoch alignment (convert_timeaggregates_to_rows,
    * src/metric.cpp:313-354: chunks start at the first returned row).
    * Output keeps the first row's time per chunk and the input interval.
    *
    * Scale bound: the per-metric row_number window is correct-by-design
    * here — positional semantics genuinely need per-metric ordering, and
    * the input is a ROUTED retrieve result, display-bounded to roughly
    * limit/interval rows per metric (a few hundred), never a whole-metric
    * history. Do not reuse this on unrouted level/raw tables. */
  def smoothLevelRows(levelRows: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1)
    if (factor == 1) levelRows
    else {
      val w = Window.partitionBy("metric").orderBy("time")
      levelRows
        .withColumn("_chunk", floor((row_number().over(w) - 1) / factor))
        .groupBy(col("metric"), col("_chunk"))
        .agg(min("time").as("time"), mergeAggCols: _*)
        .drop("_chunk")
    }
  }

  /** A9 (raw form) — convert_timevalues_smooth (src/metric.cpp:259-311):
    * build rows of width `interval` aligned at `begin` (not at the epoch!)
    * directly from scoped raw points, threading gaps under last semantics.
    * Quirks faithfully kept:
    *  - points before `begin` only seed the gap (no contribution);
    *  - the first gap is NOT clipped at `begin` when a pre-begin point exists;
    *  - the first point >= `end` contributes count=0 partials clipped at `end`;
    *  - rows stop after the last contributing point.
    *
    * `scopedPoints` is the result of [[retrieveRaw]] with the caller's scope.
    */
  def smoothRaw(scopedPoints: DataFrame, begin: Long, end: Long,
                interval: Long): DataFrame = {
    val t = col("time")

    // per-metric edge point via scalar agg + broadcast join; skew-safe
    // chunked lag for the gap seed (no whole-metric window buffering)
    val edge = scopedPoints.groupBy("metric")
      .agg(min(when(t >= end, t)).as("_min_ge_e"))
    val cw = math.max(interval, (end - begin) / 64)
    val lifted = gapLiftChunked(scopedPoints.join(broadcast(edge), Seq("metric")),
        cw, firstDefault = Some(least(lit(begin), t)))
      .withColumnRenamed("prev_time", "_prev")
      // only the FIRST point at/after end contributes (the loop stops there)
      .where(t < end || t === col("_min_ge_e"))
      // cap each contribution at `end` (current_end = min(bucket end, end))
      .withColumn("_stop", least(t, lit(end)))
      .withColumn("_in", t < end)

    // points entirely before `begin` contribute nothing (pre-loop skip) but
    // already seeded the next point's _prev via lag above
    val contributing = lifted.where(t >= begin)

    // begin-anchored alignment in pure long arithmetic (ns-exact; float
    // division at 1.7e18 ns magnitudes would mis-bucket):
    // alignDown(x) = begin + floor((x-begin)/interval)*interval for x >= begin
    def alignDown(x: Column): Column = x - pmod(x - begin, lit(interval))
    val s0 = greatest(lit(begin), alignDown(col("_prev")))
    // last window touched: the point's own window if in range, else the
    // window containing end-1 (partials run up to `end`)
    val sLast = when(col("_in"), alignDown(t)).otherwise(lit(alignDownL(end - 1, begin, interval)))
    val segs = contributing
      .withColumn("_slast", sLast)
      .withColumn("_s0", s0)
      .withColumn("_s",
        explode(sequence(col("_s0"), greatest(col("_s0"), col("_slast")), lit(interval))))
      .withColumn("_seg_start",
        when(col("_s") === col("_s0"), col("_prev")).otherwise(col("_s")))
      .withColumn("_seg_end", least(col("_stop"), col("_s") + interval))
      .withColumn("seg_len", greatest(lit(0L), col("_seg_end") - col("_seg_start")))
      .withColumn("is_home", col("_in") && col("_s") === col("_slast"))
      .where(col("seg_len") > 0 || col("is_home"))

    segs.groupBy(col("metric"), col("_s").as("time"))
      .agg(segmentAggCols(col("value")).head, segmentAggCols(col("value")).tail: _*)
      .withColumn("interval", lit(interval))
  }

  /** As-of join — the multi-metric extension the reference lacks (SURVEY
    * §2.7): for every left-series sample, attach the latest right-series
    * value at-or-before its timestamp. Implemented as the union-and-carry
    * pattern: tag both series, sort per key-space, carry the right value
    * forward with last(ignoreNulls) — one shuffle, no range join explosion.
    * At scale, partition-align both inputs on the time bucket first. */
  /** Exact per-metric value percentiles over a time range WITHOUT a global
    * sort — histogram selection: the p-th percentile (percentile_disc
    * semantics) is the smallest value whose cumulative count reaches
    * `ceil(n * p / 100)`. Rendered as `100 * cum >= n * p`, all-integer
    * arithmetic — bit-reproducible in any engine, no interpolation floats.
    *
    * Shape at scale: ONE (metric, value)-keyed groupBy with map-side
    * combine — shuffle volume is the DISTINCT-value histogram, not the
    * point count — then cumulative windows over that histogram (partition
    * width = a metric's distinct values, orders of magnitude below its row
    * count for quantized domains like cents). For a pathological metric
    * whose values are all distinct, coarsen first (e.g. group on
    * `cents div g`) and refine within the selected bucket with a second
    * pruned pass — same two-phase selection, documented rather than built
    * because stored metric values are already grid-quantized. Percent
    * ranks are exploded from a literal array: no join, no extra pass. */
  def valueQuantiles(points: DataFrame, begin: Long, end: Long,
                     ps: Seq[Int], valueCol: String = "cents"): DataFrame = {
    val hist = points.where(col("time") >= begin && col("time") < end)
      .groupBy(col("metric"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum",
        sum("c").over(Window.partitionBy("metric").orderBy("v")))
      .withColumn("n", sum("c").over(Window.partitionBy("metric")))
    cum.select(col("metric"), col("v"), col("cum"), col("n"),
        explode(lit(ps.toArray)).as("p0"))
      .withColumn("p", col("p0").cast("long"))
      .where(col("cum") * 100 >= col("n") * col("p"))
      .groupBy("metric", "p")
      .agg(min("v").as(s"q_$valueCol"), min("n").as("n"))
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               valueName: String = "right_value"): DataFrame = {
    val cols = keys.map(col) ++ Seq(col("time"), col("value"))
    val l = left.select(cols: _*).withColumn("_side", lit(1))
    val r = right.select(cols: _*).withColumn("_side", lit(0))
    // order by (time, _side, value): a right point at time t is visible to a
    // left point at the same t (at-or-before semantics); `value` breaks ties
    // between duplicate right timestamps deterministically (the max value
    // wins), so hash-compared results are stable across partitionings
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("time"), col("_side"), col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(valueName,
        org.apache.spark.sql.functions.last(
          when(col("_side") === 0, col("value")), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(keys.map(col) ++ Seq(col("time"), col("value"), col(valueName)): _*)
  }

  /** Interval (overlap) join — every point row matched to every interval of
    * the same key containing it (`start <= t < end`), the relational core
    * of "samples during an alert episode / session / maintenance window".
    *
    * Spark has no native range-join strategy, and the naive
    * `a.join(b, cond)` with only inequality conditions is a broadcast
    * nested loop. This instead TILES TIME: each point lands in exactly ONE
    * `chunk`-wide tile, each interval is exploded onto every tile it
    * overlaps, and the join is a plain (key, tile) EQUI-join (shuffle
    * hash / sort-merge, AQE-skew-splittable) followed by the exact
    * containment filter. A point sits in one tile, so each qualifying
    * (point, interval) pair is produced exactly once — no distinct needed.
    *
    * Cost shape at 100 TB: interval rows replicate by
    * `ceil(span / chunk) + 1 ≤ maxTiles` (guarded — a malformed unbounded
    * interval would otherwise explode the build side); points never
    * replicate. Pick `chunk` near the median interval span: tiles then
    * hold O(1) interval copies and the equi-join stays balanced even when
    * episodes cluster.
    *
    * Both frames keep all their other columns (names must not collide;
    * interval frames carry their own schema). Times may be negative —
    * tiling uses floor division, not truncation.
    *
    * @param intervals (key, `start`, `end`) rows; `end` exclusive. Empty
    *                  intervals (end <= start) match nothing.
    * @param maxTiles  per-interval replication bound; an interval spanning
    *                  more tiles fails the job (raise_error) rather than
    *                  silently exploding the shuffle */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   keys: Seq[String], chunk: Long,
                   t: String = "time", start: String = "i_start",
                   end: String = "i_end", maxTiles: Long = 1 << 20): DataFrame = {
    require(chunk > 0, s"chunk must be > 0, got $chunk")
    // exact negative-safe floor division: align down with pmod (exact long
    // arithmetic), then `div` — truncation equals floor on the aligned
    // value. Never `/`: double division is inexact past 2^53 (ns scale).
    val pc = points
      .withColumn("_ij_al", col(t) - pmod(col(t), lit(chunk)))
      .withColumn("_tile", expr(s"_ij_al div ${chunk}L"))
      .drop("_ij_al")
    val ic = intervals
      .where(col(end) > col(start))
      .withColumn("_ij_sal", col(start) - pmod(col(start), lit(chunk)))
      .withColumn("_ij_eal",
        (col(end) - 1) - pmod(col(end) - 1, lit(chunk)))
      .withColumn("_ij_lo", expr(s"_ij_sal div ${chunk}L"))
      .withColumn("_ij_hi", expr(s"_ij_eal div ${chunk}L"))
      .withColumn("_tile",
        explode(when(col("_ij_hi") - col("_ij_lo") < lit(maxTiles),
            sequence(col("_ij_lo"), col("_ij_hi")))
          .otherwise(raise_error(concat(lit(
            s"intervalJoin: interval spans more than $maxTiles tiles of $chunk ns: start="),
            col(start), lit(" end="), col(end))))))
      .drop("_ij_sal", "_ij_eal", "_ij_lo", "_ij_hi")
    pc.join(ic, keys :+ "_tile")
      .where(col(t) >= col(start) && col(t) < col(end))
      .drop("_tile")
  }

  /** Q3 — lift raw points to Row form: interval 0, aggregate of (v, gap to
    * previous returned point; first point gap 0) (src/metric.cpp:414-439).
    * `chunkWidth` (e.g. the store's bucket width) de-skews the gap lag for
    * full-table lifts; display-bounded callers may omit it. */
  def rawToRows(scopedPoints: DataFrame,
                chunkWidth: Option[Long] = None): DataFrame = {
    val lifted = chunkWidth match {
      case Some(cw) => gapLiftChunked(scopedPoints, cw)
        .withColumnRenamed("prev_time", "_prev")
      case None =>
        val w = Window.partitionBy("metric").orderBy("time")
        scopedPoints.withColumn("_prev",
          coalesce(lag("time", 1).over(w), col("time")))
    }
    lifted
      .select(
        col("metric"), lit(0L).as("interval"), col("time"),
        col("value").as("minimum"), col("value").as("maximum"),
        col("value").as("sum"), lit(1L).as("count"),
        (col("value") * (col("time") - col("_prev")).cast("double")).as("integral"),
        (col("time") - col("_prev")).as("active_time"))
  }
}
