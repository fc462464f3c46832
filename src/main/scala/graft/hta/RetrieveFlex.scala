package graft.hta

import graft.model.{IntervalScope, Meta, Scope}
import graft.store.Hta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q2/Q3 — `retrieve_flex`, the reference's interactive query entry point
  * (src/metric.cpp:356-412), re-architected for Spark:
  *
  * The reference routes ONE metric at a time: pick the coarsest level whose
  * interval fits `interval_upper_limit`, fall back down while the level is
  * empty in-range, then positionally smooth by `limit/interval`.
  *
  * Here the router is a *materialized-view selection* over all metrics in
  * one distributed plan:
  *   1. one pruned scan of the candidate levels → per-(metric, level)
  *      emptiness summary (tiny aggregate);
  *   2. per metric, choose the coarsest non-empty level (driver/broadcast);
  *   3. one pruned scan of exactly the chosen (metric, level) partitions,
  *      scope-filtered, positionally smoothed with a per-metric factor.
  *
  * At 100 TB step 1 touches only `interval ∈ candidates` partitions (a tiny
  * fraction of the store: each level is factor× smaller than its child), and
  * step 3 reads exactly one level per metric. Raw is touched only in the
  * `limit < interval_min` branch.
  *
  * Result schema (Row form, include/hta/types.hpp:109-127):
  *   (metric, interval, time, minimum, maximum, sum, count, integral,
  *    active_time) — `interval` is the source level width (0 for raw points).
  */
object RetrieveFlex {
  import AggOps._

  private val rowCols = Seq("metric", "interval", "time", "minimum", "maximum",
    "sum", "count", "integral", "active_time")

  /** Bucket-pruning hint for raw scans when the warehouse partition column
    * is present (in-memory Hta frames simply don't have it). */
  private def rawBucket(hta: Hta): Option[(String, Long)] =
    if (hta.raw.columns.contains("tb")) Some(("tb", hta.meta.intervalMax)) else None

  /** Row-form retrieve (Q3: reference src/metric.cpp:414-439): like
    * [[retrieveFlex]] but raw results are lifted to interval-0 rows. */
  def retrieve(hta: Hta, begin: Long, end: Long, limit: Long,
               scope: IntervalScope = IntervalScope.retrieveDefault): DataFrame = {
    val flex = retrieveFlex(hta, begin, end, limit, scope, smooth = false)
    flex // retrieveFlex already returns Row form with raw lifted
  }

  /** `retrieve(b, e, min_samples)` (O4: src/metric.cpp:245-257):
    * min_samples → interval_upper_limit = (end-begin)/min_samples. The
    * Row-form retrieve() wrapper passes smooth=false (src/metric.cpp:414-416). */
  def retrieveMinSamples(hta: Hta, begin: Long, end: Long, minSamples: Long,
                         scope: IntervalScope = IntervalScope.retrieveDefault): DataFrame = {
    require(begin <= end, s"invalid request: begin $begin > end $end")
    retrieveFlex(hta, begin, end, (end - begin) / minSamples, scope, smooth = false)
  }

  def retrieveFlex(hta: Hta, begin: Long, end: Long, limit: Long,
                   scope: IntervalScope = IntervalScope.retrieveDefault,
                   smooth: Boolean = true): DataFrame =
    retrieveFlexMulti(Seq(hta), begin, end, limit, scope, smooth)

  /** Q2 over one OR several independent stores (MultiWarehouse config
    * groups, each with its own ladder). The level-probe descent is batched:
    * rank r probes EVERY group's r-th candidate level in one unioned
    * summary scan, so the action count is one per descent rank — bounded by
    * the deepest ladder — regardless of how many configs the store holds. */
  def retrieveFlexMulti(groups: Seq[Hta], begin: Long, end: Long, limit: Long,
                        scope: IntervalScope = IntervalScope.retrieveDefault,
                        smooth: Boolean = true): DataFrame = {
    require(groups.nonEmpty, "no stores to retrieve from")
    if (scope.begin != Scope.Infinity && scope.end != Scope.Infinity)
      require(begin <= end, s"invalid request: begin $begin > end $end")

    if (limit < 0) {
      // single-aggregate branch (→ A6); one row per metric
      return groups.map { hta =>
        Queries.aggregateRange(hta.raw, begin, end)
          .select(col("metric"), lit(end - begin).as("interval"), lit(begin).as("time"),
            col("minimum"), col("maximum"), col("sum"), col("count"),
            col("integral"), col("active_time"))
      }.reduce(_ unionByName _)
    }

    val (rawGs, lvlGs) = groups.partition(h => limit < h.meta.intervalMin)
    val parts = rawGs.map(h => rawBranch(h, begin, end, limit, scope, smooth)) ++
      levelRouted(lvlGs, begin, end, limit, scope, smooth)
    parts.reduce(_ unionByName _)
  }

  /** Per-level emptiness probe as FILTERED scans: each branch's time
    * predicate reaches the parquet source (row-group pruning), instead of
    * hiding inside an aggregate conditional over the whole partition. */
  private def nonEmptyAt(lv: DataFrame, begin: Long, end: Long,
                         scope: IntervalScope): DataFrame = {
    val beginBase = scope.begin match {
      case Scope.Closed => col("time") >= begin
      case Scope.Open | Scope.Extended => col("time") > begin
      case Scope.Infinity => lit(true)
    }
    val endBase = scope.end match {
      case Scope.Closed => col("time") <= end
      case Scope.Open | Scope.Extended => col("time") < end
      case Scope.Infinity => lit(true)
    }
    val branches = Seq(
      Some(lv.where(beginBase && endBase).select("metric")),
      if (scope.begin == Scope.Extended)
        Some(lv.where(col("time") <= begin).select("metric")) else None,
      if (scope.end == Scope.Extended)
        Some(lv.where(col("time") >= end).select("metric")) else None)
    branches.flatten.reduce(_ unionByName _).distinct()
  }

  // explicit-schema local relations (not spark.implicits.toDF: Product
  // encoders need compile-time reflection that breaks under REPL/notebook
  // classloaders — a library entry point can't assume an application one)
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
  private def metricDf(spark: org.apache.spark.sql.SparkSession,
                       ms: Seq[String]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(ms.map(Row(_)): _*),
      StructType(Seq(StructField("metric", StringType))))

  /** The level-selection descent (materialized-view routing) for one or
    * more ladders. The reference probes the coarsest fitting level and
    * descends only while it is empty (src/metric.cpp:394-409). We translate
    * that probe order: rank r scans every still-active group's r-th
    * candidate level (each pruned to one partition) for metrics still
    * unrouted, as ONE unioned summary collect; in the common case rank 0
    * answers every metric of every group and the finer, larger levels are
    * never read. The routing table is one entry per metric — broadcast-
    * sized by design — so it lives on the DRIVER: the early exit and the
    * unrouted exclusion cost no extra Spark actions, and nothing is cached
    * (previous versions leaked cached frames into executor storage memory). */
  private def levelRouted(hs: Seq[Hta], begin: Long, end: Long, limit: Long,
                          scope: IntervalScope, smooth: Boolean): Seq[DataFrame] = {
    if (hs.isEmpty) return Nil
    val spark = hs.head.raw.sparkSession

    final case class G(h: Hta, capped: Long, candidates: Seq[Long], desc: Seq[Long])
    val gs = hs.map { h =>
      val ladder = h.meta.levelIntervals
      val capped = math.min(limit, h.meta.intervalMax)
      val coarsest = ladder.takeWhile(_ <= capped).lastOption.getOrElse(h.meta.intervalMin)
      val candidates = ladder.filter(_ <= coarsest)
      G(h, capped, candidates, candidates.reverse)
    }

    // metric universe for the early exit: the warehouse catalog when
    // available (tiny table maintained at ingest), else derived once from
    // the coarsest populated level — one collect across ALL groups
    val universes: Map[Int, Set[String]] = gs.zipWithIndex.map { case (g, gi) =>
      g.h.metrics.getOrElse(g.h.levels.where(col("interval") === g.candidates.last)
        .select("metric").distinct())
        .select("metric").withColumn("_g", lit(gi))
    }.reduce(_ unionByName _).collect()
      .groupBy(_.getInt(1))
      .map { case (gi, rows) => gi -> rows.map(_.getString(0)).toSet }

    val routedPairs = Array.fill(gs.size)(Vector.empty[(String, Long)])
    val routedSet = Array.fill(gs.size)(Set.empty[String])
    def active(gi: Int, rank: Int): Boolean =
      rank < gs(gi).desc.size &&
        !(routedSet(gi).nonEmpty &&
          universes.getOrElse(gi, Set.empty).subsetOf(routedSet(gi)))
    var rank = 0
    val maxRank = gs.map(_.desc.size).max
    while (rank < maxRank && gs.indices.exists(active(_, rank))) {
      val branches = gs.indices.flatMap { gi =>
        if (!active(gi, rank)) None
        else {
          val i = gs(gi).desc(rank)
          val probe0 = gs(gi).h.levels.where(col("interval") === i)
          val probe = if (routedSet(gi).isEmpty) probe0
            else probe0.join(broadcast(metricDf(spark, routedSet(gi).toSeq)),
              Seq("metric"), "left_anti")
          Some(nonEmptyAt(probe, begin, end, scope)
            .select(col("metric"), lit(gi).as("_g"), lit(i).as("_i")))
        }
      }
      branches.reduce(_ unionByName _).collect().foreach { r =>
        val gi = r.getInt(1)
        routedPairs(gi) :+= ((r.getString(0), r.getLong(2)))
        routedSet(gi) += r.getString(0)
      }
      rank += 1
    }

    gs.zipWithIndex.map { case (g, gi) =>
      val chosen = spark.createDataFrame(
        java.util.Arrays.asList(routedPairs(gi).map { case (m, i) => Row(m, i) }: _*),
        StructType(Seq(StructField("metric", StringType),
          StructField("interval", LongType))))
      routeAndSmooth(g.h, chosen, routedPairs(gi).map(_._2).distinct, begin, end,
        scope, smooth, g.capped, g.candidates)
    }
  }

  private def routeAndSmooth(hta: Hta, chosen: DataFrame, usedIntervals: Seq[Long],
                             begin: Long, end: Long,
                             scope: IntervalScope, smooth: Boolean, capped: Long,
                             candidates: Seq[Long]): DataFrame = {
    // literal isin on the routed intervals (known on the driver) → STATIC
    // partition pruning of the level scan; the broadcast join then trims to
    // exactly the chosen (metric, interval) pairs
    val pruned =
      if (usedIntervals.isEmpty) hta.levels.where(lit(false))
      else hta.levels.where(col("interval").isin(usedIntervals: _*))
    val routed = Scoped.scopedRange(
      pruned.join(broadcast(chosen), Seq("metric", "interval")),
      begin, end, scope)

    if (!smooth) {
      routed.select(rowCols.map(col): _*)
    } else {
      // positional smoothing by per-metric factor = limit / interval
      // (src/metric.cpp:313-354 via convert_timeaggregates_to_rows).
      // The ladder is tiny, so the factor map is a driver-built CASE chain —
      // exact long arithmetic, no float division at ns magnitudes.
      // The per-metric row_number window is display-bounded: `routed` holds
      // one ROUTED level per metric over [begin,end), ≈ limit/interval rows
      // per metric — not a whole-metric history — so no partition can grow
      // with store size.
      val factor = candidates.foldLeft(lit(1L)) { (acc, i) =>
        when(col("interval") === i, lit(capped / i)).otherwise(acc)
      }
      val w = Window.partitionBy("metric").orderBy("time")
      routed
        .withColumn("_f", factor)
        .withColumn("_chunk", (((row_number().over(w) - 1) / col("_f")).cast("long")))
        .groupBy(col("metric"), col("interval"), col("_chunk"))
        .agg(min("time").as("time"),
          min("minimum").as("minimum"), max("maximum").as("maximum"),
          sum("sum").as("sum"), sum("count").as("count"),
          sum("integral").as("integral"), sum("active_time").as("active_time"))
        .select(rowCols.map(col): _*)
    }
  }

  /** limit < interval_min: raw retrieval, optionally smoothed into
    * begin-anchored windows of width `limit` when points are denser than the
    * limit (src/metric.cpp:370-386). Per-metric branch decision. */
  private def rawBranch(hta: Hta, begin: Long, end: Long, limit: Long,
                        scope: IntervalScope, smooth: Boolean): DataFrame = {
    val scoped = Scoped.scopedRange(hta.raw, begin, end, scope, bucket = rawBucket(hta))
    if (!smooth || limit <= 0)
      return Queries.rawToRows(scoped, Some(hta.meta.intervalMax))
        .select(rowCols.map(col): _*)
    // reference: average_interval = (end-begin)/n < limit (integer division);
    // equivalently end-begin < limit*n — exact long comparison, no division
    val counts = scoped.groupBy("metric").agg(count(lit(1)).as("_n"))
      .withColumn("_smooth", lit(end - begin) < lit(limit) * col("_n"))
    val flagged = scoped.join(broadcast(counts.select("metric", "_smooth")), Seq("metric"))
    val smoothed = Queries.smoothRaw(
        flagged.where(col("_smooth")).drop("_smooth"), begin, end, limit)
      .select(rowCols.map(col): _*)
    val rawRows = Queries.rawToRows(flagged.where(!col("_smooth")).drop("_smooth"),
      Some(hta.meta.intervalMax))
      .select(rowCols.map(col): _*)
    smoothed.unionByName(rawRows)
  }
}
