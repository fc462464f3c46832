package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Shared._

/** Reference hta surface: scans, scope predicates, the aggregation
  * algebra, retrieve/flex routing, warehouse round-trips, and the six
  * tool twins (SURVEY.md §2 S/F/A/O/Q/T rows). */
private[registry] object HtaEntries {
  val entries: Seq[Entry] = Seq(

    // ---- S1/F1/Q1: scans + scope predicates ----
    Entry("q01_raw_scan",
      (s, d) => ev(s, d).where(col("time") >= B && col("time") < E)
        .select("metric", "time", "value").orderBy("metric", "time"),
      Some(s"""WITH $ptsCte SELECT metric, time, value FROM pts
              |WHERE time >= $B AND time < $E ORDER BY 1, 2""".stripMargin)),

    Entry("q02_scope_extended",
      (s, d) => Scoped.scopedRange(
          ev(s, d).select("metric", "time", "value"), B, E,
          IntervalScope(Scope.Extended, Scope.Extended))
        .select("metric", "time", "value").orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |lb AS (SELECT metric, max(time) AS t FROM pts WHERE time <= $B GROUP BY 1),
              |le AS (SELECT metric, min(time) AS t FROM pts WHERE time >= $E GROUP BY 1)
              |SELECT p.metric, p.time, p.value FROM pts p
              |LEFT JOIN lb ON p.metric = lb.metric
              |LEFT JOIN le ON p.metric = le.metric
              |WHERE (p.time > $B OR p.time = lb.t) AND (p.time < $E OR p.time = le.t)
              |ORDER BY 1, 2""".stripMargin)),

    Entry("q03_scope_open_inf",
      (s, d) => Scoped.scopedRange(
          ev(s, d).select("metric", "time", "value"), B, E,
          IntervalScope(Scope.Open, Scope.Infinity))
        .select("metric", "time", "value").orderBy("metric", "time"),
      Some(s"""WITH $ptsCte SELECT metric, time, value FROM pts
              |WHERE time > $B ORDER BY 1, 2""".stripMargin)),

    // ---- A7/O2/O3 ----
    Entry("q04_count_closed",
      (s, d) => Queries.countRange(ev(s, d), B, E, IntervalScope(Scope.Closed, Scope.Closed))
        .orderBy("metric"),
      Some(s"""WITH $ptsCte SELECT metric, count(*) AS n FROM pts
              |WHERE time >= $B AND time <= $E GROUP BY 1 ORDER BY 1""".stripMargin)),

    Entry("q05_last",
      (s, d) => Queries.last(ev(s, d).select("metric", "time", "value")).orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |m AS (SELECT metric, max(time) AS time FROM pts GROUP BY 1)
              |-- max value at the last timestamp: deterministic under
              |-- duplicate timestamps, matching Spark's (time, value) max_by
              |SELECT m.metric, m.time, max(p.value) AS value
              |FROM m JOIN pts p ON p.metric = m.metric AND p.time = m.time
              |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    Entry("q06_range_bounds",
      (s, d) => Queries.rangeBounds(ev(s, d)).orderBy("metric"),
      Some(s"""WITH $ptsCte SELECT metric, min(time) AS first_time, max(time) AS last_time
              |FROM pts GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- A1-A5: the aggregation algebra ----
    Entry("q07_level_1h",
      (s, d) => levelExact(ev(s, d), I1).orderBy("metric", "time"),
      Some(levelSql(I1))),

    Entry("q08_rollup_10h",
      (s, d) => rollupExact(levelExact(ev(s, d), I1), I1, I2).orderBy("metric", "time"),
      Some(levelSql(I2))),

    // ---- A6 + A10 ----
    Entry("q09_agg_range",
      (s, d) => aggRangeExact(ev(s, d), B, E).orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |bounds AS (SELECT metric, min(time) AS f, max(time) AS l FROM pts GROUP BY 1),
              |cl AS (SELECT metric, greatest($B, f) AS b, least($E, l) AS e FROM bounds
              |       WHERE $E > f AND $B <= l),
              |sc0 AS (SELECT p.metric, p.time, p.value, p.cents, cl.b, cl.e FROM pts p
              |        JOIN cl ON p.metric = cl.metric WHERE p.time >= cl.b),
              |sc AS (SELECT *, min(CASE WHEN time >= e THEN time END)
              |         OVER (PARTITION BY metric) AS mge FROM sc0),
              |con AS (SELECT metric, time, value, cents, b, e, time < e AS isin,
              |         coalesce(lag(time) OVER (PARTITION BY metric ORDER BY time), b) AS prev
              |        FROM sc WHERE time < e OR time = mge),
              |agg AS (SELECT metric,
              |  min(value) AS minimum, max(value) AS maximum,
              |  CAST(sum(CASE WHEN isin THEN cents ELSE 0 END) AS BIGINT) AS sum_cents,
              |  CAST(sum(CASE WHEN isin THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
              |  CAST(sum(cents * (((CASE WHEN isin THEN time ELSE e END) - prev) // 1000)) AS BIGINT) AS integral_cu,
              |  CAST(sum((CASE WHEN isin THEN time ELSE e END) - prev) AS BIGINT) AS active_time
              |  FROM con GROUP BY 1)
              |SELECT b.metric,
              |  coalesce(a.minimum, CAST('infinity' AS DOUBLE)) AS minimum,
              |  coalesce(a.maximum, CAST('-infinity' AS DOUBLE)) AS maximum,
              |  coalesce(a.sum_cents, 0) AS sum_cents, coalesce(a.cnt, 0) AS cnt,
              |  coalesce(a.integral_cu, 0) AS integral_cu,
              |  coalesce(a.active_time, 0) AS active_time,
              |  CASE WHEN coalesce(a.active_time, 0) > 0
              |       THEN CAST(a.integral_cu AS DOUBLE) / CAST(a.active_time // 1000 AS DOUBLE)
              |       WHEN coalesce(a.cnt, 0) > 0
              |       THEN CAST(a.sum_cents AS DOUBLE) / CAST(a.cnt AS DOUBLE) END AS mean_c
              |FROM bounds b LEFT JOIN agg a ON b.metric = a.metric
              |ORDER BY 1""".stripMargin)),

    // ---- A9 positional smoothing ----
    Entry("q10_smooth4",
      (s, d) => {
        val lv = levelExact(ev(s, d), I1)
        val w = Window.partitionBy("metric").orderBy("time")
        lv.withColumn("_chunk", ((row_number().over(w) - 1) / 4).cast("long"))
          .groupBy("metric", "_chunk")
          .agg(min("time").as("time"), mergeExactCols: _*)
          .drop("_chunk")
          .select("metric", "time", "minimum", "maximum", "sum_cents", "cnt",
            "integral_cu", "active_time")
          .orderBy("metric", "time")
      },
      Some(s"""WITH lv AS (${levelSql(I1).replace("ORDER BY 1, 2", "")}),
              |rn AS (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time) - 1 AS r
              |       FROM lv)
              |SELECT metric, min(time) AS time, min(minimum) AS minimum, max(maximum) AS maximum,
              |  CAST(sum(sum_cents) AS BIGINT) AS sum_cents, CAST(sum(cnt) AS BIGINT) AS cnt,
              |  CAST(sum(integral_cu) AS BIGINT) AS integral_cu,
              |  CAST(sum(active_time) AS BIGINT) AS active_time
              |FROM rn GROUP BY metric, r // 4 ORDER BY 1, 2""".stripMargin)),

    // ---- F2/F3 validity + plausibility ----
    Entry("q11_repair",
      (s, d) => {
        val f = ev(s, d).where(!isnan(col("value")) &&
          col("value") >= 1.0 && col("value") <= 300.0)
        val w = Window.partitionBy("metric").orderBy("time")
        f.withColumn("_p", lag("time", 1).over(w))
          .where(col("_p").isNull || col("time") > col("_p"))
          .groupBy("metric")
          .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
            max("value").as("vmax"), sum("cents").as("sum_cents"))
          .orderBy("metric")
      },
      Some(s"""WITH $ptsCte,
              |f AS (SELECT * FROM pts WHERE NOT isnan(value) AND value >= 1.0 AND value <= 300.0),
              |m AS (SELECT *, lag(time) OVER (PARTITION BY metric ORDER BY time) AS p FROM f)
              |SELECT metric, count(*) AS cnt, min(value) AS vmin, max(value) AS vmax,
              |  CAST(sum(cents) AS BIGINT) AS sum_cents
              |FROM m WHERE p IS NULL OR time > p GROUP BY 1 ORDER BY 1""".stripMargin)),

    Entry("q12_check",
      (s, d) => {
        val w = Window.partitionBy("metric").orderBy("time")
        ev(s, d).withColumn("_p", lag("time", 1).over(w))
          .groupBy("metric").agg(
            count(lit(1)).as("n_rows"),
            sum(when(isnan(col("value")) ||
              col("value") === Double.PositiveInfinity ||
              col("value") === Double.NegativeInfinity, 1L).otherwise(0L)).as("n_nonfinite"),
            sum(when(abs(col("value")) > 1e20, 1L).otherwise(0L)).as("n_implausible"),
            sum(when(col("time") < 946684800000000000L, 1L).otherwise(0L)).as("n_before_2000"),
            sum(when(col("time") > NOW, 1L).otherwise(0L)).as("n_future"),
            sum(when(col("_p").isNotNull && col("time") <= col("_p"), 1L).otherwise(0L))
              .as("n_nonmono"))
          .orderBy("metric")
      },
      Some(s"""WITH $ptsCte,
              |m AS (SELECT *, lag(time) OVER (PARTITION BY metric ORDER BY time) AS p FROM pts)
              |SELECT metric, count(*) AS n_rows,
              |  CAST(sum(CASE WHEN isnan(value) OR isinf(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
              |  CAST(sum(CASE WHEN abs(value) > 1e20 THEN 1 ELSE 0 END) AS BIGINT) AS n_implausible,
              |  CAST(sum(CASE WHEN time < 946684800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_before_2000,
              |  CAST(sum(CASE WHEN time > $NOW THEN 1 ELSE 0 END) AS BIGINT) AS n_future,
              |  CAST(sum(CASE WHEN p IS NOT NULL AND time <= p THEN 1 ELSE 0 END) AS BIGINT) AS n_nonmono
              |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- F4 throttle. The fold (keep iff last_kept + cooldown < time) is
    // stateful but still SQL-expressible as a recursive CTE: iteration k
    // yields each metric's (k+1)-th kept timestamp. (metric, time) is unique
    // in events, so the value join is deterministic. ----
    Entry("q13_throttle",
      (s, d) => Throttle.throttle(ev(s, d).select("metric", "time", "value"), COOLDOWN)
        .orderBy("metric", "time"),
      Some(s"""WITH RECURSIVE $ptsCte,
              |kept AS (
              |  SELECT metric, min(time) AS time FROM pts GROUP BY 1
              |  UNION ALL
              |  SELECT metric, nxt AS time FROM (
              |    SELECT k.metric, (SELECT min(p.time) FROM pts p
              |                      WHERE p.metric = k.metric
              |                        AND p.time > k.time + $COOLDOWN) AS nxt
              |    FROM kept k) WHERE nxt IS NOT NULL
              |)
              |SELECT k.metric, k.time, p.value FROM kept k
              |JOIN pts p ON p.metric = k.metric AND p.time = k.time
              |ORDER BY 1, 2""".stripMargin)),

    // ---- Q2 retrieveFlex end-to-end (in-memory level ladder over events) ----
    Entry("q21_flex_route",
      (s, d) => {
        val e = ev(s, d)
        val lv1 = levelExact(e, I1).cache() // consumed twice: canon + rollup
        val lv2 = rollupExact(lv1, I1, I2)
        val canon = (df: DataFrame, i: Long) => df.select(
          col("metric"), lit(i).as("interval"), col("time"),
          col("minimum"), col("maximum"), col("sum_cents").as("sum"),
          col("cnt").as("count"), col("integral_cu").as("integral"),
          col("active_time"))
        val mem = graft.store.Hta(
          e.select("metric", "time", "value"),
          canon(lv1, I1).unionByName(canon(lv2, I2)),
          graft.model.Meta(I1, I2, 10))
        // limit 5h → coarsest fitting level is 1h, positional smooth ×5
        graft.hta.RetrieveFlex.retrieveFlex(mem, B, E, 5 * I1, smooth = true)
          .select(col("metric"), col("time"), col("minimum"), col("maximum"),
            col("sum").as("sum_cents"), col("count").as("cnt"),
            col("integral").as("integral_cu"), col("active_time"))
          .orderBy("metric", "time")
      },
      Some(s"""WITH lv AS (${levelSql(I1).replace("ORDER BY 1, 2", "")}),
              |lb AS (SELECT metric, max(time) AS t FROM lv WHERE time <= $B GROUP BY 1),
              |le AS (SELECT metric, min(time) AS t FROM lv WHERE time >= $E GROUP BY 1),
              |sc AS (SELECT l.* FROM lv l
              |       LEFT JOIN lb ON l.metric = lb.metric
              |       LEFT JOIN le ON l.metric = le.metric
              |       WHERE (l.time > $B OR l.time = lb.t) AND l.time < $E),
              |rn AS (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time) - 1 AS r
              |       FROM sc)
              |SELECT metric, min(time) AS time, min(minimum) AS minimum,
              |  max(maximum) AS maximum, CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
              |  CAST(sum(cnt) AS BIGINT) AS cnt,
              |  CAST(sum(integral_cu) AS BIGINT) AS integral_cu,
              |  CAST(sum(active_time) AS BIGINT) AS active_time
              |FROM rn GROUP BY metric, r // 5 ORDER BY 1, 2""".stripMargin)),

    // ---- Q3 raw→Row lift (interval-0 rows with per-point gaps) ----
    Entry("q22_raw_rows",
      (s, d) => {
        val scoped = Scoped.scopedRange(
          ev(s, d).select("metric", "time", "value", "cents"), B, E,
          IntervalScope(Scope.Closed, Scope.Open))
        val w = Window.partitionBy("metric").orderBy("time")
        scoped.withColumn("_prev", coalesce(lag("time", 1).over(w), col("time")))
          .select(col("metric"), col("time"), col("value"),
            (col("cents") * ((col("time") - col("_prev")) / 1000).cast("long")).as("integral_cu"),
            (col("time") - col("_prev")).as("active_time"))
          .orderBy("metric", "time")
      },
      Some(s"""WITH $ptsCte,
              |sc AS (SELECT * FROM pts WHERE time >= $B AND time < $E),
              |l AS (SELECT metric, time, value, cents,
              |        coalesce(lag(time) OVER (PARTITION BY metric ORDER BY time), time) AS prev
              |      FROM sc)
              |SELECT metric, time, value,
              |  CAST(cents * ((time - prev) // 1000) AS BIGINT) AS integral_cu,
              |  CAST(time - prev AS BIGINT) AS active_time
              |FROM l ORDER BY 1, 2""".stripMargin)),

    // ---- warehouse round-trip: S3/S4 sinks + Q2/A6 over the real store.
    //      The store is ingested in the µs time domain with value := cents,
    //      so every stored aggregate (incl. integral = cents·µs) stays an
    //      integer below 2^53 — double arithmetic is then exact and the
    //      DuckDB recomputation matches bit-for-bit. ----
    Entry("q28_warehouse_flex",
      (s, d) => {
        val hta = warehouseFor(s, d)
        graft.hta.RetrieveFlex.retrieveFlex(hta, Bu, Eu, 5 * I1u, smooth = true)
          .select(col("metric"), col("time"), col("minimum"), col("maximum"),
            col("sum").cast("long").as("sum_cents"),
            col("count").as("cnt"),
            col("integral").cast("long").as("integral_cu"),
            col("active_time"))
          .orderBy("metric", "time")
      },
      Some(s"""WITH ${levelCteAt(I1u)},
              |lb AS (SELECT metric, max(time) AS t FROM lv WHERE time <= $Bu GROUP BY 1),
              |le AS (SELECT metric, min(time) AS t FROM lv WHERE time >= $Eu GROUP BY 1),
              |sc AS (SELECT l.* FROM lv l
              |       LEFT JOIN lb ON l.metric = lb.metric
              |       LEFT JOIN le ON l.metric = le.metric
              |       WHERE (l.time > $Bu OR l.time = lb.t) AND l.time < $Eu),
              |rn AS (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time) - 1 AS r
              |       FROM sc)
              |SELECT metric, min(time) AS time, min(minimum) AS minimum,
              |  max(maximum) AS maximum, CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
              |  CAST(sum(cnt) AS BIGINT) AS cnt,
              |  CAST(sum(integral_cu) AS BIGINT) AS integral_cu,
              |  CAST(sum(active_time) AS BIGINT) AS active_time
              |FROM rn GROUP BY metric, r // 5 ORDER BY 1, 2""".stripMargin)),

    // A6 over the warehouse via the telescoped plan. integral omitted from
    // the oracle columns: the whole-range integral exceeds 2^53 cents·µs,
    // where float summation order is no longer provably neutral.
    Entry("q29_warehouse_telescope",
      (s, d) => {
        val hta = warehouseFor(s, d)
        graft.hta.Telescope.aggregateRange(hta, Bu, Eu)
          .select(col("metric"), col("minimum"), col("maximum"),
            col("sum").cast("long").as("sum_cents"), col("count").as("cnt"),
            col("active_time"))
          .orderBy("metric")
      },
      Some(s"""WITH $wptsCte,
              |bounds AS (SELECT metric, min(time) AS f, max(time) AS l FROM wpts GROUP BY 1),
              |cl AS (SELECT metric, greatest($Bu, f) AS b, least($Eu, l) AS e FROM bounds
              |       WHERE $Eu > f AND $Bu <= l),
              |sc0 AS (SELECT p.metric, p.time, p.cents, cl.b, cl.e FROM wpts p
              |        JOIN cl ON p.metric = cl.metric WHERE p.time >= cl.b),
              |sc AS (SELECT *, min(CASE WHEN time >= e THEN time END)
              |         OVER (PARTITION BY metric) AS mge FROM sc0),
              |con AS (SELECT metric, time, cents, b, e, time < e AS isin,
              |         coalesce(lag(time) OVER (PARTITION BY metric ORDER BY time), b) AS prev
              |        FROM sc WHERE time < e OR time = mge)
              |SELECT metric,
              |  min(CAST(cents AS DOUBLE)) AS minimum, max(CAST(cents AS DOUBLE)) AS maximum,
              |  CAST(sum(CASE WHEN isin THEN cents ELSE 0 END) AS BIGINT) AS sum_cents,
              |  CAST(sum(CASE WHEN isin THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
              |  CAST(sum((CASE WHEN isin THEN time ELSE e END) - prev) AS BIGINT) AS active_time
              |FROM con GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- O2 level form: last closed row of a level (metric.cpp:497-505) ----
    Entry("q33_last_interval",
      (s, d) => graft.hta.Queries.lastInterval(warehouseFor(s, d).levels, I1u)
        .select(col("metric"), col("interval"), col("time"),
          col("minimum"), col("maximum"),
          col("sum").cast("long").as("sum_cents"), col("count").as("cnt"),
          col("integral").cast("long").as("integral_cu"), col("active_time"))
        .orderBy("metric"),
      Some(s"""WITH ${levelCteAt(I1u)}
              |SELECT metric, CAST($I1u AS BIGINT) AS interval, time, minimum,
              |  maximum, sum_cents, cnt, integral_cu, active_time
              |FROM (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time DESC) AS rn
              |      FROM lv)
              |WHERE rn = 1 ORDER BY 1""".stripMargin)),

    // ---- T1 dump: per-metric store summary (src/tools/dump.cpp:44-88) ----
    Entry("q34_dump",
      (s, d) => graft.tools.Tools.dump(warehouseFor(s, d)).orderBy("metric"),
      Some(s"""WITH $wptsCte
              |SELECT metric, CAST(count(*) AS BIGINT) AS n_rows,
              |  min(time) AS first_time, max(time) AS last_time
              |FROM wpts GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- T4 clone: re-aggregation under a 5×-coarser Meta, checked on the
    //      cloned store's L0 levels (src/tools/clone.cpp:57-104) ----
    Entry("q35_clone_levels",
      (s, d) => cloneFor(s, d).levels.where(col("interval") === 5 * I1u)
        .select(col("metric"), col("time"), col("minimum"), col("maximum"),
          col("sum").cast("long").as("sum_cents"), col("count").as("cnt"),
          col("integral").cast("long").as("integral_cu"), col("active_time"))
        .orderBy("metric", "time"),
      Some(s"""WITH ${levelCteAt(5 * I1u)}
              |SELECT metric, time, minimum, maximum, sum_cents, cnt,
              |  integral_cu, active_time
              |FROM lv ORDER BY 1, 2""".stripMargin)),

    // ---- S7 end-to-end: per-metric Meta. 'click' (1 h ladder) routes to
    //      its 10 h level unsmoothed (factor 12h/10h = 1) while every other
    //      metric (6 h ladder) routes to its 6 h level smoothed in pairs —
    //      one store, divergent ladders, one distributed plan ----
    Entry("q37_multimeta_flex",
      (s, d) => {
        val mh = multiWarehouseFor(s, d)
        graft.store.MultiWarehouse.retrieveFlex(mh, Bu, Eu, 12 * I1u, smooth = true)
          .select(col("metric"), col("interval"), col("time"),
            col("minimum"), col("maximum"),
            col("sum").cast("long").as("sum_cents"), col("count").as("cnt"),
            col("integral").cast("long").as("integral_cu"), col("active_time"))
          .orderBy("metric", "time")
      },
      Some {
        // routed+smoothed recompute per config group (q28's pattern, at each
        // group's own interval and positional factor)
        def part(interval: Long, factor: Long, metricFilter: String) =
          s"""(WITH ${levelCteAt(interval)},
             |lb AS (SELECT metric, max(time) AS t FROM lv WHERE time <= $Bu GROUP BY 1),
             |sc AS (SELECT l.* FROM lv l
             |       LEFT JOIN lb ON l.metric = lb.metric
             |       WHERE (l.time > $Bu OR l.time = lb.t) AND l.time < $Eu
             |         AND $metricFilter),
             |rn AS (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time) - 1 AS r
             |       FROM sc)
             |SELECT metric, CAST($interval AS BIGINT) AS interval, min(time) AS time,
             |  min(minimum) AS minimum, max(maximum) AS maximum,
             |  CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(cnt) AS BIGINT) AS cnt,
             |  CAST(sum(integral_cu) AS BIGINT) AS integral_cu,
             |  CAST(sum(active_time) AS BIGINT) AS active_time
             |FROM rn GROUP BY metric, r // $factor)""".stripMargin
        s"""SELECT * FROM ${part(10 * I1u, 1, "l.metric = 'click'")}
           |UNION ALL
           |SELECT * FROM ${part(6 * I1u, 2, "l.metric <> 'click'")}
           |ORDER BY 1, 3""".stripMargin
      }),

    // ---- container-metadata probe over five formats (png/wav/gif/mp4/
    //      webm): Spark parses REAL container structure from the bytes
    //      (meta arrives NULL); the oracle recomputes every field closed-
    //      form from media_id, q36-style. Codec payloads stay stubbed ----
    Entry("q60_probe_meta",
      (s, _) => Multimodal.probeMeta(Multimodal.syntheticContainers(s, 300))
        .select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.n_frames").as("n_frames"), col("meta.mime").as("mime"))
        .orderBy("media_id"),
      Some("""WITH m AS (SELECT media_id, media_id % 5 AS k,
             |  CAST((media_id % 7 + 2) * 2 AS INTEGER) AS w,
             |  CAST((media_id % 5 + 1) * 2 AS INTEGER) AS h
             |  FROM range(0, 300) t(media_id))
             |SELECT media_id,
             |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |  CASE WHEN k IN (0, 2, 3, 4) THEN w END AS width,
             |  CASE WHEN k IN (0, 2, 3, 4) THEN h END AS height,
             |  CASE WHEN k = 1 THEN CAST(8000 * (1 + media_id % 3) AS INTEGER) END AS sample_rate,
             |  CASE WHEN k = 1 THEN CAST(media_id % 100 + 50 AS INTEGER)
             |       WHEN k = 2 THEN CAST(media_id % 6 + 2 AS INTEGER)
             |       WHEN k = 3 THEN CAST(media_id % 90 + 10 AS INTEGER) END AS n_frames,
             |  CASE k WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
             |         WHEN 2 THEN 'image/gif' WHEN 3 THEN 'video/mp4'
             |         ELSE 'video/webm' END AS mime
             |FROM m ORDER BY media_id""".stripMargin)),

    // ---- curation-partitioned layout probe: lang=/len_bin= partition
    //      pruning answers the "English, longest quartile" read from
    //      two partitions — the q43 index discipline for curation ----
    Entry("q153_curation_layout",
      (s, d) => Curate.openCurationLayout(s, curationLayoutFor(s, d))
        .where(col("lang") === "en" && col("len_bin") === 3)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"))
        .orderBy("source"),
      Some("""WITH h AS (SELECT n_chars AS v, count(*) AS c
             |           FROM documents GROUP BY 1),
             |cw AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
             |              sum(c) OVER () AS n
             |       FROM h),
             |b AS (SELECT j, min(v) AS bv
             |      FROM cw, range(1, 4) t(j)
             |      WHERE cum * 4 >= n * j GROUP BY 1),
             |bins AS (SELECT d.doc_id, d.source, d.lang, d.n_chars,
             |           sum(CASE WHEN d.n_chars > b.bv THEN 1 ELSE 0 END)
             |             AS len_bin
             |         FROM documents d CROSS JOIN b GROUP BY 1, 2, 3, 4)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM bins WHERE lang = 'en' AND len_bin = 3
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- retention round-trip: dump() of a store retired at an
    //      aligned horizon — raw retention is whole-partition deletion;
    //      level-row preservation is pinned in RetentionSpec ----
    Entry("q154_retire_dump",
      (s, d) => graft.tools.Tools.dump(retiredFor(s, d))
        .orderBy("metric"),
      Some(s"""WITH $wptsCte
              |SELECT metric, CAST(count(*) AS BIGINT) AS n_rows,
              |  CAST(min(time) AS BIGINT) AS first_time,
              |  CAST(max(time) AS BIGINT) AS last_time
              |FROM wpts WHERE time >= $RetireHu
              |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
