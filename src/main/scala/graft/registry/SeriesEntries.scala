package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Shared._

/** Time-series monitoring tier over the events table: downsampling,
  * resampling, rates, robust outliers, alerting, trends, SLO burn. */
private[registry] object SeriesEntries {
  val entries: Seq[Entry] = Seq(

    // ---- time-series post-processing tier (hta/Series.scala): M4
    //      visualization downsampling, counter rate, grid resampling.
    //      All deterministic because time is unique per metric (O1) ----
    Entry("q67_m4_downsample",
      (s, d) => Series.m4Downsample(ev(s, d), B, E, w = 48)
        .orderBy("metric", "bucket"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, (time - $B) // ${(E - B + 47) / 48} AS bucket,
              |             time, value
              |      FROM pts WHERE time >= $B AND time < $E)
              |SELECT metric, bucket,
              |  min(time) AS t_first, arg_min(value, time) AS v_first,
              |  max(time) AS t_last, arg_max(value, time) AS v_last,
              |  min(value) AS v_min, max(value) AS v_max
              |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Entry("q68_counter_rate",
      (s, d) => Series.counterRate(ev(s, d), B, E)
        .select("metric", "increase_cents", "n_samples", "rate_cents_per_sec")
        .orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |d AS (SELECT metric, cents,
              |        lag(cents) OVER (PARTITION BY metric ORDER BY time) AS p
              |      FROM f),
              |a AS (SELECT metric,
              |        CAST(sum(CASE WHEN p IS NULL THEN 0
              |                 WHEN cents >= p THEN cents - p
              |                 ELSE cents END) AS BIGINT) AS increase_cents,
              |        CAST(count(*) AS BIGINT) AS n_samples
              |      FROM d GROUP BY 1)
              |SELECT metric, increase_cents, n_samples,
              |       increase_cents / ((${E} - ${B}) / 1e9) AS rate_cents_per_sec
              |FROM a ORDER BY metric""".stripMargin)),

    Entry("q69_resample",
      (s, d) => Series.resampleFfill(ev(s, d), B, E,
          step = 6L * 3600000000000L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT m.metric, t.range AS time
              |      FROM (SELECT DISTINCT metric FROM pts) m,
              |           range($B, $E, ${6L * 3600000000000L}) t)
              |SELECT g.metric, g.time, p.value
              |FROM g ASOF LEFT JOIN
              |  (SELECT metric, time, value FROM pts) p
              |  ON g.metric = p.metric AND p.time <= g.time
              |ORDER BY 1, 2""".stripMargin)),

    // ---- robust outliers: |cents - median| > 2.8 x MAD, all medians by
    //      histogram selection (percentile_disc), threshold an integer
    //      cross-multiply - exact on both engines ----
    Entry("q70_mad_outliers",
      (s, d) => Series.madOutliers(ev(s, d), B, E, kTenths = 28L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |h AS (SELECT metric, cents, count(*) AS c FROM f GROUP BY 1, 2),
              |w AS (SELECT metric, cents,
              |        sum(c) OVER (PARTITION BY metric ORDER BY cents) AS cum,
              |        sum(c) OVER (PARTITION BY metric) AS n FROM h),
              |med AS (SELECT metric, min(cents) AS med FROM w
              |        WHERE 2 * cum >= n GROUP BY 1),
              |dev AS (SELECT f.metric, f.time, f.cents,
              |          abs(f.cents - med.med) AS dev, med.med
              |        FROM f JOIN med USING (metric)),
              |h2 AS (SELECT metric, dev, count(*) AS c FROM dev GROUP BY 1, 2),
              |w2 AS (SELECT metric, dev,
              |         sum(c) OVER (PARTITION BY metric ORDER BY dev) AS cum,
              |         sum(c) OVER (PARTITION BY metric) AS n FROM h2),
              |mad AS (SELECT metric, min(dev) AS mad FROM w2
              |        WHERE 2 * cum >= n GROUP BY 1)
              |SELECT d.metric, d.time, d.cents, d.med, d.dev, mad.mad
              |FROM dev d JOIN mad USING (metric)
              |WHERE d.dev * 10 > mad.mad * 28
              |ORDER BY 1, 2""".stripMargin)),

    // ---- two-threshold alerting: ON at >= $150, OFF at <= $50, hold
    //      between; only state edges emitted ----
    Entry("q71_hysteresis",
      (s, d) => Series.hysteresisAlerts(ev(s, d), B, E,
          hiCents = 15000L, loCents = 5000L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |d AS (SELECT metric, time, cents,
              |        CASE WHEN cents >= 15000 THEN 1
              |             WHEN cents <= 5000 THEN 0 END AS dec
              |      FROM f),
              |s AS (SELECT metric, time, cents,
              |        coalesce(last_value(dec IGNORE NULLS) OVER (
              |          PARTITION BY metric ORDER BY time
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |          0) AS alert
              |      FROM d),
              |t AS (SELECT *, coalesce(lag(alert) OVER (
              |          PARTITION BY metric ORDER BY time), 0) AS prev
              |      FROM s)
              |SELECT metric, time, cents, CAST(alert AS BIGINT) AS alert
              |FROM t WHERE alert != prev ORDER BY 1, 2""".stripMargin)),

    // ---- CUSUM drift alarms: the sequential fold has a window closed
    //      form (running sum minus clamped running min), exact integers ----
    Entry("q72_cusum",
      (s, d) => Series.cusum(ev(s, d), B, E,
          driftCents = 6000L, thresholdCents = 15000L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |p AS (SELECT metric, time, cents,
              |        sum(cents - 6000) OVER (PARTITION BY metric ORDER BY time
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
              |      FROM f),
              |m AS (SELECT *, least(min(pp) OVER (PARTITION BY metric ORDER BY time
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS mn
              |      FROM p)
              |SELECT metric, time, cents, CAST(pp - mn AS BIGINT) AS cusum
              |FROM m WHERE pp - mn > 15000 ORDER BY 1, 2""".stripMargin)),

    // ---- interval (overlap) join: every sample inside an alert episode.
    //      Episodes come from q71's hysteresis edges (ON edge paired with
    //      its OFF, open episodes closing at E); the join itself is the
    //      TILED equi-join (Queries.intervalJoin) — never a nested loop.
    //      DuckDB's native range join computes the same relation ----
    Entry("q74_interval_join",
      (s, d) => {
        val points = ev(s, d).where(col("time") >= B && col("time") < E)
          .select("metric", "time", "cents")
        val eps = Series.alertEpisodes(
          Series.hysteresisAlerts(ev(s, d), B, E, hiCents = 15000L,
            loCents = 5000L), horizon = E)
        Queries.intervalJoin(points, eps, Seq("metric"), chunk = I2)
          .orderBy("metric", "time", "i_start")
      },
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |d AS (SELECT metric, time, cents,
              |        CASE WHEN cents >= 15000 THEN 1
              |             WHEN cents <= 5000 THEN 0 END AS dec
              |      FROM f),
              |s AS (SELECT metric, time, cents,
              |        coalesce(last_value(dec IGNORE NULLS) OVER (
              |          PARTITION BY metric ORDER BY time
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |          0) AS alert
              |      FROM d),
              |t AS (SELECT *, coalesce(lag(alert) OVER (
              |          PARTITION BY metric ORDER BY time), 0) AS prev
              |      FROM s),
              |edges AS (SELECT metric, time, alert FROM t WHERE alert != prev),
              |eps AS (SELECT metric, time AS i_start,
              |          coalesce(lead(time) OVER (PARTITION BY metric
              |            ORDER BY time), $E) AS i_end, alert
              |        FROM edges),
              |sel AS (SELECT metric, i_start, i_end FROM eps WHERE alert = 1)
              |SELECT f.metric, f.time, f.cents, e.i_start, e.i_end
              |FROM f JOIN sel e ON f.metric = e.metric
              |  AND f.time >= e.i_start AND f.time < e.i_end
              |ORDER BY 1, 2, 4""".stripMargin)),

    // ---- trailing-window aggregates at every sample (PromQL
    //      *_over_time): RANGE frame (t-12h, t], exact integer cents;
    //      DuckDB's HUGEINT window sum cast at the output (q42 lesson) ----
    Entry("q75_rolling",
      (s, d) => Series.rollingAgg(ev(s, d), B, E, window = 12L * I1)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E)
              |SELECT metric, time, cents,
              |  CAST(sum(cents) OVER w AS BIGINT) AS roll_sum,
              |  CAST(count(*) OVER w AS BIGINT) AS roll_cnt,
              |  min(cents) OVER w AS roll_min,
              |  max(cents) OVER w AS roll_max
              |FROM f
              |WINDOW w AS (PARTITION BY metric ORDER BY time
              |  RANGE BETWEEN ${12L * I1 - 1} PRECEDING AND CURRENT ROW)
              |ORDER BY 1, 2""".stripMargin)),

    // ---- linear-interpolation resampling: both carry directions ride one
    //      union-and-carry exchange; the lerp is three IEEE ops over exact
    //      integers, mirrored verbatim in the SQL ----
    Entry("q76_resample_lerp",
      (s, d) => Series.resampleLerp(ev(s, d), B, E,
          step = 6L * 3600000000000L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT m.metric, t.range AS time
              |      FROM (SELECT DISTINCT metric FROM pts) m,
              |           range($B, $E, ${6L * 3600000000000L}) t),
              |u AS (SELECT metric, time, NULL::BIGINT AS cents, 1 AS side FROM g
              |      UNION ALL
              |      SELECT metric, time, cents, 0 AS side FROM pts),
              |w AS (SELECT metric, time, side,
              |        last_value(CASE WHEN side = 0 THEN time END IGNORE NULLS)
              |          OVER wp AS pt,
              |        last_value(CASE WHEN side = 0 THEN cents END IGNORE NULLS)
              |          OVER wp AS pc,
              |        first_value(CASE WHEN side = 0 THEN time END IGNORE NULLS)
              |          OVER wn AS nt,
              |        first_value(CASE WHEN side = 0 THEN cents END IGNORE NULLS)
              |          OVER wn AS nc
              |      FROM u
              |      WINDOW wp AS (PARTITION BY metric ORDER BY time, side
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |        wn AS (PARTITION BY metric ORDER BY time, side
              |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              |SELECT metric, time,
              |  CASE WHEN pt IS NULL THEN NULL
              |       WHEN nt IS NULL THEN CAST(pc AS DOUBLE)
              |       ELSE CAST(pc AS DOUBLE) + CAST(nc - pc AS DOUBLE) *
              |         (CAST(time - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
              |  END AS value
              |FROM w WHERE side = 1 ORDER BY 1, 2""".stripMargin)),

    // ---- time-of-day seasonal profile: per (metric, UTC hour-of-day)
    //      exact integer stats + one IEEE mean division. Hour index is
    //      pure int64 arithmetic on the ns grid — no calendar lib ----
    Entry("q82_hour_profile",
      (s, d) => Series.hourOfDayProfile(ev(s, d), B, E)
        .orderBy("metric", "hour"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, (time // 3600000000000) % 24 AS hour,
              |        cents FROM pts WHERE time >= $B AND time < $E)
              |SELECT metric, hour, count(*) AS n,
              |  min(cents) AS min_cents, max(cents) AS max_cents,
              |  CAST(sum(cents) AS BIGINT) AS sum_cents,
              |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
              |    / CAST(count(*) AS DOUBLE) AS mean
              |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- equi-width value histogram (sparse): (metric, cents div w)
    //      counts — one partial-agg shuffle, wire carries histogram rows
    //      only. w = 2500 cents ≈ 20 buckets over this data's range ----
    Entry("q83_value_histogram",
      (s, d) => Series.valueHistogram(ev(s, d), B, E, widthCents = 2500L)
        .orderBy("metric", "bucket"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, cents // 2500 AS bucket FROM pts
              |      WHERE time >= $B AND time < $E)
              |SELECT metric, bucket, bucket * 2500 AS lo_cents,
              |  count(*) AS n
              |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Gorilla-cost storage analytics: delta-of-delta timestamp +
    //      zigzag-varint value-delta bit accounting per metric, vs the
    //      reference's 16 B/point raw record (BASELINE.md row 2). All
    //      integers; lag windows ORDER BY the unique ns time (the
    //      second-grid tu ties — click has sub-second gaps) ----
    Entry("q84_encoding_cost",
      (s, d) => Series.deltaEncodingStats(ev(s, d)).orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |q AS (SELECT metric, time, cents, time // 1000000000 AS tu
              |      FROM pts),
              |d1 AS (SELECT metric, time, cents, tu,
              |         tu - lag(tu) OVER w AS dt,
              |         cents - lag(cents) OVER w AS dc
              |       FROM q WINDOW w AS (PARTITION BY metric ORDER BY time)),
              |d2 AS (SELECT *, dt - lag(dt) OVER
              |         (PARTITION BY metric ORDER BY time) AS dod
              |       FROM d1),
              |b AS (SELECT metric, dod,
              |        CASE WHEN dt IS NULL THEN 64 WHEN dod IS NULL THEN 36
              |             WHEN dod = 0 THEN 1
              |             WHEN dod BETWEEN -63 AND 64 THEN 9
              |             WHEN dod BETWEEN -255 AND 256 THEN 12
              |             WHEN dod BETWEEN -2047 AND 2048 THEN 16
              |             ELSE 36 END AS ts_bits,
              |        CASE WHEN dc IS NULL THEN 8
              |             WHEN dc BETWEEN -64 AND 63 THEN 1
              |             WHEN dc BETWEEN -8192 AND 8191 THEN 2
              |             WHEN dc BETWEEN -1048576 AND 1048575 THEN 3
              |             ELSE 5 END AS val_bytes
              |      FROM d2)
              |SELECT metric, count(*) AS n,
              |  CAST(sum(CASE WHEN dod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod0,
              |  CAST(sum(CASE WHEN dod IS NOT NULL AND dod != 0
              |    AND dod BETWEEN -63 AND 64 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod9,
              |  CAST(sum(CASE WHEN dod IS NOT NULL
              |    AND dod NOT BETWEEN -63 AND 64
              |    AND dod BETWEEN -255 AND 256 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod12,
              |  CAST(sum(CASE WHEN dod IS NOT NULL
              |    AND dod NOT BETWEEN -255 AND 256
              |    AND dod BETWEEN -2047 AND 2048 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod16,
              |  CAST(sum(CASE WHEN dod IS NOT NULL
              |    AND dod NOT BETWEEN -2047 AND 2048 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod36,
              |  CAST(sum(ts_bits) AS BIGINT) AS ts_bits,
              |  CAST(sum(val_bytes) AS BIGINT) AS val_bytes,
              |  CAST((sum(ts_bits) + sum(val_bytes) * 8 + 7) // 8 AS BIGINT) AS enc_bytes,
              |  count(*) * 16 AS raw_bytes,
              |  CAST(CAST((sum(ts_bits) + sum(val_bytes) * 8 + 7) // 8 AS BIGINT) AS DOUBLE)
              |    / CAST(count(*) * 16 AS DOUBLE) AS ratio
              |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- cross-correlation at bucket lags: 6h-bucket sums per metric,
    //      un-centered cosine over the pairwise overlap for lag -3..3.
    //      Integer sums + two sqrts and a divide in fixed order ----
    Entry("q88_cross_corr",
      (s, d) => Series.crossCorrelation(ev(s, d), B, E,
          step = 6L * 3600000000000L, maxLag = 3)
        .orderBy("metric_a", "metric_b", "lag"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT metric, (time - $B) // ${6L * 3600000000000L} AS bucket,
              |        CAST(sum(cents) AS BIGINT) AS s
              |      FROM pts WHERE time >= $B AND time < $E GROUP BY 1, 2),
              |x AS (SELECT g.metric AS metric_a, g.s AS xa, l.lag,
              |        g.bucket + l.lag AS jb
              |      FROM g, (SELECT unnest(range(-3, 4)) AS lag) l),
              |y AS (SELECT metric AS metric_b, bucket AS jb, s AS xb FROM g)
              |SELECT metric_a, metric_b, lag, count(*) AS n_overlap,
              |  CAST(sum(xa*xb) AS BIGINT) AS num,
              |  CAST(sum(xa*xa) AS BIGINT) AS sx2,
              |  CAST(sum(xb*xb) AS BIGINT) AS sy2,
              |  CAST(CAST(sum(xa*xb) AS BIGINT) AS DOUBLE) /
              |    (sqrt(CAST(CAST(sum(xa*xa) AS BIGINT) AS DOUBLE)) *
              |     sqrt(CAST(CAST(sum(xb*xb) AS BIGINT) AS DOUBLE))) AS corr
              |FROM x JOIN y USING (jb)
              |WHERE metric_a < metric_b
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---- first-order user-journey transition matrix with fixed-point
    //      row probabilities: one user-keyed lead window, then
    //      matrix-sized aggregates. Tiebreak on event_id keeps the lead
    //      deterministic under any vintage ----
    Entry("q90_transitions",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("event_type").as("metric"),
          Tables.tsNs(raw).as("time"), col("user_id"), col("event_id"))
        graft.pipeline.Sessionize.transitions(f)
          .orderBy("from_type", "to_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
             |              epoch_us(ts)*1000 AS t FROM events),
             |l AS (SELECT user_id, event_type,
             |        lead(event_type) OVER (PARTITION BY user_id
             |          ORDER BY t, event_id) AS nxt
             |      FROM ev),
             |c AS (SELECT event_type AS from_type, nxt AS to_type,
             |        count(*) AS n
             |      FROM l WHERE nxt IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_n
             |        FROM c GROUP BY 1)
             |SELECT c.from_type, c.to_type, c.n, t.from_n,
             |  CAST(c.n * 1000000 // t.from_n AS BIGINT) AS p_e6
             |FROM c JOIN tot t USING (from_type)
             |ORDER BY 1, 2""".stripMargin)),

    // ---- sliding 7-day distinct users per metric-day from MERGED daily
    //      HLL sketches: the corpus is read once into daily registers;
    //      the slide is max() over register rows only. Same exact-integer
    //      estimator as q77, so the whole window pipeline hash-matches ----
    Entry("q91_sliding_hll",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("event_type").as("metric"),
          Tables.tsNs(raw).as("time"), col("user_id"))
        Sketches.approxDistinctSliding(f, Seq("metric"), "user_id", "time",
            windowDays = 7, p = hllP)
          .orderBy("metric", "day")
      },
      Some(s"""WITH ev AS (SELECT event_type AS metric,
              |              epoch_us(ts)*1000 AS t,
              |              CAST(user_id AS VARCHAR) AS v
              |            FROM events WHERE user_id IS NOT NULL),
              |h AS (SELECT metric, t // 86400000000000 AS day,
              |        CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h
              |      FROM ev),
              |r AS (SELECT metric, day, h // $hllWMod AS j, h % $hllWMod AS w
              |      FROM h),
              |rk AS (SELECT metric, day, j,
              |         CASE WHEN w = 0 THEN $hllMaxRank
              |              ELSE $hllMaxRank - length(printf('%b', w)) END AS rank
              |       FROM r),
              |regs AS (SELECT metric, day AS rday, j, max(rank) AS mj
              |         FROM rk GROUP BY 1, 2, 3),
              |grid AS (SELECT DISTINCT metric, day FROM h),
              |mrg AS (SELECT g.metric, g.day, rg.j, max(rg.mj) AS mj
              |        FROM grid g JOIN regs rg ON rg.metric = g.metric
              |          AND rg.rday > g.day - 7 AND rg.rday <= g.day
              |        GROUP BY 1, 2, 3),
              |z AS (SELECT metric, day,
              |        CAST(sum(1::BIGINT << ($hllMaxRank - mj))
              |          + ($hllM - count(*)) * ${1L << hllMaxRank} AS BIGINT) AS zi,
              |        CAST($hllM - count(*) AS BIGINT) AS zero_regs
              |      FROM mrg GROUP BY 1, 2)
              |SELECT metric, day, zi, zero_regs,
              |  CAST('$hllAlpha' AS DOUBLE) *
              |    (CAST('$hllScale' AS DOUBLE) / CAST(zi AS DOUBLE)) AS est_raw
              |FROM z ORDER BY 1, 2""".stripMargin)),

    // ---- equal-frequency discretization: n_chars into 8 quantile
    //      buckets under q54's integer selection rule; boundaries baked
    //      as plan literals (q42 discipline) so assignment is narrow ----
    Entry("q100_quantile_bins",
      (s, d) => graft.pipeline.Profile.quantileBins(
          docs(s, d).select(col("doc_id"), col("n_chars")),
          "n_chars", k = 8)
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT n_chars AS v, count(*) AS c
             |           FROM documents GROUP BY 1),
             |cw AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
             |              sum(c) OVER () AS n
             |       FROM h),
             |b AS (SELECT j, min(v) AS bv
             |      FROM cw, range(1, 8) t(j)
             |      WHERE cum * 8 >= n * j GROUP BY 1)
             |SELECT d.doc_id, d.n_chars,
             |  CAST(sum(CASE WHEN d.n_chars > b.bv THEN 1 ELSE 0 END) AS BIGINT)
             |    AS bin
             |FROM documents d CROSS JOIN b
             |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin)),

    // ---- per-group outliers by EXACT order statistics: events whose
    //      value exceeds their type's p95, threshold = q54's integer
    //      selection rule over the per-type value histogram — no float
    //      aggregation, histogram-sized exchanges only ----
    Entry("q121_value_outliers",
      (s, d) => {
        val base = s.read.parquet(s"$d/events.parquet")
          .select(col("event_id"), col("event_type"), col("value"))
        Profile.orderStatOutliers(base, Seq("event_type"), "value",
            pNum = 19, pDen = 20)
          .select("event_id", "event_type", "value", "thr")
          .orderBy("event_id")
      },
      Some("""WITH h AS (SELECT event_type, value AS v, count(*) AS c
             |           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
             |cum AS (SELECT event_type, v,
             |          sum(c) OVER (PARTITION BY event_type ORDER BY v
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |          sum(c) OVER (PARTITION BY event_type) AS n
             |        FROM h),
             |thr AS (SELECT event_type, min(v) AS thr FROM cum
             |        WHERE cum * 20 >= n * 19 GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value, t.thr
             |FROM events e JOIN thr t USING (event_type)
             |WHERE e.value > t.thr ORDER BY e.event_id""".stripMargin)),

    // ---- per-metric OLS trend: exact rational slope on an hourly grid,
    //      midpoint-centered x, one metric-keyed partial-agg shuffle ----
    {
      val step = 3600000000000L // 1 h grid
      val mid = ((E - B) / step) / 2
      Entry("q130_linear_trend",
        (s, d) => Series.linearTrend(ev(s, d), B, E, step).orderBy("metric"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT metric, ((time - $B) // ${step}) - $mid AS x, cents
                |      FROM pts WHERE time >= $B AND time < $E),
                |a AS (SELECT metric, CAST(count(*) AS BIGINT) AS n,
                |        CAST(sum(x) AS BIGINT) AS sum_x,
                |        CAST(sum(cents) AS BIGINT) AS sum_y,
                |        CAST(sum(x * cents) AS BIGINT) AS sxy,
                |        CAST(sum(x * x) AS BIGINT) AS sxx
                |      FROM f GROUP BY 1)
                |SELECT metric, n, sum_x, sum_y,
                |  CAST(n * sxy - sum_x * sum_y AS BIGINT) AS sxy_num,
                |  CAST(n * sxx - sum_x * sum_x AS BIGINT) AS sxx_num,
                |  CASE WHEN n * sxx - sum_x * sum_x = 0 THEN NULL
                |       ELSE CAST(n * sxy - sum_x * sum_y AS DOUBLE)
                |            / (n * sxx - sum_x * sum_x) END
                |    AS slope_cents_per_step
                |FROM a ORDER BY metric""".stripMargin))
    },

    // ---- per-metric autocorrelation at bucket lags: the seasonality
    //      probe — grid-sized self-join, exact integer sums, three
    //      fixed-order IEEE ops ----
    Entry("q133_autocorr",
      (s, d) => Series.autoCorrelation(ev(s, d), B, E,
          step = 6L * 3600000000000L, maxLag = 8)
        .orderBy("metric", "lag"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT metric, (time - $B) // ${6L * 3600000000000L} AS bucket,
              |        CAST(sum(cents) AS BIGINT) AS s
              |      FROM pts WHERE time >= $B AND time < $E GROUP BY 1, 2),
              |x AS (SELECT g.metric, g.s AS xa, l.lag, g.bucket + l.lag AS jb
              |      FROM g, (SELECT unnest(range(0, 9)) AS lag) l)
              |SELECT x.metric, lag, count(*) AS n_overlap,
              |  CAST(sum(xa * y.s) AS BIGINT) AS num,
              |  CAST(sum(xa * xa) AS BIGINT) AS sx2,
              |  CAST(sum(y.s * y.s) AS BIGINT) AS sy2,
              |  CAST(CAST(sum(xa * y.s) AS BIGINT) AS DOUBLE) /
              |    (sqrt(CAST(CAST(sum(xa * xa) AS BIGINT) AS DOUBLE)) *
              |     sqrt(CAST(CAST(sum(y.s * y.s) AS BIGINT) AS DOUBLE))) AS corr
              |FROM x JOIN g y ON y.metric = x.metric AND y.bucket = x.jb
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- seasonality-adjusted outliers: hour-of-day floor-mean
    //      baseline (broadcast back), residual percentile threshold per
    //      metric — the 3am-is-not-noon alert fix ----
    Entry("q138_seasonal_outliers",
      (s, d) => Series.seasonalOutliers(ev(s, d)
            .select("metric", "time", "cents"), B, E, pNum = 39, pDen = 40)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents,
              |        (time // 3600000000000) % 24 AS hour
              |      FROM pts WHERE time >= $B AND time < $E),
              |p AS (SELECT metric, hour, CAST(sum(cents) AS BIGINT) AS s,
              |        count(*) AS n
              |      FROM f GROUP BY 1, 2),
              |pb AS (SELECT metric, hour,
              |         CAST((s - (((s % n) + n) % n)) // n AS BIGINT) AS baseline
              |       FROM p),
              |rs AS (SELECT f.metric, f.time, f.cents, f.hour, pb.baseline,
              |         abs(f.cents - pb.baseline) AS resid
              |       FROM f JOIN pb USING (metric, hour)),
              |h AS (SELECT metric, resid, count(*) AS c FROM rs GROUP BY 1, 2),
              |t AS (SELECT metric, CAST(min(resid) AS BIGINT) AS thr FROM (
              |        SELECT metric, resid,
              |          sum(c) OVER (PARTITION BY metric ORDER BY resid) AS cum,
              |          sum(c) OVER (PARTITION BY metric) AS n
              |        FROM h) WHERE cum * 40 >= n * 39 GROUP BY 1)
              |SELECT rs.metric, rs.time, rs.cents,
              |  CAST(rs.hour AS BIGINT) AS hour, rs.baseline,
              |  CAST(rs.resid AS BIGINT) AS resid, t.thr
              |FROM rs JOIN t USING (metric)
              |WHERE rs.resid > t.thr ORDER BY 1, 2""".stripMargin)),

    // ---- inter-arrival log2 histogram: scrape-regularity / burst
    //      read — one metric window exchange, ~60-row output per
    //      metric, exact bit-length buckets ----
    Entry("q141_interarrival_hist",
      (s, d) => Series.interArrivalHist(ev(s, d), B, E)
        .orderBy("metric", "bucket"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time FROM pts
              |      WHERE time >= $B AND time < $E),
              |g AS (SELECT metric,
              |        time - lag(time) OVER (PARTITION BY metric
              |                               ORDER BY time) AS gap
              |      FROM f)
              |SELECT metric,
              |  CAST(length(printf('%b', gap)) AS BIGINT) AS bucket,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(min(gap) AS BIGINT) AS min_gap,
              |  CAST(max(gap) AS BIGINT) AS max_gap
              |FROM g WHERE gap IS NOT NULL
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- robust (median-based) trend: OLS over per-bucket exact
    //      medians — spike-resistant slope, grid-sized second stage ----
    {
      val step = 3600000000000L
      val mid = ((E - B) / step) / 2
      Entry("q145_robust_trend",
        (s, d) => Series.robustTrend(ev(s, d), B, E, step)
          .orderBy("metric"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT metric, (time - $B) // ${step} AS bucket, cents
                |      FROM pts WHERE time >= $B AND time < $E),
                |h AS (SELECT metric, bucket, cents, count(*) AS c
                |      FROM f GROUP BY 1, 2, 3),
                |m AS (SELECT metric, bucket, CAST(min(cents) AS BIGINT) AS med
                |      FROM (SELECT metric, bucket, cents,
                |              sum(c) OVER (PARTITION BY metric, bucket
                |                           ORDER BY cents) AS cum,
                |              sum(c) OVER (PARTITION BY metric, bucket) AS n
                |            FROM h)
                |      WHERE cum * 2 >= n GROUP BY 1, 2),
                |x AS (SELECT metric, bucket - $mid AS x, med FROM m),
                |a AS (SELECT metric, CAST(count(*) AS BIGINT) AS nb,
                |        CAST(sum(x) AS BIGINT) AS sx,
                |        CAST(sum(med) AS BIGINT) AS sy,
                |        CAST(sum(x * med) AS BIGINT) AS sxy,
                |        CAST(sum(x * x) AS BIGINT) AS sxx
                |      FROM x GROUP BY 1)
                |SELECT metric, nb AS n_buckets,
                |  CAST(nb * sxy - sx * sy AS BIGINT) AS sxy_num,
                |  CAST(nb * sxx - sx * sx AS BIGINT) AS sxx_num,
                |  CASE WHEN nb * sxx - sx * sx = 0 THEN NULL
                |       ELSE CAST(nb * sxy - sx * sy AS DOUBLE)
                |            / (nb * sxx - sx * sx) END AS slope_cents_per_step
                |FROM a ORDER BY metric""".stripMargin))
    },

    // ---- seasonal gap imputation: hourly grid of exact bucket
    //      medians, empty buckets filled from the hour-of-day median —
    //      shape-preserving repair, imputed rows flagged ----
    {
      val step = 3600000000000L
      val nSteps = (E - B + step - 1) / step
      Entry("q147_seasonal_impute",
        (s, d) => Series.seasonalImpute(ev(s, d), B, E, step)
          .orderBy("metric", "time"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT metric, (time - $B) // ${step} AS bucket,
                |        (time // 3600000000000) % 24 AS hour, cents
                |      FROM pts WHERE time >= $B AND time < $E),
                |h AS (SELECT metric, bucket, cents, count(*) AS c
                |      FROM f GROUP BY 1, 2, 3),
                |bm AS (SELECT metric, bucket, CAST(min(cents) AS BIGINT) AS bmed
                |       FROM (SELECT metric, bucket, cents,
                |               sum(c) OVER (PARTITION BY metric, bucket
                |                            ORDER BY cents) AS cum,
                |               sum(c) OVER (PARTITION BY metric, bucket) AS n
                |             FROM h)
                |       WHERE cum * 2 >= n GROUP BY 1, 2),
                |hh AS (SELECT metric, hour, cents, count(*) AS c
                |       FROM f GROUP BY 1, 2, 3),
                |hm AS (SELECT metric, hour, CAST(min(cents) AS BIGINT) AS hmed
                |       FROM (SELECT metric, hour, cents,
                |               sum(c) OVER (PARTITION BY metric, hour
                |                            ORDER BY cents) AS cum,
                |               sum(c) OVER (PARTITION BY metric, hour) AS n
                |             FROM hh)
                |       WHERE cum * 2 >= n GROUP BY 1, 2),
                |g AS (SELECT m.metric, b.bucket,
                |        $B + b.bucket * ${step} AS time
                |      FROM (SELECT DISTINCT metric FROM pts) m,
                |           (SELECT unnest(range(0, $nSteps)) AS bucket) b)
                |SELECT g.metric, g.time,
                |  coalesce(bm.bmed, hm.hmed) AS value_cents,
                |  (bm.bmed IS NULL AND hm.hmed IS NOT NULL) AS imputed
                |FROM g
                |LEFT JOIN bm ON bm.metric = g.metric AND bm.bucket = g.bucket
                |LEFT JOIN hm ON hm.metric = g.metric
                |  AND hm.hour = (g.time // 3600000000000) % 24
                |ORDER BY 1, 2""".stripMargin))
    },

    // ---- multi-window SLO burn: complete hourly grid, trailing 1h/6h
    //      error shares over GRID rows, page = both windows burning ----
    {
      val hourNs = 3600000000000L
      val nSteps = (E - B + hourNs - 1) / hourNs
      Entry("q148_slo_burn",
        (s, d) => Series.sloBurn(ev(s, d), B, E, errType = "error",
            budgetDen = 4L)
          .orderBy("bucket"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT (time - $B) // ${hourNs} AS bucket,
                |        count(*) AS t,
                |        sum(CASE WHEN metric = 'error' THEN 1 ELSE 0 END) AS e
                |      FROM pts WHERE time >= $B AND time < $E GROUP BY 1),
                |g AS (SELECT unnest(range(0, $nSteps)) AS bucket),
                |j AS (SELECT g.bucket, coalesce(f.t, 0) AS n_tot,
                |        coalesce(f.e, 0) AS n_err
                |      FROM g LEFT JOIN f USING (bucket)),
                |win AS (SELECT bucket, n_tot, n_err,
                |          sum(n_tot) OVER (ORDER BY bucket
                |            ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_tot_6h,
                |          sum(n_err) OVER (ORDER BY bucket
                |            ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_err_6h
                |        FROM j)
                |SELECT CAST(bucket AS BIGINT) AS bucket,
                |  CAST($B + bucket * ${hourNs} AS BIGINT) AS time,
                |  CAST(n_tot AS BIGINT) AS n_tot, CAST(n_err AS BIGINT) AS n_err,
                |  CAST(CASE WHEN n_tot = 0 THEN NULL
                |       ELSE (n_err * 1000000 * 4) // n_tot END AS BIGINT)
                |    AS burn1_e6,
                |  CAST(n_tot_6h AS BIGINT) AS n_tot_6h,
                |  CAST(n_err_6h AS BIGINT) AS n_err_6h,
                |  CAST(CASE WHEN n_tot_6h = 0 THEN NULL
                |       ELSE (n_err_6h * 1000000 * 4) // n_tot_6h END AS BIGINT)
                |    AS burn6_e6,
                |  CASE WHEN n_tot = 0 OR n_tot_6h = 0 THEN false
                |       ELSE (n_err * 1000000 * 4) // n_tot > 1000000
                |        AND (n_err_6h * 1000000 * 4) // n_tot_6h > 1000000
                |  END AS page
                |FROM win ORDER BY bucket""".stripMargin))
    },

    // ---- heartbeat availability: gap-based outages, uptime ratio in
    //      e6 over the observed span ----
    Entry("q149_uptime",
      (s, d) => Series.uptimeReport(ev(s, d), B, E,
          maxGap = 30L * 60L * 1000000000L)
        .orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time,
              |        time - lag(time) OVER (PARTITION BY metric
              |                               ORDER BY time) AS gap
              |      FROM pts WHERE time >= $B AND time < $E),
              |a AS (SELECT metric,
              |        CAST(max(time) - min(time) AS BIGINT) AS span_ns,
              |        CAST(sum(CASE WHEN gap > ${30L * 60L * 1000000000L}
              |                 THEN gap ELSE 0 END) AS BIGINT) AS downtime_ns,
              |        CAST(sum(CASE WHEN gap > ${30L * 60L * 1000000000L}
              |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outages,
              |        CAST(max(gap) AS BIGINT) AS max_gap_ns
              |      FROM f GROUP BY 1)
              |SELECT metric, span_ns, downtime_ns, n_outages, max_gap_ns,
              |  CAST(CASE WHEN span_ns // 1000000 = 0 THEN NULL
              |       ELSE (((span_ns - downtime_ns) // 1000000) * 1000000)
              |            // (span_ns // 1000000) END
              |       AS BIGINT) AS uptime_e6
              |FROM a ORDER BY metric""".stripMargin)),

    // ---- categorical mix drift: per-day L1 distance to the global
    //      event-type distribution, exact via the common-denominator
    //      rational — the data-drift monitor ----
    Entry("q150_mix_drift",
      (s, d) => Profile.mixDrift(ev(s, d).select("metric", "time"),
          "metric", "time")
        .orderBy("day"),
      Some(s"""WITH $ptsCte,
              |dt AS (SELECT time // 86400000000000 AS day, metric AS t,
              |         count(*) AS ndt
              |       FROM pts GROUP BY 1, 2),
              |dd AS (SELECT day, sum(ndt) AS nd FROM dt GROUP BY 1),
              |ty AS (SELECT t, sum(ndt) AS nt FROM dt GROUP BY 1),
              |nn AS (SELECT sum(ndt) AS n FROM dt),
              |g AS (SELECT dd.day, ty.t, dd.nd, ty.nt, nn.n,
              |        coalesce(dt.ndt, 0) AS c
              |      FROM dd CROSS JOIN ty CROSS JOIN nn
              |      LEFT JOIN dt ON dt.day = dd.day AND dt.t = ty.t),
              |dev AS (SELECT day, t, nd, n,
              |          abs(c * n - nt * nd) AS dev
              |        FROM g),
              |r AS (SELECT day, t, nd, n, dev,
              |        row_number() OVER (PARTITION BY day
              |          ORDER BY dev DESC, t DESC) AS rn
              |      FROM dev),
              |agg AS (SELECT day, CAST(min(nd) AS BIGINT) AS n_day,
              |          CAST((sum(dev) * 1000000) // (min(nd) * min(n))
              |               AS BIGINT) AS l1_e6
              |        FROM dev GROUP BY 1)
              |SELECT CAST(agg.day AS BIGINT) AS day, agg.n_day, agg.l1_e6,
              |  r.t AS top_type,
              |  CAST((r.dev * 1000000) // (r.nd * r.n) AS BIGINT)
              |    AS top_dev_e6
              |FROM agg JOIN r ON r.day = agg.day AND r.rn = 1
              |ORDER BY agg.day""".stripMargin)),

    // ---- Theil–Sen slope over bucket medians: exact lower median of
    //      e6-quantized pairwise slopes — grid² over MEDIANS only ----
    {
      val step = 3600000000000L
      Entry("q151_theilsen_trend",
        (s, d) => Series.theilSenTrend(ev(s, d), B, E, step)
          .orderBy("metric"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT metric, (time - $B) // ${step} AS bucket, cents
                |      FROM pts WHERE time >= $B AND time < $E),
                |h AS (SELECT metric, bucket, cents, count(*) AS c
                |      FROM f GROUP BY 1, 2, 3),
                |m AS (SELECT metric, bucket, CAST(min(cents) AS BIGINT) AS med
                |      FROM (SELECT metric, bucket, cents,
                |              sum(c) OVER (PARTITION BY metric, bucket
                |                           ORDER BY cents) AS cum,
                |              sum(c) OVER (PARTITION BY metric, bucket) AS n
                |            FROM h)
                |      WHERE cum * 2 >= n GROUP BY 1, 2),
                |p AS (SELECT a.metric,
                |        ((b.med - a.med) * 1000000
                |         - ((((b.med - a.med) * 1000000) % (b.bucket - a.bucket))
                |            + (b.bucket - a.bucket)) % (b.bucket - a.bucket))
                |        // (b.bucket - a.bucket) AS s
                |      FROM m a JOIN m b
                |        ON a.metric = b.metric AND a.bucket < b.bucket),
                |sel AS (SELECT metric, s, count(*) AS c FROM p GROUP BY 1, 2),
                |w AS (SELECT metric, s,
                |        sum(c) OVER (PARTITION BY metric ORDER BY s) AS cum,
                |        sum(c) OVER (PARTITION BY metric) AS n
                |      FROM sel),
                |sl AS (SELECT metric, CAST(min(s) AS BIGINT) AS slope_e6_per_step,
                |         CAST(min(n) AS BIGINT) AS n_pairs
                |       FROM w WHERE cum * 2 >= n GROUP BY 1),
                |nb AS (SELECT metric, CAST(count(*) AS BIGINT) AS n_buckets
                |       FROM m GROUP BY 1)
                |SELECT nb.metric, nb.n_buckets, sl.n_pairs,
                |  sl.slope_e6_per_step
                |FROM nb JOIN sl USING (metric) ORDER BY metric""".stripMargin))
    },

    // ---- lead-lag detection: per pair, the lag maximizing |corr| on
    //      q88's grid — the argmax reads the bit-reproducible IEEE
    //      corr, tie to the smaller lag ----
    Entry("q156_best_lag",
      (s, d) => Series.bestLag(ev(s, d), B, E,
          step = 6L * 3600000000000L, maxLag = 3)
        .orderBy("metric_a", "metric_b"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT metric, (time - $B) // ${6L * 3600000000000L} AS bucket,
              |        CAST(sum(cents) AS BIGINT) AS s
              |      FROM pts WHERE time >= $B AND time < $E GROUP BY 1, 2),
              |x AS (SELECT g.metric AS metric_a, g.s AS xa, l.lag,
              |        g.bucket + l.lag AS jb
              |      FROM g, (SELECT unnest(range(-3, 4)) AS lag) l),
              |y AS (SELECT metric AS metric_b, bucket AS jb, s AS xb FROM g),
              |cc AS (SELECT metric_a, metric_b, lag, count(*) AS n_overlap,
              |         CAST(CAST(sum(xa*xb) AS BIGINT) AS DOUBLE) /
              |           (sqrt(CAST(CAST(sum(xa*xa) AS BIGINT) AS DOUBLE)) *
              |            sqrt(CAST(CAST(sum(xb*xb) AS BIGINT) AS DOUBLE))) AS corr
              |       FROM x JOIN y USING (jb)
              |       WHERE metric_a < metric_b
              |       GROUP BY 1, 2, 3),
              |r AS (SELECT metric_a, metric_b, lag, n_overlap, corr,
              |        row_number() OVER (PARTITION BY metric_a, metric_b
              |          ORDER BY abs(corr) DESC, lag ASC) AS rn
              |      FROM cc WHERE n_overlap >= 2)
              |SELECT metric_a, metric_b, CAST(lag AS BIGINT) AS best_lag,
              |  n_overlap, corr
              |FROM r WHERE rn = 1 ORDER BY 1, 2""".stripMargin))
  )
}
