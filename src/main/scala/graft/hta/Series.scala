package graft.hta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series post-processing the reference's users reach for next:
  * visualization downsampling, counter rates, and grid resampling —
  * PromQL/M4-shaped operations re-expressed as Spark plans over the same
  * (metric, time ns, value) rows the HTA core serves.
  *
  * All three rely on the store's O1 invariant (time strictly monotonic per
  * metric, `Warehouse` rejects violations), which makes every arg-min/
  * arg-max and lag below DETERMINISTIC — no ties can exist on time.
  */
object Series {

  /** M4 visualization aggregation (Jugel et al., VLDB 2014): per metric
    * and per of `w` equal time buckets over [b, e), the four rows a
    * pixel-perfect line rendering needs — first/last (by time) and
    * min/max (by value). One partial-agg groupBy shuffle on
    * (metric, bucket); `min_by`/`max_by` are deterministic because time
    * is unique per metric (O1) and value ties break on the paired time.
    *
    * @return (metric, bucket, t_first, v_first, t_last, v_last, v_min,
    *         v_max) — bucket = (time − b) div width */
  def m4Downsample(points: DataFrame, b: Long, e: Long, w: Int): DataFrame = {
    require(e > b && w >= 1, s"need e > b and w >= 1, got [$b,$e) w=$w")
    // ceil width so w buckets always cover [b, e)
    val width = (e - b + w - 1) / w
    points.where(col("time") >= b && col("time") < e)
      .withColumn("bucket", expr(s"(time - ${b}L) div ${width}L"))
      .groupBy("metric", "bucket")
      .agg(
        min("time").as("t_first"),
        min_by(col("value"), col("time")).as("v_first"),
        max("time").as("t_last"),
        max_by(col("value"), col("time")).as("v_last"),
        min("value").as("v_min"),
        max("value").as("v_max"))
  }

  /** Time-of-day seasonal profile: per metric and hour-of-day (UTC),
    * exact integer min/max/sum/count of cents over [b, e) plus the mean
    * as one IEEE division of those integers — the daily-rhythm baseline a
    * monitoring user lays under live traffic (and the seasonal term
    * anomaly detectors subtract first). Hour index by pure int64
    * arithmetic on the ns timestamp (`time div 1h mod 24`), identical on
    * any engine — no calendar library in the loop.
    *
    * ONE partial-agg shuffle on (metric, hour): at most 24× metric-
    * cardinality rows cross the wire after map-side combine, whatever the
    * corpus size.
    *
    * @return (metric, hour, n, min_cents, max_cents, sum_cents, mean) */
  def hourOfDayProfile(points: DataFrame, b: Long, e: Long): DataFrame = {
    require(e > b, s"need e > b, got [$b,$e)")
    points.where(col("time") >= b && col("time") < e)
      .withColumn("hour", expr("(time div 3600000000000L) % 24"))
      .groupBy("metric", "hour")
      .agg(count(lit(1)).as("n"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        sum("cents").as("sum_cents"))
      .withColumn("mean",
        col("sum_cents").cast("double") / col("n").cast("double"))
  }

  /** Equi-width value histogram per metric over [b, e): bucket =
    * floor-div of cents by `widthCents`, count per bucket. Empty buckets
    * are absent (sparse form — the dense grid is a caller-side join
    * against a generated range; at 100 TB the sparse form is the only
    * one that doesn't materialize empties × metrics). Same single
    * partial-agg shuffle shape as [[hourOfDayProfile]]: the wire carries
    * (metric, bucket) partials, never points. Negative cents truncate
    * toward zero on BOTH engines (Spark `div` ≡ DuckDB integer `//`), so
    * bucket −1 straddles (−width, 0) ∪ (0, width) mirrored — callers
    * with signed values who want −∞-flooring should pre-shift.
    *
    * @return (metric, bucket, lo_cents, n) — lo_cents = bucket·width */
  def valueHistogram(points: DataFrame, b: Long, e: Long,
                     widthCents: Long): DataFrame = {
    require(e > b && widthCents >= 1,
      s"need e > b and widthCents >= 1, got [$b,$e) width=$widthCents")
    points.where(col("time") >= b && col("time") < e)
      .withColumn("bucket", expr(s"cents div ${widthCents}L"))
      .groupBy("metric", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_cents", col("bucket") * widthCents)
      .select("metric", "bucket", "lo_cents", "n")
  }

  /** Storage-cost analytics: what would this series cost under
    * Gorilla-style delta-of-delta timestamp + zigzag-varint value-delta
    * encoding, vs the reference's 16 B/point raw layout
    * (reference include/hta/types.hpp:43-49 — int64 ns + float64)?
    *
    * Timestamps are quantized to `unitNs` (Gorilla uses seconds), then
    * per metric in time order: dt_i = tu_i − tu_{i−1},
    * dod_i = dt_i − dt_{i−1}, billed at the paper's class sizes
    * (Pelkonen et al., VLDB 2015 §4.1.1): 0 → 1 bit, [−63,64] → 9,
    * [−255,256] → 12, [−2047,2048] → 16, else 36; the stream head costs
    * a 64-bit header and the first delta is billed at the 36-bit class
    * (the paper's 14-bit aligned first delta is block-size-specific).
    * Values are billed as zigzag varints of the integer cents delta:
    * [−64,63] → 1 byte, [−8192,8191] → 2, [−2^20,2^20−1] → 3, else 5;
    * the first value costs 8 raw bytes.
    *
    * Everything is exact integer arithmetic — the single double is the
    * final compression-ratio division. Shape: ONE metric-keyed window
    * exchange (two lags ride the same sort) and the per-metric rollup
    * reuses that exchange (subset key). The hot-metric caveat of
    * [[counterRate]] applies.
    *
    * @return per metric: n, class counts, total ts bits, total value
    *         bytes, encoded vs 16·n raw bytes, and the ratio */
  def deltaEncodingStats(points: DataFrame,
                         unitNs: Long = 1000000000L): DataFrame = {
    require(unitNs >= 1, s"unitNs must be >= 1, got $unitNs")
    val w = Window.partitionBy("metric").orderBy("time")
    val staged = points.select(col("metric"), col("time"), col("cents"))
      .withColumn("tu", expr(s"time div ${unitNs}L"))
      .withColumn("dt", col("tu") - lag("tu", 1).over(w))
      .withColumn("dod", col("dt") - lag("dt", 1).over(w))
      .withColumn("dc", col("cents") - lag("cents", 1).over(w))
      .withColumn("ts_bits",
        when(col("dt").isNull, 64L)
          .when(col("dod").isNull, 36L)
          .when(col("dod") === 0L, 1L)
          .when(col("dod").between(-63L, 64L), 9L)
          .when(col("dod").between(-255L, 256L), 12L)
          .when(col("dod").between(-2047L, 2048L), 16L)
          .otherwise(36L))
      .withColumn("val_bytes",
        when(col("dc").isNull, 8L)
          .when(col("dc").between(-64L, 63L), 1L)
          .when(col("dc").between(-8192L, 8191L), 2L)
          .when(col("dc").between(-1048576L, 1048575L), 3L)
          .otherwise(5L))
    staged.groupBy("metric")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("dod") === 0L, 1L).otherwise(0L)).as("c_dod0"),
        sum(when(col("dod").isNotNull && col("dod") =!= 0L &&
          col("dod").between(-63L, 64L), 1L).otherwise(0L)).as("c_dod9"),
        sum(when(col("dod").isNotNull && !col("dod").between(-63L, 64L) &&
          col("dod").between(-255L, 256L), 1L).otherwise(0L)).as("c_dod12"),
        sum(when(col("dod").isNotNull && !col("dod").between(-255L, 256L) &&
          col("dod").between(-2047L, 2048L), 1L).otherwise(0L)).as("c_dod16"),
        sum(when(col("dod").isNotNull && !col("dod").between(-2047L, 2048L),
          1L).otherwise(0L)).as("c_dod36"),
        sum("ts_bits").as("ts_bits"),
        sum("val_bytes").as("val_bytes"))
      .withColumn("enc_bytes",
        expr("(ts_bits + val_bytes * 8 + 7) div 8"))
      .withColumn("raw_bytes", col("n") * 16L)
      .withColumn("ratio",
        col("enc_bytes").cast("double") / col("raw_bytes").cast("double"))
  }

  /** Cross-correlation of metric pairs at integer bucket lags: resample
    * each metric to `step`-wide buckets (SUM of cents — extensive, no
    * division), then for every unordered pair (a < b) and lag in
    * [−maxLag, maxLag] compute the un-centered correlation of the two
    * bucket series over their OVERLAP (pairwise-complete semantics:
    * buckets one side lacks are absent, not zero):
    *
    *   corr = Σ xa·xb / (√Σ xa² · √Σ xb²)   — cosine of the overlap,
    *
    * with every Σ an exact int64 (products ≤ bucket-sum² stay far under
    * 2^63 for sane step sizes) and the final three IEEE ops (two sqrts,
    * one divide) in fixed order — oracle-bit-identical. Lead/lag
    * relationships show as off-zero peaks (a leads b at positive lag).
    *
    * Shape: one (metric, bucket) partial-agg shuffle to the bucket grid
    * (grid-sized from then on); the pair join is keyed on the bucket —
    * every metric pair sharing a bucket meets, so output and join work
    * are inherently quadratic in METRIC COUNT (not corpus size). Callers
    * with wide metric spaces pre-filter the metric set; the corpus-sized
    * frame never joins.
    *
    * @return (metric_a, metric_b, lag, n_overlap, num, sx2, sy2, corr) */
  def crossCorrelation(points: DataFrame, b: Long, e: Long, step: Long,
                       maxLag: Int): DataFrame = {
    require(e > b && step >= 1 && maxLag >= 0,
      s"bad args [$b,$e) step=$step maxLag=$maxLag")
    val g = points.where(col("time") >= b && col("time") < e)
      .withColumn("bucket", expr(s"(time - ${b}L) div ${step}L"))
      .groupBy("metric", "bucket").agg(sum("cents").as("s"))
    val lags = (-maxLag to maxLag).map(_.toLong)
    val x = g.select(col("metric").as("metric_a"), col("bucket"),
        col("s").as("xa"))
      .withColumn("lag", explode(lit(lags.toArray)))
      .withColumn("jb", col("bucket") + col("lag"))
    val y = g.select(col("metric").as("metric_b"), col("bucket").as("jb"),
      col("s").as("xb"))
    x.join(y, "jb")
      .where(col("metric_a") < col("metric_b"))
      .groupBy("metric_a", "metric_b", "lag")
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("xa") * col("xb")).as("num"),
        sum(col("xa") * col("xa")).as("sx2"),
        sum(col("xb") * col("xb")).as("sy2"))
      .withColumn("corr", col("num").cast("double") /
        (sqrt(col("sx2").cast("double")) * sqrt(col("sy2").cast("double"))))
  }

  /** Counter increase/rate over [b, e) — the monotone-counter read
    * (PromQL `increase`/`rate` semantics at the sample level, without
    * range-boundary extrapolation, which is documented out: extrapolated
    * values are estimates, not sums of observed deltas). Per metric, sum
    * adjacent deltas of the integer `cents` column; a decrease is a
    * counter RESET and contributes the new value itself (the counter
    * restarted from 0). First point contributes nothing (no prior
    * sample). rate = increase / range-seconds, the single IEEE division
    * of exact integers (oracle-parity safe).
    *
    * The lag window partitions by metric — correct for metric-cardinality
    * ≫ per-metric density (the warehouse shape); a single hot metric at
    * extreme density would chunk the lag like `AggOps.gapLiftChunked`.
    *
    * @return (metric, increase_cents, rate_cents_per_sec, n_samples) */
  def counterRate(points: DataFrame, b: Long, e: Long): DataFrame = {
    require(e > b, s"need e > b, got [$b,$e)")
    val w = Window.partitionBy("metric").orderBy("time")
    points.where(col("time") >= b && col("time") < e)
      .withColumn("_prev", lag(col("cents"), 1).over(w))
      .withColumn("_delta",
        when(col("_prev").isNull, lit(0L))
          .when(col("cents") >= col("_prev"), col("cents") - col("_prev"))
          .otherwise(col("cents")))
      .groupBy("metric")
      .agg(sum("_delta").as("increase_cents"),
        count(lit(1)).as("n_samples"))
      .withColumn("rate_cents_per_sec",
        col("increase_cents").cast("double") / ((e - b) / 1e9))
  }

  /** One-sided CUSUM drift detection over [b, e) (Page 1954): per metric,
    * the cumulative-sum statistic `s_t = max(0, s_{t-1} + (cents_t − k))`
    * accumulates evidence that the level has drifted above the reference
    * `driftCents` (k); rows where `s_t > thresholdCents` (h) are the
    * alarm samples. The no-reset variant is computed (after an alarm the
    * statistic keeps running rather than snapping to 0) — that is what
    * makes the fold CLOSED-FORM: s_t = P_t − min(0, min_{j≤t} P_j) for
    * the running sum P of (cents − k), so two stacked running windows
    * (sum, then min) over ONE metric-keyed exchange replace the
    * sequential recursion, and everything stays in exact integers.
    *
    * @return alarm rows (metric, time, cents, cusum) */
  def cusum(points: DataFrame, b: Long, e: Long, driftCents: Long,
            thresholdCents: Long): DataFrame = {
    require(e > b && thresholdCents > 0,
      s"need e > b and thresholdCents > 0, got [$b,$e) h=$thresholdCents")
    val w = Window.partitionBy("metric").orderBy("time")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points.where(col("time") >= b && col("time") < e)
      .withColumn("_p", sum(col("cents") - driftCents).over(w))
      .withColumn("_m", least(min(col("_p")).over(w), lit(0L)))
      .withColumn("cusum", col("_p") - col("_m"))
      .where(col("cusum") > thresholdCents)
      .select("metric", "time", "cents", "cusum")
  }

  /** Threshold alerting with hysteresis over [b, e): per metric, the
    * alert turns ON at a sample with cents ≥ `hiCents`, OFF at ≤
    * `loCents`, and HOLDS its state in the dead band between — the
    * two-threshold debounce every alerting system uses so a value
    * hovering at the line does not flap. Returns only the TRANSITIONS
    * (the alert-state edges a notifier consumes), each with the sample
    * that caused it; initial state is OFF.
    *
    * The state machine needs no sequential fold: state at a sample is
    * simply the most recent DECISIVE sample's verdict, so one
    * `last(_, ignoreNulls)` forward-fill window + one lag computes every
    * edge. One metric-keyed window exchange (the q31/asof shape), exact
    * integer compares, deterministic under O1's unique times.
    *
    * @return (metric, time, cents, alert) rows where the state changed */
  def hysteresisAlerts(points: DataFrame, b: Long, e: Long,
                       hiCents: Long, loCents: Long): DataFrame = {
    require(e > b && hiCents > loCents,
      s"need e > b and hiCents > loCents, got [$b,$e) hi=$hiCents lo=$loCents")
    val wFill = Window.partitionBy("metric").orderBy("time")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy("metric").orderBy("time")
    points.where(col("time") >= b && col("time") < e)
      .withColumn("_dec",
        when(col("cents") >= hiCents, lit(1L))
          .when(col("cents") <= loCents, lit(0L)))
      .withColumn("alert",
        coalesce(last(col("_dec"), ignoreNulls = true).over(wFill), lit(0L)))
      .withColumn("_prev", coalesce(lag(col("alert"), 1).over(wLag), lit(0L)))
      .where(col("alert") =!= col("_prev"))
      .select("metric", "time", "cents", "alert")
  }

  /** Collapse [[hysteresisAlerts]] edges into alert EPISODES — one
    * `(metric, i_start, i_end)` interval per ON period, a still-open
    * episode closing at `horizon`. Edges alternate per metric (ON, OFF,
    * ON, …), so each ON edge pairs with its lead; the window runs over the
    * edge stream (episode-sized, not sample-sized). The output feeds
    * [[Queries.intervalJoin]] directly. */
  def alertEpisodes(edges: DataFrame, horizon: Long): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("time")
    edges
      .withColumn("_nxt", lead(col("time"), 1).over(w))
      .where(col("alert") === 1L)
      .select(col("metric"), col("time").as("i_start"),
        coalesce(col("_nxt"), lit(horizon)).as("i_end"))
  }

  /** Trailing-window aggregates at every sample — the PromQL
    * `sum/count/min/max_over_time` family: for each sample, the aggregates
    * over that metric's samples in `(t − window, t]` (inclusive of the
    * sample itself, the at-or-before convention [[Queries.asofJoin]] uses).
    *
    * One metric-keyed RANGE-frame window over one exchange — the engine
    * slides the frame in event-time order, so cost is O(samples × window
    * density) per metric, bounded by the scoped read. All aggregates in
    * exact integer cents — bit-stable under any partitioning.
    *
    * @return (metric, time, cents, roll_sum, roll_cnt, roll_min, roll_max) */
  def rollingAgg(points: DataFrame, b: Long, e: Long, window: Long): DataFrame = {
    require(e > b && window > 0,
      s"need e > b and window > 0, got [$b,$e) window=$window")
    val w = Window.partitionBy("metric").orderBy("time")
      .rangeBetween(-(window - 1), 0)
    points.where(col("time") >= b && col("time") < e)
      .select(col("metric"), col("time"), col("cents"),
        sum("cents").over(w).as("roll_sum"),
        count(lit(1)).over(w).as("roll_cnt"),
        min("cents").over(w).as("roll_min"),
        max("cents").over(w).as("roll_max"))
  }

  /** Robust outlier detection per metric over [b, e): flag samples whose
    * absolute deviation from the metric's MEDIAN exceeds `kTenths/10 ×`
    * the metric's MAD (median absolute deviation) — the
    * median/MAD analogue of the z-score, insensitive to the outliers it
    * hunts. Everything stays in the exact integer cents domain: both
    * medians come from [[Queries.valueQuantiles]]'s histogram selection
    * (percentile_disc semantics — an observed value, never an
    * interpolated float) and the threshold is the integer cross-multiply
    * `dev·10 > mad·kTenths` — no division, no float, bit-stable across
    * engines and partitionings.
    *
    * Shape at scale: two histogram selections (shuffle volume = the
    * DISTINCT-value histogram, q54's argument) and two broadcast joins of
    * metric-cardinality maps; the corpus is scanned per tier but never
    * shuffled corpus-wide. Callers looping many k values should persist
    * the filtered slice.
    *
    * @return outlier rows (metric, time, cents, med, dev, mad) */
  def madOutliers(points: DataFrame, b: Long, e: Long,
                  kTenths: Long = 28L): DataFrame = {
    require(e > b && kTenths >= 0, s"need e > b, kTenths >= 0")
    val f = points.where(col("time") >= b && col("time") < e)
    val med = Queries.valueQuantiles(f, b, e, Seq(50))
      .select(col("metric"), col("q_cents").as("med"))
    val dev = f.join(broadcast(med), "metric")
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = Queries.valueQuantiles(
        dev.select(col("metric"), col("time"), col("dev").as("cents")),
        b, e, Seq(50))
      .select(col("metric"), col("q_cents").as("mad"))
    dev.join(broadcast(mad), "metric")
      .where(col("dev") * 10 > col("mad") * kTenths)
      .select("metric", "time", "cents", "med", "dev", "mad")
  }

  /** Forward-fill resampling onto a regular grid: one row per metric per
    * grid time `b, b+step, …` in [b, e), carrying the latest raw value
    * at-or-before that instant (NULL before a metric's first sample —
    * leading values are unknown, not zero).
    *
    * The grid is generated distributed (per-metric sequence explode, grid
    * rows = metrics × steps) and merged with the raw stream by the
    * [[Queries.asofJoin]] union-and-carry — ONE keyed window shuffle, no
    * per-grid-point probe join.
    *
    * @return (metric, time, value) — value nullable before first sample */
  def resampleFfill(points: DataFrame, b: Long, e: Long,
                    step: Long): DataFrame = {
    require(e > b && step > 0, s"need e > b and step > 0, got [$b,$e) $step")
    val metrics = points.select("metric").distinct()
    val grid = metrics.select(col("metric"),
      explode(sequence(lit(b), lit(e - 1), lit(step))).as("time"))
      .withColumn("value", lit(null).cast("double"))
    // asofJoin orders (time, _side=right-first, value): a raw point AT a
    // grid instant is visible to it; grid rows carry value NULL and sort
    // after real values, never shadowing them. Samples at time >= e can
    // never be at-or-before a grid instant (< e) — drop them BEFORE the
    // window shuffle so a small resample of a long-retention store
    // shuffles the slice, not the history (pre-b rows must stay: they
    // carry into the first grid instants)
    Queries.asofJoin(grid,
        points.where(col("time") < e).select("metric", "time", "value"),
        keys = Seq("metric"), valueName = "ff")
      .select(col("metric"), col("time"), col("ff").as("value"))
  }

  /** Regular-grid resampling with LINEAR INTERPOLATION: at every grid
    * instant, the value on the straight line between the nearest sample
    * at-or-before (`prev`) and the nearest sample strictly after (`next`);
    * a grid instant ON a sample returns that sample exactly (the lerp's
    * `t − prev_t = 0` arm), before the first sample it is NULL, and after
    * the last it forward-fills.
    *
    * Same union-and-carry shape as [[resampleFfill]], but BOTH directions
    * ride ONE exchange: the two mirrored frames (last-before /
    * first-after) share the (metric, time, side) sort, so Spark plans one
    * window exchange with two window operators over it — no second
    * shuffle, no self-join. The side ordinal makes at-instant visibility
    * exact: a sample at grid time t sorts before the grid row, so it IS
    * the prev and never the next (divide-by-zero impossible).
    *
    * Bit-determinism: cents and ns deltas are exact longs < 2^53, each
    * cast to double exactly; the lerp is then three IEEE ops in fixed
    * order (`pc + (nc−pc) · ((t−pt)/(nt−pt))`) — identical on any engine.
    *
    * The input is scanned unscoped so the carry into the first grid
    * instant and the partner after the last are exact; pre-scope the
    * frame to `[b − lookback, e + lookahead)` when the store's retention
    * dwarfs the resample range. */
  def resampleLerp(points: DataFrame, b: Long, e: Long,
                   step: Long): DataFrame = {
    require(e > b && step > 0, s"need e > b and step > 0, got [$b,$e) $step")
    val metrics = points.select("metric").distinct()
    val grid = metrics.select(col("metric"),
        explode(sequence(lit(b), lit(e - 1), lit(step))).as("time"))
      .withColumn("cents", lit(null).cast("long"))
      .withColumn("_side", lit(1))
    val pts = points.select("metric", "time", "cents")
      .withColumn("_side", lit(0))
    val wPrev = Window.partitionBy("metric").orderBy("time", "_side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the "next sample" carry runs on the REVERSED order with a running
    // (unbounded-PRECEDING) frame, never `first over (currentRow,
    // unboundedFollowing)`: Spark's UnboundedFollowing window frame
    // rescans from the current row to the partition end FOR EVERY ROW —
    // O(rows²) per metric, measured at 200 s on a 20k-row metric where
    // this form runs in milliseconds. Equal-time semantics are identical:
    // ordering (time desc, _side desc) puts the grid row before an
    // equal-time sample, so `nt` stays the strictly-later sample, exactly
    // as the ascending following-frame excluded it.
    val wNext = Window.partitionBy("metric")
      .orderBy(col("time").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sT = when(col("_side") === 0, col("time"))
    val sC = when(col("_side") === 0, col("cents"))
    grid.unionByName(pts)
      .withColumn("pt", last(sT, ignoreNulls = true).over(wPrev))
      .withColumn("pc", last(sC, ignoreNulls = true).over(wPrev))
      .withColumn("nt", last(sT, ignoreNulls = true).over(wNext))
      .withColumn("nc", last(sC, ignoreNulls = true).over(wNext))
      .where(col("_side") === 1)
      .select(col("metric"), col("time"),
        when(col("pt").isNull, lit(null).cast("double"))
          .when(col("nt").isNull, col("pc").cast("double"))
          .otherwise(col("pc").cast("double") +
            (col("nc") - col("pc")).cast("double") *
              ((col("time") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")))
          .as("value"))
  }

  /** Per-metric least-squares trend over [b, e): the drift detector's
    * quantitative sibling — slope of cents against time on a `step`-wide
    * integer grid, in ONE corpus scan with every accumulator an exact
    * int64. x = (time − b) div step, CENTERED by the literal grid
    * midpoint (OLS slope is translation-invariant, and centering halves
    * |x|, quadrupling the overflow headroom — no per-group first pass
    * needed). Emitted as the exact rational `sxy_num / sxx_num`
    * (num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)², both on the centered
    * grid) plus the one IEEE division for `slope` — bit-reproducible
    * cross-engine; a degenerate group (all samples in one bucket) gets a
    * NULL slope, not a NaN.
    *
    * Shape at scale: one metric-keyed partial-agg groupBy — the shuffle
    * carries 6 longs per metric per task, never the corpus. Headroom:
    * `n·Σ|xy| ≤ n²·(grid/2)·y_max < 2^63` — at an hourly grid over 30
    * days and 10⁶-cent values, safe to n ≈ 2.5·10⁵ rows per metric;
    * denser groups pick a coarser `step` (the slope is grid-scaled, so
    * callers compare like with like).
    *
    * @return (metric, n, sum_x, sum_y, sxy_num, sxx_num,
    *         slope_cents_per_step) */
  def linearTrend(points: DataFrame, b: Long, e: Long, step: Long): DataFrame = {
    require(e > b && step >= 1, s"bad args [$b,$e) step=$step")
    val mid = ((e - b) / step) / 2
    points.where(col("time") >= b && col("time") < e)
      .withColumn("x", expr(s"(time - ${b}L) div ${step}L") - lit(mid))
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sum_x"),
        sum("cents").as("sum_y"),
        sum(col("x") * col("cents")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"))
      .withColumn("sxy_num",
        col("n") * col("_sxy") - col("sum_x") * col("sum_y"))
      .withColumn("sxx_num",
        col("n") * col("_sxx") - col("sum_x") * col("sum_x"))
      .withColumn("slope_cents_per_step",
        when(col("sxx_num") === 0L, lit(null).cast("double"))
          .otherwise(col("sxy_num").cast("double") /
            col("sxx_num").cast("double")))
      .drop("_sxy", "_sxx")
  }

  /** Lead-lag detection: for every metric pair, the lag with the
    * strongest |correlation| from [[crossCorrelation]]'s grid — the
    * direct answer to "does A lead B, and by how much?" (positive lag:
    * a leads b). The argmax is decided on EXACT integers — compare
    * num²·(sx2'·sy2') cross-multiplied? No: |corr| ordering across lags
    * shares no common denominator, so the tie-safe exact comparison is
    * num² · (other.sx2 · other.sy2) vs other.num² · (sx2 · sy2) — which
    * overflows int64 at realistic sums. Instead the argmax uses the
    * IEEE |corr| double (deterministic: same three fixed-order ops both
    * engines) with the (|corr| desc, lag asc) tie-break — the value
    * being selected BY is bit-reproducible, so the selection is too.
    *
    * A lag is eligible only with `minOverlap` shared buckets —
    * un-centered cosine over two or three positive points is
    * spuriously near 1, and the extreme lags have the thinnest
    * overlap (the classic short-window artifact).
    *
    * @return per pair: (metric_a, metric_b, best_lag, n_overlap, corr) */
  def bestLag(points: DataFrame, b: Long, e: Long, step: Long,
              maxLag: Int, minOverlap: Long = 2L): DataFrame = {
    val cc = crossCorrelation(points, b, e, step, maxLag)
      .where(col("n_overlap") >= minOverlap)
    val w = Window.partitionBy("metric_a", "metric_b")
      .orderBy(abs(col("corr")).desc, col("lag").asc)
    cc.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("metric_a"), col("metric_b"), col("lag").as("best_lag"),
        col("n_overlap"), col("corr"))
  }

  /** Per-metric autocorrelation at integer bucket lags — the
    * seasonality/periodicity probe ([[crossCorrelation]]'s self-pair
    * sibling; that operator deliberately excludes a = b). Resample to
    * `step`-wide SUM buckets, then for lag ∈ [0, maxLag] the un-centered
    * correlation of the series with itself shifted by `lag`, over the
    * overlap (pairwise-complete): corr = Σ x_t·x_{t+lag} / (√Σx_t²·√Σx_{t+lag}²),
    * every Σ exact int64, the final three IEEE ops in fixed order.
    * A daily period shows as a peak at lag = day/step; lag 0 is the
    * sanity row (corr exactly 1 whenever the series is non-degenerate).
    *
    * Shape: one (metric, bucket) partial-agg shuffle to the grid, then a
    * (metric, bucket)-keyed self-join of grid-sized frames — work scales
    * with grid × maxLag, never corpus size.
    *
    * @return (metric, lag, n_overlap, num, sx2, sy2, corr) */
  def autoCorrelation(points: DataFrame, b: Long, e: Long, step: Long,
                      maxLag: Int): DataFrame = {
    require(e > b && step >= 1 && maxLag >= 0,
      s"bad args [$b,$e) step=$step maxLag=$maxLag")
    val g = points.where(col("time") >= b && col("time") < e)
      .withColumn("bucket", expr(s"(time - ${b}L) div ${step}L"))
      .groupBy("metric", "bucket").agg(sum("cents").as("s"))
    val lags = (0 to maxLag).map(_.toLong)
    val x = g.select(col("metric"), col("bucket"), col("s").as("xa"))
      .withColumn("lag", explode(lit(lags.toArray)))
      .withColumn("jb", col("bucket") + col("lag"))
    val y = g.select(col("metric"), col("bucket").as("jb"),
      col("s").as("xb"))
    x.join(y, Seq("metric", "jb"))
      .groupBy("metric", "lag")
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("xa") * col("xb")).as("num"),
        sum(col("xa") * col("xa")).as("sx2"),
        sum(col("xb") * col("xb")).as("sy2"))
      .withColumn("corr", col("num").cast("double") /
        (sqrt(col("sx2").cast("double")) * sqrt(col("sy2").cast("double"))))
  }

  /** Seasonality-adjusted outliers: flag samples whose DEVIATION FROM
    * THEIR HOUR-OF-DAY BASELINE is extreme — the fix for the false-
    * positive storm a flat threshold raises every daily peak (a value
    * normal at noon is an incident at 3am). Baseline = per-(metric,
    * hour-of-day) floor-mean of cents (exact integer — `(Σ − pmod(Σ, n))
    * div n`); residual = |cents − baseline|; a sample is an outlier when
    * its residual exceeds the per-metric p-th residual percentile under
    * q54's integer selection rule (the [[graft.pipeline.Profile.orderStatOutliers]]
    * threshold, applied to residuals).
    *
    * Shape at scale: one (metric, hour) partial-agg shuffle builds the
    * 24-row-per-metric baseline (broadcast back — the residual pass is a
    * narrow join); one (metric, residual) histogram shuffle drives the
    * threshold window (histogram-sized partitions); thresholds broadcast
    * back. The corpus is read once and never shuffled whole.
    *
    * @return flagged rows (metric, time, cents, hour, baseline, resid,
    *         thr) */
  def seasonalOutliers(points: DataFrame, b: Long, e: Long,
                       pNum: Int, pDen: Int): DataFrame = {
    require(e > b, s"need e > b, got [$b,$e)")
    val hourNs = 3600000000000L
    val f = points.where(col("time") >= b && col("time") < e)
      .select(col("metric"), col("time"), col("cents"),
        expr(s"(time div ${hourNs}L) % 24").as("hour"))
    val prof = f.groupBy("metric", "hour")
      .agg(sum("cents").as("_s"), count(lit(1)).as("_n"))
      .withColumn("baseline", expr("(_s - pmod(_s, _n)) div _n"))
      .select("metric", "hour", "baseline")
    val resid = f.join(broadcast(prof), Seq("metric", "hour"))
      .withColumn("resid", abs(col("cents") - col("baseline")))
    graft.pipeline.Profile.orderStatOutliers(resid, Seq("metric"),
      "resid", pNum, pDen)
  }

  /** Robust (median-based) trend: [[linearTrend]]'s spike-resistant
    * sibling — OLS over PER-BUCKET MEDIANS instead of raw samples, so a
    * burst of outliers in one hour cannot drag the slope (the breakdown
    * point moves from 0 to 50% per bucket). Medians are exact order
    * statistics on the integer cents domain (q54's selection rule,
    * p = 1/2); the slope is the same exact rational as linearTrend,
    * computed over the BUCKET-MEDIAN frame (grid-sized — the second
    * stage never touches the corpus).
    *
    * Shape at scale: one (metric, bucket, cents) histogram partial-agg
    * shuffle — the only corpus-sized exchange; the median window runs
    * over per-(metric, bucket) histogram partitions; the OLS fold is a
    * metric-keyed aggregate of grid rows.
    *
    * @return (metric, n_buckets, sxy_num, sxx_num,
    *         slope_cents_per_step) */
  def robustTrend(points: DataFrame, b: Long, e: Long,
                  step: Long): DataFrame = {
    require(e > b && step >= 1, s"bad args [$b,$e) step=$step")
    val mid = ((e - b) / step) / 2
    val hist = points.where(col("time") >= b && col("time") < e)
      .withColumn("bucket", expr(s"(time - ${b}L) div ${step}L"))
      .groupBy("metric", "bucket", "cents").agg(count(lit(1)).as("_c"))
    val wb = Window.partitionBy("metric", "bucket").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("metric", "bucket")
    val med = hist
      .withColumn("_cum", sum("_c").over(wb))
      .withColumn("_n", sum("_c").over(wn))
      .where(col("_cum") * 2L >= col("_n"))
      .groupBy("metric", "bucket").agg(min("cents").as("_med"))
    med
      .withColumn("x", col("bucket") - lit(mid))
      .groupBy("metric")
      .agg(count(lit(1)).as("n_buckets"),
        sum("x").as("_sx"), sum("_med").as("_sy"),
        sum(col("x") * col("_med")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"))
      .withColumn("sxy_num",
        col("n_buckets") * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("sxx_num",
        col("n_buckets") * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("slope_cents_per_step",
        when(col("sxx_num") === 0L, lit(null).cast("double"))
          .otherwise(col("sxy_num").cast("double") /
            col("sxx_num").cast("double")))
      .select("metric", "n_buckets", "sxy_num", "sxx_num",
        "slope_cents_per_step")
  }

  /** Seasonal gap imputation: resample to a `step` grid where every
    * instant carries its bucket's exact MEDIAN, and EMPTY buckets are
    * filled from the metric's hour-of-day median — the repair that
    * keeps a daily-shaped series daily-shaped through an outage, where
    * forward-fill ([[resampleFfill]]) would freeze 3am values into the
    * morning peak. Both medians are exact order statistics on the
    * integer cents domain (q54 rule, p = 1/2); the output flags which
    * rows were imputed.
    *
    * Shape at scale: one (metric, bucket, cents) histogram shuffle (the
    * only corpus-sized exchange — the hour-of-day histogram derives
    * from the same lineage); medians reduce to grid-/24-row tables; the
    * grid join is grid-sized with the hour table BROADCAST. A metric
    * with no samples at some hour-of-day leaves those empty buckets
    * NULL (nothing to impute from), flagged imputed = false.
    *
    * @return (metric, time, value_cents, imputed) — one row per metric
    *         per grid instant */
  def seasonalImpute(points: DataFrame, b: Long, e: Long,
                     step: Long): DataFrame = {
    require(e > b && step >= 1, s"bad args [$b,$e) step=$step")
    val hourNs = 3600000000000L
    val f = points.where(col("time") >= b && col("time") < e)
      .select(col("metric"),
        expr(s"(time - ${b}L) div ${step}L").as("bucket"),
        expr(s"(time div ${hourNs}L) % 24").as("hour"), col("cents"))
    val hist = f.groupBy("metric", "bucket", "cents")
      .agg(count(lit(1)).as("_c"))
    val wb = Window.partitionBy("metric", "bucket").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("metric", "bucket")
    val bucketMed = hist
      .withColumn("_cum", sum("_c").over(wb))
      .withColumn("_n", sum("_c").over(wn))
      .where(col("_cum") * 2L >= col("_n"))
      .groupBy("metric", "bucket").agg(min("cents").as("_bmed"))
    val hhist = f.groupBy("metric", "hour", "cents")
      .agg(count(lit(1)).as("_c"))
    val wh = Window.partitionBy("metric", "hour").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whn = Window.partitionBy("metric", "hour")
    val hourMed = hhist
      .withColumn("_cum", sum("_c").over(wh))
      .withColumn("_n", sum("_c").over(whn))
      .where(col("_cum") * 2L >= col("_n"))
      .groupBy("metric", "hour").agg(min("cents").as("_hmed"))
    val nSteps = (e - b + step - 1) / step
    val grid = points.select("metric").distinct()
      .select(col("metric"),
        explode(sequence(lit(0L), lit(nSteps - 1))).as("bucket"))
      .withColumn("time", lit(b) + col("bucket") * lit(step))
      .withColumn("hour", expr(s"(time div ${hourNs}L) % 24"))
    grid
      .join(bucketMed, Seq("metric", "bucket"), "left")
      .join(broadcast(hourMed), Seq("metric", "hour"), "left")
      .select(col("metric"), col("time"),
        coalesce(col("_bmed"), col("_hmed")).as("value_cents"),
        (col("_bmed").isNull && col("_hmed").isNotNull).as("imputed"))
  }

  /** Multi-window SLO burn rate (the SRE error-budget read): on a
    * complete hourly wall-clock grid over [b, e), the error share of
    * events in the trailing 1-hour and 6-hour windows, scaled by the
    * budget — `burn = err_share / budget`, exact as
    * `n_err · 10⁶ · budgetDen div n_tot` — and the page flag when BOTH
    * windows burn above 1 (the multiwindow rule that makes paging both
    * fast AND flap-free: the short window confirms it's current, the
    * long one confirms it's material). Hours with no events have NULL
    * burn (no evidence ≠ zero burn).
    *
    * Shape at scale: one (bucket) partial-agg shuffle to the hourly
    * grid; trailing sums are windows over GRID rows (a row per hour,
    * never per event); the grid is completed by a sequence explode so
    * silent hours exist (a trailing window that only sees observed
    * hours would silently stretch over outages).
    *
    * @param errType the event type counted as an error
    * @param budgetDen budget = 1/budgetDen of events may error
    * @return per hour: (bucket, time, n_tot, n_err, burn1_e6, n_tot_6h,
    *         n_err_6h, burn6_e6, page) */
  def sloBurn(points: DataFrame, b: Long, e: Long, errType: String,
              budgetDen: Long): DataFrame = {
    require(e > b && budgetDen >= 1, s"bad args [$b,$e) budgetDen=$budgetDen")
    val hourNs = 3600000000000L
    val nSteps = (e - b + hourNs - 1) / hourNs
    val f = points.where(col("time") >= b && col("time") < e)
      .select(expr(s"(time - ${b}L) div ${hourNs}L").as("bucket"),
        col("metric"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("_t"),
        sum(when(col("metric") === errType, 1L).otherwise(0L)).as("_e"))
    val spark = points.sparkSession
    val grid = spark.range(0, nSteps).select(col("id").as("bucket"))
    // deliberate unpartitioned window: the frame is the HOURLY grid
    // ((e−b)/1h rows — 8.8k/year), aggregated before the window ever
    // runs; corpus rows never enter it
    val w6 = Window.orderBy("bucket").rowsBetween(-5, 0)
    val full = grid.join(f, Seq("bucket"), "left")
      .withColumn("n_tot", coalesce(col("_t"), lit(0L)))
      .withColumn("n_err", coalesce(col("_e"), lit(0L)))
      .withColumn("n_tot_6h", sum("n_tot").over(w6))
      .withColumn("n_err_6h", sum("n_err").over(w6))
    full
      .withColumn("time", lit(b) + col("bucket") * lit(hourNs))
      .withColumn("burn1_e6",
        when(col("n_tot") === 0L, lit(null).cast("long"))
          .otherwise(expr(s"(n_err * 1000000 * $budgetDen) div n_tot")))
      .withColumn("burn6_e6",
        when(col("n_tot_6h") === 0L, lit(null).cast("long"))
          .otherwise(expr(s"(n_err_6h * 1000000 * $budgetDen) div n_tot_6h")))
      .withColumn("page",
        coalesce(col("burn1_e6") > 1000000L, lit(false)) &&
          coalesce(col("burn6_e6") > 1000000L, lit(false)))
      .select("bucket", "time", "n_tot", "n_err", "burn1_e6",
        "n_tot_6h", "n_err_6h", "burn6_e6", "page")
  }

  /** Heartbeat availability: per metric over [b, e), outages are
    * inter-sample gaps beyond `maxGap` (the scrape contract); the
    * report is the uptime ratio over the OBSERVED span (first→last
    * sample), outage count and the longest silence — the availability
    * number an on-call review starts from. One metric-keyed window
    * exchange (the lag), then a per-metric fold; exact integers, the
    * ratio in e6 fixed point.
    *
    * @return (metric, span_ns, downtime_ns, n_outages, max_gap_ns,
    *         uptime_e6) — single-sample metrics report NULL uptime
    *         (no span to judge) */
  def uptimeReport(points: DataFrame, b: Long, e: Long,
                   maxGap: Long): DataFrame = {
    require(e > b && maxGap >= 1, s"bad args [$b,$e) maxGap=$maxGap")
    val w = Window.partitionBy("metric").orderBy("time")
    points.where(col("time") >= b && col("time") < e)
      .select(col("metric"), col("time"))
      .withColumn("_gap", col("time") - lag("time", 1).over(w))
      .groupBy("metric")
      .agg((max("time") - min("time")).as("span_ns"),
        sum(when(col("_gap") > maxGap, col("_gap")).otherwise(0L))
          .as("downtime_ns"),
        sum(when(col("_gap") > maxGap, 1L).otherwise(0L)).as("n_outages"),
        max("_gap").as("max_gap_ns"))
      .withColumn("uptime_e6",
        // ratio on the MILLISECOND grid: span_ns · 10⁶ overflows int64
        // for spans beyond ~107 days (DuckDB would ERROR, Spark would
        // silently wrap); ms keeps the product under 2^63 to ~292k years
        when(expr("span_ns div 1000000") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "(((span_ns - downtime_ns) div 1000000) * 1000000)" +
              " div (span_ns div 1000000)")))
  }

  /** Theil–Sen slope over bucket medians — the heavy-armor trend
    * estimator (median of pairwise slopes, breakdown point 29%):
    * [[robustTrend]] resists outliers WITHIN a bucket; Theil–Sen also
    * resists whole corrupted BUCKETS (a dead hour of zeros bends an
    * OLS-of-medians line but not the pairwise-slope median). Pairwise
    * slopes are quantized to e6 fixed point
    * (`(m_j − m_i) · 10⁶ div (x_j − x_i)`, exact integers), and the
    * estimate is the exact lower median of those — bit-reproducible.
    *
    * Shape at scale: the corpus collapses to per-(metric, bucket)
    * medians first (one histogram shuffle — the only corpus-sized
    * exchange); the pairwise stage is grid², over MEDIANS, never
    * samples — 278 hourly buckets make 38k pairs per metric, a rounding
    * error beside the scan. Wider windows pick a coarser step; the n²
    * is in the GRID, under the caller's control.
    *
    * @return (metric, n_buckets, n_pairs, slope_e6_per_step) */
  def theilSenTrend(points: DataFrame, b: Long, e: Long,
                    step: Long): DataFrame = {
    require(e > b && step >= 1, s"bad args [$b,$e) step=$step")
    val hist = points.where(col("time") >= b && col("time") < e)
      .withColumn("bucket", expr(s"(time - ${b}L) div ${step}L"))
      .groupBy("metric", "bucket", "cents").agg(count(lit(1)).as("_c"))
    val wb = Window.partitionBy("metric", "bucket").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("metric", "bucket")
    val med = hist
      .withColumn("_cum", sum("_c").over(wb))
      .withColumn("_n", sum("_c").over(wn))
      .where(col("_cum") * 2L >= col("_n"))
      .groupBy("metric", "bucket").agg(min("cents").as("_med"))
    val a = med.select(col("metric"), col("bucket").as("_bi"),
      col("_med").as("_mi"))
    val bb = med.select(col("metric"), col("bucket").as("_bj"),
      col("_med").as("_mj"))
    val slopes = a.join(bb, "metric").where(col("_bi") < col("_bj"))
      .select(col("metric"),
        expr("((_mj - _mi) * 1000000 - pmod((_mj - _mi) * 1000000, _bj - _bi))" +
          " div (_bj - _bi)").as("_s"))
    val ws = Window.partitionBy("metric").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wsn = Window.partitionBy("metric")
    val nb = med.groupBy("metric").agg(count(lit(1)).as("n_buckets"))
    slopes.groupBy("metric", "_s").agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum("_c").over(ws))
      .withColumn("_n", sum("_c").over(wsn))
      .where(col("_cum") * 2L >= col("_n"))
      .groupBy("metric").agg(min("_s").as("slope_e6_per_step"),
        min("_n").as("n_pairs"))
      .join(nb, "metric")
      .select("metric", "n_buckets", "n_pairs", "slope_e6_per_step")
  }

  /** Inter-arrival histogram on log₂ buckets — the latency-histogram
    * read of a sample stream (scrape regularity, burst detection,
    * ingestion SLOs). Per metric, gap = time − previous time; bucket =
    * bit length of the gap (`length(bin(gap))`, the q91 HLL-rank trick
    * — exact, codegen'd, no float log), so bucket b holds gaps in
    * [2^(b−1), 2^b). O1 uniqueness makes every gap ≥ 1 and the lag
    * deterministic. One metric-keyed window exchange, then a
    * (metric, bucket) partial-agg — output is metrics × ~60 rows.
    *
    * @return (metric, bucket, n, min_gap, max_gap) */
  def interArrivalHist(points: DataFrame, b: Long, e: Long): DataFrame = {
    require(e > b, s"need e > b, got [$b,$e)")
    val w = Window.partitionBy("metric").orderBy("time")
    points.where(col("time") >= b && col("time") < e)
      .select(col("metric"), col("time"))
      .withColumn("_prev", lag(col("time"), 1).over(w))
      .where(col("_prev").isNotNull)
      .withColumn("gap", col("time") - col("_prev"))
      .withColumn("bucket", length(bin(col("gap"))).cast("long"))
      .groupBy("metric", "bucket")
      .agg(count(lit(1)).as("n"),
        min("gap").as("min_gap"), max("gap").as("max_gap"))
  }
}
