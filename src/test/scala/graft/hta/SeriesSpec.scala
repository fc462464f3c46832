package graft.hta

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** hta/Series.scala — M4 downsampling, counter rate, grid resampling —
  * against hand-computed fixtures (times in ns via tp()). */
class SeriesSpec extends SparkSpec {

  private def pts(rows: Seq[(String, Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("metric", "time", "value")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
  }

  test("m4Downsample keeps first/last/min/max per bucket, ceil width covers") {
    // [0s, 100s) in 3 buckets -> ceil width 34s: buckets [0,34) [34,68) [68,100)
    val df = pts(Seq(
      ("m", tp(0), 5.0), ("m", tp(10), 1.0), ("m", tp(30), 9.0),
      ("m", tp(40), 2.0),
      ("m", tp(99), 7.0)))
    val r = Series.m4Downsample(df, tp(0), tp(100), w = 3)
      .orderBy("bucket").collect()
    assert(r.length === 3)
    val b0 = r(0)
    assert(b0.getLong(1) === 0L && b0.getLong(2) === tp(0) &&
      b0.getDouble(3) === 5.0 && b0.getLong(4) === tp(30) &&
      b0.getDouble(5) === 9.0 && b0.getDouble(6) === 1.0 &&
      b0.getDouble(7) === 9.0)
    val b1 = r(1)
    assert(b1.getLong(1) === 1L && b1.getDouble(3) === 2.0 &&
      b1.getDouble(5) === 2.0 && b1.getDouble(6) === 2.0)
    // last bucket (shorter than width) still appears
    assert(r(2).getLong(1) === 2L && r(2).getDouble(3) === 7.0)
  }

  test("hourOfDayProfile buckets by UTC hour with exact integer stats") {
    // Offset = 1519130000 s = ...; hour index is (time div 1h) mod 24 —
    // compute expected hours directly from the same arithmetic
    def hr(sec: Long): Long = (tp(sec) / 3600000000000L) % 24
    val df = pts(Seq(
      ("m", tp(0), 1.0), ("m", tp(10), 3.0),          // same hour
      ("m", tp(3600), 5.0),                            // next hour
      ("n", tp(0), 7.0)))
    val r = Series.hourOfDayProfile(df, tp(0), tp(7200))
      .orderBy("metric", "hour").collect()
    assert(r.length === 3)
    val m0 = r(0)
    assert(m0.getString(0) === "m" && m0.getLong(1) === hr(0) &&
      m0.getLong(2) === 2L && m0.getLong(3) === 100L &&
      m0.getLong(4) === 300L && m0.getLong(5) === 400L &&
      m0.getDouble(6) === 200.0)
    assert(r(1).getLong(1) === hr(3600) && r(1).getLong(2) === 1L)
    assert(r(2).getString(0) === "n" && r(2).getLong(5) === 700L)
    // hours from different days fold together
    val folded = Series.hourOfDayProfile(
      pts(Seq(("m", tp(0), 1.0), ("m", tp(86400), 2.0))), tp(0), tp(90000))
      .collect()
    assert(folded.length === 1 && folded(0).getLong(2) === 2L)
  }

  test("valueHistogram is the sparse equi-width bucket count") {
    val df = pts(Seq(
      ("m", tp(1), 0.05), ("m", tp(2), 0.10), // cents 5, 10 -> bucket 0
      ("m", tp(3), 0.60),                     // cents 60 -> bucket 2
      ("n", tp(1), 0.25)))                    // cents 25 -> bucket 1
    val r = Series.valueHistogram(df, tp(0), tp(10), widthCents = 25L)
      .orderBy("metric", "bucket").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq(("m", 0L, 0L, 2L), ("m", 2L, 50L, 1L),
      ("n", 1L, 25L, 1L)))
    // range filter excludes out-of-window points: [0s,3s) drops m@3s
    val filtered = Series.valueHistogram(df, tp(0), tp(3), widthCents = 25L)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(filtered === 3L)
  }

  test("deltaEncodingStats bills the hand-computed Gorilla classes") {
    // seconds grid: dt = 10, 10, 5, 975 -> dod = _, 0, -5, 970
    // ts_bits: 64 (head) + 36 (first delta) + 1 + 9 + 16 = 126
    // cents:   100, 150, 10000, 10001, 5000
    // dc:      _, 50, 9850, 1, -5001 -> val_bytes 8+1+3+1+2 = 15
    // enc_bytes = (126 + 15*8 + 7) div 8 = 31; raw = 5*16 = 80
    val df = pts(Seq(
      ("g", tp(0), 1.0), ("g", tp(10), 1.5), ("g", tp(20), 100.0),
      ("g", tp(25), 100.01), ("g", tp(1000), 50.0)))
    val r = Series.deltaEncodingStats(df).collect()
    assert(r.length === 1)
    val row = r(0)
    def L(c: String) = row.getLong(row.fieldIndex(c))
    assert(L("n") === 5L)
    assert(L("c_dod0") === 1L && L("c_dod9") === 1L && L("c_dod12") === 0L &&
      L("c_dod16") === 1L && L("c_dod36") === 0L)
    assert(L("ts_bits") === 126L && L("val_bytes") === 15L)
    assert(L("enc_bytes") === 31L && L("raw_bytes") === 80L)
    assert(row.getDouble(row.fieldIndex("ratio")) === 31.0 / 80.0)
    // sub-second points: dt collapses to 0 on the s grid, dod stays defined
    val fine = Series.deltaEncodingStats(pts(Seq(
      ("f", tp(0), 1.0), ("f", tp(0, 1000000L), 1.0),
      ("f", tp(0, 2000000L), 1.0)))).collect()(0)
    assert(fine.getLong(fine.fieldIndex("c_dod0")) === 1L)
  }

  test("crossCorrelation peaks at the true alignment lag") {
    // b is a copy of a shifted one bucket later -> perfect cosine at lag +1
    val df = pts(Seq(
      ("a", tp(0), 1.0), ("a", tp(1), 2.0), ("a", tp(2), 3.0),
      ("b", tp(1), 1.0), ("b", tp(2), 2.0), ("b", tp(3), 3.0)))
    val r = Series.crossCorrelation(df, tp(0), tp(10), step = S, maxLag = 2)
      .orderBy("lag").collect()
    val byLag = r.map(x => x.getLong(x.fieldIndex("lag")) ->
      (x.getLong(x.fieldIndex("n_overlap")),
        x.getDouble(x.fieldIndex("corr")))).toMap
    // only (a, b) pairs, a < b
    assert(r.forall(x => x.getString(0) === "a" && x.getString(1) === "b"))
    assert(byLag(1L)._1 === 3L && byLag(1L)._2 === 1.0)
    assert(byLag.values.map(_._2).max === 1.0)
    assert(byLag(1L)._2 > byLag(0L)._2 && byLag(1L)._2 > byLag(2L)._2)
    // num is the exact integer dot: lag 1 pairs (100,100)(200,200)(300,300)
    val lag1 = r.find(_.getLong(2) === 1L).get
    assert(lag1.getLong(lag1.fieldIndex("num")) === 140000L)
  }

  test("counterRate sums deltas, treats decreases as resets, skips first") {
    // cents: 100 -> 250 (+150) -> 50 (reset: +50) -> 300 (+250) = 450
    val df = pts(Seq(
      ("c", tp(1), 1.0), ("c", tp(2), 2.5), ("c", tp(3), 0.5), ("c", tp(4), 3.0),
      ("lone", tp(2), 9.0)))
    val r = Series.counterRate(df, tp(0), tp(10))
      .orderBy("metric").collect()
    assert(r.length === 2)
    assert(r(0).getString(0) === "c" &&
      r(0).getLong(r(0).fieldIndex("increase_cents")) === 450L &&
      r(0).getLong(r(0).fieldIndex("n_samples")) === 4L)
    assert(r(0).getDouble(r(0).fieldIndex("rate_cents_per_sec")) === 45.0)
    // a single sample has no prior: increase 0
    assert(r(1).getString(0) === "lone" &&
      r(1).getLong(r(1).fieldIndex("increase_cents")) === 0L)
  }

  test("hysteresisAlerts holds state in the dead band, emits edges only") {
    // hi=500, lo=200: 600(ON) 350(hold) 150(OFF) 450(hold) 700(ON)
    val df = pts(Seq(
      ("m", tp(1), 6.0), ("m", tp(2), 3.5), ("m", tp(3), 1.5),
      ("m", tp(4), 4.5), ("m", tp(5), 7.0),
      // starts in the dead band: stays OFF until the first decisive sample
      ("n", tp(1), 3.0), ("n", tp(2), 9.0)))
    val r = Series.hysteresisAlerts(df, tp(0), tp(10), 500L, 200L)
      .orderBy("metric", "time").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(3)))
    assert(r === Array(
      ("m", tp(1), 1L), ("m", tp(3), 0L), ("m", tp(5), 1L),
      ("n", tp(2), 1L)))
  }

  test("madOutliers flags by exact median/MAD cross-multiply") {
    // cents: 100,100,100,200,200,1000 -> median 100 (2*cum>=n at 100:
    // cum 3, n 6), devs 0,0,0,100,100,900 -> MAD 100 (cum 3 of 6 at 0?
    // no: 2*3>=6 holds at dev 0) -> MAD 0... choose values where MAD>0
    val df = pts(Seq(
      ("m", tp(1), 1.0), ("m", tp(2), 2.0), ("m", tp(3), 3.0),
      ("m", tp(4), 4.0), ("m", tp(5), 50.0)))
    // cents 100..400,5000: median=300 (cum 3 of 5); devs 200,100,0,100,4700
    // -> sorted 0,100,100,200,4700, MAD=100 (cum 3 of 5 at 100)
    // k=2.8: dev*10 > 100*28=2800 -> dev > 280 -> only the 5000 sample
    val r = Series.madOutliers(df, tp(0), tp(10), kTenths = 28L).collect()
    assert(r.length === 1)
    assert(r(0).getLong(2) === 5000L && r(0).getLong(3) === 300L &&
      r(0).getLong(4) === 4700L && r(0).getLong(5) === 100L)
    // k=0 flags everything with dev > 0 (strict compare: dev-0 rows stay out)
    val all = Series.madOutliers(df, tp(0), tp(10), kTenths = 0L).collect()
    assert(all.length === 4)
  }

  test("cusum window closed form equals the sequential fold") {
    val rng = new scala.util.Random(47L)
    val rows = for {
      m <- Seq("a", "b")
      t <- 1 to 150
    } yield (m, tp(t), (rng.nextInt(900) + 1) / 100.0)
    val df = pts(rows)
    val (k, h) = (400L, 900L)
    val got = Series.cusum(df, tp(0), tp(200), k, h)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (m, rs) =>
      var s = 0L
      rs.sortBy(_._2).flatMap { case (_, t, v) =>
        s = math.max(0L, s + (math.round(v * 100) - k))
        if (s > h) Some((m, t, s)) else None
      }
    }.toSet
    assert(got === expected)
    assert(expected.nonEmpty, "fixture should alarm")
  }

  test("Series ops match driver-side brute force on seeded random series") {
    val rng = new scala.util.Random(41L)
    val rows = for {
      m <- Seq("a", "b", "c")
      t <- (0 until 200).map(_ => rng.nextInt(1000)).distinct.sorted
    } yield (m, tp(t), (rng.nextInt(2000) + 1) / 100.0)
    val df = pts(rows)
    val byM = rows.groupBy(_._1).map { case (m, rs) =>
      m -> rs.map(r => (r._2, math.round(r._3 * 100))).sortBy(_._1)
    }

    // m4: per bucket first/last/min/max over values (doubles: cents/100)
    val w = 7
    val width = (tp(1000) - tp(0) + w - 1) / w
    val m4 = Series.m4Downsample(df, tp(0), tp(1000), w)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))).toMap
    for ((m, rs) <- byM; (bkt, brs) <- rs.groupBy(r => (r._1 - tp(0)) / width)) {
      val vs = brs.map(r => (r._1, r._2 / 100.0))
      val expected = (vs.head._1, vs.head._2, vs.last._1, vs.last._2,
        vs.map(_._2).min, vs.map(_._2).max)
      assert(m4((m, bkt)) === expected, s"m4 $m bucket $bkt")
    }

    // counterRate: driver fold with reset rule
    val cr = Series.counterRate(df, tp(0), tp(1000))
      .collect().map(r => r.getString(0) ->
        r.getLong(r.fieldIndex("increase_cents"))).toMap
    for ((m, rs) <- byM) {
      val cents = rs.map(_._2)
      val inc = cents.zip(cents.drop(1))
        .map { case (p, c) => if (c >= p) c - p else c }.sum
      assert(cr(m) === inc, s"counterRate $m")
    }

    // resampleFfill: driver-side at-or-before lookup per grid instant
    val step = 37L * S
    val rs = Series.resampleFfill(df, tp(0), tp(1000), step)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for ((m, series) <- byM; g <- tp(0) until tp(1000) by step) {
      val expected = series.takeWhile(_._1 <= g).lastOption.map(_._2 / 100.0)
      assert(rs((m, g)) === expected, s"resample $m @$g")
    }
  }

  test("resampleFfill carries at-or-before values, NULL before first sample") {
    val df = pts(Seq(("m", tp(5), 1.0), ("m", tp(12), 2.0)))
    // grid 0,10,20,30 in [0, 40): t0 -> null, t10 -> 1.0, t20/t30 -> 2.0
    val r = Series.resampleFfill(df, tp(0), tp(40), step = 10L * S)
      .orderBy("time").collect()
    assert(r.length === 4)
    assert(r(0).isNullAt(2))
    assert(r(1).getDouble(2) === 1.0 && r(2).getDouble(2) === 2.0 &&
      r(3).getDouble(2) === 2.0)
    // a sample exactly AT a grid instant is visible to it
    val at = Series.resampleFfill(pts(Seq(("m", tp(10), 4.0))),
      tp(0), tp(20), step = 10L * S).orderBy("time").collect()
    assert(at(1).getDouble(2) === 4.0)
  }

  test("rollingAgg frame is (t-window, t] — hand case + brute force") {
    // W = 10 s: at t=10 the frame is (0, 10] — the t=0 sample is OUT
    val df = pts(Seq(
      ("m", tp(0), 1.0), ("m", tp(5), 2.0), ("m", tp(10), 3.0),
      ("m", tp(14), 4.0), ("m", tp(25), 5.0)))
    val r = Series.rollingAgg(df, tp(0), tp(100), window = 10L * S)
      .orderBy("time").collect()
      .map(x => (x.getLong(1), x.getLong(3), x.getLong(4), x.getLong(5),
        x.getLong(6)))
    assert(r(0) === (tp(0), 100L, 1L, 100L, 100L))
    assert(r(2) === (tp(10), 500L, 2L, 200L, 300L), "t=0 excluded at t=10")
    assert(r(3) === (tp(14), 900L, 3L, 200L, 400L), "frame (4,14] has 5,10,14")
    assert(r(4) === (tp(25), 500L, 1L, 500L, 500L))

    // brute force on a random workload
    val rng = new scala.util.Random(31L)
    val rows = for (m <- Seq("a", "b"); _ <- 0 until 80) yield
      (m, tp(rng.nextInt(500)), rng.nextInt(1000) / 100.0)
    val uniq = rows.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val w = 37L * S
    val got = Series.rollingAgg(pts(uniq), tp(0), tp(500), w)
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        (x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    for ((m, t, _) <- uniq) {
      val frame = uniq.filter(p => p._1 == m && p._2 > t - w && p._2 <= t)
        .map(p => Math.round(p._3 * 100))
      assert(got((m, t)) === (frame.sum, frame.length.toLong, frame.min,
        frame.max), s"$m @$t")
    }
  }

  test("resampleLerp interpolates, hits samples exactly, ffills the tail") {
    // samples at 10 s (v=1.0) and 30 s (v=3.0); grid every 5 s in [0, 50)
    val df = pts(Seq(("m", tp(10), 1.0), ("m", tp(30), 3.0)))
    val r = Series.resampleLerp(df, tp(0), tp(50), step = 5L * S)
      .orderBy("time").collect()
    assert(r.length === 10)
    assert(r(0).isNullAt(2) && r(1).isNullAt(2), "NULL before first sample")
    assert(r(2).getDouble(2) === 100.0, "grid ON a sample is exact")
    assert(r(3).getDouble(2) === 150.0, "15 s: 1/4 of the way")
    assert(r(4).getDouble(2) === 200.0 && r(5).getDouble(2) === 250.0)
    assert(r(6).getDouble(2) === 300.0)
    assert(r(7).getDouble(2) === 300.0 && r(9).getDouble(2) === 300.0,
      "forward-fill after the last sample")
  }

  test("resampleLerp uses the partner beyond the range end") {
    // grid instant 45 s sits between 40 s and a sample at 60 s — past e
    val df = pts(Seq(("m", tp(40), 1.0), ("m", tp(60), 3.0)))
    val r = Series.resampleLerp(df, tp(0), tp(50), step = 45L * S)
      .orderBy("time").collect()
    assert(r.length === 2)
    assert(r(1).getLong(1) === tp(45) && r(1).getDouble(2) === 150.0)
  }

  test("linearTrend matches the brute OLS slope and is centering-invariant") {
    // 10 s grid over [0, 100 s): perfect ramp on m (slope 100 cents/step),
    // flat on n (slope 0), plus an uneven metric checked against brute OLS
    val df = pts(
      (0 until 10).map(i => ("m", tp(i * 10L), 1.0 * (i + 1))) ++
      (0 until 10).map(i => ("n", tp(i * 10L), 7.0)) ++
      Seq(("u", tp(3), 5.0), ("u", tp(31), 2.0), ("u", tp(32), 9.0),
        ("u", tp(95), 4.0)))
    val r = Series.linearTrend(df, tp(0), tp(100), step = 10L * S)
      .orderBy("metric").collect()
    assert(r.length === 3)
    assert(r(0).getString(0) === "m" &&
      r(0).getDouble(6) === 100.0, "ramp slope in cents per step")
    assert(r(1).getString(0) === "n" && r(1).getLong(4) === 0L &&
      r(1).getDouble(6) === 0.0, "flat series has zero slope")
    // brute OLS on u with UNcentered x — translation invariance
    val xs = Seq(0L, 3L, 3L, 9L); val ys = Seq(500L, 200L, 900L, 400L)
    val n = xs.size.toLong
    val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum
    val den = n * xs.map(x => x * x).sum - xs.sum * xs.sum
    assert(r(2).getString(0) === "u" &&
      r(2).getDouble(6) === num.toDouble / den.toDouble)
  }

  test("linearTrend yields NULL slope, not NaN, for a one-bucket metric") {
    val df = pts(Seq(("m", tp(1), 1.0), ("m", tp(2), 9.0)))
    val r = Series.linearTrend(df, tp(0), tp(100), step = 10L * S).collect()
    assert(r.length === 1 && r(0).getLong(5) === 0L && r(0).isNullAt(6))
  }

  test("autoCorrelation: period-2 series peaks at even lags") {
    // bucket sums alternate 100, 300, 100, 300, ... over 8 buckets
    def corrOf(num: Long, sx2: Long, sy2: Long): Double =
      num.toDouble / (math.sqrt(sx2.toDouble) * math.sqrt(sy2.toDouble))
    val df = pts((0 until 8).map(i =>
      ("m", tp(i * 10L), if (i % 2 == 0) 1.0 else 3.0)))
    val r = Series.autoCorrelation(df, tp(0), tp(80), step = 10L * S,
        maxLag = 2).orderBy("lag").collect()
    assert(r.length === 3)
    // lag 0: num = sx2 = sy2 = 4·100² + 4·300² = 400000
    assert(r(0).getLong(1) === 0L && r(0).getLong(3) === 400000L &&
      r(0).getDouble(6) === corrOf(400000L, 400000L, 400000L))
    // lag 1 pairs every 100 with a 300 (7 overlaps): num = 7·3e4
    assert(r(1).getLong(2) === 7L && r(1).getLong(3) === 7L * 30000L)
    // lag 2 pairs equal values (6 overlaps): num == sx2 == sy2 again
    assert(r(2).getLong(2) === 6L &&
      r(2).getLong(3) === r(2).getLong(4) && r(2).getLong(4) === r(2).getLong(5))
    assert(r(1).getDouble(6) < r(2).getDouble(6), "period-2 peak at lag 2")
  }

  test("seasonalOutliers flags deviation from the hour baseline, not the global mean") {
    // hour A: flat 100s; hour B: 200, 200, 260 — baseline floor(220);
    // residuals [0,0,0,20,20,40]; p=3/4 threshold: smallest v with
    // 4·cum ≥ 6·3 → 20; only the 260 sample (resid 40) is flagged.
    // A flat global threshold would have flagged every hour-B sample.
    val df = pts(Seq(
      ("m", tp(0), 1.0), ("m", tp(10), 1.0), ("m", tp(20), 1.0),
      ("m", tp(3600), 2.0), ("m", tp(3610), 2.0), ("m", tp(3620), 2.6)))
    val r = Series.seasonalOutliers(df, tp(0), tp(7200), 3, 4).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(row.fieldIndex("time")) === tp(3620))
    assert(row.getLong(row.fieldIndex("baseline")) === 220L)
    assert(row.getLong(row.fieldIndex("resid")) === 40L)
    assert(row.getLong(row.fieldIndex("thr")) === 20L)
  }

  test("robustTrend ignores a spike the raw OLS chases") {
    // perfect ramp of bucket medians (3 samples per bucket), with one
    // enormous outlier in bucket 2 — median slope stays exactly 100
    // cents/step; raw linearTrend on the same data is dragged positive
    val base = for (bkt <- 0 until 5; j <- 0 until 3)
      yield ("m", tp(bkt * 10L + j), (bkt + 1) * 1.0)
    // spike in the LAST bucket (x = +2 after centering — max leverage;
    // a bucket-2 spike would sit at x = 0 and move nothing)
    val spiked = base :+ (("m", tp(49), 10000.0))
    val df = pts(spiked)
    val robust = Series.robustTrend(df, tp(0), tp(50), step = 10L * S)
      .collect()(0)
    assert(robust.getDouble(robust.fieldIndex("slope_cents_per_step")) === 100.0)
    val raw = Series.linearTrend(df, tp(0), tp(50), step = 10L * S)
      .collect()(0)
    assert(raw.getDouble(raw.fieldIndex("slope_cents_per_step")) > 100.0,
      "the raw slope chases the spike")
  }

  test("robustTrend median is the q54 lower selection on even buckets") {
    // bucket with values 100, 200: 2*cum(100)=2 >= n=2 → med 100
    val df = pts(Seq(("m", tp(0), 1.0), ("m", tp(1), 2.0),
      ("m", tp(10), 3.0), ("m", tp(11), 4.0)))
    val r = Series.robustTrend(df, tp(0), tp(20), step = 10L * S).collect()(0)
    // medians 100, 300 on x = -1, 0 → slope (over 2 pts) = 200
    assert(r.getLong(r.fieldIndex("n_buckets")) === 2L)
    assert(r.getDouble(r.fieldIndex("slope_cents_per_step")) === 200.0)
  }

  test("seasonalImpute fills an empty bucket from the hour-of-day median") {
    // two days, hourly grid over a 4-hour window per day is overkill —
    // use a 2-hour window [0, 2h): day-1 has both hours, day-2's data
    // arrives only for hour B... keep it single-window: grid [0, 3h),
    // samples in buckets 0 and 2, bucket 1 empty; hour-of-day median
    // for bucket 1's hour comes from bucket 1 ± 24h — so seed a sample
    // 24h earlier is outside [b,e). Instead verify the SAME-hour fill:
    // bucket 1 empty and NO sample anywhere at that hour → NULL row.
    val df = pts(Seq(
      ("m", tp(60), 1.0), ("m", tp(70), 3.0),          // bucket 0 (hour h0)
      ("m", tp(2 * 3600 + 5), 9.0)))                    // bucket 2
    val r = Series.seasonalImpute(df, tp(0), tp(3 * 3600),
        step = 3600L * S)
      .orderBy("time").collect()
    assert(r.length === 3)
    assert(r(0).getLong(r(0).fieldIndex("value_cents")) === 100L,
      "even-bucket median takes the LOWER middle (q54 rule)")
    assert(!r(0).getBoolean(r(0).fieldIndex("imputed")))
    // bucket 1: empty, and its hour has no samples anywhere → NULL
    assert(r(1).isNullAt(r(1).fieldIndex("value_cents")))
    assert(!r(1).getBoolean(r(1).fieldIndex("imputed")))
    assert(r(2).getLong(r(2).fieldIndex("value_cents")) === 900L)
    // now with a second day: bucket 25 carries the same hour as the
    // empty bucket 1 — its median fills bucket 1, flagged imputed
    val df2 = pts(Seq(
      ("m", tp(60), 1.0),
      ("m", tp(3600 + 10 + 86400), 5.0), // day-2 sample, same hour as bucket 1
      ("m", tp(2 * 3600 + 5), 9.0)))
    val r2 = Series.seasonalImpute(df2, tp(0), tp(86400 + 2 * 3600),
        step = 3600L * S)
      .orderBy("time").collect()
    val b1 = r2(1)
    assert(b1.getLong(b1.fieldIndex("value_cents")) === 500L)
    assert(b1.getBoolean(b1.fieldIndex("imputed")))
  }

  test("sloBurn: pages only when BOTH windows burn; silent hours are NULL") {
    // hour 0: 4 events, 3 errors (burn = 3·4e6/4 = 3e6 > 1e6, and the
    // 6h window equals it) → page. hour 1: 4 clean events — burn1 = 0,
    // burn6 = 3·4e6/8 = 1.5e6 > 1e6 → NOT paged (short window vetoes).
    // hour 2: silent — NULL burns, never paged.
    val df = pts(
      Seq(("error", tp(10), 1.0), ("error", tp(20), 1.0),
        ("error", tp(30), 1.0), ("ok", tp(40), 1.0)) ++
      (0 until 4).map(j => ("ok", tp(3600 + j * 10L), 1.0)))
    val r = Series.sloBurn(df, tp(0), tp(3 * 3600), "error", budgetDen = 4L)
      .orderBy("bucket").collect()
    assert(r.length === 3)
    assert(r(0).getLong(r(0).fieldIndex("burn1_e6")) === 3000000L &&
      r(0).getBoolean(r(0).fieldIndex("page")))
    assert(r(1).getLong(r(1).fieldIndex("burn1_e6")) === 0L &&
      r(1).getLong(r(1).fieldIndex("burn6_e6")) === 1500000L &&
      !r(1).getBoolean(r(1).fieldIndex("page")))
    assert(r(2).isNullAt(r(2).fieldIndex("burn1_e6")) &&
      !r(2).getBoolean(r(2).fieldIndex("page")))
  }

  test("uptimeReport: gap outages, ms-grid ratio, single-sample NULL") {
    val df = pts(Seq(
      ("m", tp(0), 1.0), ("m", tp(10), 1.0),
      ("m", tp(3600), 1.0), ("m", tp(3610), 1.0), // 3590 s outage
      ("n", tp(5), 7.0)))                          // single sample
    val r = Series.uptimeReport(df, tp(0), tp(7200),
        maxGap = 1800L * S)
      .orderBy("metric").collect()
    val m = r(0)
    assert(m.getLong(m.fieldIndex("span_ns")) === 3610L * S)
    assert(m.getLong(m.fieldIndex("downtime_ns")) === 3590L * S)
    assert(m.getLong(m.fieldIndex("n_outages")) === 1L)
    assert(m.getLong(m.fieldIndex("uptime_e6")) === 5540L)
    val n = r(1)
    assert(n.getLong(n.fieldIndex("span_ns")) === 0L &&
      n.isNullAt(n.fieldIndex("uptime_e6")))
  }

  test("theilSenTrend survives a corrupted BUCKET that bends the OLS line") {
    // bucket medians 100..500 on a perfect ramp, except bucket 4's
    // median is a dead-zero hour: pairwise slopes are 100e6/step for
    // every clean pair (6 of 10 pairs) — the median slope stays 1e8;
    // robustTrend's OLS over the same medians is dragged negative-ward
    val clean = for (bkt <- 0 until 5; j <- 0 until 3)
      yield ("m", tp(bkt * 10L + j), if (bkt == 4) 0.0 else (bkt + 1) * 1.0)
    val df = pts(clean)
    val ts = Series.theilSenTrend(df, tp(0), tp(50), step = 10L * S)
      .collect()(0)
    assert(ts.getLong(ts.fieldIndex("n_buckets")) === 5L)
    assert(ts.getLong(ts.fieldIndex("n_pairs")) === 10L)
    assert(ts.getLong(ts.fieldIndex("slope_e6_per_step")) === 100000000L)
    val ols = Series.robustTrend(df, tp(0), tp(50), step = 10L * S)
      .collect()(0)
    assert(ols.getDouble(ols.fieldIndex("slope_cents_per_step")) < 100.0,
      "the OLS-of-medians slope bends toward the dead bucket")
  }

  test("theilSenTrend quantized slope floors negative rationals") {
    // two buckets, medians 100 then 33: slope = -67e6/1 exactly; and a
    // 3-bucket case with slope -67e6/2 = -33500000 exactly — plus one
    // inexact pair: buckets 0,3 medians 100, 0 → -100e6/3 → -33333334
    val df = pts(Seq(("m", tp(0), 1.0), ("m", tp(30), 0.0),
      ("m", tp(10), 0.67)))
    val r = Series.theilSenTrend(df, tp(0), tp(40), step = 10L * S)
      .collect()(0)
    // pairs: (0,1): (67-100)e6/1 = -33e6; (0,3): -100e6/3 → floor
    // -33333334; (1,3): (0-67)e6/2 = -33.5e6. Sorted: -33500000,
    // -33333334, -33000000 → lower median -33333334
    assert(r.getLong(r.fieldIndex("slope_e6_per_step")) === -33333334L)
  }

  test("interArrivalHist buckets gaps by bit length, exact min/max") {
    // gaps in ns: 1 s → bucket 30 (2^29 ≤ 1e9 < 2^30); craft sub-ns-scale
    // gaps via eps offsets: 1, 2, 3, 16 ns
    val df = pts(Seq(("m", tp(0), 1.0), ("m", tp(0, 1), 1.0),
      ("m", tp(0, 3), 1.0), ("m", tp(0, 6), 1.0), ("m", tp(0, 22), 1.0)))
    val r = Series.interArrivalHist(df, tp(0), tp(10))
      .orderBy("bucket").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // gaps 1 (len 1), 2,3 (len 2), 16 (len 5)
    assert(r.toSeq === Seq((1L, 1L, 1L, 1L), (2L, 2L, 2L, 3L),
      (5L, 1L, 16L, 16L)))
  }

  test("bestLag finds the shift between two displaced copies of a series") {
    // n is m shifted one bucket later: best lag for (m, n) is where the
    // displaced values line up — the signature pattern 1,5,2,8,3 at
    // buckets 0-4 on m, 1-5 on n → |corr| peaks at lag +1 (m leads n)
    val sig = Seq(1.0, 5.0, 2.0, 8.0, 3.0)
    val df = pts(
      sig.zipWithIndex.map { case (v, i) => ("m", tp(i * 10L), v) } ++
      sig.zipWithIndex.map { case (v, i) => ("n", tp((i + 1) * 10L), v) })
    val r = Series.bestLag(df, tp(0), tp(70), step = 10L * S, maxLag = 3,
        minOverlap = 4L)
      .collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "m" && r(0).getString(1) === "n")
    assert(r(0).getLong(2) === 1L, "m leads n by one bucket")
    assert(r(0).getLong(3) === 5L, "all five signature buckets overlap")
    // without the overlap guard the thin extreme lag wins spuriously —
    // the artifact the minOverlap default exists for
    val unguarded = Series.bestLag(df, tp(0), tp(70), step = 10L * S,
        maxLag = 3, minOverlap = 1L).collect()
    assert(unguarded(0).getLong(2) !== 1L)
  }

  test("autoCorrelation overlap is pairwise-complete across a gap") {
    // buckets 0, 1, 3 exist; lag 1 only overlaps (0,1): one pair
    val df = pts(Seq(("m", tp(0), 1.0), ("m", tp(10), 2.0),
      ("m", tp(30), 4.0)))
    val r = Series.autoCorrelation(df, tp(0), tp(40), step = 10L * S,
        maxLag = 1).orderBy("lag").collect()
    assert(r.length === 2)
    assert(r(1).getLong(2) === 1L && r(1).getLong(3) === 100L * 200L)
  }
}
