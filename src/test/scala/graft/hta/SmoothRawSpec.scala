package graft.hta

import graft.SparkSpec
import graft.model.{IntervalScope, Meta, Scope}
import graft.streaming.StreamIngest
import graft.streaming.StreamIngest.{IngestState, Sample}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Hand-computed goldens for the quirky convert_timevalues_smooth semantics
  * (src/metric.cpp:259-311) and a randomized stream-vs-batch equivalence
  * property over arbitrary monotone series. */
class SmoothRawSpec extends SparkSpec {

  test("smoothRaw quirks: pre-begin seeding, unclipped first gap, end partials") {
    // points at 10s/25s/40s with values 1/2/3; windows of 10s on [20s, 50s)
    val pts = pointsDf(Seq(10L -> 1.0, 25L -> 2.0, 40L -> 3.0).map { case (t, v) => tp(t) -> v })
    val scoped = Scoped.scopedRange(pts, tp(20), tp(50),
      IntervalScope(Scope.Extended, Scope.Open))
    val rows = Queries.smoothRaw(scoped, tp(20), tp(50), 10 * S)
      .orderBy("time").collect()
    assert(rows.length === 3)
    // [20,30): point 25 carries its FULL gap from the pre-begin point at 10
    // (the reference does not clip the first gap at begin), plus the partial
    // of the next point (40) up to the window end
    assert(rows(0).getAs[Long]("time") === tp(20))
    assert(rows(0).getAs[Double]("minimum") === 2.0)
    assert(rows(0).getAs[Double]("maximum") === 3.0)
    assert(rows(0).getAs[Double]("sum") === 2.0)
    assert(rows(0).getAs[Long]("count") === 1)
    assert(rows(0).getAs[Double]("integral") === (2.0 * 15 + 3.0 * 5) * 1e9)
    assert(rows(0).getAs[Long]("active_time") === 20 * S)
    // [30,40): pure carry of point 40's value, count 0
    assert(rows(1).getAs[Long]("count") === 0)
    assert(rows(1).getAs[Double]("sum") === 0.0)
    assert(rows(1).getAs[Double]("integral") === 3.0 * 10 * 1e9)
    assert(rows(1).getAs[Long]("active_time") === 10 * S)
    // [40,50): the point itself with zero gap
    assert(rows(2).getAs[Long]("count") === 1)
    assert(rows(2).getAs[Double]("sum") === 3.0)
    assert(rows(2).getAs[Double]("integral") === 0.0)
    assert(rows(2).getAs[Long]("active_time") === 0L)
  }

  test("retrieveFlex raw branch smooths only metrics denser than the limit") {
    val meta = Meta(10 * S, 1000 * S, 10)
    val hta = graft.store.Warehouse.ingest(fixtureDf, meta, tmpDir("smoothflex"))
    // limit 2s < interval_min; in [100,130) avg spacing 1s < 2s → smoothed
    val r = RetrieveFlex.retrieveFlex(hta, tp(100), tp(130), 2 * S, smooth = true)
      .orderBy("time").collect()
    assert(r.length === 15) // 30s / 2s windows
    assert(r.forall(_.getAs[Long]("interval") === 2 * S))
    assert(r.map(_.getAs[Long]("count")).sum === 30 - 1) // 101..129, window partials
  }

  test("property: streaming fold == batch levelBuild on random monotone series") {
    val meta = Meta(10 * S, 1000 * S, 10)
    val genSeries: Gen[Seq[(Long, Double)]] = for {
      n <- Gen.chooseNum(5, 120)
      ts <- Gen.listOfN(n, Gen.chooseNum(1L, 5000L * 1000)) // ms in [0, 5000s]
      vs <- Gen.listOfN(n, Gen.chooseNum(-50, 50))
    } yield ts.distinct.sorted.zip(vs).map { case (ms, v) => (tp(0) + ms * 1000000L, v.toDouble) }

    for (seed <- 0 until 8) {
      val series = genSeries(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = pointsDf(series)
      val (rows, _) = StreamIngest.foldBatch("foo",
        series.map { case (t, v) => Sample("foo", t, v) }, IngestState(0L, Map.empty), meta)
      for (i <- Seq(10 * S, 100 * S, 1000 * S)) {
        val batch = AggOps.levelBuild(df, i).orderBy("time").collect()
          .map(r => (r.getAs[Long]("time"), r.getAs[Double]("minimum"),
            r.getAs[Double]("maximum"), r.getAs[Double]("sum"), r.getAs[Long]("count"),
            r.getAs[Double]("integral"), r.getAs[Long]("active_time"))).toSeq
        val stream = rows.filter(_.interval == i).sortBy(_.time)
          .map(r => (r.time, r.minimum, r.maximum, r.sum, r.count, r.integral, r.active_time))
        assert(stream === batch, s"seed $seed interval $i")
      }
    }
  }
}
