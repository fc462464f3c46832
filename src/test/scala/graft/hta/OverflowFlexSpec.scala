package graft.hta

import graft.SparkSpec
import graft.model.{IntervalScope, Meta, Scope}
import graft.store.Warehouse
import org.apache.spark.sql.functions._

/** Ports of /root/reference/tests/overflow.cpp:45-128 (int64 safety near
  * level boundaries, exact set of populated levels), tests/flex.cpp:110-133
  * (variant selection), tests/basics.cpp:42-95 (roundtrip), and
  * tests/middle_interval.cpp:59-111 (dense series, mid-hierarchy read). */
class OverflowFlexSpec extends SparkSpec {

  test("overflow.cpp: populated level set and capped level selection") {
    val swap = 1440000000000000000L
    val delta = 20000L
    val step = 1440000000000000L
    val meta = Meta(14400000000000L, 1440000000000000L, 10)
    val pts = pointsDf(Seq(
      (swap - delta) -> 42.0, (swap + delta) -> 43.0, (swap + step + delta) -> 44.0))
    val hta = Warehouse.ingest(pts, meta, tmpDir("overflow"))

    // levels 14400000000000, 144000000000000, 1440000000000000 populated;
    // nothing beyond interval_max (overflow.cpp:93-97)
    val present = hta.levels.select("interval").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(present === Set(14400000000000L, 144000000000000L, 1440000000000000L))

    val sc = IntervalScope(Scope.Extended, Scope.Closed)
    val maxI = 1440000000000000L
    // raw-limit retrieval: 2 points
    assert(RetrieveFlex.retrieveFlex(hta, swap - delta, swap + delta, 1000000L, sc,
      smooth = false).count() === 2)
    // top-level retrieval: 2 rows at interval_max
    val r1 = RetrieveFlex.retrieveFlex(hta, swap - delta, swap + delta, maxI, sc,
      smooth = false).orderBy("time").collect()
    assert(r1.length === 2)
    assert(r1.forall(_.getAs[Long]("interval") === maxI))
    // limit beyond interval_max stays capped (no multiplyExact overflow)
    val r2 = RetrieveFlex.retrieveFlex(hta, swap - delta, swap + delta,
      Math.multiplyExact(maxI, 11L), sc, smooth = false).orderBy("time").collect()
    assert(r2.length === 2)
    assert(r2.forall(_.getAs[Long]("interval") === maxI))
  }

  test("flex.cpp: variant selection by interval_upper_limit") {
    val hta = Warehouse.ingest(fixtureDf, Meta(10 * S, 1000 * S, 10), tmpDir("flexsel"))
    // limit 1s < interval_min → raw (110 interval-0 rows)
    val raw = RetrieveFlex.retrieveFlex(hta, tp(0), tp(300), 1 * S, smooth = false)
    assert(raw.count() === 110)
    assert(raw.select("interval").distinct().collect().head.getLong(0) === 0L)
    // limit 10s → level rows
    val rows = RetrieveFlex.retrieveFlex(hta, tp(0), tp(300), 10 * S, smooth = false)
    assert(rows.count() === 21)
    assert(rows.select("interval").distinct().collect().head.getLong(0) === 10 * S)
  }

  test("basics.cpp: single-sample roundtrip with zero integral/active_time") {
    val hta = Warehouse.ingest(pointsDf(Seq(tp(23) -> 42.0)),
      Meta(10 * S, 1000 * S, 10), tmpDir("basics"))
    val r = RetrieveFlex.retrieveMinSamples(hta, tp(0), tp(100), 100)
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("time") === tp(23))
    assert(r.head.getAs[Double]("sum") === 42.0)
    assert(r.head.getAs[Long]("count") === 1L)
    assert(r.head.getAs[Double]("integral") === 0.0)
    assert(r.head.getAs[Long]("active_time") === 0L)
  }

  test("middle_interval.cpp: dense 20µs series, mid-hierarchy retrieval") {
    val n = 100000L
    val spacing = 20000L // 20 µs
    val meta = Meta(1000000L, 1000000000L, 10) // 1ms … 1s ladder
    val pts = spark.range(n).select(
      lit("foo").as("metric"),
      (lit(tp(0)) + col("id") * spacing).as("time"),
      col("id").cast("double").as("value"))
    val hta = Warehouse.ingest(pts, meta, tmpDir("middle"))
    // span = 2s; ask for ~200 rows → 10ms level
    val r = RetrieveFlex.retrieveFlex(hta, tp(0), tp(0) + n * spacing, 10000000L,
      smooth = false)
    assert(r.select("interval").distinct().collect().head.getLong(0) === 10000000L)
    val rows = r.orderBy("time").collect()
    assert(rows.length === (n * spacing / 10000000L - 1)) // last bucket open
    // every full 10ms bucket holds 500 points
    assert(rows.forall(_.getAs[Long]("count") === 500L))
  }
}
