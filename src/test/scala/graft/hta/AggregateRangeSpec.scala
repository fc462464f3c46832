package graft.hta

import graft.SparkSpec
import graft.model.Meta
import org.apache.spark.sql.Row

/** Port of /root/reference/tests/aggregate.cpp:64-395 (exact range aggregate
  * A6 incl. partial edges, clamping, ±inf-on-empty) and the
  * active_time == end-begin regression suite (:397-521). */
class AggregateRangeSpec extends SparkSpec {

  private def agg(b: Long, e: Long): Row =
    Queries.aggregateRange(fixtureDf, b, e).collect().head

  private val ns = 1e9

  test("begin >= end throws (aggregate.cpp:121-135)") {
    intercept[IllegalArgumentException](Queries.aggregateRange(fixtureDf, tp(10), tp(1)))
    intercept[IllegalArgumentException](Queries.aggregateRange(fixtureDf, tp(11), tp(11)))
  }

  test("interval between first and last raw value (aggregate.cpp:141-156)") {
    val r = agg(tp(20), tp(220))
    assert(r.getAs[Long]("count") === 108)
    assert(r.getAs[Double]("minimum") === -36.0)
    assert(r.getAs[Double]("maximum") === 45.0)
    assert(r.getAs[Double]("sum") === 1985.0)
    val integral = (-36.0 * 1) + (-30.0 * 21) + (-20.0 * 6) + (-10.0 * 5) + (0.0 * 14) +
      (-10.0 * 13) + (20.0 * 119) + (31.0 * 4) + (35.0 * 14) + (45.0 * 2) + (35.0 * 1)
    assert(r.getAs[Long]("active_time") === 200 * S)
    assert(r.getAs[Double]("integral") === integral * ns)
  }

  test("interval exactly first to last timestamp (aggregate.cpp:158-173)") {
    val r = agg(tp(11), tp(225))
    assert(r.getAs[Long]("count") === 109)
    assert(r.getAs[Double]("minimum") === -37.0)
    assert(r.getAs[Double]("maximum") === 45.0)
    assert(r.getAs[Double]("sum") === 1948.0)
    val integral = (-36.0 * 10) + (-30.0 * 21) + (-20.0 * 6) + (-10.0 * 5) + (0.0 * 14) +
      (-10.0 * 13) + (20.0 * 119) + (31.0 * 4) + (35.0 * 14) + (45.0 * 2) + (35.0 * 6)
    assert(r.getAs[Long]("active_time") === 214 * S)
    assert(r.getAs[Double]("integral") === integral * ns)
  }

  test("interval beyond both ends clamps (aggregate.cpp:175-183)") {
    val r = agg(tp(1), tp(230))
    assert(r.getAs[Long]("count") === 109)
    assert(r.getAs[Long]("active_time") === 214 * S)
    assert(r.getAs[Double]("sum") === 1948.0)
  }

  test("medium aligned/unaligned intervals (aggregate.cpp:186-222)") {
    for ((b, e, n) <- Seq((110L, 130L, 20L), (110L, 125L, 15L), (115L, 130L, 15L))) {
      val r = agg(tp(b), tp(e))
      assert(r.getAs[Long]("count") === n)
      assert(r.getAs[Double]("minimum") === 20.0)
      assert(r.getAs[Double]("maximum") === 20.0)
      assert(r.getAs[Long]("active_time") === (e - b) * S)
      assert(r.getAs[Double]("integral") / r.getAs[Long]("active_time") === 20.0)
    }
  }

  test("tiny interval containing one raw value (aggregate.cpp:226-235)") {
    val r = agg(tp(20), tp(30))
    assert(r.getAs[Long]("count") === 1)
    assert(r.getAs[Double]("minimum") === -36.0)
    assert(r.getAs[Double]("maximum") === -30.0)
    assert(r.getAs[Double]("integral") / r.getAs[Long]("active_time") ===
      (-36.0 - 9 * 30.0) / 10.0)
    assert(r.getAs[Long]("active_time") === 10 * S)
  }

  test("point-to-point intervals (aggregate.cpp:237-261)") {
    val a = agg(tp(11), tp(21))
    assert(a.getAs[Long]("count") === 1)
    assert(a.getAs[Double]("minimum") === -37.0)
    assert(a.getAs[Double]("maximum") === -36.0)
    assert(a.getAs[Double]("integral") / a.getAs[Long]("active_time") === -36.0)
    assert(a.getAs[Long]("active_time") === 10 * S)

    val b = agg(tp(21), tp(42))
    assert(b.getAs[Long]("count") === 1)
    assert(b.getAs[Double]("sum") === -36.0)
    assert(b.getAs[Double]("minimum") === -36.0)
    assert(b.getAs[Double]("maximum") === -30.0)
    assert(b.getAs[Double]("integral") / b.getAs[Long]("active_time") === -30.0)
    assert(b.getAs[Long]("active_time") === 21 * S)
  }

  test("interval strictly between two raw values (aggregate.cpp:263-273)") {
    val r = agg(tp(12), tp(20))
    assert(r.getAs[Long]("count") === 0)
    assert(r.getAs[Double]("minimum") === -36.0)
    assert(r.getAs[Double]("maximum") === -36.0)
    assert(r.getAs[Double]("sum") === 0.0)
    assert(r.getAs[Double]("integral") / r.getAs[Long]("active_time") === -36.0)
    assert(r.getAs[Long]("active_time") === 8 * S)
  }

  test("first row interval + before-first-row identity (aggregate.cpp:275-332)") {
    val first = agg(tp(10), tp(20))
    assert(first.getAs[Long]("active_time") === 9 * S)
    assert(first.getAs[Long]("count") === 1)
    assert(first.getAs[Double]("sum") === -37.0)
    assert(first.getAs[Double]("integral") === -36.0 * 9 * ns)

    val empty = agg(tp(0), tp(10))
    assert(empty.getAs[Long]("count") === 0)
    assert(empty.getAs[Double]("minimum") === Double.PositiveInfinity)
    assert(empty.getAs[Double]("maximum") === Double.NegativeInfinity)
    assert(empty.getAs[Double]("integral") === 0.0)
    assert(empty.getAs[Long]("active_time") === 0L)
  }

  test("edge cases around the last timestamp (aggregate.cpp:336-372)") {
    val after = agg(tp(501), tp(504))
    assert(after.getAs[Long]("count") === 0)
    assert(after.getAs[Double]("minimum") === Double.PositiveInfinity)

    val onLast = agg(tp(225), tp(504))
    assert(onLast.getAs[Long]("count") === 0)
    assert(onLast.getAs[Double]("minimum") === 35.0)
    assert(onLast.getAs[Double]("maximum") === 35.0)
    assert(onLast.getAs[Long]("active_time") === 0L)
    assert(onLast.getAs[Double]("integral") === 0.0)

    val beforeLast = agg(tp(225, -1), tp(504))
    assert(beforeLast.getAs[Long]("active_time") === 1L)
    assert(beforeLast.getAs[Long]("count") === 0)
    assert(beforeLast.getAs[Double]("minimum") === 35.0)
    assert(beforeLast.getAs[Double]("integral") === 35.0)
  }

  test("edge cases around the first timestamp (aggregate.cpp:374-395)") {
    val before = agg(tp(1), tp(10))
    assert(before.getAs[Long]("count") === 0)
    assert(before.getAs[Double]("minimum") === Double.PositiveInfinity)

    val onFirst = agg(tp(1), tp(11))
    assert(onFirst.getAs[Long]("count") === 0)
    assert(onFirst.getAs[Double]("minimum") === Double.PositiveInfinity)
    assert(onFirst.getAs[Long]("active_time") === 0L)

    val pastFirst = agg(tp(1), tp(11, 1))
    assert(pastFirst.getAs[Long]("active_time") === 1L)
    assert(pastFirst.getAs[Long]("count") === 1)
    assert(pastFirst.getAs[Double]("sum") === -37.0)
    assert(pastFirst.getAs[Double]("integral") === -36.0)
  }

  test("active_time == end-begin invariant at 40s levels (aggregate.cpp:397-521)") {
    val pts = pointsDf(Seq(
      1696102100L * S -> 42.0, 1696112100L * S -> 42.0, 1697112100L * S -> 42.0),
      metric = "bar")
    val probes = Seq(
      (1696111200000000000L, 1696112080000000000L),
      (1696111200000000000L, 1696112100000000000L),
      (1696111300000000000L, 1696112100000000000L),
      (1696111100000000000L, 1696112100000000000L),
      (1696111300000000000L, 1696112200000000000L),
      (1696112100000000000L, 1696113000000000000L),
      (1696113000000000000L, 1696113900000000000L),
      (1696113900000000000L, 1696114800000000000L))
    for ((b, e) <- probes) {
      val r = Queries.aggregateRange(pts, b, e).collect().head
      assert(r.getAs[Long]("active_time") === e - b, s"probe ($b,$e)")
    }
  }
}
