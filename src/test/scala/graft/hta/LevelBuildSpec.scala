package graft.hta

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Golden values transcribed from /root/reference/tests/retrieve.cpp:133-206
  * (the 21-row 10 s level table and the 2-row 100 s table) — these pin the
  * A1 monoid, A2 gap lift, A3 boundary split and A4/A5 level builds. */
class LevelBuildSpec extends SparkSpec {

  private lazy val level10 =
    AggOps.levelBuild(fixtureDf, 10 * S).orderBy("time").collect()
  private lazy val level100 =
    AggOps.rollup(AggOps.levelBuild(fixtureDf, 10 * S), 10 * S, 100 * S)
      .orderBy("time").collect()

  private def check(r: Row, time: Long, min: Double, max: Double, sum: Double,
                    count: Long, integral: Double, active: Long): Unit = {
    assert(r.getAs[Long]("time") === time)
    assert(r.getAs[Double]("minimum") === min)
    assert(r.getAs[Double]("maximum") === max)
    assert(r.getAs[Double]("sum") === sum)
    assert(r.getAs[Long]("count") === count)
    assert(r.getAs[Double]("integral") === integral)
    assert(r.getAs[Long]("active_time") === active)
  }

  test("10s level has 21 closed rows t=10..210 (retrieve.cpp:138)") {
    assert(level10.length === 21)
    assert(level10.head.getAs[Long]("time") === tp(10))
    assert(level10.last.getAs[Long]("time") === tp(210))
  }

  test("10s level row goldens (retrieve.cpp:140-172)") {
    val ns = 1e9
    check(level10(0), tp(10), -37, -36, -37, 1, 9 * ns * -36.0, 9 * S)
    check(level10(1), tp(20), -36, -30, -36, 1, ns * (-36.0 + 9 * -30.0), 10 * S)
    check(level10(2), tp(30), -30, -30, 0, 0, ns * (10 * -30.0), 10 * S)
    check(level10(3), tp(40), -30, -10, -50, 2,
      ns * (2 * -30.0 + 6 * -20.0 + 2 * -10.0), 10 * S)
    check(level10(20), tp(210), 35, 45, 80, 2,
      ns * (7 * 35.0 + 2 * 45.0 + 1 * 35.0), 10 * S)
  }

  test("100s rollup rows (retrieve.cpp:177-205)") {
    assert(level100.length === 2)
    val ns = 1e9
    val integral0 = (10 * -36.0 + 21 * -30.0 + 6 * -20.0 + 5 * -10.0 + 14 * 0.0 +
      13 * -10.0 + 20 * 20.0) * ns
    check(level100(0), tp(0), -37, 20, -37 - 36 - 30 - 20 - 10 + 0 - 10, 7,
      integral0, 89 * S)
    check(level100(1), tp(100), 20, 31, 99 * 20.0, 99,
      (99 * 20.0 + 1 * 31.0) * ns, 100 * S)
  }

  test("rollup(levelBuild(i), i, p) equals levelBuild(p) directly (monoid)") {
    val direct = AggOps.levelBuild(fixtureDf, 100 * S).orderBy("time").collect()
    assert(direct.length === level100.length)
    direct.zip(level100).foreach { case (a, b) => assert(a === b) }
  }

  test("A10 means: mean prefers integral/active_time (types.hpp:72-89)") {
    val m = AggOps.withMeans(AggOps.levelBuild(fixtureDf, 10 * S))
      .orderBy("time").collect()
    assert(m(0).getAs[Double]("mean") === (9e9 * -36.0) / (9 * S))
    assert(m(0).getAs[Double]("mean_sum") === -37.0)
  }
}
