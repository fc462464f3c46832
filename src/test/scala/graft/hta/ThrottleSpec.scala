package graft.hta

import graft.SparkSpec

/** F4 — cooldown semantics of /root/reference/src/tools/throttle.cpp:57-92:
  * keep a point iff last_kept + cooldown < t (first point always kept). */
class ThrottleSpec extends SparkSpec {

  test("cooldown keeps first point and then spaced points") {
    val pts = pointsDf(Seq(0L, 1L, 2L, 3L, 10L, 11L, 25L).map(s => tp(s) -> 1.0))
    val kept = Throttle.throttle(pts, 9 * S).orderBy("time")
      .collect().map(_.getAs[Long]("time"))
    assert(kept.toSeq === Seq(tp(0), tp(10), tp(25)))
  }

  test("exact boundary: last_kept + cooldown == t is NOT kept") {
    val pts = pointsDf(Seq(0L, 9L, 10L).map(s => tp(s) -> 1.0))
    val kept = Throttle.throttle(pts, 10 * S).orderBy("time")
      .collect().map(_.getAs[Long]("time"))
    // 0 kept; 9: 0+10 < 9 false; 10: 0+10 < 10 false → only the first survives
    assert(kept.toSeq === Seq(tp(0)))
  }

  test("per-metric independence") {
    val s = spark
    import s.implicits._
    val pts = Seq(("a", tp(0), 1.0), ("a", tp(5), 1.0), ("b", tp(5), 1.0), ("b", tp(6), 1.0))
      .toDF("metric", "time", "value")
    val kept = Throttle.throttle(pts, 4 * S).orderBy("metric", "time").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(kept.toSeq === Seq(("a", tp(0)), ("a", tp(5)), ("b", tp(5))))
  }
}
