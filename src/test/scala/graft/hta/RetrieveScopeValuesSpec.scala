package graft.hta

import graft.SparkSpec
import graft.model.{IntervalScope, Scope}

/** Value-level port of /root/reference/tests/retrieve.cpp:214-488 — the full
  * 3×3 raw-retrieval scope matrix with borders exactly on raw points
  * ([42 s, 67 s]) and between points ([40 s, 50 s]); every returned
  * (time, value) pair is pinned, not just counts. */
class RetrieveScopeValuesSpec extends SparkSpec {

  import Scope._
  private def got(b: Long, e: Long, sb: Scope, se: Scope): Seq[(Long, Double)] =
    Scoped.scopedRange(fixtureDf, tp(b), tp(e), IntervalScope(sb, se))
      .orderBy("time").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Double]("value"))).toSeq

  private def pts(s: (Long, Double)*): Seq[(Long, Double)] =
    s.map { case (t, v) => tp(t) -> v }

  test("borders exactly on raw points: [42s, 67s] (retrieve.cpp:214-346)") {
    val p42 = 42L -> -30.0; val p48 = 48L -> -20.0
    val p53 = 53L -> -10.0; val p67 = 67L -> 0.0
    assert(got(42, 67, Open, Open) === pts(p48, p53))
    assert(got(42, 67, Open, Closed) === pts(p48, p53, p67))
    assert(got(42, 67, Open, Extended) === pts(p48, p53, p67))
    assert(got(42, 67, Closed, Open) === pts(p42, p48, p53))
    assert(got(42, 67, Closed, Closed) === pts(p42, p48, p53, p67))
    assert(got(42, 67, Closed, Extended) === pts(p42, p48, p53, p67))
    assert(got(42, 67, Extended, Open) === pts(p42, p48, p53))
    assert(got(42, 67, Extended, Closed) === pts(p42, p48, p53, p67))
    assert(got(42, 67, Extended, Extended) === pts(p42, p48, p53, p67))
  }

  test("borders between raw points: [40s, 50s] (retrieve.cpp:348-488)") {
    val p21 = 21L -> -36.0; val p42 = 42L -> -30.0
    val p48 = 48L -> -20.0; val p53 = 53L -> -10.0
    assert(got(40, 50, Open, Open) === pts(p42, p48))
    assert(got(40, 50, Open, Closed) === pts(p42, p48))
    assert(got(40, 50, Open, Extended) === pts(p42, p48, p53))
    assert(got(40, 50, Closed, Open) === pts(p42, p48))
    assert(got(40, 50, Closed, Closed) === pts(p42, p48))
    assert(got(40, 50, Closed, Extended) === pts(p42, p48, p53))
    assert(got(40, 50, Extended, Open) === pts(p21, p42, p48))
    assert(got(40, 50, Extended, Closed) === pts(p21, p42, p48))
    assert(got(40, 50, Extended, Extended) === pts(p21, p42, p48, p53))
  }
}
