package graft.hta

import graft.SparkSpec
import graft.model.{IntervalScope, Scope}

/** Port of /root/reference/tests/count.cpp:61-170+ — A7 count over range with
  * the full 3×3 scope matrix, begin==end cases, and default-scope counts. */
class CountScopeSpec extends SparkSpec {

  private def cnt(b: Long, e: Long,
                  sc: IntervalScope = IntervalScope.rawDefault): Long =
    Scoped.scopedRange(fixtureDf, b, e, sc).count()

  private def is(b: Scope, e: Scope) = IntervalScope(b, e)
  import Scope._

  test("count() totals and begin==end (count.cpp:117-140)") {
    assert(fixtureDf.count() === 110)
    assert(cnt(tp(1), tp(1)) === 1)   // extended end grabs the first point
    assert(cnt(tp(11), tp(11)) === 1)
    assert(cnt(tp(85), tp(85)) === 1)
    assert(cnt(tp(225), tp(225)) === 1)
    assert(cnt(tp(250), tp(250)) === 0)
  }

  test("scope matrix: borders between points (count.cpp:142-158)") {
    assert(cnt(tp(20), tp(220)) === 109)
    assert(cnt(tp(20), tp(220), is(Open, Open)) === 108)
    assert(cnt(tp(20), tp(220), is(Open, Closed)) === 108)
    assert(cnt(tp(20), tp(220), is(Open, Extended)) === 109)
    assert(cnt(tp(20), tp(220), is(Closed, Open)) === 108)
    assert(cnt(tp(20), tp(220), is(Closed, Closed)) === 108)
    assert(cnt(tp(20), tp(220), is(Closed, Extended)) === 109)
    assert(cnt(tp(20), tp(220), is(Extended, Open)) === 109)
    assert(cnt(tp(20), tp(220), is(Extended, Closed)) === 109)
    assert(cnt(tp(20), tp(220), is(Extended, Extended)) === 110)
  }

  test("scope matrix: borders exactly on points (count.cpp:160-176)") {
    assert(cnt(tp(11), tp(225)) === 110)
    assert(cnt(tp(11), tp(225), is(Open, Open)) === 108)
    assert(cnt(tp(11), tp(225), is(Open, Closed)) === 109)
    assert(cnt(tp(11), tp(225), is(Open, Extended)) === 109)
    assert(cnt(tp(11), tp(225), is(Closed, Open)) === 109)
    assert(cnt(tp(11), tp(225), is(Closed, Closed)) === 110)
    assert(cnt(tp(11), tp(225), is(Closed, Extended)) === 110)
    assert(cnt(tp(11), tp(225), is(Extended, Open)) === 109)
    assert(cnt(tp(11), tp(225), is(Extended, Closed)) === 110)
    assert(cnt(tp(11), tp(225), is(Extended, Extended)) === 110)
  }

  test("infinity scopes return everything") {
    assert(cnt(tp(100), tp(100), is(Infinity, Infinity)) === 110)
    assert(cnt(tp(100), tp(200), is(Infinity, Open)) === 106)
    assert(cnt(tp(100), tp(200), is(Closed, Infinity)) === 103)
  }
}
