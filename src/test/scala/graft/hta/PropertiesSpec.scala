package graft.hta

import graft.SparkSpec
import graft.model.{IntervalScope, Scope}
import graft.streaming.StreamIngest.AggS
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Properties the reference only asserts implicitly (SURVEY §5 port plan):
  * monoid laws of the Aggregate algebra, scope-matrix containment, and the
  * skew-resistant gap lift's equivalence to the canonical one. */
class PropertiesSpec extends SparkSpec {

  /** deterministic sampling without the scalatestplus bridge (not on the
    * offline resolver) */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val genAgg: Gen[AggS] = for {
    mn <- Gen.chooseNum(-1e6, 1e6)
    mx <- Gen.chooseNum(mn, 1e6)
    s <- Gen.chooseNum(-1e9, 1e9)
    c <- Gen.chooseNum(0L, 1000000L)
    i <- Gen.chooseNum(-1e15, 1e15)
    a <- Gen.chooseNum(0L, 1000000000000L)
  } yield AggS(mn, mx, s, c, i, a)

  test("Aggregate merge is commutative and has the identity (aggregate.cpp:50-59)") {
    for ((a, b) <- samples(genAgg).zip(samples(genAgg, 400).drop(200))) {
      assert(a + b === b + a)
      assert(a + AggS.identity === a)
      assert(AggS.identity + a === a)
    }
  }

  test("Aggregate merge is associative on exact-representable values") {
    // integer-valued fields keep double addition associative — the same
    // argument the reference's goldens rely on (SURVEY §7.4)
    val genInt = for {
      mn <- Gen.chooseNum(-1000, 1000); mx <- Gen.chooseNum(mn, 1000)
      s <- Gen.chooseNum(-100000, 100000); c <- Gen.chooseNum(0L, 1000L)
      i <- Gen.chooseNum(-100000L, 100000L); a <- Gen.chooseNum(0L, 100000L)
    } yield AggS(mn, mx, s, c, i.toDouble, a)
    val xs = samples(genInt, 600)
    for (((a, b), c) <- xs.take(200).zip(xs.slice(200, 400)).zip(xs.drop(400)))
      assert(((a + b) + c) === (a + (b + c)))
  }

  test("scope containment: open ⊆ closed ⊆ extended on any range") {
    val probes = Seq((tp(20), tp(220)), (tp(11), tp(225)), (tp(0), tp(11)), (tp(225), tp(300)))
    for ((b, e) <- probes) {
      def n(sb: Scope, se: Scope) =
        Scoped.scopedRange(fixtureDf, b, e, IntervalScope(sb, se)).count()
      import Scope._
      assert(n(Open, Open) <= n(Closed, Closed))
      assert(n(Closed, Closed) <= n(Extended, Extended))
      assert(n(Closed, Open) <= n(Closed, Closed))
      assert(n(Extended, Extended) <= n(Infinity, Infinity))
    }
  }

  test("gapLiftChunked == gapLift for any chunk width (skew-resistance is free)") {
    for (chunk <- Seq(7 * S, 50 * S, 1000 * S)) {
      val a = AggOps.gapLift(fixtureDf)
        .select("metric", "time", "prev_time").orderBy("time").collect()
      val b = AggOps.gapLiftChunked(fixtureDf, chunk)
        .select("metric", "time", "prev_time").orderBy("time").collect()
      assert(a.toSeq === b.toSeq, s"chunk $chunk")
    }
  }

  test("aggregateRange is chunk-width invariant (de-skewed A6 == plain fold)") {
    // chunkWidth large enough that every metric fits one chunk reproduces the
    // plain per-metric fold; small widths exercise the boundary stitching
    val probes = Seq((tp(20), tp(220)), (tp(11), tp(225)), (tp(0), tp(500)))
    for ((b, e) <- probes) {
      val plain = Queries.aggregateRange(fixtureDf, b, e,
        chunkWidth = Some(Long.MaxValue / 4)).orderBy("metric").collect()
      for (cw <- Seq(7 * S, 50 * S)) {
        val chunked = Queries.aggregateRange(fixtureDf, b, e,
          chunkWidth = Some(cw)).orderBy("metric").collect()
        assert(plain.toSeq === chunked.toSeq, s"range ($b,$e) chunk $cw")
      }
    }
  }

  test("levelBuild with chunked lift is identical to canonical") {
    val a = AggOps.levelBuild(fixtureDf, 10 * S).orderBy("time").collect()
    val b = AggOps.levelBuild(fixtureDf, 10 * S, chunkWidth = Some(35 * S))
      .orderBy("time").collect()
    assert(a.toSeq === b.toSeq)
  }
}
