package graft.hta

import graft.SparkSpec
import graft.model.Meta
import graft.store.Warehouse

/** Telescoped A6 must be bit-identical to the correctness-tier raw fold
  * (the reference asserts the same plan equivalence via its golden suite —
  * every integral here is exact in binary64). */
class TelescopeSpec extends SparkSpec {

  private lazy val hta = Warehouse.ingest(
    fixtureDf, Meta(10 * S, 1000 * S, 10), tmpDir("tele"))

  private val probes = Seq(
    (20L, 220L),   // spans levels
    (11L, 225L),   // exactly first..last
    (110L, 130L),  // aligned
    (110L, 125L), (115L, 130L), // half-aligned
    (20L, 30L), (12L, 20L),     // sub-interval
    (1L, 230L),    // overshoots both ends → exception path
    (0L, 10L),     // before all data → exception path
    (225L, 500L))  // begins at last point → exception path

  test("telescoped == raw-fold on every probe") {
    for ((b, e) <- probes) {
      val exact = Queries.aggregateRange(fixtureDf, tp(b), tp(e)).collect().head
      val tele = Telescope.aggregateRange(hta, tp(b), tp(e)).collect().head
      assert(tele === exact, s"probe ($b, $e)")
    }
  }

  test("decomposition reads O(factor·levels) slices, not the raw range") {
    val slices = Telescope.decompose(tp(11), tp(225), Seq(10 * S, 100 * S, 1000 * S), 10)
    val rawSpan = slices.collect { case Telescope.RawEdge(b, e) => e - b }.sum
    assert(rawSpan <= 2 * 10 * S) // raw reads bounded by 2·interval_min
    val levelRows = slices.collect { case Telescope.LevelRun(i, b, e) => (e - b) / i }.sum
    assert(levelRows <= 2 * 10 * 3) // ≤ 2·factor·#levels rows
  }
}
