package graft.hta

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Queries.intervalJoin]] (tiled overlap join) against a driver-side
  * brute-force join, plus boundary/guard pinning and the
  * [[Series.alertEpisodes]] edge→interval collapse. */
class IntervalJoinSpec extends SparkSpec {

  private def joined(pts: Seq[(String, Long, Long)],
                     ivs: Seq[(String, Long, Long)],
                     chunk: Long): Seq[(String, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val p = pts.toDF("metric", "time", "cents")
    val i = ivs.toDF("metric", "i_start", "i_end")
    Queries.intervalJoin(p, i, Seq("metric"), chunk)
      .select("metric", "time", "cents", "i_start", "i_end")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sorted
  }

  private def brute(pts: Seq[(String, Long, Long)],
                    ivs: Seq[(String, Long, Long)]): Seq[(String, Long, Long, Long, Long)] =
    (for {
      (m, t, c) <- pts
      (m2, s, e) <- ivs
      if m == m2 && t >= s && t < e
    } yield (m, t, c, s, e)).sorted

  test("intervalJoin equals brute force on a seeded random workload") {
    val rng = new scala.util.Random(17L)
    val metrics = Seq("a", "b", "c")
    val pts = (0 until 300).map(_ =>
      (metrics(rng.nextInt(3)), rng.nextLong(10000L) - 3000L,
        rng.nextLong(100L)))
    val ivs = (0 until 60).map { _ =>
      val s = rng.nextLong(10000L) - 3500L
      (metrics(rng.nextInt(3)), s, s + rng.nextLong(2000L))
    }
    val exp = brute(pts, ivs)
    assert(exp.nonEmpty, "fixture must exercise matches")
    // chunk-width invariance: tiling must never change the result
    for (chunk <- Seq(1L, 7L, 100L, 1024L, 100000L))
      assert(joined(pts, ivs, chunk) === exp, s"chunk=$chunk")
  }

  test("intervalJoin boundary semantics: start inclusive, end exclusive") {
    val ivs = Seq(("m", 100L, 200L))
    assert(joined(Seq(("m", 100L, 1L)), ivs, 64L).nonEmpty)
    assert(joined(Seq(("m", 199L, 1L)), ivs, 64L).nonEmpty)
    assert(joined(Seq(("m", 200L, 1L)), ivs, 64L).isEmpty)
    assert(joined(Seq(("m", 99L, 1L)), ivs, 64L).isEmpty)
    // empty and inverted intervals match nothing
    assert(joined(Seq(("m", 100L, 1L)), Seq(("m", 100L, 100L)), 64L).isEmpty)
    assert(joined(Seq(("m", 100L, 1L)), Seq(("m", 200L, 100L)), 64L).isEmpty)
  }

  test("intervalJoin emits one row per overlapping interval, exactly once") {
    // two nested intervals + one disjoint; the point tiles once, so no
    // duplicate rows can appear even when the interval spans many tiles
    val pts = Seq(("m", 150L, 5L))
    val ivs = Seq(("m", 0L, 1000L), ("m", 140L, 160L), ("m", 500L, 600L))
    val got = joined(pts, ivs, 16L)
    assert(got === brute(pts, ivs))
    assert(got.length === 2)
  }

  test("intervalJoin keeps extra columns from both sides") {
    val s = spark
    import s.implicits._
    val p = Seq(("m", 10L, "px")).toDF("metric", "time", "ptag")
    val i = Seq(("m", 0L, 20L, "ix")).toDF("metric", "i_start", "i_end", "itag")
    val r = Queries.intervalJoin(p, i, Seq("metric"), 8L).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("ptag") === "px" &&
      row.getAs[String]("itag") === "ix")
  }

  test("intervalJoin maxTiles guard fails loudly on runaway intervals") {
    val s = spark
    import s.implicits._
    val p = Seq(("m", 5L, 1L)).toDF("metric", "time", "cents")
    val i = Seq(("m", 0L, 1000000L)).toDF("metric", "i_start", "i_end")
    val ex = intercept[Exception] {
      Queries.intervalJoin(p, i, Seq("metric"), 1L, maxTiles = 1000L).collect()
    }
    assert(ex.getMessage != null)
  }

  test("alertEpisodes pairs ON edges with their OFF, closes open at horizon") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      ("m", 10L, 900L, 1L), ("m", 30L, 10L, 0L), ("m", 50L, 950L, 1L),
      ("n", 20L, 990L, 1L))
      .toDF("metric", "time", "cents", "alert")
    val eps = Series.alertEpisodes(edges, horizon = 100L)
      .orderBy("metric", "i_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(eps.toSeq === Seq(("m", 10L, 30L), ("m", 50L, 100L),
      ("n", 20L, 100L)))
  }
}
