package graft.hta

import graft.SparkSpec

/** Pins valueQuantiles' rank arithmetic: percentile_disc semantics via
  * 100*cum >= n*p, uniform and skewed histograms, range filtering. */
class QuantilesSpec extends SparkSpec {

  test("valueQuantiles implements percentile_disc rank selection exactly") {
    val s = spark
    import s.implicits._
    // m1: one point per value 1..10 — p50 rank ceil(5.0)=5 -> 5,
    // p95 rank ceil(9.5)=10 -> 10, p99 rank ceil(9.9)=10 -> 10
    val m1 = (1 to 10).map(i => ("m1", i.toLong, i.toLong))
    // m2: skewed histogram (9 x value 7, 1 x value 100) — p50 -> 7,
    // p95/p99 -> 100 (the selection walks the cumulative histogram,
    // not row ranks)
    val m2 = (1 to 9).map(i => ("m2", 100L + i, 7L)) :+ (("m2", 110L, 100L))
    val df = (m1 ++ m2).toDF("metric", "time", "cents")
    val r = Queries.valueQuantiles(df, 0L, 1000L, Seq(50, 95, 99))
      .orderBy("metric", "p").collect()
      .map(x => (x.getAs[String]("metric"), x.getAs[Long]("p"),
        x.getAs[Long]("q_cents"), x.getAs[Long]("n")))
    assert(r.toSeq === Seq(
      ("m1", 50L, 5L, 10L), ("m1", 95L, 10L, 10L), ("m1", 99L, 10L, 10L),
      ("m2", 50L, 7L, 10L), ("m2", 95L, 100L, 10L), ("m2", 99L, 100L, 10L)))
    // the time-range filter applies before the histogram
    assert(Queries.valueQuantiles(df, 0L, 1L, Seq(50)).count() === 0L)
  }
}
