package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Sketches.heavyHitters]] against exact groupBy truth: the Misra-Gries
  * candidate pass may admit extras but must never drop a true heavy hitter,
  * and the exact recount must make the output identical to the plain
  * aggregate under every partitioning. */
class SketchesSpec extends SparkSpec {

  private def exactTruth(df: DataFrame, k: Int): Set[(String, Long)] = {
    val n = df.count()
    df.groupBy("v").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  private def hh(df: DataFrame, k: Int): Set[(String, Long)] =
    Sketches.heavyHitters(df, "v", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  private def skewed(seed: Long, n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(seed)
    // zipf-ish: value id = floor of an inverse-power draw over 50 values
    (0 until n).map { _ =>
      val u = rng.nextDouble()
      s"v${math.min(49, (math.pow(u, 3) * 50).toInt)}"
    }.toDF("v")
  }

  test("heavyHitters equals the exact aggregate on skewed data") {
    for ((seed, k) <- Seq((3L, 5), (4L, 20), (5L, 40))) {
      val df = skewed(seed, 4000).cache()
      assert(hh(df, k) === exactTruth(df, k), s"seed=$seed k=$k")
      assert(exactTruth(df, k).nonEmpty, "fixture should have heavy hitters")
      df.unpersist()
    }
  }

  test("heavyHitters is partitioning-invariant (MG recall under any split)") {
    val df = skewed(11L, 3000)
    val truth = exactTruth(df, 10)
    for (p <- Seq(1, 3, 17))
      assert(hh(df.repartition(p), 10) === truth, s"partitions=$p")
  }

  test("heavyHitters boundary: count*k must strictly exceed n") {
    val s = spark
    import s.implicits._
    // 4 a's of 12 rows, k=3: 4*3 = 12 is NOT > 12 — excluded exactly
    val at = (Seq.fill(4)("a") ++ (0 until 8).map(i => s"u$i")).toDF("v")
    assert(hh(at, 3) === Set.empty)
    // 5 a's of 12: 15 > 12 — included with its exact count
    val over = (Seq.fill(5)("a") ++ (0 until 7).map(i => s"u$i")).toDF("v")
    assert(hh(over, 3) === Set(("a", 5L)))
  }

  test("heavyHitters excludes nulls and survives empty input") {
    val s = spark
    import s.implicits._
    val withNulls = (Seq.fill(5)(Some("a")) ++ Seq.fill(3)(None) ++
      Seq(Some("b"))).toDF("v")
    // n counts non-null rows only (SQL count semantics): 6 rows, k=2 → >3
    assert(hh(withNulls, 2) === Set(("a", 5L)))
    assert(hh(Seq.empty[String].toDF("v"), 5) === Set.empty)
  }
}
