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

  // ---- approxDistinct (HLL) ----

  /** Driver-side reference HLL with the identical md5 60-bit derivation. */
  private def refHll(values: Seq[String], p: Int): (Long, Long, Double) = {
    val m = 1 << p
    val wBits = 60 - p
    val maxRank = wBits + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = new Array[Long](m)
    for (v <- values) {
      val hex = md.digest(v.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val j = (h >>> wBits).toInt
      val w = h & ((1L << wBits) - 1)
      val rank = if (w == 0) maxRank.toLong
        else maxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > regs(j)) regs(j) = rank
    }
    val zi = regs.map(mj => 1L << (maxRank - mj)).sum
    val zeroRegs = regs.count(_ == 0L).toLong
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scale = math.pow(2.0, 2.0 * p + maxRank)
    (zi, zeroRegs, alpha * (scale / zi.toDouble))
  }

  test("approxDistinct registers match the reference HLL bit-exactly") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11L)
    val vals = (0 until 3000).map(_ => s"u${rng.nextInt(800)}")
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    for (p <- Seq(4, 9, 12)) {
      val r = Sketches.approxDistinct(df, Seq("g"), "v", p).collect()
      assert(r.length === 1)
      val (zi, zr, est) = refHll(vals, p)
      assert(r.head.getLong(1) === zi, s"zi p=$p")
      assert(r.head.getLong(2) === zr, s"zero_regs p=$p")
      assert(r.head.getDouble(3) === est, s"est_raw p=$p")
    }
  }

  test("approxDistinct estimates within HLL error bounds, per group") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13L)
    // group a: ~5000 distinct; group b: ~800 distinct (with repeats)
    val rows = (0 until 20000).map(_ => ("a", s"x${rng.nextInt(5000)}")) ++
      (0 until 5000).map(_ => ("b", s"y${rng.nextInt(800)}"))
    val df = rows.toDF("g", "v")
    val exact = df.groupBy("g").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.approxDistinct(df, Seq("g"), "v", p = 9)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((g, d) <- exact) {
      val rel = math.abs(est(g) - d) / d
      assert(rel < 0.15, s"group $g: est=${est(g)} exact=$d rel=$rel")
    }
  }

  test("approxDistinct is partitioning-invariant and merges by max") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(19L)
    val df = (0 until 4000).map(_ => ("g", s"k${rng.nextInt(1500)}"))
      .toDF("g", "v")
    val one = Sketches.approxDistinct(df.repartition(1), Seq("g"), "v")
      .collect().map(_.toSeq).toSeq
    val many = Sketches.approxDistinct(df.repartition(13), Seq("g"), "v")
      .collect().map(_.toSeq).toSeq
    assert(one === many)
  }

  test("approxDistinctSliding: window 1 == per-day sketches; wide window == global") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23L)
    val day = 86400000000000L
    val df = (0 until 2000).map { _ =>
      ("g", rng.nextInt(10).toLong * day + rng.nextInt(1000).toLong,
        s"u${rng.nextInt(300)}")
    }.toDF("g", "time", "v")
    val slide1 = Sketches.approxDistinctSliding(df, Seq("g"), "v", "time",
        windowDays = 1).orderBy("day")
      .collect().map(r => (r.getLong(r.fieldIndex("day")),
        r.getLong(r.fieldIndex("zi")))).toSeq
    val perDay = Sketches.approxDistinct(
        df.withColumn("day", expr("time div 86400000000000L")),
        Seq("g", "day"), "v").orderBy("day")
      .collect().map(r => (r.getLong(r.fieldIndex("day")),
        r.getLong(r.fieldIndex("zi")))).toSeq
    assert(slide1 === perDay)
    // a window covering the whole span: last day's merge == global sketch
    val wide = Sketches.approxDistinctSliding(df, Seq("g"), "v", "time",
        windowDays = 10).orderBy(col("day").desc)
      .collect().head
    val global = Sketches.approxDistinct(df, Seq("g"), "v").collect().head
    assert(wide.getLong(wide.fieldIndex("zi")) ===
      global.getLong(global.fieldIndex("zi")))
    assert(wide.getDouble(wide.fieldIndex("est_raw")) ===
      global.getDouble(global.fieldIndex("est_raw")))
  }

  private def cmsFixture: DataFrame = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7L)
    (0 until 3000).map(_ => s"u${rng.nextInt(40)}").toDF("v")
  }

  test("countMin never underestimates and is exact at generous width") {
    val df = cmsFixture
    val probes = (0 until 45).map(i => s"u$i") // u40..u44 absent
    // tight width: collisions certain (40 values in 16 cells)
    val tight = Sketches.countMinEstimates(df, "v", probes,
      depth = 4, width = 16).collect()
    assert(tight.length === 45)
    tight.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS underestimated ${r.getString(0)}")
    }
    // absent probes: exact 0 (est may still collide upward)
    val absent = (40 until 45).map(i => s"u$i").toSet
    assert(tight.filter(r => absent(r.getString(0))).forall(_.getLong(2) === 0L))
    // generous width: whp no row has all-4 collisions -> est == exact
    val wide = Sketches.countMinEstimates(df, "v", probes,
      depth = 4, width = 4096).collect()
    wide.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"width 4096 should be collision-free for ${r.getString(0)}"))
  }

  test("countMin registers: every depth row sums to n; partition-invariant") {
    val df = cmsFixture
    val regs = Sketches.countMinRegisters(df, "v", depth = 4, width = 16)
    val perRow = regs.groupBy("j").agg(sum("cnt").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow.keySet === Set(0, 1, 2, 3))
    assert(perRow.values.forall(_ === 3000L))
    val a = regs.collect().map(_.toSeq).toSet
    val b = Sketches.countMinRegisters(df.repartition(13), "v",
      depth = 4, width = 16).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("hdrQuantiles: within one bucket width of the exact percentile") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7L)
    val data = (1 to 4000).map(_ => ("k", math.abs(rng.nextLong()) % 1000000L))
      .toDF("k", "v")
    val m = 5
    val got = Sketches.hdrQuantiles(data, Seq("k"), "v", Seq(50, 90, 99), m)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val sorted = data.collect().map(_.getLong(1)).sorted
    for (p <- Seq(50, 90, 99)) {
      // exact percentile under the same selection rule
      val exact = sorted((math.ceil(sorted.length * p / 100.0) - 1).toInt.max(0))
      val (approx, n) = got(p.toLong)
      assert(n === 4000L)
      assert(approx <= exact, s"p$p: bucket min must lower-bound the exact")
      assert(exact <= approx + (approx >> m) + 1,
        s"p$p: exact $exact beyond bucket width above $approx")
    }
  }

  test("hdr registers merge by (sum, min) and values below 2^(m+1) are exact") {
    val s = spark
    import s.implicits._
    val all = (1 to 600).map(i => ("g", (i * 7919L) % 5000L)).toDF("k", "v")
    val m = 5
    val full = Sketches.hdrRegisters(all, Seq("k"), "v", m)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val h1 = Sketches.hdrRegisters(all.where(col("v") % 2 === 0), Seq("k"), "v", m)
    val h2 = Sketches.hdrRegisters(all.where(col("v") % 2 === 1), Seq("k"), "v", m)
    val merged = h1.unionByName(h2)
      .groupBy("k", "_b")
      .agg(sum("_cnt").as("_cnt"), min("_vmin").as("_vmin"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged === full)
    // small-value regime: B(v) = v, so the sketch IS the exact histogram
    val small = (1 to 200).map(i => ("s", (i % 60).toLong)).toDF("k", "v")
    val exact50 = small.collect().map(_.getLong(1)).sorted.apply(
      (math.ceil(200 * 0.5) - 1).toInt)
    val q = Sketches.hdrQuantiles(small, Seq("k"), "v", Seq(50), m)
      .collect().head.getLong(2)
    assert(q === exact50)
  }

  // ======================= setSimilarityMatrix ==========================

  test("setSimilarityMatrix: identical sets estimate 1, disjoint sets exact 0") {
    val s = spark
    import s.implicits._
    val df = ((1 to 50).map(i => ("a", i.toLong * 7919)) ++
      (1 to 50).map(i => ("b", i.toLong * 7919)) ++      // b == a
      (1 to 30).map(i => ("c", 1000000L + i * 104729)))  // c disjoint
      .toDF("src", "h")
    val out = Sketches.setSimilarityMatrix(df, "src", col("h"), k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // identical sets: every per-hash min matches, exact J = 1
    assert(out(("a", "b")) === ((16L, 50L, 50L, 1000000L)))
    // disjoint: exact inter 0, union 80, jaccard 0 (estimate unasserted —
    // min collisions across disjoint sets are possible in principle)
    val (_, i0, u0, j0) = out(("a", "c"))
    assert(i0 === 0L && u0 === 80L && j0 === 0L)
    assert(out.size === 3)
  }

  test("setSimilarityMatrix estimate tracks exact Jaccard on testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sketches.setSimilarityMatrix(docs, "source",
        TextOps.md5Long(col("text")), k = 32).collect()
    assert(out.length === 190) // 20 sources choose 2
    // deterministic hash family → this is a fixed number, not a flaky
    // sample: mean |est − exact| over the 190 pairs stays inside the
    // k=32 binomial error band
    val errs = out.map(r =>
      math.abs(r.getLong(r.fieldIndex("est_jaccard_e6")) -
        r.getLong(r.fieldIndex("jaccard_e6"))))
    assert(errs.sum / errs.length < 150000L,
      s"mean |est-exact| = ${errs.sum / errs.length}")
    out.foreach { r =>
      val m = r.getLong(r.fieldIndex("est_matches"))
      assert(m >= 0L && m <= 32L)
    }
  }
}
