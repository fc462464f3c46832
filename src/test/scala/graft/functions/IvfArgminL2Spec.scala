package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd graft_ivf_argmin expression must reproduce the engine's
  * historical RDD assignment loop bit-for-bit: exact int64 Σ(v−c)², ties
  * kept at the SMALLEST centroid index (strict-< scan), and NULL on the
  * degenerate inputs the loop could never produce an answer for. */
class IvfArgminL2Spec extends SparkSpec {

  /** the r16 RDD-map semantics, verbatim */
  private def refAssign(v: Array[Long], cs: Seq[Array[Long]]): (Long, Long) = {
    var best = 0; var bestD = Long.MaxValue
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      var d = 0L; var k = 0
      while (k < v.length) { val t = v(k) - c(k); d += t * t; k += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    (best.toLong, bestD)
  }

  test("graft_ivf_argmin is registered and matches the RDD loop bit-for-bit") {
    val s = spark
    import s.implicits._
    assert(s.catalog.functionExists("graft_ivf_argmin"),
      "GraftExtensions must register graft_ivf_argmin in graft sessions")
    val rng = new scala.util.Random(7)
    val dim = 16
    val cents = Seq.fill(9)(Array.fill(dim)(rng.nextLong() % 10000L))
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(dim)(rng.nextLong() % 10000L)))
    val centLit = typedlit(cents.map(_.toSeq))
    val got = rows.toDF("id", "v")
      .select(col("id"),
        call_function("graft_ivf_argmin", col("v"), centLit).as("bd"))
      .select(col("id"), col("bd.list_id"), col("bd.adist"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) === refAssign(v.toArray, cents), s"mismatch at id $id")
    }
  }

  test("ties keep the smallest centroid index") {
    val s = spark
    import s.implicits._
    // two identical centroids at indices 1 and 2: winner must be 1
    val cents = Seq(Seq(100L, 100L), Seq(3L, 4L), Seq(3L, 4L))
    val got = Seq((0L, Seq(3L, 4L))).toDF("id", "v")
      .select(call_function("graft_ivf_argmin", col("v"),
        typedlit(cents)).as("bd"))
      .select(col("bd.list_id"), col("bd.adist")).collect()(0)
    assert(got.getLong(0) === 1L)
    assert(got.getLong(1) === 0L)
  }

  test("null semantics: empty matrix, length mismatch, null element") {
    val s = spark
    import s.implicits._
    val v = Seq(1L, 2L)
    def run(cents: org.apache.spark.sql.Column) =
      Seq((0L, v)).toDF("id", "v")
        .select(call_function("graft_ivf_argmin", col("v"), cents).as("bd"))
        .collect()(0)
    assert(run(typedlit(Seq.empty[Seq[Long]])).isNullAt(0))
    assert(run(typedlit(Seq(Seq(1L)))).isNullAt(0)) // dim mismatch
    assert(run(typedlit(Seq(Seq(Some(1L), None)))).isNullAt(0)) // null element
  }

  test("graft_ivf_argmin participates in whole-stage codegen (no fallback)") {
    val centLit = typedlit(Seq(Seq(0L, 0L), Seq(10L, 10L)))
    val df = spark.range(5)
      .select(array(col("id"), lit(1L)).as("v"))
      .select(call_function("graft_ivf_argmin", col("v"), centLit).as("bd"))
      .select(col("bd.list_id").as("l"), col("bd.adist").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks whole-stage-codegen operators; the evaluating Project
    // sits below tree-drawing prefixes ("+- "), so strip those first
    assert(plan.split("\n").exists(l =>
      l.contains("graft_ivf_argmin") &&
        l.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':')
          .startsWith("*(")),
      s"graft_ivf_argmin should stay inside whole-stage codegen:\n$plan")
    // id 0..4 with v=(id,1): closer to (0,0) while id²+1 < (id−10)²+81
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 5L).map { id =>
      val d0 = id * id + 1L
      val d1 = (id - 10L) * (id - 10L) + 81L
      if (d0 <= d1) (0L, d0) else (1L, d1)
    }
    assert(got === want)
  }
}
