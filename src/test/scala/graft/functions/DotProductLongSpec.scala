package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd graft_dot expression must be indistinguishable from the
  * interpreted zip_with/aggregate form it replaces — on values, on NULL
  * semantics (null input, null element, length mismatch), and it must be
  * registered in every graft session (GraftSession carries
  * GraftExtensions). */
class DotProductLongSpec extends SparkSpec {

  private def dotExpr = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x * y), lit(0L),
      (acc, x) => acc + x)

  test("graft_dot is registered and bit-identical to the zip_with form") {
    val s = spark
    import s.implicits._
    assert(s.catalog.functionExists("graft_dot"),
      "GraftExtensions must register graft_dot in graft sessions")
    val rng = new scala.util.Random(42)
    val rows = Seq.tabulate(200) { i =>
      val n = 1 + rng.nextInt(80)
      (i.toLong, Seq.fill(n)(rng.nextLong() % 100000L),
        Seq.fill(n)(rng.nextLong() % 100000L))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(col("id"),
        call_function("graft_dot", col("a"), col("b")).as("fast"),
        dotExpr("a", "b").as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"mismatch at id ${r.getLong(0)}")
    }
  }

  test("graft_dot null semantics match zip_with: mismatch/null-element/null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[Long]](Some(1L), Some(2L))),
        Some(Seq[Option[Long]](Some(3L)))), // length mismatch
      (2L, Some(Seq[Option[Long]](Some(1L), None)),
        Some(Seq[Option[Long]](Some(3L), Some(4L)))), // null element
      (3L, None, Some(Seq[Option[Long]](Some(3L)))), // null input
      (4L, Some(Seq[Option[Long]](Some(2L), Some(3L))),
        Some(Seq[Option[Long]](Some(5L), Some(7L))))) // clean: 31
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        call_function("graft_dot", col("a"), col("b")).as("fast"),
        dotExpr("a", "b").as("ref"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null mismatch at ${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getLong(1) === r.getLong(2))
    }
    assert(got.take(3).forall(_.isNullAt(1)))
    assert(got(3).getLong(1) === 31L)
  }

  test("graft_dot participates in whole-stage codegen (no fallback)") {
    // a Range source, not a local Seq: ConvertToLocalRelation would fold a
    // literal input into a LocalTableScan with no codegen stage to inspect
    val df = spark.range(5)
      .select(array(lit(2L), col("id")).as("a"), array(lit(3L), lit(10L)).as("b"))
      .select(col("a"), call_function("graft_dot", col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the compact plan marks whole-stage-codegen operators with a "*(n)"
    // prefix; the Project evaluating graft_dot must carry it
    assert(plan.split("\n").exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*(")),
      s"graft_dot should stay inside whole-stage codegen:\n$plan")
    // 2*3 + id*10
    assert(df.orderBy("d").collect().map(_.getLong(1)).toSeq ===
      Seq(6L, 16L, 26L, 36L, 46L))
  }
}
