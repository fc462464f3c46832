package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class EvalSpec extends SparkSpec {

  private def ranking(rows: (Long, Long)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (q, v) => Row(q, v) }: _*),
    StructType(Seq(StructField("qid", LongType, nullable = false),
      StructField("vid", LongType, nullable = false))))

  test("recallAtK: identical rankings score a full recall") {
    val exact = ranking((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (2L, 22L))
    val out = Eval.recallAtK(exact, exact, k = 3).orderBy("qid").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ===
      Seq((1L, 3L, 1000000L), (2L, 3L, 1000000L)))
  }

  test("recallAtK: partial overlap counts hits; integer fixed-point ratio") {
    val exact = ranking((1L, 10L), (1L, 11L), (1L, 12L))
    val approx = ranking((1L, 11L), (1L, 99L), (1L, 12L))
    val out = Eval.recallAtK(approx, exact, k = 3).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 2L && r.getLong(2) === 3L &&
      r.getLong(3) === 666666L) // floor(2e6/3), both engines' div
  }

  test("recallAtK: a query the approx tier dropped reads recall 0, not a missing row") {
    val exact = ranking((1L, 10L), (2L, 20L))
    val approx = ranking((1L, 10L))
    val out = Eval.recallAtK(approx, exact, k = 1).orderBy("qid").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 0L)))
  }
}
