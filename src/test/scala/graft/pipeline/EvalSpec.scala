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

  private def rankedList(rows: (Long, Long)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (doc, r) =>
      org.apache.spark.sql.Row(doc, r) }: _*),
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rnk",
        org.apache.spark.sql.types.LongType, nullable = false))))

  test("rankingAgreement counts co-presence at max depth, cumulative") {
    // A: 10,20,30,40  B: 20,10,50,30
    val a = rankedList((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L))
    val b = rankedList((20L, 1L), (10L, 2L), (50L, 3L), (30L, 4L))
    val r = Eval.rankingAgreement(a, b, k = 4).orderBy("d").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // d=1: {10}∩{20}=∅; d=2: both lists = {10,20} → 2; d=3: +∅; d=4: 30 joins
    assert(r.toSeq === Seq((1L, 0L, 0L), (2L, 2L, 1000000L),
      (3L, 2L, 666666L), (4L, 3L, 750000L)))
  }

  test("rankingAgreement ignores ranks beyond k on either side") {
    val a = rankedList((10L, 1L), (20L, 2L), (99L, 3L))
    val b = rankedList((10L, 1L), (99L, 2L))
    val r = Eval.rankingAgreement(a, b, k = 2).orderBy("d").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    // 99 is rank 3 on A — beyond k, never co-present
    assert(r.toSeq === Seq((1L, 1L), (2L, 1L)))
  }
}
