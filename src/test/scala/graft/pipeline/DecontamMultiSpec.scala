package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Multi-benchmark decontamination: per-suite attribution equals the
  * single-suite tier run per suite; fan-out, fallback and totals pinned. */
class DecontamMultiSpec extends SparkSpec {

  private def mkDocs(rows: (Long, String)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, t) => Row(i, t) }: _*),
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType))))

  private val evalA = "alpha beta gamma delta epsilon zeta eta theta"
  private val evalB = "one two three four five six seven eight nine ten"
  private val corpus = mkDocs(
    // shares evalA's full 8-gram
    1L -> ("noise prefix " + evalA + " and a tail of fresh words here"),
    // shares a gram with BOTH suites
    2L -> (evalA + " bridging words " + evalB),
    // clean
    3L -> "completely different content with no overlap at all in any gram",
    // short doc, whole-text fallback, exact copy of a short eval doc
    4L -> "tiny eval stub")
  private val bench = {
    val rows = Seq((10L, evalA, "sA"), (11L, evalB, "sB"),
      (12L, "tiny eval stub", "sB"))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType), StructField("suite", StringType))))
  }

  test("per-suite rows equal the single-suite tier run per suite") {
    val multi = Dedup.decontaminateMulti(corpus, bench, n = 8)
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    for (suite <- Seq("sA", "sB")) {
      val single = Dedup.decontaminate(corpus,
          bench.where(col("suite") === suite).drop("suite"), n = 8)
        .where(col("n_overlap") > 0)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val slice = multi.collect { case ((d, s), v) if s == suite => d -> v }
      assert(slice == single, s"suite $suite")
    }
  }

  test("attribution shapes: single-suite, both-suites, clean, fallback") {
    val got = Dedup.decontaminateMulti(corpus, bench, n = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((1L, "sA")) && !got.contains((1L, "sB")))
    assert(got.contains((2L, "sA")) && got.contains((2L, "sB")))
    assert(!got.exists(_._1 == 3L))
    assert(got.contains((4L, "sB"))) // whole-text fallback hash matched
  }

  test("doc_id collisions across suites do not cross-pollinate gram sets") {
    // both suites number their docs from 0 — the normal case for
    // unrelated benchmarks; suite attribution must still be exact
    val rows = Seq((0L, evalA, "sA"), (0L, evalB, "sB"))
    val collidingBench = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
      bench.schema)
    val got = Dedup.decontaminateMulti(corpus, collidingBench, n = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((1L, "sA")) && !got.contains((1L, "sB")),
      "doc 1 overlaps only evalA's text")
    assert(got.contains((2L, "sA")) && got.contains((2L, "sB")))
  }

  test("a doc listed under two suites contaminates both") {
    val dupBench = bench.unionByName(
      bench.where(col("doc_id") === 10L).withColumn("suite", lit("sB")))
    val got = Dedup.decontaminateMulti(corpus, dupBench, n = 8)
      .where(col("doc_id") === 1L).collect().map(_.getString(1)).toSet
    assert(got == Set("sA", "sB"))
  }
}
