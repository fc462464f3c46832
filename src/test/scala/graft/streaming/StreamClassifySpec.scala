package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed classifier-gate scores must land BIT-EQUAL to the batch
  * scoreDocs under the same weight table, whatever the micro-batch
  * slicing — the live twin of the q158 apply path. */
class StreamClassifySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed scores == batch scoreDocs across micro-batch slicings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val train = docs.where("lang IN ('en','de') AND doc_id % 5 <> 0")
    val w = graft.pipeline.TextOps.tokenWeights(train, "lang", "en", "de")
    val wMap = w.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.pipeline.TextOps.scoreDocs(
        docs.select("doc_id", "text"), w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want.values.exists(_ != 0L), "weights must move some scores")
    val rows = docs.select("doc_id", "text").collect()
      .map(r => StreamClassify.Doc(r.getLong(0), r.getString(1))).toSeq
    for (cut <- Seq(0, rows.size / 2)) {
      val mem = MemoryStream[StreamClassify.Doc]
      val q = StreamClassify.gate(mem.toDS(), wMap).toDF()
        .writeStream.format("memory").queryName(s"gate_$cut")
        .outputMode("append").start()
      try {
        val (a, b) = rows.splitAt(cut)
        if (a.nonEmpty) { mem.addData(a: _*); q.processAllAvailable() }
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(s"gate_$cut").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"cut=$cut")
      // keep flag is exactly score >= 0 under the default gate
      val flags = s.table(s"gate_$cut").collect()
        .map(r => r.getLong(1) >= 0L == r.getBoolean(2)).forall(identity)
      assert(flags)
    }
  }

  test("minScore shifts the gate; empty text scores 0") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamClassify.Doc]
    val q = StreamClassify.gate(mem.toDS(),
        Map("good" -> 10L, "bad" -> -10L), minScore = 15L).toDF()
      .writeStream.format("memory").queryName("gate_min").start()
    try {
      mem.addData(
        StreamClassify.Doc(1L, "good good"),  // 20 ≥ 15 → keep
        StreamClassify.Doc(2L, "good"),       // 10 < 15 → drop
        StreamClassify.Doc(3L, ""),           // empty token, unseen → 0
        StreamClassify.Doc(4L, "good bad good good")) // 20 → keep
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("gate_min").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set((1L, 20L, true), (2L, 10L, false),
      (3L, 0L, false), (4L, 20L, true)))
  }
}
