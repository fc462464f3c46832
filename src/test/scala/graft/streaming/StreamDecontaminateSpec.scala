package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed epsilon-ball flags must land BIT-EQUAL to the batch
  * epsilonJoin (q160) on the same data, whatever the micro-batch
  * slicing — the filter-on-ingest twin of the batch sweep. */
class StreamDecontaminateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed flags == batch epsilonJoin across micro-batch slicings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.where("vec_id % 10 <> 0")
    val probes = emb.where("vec_id % 10 = 0")
    val want = graft.pipeline.Ann.epsilonJoin(corpus, probes, 140000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "threshold must produce hits at sf0.001")
    val pArr = StreamDecontaminate.quantizeProbes(
      probes.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq)
    val rows = corpus.select("vec_id", "embedding").collect()
      .map(r => StreamDecontaminate.Vec(r.getLong(0), r.getSeq[Float](1))).toSeq
    for (cut <- Seq(0, rows.size / 3, rows.size / 2)) {
      val mem = MemoryStream[StreamDecontaminate.Vec]
      val q = StreamDecontaminate.flag(mem.toDS(), pArr, 140000000L).toDF()
        .writeStream.format("memory").queryName(s"decon_$cut")
        .outputMode("append").start()
      try {
        val (a, b) = rows.splitAt(cut)
        if (a.nonEmpty) { mem.addData(a: _*); q.processAllAvailable() }
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(s"decon_$cut").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"cut=$cut")
    }
  }

  test("clean vectors emit nothing; an exact duplicate flags at d2=0") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val probe = Array(Array(10000L, 0L, 0L))
    val mem = MemoryStream[StreamDecontaminate.Vec]
    val q = StreamDecontaminate.flag(mem.toDS(), probe, 0L).toDF()
      .writeStream.format("memory").queryName("decon_dup")
      .outputMode("append").start()
    try {
      mem.addData(
        StreamDecontaminate.Vec(1L, Seq(1f, 0f, 0f)),    // exact probe dup
        StreamDecontaminate.Vec(2L, Seq(0.9f, 0f, 0f)))  // near but d2 > 0
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("decon_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 0L)))
  }
}
