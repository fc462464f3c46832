package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed per-dimension moments must land BIT-EQUAL to the batch
  * q128 operator on the same vectors, whatever the micro-batch
  * slicing. */
class StreamStatsSpec extends SparkSpec {

  test("streamed dimMoments == batch embeddingStats, any slicing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val want = graft.pipeline.Ann.embeddingStats(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => StreamStats.Vec(r.getLong(0), r.getSeq[Float](1))).toSeq
    for (cut <- Seq(0, all.size / 3, all.size)) {
      val mem = MemoryStream[StreamStats.Vec]
      val q = StreamStats.dimMoments(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(s"mom_$cut")
        .outputMode("update").start()
      try {
        val (a, b) = all.splitAt(cut)
        if (a.nonEmpty) { mem.addData(a: _*); q.processAllAvailable() }
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      // settled row per dim = the emission with the largest n
      val got = s.table(s"mom_$cut")
        .groupBy("dim")
        .agg(max_by(struct(col("n"), col("sum_q"), col("sumsq_q"),
          col("min_q"), col("max_q"), col("mean_q")), col("n")).as("r"))
        .collect()
        .map(r => r.getLong(0) -> {
          val x = r.getStruct(1)
          (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
            x.getLong(4), x.getLong(5))
        }).toMap
      assert(got === want, s"cut=$cut")
    }
  }

  test("mid-stream emissions carry running (not final) moments") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamStats.Vec]
    val q = StreamStats.dimMoments(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("mom_run")
      .outputMode("update").start()
    try {
      mem.addData(StreamStats.Vec(1L, Seq(1.0f)))
      q.processAllAvailable()
      val first = s.table("mom_run").collect()
      assert(first.length === 1 && first(0).getLong(1) === 1L &&
        first(0).getLong(2) === 10000L)
      mem.addData(StreamStats.Vec(2L, Seq(-1.25f)))
      q.processAllAvailable()
      val rows = s.table("mom_run").orderBy("n").collect()
      assert(rows.length === 2)
      // running: n=2, sum=-2500, min=-12500, max=10000, mean floor(-1250)
      val r2 = rows(1)
      assert(r2.getLong(1) === 2L && r2.getLong(2) === -2500L &&
        r2.getLong(4) === -12500L && r2.getLong(5) === 10000L &&
        r2.getLong(6) === -1250L)
    } finally q.stop()
  }
}
