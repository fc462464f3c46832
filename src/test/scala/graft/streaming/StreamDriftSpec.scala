package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** With the reference set to the corpus's own global counts, streamed
  * drift rows must land BIT-EQUAL to batch mixDrift (q150), whatever
  * the micro-batch slicing. */
class StreamDriftSpec extends SparkSpec {

  test("streamed mixDrift == batch q150 when reference = global counts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ev = graft.registry.Tables.events(s, "/root/testdata/sf0.001")
      .select("metric", "time")
    val ref = ev.groupBy("metric").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.pipeline.Profile.mixDrift(ev, "metric", "time")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))).toMap
    val all = ev.collect()
      .map(r => StreamDrift.Ev(r.getString(0), r.getLong(1))).toSeq
    for (cut <- Seq(0, all.size / 2)) {
      val mem = MemoryStream[StreamDrift.Ev]
      val q = StreamDrift.mixDrift(mem.toDS(), ref).toDF()
        .writeStream.format("memory").queryName(s"drift_$cut")
        .outputMode("update").start()
      try {
        val (a, b) = all.splitAt(cut)
        if (a.nonEmpty) { mem.addData(a: _*); q.processAllAvailable() }
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(s"drift_$cut")
        .groupBy("day")
        .agg(max_by(struct(col("n_day"), col("l1_e6"), col("top_type"),
          col("top_dev_e6")), col("n_day")).as("r"))
        .collect()
        .map(r => r.getLong(0) -> {
          val x = r.getStruct(1)
          (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3))
        }).toMap
      assert(got === want, s"cut=$cut")
    }
  }

  test("a live category absent from the reference counts its full mass") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamDrift.Ev]
    val q = StreamDrift.mixDrift(mem.toDS(), Map("a" -> 1L)).toDF()
      .writeStream.format("memory").queryName("drift_new")
      .outputMode("update").start()
    try {
      // day mix: 1×a, 1×b vs reference 100% a:
      // dev_a = |1·1 − 1·2| = 1, dev_b = |1·1 − 0| = 1 → l1 = 2e6/2 = 1e6
      mem.addData(StreamDrift.Ev("a", 10L), StreamDrift.Ev("b", 20L))
      q.processAllAvailable()
      val r = s.table("drift_new").collect()
      assert(r.length === 1 && r(0).getLong(2) === 1000000L)
      assert(r(0).getString(3) === "b", "dev tie breaks to the larger name")
    } finally q.stop()
  }
}
