package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamCdc.Change
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed compaction's final per-key rows must equal the batch
  * latestByKey survivors, whatever the micro-batch slicing, with
  * out-of-order (late) changes losing to the held maximum. */
class StreamCdcSpec extends SparkSpec {

  test("streamed latest == batch latestByKey across micro-batch slicings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // interleaved updates incl. a LATE change for key a (t=5 after t=20)
    // and a same-t tie for key b decided by seq
    val all = Seq(
      Change("a", 10L, 1L, "a1"), Change("b", 3L, 2L, "b1"),
      Change("a", 20L, 3L, "a2"), Change("b", 3L, 4L, "b2"),
      Change("a", 5L, 5L, "late-loses"), Change("c", 1L, 6L, "c1"),
      Change("b", 7L, 7L, "b3"), Change("a", 20L, 8L, "a3"))
    val batch = graft.pipeline.Cdc
      .latestByKey(all.toDF(), Seq("key"), Seq("t", "seq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    for (cut <- Seq(1, 4, 8)) {
      val mem = MemoryStream[Change]
      val q = StreamCdc.latest(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(s"cdc_$cut")
        .outputMode("update").start()
      try {
        val (x, y) = all.splitAt(cut)
        mem.addData(x: _*); q.processAllAvailable()
        if (y.nonEmpty) { mem.addData(y: _*); q.processAllAvailable() }
      } finally q.stop()
      // the memory sink logs every update; the CURRENT row per key is the
      // (t, seq)-max emission, which must equal the batch survivor
      val got = s.table(s"cdc_$cut")
        .groupBy("key")
        .agg(max_by(struct(col("key"), col("t"), col("seq"), col("payload")),
          struct(col("t"), col("seq"))).as("r"))
        .select("r.*")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      assert(got === batch, s"slicing at $cut")
      // emissions are change-only: a key's final row is emitted once per
      // batch at most, and a batch with no improvement emits nothing
      val emissions = s.table(s"cdc_$cut").count()
      assert(emissions <= 2L * 3, s"too many emissions at cut=$cut")
    }
  }

  test("a batch that only replays dominated changes emits nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Change]
    val q = StreamCdc.latest(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("cdc_replay")
      .outputMode("update").start()
    try {
      mem.addData(Change("k", 10L, 1L, "v1")); q.processAllAvailable()
      val afterFirst = s.table("cdc_replay").count()
      mem.addData(Change("k", 10L, 1L, "v1"), Change("k", 4L, 0L, "old"))
      q.processAllAvailable()
      val afterReplay = s.table("cdc_replay").count()
      assert(afterFirst === 1L && afterReplay === 1L)
    } finally q.stop()
  }
}
