package graft.streaming

import graft.SparkSpec
import graft.hta.AggOps
import graft.model.Meta
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ingest cascade must emit exactly the closed rows the batch
  * level build materializes — across any micro-batch slicing (state
  * checkpoint parity with tests/restore.cpp). */
class StreamIngestSpec extends SparkSpec {
  import StreamIngest._

  private val meta = Meta(10 * S, 1000 * S, 10)

  private def batchRows(interval: Long) =
    AggOps.levelBuild(fixtureDf, interval).orderBy("time").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Double]("minimum"),
        r.getAs[Double]("maximum"), r.getAs[Double]("sum"), r.getAs[Long]("count"),
        r.getAs[Double]("integral"), r.getAs[Long]("active_time"))).toSeq

  test("foldBatch cascade == batch levelBuild on the canonical fixture") {
    val samples = fixture110.map { case (t, v) => Sample("foo", t, v) }
    val (rows, st) = foldBatch("foo", samples, IngestState(0L, Map.empty), meta)
    for (i <- Seq(10 * S, 100 * S)) {
      val got = rows.filter(_.interval == i).sortBy(_.time)
        .map(r => (r.time, r.minimum, r.maximum, r.sum, r.count, r.integral, r.active_time))
      assert(got === batchRows(i), s"interval $i")
    }
    assert(rows.count(_.interval == 1000 * S) === 0)
    assert(st.previousTime === tp(225))
  }

  test("cascade is slicing-invariant (restore parity)") {
    val samples = fixture110.map { case (t, v) => Sample("foo", t, v) }
    val whole = foldBatch("foo", samples, IngestState(0L, Map.empty), meta)._1
    var st = IngestState(0L, Map.empty)
    val pieces = Seq(3, 7, 30, 31, 80, samples.length)
    var prev = 0
    val acc = Seq.newBuilder[ClosedRow]
    for (c <- pieces) {
      val (rows, st1) = foldBatch("foo", samples.slice(prev, c), st, meta)
      acc ++= rows; st = st1; prev = c
    }
    assert(acc.result() === whole)
  }

  test("non-monotonic and zero timestamps are rejected (F5)") {
    intercept[IllegalArgumentException](
      foldBatch("foo", Seq(Sample("foo", 0L, 1.0)), IngestState(0L, Map.empty), meta))
    intercept[IllegalArgumentException](
      foldBatch("foo", Seq(Sample("foo", tp(2), 1.0), Sample("foo", tp(2), 2.0)).sortBy(_.time),
        IngestState(0L, Map.empty), meta))
  }

  test("sinkToWarehouse writes a levels table batch readers can open") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = tmpDir("streamwh")
    val mem = MemoryStream[Sample]
    // seed the raw dir so Warehouse.open works (stream only sinks levels)
    fixtureDf.withColumn("tb", lit(0L)).write.partitionBy("tb").parquet(s"$root/raw")
    val q = StreamIngest.sinkToWarehouse(mem.toDS(), meta, root, tmpDir("ckpt"))
    try {
      mem.addData(fixture110.map { case (t, v) => Sample("foo", t, v) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val hta = graft.store.Warehouse.open(s, root)
    val got = hta.levels.where(col("interval") === 10 * S).orderBy("time").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Double]("minimum"),
        r.getAs[Double]("maximum"), r.getAs[Double]("sum"), r.getAs[Long]("count"),
        r.getAs[Double]("integral"), r.getAs[Long]("active_time"))).toSeq
    assert(got === batchRows(10 * S))
  }

  test("replayed micro-batch publishes no duplicate closed rows (exactly-once)") {
    val root = tmpDir("replaywh")
    val rows = AggOps.levelBuild(fixtureDf, 10 * S).withColumn("interval", lit(10 * S))
    // same batch id published twice = a micro-batch retry after a failure
    StreamIngest.publishLevelBatch(rows, root, bid = 7L)
    val once = spark.read.parquet(s"$root/levels").count()
    StreamIngest.publishLevelBatch(rows, root, bid = 7L)
    val twice = spark.read.parquet(s"$root/levels").count()
    assert(once === twice, "replay must not duplicate closed rows")
    // partial-publish crash: delete the marker (simulates dying before
    // commit), republish — still exactly one copy of every row
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_stream_commits/levels/7"), false)
    StreamIngest.publishLevelBatch(rows, root, bid = 7L)
    assert(spark.read.parquet(s"$root/levels").count() === once)
    // a different batch id appends (not overwrites)
    StreamIngest.publishLevelBatch(rows.limit(3), root, bid = 8L)
    assert(spark.read.parquet(s"$root/levels").count() === once + 3)
  }

  test("legacy flat commit markers still suppress replay and satisfy compact") {
    val root = tmpDir("legacymarker")
    val rows = AggOps.levelBuild(fixtureDf, 10 * S).withColumn("interval", lit(10 * S))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a store written before per-table markers: publish, then move
    // the marker to the old flat location _stream_commits/<bid>
    StreamIngest.publishLevelBatch(rows, root, bid = 9L)
    val once = spark.read.parquet(s"$root/levels").count()
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$root/_stream_commits/levels/9"),
      new org.apache.hadoop.fs.Path(s"$root/_stream_commits/9")))
    // replay with only the legacy marker present must stay a no-op
    StreamIngest.publishLevelBatch(rows, root, bid = 9L)
    assert(spark.read.parquet(s"$root/levels").count() === once,
      "legacy marker must suppress the replay")
    // and compact's uncommitted-publish guard must accept the legacy marker
    fixtureDf.withColumn("tb", lit(0L)).write.partitionBy("tb").parquet(s"$root/raw")
    graft.store.Warehouse.writeMetaPublic(meta, root, spark)
    graft.store.Warehouse.compact(spark, root)
    assert(spark.read.parquet(s"$root/levels").count() === once)
  }

  test("publish crash-point matrix: every interrupted state converges on replay") {
    val root = tmpDir("crashmatrix")
    val rows = AggOps.levelBuild(fixtureDf, 10 * S).withColumn("interval", lit(10 * S))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def levelsCount = spark.read.parquet(s"$root/levels").count()
    def bidFiles(bid: Long) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/levels")).filter(_.getName.startsWith(s"bid-$bid-"))
    }
    StreamIngest.publishLevelBatch(rows, root, bid = 1L)
    val want = levelsCount // per-batch row count; each distinct bid adds this

    // crash A: staged but nothing renamed (staging dir exists, no bid files)
    rows.write.mode("overwrite").partitionBy("interval")
      .parquet(s"$root/_stream_staging/levels/bid=2")
    StreamIngest.publishLevelBatch(rows, root, bid = 2L) // replay
    assert(levelsCount === 2 * want, "state A must converge")

    // crash B: SOME bid files renamed in, marker missing
    StreamIngest.publishLevelBatch(rows, root, bid = 3L)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_stream_commits/levels/3"), false)
    assert(bidFiles(3L).head.delete()) // lose one published file too
    StreamIngest.publishLevelBatch(rows, root, bid = 3L) // replay
    assert(levelsCount === 3 * want, "state B must converge")

    // crash C: everything renamed, marker missing (pure marker loss)
    StreamIngest.publishLevelBatch(rows, root, bid = 4L)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_stream_commits/levels/4"), false)
    StreamIngest.publishLevelBatch(rows, root, bid = 4L)
    assert(levelsCount === 4 * want, "state C must converge")

    // crash D: marker present, stale staging left behind → replay must no-op
    rows.write.mode("overwrite").partitionBy("interval")
      .parquet(s"$root/_stream_staging/levels/bid=4")
    StreamIngest.publishLevelBatch(rows, root, bid = 4L)
    assert(levelsCount === 4 * want, "state D must stay a no-op")
  }

  test("raw sink: restores an interrupted compact swap, coexists with batch reads") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = tmpDir("rawsinkwh")
    // pre-crash store, then a compact that died mid-raw-swap: dst missing,
    // backup holds the only copy
    fixtureDf.withColumn("tb", lit(0L)).write.partitionBy("tb").parquet(s"$root/raw")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/raw"),
      new org.apache.hadoop.fs.Path(s"$root/raw_compact_bak")))
    val mem = MemoryStream[Sample]
    val q = StreamIngest.sinkRawToWarehouse(mem.toDS(), meta, root, tmpDir("ckptraw"))
    try {
      mem.addData(Sample("foo", tp(500), 1.0), Sample("foo", tp(501), 2.0))
      q.processAllAvailable()
    } finally q.stop()
    // the sink restored the backup BEFORE writing: pre-crash history and the
    // new micro-batch are both visible to a plain batch read (no
    // _spark_metadata log hijacking file resolution), backup consumed
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/raw_compact_bak")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/raw/_spark_metadata")))
    val raw = s.read.parquet(s"$root/raw")
    assert(raw.count() === fixture110.length + 2)
    assert(raw.where(col("time") === tp(500)).count() === 1)
  }

  test("end-to-end MemoryStream query emits closed rows across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Sample]
    val q = StreamIngest.closedRows(mem.toDS(), meta)
      .writeStream.format("memory").queryName("closed").outputMode("append").start()
    try {
      val samples = fixture110.map { case (t, v) => Sample("foo", t, v) }
      mem.addData(samples.take(40): _*)
      q.processAllAvailable()
      mem.addData(samples.drop(40): _*)
      q.processAllAvailable()
      val got = s.table("closed").where(col("interval") === 10 * S)
        .orderBy("time").collect()
        .map(r => (r.getAs[Long]("time"), r.getAs[Double]("minimum"),
          r.getAs[Double]("maximum"), r.getAs[Double]("sum"), r.getAs[Long]("count"),
          r.getAs[Double]("integral"), r.getAs[Long]("active_time"))).toSeq
      assert(got === batchRows(10 * S))
    } finally q.stop()
  }
}
