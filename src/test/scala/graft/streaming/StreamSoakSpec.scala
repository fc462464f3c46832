package graft.streaming

import graft.SparkSpec
import graft.pipeline.Dedup
import graft.store.BandIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Bounded soak of the streaming dedup sink (the 200-batch version runs
  * as StreamSoakBench): over dozens of micro-batches, auto-compact must
  * keep the live file count bounded, every batch's survivorship must
  * land exactly (novel appends, corpus copy drops), and the end state
  * must equal an offline build of the same survivors. */
class StreamSoakSpec extends SparkSpec {

  private def docText(i: Int): String =
    s"soak document $i with tokens t${i * 7} t${i * 13} t${i * 29} stable tail"

  test("24-batch soak: file bound holds, ledger exact, end state ≡ offline") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val path = tmpDir("soak-idx")
    val ckpt = tmpDir("soak-ckpt")
    // compact(filesPerPartition = 1) floors bands/ at 16 files (one per
    // band partition), and the in-line compact runs INSIDE appendBatch —
    // post-batch observations can never catch the count above the
    // trigger when the trigger sits at that floor. A trigger BELOW the
    // floor makes every crossing observable: post-batch counts rest at
    // 16 > 8, proving the trigger region is genuinely reached while the
    // bound still holds.
    val autoCompactAt = 8
    val batches = 24
    val base = (0 until 10).map(i => (i.toLong, docText(i)))
      .toDF("doc_id", "text")
    BandIndex.write(base, path)

    def partFiles(dir: String): Int = {
      val d = new java.io.File(dir)
      if (!d.exists) 0
      else d.listFiles.map { f =>
        if (f.isDirectory) partFiles(f.getPath)
        // skip Hadoop .crc sidecars — the library's Hadoop-API counter
        // never sees them (ChecksumFileSystem hides them)
        else if (!f.getName.startsWith(".") &&
          f.getName.contains("part-")) 1
        else 0
      }.sum
    }

    val mem = MemoryStream[(Long, String)]
    val q = StreamDedup.start(mem.toDF().toDF("doc_id", "text"), path,
      ckpt, threshold = 0.8, autoCompactAt = autoCompactAt)
    var maxFiles = 0
    try {
      for (b <- 0 until batches) {
        val dupText = if (b == 0) docText(5) else docText(1000 + b - 1)
        mem.addData((1000L + b, docText(1000 + b)),
          (200000L + b, dupText))
        q.processAllAvailable()
        val nFiles = partFiles(s"$path/bands")
        maxFiles = math.max(maxFiles, nFiles)
        assert(nFiles <= autoCompactAt + 32,
          s"batch $b: $nFiles band files exceeds the auto-compact bound")
      }
    } finally q.stop()
    assert(maxFiles > autoCompactAt,
      "the soak must actually cross the compaction trigger")
    // maintenance files must never leak into the data listings (they'd
    // be picked up by spark.read.parquet and corrupt probes)
    def anyLease(dir: String): Boolean = {
      val d = new java.io.File(dir)
      d.exists && d.listFiles.exists(f =>
        if (f.isDirectory) anyLease(f.getPath)
        else f.getName.contains("_writer.lease"))
    }
    assert(!anyLease(s"$path/bands") && !anyLease(s"$path/grams"),
      "lease files leaked into bands/ or grams/")

    val h = BandIndex.open(path)
    assert(h.nDocs === 10L + batches, "one survivor per batch, no copies")
    val survivors = base.unionByName(
      (0 until batches).map(b => (1000L + b, docText(1000 + b)))
        .toDF("doc_id", "text"))
    val off = BandIndex.write(survivors, tmpDir("soak-off"))
    val panel = Seq((9000L, docText(5)), (9001L, docText(1000 + batches - 1)),
      (9002L, "never seen probe body text entirely novel"))
      .toDF("doc_id", "text")
    val a = Dedup.nearDupPairsAgainstIndex(h, panel, 0.8)
      .collect().map(_.toSeq).toSet
    val o = Dedup.nearDupPairsAgainstIndex(off, panel, 0.8)
      .collect().map(_.toSeq).toSet
    assert(a === o, "soak end state must equal the offline build")
    assert(a.nonEmpty)
  }
}
