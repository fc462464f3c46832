package graft

import graft.pipeline.Dedup
import graft.store.BandIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming soak (round-14 VERDICT item 6): StreamDedup is spec-pinned
  * on 2-3 micro-batches, but replay, auto-compact, file-count bounds and
  * probe latency only INTERACT over a long run. This bench drives the
  * real Structured Streaming sink through ≥200 micro-batches of
  * synthetic drops (each: one novel doc, one near-copy of an already
  * accepted doc) and asserts, in-run:
  *
  *  - the survivor ledger: exactly the novel docs append (nDocs exact);
  *  - the auto-compact bound: the live `bands/` part-file count never
  *    exceeds autoCompactAt + one batch's file set;
  *  - probe latency stays flat: mean corpus-probe wall time over the
  *    LAST decile of batches ≤ 3× the FIRST decile (small files bounded
  *    by compaction, not accumulating);
  *  - end state ≡ the offline pipeline: a probe panel answers bit-equal
  *    against an offline-built index of the same accepted survivors.
  *
  * Prints one JSON line. Run: sbt "runMain graft.StreamSoakBench [batches]" */
object StreamSoakBench {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(200)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmrf)
      f.delete(): Unit
    }
    val root = "/tmp/graft_soak"
    rmrf(new java.io.File(root))
    val path = s"$root/index"
    val ckpt = s"$root/ckpt"
    val autoCompactAt = 48

    def docText(i: Int): String =
      s"soak document $i with tokens t${i * 7} t${i * 13} t${i * 29} stable tail"
    val base = (0 until 20).map(i => (i.toLong, docText(i))).toDF("doc_id", "text")
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
    val q = graft.streaming.StreamDedup.start(
      mem.toDF().toDF("doc_id", "text"), path, ckpt,
      threshold = 0.8, autoCompactAt = autoCompactAt)
    val probePanel = Seq((9000L, docText(5)), (9001L, docText(100)),
      (9002L, "never seen probe body text entirely novel"))
      .toDF("doc_id", "text").localCheckpoint()

    var maxFiles = 0
    val probeLat = new Array[Double](batches)
    try {
      for (b <- 0 until batches) {
        val novelId = 1000L + b
        // one novel doc + one exact copy of an ALREADY ACCEPTED doc (the
        // previous batch's novel for b > 0, a base doc for b = 0) — the
        // copy must drop against the corpus, the novel must append
        val dupText = if (b == 0) docText(5) else docText(1000 + b - 1)
        mem.addData((novelId, docText(1000 + b)), (novelId + 100000L, dupText))
        q.processAllAvailable()
        val nFiles = partFiles(s"$path/bands")
        maxFiles = math.max(maxFiles, nFiles)
        require(nFiles <= autoCompactAt + 32,
          s"batch $b: $nFiles band files exceeds the auto-compact bound")
        val t0 = System.nanoTime()
        val hits = Dedup.nearDupPairsAgainstIndex(BandIndex.open(path),
          probePanel, 0.8).count()
        probeLat(b) = (System.nanoTime() - t0) / 1e9
        require(hits >= 1, s"batch $b: probe panel lost its corpus hit")
      }
    } finally q.stop()
    // maintenance files must never leak into the data listings
    def anyLease(dir: String): Boolean = {
      val d = new java.io.File(dir)
      d.exists && d.listFiles.exists(f =>
        if (f.isDirectory) anyLease(f.getPath)
        else f.getName.contains("_writer.lease"))
    }
    require(!anyLease(s"$path/bands") && !anyLease(s"$path/grams"),
      "lease files leaked into bands/ or grams/")

    val h = BandIndex.open(path)
    require(h.nDocs == 20 + batches,
      s"expected ${20 + batches} survivors (base + one novel per batch), got ${h.nDocs}")
    // end state ≡ offline: same survivors, offline-built, same answers
    val survivors = base.unionByName(
      (0 until batches).map(b => (1000L + b, docText(1000 + b)))
        .toDF("doc_id", "text"))
    val off = BandIndex.write(survivors, s"$root/offline")
    val a = Dedup.nearDupPairsAgainstIndex(h, probePanel, 0.8)
      .collect().map(_.toSeq).toSet
    val o = Dedup.nearDupPairsAgainstIndex(off, probePanel, 0.8)
      .collect().map(_.toSeq).toSet
    require(a == o, "soak end state must equal the offline build")

    val dec = math.max(1, batches / 10)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val first = mean(probeLat.take(dec).toSeq)
    val last = mean(probeLat.takeRight(dec).toSeq)
    require(last <= 3 * first + 0.2,
      s"probe latency drifted: first-decile ${first}s -> last-decile ${last}s")
    println(s"""STREAMSOAK {"batches":$batches,"n_docs":${h.nDocs},""" +
      s""""max_band_files":$maxFiles,"auto_compact_at":$autoCompactAt,""" +
      s""""probe_first_decile_s":${math.round(first * 1000) / 1000.0},""" +
      s""""probe_last_decile_s":${math.round(last * 1000) / 1000.0},""" +
      s""""end_state_equals_offline":true}""")
    spark.stop()
  }
}
