package graft

import graft.pipeline.Ann
import graft.store.IvfStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** IVF streaming soak (round-15 VERDICT item 4): the StreamSoakBench
  * twin for the embedding side. StreamSemanticDedup/IvfStore.appendBatch
  * are spec-pinned on 2-3 micro-batches; replay, auto-compact, the drift
  * ledger and probe latency only INTERACT over a long run. This bench
  * drives the real Structured Streaming sink through ≥200 micro-batches
  * of synthetic embedding drops (each: one novel direction, one scaled
  * copy of an already accepted vector) and asserts, in-run:
  *
  *  - the survivor ledger: exactly the novel vectors append;
  *  - the auto-compact bound: the live `vectors/` part-file count never
  *    exceeds autoCompactAt + one batch's file set;
  *  - the drift ledger: appendedN advances by exactly the accepted count
  *    per batch (monotone, replay-stable by construction) and the
  *    advisory never trips on in-distribution appends;
  *  - probe latency stays flat: mean probe wall time over the LAST
  *    decile of batches ≤ 3× the FIRST decile;
  *  - end state ≡ the offline pipeline: a probe panel answers bit-equal
  *    against an offline base-build + one-drop append of the same
  *    survivors under the SAME frozen quantizer (deterministic seeding).
  *
  * Prints one JSON line. Run: sbt "runMain graft.StreamIvfSoakBench [batches]" */
object StreamIvfSoakBench {
  private val dim = 64

  private def vecFor(id: Long): Seq[Float] = {
    val rng = new scala.util.Random(id * 2654435761L + 17)
    Seq.fill(dim)((rng.nextInt(201) - 100).toFloat)
  }

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
    val rootDir = "/tmp/graft_ivf_soak"
    rmrf(new java.io.File(rootDir))
    val root = s"$rootDir/index"
    val ckpt = s"$rootDir/ckpt"
    val nlist = 16
    val autoCompactAt = 48

    val base = (0L until 64L).map(i => (i, vecFor(i)))
      .toDF("vec_id", "embedding")
    Ann.writeIvfIndex(base, root, nlist = nlist, kmeansIters = 0)

    def listFiles(dir: String): Seq[String] = {
      val d = new java.io.File(dir)
      if (!d.exists) Nil
      else d.listFiles.toSeq.flatMap { f =>
        if (f.isDirectory) listFiles(f.getPath) else Seq(f.getName)
      }
    }
    def partFiles(dir: String): Int =
      listFiles(dir).count(n => !n.startsWith(".") && n.contains("part-"))

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamSemanticDedup.start(
      mem.toDF().toDF("vec_id", "embedding"), root, ckpt,
      threshold = 0.95, nprobe = nlist, autoCompactAt = autoCompactAt)
    val panel = Seq(
      (9000L, vecFor(5L).map(x => x * 0.7f)),
      (9001L, vecFor(333333L)),
      (9002L, vecFor(777777L)))
      .toDF("vec_id", "embedding").localCheckpoint()

    var maxFiles = 0
    val probeLat = new Array[Double](batches)
    try {
      for (b <- 0 until batches) {
        val dupSrc = if (b == 0) 5L else 1000L + b - 1
        mem.addData(
          (1000L + b, vecFor(1000L + b)),
          (200000L + b, vecFor(dupSrc).map(x => x * 0.55f)))
        q.processAllAvailable()
        val nFiles = partFiles(s"$root/vectors")
        maxFiles = math.max(maxFiles, nFiles)
        require(nFiles <= autoCompactAt + nlist,
          s"batch $b: $nFiles vector files exceeds the auto-compact bound")
        val d = IvfStore.driftStats(spark, root).get
        require(d.appendedN == b + 1,
          s"batch $b: drift ledger ${d.appendedN} != accepted ${b + 1}")
        val t0 = System.nanoTime()
        val hits = IvfStore.probeTopK(panel, IvfStore.open(spark, root),
          k = 1, nprobe = nlist).count()
        probeLat(b) = (System.nanoTime() - t0) / 1e9
        require(hits >= 1, s"batch $b: probe panel lost its corpus hit")
      }
    } finally q.stop()
    require(!listFiles(s"$root/vectors").exists(_.contains("_writer.lease")),
      "lease files leaked into vectors/")

    val storedIds = spark.read.parquet(s"$root/vectors").select("vid")
      .collect().map(_.getLong(0)).toSet
    require(storedIds == ((0L until 64L) ++
      (0 until batches).map(1000L + _)).toSet,
      "exactly base + one novel per batch must be stored")
    val dEnd = IvfStore.driftStats(spark, root).get
    require(!dEnd.rebuildAdvised(),
      s"in-distribution soak tripped the advisory: ratio ${dEnd.ratio}")

    // end state ≡ offline: identical frozen centroids (deterministic),
    // one offline drop of the same survivors
    val offH = Ann.writeIvfIndex(base, s"$rootDir/offline", nlist = nlist,
      kmeansIters = 0)
    IvfStore.append(
      (0 until batches).map(b => (1000L + b, vecFor(1000L + b)))
        .toDF("vec_id", "embedding"), offH)
    val a = IvfStore.probeTopK(panel, IvfStore.open(spark, root), k = 3,
      nprobe = nlist).collect().map(_.toSeq).toSet
    val o = IvfStore.probeTopK(panel, IvfStore.open(spark, s"$rootDir/offline"),
      k = 3, nprobe = nlist).collect().map(_.toSeq).toSet
    require(a == o, "soak end state must equal the offline append")

    val dec = math.max(1, batches / 10)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val first = mean(probeLat.take(dec).toSeq)
    val last = mean(probeLat.takeRight(dec).toSeq)
    require(last <= 3 * first + 0.2,
      s"probe latency drifted: first-decile ${first}s -> last-decile ${last}s")
    println(s"""IVFSOAK {"batches":$batches,"n_vectors":${storedIds.size},""" +
      s""""max_vector_files":$maxFiles,"auto_compact_at":$autoCompactAt,""" +
      s""""drift_appended_n":${dEnd.appendedN},""" +
      s""""drift_ratio":${math.round(dEnd.ratio * 1000) / 1000.0},""" +
      s""""probe_first_decile_s":${math.round(first * 1000) / 1000.0},""" +
      s""""probe_last_decile_s":${math.round(last * 1000) / 1000.0},""" +
      s""""end_state_equals_offline":true}""")
    spark.stop()
  }
}
