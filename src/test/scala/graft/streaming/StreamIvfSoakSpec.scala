package graft.streaming

import graft.SparkSpec
import graft.store.IvfStore
import graft.pipeline.Ann
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Bounded soak of the streaming SEMANTIC dedup sink (the 200-batch
  * version runs as StreamIvfSoakBench) — the IVF twin of StreamSoakSpec:
  * over dozens of micro-batches, auto-compact must keep the live vector
  * file count bounded, every batch's survivorship must land exactly
  * (novel appends, semantic copy drops), the drift ledger must advance
  * monotonically by exactly the accepted counts, and the end state must
  * equal an offline append of the same survivors under the SAME frozen
  * quantizer. */
class StreamIvfSoakSpec extends SparkSpec {

  private val dim = 64

  /** Deterministic pseudo-random direction per id: pairwise cosines of
    * distinct ids concentrate around 0 (±1/√dim), far below the 0.95
    * dedup threshold, so every novel drop genuinely survives. */
  private def vecFor(id: Long): Seq[Float] = {
    val rng = new scala.util.Random(id * 2654435761L + 17)
    Seq.fill(dim)((rng.nextInt(201) - 100).toFloat)
  }

  test("24-batch IVF soak: file bound holds, drift ledger exact, " +
    "end state ≡ offline append under the same quantizer") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = tmpDir("ivfsoak-idx")
    val off = tmpDir("ivfsoak-off")
    val ckpt = tmpDir("ivfsoak-ckpt")
    // compact(filesPerPartition = 1) floors vectors/ at nlist files (one
    // per list partition), and the in-line compact runs INSIDE
    // appendBatch — post-batch observations can never catch the count
    // above a trigger that sits at or above that floor. A trigger BELOW
    // the floor makes every crossing observable: post-batch counts rest
    // at nlist = 4 > 3, proving the trigger region is genuinely reached
    // while the bound still holds (the StreamSoakSpec discipline).
    val nlist = 4
    val autoCompactAt = 3
    val batches = 24
    val base = (0L until 20L).map(i => (i, vecFor(i)))
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
    val q = StreamSemanticDedup.start(
      mem.toDF().toDF("vec_id", "embedding"), root, ckpt,
      threshold = 0.95, nprobe = nlist, autoCompactAt = autoCompactAt)
    var maxFiles = 0
    try {
      for (b <- 0 until batches) {
        // one novel direction + one scaled copy (cosine 1) of an ALREADY
        // ACCEPTED vector — previous batch's novel for b > 0, a base
        // vector for b = 0: the copy must drop, the novel must append
        val dupSrc = if (b == 0) 5L else 1000L + b - 1
        mem.addData(
          (1000L + b, vecFor(1000L + b)),
          (200000L + b, vecFor(dupSrc).map(x => x * 0.55f)))
        q.processAllAvailable()
        val nFiles = partFiles(s"$root/vectors")
        maxFiles = math.max(maxFiles, nFiles)
        assert(nFiles <= autoCompactAt + 8,
          s"batch $b: $nFiles vector files exceeds the auto-compact bound")
        val d = IvfStore.driftStats(s, root).get
        assert(d.appendedN === b + 1,
          s"batch $b: drift ledger must advance by exactly the accepted count")
      }
    } finally q.stop()
    assert(maxFiles > autoCompactAt,
      "the soak must actually cross the compaction trigger")
    // maintenance files must never leak into the data listing (they'd be
    // picked up by spark.read.parquet and corrupt probes)
    assert(!listFiles(s"$root/vectors").exists(_.contains("_writer.lease")),
      "lease files leaked into vectors/")

    val storedIds = s.read.parquet(s"$root/vectors").select("vid")
      .collect().map(_.getLong(0)).toSet
    assert(storedIds === ((0L until 20L) ++
      (0 until batches).map(1000L + _)).toSet,
      "exactly base + one novel per batch must be stored")
    // in-distribution appends: the advisory must NOT trip
    val dEnd = IvfStore.driftStats(s, root).get
    assert(!dEnd.rebuildAdvised(),
      s"in-distribution soak tripped the advisory: ratio ${dEnd.ratio}")

    // end state ≡ offline: same base (deterministic seeding → identical
    // frozen centroids), survivors appended in one offline drop — a
    // probe panel must answer bit-equal
    val offH = Ann.writeIvfIndex(base, off, nlist = nlist, kmeansIters = 0)
    IvfStore.append(
      (0 until batches).map(b => (1000L + b, vecFor(1000L + b)))
        .toDF("vec_id", "embedding"), offH)
    val panel = Seq(
      (9000L, vecFor(5L).map(x => x * 0.7f)),
      (9001L, vecFor(1000L + batches - 1)),
      (9002L, vecFor(777777L)))
      .toDF("vec_id", "embedding")
    val a = IvfStore.probeTopK(panel, IvfStore.open(s, root), k = 3,
      nprobe = nlist).collect().map(_.toSeq).toSet
    val o = IvfStore.probeTopK(panel, IvfStore.open(s, off), k = 3,
      nprobe = nlist).collect().map(_.toSeq).toSet
    assert(a === o, "soak end state must equal the offline append")
    assert(a.nonEmpty)
  }
}
