package graft

import graft.pipeline.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** ×100 pair-tier spot-check driver (round-13 VERDICT item 5): runs the
  * three scale-critical dedup paths on a `synth_x10_organic.py --factor
  * 100` corpus, dumps each result in the Verify layout (so the numpy /
  * DuckDB checkers compare them), and records per-query wall time plus
  * the LARGEST single task the run produced — the number that predicts
  * whether a plan clears AQE skew thresholds, the 2 GB partition limit
  * and broadcast ceilings at the next decade.
  *
  * q183's REGISTERED geometry (nlist = 64) is quadratically infeasible
  * at 500 k docs by construction — SemDeDup's within-cluster triangle is
  * Σ n_l² pairs and a fixed nlist makes n_l ∝ corpus (measured 3.8e10
  * at ×100). The 100 TB parameterization scales nlist with the corpus
  * (bounded cluster size); the probe takes nlist on the command line so
  * the spot-check runs the scale-correct geometry (6400) and the
  * checker (`semcheck_x10.py <dir> <out> q183x100:<nlist>`) recomputes
  * the same exact semantics.
  *
  * Run: sbt "runMain graft.ScaleProbe /tmp/testdata_x100 /tmp/vx100 6400"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata_x100")
    val outDir = args.lift(1).getOrElse("/tmp/vx100")
    val nlist = args.lift(2).map(_.toInt).getOrElse(6400)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    // task-maxima listener: reset per query, read after each run
    object L extends SparkListener {
      @volatile var maxInput = 0L
      @volatile var maxShuffleRead = 0L
      @volatile var maxDurMs = 0L
      @volatile var maxPeakMem = 0L
      def reset(): Unit = { maxInput = 0; maxShuffleRead = 0
        maxDurMs = 0; maxPeakMem = 0 }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) synchronized {
          maxInput = math.max(maxInput, m.inputMetrics.bytesRead)
          maxShuffleRead = math.max(maxShuffleRead,
            m.shuffleReadMetrics.totalBytesRead)
          maxDurMs = math.max(maxDurMs, m.executorRunTime)
          maxPeakMem = math.max(maxPeakMem, m.peakExecutionMemory)
        }
      }
    }
    spark.sparkContext.addSparkListener(L)

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // SPARK_GRAFT_PROBE_ONLY=name1,name2 runs selected legs (re-runs
    // after a fix, or a new leg without the full sweep)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    def run(name: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      if (only.exists(!_.contains(name))) return
      L.reset()
      val t0 = System.nanoTime()
      val df = body
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(s"$outDir/$name").count()
      def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0
      println(
        s"""SCALEPROBE {"query":"$name","wall_s":${math.round(wall * 10) / 10.0},""" +
          s""""rows":$rows,"max_task_input_mb":${mb(L.maxInput)},""" +
          s""""max_task_shuffle_read_mb":${mb(L.maxShuffleRead)},""" +
          s""""max_task_runtime_s":${L.maxDurMs / 1000.0},""" +
          s""""max_task_peak_mem_mb":${mb(L.maxPeakMem)}}""")
    }

    // the per-domain DuckDB checker (tools/x100check.py) replays q180's
    // registered banding-reproduced oracle on single-domain views
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      "{\"q180_cosine_join_lsh\":" +
        com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
          .writeValueAsString(SparkEntry.oracleSql("q180_cosine_join_lsh")) +
        "}")

    // geometry pinned to the REGISTERED q15/q180 families (the API
    // default now derives from the threshold — the probes measure the
    // queries the driver actually runs, and the checkers replay their
    // registered oracles)
    run("q15_dedup_neardup") {
      Dedup.nearDupPairs(docs, threshold = 0.8, numHashes = 32, bands = 16)
        .orderBy("doc_a", "doc_b")
    }
    run("q180_cosine_join_lsh") {
      Dedup.cosineJoinBucketed(
        docs.where(pmod(col("doc_id"), lit(5)) === 0),
        tauNum = 4L, tauDen = 5L, numHashes = 32, bands = 16)
        .orderBy("doc_a", "doc_b")
    }
    run(s"q183x100") {
      Dedup.semanticDedup(docs, tauNum = 19L, tauDen = 20L,
        dim = 64, nlist = nlist).orderBy("doc_id")
    }
    // the AUTO-nlist default (round 14): nlist = max(8, ceil(n/1000))
    // derived inside semanticDedup from one count — 500 at this corpus;
    // checker: semcheck_x10.py <dir> <out> q190x100_auto:500
    run("q190x100_auto") {
      Dedup.semanticDedup(docs, tauNum = 19L, tauDen = 20L, dim = 64)
        .orderBy("doc_id")
    }
    // the KNEE-RULE default geometry at corpus scale: q187's auto path
    // (threshold 0.9 → 128 hashes / 16 bands) over the full corpus —
    // same brute-force-checkable contract as q15 (x100check.py domains)
    run("q187_neardup_auto") {
      Dedup.nearDupPairs(docs, threshold = 0.9).orderBy("doc_a", "doc_b")
    }
    // the CLUSTERING layer that consumes the pair tiers (round-14 VERDICT
    // item 5): star-contraction connected components + min-id
    // survivorship over the full corpus — the step a 100 TB dedup run
    // executes right after pairs, previously unmeasured at ×100.
    // Checker: clustercheck_x100.py replays union-find over the q15 leg's
    // pair dump (same registered 32/16 geometry) and compares component
    // assignment + survivor flags row-exactly for ALL docs.
    run("q49_clusters_x100") {
      Dedup.nearDupClusters(docs, threshold = 0.8, numHashes = 32,
          bands = 16)
        .orderBy("doc_id")
    }
    // the two EXACT pair tiers (q48 PPJoin / q102 Bayardo) at ×100 —
    // previously evidenced only at ×10; checker: exactcheck_x100.py
    run("q48_jaccard_join") {
      Dedup.jaccardJoin(docs, tau = 0.5).orderBy("doc_a", "doc_b")
    }
    run("q102_cosine_join") {
      Dedup.cosineJoin(docs.where(pmod(col("doc_id"), lit(5)) === 0),
        tauNum = 4L, tauDen = 5L).orderBy("doc_a", "doc_b")
    }
    spark.stop()
  }
}
