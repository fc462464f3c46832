package graft

import graft.pipeline.Ann
import graft.store.IvfStore
import org.apache.spark.sql.functions._

/** Scale evidence for the persisted IVF store's maintenance surface
  * (round 14): a 500 k-vector corpus (the sf0.1 embeddings × 250
  * deterministic cyclic-shift domains — the ×10 construction extended),
  * then the production loop measured end-to-end:
  *
  *   build (quantizer + lists) → delta append (frozen quantizer) →
  *   probe (static list pruning) vs brute-force top-k → retire 10 % →
  *   tombstoned probe → compact → probe again.
  *
  * Correctness is asserted in-line: append ≡ rebuild under the same
  * quantizer (the base holds the smallest ids, so first-N centroids
  * agree), the tombstoned probe equals a fresh index of the survivors,
  * and compact changes no answer. Prints one JSON line.
  *
  * Run: sbt "runMain graft.IvfScaleBench [sfDir] [nlist]" */
object IvfScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nlist = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val dim = base0.select(size(col("embedding"))).head().getInt(0)
    // 250 domains: vec_id offset k·10⁷, embedding cyclically shifted by
    // k % dim (an orthogonal permutation — geometry per domain identical)
    val domains = spark.range(250).select(col("id").as("_k"))
    val corpus = base0.crossJoin(domains)
      .select((col("vec_id") + col("_k") * 10000000L).as("vec_id"),
        expr(s"concat(slice(embedding, CAST(_k % $dim AS INT) + 1, " +
          s"$dim - CAST(_k % $dim AS INT)), " +
          s"slice(embedding, 1, CAST(_k % $dim AS INT)))").as("embedding"))
      .localCheckpoint()
    val n = corpus.count()
    // drop = the highest-id domain (frozen-quantizer append contract:
    // base keeps the smallest ids, so first-N centroids agree with a
    // union rebuild and equality is exact)
    val drop = corpus.where(col("vec_id") >= 249L * 10000000L)
    val baseC = corpus.where(col("vec_id") < 249L * 10000000L)
    val queries = corpus.where(col("vec_id") < 10).localCheckpoint()

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, math.round((System.nanoTime() - t0) / 1e8) / 10.0)
    }
    val root = "/tmp/graft_ivf_scale"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(new java.io.File(root))

    val (h0, tBuild) = time(Ann.writeIvfIndex(baseC, root, nlist,
      kmeansIters = 0))
    val (h, tAppend) = time(IvfStore.append(drop, h0))
    val (probe1, tProbe) = time(
      IvfStore.probeTopK(queries, h, k = 10).collect().map(_.toSeq).toSet)
    val (brute, tBrute) = time(
      Ann.bruteForceTopK(queries, corpus.withColumnRenamed("vec_id", "vid")
          .select(col("vid").as("vec_id"), col("embedding")), k = 10)
        .count())
    // append == rebuild under the agreeing quantizer
    val full = Ann.writeIvfIndex(corpus, root + "_full", nlist,
      kmeansIters = 0)
    require(h.centroids.map(_._2.toSeq).toSeq ==
      full.centroids.map(_._2.toSeq).toSeq,
      "base holds the smallest ids, so centroids must agree")
    require(probe1 == Ann.ivfProbeTopK(queries, full, k = 10)
      .collect().map(_.toSeq).toSet, "append must equal the rebuild")
    // retire 10%
    val retired = corpus.where(col("vec_id") >= nlist &&
      pmod(col("vec_id"), lit(10)) === 3).select("vec_id")
    val nRet = retired.count()
    val (_, tRetire) = time(IvfStore.retire(retired, h))
    val (probe2, tProbeTomb) = time(
      IvfStore.probeTopK(queries, h, k = 10).collect().map(_.toSeq).toSet)
    require(!probe2.exists(r =>
      r(1).asInstanceOf[Long] % 10 == 3 && r(1).asInstanceOf[Long] >= nlist),
      "no retired vector may surface")
    val (_, tCompact) = time(IvfStore.compact(spark, h))
    val (probe3, tProbeCpt) = time(
      IvfStore.probeTopK(queries, h, k = 10).collect().map(_.toSeq).toSet)
    require(probe3 == probe2, "compact must not change answers")

    // ---- recall drift under the frozen quantizer (round 15): append a
    // SHIFTED domain (+0.5/dim on unit-norm vectors: a far cluster), read
    // the advisory, measure probe recall of drifted queries against the
    // exact truth BEFORE a rebuild and AFTER one (kmeans re-derives the
    // geometry over the union and resets the drift baseline) ----
    val drifted = base0.select(
        (col("vec_id") + 250L * 10000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.5f)).as("embedding"))
      .localCheckpoint()
    val (_, tDriftAppend) = time(IvfStore.append(drifted, h))
    val drift = IvfStore.driftStats(spark, root).get
    require(drift.rebuildAdvised(),
      s"a shifted domain must trip the advisory, ratio ${drift.ratio}")
    val liveC = corpus.where(!(col("vec_id") >= nlist &&
        pmod(col("vec_id"), lit(10)) === 3))
      .unionByName(drifted).localCheckpoint()
    val dq = drifted.where(col("vec_id") < 250L * 10000000L + 10)
      .localCheckpoint()
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truthPairs = pairsOf(Ann.bruteForceTopK(dq, liveC, k = 10))
    val (frozenPairs, tProbeDrift) = time(
      pairsOf(IvfStore.probeTopK(dq, h, k = 10)))
    val recallFrozen = frozenPairs.intersect(truthPairs).size.toDouble /
      truthPairs.size
    val (rebuilt, tRebuild) = time(Ann.writeIvfIndex(liveC, root + "_rb",
      nlist, kmeansIters = 1))
    val (rebuiltPairs, tProbeRb) = time(
      pairsOf(Ann.ivfProbeTopK(dq, rebuilt, k = 10)))
    val recallRebuilt = rebuiltPairs.intersect(truthPairs).size.toDouble /
      truthPairs.size
    val driftRb = IvfStore.driftStats(spark, root + "_rb").get
    require(driftRb.appendedN == 0 && !driftRb.rebuildAdvised(),
      "a rebuild must reset the drift ledger")

    println(s"""IVFSCALE {"vectors":$n,"nlist":$nlist,"drop":${drop.count()},""" +
      s""""retired":$nRet,"t_build_s":$tBuild,"t_append_s":$tAppend,""" +
      s""""t_probe_s":$tProbe,"t_brute_s":$tBrute,""" +
      s""""t_retire_s":$tRetire,"t_probe_tombstoned_s":$tProbeTomb,""" +
      s""""t_compact_s":$tCompact,"t_probe_compacted_s":$tProbeCpt,""" +
      s""""drift_ratio":${math.round(drift.ratio * 100) / 100.0},""" +
      s""""t_drift_append_s":$tDriftAppend,""" +
      s""""recall_drifted_frozen":$recallFrozen,""" +
      s""""t_probe_drifted_s":$tProbeDrift,"t_rebuild_s":$tRebuild,""" +
      s""""recall_after_rebuild":$recallRebuilt,""" +
      s""""t_probe_rebuilt_s":$tProbeRb}""")
    spark.stop()
  }
}
