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
    println(s"""IVFSCALE {"vectors":$n,"nlist":$nlist,"drop":${drop.count()},""" +
      s""""retired":$nRet,"t_build_s":$tBuild,"t_append_s":$tAppend,""" +
      s""""t_probe_s":$tProbe,"t_brute_s":$tBrute,""" +
      s""""t_retire_s":$tRetire,"t_probe_tombstoned_s":$tProbeTomb,""" +
      s""""t_compact_s":$tCompact,"t_probe_compacted_s":$tProbeCpt}""")
    spark.stop()
  }
}
