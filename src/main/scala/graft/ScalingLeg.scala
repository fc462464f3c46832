package graft

import graft.pipeline.{Ann, Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence harness (round-17 VERDICT item 3): at sf0.1 every
  * low/high-core wall-clock ratio is ≈1 — fixed per-query overhead
  * (scheduling, codegen, per-round jobs) dominates, so the bench point
  * cannot distinguish a real parallelization win from overhead shuffling.
  * This tool times one leg per operator family touched by the r16/r17
  * optimization rounds on a ×100 corpus (tools/synth_x10_organic.py
  * --factor 100: 500 k docs / 200 k embeddings), honoring
  * `SPARK_GRAFT_CPUS` exactly like the bench, so an 8-core vs 32-core run
  * pair measures whether the parallelized stages actually scale.
  *
  * Methodology matches graft.Bench: each leg's frame is fully
  * materialized via `toRdd.foreachPartition` (no sink cost), wall time is
  * min of `SPARK_GRAFT_BENCH_PASSES` (default 2 here — legs are minutes,
  * not seconds), one JSON line per leg on stdout. Legs are selectable via
  * `SPARK_GRAFT_LEG_ONLY=name1,name2`.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScalingLeg /tmp/testdata_x100"
  */
object ScalingLeg {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_COALESCE_FLOOR", "64k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietAdjudicatedWarnings()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val only = sys.env.get("SPARK_GRAFT_LEG_ONLY")
      .map(_.split(',').map(_.trim).toSet)

    def run(name: String)(body: => DataFrame): Unit = {
      if (only.exists(!_.contains(name))) return
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        try {
          spark.sparkContext.setJobDescription(s"scalingleg: $name")
          body.queryExecution.toRdd.foreachPartition(
            (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
              while (it.hasNext) it.next())
        } catch {
          case e: Throwable => System.err.println(s"[leg] $name: ${e.getMessage}")
        } finally spark.sparkContext.setJobDescription(null)
        (System.nanoTime() - t0) / 1e9
      }
      println(s"""SCALINGLEG {"leg":"$name","cpus":$cpus,""" +
        s""""wall_s":${math.round(times.min * 100) / 100.0},""" +
        s""""passes":[${times.map(t => math.round(t * 100) / 100.0).mkString(",")}]}""")
    }

    // shingle/gram family (r16 finding B: doc_id exchange before the
    // token explode) — q197/q23/q15 shape
    run("shingle_agg") {
      Dedup.shingleHashRows(docs, n = 3)
        .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    }
    // winnow fingerprint family — q161/q166 shape
    run("winnow") {
      TextOps.winnowFingerprints(docs, n = 8, w = 4)
        .groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    }
    // pair tier end-to-end (band + verify fan-out, q187 knee-rule
    // geometry) — the verify tier's pinParallelism is what r16 added
    run("neardup_pairs") {
      Dedup.nearDupPairs(docs, threshold = 0.9)
    }
    // iterative clustering over a deterministic 500 k-vertex tree
    // (diameter ~19 → pointer jumping converges in ~5 rounds); exercises
    // the r17 dst-partitioned persist + measured-broadcast rounds
    run("cc_rounds") {
      val edges = docs.select(col("doc_id").as("doc_a"),
          (col("doc_id") / 2).cast("long").as("doc_b"))
        .where(col("doc_id") > 0)
      Dedup.connectedComponents(edges)
    }
    // PageRank over a two-level hub graph derived from doc ids — the r17
    // dst-partitioned edge frame + per-round broadcast routing
    run("pagerank") {
      val e = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id"), lit(1000L)).as("dst"))
      graft.pipeline.Graph.pageRank(e, iters = 5)
    }
    // PQ encode + ADC scan (r17 minimal-arithmetic form) over the ×100
    // embedding table
    run("pq_encode") {
      Ann.pqTopK(emb.where(col("vec_id") < 3), emb, k = 5, m = 4, ksub = 16)
    }
    // codegen'd IVF assignment (graft_ivf_argmin) over the ×100 table
    run("ivf_assign") {
      Ann.ivfAssignWithDist(emb, Ann.ivfCentroids(emb, 16))
    }
    // semanticDedup at the scale-correct auto geometry — the r17 ×100
    // probe for VERDICT item 7: lazy 3×-re-evaluated assigned frame (the
    // r16 bench-point winner) vs one pinned materialization, toggled by
    // spark.graft.semanticDedup.materializeAssigned
    run("semdedup_lazy") {
      spark.conf.set("spark.graft.semanticDedup.materializeAssigned", "false")
      Dedup.semanticDedup(docs, tauNum = 19L, tauDen = 20L, dim = 64)
    }
    run("semdedup_mat") {
      spark.conf.set("spark.graft.semanticDedup.materializeAssigned", "true")
      val out = Dedup.semanticDedup(docs, tauNum = 19L, tauDen = 20L, dim = 64)
      spark.conf.set("spark.graft.semanticDedup.materializeAssigned", "false")
      out
    }
    spark.stop()
  }
}
