package graft

import graft.model.Meta
import graft.store.Warehouse
import graft.tools.Tools

/** Ingest throughput benchmark mirroring the reference's BM_insert shape
  * (tests/bench.cpp:43-88, BASELINE.md): n synthetic samples at 50 ms
  * spacing, default-style Meta, full level-ladder build. Reports one JSON
  * line per size: points ingested per second including all rollups.
  * Run: sbt "runMain graft.IngestBench" */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val meta = Meta(10L * 1000000000L, 365L * 24 * 3600 * 1000000000L, 10)
    val t0ns = 1519130000L * 1000000000L
    for (exp <- Seq(14, 17, 20)) {
      val n = 1L << exp
      val pts = Tools.generate(spark, "bench", n, t0ns).cache()
      pts.count() // materialize input outside the timed section
      val root = java.nio.file.Files.createTempDirectory(s"ingestbench$exp").toString
      val t0 = System.nanoTime()
      Warehouse.ingest(pts, meta, root, validate = false)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"ingest","points":$n,"sec":$sec%.3f,"points_per_sec":${(n / sec).toLong}}""")
      pts.unpersist()
    }
    spark.stop()
  }
}
