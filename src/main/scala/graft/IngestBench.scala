package graft

import graft.model.Meta
import graft.store.Warehouse
import org.apache.spark.sql.functions._

/** Ingest throughput benchmark mirroring the reference's BM_insert shape
  * (tests/bench.cpp:43-88, BASELINE.md): n synthetic samples (value
  * i + 1/3, like BM_insert) at each of the reference's three spacings
  * (826 ns = 1s/1210000, 50 ms = 1s/20, 1 s), default-style Meta, full
  * level-ladder build. Reports one JSON line per (size, spacing): points
  * ingested per second including all rollups and parquet writes.
  * Run: sbt "runMain graft.IngestBench" */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val meta = Meta(10L * 1000000000L, 365L * 24 * 3600 * 1000000000L, 10)
    val t0ns = 1519130000L * 1000000000L
    val spacings = Seq(1000000000L / 1210000, 1000000000L / 20, 1000000000L)
    for (exp <- Seq(14, 17, 20, 24); spacing <- spacings) {
      val n = 1L << exp
      val pts = spark.range(n).select(
        lit("bench").as("metric"),
        (lit(t0ns) + col("id") * spacing).as("time"),
        (col("id") + lit(1.0 / 3.0)).as("value")).cache()
      pts.count() // materialize input outside the timed section
      val root = java.nio.file.Files.createTempDirectory(s"ingestbench$exp").toString
      val t0 = System.nanoTime()
      Warehouse.ingest(pts, meta, root, validate = false)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"ingest","points":$n,"spacing_ns":$spacing,"sec":$sec%.3f,"points_per_sec":${(n / sec).toLong}}""")
      pts.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
