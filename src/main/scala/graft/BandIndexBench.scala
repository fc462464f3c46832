package graft

import graft.pipeline.Dedup
import graft.store.BandIndex
import org.apache.spark.sql.functions._

/** The O(drop) claim of the persisted band index, measured at corpus
  * scale: on a ×100 organic corpus (495 k stored docs), a 5 k-doc
  * nightly drop probed against STORED bands+grams versus the live
  * two-sided [[Dedup.nearDupPairsAgainst]] that re-signs the corpus
  * from raw text. The outputs are asserted identical; the wall-time gap
  * is the corpus-sized signature recompute the index amortizes away —
  * it grows linearly with the corpus while the probe cost stays
  * O(drop + touched buckets).
  *
  * Run: sbt "runMain graft.BandIndexBench /tmp/testdata_x100 /tmp/graft_bix100"
  */
object BandIndexBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata_x100")
    val idxPath = args.lift(1).getOrElse("/tmp/graft_bix100")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // drop = the q101 slice of domain 0 (1k docs WITH true near-dups in
    // the corpus); corpus = everything else — so the identical-answer
    // assertion covers a non-empty result, not just agreement on empty
    val inDrop = col("doc_id") < 10000000L && pmod(col("doc_id"), lit(5)) === 0
    val corpus = docs.where(!inDrop)
    val drop = docs.where(inDrop)
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, math.round((System.nanoTime() - t0) / 1e8) / 10.0)
    }
    val (h, tBuild) = time(BandIndex.write(corpus, idxPath))
    val (idxRows, tProbe) = time(
      Dedup.nearDupPairsAgainstIndex(h, drop).collect().map(_.toSeq).toSet)
    // cap-drop accounting of the probe just run (round-14 visibility:
    // a clean run and one that dropped its hottest buckets must be
    // distinguishable in the artifact)
    val drops = Dedup.lastCapDropStats()
      .map(d => s""","probe_dropped_rows":${d.droppedRows},""" +
        s""""probe_dropped_buckets":${d.droppedBuckets},""" +
        s""""probe_max_bucket":${d.maxBucketSeen}""").getOrElse("")
    val (liveRows, tLive) = time(
      Dedup.nearDupPairsAgainst(corpus, drop).collect().map(_.toSeq).toSet)
    require(idxRows == liveRows, "index and live answers must be identical")
    println(s"""BANDIXBENCH {"corpus_docs":${h.nDocs},"drop_docs":${drop.count()},""" +
      s""""pairs":${idxRows.size},"t_build_s":$tBuild,""" +
      s""""t_probe_s":$tProbe,"t_live_s":$tLive$drops}""")
    spark.stop()
  }
}
