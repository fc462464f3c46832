package graft.store

import graft.SparkSpec
import graft.pipeline.TextOps
import org.apache.spark.sql.functions._

/** Persisted inverted text index: bit-parity with the on-the-fly scorer,
  * bucket partition pruning, meta round-trip. */
class TextIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"tix_$tag")
    p.toFile.deleteOnExit(); p.toString
  }

  test("indexed search == TextOps.searchTopK bit-for-bit; open() round-trips") {
    val h = TextIndex.write(docs, freshPath("parity"), buckets = 16)
    val reopened = TextIndex.open(h.path)
    assert(reopened == h)
    for (q <- Seq(Seq("query", "merge"), Seq("stream", "batch", "scan"),
        Seq("nosuchtokenanywhere", "query"))) {
      val direct = TextOps.searchTopK(docs, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val viaIdx = TextIndex.searchTopK(spark, reopened, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaIdx == direct, s"query $q")
    }
  }

  test("search probes only the query terms' buckets (partition pruned)") {
    val h = TextIndex.write(docs, freshPath("prune"), buckets = 16)
    val plan = TextIndex.searchTopK(spark, h, Seq("query"), k = 5)
    val s = plan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val b = TextIndex.md5Long60("query") % 16
    assert(s.contains("PartitionFilters") && s.contains(s"bucket"),
      "expected a bucket partition filter in the scan")
    // the literal probed bucket appears in the filter, and scans carry it
    assert(s.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains(b.toString)), s"bucket $b")
  }

  test("a term colliding into a probed bucket is filtered by token") {
    // craft two tokens in the SAME bucket; querying one must not score
    // docs that only hold the other
    val toks = (1 to 4000).map(i => s"tk$i")
    val target = toks.find(t => TextIndex.md5Long60(t) % 4 == 0).get
    val other = toks.filter(t => t != target &&
      TextIndex.md5Long60(t) % 4 == 0)(1)
    val d = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, s"$target $target filler"),
        org.apache.spark.sql.Row(2L, s"$other only here")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val h = TextIndex.write(d, freshPath("coll"), buckets = 4)
    val got = TextIndex.searchTopK(spark, h, Seq(target), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }
}
