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
      val directBm = TextOps.bm25TopK(docs, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val idxBm = TextIndex.bm25TopK(spark, reopened, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(idxBm == directBm, s"bm25 $q")
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

  test("append == fresh rebuild of the union corpus, across two deltas") {
    val part1 = docs.where(col("doc_id") % 3 === 0)
    val part2 = docs.where(col("doc_id") % 3 === 1)
    val part3 = docs.where(col("doc_id") % 3 === 2)
    var h = TextIndex.write(part1, freshPath("inc"), buckets = 16)
    h = TextIndex.append(part2, h)
    h = TextIndex.append(part3, h)
    val full = TextIndex.write(docs, freshPath("full"), buckets = 16)
    assert(h.nDocs == full.nDocs)
    for (q <- Seq(Seq("query", "merge"), Seq("stream", "scan"))) {
      val a = TextIndex.searchTopK(spark, h, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val b = TextIndex.searchTopK(spark, full, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a == b, s"query $q")
      // dl/big_l are additive too: the BM25 tier survives appends
      val abm = TextIndex.bm25TopK(spark, h, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val bbm = TextIndex.bm25TopK(spark, full, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(abm == bbm, s"bm25 $q")
    }
    assert(h.bigL == full.bigL)
  }

  test("open() heals an interrupted dict swap (dict.next only)") {
    val h = TextIndex.write(docs.where(col("doc_id") < 100),
      freshPath("heal"), buckets = 8)
    val dict = new java.io.File(h.path, "dict")
    val next = new java.io.File(h.path, "dict.next")
    assert(dict.renameTo(next)) // simulate crash between delete and rename
    val healed = TextIndex.open(h.path)
    assert(healed == h && dict.exists && !next.exists)
    val r = TextIndex.searchTopK(spark, healed, Seq("query"), k = 3).collect()
    assert(r.nonEmpty)
  }

  test("append crash BEFORE the commit marker aborts; retry converges") {
    val part1 = docs.where(col("doc_id") % 2 === 0)
    val part2 = docs.where(col("doc_id") % 2 === 1)
    val h = TextIndex.write(part1, freshPath("crashpre"), buckets = 8)
    intercept[IllegalStateException] {
      TextIndex.append(part2, h, "text", crashAfterStep = 2)
    }
    // heal-on-open ABORTS: index is bit-the old index, staging gone
    val healed = TextIndex.open(h.path)
    assert(healed == h)
    assert(!new java.io.File(h.path, "append.pending").exists)
    assert(!new java.io.File(h.path, "dict.next").exists)
    val before = TextIndex.searchTopK(spark, healed, Seq("query", "merge"),
      k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = TextIndex.searchTopK(spark,
      TextIndex.write(part1, freshPath("crashpre2"), buckets = 8),
      Seq("query", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(before == direct)
    // the retried append lands the delta exactly once
    val after = TextIndex.append(part2, healed)
    val full = TextIndex.write(docs, freshPath("crashpre3"), buckets = 8)
    assert(after.nDocs == full.nDocs)
    val a = TextIndex.searchTopK(spark, after, Seq("query", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = TextIndex.searchTopK(spark, full, Seq("query", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("append crash AFTER the commit marker rolls forward on open") {
    val part1 = docs.where(col("doc_id") % 2 === 0)
    val part2 = docs.where(col("doc_id") % 2 === 1)
    val h = TextIndex.write(part1, freshPath("crashpost"), buckets = 8)
    intercept[IllegalStateException] {
      TextIndex.append(part2, h, "text", crashAfterStep = 4)
    }
    val healed = TextIndex.open(h.path) // publish completes here
    val full = TextIndex.write(docs, freshPath("crashpost2"), buckets = 8)
    assert(healed.nDocs == full.nDocs)
    assert(healed.bigL == full.bigL) // intent big_l landed through heal
    assert(!new java.io.File(h.path, "append.pending").exists)
    val a = TextIndex.searchTopK(spark, healed, Seq("query", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = TextIndex.searchTopK(spark, full, Seq("query", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    // the healed doclen renames reached the live dir: BM25 needs every
    // doc's dl row, so any silently-dropped staged file would show here
    val abm = TextIndex.bm25TopK(spark, healed, Seq("query", "merge"),
        k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bbm = TextIndex.bm25TopK(spark, full, Seq("query", "merge"),
        k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(abm == bbm)
  }

  test("a pre-BM25 meta opens with the legacy marker; bm25 refuses loudly") {
    val h = TextIndex.write(docs.where(col("doc_id") < 60),
      freshPath("legacy"), buckets = 8)
    // rewrite meta in the old two-field shape through the same Hadoop FS
    // the old binary used (java.nio would leave a stale .crc sidecar)
    val metaP = new org.apache.hadoop.fs.Path(h.path, "text_index.json")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaP, true)
    out.write(s"""{"n_docs":${h.nDocs},"buckets":${h.buckets}}"""
      .getBytes("UTF-8"))
    out.close()
    val legacy = TextIndex.open(h.path)
    assert(legacy.bigL == -1L)
    // tf-idf search still works; BM25 fails with a readable message
    assert(TextIndex.searchTopK(spark, legacy, Seq("query"), k = 3)
      .collect().nonEmpty)
    val e = intercept[IllegalArgumentException] {
      TextIndex.bm25TopK(spark, legacy, Seq("query"), k = 3)
    }
    assert(e.getMessage.contains("rebuild"))
  }

  test("positional tier: indexed phrase search == TextOps.phraseSearch") {
    val h = TextIndex.write(docs, freshPath("pos"), buckets = 16)
    TextIndex.writePositional(docs, h)
    for (phrase <- Seq(Seq("hash", "join"), Seq("table", "scan"),
        Seq("no", "such", "phrase"))) {
      val direct = TextOps.phraseSearch(docs, phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val viaIdx = TextIndex.phraseSearch(spark, h, phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(viaIdx == direct, s"phrase $phrase")
    }
    // the phrase probe carries the bucket partition filter
    val s = TextIndex.phraseSearch(spark, h, Seq("hash", "join"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(s.contains("PartitionFilters") && s.contains("bucket"))
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
