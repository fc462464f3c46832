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
    // append must refuse too: targetL = -1 + deltaL would launder the
    // refusal marker into a bogus big_l with a delta-only doclen table
    val e2 = intercept[IllegalArgumentException] {
      TextIndex.append(docs.where(col("doc_id") >= 60 &&
        col("doc_id") < 70), legacy)
    }
    assert(e2.getMessage.contains("rebuild"))
  }

  test("write() rebuild discards a crashed append's committed staging") {
    val part1 = docs.where(col("doc_id") < 80)
    val part2 = docs.where(col("doc_id") >= 80 && col("doc_id") < 120)
    val path = freshPath("rebuild")
    val h = TextIndex.write(part1, path, buckets = 8)
    // crash AFTER the _staged commit marker: staging + dict.next survive
    intercept[IllegalStateException] {
      TextIndex.append(part2, h, "text", crashAfterStep = 4)
    }
    assert(new java.io.File(path, "append.pending").exists)
    // the rebuild at the SAME path (CLI `index` / delta-rebuild flow)
    // must supersede the staging — without the discard, the next open
    // would roll part2's stale postings into the new index and stamp
    // the stale intent's n_docs/big_l over its meta
    val rebuilt = TextIndex.write(part1, path, buckets = 8)
    assert(!new java.io.File(path, "append.pending").exists)
    assert(!new java.io.File(path, "dict.next").exists)
    val reopened = TextIndex.open(path)
    assert(reopened == rebuilt)
    val fresh = TextIndex.write(part1, freshPath("rebuild2"), buckets = 8)
    assert(reopened.nDocs == fresh.nDocs && reopened.bigL == fresh.bigL)
    val a = TextIndex.searchTopK(spark, reopened, Seq("query", "merge"),
      k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = TextIndex.searchTopK(spark, fresh, Seq("query", "merge"),
      k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("bm25 raises per-row when tf wraps the fixed point (forged big L)") {
    val d = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "dense dense dense dense filler"),
        org.apache.spark.sql.Row(2L, "dense other words here")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val h = TextIndex.write(d, freshPath("wrap"), buckets = 4)
    // the largest big_l the driver-side (tf = 1) require admits — at
    // which maxTf = 1, so doc 1's tf = 4 row must raise, not wrap
    val forged = h.copy(bigL = Long.MaxValue / 22000000L)
    val e = intercept[Exception] {
      TextIndex.bm25TopK(spark, forged, Seq("dense"), k = 5).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("wraps"), msgs.take(500))
    // the genuine handle still scores fine
    assert(TextIndex.bm25TopK(spark, h, Seq("dense"), k = 5)
      .collect().nonEmpty)
  }

  test("compact defragments appended buckets; search parity bit-equal") {
    val parts = (0L to 3L).map(r => docs.where(col("doc_id") % 4 === r))
    var h = TextIndex.write(parts.head, freshPath("compact"), buckets = 8)
    for (p <- parts.tail) h = TextIndex.append(p, h)
    TextIndex.writePositional(docs, h)
    def bucketFiles(dir: String): Map[String, Int] = {
      val root = new java.io.File(h.path, dir)
      root.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("bucket=")).map { b =>
        b.getName -> b.listFiles().count(_.getName.startsWith("part-"))
      }.toMap
    }
    val before = bucketFiles("postings")
    assert(before.values.max >= 4, // one file set per append, at least
      s"expected fragmentation from 3 appends, got $before")
    val queries = Seq(Seq("query", "merge"), Seq("stream", "scan"))
    val preSearch = queries.map(q => TextIndex.searchTopK(spark, h, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val preBm = queries.map(q => TextIndex.bm25TopK(spark, h, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val prePhrase = TextIndex.phraseSearch(spark, h, Seq("hash", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hc = TextIndex.compact(spark, h)
    assert(hc == h) // layout maintenance only — meta unchanged
    val after = bucketFiles("postings")
    assert(after.keySet == before.keySet)
    assert(after.values.max <= 1, s"compact left fragments: $after")
    assert(bucketFiles("positions").values.max <= 1)
    for ((q, i) <- queries.zipWithIndex) {
      assert(TextIndex.searchTopK(spark, hc, q, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        == preSearch(i), s"search $q")
      assert(TextIndex.bm25TopK(spark, hc, q, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        == preBm(i), s"bm25 $q")
    }
    assert(TextIndex.phraseSearch(spark, hc, Seq("hash", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap == prePhrase)
    // reopen still sees the identical meta
    assert(TextIndex.open(h.path) == h)
  }

  test("open() restores an interrupted compact swap (postings missing)") {
    val h = TextIndex.write(docs.where(col("doc_id") < 100),
      freshPath("cswap"), buckets = 8)
    val live = new java.io.File(h.path, "postings")
    val bak = new java.io.File(h.path, "postings_compact_bak")
    assert(live.renameTo(bak)) // crash between rename(dst->bak) and (tmp->dst)
    val healed = TextIndex.open(h.path)
    assert(healed == h && live.exists && !bak.exists)
    assert(TextIndex.searchTopK(spark, healed, Seq("query"), k = 3)
      .collect().nonEmpty)
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
