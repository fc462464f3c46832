package graft.store

import graft.pipeline.TextOps
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the warehouse `interval=` discipline
  * applied to keyword search: postings and dictionary live as
  * `bucket=`-partitioned parquet (bucket = 60-bit token hash mod
  * `buckets`), so a query probes ONLY its terms' buckets through a
  * LITERAL partition filter (statically pruned, plan-asserted in
  * PlanAudit) instead of scanning the corpus the way the on-the-fly
  * q65 scorer must. Build once per corpus snapshot; at 100 TB the
  * postings build is one (doc, token) partial-agg shuffle + a
  * partitioned write, and every later query touches
  * `|query terms| / buckets` of the index bytes.
  *
  * Search semantics are EXACTLY [[TextOps.searchTopK]] (same integer
  * `(N·10⁶) div df` idf, same tf·idf sum, same (score desc, doc_id)
  * top-k) — spec-pinned bit-equal, so the q65 oracle SQL is also this
  * tier's oracle. df is precomputed at build time (corpus stats are
  * static per snapshot), shipped in the bucket-partitioned `dict`
  * table; `n_docs` rides text_index.json and enters the plan as a
  * literal.
  *
  * All file operations go through the Hadoop FileSystem API resolved
  * from the index path itself, so the store (and every crash heal)
  * works the same on local disk, HDFS or an object store. */
object TextIndex {

  final case class Handle(path: String, nDocs: Long, buckets: Int,
                          bigL: Long)

  /** Driver-side replica of [[TextOps.md5Long]] for bucket routing. */
  def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Schemes already warned about — the store contract ([[Lease]]
    * scaladoc) requires HDFS-class atomic create/rename, which S3-class
    * object stores emulate non-atomically; warn once per scheme, not per
    * call. */
  private val warnedSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[store] def fsOf(path: String): FileSystem = {
    val p = new HPath(path)
    val scheme = Option(p.toUri.getScheme).getOrElse("").toLowerCase
    if (Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss")(scheme) &&
        warnedSchemes.add(scheme))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"graft store at a '$scheme' object-store path: the Lease and " +
          "staging protocols require HDFS-class atomic create/rename " +
          "(see graft.store.Lease scaladoc) — on this store the lease " +
          "degrades to advisory and crash atomicity is best-effort; use " +
          "a conditional-write backend for production mutation")
    p.getFileSystem(
      org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration)
  }

  private[store] def readSmall(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.commons.io.IOUtils.copy(in, bos)
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  private[store] def writeSmall(fs: FileSystem, p: HPath, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Atomic replacement for [[writeSmall]] where a PARTIAL file must
    * never be observable (commit markers, advisory ledgers): the content
    * lands complete in a tmp name first and the rename is the publish.
    * A crash leaves either the old file, no file, or the new file —
    * never a truncated one (the plain create-truncate shape can strand a
    * 0-byte file that poisons every later parse). The delete→rename pair
    * is not itself atomic (Hadoop rename refuses existing targets): a
    * crash between them loses the OLD file, so callers must tolerate
    * absence — every caller here does (markers are existence checks,
    * ledgers degrade to "no baseline"). */
  private[graft] def writeSmallAtomic(fs: FileSystem, p: HPath,
                                      s: String): Unit = {
    val tmp = new HPath(p.getParent,
      s"${p.getName}.tmp.${System.nanoTime()}")
    writeSmall(fs, tmp, s)
    fs.delete(p, false)
    renameOrFail(fs, tmp, p)
  }

  /** Bounded poll of a `Dataset.observe` metric row — the observed write
    * is the action, so metrics arrive within milliseconds of it; None
    * (callers skip their advisory update, never block a pipeline) if the
    * metrics node was pruned (e.g. an empty batch) or never fires within
    * `timeoutMs`. One implementation for every store-side ride-along
    * observation (BandIndex/IvfStore drift, baselines). */
  private[store] def readObsRow(obs: org.apache.spark.sql.Observation,
                                timeoutMs: Long = 30000L): Option[org.apache.spark.sql.Row] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!obs.future.isCompleted && System.nanoTime() < deadline)
      Thread.sleep(10)
    if (!obs.future.isCompleted) None
    else Some(scala.concurrent.Await.result(obs.future,
      scala.concurrent.duration.Duration(1, "s")))
  }

  private[store] def jsonField(s: String, k: String): Long =
    s.split(s""""$k":""")(1).takeWhile(c => c.isDigit || c == '-').toLong

  /** Absent field → None instead of an opaque index-out-of-bounds —
    * metas written before a field existed must stay openable. */
  private[store] def jsonFieldOpt(s: String, k: String): Option[Long] = {
    val parts = s.split(s""""$k":""")
    if (parts.length < 2) None
    else Some(parts(1).takeWhile(c => c.isDigit || c == '-').toLong)
  }

  private[store] def renameOrFail(fs: FileSystem, src: HPath, dst: HPath): Unit =
    require(fs.rename(src, dst),
      s"TextIndex: rename $src -> $dst failed (Hadoop rename returns " +
        "false on missing destination parents or existing targets)")

  /** One step of a committed-rebuild roll-forward: swap
    * `<dir>_rebuild_tmp` into `<dir>` (old generation aside, then
    * dropped). Idempotent from every crash point — a tmp that is gone
    * already swapped; the backup always clears. Only ever called under a
    * rebuild marker, so the old generation is never needed back. */
  private[store] def rollRebuildSwap(fs: FileSystem, path: String,
                                     dir: String): Unit = {
    val tmp = new HPath(path, dir + "_rebuild_tmp")
    val bak = new HPath(path, dir + "_rebuild_bak")
    val dst = new HPath(path, dir)
    if (fs.exists(tmp)) {
      fs.delete(bak, true)
      if (fs.exists(dst)) renameOrFail(fs, dst, bak)
      renameOrFail(fs, tmp, dst)
    }
    fs.delete(bak, true)
  }

  private def postingsOf(docs: DataFrame, buckets: Int,
                         text: String): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col(text))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(TextOps.md5Long(col("token")), lit(buckets.toLong)))

  def write(docs: DataFrame, path: String, buckets: Int = 64,
            text: String = "text"): Handle =
    write(docs, path, buckets, text, 0)

  private[store] def write(docs: DataFrame, path: String, buckets: Int,
            text: String, crashAfterStep: Int): Handle =
      Lease.withLease(path, "TextIndex.write") {
    def crash(step: Int): Unit = if (step == crashAfterStep)
      throw new RuntimeException(s"spec crash seam: rebuild step $step")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val wfs = fsOf(path)
    // roll forward a prior COMMITTED rebuild first (its marker
    // supersedes everything at this path), so the staging below starts
    // clean
    completeRebuild(path)
    // 1. stage the new generation into tmp dirs — the live index stays
    //    fully intact and searchable until the commit marker below: a
    //    crash (or a lease lost to a GC-pause takeover) during these
    //    long writes must not leave a mixed-generation index (new
    //    postings under the old meta's n_docs/big_l was exactly that
    //    corruption)
    for (d <- Seq("postings", "dict", "doclen"))
      wfs.delete(new HPath(path, d + "_rebuild_tmp"), true)
    val tf = postingsOf(docs, buckets, text)
    withWriterCoalesce(docs.sparkSession) {
      tf.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/postings_rebuild_tmp")
    }
    // df = docs-per-token over the postings just written (re-read: the
    // written files are the one materialization; no second corpus scan)
    val spark = docs.sparkSession
    withWriterCoalesce(spark) {
      spark.read.parquet(s"$path/postings_rebuild_tmp")
        .groupBy("bucket", "token").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/dict_rebuild_tmp")
    }
    // per-doc length (Σ tf) — the BM25 normalizer; derived from the
    // written postings, so still a single corpus scan overall
    withWriterCoalesce(spark) {
      spark.read.parquet(s"$path/postings_rebuild_tmp")
        .groupBy("doc_id").agg(sum("tf").as("dl"))
        .write.mode("overwrite").parquet(s"$path/doclen_rebuild_tmp")
    }
    val bigL = spark.read.parquet(s"$path/doclen_rebuild_tmp")
      .agg(coalesce(sum("dl"), lit(0L))).head().getLong(0)
    val nDocs = docs.count()
    crash(1) // staged, not committed: open() leaves the old index as-is
    // 2. commit point — fenced (a writer that lost its lease must not
    //    supersede the successor's generation), then the marker rename
    //    is the atomic commit; everything after rolls forward
    Lease.fence(path, "TextIndex.write")
    writeSmallAtomic(wfs, new HPath(path, "rebuild.intent.json"),
      s"""{"n_docs":$nDocs,"buckets":$buckets,"big_l":$bigL}""")
    crash(2) // committed: open() completes the rebuild
    completeRebuild(path)
    Handle(path, nDocs, buckets, bigL)
  }

  /** Roll a COMMITTED rebuild forward — idempotent from every crash
    * point, called by [[open]] and [[write]]; no-op without the marker.
    * The superseded generation's maintenance state dies first: a staged
    * append — even one past its `_staged` commit marker — belongs to the
    * dead generation (healing it into the NEW index would roll stale
    * postings in and overwrite the fresh meta with the stale intent's
    * n_docs/big_l: corruption with no error — rebuilding at a fixed path
    * after a crashed append is exactly the CLI `index` /
    * textIndexDeltaFor flow, so this is a live path, not paranoia), and
    * so does the POSITIONAL tier: `positions/` indexes the superseded
    * corpus, and [[phraseSearch]] answering from it after a rebuild
    * would silently return the old corpus's phrases — re-run
    * [[writePositional]] after a rebuild. Then postings/dict/doclen
    * swap in, the meta lands, and the marker clears. */
  private def completeRebuild(path: String): Unit = {
    val fs = fsOf(path)
    val marker = new HPath(path, "rebuild.intent.json")
    if (!fs.exists(marker)) return
    // no-op from the lease-free heal path (open); aborts a leased writer
    // whose lease was taken over — the successor's own open() rolls the
    // committed marker forward to the identical end state
    Lease.fence(path, "TextIndex.completeRebuild")
    val intent = readSmall(fs, marker)
    for (d <- Seq("append.pending", "dict.next", "positions"))
      fs.delete(new HPath(path, d), true)
    for (d <- Seq("postings", "dict", "doclen"))
      rollRebuildSwap(fs, path, d)
    writeSmall(fs, new HPath(path, "text_index.json"),
      s"""{"n_docs":${jsonField(intent, "n_docs")},""" +
        s""""buckets":${jsonField(intent, "buckets")},""" +
        s""""big_l":${jsonField(intent, "big_l")}}""")
    fs.delete(marker, false)
  }

  def open(path: String): Handle = {
    // a COMMITTED rebuild supersedes every other pending state — roll it
    // forward before the per-generation heals below
    completeRebuild(path)
    // restore interrupted compact swaps BEFORE the append heal: its
    // publishPending mkdirs into postings/, and a writer that recreates
    // a mid-swap-missing dir strands the backup for the next compact's
    // cleanup to delete (the Warehouse restoreStore lesson)
    val ofs = fsOf(path)
    for (d <- Seq("postings", "doclen", "positions"))
      restoreInterruptedSwap(ofs, path, d)
    healPending(path)
    val s = readSmall(fsOf(path), new HPath(path, "text_index.json"))
    // big_l = -1 marks an index persisted before the BM25 tier existed:
    // tf-idf/phrase search still work; bm25TopK refuses loudly
    Handle(path, jsonField(s, "n_docs"), jsonField(s, "buckets").toInt,
      jsonFieldOpt(s, "big_l").getOrElse(-1L))
  }

  /** Incremental maintenance: index a batch of NEW documents into an
    * existing index. Delta postings and the merged dict are STAGED
    * first, then published in an order every crash point of which
    * [[open]] can resolve — the Warehouse compact/publish discipline:
    *
    *  1. delta postings → `append.pending/postings` (staging);
    *  2. intent (target n_docs) → `append.pending/intent.json`;
    *  3. merged dict (vocab-sized `df` sums) → `dict.next`;
    *  4. `append.pending/_staged` marker — the commit point;
    *  5. staged files RENAMED into the live `postings` bucket dirs
    *     (unique part names — idempotent on replay);
    *  6. dict swap (delete `dict`, rename `dict.next`);
    *  7. meta rewritten to the intent's target (idempotent);
    *  8. staging removed.
    *
    * Crash before the `_staged` marker → [[open]] ABORTS the append
    * (staging + `dict.next` deleted, index untouched — re-run it);
    * crash after → [[open]] ROLLS FORWARD (finishes the renames, the
    * swap and the meta write). At no point does a reader see new
    * postings with the old dict or vice versa after heal. The doc_ids
    * MUST be new — this is append, not upsert; re-adding an id
    * double-counts it exactly as appending the same rows twice to any
    * log would.
    *
    * Search results after append are BIT-EQUAL to a fresh [[write]] of
    * the union corpus (spec-pinned): postings/df/n_docs are all
    * additive. At 100 TB this is the point — the nightly crawl delta
    * indexes in time ∝ delta, never corpus. */
  def append(newDocs: DataFrame, h: Handle,
             text: String = "text"): Handle =
    append(newDocs, h, text, crashAfterStep = 99)

  /** [[append]] with an injected crash point — spec-only seam for the
    * heal matrix (2 = before the commit marker, 4 = after it). */
  private[store] def append(newDocs: DataFrame, h: Handle, text: String,
                            crashAfterStep: Int): Handle =
      Lease.withLease(h.path, "TextIndex.append") {
    def crash(step: Int): Unit = if (step == crashAfterStep)
      throw new IllegalStateException(s"injected crash after step $step")
    // a legacy (pre-BM25) index carries bigL = -1 as a refusal marker;
    // targetL = -1 + deltaL would launder it into a bogus non-negative
    // big_l whose doclen table covers ONLY the appended docs — bm25TopK
    // would then mis-score silently instead of refusing
    require(h.bigL >= 0,
      "append: index has no big_l/doclen (built before the BM25 tier) — " +
        "rebuild it with TextIndex.write before appending")
    val spark = newDocs.sparkSession
    val fs = fsOf(h.path)
    healPending(h.path) // resolve any interrupted predecessor first
    val pending = new HPath(h.path, "append.pending")
    require(!fs.exists(pending),
      s"append.pending survived heal — concurrent append? ${h.path}")
    // 1. stage the delta postings + doc lengths
    val tf = postingsOf(newDocs, h.buckets, text)
    withWriterCoalesce(newDocs.sparkSession) {
      tf.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"${h.path}/append.pending/postings")
      newDocs.sparkSession.read
        .parquet(s"${h.path}/append.pending/postings")
        .groupBy("doc_id").agg(sum("tf").as("dl"))
        .write.mode("overwrite")
        .parquet(s"${h.path}/append.pending/doclen")
    }
    crash(1)
    // 2. intent: the TARGET counts (idempotent for the heal)
    val target = h.nDocs + newDocs.count()
    val targetL = h.bigL + newDocs.sparkSession.read
      .parquet(s"${h.path}/append.pending/doclen")
      .agg(coalesce(sum("dl"), lit(0L))).head().getLong(0)
    writeSmall(fs, new HPath(pending, "intent.json"),
      s"""{"n_docs":$target,"big_l":$targetL}""")
    crash(2)
    // 3. merged dict
    val add = spark.read.parquet(s"${h.path}/append.pending/postings")
      .groupBy("bucket", "token").agg(count(lit(1)).as("df"))
    withWriterCoalesce(spark) {
      spark.read.parquet(s"${h.path}/dict")
        .select("bucket", "token", "df").unionByName(add)
        .groupBy("bucket", "token").agg(sum("df").as("df"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"${h.path}/dict.next")
    }
    crash(3)
    // 4. commit point — fenced: a writer that lost its lease to a
    // stale-takeover while staging must not commit into the successor's
    // generation (open() will then ABORT the unmarked staging)
    Lease.fence(h.path, "TextIndex.append")
    writeSmall(fs, new HPath(pending, "_staged"), "")
    crash(4)
    // 5-8. publish
    publishPending(h.path)
    Handle(h.path, target, h.buckets, targetL)
  }

  /** Resolve an interrupted [[append]]: abort if it never reached the
    * `_staged` commit point, roll it forward otherwise. No-op when no
    * staging exists. */
  private def healPending(path: String): Unit = {
    val fs = fsOf(path)
    val pending = new HPath(path, "append.pending")
    val next = new HPath(path, "dict.next")
    if (fs.exists(pending)) {
      if (fs.exists(new HPath(pending, "_staged"))) publishPending(path)
      else { fs.delete(pending, true); fs.delete(next, true) }
    } else if (fs.exists(next)) {
      if (fs.exists(new HPath(path, "dict"))) fs.delete(next, true)
      else fs.rename(next, new HPath(path, "dict")) // legacy swap heal
    }
  }

  /** Steps 5-8 of [[append]] — safe to re-run from any crash point:
    * renames skip already-moved files, the swap skips when already
    * done, the meta write lands the intent's absolute target. */
  private def publishPending(path: String): Unit = {
    // no-op from the lease-free heal path (open); aborts a leased writer
    // whose lease was taken over while it staged
    Lease.fence(path, "TextIndex.publishPending")
    val fs = fsOf(path)
    val pending = new HPath(path, "append.pending")
    val staged = new HPath(pending, "postings")
    if (fs.exists(staged)) {
      for (b <- fs.listStatus(staged) if b.isDirectory) {
        val dst = new HPath(s"$path/postings/${b.getPath.getName}")
        fs.mkdirs(dst)
        for (f <- fs.listStatus(b.getPath) if f.isFile)
          renameOrFail(fs, f.getPath, new HPath(dst, f.getPath.getName))
      }
    }
    val stagedDl = new HPath(pending, "doclen")
    if (fs.exists(stagedDl)) {
      val dlDir = new HPath(path, "doclen")
      fs.mkdirs(dlDir) // rename silently returns false without the parent
      for (f <- fs.listStatus(stagedDl)
           if f.isFile && f.getPath.getName.startsWith("part-"))
        renameOrFail(fs, f.getPath, new HPath(dlDir, f.getPath.getName))
    }
    val dict = new HPath(path, "dict")
    val next = new HPath(path, "dict.next")
    if (fs.exists(next)) {
      fs.delete(dict, true)
      renameOrFail(fs, next, dict)
    }
    val intent = readSmall(fs, new HPath(pending, "intent.json"))
    val meta = readSmall(fs, new HPath(path, "text_index.json"))
    val buckets = jsonField(meta, "buckets")
    // an intent from a pre-BM25 binary lacks big_l — keep the meta's
    // (possibly absent → -1 legacy marker) rather than crash
    val bigL = jsonFieldOpt(intent, "big_l")
      .orElse(jsonFieldOpt(meta, "big_l")).getOrElse(-1L)
    writeSmall(fs, new HPath(path, "text_index.json"),
      s"""{"n_docs":${jsonField(intent, "n_docs")},"buckets":$buckets,""" +
        s""""big_l":$bigL}""")
    fs.delete(pending, true)
  }

  /** If a compact crashed between `rename(dst -> bak)` and
    * `rename(tmp -> dst)`, `dst` is missing and the backup holds the
    * only copy — restore it (the Warehouse restoreInterruptedSwap
    * discipline; rename-loser tolerance for concurrent readers). */
  private[store] def restoreInterruptedSwap(fs: FileSystem, path: String,
                                     dir: String): Unit = {
    val dstP = new HPath(path, dir)
    val bakP = new HPath(path, dir + "_compact_bak")
    if (!fs.exists(dstP) && fs.exists(bakP)) {
      if (!fs.rename(bakP, dstP))
        require(fs.exists(dstP),
          s"TextIndex compact: restore $bakP -> $dstP failed")
    }
  }

  /** Offline maintenance: rewrite the index into few large sorted files
    * per bucket. Every [[append]] renames its delta's part files into the
    * live bucket dirs, so after many small deltas each bucket holds one
    * file set PER APPEND — the classic small-files fragmentation that
    * erodes probe efficiency (tiny row groups defeat min/max pruning,
    * file opens dominate the bucket-pruned scan). Compaction restores
    * `filesPerPartition` token-sorted files per bucket with content
    * identical, so search results are bit-equal before and after
    * (spec-pinned). Crash-safe via the Warehouse directory-swap
    * discipline: live dir moves aside before the rewrite moves in, and
    * [[open]] (or the next compact) restores an interrupted swap. Run
    * offline, like every reference maintenance tool. */
  def compact(spark: SparkSession, h: Handle,
              filesPerPartition: Int = 1): Handle =
      Lease.withLease(h.path, "TextIndex.compact") {
    require(filesPerPartition >= 1,
      s"filesPerPartition must be >= 1: $filesPerPartition")
    val fs = fsOf(h.path)
    for (d <- Seq("postings", "doclen", "positions"))
      restoreInterruptedSwap(fs, h.path, d)
    healPending(h.path) // an unresolved append must publish before rewrite
    def swap(tmp: String, dir: String): Unit = {
      Lease.fence(h.path, "TextIndex.compact")
      val tmpP = new HPath(h.path, tmp)
      val dstP = new HPath(h.path, dir)
      val bakP = new HPath(h.path, dir + "_compact_bak")
      fs.delete(bakP, true)
      if (fs.exists(dstP)) renameOrFail(fs, dstP, bakP)
      renameOrFail(fs, tmpP, dstP)
      fs.delete(bakP, true)
    }
    withWriterCoalesce(spark) {
      spark.read.parquet(s"${h.path}/postings")
        .repartition(col("bucket"),
          pmod(xxhash64(col("token")), lit(filesPerPartition)))
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"${h.path}/postings_compact_tmp")
      swap("postings_compact_tmp", "postings")
      if (fs.exists(new HPath(h.path, "doclen"))) {
        spark.read.parquet(s"${h.path}/doclen")
          .repartition(filesPerPartition, col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(s"${h.path}/doclen_compact_tmp")
        swap("doclen_compact_tmp", "doclen")
      }
      if (fs.exists(new HPath(h.path, "positions"))) {
        spark.read.parquet(s"${h.path}/positions")
          .repartition(col("bucket"),
            pmod(xxhash64(col("token")), lit(filesPerPartition)))
          .sortWithinPartitions("token", "doc_id", "pos")
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"${h.path}/positions_compact_tmp")
        swap("positions_compact_tmp", "positions")
      }
    }
    h // layout maintenance only — content and meta are unchanged
  }

  /** The POSITIONAL tier: per-occurrence postings (bucket, token,
    * doc_id, pos) alongside the tf index — what indexed PHRASE search
    * needs. One row per token occurrence (corpus-token-sized; the
    * documented cost of positional retrieval — build it only when
    * phrase/proximity queries matter). Same bucket routing, so a
    * phrase probes only its terms' buckets. */
  def writePositional(docs: DataFrame, h: Handle,
                      text: String = "text"): Unit =
      Lease.withLease(h.path, "TextIndex.writePositional") {
    Lease.fence(h.path, "TextIndex.writePositional")
    withWriterCoalesce(docs.sparkSession) {
      docs
        .select(col("doc_id"),
          posexplode(TextOps.tokens(col(text))).as(Seq("pos", "token")))
        .withColumn("bucket",
          pmod(TextOps.md5Long(col("token")), lit(h.buckets.toLong)))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"${h.path}/positions")
    }
    }

  /** Exact phrase search over the positional tier — [[TextOps
    * .phraseSearch]] semantics (consecutive tokens, overlapping matches
    * counted) with the corpus never scanned: every phrase term's
    * postings come from its bucket partition (literal bucket IN
    * filter), then the |phrase|−1 equi-join chain on (doc_id, pos − i)
    * runs over term-sized frames. */
  def phraseSearch(spark: SparkSession, h: Handle,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two tokens")
    // refuse loudly, like bm25TopK on a pre-BM25 index: a missing
    // positional tier (never built, or superseded by a rebuild — write()
    // deletes positions/ because they index the OLD corpus) must not
    // surface as an opaque path-not-found from the scan
    require(fsOf(h.path).exists(new HPath(h.path, "positions")),
      s"TextIndex.phraseSearch: no positional tier at ${h.path} — run " +
        "writePositional(...) first (a rebuild supersedes positions/: " +
        "they index the superseded corpus)")
    val bs = phrase.map(t => md5Long60(t) % h.buckets).distinct
    val post = spark.read.parquet(s"${h.path}/positions")
      .where(col("bucket").isin(bs: _*) &&
        col("token").isInCollection(phrase.distinct))
    val anchor = post.where(col("token") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.tail
      .foldLeft(anchor) { case (acc, (t, i)) =>
        acc.join(
          post.where(col("token") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }

  /** BM25 top-k over the index — [[TextOps.bm25TopK]]'s exact rational
    * (k1 = 1.2, b = 0.75 multiplied through by 10·L, fixed point 1e6)
    * with the corpus never scanned: tf from the bucket-pruned postings,
    * df from the dict, dl from the doc-keyed `doclen` table (candidate
    * docs are query-term-sized, so AQE broadcasts them into the dl
    * join), L and N as literals from meta. Spec-pinned bit-equal to the
    * on-the-fly scorer, so the q99 oracle shape carries over. */
  def bm25TopK(spark: SparkSession, h: Handle, query: Seq[String],
               k: Int): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k >= 1, s"k must be >= 1, got $k")
    require(h.bigL >= 0,
      "bm25TopK: index has no big_l/doclen (built before the BM25 " +
        "tier) — rebuild it with TextIndex.write")
    // the saturation numerator is 22·tf·L·10⁶ — already past int64 at
    // tf = 1 once L exceeds ~4.19e11 tokens; shard or rescale beyond
    require(h.bigL <= Long.MaxValue / 22000000L,
      s"bm25TopK: big_l=${h.bigL} wraps the 22·tf·L·1e6 fixed point — " +
        "shard the corpus or drop the e6 scale")
    // real tf MULTIPLIES the requirement: the driver-side require above
    // only covers tf = 1, so rows whose tf pushes 22·tf·L·1e6 past int64
    // raise per-row (the epsilonJoin/semanticDedup discipline) instead
    // of wrapping silently. _tf_ok feeds the live score expression, so
    // the guard can never be pruned away.
    val maxTf: Long =
      if (h.bigL == 0L) Long.MaxValue
      else (BigInt(Long.MaxValue) / (BigInt(22) * h.bigL * 1000000L)).toLong
    val bs = query.map(t => md5Long60(t) % h.buckets).distinct
    val tf = spark.read.parquet(s"${h.path}/postings")
      .where(col("bucket").isin(bs: _*) &&
        col("token").isInCollection(query))
      .select("doc_id", "token", "tf")
      .withColumn("_tf_ok",
        when(col("tf") > maxTf,
          raise_error(concat(lit("bm25TopK: tf="), col("tf"),
            lit(s" wraps the 22·tf·L·1e6 fixed point at big_l=${h.bigL}" +
              " — shard the corpus or drop the e6 scale")))
            .cast("long"))
          .otherwise(col("tf")))
    val idf = spark.read.parquet(s"${h.path}/dict")
      .where(col("bucket").isin(bs: _*) &&
        col("token").isInCollection(query))
      .select(col("token"),
        expr(s"(${h.nDocs}L * 1000000L) div df").as("idf_scaled"))
    val dl = spark.read.parquet(s"${h.path}/doclen")
    tf.join(broadcast(idf), "token")
      .join(dl, "doc_id")
      .withColumn("_sat_e6", expr(
        s"(22 * _tf_ok * ${h.bigL}L * 1000000) div " +
          s"(10 * _tf_ok * ${h.bigL}L + 3 * ${h.bigL}L + 9 * dl * ${h.nDocs}L)"))
      .groupBy("doc_id")
      .agg(sum(col("idf_scaled") * col("_sat_e6")).as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(k)
  }

  /** Top-k docs for a term bag — [[TextOps.searchTopK]] over the index.
    * Both scans carry the literal `bucket IN (...)` partition filter of
    * the query's own buckets plus the term filter; everything after is
    * query-term-sized. */
  def searchTopK(spark: SparkSession, h: Handle, query: Seq[String],
                 k: Int): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k >= 1, s"k must be >= 1, got $k")
    val bs = query.map(t => md5Long60(t) % h.buckets).distinct
    val post = spark.read.parquet(s"${h.path}/postings")
      .where(col("bucket").isin(bs: _*) &&
        col("token").isInCollection(query))
    val idf = spark.read.parquet(s"${h.path}/dict")
      .where(col("bucket").isin(bs: _*) &&
        col("token").isInCollection(query))
      .select(col("token"),
        expr(s"(${h.nDocs}L * 1000000L) div df").as("idf_scaled"))
    post.join(broadcast(idf), "token")
      .groupBy("doc_id").agg(sum(col("tf") * col("idf_scaled")).as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(k)
  }
}
