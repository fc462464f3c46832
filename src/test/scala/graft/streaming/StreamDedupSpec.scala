package graft.streaming

import graft.SparkSpec
import graft.pipeline.Dedup
import graft.store.BandIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming corpus-dedup sink: micro-batches probe the persisted
  * band index, survivors append, replays are no-ops — end state equal
  * to the batch pipeline run over the same drops in order. */
class StreamDedupSpec extends SparkSpec {

  private def doc(id: Long, text: String) = (id, text)
  private val base = Seq(
    doc(1, "alpha beta gamma delta epsilon zeta eta theta"),
    doc(2, "one two three four five six seven eight nine"),
    doc(3, "lorem ipsum dolor sit amet consectetur adipiscing"))

  private def mkDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("stream sink: dups dropped, survivors appended, later batches see them") {
    val path = tmpDir("sdx")
    BandIndex.write(mkDf(base), path)
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamDedup.start(mem.toDF().toDF("doc_id", "text"), path,
      tmpDir("sdx-ckpt"), threshold = 0.8)
    try {
      // batch 1: one near-copy of doc 1 (dropped), one novel (kept)
      mem.addData(
        doc(100, "alpha beta gamma delta epsilon zeta eta theta"),
        doc(101, "completely novel tokens nothing shared here at all"))
      q.processAllAvailable()
      assert(BandIndex.open(path).nDocs === 4)
      // batch 2: a near-copy of batch 1's ACCEPTED doc must now drop,
      // and a fresh novel doc must land
      mem.addData(
        doc(200, "completely novel tokens nothing shared here at all"),
        doc(201, "yet another entirely different document body text"))
      q.processAllAvailable()
      assert(BandIndex.open(path).nDocs === 5)
      // the index now answers for every survivor: copies of kept docs
      // match, copies of dropped docs match their ORIGINALS only
      val h = BandIndex.open(path)
      val probe = mkDf(Seq(
        doc(900, "completely novel tokens nothing shared here at all")))
      val hits = Dedup.nearDupPairsAgainstIndex(h, probe, 0.8)
        .select("corpus_id").collect().map(_.getLong(0)).toSet
      assert(hits === Set(101L))
    } finally q.stop()
  }

  test("appendBatch replays are no-ops (bid marker) and staged intents are reused") {
    val path = tmpDir("sdx-replay")
    BandIndex.write(mkDf(base), path)
    var evals = 0
    def novel = { evals += 1; mkDf(Seq(doc(500, "replay survivor document"))) }
    BandIndex.appendBatch(path, bid = 7)(novel)
    assert(BandIndex.open(path).nDocs === 4 && evals === 1)
    // full replay: marker present -> nothing re-evaluated, nothing doubled
    BandIndex.appendBatch(path, bid = 7)(novel)
    assert(BandIndex.open(path).nDocs === 4 && evals === 1)
    val h = BandIndex.open(path)
    val hits = Dedup.nearDupPairsAgainstIndex(h,
        mkDf(Seq(doc(901, "replay survivor document"))), 0.8)
      .collect()
    assert(hits.length === 1, "exactly one stored copy after replay")
    // end state equals the offline append of the same survivor set
    val off = BandIndex.append(mkDf(Seq(doc(500, "replay survivor document"))),
      BandIndex.write(mkDf(base), tmpDir("sdx-off")))
    assert(rowsOf(off) === rowsOf(h))
  }

  test("appendBatch evaluates its novel plan exactly ONCE per batch") {
    // round-14 VERDICT: the two staging writes + the intent count were
    // three separate actions over the same uncached plan — in StreamDedup
    // that plan is the corpus probe + verify anti-join, re-run ~3× per
    // micro-batch. The eager localCheckpoint must make it exactly one
    // evaluation; a row-counting UDF in the novel plan proves it.
    val path = tmpDir("sdx-oneeval")
    BandIndex.write(mkDf(base), path)
    val acc = spark.sparkContext.longAccumulator("novel-evals")
    val tick = udf((id: Long) => { acc.add(1L); id })
    val novel = mkDf(Seq(
        doc(800, "single evaluation probe document body"),
        doc(801, "second single evaluation document body")))
      .withColumn("doc_id", tick(col("doc_id")))
    BandIndex.appendBatch(path, bid = 3)(novel)
    assert(BandIndex.open(path).nDocs === 5)
    assert(acc.value === 2L,
      s"2 rows but ${acc.value} UDF evaluations — the novel plan ran " +
        s"${acc.value / 2}×; appendBatch must evaluate it exactly once")
    // the intent's count matches what actually staged (observed metric)
    val hits = Dedup.nearDupPairsAgainstIndex(BandIndex.open(path),
        mkDf(Seq(doc(902, "single evaluation probe document body"))), 0.8)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(hits === Set(800L))
  }

  test("rebuild supersedes streaming state: old bid markers cannot suppress a fresh stream") {
    val path = tmpDir("sdx-rebuild")
    BandIndex.write(mkDf(base), path)
    BandIndex.appendBatch(path, bid = 0)(mkDf(Seq(doc(600, "first stream survivor"))))
    assert(BandIndex.open(path).nDocs === 4)
    // rebuild at the same path (new corpus snapshot), then a NEW stream
    // whose checkpoint restarts bids at 0 — its batch must land
    BandIndex.write(mkDf(base), path)
    BandIndex.appendBatch(path, bid = 0)(mkDf(Seq(doc(700, "second stream survivor"))))
    assert(BandIndex.open(path).nDocs === 4)
    val hits = Dedup.nearDupPairsAgainstIndex(BandIndex.open(path),
        mkDf(Seq(doc(904, "second stream survivor"))), 0.8)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(hits === Set(700L), "the fresh stream's batch must not be suppressed")
  }

  test("new stream with a fresh checkpoint supersedes a dead stream's state") {
    // a dead stream left a commit marker for bid 0; a NEW stream (fresh
    // checkpoint, bids restarting at 0) against the SAME index — no
    // rebuild — must not have its first batch suppressed by that marker
    val path = tmpDir("sdx-fresh")
    BandIndex.write(mkDf(base), path)
    BandIndex.appendBatch(path, bid = 0)(
      mkDf(Seq(doc(600, "dead stream survivor document"))))
    assert(BandIndex.open(path).nDocs === 4)
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ckpt = tmpDir("sdx-fresh-ckpt")
    assert(StreamDedup.checkpointIsFresh(s, ckpt))
    val q = StreamDedup.start(mem.toDF().toDF("doc_id", "text"), path,
      ckpt, threshold = 0.8)
    try {
      mem.addData(doc(700, "new stream first batch novel body"))
      q.processAllAvailable()
      assert(BandIndex.open(path).nDocs === 5,
        "the fresh stream's bid-0 batch must land despite the stale marker")
      val hits = Dedup.nearDupPairsAgainstIndex(BandIndex.open(path),
          mkDf(Seq(doc(905, "new stream first batch novel body"))), 0.8)
        .select("corpus_id").collect().map(_.getLong(0)).toSet
      assert(hits === Set(700L))
      // the checkpoint now has committed offsets: a RESUME is not fresh
      assert(!StreamDedup.checkpointIsFresh(s, ckpt))
    } finally q.stop()
    // and the dead stream's APPLIED data is untouched (markers cleared,
    // rows kept — clearing only drops bookkeeping, never index rows)
    val deadHits = Dedup.nearDupPairsAgainstIndex(BandIndex.open(path),
        mkDf(Seq(doc(906, "dead stream survivor document"))), 0.8)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(deadHits === Set(600L))
  }

  test("dedupWithinBatch: five copies of one novel doc append one survivor") {
    val path = tmpDir("sdx-intra")
    BandIndex.write(mkDf(base), path)
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamDedup.start(mem.toDF().toDF("doc_id", "text"), path,
      tmpDir("sdx-intra-ckpt"), threshold = 0.8, dedupWithinBatch = true)
    try {
      // one batch: 5 copies of a novel doc + a near-copy of corpus doc 1
      mem.addData(
        doc(300, "brand new document body with original tokens"),
        doc(301, "brand new document body with original tokens"),
        doc(302, "brand new document body with original tokens"),
        doc(303, "brand new document body with original tokens"),
        doc(304, "brand new document body with original tokens"),
        doc(305, "alpha beta gamma delta epsilon zeta eta theta"))
      q.processAllAvailable()
      // exactly ONE survivor of the 5 copies (min id), corpus dup dropped
      assert(BandIndex.open(path).nDocs === 4)
      val hits = Dedup.nearDupPairsAgainstIndex(BandIndex.open(path),
          mkDf(Seq(doc(910, "brand new document body with original tokens"))),
          0.8)
        .select("corpus_id").collect().map(_.getLong(0)).toSet
      assert(hits === Set(300L),
        "min-id survivor of the in-batch cluster must be the one appended")
    } finally q.stop()
    // end-state equality with the offline path over the same drop:
    // in-batch clusters keep min id, then the corpus probe drops dups
    val off = mkDf(base ++ Seq(
      doc(300, "brand new document body with original tokens")))
    val offline = BandIndex.write(off, tmpDir("sdx-intra-off"))
    assert(rowsOf2(BandIndex.open(path)) === rowsOf2(offline))
  }

  private def rowsOf2(h: BandIndex.Handle): Set[Seq[Any]] =
    Dedup.nearDupPairsAgainstIndex(h,
        mkDf(Seq(doc(911, "brand new document body with original tokens"),
          doc(912, "alpha beta gamma delta epsilon zeta eta theta"))), 0.8)
      .select("batch_id", "corpus_id", "inter", "uni")
      .collect().map(_.toSeq).toSet

  private def rowsOf(h: BandIndex.Handle): Set[Seq[Any]] =
    Dedup.nearDupPairsAgainstIndex(h,
        mkDf(Seq(doc(902, "replay survivor document"),
          doc(903, "alpha beta gamma delta epsilon zeta eta theta"))), 0.8)
      .select("batch_id", "corpus_id", "inter", "uni")
      .collect().map(_.toSeq).toSet
}
