package graft.pipeline

import graft.SparkSpec
import graft.store.BandIndex
import org.apache.spark.sql.functions._

/** Bucket-cap drop visibility: the capped tiers must report exactly how
  * many rows and buckets a `maxBucket` bound discarded (observed during
  * the tier's own pass), so a clean run and one that silently dropped
  * its hottest buckets are distinguishable. */
class CapDropSpec extends SparkSpec {

  test("lshCandidates reports dropped rows/buckets on a hot-bucket corpus") {
    val s = spark
    import s.implicits._
    // 5 identical docs (one over-cap bucket per band), 2 identical docs
    // (under cap, kept), 1 unique doc
    val docs = (Seq.tabulate(5)(i =>
        (i.toLong, "alpha beta gamma delta epsilon zeta")) ++
        Seq((10L, "one two three four five six"),
          (11L, "one two three four five six"),
          (20L, "entirely unique document body text here")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(
      Dedup.shingleHashRows(docs, 3, distinct = false), 32)
    val cands = Dedup.lshCandidates(sigs, bands = 16, rowsPerBand = 2,
      maxBucket = 2)
    val pairs = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 5-copy cluster is capped away entirely; the pair survives
    assert(pairs === Set((10L, 11L)))
    val st = Dedup.lastCapDropStats().get
    assert(st.droppedRows === 80L, "5 rows x 16 bands over the cap")
    assert(st.droppedBuckets === 16L, "one over-cap bucket per band")
    assert(st.maxBucketSeen === 5L)
  }

  test("a clean run reports zero drops") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "different body text entirely here now"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(
      Dedup.shingleHashRows(docs, 3, distinct = false), 32)
    Dedup.lshCandidates(sigs, bands = 16, rowsPerBand = 2,
      maxBucket = 1000).collect()
    val st = Dedup.lastCapDropStats().get
    assert(st.droppedRows === 0L && st.droppedBuckets === 0L)
    assert(st.maxBucketSeen === 2L)
  }

  test("the index probe reports drops over TOUCHED buckets") {
    val s = spark
    import s.implicits._
    val tri = Seq.tabulate(3)(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val probe = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val h = BandIndex.write(tri, tmpDir("capdrop-idx"), numHashes = 32,
      bands = 16)
    assert(Dedup.nearDupPairsAgainstIndex(h, probe, 0.8, maxBucket = 2)
      .count() === 0L)
    val st = Dedup.lastCapDropStats().get
    assert(st.droppedRows === 48L, "3 stored rows x 16 touched buckets")
    assert(st.droppedBuckets === 16L)
    assert(st.maxBucketSeen === 3L)
    // at cap 3 the same probe drops nothing
    assert(Dedup.nearDupPairsAgainstIndex(h, probe, 0.8, maxBucket = 3)
      .count() === 3L)
    val st3 = Dedup.lastCapDropStats().get
    assert(st3.droppedRows === 0L && st3.droppedBuckets === 0L)
  }

  test("concurrent capped queries each read their OWN stats (per-thread handles)") {
    // round-14 VERDICT #2: the JVM-global last-writer-wins reference let
    // two concurrent capped tiers clobber each other. Two threads run
    // distinguishable workloads (5-copy vs 3-copy hot cluster) many
    // times; each must always see its own maxBucketSeen.
    val s = spark
    import s.implicits._
    // each corpus keeps one under-cap pair so the result is nonempty —
    // a fully-capped EMPTY result hits AQE's empty-relation propagation
    // (the documented None case the library tiers avoid by checkpointing)
    def corpus(copies: Int) = (Seq.tabulate(copies)(i =>
        (i.toLong, "alpha beta gamma delta epsilon zeta")) ++
        Seq((90L, "one two three four five six seven"),
          (91L, "one two three four five six seven")))
      .toDF("doc_id", "text")
    def runCapped(copies: Int): Dedup.CapDropStats = {
      val sigs = Dedup.minhashSignatures(
        Dedup.shingleHashRows(corpus(copies), 3, distinct = false), 32)
      Dedup.lshCandidates(sigs, bands = 16, rowsPerBand = 2,
        maxBucket = 2).collect()
      val h = Dedup.capDropHandle().get // this thread's own run
      h.stats().get
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val rounds = 4
    val a = Future(Seq.fill(rounds)(runCapped(5)))
    val b = Future(Seq.fill(rounds)(runCapped(3)))
    val (ra, rb) = (Await.result(a, Duration(120, "s")),
      Await.result(b, Duration(120, "s")))
    assert(ra.forall(_.maxBucketSeen === 5L),
      s"thread A saw ${ra.map(_.maxBucketSeen)} — clobbered by thread B")
    assert(rb.forall(_.maxBucketSeen === 3L),
      s"thread B saw ${rb.map(_.maxBucketSeen)} — clobbered by thread A")
    assert(ra.forall(_.droppedRows === 80L) &&
      rb.forall(_.droppedRows === 48L))
  }

  test("an unexecuted capped plan returns None within the poll bound, not a stall") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(
      Dedup.shingleHashRows(docs, 3, distinct = false), 32)
    // build the plan, never run an action on it
    Dedup.lshCandidates(sigs, bands = 16, rowsPerBand = 2, maxBucket = 2)
    val t0 = System.nanoTime()
    val st = Dedup.capDropHandle().get.stats(waitMs = 300)
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(st.isEmpty, "no action ran — must not report stats")
    assert(elapsedMs < 5000, s"bounded poll expected, took ${elapsedMs}ms")
  }
}
