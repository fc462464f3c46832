package graft.store

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document retirement on the persisted band index: tombstoned docs must
  * vanish from probe answers IMMEDIATELY (bit-equal to a fresh index of
  * the surviving corpus — including bucket-cap occupancy), compact must
  * make the drop physical and clear the tombstones without changing any
  * answer, and the staged retire must abort cleanly on interruption. */
class BandIndexRetireSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs =
    spark.read.parquet(s"$dir/documents.parquet").cache()
  private lazy val corpus = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
  private lazy val batch = docs.where(pmod(col("doc_id"), lit(5)) === 0)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def freshPath(tag: String): String = tmpDir(s"bandret-$tag")

  test("retire removes pairs against retired docs, probe == fresh index " +
    "of the survivors") {
    val h = BandIndex.write(corpus, freshPath("ret"))
    val full = rows(Dedup.nearDupPairsAgainstIndex(h, batch, 0.8))
    assert(full.nonEmpty, "planted near-dups expected")
    // retire every corpus doc divisible by 7 — including some that pair
    val retired = corpus.where(pmod(col("doc_id"), lit(7)) === 0)
      .select("doc_id")
    assert(full.exists(r => r(1).asInstanceOf[Long] % 7 == 0),
      "retirement set should cover at least one paired corpus doc")
    BandIndex.retire(retired, h)
    val got = rows(Dedup.nearDupPairsAgainstIndex(BandIndex.open(h.path),
      batch, 0.8))
    assert(!got.exists(r => r(1).asInstanceOf[Long] % 7 == 0),
      "no pair may involve a retired corpus doc")
    val survivors = corpus.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val fresh = BandIndex.write(survivors, freshPath("ret-fresh"))
    assert(got === rows(Dedup.nearDupPairsAgainstIndex(fresh, batch, 0.8)),
      "tombstoned probe must equal a fresh index of the survivors")
  }

  test("tombstones exclude retired rows from bucket occupancy (cap parity " +
    "with a fresh index)") {
    val s = spark
    import s.implicits._
    // three identical docs + one survivor twin: occupancy 4 before
    // retirement, 2 after — cap 2 rejects the bucket before, accepts after
    val all = (Seq.tabulate(3)(i =>
        (i.toLong, "alpha beta gamma delta epsilon zeta")) :+
        (10L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val probe = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val h = BandIndex.write(all, freshPath("occ"))
    assert(rows(Dedup.nearDupPairsAgainstIndex(h, probe, 0.8,
      maxBucket = 2)).isEmpty, "occupancy 4 must exceed cap 2")
    BandIndex.retire(Seq(0L, 1L).toDF("doc_id"), h)
    val got = rows(Dedup.nearDupPairsAgainstIndex(BandIndex.open(h.path),
      probe, 0.8, maxBucket = 2))
    assert(got.map(_(1)) === Set(2L, 10L),
      "surviving occupancy 2 must pass cap 2 — retired rows may not count")
  }

  test("compact applies tombstones physically, clears them, keeps answers") {
    val h = BandIndex.write(corpus, freshPath("cpt"))
    val retired = corpus.where(pmod(col("doc_id"), lit(7)) === 0)
    BandIndex.retire(retired.select("doc_id"), h)
    val before = rows(Dedup.nearDupPairsAgainstIndex(BandIndex.open(h.path),
      batch, 0.8))
    val hc = BandIndex.compact(spark, BandIndex.open(h.path))
    assert(!new java.io.File(s"${h.path}/tombstones").exists,
      "compact must clear applied tombstones")
    val retiredIds = retired.select("doc_id").collect().map(_.getLong(0)).toSet
    val remaining = spark.read.parquet(s"${h.path}/bands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(remaining.intersect(retiredIds).isEmpty,
      "retired rows must be physically gone from bands")
    assert(rows(Dedup.nearDupPairsAgainstIndex(hc, batch, 0.8)) === before,
      "compact must not change probe answers")
    // meta doc count refreshed to the survivors
    assert(hc.nDocs === corpus.count() - retired.count())
    assert(BandIndex.open(h.path).nDocs === hc.nDocs)
  }

  test("interrupted retire aborts at open(), leaving the index unchanged") {
    val h = BandIndex.write(corpus, freshPath("abort"))
    val before = rows(Dedup.nearDupPairsAgainstIndex(h, batch, 0.8))
    // simulate a crash after staging, before publish: pending exists
    val s = spark
    import s.implicits._
    Seq(1L, 2L).toDF("doc_id").write.mode("overwrite")
      .parquet(s"${h.path}/retire.pending")
    val healed = BandIndex.open(h.path)
    assert(!new java.io.File(s"${h.path}/retire.pending").exists,
      "open must abort the interrupted retire")
    assert(rows(Dedup.nearDupPairsAgainstIndex(healed, batch, 0.8)) === before)
  }

  test("rebuild supersedes tombstones of the previous generation") {
    val s = spark
    import s.implicits._
    val h = BandIndex.write(corpus, freshPath("super"))
    BandIndex.retire(corpus.limit(5).select("doc_id"), h)
    val h2 = BandIndex.write(corpus, h.path) // same path, new generation
    assert(BandIndex.tombstones(spark, h2.path).isEmpty,
      "rebuild must clear stale tombstones")
    val fresh = BandIndex.write(corpus, freshPath("super-fresh"))
    assert(rows(Dedup.nearDupPairsAgainstIndex(h2, batch, 0.8)) ===
      rows(Dedup.nearDupPairsAgainstIndex(fresh, batch, 0.8)))
  }

  test("retire then append: probe equals fresh index of survivors + drop") {
    val p1 = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
    val p2 = corpus.where(pmod(col("doc_id"), lit(2)) === 0)
    val h = BandIndex.write(p1, freshPath("mix"))
    BandIndex.retire(
      p1.where(pmod(col("doc_id"), lit(7)) === 0).select("doc_id"), h)
    val hApp = BandIndex.append(p2, BandIndex.open(h.path))
    val expect = BandIndex.write(
      p1.where(pmod(col("doc_id"), lit(7)) =!= 0).unionByName(p2),
      freshPath("mix-fresh"))
    assert(rows(Dedup.nearDupPairsAgainstIndex(hApp, batch, 0.8)) ===
      rows(Dedup.nearDupPairsAgainstIndex(expect, batch, 0.8)))
  }

  test("re-appending a TOMBSTONED doc_id fails fast; compact-then-append succeeds") {
    // reincarnation hazard (round-14 VERDICT): a tombstone would silently
    // suppress the re-appended doc until the next compact — the contract
    // is fail-fast at append, with compact (applies + clears) as the
    // sanctioned takedown-then-repost path
    val h = BandIndex.write(corpus, freshPath("reinc"))
    val victim = corpus.where(col("doc_id") === 11)
    assert(victim.count() === 1)
    BandIndex.retire(victim.select("doc_id"), h)
    val e = intercept[IllegalArgumentException](
      BandIndex.append(victim, BandIndex.open(h.path)))
    assert(e.getMessage.contains("tombstoned") &&
      e.getMessage.contains("compact"))
    // the streaming append enforces the same contract
    val e2 = intercept[IllegalArgumentException](
      BandIndex.appendBatch(h.path, bid = 0)(victim))
    assert(e2.getMessage.contains("tombstoned"))
    // sanctioned path: compact applies + clears the tombstone, then the
    // repost lands and probes answer for it again
    val hc = BandIndex.compact(spark, BandIndex.open(h.path))
    val hr = BandIndex.append(victim, hc)
    val expect = BandIndex.write(corpus, freshPath("reinc-fresh"))
    assert(rows(Dedup.nearDupPairsAgainstIndex(hr, batch, 0.8)) ===
      rows(Dedup.nearDupPairsAgainstIndex(expect, batch, 0.8)))
  }

  test("compact refuses a FULL retirement instead of writing an unreadable index") {
    // tombstones covering every live doc would compact into a zero-row
    // partitionBy dir (only _SUCCESS) — unreadable until rebuild
    // (round-14 ADVICE). The refusal keeps the index fully probe-able.
    val h = BandIndex.write(corpus.where(col("doc_id") < 30),
      freshPath("full-ret"))
    BandIndex.retire(
      corpus.where(col("doc_id") < 30).select("doc_id"), h)
    val e = intercept[IllegalArgumentException](
      BandIndex.compact(spark, BandIndex.open(h.path)))
    assert(e.getMessage.contains("EVERY live"))
    // still readable and probes still exclude everything retired
    val probe = Dedup.nearDupPairsAgainstIndex(BandIndex.open(h.path),
      batch, 0.8)
    assert(probe.count() === 0)
  }
}
