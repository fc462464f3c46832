package graft.store

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted LSH band index: the index-backed delta probe must be
  * bit-equal to the live [[Dedup.nearDupPairsAgainst]] on the same
  * inputs, appends must be indistinguishable from a rebuild of the
  * union, every crash point of the staged append must heal, and the
  * probe plan must never scan corpus text. */
class BandIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs =
    spark.read.parquet(s"$dir/documents.parquet").cache()
  private lazy val corpus = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
  private lazy val batch = docs.where(pmod(col("doc_id"), lit(5)) === 0)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def freshPath(tag: String): String = tmpDir(s"bandidx-$tag")

  test("index probe equals the live nearDupPairsAgainst, and is non-empty") {
    val h = BandIndex.write(corpus, freshPath("eq"))
    val live = rows(Dedup.nearDupPairsAgainst(corpus, batch, 0.8))
    val idx = rows(Dedup.nearDupPairsAgainstIndex(h, batch, 0.8))
    assert(idx === live)
    assert(idx.nonEmpty, "planted near-dups expected in the testdata")
  }

  test("maxBucket cap binds identically on stored and live bands") {
    // tiny cap so it actually drops buckets: the probe sizes only the
    // TOUCHED buckets, which must still reproduce the live path's
    // whole-corpus occupancy filter exactly
    val h = BandIndex.write(corpus, freshPath("cap"))
    // the probe reuses the index's write-time geometry; the live side
    // derives from ITS threshold by default — pin it to the handle's
    val live = rows(Dedup.nearDupPairsAgainst(corpus, batch, 0.2,
      numHashes = h.numHashes, bands = h.bands, maxBucket = 2))
    val idx = rows(Dedup.nearDupPairsAgainstIndex(h, batch, 0.2,
      maxBucket = 2))
    assert(idx === live)
    // and a corpus where the cap provably BINDS: three identical corpus
    // docs put every one of their buckets at occupancy 3, so cap 2
    // drops them all (no candidates) while cap 3 finds every pair
    val s = spark
    import s.implicits._
    val tri = Seq.tabulate(3)(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val probe = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val hTri = BandIndex.write(tri, freshPath("cap-tri"))
    assert(rows(Dedup.nearDupPairsAgainstIndex(hTri, probe, 0.8,
      maxBucket = 2)).isEmpty)
    assert(rows(Dedup.nearDupPairsAgainstIndex(hTri, probe, 0.8,
      maxBucket = 3)).size === 3)
  }

  test("append == rebuild of the union corpus (probe bit-equal)") {
    val p1 = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
    val p2 = corpus.where(pmod(col("doc_id"), lit(2)) === 0)
    val hInc = BandIndex.append(p2, BandIndex.write(p1, freshPath("inc")))
    val hFull = BandIndex.write(corpus, freshPath("full"))
    assert(hInc.nDocs === hFull.nDocs)
    assert(rows(Dedup.nearDupPairsAgainstIndex(hInc, batch, 0.8)) ===
      rows(Dedup.nearDupPairsAgainstIndex(hFull, batch, 0.8)))
    // and open() round-trips the meta
    assert(BandIndex.open(hInc.path) === hInc)
  }

  test("crash before the commit marker: open() aborts the append") {
    val p1 = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
    val p2 = corpus.where(pmod(col("doc_id"), lit(2)) === 0)
    val h = BandIndex.write(p1, freshPath("abort"))
    val before = rows(Dedup.nearDupPairsAgainstIndex(h, batch, 0.8))
    intercept[IllegalStateException] {
      BandIndex.append(p2, h, "text", crashAfterStep = 2)
    }
    val healed = BandIndex.open(h.path)
    assert(healed === h, "aborted append must leave the index untouched")
    assert(rows(Dedup.nearDupPairsAgainstIndex(healed, batch, 0.8)) === before)
    assert(!new java.io.File(s"${h.path}/append.pending").exists)
  }

  test("crash after the commit marker: open() rolls the append forward") {
    val p1 = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
    val p2 = corpus.where(pmod(col("doc_id"), lit(2)) === 0)
    val h = BandIndex.write(p1, freshPath("roll"))
    intercept[IllegalStateException] {
      BandIndex.append(p2, h, "text", crashAfterStep = 3)
    }
    val healed = BandIndex.open(h.path)
    val hFull = BandIndex.write(corpus, freshPath("roll-full"))
    assert(healed.nDocs === hFull.nDocs)
    assert(rows(Dedup.nearDupPairsAgainstIndex(healed, batch, 0.8)) ===
      rows(Dedup.nearDupPairsAgainstIndex(hFull, batch, 0.8)))
  }

  test("streaming publish crashed mid-rename: replay equals a clean append") {
    // a replay of appendBatch after a crash in the middle of the
    // publish renames must land the identical end state — in
    // particular it must NOT delete the already-published files of its
    // own bid (their staged sources are gone; deleting them would lose
    // those rows forever while the meta still records the full count)
    val s = spark
    import s.implicits._
    val base = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val drop = Seq((10L, "novel document body first survivor"),
      (11L, "second novel survivor body text here"),
      (12L, "third novel survivor entirely different"))
      .toDF("doc_id", "text")
    val path = freshPath("crash-mid-publish")
    val h = BandIndex.write(base, path)
    // stage EXACTLY what appendBatch stages for bid 9, with its intent
    val staging = s"$path/_stream_staging/bid=9"
    Dedup.bandedRows(drop, h.ngram, h.numHashes, h.bands, "text")
      .select(col("doc_id"), col("bkey"), col("band"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$staging/bands")
    Dedup.shingleHashRows(drop, h.ngram, "text", distinct = true)
      .write.mode("overwrite").parquet(s"$staging/grams")
    val pw = new java.io.PrintWriter(s"$staging/intent.json")
    pw.write(s"""{"n_docs":${h.nDocs + drop.count()}}"""); pw.close()
    // simulate the crash: the first attempt published SOME band files
    // (renamed out of staging into their bid-keyed destinations), then
    // died before the meta/marker
    def partFiles(d: java.io.File): Seq[java.io.File] =
      if (!d.isDirectory) Nil
      else d.listFiles.toSeq.flatMap(f =>
        if (f.isDirectory) partFiles(f) else if (f.getName.startsWith("part-")) Seq(f) else Nil)
    val stagedBandFiles = partFiles(new java.io.File(s"$staging/bands"))
    assert(stagedBandFiles.size >= 2, "need >=2 staged files to split the publish")
    for (f <- stagedBandFiles.take(stagedBandFiles.size / 2)) {
      val bandDir = f.getParentFile.getName // band=K
      val dstDir = new java.io.File(s"$path/bands/$bandDir")
      dstDir.mkdirs()
      assert(f.renameTo(new java.io.File(dstDir, s"bid-9-${f.getName}")))
    }
    // replay: intent present -> novel must NOT re-run; publish resumes
    BandIndex.appendBatch(path, bid = 9) {
      fail("novel must not be re-evaluated when the intent is staged")
    }
    val healed = BandIndex.open(path)
    val clean = BandIndex.append(drop, BandIndex.write(base,
      freshPath("crash-clean")))
    assert(healed.nDocs === clean.nDocs)
    val probe = Seq((90L, "novel document body first survivor"),
      (91L, "second novel survivor body text here"),
      (92L, "third novel survivor entirely different"),
      (93L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    def answers(hh: BandIndex.Handle) =
      rows(Dedup.nearDupPairsAgainstIndex(hh, probe, 0.8))
    assert(answers(healed) === answers(clean),
      "replayed index must answer identically to a clean append")
    assert(answers(healed).map(_.head).toSet ===
      Set(90L, 91L, 92L, 93L), "every published doc must be findable")
  }

  test("compact preserves probe results and shrinks the file count") {
    val p1 = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
    val p2 = corpus.where(pmod(col("doc_id"), lit(2)) === 0)
    val h = BandIndex.append(p2, BandIndex.write(p1, freshPath("cpt")))
    val before = rows(Dedup.nearDupPairsAgainstIndex(h, batch, 0.8))
    def nFiles(sub: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else if (f.getName.startsWith("part-")) 1 else 0
      walk(new java.io.File(s"${h.path}/$sub"))
    }
    val fragmented = nFiles("grams")
    val hc = BandIndex.compact(spark, h)
    assert(rows(Dedup.nearDupPairsAgainstIndex(hc, batch, 0.8)) === before)
    assert(nFiles("grams") < fragmented,
      s"compact must merge the per-append file sets (was $fragmented)")
    assert(nFiles("grams") === 1)
  }

  test("auto-compact bounds bands/ fragmentation across small appends, " +
    "answers unchanged") {
    def nBandFiles(path: String): Int = {
      // streaming appends publish bid-keyed names (bid-N-part-...), so
      // count every parquet part file, not only "part-" prefixes
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else if (f.getName.contains("part-")) 1 else 0
      walk(new java.io.File(s"$path/bands"))
    }
    val base = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
    val drops = (0 until 4).map(k =>
      corpus.where(pmod(col("doc_id"), lit(2)) === 0 &&
        pmod(col("doc_id"), lit(8)) === k * 2))
    // twin A: auto-compact at 40 band files; twin B: never compacts
    val pa = freshPath("autocpt")
    val pb = freshPath("autocpt-off")
    BandIndex.write(base, pa)
    BandIndex.write(base, pb)
    for ((d, i) <- drops.zipWithIndex) {
      BandIndex.appendBatch(pa, i, autoCompactAt = 40)(d)
      BandIndex.appendBatch(pb, i)(d)
    }
    assert(nBandFiles(pb) > 40,
      "the uncompacted twin must actually exceed the threshold")
    assert(nBandFiles(pa) <= 40,
      "auto-compact must keep the live file count under the threshold")
    val got = rows(Dedup.nearDupPairsAgainstIndex(BandIndex.open(pa), batch, 0.8))
    assert(got === rows(Dedup.nearDupPairsAgainstIndex(BandIndex.open(pb),
      batch, 0.8)), "compaction must not change any probe answer")
    assert(BandIndex.open(pa).nDocs === BandIndex.open(pb).nDocs)
  }

  test("probe never reads corpus text — only index bytes and the batch") {
    // behavioral proof, stronger than a plan-string grep (the probe
    // localCheckpoints its stages, which hides upstream scans from the
    // final explain): index a corpus COPY, expect the live answer,
    // DELETE the copy, probe from the handle alone — any attempt to
    // read corpus text would throw file-not-found, and the answer must
    // still be bit-equal to the live two-sided run
    val live = rows(Dedup.nearDupPairsAgainst(corpus, batch, 0.8))
    val copyDir = freshPath("plan-copy")
    corpus.write.mode("overwrite").parquet(s"$copyDir/corpus.parquet")
    val corpusCopy = spark.read.parquet(s"$copyDir/corpus.parquet")
    val h = BandIndex.write(corpusCopy, freshPath("plan"))
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(new java.io.File(copyDir))
    assert(rows(Dedup.nearDupPairsAgainstIndex(h, batch, 0.8)) === live)
  }
}
