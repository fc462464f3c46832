package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling: reproducibility, repartition stability, nesting,
  * split coverage, and quota semantics over the driver's documents/events
  * testdata. */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("hashSample is reproducible and stable under repartitioning") {
    val a = ids(Sampling.hashSample(docs, "doc_id", 0.3))
    val b = ids(Sampling.hashSample(docs, "doc_id", 0.3))
    val c = ids(Sampling.hashSample(docs.repartition(17), "doc_id", 0.3))
    assert(a === b && a === c)
    assert(a.nonEmpty && a.size < docs.count())
    // fraction within a loose Chernoff-ish band of the target
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.45, s"0.3-sample kept $frac")
  }

  test("samples nest: fraction f subset of fraction g for f < g; salt decorrelates") {
    val f = ids(Sampling.hashSample(docs, "doc_id", 0.2))
    val g = ids(Sampling.hashSample(docs, "doc_id", 0.6))
    assert(f.subsetOf(g), "bucket predicate must nest")
    val salted = ids(Sampling.hashSample(docs, "doc_id", 0.2, salt = "v2"))
    assert(salted !== f, "different salt must pick a different subset")
  }

  test("fraction cuts land on exact integer buckets (no truncation drift)") {
    // 0.3 * 1e6 floats to 299999.999…: a truncated cut of 299999 would
    // silently drop bucket 299999 from the sample and shift the split
    val sampled = ids(Sampling.hashSample(docs, "doc_id", 0.3))
    val exact = ids(docs.where(Sampling.hashBucket(col("doc_id")) < 300000L))
    assert(sampled === exact)
    val sp = Sampling.hashSplit(docs, "doc_id", Seq(0.3, 0.7), Seq("a", "b"))
    assert(ids(sp.where(col("split") === "a")) === exact,
      "split's first cut must be the same exact 300000-bucket boundary")
  }

  test("hashSplit covers every row exactly once with ~weight fractions") {
    val split = Sampling.hashSplit(docs, "doc_id",
      weights = Seq(0.8, 0.1, 0.1), labels = Seq("train", "val", "test"))
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum === docs.count(), "every row gets exactly one label")
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(byLabel("train") > byLabel.getOrElse("val", 0L))
    // weights are relative: (8,1,1) must equal (0.8,0.1,0.1)
    val rel = Sampling.hashSplit(docs, "doc_id",
      weights = Seq(8, 1, 1), labels = Seq("train", "val", "test"))
    assert(rel.orderBy("doc_id").collect().toSeq === split.orderBy("doc_id").collect().toSeq)
  }

  test("null keys hash deterministically and consistently across sample and split") {
    val s = spark
    val withNull = s.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(java.lang.Long.valueOf(1L)),
        org.apache.spark.sql.Row(null.asInstanceOf[java.lang.Long])),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = true))))
    // full-fraction sample keeps EVERY row, null key included
    assert(Sampling.hashSample(withNull, "doc_id", 1.0).count() === 2)
    // split labels every row, and the null row's label is stable
    val sp = Sampling.hashSplit(withNull, "doc_id", Seq(0.5, 0.5), Seq("a", "b"))
    assert(sp.count() === 2)
    val nullLabel = sp.where(col("doc_id").isNull).select("split").collect()
    assert(nullLabel.length === 1 && nullLabel(0).getString(0) != null)
  }

  test("mixtureSample applies per-group fractions consistently with hashSample") {
    val w = Map("src0" -> 0.5, "src1" -> 0.0)
    val kept = Sampling.mixtureSample(docs, "source", "doc_id", w, default = 1.0)
    // weight 0 drops the whole group; weight 1 (default) keeps whole groups
    assert(kept.where(col("source") === "src1").count() === 0)
    val othersIn = docs.where(col("source") =!= "src0" && col("source") =!= "src1")
    assert(kept.where(col("source") =!= "src0" && col("source") =!= "src1").count()
      === othersIn.count())
    // a group's fraction selects EXACTLY the docs hashSample at that
    // fraction would: mixing never re-rolls the per-doc bucket
    val src0 = docs.where(col("source") === "src0")
    assert(ids(kept.where(col("source") === "src0"))
      === ids(Sampling.hashSample(src0, "doc_id", 0.5)))
    // deterministic and repartition-stable like every sampler here
    assert(ids(kept) === ids(Sampling.mixtureSample(docs.repartition(17),
      "source", "doc_id", w, default = 1.0)))
  }

  test("weightedSample: per-row probability, monotone, hashSample-compatible") {
    val s = spark
    import s.implicits._
    val d = (1L to 2000L).map(i => (i, i % 100)).toDF("doc_id", "q")
    // extremes: weight 0 drops all, 1e6 keeps all (clamping included)
    assert(Sampling.weightedSample(d, "doc_id", lit(0L)).count() === 0L)
    assert(Sampling.weightedSample(d, "doc_id", lit(2000000L)).count() === 2000L)
    // constant weight == hashSample at the same fraction
    val viaWeighted = Sampling.weightedSample(d, "doc_id", lit(300000L))
      .collect().map(_.getLong(0)).toSet
    val viaSample = Sampling.hashSample(d, "doc_id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(viaWeighted === viaSample)
    // monotone: raising weights only ADDS rows
    val low = Sampling.weightedSample(d, "doc_id", col("q") * 5000L)
      .collect().map(_.getLong(0)).toSet
    val high = Sampling.weightedSample(d, "doc_id", col("q") * 10000L)
      .collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
    // repartition-stable
    val re = Sampling.weightedSample(d.repartition(13), "doc_id", col("q") * 5000L)
      .collect().map(_.getLong(0)).toSet
    assert(re === low)
  }

  test("perKeyCap keeps the first k per key in order") {
    val d = pointsDf((1L to 20L).map(i => (tp(i), i.toDouble)), metric = "a")
      .unionByName(pointsDf((1L to 3L).map(i => (tp(i), -i.toDouble)), metric = "b"))
    val capped = Sampling.perKeyCap(d, "metric", Seq(col("time")), k = 5)
    val byKey = capped.groupBy("metric").agg(count(lit(1)).as("n"), max("time").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byKey("a") === ((5L, tp(5))), "cap keeps the EARLIEST 5")
    assert(byKey("b") === ((3L, tp(3))), "under-cap keys pass through whole")
    // helper column name collides with nothing the caller owns
    val withRn = d.withColumn("_rn", lit("keep"))
    val cappedRn = Sampling.perKeyCap(withRn, "metric", Seq(col("time")), k = 5)
    assert(cappedRn.columns.contains("_rn"))
    assert(cappedRn.select("_rn").distinct().collect().map(_.getString(0)).toSeq === Seq("keep"))
  }

  test("deterministicShuffle: a reproducible permutation matching the hash order") {
    val out = Sampling.deterministicShuffle(docs, "doc_id", salt = "s1")
      .select("doc_id", "shuffle_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.count()
    assert(out.map(_._2).sorted.toSeq === (0L until n).toSeq,
      "positions must be a contiguous 0..n-1 permutation")
    // reference order: driver-side sort by the same salted hash
    val ref = docs.select("doc_id").collect().map(_.getLong(0))
      .map { id =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"s1|$id".getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(15)
        (java.lang.Long.parseLong(hex, 16), id)
      }.sorted.map(_._2)
    assert(out.sortBy(_._2).map(_._1).toSeq === ref.toSeq,
      "order must equal the salted md5-prefix sort")
  }

  test("deterministicShuffle: repartition-invariant; salt changes the order") {
    val one = Sampling.deterministicShuffle(docs, "doc_id", "s1")
      .select("doc_id", "shuffle_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = Sampling.deterministicShuffle(docs.repartition(17), "doc_id", "s1")
      .select("doc_id", "shuffle_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one === two)
    val other = Sampling.deterministicShuffle(docs, "doc_id", "s2")
      .select("doc_id", "shuffle_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(other !== one, "a different salt must permute differently")
  }

  test("temperatureShares: sqrt flattening, shares sum to ~1e6") {
    val s = spark
    import s.implicits._
    // head source 900 rows, tails 100 and 4: raw shares .90/.10/.004,
    // sqrt shares 30/10/2 → .714/.238/.047 — the tail is up-weighted
    val df = ((1 to 900).map(_ => "head") ++ (1 to 100).map(_ => "mid") ++
      (1 to 4).map(_ => "tail")).toDF("source")
    val r = Sampling.temperatureShares(df, "source").orderBy("source")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(3))).toMap
    assert(r("head")._1 === 900L && r("mid")._1 === 100L)
    // exact: w = 30, 10, 2; tot = 42
    assert(r("head")._2 === 714285L) // floor(30e6/42)
    assert(r("mid")._2 === 238095L)
    assert(r("tail")._2 === 47619L)
    val total = r.values.map(_._2).sum
    assert(total >= 999999L - 2 && total <= 1000000L)
  }

  test("fingerprint-keyed split keeps identical content in ONE split") {
    // duplicate a doc's text under a new id — a doc_id-keyed split could
    // strand the twins on opposite sides; the fingerprint key cannot
    val s = spark
    val twin = docs.limit(1)
      .select((org.apache.spark.sql.functions.col("doc_id") + 100000L).as("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val corpus = docs.select("doc_id", "text").unionByName(twin)
    val split = Sampling.hashSplit(
      TextOps.minFingerprint(corpus, w = 8), "fingerprint",
      weights = Seq(0.5, 0.5), labels = Seq("a", "b"), salt = "lk1")
    val byFp = split.groupBy("fingerprint")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("ns"))
      .agg(org.apache.spark.sql.functions.max("ns")).collect()(0).getLong(0)
    assert(byFp === 1L, "no fingerprint group straddles the split")
    // and the twins specifically agree
    val twins = split.where(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"), org.apache.spark.sql.functions.lit(100000L))
        === docs.limit(1).collect()(0).getLong(0))
      .select("split").distinct().count()
    assert(twins === 1L)
  }

  test("stratifiedAlloc draws exactly n rows, quotas = largest-remainder") {
    val n = 20L
    val picked = Sampling.stratifiedAlloc(docs, "lang", "doc_id", n)
    assert(picked.count() === n)
    // driver-side recompute of the exact allocation
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigN = counts.values.sum
    val base = counts.map { case (g, c) => g -> ((n * c) / bigN, (n * c) % bigN) }
    val extra = (n - base.values.map(_._1).sum).toInt
    val bumped = base.toSeq.sortBy { case (g, (_, r)) => (-r, g) }
      .take(extra).map(_._1).toSet
    val want = base.map { case (g, (b, _)) =>
      g -> (b + (if (bumped(g)) 1L else 0L)) }.filter(_._2 > 0)
    val got = picked.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // picks are the quota smallest hash buckets of each stratum
    val quota = want
    val expectIds = docs.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        val q = quota.getOrElse(g, 0L).toInt
        rows.toSeq.map(_._2).sortBy(id => (bucketOf(id), id)).take(q)
      }.toSet
    assert(ids(picked) === expectIds)
  }

  private def bucketOf(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 1000000L
  }

  test("stratifiedAlloc is repartition-stable; salt redraws; edges hold") {
    val a = Sampling.stratifiedAlloc(docs, "lang", "doc_id", 17L)
    val b = Sampling.stratifiedAlloc(docs.repartition(13), "lang", "doc_id", 17L)
    assert(a.collect().toSet === b.collect().toSet)
    val salted = Sampling.stratifiedAlloc(docs, "lang", "doc_id", 17L, salt = "v2")
    assert(ids(salted) !== ids(a), "different salt must redraw")
    assert(salted.count() === 17L, "allocation is salt-independent")
    val all = docs.count()
    assert(Sampling.stratifiedAlloc(docs, "lang", "doc_id", all).count() === all)
    assert(Sampling.stratifiedAlloc(docs, "lang", "doc_id", 0L).count() === 0L)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedAlloc(docs, "lang", "doc_id", all + 1)
    }
  }

  private def saltedBucketOf(id: Long, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((id.toString + salt).getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 1000000L
  }

  test("mixtureSchedule: stride interleave, prefix proportions, drops") {
    val sched = Sampling.mixtureSchedule(docs, "lang", "doc_id",
        weights = Seq("en" -> 4L, "de" -> 2L, "fr" -> 1L), salt = "s1")
      .orderBy("ord", "lang", "pos_in_source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // unweighted sources dropped
    assert(sched.map(_._1).toSet == Set("en", "de", "fr"))
    // per-source: positions are the salted-hash order, ord = pos*1e6/w
    val byLang = sched.groupBy(_._1)
    for ((lang, w) <- Seq(("en", 4L), ("de", 2L), ("fr", 1L))) {
      val rs = byLang(lang).sortBy(_._3)
      assert(rs.map(_._3).toSeq == rs.indices.map(_.toLong))
      rs.foreach { case (_, _, pos, ord) =>
        assert(ord == pos * 1000000L / w) }
      val expOrder = rs.map(_._2).sortBy(id => (saltedBucketOf(id, "s1"), id))
      assert(rs.sortBy(_._3).map(_._2).toSeq == expOrder.toSeq, s"$lang order")
    }
    // any prefix holds the sources in ~weight proportion (±1 per source)
    val n = sched.length
    for (cut <- Seq(n / 7, n / 3, n / 2)) {
      val prefix = sched.take(cut)
      for ((lang, w) <- Seq(("en", 4L), ("de", 2L), ("fr", 1L))) {
        val have = prefix.count(_._1 == lang)
        val total = byLang(lang).length
        // source s exhausts after total rows; until then the stride
        // guarantees floor bounds within one slot
        val expected = math.min(total.toLong,
          w * prefix.last._4 / 1000000L + 1)
        assert(math.abs(have - expected) <= 1,
          s"prefix $cut $lang: have $have expected ~$expected")
      }
    }
    // repartition invariance
    val re = Sampling.mixtureSchedule(docs.repartition(7), "lang", "doc_id",
        weights = Seq("en" -> 4L, "de" -> 2L, "fr" -> 1L), salt = "s1")
      .orderBy("ord", "lang", "pos_in_source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(re.toSeq == sched.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.mixtureSchedule(docs, "lang", "doc_id",
        weights = Seq("en" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSchedule(docs, "lang", "doc_id",
        weights = Seq("en" -> 1L, "en" -> 2L))
    }
  }
}
