package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType, StructField, StructType}

/** Per-dimension embedding statistics (whitening prep) and dictionary
  * tagging (broadcast-lexicon topic labeling). */
class CorpusStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  private def mkEmb(rows: (Long, Seq[Float])*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, v) => Row(i, v) }: _*),
    StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType)))))

  private def mkDocs(rows: (Long, String)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, t) => Row(i, t) }: _*),
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType))))

  test("embeddingStats equals the brute per-dimension moments (sf0.001)") {
    // independent driver-side path: quantize with the same grid, fold
    val vecs: Seq[Array[Long]] = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        // Spark round() is HALF_UP (away from zero) — Math.round would
        // diverge on negative halves
        java.math.BigDecimal.valueOf(x.toDouble * 10000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue).toArray).toSeq
    val dims = vecs.map(_.length).max
    val want = (0 until dims).map { d =>
      val qs = vecs.filter(_.length > d).map(_(d))
      val s = qs.sum
      val n = qs.size.toLong
      (d.toLong, (n, s, qs.map(q => q * q).sum, qs.min, qs.max,
        (s - (((s % n) + n) % n)) / n))
    }.toMap
    val got = Ann.embeddingStats(emb).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got.size === want.size)
    assert(got === want)
  }

  test("embeddingStats mean_q is a FLOOR division (negative sums)") {
    // exactly-representable floats: q = (-10000, -10000, -12500),
    // sum = -32500 over n = 3 → mean floor(-10833.33) = -10834, not -10833
    val df = mkEmb((1L, Seq(-1.0f)), (2L, Seq(-1.0f)), (3L, Seq(-1.25f)))
    val r = Ann.embeddingStats(df).collect()
    assert(r.length === 1)
    assert(r(0).getLong(2) === -32500L) // sum_q
    assert(r(0).getLong(6) === -10834L) // mean_q floored
  }

  test("dictTag counts substring occurrences and rolls up per tag") {
    val d = mkDocs(
      (1L, "hash join beats merge join when the build side is small"),
      (2L, "batch batch batch"),
      (3L, "no relevant phrases here"))
    val dict = Seq("hash join" -> "topic_join", "merge join" -> "topic_join",
      "batch" -> "topic_stream")
    val r = TextOps.dictTag(d, dict).collect()
      .map(x => (x.getLong(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r === Map((1L, "topic_join") -> 2L, (2L, "topic_stream") -> 3L))
  }

  test("dictTag counts a phrase ending at the text boundary") {
    val d = mkDocs((7L, "window agg"))
    val r = TextOps.dictTag(d, Seq("window agg" -> "t")).collect()
    assert(r.length === 1 && r(0).getLong(2) === 1L)
  }

  test("dictTag rejects regex-metachar phrases loudly") {
    val d = mkDocs((1L, "x"))
    val e = intercept[IllegalArgumentException] {
      TextOps.dictTag(d, Seq("a.*b" -> "t"))
    }
    assert(e.getMessage.contains("literal"))
  }

  test("phraseSearch counts overlapping consecutive-token matches") {
    val d = mkDocs(
      (1L, "a a a b"),           // "a a" at pos 0 and 1 — overlapping
      (2L, "a b a b a"),         // "a b" twice, "a a" never
      (3L, "b b b"))
    val aa = TextOps.phraseSearch(d, Seq("a", "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa === Map(1L -> 2L))
    val ab = TextOps.phraseSearch(d, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ab === Map(1L -> 1L, 2L -> 2L))
  }

  private def mkEmbL(rows: (Long, Seq[Float], Int)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, v, l) => Row(i, v, l) }: _*),
    StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", org.apache.spark.sql.types.IntegerType,
        nullable = false))))

  test("hardNegatives ranks cross-label neighbors only, k-capped") {
    // query 0 (label 0) at (1,0); same-label 1 is CLOSEST but excluded;
    // cross-label 2,3,4 rank by cosine desc then vid
    val df = mkEmbL(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.99f, 0.1f), 0),   // nearest, same label — excluded
      (2L, Seq(0.9f, 0.3f), 1),
      (3L, Seq(0.5f, 0.8f), 1),
      (4L, Seq(-1.0f, 0.0f), 2))
    val r = Ann.hardNegatives(df.where(col("vec_id") === 0L), df, k = 2)
      .orderBy("rnk").collect()
    assert(r.map(_.getLong(2)).toSeq === Seq(2L, 3L),
      "same-label near neighbor never a negative")
    assert(r.map(_.getLong(4)).toSeq === Seq(1L, 2L))
    assert(r(0).getInt(1) === 0 && r(0).getInt(3) === 1)
  }

  test("concordance slices context, clamped at document edges") {
    val d = mkDocs(
      (1L, "a b X Y c d e"),     // interior match at pos 2
      (2L, "X Y tail"),          // match at doc start
      (3L, "lead X Y"))          // match at doc end
    val r = TextOps.concordance(d, Seq("X", "Y"), context = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).sortBy(_._1)
    assert(r.toSeq === Seq(
      (1L, 2L, "a b X Y c d"),
      (2L, 0L, "X Y tail"),
      (3L, 1L, "lead X Y")))
  }

  test("phraseSearch three-token chain requires full adjacency") {
    val d = mkDocs(
      (1L, "x y z tail"),
      (2L, "x y q z"),           // broken chain — no match
      (3L, "x y z x y z"))
    val r = TextOps.phraseSearch(d, Seq("x", "y", "z")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1L, 3L -> 2L))
  }

  test("vocabCoverage: hand-computed curve, clamping, exact fractions") {
    // tfs: a=5, b=3, c=2, d=1, e=1 → N=12, V=5; ties d/e break by token
    val d = mkDocs(1L -> "a a a b b c", 2L -> "a a b c d e")
    val got = TextOps.vocabCoverage(d, ks = Seq(1, 2, 4, 99))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got(1L) == (5L, 5L, 12L, 5L * 1000000L / 12L))
    assert(got(2L) == (5L, 8L, 12L, 8L * 1000000L / 12L))
    assert(got(4L) == (5L, 11L, 12L, 11L * 1000000L / 12L))
    assert(got(99L) == (5L, 12L, 12L, 1000000L)) // clamped to V, full mass
    // duplicate/unsorted ks collapse; repartition invariance
    val re = TextOps.vocabCoverage(d.repartition(5), ks = Seq(99, 1, 1))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re == Map(1L -> 5L, 99L -> 12L))
    intercept[IllegalArgumentException] {
      TextOps.vocabCoverage(d, ks = Seq.empty)
    }
  }
}
