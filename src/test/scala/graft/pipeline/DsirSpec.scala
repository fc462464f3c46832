package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** DSIR-style selection (Sampling.dsirSelect) against an independent
  * driver-side reference: md5 bucket hashing with java MessageDigest,
  * ppm-rate weights via BigInt-free long floor-div, occurrence-weighted
  * scores, (score desc, doc_id) top-n. */
class DsirSpec extends SparkSpec {

  private def mkDocs(rows: (Long, String)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, t) => Row(i, t) }: _*),
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType))))

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def bigramBuckets(text: String, buckets: Int): Seq[Long] = {
    val tk = text.split(" ", -1)
    (0 until tk.length - 1).map(i => md5Long(tk(i) + " " + tk(i + 1)) % buckets)
  }

  /** Reference scoring: same definition, independent code path. */
  private def refSelect(raw: Seq[(Long, String)], target: Seq[(Long, String)],
                        n: Int, buckets: Int): Seq[(Long, Long, Long)] = {
    val tb = target.flatMap(d => bigramBuckets(d._2, buckets))
    val rb = raw.flatMap(d => bigramBuckets(d._2, buckets))
    val tc = tb.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rc = rb.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (nt, nr) = (tb.size.toLong, rb.size.toLong)
    def w(b: Long): Long =
      tc.getOrElse(b, 0L) * 1000000L / nt - rc.getOrElse(b, 0L) * 1000000L / nr
    raw.map { case (id, t) =>
      val bs = bigramBuckets(t, buckets)
      (id, bs.map(w).sum, bs.size.toLong)
    }.sortBy { case (id, s, _) => (-s, id) }.take(n)
  }

  private val tgt = Seq(
    1000L -> "apfel birne apfel kirsche birne apfel traube kirsche",
    1001L -> "kirsche apfel birne traube apfel birne kirsche apfel")
  private val raw = Seq(
    1L -> "apfel birne apfel kirsche traube birne apfel",
    2L -> "apple pear cherry grape apple pear plum peach",
    3L -> "birne apfel orange lemon traube kirsche apfel birne",
    4L -> "x", // single token: no bigrams, score 0
    5L -> "completely unrelated words about database query planning engines")

  test("selection matches the driver-side reference, short docs included") {
    val got = Sampling.dsirSelect(mkDocs(raw: _*), mkDocs(tgt: _*),
        n = 5, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = refSelect(raw, tgt, 5, 64)
    assert(got.sortBy(_._1).toSeq == ref.sortBy(_._1))
    // target-like docs outrank the off-distribution ones
    val rank = ref.map(_._1)
    assert(rank.indexOf(1L) < rank.indexOf(2L))
    assert(rank.indexOf(3L) < rank.indexOf(5L))
    // the gram-less doc is present with score 0
    assert(ref.find(_._1 == 4L).exists(x => x._2 == 0L && x._3 == 0L))
  }

  test("top-n cut is deterministic and repartition-invariant") {
    val rawDf = mkDocs(raw: _*)
    val a = Sampling.dsirSelect(rawDf, mkDocs(tgt: _*), n = 3, buckets = 64)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.dsirSelect(rawDf.repartition(7), mkDocs(tgt: _*),
      n = 3, buckets = 64).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a == refSelect(raw, tgt, 3, 64).map(_._1).toSet)
  }

  test("empty gram streams are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.dsirSelect(mkDocs(raw: _*), mkDocs(9L -> "solo"), n = 2)
    }
  }
}
