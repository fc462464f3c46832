package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextOps.learnBpeMerges]] against a driver-side reference BPE trainer
  * (the Sennrich et al. 2016 algorithm verbatim: word-frequency table,
  * weighted adjacent-pair argmax, greedy left-to-right merge application,
  * ties on (count desc, a, b)). */
class BpeSpec extends SparkSpec {

  /** Reference single-machine BPE: returns (a, b, pairCount) in merge order. */
  private def refBpe(texts: Seq[String], numMerges: Int,
                     minCount: Long = 2L): Seq[(String, String, Long)] = {
    val wordFreq = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; w <- t.split(" ") if w.nonEmpty)
      wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1
    var vocab: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) =>
        // code points, not UTF-16 units — Spark's split(w, "") yields one
        // symbol per code point, and surrogate halves are not symbols
        (w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))) :+ "</w>") -> f
      }.toMap
    val out = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var done = 0
    while (done < numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) continue = false
      else {
        val ((a, b), c) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        done += 1
        vocab = vocab.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def learned(texts: Seq[String], numMerges: Int): Seq[(String, String, Long)] = {
    val s = spark
    import s.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.learnBpeMerges(docs, numMerges).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("learnBpeMerges matches the reference trainer on a seeded corpus") {
    val rng = new scala.util.Random(23L)
    val roots = Seq("low", "lower", "lowest", "newer", "newest", "wider", "wide")
    val texts = (0 until 40).map(_ =>
      Seq.fill(3 + rng.nextInt(6))(roots(rng.nextInt(roots.length))).mkString(" "))
    assert(learned(texts, 12) === refBpe(texts, 12))
  }

  test("learnBpeMerges greedy fold handles overlapping runs (aaa)") {
    // merging (a,a) in "aaaa" must give [aa, aa, </w>], not re-merge the
    // freshly emitted symbol with the next input char
    val texts = Seq.fill(5)("aaaa aaaa")
    assert(learned(texts, 3) === refBpe(texts, 3))
  }

  test("learnBpeMerges stops early when nothing repeats") {
    val texts = Seq("q w e", "r t y")  // all pairs unique: freq-weighted
    // counts are (char,</w>) pairs each seen once per word — below minCount
    // only if every word is distinct; 'q' appears once, so no pair >= 2
    val got = learned(texts, 10)
    assert(got === refBpe(texts, 10))
    assert(got.length < 10)
  }

  test("learnBpeMerges treats supplementary characters as single symbols") {
    // U+1F600 is a surrogate pair in UTF-16; both the product (split by
    // code point) and the reference must seed it as ONE symbol
    val texts = Seq.fill(4)("😀ab 😀ab ab")
    val got = learned(texts, 4)
    assert(got === refBpe(texts, 4))
    assert(got.exists { case (a, b, _) => (a + b).contains("😀") },
      "a merge should involve the emoji symbol")
  }

  test("learnBpeMerges is partitioning-invariant") {
    val texts = Seq.fill(8)("the them theme") ++ Seq.fill(3)("then the")
    val s = spark
    import s.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val one = TextOps.learnBpeMerges(docs.repartition(1), 6)
      .collect().map(_.toSeq).toSeq
    val many = TextOps.learnBpeMerges(docs.repartition(7), 6)
      .collect().map(_.toSeq).toSeq
    assert(one === many)
  }
}
