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

  /** Reference apply: each merge in rank order, greedy left-to-right. */
  private def refApply(word: String,
                       merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp))) :+ "</w>"
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def applied(texts: Seq[String], merges: Seq[(String, String)],
                      batch: Int = 200): Map[(Long, Long, Long), String] = {
    val s = spark
    import s.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mdf = merges.zipWithIndex.map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "a", "b")
    TextOps.applyBpe(docs, mdf, batch = batch).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getString(3)))
      .toMap
  }

  private def refApplied(texts: Seq[String],
                         merges: Seq[(String, String)]): Map[(Long, Long, Long), String] =
    (for {
      (t, i) <- texts.zipWithIndex
      (w, pos) <- t.split(" ").filter(_.nonEmpty).zipWithIndex
      (tok, spos) <- refApply(w, merges).zipWithIndex
    } yield ((i.toLong, pos.toLong, spos.toLong), tok)).toMap

  test("applyBpe matches the reference apply under LEARNED merges") {
    val rng = new scala.util.Random(41L)
    val roots = Seq("low", "lower", "lowest", "newer", "newest", "wider",
      "wide", "news")
    val texts = (0 until 30).map(_ =>
      Seq.fill(2 + rng.nextInt(5))(roots(rng.nextInt(roots.length))).mkString(" "))
    val s = spark
    import s.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mdf = TextOps.learnBpeMerges(docs, 10)
    val ms = mdf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextOps.applyBpe(docs, mdf).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getString(3)))
      .toMap
    assert(got === refApplied(texts, ms))
  }

  test("applyBpe never merges across a symbol that merely ENDS with a") {
    // after (x,a) the word xab is [xa, b]; a naive single-separator replace
    // encoding would then match (a,b) inside "xa b" and corrupt the word
    val merges = Seq("x" -> "a", "a" -> "b")
    val got = applied(Seq("xab ab xa"), merges)
    val exp = refApplied(Seq("xab ab xa"), merges)
    assert(got === exp)
    assert(refApply("xab", merges) === Vector("xa", "b", "</w>"))
  }

  test("applyBpe is greedy left-to-right on overlapping runs") {
    val merges = Seq("a" -> "a")
    assert(applied(Seq("aaaa aaa a"), merges) ===
      refApplied(Seq("aaaa aaa a"), merges))
    def applied1(t: String) = applied(Seq(t), merges)
    assert(applied1("aaaa").toSeq.sortBy(_._1).map(_._2) ===
      Seq("aa", "aa", "</w>"))
    assert(applied1("aaa").toSeq.sortBy(_._1).map(_._2) ===
      Seq("aa", "a", "</w>"))
  }

  test("applyBpe checkpoint batching changes nothing") {
    val merges = Seq("t" -> "h", "th" -> "e", "the" -> "</w>", "a" -> "n")
    val texts = Seq("the theme then an and", "a the an")
    assert(applied(texts, merges, batch = 1) === applied(texts, merges))
    assert(applied(texts, merges, batch = 1) === refApplied(texts, merges))
  }

  test("applyBpe reconstructs every word from its subword tokens") {
    val rng = new scala.util.Random(7L)
    val texts = (0 until 20).map(_ =>
      (0 until 4).map(_ => rng.alphanumeric.take(1 + rng.nextInt(6)).mkString)
        .mkString(" "))
    val s = spark
    import s.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mdf = TextOps.learnBpeMerges(docs, 8, minCount = 1L)
    val rows = TextOps.applyBpe(docs, mdf).collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getLong(2)).map(_.getString(3)).mkString("")
      }
    for (((doc, pos), joined) <- rows) {
      val w = texts(doc.toInt).split(" ").filter(_.nonEmpty)(pos.toInt)
      assert(joined === w + "</w>", s"doc $doc pos $pos")
    }
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
