package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Full positional winnowing (TextOps.winnowFingerprints) against an
  * independent driver-side reference: md5/rot60 gram hashes recomputed with
  * java.security.MessageDigest, selection by literal enumeration of every
  * full w-window (a position is kept iff it is a minimum of SOME window —
  * ties all kept), plus the short-doc and few-gram fallbacks. */
class WinnowSpec extends SparkSpec {

  private def mkDocs(rows: (Long, String)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, t) => Row(i, t) }: _*),
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType))))

  // --- independent hash replica (no Spark involved) ---
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def rot60(h: Long, s: Int): Long =
    if (s == 0) h
    else ((h << s) & ((1L << 60) - 1)) | (h >>> (60 - s))
  private def gramHashes(text: String, n: Int): Vector[Long] = {
    val th = text.split(" ", -1).toVector.map(md5Long)
    if (th.size < n) Vector.empty
    else (0 to th.size - n).toVector.map { p =>
      (0 until n).map(i => rot60(th(p + i), (7 * i) % 60)).reduce(_ ^ _)
    }
  }
  /** Reference selection: minima of every full w-window, union; all ties. */
  private def refWinnow(text: String, n: Int, w: Int): Set[(Long, Long)] = {
    val tokCount = text.split(" ", -1).length
    if (tokCount < n) return Set((0L, md5Long(text)))
    val gs = gramHashes(text, n)
    if (gs.size < w) {
      val mn = gs.min
      gs.zipWithIndex.collect { case (g, p) if g == mn => (p.toLong, g) }.toSet
    } else {
      (0 to gs.size - w).flatMap { s =>
        val winMin = (s until s + w).map(gs).min
        (s until s + w).collect { case p if gs(p) == winMin => (p.toLong, gs(p)) }
      }.toSet
    }
  }

  private def run(docs: org.apache.spark.sql.DataFrame, n: Int = 8, w: Int = 4)
      : Map[Long, Set[(Long, Long)]] =
    TextOps.winnowFingerprints(docs, n, w)
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }

  private val longText =
    "the quick brown fox jumps over the lazy dog while the quick brown fox " +
      "naps under the warm sun and the lazy dog jumps over the brown fence " +
      "then every animal rests quietly beside the calm river bank at dusk"
  private val repeatText = ("a b " * 20).trim // repeated grams → hash ties
  private val exactText = "one two three four five six seven eight" // 8 tokens, 1 gram
  private val shortText = "just five little words here"

  test("winnow matches the window-enumeration reference on all shapes") {
    val docs = mkDocs(1L -> longText, 2L -> repeatText, 3L -> exactText,
      4L -> shortText)
    val got = run(docs)
    for ((id, txt) <- Seq(1L -> longText, 2L -> repeatText, 3L -> exactText,
        4L -> shortText))
      assert(got(id) == refWinnow(txt, 8, 4), s"doc $id")
  }

  test("every full window contains at least one selected fingerprint") {
    val got = run(mkDocs(1L -> longText))(1L).map(_._1)
    val nGrams = gramHashes(longText, 8).size
    for (s <- 0 to nGrams - 4)
      assert((s until s + 4).exists(p => got.contains(p.toLong)), s"window $s")
  }

  test("overlap pairs: planted excerpt found, counts match the reference") {
    // doc 2 quotes an 11-token run of doc 1 (n + w - 1 = 11 ⇒ at least
    // one shared winnow pick is GUARANTEED); doc 3 is unrelated
    val excerpt = longText.split(" ").slice(5, 16).mkString(" ")
    val docs = mkDocs(1L -> longText,
      2L -> ("completely fresh framing text then " + excerpt +
        " and an unrelated coda of more words"),
      3L -> "nothing in common with anything else here at all in any way")
    val got = Dedup.winnowOverlapPairs(docs, n = 8, w = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set((1L, 2L)))
    // reference: intersect the per-doc reference fingerprint SETS
    val f1 = refWinnow(longText, 8, 4).map(_._2)
    val f2 = refWinnow(docs.collect().find(_.getLong(0) == 2L).get
      .getString(1), 8, 4).map(_._2)
    val shared = (f1 & f2).size.toLong
    assert(shared >= 1)
    val (ns, na, nb, ov) = got((1L, 2L))
    assert(ns == shared && na == f1.size && nb == f2.size)
    assert(ov == ns * 1000000L / math.min(na, nb))
  }

  test("overlap pairs: maxDf drops boilerplate-hub fingerprints") {
    // the same 11-token boilerplate in ALL 4 docs → its picks have df 4
    val boiler = "shared boilerplate header row of exactly eleven tokens total"
    assert(boiler.split(" ").length == 9) // 9 tokens: n+w-1=11 not met alone
    val pad = "unique filler UNIQ%d alpha beta gamma delta epsilon zeta"
    val docs = mkDocs((1L to 4L).map(i =>
      i -> (boiler + " shared two " + pad.format(i))): _*)
    val exact = Dedup.winnowOverlapPairs(docs, n = 8, w = 4, maxDf = 1000)
      .collect()
    assert(exact.nonEmpty) // 11-token shared prefix ⇒ guaranteed pick
    val capped = Dedup.winnowOverlapPairs(docs, n = 8, w = 4, maxDf = 3)
      .collect()
    // every shared fingerprint sits in all 4 docs → df 4 > 3 → all dropped
    assert(capped.isEmpty)
  }

  test("overlap pairs: a biting cap keeps numerator and denominator " +
      "in the same kept-fp space") {
    // all 4 docs share an 11-token boilerplate run (its picks get df 4);
    // docs 1 and 2 additionally share a unique 11-token run (df 2)
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda"
    val shared = "uniq one two three four five six seven eight nine ten"
    val docs = mkDocs(
      1L -> (boiler + " onlyone filler " + shared),
      2L -> (shared + " different middle then " + boiler),
      3L -> (boiler + " third doc padding words here now extra"),
      4L -> (boiler + " fourth doc other padding tokens right here"))
    val got = Dedup.winnowOverlapPairs(docs, n = 8, w = 4, maxDf = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // reference in the KEPT space: drop fps present in all 4 docs
    val sets = docs.collect().map(r => r.getLong(0) ->
      refWinnow(r.getString(1), 8, 4).map(_._2)).toMap
    val hubs = sets.values.reduce(_ & _) // df-4 fingerprints (superset of any df>3)
    val dfAll = sets.values.toSeq.flatMap(_.toSeq).groupBy(identity)
      .map { case (f, o) => f -> o.size }
    val dropped = dfAll.filter(_._2 > 3).keySet
    val kept = sets.map { case (d, s) => d -> (s -- dropped) }
    assert(got.keySet.contains((1L, 2L)))
    val (ns, na, nb, ov) = got((1L, 2L))
    assert(ns == (kept(1L) & kept(2L)).size.toLong && ns >= 1)
    assert(na == kept(1L).size && nb == kept(2L).size)
    assert(ov == ns * 1000000L / math.min(na, nb))
    assert(hubs.subsetOf(dropped))
  }

  test("selection is repartition-invariant and respects w") {
    val docs = mkDocs(1L -> longText, 2L -> repeatText)
    val base = run(docs)
    assert(run(docs.repartition(7)) == base)
    val w6 = run(docs, w = 6)
    for ((id, txt) <- Seq(1L -> longText, 2L -> repeatText))
      assert(w6(id) == refWinnow(txt, 8, 6), s"doc $id w=6")
    // wider window never selects more
    assert(w6(1L).size <= base(1L).size)
  }
}
