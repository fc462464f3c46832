package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Semantic dedup (cluster-scoped cosine) and canonical-form dedup. */
class SemanticSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()

  private def mkDocs(rows: (Long, String)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, t) => Row(i, t) }: _*),
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType))))

  // Driver-side reference: same definition, independent code path —
  // dense count vectors, seeded-centroid argmin (ties → smallest list),
  // within-cluster integer cosine rule, dominated-by-smaller survivorship.
  private def brute(dim: Int, nlist: Int, tauNum: Long, tauDen: Long)
      : Map[Long, (Long, Boolean)] = {
    val vecs: Map[Long, Array[Long]] = TextOps.hashVectorize(docs, dim)
      .select(col("doc_id"), transform(col("vec"), x => x.cast("long")).as("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val cents = vecs.keys.toSeq.sorted.take(nlist).map(vecs)
    def assign(v: Array[Long]): Long = {
      var best = 0; var bestD = Long.MaxValue
      for (i <- cents.indices) {
        var d = 0L
        for (k <- v.indices) { val t = v(k) - cents(i)(k); d += t * t }
        if (d < bestD) { bestD = d; best = i }
      }
      best.toLong
    }
    val asg = vecs.map { case (id, v) => id -> assign(v) }
    def n2(v: Array[Long]): Long = v.map(x => x * x).sum
    val ids = vecs.keys.toSeq.sorted
    val dominated = (for {
      i <- ids; j <- ids if i < j && asg(i) == asg(j)
      dot = vecs(i).zip(vecs(j)).map { case (x, y) => x * y }.sum
      if dot * dot * tauDen * tauDen >= n2(vecs(i)) * n2(vecs(j)) * tauNum * tauNum
    } yield j).toSet
    vecs.keys.map(id => id -> (asg(id), !dominated.contains(id))).toMap
  }

  test("semanticDedup equals the brute within-cluster dominated rule (sf0.001)") {
    for (nlist <- Seq(1, 4, 8)) {
      val got = Dedup.semanticDedup(docs, 19L, 20L, dim = 64, nlist = nlist)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      val want = brute(64, nlist, 19L, 20L)
      assert(got.size === want.size, s"nlist=$nlist row count")
      assert(got === want, s"nlist=$nlist")
    }
  }

  test("semanticDedup is blocks-invariant (grid triangle loses no pair)") {
    // blocks=1 is the degenerate single-cell join (the pre-grid shape);
    // any blocks must produce the identical dominated set — every
    // unordered within-cluster pair lands in exactly one (i ≤ j) cell.
    val base = Dedup.semanticDedup(docs, 19L, 20L, dim = 64, nlist = 4,
        blocks = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    for (m <- Seq(2, 3, 8, 17)) {
      val got = Dedup.semanticDedup(docs, 19L, 20L, dim = 64, nlist = 4,
          blocks = m)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(got === base, s"blocks=$m")
    }
  }

  test("semanticDedup drops an exact duplicate, keeps the smaller id") {
    val d = mkDocs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "completely different tokens entirely unrelated"))
    val out = Dedup.semanticDedup(d, 19L, 20L, dim = 16, nlist = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("semanticDedup keeps zero-token docs and never lets them dominate") {
    // NULL-text docs are the zero-token case (split(NULL) explodes to no
    // row — note "" and "   " DO tokenize, to empty-string tokens, in both
    // this engine and the SQL oracle's string_split): they vectorize to
    // the ZERO vector, must appear in the output (assigned like any doc),
    // and must always be kept — two of them must not dominate each other
    // through the degenerate 0 ≥ 0 integer accept rule
    val d = mkDocs((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), (3L, null), (4L, null),
      (5L, "completely different tokens entirely unrelated"))
    val out = Dedup.semanticDedup(d, 19L, 20L, dim = 16, nlist = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true,
      5L -> true))
  }

  test("semanticDedup is deterministic under repartitioning") {
    val one = Dedup.semanticDedup(docs, 19L, 20L, dim = 64, nlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val two = Dedup.semanticDedup(docs.repartition(17), 19L, 20L, dim = 64, nlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(one === two)
  }

  test("semanticDedup pair join is keyed by cluster — never cartesian") {
    val plan = Dedup.semanticDedup(docs, 19L, 20L, dim = 16, nlist = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"within-cluster pairs must ride the list_id equi-join:\n$plan")
  }

  test("canonDedup groups case/punctuation/whitespace variants") {
    val d = mkDocs(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO  --  WORLD"),
      (4L, "hello worlds"), (5L, "42 is THE answer."), (6L, "42 is the answer"))
    val out = TextOps.canonDedup(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (4L, 4L, 1L, true), (5L, 5L, 2L, true), (6L, 5L, 2L, false)))
  }

  test("canonicalize: the exact normal form (lower, alnum runs, trim)") {
    val d = mkDocs((1L, "  A!b--C  9 "))
    val got = d.select(TextOps.canonicalize(col("text"))).head.getString(0)
    assert(got === "a b c 9")
  }

  // ========================= containmentJoin ============================

  test("containmentJoin: asymmetric near-subset pairs at the exact boundary") {
    val d = mkDocs(
      // doc 1's 4 distinct tokens all appear in doc 2 (C(1,2)=1), but
      // doc 2 has 8 distinct tokens so C(2,1)=1/2
      (1L, "a b c d"),
      (2L, "a b c d e f g h"),
      // doc 3 shares 3 of its 4 tokens with doc 1 → C(3,1)=3/4
      (3L, "a b c z"),
      (4L, "q r s t u v"))
    val got = Dedup.containmentJoin(d, 3L, 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // tau = 3/4: (1→2) full containment, (1→3) 3/4 exactly on the
    // boundary (>=), (3→1) 3/4, (3→2) 3/4; (2→1) at 1/2 excluded
    assert(got === Set((1L, 2L, 1000000L), (1L, 3L, 750000L),
      (3L, 1L, 750000L), (3L, 2L, 750000L)))
  }

  test("containmentJoin counts DISTINCT tokens (multiplicity ignored)") {
    val d = mkDocs((1L, "a a a a b"), (2L, "a b c d e f g h i j"))
    val got = Dedup.containmentJoin(d, 1L, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 2L, 2L))) // n_sub=2 distinct, inter=2
  }

  // =========================== gramNovelty ==============================

  test("gramNovelty: copies score 0, originals 1e6, partial overlap in between") {
    val d = mkDocs(
      (1L, "w1 w2 w3 w4 w5"),          // 3 shingles, all first here
      (2L, "w1 w2 w3 w4 w5"),          // exact copy → novelty 0
      (3L, "x1 x2 x3 x4"),             // 2 fresh shingles → 1e6
      (4L, "w1 w2 w3 y1 y2 y3"))       // 4 shingles: 1 seen (w1w2w3), 3 new
    val got = Dedup.gramNovelty(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 3L, 3L, 1000000L), (2L, 3L, 0L, 0L),
      (3L, 2L, 2L, 1000000L), (4L, 4L, 3L, 750000L)))
  }

  test("gramNovelty: short docs fall to the whole-text gram") {
    val d = mkDocs((1L, "only two"), (2L, "only two"), (3L, "other"))
    val got = Dedup.gramNovelty(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1L, 1000000L), (2L, 1L, 0L), (3L, 1L, 1000000L)))
  }

  // =========================== readability ==============================

  test("readability: hand-computed fixed-point score") {
    // 6 words; sentences: '.' and '!' runs → 2; vowel runs in
    // "the cat sat. a dog runs!": e,a,a,a,o,u → 6
    val d = mkDocs((1L, "the cat sat. a dog runs!"))
    val r = TextOps.readability(d).head
    assert(r.getLong(r.fieldIndex("n_words")) === 6L)
    assert(r.getLong(r.fieldIndex("n_sentences")) === 2L)
    assert(r.getLong(r.fieldIndex("n_syllables")) === 6L)
    assert(r.getLong(r.fieldIndex("wps_e3")) === 3000L)
    assert(r.getLong(r.fieldIndex("spw_e3")) === 1000L)
    // 206835 - 1015*3000/1000 - 84600*1000/1000 = 206835 - 3045 - 84600
    assert(r.getLong(r.fieldIndex("flesch_e3")) === 119190L)
  }

  test("readability: no sentence punctuation floors sentences at 1; empty-safe") {
    val d = mkDocs((1L, "word word word"), (2L, ""))
    val out = TextOps.readability(d).orderBy("doc_id").collect()
    assert(out(0).getLong(out(0).fieldIndex("n_sentences")) === 1L)
    assert(out(0).getLong(out(0).fieldIndex("wps_e3")) === 3000L)
    // empty text: split yields [""], 1 word, 0 syllables — no div by zero
    assert(out(1).getLong(out(1).fieldIndex("spw_e3")) === 0L)
  }
}
