package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The graph end of the dedup pipeline — exact Jaccard join (prefix
  * filtering), connected components (label propagation + star contraction),
  * cluster/survivor assignment — checked against brute-force truth on both
  * the driver testdata and seeded synthetic corpora/graphs. */
class DedupGraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()

  /** Driver-side union-find: ground truth for component labels. */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  private def edgesDf(edges: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    edges.toDF("doc_a", "doc_b")
  }

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** A seeded synthetic corpus with graded overlap: base docs from a small
    * vocabulary plus mutated near-copies, so pair Jaccard spreads across
    * (0, 1) instead of the testdata's bimodal split. */
  private def syntheticDocs(n: Int, seed: Long): DataFrame = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    val base = (0 until n).map { i =>
      (i.toLong, Seq.fill(6 + rng.nextInt(10))(vocab(rng.nextInt(vocab.length)))
        .mkString(" "))
    }
    val mutated = (0 until n / 2).map { i =>
      val toks = base(rng.nextInt(n))._2.split(" ").toSeq
      val drop = rng.nextInt(math.max(1, toks.length / 3))
      ((n + i).toLong, (toks.drop(drop) ++
        Seq.fill(rng.nextInt(3))(vocab(rng.nextInt(vocab.length)))).mkString(" "))
    }
    (base ++ mutated).toDF("doc_id", "text")
  }

  /** Brute-force exact Jaccard pairs via textual shingle sets — the truth
    * [[Dedup.jaccardJoin]]'s prefix filter must reproduce exactly. */
  private def bruteJaccard(corpus: DataFrame, tau: Double): Set[Seq[Any]] = {
    val ids = corpus.select(col("doc_id").as("doc_a"))
      .join(corpus.select(col("doc_id").as("doc_b")),
        col("doc_a") < col("doc_b"))
    Dedup.verifyJaccard(ids, Dedup.shingles(corpus), tau)
      .collect().map(_.toSeq).toSet
  }

  test("jaccardJoin equals brute-force exact Jaccard on the testdata corpus") {
    for (tau <- Seq(0.4, 0.8)) {
      val truth = bruteJaccard(docs, tau)
      val got = Dedup.jaccardJoin(docs, tau).collect().map(_.toSeq).toSet
      assert(got === truth, s"tau=$tau")
    }
    assert(bruteJaccard(docs, 0.8).nonEmpty, "planted near-dups expected")
  }

  test("verify-tail pair routing: forced-merge plan equals the broadcast plan") {
    // routePairFrame broadcasts small candidate frames and merge-joins big
    // ones (the copy-dense OOM fix); output must be identical either way.
    // The conf mutation lives on an ISOLATED session (newSession shares the
    // context but not SQL conf) so a concurrently running dedup test on the
    // shared session can never observe the forced-merge thresholds.
    val broadcastPlan = Dedup.jaccardJoin(docs, 0.4).collect().map(_.toSeq).toSet
    val s2 = spark.newSession()
    val docs2 = s2.read.parquet(s"$dir/documents.parquet")
    // force the merge route through BOTH signals: the block-manager bytes
    // path (checkpointed frames) and the pair-count fallback
    s2.conf.set("spark.graft.maxBroadcastPairBytes", "0")
    s2.conf.set("spark.graft.maxBroadcastPairs", "0")
    val mergePlan = Dedup.jaccardJoin(docs2, 0.4).collect().map(_.toSeq).toSet
    assert(mergePlan === broadcastPlan)
    assert(broadcastPlan.nonEmpty)
  }

  test("verify-tail pair routing: malformed threshold conf raises a clear error") {
    val s2 = spark.newSession()
    val docs2 = s2.read.parquet(s"$dir/documents.parquet")
    s2.conf.set("spark.graft.maxBroadcastPairBytes", "lots")
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardJoin(docs2, 0.4).collect()
    }
    assert(e.getMessage.contains("spark.graft.maxBroadcastPairBytes"))
  }

  test("jaccardJoin recall/precision 1 on a graded synthetic corpus") {
    val corpus = syntheticDocs(40, seed = 7L).cache()
    for (tau <- Seq(0.2, 0.5, 0.9)) {
      val truth = bruteJaccard(corpus, tau)
      val got = Dedup.jaccardJoin(corpus, tau).collect().map(_.toSeq).toSet
      assert(got === truth, s"tau=$tau")
    }
    // sanity: the graded corpus actually discriminates between thresholds
    assert(bruteJaccard(corpus, 0.2).size > bruteJaccard(corpus, 0.9).size)
  }

  test("connectedComponents matches union-find on seeded random graphs") {
    val rng = new scala.util.Random(13L)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
      val truth = bruteComponents(edges)
      assert(labelMap(Dedup.connectedComponents(edgesDf(edges))) === truth)
      assert(labelMap(Dedup.connectedComponentsStars(edgesDf(edges))) === truth)
    }
  }

  test("connectedComponents is deterministic and leaves no pinned cache") {
    val edges = Seq((5L, 2L), (2L, 9L), (14L, 3L), (7L, 7L))
    val r1 = labelMap(Dedup.connectedComponents(edgesDf(edges)))
    val r2 = labelMap(Dedup.connectedComponents(edgesDf(edges)))
    assert(r1 === r2)
    assert(r1(9L) === 2L && r1(14L) === 3L && r1(7L) === 7L)
    // the loop's persists must all be released — a caller can never reach
    // them (the returned plan is a different frame than the persisted one)
    val cached = spark.sharedState.cacheManager
    val probe = Dedup.connectedComponents(edgesDf(edges))
    assert(cached.lookupCachedData(
      probe.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).isEmpty)
  }

  test("label propagation enforces its maxIters bound on a long path") {
    // with the r16 pointer jump each round covers ≤ 2·reach + 1 hops
    // (reach after r rounds = 2^r − 1), so a 40-vertex path (diameter 39)
    // cannot converge in 4 rounds (reach 15 < 39) → must refuse, not
    // silently return half-converged labels
    val path = (0L until 39L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(edgesDf(path), maxIters = 4)
    }
    assert(e.getMessage.contains("converge"))
  }

  test("star contraction handles a 10^4-vertex path in O(log^2) rounds") {
    // the adversarial-diameter case label propagation cannot touch
    // (it would need 10^4 rounds); star contraction stays within the
    // default 64-round bound by the Kiveris SoCC'14 argument
    val n = 10000L
    val path = (0L until n).map(i => (i, i + 1))
    val labels = labelMap(Dedup.connectedComponentsStars(edgesDf(path)))
    assert(labels.size === n + 1)
    assert(labels.values.forall(_ === 0L), "one component rooted at the min")
  }

  test("embeddingDupClusters matches union-find over the LSH pair graph") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val r = Ann.embeddingDupClusters(emb, threshold = 0.3).cache()
    assert(r.count() === emb.count(), "one row per corpus vector")
    val pairs = Ann.lshCosinePairs(emb, 0.3).select("vid_a", "vid_b")
      .collect().map(p => (p.getLong(0), p.getLong(1)))
    assert(pairs.nonEmpty, "fixture should produce within-bucket pairs")
    val truth = bruteComponents(pairs)
    val got = labelMap(r.select("vec_id", "cluster_id"))
    assert(truth.forall { case (v, c) => got(v) == c })
    // keep <=> vector is its cluster's minimum; singletons keep themselves
    assert(r.where(col("keep") =!= (col("vec_id") === col("cluster_id")))
      .count() === 0)
    r.unpersist(); emb.unpersist()
  }

  test("nearDupClusters assigns every doc, keeps exactly the cluster minima") {
    val r = Dedup.nearDupClusters(docs, threshold = 0.8).cache()
    assert(r.count() === docs.count(), "one row per corpus document")
    // keep <=> doc is its cluster's minimum
    val minPerCluster = r.groupBy("cluster_id").agg(min("doc_id").as("mn"))
    val bad = r.join(minPerCluster, "cluster_id")
      .where(col("keep") =!= (col("doc_id") === col("mn")))
    assert(bad.count() === 0)
    // clusters reproduce the verified pair graph's components
    val pairs = Dedup.nearDupPairs(docs, threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(p => (p.getLong(0), p.getLong(1)))
    val truth = bruteComponents(pairs)
    val got = labelMap(r.select("doc_id", "cluster_id"))
    assert(truth.forall { case (v, c) => got(v) == c })
    r.unpersist()
  }

  /** Brute-force edit-distance pairs: full cross product, no blocking. */
  private def bruteEditPairs(corpus: DataFrame, k: Int): Set[(Long, Long, Long)] = {
    val a = corpus.select(col("doc_id").as("doc_a"), col("text").as("ta"))
    val b = corpus.select(col("doc_id").as("doc_b"), col("text").as("tb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"))
      .where(col("dist") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("editDistancePairs equals brute force on a mutated synthetic corpus") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(19L)
    val alpha = "abcdefgh"
    val base = (0 until 30).map(i =>
      (i.toLong, Seq.fill(20 + rng.nextInt(40))(alpha(rng.nextInt(alpha.length))).mkString))
    // near-copies at graded distances: j in-place substitutions + j appends
    val mutated = (0 until 20).map { j =>
      val (_, t) = base(rng.nextInt(base.length))
      val chars = t.toCharArray
      for (_ <- 0 until j % 4)
        chars(rng.nextInt(chars.length)) = alpha(rng.nextInt(alpha.length))
      ((30 + j).toLong, new String(chars) + "z" * (j % 3))
    }
    val corpus = (base ++ mutated).toDF("doc_id", "text").cache()
    for (k <- Seq(0, 2, 5)) {
      val truth = bruteEditPairs(corpus, k)
      val got = Dedup.editDistancePairs(corpus, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === truth, s"maxDist=$k")
    }
    assert(bruteEditPairs(corpus, 5).nonEmpty, "planted near-copies expected")
    corpus.unpersist()
  }

  test("editDistancePairs emits each pair exactly once and counts code points") {
    val s = spark
    import s.implicits._
    // same-length docs land in ONE band pair (bd, bd+1): the greatest(bd)
    // meeting rule must still emit each qualifying pair a single time
    val same = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aabb")).toDF("doc_id", "text")
    val rows = Dedup.editDistancePairs(same, maxDist = 2).collect()
    assert(rows.length === rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
    assert(rows.length === 3)
    // unicode: one CJK substitution is distance 1 (code points, not bytes)
    val cjk = Seq((1L, "中文本"), (2L, "国文本")).toDF("doc_id", "text")
    val d = Dedup.editDistancePairs(cjk, maxDist = 1).collect()
    assert(d.length === 1 && d.head.getLong(2) === 1L)
  }

  private def bruteCosine(corpus: DataFrame, tn: Long, td: Long) = {
    val f = corpus
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("w"))
    val n2 = f.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    f.select(col("doc_id").as("doc_a"), col("term"), col("w").as("wa"))
      .join(f.select(col("doc_id").as("doc_b"), col("term"), col("w").as("wb")),
        Seq("term"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(n2.select(col("doc_id").as("doc_a"), col("n2").as("na2")), "doc_a")
      .join(n2.select(col("doc_id").as("doc_b"), col("n2").as("nb2")), "doc_b")
      .where(col("dot") * col("dot") * (td * td) >=
        col("na2") * col("nb2") * (tn * tn))
      .select("doc_a", "doc_b", "dot", "na2", "nb2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
  }

  test("cosineJoin equals brute force at two rational thresholds") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 150).cache()
    for ((tn, td) <- Seq((4L, 5L), (7L, 10L))) {
      val truth = bruteCosine(corpus, tn, td)
      val got = Dedup.cosineJoin(corpus, tn, td)
        .select("doc_a", "doc_b", "dot", "na2", "nb2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got === truth, s"tau=$tn/$td")
      assert(truth.nonEmpty, s"expected pairs at tau=$tn/$td")
    }
    corpus.unpersist()
  }

  test("cosineJoin property: brute equality on a seeded random corpus") {
    val s = spark
    import s.implicits._
    // small alphabet -> dense token overlap: the adversarial case for
    // prefix filtering (everything shares common terms)
    val rng = new scala.util.Random(31L)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val corpus = (0 until 60).map { i =>
      val n = 5 + rng.nextInt(25)
      (i.toLong, Seq.fill(n)(words(rng.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text").cache()
    for ((tn, td) <- Seq((1L, 2L), (9L, 10L))) {
      val truth = bruteCosine(corpus, tn, td)
      val got = Dedup.cosineJoin(corpus, tn, td)
        .select("doc_a", "doc_b", "dot", "na2", "nb2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got === truth, s"tau=$tn/$td")
    }
    corpus.unpersist()
  }

  test("cosineJoin maxPosting caps index lists, not the survivors' exactness") {
    val s = spark
    import s.implicits._
    // two identical docs (cos 1) + many docs sharing one hub term
    val hub = (10L to 30L).map(i => (i, s"hub unique$i"))
    val corpus = (Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")) ++ hub)
      .toDF("doc_id", "text")
    val uncapped = Dedup.cosineJoin(corpus, 9L, 10L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped === Set((1L, 2L)))
    // a tiny cap drops the hub postings but the surviving pair stays exact
    val capped = Dedup.cosineJoin(corpus, 9L, 10L, maxPosting = 5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L)))
  }

  test("editDistanceJoin equals the brute cross join and emits pairs once") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23L)
    val alpha = "abcdefgh"
    val left = (0 until 25).map(i =>
      (i.toLong, Seq.fill(15 + rng.nextInt(30))(alpha(rng.nextInt(alpha.length))).mkString))
    // right catalog: mutated copies of left entries + unrelated strings
    val right = (0 until 20).map { j =>
      val (_, t) = left(rng.nextInt(left.length))
      val chars = t.toCharArray
      for (_ <- 0 until j % 5)
        chars(rng.nextInt(chars.length)) = alpha(rng.nextInt(alpha.length))
      ((100 + j).toLong, new String(chars) + "q" * (j % 3))
    } ++ (0 until 5).map(j => ((200 + j).toLong, "zzzz" + "y" * j))
    val lDf = left.toDF("doc_id", "text").cache()
    val rDf = right.toDF("doc_id", "text").cache()
    for (k <- Seq(0, 3, 6)) {
      val truth = lDf.select(col("doc_id").as("left_id"), col("text").as("tl"))
        .crossJoin(rDf.select(col("doc_id").as("right_id"), col("text").as("tr")))
        .select(col("left_id"), col("right_id"),
          levenshtein(col("tl"), col("tr")).cast("long").as("dist"))
        .where(col("dist") <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val rows = Dedup.editDistanceJoin(lDf, rDf, k,
          maxBucket = Int.MaxValue).collect()
      // exactly-once: the 3-band probe covers each right band a single time
      assert(rows.length === rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length,
        s"maxDist=$k duplicated a pair")
      val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === truth, s"maxDist=$k")
    }
    assert(Dedup.editDistanceJoin(lDf, rDf, 6, maxBucket = Int.MaxValue)
      .count() > 0, "planted cross-catalog matches expected")
    lDf.unpersist(); rDf.unpersist()
  }

  test("editDistancePairs maxBucket drops oversized buckets, not others") {
    val s = spark
    import s.implicits._
    // five same-length docs → one dense band; a distant short pair survives
    val docs6 = ((1 to 5).map(i => (i.toLong, s"pair$i")) ++
      Seq((10L, "xy"), (11L, "xz"))).toDF("doc_id", "text")
    val capped = Dedup.editDistancePairs(docs6, maxDist = 2, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((10L, 11L)))
  }

  test("editDistancePairsSegmented equals brute force and the band tier") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(19L)
    val alpha = "abcdefgh"
    val base = (0 until 30).map(i =>
      (i.toLong, Seq.fill(20 + rng.nextInt(40))(alpha(rng.nextInt(alpha.length))).mkString))
    val mutated = (0 until 20).map { j =>
      val (_, t) = base(rng.nextInt(base.length))
      val chars = t.toCharArray
      for (_ <- 0 until j % 4)
        chars(rng.nextInt(chars.length)) = alpha(rng.nextInt(alpha.length))
      ((30 + j).toLong, new String(chars) + "z" * (j % 3))
    }
    val corpus = (base ++ mutated).toDF("doc_id", "text").cache()
    for (k <- Seq(0, 2, 5)) {
      val truth = bruteEditPairs(corpus, k)
      val got = Dedup.editDistancePairsSegmented(corpus, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === truth, s"maxDist=$k")
      val band = Dedup.editDistancePairs(corpus, k, maxBucket = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === band, s"maxDist=$k: tiers disagree")
    }
    corpus.unpersist()
  }

  test("editDistancePairsSegmented survives the uniform-length adversary") {
    val s = spark
    import s.implicits._
    // the ×10 failure shape: EVERY doc the same length, so length bands
    // collapse into one bucket. Content segments must still find exactly
    // the qualifying pairs — and each exactly once.
    val rng = new scala.util.Random(47L)
    val alpha = "abcdef"
    val L = 35
    val base = (0 until 25).map(i =>
      (i.toLong, Seq.fill(L)(alpha(rng.nextInt(alpha.length))).mkString))
    val copies = (0 until 25).map { j =>
      val chars = base(j % base.length)._2.toCharArray
      for (_ <- 0 until j % 5) // same length: substitutions only
        chars(rng.nextInt(L)) = alpha(rng.nextInt(alpha.length))
      ((100 + j).toLong, new String(chars))
    }
    val corpus = (base ++ copies).toDF("doc_id", "text").cache()
    val truth = bruteEditPairs(corpus, 4)
    val rows = Dedup.editDistancePairsSegmented(corpus, 4).collect()
    assert(rows.length ===
      rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth)
    assert(truth.nonEmpty, "planted same-length near-copies expected")
    corpus.unpersist()
  }

  test("editDistancePairsSegmented short-doc stub tier and unicode verify") {
    val s = spark
    import s.implicits._
    // shorter member under maxDist+1 chars: main path cannot host k
    // segments; the ≤2·maxDist stub band must carry the pair
    val shorts = Seq((1L, "ab"), (2L, "abc"), (3L, "abcdefghij"),
      (4L, "abcdefghiq")).toDF("doc_id", "text")
    val got = Dedup.editDistancePairsSegmented(shorts, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === bruteEditPairs(shorts, 3))
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((3L, 4L, 1L)))
    // code-point semantics survive the substring segmentation
    val cjk = Seq((1L, "中文本中文本中"), (2L, "国文本中文本中")).toDF("doc_id", "text")
    val d = Dedup.editDistancePairsSegmented(cjk, maxDist = 1).collect()
    assert(d.length === 1 && d.head.getLong(2) === 1L)
  }

  test("cosineJoinBucketed: precision 1, recall 1 above the banding margin") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(31L)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
      "ii", "jj", "kk", "ll")
    val base = (0 until 40).map { i =>
      val n = 8 + rng.nextInt(20)
      (i.toLong, Seq.fill(n)(words(rng.nextInt(words.length))).mkString(" "))
    }
    // planted high-overlap copies: one token substituted → set-Jaccard well
    // above the 32/16 banding margin, cosine near 1
    val copies = (0 until 20).map { j =>
      val toks = base(j % base.length)._2.split(" ")
      toks(rng.nextInt(toks.length)) = words(rng.nextInt(words.length))
      ((100 + j).toLong, toks.mkString(" "))
    }
    val corpus = (base ++ copies).toDF("doc_id", "text").cache()
    val exact = bruteCosine(corpus, 4L, 5L)
    // geometry pinned at 32/16: this test pins THAT S-curve's stated
    // margin (miss 2.3e-5 at set-J 0.7); the auto default derives a
    // higher-knee geometry whose margin sits at ~0.78 (BandGeometrySpec)
    val got = Dedup.cosineJoinBucketed(corpus, 4L, 5L,
        numHashes = 32, bands = 16, maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b", "dot", "na2", "nb2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // precision exactly 1: every emitted pair is an exact-join pair,
    // bit-identical integers (the verify tier IS the exact accept rule)
    assert(got.subsetOf(exact))
    // recall above the margin: every exact pair whose token-SET Jaccard is
    // ≥ 0.7 must be found (stated miss 2.3e-5/pair at 16 bands of 2 —
    // deterministic hashes, so this pins the realized candidate set)
    val setJ = {
      val sets = corpus.collect()
        .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
      (a: Long, b: Long) =>
        sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
    }
    val aboveMargin = exact.filter(p => setJ(p._1, p._2) >= 0.7)
    assert(aboveMargin.nonEmpty, "planted above-margin pairs expected")
    assert(aboveMargin.subsetOf(got),
      s"missed above-margin pairs: ${aboveMargin.diff(got)}")
    corpus.unpersist()
  }

  test("cosineJoinBucketed matches the exact join on driver testdata") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 300).cache()
    val exact = Dedup.cosineJoin(corpus, 4L, 5L)
      .select("doc_a", "doc_b", "dot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lsh = Dedup.cosineJoinBucketed(corpus, 4L, 5L,
        numHashes = 32, bands = 16, maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b", "dot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // testdata near-dups sit far above the 32/16 banding margin: realized
    // recall is 1 here (q180's sf0.1 run misses exactly the one
    // set-Jaccard-0.43 below-margin pair — documented in the Scaladoc);
    // geometry pinned to q180's registered family
    assert(lsh === exact)
    assert(exact.nonEmpty)
    corpus.unpersist()
  }
}
