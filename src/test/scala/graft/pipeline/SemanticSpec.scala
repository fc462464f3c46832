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

  test("semanticDedup drops an exact duplicate, keeps the smaller id") {
    val d = mkDocs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "completely different tokens entirely unrelated"))
    val out = Dedup.semanticDedup(d, 19L, 20L, dim = 16, nlist = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true))
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
}
