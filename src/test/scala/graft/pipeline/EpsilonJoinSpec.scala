package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

/** Exact epsilon-ball R-S join (embedding decontamination): brute-force
  * equality, nlist invariance (triangle pruning is exactness-preserving),
  * clustered-data pruning, and the overflow guard. */
class EpsilonJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
  private lazy val corpus = emb.where("vec_id % 10 <> 0")
  private lazy val probes = emb.where("vec_id % 10 = 0")

  /** Driver-side brute force on the same quantized grid. */
  private def brute(c: org.apache.spark.sql.DataFrame,
                    p: org.apache.spark.sql.DataFrame,
                    d2max: Long): Map[Long, (Long, Long)] = {
    def q(df: org.apache.spark.sql.DataFrame): Seq[(Long, Array[Long])] =
      df.select(col("vec_id"), transform(col("embedding"),
          x => round(x.cast("double") * 10000).cast("long")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toSeq
    val cs = q(c); val ps = q(p)
    cs.flatMap { case (cid, cv) =>
      val hits = ps.flatMap { case (_, pv) =>
        var d = 0L; var k = 0
        while (k < cv.length) { val t = cv(k) - pv(k); d += t * t; k += 1 }
        if (d <= d2max) Some(d) else None
      }
      if (hits.nonEmpty) Some(cid -> (hits.size.toLong, hits.min)) else None
    }.toMap
  }

  private def run(c: org.apache.spark.sql.DataFrame,
                  p: org.apache.spark.sql.DataFrame,
                  d2max: Long, nlist: Int): Map[Long, (Long, Long)] =
    Ann.epsilonJoin(c, p, d2max, nlist).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("matches brute force; invariant in nlist (pruning loses nothing)") {
    val want = brute(corpus, probes, 140000000L)
    assert(want.nonEmpty, "threshold must produce hits at sf0.001")
    for (nlist <- Seq(1, 4, 8))
      assert(run(corpus, probes, 140000000L, nlist) === want,
        s"nlist=$nlist diverges from brute force")
  }

  test("d2max = 0 finds exact duplicates only") {
    // plant a corpus row identical to a probe
    val dup = probes.limit(1)
      .select((col("vec_id") + 100001L).as("vec_id"), col("embedding"),
        col("label"))
    val got = run(corpus.unionByName(dup), probes, 0L, nlist = 4)
    val dupId = dup.collect()(0).getLong(0)
    assert(got.keySet === Set(dupId) && got(dupId) === ((1L, 0L)))
  }

  test("clustered data: tight clusters, far probe reaches only its own") {
    def vec(base: Float, jitter: Float): Seq[Float] =
      Seq.tabulate(4)(i => if (i == 0) base + jitter else 0.1f * i)
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    def mk(rows: (Long, Seq[Float])*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, v) => Row(i, v) }: _*), schema)
    // two clusters at x=0.1 and x=0.9; probe sits on cluster B
    val c = mk(1L -> vec(0.1f, 0f), 2L -> vec(0.1f, 0.001f),
      3L -> vec(0.9f, 0f), 4L -> vec(0.9f, 0.001f))
    val p = mk(100L -> vec(0.9f, 0.0005f))
    val want = brute(c, p, 1000L)
    assert(want.keySet === Set(3L, 4L))
    assert(run(c, p, 1000L, nlist = 2) === want)
  }

  test("coordinates past the int64-exact bound raise loudly") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val big = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, Seq(9000f, 0f)), Row(2L, Seq(-9000f, 0f))), schema)
    val p = spark.createDataFrame(java.util.Arrays.asList(
      Row(100L, Seq(0f, 0f))), schema)
    val ex = intercept[Exception] {
      Ann.epsilonJoin(big, p, 1000L, nlist = 1).collect()
    }
    assert(ex.getMessage.contains("int64-exact") ||
      ex.getCause != null && ex.getCause.getMessage.contains("int64-exact"))
  }
}
