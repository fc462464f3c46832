package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Concat-and-chunk sequence packing: the distributed prefix sum must be
  * partition-invariant and equal the single-threaded reference fold. */
class PackingSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, t) => Row(Long.box(id), t) }: _*),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private def collectPack(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("packing equals the sequential reference fold (docs straddle boundaries)") {
    // token counts 3,4,5,... against budget 7: several straddles
    val d = docsDf((1L to 12L).map(i => i -> Seq.fill(2 + i.toInt)("w").mkString(" ")): _*)
    val got = collectPack(Packing.packSequences(d, budget = 7))
    var cum = 0L
    val want = (1L to 12L).map { i =>
      val n = 2 + i
      val r = (i, n, cum / 7, cum % 7)
      cum += n
      r
    }
    assert(got === want)
  }

  test("result is partition-count invariant (the scalable prefix sum is exact)") {
    val d = docsDf((1L to 200L).map(i => i -> Seq.fill(1 + (i % 13).toInt)("t").mkString(" ")): _*)
    val one = collectPack(Packing.packSequences(d.coalesce(1), budget = 64))
    val many = collectPack(Packing.packSequences(d.repartition(17), budget = 64))
    assert(one === many)
    // budget-multiple edge: a doc starting exactly at a cut has offset 0
    assert(one.exists(_._4 == 0L))
  }

  test("null text packs as zero tokens instead of crashing") {
    val d = docsDf(1L -> "a b c", 2L -> null, 3L -> "d e")
    val got = collectPack(Packing.packSequences(d, budget = 4))
    assert(got === Seq((1L, 3L, 0L, 0L), (2L, 0L, 0L, 3L), (3L, 2L, 0L, 3L)))
  }

  test("empty input yields an empty, correctly-shaped result") {
    val empty = docsDf()
    val out = Packing.packSequences(empty, budget = 128)
    assert(out.columns.toSeq === Seq("doc_id", "n_tokens", "seq_id", "seq_offset"))
    assert(out.count() === 0)
  }

  test("re-execution of the same plan is identical and nothing is pinned") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val d = docsDf((1L to 150L).map(i => i -> Seq.fill(1 + (i % 11).toInt)("t").mkString(" ")): _*)
    val out = Packing.packSequences(d.repartition(7), budget = 32)
    val first = collectPack(out)
    // Nothing is persisted, so a second action re-executes the FULL lineage
    // — including the bucket shuffle — against the pass-1 offsets captured
    // at build time. This is exactly the cache-loss / task-retry scenario
    // that broke the RangePartitioner-based design: it must be a no-op now
    // because every row's bucket is a literal-driven function of its key.
    val second = collectPack(out)
    assert(first === second)
    var cum = 0L
    val want = (1L to 150L).map { i =>
      val n = 1 + (i % 11)
      val r = (i, n, cum / 32, cum % 32)
      cum += n
      r
    }
    assert(first === want)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, "packSequences must not pin any cache")
  }

  test("explicit numBuckets values all agree with the sequential fold") {
    val sizes = (1L to 90L).map(i => (i * 7 % 13).toInt)
    val d = docsDf(sizes.zipWithIndex.map { case (sz, i) =>
      (i + 1L) -> Seq.fill(sz)("w").mkString(" ")
    }: _*)
    var cum = 0L
    val want = sizes.zipWithIndex.map { case (sz, i) =>
      val n = math.max(sz, 1).toLong
      val r = ((i + 1L), n, cum / 10, cum % 10)
      cum += n
      r
    }
    for (k <- Seq(1, 2, 5, 13, 64)) {
      val got = collectPack(Packing.packSequences(d.repartition(3), budget = 10, numBuckets = k))
      assert(got === want, s"numBuckets=$k")
    }
  }

  test("string keys pack in lexicographic order") {
    val rows = Seq("b" -> "x y", "a" -> "x", "c" -> "x y z")
    val d = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, t) => Row(id, t) }: _*),
      StructType(Seq(StructField("doc_id", StringType), StructField("text", StringType))))
    val got = Packing.packSequences(d, budget = 4, key = "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(("a", 1L, 0L, 0L), ("b", 2L, 0L, 1L), ("c", 3L, 0L, 3L)))
  }

  test("property: random corpora equal the sequential fold at random budgets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val genCase = for {
      n <- Gen.choose(1, 120)
      budget <- Gen.choose(1L, 40L)
      sizes <- Gen.listOfN(n, Gen.choose(0, 25)) // incl. empty docs
      parts <- Gen.choose(1, 9)
    } yield (budget, sizes, parts)
    for (seed <- 0L until 25L) {
      val (budget, sizes, parts) = sample(genCase, seed)
      val d = docsDf(sizes.zipWithIndex.map { case (sz, i) =>
        (i + 1L) -> Seq.fill(sz)("w").mkString(" ")
      }: _*)
      val got = collectPack(Packing.packSequences(d.repartition(parts), budget))
      var cum = 0L
      val want = sizes.zipWithIndex.map { case (sz, i) =>
        // a zero-word doc still tokenizes to one empty-string token ("" split
        // by " " is [""]), matching DuckDB's string_split — mirror that here
        val n = math.max(sz, 1).toLong
        val r = ((i + 1L), n, cum / budget, cum % budget)
        cum += n
        r
      }
      assert(got === want, s"seed=$seed budget=$budget parts=$parts")
    }
  }
}
