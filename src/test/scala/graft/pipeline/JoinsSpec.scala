package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    // heavy-tailed: key "hot" carries 90% of rows
    val fact = (1L to 1000L).map(i =>
      (if (i % 10 == 0) s"cold${i % 3}" else "hot", i, i * 7 % 101))
      .toDF("k", "id", "v")
    val dim = Seq(("hot", 1L), ("cold0", 2L), ("cold1", 3L), ("cold2", 4L),
      ("unmatched", 9L)).toDF("k", "dv")
    (fact, dim)
  }

  test("saltedJoin result set equals the plain equi-join") {
    val (fact, dim) = fixture
    val plain = fact.join(dim, "k")
      .select("k", "id", "v", "dv").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    for (salts <- Seq(1, 4, 13)) {
      val salted = Joins.saltedJoin(fact, dim, Seq("k"), salts, col("id"))
        .select("k", "id", "v", "dv").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("salt actually spreads a hot key across the keyspace") {
    val (fact, _) = fixture
    val spread = fact.where(col("k") === "hot")
      .withColumn("_salt", pmod(TextOps.md5Long(col("id").cast("string")), lit(8L)))
      .groupBy("_salt").count().collect()
    assert(spread.length === 8, "all 8 salts used by the hot key")
    // no salt bucket hogs the key (uniform-ish hash split)
    assert(spread.map(_.getLong(1)).max <= 900L / 3)
  }

  test("salted shuffle partitions on (key, salt), not key alone") {
    val (fact, dim) = fixture
    // forbid broadcast so the exchange shape is observable
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Joins.saltedJoin(fact, dim, Seq("k"), 8, col("id"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), "join exchange must carry the salt column")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ===================== overlapJoin (interval×interval) ================

  private def randomIntervals(n: Int, seed: Int, origin: Long) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val st = origin + rnd.nextLong(100000L)
      (i.toLong, st, st + rnd.nextLong(5000L))
    }.toDF("id", "st", "en")
  }

  test("overlapJoin equals the brute-force theta-join across band widths") {
    val a = randomIntervals(120, seed = 1, origin = 0L)
      .select(col("id").as("ida"), col("st").as("sa"), col("en").as("ea"))
    val b = randomIntervals(80, seed = 2, origin = 20000L)
      .select(col("id").as("idb"), col("st").as("sb"), col("en").as("eb"))
    val brute = a.join(b, col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture must actually overlap")
    for (band <- Seq(100L, 1000L, 7919L, 1000000L)) {
      val got = Joins.overlapJoin(a, "sa", "ea", b, "sb", "eb", band)
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"band=$band emitted duplicates")
      assert(got.toSet === brute, s"band=$band")
    }
  }

  test("overlapJoin handles negative times (pre-epoch) exactly") {
    val a = randomIntervals(60, seed = 3, origin = -50000L)
      .select(col("id").as("ida"), col("st").as("sa"), col("en").as("ea"))
    val b = randomIntervals(60, seed = 4, origin = -45000L)
      .select(col("id").as("idb"), col("st").as("sb"), col("en").as("eb"))
    val brute = a.join(b, col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Joins.overlapJoin(a, "sa", "ea", b, "sb", "eb", 997L)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size && got.toSet === brute)
  }

  test("overlapJoin self-join with an ordering cond emits each pair once") {
    val iv = randomIntervals(100, seed = 5, origin = 0L)
    val a = iv.select(col("id").as("ida"), col("st").as("sa"), col("en").as("ea"))
    val b = iv.select(col("id").as("idb"), col("st").as("sb"), col("en").as("eb"))
    val got = Joins.overlapJoin(a, "sa", "ea", b, "sb", "eb", 1000L,
        cond = col("ida") < col("idb"))
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size)
    assert(got.forall { case (x, y) => x < y }, "cond must prune the mirror")
    val brute = a.join(b, col("sa") <= col("eb") && col("sb") <= col("ea")
        && col("ida") < col("idb"))
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === brute)
  }

  test("overlapJoin result is invariant under repartitioning") {
    val a = randomIntervals(80, seed = 6, origin = 0L)
      .select(col("id").as("ida"), col("st").as("sa"), col("en").as("ea"))
    val b = randomIntervals(80, seed = 7, origin = 1000L)
      .select(col("id").as("idb"), col("st").as("sb"), col("en").as("eb"))
    val one = Joins.overlapJoin(a, "sa", "ea", b, "sb", "eb", 500L)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = Joins.overlapJoin(a.repartition(17), "sa", "ea",
        b.repartition(3), "sb", "eb", 500L)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one === two)
  }

  test("overlapJoin plans an equi-join on the band — never a nested loop") {
    val a = randomIntervals(50, seed = 9, origin = 0L)
      .select(col("id").as("ida"), col("st").as("sa"), col("en").as("ea"))
    val b = randomIntervals(50, seed = 10, origin = 0L)
      .select(col("id").as("idb"), col("st").as("sb"), col("en").as("eb"))
    val plan = Joins.overlapJoin(a, "sa", "ea", b, "sb", "eb", 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"banded overlap must not fall back to a product join:\n$plan")
  }

  test("overlapJoin refuses colliding column names") {
    val iv = randomIntervals(5, seed = 8, origin = 0L)
    val ex = intercept[IllegalArgumentException] {
      Joins.overlapJoin(iv, "st", "en", iv, "st", "en", 100L)
    }
    assert(ex.getMessage.contains("disjoint"))
  }

  test("overlapJoin fails loudly on inverted and runaway intervals") {
    val s = spark
    import s.implicits._
    val good = Seq((1L, 0L, 500L)).toDF("ida", "sa", "ea")
    val inverted = Seq((2L, 1000L, 10L)).toDF("idb", "sb", "eb")
    val ex1 = intercept[Exception] {
      Joins.overlapJoin(good, "sa", "ea", inverted, "sb", "eb", 100L).collect()
    }
    assert(ex1.getMessage.contains("overlapJoin") ||
      Option(ex1.getCause).exists(_.getMessage.contains("overlapJoin")))
    val runaway = Seq((3L, 0L, 1000000L)).toDF("idb", "sb", "eb")
    val ex2 = intercept[Exception] {
      Joins.overlapJoin(good, "sa", "ea", runaway, "sb", "eb", 100L,
        maxBands = 10).collect()
    }
    assert(ex2.getMessage.contains("overlapJoin") ||
      Option(ex2.getCause).exists(_.getMessage.contains("overlapJoin")))
  }

  test("overlapJoin bands exactly match the streaming tier's floorDiv on negatives") {
    // -150..-50 with band 100: floorDiv gives bands -2..-1; a truncating
    // div would give -1..0 and could desync the canonical emission band
    val s = spark
    import s.implicits._
    val a = Seq((1L, -150L, -50L)).toDF("ida", "sa", "ea")
    val b = Seq((2L, -160L, -140L)).toDF("idb", "sb", "eb")
    val got = Joins.overlapJoin(a, "sa", "ea", b, "sb", "eb", 100L)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("joinSizeProbe reports exact pair counts, heaviest first") {
    val (fact, dim) = fixture
    // self-probe: hot × hot = 900² dominates; unmatched keys absent
    val r = Joins.joinSizeProbe(fact, fact, "k", k = 10).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.head === (("hot", 900L, 900L, 810000L)))
    assert(r.map(_._1).toSet === Set("hot", "cold0", "cold1", "cold2"))
    // cross-probe against the dim: counts are (n_fact, 1); ties on
    // n_pairs break by key ascending
    val d = Joins.joinSizeProbe(fact, dim, "k", k = 10).collect()
      .map(x => (x.getString(0), x.getLong(3)))
    // cold1 holds 34 fact rows (i ≡ 10 mod 30 hits once more in 1..1000),
    // cold0/cold2 hold 33 each — the 33-tie breaks by key ascending
    assert(d.toSeq === Seq(("hot", 900L), ("cold1", 34L),
      ("cold0", 33L), ("cold2", 33L)))
  }

  test("partitionBalance: exact counts, skew ratio flags the hot layout") {
    val (fact, _) = fixture
    val r = Joins.partitionBalance(fact, "k", nParts = 4).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.values.map(_._1).sum === 1000L, "every row lands somewhere")
    // "hot" (900 rows) hashes to ONE partition: its skew ≥ 900·4e6/1000
    assert(r.values.map(_._2).max >= 3600000L)
    // uniform layout on unique ids stays near skew 1e6
    val u = Joins.partitionBalance(fact.select(col("id")), "id", nParts = 4)
      .collect().map(_.getLong(2))
    assert(u.forall(s => s > 700000L && s < 1300000L))
  }
}
