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
}
