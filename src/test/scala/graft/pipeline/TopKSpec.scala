package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  // heavy-tailed: group "hot" carries 90% of rows
  private def fixture = {
    val s = spark
    import s.implicits._
    (1L to 1000L).map(i =>
      (if (i % 10 == 0) s"cold${i % 3}" else "hot", i, (i * 37) % 211))
      .toDF("grp", "id", "score")
  }

  test("perKeyTopK equals the single-window selection at any salt count") {
    val df = fixture
    val order = Seq(desc("score"), asc("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(order: _*)
    val truth = df.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    for (salts <- Seq(1, 4, 32)) {
      val got = TopK.perKeyTopK(df, Seq("grp"), order, k = 5,
          saltBy = col("id"), salts = salts)
        .select("grp", "id", "score", "rnk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === truth, s"salts=$salts")
    }
  }

  test("perKeyTopK survives k larger than a group and is repartition-stable") {
    val df = fixture
    val order = Seq(desc("score"), asc("id"))
    val out = TopK.perKeyTopK(df, Seq("grp"), order, k = 50,
      saltBy = col("id"), salts = 8)
    // cold groups have ~33 rows each: all kept, ranked densely from 1
    val cold = out.where(col("grp") === "cold0")
      .orderBy("rnk").collect().map(_.getAs[Long]("rnk"))
    assert(cold.head === 1L && cold.toSeq === (1L to cold.length).toSeq)
    val re = TopK.perKeyTopK(df.repartition(13), Seq("grp"), order, k = 50,
        saltBy = col("id"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val base = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(re === base)
  }

  test("the global phase partitions on the bare key over survivor rows only") {
    val df = fixture
    val plan = TopK.perKeyTopK(df, Seq("grp"), Seq(desc("score"), asc("id")),
        k = 5, saltBy = col("id"), salts = 8)
      .queryExecution.executedPlan.toString
    // two window exchanges: (grp, _salt) local then grp global
    assert(plan.contains("hashpartitioning(grp, _salt") ||
      plan.contains("hashpartitioning(grp#") && plan.contains("_salt"))
    assert(plan.contains("Window"))
  }
}
