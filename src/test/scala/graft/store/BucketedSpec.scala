package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join discipline: two tables bucketed on the same key with
  * the same bucket count must join with ZERO shuffle exchanges — the
  * 100 TB shape where corpus-sized sides never re-key. */
class BucketedSpec extends SparkSpec {

  test("co-bucketed equi-join runs with zero exchanges and exact results") {
    val s = spark
    import s.implicits._
    val left = (0L until 500L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val right = (0L until 500L by 2L).map(i => (i, i * 10)).toDF("doc_id", "score")
    val dir = tmpDir("bucketed")
    Bucketed.write(left, "bspec_left", s"$dir/left", "doc_id", 8)
    Bucketed.write(right, "bspec_right", s"$dir/right", "doc_id", 8)
    // at test sizes AQE would broadcast the small side (its own kind of
    // exchange); force the sort-merge path the layout exists for — at
    // corpus scale neither side broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.table(spark, "bspec_left")
        .join(Bucketed.table(spark, "bspec_right"), "doc_id")
      val rows = joined.collect()
      assert(rows.length === 250)
      assert(rows.forall(r => r.getLong(r.fieldIndex("score")) ===
        r.getLong(r.fieldIndex("doc_id")) * 10))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan should be bucketed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketed.drop(spark, "bspec_left")
      Bucketed.drop(spark, "bspec_right")
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val s = spark
    import s.implicits._
    val df = (0L until 300L).map(i => (i % 40, i)).toDF("doc_id", "v")
    val dir = tmpDir("bucketed-agg")
    Bucketed.write(df, "bspec_agg", s"$dir/t", "doc_id", 4)
    try {
      val agg = Bucketed.table(spark, "bspec_agg")
        .groupBy("doc_id").agg(sum("v").as("sv"))
      val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val truth = (0L until 300L).groupBy(_ % 40)
        .map { case (k, vs) => k -> vs.sum }
      assert(got === truth)
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally Bucketed.drop(spark, "bspec_agg")
  }
}
