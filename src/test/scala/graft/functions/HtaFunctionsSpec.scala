package graft.functions

import graft.SparkSpec
import graft.hta.AggOps

/** The SQL UDAF must agree bit-for-bit with the column-expression monoid. */
class HtaFunctionsSpec extends SparkSpec {

  test("hta_merge over level rows == mergeAggCols") {
    HtaFunctions.register(spark)
    val lvl = AggOps.levelBuild(fixtureDf, 10 * S)
    lvl.createOrReplaceTempView("lvl10")
    val viaSql = spark.sql(
      """SELECT metric, hta_merge(minimum, maximum, sum, count,
        |                         integral, active_time) AS a
        |FROM lvl10 GROUP BY metric""".stripMargin)
      .selectExpr("metric", "a.minimum", "a.maximum", "a.sum", "a.count",
        "a.integral", "a.active_time")
      .collect().head
    val viaCols = lvl.groupBy("metric")
      .agg(AggOps.mergeAggCols.head, AggOps.mergeAggCols.tail: _*)
      .select("metric", "minimum", "maximum", "sum", "count",
        "integral", "active_time") // UDAF carries the 6 HTA fields only
      .collect().head
    assert(viaSql === viaCols)
  }

  test("interval_begin/interval_end SQL helpers align to the epoch grid") {
    HtaFunctions.register(spark)
    val r = spark.sql(
      s"SELECT interval_begin(${tp(17)}, ${10 * S}) b, interval_end(${tp(17)}, ${10 * S}) e")
      .collect().head
    assert(r.getLong(0) === tp(10))
    assert(r.getLong(1) === tp(20))
  }
}
