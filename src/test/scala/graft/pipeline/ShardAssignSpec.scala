package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Balanced shard assignment over the deterministic shuffle order. */
class ShardAssignSpec extends SparkSpec {

  private def mkIds(n: Int) = spark.createDataFrame(
    java.util.Arrays.asList((0 until n).map(i => Row(i.toLong * 31 + 7)): _*),
    StructType(Seq(StructField("doc_id", LongType, nullable = false))))

  private def collect(n: Int, shards: Int, salt: String = "") =
    Sampling.shardAssign(mkIds(n), "doc_id", shards, salt)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)

  test("shards are contiguous, balanced, and internally 0-based") {
    for ((n, s) <- Seq((10, 3), (21, 7), (5, 5), (6, 4), (100, 1))) {
      val rows = collect(n, s)
      val sizes = rows.groupBy(_._3).map { case (k, v) => k -> v.length }
      assert(sizes.values.max - sizes.values.min <= 1, s"n=$n s=$s sizes")
      assert(sizes.keys.toSeq.sorted == (0L until
        math.min(s, n).toLong), s"n=$n s=$s ids")
      // contiguous in shuffle order; pos_in_shard counts 0.. within shard
      rows.groupBy(_._3).foreach { case (k, v) =>
        val ps = v.sortBy(_._2)
        assert(ps.map(_._4).toSeq == ps.indices.map(_.toLong), s"shard $k")
        assert(ps.map(_._2).toSeq == (ps.head._2 to ps.last._2), s"shard $k")
      }
      // staircase formula replica
      rows.foreach { case (_, pos, sid, _) =>
        assert(sid == pos * s / n, s"n=$n s=$s pos=$pos")
      }
    }
  }

  test("salt changes the permutation, not the shard sizes") {
    val a = collect(40, 5, "ep1")
    val b = collect(40, 5, "ep2")
    assert(a.map(t => (t._1, t._2)).toMap != b.map(t => (t._1, t._2)).toMap)
    assert(a.groupBy(_._3).view.mapValues(_.length).toMap ==
      b.groupBy(_._3).view.mapValues(_.length).toMap)
  }

  test("repartition-invariant; more shards than rows; overflow guard") {
    val base = collect(17, 4)
    val re = Sampling.shardAssign(mkIds(17).repartition(5), "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._2)
    assert(re.toSeq == base.toSeq)
    val wide = collect(3, 9)
    assert(wide.map(_._3).distinct.length == 3) // 3 non-empty shards
    assert(wide.forall(_._4 == 0L))
    intercept[IllegalArgumentException] {
      Sampling.shardAssign(mkIds(1), "doc_id", 0)
    }
  }
}
