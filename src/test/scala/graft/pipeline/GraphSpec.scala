package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class GraphSpec extends SparkSpec {

  private def edges(es: (Long, Long)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(es.map { case (s, d) => Row(s, d) }: _*),
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))

  // 1 -> 2, 2 -> 1, 1 -> 3. Node 3 is dangling (receives, never sends).
  // Hand-unrolled integer recurrence (scale 1e6, damp 850000, teleport
  // 150000, every division a floor-div):
  //   r0 = (1e6, 1e6, 1e6)
  //   iter1: c = (1e6, 5e5, 5e5)      -> r1 = (1000000, 575000, 575000)
  //   iter2: c = (575000, 5e5, 5e5)   -> r2 = (638750, 575000, 575000)
  test("pageRank matches the hand-computed integer recurrence") {
    val e = edges((1L, 2L), (2L, 1L), (1L, 3L))
    val r1 = Graph.pageRank(e, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(1L -> 1000000L, 2L -> 575000L, 3L -> 575000L))
    val r2 = Graph.pageRank(e, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("pageRank is invariant under duplicated edges (set semantics)") {
    val once = Graph.pageRank(edges((1L, 2L), (2L, 1L), (1L, 3L)), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dup = Graph.pageRank(
      edges((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (1L, 3L)),
      iters = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once === dup)
  }

  test("ranks stay within [teleport, n*scale] and every vertex appears") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 1L))
    val out = Graph.pageRank(e, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // node 5 has no in-edges: exactly the teleport term every round
    assert(out(5L) === 150000L)
    assert(out.values.forall(r => r >= 150000L && r <= 5L * 1000000L))
  }

  test("degrees counts directions separately and zero-fills") {
    val out = Graph.degrees(edges((1L, 2L), (1L, 3L), (2L, 1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L, 1L, 3L), (2L, 1L, 1L, 2L), (3L, 0L, 1L, 1L)))
  }
}
