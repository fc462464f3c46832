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

  test("triangleCounts: K4, pendant, and triangle-free cases") {
    // K4: every vertex sits in C(3,2) = 3 triangles
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = Graph.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // one triangle with a pendant vertex: pendant closes nothing
    val tp = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val out2 = Graph.triangleCounts(tp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // 4-cycle: no triangles at all
    val c4 = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(Graph.triangleCounts(c4).count() === 0L)
  }

  test("triangleCounts is invariant under direction and duplication") {
    val base = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L))
    val messy = edges((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L),
      (4L, 3L), (2L, 4L), (4L, 2L))
    val a = Graph.triangleCounts(base).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.triangleCounts(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("triangleCounts matches driver brute force on a seeded random graph") {
    // deterministic pseudo-random graph: edge (i,j) present iff
    // md5-free LCG hash of the pair lands under p = 0.25
    val n = 30
    def h(i: Int, j: Int): Long = {
      var x = i.toLong * 1000003L + j.toLong * 7919L + 12345L
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
      x & Long.MaxValue
    }
    val es = for {
      i <- 0 until n; j <- (i + 1) until n
      if h(i, j) % 100 < 25
    } yield (i.toLong, j.toLong)
    val adj = es.toSet
    def conn(a: Long, b: Long) = adj.contains((math.min(a, b), math.max(a, b)))
    val brute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (x <- 0 until n; y <- x + 1 until n; z <- y + 1 until n
         if conn(x, y) && conn(y, z) && conn(x, z)) {
      brute(x) += 1; brute(y) += 1; brute(z) += 1
    }
    val got = Graph.triangleCounts(edges(es: _*)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === brute.toMap)
  }

  test("degrees counts directions separately and zero-fills") {
    val out = Graph.degrees(edges((1L, 2L), (1L, 3L), (2L, 1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L, 1L, 3L), (2L, 1L, 1L, 2L), (3L, 0L, 1L, 1L)))
  }

  test("bfsDistances: hand case with an unreachable island and a depth cap") {
    // 1→2→3→4, 1→3 shortcut; {9,10} island; 5 unreachable from 1
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 10L), (5L, 1L))
    val out = Graph.bfsDistances(e, Seq(1L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // depth cap stops the walk
    val capped = Graph.bfsDistances(e, Seq(1L), maxDepth = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
    // multi-source takes the minimum level per vertex
    val multi = Graph.bfsDistances(e, Seq(1L, 9L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      9L -> 0L, 10L -> 1L))
    // a source absent from the graph contributes nothing
    val ghost = Graph.bfsDistances(e, Seq(77L)).count()
    assert(ghost === 0L)
  }

  test("bfsDistances matches driver brute force on a seeded random graph") {
    val rng = new scala.util.Random(41L)
    val es = (0 until 220).map(_ =>
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def bfs(srcs: Seq[Long]): Map[Long, Long] = {
      val dist = scala.collection.mutable.Map(srcs.map(_ -> 0L): _*)
      var frontier = srcs
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .distinct.filterNot(dist.contains)
        frontier.foreach(dist(_) = d)
      }
      dist.toMap
    }
    val vertices = es.flatMap(t => Seq(t._1, t._2)).toSet
    for (srcs <- Seq(Seq(0L), Seq(1L, 7L, 13L))) {
      val truth = bfs(srcs).filter { case (n, _) => vertices.contains(n) }
      val got = Graph.bfsDistances(edges(es: _*), srcs, maxDepth = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === truth, s"sources=$srcs")
    }
  }
}
