package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming tier of the embedding-space decontamination pass
  * ([[graft.pipeline.Ann.epsilonJoin]], q160): score each INCOMING
  * corpus vector against the frozen eval/benchmark set at ingest time,
  * so contaminated rows are flagged before they ever land in the
  * training corpus — the filter-on-ingest twin of the batch sweep.
  *
  * The probe set is static and small by nature (an eval benchmark), so
  * the operator is STATELESS: the quantized probe matrix rides into
  * every task as a broadcast, each arriving vector is scored against
  * all probes with the same integer arithmetic as the batch tier
  * (squared distance on the ×10⁴ grid), and a row is emitted iff some
  * probe sits within `d2max`. No watermark, no state store, exactly-
  * once for free in append mode; per-row cost O(|probes|·dim) — the
  * honest cost of an exact check, same as the batch tier's worst case.
  * Output rows are BIT-EQUAL to the batch operator's on the same data
  * (spec-pinned across micro-batch slicings): `epsilonJoin` settles
  * (n_hits, min_d2) per corpus vector with one partial-agg, and each
  * vector arrives here exactly once.
  *
  * At 100 TB-scale ingest the probe matrix is the only working set —
  * thousands of rows × dim longs; for probe sets too big to broadcast,
  * fall back to periodic batch sweeps with the IVF-pruned exact tier. */
object StreamDecontaminate {

  final case class Vec(vec_id: Long, embedding: Seq[Float])
  final case class Flagged(vec_id: Long, n_hits: Long, min_d2: Long)

  /** One coordinate onto the ×10⁴ grid, bit-identical to the batch
    * tier's `round(x.cast("double") * 10000)`: the product forms in
    * DOUBLE (as Spark's Multiply does), then rounds HALF_UP on the
    * exact binary value of that double (as Spark's Round does). */
  private[streaming] def quantCoord(x: Float): Long =
    new java.math.BigDecimal(x.toDouble * 10000d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Quantize a probe set on the driver (same grid as
    * [[graft.pipeline.Ann.quantize]]). */
  def quantizeProbes(rows: Seq[(Long, Seq[Float])]): Array[Array[Long]] =
    rows.map { case (_, v) => v.map(quantCoord).toArray }.toArray

  def flag(vectors: Dataset[Vec], probes: Array[Array[Long]],
           d2max: Long): Dataset[Flagged] = {
    require(d2max >= 0, s"d2max must be >= 0: $d2max")
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(probes)
    vectors.flatMap { v =>
      val q = new Array[Long](v.embedding.length)
      var i = 0
      while (i < q.length) { q(i) = quantCoord(v.embedding(i)); i += 1 }
      val ps = bc.value
      var hits = 0L; var minD = Long.MaxValue
      var p = 0
      while (p < ps.length) {
        val pv = ps(p)
        var d = 0L; var k = 0
        while (k < q.length) { val t = q(k) - pv(k); d += t * t; k += 1 }
        if (d <= d2max) { hits += 1; if (d < minD) minD = d }
        p += 1
      }
      if (hits > 0) Some(Flagged(v.vec_id, hits, minD)) else None
    }
  }
}
