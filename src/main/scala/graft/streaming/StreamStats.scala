package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming tier of the per-dimension embedding moments
  * ([[graft.pipeline.Ann.embeddingStats]], q128): live whitening stats
  * as vectors land — the encoder-drift monitor a production embedding
  * ingest runs beside its index build.
  *
  * Per-dimension state is FIVE longs (n, Σq, Σq², min, max): the moment
  * vector is its own bounded state, mergeable and replay-idempotent the
  * same way the HLL registers are in [[StreamSketch]] — the key space is
  * the embedding dimensionality, a constant, so state is bounded with no
  * TTL needed (contrast the per-day sketch keys). Quantization mirrors
  * the batch grid digit for digit (`round(x·10⁴)` HALF_UP on the double
  * widening), so streamed rows are BIT-EQUAL to the batch operator on
  * the same data, whatever the micro-batch slicing (spec-pinned).
  * Emission is update-mode: one settled row per dimension per
  * micro-batch that touched it. */
object StreamStats {

  final case class Vec(vec_id: Long, embedding: Seq[Float])
  // NOT private: the state encoder's generated code instantiates it
  final case class Mom(n: Long, sum: Long, sumsq: Long,
                       mn: Long, mx: Long)
  final case class Out(dim: Long, n: Long, sum_q: Long, sumsq_q: Long,
                       min_q: Long, max_q: Long, mean_q: Long)

  /** The batch tier's quantization rule: Spark `round()` is HALF_UP on
    * the BigDecimal of the doubled float — not `Math.round` (which
    * diverges on negative halves). */
  private[streaming] def quant(x: Float): Long =
    java.math.BigDecimal.valueOf(x.toDouble * 10000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  def dimMoments(vecs: Dataset[Vec]): Dataset[Out] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs
      .flatMap(v => v.embedding.iterator.zipWithIndex
        .map { case (x, i) => (i.toLong, quant(x)) })
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (dim: Long, it: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Mom]) =>
          var m = state.getOption.getOrElse(
            Mom(0L, 0L, 0L, Long.MaxValue, Long.MinValue))
          var touched = false
          for ((_, q) <- it) {
            m = Mom(m.n + 1, m.sum + q, m.sumsq + q * q,
              math.min(m.mn, q), math.max(m.mx, q))
            touched = true
          }
          if (!touched) Iterator.empty
          else {
            state.update(m)
            val mean = (m.sum - (((m.sum % m.n) + m.n) % m.n)) / m.n
            Iterator.single(Out(dim, m.n, m.sum, m.sumsq, m.mn, m.mx, mean))
          }
      }
  }
}
