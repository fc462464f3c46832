package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tier of the HLL distinct sketch ([[graft.pipeline.Sketches]]
  * q77/q91): live per-(metric, day) approximate distinct counts with the
  * IDENTICAL exact-integer register algebra, so the streamed rows are
  * bit-equal to the batch sketch of the same data (spec-pinned).
  *
  * State per (metric, day) group is the register array itself — 2^p ints,
  * the sketch IS its own bounded state, which is exactly why mergeable
  * sketches are the streaming answer to distinct-count: exact distinct
  * would hold every seen user id. Emission is update-mode and change-only
  * (a micro-batch that raises no register emits nothing), and the
  * register max-merge makes replays idempotent. The md5-hash/rank
  * arithmetic mirrors the batch column expressions digit for digit
  * (md5 hex prefix → 60-bit long, `j = h div 2^(60-p)`,
  * `rank = maxRank − bitlen(w)`), so stream and batch land on the same
  * registers, the same `zi`, and the same two fixed-order IEEE ops for
  * the estimate. */
object StreamSketch {

  final case class Ev(metric: String, time: Long, user: Long)
  final case class DayKey(metric: String, day: Long)
  final case class Regs(mj: Array[Int])
  final case class Out(metric: String, day: Long, zi: Long, zero_regs: Long,
                       est_raw: Double)

  private[streaming] def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** @param stateTtlMs when > 0, a processing-time TTL evicts a day's
    *   register state `stateTtlMs` after its last event — WITHOUT it the
    *   state store grows by one 2^p-int array per (metric, day) forever
    *   (per-key state is bounded; the KEY SPACE is not). The trade: an
    *   event arriving after its day's eviction rebuilds a partial sketch
    *   (registers lost — the same class of loss as a watermark drop);
    *   size the TTL to the late-data horizon. 0 (the default) keeps
    *   every day's state, which is what the bit-parity spec exercises. */
  def dailyDistinct(events: Dataset[Ev], p: Int = 9,
                    dayNs: Long = 86400000000000L,
                    stateTtlMs: Long = 0L): Dataset[Out] = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val spark = events.sparkSession
    import spark.implicits._
    val wBits = 60 - p
    val wMod = 1L << wBits
    val maxRank = wBits + 1
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scale = math.pow(2.0, 2.0 * p + maxRank)
    // `/`, not floorDiv: Spark's `div` truncates toward zero, and the
    // bit-parity contract with the batch tier must hold even for
    // pre-epoch (negative) timestamps
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(e => DayKey(e.metric, e.time / dayNs))
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (k: DayKey, it: Iterator[Ev], state: GroupState[Regs]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val regs = state.getOption.map(_.mj).getOrElse(new Array[Int](m))
          var changed = false
          for (e <- it) {
            val h = md5Long60(e.user.toString)
            val j = (h / wMod).toInt
            val w = h % wMod
            val rank =
              if (w == 0) maxRank
              else maxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
            if (rank > regs(j)) { regs(j) = rank; changed = true }
          }
          // timeout can only be (re)armed on EXISTING state — after the
          // update in the changed branch, directly in the no-change one
          if (!changed && state.exists) {
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            Iterator.empty
          }
          else {
            state.update(Regs(regs))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            var zi = 0L; var zero = 0L; var i = 0
            while (i < m) {
              if (regs(i) == 0) { zero += 1; zi += 1L << maxRank }
              else zi += 1L << (maxRank - regs(i))
              i += 1
            }
            Iterator.single(Out(k.metric, k.day, zi, zero,
              alpha * (scale / zi)))
          }
          }
      }
  }

  // ---- streaming HDR quantiles (the q104 sketch, live) ----

  final case class VSample(metric: String, v: Long)
  // public: the state encoder's generated code instantiates these
  final case class HReg(b: Long, cnt: Long, vmin: Long)
  final case class HRegs(rs: Array[HReg])
  final case class QOut(metric: String, p: Long, q_approx: Long, n: Long)

  /** The batch bucket rule, digit for digit
    * ([[graft.pipeline.Sketches.hdrRegisters]]): identity below
    * 2^(m+1), else `(L−1−m)·2^m + (v >> (L−1−m))` with L = bit
    * length. */
  private[streaming] def hdrBucket(v: Long, m: Int): Long = {
    val lim = 1L << (m + 1)
    if (v < lim) v
    else {
      val L = 64 - java.lang.Long.numberOfLeadingZeros(v)
      (L - 1 - m).toLong * (1L << m) + (v >> (L - 1 - m))
    }
  }

  /** Live per-metric percentiles from streamed samples — the
    * monitoring read ("p99 latency NOW") the batch q104 sketch answers
    * nightly. State per metric is the HDR register table itself
    * (≤ (64−m)·2^m rows, ~1.9k at m = 5): bounded, mergeable,
    * replay-idempotent — the same reason the HLL tier streams well.
    * Bucketing, selection rule (first bucket with `100·cum ≥ n·p`) and
    * the bucket-min answer mirror the batch operator digit for digit,
    * so streamed rows are BIT-EQUAL to batch `hdrQuantiles` over the
    * same samples under any micro-batch slicing (spec-pinned).
    * Negative/invalid samples are dropped exactly as the batch filter
    * drops them. Update-mode: each touched metric re-emits its `ps`
    * rows per micro-batch. */
  def streamingQuantiles(samples: Dataset[VSample], ps: Seq[Int],
                         m: Int = 5): Dataset[QOut] = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100), "ps in [1,100]")
    require(m >= 1 && m <= 20, s"m must be in [1,20], got $m")
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .filter(_.v >= 0L)
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (metric: String, it: Iterator[VSample],
         state: GroupState[HRegs]) =>
          val regs = scala.collection.mutable.Map.empty[Long, (Long, Long)]
          state.getOption.foreach(_.rs.foreach(r =>
            regs(r.b) = (r.cnt, r.vmin)))
          var touched = false
          for (s <- it) {
            val b = hdrBucket(s.v, m)
            val (c, mn) = regs.getOrElse(b, (0L, Long.MaxValue))
            regs(b) = (c + 1, math.min(mn, s.v))
            touched = true
          }
          if (!touched) Iterator.empty
          else {
            state.update(HRegs(regs.toArray.sortBy(_._1)
              .map { case (b, (c, mn)) => HReg(b, c, mn) }))
            val sorted = regs.toArray.sortBy(_._1)
            val n = sorted.map(_._2._1).sum
            ps.iterator.map { p =>
              var cum = 0L
              var ans = Long.MinValue
              var found = false
              for ((_, (c, mn)) <- sorted if !found) {
                cum += c
                if (cum * 100 >= n * p) { ans = mn; found = true }
              }
              QOut(metric, p.toLong, ans, n)
            }
          }
      }
  }

  // ---- streaming Count-Min (the q85 sketch, live) ----

  final case class CmEv(metric: String, v: String)
  // public: the state encoder's generated code instantiates these
  final case class CmRegs(cnt: Array[Long])
  final case class CmOut(metric: String, j: Int, cell: Long, cnt: Long)

  /** Live per-metric Count-Min frequency registers — the hot-key /
    * frequency monitor ("how often is THIS value arriving right now")
    * the batch q85 sketch answers offline. State per metric is the
    * depth×width long register table: bounded by geometry, additive.
    * Addition is order- and slicing-invariant, so the settled register
    * table is BIT-EQUAL to batch [[graft.pipeline.Sketches
    * .countMinRegisters]] over the same rows under any micro-batch
    * slicing (spec-pinned); the hash mirrors the batch column
    * expression digit for digit (`md5Long(v#j) mod width`). Emission is
    * update-mode and touched-cells-only — an upsert changelog of the
    * register table (counts only grow, so latest emission per
    * (metric, j, cell) IS the current count); point estimates are
    * `min_j cnt(j, h_j(v))` exactly as in the batch probe. Unlike the
    * max-merge HLL tier a REPLAYED batch would re-add — exactly-once
    * here is the state checkpoint's guarantee, not idempotence; the
    * changelog consumer must upsert, never sum. */
  def countMin(events: Dataset[CmEv], depth: Int = 4,
               width: Int = 64): Dataset[CmOut] = {
    require(depth >= 1 && width >= 1, s"bad geometry d=$depth w=$width")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (metric: String, it: Iterator[CmEv], state: GroupState[CmRegs]) =>
          val regs = state.getOption.map(_.cnt)
            .getOrElse(new Array[Long](depth * width))
          val touched = scala.collection.mutable.LinkedHashSet.empty[Int]
          for (e <- it if e.v != null; j <- 0 until depth) {
            val cell = (md5Long60(e.v + "#" + j) % width).toInt
            val idx = j * width + cell
            regs(idx) += 1
            touched += idx
          }
          if (touched.isEmpty) Iterator.empty
          else {
            state.update(CmRegs(regs))
            touched.toVector.iterator.map(idx =>
              CmOut(metric, idx / width, (idx % width).toLong, regs(idx)))
          }
      }
  }
}
