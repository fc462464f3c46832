package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Sequence packing for LLM training: concatenate documents in a
  * deterministic order and cut the token stream into fixed-budget training
  * sequences (the standard concat-and-chunk scheme — documents may straddle
  * a sequence boundary). Each document is tagged with the sequence id and
  * intra-sequence offset where it starts.
  *
  * The core is a GLOBAL prefix sum over the corpus, computed WITHOUT a
  * global window (a single-partition window over 100 TB is the canonical
  * scale-killer). The decomposition is the textbook two-pass scheme —
  * per-range partial sums, then a driver-side prefix over the (tiny) range
  * totals, broadcast back — but the ranges are NOT a `RangePartitioner`'s:
  * its cut points are sampled with an RDD-id-derived seed, so two
  * executions of the same plan can place them differently, and any path
  * that re-executes the exchange between the two passes (task retry, cache
  * eviction, executor loss — ROUTINE on a real cluster) would pair pass-1
  * offsets with a different pass-2 partitioning. Instead the cut points are
  * sampled ONCE, collected to the driver, and baked into the plan as
  * LITERALS: every row's bucket is then a pure function of its key, so any
  * recomputation of any part of either pass lands every row in the same
  * bucket, always. No cache is needed for correctness (and none is taken —
  * nothing is pinned; the narrow two-column base is simply scanned twice,
  * the price of a deterministic two-pass algorithm).
  */
object Packing {

  /** Total driver-side key-sample cap for boundary estimation. Boundary
    * quality only affects partition BALANCE, never correctness, so a modest
    * sample is plenty. */
  private val SampleCap = 100000

  /** Orders runtime key values on the driver exactly as Spark's ascending
    * NULLS FIRST sort does for atomic orderable types (numbers, strings,
    * dates, timestamps, decimals). Strings go through UTF8String: Java's
    * String.compareTo is UTF-16 code-UNIT order, which disagrees with
    * Spark's binary (code-point) order when supplementary characters mix
    * with U+E000..U+FFFF — and a cut point sorted under one order but
    * compared under the other (bucketOf's `key <= lit(bound)`) would make
    * bucket ids non-monotone in key order, silently corrupting the global
    * prefix sums. */
  private val keyOrdering: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _)    => -1
      case (_, null)    => 1
      case (x: String, y: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
      case (x: java.lang.Comparable[_], y) =>
        x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
      case _ => throw new IllegalArgumentException(
        s"pack key type ${a.getClass.getName} is not orderable; use an " +
          "atomic comparable key (string/number/date/timestamp)")
    }
  }

  /** Sample ≤[[SampleCap]] keys (fixed per-partition reservoir seeds, so the
    * sketch itself is reproducible), weight each sample by the rows it
    * represents (uneven input partitions must not skew the cuts), and pick
    * `numBuckets-1` evenly-weighted cut points. Returned values become plan
    * literals — after this one collect, nothing about bucketing is ever
    * recomputed from data. */
  private[pipeline] def sampleBoundaries(base: DataFrame, key: String,
                                         numBuckets: Int): IndexedSeq[Any] = {
    if (numBuckets <= 1) return Vector.empty
    val rdd = base.select(key).rdd
    val nParts = rdd.getNumPartitions
    if (nParts == 0) return Vector.empty
    val perPart = math.max(20, SampleCap / nParts)
    val sketches = rdd.mapPartitionsWithIndex { (pid, it) =>
      val rng = new java.util.Random(0x5DEECE66DL ^ (pid * 0x9E3779B97F4A7C15L))
      val res = new scala.collection.mutable.ArrayBuffer[Any](perPart)
      var n = 0L
      while (it.hasNext) {
        val v = it.next().get(0)
        if (n < perPart) res += v
        else { // reservoir: keep each of the n+1 rows with equal probability
          val j = (rng.nextDouble() * (n + 1)).toLong
          if (j < perPart) res(j.toInt) = v
        }
        n += 1
      }
      Iterator.single((n, res.toArray))
    }.collect()
    val weighted = sketches.flatMap { case (n, arr) =>
      if (arr.isEmpty) Array.empty[(Any, Double)]
      else arr.map(v => (v, n.toDouble / arr.length))
    }
    if (weighted.isEmpty) return Vector.empty
    val sorted = weighted.sortBy(_._1)(keyOrdering)
    val step = sorted.iterator.map(_._2).sum / numBuckets
    val bounds = Vector.newBuilder[Any]
    var cw = 0.0
    var target = step
    var picked = 0
    var prev: Any = null
    var havePrev = false
    for ((v, w) <- sorted if picked < numBuckets - 1) {
      cw += w
      // skip duplicate cut values (heavy keys) — an empty bucket is harmless
      if (cw >= target && (!havePrev || keyOrdering.compare(v, prev) > 0)) {
        bounds += v; prev = v; havePrev = true; picked += 1
        target += step
      }
    }
    bounds.result()
  }

  /** Bucket id as a PURE, order-preserving function of the key: a balanced
    * `when`-tree binary search over the literal cut points (O(log k) per
    * row, codegen-friendly). Keys equal to a cut go to the lower bucket;
    * NULL keys to bucket 0 (Spark's NULLS FIRST ascending order). */
  private[pipeline] def bucketOf(key: Column, bounds: IndexedSeq[Any]): Column = {
    if (bounds.isEmpty) return lit(0)
    // tree(lo, hi) decides buckets in [lo, hi]; bucket i is separated from
    // i+1 by bounds(i)
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(key <= lit(bounds(mid)), tree(lo, mid)).otherwise(tree(mid + 1, hi))
      }
    when(key.isNull, lit(0)).otherwise(tree(0, bounds.length))
  }

  /** Tag each doc with (n_tokens, seq_id, seq_offset) under concat-and-chunk
    * packing at `budget` tokens per sequence, in ascending `key` order.
    * A null text (or null token count) packs as 0 tokens. The key must be a
    * total order (unique, atomic, comparable) for the packing to be
    * well-defined — doc ids are.
    *
    * Plan shape: one narrow scan for the cut-point sample, one scan with
    * MAP-SIDE partial aggregation for the per-bucket totals (≤`numBuckets`
    * rows ever cross the wire — no corpus shuffle in pass 1), then ONE
    * corpus shuffle into the deterministic buckets for the sorted
    * partition-local fold, plus a broadcast join against the
    * `numBuckets`-row offset table. `numBuckets` defaults to the session's
    * shuffle partitions; raise it on a real cluster so each bucket's sort
    * fits an executor. */
  def packSequences(docs: DataFrame, budget: Long, key: String = "doc_id",
                    nTokens: Column => Column =
                      t => size(TextOps.tokens(t)).cast("long"),
                    text: String = "text",
                    numBuckets: Int = 0): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val spark = docs.sparkSession
    val k =
      if (numBuckets > 0) numBuckets
      else spark.sessionState.conf.numShufflePartitions
    val base = docs
      .select(col(key), coalesce(nTokens(col(text)), lit(0L)).as("n_tokens"))
    val bounds = sampleBoundaries(base, key, k)
    val bucket = bucketOf(col(key), bounds)
    // Pass 1: per-bucket totals. groupBy on the bucket expression partial-
    // aggregates before its exchange, so only ≤k rows shuffle; collecting k
    // rows to the driver is the whole point of the decomposition.
    val totals = base.groupBy(bucket.as("_bucket"))
      .agg(sum("n_tokens").as("_total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix over bucket totals in bucket (= key-range) order;
    // buckets absent from `totals` were empty and contribute nothing
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _)).toSeq
    import spark.implicits._
    val offDf = offsets.toDF("_bucket", "_offset")
    // Pass 2: shuffle each row to its (literal-determined) bucket, sort
    // within partitions by (bucket, key), and run the running sum as a
    // NARROW mapPartitions fold that resets at bucket changes — not a
    // window (a Window over _bucket would re-shuffle the corpus it cannot
    // see is already bucket-partitioned), and reset-on-change keeps the
    // fold correct even if AQE coalesces several buckets into one task.
    val bucketed = base.withColumn("_bucket", bucket)
      .repartition(k, col("_bucket"))
      .sortWithinPartitions(col("_bucket"), col(key))
    val outSchema = StructType(base.schema.fields ++ Seq(
      StructField("_bucket", IntegerType, nullable = false),
      StructField("_cum_local", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val local = bucketed.mapPartitions { it =>
      var cur = Int.MinValue
      var cum = 0L
      it.map { r =>
        val b = r.getInt(2)
        if (b != cur) { cur = b; cum = 0L }
        val n = r.getLong(1)
        val out = Row(r.get(0), n, b, cum)
        cum += n
        out
      }
    }(enc)
    local.join(broadcast(offDf), "_bucket")
      .withColumn("cum_before", col("_offset") + col("_cum_local"))
      .withColumn("seq_offset", pmod(col("cum_before"), lit(budget)))
      // ANSI integer division on longs — exact at any corpus size (a double
      // division would start rounding past 2^53 total tokens)
      .withColumn("seq_id", expr(s"cum_before div ${budget}L"))
      .select(col(key), col("n_tokens"), col("seq_id"), col("seq_offset"))
  }
}
