package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join shapes. A plain equi-join shuffles BOTH sides on
  * the join key: when the fact side's key distribution is heavy-tailed
  * (one metric carrying half the events, one hub entity in a log join),
  * every row of a hot key lands in ONE reducer partition and the stage
  * runs at the speed of its slowest straggler — the canonical 1000-executor
  * failure mode that small-SF tests never show. AQE's skew-join split
  * handles sort-merge inputs after the fact; deterministic salting handles
  * it BY CONSTRUCTION, works for any join impl, and composes with
  * bucketed layouts.
  */
object Joins {

  /** Salted equi-join of a skewed fact side against a (non-broadcastable)
    * dim side. The fact side gets a deterministic salt in [0, salts) hashed
    * from `saltBy` — any fact column with spread within a hot key (an event
    * id, a timestamp); the dim side is replicated `salts` ways by an
    * explode. The join key becomes (keys…, salt), so each hot key's rows
    * split across `salts` reducer partitions instead of one.
    *
    * The result set equals the plain equi-join exactly (salt is dropped;
    * every fact row still meets its dim row — the replica with its own
    * salt), so an oracle can check it with the unsalted SQL join.
    *
    * Cost model at scale: dim is scanned once and exploded ×salts
    * (dim-sized × salts shuffle — chosen when dim is too big to broadcast
    * but far smaller than the fact side); fact shuffles once, same bytes
    * as unsalted, just spread over `salts`× the key space. Pick
    * `salts` ≈ (hot-key rows) / (target partition rows). For a
    * BROADCASTABLE dim, skip salting entirely — a broadcast join never
    * shuffles the fact side and has no skew problem (Spark will still
    * choose broadcast here if dim fits; the salt is then harmless).
    *
    * `saltBy` must be non-null on every fact row (null hashes would
    * collapse into one salt; pmod of a null drops the row) — pass a
    * primary-key-ish column.
    *
    * @param fact   big, possibly skewed side
    * @param dim    smaller side, replicated ×salts
    * @param keys   equi-join key columns present on both sides
    * @param salts  salt fan-out (≥ 1)
    * @param saltBy fact-side discriminator column the salt is hashed from
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int, saltBy: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(keys.nonEmpty, "need at least one join key")
    val f = fact.withColumn("_salt",
      pmod(TextOps.md5Long(saltBy.cast("string")), lit(salts.toLong)))
    val dimx = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    f.join(dimx, keys :+ "_salt").drop("_salt")
  }

  /** Banded interval-overlap join: all (a, b) pairs whose closed intervals
    * [aSt, aEn] and [bSt, bEn] intersect, without the cartesian product a
    * naive theta-join `ON a.st <= b.en AND b.st <= a.en` plans (Spark has
    * no native interval index; BroadcastNestedLoop at corpus scale is the
    * textbook 100 TB killer). The interval×interval sibling of
    * [[graft.hta.Queries.intervalJoin]]'s point×interval tiling.
    *
    * The standard banding decomposition instead: each interval explodes
    * over the fixed-width time bands it touches (`band` units wide), the
    * join runs as an EQUI-join on the band — shuffled, partial-pruned,
    * AQE-eligible, everything a theta-join isn't — and the exact overlap
    * predicate filters band-collisions that don't truly intersect. An
    * overlapping pair shares EVERY band that `max(aSt, bSt)` falls in, and
    * only one such band exists, so emitting a pair only when
    * `band == bandOf(max(aSt, bSt))` yields each pair exactly once — no
    * `distinct()` repair shuffle afterwards.
    *
    * Cost at scale: rows explode ×(width/band + 1) — pick `band` at the
    * typical interval width so the blow-up is ~2×; the single shuffle
    * key is the 8-byte band id. Skewed bands (one hot hour) split further
    * under AQE or a caller-side [[saltedJoin]]-style salt on the band.
    *
    * Both inputs must carry DISJOINT column names (pre-alias at the call
    * site); `aSt`/`aEn`/`bSt`/`bEn` are LONG time columns in any ONE unit
    * (ns, µs — whatever the pipeline's clock is; `band` is in the same
    * unit, and timestamps convert via unix_micros at the call site).
    * `cond` prunes the pair space (e.g. a strict id ordering for a
    * self-join — without it a self-join emits both (x,y) and (y,x) plus
    * (x,x)).
    *
    * Bands come from EXACT negative-safe floor division (align down with
    * pmod, then `div` — the [[graft.hta.Queries.intervalJoin]] rendering;
    * never a double `/`, inexact past 2^53 at ns scale), matching the
    * streaming tier's Math.floorDiv digit for digit. A malformed interval
    * (end < start — `sequence(hi, lo)` would silently generate a
    * DESCENDING band list) or one spanning ≥ `maxBands` bands (an
    * unclosed session would otherwise explode without bound) fails the
    * job with raise_error woven into the live explode expression.
    */
  def overlapJoin(a: DataFrame, aSt: String, aEn: String,
                  b: DataFrame, bSt: String, bEn: String,
                  band: Long, cond: Column = lit(true),
                  maxBands: Int = 1000): DataFrame = {
    require(band > 0, s"band must be > 0, got $band")
    require(maxBands >= 1, s"maxBands must be >= 1, got $maxBands")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "overlapJoin inputs must have disjoint column names; alias first")
    def banded(df: DataFrame, st: String, en: String): DataFrame =
      df.withColumn("_sal", col(st) - pmod(col(st), lit(band)))
        .withColumn("_eal", col(en) - pmod(col(en), lit(band)))
        .withColumn("_blo", expr(s"_sal div ${band}L"))
        .withColumn("_bhi", expr(s"_eal div ${band}L"))
        .withColumn("_band", explode(
          when(col(en) >= col(st) && col("_bhi") - col("_blo") < maxBands,
            sequence(col("_blo"), col("_bhi")))
          .otherwise(raise_error(concat(
            lit(s"overlapJoin: malformed (end < start) or > $maxBands-band " +
              s"interval at band=$band: "),
            col(st), lit(".."), col(en))))))
        .drop("_sal", "_eal", "_blo", "_bhi")
    val ax = banded(a, aSt, aEn)
    val bx = banded(b, bSt, bEn)
    val g = greatest(col(aSt), col(bSt))
    val canonicalBand = ax.join(bx, Seq("_band"))
      .withColumn("_cal", g - pmod(g, lit(band)))
      .withColumn("_cband", expr(s"_cal div ${band}L"))
    canonicalBand
      .where(col(aSt) <= col(bEn) && col(bSt) <= col(aEn))
      .where(col("_band") === col("_cband"))
      .where(cond)
      .drop("_band", "_cal", "_cband")
  }

  /** Pre-join output-size probe: the exact per-key pair count a join on
    * `key` would produce, heaviest keys first — the diagnostic every
    * skew incident starts with ("which key explodes?") and the input to
    * choosing a salt factor for [[saltedJoin]]. Runs on per-key COUNTS,
    * never the join itself: two partial-agg groupBys (each shuffle
    * carries one row per distinct key per task) and a key-cardinality-
    * sized equi-join — AQE broadcasts the smaller count table. The
    * heavy-key report is a TakeOrdered (no global sort), deterministic
    * via the (n_pairs desc, key asc) tie-break.
    *
    * @return top-k keys by pair count: (key, n_left, n_right, n_pairs) */
  def joinSizeProbe(left: DataFrame, right: DataFrame, key: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lc = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    lc.join(rc, key)
      .withColumn("n_pairs", col("n_left") * col("n_right"))
      .orderBy(desc("n_pairs"), asc(key)).limit(k)
  }

  /** Partition-balance forecast for a content-hash layout: the per-
    * partition row counts a `pmod(md5(key), n)` partitioning (the
    * house bucketing behind [[graft.pipeline.Sampling.hashBucket]],
    * salting and the epoch shuffle) would produce — run BEFORE the
    * write to see whether a key choice leaves one partition holding
    * the corpus. Reports exact counts plus the skew ratio against the
    * ideal share as the rational `n_rows·n_parts / total` (e6 fixed
    * point — no float aggregation). One partial-agg shuffle carrying
    * n_parts rows per task.
    *
    * @return one row per non-empty partition: (part, n_rows,
    *         skew_e6 = n_rows·n_parts·10⁶ div total) */
  def partitionBalance(df: DataFrame, key: String, nParts: Int): DataFrame = {
    require(nParts >= 1, s"nParts must be >= 1, got $nParts")
    val counts = df
      .select(pmod(TextOps.md5Long(col(key).cast("string")),
        lit(nParts.toLong)).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_rows"))
    // total via a window over the ≤ nParts-row counts frame — a scalar
    // subquery here re-aggregates from a SECOND corpus scan (plan-read)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy("part")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    counts
      .withColumn("_t", sum("n_rows").over(wAll))
      .withColumn("skew_e6",
        expr(s"(n_rows * ${nParts.toLong} * 1000000) div _t"))
      .drop("_t")
  }
}
