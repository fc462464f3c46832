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
}
