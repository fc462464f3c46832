package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** `graft_might_contain(bloom_bytes, long_value)` — Spark's own codegen'd
  * [[BloomFilterMightContain]] predicate (the engine behind runtime join
  * filters), surfaced as a registered function so DataFrame code can probe
  * an explicitly-built Bloom filter without leaving whole-stage codegen.
  * OSS Spark keeps the expression internal (only the `InjectRuntimeFilter`
  * rule instantiates it); the expression itself requires the filter side
  * to be FOLDABLE, so callers pass the serialized filter as a `lit(bytes)`
  * — exactly how [[graft.pipeline.Dedup.decontaminateBloom]] ships the
  * benchmark-gram filter to every corpus partition. */
object BloomMightContain {
  /** For `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName,
      "graft_might_contain"),
    { children =>
      require(children.length == 2,
        s"graft_might_contain takes 2 arguments, got ${children.length}")
      BloomFilterMightContain(children(0), children(1))
    })
}
