package graft.model

/** Core data model of the HTA (hierarchical timeline aggregation) engine.
  *
  * Semantics derived from the reference (metricq/hta):
  *  - raw sample: (metric, time ns, value)            [include/hta/types.hpp:43-49]
  *  - Aggregate: (min, max, sum, count, integral, active_time) — a commutative
  *    monoid under element-wise merge                  [include/hta/types.hpp:56-92]
  *  - time is int64 POSIX nanoseconds; never TimestampType (µs) — boundary
  *    semantics are ns-exact                           [include/hta/chrono.hpp:38]
  */
object Cols {
  val Metric = "metric"
  val Time = "time"
  val Value = "value"
  val Interval = "interval"
  val Minimum = "minimum"
  val Maximum = "maximum"
  val Sum = "sum"
  val Count = "count"
  val Integral = "integral"
  val ActiveTime = "active_time"

  /** The six Aggregate fields, in canonical order. */
  val AggFields: Seq[String] = Seq(Minimum, Maximum, Sum, Count, Integral, ActiveTime)
}

/** Interval scope boundary modes (reference include/hta/types.hpp:129-142).
  *
  *  - Closed:   include a point exactly on the border.
  *  - Open:     exclude the border point.
  *  - Extended: include the border point plus one more on/past the border
  *              (last point at-or-before `begin`; first point at-or-after `end`).
  *  - Infinity: unbounded on that side.
  */
sealed trait Scope
object Scope {
  case object Closed extends Scope
  case object Open extends Scope
  case object Extended extends Scope
  case object Infinity extends Scope
  val all: Seq[Scope] = Seq(Closed, Open, Extended, Infinity)
  def named(s: String): Scope = s match {
    case "closed" => Closed
    case "open" => Open
    case "extended" => Extended
    case "infinity" => Infinity
    case other => throw new IllegalArgumentException(s"unknown scope: $other")
  }
  def name(s: Scope): String = s match {
    case Closed => "closed"
    case Open => "open"
    case Extended => "extended"
    case Infinity => "infinity"
  }
}

final case class IntervalScope(begin: Scope, end: Scope)
object IntervalScope {
  /** Default of the reference's Row-returning retrieve()/retrieve_flex()
    * (metric.hpp:126-134). */
  val retrieveDefault: IntervalScope = IntervalScope(Scope.Extended, Scope.Open)
  /** Default of raw TimeValue retrieve() and count() (metric.hpp:129-130,139-140);
    * also the scope aggregate_raw uses internally (metric.cpp:116). */
  val rawDefault: IntervalScope = IntervalScope(Scope.Closed, Scope.Extended)
  /** Scope of closed-interval level reads in aggregate_interval (metric.cpp:147). */
  val levelRun: IntervalScope = IntervalScope(Scope.Closed, Scope.Open)
}

/** Per-metric aggregation parameters (reference include/hta/meta.hpp:41-54,
  * validation src/meta.cpp:54-67). Intervals in ns.
  */
final case class Meta(
    intervalMin: Long = 10L * 1000000000L,
    intervalMax: Long = 365L * 24L * 3600L * 1000000000L,
    intervalFactor: Long = 10L) {
  require(intervalFactor >= 2,
    s"interval_factor must be >= 2, got $intervalFactor")
  require(intervalMin > 0, s"interval_min must be positive, got $intervalMin")
  require(intervalMin % intervalFactor == 0,
    s"interval_min ($intervalMin) must be divisible by interval_factor ($intervalFactor)")
  require(intervalMax >= intervalMin,
    s"interval_max ($intervalMax) must be >= interval_min ($intervalMin)")

  /** Geometric ladder of level intervals: interval_min * factor^k <= interval_max,
    * overflow-safe (reference include/hta/metric.hpp:74-92). */
  def levelIntervals: Seq[Long] = {
    val b = Seq.newBuilder[Long]
    var i = intervalMin
    var ok = true
    while (ok && i <= intervalMax) {
      b += i
      try { i = Math.multiplyExact(i, intervalFactor) }
      catch { case _: ArithmeticException => ok = false }
    }
    b.result()
  }
}

/** A raw time-series sample. */
final case class TimeValue(metric: String, time: Long, value: Double)

/** One closed interval of one level (or one query-result row). */
final case class AggRow(
    metric: String,
    interval: Long,
    time: Long,
    minimum: Double,
    maximum: Double,
    sum: Double,
    count: Long,
    integral: Double,
    active_time: Long)
