package graft.store

import graft.model.Meta

/** S7 — metric catalog with prefix-pattern configs and R/W/RW mode
  * enforcement (reference Directory::operator[] src/directory.cpp:150-171,
  * make_metric :59-84, mode checks src/metric.cpp:73-95).
  *
  * Resolution: exact config name wins; otherwise any config registered as a
  * prefix matches every metric name it string-prefixes (insertion order,
  * like the reference's map iteration). No match → MissingMetricConfig.
  */
final case class MetricConfig(meta: Meta = Meta(), mode: String = "RW",
                              isPrefix: Boolean = false) {
  require(Set("R", "W", "RW").contains(mode), s"invalid mode $mode")
}

final class MissingMetricConfig(name: String)
  extends RuntimeException(s"no settings found to create metric $name")

final class Catalog(configs: Seq[(String, MetricConfig)]) {

  private val exact = configs.filterNot(_._2.isPrefix).toMap
  private val prefixes = configs.filter(_._2.isPrefix)

  /** Resolve a metric name to its config (Directory::operator[]). */
  def resolve(name: String): MetricConfig =
    exact.get(name).orElse(
      prefixes.collectFirst { case (p, c) if name.startsWith(p) => c })
      .getOrElse(throw new MissingMetricConfig(name))

  /** Mode enforcement (src/metric.cpp:73-95). */
  def checkRead(name: String): Unit = {
    val m = resolve(name).mode
    if (!m.contains("R")) throw new IllegalStateException(s"metric $name not readable (mode $m)")
  }
  def checkWrite(name: String): Unit = {
    val m = resolve(name).mode
    if (!m.contains("W")) throw new IllegalStateException(s"metric $name not writable (mode $m)")
  }

  /** All exactly-configured metric names, sorted (O5 flavor). */
  def names: Seq[String] = exact.keys.toSeq.sorted
}
