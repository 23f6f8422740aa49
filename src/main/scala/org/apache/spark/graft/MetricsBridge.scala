package org.apache.spark.graft

import com.codahale.metrics.MetricRegistry
import org.apache.spark.SparkEnv
import org.apache.spark.metrics.source.Source

/** Bridge into Spark's MetricsSystem: `Source` is `private[spark]`, so
  * external libraries conventionally register sources from an
  * `org.apache.spark` subpackage. */
object MetricsBridge {
  final class NamedSource(override val sourceName: String,
      override val metricRegistry: MetricRegistry) extends Source

  /** Register `registry` under `name` with this JVM's MetricsSystem;
    * false when no Spark runtime is active. */
  def register(name: String, registry: MetricRegistry): Boolean = {
    val env = SparkEnv.get
    if (env == null) false
    else { env.metricsSystem.registerSource(new NamedSource(name, registry)); true }
  }
}
