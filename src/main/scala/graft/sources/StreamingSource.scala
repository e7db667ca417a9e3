package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.DataStreamReader

/**
 * A configured streaming source: a format name plus a 3-tier,
 * prefix-namespaced option resolution that produces a ready
 * `spark.readStream.options(...).format(fmt)` reader.
 *
 * Resolution tiers, highest priority first (spec:
 * `/root/reference/src/pyspark_streaming_base/sources/streaming_source.py:53-143`,
 * `docs/overview.md:23-26`):
 *   1. direct config map passed at construction — its `spark.*` keys are
 *      applied to the session RuntimeConf, then read back (the reference
 *      implements tier-1 *as* a write-through to tier-2);
 *   2. session RuntimeConf at `{configPrefix}.{format}.options.{name}`;
 *   3. the source's hardcoded defaults (the curated production values — these
 *      ARE the packaged domain knowledge).
 * An empty-string conf value counts as unset (`sources/delta_source.py:104-108`).
 *
 * Divergence from the reference: options are resolved into per-call immutable
 * maps. The reference kept a class-level mutable dict shared across instances
 * (`sources/streaming_source.py:28`), which leaks options between sources; we
 * deliberately do not reproduce that.
 */
abstract class StreamingSource {

  /** Spark DataSource format name, e.g. "kafka", "delta", "parquet". */
  def format: String

  /** Namespace root, e.g. "spark.app.source" (or "spark.app.source2" ...). */
  def basePrefix: String

  /** Direct (tier-1) config. */
  def config: Map[String, String]

  /** Option name → default value (None = unset, omitted from options). */
  def defaults: Map[String, Option[String]]

  /** e.g. `spark.app.source.delta` */
  final def configPrefix: String = s"$basePrefix.$format"

  /** e.g. `spark.app.source.delta.options` */
  final def configOptionsPrefix: String = s"$configPrefix.options"

  /** Write the direct config's `spark.*` keys into the session conf (tier-1 →
    * tier-2 write-through, `sources/streaming_source.py:104-117`). */
  final def applyConfig(spark: SparkSession): Unit =
    config.foreach { case (k, v) => if (k.startsWith("spark.")) spark.conf.set(k, v) }

  /** Tier 2-vs-3 resolution for one option (`sources/delta_source.py:92-108`). */
  protected final def getOrDefault(spark: SparkSession, name: String): Option[String] = {
    val v = spark.conf.get(s"$configOptionsPrefix.$name", "")
    if (v != null && v.nonEmpty) Some(v) else defaults.getOrElse(name, None)
  }

  /** Fully resolved options including unset ones. Subclasses override to add
    * source-specific resolution (e.g. Kafka's `{prefix}.topic` → subscribe). */
  def resolveOptions(spark: SparkSession): Map[String, Option[String]] = {
    applyConfig(spark)
    defaults.keys.map(k => k -> getOrDefault(spark, k)).toMap
  }

  /** The option map handed to the reader: resolved, unset entries dropped. */
  final def options(spark: SparkSession): Map[String, String] =
    resolveOptions(spark).collect { case (k, Some(v)) => k -> v }

  /** `spark.readStream.options(opts).format(fmt)` (`streaming_source.py:33-51`). */
  def generate(spark: SparkSession): DataStreamReader =
    spark.readStream.options(options(spark)).format(format)
}
