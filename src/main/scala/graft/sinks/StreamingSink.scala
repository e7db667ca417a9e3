package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/**
 * A configured streaming sink: format plus the same 3-tier option resolution
 * as [[graft.sources.StreamingSource]], producing a
 * `df.writeStream.options(...).format(fmt)` writer.
 *
 * Spec: `/root/reference/src/pyspark_streaming_base/sinks/streaming_sink.py:6-164`.
 * Base defaults (`streaming_sink.py:15-23`): outputMode=append,
 * queryName="streaming:sink:default", mode=errorIfExists; checkpointLocation,
 * partitionBy, clusterBy, path unset. Default namespace root is
 * `spark.app.sink` (`streaming_sink.py:9`).
 */
abstract class StreamingSink {

  def format: String
  def basePrefix: String
  def config: Map[String, String]
  def defaults: Map[String, Option[String]]

  final def configPrefix: String = s"$basePrefix.$format"
  final def configOptionsPrefix: String = s"$configPrefix.options"

  final def applyConfig(spark: SparkSession): Unit =
    config.foreach { case (k, v) => if (k.startsWith("spark.")) spark.conf.set(k, v) }

  protected final def getOrDefault(spark: SparkSession, name: String): Option[String] = {
    val v = spark.conf.get(s"$configOptionsPrefix.$name", "")
    if (v != null && v.nonEmpty) Some(v) else defaults.getOrElse(name, None)
  }

  def resolveOptions(spark: SparkSession): Map[String, Option[String]] = {
    applyConfig(spark)
    defaults.keys.map(k => k -> getOrDefault(spark, k)).toMap
  }

  final def options(spark: SparkSession): Map[String, String] =
    resolveOptions(spark).collect { case (k, Some(v)) => k -> v }

  /** `df.writeStream.options(opts).format(fmt)` (`streaming_sink.py:126-146`). */
  final def generateWriteStream(df: DataFrame,
                                sOptions: Map[String, String]): DataStreamWriter[Row] =
    df.writeStream.options(sOptions).format(format)

  /** Subclasses narrow which resolved options are forwarded to the writer. */
  def generate(df: DataFrame): DataStreamWriter[Row] =
    generateWriteStream(df, options(df.sparkSession))
}
