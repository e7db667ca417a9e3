package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StructType

/**
 * File (parquet) streaming source — the runnable, connector-free
 * specialization used for end-to-end streaming paths in this offline build
 * (SURVEY §7.4). Plays the role the Delta source plays in the reference
 * pipeline (`/root/reference/src/pyspark_streaming_base/sources/delta_source.py`),
 * built on Spark's native file stream source, which provides exactly-once
 * semantics through the checkpointed file log.
 *
 * `maxFilesPerTrigger` default mirrors the Delta source's micro-batch
 * admission default (`delta_source.py:10`). Spark's file source requires an
 * explicit schema for streaming reads; pass it via `schema`.
 */
final case class FileStreamingSource(
    configPrefixOpt: Option[String] = None,
    config: Map[String, String] = Map.empty,
    session: Option[SparkSession] = None,
    schema: Option[StructType] = None,
    fileFormat: String = "parquet") extends StreamingSource {

  override def format: String = fileFormat
  override def basePrefix: String = configPrefixOpt.getOrElse("spark.app.source")

  override val defaults: Map[String, Option[String]] = Map(
    "maxFilesPerTrigger" -> Some("1"),
    "latestFirst" -> Some("false"),
    "maxFileAge" -> None,
    "path" -> None,
  )

  override def generate(spark: SparkSession): DataStreamReader = {
    val reader = super.generate(spark)
    schema.fold(reader)(reader.schema)
  }

  def options(): Map[String, String] =
    options(session.getOrElse(SparkSession.active))
}
