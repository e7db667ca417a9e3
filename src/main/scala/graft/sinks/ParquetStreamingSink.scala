package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Parquet file streaming sink — the runnable, connector-free specialization
 * for this offline build, playing the Delta sink's role (SURVEY §7.4).
 * Spark's file sink provides exactly-once output through its `_spark_metadata`
 * commit log, which covers the idempotency the reference gets from Delta's
 * txnAppId/txnVersion (`/root/reference/src/pyspark_streaming_base/sinks/delta_sink.py:16-20`).
 *
 * `maxRecordsPerFile` (default mirrors `delta_sink.py:27`) is applied as the
 * Spark-native `spark.sql.files.maxRecordsPerFile` writer option, making the
 * file-sizing contract real rather than config-only (the reference asserted
 * the option but never forwarded it — SURVEY §2.1).
 */
final case class ParquetStreamingSink(
    configPrefixOpt: Option[String] = None,
    config: Map[String, String] = Map.empty,
    session: Option[SparkSession] = None) extends StreamingSink {

  override def format: String = "parquet"
  override def basePrefix: String = configPrefixOpt.getOrElse("spark.app.sink")

  override val defaults: Map[String, Option[String]] = Map(
    "checkpointLocation" -> None,
    "outputMode" -> Some("append"),
    "maxRecordsPerFile" -> Some("100000"),
    "partitionBy" -> None,
    "path" -> None,
    "queryName" -> Some("parquet:sink:default"),
  )

  override def generate(df: DataFrame): DataStreamWriter[Row] = {
    val resolved = options(df.sparkSession)
    val forwarded = Seq("checkpointLocation", "path")
      .flatMap(k => resolved.get(k).map(k -> _)).toMap ++
      resolved.get("maxRecordsPerFile").map("maxRecordsPerFile" -> _)
    val writer = generateWriteStream(df, forwarded)
    // partitionBy is a writer METHOD, not an option key: a comma-separated
    // config value becomes hive-style directory partitioning, so downstream
    // batch readers get listing-time partition pruning (asserted in
    // PartitionedSinkSpec). The reference carried the option config-only
    // (streaming_sink.py:19); this applies it, completing what the
    // maxRecordsPerFile forwarding fix started.
    resolved.get("partitionBy").map(_.split(",").map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .fold(writer)(cols => writer.partitionBy(cols.toIndexedSeq: _*))
  }

  def fromDF(df: DataFrame): DataStreamWriter[Row] = generate(df)

  def options(): Map[String, String] =
    options(session.getOrElse(SparkSession.active))
}
