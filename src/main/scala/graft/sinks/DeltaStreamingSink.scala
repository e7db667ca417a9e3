package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Delta Lake streaming sink with the curated production option set.
 *
 * Option names/defaults are the spec from
 * `/root/reference/src/pyspark_streaming_base/sinks/delta_sink.py:13-37`:
 * outputMode=append, mergeSchema=false ("prevent bad changes from
 * automatically propagating"), maxRecordsPerFile=100000,
 * queryName="delta:sink:default", autoCompact.enabled=true,
 * autoCompact.minNumFiles=10, optimizeWrite.enabled=true; txnAppId/txnVersion
 * (idempotent writes), userMetadata, checkpointLocation, path unset.
 *
 * `generate(df)` forwards only `{checkpointLocation, mergeSchema, path}` to
 * the writer (`delta_sink.py:91-101`); callers read the remaining resolved
 * options back via `options()` and apply them as writer decorations
 * (queryName/outputMode/trigger), exactly like the reference E2E flow
 * (`tests/test_delta_end_to_end.py:76-81`).
 *
 * Managed-table name resolution mirrors the source
 * (`delta_sink.py:50-62`). Requires the Delta connector jars at runtime;
 * [[ParquetStreamingSink]] is the offline runnable specialization.
 */
final case class DeltaStreamingSink(
    configPrefixOpt: Option[String] = None,
    config: Map[String, String] = Map.empty,
    session: Option[SparkSession] = None) extends StreamingSink {

  override def format: String = "delta"
  override def basePrefix: String = configPrefixOpt.getOrElse("spark.app.sink")

  override val defaults: Map[String, Option[String]] = Map(
    "checkpointLocation" -> None,
    "outputMode" -> Some("append"),
    "txnAppId" -> None,
    "txnVersion" -> None,
    "mergeSchema" -> Some("false"),
    "maxRecordsPerFile" -> Some("100000"),
    "partitionBy" -> None,
    "clusterBy" -> None,
    "userMetadata" -> None,
    "path" -> None,
    "queryName" -> Some("delta:sink:default"),
    "spark.databricks.delta.autoCompact.enabled" -> Some("true"),
    "spark.databricks.delta.autoCompact.minNumFiles" -> Some("10"),
    "spark.databricks.delta.optimizeWrite.enabled" -> Some("true"),
  )

  def configPrefixForTable: String = s"$configPrefix.table"

  def tableName(spark: SparkSession): String = {
    def part(k: String) = Option(spark.conf.get(s"$configPrefixForTable.$k", null)).filter(_.nonEmpty)
    val parts = Seq(part("catalog"), part("databaseOrSchema"), part("tableName"))
    if (parts.forall(_.isEmpty))
      throw new IllegalArgumentException(s"Missing configuration for $configPrefixForTable")
    parts.flatten.mkString(".")
  }

  override def generate(df: DataFrame): DataStreamWriter[Row] = {
    val resolved = options(df.sparkSession)
    val forwarded = Seq("checkpointLocation", "mergeSchema", "path")
      .flatMap(k => resolved.get(k).map(k -> _)).toMap
    val writer = generateWriteStream(df, forwarded)
    // partitionBy/clusterBy are writer METHODS, not option keys — the
    // reference held them config-only (streaming_sink.py:19-20); applying
    // them makes the layout contract real (same beyond-parity treatment as
    // maxRecordsPerFile on the parquet specialization).
    def cols(k: String): Option[Seq[String]] =
      resolved.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq)
        .filter(_.nonEmpty)
    // fail at generate() time with the CONFIG keys in hand: Spark would
    // reject the combination too, but only at stream start and without
    // pointing at which conf entries to fix
    require(!(cols("partitionBy").nonEmpty && cols("clusterBy").nonEmpty),
      s"both $configOptionsPrefix.partitionBy and $configOptionsPrefix.clusterBy " +
        "are set: a Delta table is either hive-partitioned or liquid-clustered, " +
        "never both — unset one of the two config keys")
    val p = cols("partitionBy").fold(writer)(cs => writer.partitionBy(cs: _*))
    cols("clusterBy").fold(p)(cs => p.clusterBy(cs: _*))
  }

  /** Alias mirroring `DeltaTable.forName(...).toDF()` familiarity
    * (`delta_sink.py:103-107`). */
  def fromDF(df: DataFrame): DataStreamWriter[Row] = generate(df)

  def options(): Map[String, String] =
    options(session.getOrElse(SparkSession.active))
}

object DeltaStreamingSink {
  def isManaged(tableName: String): Boolean = tableName.contains(".")
}
