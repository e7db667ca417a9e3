package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Delta Lake streaming source.
 *
 * Option names/defaults are the spec from
 * `/root/reference/src/pyspark_streaming_base/sources/delta_source.py:6-30`:
 * maxFilesPerTrigger=1, maxBytesPerTrigger=1g (micro-batch admission
 * control), withEventTimeOrder=true (ordered backfill), ignoreChanges=true,
 * ignoreDeletes=true (schema/update tolerance), startingVersion/path unset.
 *
 * Managed-table resolution (`delta_source.py:63-89`): joins the non-empty
 * parts of `{configPrefix}.table.{catalog,databaseOrSchema,tableName}` with
 * dots; raises if all three are missing.
 *
 * The Delta connector jars are absent in this offline environment; the option
 * surface is fully testable, and `FileStreamingSource` is the runnable
 * specialization for E2E paths (SURVEY §7.4). Delta-only options
 * (`withEventTimeOrder`, `startingVersion`, autoCompact) are pass-through
 * strings that require the real connector at runtime.
 */
final case class DeltaStreamingSource(
    configPrefixOpt: Option[String] = None,
    config: Map[String, String] = Map.empty,
    session: Option[SparkSession] = None) extends StreamingSource {

  override def format: String = "delta"
  override def basePrefix: String = configPrefixOpt.getOrElse("spark.app.source")

  override val defaults: Map[String, Option[String]] = Map(
    "startingVersion" -> None,
    "maxFilesPerTrigger" -> Some("1"),
    "maxBytesPerTrigger" -> Some("1g"),
    "withEventTimeOrder" -> Some("true"),
    "ignoreChanges" -> Some("true"),
    "ignoreDeletes" -> Some("true"),
    "path" -> None,
  )

  def configPrefixForTable: String = s"$configPrefix.table"

  def tableName(spark: SparkSession): String = {
    def part(k: String) = Option(spark.conf.get(s"$configPrefixForTable.$k", null)).filter(_.nonEmpty)
    val parts = Seq(part("catalog"), part("databaseOrSchema"), part("tableName"))
    if (parts.forall(_.isEmpty))
      throw new IllegalArgumentException(s"Missing configuration for $configPrefixForTable")
    parts.flatten.mkString(".")
  }

  def tableName(): String = tableName(session.getOrElse(SparkSession.active))

  def options(): Map[String, String] =
    options(session.getOrElse(SparkSession.active))
}

object DeltaStreamingSource {
  /** A dotted name denotes a managed table (`delta_source.py:87-89`). */
  def isManaged(tableName: String): Boolean = tableName.contains(".")
}
