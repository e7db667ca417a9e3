package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * A minimal versioned parquet table: the offline stand-in for the Delta
 * features the reference's source/sink surface exposes as options —
 * `startingVersion`, time travel, and ordered change replay
 * (`/root/reference/src/pyspark_streaming_base/sources/delta_source.py:9`,
 * and the time-travel note at `delta_source.py` header).
 *
 * Layout: `{table}/v={N}/` parquet per commit plus `{table}/_commits/{N}`
 * markers. A version directory only counts once its marker exists, so
 * readers never observe half-written commits (writer order: data first,
 * marker last — same recovery convergence as [[graft.sinks.IdempotentParquetWriter]]).
 *
 * Semantics (append-only log, like a Delta CDF append stream):
 *  - snapshot at version V = union of commits 0..V;
 *  - `readChanges(from, to)` = union of commits in (from, to] — the
 *    `startingVersion` replay surface;
 *  - all reads are plain parquet scans, so pushdown/pruning apply untouched.
 */
object VersionedTable {

  private def commitsDir(table: String): Path = Paths.get(table, "_commits")

  /** Committed versions, ascending. */
  def versions(table: String): Seq[Long] = {
    val dir = commitsDir(table)
    if (!Files.exists(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .map(_.getFileName.toString).filter(_.forall(_.isDigit))
        .map(_.toLong).toSeq.sorted
      finally stream.close()
    }
  }

  def latestVersion(table: String): Option[Long] = versions(table).lastOption

  /** Append `df` as the next version; returns the committed version. */
  def commit(df: DataFrame, table: String): Long = {
    val next = latestVersion(table).fold(0L)(_ + 1)
    df.write.mode("overwrite").parquet(s"$table/v=$next")
    Files.createDirectories(commitsDir(table))
    Files.createFile(commitsDir(table).resolve(next.toString))
    next
  }

  private def readVersions(spark: SparkSession, table: String, vs: Seq[Long]): DataFrame = {
    require(vs.nonEmpty, s"no committed versions selected in $table")
    spark.read.parquet(vs.map(v => s"$table/v=$v"): _*)
  }

  /** Snapshot read: all rows up to and including `version` (time travel);
    * latest snapshot when None. */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val committed = versions(table)
    val upTo = version.fold(committed)(v => committed.filter(_ <= v))
    readVersions(spark, table, upTo)
  }

  /** Ordered change replay: rows committed in versions (fromExclusive, toInclusive].
    * `fromExclusive = -1` replays from the beginning — the `startingVersion`
    * surface of the Delta streaming source. */
  def readChanges(spark: SparkSession, table: String,
                  fromExclusive: Long, toInclusive: Long): DataFrame =
    readVersions(spark, table,
      versions(table).filter(v => v > fromExclusive && v <= toInclusive))
}
