package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/**
 * Idempotent micro-batch writes without Delta (SURVEY §7.3): the offline
 * equivalent of the Delta sink's `txnAppId`/`txnVersion` options
 * (`/root/reference/src/pyspark_streaming_base/sinks/delta_sink.py:16-20`).
 *
 * Used as a `foreachBatch` function: every micro-batch lands in its own
 * `batch=<id>` subdirectory written with overwrite mode, and a commit marker
 * under `{commitLog}/{txnAppId}/` records completion. A replayed batch
 * (checkpoint recovery, retry) either short-circuits on the marker or
 * overwrites its own subdirectory — both end states are identical, so the
 * write is exactly-once at the directory level regardless of where the
 * previous attempt died.
 */
final case class IdempotentParquetWriter(path: String, commitLog: String,
                                         txnAppId: String) {

  private def marker(batchId: Long) =
    Paths.get(commitLog, txnAppId, s"$batchId.committed")

  /** True if the batch is already fully committed for this txnAppId. */
  def isCommitted(batchId: Long): Boolean = Files.exists(marker(batchId))

  /** The `foreachBatch` entry point. */
  def write(df: DataFrame, batchId: Long): Unit = {
    if (!isCommitted(batchId)) {
      df.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      Files.createDirectories(marker(batchId).getParent)
      Files.createFile(marker(batchId))
    }
  }
}
