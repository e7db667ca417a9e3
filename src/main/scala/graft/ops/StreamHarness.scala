package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/**
 * The one stage-then-AvailableNow harness behind every incremental-index
 * gated query (n41/n48/n52/n58/n63) — the same divergence-risk fold as
 * `tools/Sessions` (round 12) and the shared state machine: four copies
 * of this body had accumulated by round 14, and each future tweak (the
 * restart `from` semantics, the admission option, the trigger) must land
 * once, not N times. Mirrors the reference's ingest shape: an
 * admission-throttled streaming read driven batch-by-batch into a
 * `foreachBatch` consumer (`src/pyspark_streaming_base/app/app.py:61-76`,
 * `sources/delta_source.py:10-11` — maxFilesPerTrigger throttling).
 */
private[graft] object StreamHarness {

  /** Lifetime count of [[run]] invocations in this JVM. Exists for the
    * replay-registry invariant (`ReplayRegistrySpec`): a query whose
    * build drives this harness pays the per-micro-batch scheduling floor
    * and MUST be in `SparkEntry.replayQueries`, or its floor pollutes the
    * bench's `batch_sec` bucket (the round-14 n63 defect). */
  private[graft] val runs = new java.util.concurrent.atomic.AtomicInteger(0)

  /** `chunks − from` single-file arrival slices of `df`, appended in
    * order — one micro-batch each under `maxFilesPerTrigger=1`. The
    * chunk key is the CALLER's contract (each index's fixtures and pins
    * depend on its batch composition): `chunkKey` must be a
    * deterministic `[0, chunks)` value per row. */
  def stageChunks(df: DataFrame, chunkKey: Column, input: Path,
                  chunks: Int, from: Int = 0): Unit =
    (from until chunks).foreach { c =>
      df.filter(chunkKey === c)
        .coalesce(1).write.mode("append").parquet(input.toString)
    }

  /** One AvailableNow run over whatever staged files the checkpoint has
    * not seen yet, driving `onBatch` (replay-idempotent by the n41
    * contract the consumers implement). */
  def run(spark: SparkSession, input: Path, ckpt: Path, name: String)
         (onBatch: (DataFrame, Long) => Unit): Unit = {
    runs.incrementAndGet()
    val schema = spark.read.parquet(input.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(input.toString)
      .writeStream
      .foreachBatch(onBatch)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .queryName(name)
      .start()
    q.awaitTermination()
  }
}
