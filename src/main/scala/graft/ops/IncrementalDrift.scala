package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/**
 * Incremental / streaming corpus-drift monitor: the n46 snapshot-drift
 * table maintained continuously as documents arrive — the monitoring twin
 * of [[IncrementalDedup]] (n41). A production ingest pipeline wants the
 * distribution-shift alarm ON the stream, not in a nightly batch: each
 * micro-batch (1) folds its (source, word) counts into a persisted count
 * state and (2) appends a per-source total-variation distance between the
 * batch's own word distribution and everything ingested BEFORE it — the
 * "this crawl slice looks different" alarm, available the moment the
 * batch commits.
 *
 * Since round 12 the monitor is the third subclass of
 * [[IncrementalStateMachine]] (with the two dedup indexes): `drift/b<k>/`
 * append-only alarm parts, `counts/v<k>/` versioned count snapshots
 * (vocabulary-sized, NOT corpus-sized — at 100 TB the rewrite becomes a
 * partitioned MERGE on the word key), `commits/<k>` replay-idempotence
 * markers. The write path is strictly ADDITIVE; [[maintain]] — the shared
 * maintenance position — runs the base compaction: superseded count
 * versions are reclaimed, the alarm log consolidates into tiered levels,
 * and batch markers at or below the watermark are pruned, so marker and
 * part counts are bounded by the maintenance cadence instead of the
 * stream's lifetime (previously the markers grew one per batch forever —
 * the round-12 drift-soak gap).
 *
 * Correctness claim (oracle-gated as n48): count merging is commutative
 * and associative, so after `processAllAvailable` the final count state
 * equals the batch [[Corpus.snapshotCounts]] on the full corpus for ANY
 * batching — and therefore [[finalDrift]] hash-matches the batch n46
 * oracle verbatim, the n41 "incremental maintenance converges to the
 * batch answer" pattern. The per-batch alarm log is inherently
 * batching-DEPENDENT (that is its job), so it is test-bound instead:
 * `IncrementalDriftSpec` plants a distribution-shifted final slice and
 * asserts the alarm fires on exactly that batch.
 */
final class IncrementalDriftMonitor(root: Path,
                                    override protected val maxLevels: Int = 4)
  extends IncrementalStateMachine(root) {

  private val CountsDdl = "source STRING, w STRING, ca BIGINT, cb BIGINT"
  private val DriftDdl =
    "batch_id BIGINT, source STRING, batch_words BIGINT, prior_words BIGINT, tv DOUBLE"

  override protected def partTables: Seq[PartTable] =
    Seq(PartTable("drift", DriftDdl))

  override protected def snapTables: Seq[(String, String)] =
    Seq("counts" -> CountsDdl)

  /** The `foreachBatch` entry point (replay-idempotent, n41 contract). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (isCommitted(batchId)) return
    rejectBelowWatermark(batchId)
    val spark = batch.sparkSession
    val bc = Corpus.snapshotCounts(batch, Corpus.defaultSnapA).persist()
    try {
      val prior = readSnapshot(spark, "counts", batchId, CountsDdl)
      // alarm row per source: TV(batch distribution, prior distribution)
      // over COMBINED counts (ca+cb — the snapshot axis is n46's concern,
      // the alarm compares arrival slices), same integer cross-product
      // treatment as n46; null tv when the source has no prior words
      val p = bc.select(col("source"), col("w"), (col("ca") + col("cb")).as("cp"))
      val q = prior.select(col("source"), col("w"), (col("ca") + col("cb")).as("cq"))
      val joined = p.join(q, Seq("source", "w"), "full_outer")
        .select(col("source"), coalesce(col("cp"), lit(0L)).as("cp"),
          coalesce(col("cq"), lit(0L)).as("cq"))
      val totals = joined.groupBy("source")
        .agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"))
      val alarm = joined.join(totals, "source")
        .withColumn("diff", abs(
          col("cp").cast("decimal(38,0)") * col("nq").cast("decimal(38,0)") -
            col("cq").cast("decimal(38,0)") * col("np").cast("decimal(38,0)")))
        .groupBy("source")
        .agg(max(col("np")).as("batch_words"), max(col("nq")).as("prior_words"),
          sum(col("diff")).as("sum_diff"))
        .select(lit(batchId).as("batch_id"), col("source"),
          col("batch_words"), col("prior_words"),
          when(col("batch_words") > 0 && col("prior_words") > 0,
            col("sum_diff").cast("double") /
              (lit(2.0) * col("batch_words").cast("double") *
                col("prior_words").cast("double"))).as("tv"))
      val merged = prior.unionByName(bc)
        .groupBy("source", "w")
        .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      // alarm part and counts snapshot both derive from (prior, cached
      // batch counts) and write distinct dirs — independent jobs,
      // overlapped per guide §2.6 (round-19; the marker still flips only
      // after both settle)
      inParallel(
        () => alarm.write.mode("overwrite")
          .parquet(partDir("drift", batchId).toString),
        () => merged.write.mode("overwrite")
          .parquet(snapDir("counts", batchId).toString))

      commitBatch(batchId)
    } finally bc.unpersist()
  }

  /**
   * The maintenance entry point — the ONLY destructive pass this monitor
   * runs (the per-batch write path is strictly additive, so every crash
   * state a replay can encounter is a prefix of the batch sequence plus
   * at most one in-flight batch). Delegates to the base
   * [[IncrementalStateMachine.compact]]: superseded count versions
   * reclaimed, alarm parts consolidated into tiered levels, dead batch
   * markers pruned. The n48 query runs it inside the driver's oracle
   * gate, as n41/n52 run compact().
   */
  def maintain(spark: SparkSession): Unit = { compact(spark); () }

  /** The n46 drift table implied by the final count state — hash-matches
    * the batch oracle for any batching (count merging commutes). */
  def finalDrift(spark: SparkSession): DataFrame =
    Corpus.driftFromCounts(
      readSnapshot(spark, "counts", Long.MaxValue, CountsDdl,
        requireMarker = true))

  /** The append-only per-batch alarm log (batching-dependent by design). */
  def driftLog(spark: SparkSession): DataFrame =
    readParts(spark, "drift", Long.MaxValue, DriftDdl, requireMarker = true)
}

object IncrementalDrift {

  /** n48: ingest the documents table as a 4-batch file stream through the
    * incremental monitor, run the MAINTENANCE pass (snapshot-version GC +
    * alarm-log compaction — inside the driver's oracle gate, as n41/n52
    * run compact()), then emit the drift table implied by the final count
    * state. Oracle: the batch n46 SQL ([[Corpus.snapshotDriftOracle]])
    * verbatim. */
  def streamingDriftQuery(spark: SparkSession, dir: String,
                          chunks: Int = 4): DataFrame = {
    val base = Tables.scratchDir("n48")
    val monitor = new IncrementalDriftMonitor(base.resolve("state"))
    IncrementalDedup.stageChunks(Tables.documents(spark, dir),
      base.resolve("input"), chunks)
    runStream(spark, base.resolve("input"), base.resolve("ckpt"), monitor)
    monitor.maintain(spark)
    monitor.finalDrift(spark).orderBy("source")
  }

  private[ops] def runStream(spark: SparkSession, input: Path, ckpt: Path,
                             monitor: IncrementalDriftMonitor): Unit =
    StreamHarness.run(spark, input, ckpt, "graft:n48")(monitor.processBatch)
}
