package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
 * State layout under `root/` (the n41 conventions exactly):
 * `counts/v<k>/` — versioned snapshots of the (source, w, ca, cb) table
 * (vocabulary-sized, NOT corpus-sized: the rewrite per batch costs the
 * vocab, which at 100 TB becomes a partitioned MERGE on the word key,
 * the same story as n41's label snapshots); `drift/b<k>/` — append-only
 * per-batch alarm rows; `commits/<k>` — the replay-idempotence markers
 * (a committed batch short-circuits; an interrupted one recomputes
 * deterministically and overwrites its own parts). The write path is
 * strictly ADDITIVE; superseded snapshot versions are reclaimed only by
 * the explicit [[IncrementalDriftMonitor.maintain]] pass — the shared
 * crash-surface rule of all three incremental state machines (destructive
 * GC lives in the maintenance position, never the batch commit).
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
final class IncrementalDriftMonitor(root: Path) {

  private val CountsDdl = "source STRING, w STRING, ca BIGINT, cb BIGINT"
  private val DriftDdl =
    "batch_id BIGINT, source STRING, batch_words BIGINT, prior_words BIGINT, tv DOUBLE"

  private def snapDir(k: Long) = root.resolve("counts").resolve(s"v$k")
  private def driftDir(k: Long) = root.resolve("drift").resolve(s"b$k")
  private def marker(k: Long) = root.resolve("commits").resolve(s"$k.committed")

  /** `requireMarker` gates ids on the `commits/<id>` batch marker in
    * addition to per-directory `_SUCCESS` — the public-reader contract
    * shared with [[IncrementalDedupIndex]]: a crash between the drift part
    * and the counts snapshot must not expose the half-committed batch. */
  private def committedIds(name: String, prefix: String, max: Long,
                           requireMarker: Boolean = false): Seq[Long] = {
    val dir = root.resolve(name)
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith(prefix) && n.drop(prefix.length).forall(_.isDigit) &&
            Files.exists(p.resolve("_SUCCESS")))
          Some(n.drop(prefix.length).toLong)
            .filter(id => id < max && (!requireMarker || isCommitted(id)))
        else None
      }.toSeq
    } finally s.close()
  }

  private def emptyDf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType.fromDDL(ddl))

  private def readCounts(spark: SparkSession, max: Long,
                         requireMarker: Boolean = false): DataFrame =
    committedIds("counts", "v", max, requireMarker).maxOption match {
      case Some(v) => spark.read.schema(StructType.fromDDL(CountsDdl))
        .parquet(snapDir(v).toString)
      case None => emptyDf(spark, CountsDdl)
    }

  def isCommitted(batchId: Long): Boolean = Files.exists(marker(batchId))

  /** The `foreachBatch` entry point (replay-idempotent, n41 contract). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (isCommitted(batchId)) return
    val spark = batch.sparkSession
    val bc = Corpus.snapshotCounts(batch, Corpus.defaultSnapA).persist()
    try {
      val prior = readCounts(spark, batchId)
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
      alarm.write.mode("overwrite").parquet(driftDir(batchId).toString)

      val merged = prior.unionByName(bc)
        .groupBy("source", "w")
        .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      merged.write.mode("overwrite").parquet(snapDir(batchId).toString)

      Files.createDirectories(marker(batchId).getParent)
      if (!Files.exists(marker(batchId))) Files.createFile(marker(batchId))
    } finally bc.unpersist()
  }

  /**
   * The maintenance entry point — the [[IncrementalDedupIndex.compact]] /
   * [[IncrementalEmbedIndex.compact]] position in the lifecycle, and the
   * ONLY destructive pass this monitor runs: the per-batch write path is
   * strictly additive (parts, snapshots, markers), so every crash state a
   * replay can encounter is a prefix of the batch sequence plus at most
   * one in-flight batch — the shared state-machine rule all three
   * incremental indexes now follow (round-10 verdict: GC ran inside the
   * batch commit here, widening the per-batch crash surface and deleting
   * the stale-version recovery window the other two keep until
   * maintenance). Reclaims superseded counts-snapshot versions; disk
   * growth is bounded by the maintenance cadence instead of the stream's
   * lifetime. The n48 query runs it inside the driver's oracle gate, as
   * n41/n52 run compact().
   */
  def maintain(): Unit = gcSnapshots()

  /** Retention of superseded counts-snapshot versions — the
    * [[IncrementalEmbedIndex]] rule: threshold is the latest
    * MARKER-committed version (an orphan from a crash before its marker
    * must not promote), versions above it are in-flight, a crash mid-sweep
    * leaves stale versions for the next sweep (deletes are independent and
    * idempotent; readers always resolve the max committed version). */
  private def gcSnapshots(): Unit =
    committedIds("counts", "v", Long.MaxValue, requireMarker = true)
      .maxOption.foreach { keep =>
        committedIds("counts", "v", keep).foreach(v => deleteTree(snapDir(v)))
      }

  private def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  /** The n46 drift table implied by the final count state — hash-matches
    * the batch oracle for any batching (count merging commutes). */
  def finalDrift(spark: SparkSession): DataFrame =
    Corpus.driftFromCounts(readCounts(spark, Long.MaxValue, requireMarker = true))

  /** The append-only per-batch alarm log (batching-dependent by design). */
  def driftLog(spark: SparkSession): DataFrame = {
    val ids = committedIds("drift", "b", Long.MaxValue, requireMarker = true)
    if (ids.isEmpty) emptyDf(spark, DriftDdl)
    else spark.read.schema(StructType.fromDDL(DriftDdl))
      .parquet(ids.map(driftDir(_).toString): _*)
  }
}

object IncrementalDrift {

  /** n48: ingest the documents table as a 4-batch file stream through the
    * incremental monitor, run the MAINTENANCE pass (snapshot-version GC —
    * inside the driver's oracle gate, as n41/n52 run compact()), then emit
    * the drift table implied by the final count state. Oracle: the batch
    * n46 SQL ([[Corpus.snapshotDriftOracle]]) verbatim. */
  def streamingDriftQuery(spark: SparkSession, dir: String,
                          chunks: Int = 4): DataFrame = {
    val base = Tables.scratchDir("n48")
    val monitor = new IncrementalDriftMonitor(base.resolve("state"))
    IncrementalDedup.stageChunks(Tables.documents(spark, dir),
      base.resolve("input"), chunks)
    runStream(spark, base.resolve("input"), base.resolve("ckpt"), monitor)
    monitor.maintain()
    monitor.finalDrift(spark).orderBy("source")
  }

  private[ops] def runStream(spark: SparkSession, input: Path, ckpt: Path,
                             monitor: IncrementalDriftMonitor): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = spark.read.parquet(input.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(input.toString)
      .writeStream
      .foreachBatch((df: DataFrame, id: Long) => monitor.processBatch(df, id))
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .queryName("graft:n48")
      .start()
    q.awaitTermination()
  }
}
