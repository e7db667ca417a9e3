package graft.queries

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.StreamingApp
import Tables._

/**
 * Streaming inventory D20–D22 (SURVEY §2.3): the full framework path —
 * FileStreamingSource → watermarked window aggregation →
 * ParquetStreamingSink — executed with `Trigger.AvailableNow`, then read back
 * as a batch result that must equal the batch oracle (D15's SQL).
 *
 * Watermark flush mechanics: in append mode a window only emits once the
 * watermark passes its end, and the watermark used by batch N is computed
 * from batch N-1's data. Staging therefore appends a far-future sentinel
 * event as the last file: its batch pushes the watermark past every real
 * window, AvailableNow keeps running micro-batches until no state change is
 * pending, and the sentinel's own window is filtered out of the read-back.
 * The oracle sees only real events, so engine and oracle agree exactly.
 */
object StreamingQueries {

  /** D20: streaming E2E parity — one staged file, so a single data batch plus
    * the sentinel flush batch. Exercises R1/R5/R7/R9/R10/R11 end-to-end. */
  def d20StreamingE2E(spark: SparkSession, dir: String): DataFrame =
    runWindowedStream(spark, dir, label = "d20", chunks = 1, shuffled = false)

  /** D21: late/out-of-order replay — events staged as 10 multi-day chunks
    * with rows shuffled inside each chunk, one file per micro-batch. Intra-
    * chunk disorder is real late data, but every row stays inside the 30-min
    * watermark (a later chunk's earliest event is newer than the previous
    * chunk's max minus the delay), so nothing drops and the final state
    * equals the batch oracle. */
  def d21WatermarkLate(spark: SparkSession, dir: String): DataFrame =
    runWindowedStream(spark, dir, label = "d21", chunks = 5, shuffled = true)

  /**
   * Run `f` with `spark.sql.shuffle.partitions` = `n`, restoring the prior
   * value after. A streaming query fixes its state-store partition count
   * from this conf at first start, and every micro-batch then commits one
   * state file per partition per stateful operator — so at local/bench data
   * volumes a 32-partition state store spends more time on per-batch commit
   * fan-out than on data. Size it to key cardinality: these bounded replays
   * use a small constant; a production deployment at 100 TB would size it
   * up (it is per-query, recorded in the checkpoint, not global).
   */
  private[queries] def withStatePartitions[A](spark: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }

  private def runWindowedStream(spark: SparkSession, dir: String, label: String,
                                chunks: Int, shuffled: Boolean): DataFrame = {
    val base = Tables.scratchDir(label)
    val input = base.resolve("input")
    val out = base.resolve("out")
    val ckpt = base.resolve("ckpt")

    stageInput(spark, dir, input, chunks, shuffled)

    val evSchema = spark.read.parquet(input.toString).schema
    val app = new StreamingApp(Some(spark))
      .withConfig(Map(
        "spark.app.checkpoint.version" -> "1.0.0",
        "spark.app.checkpoints.path" -> ckpt.toString,
        "spark.app.source.parquet.options.path" -> input.toString,
        "spark.app.source.parquet.options.maxFilesPerTrigger" -> "1",
        "spark.app.sink.parquet.options.path" -> out.toString,
      ))
      .initialize()
      .withFileSource(schema = Some(evSchema))
      .withParquetSink()
    // the sink resolves checkpointLocation from session conf at generate time;
    // derive it through the app's R10 path computation
    spark.conf.set("spark.app.sink.parquet.options.checkpointLocation",
      app.checkpointLocation.toString)

    val stream = app.fileSource().generate(spark).load()
    val agg = stream
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(tsSecondString(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

    withStatePartitions(spark, 8) {
      val query = app.parquetSink().generate(agg)
        .outputMode("append")
        .queryName(s"graft:$label")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }

    spark.read.parquet(out.toString)
      .filter(col("window_start") < SentinelCutoff)
      .orderBy("window_start", "event_type")
  }

  /** Real events end 2024-01-30; the sentinel sits far past every real
    * window so its watermark flushes them all. */
  private val SentinelTs = "2024-06-01 00:00:00"
  private val SentinelCutoff = "2024-03-01 00:00:00"

  private[graft] def stageInput(spark: SparkSession, dir: String, input: Path,
                                chunks: Int, shuffled: Boolean): Unit = {
    val ev = events(spark, dir)
    if (chunks <= 1) {
      ev.coalesce(1).write.mode("append").parquet(input.toString)
    } else {
      // chunk by event-time range so later chunks never carry data older
      // than the advancing watermark; shuffle rows inside a chunk to model
      // intra-batch disorder
      // events span ~30 days; carve them into time-ordered day-range chunks
      val nChunks = math.min(chunks, 10)
      val daysPerChunk = math.ceil(31.0 / nChunks).toInt
      // persist: each chunk write below re-reads this frame (one scan + chunk
      // tag instead of nChunks parquet scans)
      val withChunk = ev.withColumn("_chunk",
        floor(datediff(col("ts").cast("date"), to_date(lit("2024-01-01"))) / lit(daysPerChunk)))
        .persist()
      try {
        (0 until nChunks).foreach { c =>
          val slice = if (c == nChunks - 1)
            withChunk.filter(col("_chunk") >= c) else withChunk.filter(col("_chunk") === c)
          val ordered =
            if (shuffled) slice.sortWithinPartitions(hash(col("event_id")))
            else slice
          ordered.drop("_chunk").coalesce(1).write.mode("append").parquet(input.toString)
        }
      } finally withChunk.unpersist()
    }
    // sentinel file appended last => strictly newer modification time =>
    // processed as the final micro-batch (file source orders by mod time)
    val sentinel = spark.sql(
      s"""SELECT CAST(-1 AS BIGINT) AS event_id,
         |  TIMESTAMP '$SentinelTs' AS ts,
         |  CAST(-1 AS BIGINT) AS user_id,
         |  '__sentinel__' AS event_type,
         |  CAST(0.0 AS DOUBLE) AS value,
         |  '{}' AS props""".stripMargin)
    sentinel.coalesce(1).write.mode("append").parquet(input.toString)
  }

  // -------------------------------------------- throughput probe (bench)

  /**
   * Streaming-throughput probe (bench-only, not an oracle query): stage the
   * events table as 10 time-ordered files, replay the D20 windowed pipeline
   * at a given `maxFilesPerTrigger`, and return (inputRows, seconds) for
   * the streaming query alone (staging excluded — production input already
   * exists).
   *
   * The point is the micro-batch amortization curve: local-mode micro-batch
   * cost is a fixed ~0.5 s/batch commit floor (offset/commit/state fsync),
   * not data volume, so rows/s should scale near-linearly with
   * files-per-trigger until batches become data-bound. That curve is the
   * measured basis for the 100 TB posture: admission control
   * (maxFilesPerTrigger/maxBytesPerTrigger) trades end-to-end latency
   * against per-batch overhead amortization, and the same pipeline gains
   * throughput by batching bigger, not by re-planning.
   */
  def throughputProbe(spark: SparkSession, dir: String,
                      input: Path, mfpt: Int): (Long, Double) = {
    val base = Tables.scratchDir(s"tput-run$mfpt")
    val out = base.resolve("out")
    val ckpt = base.resolve("ckpt")
    // minus the sentinel row appended by stageInput
    val rows = spark.read.parquet(input.toString).count() - 1
    val evSchema = spark.read.parquet(input.toString).schema
    val stream = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", mfpt.toString).parquet(input.toString)
    val agg = stream
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(tsSecondString(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
    val t0 = System.nanoTime()
    withStatePartitions(spark, 8) {
      val q = agg.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .queryName(s"graft:tput$mfpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    require(spark.read.parquet(out.toString)
      .filter(col("window_start") < SentinelCutoff).count() > 0,
      "throughput probe produced no windows")
    (rows, secs)
  }

  /** Stage the probe input once (10 time-ordered chunk files + sentinel);
    * shared by every maxFilesPerTrigger point so each point streams the
    * identical file set. */
  def stageThroughputInput(spark: SparkSession, dir: String): Path = {
    val input = Tables.scratchDir("tput-input").resolve("input")
    stageInput(spark, dir, input, chunks = 10, shuffled = false)
    input
  }

  // ---------------------------------------------------------------- D22
  /** Session windows: per-user sessions with a 30-minute gap. A new session
    * starts when the gap to the previous event is >= the timeout (Spark's
    * session interval is half-open `[start, last + gap)`), which the oracle's
    * gap-and-island SQL mirrors with `>=`. */
  def d22SessionWindows(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .select(col("user_id"),
        tsString(col("session_window.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val d22Oracle: String =
    """WITH t AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM t
      |)
      |SELECT user_id,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, BatchQueries.QueryFn] = Map(
    "d20_streaming_e2e" -> (d20StreamingE2E _),
    "d21_watermark_late" -> (d21WatermarkLate _),
    "d22_session_windows" -> (d22SessionWindows _),
  )

  val oracles: Map[String, String] = Map(
    // the streaming paths must reproduce the batch tumbling-window result
    "d20_streaming_e2e" -> BatchQueries.d15Oracle,
    "d21_watermark_late" -> BatchQueries.d15Oracle,
    "d22_session_windows" -> d22Oracle,
  )
}
