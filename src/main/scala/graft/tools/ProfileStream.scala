package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.queries.Tables._

/** Dev-only: per-micro-batch duration breakdown for the d21-shaped
  * windowed stream. Usage: runMain graft.tools.ProfileStream <sfDir>
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"BATCH ${p.batchId} rows=${p.numInputRows} durations=${p.durationMs}")
      }
    })

    val base = Files.createTempDirectory("graft-profstream-")
    val input = base.resolve("input")
    // same staging shape as d21: 5 chunks + sentinel, one file per batch
    val t0 = System.nanoTime()
    graft.queries.StreamingQueries.stageInput(spark, sfDir, input,
      chunks = 5, shuffled = true)
    println(f"STAGE ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val schema = spark.read.parquet(input.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)
    val agg = stream
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(tsSecondString(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
    val t1 = System.nanoTime()
    val q = agg.writeStream
      .format("parquet")
      .option("path", base.resolve("out").toString)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(f"STREAM ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
