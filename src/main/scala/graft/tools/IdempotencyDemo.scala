package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Tables
import graft.sinks.IdempotentParquetWriter

/** Dev drive: run the foreachBatch idempotent writer end-to-end twice —
  * first a full streaming run, then a checkpoint-restart replay — and print
  * the resulting counts. */
object IdempotencyDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Files.createTempDirectory("graft-idem-demo-")
    val input = base.resolve("input")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.coalesce(3).write.parquet(input.toString)
    val w = IdempotentParquetWriter(base.resolve("out").toString,
      base.resolve("log").toString, "demo:1")

    def runOnce(): Unit = {
      val q = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(input.toString)
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => w.write(df, id))
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val out1 = spark.read.parquet(s"${base.resolve("out")}/batch=*")
    println(s"DEMO first run: rows=${out1.count()} distinct=${out1.select(countDistinct(col("event_id"))).head().getLong(0)} source=${ev.count()}")
    // simulate an operator re-running batch 0 manually (retry after crash)
    w.write(spark.read.parquet(input.toString).limit(999999), 0L)
    val out2 = spark.read.parquet(s"${base.resolve("out")}/batch=*")
    println(s"DEMO after manual batch-0 replay: rows=${out2.count()}")
    // restart from the same checkpoint: no new files => no new batches
    runOnce()
    val out3 = spark.read.parquet(s"${base.resolve("out")}/batch=*")
    println(s"DEMO after checkpoint restart: rows=${out3.count()}")
    spark.stop()
  }
}
