package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/** The state-scale path: the same windowed streaming aggregation runs on
  * the RocksDB state store provider (state spills off-heap/disk instead of
  * living in executor memory — what a 100 TB deployment uses) and produces
  * byte-identical results to the default HDFS-backed provider. */
class RocksDBStateStoreSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def runAgg(providerClass: Option[String]): Seq[(String, Long)] = {
    val base = Files.createTempDirectory("graft-rocksdb-")
    val input = base.resolve("input")
    Tables.events(spark, T.sf0001).coalesce(1)
      .write.mode("append").parquet(input.toString)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    providerClass.foreach(spark.conf.set(key, _))
    try {
      val schema = spark.read.parquet(input.toString).schema
      val agg = spark.readStream.schema(schema).parquet(input.toString)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("string").as("w"), col("event_type"), col("n"))
      val out = base.resolve("out")
      val q = agg.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // append mode: only watermark-closed windows emit; the comparison only
      // needs both providers to produce the same (closed) result set
      spark.read.parquet(out.toString)
        .collect().map(r => (r.getString(0) + "|" + r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("RocksDB provider produces identical results to the default store") {
    val default = runAgg(None)
    val rocks = runAgg(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    assert(rocks.nonEmpty)
    assert(rocks == default)
  }
}
