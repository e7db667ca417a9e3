package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/** Exactly-once across restarts: a second AvailableNow run on the SAME
  * checkpoint must process only files added since the first run — the
  * recovery semantics the reference's checkpoint-path management exists
  * for. */
class CheckpointRecoverySpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("restart on the same checkpoint processes only new files") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-ckpt-recovery-")
    val input = base.resolve("input")
    val out = base.resolve("out")
    val ckpt = base.resolve("ckpt")

    def stage(ids: Range): Unit =
      ids.map(_.toLong).toDF("id").coalesce(1)
        .write.mode("append").parquet(input.toString)

    def runOnce(): Unit = {
      val schema = spark.read.parquet(input.toString).schema
      val q = spark.readStream.schema(schema).parquet(input.toString)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    stage(0 until 100)
    runOnce()
    val afterFirst = spark.read.parquet(out.toString).count()
    assert(afterFirst == 100)

    // restart with no new data: nothing is reprocessed
    runOnce()
    assert(spark.read.parquet(out.toString).count() == 100)

    // restart after appending one file: exactly the new rows appear once
    stage(100 until 150)
    runOnce()
    val ids = spark.read.parquet(out.toString)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 150L).toSeq)
  }
}
