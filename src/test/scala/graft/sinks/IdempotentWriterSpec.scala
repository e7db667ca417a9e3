package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The foreachBatch commit-log guard must make replayed batches no-ops and
  * still produce the complete result through a real streaming run. */
class IdempotentWriterSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("replaying a batch does not duplicate output") {
    val base = Files.createTempDirectory("graft-idem-")
    val w = IdempotentParquetWriter(base.resolve("out").toString,
      base.resolve("log").toString, "app-1:1.0.0")
    val df = Tables.orders(spark, T.sf0001).limit(100)
    w.write(df, 7L)
    assert(w.isCommitted(7L))
    val afterOnce = spark.read.parquet(s"${base.resolve("out")}/batch=7").count()
    w.write(df, 7L) // replay: must short-circuit
    val afterTwice = spark.read.parquet(s"${base.resolve("out")}/batch=7").count()
    assert(afterOnce == 100 && afterTwice == 100)
    // a different txnAppId is an independent transaction domain
    val w2 = IdempotentParquetWriter(base.resolve("out2").toString,
      base.resolve("log").toString, "app-2:1.0.0")
    assert(!w2.isCommitted(7L))
  }

  test("streaming foreachBatch run lands every event exactly once") {
    val base = Files.createTempDirectory("graft-idem-stream-")
    val input = base.resolve("input")
    val ev = Tables.events(spark, T.sf0001)
    ev.coalesce(2).write.parquet(input.toString)
    val w = IdempotentParquetWriter(base.resolve("out").toString,
      base.resolve("log").toString, "stream-app:1")
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => w.write(df, id))
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(s"${base.resolve("out")}/batch=*")
    assert(out.count() == ev.count())
    assert(out.select(countDistinct(col("event_id"))).head().getLong(0) == ev.count())
  }
}
