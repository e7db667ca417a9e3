package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * The hard watermark property of the streaming sessionizer: an event that
 * arrives a micro-batch LATE — but inside the watermark — and falls between
 * two open sessions must BRIDGE them into one. An eager-emitting
 * sessionizer (emit as soon as a gap-opening event is seen) cannot pass
 * this: it would have already flushed the first session, unretractably,
 * in append mode.
 */
class StreamingSessionBridgeSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("a late in-watermark event bridges two open sessions") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-bridge-")
    val input = base.resolve("input")

    def stage(rows: Seq[(Long, Long, Timestamp, Double)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "value").coalesce(1)
        .write.mode("append").parquet(input.toString)

    // batch 1: session A opens at t=0 (events at 0 and 5)
    stage(Seq((1L, 1L, ts(0), 1.0), (1L, 2L, ts(5), 1.0)))
    // batch 2: t=40 — 35min after A's last event, so with a 30min gap this
    // OPENS session B; watermark after this batch = 40 - 10 = 30
    stage(Seq((1L, 3L, ts(40), 1.0)))
    // batch 3: t=33 — late (older than batch 2's event) but admitted
    // (>= watermark 30); 28min after A, 7min before B: bridges A and B
    stage(Seq((1L, 4L, ts(33), 1.0)))
    // batch 4: far-future sentinel on another user pushes the watermark
    // past everything, flushing user 1's (single, merged) session
    stage(Seq((99L, 9L, ts(10000), 0.0)))

    val schema = spark.read.parquet(input.toString).schema
    val sessions = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        StreamingOpsQueries.sessionize(30L * 60 * 1000000) _)

    val out = base.resolve("out")
    val q = sessions.toDF().writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.read.parquet(out.toString)
      .filter(col("user_id") === 1L)
      .collect()
    assert(rows.length == 1,
      s"expected ONE bridged session, got ${rows.toSeq}")
    assert(rows.head.getLong(2) == 4L, s"all 4 events in it: ${rows.toSeq}")
    assert(rows.head.getDouble(3) == 4.0)
  }
}
