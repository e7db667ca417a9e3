package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * `Trigger.ProcessingTime` soak (round-7/8 advice): everything else in the
 * suite drives streams with `AvailableNow` — matching the reference's own
 * E2E (`tests/test_delta_end_to_end.py:78`) — but a production stream runs
 * on a wall-clock trigger, so one bounded run proves the trigger mode
 * changes nothing about the final state: a file-drip source processed on a
 * 250 ms cadence converges to the same aggregate as the batch answer, in
 * well under the 30 s bound.
 */
class ProcessingTimeSoakSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("ProcessingTime file drip converges to the AvailableNow/batch state") {
    val base = Tables.scratchDir("ptsoak")
    val input = base.resolve("input")
    val ckpt = base.resolve("ckpt")

    val events = Tables.events(spark, T.sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
    // 6 staged files + maxFilesPerTrigger=1 => at least 6 wall-clock
    // micro-batches; the drip is pre-staged (modification order is the
    // arrival order), so the soak bounds trigger cadence, not file IO
    (0 until 6).foreach { c =>
      events.filter(pmod(col("event_id"), lit(6)) === c)
        .coalesce(1).write.mode("append").parquet(input.toString)
    }
    val expected = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val stream = spark.readStream
      .schema(spark.read.parquet(input.toString).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(input.toString)
    val q = stream.groupBy("event_type").count()
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("ptsoak_agg")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def state() = spark.table("ptsoak_agg")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      var last = state()
      while (last != expected && System.nanoTime() < deadline) {
        Thread.sleep(250)
        last = state()
      }
      assert(last == expected,
        s"did not converge within 30 s: $last vs $expected")
    } finally q.stop()
  }
}
