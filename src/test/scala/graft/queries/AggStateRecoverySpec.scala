package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * Windowed-aggregation state across restarts (the d15/d21 semantics under
 * failure) — completes the recovery triangle next to
 * [[StreamJoinRecoverySpec]] (join state) and source/sink coverage in
 * `CheckpointRecoverySpec`/`IdempotentWriterSpec`: a tumbling window that
 * straddles the restart boundary must accumulate rows from both runs in
 * its resumed state, finalized windows must not re-emit, and the two-run
 * append-mode output must equal the single-run result (all windows whose
 * end precedes the final watermark).
 *
 * The input splits at a wall-time cut so run-2 rows are never below run-1's
 * watermark (no late-drop asymmetry vs the batch reference).
 */
class AggStateRecoverySpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("tumbling-window counts accumulate across a restart; no re-emission") {
    val base = Files.createTempDirectory("graft-agg-recovery-")
    val input = base.resolve("input")
    val out = base.resolve("out")
    val ckpt = base.resolve("ckpt")

    val ev = Tables.events(spark, T.sf0001)
      .select(col("ts"), col("event_type"))
    val cut = ev.select(col("ts").cast("double").as("tsd"))
      .stat.approxQuantile("tsd", Array(0.5), 0.0)(0)

    def stage(pred: org.apache.spark.sql.Column): Unit =
      ev.filter(pred).coalesce(1).write.mode("append").parquet(input.toString)

    def runOnce(): Unit = {
      val schema = spark.read.parquet(input.toString).schema
      val agg = spark.readStream.schema(schema).parquet(input.toString)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
      StreamingQueries.withStatePartitions(spark, 4) {
        val q = agg.writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }

    stage(col("ts").cast("double") <= cut)
    runOnce()
    val afterRun1 = spark.read.parquet(out.toString).count()
    assert(afterRun1 > 0, "run 1 finalized no windows")

    stage(col("ts").cast("double") > cut)
    runOnce()

    val got = spark.read.parquet(out.toString)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
    assert(got.length > afterRun1, "run 2 finalized no new windows")
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length,
      "a (window, type) group emitted twice — state did not resume")

    // single-run reference: batch windowed counts for windows whose end
    // precedes the final watermark (max ts − 1h)
    val horizon = ev.agg(max(col("ts")).cast("double").as("m"))
      .collect()(0).getDouble(0) - 3600.0
    val expected = ev
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("window.end").cast("double") < horizon)
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
    assert(got.sorted.toSeq == expected.sorted.toSeq,
      "two-run output differs from single-run semantics")

    // the straddling windows prove cross-run accumulation: at least one
    // emitted window must contain rows from both halves of the input
    val cutMs = (cut * 1000).toLong
    val straddle = got.filter { case (ws, _, _) =>
      ws <= cutMs && ws + 15 * 60 * 1000 > cutMs }
    assert(straddle.nonEmpty, "no window straddles the restart cut")
  }
}
