package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * Stream-stream OUTER join state across restarts (the d94 semantics under
 * failure): a second AvailableNow run on the same checkpoint must resume
 * the join state — unmatched clicks buffered in run 1 match purchases
 * arriving in run 2, nothing is emitted twice, and the final output equals
 * the single-run result (matched pairs + null-padded clicks below the
 * final watermark horizon).
 *
 * BOTH streams are split at a common time cut (run-2 data never below
 * run-1's global watermark, so no late-drop asymmetry vs the batch
 * reference — the same reasoning d94's oracle encodes). Splitting both
 * matters beyond realism: the global watermark is the min across inputs
 * and never regresses, so a stream that stays silent in a restarted run
 * pins the watermark at its checkpointed value and suppresses all further
 * eviction — observed directly while writing this spec.
 */
class StreamJoinRecoverySpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("outer-join state survives restart; two-run output equals single-run semantics") {
    val base = Files.createTempDirectory("graft-d94-recovery-")
    val clickDir = base.resolve("clicks")
    val purchaseDir = base.resolve("purchases")
    val out = base.resolve("out")
    val ckpt = base.resolve("ckpt")

    val ev = Tables.events(spark, T.sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("purchase_user"),
        col("ts").as("purchase_ts"))

    // both streams split at the purchase-median wall time
    val cut = purchases.select(col("purchase_ts").cast("double").as("pts"))
      .stat.approxQuantile("pts", Array(0.5), 0.0)(0)
    clicks.filter(col("click_ts").cast("double") <= cut).coalesce(1)
      .write.mode("append").parquet(clickDir.toString)
    purchases.filter(col("purchase_ts").cast("double") <= cut).coalesce(1)
      .write.mode("append").parquet(purchaseDir.toString)

    def runOnce(): Unit = {
      val cs = spark.read.parquet(clickDir.toString).schema
      val ps = spark.read.parquet(purchaseDir.toString).schema
      val c = spark.readStream.schema(cs).parquet(clickDir.toString)
        .withWatermark("click_ts", "1 hour")
      val p = spark.readStream.schema(ps).parquet(purchaseDir.toString)
        .withWatermark("purchase_ts", "1 hour")
      val joined = c.join(p,
        col("click_user") === col("purchase_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
        "leftOuter")
        .select(col("click_id"), col("purchase_id"))
      StreamingQueries.withStatePartitions(spark, 4) {
        val q = joined.writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }

    runOnce()
    val afterRun1 = spark.read.parquet(out.toString).count()

    // restart with the late halves appended: buffered click state must pick
    // up the new matches and the advancing watermark must resume eviction
    clicks.filter(col("click_ts").cast("double") > cut).coalesce(1)
      .write.mode("append").parquet(clickDir.toString)
    purchases.filter(col("purchase_ts").cast("double") > cut).coalesce(1)
      .write.mode("append").parquet(purchaseDir.toString)
    runOnce()

    val got = spark.read.parquet(out.toString)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.length > afterRun1, "run 2 emitted nothing new")
    assert(got.length == got.distinct.length, "restart re-emitted rows")

    // single-run reference: batch interval join + the d94 eviction horizon
    def expected: Array[(Long, Long)] = {
      val matched = clicks.join(purchases,
        col("click_user") === col("purchase_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("click_id"), col("purchase_id"))
      val horizon = clicks.agg(max(col("click_ts")).as("mc")).crossJoin(
        purchases.agg(max(col("purchase_ts")).as("mp")))
        .select(least(col("mc"), col("mp")).cast("double").as("w"))
        .collect()(0).getDouble(0) - 3600.0
      val unmatched = clicks
        .join(matched.select(col("click_id")), Seq("click_id"), "left_anti")
        .filter(col("click_ts").cast("double") + 1800.0 < horizon)
        .select(col("click_id"), lit(null).cast("long").as("purchase_id"))
      matched.unionByName(unmatched)
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    }
    assert(got.sorted.toSeq == expected.sorted.toSeq,
      "two-run output differs from single-run semantics")
  }
}
