package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.IncrementalDriftMonitor

/**
 * Dev tool: long-horizon cost curve of the n48 drift monitor (round-12
 * verdict #6). The in-suite soak (`IncrementalSoakSpec`) bounds FILE
 * counts and a 50-batch timing ratio; this probe runs the monitor to a
 * 500-batch horizon — 10 full maintenance cycles, with the alarm-log
 * level chain bin-packed twice — and prints the mean per-batch cost and
 * the `driftLog` read cost per 50-batch window. The flat-cost claim:
 * each batch reads only the latest counts snapshot (bounded by
 * vocabulary, not stream length) plus cadence-bounded parts, and the log
 * read walks <= maxLevels levels, so neither column may ramp with the
 * horizon. Results recorded in BASELINE.md.
 *
 * Usage: runMain graft.tools.ProbeDriftSoak [sfDir] [batches] [cadence]
 */
object ProbeDriftSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val batches = args.lift(1).map(_.toInt).getOrElse(500)
    val cadence = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local(32, logLevel = "ERROR")
    val base = graft.queries.Tables.scratchDir("driftsoak")
    val monitor = new IncrementalDriftMonitor(base.resolve("state"))
    val docs = graft.queries.Tables.documents(spark, sfDir).persist()
    docs.count()

    val window = 50
    var batchSum = 0.0
    (0 until batches).foreach { j =>
      val t0 = System.nanoTime()
      monitor.processBatch(
        docs.filter(pmod(xxhash64(col("doc_id")), lit(batches)) === j), j.toLong)
      if ((j + 1) % cadence == 0) monitor.maintain(spark)
      batchSum += (System.nanoTime() - t0) / 1e9
      if ((j + 1) % window == 0) {
        val tLog0 = System.nanoTime()
        val logRows = monitor.driftLog(spark).count()
        val tLog = (System.nanoTime() - tLog0) / 1e9
        println(f"DRIFTSOAK batch=${j + 1}%4d mean_batch=${batchSum / window}%.3f s " +
          f"log_read=$tLog%.3f s log_rows=$logRows")
        batchSum = 0.0
      }
    }
    spark.stop()
  }
}
