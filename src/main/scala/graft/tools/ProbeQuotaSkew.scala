package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/**
 * Dev probe: the n62/n67 quota cut under DOMINANT-HOST SKEW — synthetic
 * scored corpora with 50% of rows on ONE host (the rest over 1,000
 * hosts), quota 10, comparing the custom `TopKPerKey` operator against
 * the `Scale.topKPerKey` window-rank composition on wall time and
 * actual shuffle bytes (TaskEnd listener). What it found (and the
 * scaladocs now claim): Spark 4's `WindowGroupLimit` rewrite bounds the
 * window plan's EXCHANGE exactly like the heap (equal shuffle bytes),
 * so the operator's real advantage is sort-vs-heap — the window plan
 * full-sorts every input partition before its partial limit and again
 * after the shuffle, O(n log n) against the heap's O(n log k), and the
 * measured gap grows with partition size (×1.1 → ×2.8 across 1M → 20M
 * rows). Result equality is checked once per size. Results in
 * BASELINE.md ("quota cut under skew").
 *
 * Usage: runMain graft.tools.ProbeQuotaSkew [N ...] (default 1e6 5e6 2e7)
 */
object ProbeQuotaSkew {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.toSeq.map(_.toLong)
             else Seq(1000000L, 5000000L, 20000000L)
    val spark = Sessions.local(32, logLevel = "ERROR")
    val base = graft.queries.Tables.scratchDir("quotaskew")

    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def measure(thunk: => Unit): (Double, Double) =
      (1 to 2).map { _ =>
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        thunk
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (s, shuffleBytes.get() / 1048576.0)
      }.minBy(_._1)

    ns.foreach { n =>
      val dir = base.resolve(s"n$n").toString
      spark.range(n).select(
          when(pmod(col("id"), lit(2L)) === 0L, lit("big.example.com"))
            .otherwise(concat(lit("host-"), pmod(col("id"), lit(1000L)),
              lit(".example.com"))).as("host"),
          col("id").as("doc_id"),
          (pmod(xxhash64(col("id")), lit(1000001L)).cast("double")
            / 1000000.0).as("quality_score"))
        .repartition(32).write.mode("overwrite").parquet(dir)
      val scored = spark.read.parquet(dir)

      def heapCut() = graft.plans.TopKPerKey(scored, Seq(col("host")),
        Seq(col("quality_score").desc, col("doc_id")), 10)
      def windowCut() = graft.ops.Scale.topKPerKey(scored, Seq("host"),
        Seq(col("quality_score").desc, col("doc_id")), 10)

      // same admitted set (sanity, once per size)
      val a = heapCut().collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val b = windowCut().collect().map(r => (r.getString(0), r.getLong(1))).toSet
      require(a == b, s"heap/window admitted sets differ at n=$n")

      val (heapS, heapMiB) = measure {
        heapCut().write.format("noop").mode("overwrite").save()
      }
      val (winS, winMiB) = measure {
        windowCut().write.format("noop").mode("overwrite").save()
      }
      println(f"QUOTASKEW n=$n%d heap=$heapS%.2f s ($heapMiB%.1f MiB shuffled) " +
        f"window=$winS%.2f s ($winMiB%.1f MiB shuffled) " +
        f"time x${winS / heapS}%.2f shuffle x${winMiB / heapMiB}%.2f")
    }
    spark.stop()
  }
}
