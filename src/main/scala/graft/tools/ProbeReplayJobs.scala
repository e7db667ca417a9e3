package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}

/**
 * Dev probe (round-19, verdict items 5/7): total Spark-JOB count and
 * inside-job time for one registered query — the replay queries' wall
 * clock is dominated by per-job fixed cost (scheduling + analysis), so
 * "jobs per batch" is the number the per-batch folding work moves.
 * Prints total jobs, jobs' inside time, and wall, so before/after trees
 * can be compared per query. Batch count is whatever the query's staged
 * stream produces (the registered chunk default), so jobs/batch =
 * jobs / chunks for the replay trio.
 *
 * Usage: runMain graft.tools.ProbeReplayJobs <sfDir> <query> [query ...]
 */
object ProbeReplayJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = Sessions.local(32, logLevel = "ERROR")

    names.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      val jobs = new AtomicInteger(0)
      val insideMs = new AtomicLong(0L)
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          starts.put(j.jobId, j.time)
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(j.jobId)
          if (t0 != 0L) { jobs.incrementAndGet(); insideMs.addAndGet(j.time - t0) }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // async listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"REPLAYJOBS $name jobs=${jobs.get()} " +
        f"inside=${insideMs.get() / 1e3}%.2f s wall=$wall%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
