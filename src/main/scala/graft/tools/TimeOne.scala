package graft.tools


import graft.SparkEntry

/** Dev tool: time individual queries. Usage: runMain graft.tools.TimeOne <sfDir> <name>... */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local(32)
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIMED $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
