package graft.tools


import graft.SparkEntry

/** Dev tool: registry-wide pair-blowup audit. Builds every registered
  * query at the given SF and flags any physical plan containing a
  * CartesianProduct or BroadcastNestedLoopJoin — the two nodes that mean
  * an unpruned pair space sneaked past the equi-join discipline. The
  * per-family shuffle-key assertions live in `PlanShapeSpec`; this sweep
  * is the coarse safety net over ALL queries, run once per round.
  *
  * Note: queries that replay streams or run iterative fixpoints execute
  * during construction, so the audit doubles as an sf0.001 smoke pass.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  /** Queries where a non-equi/nested-loop node is the DESIGNED shape
    * because one side is provably tiny (a literal dim or a single query
    * row), so the "blowup" is n×k with constant k — not a pair space. */
  private val allowlisted: Map[String, String] = Map(
    "d19_cosine_topk" -> "single query vector x table: brute-force baseline, n x 1",
    "d27_band_join" -> "3-row literal band table broadcast: n x 3 range test",
    "n07_ann_ivf" -> "single query vector probes centroid cells: n x 1",
    "n06_ann_lsh" -> "single query vector scored against band-collision candidates: n x 1",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(8, logLevel = "ERROR")
    var bad = 0
    var errs = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(p.contains)
        if (hits.isEmpty) println(s"OK $name")
        else allowlisted.get(name) match {
          case Some(reason) => println(s"ALLOWED $name (${hits.mkString(", ")}): $reason")
          case None => bad += 1; println(s"BLOWUP $name: ${hits.mkString(", ")}")
        }
      } catch { case e: Throwable =>
        errs += 1
        println(s"ERROR $name: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    println(s"AUDIT ${if (bad == 0 && errs == 0) "CLEAN"
      else s"$bad blowups, $errs errors"} over ${SparkEntry.queries.size} queries")
    spark.stop()
    // non-zero exit so a scripted gate fails on a blowup/build regression
    if (bad > 0 || errs > 0) sys.exit(1)
  }
}
