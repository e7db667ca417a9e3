package graft.tools

import org.apache.spark.sql.functions._

/**
 * Dev tool (round-19 plan evidence): the ABOVE-THRESHOLD n65 plan — the
 * crossover cell join over a 16k synthetic corpus (the PlanShapeSpec
 * fixture, just past the 3 MiB source threshold). Run in the pre-salt
 * tree it prints the unsalted pinned shuffled-hash plan; in the round-19
 * tree, the salted (cell, salt) plan. Bench-point plans sit below the
 * threshold and are unchanged either way.
 *
 * Usage: runMain graft.tools.PlanPairCellJoin
 */
object PlanPairCellJoin {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, logLevel = "ERROR")
    val dir = graft.queries.Tables.scratchDir("planpaircell").resolve("emb.parquet")
    val comps = transform(sequence(lit(0), lit(63)), i =>
      (pmod(xxhash64(col("id"), i), lit(1000001L)).cast("double")
        / 1000000.0 - 0.5).cast("float"))
    spark.range(16000).select(col("id").as("vec_id"), comps.as("embedding"),
        lit(0).as("label"))
      .repartition(8).write.mode("overwrite").parquet(dir.toString)
    val big = spark.read.parquet(dir.toString)
    println("----- PLANPAIR n65 above-threshold cell join -----")
    graft.ops.Similarity.pqKnnJoin(big).explain("formatted")
    spark.stop()
  }
}
