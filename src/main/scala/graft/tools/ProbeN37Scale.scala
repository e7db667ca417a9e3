package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale probe for the n37 embedding-clusters path (the round-7 verdict's
  * one `weak` item, closed in round 8 by routing n37 through the banded
  * candidate path at the separating 0.9 threshold): times the SHIPPED n37
  * pair+cluster pipeline on a ×k sign-flip-amplified corpus and prints
  * pair count, degree stats, and label-propagation rounds. The old
  * in-bulk exact path (0.45, quadratic qualifying pairs — 94.4 s at ×10
  * in round 7) can still be probed with a trailing `exact` arg; it runs
  * behind the allowQuadratic override.
  * Usage: runMain graft.tools.ProbeN37Scale [sfDir] [k] [exact]
  */
object ProbeN37Scale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val exact = args.contains("exact")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val amplified = ScaleCurve.amplifyEmbeddings(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), k)
      .repartition(32).persist()
    println(s"vectors: ${amplified.count()}")

    val t0 = System.nanoTime()
    val pairs = (if (exact)
      Dedup.embeddingNearDupPairsAuto(amplified, threshold = 0.45,
        allowQuadratic = true)
    else Dedup.embeddingLshNearDupPairs(amplified))
      .select("vec_a", "vec_b").persist()
    println(s"pairs: ${pairs.count()} " +
      f"(generated in ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"path=${if (exact) "exact-0.45" else "banded-0.9"})")
    val deg = pairs.select(col("vec_a").as("v"))
      .unionByName(pairs.select(col("vec_b").as("v")))
      .groupBy("v").count()
    deg.select(max("count").as("max_deg"), avg("count").as("avg_deg"),
      count(lit(1)).as("nodes")).show()

    val t1 = System.nanoTime()
    val labels = Dedup.minLabelComponents(pairs, "vec_a", "vec_b", "vec_id",
      maxIters = 60, onConverged = r => println(s"rounds: $r"))
    val comps = labels.groupBy("cluster_id").count()
      .agg(max("count").as("max_comp"), count(lit(1)).as("n_comps")).collect()(0)
    println(f"clustered in ${(System.nanoTime() - t1) / 1e9}%.1f s " +
      f"(total ${(System.nanoTime() - t0) / 1e9}%.1f s); " +
      s"max component ${comps.getLong(0)}, components ${comps.getLong(1)}")
    spark.stop()
  }
}
