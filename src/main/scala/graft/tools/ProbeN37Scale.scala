package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** One-off debug: why does the ×10 amplified embedding pair graph need
  * more than 20 label-propagation rounds? Prints pair count, degree
  * stats, and convergence at a higher iteration cap.
  * Usage: runMain graft.tools.ProbeN37Scale [sfDir] [k]
  */
object ProbeN37Scale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
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

    val pairs = Dedup.embeddingNearDupPairs(amplified).select("vec_a", "vec_b")
      .persist()
    println(s"pairs: ${pairs.count()}")
    val deg = pairs.select(col("vec_a").as("v"))
      .unionByName(pairs.select(col("vec_b").as("v")))
      .groupBy("v").count()
    deg.select(max("count").as("max_deg"), avg("count").as("avg_deg"),
      count(lit(1)).as("nodes")).show()

    val t0 = System.nanoTime()
    val labels = Dedup.minLabelComponents(pairs, "vec_a", "vec_b", "vec_id",
      maxIters = 60, onConverged = r => println(s"rounds: $r"))
    val comps = labels.groupBy("cluster_id").count()
      .agg(max("count").as("max_comp"), count(lit(1)).as("n_comps")).collect()(0)
    println(f"converged in ${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      s"max component ${comps.getLong(0)}, components ${comps.getLong(1)}")
    spark.stop()
  }
}
