package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.Tables._

/** Dev-only: A/B the n03 verify-stage kernels end-to-end.
  * Variants: sorted+SortedIntersectCount (current), sorted+array_intersect,
  * unsorted+array_intersect (round-4 shape).
  * Usage: runMain graft.tools.ProfileN03AB <sfDir>
  */
object ProfileN03AB {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def n03(docs: DataFrame, sorted: Boolean,
          nCommon: (Column, Column) => Column): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val hashes = transform(col("shingles"), s => xxhash64(s))
    val sh = docs.repartition(par)
      .select(col("doc_id"), Dedup.wordShingles(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sh_hashes", if (sorted) array_sort(hashes) else hashes)
      .persist()
    val ex = sh.select(col("doc_id"), size(col("sh_hashes")).as("sz"),
      explode(col("sh_hashes")).as("sh"))
    val freq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val prefix = ex.join(freq, "sh")
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * lit(0.8)) + 1)
      .select("doc_id", "sh")
    val candidates = prefix.as("x").join(prefix.as("y"), Seq("sh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh_hashes").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh_hashes").as("sh_b")), "doc_b")
      .withColumn("n_common", nCommon(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sic: (Column, Column) => Column =
      (a, b) => graft.functions.SortedIntersectCount(a, b)
    val ai: (Column, Column) => Column =
      (a, b) => size(array_intersect(a, b))
    val variants = Seq(
      "sorted+SIC " -> (() => n03(documents(spark, sfDir), sorted = true, sic)),
      "sorted+AI  " -> (() => n03(documents(spark, sfDir), sorted = true, ai)),
      "unsorted+AI" -> (() => n03(documents(spark, sfDir), sorted = false, ai)))

    // warmup all codegen paths once
    variants.foreach { case (_, f) => noop(f()); spark.catalog.clearCache() }
    (1 to 3).foreach { round =>
      variants.foreach { case (label, f) =>
        val t0 = System.nanoTime()
        noop(f())
        println(f"ROUND $round $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
