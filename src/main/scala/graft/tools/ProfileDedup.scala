package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.Tables._

/** Dev-only: phase-level timing for the near-dup pipelines (n02/n03),
  * mirroring the operators' CURRENT shapes (once-hashed sorted xxhash64
  * arrays, codegen SortedIntersectCount verify — see Dedup.scala; the
  * end-to-end kernel A/B lives in [[ProfileN03AB]]).
  * Usage: runMain graft.tools.ProfileDedup <sfDir>
  */
object ProfileDedup {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch the parquet + codegen machinery
    t("warmup")(noop(documents(spark, sfDir).select(md5(col("text")))))

    def verify(candidates: DataFrame, sh: DataFrame): DataFrame =
      candidates
        .join(sh.select(col("doc_id").as("doc_a"), col("sh_hashes").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh_hashes").as("sh_b")), "doc_b")
        .withColumn("n_common",
          graft.functions.SortedIntersectCount(col("sh_a"), col("sh_b")))
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
        .filter(col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")

    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val docs = documents(spark, sfDir)
      val par = spark.sparkContext.defaultParallelism

      // shared shingle+hash stage (both operators persist this table)
      val sh = docs.repartition(par)
        .select(col("doc_id"), Dedup.wordShingles(col("text")).as("shingles"))
        .filter(size(col("shingles")) > 0)
        .withColumn("sh_hashes", array_sort(transform(col("shingles"), s => xxhash64(s))))
        .persist()
      t("shingle+hash")(noop(sh))

      // ---- n03 phases
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
        .persist()
      t("n03.prefix+candidates")(noop(candidates))
      t("n03.verify")(noop(verify(candidates, sh).orderBy("doc_a", "doc_b")))

      // ---- n02 phases (reuses the shared shingle table)
      val banded = sh
        .select(col("doc_id"),
          explode(Dedup.lshBands(Dedup.minHashSignature(col("sh_hashes")))).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.bh"))
        .persist()
      t("n02.band")(noop(banded))
      val cand2 = banded.as("x").join(banded.as("y"), Seq("band", "bh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .persist()
      t("n02.candidates")(noop(cand2))
      t("n02.verify")(noop(verify(cand2, sh).orderBy("doc_a", "doc_b")))

      Seq(sh, candidates, banded, cand2).foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
