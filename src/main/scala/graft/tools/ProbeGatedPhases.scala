package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{IncrementalDedup, IncrementalDedupIndex, IncrementalEmbedDedup,
  IncrementalEmbedIndex}
import graft.queries.Tables

/**
 * Dev tool: phase attribution for the gated replay queries (round-12
 * verdict #3 — the n41/n52 driver-bench drift). Replays the n41/n52
 * bodies with timers around each phase — staging, the streamed batches,
 * the single post-stream compaction, and the final state read — so an
 * A/B against the pre-round-12 tree localises WHICH phase moved instead
 * of arguing about totals. Uses the same AvailableNow stream harness as
 * the gated queries (the micro-batch floor is part of the number being
 * adjudicated).
 *
 * Usage: runMain graft.tools.ProbeGatedPhases [sfDir] [n41|n52 ...]
 */
object ProbeGatedPhases {
  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = { val w = args.drop(1).toSet; if (w.isEmpty) Set("n41", "n52") else w }
    val spark = Sessions.local(32, logLevel = "ERROR")

    if (which("n52")) {
      val base = Tables.scratchDir("gatedphases-n52")
      val full = IncrementalEmbedDedup.corpus(spark, sfDir)
      val (tPrep, n) = time(full.count())
      val geom = IncrementalEmbedDedup.geometryFor(n)
      val index = new IncrementalEmbedIndex(base.resolve("state"),
        geometry = geom,
        bandBuckets = IncrementalEmbedDedup.bucketsFor(n, geom._2),
        idBuckets = IncrementalEmbedDedup.bucketsFor(n, 1))
      val (tStage, _) = time(
        IncrementalEmbedDedup.stageChunks(full, base.resolve("input"), 4))
      val (tStream, _) = time(IncrementalEmbedDedup.runStream(spark,
        base.resolve("input"), base.resolve("ckpt"), index))
      val (tCompact, _) = time(index.compact(spark))
      val (tRead, _) = time(index.finalClusters(spark).orderBy("vec_id")
        .write.format("noop").mode("overwrite").save())
      println(f"PHASES n52 rows=$n prep=$tPrep%.2f stage=$tStage%.2f " +
        f"stream=$tStream%.2f compact=$tCompact%.2f read=$tRead%.2f")
    }

    if (which("n58")) {
      import graft.ops.Multimodal
      val base = Tables.scratchDir("gatedphases-n58")
      val t0 = System.nanoTime()
      val feats = Multimodal.featureExtractWide(
        Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))).toDF()
      val corpus = feats
        .select(col("media_id").as("vec_id"), col("fv").as("embedding"))
        .unionByName(Multimodal.plantedMediaCopies(feats)
          .select(col("vec_id"), col("v").as("embedding")))
        .persist()
      val n = corpus.count()
      val tPrep = (System.nanoTime() - t0) / 1e9
      val geom = IncrementalEmbedDedup.geometryFor(n)
      val index = new IncrementalEmbedIndex(base.resolve("state"),
        geometry = geom,
        bandBuckets = IncrementalEmbedDedup.bucketsFor(n, geom._2),
        idBuckets = IncrementalEmbedDedup.bucketsFor(n, 1))
      val (tStage, _) = time(
        IncrementalEmbedDedup.stageChunks(corpus, base.resolve("input"), 4))
      corpus.unpersist()
      val (tStream, _) = time(IncrementalEmbedDedup.runStream(spark,
        base.resolve("input"), base.resolve("ckpt"), index))
      val (tCompact, _) = time(index.compact(spark))
      val (tRead, _) = time(index.finalClusters(spark)
        .withColumnRenamed("vec_id", "media_id").orderBy("media_id")
        .write.format("noop").mode("overwrite").save())
      println(f"PHASES n58 rows=$n prep=$tPrep%.2f stage=$tStage%.2f " +
        f"stream=$tStream%.2f compact=$tCompact%.2f read=$tRead%.2f")
    }

    if (which("n41")) {
      val base = Tables.scratchDir("gatedphases-n41")
      val docs = Tables.documents(spark, sfDir)
      val (tPrep, n) = time(docs.count())
      val index = new IncrementalDedupIndex(base.resolve("state"),
        bandBuckets = IncrementalEmbedDedup.bucketsFor(n, 16),
        idBuckets = IncrementalEmbedDedup.bucketsFor(n, 1))
      val (tStage, _) = time(
        IncrementalDedup.stageChunks(docs, base.resolve("input"), 4))
      val (tStream, _) = time(IncrementalDedup.runStream(spark,
        base.resolve("input"), base.resolve("ckpt"), index))
      val (tCompact, _) = time(index.compact(spark))
      val (tRead, _) = time(index.finalManifest(spark).orderBy("doc_id")
        .write.format("noop").mode("overwrite").save())
      println(f"PHASES n41 rows=$n prep=$tPrep%.2f stage=$tStage%.2f " +
        f"stream=$tStream%.2f compact=$tCompact%.2f read=$tRead%.2f")
    }

    spark.stop()
  }
}
