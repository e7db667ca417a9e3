package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, IncrementalEmbedDedup, IncrementalEmbedIndex}

/**
 * Dev tool: stage-level breakdown of the n52 per-batch probe cost at a
 * given index scale — which index-size-proportional term actually grows
 * (band-index scan, unit-vector scan, candidate join, or the exact-verify
 * edge stage). Drove the round-11 band-key partition pruning; round 12
 * added the unit-table pruning, so the probe now measures each stage in
 * BOTH regimes against the COMPACTED bucketed index:
 *
 *  - `*_full`: unpruned scans — the bulk-batch fallback path;
 *  - trickle `cand`/`edge`: the stages as a trickle batch runs them,
 *    band reads pruned to the batch's collision buckets and unit reads
 *    pruned to the candidate endpoints' id buckets. The round-12 claim is
 *    `edge` ~flat as the index grows (it was the last per-batch term that
 *    scaled with index size).
 *
 * Usage: runMain graft.tools.ProbeEmbedBatchBreakdown [sfDir] [k ...]
 */
object ProbeEmbedBatchBreakdown {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10)
    val spark = Sessions.local(32, logLevel = "ERROR")
    val base = graft.queries.Tables.scratchDir("incbreak")

    for (k <- reps) {
      val emb = ScaleCurve.amplifyEmbeddings(
        spark.read.parquet(s"$sfDir/embeddings.parquet"), k)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .persist()
      val ne = emb.count()
      val geom = IncrementalEmbedDedup.geometryFor(ne + ne / k)
      val buckets = IncrementalEmbedDedup.bucketsFor(ne + ne / k, geom._2)
      val idBuckets = IncrementalEmbedDedup.bucketsFor(ne + ne / k, 1)
      val idx = new IncrementalEmbedIndex(base.resolve(s"emb-x$k"),
        geometry = geom, bandBuckets = buckets, idBuckets = idBuckets)
      (0 to 3).foreach(j =>
        idx.processBatch(emb.filter(pmod(xxhash64(col("vec_id")), lit(4)) === j), j))

      val extra = emb.sparkSession.read.parquet(s"$sfDir/embeddings.parquet")
        .select((col("vec_id") + lit(990000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(pmod(xxhash64(lit(99), i), lit(2)) === 0, x.cast("double"))
              .otherwise(-x.cast("double"))).as("embedding"))
        .persist()
      extra.count()

      // warm batch (JIT/codegen), then a planted-copy bulk batch so the
      // LABELS store is populated ∝ index size (amplified vectors are
      // pairwise-distant, so without planted partners no batch ever emits
      // an edge and the label path would measure an empty store), then
      // COMPACT — the stages below probe the bucketed compacted layout,
      // as a post-maintenance batch would
      val tWarm = time { idx.processBatch(extra.filter(pmod(xxhash64(col("vec_id")), lit(2)) === 0), 4L) }
      val planted = Dedup.plantedCopies(emb)
        .select(col("vec_id"), col("v").as("embedding")).persist()
      val nPlant = planted.count()
      val tPlant = time { idx.processBatch(planted, 5L) }
      val tCompact = time { idx.compact(spark) }

      // unpruned (bulk-fallback) scan costs
      val tScanBands = time {
        idx.debugReadBands(spark, 6L).agg(count(lit(1))).collect()
      }
      val tScanUnits = time {
        idx.debugReadUnits(spark, 6L)
          .agg(sum(element_at(col("u"), 1))).collect()
      }

      // trickle batch: ~0.8% arrival slice — the regime the pruning
      // exists for; replicate processBatch's stages with its pruned reads
      val trick = extra.filter(pmod(xxhash64(col("vec_id")), lit(256)) === 3)
        .persist()
      val ntr = trick.count()
      val unitB = trick
        .select(col("vec_id"), Dedup.unitVector(col("embedding")).as("u"))
        .persist()
      val bandsB = unitB
        .select(col("vec_id"), posexplode(
          Dedup.signBandCol(col("u"), geom._1, geom._2))
          .as(Seq("band", "bh")))
        .persist()
      val tKernel = time { bandsB.agg(count(lit(1))).collect() }
      val pbSet = bandsB.select(idx.debugBandBucket.as("pb"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val allBands = idx.debugReadBands(spark, 6L,
          pruneTo = Some(pbSet).filter(_.size <= buckets / 2))
        .unionByName(bandsB)
      val candidates = bandsB.as("x").join(allBands.as("y"), Seq("band", "bh"))
        .filter(col("x.vec_id") =!= col("y.vec_id"))
        .select(least(col("x.vec_id"), col("y.vec_id")).as("vec_a"),
          greatest(col("x.vec_id"), col("y.vec_id")).as("vec_b"))
        .distinct().persist()
      var nCand = 0L
      val tCand = time { nCand = candidates.count() }
      val ubSet = candidates.select(explode(array(
          idx.debugIdBucket(col("vec_a")), idx.debugIdBucket(col("vec_b"))))
          .as("pb"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val allUnits = idx.debugReadUnits(spark, 6L,
          pruneTo = Some(ubSet).filter(_.size <= idBuckets / 2))
        .unionByName(unitB)
      val edges = candidates
        .join(allUnits.select(col("vec_id").as("vec_a"), col("u").as("ua")), "vec_a")
        .join(allUnits.select(col("vec_id").as("vec_b"), col("u").as("ub")), "vec_b")
        .filter(graft.functions.DotProduct(col("ua"), col("ub")) >= 0.9)
        .select("vec_a", "vec_b").persist()
      var nEdge = 0L
      val tEdge = time { nEdge = edges.count() }
      candidates.unpersist(); edges.unpersist(); bandsB.unpersist(); unitB.unpersist()
      // the label-merge's snapshot read (round-12 verdict #5: the next
      // index-size-proportional read on the list — the per-batch merge
      // reads the FULL latest labels snapshot, here populated with one
      // label row per planted-pair member). Measured as scan + the count
      // it feeds, at each scale: prune only if this grows.
      var nLbl = 0L
      val tSnap = time {
        nLbl = idx.debugReadLabels(spark, 6L).count()
      }
      val tFull = time { idx.processBatch(trick, 6L) }
      // an EDGE-BEARING trickle (copies of an already-planted slice, at a
      // third id offset): the full per-batch cost including a real label
      // merge against the populated store — the verdict-#5 number
      val trickDup = Dedup.plantedCopies(
          emb.filter(pmod(xxhash64(col("vec_id")), lit(256)) === 5))
        .select((col("vec_id") + lit(Dedup.PlantOffset)).as("vec_id"),
          col("v").as("embedding"))
        .persist()
      val nDup = trickDup.count()
      val tFullDup = time { idx.processBatch(trickDup, 7L) }
      // a genuinely SPARSE edge-bearing trickle at every scale (round-13
      // verdict #3): a FIXED-size dup set — sliced from the BASE table, so
      // its absolute size does not grow with k — keeps endpoint pruning
      // engaged at ×100, where full_dup's ∝-index dup slice covers most
      // buckets and measures the bulk-regime fallback instead. This is the
      // row that measures the pruned label merge itself.
      val sparseDup = Dedup.plantedCopies(
          spark.read.parquet(s"$sfDir/embeddings.parquet")
            .filter(pmod(xxhash64(col("vec_id")), lit(256)) === 9)
            .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("embedding")))
        .select((col("vec_id") + lit(2 * Dedup.PlantOffset)).as("vec_id"),
          col("v").as("embedding"))
        .persist()
      val nSparse = sparseDup.count()
      val tFullSparse = time { idx.processBatch(sparseDup, 8L) }
      println(f"BREAKDOWN x$k rows=$ne geom=$geom buckets=$buckets " +
        f"warm=$tWarm%.2f compact=$tCompact%.2f " +
        f"scan_bands_full=$tScanBands%.2f scan_units_full=$tScanUnits%.2f " +
        f"trickle_rows=$ntr kernel=$tKernel%.2f " +
        f"cand=$tCand%.2f(n=$nCand,pb=${pbSet.size}) " +
        f"edge=$tEdge%.2f(n=$nEdge,ub=${ubSet.size}) " +
        f"plant=$tPlant%.2f(n=$nPlant) snap=$tSnap%.2f(n=$nLbl) " +
        f"full=$tFull%.2f full_dup=$tFullDup%.2f(n=$nDup) " +
        f"full_sparse=$tFullSparse%.2f(n=$nSparse)")
      emb.unpersist(); extra.unpersist(); trick.unpersist()
      planted.unpersist(); trickDup.unpersist(); sparseDup.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
}
