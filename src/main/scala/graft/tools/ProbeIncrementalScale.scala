package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{IncrementalDedupIndex, IncrementalEmbedDedup, IncrementalEmbedIndex}

/**
 * Dev tool: per-batch cost curve for the INCREMENTAL indexes (round-9
 * verdict #3; round-11 verdict #1). The 100 TB claim for n41/n52 is that
 * per-batch work touches only the batch and its band-collision partners.
 * This probe measures it directly: grow the index to ×1 / ×k rows (the
 * ScaleCurve amplification constructions, so duplicate structure scales
 * instead of degenerating), COMPACT it (the maintenance pass a deployment
 * schedules — compaction re-buckets the index into its hive-partitioned
 * collision-bucket layout), then time additional constant-size batches.
 *
 * Round 11 implemented the band-key partition pruning this probe's
 * round-10 scaladoc predicted: the compacted `bands` trees are
 * hive-partitioned on bounded hash buckets and the per-batch candidate
 * probe prunes its read to the batch's collision buckets (explicit leaf
 * dirs — listing cost ∝ selected buckets — with the isin surfacing as
 * PartitionFilters, the d73 treatment). Round 12 extended the same
 * treatment to the units/shingles VERIFICATION reads (id-hash bucketed,
 * pruned to the candidate endpoints' buckets) and made compaction tiered
 * (delta levels, bin-packed every maxLevels passes) — the probe times
 * both compaction kinds. Two batch regimes are measured per scale:
 *
 *  - `extra_a`/`extra_b`: a BULK batch (the sf's full fresh slice, halved)
 *    whose band keys cover every bucket — the coverage guard reads the
 *    full tree in one listing, so its cost still carries the (narrow,
 *    columnar) index scan term; this is the worst-case batch;
 *  - `trickle`: a ~0.8% arrival slice — the continuous-ingest regime the
 *    incremental index exists for — whose key set covers a FRACTION of
 *    the buckets: its read volume is coverage(K, P) × index, which the
 *    bucket sizing ([[IncrementalEmbedDedup.bucketsFor]]: fixed target
 *    rows per bucket, P growing with the index) keeps ≈ constant as the
 *    index scales.
 *
 * Usage: runMain graft.tools.ProbeIncrementalScale [sfDir] [k ...]
 * (default sf0.1, k ∈ {1, 10}); prints one PERBATCH line per (index, k).
 * The n41 text section is skipped above ×10 (its ×100 build is minutes;
 * n41 was measured FLAT already in round 10 — batch-side work dominates).
 */
object ProbeIncrementalScale {

  def main(args: Array[String]): Unit = {
    // "liftclamp" lifts the 4096 bucket cap (the two-level pb=/sub= layout
    // takes over past it) so the x100 trickle row can be measured at the
    // bucket count bucketsFor would choose unclamped (round-12 verdict #4)
    val liftClamp = args.contains("liftclamp")
    val rest0 = args.filterNot(_ == "liftclamp")
    val sfDir = rest0.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (rest0.length > 1) rest0.drop(1).map(_.toInt).toSeq else Seq(1, 10)
    val spark = Sessions.local(32, logLevel = "ERROR")
    val base = graft.queries.Tables.scratchDir("incscale")

    for (k <- reps) {
      // ---- text index (n41 shape) -------------------------------------
      if (k <= 10) {
        val docs = ScaleCurve.amplifyDocuments(
          spark.read.parquet(s"$sfDir/documents.parquet"), k).persist()
        val n = docs.count()
        val tIdx = new IncrementalDedupIndex(base.resolve(s"text-x$k"),
          bandBuckets = IncrementalEmbedDedup.bucketsFor(n, 16),
          idBuckets = IncrementalEmbedDedup.bucketsFor(n, 1))
        val tBuild = time {
          (0 to 3).foreach(j =>
            tIdx.processBatch(docs.filter(pmod(col("doc_id"), lit(4)) === j), j))
        }
        val tCompFull = time { tIdx.compact(spark) }
        // constant-size fresh batch: word-suffix disjoint from every index
        // replica (suffixes _1.._9), id range above the replica space
        val extra = freshDocs(spark.read.parquet(s"$sfDir/documents.parquet"))
          .persist()
        val nx = extra.count()
        val tExtraA = time { tIdx.processBatch(extra.filter(pmod(col("doc_id"), lit(2)) === 0), 4L) }
        val tExtraB = time { tIdx.processBatch(extra.filter(pmod(col("doc_id"), lit(2)) === 1), 5L) }
        val trickleD = extra.filter(pmod(xxhash64(col("doc_id")), lit(128)) === 3)
        val ntr = trickleD.count()
        val tTrickle = time { tIdx.processBatch(trickleD, 6L) }
        // round-12 tiering: a second maintenance pass consolidates ONLY
        // batches 4-6 into a delta level — its cost tracks new data, not
        // index size (vs the full-merge build compaction above)
        val tCompDelta = time { tIdx.compact(spark) }
        println(f"PERBATCH n41 x$k index_rows=$n build=$tBuild%.2f s " +
          f"extra_batch_rows=${nx / 2} extra_a=$tExtraA%.2f s extra_b=$tExtraB%.2f s " +
          f"trickle_rows=$ntr trickle=$tTrickle%.2f s " +
          f"compact_full=$tCompFull%.2f s compact_delta=$tCompDelta%.2f s")
        docs.unpersist(); extra.unpersist(); spark.catalog.clearCache()
      }

      // ---- embedding index (n52 shape) --------------------------------
      val emb = ScaleCurve.amplifyEmbeddings(
        spark.read.parquet(s"$sfDir/embeddings.parquet"), k)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .persist()
      val ne = emb.count()
      // geometry + bucket layout pinned for the FINAL corpus (index +
      // extra), as a real deployment would size them
      val geom = IncrementalEmbedDedup.geometryFor(ne + ne / k)
      val bkts = IncrementalEmbedDedup.bucketsFor(ne + ne / k, geom._2,
        maxBuckets = if (liftClamp) 65536L else 4096L)
      val eIdx = new IncrementalEmbedIndex(base.resolve(s"emb-x$k"),
        geometry = geom, bandBuckets = bkts,
        idBuckets = IncrementalEmbedDedup.bucketsFor(ne + ne / k, 1))
      val eBuild = time {
        (0 to 3).foreach(j =>
          eIdx.processBatch(emb.filter(pmod(xxhash64(col("vec_id")), lit(4)) === j), j))
      }
      val eCompFull = time { eIdx.compact(spark) }
      val extraE = freshEmbeddings(spark.read.parquet(s"$sfDir/embeddings.parquet"))
        .persist()
      val nex = extraE.count()
      val eExtraA = time { eIdx.processBatch(extraE.filter(pmod(xxhash64(col("vec_id")), lit(2)) === 0), 4L) }
      val eExtraB = time { eIdx.processBatch(extraE.filter(pmod(xxhash64(col("vec_id")), lit(2)) === 1), 5L) }
      val trickleE = extraE.filter(pmod(xxhash64(col("vec_id")), lit(128)) === 3)
      val netr = trickleE.count()
      val eTrickle = time { eIdx.processBatch(trickleE, 6L) }
      val eCompDelta = time { eIdx.compact(spark) }
      println(f"PERBATCH n52 x$k index_rows=$ne bits=${geom._1} bands=${geom._2} " +
        f"buckets=$bkts build=$eBuild%.2f s extra_batch_rows=${nex / 2} " +
        f"extra_a=$eExtraA%.2f s extra_b=$eExtraB%.2f s " +
        f"trickle_rows=$netr trickle=$eTrickle%.2f s " +
        f"compact_full=$eCompFull%.2f s compact_delta=$eCompDelta%.2f s")
      emb.unpersist(); extraE.unpersist(); spark.catalog.clearCache()
    }
    spark.stop()
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  /** A fresh constant-size arrival slice: replica "x" — word suffix
    * disjoint from the ×k replicas' `_j` suffixes, ids above their range. */
  private def freshDocs(docs: DataFrame): DataFrame =
    docs.select((col("doc_id") + lit(990000000L)).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), "\\s+"),
        w => concat(w, lit("_x")))).as("text"),
      col("lang"), col("source"), col("n_chars"))

  /** A fresh constant-size vector slice under its own sign-flip isometry
    * (cosines against every index replica fall in the random bulk). */
  private def freshEmbeddings(emb: DataFrame): DataFrame =
    emb.select((col("vec_id") + lit(990000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(pmod(xxhash64(lit(99), i), lit(2)) === 0, x.cast("double"))
          .otherwise(-x.cast("double"))).as("embedding"))
}
