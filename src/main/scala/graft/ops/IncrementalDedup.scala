package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.queries.Tables

/**
 * Incremental / streaming deduplication: the n38 per-document manifest
 * maintained continuously as documents arrive, instead of recomputed from
 * scratch. This is the composition a production corpus pipeline actually
 * runs — the reference's flagship path is a streaming source→sink lifecycle
 * (`/root/reference/tests/test_delta_end_to_end.py:72-90`) and the dedup
 * family (n01→n38) is what the micro-batches must maintain.
 *
 * Per micro-batch (`foreachBatch`, the d61 idempotent-write shape):
 *   1. compute the batch's shingle hashes, MinHash band hashes, and md5
 *      fingerprints with the SAME kernels the batch queries use
 *      ([[Dedup.wordShingles]] / [[Dedup.minHashSignature]] /
 *      [[Dedup.lshBands]]) — banding is per-document and deterministic, so
 *      candidate recall is batching-invariant;
 *   2. append them to the persisted index (one `b<batchId>` parquet part
 *      per table, overwrite mode + commit marker ⇒ checkpoint-replay
 *      idempotent, exactly the `IdempotentParquetWriter` contract);
 *   3. generate candidates STREAM-STATIC: batch bands ⋈ (index ∪ batch)
 *      on (band, bh) — every qualifying pair has at least one endpoint in
 *      the current batch, so each unordered pair is discovered exactly
 *      once across the run, in the batch where its younger member arrives;
 *   4. verify candidates with exact Jaccard ([[Dedup.verifyJaccard]]) and
 *      fold the new edges into the persisted cluster labels by CONTRACTING
 *      them through the current labels (endpoint → its component minimum)
 *      and running [[Dedup.minLabelComponents]] on the contracted graph —
 *      the graph of *touched components*, bounded by the batch's edge
 *      count, never the corpus. Labels are component-minimum doc_ids, so
 *      contraction preserves the global fixpoint: after every batch the
 *      label table equals what the batch algorithm would produce on all
 *      documents seen so far (bridging merges included — a batch that
 *      connects two existing clusters relabels the larger-min one, which
 *      can flip an old "keep" verdict to "near_dup", exactly as a batch
 *      recompute would);
 *   5. merge the batch's (fp, min doc_id) into the fingerprint-keeper
 *      snapshot and append arrival-time verdicts for the batch's documents
 *      to the manifest log.
 *
 * State layout under `root/`: `docs|shingles|bands|manifest/b<k>/`
 * (append-only parts), `labels|fpmin/v<k>/` (versioned snapshots; a batch
 * writes a new version only when it changes the table), `commits/<k>`,
 * plus `<table>/c<w>/` + `compactions/<w>` — the [[IncrementalDedupIndex.compact]]
 * part consolidation (small-files countermeasure, two-phase visibility;
 * the [[IncrementalEmbedIndex.compact]] contract).
 * The versioned-snapshot rewrite is the offline stand-in for a Delta
 * `MERGE` / RocksDB state store: per batch it costs one read+write of the
 * label and fp tables (each bounded by matched docs / distinct
 * fingerprints, not raw corpus bytes); at 100 TB the same plan lands on a
 * partitioned MERGE so only affected partitions rewrite. The expensive
 * stages — shingling, banding, candidate generation, verification — touch
 * only the batch and its collision partners, which is the entire point of
 * maintaining the index incrementally.
 *
 * Correctness claim (tested in `IncrementalDedupSpec`, oracle-gated as
 * n41): after `processAllAvailable`, [[IncrementalDedupIndex.finalManifest]]
 * equals the batch n38 manifest on the same documents — for ANY split of
 * the corpus into batches, because the edge set is batching-invariant
 * (step 3) and min-label contraction commutes with edge arrival order.
 */
final class IncrementalDedupIndex(root: Path, threshold: Double = 0.8,
                                  bandBuckets: Int = 64) {

  private val DocsDdl = "doc_id BIGINT, source STRING, fp STRING"
  private val ShinglesDdl = "doc_id BIGINT, sh_hashes ARRAY<BIGINT>"
  private val BandsDdl = "doc_id BIGINT, band INT, bh BIGINT"
  private val LabelsDdl = "doc_id BIGINT, lbl BIGINT"
  private val FpMinDdl = "fp STRING, fp_keep BIGINT"
  private val ManifestDdl =
    "doc_id BIGINT, source STRING, verdict STRING, keep_doc BIGINT"

  private def partDir(name: String, k: Long) = root.resolve(name).resolve(s"b$k")
  private def snapDir(name: String, k: Long) = root.resolve(name).resolve(s"v$k")
  private def compactDir(name: String, w: Long) = root.resolve(name).resolve(s"c$w")
  private def marker(k: Long) = root.resolve("commits").resolve(s"$k.committed")
  private def compactionMarker(w: Long) =
    root.resolve("compactions").resolve(s"$w.committed")

  /** The append-only part tables subject to [[compact]]; label/fpmin
    * snapshots version-rewrite themselves and need none. */
  private val PartTables = Seq(
    "docs" -> DocsDdl, "shingles" -> ShinglesDdl, "bands" -> BandsDdl,
    "manifest" -> ManifestDdl)

  /** Collision-bucket hive-partition column for the compacted BAND tree
    * the per-batch candidate probe joins against (the
    * [[IncrementalEmbedIndex]] treatment; round-11 verdict #1). The other
    * tables compact flat: `docs`/`manifest` are only read corpus-wide
    * (finalManifest/arrivalLog), and `shingles` verification is
    * endpoint-driven — a semi-join on ids discovered mid-batch, where a
    * bucket layout would buy a driver round-trip per batch, not a
    * cheaper plan. */
  private def bandBucketCol: org.apache.spark.sql.Column =
    pmod(xxhash64(col("band"), col("bh")), lit(bandBuckets.toLong))

  /** Committed ids of `name`'s `b<k>`/`v<k>` children strictly below `max`
    * (a dir counts once its `_SUCCESS` exists — an interrupted overwrite
    * has none and is re-written verbatim on replay). With `requireMarker`
    * the id must ALSO have its `commits/<id>` batch marker: `_SUCCESS` is
    * per-directory, so a crash between the docs part and the fpmin/labels
    * snapshots leaves a half-written batch whose parts individually look
    * complete — an external reader joining them would silently drop
    * new-fingerprint docs until the stream replays the batch. Public
    * readers therefore gate on the marker; intra-batch reads (processBatch
    * reading the snapshot it just wrote, before its own marker exists)
    * must not. */
  private def committedIds(name: String, prefix: String, max: Long,
                           requireMarker: Boolean = false): Seq[Long] = {
    val dir = root.resolve(name)
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith(prefix) && n.drop(prefix.length).forall(_.isDigit) &&
            Files.exists(p.resolve("_SUCCESS")))
          Some(n.drop(prefix.length).toLong)
            .filter(id => id < max && (!requireMarker || isCommitted(id)))
        else None
      }.toSeq
    } finally s.close()
  }

  private def emptyDf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType.fromDDL(ddl))

  /** Highest fully committed compaction watermark strictly below `max`:
    * every [[PartTables]] consolidated dir has `_SUCCESS` AND the
    * compaction marker exists — the batch-commit two-phase rule, so a
    * crash mid-compaction leaves readers on the uncompacted view
    * (the [[IncrementalEmbedIndex]] contract). */
  private def compactionWatermark(max: Long): Option[Long] =
    committedIds("docs", "c", max)
      .filter(w => Files.exists(compactionMarker(w)) &&
        PartTables.forall { case (n, _) =>
          Files.exists(compactDir(n, w).resolve("_SUCCESS")) })
      .maxOption

  /** Union of all committed append parts of `name` below batch `max`,
    * reading the consolidated tree for everything at or below the active
    * compaction watermark. `pruneTo = Some(buckets)` restricts the
    * COMPACTED read to those hive buckets (listing-time PartitionFilters —
    * the probe's collision-bucket pruning; only valid for tables with a
    * [[bucketCol]]); recent unpartitioned parts are always read in full
    * (batch-sized, bounded by the compaction cadence). */
  private def readParts(spark: SparkSession, name: String, max: Long,
                        ddl: String, requireMarker: Boolean = false,
                        pruneTo: Option[Seq[Long]] = None): DataFrame = {
    val cw = compactionWatermark(max)
    val ids = committedIds(name, "b", max, requireMarker)
      .filter(id => cw.forall(id > _))
    val compacted = cw.flatMap { w =>
      val root = compactDir(name, w)
      pruneTo match {
        case Some(bs) if name == "bands" =>
          // prune at OUR listing: the index knows its layout, so hand
          // Spark the selected leaf dirs + basePath — cost ∝ selected
          // buckets, never a full-tree discovery; the redundant isin
          // lands as the scan's PartitionFilters (the d73 shape)
          val withPart = StructType.fromDDL(s"$ddl, pb BIGINT")
          val leaves = bs.distinct.map(v => root.resolve(s"pb=$v"))
            .filter(Files.isDirectory(_)).map(_.toString)
          if (leaves.isEmpty) None
          else Some(spark.read.schema(withPart)
            .option("basePath", root.toString)
            .parquet(leaves: _*)
            .filter(col("pb").isin(bs: _*))
            .drop("pb"))
        case _ if name == "bands" =>
          Some(spark.read.schema(StructType.fromDDL(s"$ddl, pb BIGINT"))
            .parquet(root.toString).drop("pb"))
        case _ =>
          Some(spark.read.schema(StructType.fromDDL(ddl)).parquet(root.toString))
      }
    }
    val parts =
      if (ids.isEmpty) None
      else Some(spark.read.schema(StructType.fromDDL(ddl))
        .parquet(ids.map(partDir(name, _).toString): _*))
    (compacted.toSeq ++ parts.toSeq) match {
      case Seq() => emptyDf(spark, ddl)
      case dfs => dfs.reduce(_ unionByName _)
    }
  }

  /**
   * Consolidate every committed append part at or below the high-water
   * batch into one tree per [[PartTables]] table — the text twin of
   * [[IncrementalEmbedIndex.compact]] (see its scaladoc for the
   * small-files rationale and the two-phase crash story): consolidated
   * trees first (deterministic, overwrite-idempotent), the
   * `compactions/<w>` marker flips visibility, then superseded parts and
   * older compactions are deleted. Serial-maintainer discipline assumed.
   */
  def compact(spark: SparkSession): Option[Long] = {
    val ids = committedIds("docs", "b", Long.MaxValue, requireMarker = true)
    val prev = compactionWatermark(Long.MaxValue)
    // marker-less parts at or below the active watermark are crash-window
    // residue superseded by the consolidated tree (serial-maintainer
    // argument — see [[IncrementalEmbedIndex.compact]]); sweep them even
    // when nothing else needs compacting
    val staleBelow = prev.map(p =>
      committedIds("docs", "b", Long.MaxValue).filter(_ <= p))
      .getOrElse(Seq.empty)
    if (ids.size + (if (prev.isDefined) 1 else 0) < 2 && staleBelow.isEmpty)
      return None
    // max over parts AND the active watermark: after a post-marker crash
    // the only parts left can be stale ones BELOW the watermark, and a w
    // computed from parts alone would regress it
    val w = (ids ++ prev).max
    // watermark w already active = a prior run crashed after its marker
    // but before GC: consolidation is done (re-reading + overwriting the
    // same compacted dir would throw) — skip to completing the GC
    if (!prev.contains(w)) {
      PartTables.foreach { case (name, ddl) =>
        val base = readParts(spark, name, w + 1, ddl, requireMarker = true)
        // the probe-joined BAND tree lands hive-partitioned on its
        // collision-bucket key (deterministic content AND layout — a
        // post-crash re-run overwrites verbatim); the others stay flat.
        // The repartition ON the bucket column is load-bearing: without
        // it partitionBy fans out tasks×buckets tiny files.
        if (name == "bands")
          base.withColumn("pb", bandBucketCol)
            .repartition(col("pb"))
            .write.mode("overwrite").partitionBy("pb")
            .parquet(compactDir(name, w).toString)
        else
          base.write.mode("overwrite").parquet(compactDir(name, w).toString)
      }
      Files.createDirectories(compactionMarker(w).getParent)
      if (!Files.exists(compactionMarker(w))) Files.createFile(compactionMarker(w))
    }
    PartTables.foreach { case (name, _) =>
      (ids ++ staleBelow).distinct.filter(_ <= w)
        .foreach(id => deleteTree(partDir(name, id)))
      prev.filter(_ < w).foreach(p => deleteTree(compactDir(name, p)))
    }
    prev.filter(_ < w).foreach(p => Files.deleteIfExists(compactionMarker(p)))
    // snapshot-version + marker retention (round-9 verdict): sweep dead
    // snapshot versions, then prune markers the consolidated parts no
    // longer need — keeping the markers the latest snapshots still gate on
    gcSnapshots()
    pruneMarkers(w)
    Some(w)
  }

  /** The snapshot tables subject to version GC. */
  private val SnapTables = Seq("labels", "fpmin")

  /** Retention of superseded `labels`/`fpmin` snapshot versions — the
    * [[IncrementalEmbedIndex]] rule verbatim: only the latest
    * marker-committed version of each table is ever read, so everything
    * strictly below it is dead disk. The threshold is marker-gated (a
    * snapshot orphaned by a crash before its batch marker must not promote
    * and delete the real latest); versions above it are in-flight and
    * untouched; a crash mid-sweep leaves stale versions for the next sweep.
    * Runs from [[compact]] only (the maintenance pass — see
    * [[IncrementalEmbedIndex]] for the Delta-VACUUM positioning). */
  private def gcSnapshots(): Unit =
    SnapTables.foreach { name =>
      committedIds(name, "v", Long.MaxValue, requireMarker = true)
        .maxOption.foreach { keep =>
          committedIds(name, "v", keep).foreach(v =>
            deleteTree(snapDir(name, v)))
        }
    }

  /** Prune batch commit markers at or below the compaction watermark,
    * except those the latest committed `labels`/`fpmin` snapshots still
    * gate ([[finalManifest]] reads both marker-gated). A replayed batch
    * whose marker was pruned sees an EMPTY index view (its
    * `readParts(max = batchId)` excludes the compaction at w ≥ batchId —
    * round-10 advice: this doc previously claimed "the compacted view"),
    * so it re-derives only its WITHIN-batch edges; convergence still
    * holds because the replayed rows are identical to what the compacted
    * tree already contains (deterministic recompute; any snapshot version
    * it writes sits below the committed maximum readers resolve). That
    * argument needs identical rows — which is why [[processBatch]]
    * REJECTS batch ids strictly below the active watermark: a checkpoint
    * reset that assigned NEW data to a pruned id would have its parts
    * swept as stale by the next compaction, silently dropping the rows. */
  private def pruneMarkers(w: Long): Unit = {
    val keep = SnapTables.flatMap(n =>
      committedIds(n, "v", Long.MaxValue, requireMarker = true).maxOption).toSet
    val dir = root.resolve("commits")
    if (!Files.isDirectory(dir)) return
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".committed")) {
          val id = n.stripSuffix(".committed")
          if (id.nonEmpty && id.forall(_.isDigit) &&
              id.toLong <= w && !keep(id.toLong))
            Files.deleteIfExists(p)
        }
      }
    } finally s.close()
  }

  private def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  /** Latest committed snapshot of `name` below batch `max`. */
  private def readSnapshot(spark: SparkSession, name: String, max: Long,
                           ddl: String, requireMarker: Boolean = false): DataFrame =
    committedIds(name, "v", max, requireMarker).maxOption match {
      case Some(v) => spark.read.schema(StructType.fromDDL(ddl))
        .parquet(snapDir(name, v).toString)
      case None => emptyDf(spark, ddl)
    }

  def isCommitted(batchId: Long): Boolean = Files.exists(marker(batchId))

  /** The `foreachBatch` entry point. Replay-idempotent: a committed batch
    * short-circuits; an interrupted one recomputes deterministically and
    * overwrites its own parts (both end states identical — the
    * [[graft.sinks.IdempotentParquetWriter]] contract). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (isCommitted(batchId)) return
    // ids strictly below the active compaction watermark are rejected:
    // their parts would be swept as stale residue by the next compaction,
    // silently dropping the rows (see [[pruneMarkers]]). Exactly == w is
    // the legitimate crash window — the last compacted batch replayed
    // because the engine's commit log lagged the marker.
    compactionWatermark(Long.MaxValue).foreach(w =>
      require(batchId >= w,
        s"batch $batchId is below the active compaction watermark $w: " +
          "a checkpoint reset across a compaction must re-key new data " +
          "to fresh batch ids"))
    val spark = batch.sparkSession
    val b = batch.persist()
    val sh = b
      .select(col("doc_id"), Dedup.wordShingles(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"),
        array_sort(transform(col("shingles"), s => xxhash64(s))).as("sh_hashes"))
      .persist()
    val bandsB = sh
      .select(col("doc_id"),
        explode(Dedup.lshBands(Dedup.minHashSignature(col("sh_hashes")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      .persist()
    // collision-bucket pruning (the [[IncrementalEmbedIndex]] probe shape):
    // the compacted band read prunes to the batch's band-key buckets;
    // verification keeps the broadcast-candidate double scan of the
    // shingle table (see the embed index's verification note — an
    // endpoint semi-join's barriers measured costlier than the second
    // columnar scan)
    val edges = Dedup.verifyJaccard(candidatePairs(spark, bandsB, batchId),
        readParts(spark, "shingles", batchId, ShinglesDdl).unionByName(sh),
        threshold)
      .select("doc_a", "doc_b").persist()
    try {
      val docsB = b.select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
      docsB.write.mode("overwrite").parquet(partDir("docs", batchId).toString)
      sh.write.mode("overwrite").parquet(partDir("shingles", batchId).toString)
      bandsB.write.mode("overwrite").parquet(partDir("bands", batchId).toString)

      if (edges.limit(1).count() > 0)
        mergeLabels(spark, edges, batchId)
          .write.mode("overwrite").parquet(snapDir("labels", batchId).toString)

      // change-gated like labels: rewrite the fpmin snapshot only when the
      // batch introduces a new fingerprint or a smaller keeper. The check
      // is one fp-keyed left join bounded by the batch's distinct
      // fingerprints — far cheaper than the corpus-wide rewrite it skips
      // (and deterministic, so replay idempotence is unaffected).
      val oldFpmin = readSnapshot(spark, "fpmin", batchId, FpMinDdl)
      val batchFpmin = docsB.groupBy("fp").agg(min(col("doc_id")).as("fp_keep"))
      val fpChanged = batchFpmin.as("b")
        .join(oldFpmin.as("o"), Seq("fp"), "left")
        .filter(col("o.fp_keep").isNull || col("b.fp_keep") < col("o.fp_keep"))
        .limit(1).count() > 0
      if (fpChanged)
        oldFpmin.unionByName(batchFpmin)
          .groupBy("fp").agg(min(col("fp_keep")).as("fp_keep"))
          .write.mode("overwrite").parquet(snapDir("fpmin", batchId).toString)

      // arrival-time verdicts for THIS batch's documents (the append-only
      // audit log; a later bridging merge can supersede an old doc's
      // verdict, which is why finalManifest derives from state instead)
      manifestFor(docsB,
          readSnapshot(spark, "fpmin", batchId + 1, FpMinDdl),
          readSnapshot(spark, "labels", batchId + 1, LabelsDdl))
        .write.mode("overwrite").parquet(partDir("manifest", batchId).toString)

      Files.createDirectories(marker(batchId).getParent)
      if (!Files.exists(marker(batchId))) Files.createFile(marker(batchId))
    } finally {
      edges.unpersist(); bandsB.unpersist(); sh.unpersist(); b.unpersist()
    }
  }

  /** Stream-static candidate generation: batch bands against the committed
    * index plus the batch itself (within-batch pairs), deduped on the
    * normalized unordered pair. Every pair with a shared band has at least
    * one endpoint in SOME batch's `bandsB`, and the older endpoint is in
    * that batch's index view — so the union over batches of these candidate
    * sets is exactly the batch algorithm's candidate set. The compacted-
    * index read prunes to the batch's band-key buckets (a batch key can
    * only collide inside its own bucket). */
  private def candidatePairs(spark: SparkSession, bandsB: DataFrame,
                             batchId: Long): DataFrame = {
    // the bucket-set collect only pays when a compacted tree exists to
    // prune, and the leaf-dir read only engages when the batch covers at
    // most half the buckets — a bulk batch reads the root in one listing
    val pbSet =
      if (compactionWatermark(batchId).isEmpty) None
      else Some(bandsB.select(bandBucketCol.as("pb"))
          .distinct().collect().map(_.getLong(0)).toSeq)
        .filter(_.size <= bandBuckets / 2)
    val all = readParts(spark, "bands", batchId, BandsDdl,
      pruneTo = pbSet).unionByName(bandsB)
    bandsB.as("x").join(all.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
  }

  /** Fold verified batch edges into the label snapshot: contract each edge
    * endpoint through its current label (labels are component-minimum
    * doc_ids, so contraction preserves global minima), cluster the
    * contracted graph — whose size is bounded by the batch's edges, not
    * the corpus — and rewrite only labels that moved plus brand-new
    * endpoints. */
  private def mergeLabels(spark: SparkSession, edges: DataFrame,
                          batchId: Long): DataFrame = {
    val oldLabels = readSnapshot(spark, "labels", batchId, LabelsDdl)
    val contracted = edges
      .join(oldLabels.select(col("doc_id").as("doc_a"), col("lbl").as("la0")),
        Seq("doc_a"), "left")
      .join(oldLabels.select(col("doc_id").as("doc_b"), col("lbl").as("lb0")),
        Seq("doc_b"), "left")
      .select(coalesce(col("la0"), col("doc_a")).as("la"),
        coalesce(col("lb0"), col("doc_b")).as("lb"))
      .filter(col("la") =!= col("lb"))
    val mapping = Dedup.minLabelComponents(contracted, "la", "lb", "node")
      .select(col("node"), col("cluster_id"))
    val updatedOld = oldLabels
      .join(mapping.select(col("node").as("lbl"), col("cluster_id")),
        Seq("lbl"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("lbl")).as("lbl"))
    val newEndpoints = edges.select(col("doc_a").as("doc_id"))
      .unionByName(edges.select(col("doc_b").as("doc_id"))).distinct()
      .join(oldLabels.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(mapping.select(col("node").as("doc_id"), col("cluster_id").as("lbl")),
        "doc_id")
    updatedOld.unionByName(newEndpoints)
  }

  /** The n38 verdict CASE ([[Dedup.manifestVerdictCols]], the shared
    * builder) over (docs ⋈ fp keepers ⋈ cluster labels) —
    * `is_canonical ⟺ cluster_id = doc_id` because labels are component
    * minima, which is exactly what the batch path's explicit flag encodes. */
  private def manifestFor(docs: DataFrame, fpmin: DataFrame,
                          labels: DataFrame): DataFrame =
    docs.join(fpmin, "fp")
      .join(labels.select(col("doc_id"), col("lbl").as("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("is_canonical", col("cluster_id") === col("doc_id"))
      .select(col("doc_id") +: col("source") +:
        Dedup.manifestVerdictCols("doc_id", "keep_doc"): _*)

  /** The manifest implied by the final state — row-identical to the batch
    * n38 manifest over every ingested document. Marker-gated: only fully
    * committed batches contribute, so an external reader racing a crash
    * never joins a docs part against a missing fpmin/labels snapshot. */
  def finalManifest(spark: SparkSession): DataFrame =
    manifestFor(readParts(spark, "docs", Long.MaxValue, DocsDdl, requireMarker = true),
      readSnapshot(spark, "fpmin", Long.MaxValue, FpMinDdl, requireMarker = true),
      readSnapshot(spark, "labels", Long.MaxValue, LabelsDdl, requireMarker = true))

  /** The append-only arrival audit log: one verdict row per document,
    * written in the batch that ingested it, judged against the state AS OF
    * that batch. Exactly one row per ingested doc; a row can differ from
    * [[finalManifest]] only by a later batch superseding it (an exact-dup
    * keeper dethroned by a smaller doc_id, or a bridging merge relabeling
    * a cluster) — `IncrementalDedupSpec` asserts both properties. */
  def arrivalLog(spark: SparkSession): DataFrame =
    readParts(spark, "manifest", Long.MaxValue, ManifestDdl,
      requireMarker = true)
}

object IncrementalDedup {

  /** Stage `docs` as `chunks` arrival groups (one parquet file each,
    * written sequentially so modification-time ordering gives one file per
    * micro-batch under maxFilesPerTrigger=1). The split key is arbitrary:
    * the final manifest is batching-invariant. */
  private[ops] def stageChunks(docs: DataFrame, input: Path, chunks: Int,
                               from: Int = 0): Unit =
    (from until chunks).foreach { c =>
      docs.filter(pmod(col("doc_id"), lit(chunks)) === c)
        .coalesce(1).write.mode("append").parquet(input.toString)
    }

  /** One AvailableNow run of the incremental pipeline over whatever staged
    * files the checkpoint has not seen yet. */
  private[ops] def runStream(spark: SparkSession, input: Path, ckpt: Path,
                             index: IncrementalDedupIndex): Unit = {
    val schema = spark.read.parquet(input.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(input.toString)
      .writeStream
      .foreachBatch((df: DataFrame, id: Long) => index.processBatch(df, id))
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .queryName("graft:n41")
      .start()
    q.awaitTermination()
  }

  /** n41: ingest the documents table as a 4-batch file stream through the
    * incremental index, COMPACT the part tables (putting the maintenance
    * pass inside the driver's oracle gate, as in the n52 twin), then emit
    * the manifest implied by the final state. Oracle: the batch n38 SQL
    * ([[Dedup.dedupManifestOracle]]) verbatim — the whole point is that
    * incremental maintenance converges to the batch answer. */
  def streamingManifestQuery(spark: SparkSession, dir: String,
                             chunks: Int = 4): DataFrame = {
    val base = Tables.scratchDir("n41")
    val docs = Tables.documents(spark, dir)
    // size the collision buckets with corpus size exactly as the n52/n58
    // embed/media paths do (round-11 advice: a fixed default here would
    // undercut the fixed-rows-per-bucket argument pruning rests on);
    // the text index bands with the lshBands default of 16 bands/doc
    val index = new IncrementalDedupIndex(base.resolve("state"),
      bandBuckets = IncrementalEmbedDedup.bucketsFor(docs.count(), 16))
    stageChunks(docs, base.resolve("input"), chunks)
    runStream(spark, base.resolve("input"), base.resolve("ckpt"), index)
    index.compact(spark)
    index.finalManifest(spark).orderBy("doc_id")
  }
}
