package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/**
 * Incremental / streaming IVF-PQ index: the n61 ANN scan maintained
 * continuously as vectors arrive — the index twin of [[IncrementalDedup]]
 * (n41) for the similarity-search side of the pipeline. A 100 TB
 * embedding store is INGESTED, not loaded: each micro-batch PQ-encodes
 * its vectors map-side (the codegen [[graft.functions.PqEncodeExpr]]
 * argmin) and appends one `(vec_id, label, cell, codes)` part; queries
 * run against whatever has committed, reading ONLY the probed cells.
 * Reference behavior anchor: the reference's streaming app composes
 * exactly this ingest shape (`foreachBatch` over an admission-throttled
 * source, `src/pyspark_streaming_base/app/app.py:61-76`); the index
 * semantics are n61's.
 *
 * Fourth subclass of [[IncrementalStateMachine]]: one append-only
 * `codes/` part table whose compacted levels are COLLISION-BUCKETED ON
 * THE IVF CELL (`Bucketing(cell, nlist)`) — so a query's probed-cell
 * read is a listing-time prune to `nProbe` of `nlist` leaf dirs, the
 * IVF cost dial realized as directory layout (the round-11 pruned-read
 * treatment, with the bucket key being the SEMANTIC cell instead of a
 * hash). No snapshots, no label merging, no relabel log: PQ codes and
 * cells are PER-ROW functions of the vector, so the state is write-once
 * by construction and every maintenance concern reduces to the base
 * tiered compaction + GC.
 *
 * Correctness claim (oracle-gated as n63): encode and cell assignment
 * are deterministic per row and batching-independent, so after
 * `processAllAvailable` the compacted codes table equals the batch n61
 * index EXACTLY for any batching — the query result hash-matches the
 * batch [[Similarity.ivfPqOracle]] verbatim (the n41/n48/n52 convergence
 * pattern, here with equality per row rather than per fixpoint).
 * Replay idempotence, tiering, crash windows, and pruned-read parity are
 * the base machine's, exercised over this subclass in
 * `IncrementalAnnSpec`.
 */
final class IncrementalIvfPqIndex(root: Path,
                                  override protected val maxLevels: Int = 4)
  extends IncrementalStateMachine(root) {

  private val (nList, nProbeDefault) = Similarity.debugIvfGeometry
  private val CodesDdl = "vec_id BIGINT, label INT, cell BIGINT, codes ARRAY<INT>"

  override protected def partTables: Seq[PartTable] =
    Seq(PartTable("codes", CodesDdl,
      bucket = Some(Bucketing(col("cell"), nList))))

  override protected def snapTables: Seq[(String, String)] = Seq.empty

  /** The `foreachBatch` entry point (replay-idempotent, n41 contract):
    * one map-side encode pass, one batch-sized part write — per-batch
    * cost ∝ batch, never ∝ index, with nothing to merge. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (isCommitted(batchId)) return
    rejectBelowWatermark(batchId)
    val v = transform(col("embedding"), x => x.cast("double"))
    batch
      .select(col("vec_id"), col("label"),
        Similarity.ivfCellCol(v).cast("long").as("cell"),
        Similarity.pqEncodeCol(v).as("codes"))
      .write.mode("overwrite").parquet(partDir("codes", batchId).toString)
    commitBatch(batchId)
  }

  /** The maintenance position: base tiered compaction + GC (parts →
    * cell-bucketed levels, dead markers pruned). */
  def maintain(spark: SparkSession): Unit = { compact(spark); () }

  /**
   * ANN top-k against the committed index: probe set and LUT are integer
   * driver arithmetic from the query vector ([[Similarity.probeCellsLocal]]
   * — no Spark job), the codes read is listing-pruned to the probed
   * cells' leaf dirs, and ranking is the codegen ADC lookup sum. The
   * `cell isin` filter re-applies the probe on pre-compaction parts
   * (batch-sized, unbucketed by design) and is a no-op on pruned levels.
   */
  def topK(spark: SparkSession, queryVec: Seq[Float], k: Int = 5,
           nProbe: Int = 0, excludeVecId: Long = -1L): DataFrame = {
    val q = graft.functions.ProductQuantization.quantize(
      queryVec.map(_.toDouble))
    val cells = Similarity.probeCellsLocal(q,
      if (nProbe > 0) nProbe else nProbeDefault)
    readParts(spark, "codes", Long.MaxValue, CodesDdl,
        requireMarker = true, pruneTo = Some(cells))
      .filter(col("cell").isInCollection(cells))
      .filter(col("vec_id") =!= excludeVecId)
      .select(col("vec_id"), col("label"),
        Similarity.pqAdcCol(col("codes"), q).as("adist"))
      // nulls-ascending would rank a malformed (null-distance) row above
      // every real neighbor — drop them, matching the batch n61 path
      .filter(col("adist").isNotNull)
      .orderBy(col("adist"), col("vec_id"))
      .limit(k)
  }

  /**
   * IVFADC-R over the committed index (round 16, the n75 two-stage
   * shape on streaming state): the ADC shortlist comes from [[topK]] at
   * R — a listing-pruned read of the probed cells' CODES, never the
   * vectors — and only those R full vectors are fetched from the SOURCE
   * table by a broadcast of the shortlist ids, then re-scored with the
   * exact integer quantized dot ([[Similarity.exactRerank]]). This is
   * the 100 TB separation of concerns the index exists for: the state
   * machine persists 32-byte codes; the 512-byte vectors stay in the
   * (already-stored-anyway) source table and are touched R times per
   * query. Index state == the batch encode per row (the n63 theorem),
   * so this hash-matches the batch n75 oracle verbatim.
   */
  def topKRerank(spark: SparkSession, vectors: DataFrame,
                 queryVec: Seq[Float], queryVecId: Long, k: Int = 5,
                 r: Int = 100, nProbe: Int = 0): DataFrame = {
    val shortlist = topK(spark, queryVec, k = r, nProbe = nProbe,
      excludeVecId = queryVecId)
    Similarity.exactRerank(vectors, shortlist, queryVecId, k)
  }

  /** Dev/spec accessor: the full committed codes table. */
  private[graft] def debugCodes(spark: SparkSession): DataFrame =
    readParts(spark, "codes", Long.MaxValue, CodesDdl, requireMarker = true)
}

object IncrementalAnn {

  /** n63: ingest the embeddings table as a `chunks`-batch file stream
    * through the incremental index, run the maintenance pass (parts →
    * cell-bucketed levels — inside the driver's oracle gate, as
    * n41/n48/n52 run compact()), then answer the n61 query (vec 0's
    * top-5 by ADC distance over its probed cells) from the index.
    * Oracle: the batch [[Similarity.ivfPqOracle]] verbatim. */
  def streamingIvfPqQuery(spark: SparkSession, dir: String,
                          chunks: Int = 4): DataFrame = {
    val base = Tables.scratchDir("n63")
    val index = new IncrementalIvfPqIndex(base.resolve("state"))
    StreamHarness.stageChunks(Tables.embeddings(spark, dir),
      pmod(col("vec_id"), lit(chunks)), base.resolve("input"), chunks)
    StreamHarness.run(spark, base.resolve("input"), base.resolve("ckpt"),
      "graft:n63")(index.processBatch)
    index.maintain(spark)
    val qv = spark.read.parquet(base.resolve("input").toString)
      .filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    index.topK(spark, qv, excludeVecId = 0L)
  }

  /** n77: the n63 ingest (same chunked stream, same maintenance) answered
    * with the two-stage IVFADC-R query — codes shortlist from the pruned
    * index read, exact re-rank against the source vectors. Oracle: the
    * batch n75 [[Similarity.ivfPqRerankOracle]] verbatim. */
  def streamingIvfPqRerankQuery(spark: SparkSession, dir: String,
                                chunks: Int = 4): DataFrame = {
    val base = Tables.scratchDir("n77")
    val index = new IncrementalIvfPqIndex(base.resolve("state"))
    val emb = Tables.embeddings(spark, dir)
    StreamHarness.stageChunks(emb,
      pmod(col("vec_id"), lit(chunks)), base.resolve("input"), chunks)
    StreamHarness.run(spark, base.resolve("input"), base.resolve("ckpt"),
      "graft:n77")(index.processBatch)
    index.maintain(spark)
    val qv = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    index.topKRerank(spark, emb, qv, queryVecId = 0L)
  }

}
