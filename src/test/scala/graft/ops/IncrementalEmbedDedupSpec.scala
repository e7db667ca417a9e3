package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * The incremental embedding-dedup invariant (n52): maintaining the banded
 * embedding index one micro-batch at a time converges to the batch n37
 * cluster table — including across a stream restart with new data, across
 * checkpoint replay of a committed batch, and with the half-committed-batch
 * marker gating of the n41 crash-consistency contract.
 */
class IncrementalEmbedDedupSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def batchClusters: Set[Row] =
    Dedup.embeddingClustersQuery(spark, T.sf0001).collect().toSet

  private def hashIn(rs: Int*) = {
    val m = pmod(xxhash64(col("vec_id")), lit(4))
    rs.map(r => m === r).reduce(_ || _)
  }

  test("streaming clusters equal the batch n37 answer") {
    val got = IncrementalEmbedDedup
      .streamingEmbeddingClustersQuery(spark, T.sf0001).collect().toSet
    assert(got.nonEmpty)
    assert(got == batchClusters)
  }

  test("restart with new data resumes the index and still converges") {
    val base = graft.SparkTestSession.tmpDir("n52-restart")
    val input = base.resolve("input")
    val ckpt = base.resolve("ckpt")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001)
    // geometry pinned to the FULL corpus up front — run 1's batches must
    // hash identically to run 2's even though they see fewer vectors
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = IncrementalEmbedDedup.geometryFor(full.count()))

    // run 1 sees ~half the corpus (hash split, so most planted pairs
    // straddle the runs); run 2 reuses checkpoint + state and must bridge
    IncrementalEmbedDedup.stageChunks(full.filter(hashIn(0, 1)), input, chunks = 2)
    IncrementalEmbedDedup.runStream(spark, input, ckpt, index)
    val mid = index.finalClusters(spark).count()

    IncrementalEmbedDedup.stageChunks(full.filter(hashIn(2, 3)), input, chunks = 2)
    IncrementalEmbedDedup.runStream(spark, input, ckpt, index)
    val fin = index.finalClusters(spark).collect().toSet
    assert(fin == batchClusters)
    assert(mid < fin.size, s"run 1 already matched everything ($mid rows) — " +
      "the hash split failed to place pairs across the runs")
  }

  test("replay idempotence and half-committed-batch marker gating") {
    val base = graft.SparkTestSession.tmpDir("n52-replay")
    val input = base.resolve("input")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001)
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = IncrementalEmbedDedup.geometryFor(full.count()))
    IncrementalEmbedDedup.stageChunks(full, input, chunks = 2)
    val schema = spark.read.parquet(input.toString).schema
    val b0 = spark.read.schema(schema).parquet(input.toString).filter(hashIn(0, 1))
    val b1 = spark.read.schema(schema).parquet(input.toString).filter(hashIn(2, 3))

    index.processBatch(b0, 0L)
    val afterB0 = index.finalClusters(spark).collect().toSet

    // crash between batch 1's parts and its marker: all _SUCCESS files
    // exist, but public readers must still see exactly the batch-0 state
    index.processBatch(b1, 1L)
    val afterB1 = index.finalClusters(spark).collect().toSet
    Files.delete(base.resolve("state/commits/1.committed"))
    assert(index.finalClusters(spark).collect().toSet == afterB0)

    // replay recommits deterministically; committed replay short-circuits
    index.processBatch(b1, 1L)
    assert(index.isCommitted(1L))
    assert(index.finalClusters(spark).collect().toSet == afterB1)
    index.processBatch(b1, 1L)
    assert(index.finalClusters(spark).collect().toSet == afterB1)
    assert(afterB1 == batchClusters)
  }
}
