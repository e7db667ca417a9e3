package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

import graft.{SparkTestSession => T}

/**
 * The n52 core claim as a property (the [[IncrementalDedupProps]] twin on
 * the vector modality): the incremental embedding index converges to the
 * batch n37 cluster table for ANY partition of the corpus into batches —
 * banding is per-vector and deterministic under the PINNED geometry, so
 * the candidate set is batching-invariant, and contracted min-label
 * merging commutes with edge arrival order. `IncrementalEmbedDedupSpec`
 * drives the real file stream; this property drives `processBatch`
 * directly over randomized batch counts and hash-salted assignments
 * (including saltings that split every planted pair across batches).
 *
 * Seed policy (round 6, repo-wide): pinned initial seed, so a green run
 * is reproducible — never generator luck.
 */
object IncrementalEmbedDedupProps extends Properties("IncrementalEmbedDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(20260813L)).withMinSuccessfulTests(4)

  private lazy val spark = T.spark
  private lazy val corpus = IncrementalEmbedDedup.corpus(spark, T.sf0001).persist()
  private lazy val geometry = IncrementalEmbedDedup.geometryFor(corpus.count())
  private lazy val expected = Dedup.embeddingClustersQuery(spark, T.sf0001)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  private val splitGen: Gen[(Int, Int)] = for {
    batches <- Gen.choose(1, 5)
    salt <- Gen.choose(0, 1000000)
  } yield (batches, salt)

  property("finalClusters equals the batch n37 table for any batching") =
    forAll(splitGen) { case (batches, salt) =>
      // shutdown-cleaned scratch + eager per-evaluation delete: repeated
      // runs must not accumulate state trees (round-9 advice)
      val root = T.tmpDir("n52-prop")
      try {
        val index = new IncrementalEmbedIndex(root, geometry = geometry)
        (0 until batches).foreach { j =>
          index.processBatch(
            corpus.filter(pmod(xxhash64(col("vec_id"), lit(salt)),
              lit(batches)) === j), j.toLong)
        }
        val got = index.finalClusters(spark)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
        got == expected
      } finally T.deleteTree(root)
    }
}
