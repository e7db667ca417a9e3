package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

import graft.{SparkTestSession => T}
import graft.queries.Tables

/**
 * The n41 core claim as a property: the incremental manifest converges to
 * the batch n38 answer for ANY partition of the corpus into batches — the
 * edge set is batching-invariant (every pair is discovered in the batch
 * where its younger member arrives) and contracted min-label merging
 * commutes with edge arrival order. `IncrementalDedupSpec` drives the
 * real file stream; this property drives `processBatch` directly over
 * randomized batch counts and hash-salted batch assignments (including
 * batchings that split near-dup clusters and exact-dup groups across
 * batches in arbitrary ways).
 *
 * Seed policy (round 6, repo-wide): pinned initial seed, so a green run
 * is reproducible — never generator luck.
 */
object IncrementalDedupProps extends Properties("IncrementalDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(20260813L)).withMinSuccessfulTests(4)

  private lazy val spark = T.spark
  private lazy val docs = Tables.documents(spark, T.sf0001)
  private lazy val expected = Dedup.dedupManifestQuery(spark, T.sf0001)
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSet

  private val splitGen: Gen[(Int, Int)] = for {
    batches <- Gen.choose(1, 5)
    salt <- Gen.choose(0, 1000000)
  } yield (batches, salt)

  property("finalManifest equals the batch n38 manifest for any batching") =
    forAll(splitGen) { case (batches, salt) =>
      // shutdown-cleaned scratch + eager per-evaluation delete: repeated
      // runs must not accumulate state trees (round-9 advice)
      val root = T.tmpDir("n41-prop")
      try {
        val index = new IncrementalDedupIndex(root)
        (0 until batches).foreach { j =>
          index.processBatch(
            docs.filter(pmod(xxhash64(col("doc_id"), lit(salt)),
              lit(batches)) === j), j.toLong)
        }
        val got = index.finalManifest(spark)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3))).toSet
        got == expected
      } finally T.deleteTree(root)
    }

  private val maintainGen: Gen[(Int, Int, Int, Set[Int])] = for {
    batches <- Gen.choose(2, 5)
    salt <- Gen.choose(0, 1000000)
    maxLevels <- Gen.choose(1, 3)
    after <- Gen.someOf(0 until batches)
  } yield (batches, salt, maxLevels, after.toSet)

  property("maintenance at ANY points, any chain depth, preserves convergence") =
    // round-12 tiering as a property: interleave compact() arbitrarily
    // between batches (delta levels, bin-packs, stale sweeps all reachable
    // depending on the draw) — the manifest must still equal the batch
    // answer, and post-batch probes must still see every committed row
    // through whatever level chain the draw produced
    forAll(maintainGen) { case (batches, salt, maxLevels, after) =>
      val root = T.tmpDir("n41-prop-maint")
      try {
        val index = new IncrementalDedupIndex(root, maxLevels = maxLevels)
        (0 until batches).foreach { j =>
          index.processBatch(
            docs.filter(pmod(xxhash64(col("doc_id"), lit(salt)),
              lit(batches)) === j), j.toLong)
          if (after(j)) index.compact(spark)
        }
        val got = index.finalManifest(spark)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3))).toSet
        got == expected
      } finally T.deleteTree(root)
    }
}
