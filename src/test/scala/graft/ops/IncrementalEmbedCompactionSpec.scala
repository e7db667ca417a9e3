package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * Compaction of the incremental embedding index: consolidating committed
 * parts must be invisible to results (before/after equality), survive a
 * crash between the consolidated write and its marker (readers stay on
 * the uncompacted view), physically remove the superseded part dirs, and
 * leave subsequent batches joining against the compacted view with the
 * same convergence guarantee.
 */
class IncrementalEmbedCompactionSpec extends AnyFunSuite with graft.SoakTagged {
  lazy val spark = T.spark

  private def hashIn(rs: Int*) = {
    val m = pmod(xxhash64(col("vec_id")), lit(4))
    rs.map(r => m === r).reduce(_ || _)
  }

  private def clusters(index: IncrementalEmbedIndex) =
    index.finalClusters(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("compact preserves results, drops old parts, and new batches still converge") {
    val base = graft.SparkTestSession.tmpDir("n52-compact")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001).persist()
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = IncrementalEmbedDedup.geometryFor(full.count()))

    (0 to 2).foreach(j => index.processBatch(full.filter(hashIn(j)), j.toLong))
    val before = clusters(index)

    val w = index.compact(spark)
    assert(w.contains(2L))
    assert(clusters(index) == before, "compaction changed visible results")
    // superseded part dirs are physically gone; the consolidated trees exist
    (0 to 2).foreach { j =>
      assert(!Files.exists(base.resolve(s"state/units/b$j")), s"b$j survived")
      assert(!Files.exists(base.resolve(s"state/bands/b$j")), s"b$j survived")
    }
    assert(Files.exists(base.resolve("state/units/c2/_SUCCESS")))
    assert(Files.exists(base.resolve("state/bands/c2/_SUCCESS")))

    // a later batch joins its candidates against the compacted view and
    // the final table still equals the batch n37 answer on the full corpus
    index.processBatch(full.filter(hashIn(3)), 3L)
    val expected = Dedup.embeddingClustersQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(clusters(index) == expected)

    // a second compaction appends a DELTA level (round-12 tiering:
    // maintenance ∝ new parts) — the first tree stays in the live chain
    // until a bin-packing full merge supersedes it
    assert(index.compact(spark).contains(3L))
    assert(clusters(index) == expected)
    assert(Files.exists(base.resolve("state/units/c2/_SUCCESS")),
      "delta compaction rewrote the whole index")
    assert(Files.exists(base.resolve("state/units/c3/_SUCCESS")))
    assert(!Files.exists(base.resolve("state/units/b3")), "b3 survived")
    assert(index.debugChain == Seq(2L, 3L))
    full.unpersist()
  }

  test("a half-written consolidation is invisible; later batches still bridge") {
    val base = graft.SparkTestSession.tmpDir("n52-compactcrash")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001).persist()
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = IncrementalEmbedDedup.geometryFor(full.count()))
    (0 to 1).foreach(j => index.processBatch(full.filter(hashIn(j)), j.toLong))

    // simulate a crash mid-compaction: the units tree consolidated (with
    // _SUCCESS), the bands tree and the marker never written. The reader
    // must keep treating the part dirs as authoritative — a phantom
    // watermark here would drop batch-0/1 band history and lose every
    // cross-batch pair whose partner arrives later.
    spark.read.parquet(base.resolve("state/units/b0").toString,
        base.resolve("state/units/b1").toString)
      .write.mode("overwrite").parquet(base.resolve("state/units/c1").toString)
    assert(Files.exists(base.resolve("state/units/c1/_SUCCESS")))
    assert(!Files.exists(base.resolve("state/compactions/1.committed")))

    (2 to 3).foreach(j => index.processBatch(full.filter(hashIn(j)), j.toLong))
    val expected = Dedup.embeddingClustersQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(clusters(index) == expected,
      "cross-batch pairs lost: reader honored a half-written compaction")

    // a re-run completes the interrupted compaction (deterministic content,
    // overwrite semantics) and the result is unchanged
    assert(index.compact(spark).contains(3L))
    assert(clusters(index) == expected)
    full.unpersist()
  }

  private def children(dir: java.nio.file.Path, prefix: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(dir)) Set.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(prefix)).toSet
      finally s.close()
    }
  }

  test("compact consolidates the label store and prunes dead markers") {
    val base = graft.SparkTestSession.tmpDir("n52-gc")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001).persist()
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = IncrementalEmbedDedup.geometryFor(full.count()))
    (0 to 3).foreach(j => index.processBatch(full.filter(hashIn(j)), j.toLong))

    // the label store accumulates one assign part per edge-bearing batch
    // until maintenance runs (the relabel-log replacement of the round-9
    // per-batch version accumulation)
    val partsBefore = children(base.resolve("state/assign"), "b")
    assert(partsBefore.size > 1,
      s"fixture no longer exercises accumulation: $partsBefore")
    val expected = Dedup.embeddingClustersQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(clusters(index) == expected)

    // compact = the maintenance pass: a first compaction is a FULL merge,
    // so the assign level is fully RESOLVED (the fold leaves no chains —
    // its rows ARE the cluster table) and the relabel level is empty;
    // with no snapshot gates left, every marker at or below the watermark
    // is pruned
    assert(index.compact(spark).contains(3L))
    assert(children(base.resolve("state/assign"), "b").isEmpty,
      "assign parts survived consolidation")
    val levelRows = spark.read
      .parquet(base.resolve("state/assign/c3").toString)
      .select("vec_id", "lbl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(0) == r.getLong(1))).toSet
    assert(levelRows == expected,
      "the bin-packed assign level is not the resolved cluster table")
    assert(index.debugRead(spark, "relabel", Long.MaxValue).count() == 0,
      "the relabel log survived the full merge")
    val markers = children(base.resolve("state/commits"), "")
    assert(markers.isEmpty, s"dead markers survived compact: $markers")
    assert(clusters(index) == expected,
      "label-store consolidation broke the marker-gated read")
    full.unpersist()
  }

  test("a crash after the marker but before GC: re-run completes the GC") {
    val base = graft.SparkTestSession.tmpDir("n52-gcrash")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001).persist()
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = IncrementalEmbedDedup.geometryFor(full.count()))
    (0 to 1).foreach(j => index.processBatch(full.filter(hashIn(j)), j.toLong))
    val before = clusters(index)

    // real compaction, then resurrect a superseded part dir to simulate
    // the crash window between the marker flip and the delete loop: the
    // exact post-marker state is watermark 1 active + a part <= 1 on disk
    assert(index.compact(spark).contains(1L))
    spark.read.parquet(base.resolve("state/units/c1").toString).limit(0)
      .write.mode("overwrite").parquet(base.resolve("state/units/b0").toString)

    // the re-run must neither read-and-overwrite its own compacted dir nor
    // regress the watermark below 1 — it completes the GC at watermark 1
    assert(index.compact(spark).contains(1L))
    assert(!Files.exists(base.resolve("state/units/b0")), "stale part survived GC")
    assert(clusters(index) == before)

    (2 to 3).foreach(j => index.processBatch(full.filter(hashIn(j)), j.toLong))
    val expected = Dedup.embeddingClustersQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(clusters(index) == expected)
    assert(before.subsetOf(expected))
    full.unpersist()
  }
}
