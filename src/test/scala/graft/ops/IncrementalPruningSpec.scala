package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * The round-11 collision-bucket pruning contract: after compaction the
 * incremental indexes' probe reads are LISTING-TIME partition-pruned to
 * the batch's collision buckets (PartitionFilters on the hive bucket
 * column — the d73 treatment), and pruning is invisible to results: the
 * pruned view contains every row whose band key collides with the batch.
 */
class IncrementalPruningSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def hashIn(rs: Int*) = {
    val m = pmod(xxhash64(col("vec_id")), lit(4))
    rs.map(r => m === r).reduce(_ || _)
  }

  test("the compacted band probe plans PartitionFilters on pb, not a full scan") {
    val base = graft.SparkTestSession.tmpDir("n52-prune")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001).persist()
    val n = full.count()
    val geom = IncrementalEmbedDedup.geometryFor(n)
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = geom, bandBuckets = IncrementalEmbedDedup.bucketsFor(n, geom._2))
    (0 to 1).foreach(j => index.processBatch(full.filter(hashIn(j)), j.toLong))
    assert(index.compact(spark).contains(1L))

    // the probe's pruned read: a trickle batch's bucket set
    val someBuckets = Seq(0L, 3L, 7L)
    val pruned = index.debugReadBands(spark, Long.MaxValue,
      pruneTo = Some(someBuckets))
    val p = pruned.queryExecution.executedPlan.toString
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(partFilters.isDefined, s"no PartitionFilters list in probe plan:\n$p")
    assert(partFilters.get.group(1).contains("pb"),
      s"probe scan not pruned on pb:\n$p")
    // pruning is listing-time: pb must NOT appear in row-level PushedFilters
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(pushed.isDefined, s"no PushedFilters list in probe plan:\n$p")
    assert(!pushed.get.group(1).contains("pb"), p)

    // and the pruned view IS the bucket restriction of the full view
    val expected = index.debugReadBands(spark, Long.MaxValue)
      .filter(index.debugBandBucket.isin(someBuckets: _*))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = pruned.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected, "pruned view diverged from the bucket restriction")
    assert(got.nonEmpty, "fixture produced no rows in the probed buckets")

    // layout regression guard: compaction repartition()s on the bucket
    // column before partitionBy, so each pb=<v> leaf holds exactly ONE
    // data file — without it every write task fans a file into ~every
    // bucket (tasks×buckets tiny files, the round-11 probe's 3–4×
    // slowdown)
    val bandsRoot = base.resolve("state/bands/c1")
    import scala.jdk.CollectionConverters._
    val leaves = {
      val s = java.nio.file.Files.list(bandsRoot)
      try s.iterator().asScala.filter(p =>
        p.getFileName.toString.startsWith("pb=")).toList
      finally s.close()
    }
    assert(leaves.nonEmpty, "no hive bucket dirs under the compacted band tree")
    leaves.foreach { leaf =>
      val files = {
        val s = java.nio.file.Files.list(leaf)
        try s.iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet"))
        finally s.close()
      }
      assert(files == 1, s"bucket ${leaf.getFileName} holds $files data files")
    }
    full.unpersist()
  }

  test("every collision partner of a batch lives in the batch's bucket set") {
    // the correctness core of the pruning: a batch band key's partners
    // share its (band, bh), hence its hash bucket — so restricting the
    // probe to the batch's buckets loses no candidate
    val base = graft.SparkTestSession.tmpDir("n52-prune-cov")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001).persist()
    val n = full.count()
    val geom = IncrementalEmbedDedup.geometryFor(n)
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = geom, bandBuckets = IncrementalEmbedDedup.bucketsFor(n, geom._2))
    (0 to 2).foreach(j => index.processBatch(full.filter(hashIn(j)), j.toLong))
    assert(index.compact(spark).contains(2L))
    // the final batch joins against the pruned compacted view; the spec's
    // oracle is the batch answer on the full corpus — any lost cross-batch
    // candidate edge would break cluster equality
    index.processBatch(full.filter(hashIn(3)), 3L)
    val got = index.finalClusters(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val expected = Dedup.embeddingClustersQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected,
      "pruned probe lost candidate edges: clusters diverged from batch answer")
    full.unpersist()
  }
}
