package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/**
 * Compaction of the incremental text-dedup index (the
 * [[IncrementalEmbedCompactionSpec]] contract on the n41 index):
 * consolidation is invisible to the manifest and arrival log, removes the
 * superseded part dirs, leaves later batches joining the compacted band
 * index with the same convergence guarantee, and a half-written
 * consolidation stays invisible.
 */
class IncrementalDedupCompactionSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def modIs(r: Int, m: Int) = pmod(col("doc_id"), lit(m)) === r

  private def manifest(index: IncrementalDedupIndex) =
    index.finalManifest(spark).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

  test("compact preserves manifest and log; later batches still converge") {
    val base = graft.SparkTestSession.tmpDir("n41-compact")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"))

    (0 to 2).foreach(j => index.processBatch(docs.filter(modIs(j, 4)), j.toLong))
    val before = manifest(index)
    val logBefore = index.arrivalLog(spark).collect().toSet

    assert(index.compact(spark).contains(2L))
    assert(manifest(index) == before, "compaction changed the manifest")
    assert(index.arrivalLog(spark).collect().toSet == logBefore,
      "compaction changed the arrival log")
    for (t <- Seq("docs", "shingles", "bands", "manifest"); j <- 0 to 2)
      assert(!Files.exists(base.resolve(s"state/$t/b$j")), s"$t/b$j survived")
    assert(Files.exists(base.resolve("state/bands/c2/_SUCCESS")))

    index.processBatch(docs.filter(modIs(3, 4)), 3L)
    val expected = Dedup.dedupManifestQuery(spark, T.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(manifest(index) == expected)

    // round-12 tiering: the second pass appends a DELTA level instead of
    // rewriting the index; the first tree stays in the live chain
    assert(index.compact(spark).contains(3L))
    assert(manifest(index) == expected)
    assert(Files.exists(base.resolve("state/docs/c2/_SUCCESS")),
      "delta compaction rewrote the whole index")
    assert(Files.exists(base.resolve("state/docs/c3/_SUCCESS")))
    assert(index.debugChain == Seq(2L, 3L))
  }

  test("a half-written consolidation is invisible; later batches still bridge") {
    val base = graft.SparkTestSession.tmpDir("n41-compactcrash")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"))
    (0 to 1).foreach(j => index.processBatch(docs.filter(modIs(j, 4)), j.toLong))

    // crash mid-compaction: docs tree consolidated with _SUCCESS, the
    // other three trees and the marker never written — the watermark must
    // not activate, or batch-0/1 shingle/band history disappears and every
    // cross-batch near-dup pair with a later partner is lost
    spark.read.parquet(base.resolve("state/docs/b0").toString,
        base.resolve("state/docs/b1").toString)
      .write.mode("overwrite").parquet(base.resolve("state/docs/c1").toString)
    assert(Files.exists(base.resolve("state/docs/c1/_SUCCESS")))

    (2 to 3).foreach(j => index.processBatch(docs.filter(modIs(j, 4)), j.toLong))
    val expected = Dedup.dedupManifestQuery(spark, T.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(manifest(index) == expected,
      "cross-batch pairs lost: reader honored a half-written compaction")

    assert(index.compact(spark).contains(3L))
    assert(manifest(index) == expected)
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

  test("compact GCs superseded labels/fpmin versions and prunes dead markers") {
    val base = graft.SparkTestSession.tmpDir("n41-gc")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"))
    (0 to 3).foreach(j => index.processBatch(docs.filter(modIs(j, 4)), j.toLong))

    // round-9 verdict #2: fpmin rewrites every batch (new fingerprints),
    // so versions accumulate until maintenance runs
    assert(children(base.resolve("state/fpmin"), "v").size > 1,
      "fixture no longer exercises accumulation")
    val expected = Dedup.dedupManifestQuery(spark, T.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(manifest(index) == expected)

    // compact = the maintenance pass: at most the latest committed version
    // of each snapshot table survives (labels is change-gated and may have
    // none on a near-dup-free slice), and every marker the consolidated
    // parts no longer need is pruned — keeping those the marker-gated
    // labels/fpmin reads depend on
    assert(index.compact(spark).contains(3L))
    val labelVs = children(base.resolve("state/labels"), "v")
    val fpminVs = children(base.resolve("state/fpmin"), "v")
    assert(labelVs.size <= 1, s"dead label versions survived: $labelVs")
    assert(fpminVs.size == 1, s"dead fpmin versions survived: $fpminVs")
    val keep = (labelVs ++ fpminVs).map(v => s"${v.drop(1)}.committed")
    val markers = children(base.resolve("state/commits"), "")
    assert(markers == keep,
      s"markers after compact: $markers (expected $keep)")
    assert(manifest(index) == expected,
      "snapshot GC / marker pruning broke a marker-gated read")
  }

  test("a crash mid-snapshot-GC is invisible and the next compact completes it") {
    val base = graft.SparkTestSession.tmpDir("n41-snapcrash")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"))
    (0 to 1).foreach(j => index.processBatch(docs.filter(modIs(j, 3)), j.toLong))
    assert(index.compact(spark).contains(1L))
    val before = manifest(index)
    val vMax = children(base.resolve("state/fpmin"), "v").map(_.drop(1).toLong).max

    // crash window inside compact's sweep: a superseded committed fpmin
    // version and its marker back on disk (an EMPTY v0 — reading it would
    // orphan every doc, so resolving it instead of the max is loud)
    spark.read.parquet(base.resolve(s"state/fpmin/v$vMax").toString).limit(0)
      .write.mode("overwrite").parquet(base.resolve("state/fpmin/v0").toString)
    Files.createDirectories(base.resolve("state/commits"))
    if (!Files.exists(base.resolve("state/commits/0.committed")))
      Files.createFile(base.resolve("state/commits/0.committed"))
    assert(manifest(index) == before,
      "reader resolved a stale snapshot version instead of the max")

    // later batches + the next maintenance pass reclaim it
    index.processBatch(docs.filter(modIs(2, 3)), 2L)
    assert(index.compact(spark).contains(2L))
    assert(!Files.exists(base.resolve("state/fpmin/v0")),
      "stale snapshot version survived the next compact")
    val expected = Dedup.dedupManifestQuery(spark, T.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(manifest(index) == expected)
  }

  test("a crash after the marker but before GC: re-run completes the GC") {
    val base = graft.SparkTestSession.tmpDir("n41-gcrash")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"))
    (0 to 1).foreach(j => index.processBatch(docs.filter(modIs(j, 2)), j.toLong))
    val before = manifest(index)

    // post-marker crash state: watermark 1 active, a superseded part back
    // on disk — the re-run must complete the GC at watermark 1, not
    // read-and-overwrite its own compacted dirs or regress the watermark
    assert(index.compact(spark).contains(1L))
    spark.read.parquet(base.resolve("state/docs/c1").toString).limit(0)
      .write.mode("overwrite").parquet(base.resolve("state/docs/b0").toString)
    assert(index.compact(spark).contains(1L))
    assert(!Files.exists(base.resolve("state/docs/b0")), "stale part survived GC")
    assert(manifest(index) == before)
  }
}
