package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/**
 * Round-12 tiered compaction contract ([[IncrementalStateMachine]]):
 * a maintenance pass appends a DELTA level holding only the parts since
 * the previous watermark (maintenance ∝ new data), bin-packs with a FULL
 * merge only when the chain would exceed `maxLevels`, and readers resolve
 * the live chain by walking levels down to the first full one — so every
 * crash window (delta committed but parts not yet swept; full merge
 * committed but old levels not yet swept) is invisible to results.
 */
class IncrementalTieringSpec extends AnyFunSuite with graft.SoakTagged {
  lazy val spark = T.spark

  private def modIs(r: Int, m: Int) = pmod(col("doc_id"), lit(m)) === r

  private def manifest(index: IncrementalDedupIndex) =
    index.finalManifest(spark).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

  private def copyTree(src: Path, dst: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(src)
    try s.iterator().asScala.foreach { p =>
      val q = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(q)
      else { Files.createDirectories(q.getParent); Files.copy(p, q) }
    } finally s.close()
  }

  private val PartNames = Seq("docs", "shingles", "bands", "manifest",
    "assign", "relabel", "fpkeep")

  test("delta levels accumulate to maxLevels, then a full merge bin-packs the chain") {
    val base = T.tmpDir("tier-chain")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"), maxLevels = 2)
    val expected = Dedup.dedupManifestQuery(spark, T.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

    // batches 0,1 → FULL c1 (first level is always a full merge)
    (0 to 1).foreach(j => index.processBatch(docs.filter(modIs(j, 4)), j.toLong))
    assert(index.compact(spark).contains(1L))
    assert(index.debugChain == Seq(1L))

    // batch 2 → DELTA c2: the old level is untouched, only b2 consolidates
    index.processBatch(docs.filter(modIs(2, 4)), 2L)
    assert(index.compact(spark).contains(2L))
    assert(index.debugChain == Seq(1L, 2L))
    assert(Files.exists(base.resolve("state/docs/c1/_SUCCESS")))
    assert(!Files.exists(base.resolve("state/docs/b2")))

    // batch 3 → chain would exceed maxLevels=2 → FULL merge c3 supersedes
    // and sweeps the old levels and their markers
    index.processBatch(docs.filter(modIs(3, 4)), 3L)
    assert(index.compact(spark).contains(3L))
    assert(index.debugChain == Seq(3L))
    PartNames.foreach { t =>
      assert(!Files.exists(base.resolve(s"state/$t/c1")), s"$t/c1 survived bin-pack")
      assert(!Files.exists(base.resolve(s"state/$t/c2")), s"$t/c2 survived bin-pack")
    }
    assert(!Files.exists(base.resolve("state/compactions/1.committed")))
    assert(!Files.exists(base.resolve("state/compactions/2.committed")))
    assert(manifest(index) == expected,
      "tiered chain diverged from the batch n38 answer")
  }

  test("the delta-committed crash window: superseded parts are invisible, then swept") {
    val base = T.tmpDir("tier-deltacrash")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"))
    (0 to 1).foreach(j => index.processBatch(docs.filter(modIs(j, 3)), j.toLong))
    assert(index.compact(spark).contains(1L))
    index.processBatch(docs.filter(modIs(2, 3)), 2L)
    assert(index.compact(spark).contains(2L))   // delta c2
    assert(index.debugChain == Seq(1L, 2L))
    val before = manifest(index)

    // crash state between the delta marker flip and the part sweep: the
    // consolidated part back on disk WITH its batch marker (pruneMarkers
    // runs after the sweep, so marker-present is the real window). Its
    // rows now also live in level c2 — a reader that unioned parts at or
    // below the watermark would double-count every batch-2 document.
    spark.read.parquet(base.resolve("state/docs/c2").toString)
      .write.mode("overwrite").parquet(base.resolve("state/docs/b2").toString)
    Files.createDirectories(base.resolve("state/commits"))
    if (!Files.exists(base.resolve("state/commits/2.committed")))
      Files.createFile(base.resolve("state/commits/2.committed"))
    assert(manifest(index) == before,
      "a part at the watermark leaked into the read view (double count)")
    assert(index.arrivalLog(spark).count() ==
      index.arrivalLog(spark).select("doc_id").distinct().count())

    // the next maintenance pass completes the interrupted sweep
    assert(index.compact(spark).contains(2L))
    assert(!Files.exists(base.resolve("state/docs/b2")), "stale part survived")
    assert(manifest(index) == before)
  }

  test("the full-merge crash window: stale levels below a full level are ignored, then swept") {
    val base = T.tmpDir("tier-fullcrash")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"), maxLevels = 2)
    (0 to 1).foreach(j => index.processBatch(docs.filter(modIs(j, 5)), j.toLong))
    assert(index.compact(spark).contains(1L))
    (2 to 3).foreach { j =>
      index.processBatch(docs.filter(modIs(j, 5)), j.toLong)
      assert(index.compact(spark).contains(j.toLong))
    }
    // c3 is the bin-packed FULL merge; fabricate the crash window where
    // the superseded delta level c2 (swept by the real run) is still on
    // disk with its marker: duplicate c3's content under c2 — if the
    // chain resolution read it, every document would double-count
    assert(index.debugChain == Seq(3L))
    val before = manifest(index)
    PartNames.foreach(t => copyTree(base.resolve(s"state/$t/c3"),
      base.resolve(s"state/$t/c2")))
    Files.write(base.resolve("state/compactions/2.committed"),
      "delta".getBytes("UTF-8"))
    assert(index.debugLevels == Seq(2L, 3L))
    assert(index.debugChain == Seq(3L),
      "chain resolution did not stop at the full level")
    assert(manifest(index) == before,
      "a stale level below the full merge leaked into the read view")

    // the next pass (new data arrives) sweeps the residue
    index.processBatch(docs.filter(modIs(4, 5)), 4L)
    assert(index.compact(spark).contains(4L))
    PartNames.foreach(t =>
      assert(!Files.exists(base.resolve(s"state/$t/c2")), s"$t/c2 survived"))
    assert(!Files.exists(base.resolve("state/compactions/2.committed")))
    val expected = Dedup.dedupManifestQuery(spark, T.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(manifest(index) == expected)
  }

  test("two-level layout soak: tiered chain + crash window keep fan-out bounded and converge") {
    // round-12 verdict #4 follow-up: the clamp-lifted pb=/sub= layout was
    // pinned for ONE compaction; this is the multi-batch soak — a full
    // delta→bin-pack cycle plus the full-merge crash window, all on the
    // two-level layout, with the same bounded-fan-out assertions
    val base = T.tmpDir("tier-twolevel")
    val full = IncrementalEmbedDedup.corpus(spark, T.sf0001).persist()
    val n = full.count()
    val geom = IncrementalEmbedDedup.geometryFor(n)
    val buckets = 256
    val maxDirs = 64 // -> subN = 4, two-level
    val index = new IncrementalEmbedIndex(base.resolve("state"),
      geometry = geom, bandBuckets = buckets, maxLevels = 2,
      bucketMaxDirs = maxDirs)
    def hashIs(j: Int) = pmod(xxhash64(col("vec_id")), lit(5)) === j

    // c1 FULL, c2 DELTA, c3 bin-packed FULL — the whole tiering cycle
    (0 to 1).foreach(j => index.processBatch(full.filter(hashIs(j)), j.toLong))
    assert(index.compact(spark).contains(1L))
    index.processBatch(full.filter(hashIs(2)), 2L)
    assert(index.compact(spark).contains(2L))
    assert(index.debugChain == Seq(1L, 2L))
    index.processBatch(full.filter(hashIs(3)), 3L)
    assert(index.compact(spark).contains(3L))
    assert(index.debugChain == Seq(3L))

    // bounded fan-out at every directory level of the bin-packed band
    // tree: <= maxDirs outer pb dirs, <= subN sub dirs inside each, and
    // the one-file-per-leaf shape the repartition buys
    import scala.jdk.CollectionConverters._
    def children(p: Path, prefix: String): List[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix)).toList
      finally s.close()
    }
    val bandsRoot = base.resolve("state/bands/c3")
    val outer = children(bandsRoot, "pb=")
    assert(outer.nonEmpty && outer.size <= maxDirs,
      s"outer fan-out ${outer.size} exceeds maxDirs=$maxDirs")
    outer.foreach { o =>
      val subs = children(o, "sub=")
      assert(subs.nonEmpty && subs.size <= 4, s"sub fan-out under $o: ${subs.size}")
      subs.foreach { leaf =>
        val files = {
          val s = Files.list(leaf)
          try s.iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet"))
          finally s.close()
        }
        assert(files == 1, s"leaf ${o.getFileName}/${leaf.getFileName} holds $files files")
      }
    }

    // the full-merge crash window ON the two-level layout: a superseded
    // delta level back on disk below the bin-packed full one — invisible
    // to the chain, then swept by the next pass
    val before = index.finalClusters(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    Seq("units", "bands", "assign", "relabel").foreach(t =>
      copyTree(base.resolve(s"state/$t/c3"), base.resolve(s"state/$t/c2")))
    Files.write(base.resolve("state/compactions/2.committed"),
      "delta".getBytes("UTF-8"))
    assert(index.debugLevels == Seq(2L, 3L))
    assert(index.debugChain == Seq(3L),
      "two-level chain resolution did not stop at the full level")
    assert(index.finalClusters(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet == before,
      "a stale two-level delta leaked into the read view")
    index.processBatch(full.filter(hashIs(4)), 4L)
    assert(index.compact(spark).contains(4L))
    Seq("units", "bands", "assign", "relabel").foreach(t =>
      assert(!Files.exists(base.resolve(s"state/$t/c2")), s"$t/c2 survived"))

    // and the soaked index converges to the batch oracle
    val got = index.finalClusters(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val expected = Dedup.embeddingClustersQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected, "two-level soak diverged from the batch answer")
    full.unpersist()
  }

  test("compact sweeps stray compaction-marker temps from the crash window") {
    // a crash between writeCompactionMarker's temp write and its atomic
    // move, followed by new commits advancing the watermark, orphans
    // compactions/<old>.tmp with nothing ever rewriting it — the GC must
    // sweep any .tmp residue (serial-maintainer discipline: no temp of a
    // LIVE pass can be in flight while GC runs)
    val base = T.tmpDir("tier-straytmp")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"), maxLevels = 2)
    (0 to 1).foreach(j => index.processBatch(docs.filter(modIs(j, 4)), j.toLong))
    assert(index.compact(spark).contains(1L))
    val before = manifest(index)

    // the orphan: an interrupted pass's marker temp below the watermark
    val stray = base.resolve("state/compactions/0.tmp")
    Files.write(stray, "full".getBytes("UTF-8"))
    index.processBatch(docs.filter(modIs(2, 4)), 2L)
    assert(index.compact(spark).contains(2L))
    assert(!Files.exists(stray), "stray marker temp survived the GC")
    assert(Files.exists(base.resolve("state/compactions/2.committed")))
    assert(manifest(index).size > before.size)
  }

  test("maxLevels = 1 degenerates to the full-rewrite behavior") {
    val base = T.tmpDir("tier-degenerate")
    val docs = Tables.documents(spark, T.sf0001)
    val index = new IncrementalDedupIndex(base.resolve("state"), maxLevels = 1)
    (0 to 1).foreach(j => index.processBatch(docs.filter(modIs(j, 3)), j.toLong))
    assert(index.compact(spark).contains(1L))
    index.processBatch(docs.filter(modIs(2, 3)), 2L)
    assert(index.compact(spark).contains(2L))
    // every pass is a full merge: exactly one level, the old one retired
    assert(index.debugChain == Seq(2L))
    assert(!Files.exists(base.resolve("state/docs/c1")))
    assert(!Files.exists(base.resolve("state/compactions/1.committed")))
    val expected = Dedup.dedupManifestQuery(spark, T.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(manifest(index) == expected)
  }
}
