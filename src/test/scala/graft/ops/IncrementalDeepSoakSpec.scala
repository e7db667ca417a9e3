package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * 500-batch depth soaks for the governance twins that only had the
 * shared 50-batch treatment (round-15 verdict #5): the n67 quota and
 * the n69 decontamination gate, run to 50 maintenance cycles at the
 * production cadence. Both indexes' per-batch cost is O(batch) BY
 * CONSTRUCTION (neither batch path reads prior state), so what depth
 * specifically guards is the COMPACTION/LISTING path: level chains must
 * keep bin-packing (never exceed maxLevels), markers must keep
 * collapsing, the per-batch timing must stay flat across a ×10 longer
 * horizon than the 50-batch soak, and the final answer must still equal
 * the batch oracle plan's. At sf0.001 the 500-way split is the trickle
 * regime — ~1-doc batches — which is exactly the adversarial case for
 * per-batch fixed overheads. 500-batch horizon numbers recorded in
 * BASELINE.md ("governance-twin depth soaks").
 */
class IncrementalDeepSoakSpec extends AnyFunSuite with graft.SoakTagged {
  lazy val spark = T.spark

  private val Batches = 500
  private val Cadence = 10

  private def entries(root: Path, table: String, prefix: String): Seq[String] = {
    val dir = root.resolve(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(prefix)).toSeq
      finally s.close()
    }
  }

  /** Run `process` over 500 hash-sliced batches with maintenance every
    * 10, asserting the cadence bounds at each pass; returns per-batch
    * seconds. The assertions are sparse (maintenance points only) so the
    * soak stays cheap at depth. */
  private def soak(root: Path, table: String,
                   process: (org.apache.spark.sql.DataFrame, Long) => Unit,
                   maintain: () => Unit,
                   slices: Long => org.apache.spark.sql.DataFrame): Seq[Double] = {
    val batchSecs = new scala.collection.mutable.ArrayBuffer[Double]
    (0 until Batches).foreach { j =>
      val t0 = System.nanoTime()
      process(slices(j.toLong), j.toLong)
      batchSecs += (System.nanoTime() - t0) / 1e9
      if ((j + 1) % Cadence == 0) {
        maintain()
        val expectLevels = ((j + 1) / Cadence - 1) % 4 + 1
        assert(entries(root, table, "b").isEmpty,
          s"$table parts survived compaction at batch $j")
        assert(entries(root, table, "c").size == expectLevels,
          s"$table levels at batch $j: ${entries(root, table, "c")} (want $expectLevels)")
        if (expectLevels == 1)
          assert(entries(root, table, "c") == Seq(s"c$j"),
            s"bin-pack did not collapse the chain at depth: ${entries(root, table, "c")}")
        assert(entries(root, "commits", "").isEmpty,
          s"markers grew at batch $j: ${entries(root, "commits", "")}")
        assert(entries(root, "compactions", "").size == expectLevels)
      }
    }
    batchSecs.toSeq
  }

  /** Flat-cost gate: the mean of the last 50 batches vs batches 50–100
    * (skipping warmup). A generous 4x band — the claim is no RAMP with
    * depth, not sub-noise equality on ~0.1 s trickle batches. */
  private def assertFlat(batchSecs: Seq[Double], what: String): Unit = {
    val early = batchSecs.slice(50, 100).sum / 50
    val late = batchSecs.slice(Batches - 50, Batches).sum / 50
    info(f"$what per-batch: early=$early%.3f s late=$late%.3f s (x${late / early}%.2f over ${Batches} batches)")
    assert(late < early * 4,
      f"$what per-batch cost ramped with depth: early=$early%.3f s late=$late%.3f s")
  }

  test("quota index: 500-batch depth soak, 50 maintenance cycles, flat cost, exact final state") {
    val base = T.tmpDir("n67-deep")
    val root = base.resolve("state")
    val quota = new IncrementalQuota(root)
    val docs = graft.queries.Tables.documents(spark, T.sf0001).persist()
    docs.count()

    val secs = soak(root, "cands", quota.processBatch, () => quota.maintain(spark),
      j => docs.filter(pmod(xxhash64(col("doc_id")), lit(Batches)) === j))
    assertFlat(secs, "quota")

    val got = quota.finalQuota(spark).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val expected = Pipeline.domainCapQuery(spark, T.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected,
      "deep-soaked final quota diverged from the batch n62 answer")
    docs.unpersist()
  }

  test("decontam gate: 500-batch depth soak, 50 maintenance cycles, flat cost, exact final state") {
    val base = T.tmpDir("n69-deep")
    val root = base.resolve("state")
    val docs = graft.queries.Tables.documents(spark, T.sf0001).persist()
    docs.count()
    val gate = new IncrementalDecontam(root.resolve("state"),
      IncrementalDecontam.benchGramSet(docs))
    val corpus = docs.filter(col("doc_id") % 101 =!= 0)

    val secs = soak(root.resolve("state"), "admitted",
      gate.processBatch, () => gate.maintain(spark),
      j => corpus.filter(pmod(xxhash64(col("doc_id")), lit(Batches)) === j))
    assertFlat(secs, "decontam")

    val got = gate.finalAdmitted(spark).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    val expected = Corpus.bloomDecontamQuery(spark, T.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(got === expected,
      "deep-soaked admitted set diverged from the batch n44 answer")
    gate.release()
    spark.catalog.clearCache()
    docs.unpersist()
  }
}
